"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship plan on sf0.001;
``queries()``/``oracle_sql()`` register every implemented operator
from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from stock_market_data_pipeline_v2_spark import oracles
from stock_market_data_pipeline_v2_spark.session import configure_runtime
from stock_market_data_pipeline_v2_spark.sources.io import load_table
from stock_market_data_pipeline_v2_spark.operators.bars import (
    bars_from_events,
    filter_clean_bars,
)
from stock_market_data_pipeline_v2_spark.operators.returns import daily_returns

SF0001 = "/root/testdata/sf0.001"


def _clean_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_runtime(spark)
    return filter_clean_bars(bars_from_events(load_table(spark, sf_dir, "events")))


def q_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _clean_bars(spark, sf_dir)


def q_daily_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return daily_returns(_clean_bars(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_daily_returns(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "daily_bars": q_daily_bars,
        "daily_returns": q_daily_returns,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "daily_bars": oracles.DAILY_BARS_SQL,
        "daily_returns": oracles.DAILY_RETURNS_SQL,
    }
