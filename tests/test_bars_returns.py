"""Phase-1 golden tests: silver cleaning + daily returns.

Hand-computed expectations mirror the reference formulas
(``spark_batch_processor.py:41-54``, ``int_daily_returns.sql:26-64``).
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from stock_market_data_pipeline_v2_spark.operators.bars import clean_daily_bars
from stock_market_data_pipeline_v2_spark.operators.returns import daily_returns
from stock_market_data_pipeline_v2_spark.schemas import RAW_DAILY_BARS


def _raw(spark):
    rows = [
        # symbol, date, open, high, low, close, volume, load_ts
        ("aapl ", "2024-01-02", 100.0, 110.0, 95.0, 105.0, 1000, "2024-01-03T00:00:00"),
        ("aapl ", "2024-01-03", 106.0, 108.0, 101.0, 102.0, 1500, "2024-01-04T00:00:00"),
        ("AAPL", "2024-01-04", 103.0, 112.0, 103.0, 110.5, 900, "2024-01-05T00:00:00"),
        # dirty: null symbol, non-positive close, duplicate key, future date, negative volume
        (None, "2024-01-02", 1.0, 1.0, 1.0, 1.0, 10, "2024-01-03T00:00:00"),
        ("MSFT", "2024-01-02", 5.0, 5.0, 5.0, 0.0, 10, "2024-01-03T00:00:00"),
        ("AAPL", "2024-01-04", 999.0, 999.0, 999.0, 999.0, 999, "2024-01-05T00:00:00"),
        ("MSFT", "2099-01-01", 5.0, 6.0, 4.0, 5.5, 10, "2024-01-03T00:00:00"),
        ("MSFT", "2024-01-03", 5.0, 6.0, 4.0, 5.5, -1, "2024-01-04T00:00:00"),
    ]
    return spark.createDataFrame([Row(*r) for r in rows], schema=RAW_DAILY_BARS)


def test_clean_daily_bars_filters_and_dedups(spark):
    out = clean_daily_bars(_raw(spark))
    rows = {(r.symbol, str(r.trade_date)) for r in out.collect()}
    assert rows == {("AAPL", "2024-01-02"), ("AAPL", "2024-01-03"), ("AAPL", "2024-01-04")}
    first = out.filter("trade_date = DATE'2024-01-02'").first()
    assert first.symbol == "AAPL"  # upper(trim())
    assert first.open_price == 100.0 and first.volume == 1000
    assert isinstance(first.trade_date, datetime.date)


def test_daily_returns_formulas(spark):
    out = daily_returns(clean_daily_bars(_raw(spark))).orderBy("trade_date").collect()
    d1, d2, d3 = out
    assert d1.prev_close_price is None and d1.daily_return_pct is None
    assert d1.symbol_row_num == 1
    # day2: (102-105)/105*100 = -2.8571
    assert d2.daily_return_pct == -2.8571
    assert d2.overnight_gap == 1.0  # 106 - 105
    assert d2.intraday_range == 7.0
    # (108-101)/102*100 = 6.8627
    assert d2.intraday_range_pct == 6.8627
    # day3: (110.5-102)/102*100 = 8.3333
    assert d3.daily_return_pct == 8.3333
    assert d3.symbol_row_num == 3


def test_zero_prev_close_yields_null_return(spark):
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_v2_spark.functions.core import (
        null_if_zero_divide,
        safe_divide,
    )

    df = spark.range(1).select(
        null_if_zero_divide(F.lit(5.0), F.lit(0.0)).alias("a"),
        safe_divide(F.lit(5.0), F.lit(0.0)).alias("b"),
        safe_divide(F.lit(5.0), F.lit(2.0)).alias("c"),
    )
    r = df.first()
    assert r.a is None and r.b == 0.0 and r.c == 2.5


def test_malformed_raw_values_filtered_not_fatal(spark):
    """Regression: under Spark 4's default ANSI mode, plain
    to_date/cast ABORTS on malformed input; the cleaning contract is
    null-out-and-filter (try_* variants)."""
    rows = [
        ("AAPL", "2024-01-02", 1.0, 2.0, 0.5, 1.5, 10, "2024-01-03T00:00:00"),
        ("BAD1", "not-a-date", 1.0, 2.0, 0.5, 1.5, 10, "2024-01-03T00:00:00"),
        ("BAD2", "2024-01-02", 1.0, 2.0, 0.5, 1.5, 10, "garbage-timestamp"),
    ]
    out = clean_daily_bars(
        spark.createDataFrame([Row(*r) for r in rows], schema=RAW_DAILY_BARS)
    ).collect()
    symbols = {r.symbol for r in out}
    assert "BAD1" not in symbols  # malformed date → null → filtered
    assert "AAPL" in symbols and "BAD2" in symbols
    bad2 = [r for r in out if r.symbol == "BAD2"][0]
    assert bad2.batch_loaded_at is None  # nulled, row survives (ts not filtered)
