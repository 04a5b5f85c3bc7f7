"""Measured numeric bound for the join-free `reaggregate` strategy.

`windowed_analytics(strategy="reaggregate")` computes the 1-h MA from
15-min partial sums instead of a direct 1-h aggregate; its correctness
gate is rows-only because sum-of-partial-sums can differ from a direct
sum by ~1 ulp. Rows-only is too loose a claim on its own — this test
backs it with a measured bound over the full sf0.1 events table:
max |reagg − interval_join| on the RAW (pre-rounding) ma_1h must stay
under 1e-9, i.e. the divergence really is float-summation-order noise,
not a semantic gap.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="sf0.1 testdata absent")
def test_reagg_matches_join_within_1e9(spark):
    from stock_market_data_pipeline_v2_spark.operators.realtime import (
        tick_events,
        windowed_analytics,
    )
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    ticks = tick_events(load_table(spark, SF_DIR, "events"))
    keys = ["symbol", "window_start"]
    reagg = windowed_analytics(ticks, "reaggregate", rounded=False).select(
        *keys, F.col("ma_1h").alias("ma_reagg")
    )
    joined = windowed_analytics(ticks, "interval_join", rounded=False).select(
        *keys, F.col("ma_1h").alias("ma_join")
    )
    both = reagg.join(joined, keys, "full_outer")
    stats = both.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(
            F.col("ma_reagg").isNull() != F.col("ma_join").isNull()
        ).alias("null_mismatch"),
        F.max(F.abs(F.col("ma_reagg") - F.col("ma_join"))).alias("max_abs"),
    ).first()
    assert stats.n > 0
    assert stats.null_mismatch == 0
    assert stats.max_abs < 1e-9, f"reagg diverges from join by {stats.max_abs}"
