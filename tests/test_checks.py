"""Data-quality contract tests (SURVEY.md §5 parity — dbt test types)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from stock_market_data_pipeline_v2_spark.plans.checks import (
    expect_accepted_values,
    expect_between,
    expect_not_null,
    expect_zero_rows,
    validate,
)


def _df(spark):
    return spark.createDataFrame(
        [
            Row(symbol="AAPL", price=10.0, sig="BULLISH", high=11.0, low=9.0),
            Row(symbol=None, price=-5.0, sig="WAT", high=1.0, low=2.0),
            Row(symbol="MSFT", price=2e7, sig="NEUTRAL", high=3.0, low=1.0),
        ]
    )


def test_each_check_type_counts_violations(spark):
    rep = validate(
        _df(spark),
        [
            expect_not_null("symbol"),
            expect_between("price", 0.000001, 1_000_000),
            expect_accepted_values("sig", ["BULLISH", "BEARISH", "NEUTRAL"]),
            expect_zero_rows("high_ge_low", F.col("high") < F.col("low")),
        ],
    )
    by_name = {r["check"]: r["violations"] for r in rep.results}
    assert by_name["not_null:symbol"] == 1
    assert by_name["between:price[1e-06,1000000]"] == 2  # negative + too large
    assert by_name["accepted_values:sig"] == 1
    assert by_name["singular:high_ge_low"] == 1
    assert not rep.ok and len(rep.failures) == 4


def test_warn_severity_does_not_fail_gate(spark):
    rep = validate(
        _df(spark),
        [expect_between("price", 0, 100, severity="warn")],
    )
    assert rep.ok and len(rep.warnings) == 1


def test_unique_and_freshness(spark):
    df = spark.createDataFrame(
        [
            Row(symbol="A", trade_date="2024-01-01", ts="2020-01-01 00:00:00"),
            Row(symbol="A", trade_date="2024-01-01", ts="2020-01-02 00:00:00"),
            Row(symbol="B", trade_date="2024-01-01", ts="2020-01-03 00:00:00"),
        ]
    ).withColumn("ts", F.to_timestamp("ts"))
    rep = validate(
        df,
        [],
        unique_keys=[["symbol", "trade_date"]],
        freshness=("ts", "25 HOURS"),
    )
    by_name = {r["check"]: r for r in rep.results}
    assert by_name["unique:symbol+trade_date"]["violations"] == 1
    fresh = by_name["freshness:ts<25 HOURS"]
    assert fresh["violations"] == 1 and fresh["severity"] == "warn"  # 2020 data is stale
    assert rep.ok is False  # unique is error-severity


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    """Corpus medallion: zones land, counts reconcile, the quality
    gate passes, shards are hive-partitioned, val stays frozen on
    re-run (idempotent overwrite + group-stable split)."""
    import os

    from stock_market_data_pipeline_v2_spark.plans.corpus_pipeline import (
        run_corpus_pipeline,
    )

    out = str(tmp_path / "corpus")
    res = run_corpus_pipeline(spark, "/root/testdata/sf0.001", out)

    assert res.checks.ok
    assert res.silver_rows <= res.raw_rows  # gates + dedup only remove
    assert res.train_rows + res.val_rows == res.silver_rows
    assert 0 < res.val_rows < res.silver_rows
    assert res.n_shards >= 1

    shard_dirs = {
        d for d in os.listdir(f"{out}/gold/shards") if d.startswith("shard_id=")
    }
    assert len(shard_dirs) == res.n_shards

    # frozen eval: identical val membership on re-run
    val1 = sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/gold/validation").collect()
    )
    res2 = run_corpus_pipeline(spark, "/root/testdata/sf0.001", out)
    val2 = sorted(
        r.doc_id for r in spark.read.parquet(f"{out}/gold/validation").collect()
    )
    assert val1 == val2 and res2.val_rows == res.val_rows
