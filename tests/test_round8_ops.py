"""Round-8 operator tests: the histogram sketch's mergeable rollup
(merge-identity contract), plus the round's graph/index additions as
they land. Oracle hash-parity is covered by tools/verify_oracles.py;
these pin the algorithmic claims."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_histogram_rollup_merge_identity(spark):
    """The linear-sketch property, checked as data: per-day (group,
    bin) counts re-summed to the coarse grain must reproduce the
    direct coarse-grain state BIT-identically (integer sums), so
    every merge_diff_* column is exactly 0.0 and merged_* == direct_*
    byte-for-byte."""
    import __spark_entry__ as m

    rows = m.queries()["histogram_daily_rollup"](spark, SF01).collect()
    assert rows, "empty rollup output"
    for r in rows:
        for name in ("p50", "p90", "p99"):
            assert r[f"merge_diff_{name}"] == 0.0, r
            assert r[f"merged_{name}"] == r[f"direct_{name}"], r
        assert r["n_units"] >= 1
        assert r["n_values"] > 0


def test_histogram_rollup_matches_base_sketch(spark):
    """The rollup's merged quantiles must equal the single-shot
    histogram sketch's approx quantiles (same bin edges, same
    threshold rule) — the rollup adds mergeability, not a different
    estimator."""
    import __spark_entry__ as m

    base = {
        r.event_type: r
        for r in m.queries()["event_value_quantile_sketch"](
            spark, SF01
        ).collect()
    }
    roll = {
        r.event_type: r
        for r in m.queries()["histogram_daily_rollup"](
            spark, SF01
        ).collect()
    }
    assert set(base) == set(roll)
    for et, b in base.items():
        r = roll[et]
        for name in ("p50", "p90", "p99"):
            assert r[f"merged_{name}"] == b[f"approx_{name}"], (et, name)
