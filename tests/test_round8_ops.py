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


def test_part_components_equals_exact_cc(spark):
    """8-round min-label propagation must equal TRUE connected
    components (star-contraction kernel, convergence-checked) on the
    co-purchase graph: every component's diameter is <= 8 at tested
    SFs, so the K-step form is exact CC, not an approximation.
    Isolated parts (never co-ordered with another part) must label
    themselves."""
    import __spark_entry__ as m
    from stock_market_data_pipeline_v2_spark.operators.dedup import (
        dedup_clusters_star,
    )
    from stock_market_data_pipeline_v2_spark.operators.graph import (
        copurchase_edges,
    )
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    got = {
        r.l_partkey: (r.component_id, r.component_size)
        for r in m.queries()["part_components"](spark, SF).collect()
    }
    edges = copurchase_edges(load_table(spark, SF, "lineitem"))
    exact = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters_star(
            edges.select(
                F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
            )
        ).collect()
    }
    linked = set(exact)
    for part, (comp, size) in got.items():
        if part in linked:
            assert comp == exact[part], part
        else:
            assert comp == part and size == 1, part
    # sizes consistent with the label multiset
    from collections import Counter

    cnt = Counter(comp for comp, _ in got.values())
    for part, (comp, size) in got.items():
        assert size == cnt[comp], part


def test_ivf_cluster_profile_invariants(spark):
    """Index-health report consistency: member counts partition the
    corpus (every vector has exactly one home cell), unit-sphere
    squared distances are bounded by 4, centroid norms by 1 (means of
    unit vectors), and quantized inertia is consistent with the
    reported mean."""
    import __spark_entry__ as m
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    rows = m.queries()["ivf_cluster_profile"](spark, SF01).collect()
    n_corpus = load_table(spark, SF01, "embeddings").count()
    assert sum(r.n_members for r in rows) == n_corpus
    for r in rows:
        assert r.centroid_norm <= 1.0 + 1e-9, r
        if r.n_members == 0:
            assert r.sum_sqdist_q == 0 and r.mean_sqdist is None, r
            continue
        assert 0.0 <= r.max_sqdist <= 4.0 + 1e-6, r
        assert 0.0 <= r.mean_sqdist <= r.max_sqdist + 1e-6, r
        approx = r.sum_sqdist_q / (r.n_members * 1e9)
        assert abs(approx - r.mean_sqdist) < 1e-5, r


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
