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


def test_part_components_linear_plan(spark):
    """The K-round propagation must stay LINEAR in the round count:
    the min(own, nbr_min) left-join form referenced the label frame
    twice per round and doubled the logical plan per round (511
    SortMergeJoins at K=8). The self-loop formulation references it
    once; a handful of join nodes total, never hundreds."""
    import __spark_entry__ as m

    df = m.queries()["part_components"](spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("SortMergeJoin") <= 2, phys.count("SortMergeJoin")
    assert phys.count("Exchange") <= 12, phys.count("Exchange")


def test_cms_rollup_merge_identity(spark):
    """Linear-sketch property for the frequency sketch: per-day
    counter tables summed to the global sketch must reproduce the
    direct counter table bit-for-bit, so merge_diff == 0 for every
    probed key and the CMS overestimate invariant (>= 0) holds on the
    merged state."""
    import __spark_entry__ as m

    rows = m.queries()["cms_daily_rollup"](spark, SF01).collect()
    assert rows, "empty rollup output"
    for r in rows:
        assert r.merge_diff == 0, r
        assert r.merged_estimate == r.direct_estimate, r
        assert r.overestimate >= 0, r
        assert r.merged_estimate >= r.exact_count, r
        assert r.n_units >= 1 and r.n_total > 0


def test_pq_subspace_profile_invariants(spark):
    """PQ health-report consistency: every subspace sees the whole
    corpus exactly once, code usage is bounded by ksub, the heaviest
    code's load is consistent with the counts, and quantization error
    on unit subvectors is bounded (each subvector and center live in
    the unit ball, so e2 <= 4)."""
    import __spark_entry__ as m
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    rows = m.queries()["pq_subspace_profile"](spark, SF01).collect()
    n_corpus = load_table(spark, SF01, "embeddings").count()
    assert len(rows) == 16  # m subspaces
    for r in rows:
        assert r.n_vectors == n_corpus, r
        assert 1 <= r.codes_used <= 16, r
        assert r.max_code_load <= r.n_vectors, r
        assert r.max_code_load * r.codes_used >= r.n_vectors, r
        assert 0.0 <= r.mean_sqerr <= r.max_sqerr + 1e-6, r
        assert r.max_sqerr <= 4.0 + 1e-6, r
        approx = r.sum_sqerr_q / (r.n_vectors * 1e9)
        assert abs(approx - r.mean_sqerr) < 1e-5, r


def test_bloom_rollup_merge_identity(spark):
    """OR-merge identity for the membership sketch: per-day filters
    OR-merged must equal the direct filter word-for-word (words_diff
    == 0), every probe verdict must agree between the two, and the
    no-false-negative law must hold on every expected-present key."""
    import __spark_entry__ as m

    rows = m.queries()["bloom_daily_rollup"](spark, SF01).collect()
    assert rows, "empty rollup output"
    assert len(rows) == 40  # top-20 present + 20 absent-offset probes
    for r in rows:
        assert r.words_diff == 0, r
        assert r.merge_diff is False, r
        assert r.in_merged == r.in_direct, r
        assert r.no_false_negative is True, r
        if r.expected:
            assert r.in_merged, r


def test_round8_star_shapes_plan_contracts(spark):
    """Q3/Q12/Q20 adaptations: every dim-sized side broadcasts (the
    only SortMergeJoin allowed is the fact⋈fact orderkey join in
    Q3/Q12 — at a bucketed layout it would be co-located), date
    predicates push into the scans, and Q20's dominance path carries
    no extra fact scan (per-part totals re-aggregate from the
    (part, supplier) partials)."""
    import __spark_entry__ as m

    qs = m.queries()
    # Q20: everything broadcast or re-aggregated — no SMJ at all
    phys20 = (
        qs["dominant_part_suppliers"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in phys20
    assert phys20.count("FileScan parquet") <= 4  # lineitem once
    # Q3: customer-segment semi is broadcast; date filters pushed
    df3 = qs["shipping_priority_topk"](spark, SF)
    phys3 = df3._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in phys3 and "LeftSemi" in phys3
    assert "TakeOrderedAndProject" in phys3  # top-k never a full sort
    plan3 = df3._jdf.queryExecution().toString()
    assert "PushedFilters" in plan3 and "l_shipdate" in plan3
    # Q12: integer CASE counts over one joined pass — single agg pair
    phys12 = (
        qs["returnflag_priority_counts"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert phys12.count("FileScan parquet") == 2  # one pass per fact


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
