"""Round-6 operator tests: the cross-engine HLL sketch, sorted-
neighborhood dedup, the O(n) embedding-diversity identity, blocked
fuzzy linkage, the one-pass profiler, and the ranking-window mart.
Oracle hash-parity is covered by tools/verify_oracles.py; these tests
pin the ALGORITHMIC claims (identity vs brute force, recall vs exact
ground truth, sketch mergeability, plan shapes)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_embedding_diversity_matches_bruteforce(spark):
    """The norm-of-sum identity must reproduce the O(n²) mean pairwise
    cosine (computed independently in numpy) to well under the 6-dp
    output rounding."""
    import numpy as np

    from stock_market_data_pipeline_v2_spark.operators.similarity import (
        embedding_diversity,
    )

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {
        r.label: r.avg_pairwise_cosine
        for r in embedding_diversity(embs).collect()
    }
    rows = embs.select("label", "embedding").collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    for label, vecs in by_label.items():
        u = np.stack([v / np.linalg.norm(v) for v in vecs])
        n = len(vecs)
        gram = u @ u.T
        brute = (gram.sum() - np.trace(gram)) / (n * (n - 1))
        assert abs(got[label] - brute) < 1e-5, (label, got[label], brute)


def test_snm_pairs_subset_of_exact_with_high_recall(spark):
    """SNM candidates are verified with the exact shingle-Jaccard
    metric, so precision is 1.0 BY CONSTRUCTION (every emitted pair
    must appear in the exact all-pairs ground truth); recall through
    the two sort passes must hold the documented >= 90%."""
    from stock_market_data_pipeline_v2_spark.operators.dedup import (
        dedup_sorted_neighborhood,
        release_cached_inputs,
        shingle_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    truth_df = shingle_jaccard_pairs(docs, n=3, threshold=0.5)
    truth = {(r.doc_a, r.doc_b) for r in truth_df.collect()}
    release_cached_inputs(truth_df)
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup_sorted_neighborhood(docs, window_size=10).collect()
    }
    assert got <= truth  # exact verification → no false positives
    assert len(got) >= 0.9 * len(truth), (len(got), len(truth))


def test_hll_registers_merge_exactly(spark):
    """Sketch mergeability: registers built on two disjoint halves and
    re-maxed must equal registers built in one pass — the property
    that makes the sketch composable across partitions/days."""
    from stock_market_data_pipeline_v2_spark.operators.sketches import (
        hll_register_table,
    )

    events = spark.read.parquet(f"{SF01}/events.parquet")
    full = hll_register_table(events, ["event_type"], "user_id", p=5)
    h1 = hll_register_table(
        events.filter("event_id % 2 = 0"), ["event_type"], "user_id", p=5
    )
    h2 = hll_register_table(
        events.filter("event_id % 2 = 1"), ["event_type"], "user_id", p=5
    )
    merged = (
        h1.unionByName(h2)
        .groupBy("event_type", "reg_idx")
        .agg(F.max("reg").alias("reg"))
    )
    a = {(r.event_type, r.reg_idx): r.reg for r in full.collect()}
    b = {(r.event_type, r.reg_idx): r.reg for r in merged.collect()}
    assert a == b


def test_hll_estimate_within_error_band(spark):
    """p=5 → standard error 1.04/√32 ≈ 18%; the estimate must sit
    inside 3σ of exact for every group at both small SFs."""
    from stock_market_data_pipeline_v2_spark.operators.sketches import (
        hll_distinct,
    )

    events = spark.read.parquet(f"{SF01}/events.parquet")
    for r in hll_distinct(events, ["event_type"], "user_id", p=5).collect():
        assert abs(r.rel_error) < 3 * 1.04 / math.sqrt(32), r


def test_fuzzy_pairs_block_and_order_invariants(spark):
    from stock_market_data_pipeline_v2_spark.operators.linkage import (
        fuzzy_name_pairs,
    )

    part = spark.read.parquet(f"{SF01}/part.parquet")
    rows = fuzzy_name_pairs(part, "p_name", "p_partkey", max_dist=4).collect()
    assert rows
    for r in rows:
        assert r.name_a < r.name_b
        assert r.name_a.split(" ")[0] == r.block == r.name_b.split(" ")[0]
        assert 0 < r.lev_dist <= 4


def test_profile_table_single_scan_plan(spark):
    """The profiler must stay ONE pass over the table: a single
    FileScan feeding one (expanded) aggregate — per-column subqueries
    would read the table once per column."""
    import __spark_entry__ as m

    df = m.queries()["profile_lineitem"](spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("FileScan") == 1
    # and the profile itself is sane on the known lineitem shape
    rows = {r.column_name: r for r in df.collect()}
    assert rows["l_orderkey"].n_null == 0
    assert rows["l_returnflag"].min_str == "A"
    assert rows["l_shipdate"].min_str is not None


def test_order_value_distribution_plan_and_coverage(spark):
    """Dim join broadcasts (never SortMergeJoin); deciles 1..10 per
    segment; per-segment decile counts differ by at most 1 (the ntile
    contract)."""
    import __spark_entry__ as m

    df = m.queries()["order_value_distribution"](spark, SF01)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in phys
    assert "BroadcastHashJoin" in phys
    rows = df.collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.segment, []).append(r)
    for seg, rs in by_seg.items():
        assert sorted(x.decile for x in rs) == list(range(1, 11))
        counts = [x.n_orders for x in rs]
        assert max(counts) - min(counts) <= 1


def test_type_token_stats_invariants(spark):
    from stock_market_data_pipeline_v2_spark.operators.text import (
        type_token_stats,
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    for r in type_token_stats(docs).collect():
        assert r.hapax_tokens <= r.distinct_tokens <= r.total_tokens
        assert 0.0 < r.type_token_ratio <= 1.0
        assert r.top_token_count * r.n_docs >= r.top_token_count
        assert 0.0 < r.top_token_share <= 1.0


def test_bloom_decontaminate_no_false_negatives(spark):
    """A Bloom filter can only over-report membership: per doc,
    bloom hits >= exact hits (zero false negatives), fp >= 0, and
    the drop verdict covers every exactly-contaminated doc."""
    from stock_market_data_pipeline_v2_spark.operators.dedup import (
        bloom_decontaminate,
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    rows = bloom_decontaminate(
        docs.filter("doc_id % 10 != 0"), docs.filter("doc_id % 10 = 0")
    ).collect()
    assert rows
    exact_contaminated = 0
    for r in rows:
        assert r.n_bloom_hits >= r.n_exact_hits
        assert r.n_false_positives >= 0
        assert r.drop == (r.n_bloom_hits > 0)
        if r.n_exact_hits > 0:
            exact_contaminated += 1
            assert r.drop
    assert exact_contaminated > 0  # the split must actually overlap


def test_bloom_state_is_fixed_size(spark):
    """The filter's word table is bounded by ceil(m/32) rows no
    matter how many keys were inserted — the property that makes it
    broadcastable when the exact key set is not."""
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_v2_spark.operators.sketches import (
        bloom_build_words,
    )

    m_bits, k = 1 << 10, 5
    keys = spark.range(100000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    words = bloom_build_words(keys, "key", m_bits, k)
    assert words.count() <= m_bits // 32


def test_histogram_quantile_error_within_one_bin(spark):
    """Upper-edge estimator contract: exact quantile lies inside the
    crossing bin, so 0 <= approx - exact <= bin width (+6dp slack)."""
    from stock_market_data_pipeline_v2_spark.operators.sketches import (
        histogram_quantile_sketch,
    )
    import __spark_entry__ as m

    events = m.queries()["event_value_quantile_sketch"](spark, SF01)
    for r in events.collect():
        for q in ("p50", "p90", "p99"):
            err = getattr(r, f"err_{q}")
            assert -1e-6 <= err <= r.bin_width + 1e-6, (r, q)


def test_event_transitions_rows_normalize(spark):
    from stock_market_data_pipeline_v2_spark.operators.stats import (
        event_transitions,
    )
    from stock_market_data_pipeline_v2_spark.session import configure_runtime
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    configure_runtime(spark)
    rows = event_transitions(load_table(spark, SF01, "events")).collect()
    assert rows
    by_prev: dict[str, float] = {}
    for r in rows:
        assert r.n_transitions > 0
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p_transition
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-4, (prev, total)


def test_pagerank_matches_pure_python_fixed_point(spark):
    """The integer micro-unit PageRank must match an INDEPENDENT
    pure-Python big-int reimplementation exactly — the property that
    makes K chained iterations oracle-gateable at all."""
    from stock_market_data_pipeline_v2_spark.operators.graph import (
        SCALE,
        copurchase_edges,
        pagerank_copurchase,
    )
    from stock_market_data_pipeline_v2_spark.operators.dedup import (
        release_cached_inputs,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    got_df = pagerank_copurchase(li, iters=5)
    got = {r.l_partkey: r.pagerank_scaled for r in got_df.collect()}

    edges = [(r.src, r.dst) for r in copurchase_edges(li).collect()]
    release_cached_inputs(got_df)
    nodes = sorted({r.l_partkey for r in li.select("l_partkey").distinct().collect()})
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    r = {p: SCALE // n for p in nodes}
    for _ in range(5):
        sums = {p: 0 for p in nodes}
        for s, ds in out.items():
            c = r[s] // len(ds)
            for d in ds:
                sums[d] += c
        r = {p: (15 * SCALE) // (100 * n) + (85 * sums[p]) // 100 for p in nodes}
    assert got == r
    # mass sanity: total stays within N dropped remainders per step
    assert abs(sum(r.values()) - SCALE) < 6 * n + SCALE * 15 // 100


def test_prefix_filter_is_lossless(spark):
    """The ppjoin prefix lemma: prefix-filtered candidates must
    reproduce the UNCAPPED exact all-pairs result EXACTLY — same
    pairs, same jaccard values (unlike df-cap or SNM, no recall
    trade at all)."""
    from stock_market_data_pipeline_v2_spark.operators.dedup import (
        jaccard_prefix_filter_pairs,
        release_cached_inputs,
        shingle_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    exact_df = shingle_jaccard_pairs(
        docs, n=3, threshold=0.5, max_shingle_freq=10**9
    )
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in exact_df.collect()}
    release_cached_inputs(exact_df)
    pref_df = jaccard_prefix_filter_pairs(docs, n=3, threshold=0.5)
    pref = {(r.doc_a, r.doc_b): r.jaccard for r in pref_df.collect()}
    release_cached_inputs(pref_df)
    assert pref == exact and len(pref) > 0


def test_hll_rollup_merge_identity(spark):
    """Registers merged from the fine grain must produce EXACTLY the
    direct estimate (max is associative) — the identity the rollup
    query also oracle-checks per group."""
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_v2_spark.operators.sketches import (
        hll_rollup,
    )
    from stock_market_data_pipeline_v2_spark.session import configure_runtime
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    configure_runtime(spark)
    rows = hll_rollup(
        load_table(spark, SF01, "events"),
        ["event_type"],
        F.to_date(F.col("ts")),
        "user_id",
        p=5,
    ).collect()
    assert rows
    for r in rows:
        assert r.merged_minus_direct == 0.0, r
        assert r.n_units > 1  # the merge actually merged something


def test_cms_counters_merge_by_sum(spark):
    """CMS is a LINEAR sketch: counters built on two disjoint halves
    and SUMMED must equal counters built in one pass — the property
    that merges shard/day sketches without touching raw keys. Also:
    estimates never underestimate."""
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_v2_spark.operators.sketches import (
        cms_counter_table,
        cms_point_estimates,
    )

    events = spark.read.parquet(f"{SF01}/events.parquet").select(
        F.col("user_id").cast("string").alias("k"), "event_id"
    )
    full = cms_counter_table(events, "k", depth=4, width=256)
    h1 = cms_counter_table(events.filter("event_id % 2 = 0"), "k", 4, 256)
    h2 = cms_counter_table(events.filter("event_id % 2 = 1"), "k", 4, 256)
    merged = (
        h1.unionByName(h2)
        .groupBy("row_idx", "pos")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    a = {(r.row_idx, r.pos): r.cnt for r in full.collect()}
    b = {(r.row_idx, r.pos): r.cnt for r in merged.collect()}
    assert a == b
    exact = events.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("c"))
    est = cms_point_estimates(exact, "k", full, depth=4, width=256)
    for r in est.collect():
        assert r.cms_estimate >= r.c, r


def test_triangle_stats_matches_bruteforce(spark):
    """Degree-ordered counting must agree with a brute-force python
    triangle count on the sf0.001 graph."""
    from itertools import combinations

    from stock_market_data_pipeline_v2_spark.operators.graph import (
        copurchase_edges,
        triangle_stats,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = {
        r.l_partkey: (r.degree, r.triangles)
        for r in triangle_stats(li).collect()
    }
    adj: dict[int, set[int]] = {}
    for r in copurchase_edges(li).collect():
        adj.setdefault(r.src, set()).add(r.dst)
    tri = {p: 0 for p in got}
    for u, nbrs in adj.items():
        for a, b in combinations(sorted(nbrs), 2):
            if b in adj.get(a, ()):  # noqa: SIM110
                tri[u] += 1
    for p, (deg, t) in got.items():
        assert deg == len(adj.get(p, ())), p
        assert t == tri.get(p, 0), (p, t, tri.get(p))


def test_return_moments_match_numpy(spark):
    """The integer-power-sum skew/kurt must agree with numpy's
    population moments on the quantized micro-returns to well under
    the 6-dp output rounding."""
    import numpy as np

    import __spark_entry__ as m

    got = {
        r.symbol: r for r in m.queries()["return_moments"](spark, SF01).collect()
    }
    rets = m.queries()["daily_returns"](spark, SF01).select(
        "symbol", "daily_return_pct"
    ).collect()
    by_sym: dict[str, list[float]] = {}
    for r in rets:
        if r.daily_return_pct is not None:
            by_sym.setdefault(r.symbol, []).append(r.daily_return_pct)
    for sym, vals in by_sym.items():
        k = np.array([round(v * 1e4) for v in vals], dtype=np.float64)
        m2 = ((k - k.mean()) ** 2).mean()
        m3 = ((k - k.mean()) ** 3).mean()
        m4 = ((k - k.mean()) ** 4).mean()
        g = got[sym]
        assert abs(g.skewness - m3 / m2**1.5) < 1e-4, sym
        assert abs(g.excess_kurtosis - (m4 / m2**2 - 3)) < 1e-4, sym
        assert g.n_days == len(vals)


def test_return_outliers_robustness_invariants(spark):
    """Flagged days must genuinely exceed k·MAD, and the flagged set
    must be a strict minority (MAD breaks down only past 50%
    contamination)."""
    import __spark_entry__ as m

    rows = m.queries()["return_outliers"](spark, SF01).collect()
    assert rows
    all_rets = m.queries()["daily_returns"](spark, SF01).filter(
        "daily_return_pct IS NOT NULL"
    ).count()
    # MAD guarantees the flagged set is a minority (50% breakdown
    # point); the synthetic corpus is fat-tailed enough that a tight
    # "rare" bound would test the data, not the operator.
    assert len(rows) < 0.5 * all_rets
    for r in rows:
        assert r.mad_ratio > 5.0, r
        assert abs(r.daily_return_pct - r.median_return) > 0, r
