"""Round-7 operator tests: the profiler's HLL sketch tier (no-Expand
plan contract + estimate sanity), the k-core peel over the
co-purchase graph, and the frozen-weight quality classifier.
Oracle hash-parity is covered by tools/verify_oracles.py; these pin
the algorithmic/plan claims."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_profile_sketch_no_expand(spark):
    """The sketch tier exists to kill the exact tier's full-width
    multi-count-distinct Expand (VERDICT r6 #1/#2): its physical plan
    must contain NO Expand operator and no distinct aggregate — the
    explode into (column, key) pairs is a Generate, and the register
    fold is a plain map-side-combinable agg."""
    import __spark_entry__ as m

    df = m.queries()["profile_lineitem_sketch"](spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in phys
    assert "distinct" not in phys.lower()
    # two scans by design (stats pass + sketch pass), never per-column
    assert phys.count("FileScan") <= 2


def test_profile_sketch_estimates_vs_exact(spark):
    """Sketch-tier accuracy contract, checked against the exact tier:
    identical stats columns; high-cardinality columns inside the
    3-sigma raw-HLL band (m=256 → 19.5%); tiny-cardinality columns
    readable via n_registers (collision-free whp for n << m)."""
    import __spark_entry__ as m

    exact = {
        r.column_name: r
        for r in m.queries()["profile_lineitem"](spark, SF01).collect()
    }
    sk = {
        r.column_name: r
        for r in m.queries()["profile_lineitem_sketch"](spark, SF01).collect()
    }
    assert set(exact) == set(sk)
    m_regs = 256
    band = 3 * 1.04 / m_regs**0.5
    for c, e in exact.items():
        s = sk[c]
        # the non-distinct statistics are identical by construction
        assert (s.n_rows, s.n_null) == (e.n_rows, e.n_null)
        assert (s.min_num, s.max_num) == (e.min_num, e.max_num)
        assert (s.min_str, s.max_str) == (e.min_str, e.max_str)
        if e.n_distinct >= int(2.5 * m_regs) + 1:
            rel = abs(s.hll_estimate - e.n_distinct) / e.n_distinct
            assert rel < band, (c, s.hll_estimate, e.n_distinct)
        elif e.n_distinct <= m_regs // 4:
            # raw estimator saturates here by documented design;
            # n_registers tracks the birthday-occupancy expectation
            # m·(1−(1−1/m)^n) — near-exact for n ≪ m, readable with a
            # 1-line inversion otherwise
            expect = m_regs * (1 - (1 - 1 / m_regs) ** e.n_distinct)
            assert abs(s.n_registers - expect) <= max(2, 0.15 * expect), (
                c,
                s.n_registers,
                e.n_distinct,
                expect,
            )


def test_kcore_python_parity_and_fixpoint(spark):
    """kcore_peel must equal a pure-Python peel of the same graph
    (independent reimplementation, the pagerank-parity pattern), and
    the registered (k=80, iters=8) form must be AT its fixpoint by
    round 8 — i.e. the output is the true k-core, not a truncated
    peel."""
    from collections import defaultdict

    from stock_market_data_pipeline_v2_spark.operators.graph import (
        copurchase_edges,
        kcore_peel,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    edges = copurchase_edges(li)
    adj = defaultdict(set)
    for r in edges.collect():
        adj[r.src].add(r.dst)

    def py_peel(k, iters):
        surv = set(adj)
        deg = {}
        for _ in range(iters):
            deg = {u: len(adj[u] & surv) for u in adj}
            surv = {u for u, d in deg.items() if d >= k}
        return {u: deg[u] for u in surv}

    for k in (10, 60, 80):
        got = {
            r.l_partkey: r.core_degree
            for r in kcore_peel(li, k=k, iters=8).collect()
        }
        assert got == py_peel(k, 8), f"k={k}"
    # fixpoint of the registered form at the driver's gate scale:
    # one extra round changes nothing
    li01 = spark.read.parquet(f"{SF01}/lineitem.parquet")
    r8 = {
        (r.l_partkey, r.core_degree)
        for r in kcore_peel(li01, k=80, iters=8).collect()
    }
    r9 = {
        (r.l_partkey, r.core_degree)
        for r in kcore_peel(li01, k=80, iters=9).collect()
    }
    assert r8 == r9 and len(r8) > 0


def test_quality_classifier_separation_out_of_sample(spark):
    """The frozen weights were distilled from the heuristic
    quality_score on sf0.01; they must SEPARATE out-of-sample — AUC of
    quality_logit against top-30%-vs-bottom-30% heuristic labels on
    sf0.001 (never seen in training) well above chance — and the
    decision flag must be the logit's own sign."""
    import bisect

    from stock_market_data_pipeline_v2_spark.operators.classifier import (
        quality_classifier,
    )
    from stock_market_data_pipeline_v2_spark.operators.text import text_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    logits = {r.doc_id: r for r in quality_classifier(docs).collect()}
    scored = sorted(
        (r.quality_score, r.doc_id) for r in text_stats(docs).collect()
    )
    k = int(0.3 * len(scored))
    neg = sorted(logits[d].quality_logit for _, d in scored[:k])
    pos = [logits[d].quality_logit for _, d in scored[-k:]]
    wins = sum(bisect.bisect_left(neg, s) for s in pos)
    auc = wins / (len(pos) * len(neg))
    assert auc > 0.85, auc
    for r in logits.values():
        assert r.predicted_high_quality == (r.quality_logit > 0) or (
            r.quality_logit == 0
        )


def test_hll_set_overlap_invariants(spark):
    """Structural invariants of the register set algebra: union
    registers are the element-wise max, so est_union >= each side's
    estimate and the union estimate equals the DIRECT sketch of the
    concatenated pair (mergeability — same law hll_rollup
    oracle-checks); est_intersection is exactly the inclusion-
    exclusion combination; rel_error is the (signed) measured
    accuracy of that combination."""
    from stock_market_data_pipeline_v2_spark.operators.sketches import (
        hll_estimate_only,
        hll_set_overlap,
    )
    from stock_market_data_pipeline_v2_spark.sources.io import load_table
    from stock_market_data_pipeline_v2_spark.session import configure_runtime

    configure_runtime(spark)
    ev = load_table(spark, SF01, "events")
    rows = hll_set_overlap(ev, "event_type", "user_id", p=5).collect()
    assert len(rows) == 10  # C(5,2) event-type pairs
    # direct estimates of each pairwise union, for the mergeability check
    pairs = {(r.type_a, r.type_b): r for r in rows}
    for (a, b), r in pairs.items():
        assert r.est_union >= r.est_a - 1e-9
        assert r.est_union >= r.est_b - 1e-9
        assert abs((r.est_a + r.est_b - r.est_union) - r.est_intersection) < 1e-3
        assert r.exact_intersection > 0
        direct = hll_estimate_only(
            ev.filter(F.col("event_type").isin(a, b)).select(
                F.lit("u").alias("g"), "user_id"
            ),
            ["g"],
            "user_id",
            p=5,
        ).collect()[0]
        assert abs(direct.hll_estimate - r.est_union) < 1e-6, (a, b)


def test_embedding_top_component_vs_numpy(spark):
    """The integer power iteration must land on the TRUE dominant
    eigenvector: |cosine| vs numpy's float64 eigensolver on the exact
    normalized-embedding Gram matrix >= 0.999, and the Rayleigh
    eigenvalue within 1% of numpy's lambda_max. (The oracle gate
    checks both engines run the same recurrence; THIS checks the
    recurrence solves the right problem.)"""
    import numpy as np

    from stock_market_data_pipeline_v2_spark.operators.eigen import (
        embedding_top_component,
    )

    embs = spark.read.parquet(f"{SF01}/embeddings.parquet")
    rows = embedding_top_component(embs, dim=64, iters=14, squarings=5).collect()
    assert len(rows) == 64
    v = np.array([r.loading for r in sorted(rows, key=lambda r: r.pos)])
    lam = rows[0].eigenvalue
    assert all(r.eigenvalue == lam for r in rows)

    U = np.array(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in embs.collect()
        ]
    )
    U = U[np.linalg.norm(U, axis=1) > 0]
    U = U / np.linalg.norm(U, axis=1, keepdims=True)
    G = U.T @ U
    evals, evecs = np.linalg.eigh(G)
    top = evecs[:, -1]
    assert abs(float(v @ top)) >= 0.999, float(v @ top)
    assert abs(lam - evals[-1]) <= 0.01 * evals[-1], (lam, evals[-1])


def test_profile_drift_sketch_no_expand(spark):
    """The drift audit's sketch tier carries the same plan contract
    as the profile sketch tier: zero Expand, no distinct aggregate,
    at most four scans (two per slice)."""
    import __spark_entry__ as m

    df = m.queries()["lineitem_profile_drift_sketch"](spark, SF)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in phys
    assert "distinct" not in phys.lower()
    assert phys.count("FileScan") <= 4
    rows = {r.column_name: r for r in df.collect()}
    assert set(rows) == {c for c, _ in __import__(
        "stock_market_data_pipeline_v2_spark.operators.profiling",
        fromlist=["LINEITEM_PROFILE_SPEC"],
    ).LINEITEM_PROFILE_SPEC}
    r = rows["l_orderkey"]
    assert r.rows_a > 0 and r.rows_b > 0 and r.null_frac_a == 0.0


def test_source_quality_profile_consistency(spark):
    """The per-source rollup must be arithmetically consistent with
    the underlying classifier output (n_high = count of positive
    flags per source; kept_frac = n_high/n_docs; mean_logit = mean of
    the 6-dp logits to well under the 6-dp output rounding)."""
    from collections import defaultdict

    from stock_market_data_pipeline_v2_spark.operators.classifier import (
        quality_classifier,
        source_quality_profile,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    per_doc = {r.doc_id: r for r in quality_classifier(docs).collect()}
    src_of = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    agg = defaultdict(lambda: [0, 0, 0.0])
    for d, r in per_doc.items():
        a = agg[src_of[d]]
        a[0] += 1
        a[1] += int(r.predicted_high_quality)
        a[2] += r.quality_logit
    rows = {r.source: r for r in source_quality_profile(docs).collect()}
    assert set(rows) == set(agg)
    for s, (n, h, sl) in agg.items():
        r = rows[s]
        assert (r.n_docs, r.n_high) == (n, h)
        assert abs(r.kept_frac - h / n) < 1e-6
        assert abs(r.mean_logit - sl / n) < 2e-6


def test_weighted_median_python_parity(spark):
    """weighted_median must equal an independent pure-Python weighted
    quantile (cumulative-weight definition) at several q values,
    including q=1 (max) and a group where the boundary lands on a
    tied value."""
    from collections import defaultdict

    from stock_market_data_pipeline_v2_spark.operators.stats import (
        weighted_median,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    rows = li.select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    data = defaultdict(list)
    for r in rows:
        data[r.l_returnflag].append(
            (float(r.l_extendedprice), int(r.l_quantity))
        )

    def py_wq(vals, qn, qd):
        per_value = defaultdict(int)
        for v, w in vals:
            per_value[v] += w
        tot = sum(per_value.values())
        cum = 0
        for v in sorted(per_value):
            cum += per_value[v]
            if cum * qd >= tot * qn:
                return v, tot
        raise AssertionError

    for qn, qd in ((1, 2), (1, 4), (9, 10), (1, 1)):
        got = {
            r.l_returnflag: (r.weighted_quantile, r.total_weight)
            for r in weighted_median(
                li, ["l_returnflag"], "l_extendedprice", "l_quantity",
                q_num=qn, q_den=qd,
            ).collect()
        }
        for flag, vals in data.items():
            v, tot = py_wq(vals, qn, qd)
            assert got[flag] == (v, tot), (flag, qn, qd, got[flag], (v, tot))


def test_classifier_auc_report_python_parity(spark):
    """The in-engine rank-sum AUC must equal an independent Python
    tie-adjusted Mann-Whitney computation on the same labels (labels
    re-derived with the same (quality_score, doc_id) rank and
    (3n) div 10 cut)."""
    from collections import defaultdict

    from stock_market_data_pipeline_v2_spark.operators.classifier import (
        classifier_auc_report,
        quality_classifier,
    )
    from stock_market_data_pipeline_v2_spark.operators.text import text_stats

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    got = {r.source: r for r in classifier_auc_report(docs).collect()}
    logits = {r.doc_id: r.quality_logit for r in quality_classifier(docs).collect()}
    by_src = defaultdict(list)
    for r in text_stats(docs).collect():
        by_src[r.source].append((r.quality_score, r.doc_id))
    for src, rows in by_src.items():
        rows.sort()
        n = len(rows)
        k = (3 * n) // 10
        labeled = [(logits[d], 0) for _, d in rows[:k]] + [
            (logits[d], 1) for _, d in rows[n - k:]
        ]
        # tie-adjusted rank sum over positives
        labeled.sort()
        i, r2 = 0, 0
        while i < len(labeled):
            j = i
            while j < len(labeled) and labeled[j][0] == labeled[i][0]:
                j += 1
            # average rank of the tie block, in half-units: i+1 .. j
            avg2 = (i + 1) + j  # 2 * (i+1+j)/2
            r2 += sum(avg2 for s, lab in labeled[i:j] if lab == 1)
            i = j
        npos = sum(lab for _, lab in labeled)
        nneg = len(labeled) - npos
        auc = (r2 - npos * (npos + 1)) / (2 * npos * nneg)
        g = got[src]
        assert (g.n_pos, g.n_neg) == (npos, nneg), src
        assert abs(g.auc - auc) < 1e-6, (src, g.auc, auc)
        assert g.auc > 0.75, (src, g.auc)  # the model separates per source too


def test_copurchase_rules_python_parity(spark):
    """Association rules must equal an independent pure-Python
    computation of supports/confidences/lift (including the
    deterministic top-k tiebreak)."""
    from collections import defaultdict
    from itertools import combinations

    from stock_market_data_pipeline_v2_spark.operators.graph import (
        copurchase_rules,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    baskets = defaultdict(set)
    for r in li.select("l_orderkey", "l_partkey").distinct().collect():
        baskets[r.l_orderkey].add(r.l_partkey)
    n = len(baskets)
    item = defaultdict(int)
    pair = defaultdict(int)
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        for a, b in combinations(sorted(parts), 2):
            pair[(a, b)] += 1
    order = sorted(pair.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = copurchase_rules(li, top_k=20).collect()
    assert len(got) == 20
    for rank, ((a, b), nab) in enumerate(order, start=1):
        r = got[rank - 1]
        assert (r.rule_rank, r.part_a, r.part_b, r.pair_orders) == (
            rank, a, b, nab,
        )
        assert (r.orders_a, r.orders_b) == (item[a], item[b])
        assert abs(r.support - nab / n) < 1e-6
        assert abs(r.conf_a_to_b - nab / item[a]) < 1e-6
        assert abs(r.conf_b_to_a - nab / item[b]) < 1e-6
        assert abs(r.lift - nab * n / (item[a] * item[b])) < 1e-5
