"""Round-10 operator tests: the IVF twin of the LOO 1-NN label
eval (vote coverage + recall vs the exact tier), the two-level
salted bottom-k swap for label_loo_outliers, the keyed-state fold's
batch twin (structural streaming↔batch identity), and the lineage
registry's consistency gate. Oracle hash-parity is covered by
tools/verify_oracles.py; these pin the algorithmic claims."""

from __future__ import annotations

SF01 = "/root/testdata/sf0.01"


def _embs(spark, sf=SF01):
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    return load_table(spark, sf, "embeddings")


def test_knn_label_eval_ivf_coverage_and_recall(spark):
    """The IVF tier must (a) cast a vote for EVERY corpus vector at
    the registered geometry (probe-16 covers the home cell, so no
    query goes candidate-less), and (b) agree with the exact tier's
    per-label accuracy closely — the probed 1-NN is the true 1-NN
    whenever the true 1-NN's home cell is probed, which the n_probe
    recall measurements (ivf_topk, 0.92 at n=500) make the common
    case."""
    from stock_market_data_pipeline_v2_spark.operators.similarity import (
        build_ivf_index,
        knn_label_eval,
        knn_label_eval_ivf,
    )

    embs = _embs(spark)
    n = embs.count()
    idx = build_ivf_index(embs, n_assign=3, persist=True)
    try:
        ivf = {r.label: r for r in knn_label_eval_ivf(embs, index=idx).collect()}
        exact = {r.label: r for r in knn_label_eval(embs).collect()}
    finally:
        idx.release()
    assert set(ivf) == set(exact)
    # (a) full vote coverage: every corpus vector votes in BOTH tiers
    assert sum(r.n_vectors for r in ivf.values()) == n
    for lab, ex in exact.items():
        assert ivf[lab].n_vectors == ex.n_vectors
    # (b) aggregate agreement: per-label accuracy within 10 points,
    # overall within 5 — an IVF eval that diverged more would be
    # reporting the index's recall, not the labels' quality.
    tot_ex = sum(r.correct_1nn for r in exact.values())
    tot_ivf = sum(r.correct_1nn for r in ivf.values())
    assert abs(tot_ivf - tot_ex) / n <= 0.05
    for lab, ex in exact.items():
        assert abs(ivf[lab].accuracy - ex.accuracy) <= 0.10


def test_label_loo_outliers_salt_prune_is_lossless(spark):
    """The r10 two-level swap's correctness argument, pinned as a
    property: the per-(salt, label) local bottom-k prune must be
    LOSSLESS — ranking the survivors equals ranking the full scored
    frame, for any salt modulus — because every true per-label
    bottom-k row is within its own salt group's bottom-k. Checked by
    comparing the registered operator against a brute rebuild that
    ranks with one plain per-label window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_v2_spark.operators import centroids as C

    embs = _embs(spark)
    got = C.label_loo_outliers(embs).collect()

    # brute twin: same exact-integer LOO scores, single plain window
    from stock_market_data_pipeline_v2_spark.functions.core import round_away
    from stock_market_data_pipeline_v2_spark.functions.vectors import (
        as_double,
        l2_norm_unrolled,
    )
    from stock_market_data_pipeline_v2_spark.operators.eigen import Q_SCALE

    base = (
        embs.select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            as_double(F.col("embedding")).alias("__v"),
        )
        .withColumn("__n", l2_norm_unrolled("__v", 64))
        .filter(F.col("__n") > 0)
    )
    coords = base.select(
        "vec_id",
        "label",
        F.posexplode("__v").alias("__i0", "__val"),
        "__n",
    ).select(
        "vec_id",
        "label",
        (F.col("__i0") + 1).alias("i"),
        round_away(F.col("__val") / F.col("__n") * F.lit(float(Q_SCALE)), 0)
        .cast("long")
        .alias("q"),
    )
    sums = coords.groupBy("label", "i").agg(F.sum("q").cast("long").alias("s"))
    ss = sums.groupBy("label").agg(
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s")).alias("__ss")
    )
    dots = (
        coords.join(F.broadcast(sums), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("s")).alias("__qs"),
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("__qq"),
        )
    )
    scored = (
        dots.join(F.broadcast(ss), "label")
        .withColumn(
            "__den2",
            F.col("__ss")
            - F.lit(2).cast("decimal(38,0)") * F.col("__qs")
            + F.col("__qq"),
        )
        .filter(F.col("__den2") > 0)
        .select(
            "vec_id",
            "label",
            round_away(
                (F.col("__qs") - F.col("__qq")).cast("double")
                / (
                    F.sqrt(F.col("__qq").cast("double"))
                    * F.sqrt(F.col("__den2").cast("double"))
                ),
                6,
            ).alias("loo_cosine"),
        )
    )
    w = Window.partitionBy("label").orderBy(F.asc("loo_cosine"), F.asc("vec_id"))
    brute = (
        scored.withColumn("outlier_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("outlier_rank") <= 3)
        .select("label", "outlier_rank", "vec_id", "loo_cosine")
        .orderBy("label", "outlier_rank")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in brute]


def test_stateful_batch_twin_structural_identity(spark, tmp_path):
    """The r10 driver-visible batch twin: (a) its per-symbol fold is
    BIT-identical to a hand recursion over the sorted rows (the
    recursive-CTE oracle's ops), and (b) a single-micro-batch
    streaming run of stateful_tick_features produces the IDENTICAL
    final state — exact ==, no tolerance — because both paths share
    streaming/stateful.py:_fold_state."""
    import json
    import os

    from stock_market_data_pipeline_v2_spark.streaming.jobs import (
        read_tick_stream,
    )
    from stock_market_data_pipeline_v2_spark.streaming.stateful import (
        stateful_features_batch,
        stateful_tick_features,
    )

    rows = [
        ("AAAA", "2024-01-01 09:00:00", 100.0, 10),
        ("AAAA", "2024-01-01 09:10:00", 104.0, 30),
        ("AAAA", "2024-01-01 09:20:00", 101.5, 0),
        ("BBBB", "2024-01-01 09:10:00", 20.0, 10),
        ("BBBB", "2024-01-01 09:30:00", 22.0, 10),
    ]
    alpha = 0.2

    # hand recursion — the oracle's exact ops
    expect = {}
    for sym in ("AAAA", "BBBB"):
        ema, cum_pv, cum_vol, n = None, 0.0, 0.0, 0
        for s, ts, p, v in rows:
            if s != sym:
                continue
            ema = p if ema is None else (1 - alpha) * ema + alpha * p
            cum_pv = cum_pv + p * float(v)
            cum_vol = cum_vol + float(v)
            n += 1
        import math

        def rnd6(x):
            s6 = x * 1e6
            return (math.floor(s6 + 0.5) if x >= 0 else -math.floor(-s6 + 0.5)) / 1e6

        expect[sym] = (rnd6(ema), rnd6(cum_pv / cum_vol), n)

    batch_df = spark.createDataFrame(
        [(s, ts, p, v) for s, ts, p, v in rows],
        "symbol string, event_time_s string, price double, volume long",
    ).selectExpr(
        "symbol",
        "CAST(event_time_s AS TIMESTAMP) AS event_time",
        "price",
        "volume",
    )
    got = {r.symbol: r for r in stateful_features_batch(batch_df, alpha=alpha).collect()}
    for sym, (ema, vwap, n) in expect.items():
        assert got[sym].ema_price == ema
        assert got[sym].vwap == vwap
        assert got[sym].tick_cnt == n

    # single-micro-batch streaming run: identical final state, exact ==
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    with open(f"{src}/t1.json", "w") as f:
        for s, ts, p, v in rows:
            f.write(
                json.dumps(
                    {
                        "symbol": s,
                        "timestamp": ts,
                        "price": p,
                        "open": p,
                        "high": p,
                        "low": p,
                        "volume": v,
                    }
                )
                + "\n"
            )
    ticks = read_tick_stream(spark, src)
    q = (
        stateful_tick_features(ticks, alpha=alpha)
        .writeStream.format("memory")
        .queryName("r10_stateful")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream = {r.symbol: r for r in spark.sql("select * from r10_stateful").collect()}
    for sym in expect:
        # streaming emits the UNROUNDED running state; the batch twin
        # rounds at the output boundary — re-round for the compare
        import math

        def rnd6(x):
            s6 = x * 1e6
            return (math.floor(s6 + 0.5) if x >= 0 else -math.floor(-s6 + 0.5)) / 1e6

        assert rnd6(stream[sym].ema_price) == got[sym].ema_price
        assert rnd6(stream[sym].vwap) == got[sym].vwap
        assert stream[sym].tick_cnt == got[sym].tick_cnt
        assert stream[sym].last_event_time == got[sym].last_event_time


def test_pipeline_lineage_registry_is_load_bearing():
    """The lineage registry must stay consistent with the engine it
    documents: every engine_impl resolves to a callable in this
    package, every non-source parent is a registered model, the edge
    list is acyclic, and the reference's 8 models + seed are all
    present with their dbt materializations."""
    import importlib

    from stock_market_data_pipeline_v2_spark.plans.lineage import MODELS

    pkg = "stock_market_data_pipeline_v2_spark"
    names = {m["model"] for m in MODELS}
    assert names == {
        "stg_daily_stock_metrics", "stg_realtime_stock_analytics",
        "int_daily_returns", "int_rolling_metrics",
        "int_realtime_enriched", "mart_stock_performance",
        "mart_daily_summary", "mart_realtime_signals", "sp500_tickers",
    }
    for m in MODELS:
        mod, fn = m["engine_impl"].rsplit(".", 1)
        assert callable(getattr(importlib.import_module(f"{pkg}.{mod}"), fn))
        for p in m["parents"]:
            if p is None or p.startswith("source:"):
                continue
            assert p in names, f"{m['model']} depends on unknown {p}"

    # acyclicity via Kahn's algorithm over model→model edges
    deps = {
        m["model"]: {
            p for p in m["parents"] if p and not p.startswith("source:")
        }
        for m in MODELS
    }
    resolved: set = set()
    while deps:
        ready = [n for n, ps in deps.items() if ps <= resolved]
        assert ready, f"cycle among {sorted(deps)}"
        for n in ready:
            resolved.add(n)
            del deps[n]

    mats = {m["model"]: m["materialization"] for m in MODELS}
    assert all(mats[n] == "view" for n in names if n.startswith("stg_"))
    assert all(mats[n] == "ephemeral" for n in names if n.startswith("int_"))
    assert all(mats[n] == "table" for n in names if n.startswith("mart_"))


def test_pool_prune_kernel_edge_cases():
    """The factored-out BLAS prune kernel (shared by cosine_topk_blas
    and the per-cell IVF eval) pinned on its corners: self-pairs
    masked, zero-norm members pruned, within-margin ties kept, and
    empty sides returning an empty typed frame."""
    import numpy as np
    import pandas as pd

    from stock_market_data_pipeline_v2_spark.operators.similarity import (
        _pool_prune_kernel,
    )

    k = _pool_prune_kernel(1, 1e-9)

    def frame(rows):
        return pd.DataFrame(
            {
                "id": [r[0] for r in rows],
                "v": [r[1] for r in rows],
                "is_q": [r[2] for r in rows],
            }
        )

    # query 100 against members 1 (identical), 2 (orthogonal),
    # 3 (zero-norm), and itself (id 100 present as member too)
    out = k(
        None,
        frame(
            [
                (1, [1.0, 0.0], False),
                (2, [0.0, 1.0], False),
                (3, [0.0, 0.0], False),
                (100, [1.0, 0.0], False),  # self as member
                (100, [1.0, 0.0], True),
            ]
        ),
    )
    pairs = set(zip(out["query_id"], out["neighbor_id"]))
    assert (100, 1) in pairs          # the true top-1 survives
    assert (100, 100) not in pairs    # self-pair masked
    assert (100, 3) not in pairs      # zero-norm loses every rank
    # within-margin tie: two identical members both kept at k=1
    out2 = k(
        None,
        frame(
            [
                (1, [1.0, 0.0], False),
                (2, [1.0, 0.0], False),
                (9, [1.0, 0.0], True),
            ]
        ),
    )
    pairs2 = set(zip(out2["query_id"], out2["neighbor_id"]))
    assert pairs2 == {(9, 1), (9, 2)}
    # empty member side
    out3 = k(None, frame([(9, [1.0, 0.0], True)]))
    assert len(out3) == 0 and out3["query_id"].dtype == np.int64


def test_ivf_eval_probe_forms_identical(spark):
    """The n_cells<100 branch in knn_label_eval_ivf is a PHYSICAL
    plan choice only: the codegen probe ranking and the
    BLAS-superset + exact-re-rank form must produce the identical
    report on the same index (the margin proof, pinned as data)."""
    from stock_market_data_pipeline_v2_spark.operators.similarity import (
        build_ivf_index,
        knn_label_eval_ivf,
    )

    embs = _embs(spark)
    idx = build_ivf_index(embs, n_assign=3, persist=True)
    try:
        small = knn_label_eval_ivf(
            embs, index=idx, force_blas_probes=False
        ).collect()
        blas = knn_label_eval_ivf(
            embs, index=idx, force_blas_probes=True
        ).collect()
    finally:
        idx.release()
    assert [tuple(r) for r in small] == [tuple(r) for r in blas]


def _txn_rows(spark, rows):
    return spark.createDataFrame(
        rows, "k long, v string, ver long"
    )


def test_txn_table_snapshot_isolation_and_time_travel(spark, tmp_path):
    """A reader pinned at version N sees the identical rows after a
    later commit (immutable files + versioned manifests), the latest
    read sees the merge, and history records the lineage."""
    from stock_market_data_pipeline_v2_spark.sources.txn_table import TxnTable

    t = TxnTable.create(
        spark, str(tmp_path / "t"), _txn_rows(spark, [(1, "a", 1), (2, "b", 1)])
    )
    pinned = t.read(spark, 1)
    before = sorted(tuple(r) for r in pinned.collect())
    t.merge(
        spark,
        _txn_rows(spark, [(2, "B", 2), (3, "c", 2)]),
        keys=["k"],
        version_col="ver",
    )
    # pinned snapshot unchanged; fresh read shows the merge
    assert sorted(tuple(r) for r in t.read(spark, 1).collect()) == before
    latest = {r.k: (r.v, r.ver) for r in t.read(spark).collect()}
    assert latest == {1: ("a", 1), 2: ("B", 2), 3: ("c", 2)}
    assert [h["op"] for h in t.history()] == ["create", "merge"]
    assert t.latest_version() == 2


def test_txn_table_conflict_retry_is_serializable(spark, tmp_path):
    """A merge that loses the commit race must re-read the WINNER's
    snapshot and re-apply — no committed update may be lost. The race
    is forced deterministically: an interloper merge commits between
    the loser's snapshot read and its commit attempt."""
    from stock_market_data_pipeline_v2_spark.sources import txn_table as tt

    root = str(tmp_path / "t")
    t = tt.TxnTable.create(spark, root, _txn_rows(spark, [(1, "a", 1)]))

    class Racy(tt.TxnTable):
        def _stage(self, df, stats_col=None):
            files = super()._stage(df, stats_col=stats_col)
            if not getattr(self, "_raced", False):
                self._raced = True
                tt.TxnTable(self.root).merge(
                    spark,
                    _txn_rows(spark, [(10, "interloper", 2)]),
                    keys=["k"],
                    version_col="ver",
                )
            return files

    racy = Racy(root)
    v = racy.merge(
        spark,
        _txn_rows(spark, [(20, "loser-retried", 2)]),
        keys=["k"],
        version_col="ver",
    )
    # interloper committed v2; the raced merge landed as v3 and kept
    # BOTH updates (serializable: it re-merged onto v2)
    assert v == 3
    latest = {r.k: r.v for r in t.read(spark).collect()}
    assert latest == {1: "a", 10: "interloper", 20: "loser-retried"}


def test_txn_table_append_and_vacuum(spark, tmp_path):
    """Append commits parent.files + staged (no rewrite); vacuum
    removes only files referenced by NO version — time travel over
    the full history survives it."""
    import os

    from stock_market_data_pipeline_v2_spark.sources.txn_table import TxnTable

    root = str(tmp_path / "t")
    t = TxnTable.create(spark, root, _txn_rows(spark, [(1, "a", 1)]))
    t.append(spark, _txn_rows(spark, [(2, "b", 1)]))
    assert {r.k for r in t.read(spark).collect()} == {1, 2}
    # orphan staging (a writer that died before committing)
    t._stage(_txn_rows(spark, [(99, "orphan", 1)]))
    n_before = sum(len(fs) for _, _, fs in os.walk(t._data_dir))
    # grace_seconds=0: this test's orphan is a DEAD writer; the
    # default 24 h retention (which protects LIVE writers) is
    # covered by test_round11_ops.py::test_txn_vacuum_grace.
    removed = t.vacuum(grace_seconds=0)
    assert removed >= 1
    # every committed version still reads after vacuum
    assert {r.k for r in t.read(spark, 1).collect()} == {1}
    assert {r.k for r in t.read(spark, 2).collect()} == {1, 2}
    assert sum(len(fs) for _, _, fs in os.walk(t._data_dir)) < n_before


def test_txn_table_zone_map_selective_merge(spark, tmp_path):
    """The 100 TB merge path: with footer zone maps recorded, a merge
    touching a narrow key range must rewrite ONLY intersecting files
    (untouched file paths carried forward byte-identical in the new
    manifest) and produce the exact end state of the full rewrite."""
    from stock_market_data_pipeline_v2_spark.sources.txn_table import TxnTable

    root = str(tmp_path / "t")
    # create with keys clustered into disjoint file ranges: repartition
    # by range so file 1 holds low keys, file 2 high keys
    base = _txn_rows(
        spark,
        [(k, f"v{k}", 1) for k in range(1, 9)],
    ).repartitionByRange(2, "k")
    # r11: the selective path now requires PROOF of key-uniqueness —
    # declare (and have verified) that this base is one-row-per-k,
    # recording key_unique_on in the create manifest.
    t = TxnTable.create(spark, root, base, zone_map_col="k", keys=["k"])
    m1 = t.manifest()
    assert m1["stats"], "zone maps must be recorded at create"
    # update touches only the high range
    t.merge(
        spark,
        _txn_rows(spark, [(8, "V8", 2), (9, "new", 2)]),
        keys=["k"],
        version_col="ver",
        zone_map_col="k",
    )
    m2 = t.manifest()
    carried = set(m1["files"]) & set(m2["files"])
    rewritten = set(m1["files"]) - set(m2["files"])
    assert carried, "non-intersecting files must be carried forward"
    assert rewritten, "intersecting files must be rewritten"
    # end state identical to a full-COW merge on a twin table
    twin = TxnTable.create(spark, str(tmp_path / "twin"), base)
    twin.merge(
        spark,
        _txn_rows(spark, [(8, "V8", 2), (9, "new", 2)]),
        keys=["k"],
        version_col="ver",
    )
    got = sorted(tuple(r) for r in t.read(spark).collect())
    want = sorted(tuple(r) for r in twin.read(spark).collect())
    assert got == want
    assert {r.k: r.v for r in t.read(spark).collect()}[8] == "V8"
    # zone maps survive the commit for the NEXT selective merge
    assert all(f in m2["stats"] for f in m2["files"])
