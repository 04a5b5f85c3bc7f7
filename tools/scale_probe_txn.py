"""Scale probe for the transactional MERGE boundary (round 11,
VERDICT r10 next-round #7): zone-mapped SELECTIVE merge vs full
copy-on-write as the TABLE grows, update batch held fixed.

Mirrors the registered lineage (`__spark_entry__._txn_demo_table`):
raw create → full-COW merge (establishes the key-uniqueness claim) →
OPTIMIZE into range-disjoint user_id files. The committed table is
KEY-grain (one row per (user_id, event_type) after the bootstrap
merge), so the scaling axis is keys: replication strides user_id per
replica (crossJoin with a broadcast replica dim — one scan, no
mult-branch union plan), giving mult× keys at the same density. The
timed update batch is the production shape — a FIXED-size hot-key
slice (the lowest 1/8 of the ORIGINAL user domain, time-bumped so
latest-wins is unambiguous) — so full COW scales O(keys) while the
selective rewrite stays O(files-that-intersect) ≈ O(1).

The base table is built ONCE per mult; each timed merge runs on a
hard-link CLONE of it (immutable data files make cloning free — the
same property that gives time travel), best-of-2 per mode in
alternating order so JVM warmth favors neither. AGREEMENT-GATED: a
selective clone and a full clone must produce identical xxhash64
checksums or the probe aborts.

Round 12 (VERDICT r11 next-round #5) adds the READ side:
- pruned read vs full-scan-filter on the optimized base,
  agreement-gated (checksum-identical), with the planned-file skip
  fraction;
- manifest-arithmetic planning cost on a synthetic multi-thousand-
  file manifest (prune_files is pure JSON arithmetic — this measures
  the 100 TB planning path, no Spark job);
- 1-D OPTIMIZE vs OPTIMIZE ZORDER under a two-dimensional box
  predicate (user_id range AND event_id range): kept-file counts and
  read times per layout, both agreement-gated against
  read-then-filter on the same snapshot.

Usage: python tools/scale_probe_txn.py [--mult 10] [--sf DIR]
Prints one JSON line:
  {"mult": N, "n_keys": ..., "skip_fraction": ...,
   "queries": {"selective_merge": s, "full_cow_merge": s, ...}}
"""

from __future__ import annotations

import argparse
import atexit
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F


def replicate_events(ev: DataFrame, mult: int) -> DataFrame:
    if mult == 1:
        return ev
    stride = ev.agg(F.max("user_id")).first()[0] + 1
    reps = F.broadcast(
        ev.sparkSession.range(mult).withColumnRenamed("id", "__rep")
    )
    return (
        ev.crossJoin(reps)
        .withColumn(
            "user_id", F.col("user_id") + F.col("__rep") * F.lit(stride)
        )
        .drop("__rep")
    )


def checksum(df: DataFrame) -> int:
    # decimal(38,0) sum: exact multiset checksum, no ANSI long overflow
    return df.select(
        F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h")
    ).first()["h"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--n-files", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from stock_market_data_pipeline_v2_spark.session import (
        configure_runtime,
        get_spark,
    )
    from stock_market_data_pipeline_v2_spark.sources.io import load_table
    from stock_market_data_pipeline_v2_spark.sources.txn_table import TxnTable

    spark = get_spark("scale-probe-txn")
    configure_runtime(spark)
    base_ev = load_table(spark, args.sf, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    orig_max = base_ev.agg(F.max("user_id")).first()[0]
    ev = replicate_events(base_ev, args.mult).localCheckpoint()
    n_rows = ev.count()
    c1 = F.lit("2024-01-12").cast("timestamp")
    c2 = F.lit("2024-01-20").cast("timestamp")
    # FIXED-size hot-key update batch: lowest 1/8 of the ORIGINAL user
    # domain — the table grows under it, the batch does not
    updates = (
        ev.filter((F.col("ts") >= c2) & (F.col("user_id") <= orig_max // 8))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 90 DAYS"))
        .localCheckpoint()
    )
    n_updates = updates.count()

    timings: dict[str, float] = {}

    # -- build the clustered base ONCE (the registered lineage) --------
    base_root = tempfile.mkdtemp(prefix="probe_txn_base_")
    atexit.register(shutil.rmtree, base_root, ignore_errors=True)
    t = TxnTable.create(
        spark, base_root, ev.filter(F.col("ts") < c1), zone_map_col="user_id"
    )
    t0 = time.perf_counter()
    t.merge(
        spark,
        ev.filter((F.col("ts") >= c1) & (F.col("ts") < c2)),
        keys=["user_id", "event_type"],
        version_col="ts",
        tiebreak_cols=["event_id"],
        zone_map_col="user_id",
    )
    timings["bootstrap_full_cow_merge"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    t.optimize(spark, cluster_col="user_id", n_files=args.n_files)
    timings["optimize"] = round(time.perf_counter() - t0, 3)
    n_keys = t.read(spark).count()

    def clone() -> TxnTable:
        # immutable data files: a hard-link copy IS a snapshot clone
        # (TxnTable.clone — the r12 first-class op)
        dst = tempfile.mkdtemp(prefix="probe_txn_clone_")
        atexit.register(shutil.rmtree, dst, ignore_errors=True)
        os.rmdir(dst)
        return t.clone(dst)

    def timed_merge(zone):
        tc = clone()
        pre = tc.manifest()
        t0 = time.perf_counter()
        tc.merge(
            spark,
            updates,
            keys=["user_id", "event_type"],
            version_col="ts",
            tiebreak_cols=["event_id"],
            zone_map_col=zone,
        )
        sec = round(time.perf_counter() - t0, 3)
        post = tc.manifest()
        carried = len(set(pre["files"]) & set(post["files"]))
        return tc, sec, carried / max(len(pre["files"]), 1)

    # best-of-2 per mode, ALTERNATING order (full, sel, sel, full)
    t_full, full_a, _ = timed_merge(None)
    t_sel, sel_a, skip_frac = timed_merge("user_id")
    _, sel_b, _ = timed_merge("user_id")
    _, full_b, _ = timed_merge(None)
    timings["selective_merge"] = min(sel_a, sel_b)
    timings["full_cow_merge"] = min(full_a, full_b)

    h_sel = checksum(t_sel.read(spark))
    h_full = checksum(t_full.read(spark))
    assert h_sel == h_full, (
        f"AGREEMENT FAILURE: selective={h_sel} full={h_full}"
    )

    # -- retention (r12, VERDICT r11 #3): history growth + reclaim ------
    # the selective clone now holds the full lineage (create, bootstrap
    # merge, optimize, timed merge); expire all but the last snapshot
    # and vacuum — measuring what snapshot-history retention costs and
    # returns at this scale (manifest bytes are the O(files·versions)
    # growth axis; reclaimed files are the storage the table gets back)
    mani_dir = os.path.join(t_sel.root, "_versions")
    pre_bytes = sum(
        os.path.getsize(os.path.join(mani_dir, f))
        for f in os.listdir(mani_dir)
        if f.endswith(".json")
    )
    t0 = time.perf_counter()
    expired = t_sel.expire_snapshots(keep_last=1)
    reclaimed = t_sel.vacuum(grace_seconds=0)
    timings["expire_and_vacuum"] = round(time.perf_counter() - t0, 3)
    post_bytes = sum(
        os.path.getsize(os.path.join(mani_dir, f))
        for f in os.listdir(mani_dir)
        if f.endswith(".json")
    )
    h_after = checksum(t_sel.read(spark))
    assert h_after == h_full, "retention must not change the live snapshot"
    retention = {
        "expired_versions": len(expired),
        "reclaimed_files": reclaimed,
        "manifest_bytes": f"{pre_bytes}->{post_bytes}",
    }

    # -- READ side (r12, VERDICT r11 #5) --------------------------------
    out_extra = read_side_probe(
        spark, t, orig_max, args.mult, args.n_files, timings
    )
    out_extra["retention"] = retention

    print(
        json.dumps(
            {
                "mult": args.mult,
                "n_rows": n_rows,
                "n_keys": n_keys,
                "n_updates": n_updates,
                "n_files": args.n_files,
                "skip_fraction": round(skip_frac, 3),
                "agreement": "checksum-identical",
                **out_extra,
                "queries": timings,
            }
        )
    )


def read_side_probe(spark, t, orig_max, mult, n_files, timings):
    """Pruned READ measurements on the already-optimized base table
    ``t`` (range-disjoint user_id files). Mutates ``timings`` with
    per-mode seconds; returns extra JSON fields."""
    import time

    from stock_market_data_pipeline_v2_spark.sources.txn_table import TxnTable

    def materialize(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    lo, hi = 0, orig_max // 8  # the fixed hot-key slice, table grows under it
    kept, total = t.prune_files("user_id", lo, hi)
    pruned_df = t.read_pruned(spark, "user_id", lo, hi)
    filt_df = t.read(spark).filter(
        (F.col("user_id") >= lo) & (F.col("user_id") <= hi)
    )
    # agreement first (also warms both plans), then best-of-2 alternating
    h_p, h_f = checksum(pruned_df), checksum(filt_df)
    assert h_p == h_f, f"READ AGREEMENT FAILURE: pruned={h_p} filter={h_f}"
    a = materialize(pruned_df)
    b = materialize(filt_df)
    b2 = materialize(filt_df)
    a2 = materialize(pruned_df)
    timings["pruned_read"] = min(a, a2)
    timings["full_scan_filter_read"] = min(b, b2)

    # planning cost = pure manifest arithmetic on a SYNTHETIC manifest
    # with thousands of range-disjoint files (the 100 TB shape: Spark
    # never runs; this is the metadata path a 1000-executor scan plans
    # through). Files needn't exist — prune_files reads only JSON.
    import json as _json
    import os as _os
    import tempfile as _tempfile

    n_synth = 20_000
    synth_root = _tempfile.mkdtemp(prefix="probe_txn_synth_")
    _os.makedirs(_os.path.join(synth_root, "_versions"))
    span = 100
    manifest = {
        "version": 1,
        "parent": 0,
        "op": "create",
        "files": [f"data/x/f{i}.parquet" for i in range(n_synth)],
        "n_files": n_synth,
        "schema": t.manifest()["schema"],
        "stats": {
            f"data/x/f{i}.parquet": {
                "user_id": [i * span, (i + 1) * span - 1]
            }
            for i in range(n_synth)
        },
        "key_unique_on": None,
        "txn": {},
    }
    with open(_os.path.join(synth_root, "_versions", "v00000001.json"), "w") as fh:
        fh.write(_json.dumps(manifest))
    ts = TxnTable(synth_root)
    t0 = time.perf_counter()
    for _ in range(10):
        kept_s, _tot = ts.prune_files("user_id", 0, 5 * span - 1)
    plan_ms = (time.perf_counter() - t0) / 10 * 1000
    assert len(kept_s) == 5

    # 1-D OPTIMIZE vs Z-ORDER under a 2-D box predicate
    import atexit as _atexit
    import shutil as _shutil

    zroot = _tempfile.mkdtemp(prefix="probe_txn_z_")
    _atexit.register(_shutil.rmtree, zroot, ignore_errors=True)
    _os.rmdir(zroot)
    tz = t.clone(zroot)
    snap = tz.read(spark)
    uid_hi = snap.agg(F.max("user_id")).first()[0]
    eid_hi = snap.agg(F.max("event_id")).first()[0]
    t0 = time.perf_counter()
    tz.optimize_zorder(
        spark,
        specs=[("user_id", 0, int(uid_hi)), ("event_id", 0, int(eid_hi))],
        n_files=n_files,
    )
    timings["optimize_zorder"] = round(time.perf_counter() - t0, 3)
    # upper event_id eighth: latest-wins keeps each key's NEWEST row,
    # so surviving event_ids skew high — a low-range box would be
    # empty and the comparison vacuous
    box = [
        ("user_id", 0, int(uid_hi) // 8),
        ("event_id", int(eid_hi) * 7 // 8, int(eid_hi)),
    ]
    kept_1d, tot_1d = t.prune_box(box)
    kept_z, tot_z = tz.prune_box(box)
    df_1d = t.read_pruned_box(spark, box)
    df_z = tz.read_pruned_box(spark, box)
    h1, hz = checksum(df_1d), checksum(df_z)
    assert h1 == hz, f"BOX AGREEMENT FAILURE: 1d={h1} zorder={hz}"
    assert h1 is not None, "box predicate selected no rows — vacuous probe"
    a = materialize(df_1d)
    b = materialize(df_z)
    b2 = materialize(df_z)
    a2 = materialize(df_1d)
    timings["box_read_1d_optimize"] = min(a, a2)
    timings["box_read_zorder"] = min(b, b2)

    # second-dimension-ONLY predicate: the 1-D layout cannot prune at
    # all (every file's event_id envelope spans the domain); z-order
    # is the only layout that can skip here. The band must be
    # SELECTIVE to be a fair probe — latest-wins keeps each key's
    # newest row, so ~80% of surviving event_ids sit in the top
    # eighth; probe the lowest 1/16 of the surviving range instead.
    eid_lo = snap.agg(F.min("event_id")).first()[0]
    band_hi = int(eid_lo) + (int(eid_hi) - int(eid_lo)) // 16
    epred = [("event_id", int(eid_lo), band_hi)]
    ekept_1d, _ = t.prune_box(epred)
    ekept_z, _ = tz.prune_box(epred)
    # agreement on the dim2 band too (pruned == read-then-filter)
    hd1 = checksum(t.read_pruned_box(spark, epred))
    hdz = checksum(tz.read_pruned_box(spark, epred))
    assert hd1 == hdz, f"DIM2 AGREEMENT FAILURE: 1d={hd1} zorder={hdz}"

    return {
        "read_skip_fraction": round(1 - len(kept) / max(total, 1), 3),
        "prune_plan_ms_20k_files": round(plan_ms, 2),
        "box_kept_files_1d": f"{len(kept_1d)}/{tot_1d}",
        "box_kept_files_zorder": f"{len(kept_z)}/{tot_z}",
        "dim2_kept_files_1d": f"{len(ekept_1d)}/{tot_1d}",
        "dim2_kept_files_zorder": f"{len(ekept_z)}/{tot_z}",
    }


if __name__ == "__main__":
    main()
