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
        dst = tempfile.mkdtemp(prefix="probe_txn_clone_")
        atexit.register(shutil.rmtree, dst, ignore_errors=True)
        os.rmdir(dst)
        shutil.copytree(base_root, dst, copy_function=os.link)
        return TxnTable(dst)

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
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
