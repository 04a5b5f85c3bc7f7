"""Scale probe for the transactional MERGE boundary (round 11,
VERDICT r10 next-round #7): zone-mapped SELECTIVE merge vs full
copy-on-write at 1× and N× the sf0.1 events table.

Mirrors the registered lineage (`__spark_entry__._txn_demo_table`):
raw create → full-COW merge (establishes the key-uniqueness claim) →
OPTIMIZE into range-disjoint user_id files → the timed merge. The
timed update batch is NARROW — the lowest ~1/8 of the user_id domain,
time-bumped so latest-wins is unambiguous — the production shape
(most upserts touch recent/hot keys, not the whole table).

Replication is key-disjoint (per-replica user_id stride), so N× rows
means N× keys at the same density: the full-COW rewrite scales O(N)
while the selective rewrite scales O(files-that-intersect) — the gap
this probe measures. AGREEMENT-GATED like every probe: both tables'
end states must produce the identical xxhash64 checksum or the probe
aborts.

Usage: python tools/scale_probe_txn.py [--mult 10] [--sf DIR]
Prints one JSON line:
  {"mult": N, "n_rows": ..., "skip_fraction": ...,
   "queries": {"selective_merge": s, "full_cow_merge": s, ...}}
"""

from __future__ import annotations

import argparse
import atexit
import json
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
    copies = [
        ev.select(
            (F.col("user_id") + F.lit(i * stride)).alias("user_id"),
            *[c for c in ev.columns if c != "user_id"],
        )
        for i in range(mult)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


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
    ev = replicate_events(
        load_table(spark, args.sf, "events").select(
            "user_id", "event_type", "ts", "event_id", "value"
        ),
        args.mult,
    ).localCheckpoint()
    n_rows = ev.count()
    c1 = F.lit("2024-01-12").cast("timestamp")
    c2 = F.lit("2024-01-20").cast("timestamp")
    max_uid = ev.agg(F.max("user_id")).first()[0]
    cut = max_uid // 8
    # narrow, strictly-newer update batch over the cold table's keys
    updates = (
        ev.filter((F.col("ts") >= c2) & (F.col("user_id") <= cut))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 90 DAYS"))
        .localCheckpoint()
    )
    n_updates = updates.count()

    timings: dict[str, float] = {}

    def build(zone_for_last):
        root = tempfile.mkdtemp(prefix="probe_txn_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        t = TxnTable.create(
            spark, root, ev.filter(F.col("ts") < c1), zone_map_col="user_id"
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
        timings.setdefault("bootstrap_full_cow_merge", round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        t.optimize(spark, cluster_col="user_id", n_files=args.n_files)
        timings.setdefault("optimize", round(time.perf_counter() - t0, 3))
        pre = t.manifest()
        t0 = time.perf_counter()
        t.merge(
            spark,
            updates,
            keys=["user_id", "event_type"],
            version_col="ts",
            tiebreak_cols=["event_id"],
            zone_map_col=zone_for_last,
        )
        sec = round(time.perf_counter() - t0, 3)
        post = t.manifest()
        carried = len(set(pre["files"]) & set(post["files"]))
        return t, sec, carried / max(len(pre["files"]), 1)

    # best-of-2 per mode, ALTERNATING order (full, sel, sel, full) so
    # JVM/page-cache warmth doesn't systematically favor either mode
    t_full, full_sec, _ = build(None)
    t_sel, sel_sec, skip_frac = build("user_id")
    _, sel2, _ = build("user_id")
    _, full2, _ = build(None)
    timings["selective_merge"] = min(sel_sec, sel2)
    timings["full_cow_merge"] = min(full_sec, full2)

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
