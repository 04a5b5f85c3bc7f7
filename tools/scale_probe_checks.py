"""Scale probe for the round-9 data-quality surface: measure the
ONE-PASS check compilation (`plans/checks.py:quality_report_frame` —
all conditional counts in a single aggregate over one scan) against
the naive dbt→Spark port (one scan+aggregate PER CHECK), so the
"N scans vs 1" claim is a number, not an assertion.

Both forms compute the identical report (asserted row-for-row before
any timing is reported). The fact is optionally replicated ``--mult``
times (density-preserving union of re-keyed copies, the
`scale_probe_warehouse.py` protocol) so the scan-count effect is
visible above fixed overheads.

Usage: python tools/scale_probe_checks.py [--mult 4] [--sf DIR]
Prints one JSON line:
  {"mult": N, "rows": M, "queries": {"one_pass": s, "per_check": s},
   "checks": C, "agree": true}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F


def replicated(li: DataFrame, mult: int) -> DataFrame:
    if mult == 1:
        return li
    copies = [li]
    for k in range(1, mult):
        copies.append(
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(k * 10_000_000)
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from stock_market_data_pipeline_v2_spark.plans.checks import (
        quality_report_frame,
        star_contract_lineitem,
    )
    from stock_market_data_pipeline_v2_spark.session import get_spark
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    spark = get_spark("probe-checks", master="local[32]", shuffle_partitions=32)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    checks, uniq = star_contract_lineitem()
    li = replicated(load_table(spark, args.sf, "lineitem"), args.mult)
    n_rows = li.count()

    def one_pass() -> list:
        return sorted(
            quality_report_frame(li, "lineitem", checks, uniq).collect()
        )

    def per_check() -> list:
        # the naive port: one aggregate action per check (what a
        # 1:1 dbt translation runs), same unique-key job.
        rows = []
        total = li.count()
        for ch in checks:
            v = li.agg(
                F.count_if(ch.violation).cast("long").alias("v")
            ).first()["v"]
            rows.append(
                (
                    "lineitem",
                    ch.name,
                    ch.severity,
                    total,
                    v,
                    "fail" if v > 0 else "pass",
                )
            )
        for cols in uniq:
            r = (
                li.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__cnt"))
                .agg(
                    F.sum("__cnt").cast("long").alias("t"),
                    F.count_if(F.col("__cnt") > 1).cast("long").alias("v"),
                )
                .first()
            )
            rows.append(
                (
                    "lineitem",
                    f"unique:{'+'.join(cols)}",
                    "error",
                    r["t"],
                    r["v"],
                    "fail" if r["v"] > 0 else "pass",
                )
            )
        return sorted(rows)

    # agreement before timing
    a = [tuple(r) for r in one_pass()]
    b = per_check()
    agree = a == b

    timings = {}
    for name, fn in (("one_pass", one_pass), ("per_check", per_check)):
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "mult": args.mult,
                "rows": n_rows,
                "checks": len(checks) + len(uniq),
                "queries": timings,
                "agree": agree,
            }
        )
    )


if __name__ == "__main__":
    main()
