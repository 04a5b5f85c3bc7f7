"""Scale probe for the round-9 skew family: measure the salt-split
join against the plain join on a SYNTHETICALLY SKEWED key, so the
claim "salting spreads a heavy key across reducers" is a number, not
an assertion.

TPC-H-shaped testdata has near-uniform join keys (the co-purchase
degree probe found the same), so skew is manufactured here the way it
appears in production telemetry: one "celebrity" orderkey absorbs a
chosen fraction of the fact (default ~50% — replicated lineitem rows
re-keyed to one hot order). The orders side keeps one row per key, so
the join output multiset is well-defined and both forms must agree —
agreement is asserted on every run before any timing is reported.

To make the reducer-side pressure visible the probe times the JOIN +
per-key aggregation with (a) auto-broadcast DISABLED
(autoBroadcastJoinThreshold=-1 — at 100 TB neither join side fits an
executor, which is the only regime where skew salting exists; the
salted operator's explicit ``F.broadcast`` hints on its
aggregate-sized frames still apply) and (b) AQE's automatic
skew-join mitigation DISABLED — the manual salt-split is what a
pipeline does when AQE cannot help (e.g. the skewed side feeds a
grouping AQE cannot re-split, or the engine predates it). A third
row times the plain shuffle join WITH AQE skew-join on, showing what
the built-in mitigation recovers.

Usage: python tools/scale_probe_skew.py [--mult 8] [--sf DIR]
Prints one JSON line:
  {"mult": N, "hot_share": f, "queries": {plain_noaqe, salted_noaqe,
   plain_aqe}, "agree": true}
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F


def skewed_lineitem(li: DataFrame, mult: int) -> DataFrame:
    """mult−1 extra copies of the fact, ALL re-keyed to one hot
    orderkey (the max key) with unique line numbers — the celebrity
    key ends up with ~(mult−1)/mult of all rows."""
    if mult == 1:
        return li
    hot = li.agg(F.max("l_orderkey")).first()[0]
    ln_stride = li.agg(F.max("l_linenumber")).first()[0] + 1
    copies = [li]
    for i in range(1, mult):
        copies.append(
            li.select(
                F.lit(hot).cast("long").alias("l_orderkey"),
                "l_partkey",
                "l_suppkey",
                (F.col("l_linenumber") + i * ln_stride).alias(
                    "l_linenumber"
                ),
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            ).select(*li.columns)
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def plain_priority_revenue(li: DataFrame, od: DataFrame) -> DataFrame:
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    )
    return (
        li.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            od.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("line_count"),
            F.countDistinct("l_orderkey").cast("long").alias("order_count"),
            rev.alias("__rev"),
        )
        .select(
            "o_orderpriority",
            "line_count",
            "order_count",
            F.round(F.col("__rev"), 2).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from stock_market_data_pipeline_v2_spark.operators.dedup import (
        release_cached_inputs,
    )
    from stock_market_data_pipeline_v2_spark.operators.skew import (
        salted_priority_revenue,
    )
    from stock_market_data_pipeline_v2_spark.session import get_spark
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    spark = get_spark("scale-probe-skew")
    li = skewed_lineitem(
        load_table(spark, args.sf, "lineitem"), args.mult
    ).localCheckpoint()
    od = load_table(spark, args.sf, "orders").localCheckpoint()
    n = li.count()
    hot_rows = (
        li.groupBy("l_orderkey").count().agg(F.max("count")).first()[0]
    )

    # correctness first: both forms must agree on the skewed input
    plain_rows = sorted(map(tuple, plain_priority_revenue(li, od).collect()))
    salted_df = salted_priority_revenue(li, od)
    salted_rows = sorted(map(tuple, salted_df.collect()))
    release_cached_inputs(salted_df)
    agree = plain_rows == salted_rows

    def best_of(make, runs: int) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df = make()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            release_cached_inputs(df)
        return round(best, 3)

    timings = {}
    # 100 TB regime: no side fits an executor → shuffle joins only
    # (explicit F.broadcast hints on aggregate-sized frames still fire)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    timings["plain_noaqe"] = best_of(
        lambda: plain_priority_revenue(li, od), args.runs
    )
    timings["salted_noaqe"] = best_of(
        lambda: salted_priority_revenue(li, od), args.runs
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    timings["plain_aqe"] = best_of(
        lambda: plain_priority_revenue(li, od), args.runs
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    print(
        json.dumps(
            {
                "mult": args.mult,
                "rows": n,
                "hot_share": round(hot_rows / n, 4),
                "queries": timings,
                "agree": agree,
            }
        )
    )
    return 0 if agree else 1


if __name__ == "__main__":
    raise SystemExit(main())
