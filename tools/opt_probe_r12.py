#!/usr/bin/env python
"""Round-12 optimization probe: before/after standalone timings and
``explain("formatted")`` plan capture for every query the r12
optimization round touched.

For each touched row the BEFORE form is the r11 implementation
rebuilt from the unchanged library functions (the brute tiers stay
in the library as pytest ground truth), and the AFTER form is the
registered query itself — both timed in ONE session, best-of-N,
noop-materialized (guide §1.4), job-labelled (guide §1.5), so the
comparison is apples-to-apples on the same warm JVM.

Usage:
  python tools/opt_probe_r12.py [--sf /root/testdata/sf0.1] [--runs 3]
                                [--plans-dir plans/r12] [name ...]

Writes plans/r12/<name>_before.txt / _after.txt and prints one
timing row per form.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=str(REPO / "plans" / "r12"))
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from stock_market_data_pipeline_v2_spark.operators.dedup import (
        embedding_neardup_pairs,
    )
    from stock_market_data_pipeline_v2_spark.operators.similarity import (
        cosine_topk,
        hard_negative_topk,
        sq8_topk,
    )
    from stock_market_data_pipeline_v2_spark.session import get_spark

    import __spark_entry__ as m

    spark = get_spark("opt-probe-r12")
    sf = args.sf
    qs = m.queries()

    # BEFORE forms: the r11 implementations, rebuilt from the library.
    def before_dedup_embedding():
        return embedding_neardup_pairs(m._embs(spark, sf), threshold=0.4)

    def before_ann_cosine_topk():
        return cosine_topk(m._embs(spark, sf), m._ann_queries(spark, sf), k=5)

    def before_hard_negative_mining():
        return hard_negative_topk(
            m._embs(spark, sf), m._ann_queries(spark, sf), k=5
        )

    def before_ann_sq8_topk():
        return sq8_topk(m._embs(spark, sf), m._ann_queries(spark, sf), k=5)

    def before_part_triangles():
        # the r11 triangle_stats body when a prebuilt graph is passed:
        # redundant src-degree re-join, lineitem re-scan for the
        # vertex spine, SMJ wedge joins (no hints)
        from pyspark.sql import functions as F

        from stock_market_data_pipeline_v2_spark.functions.core import (
            round_away,
        )
        from stock_market_data_pipeline_v2_spark.sources.io import load_table

        lineitem = load_table(spark, sf, "lineitem")
        deg_edges, _nodes = m._copurchase_graph(spark, sf)
        e = deg_edges.select("src", "dst")
        deg = deg_edges.select("src", F.col("__deg").alias("deg")).distinct()
        ed = (
            e.join(deg, "src")
            .join(
                deg.select(
                    F.col("src").alias("dst"), F.col("deg").alias("__degd")
                ),
                "dst",
            )
            .select("src", "dst", F.col("deg").alias("__degs"), "__degd")
        )
        lower = (F.col("__degs") < F.col("__degd")) | (
            (F.col("__degs") == F.col("__degd"))
            & (F.col("src") < F.col("dst"))
        )
        oriented = ed.filter(lower).select(
            F.col("src").alias("u"),
            F.col("dst").alias("v"),
            F.col("__degd").alias("__dv"),
        )
        o1 = oriented.select(
            "u", F.col("v").alias("a"), F.col("__dv").alias("__da")
        )
        o2 = oriented.select(
            F.col("u"), F.col("v").alias("b"), F.col("__dv").alias("__db")
        )
        wedges = o1.join(o2, "u").filter(
            (F.col("__da") < F.col("__db"))
            | ((F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b")))
        )
        closing = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"))
        tri = wedges.join(closing, ["a", "b"]).select("u", "a", "b")
        per_node = (
            tri.select(F.explode(F.array("u", "a", "b")).alias("part"))
            .groupBy("part")
            .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
        )
        nodes = lineitem.select(F.col("l_partkey").alias("part")).distinct()
        d = deg.select(F.col("src").alias("part"), F.col("deg"))
        coef = (
            F.lit(2.0)
            * F.col("triangles").cast("double")
            / (F.col("degree") * (F.col("degree") - 1)).cast("double")
        )
        return (
            nodes.join(d, "part", "left")
            .join(per_node, "part", "left")
            .select(
                F.col("part").alias("l_partkey"),
                F.coalesce("deg", F.lit(0).cast("long")).alias("degree"),
                F.coalesce("triangles", F.lit(0).cast("long")).alias(
                    "triangles"
                ),
            )
            .select(
                "l_partkey",
                "degree",
                "triangles",
                F.when(F.col("degree") >= 2, round_away(coef, 6)).alias(
                    "clustering_coef"
                ),
            )
            .orderBy("l_partkey")
        )

    def before_lineitem_profile_drift():
        from pyspark.sql import functions as F

        from stock_market_data_pipeline_v2_spark.operators.profiling import (
            LINEITEM_PROFILE_SPEC,
            profile_drift,
        )
        from stock_market_data_pipeline_v2_spark.sources.io import load_table

        li = load_table(spark, sf, "lineitem")
        cut = F.lit("1998-06-01").cast("timestamp")
        return profile_drift(
            li.filter(F.col("l_shipdate") < cut),
            li.filter(F.col("l_shipdate") >= cut),
            LINEITEM_PROFILE_SPEC,
        )

    def before_lineitem_profile_drift_sketch():
        from pyspark.sql import functions as F

        from stock_market_data_pipeline_v2_spark.operators.profiling import (
            LINEITEM_PROFILE_SPEC,
            profile_drift_sketch,
        )
        from stock_market_data_pipeline_v2_spark.sources.io import load_table

        li = load_table(spark, sf, "lineitem")
        cut = F.lit("1998-06-01").cast("timestamp")
        return profile_drift_sketch(
            li.filter(F.col("l_shipdate") < cut),
            li.filter(F.col("l_shipdate") >= cut),
            LINEITEM_PROFILE_SPEC,
            p=8,
        )

    befores = {
        "dedup_embedding": before_dedup_embedding,
        "ann_cosine_topk": before_ann_cosine_topk,
        "hard_negative_mining": before_hard_negative_mining,
        "ann_sq8_topk": before_ann_sq8_topk,
        "part_triangles": before_part_triangles,
        "lineitem_profile_drift": before_lineitem_profile_drift,
        "lineitem_profile_drift_sketch": before_lineitem_profile_drift_sketch,
    }
    names = args.names or list(befores)
    plans_dir = Path(args.plans_dir)
    plans_dir.mkdir(parents=True, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    # Warm the JVM on a trivial plan (the bench.py protocol).
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in names:
        for tag, build in (("before", befores.get(name)), ("after", qs.get(name))):
            if build is None:
                continue
            fn = (lambda b=build: b()) if tag == "before" else (
                lambda b=build: b(spark, sf)
            )
            df = fn()
            plan = df._jdf.queryExecution().explainString(mode)
            (plans_dir / f"{name}_{tag}.txt").write_text(plan)
            best = float("inf")
            for _ in range(args.runs):
                spark.sparkContext.setJobDescription(f"r12 {tag}: {name}")
                t0 = time.perf_counter()
                _noop(fn())
                best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            print(f"{name:28s} {tag:6s} best-of-{args.runs}: {best:6.2f} s")


if __name__ == "__main__":
    main()
