#!/usr/bin/env python
"""Round-13 interleaved A/B probe (VERDICT r12 "Next round" #1/#6):
settle the part_triangles / part_kcore regression and the ANN-family
question in ONE warm session with arms alternating per run so host
steal hits every arm equally.

Factors:
  H = triangle wedge/closing SHUFFLE_HASH hints  (on/off — graph._WEDGE_SHJ_HINTS)
  T = spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold (128m/0)

Rows and the arms that matter to them:
  part_triangles      -> 4 arms (H x T)
  part_kcore / part_pagerank / part_components / minhash_estimate_audit
                      -> 2 arms (T)   [their own hints are r10-proven]
  ann_pq_topk / ann_ivf_topk / ann_ivfpq_topk / ann_filtered_topk
                      -> 2 arms (T)   [VERDICT #6: conf-sensitivity check]

Usage: python tools/opt_ab_r13.py [--cpus 32] [--runs 8] [--sf DIR]
The SHJ threshold is runtime-settable (AQE conf); each arm sets the
env var and calls configure_runtime via the query fn, then asserts the
live conf value.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TRI = "part_triangles"
T_ROWS = [
    "part_kcore",
    "part_pagerank",
    "part_components",
    "minhash_estimate_audit",
    "ann_pq_topk",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_filtered_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--runs", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    from stock_market_data_pipeline_v2_spark.operators import graph
    from stock_market_data_pipeline_v2_spark.operators.dedup import (
        release_cached_inputs,
    )
    from stock_market_data_pipeline_v2_spark.session import get_spark

    import __spark_entry__ as m

    spark = get_spark(f"opt-ab-r13-c{args.cpus}")
    qs = m.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Build the shared graph/ANN memos ONCE before any timed arm so no
    # arm is charged the build (same contract as bench run 1).
    for name in [TRI] + T_ROWS:
        df = qs[name](spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        release_cached_inputs(df)

    samples: dict[tuple[str, str], list[float]] = defaultdict(list)

    def run_one(name: str, hints: bool, thresh: str) -> None:
        graph._WEDGE_SHJ_HINTS = hints
        os.environ["SPARK_GRAFT_SHJ_THRESHOLD"] = thresh
        arm = f"H{'1' if hints else '0'}T{thresh}"
        spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
        t0 = time.perf_counter()
        df = qs[name](spark, args.sf)
        assert (
            spark.conf.get(
                "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
            )
            == thresh
        )
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_cached_inputs(df)
        samples[(name, arm)].append(dt)

    print(f"# cpus={args.cpus} runs={args.runs} loadavg={os.getloadavg()}")
    for r in range(args.runs):
        # arms alternate within each run; rows interleave inside arms
        for hints in (True, False):
            for thresh in ("128m", "0"):
                run_one(TRI, hints, thresh)
        for thresh in ("128m", "0"):
            for name in T_ROWS:
                run_one(name, True, thresh)
        print(f"# run {r + 1}/{args.runs} done la={os.getloadavg()[0]:.2f}", flush=True)

    graph._WEDGE_SHJ_HINTS = True
    os.environ["SPARK_GRAFT_SHJ_THRESHOLD"] = "128m"
    print(f"{'row':26s} {'arm':10s} {'best':>7s} {'med':>7s} {'n':>3s}")
    for (name, arm), ts in sorted(samples.items()):
        ts2 = sorted(ts)
        med = ts2[len(ts2) // 2]
        print(f"{name:26s} {arm:10s} {min(ts2):7.2f} {med:7.2f} {len(ts2):3d}")


if __name__ == "__main__":
    main()
