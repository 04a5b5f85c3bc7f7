#!/usr/bin/env python
"""Print plan-shape metrics (shuffles, windows, join strategies,
pushdown) for every registered query. Usage:
python tools/explain_audit.py [query ...]"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    from stock_market_data_pipeline_v2_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("explain-audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    qs = entrymod.queries()
    names = sys.argv[1:] or list(qs)
    sf = "/root/testdata/sf0.01"
    for name in names:
        try:
            df = qs[name](spark, sf)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} ERROR {e}")
            continue
        pushed = re.findall(r"PushedFilters: (\[[^\]]*\])", plan)
        print(
            f"{name:36s} exchanges={plan.count('Exchange')//2:2d} "
            f"windows={plan.count('Window')//2} "
            f"bhj={plan.count('BroadcastHashJoin')//2} "
            f"smj={plan.count('SortMergeJoin')//2} "
            f"bnlj={plan.count('BroadcastNestedLoopJoin')//2} "
            f"pushdown={'yes' if any(p != '[]' for p in pushed) else 'no'}"
        )


if __name__ == "__main__":
    main()
