#!/usr/bin/env python
"""Snapshot key query outputs at sf0.001 into tests/goldens/*.json.

Run ONLY when a semantic change is intended and oracle-verified —
goldens exist to catch accidental drift when a query and its oracle
are edited together (the parity gate can't see coordinated mistakes).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN_QUERIES = ["stock_performance", "daily_summary", "realtime_signals", "dedup_ngram_jaccard"]
SF = "/root/testdata/sf0.001"


def snapshot(df) -> list[dict]:
    rows = [r.asDict() for r in df.collect()]
    for r in rows:
        for k, v in r.items():
            if hasattr(v, "isoformat"):
                r[k] = v.isoformat()
    cols = sorted(rows[0]) if rows else []
    return sorted(
        ([r[c] for c in cols] for r in rows),
        key=lambda row: json.dumps(row, default=str),
    ), cols


def main() -> None:
    from stock_market_data_pipeline_v2_spark.session import get_spark

    import __spark_entry__ as m

    spark = get_spark("goldens")
    out_dir = REPO / "tests" / "goldens"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in GOLDEN_QUERIES:
        rows, cols = snapshot(m.queries()[name](spark, SF))
        (out_dir / f"{name}.json").write_text(
            json.dumps({"columns": cols, "rows": rows}, indent=None, default=str)
        )
        print(f"wrote {name}: {len(rows)} rows")


if __name__ == "__main__":
    main()
