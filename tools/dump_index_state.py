#!/usr/bin/env python
"""Freeze the deterministic ANN index state per test scale factor.

Builds the entry-contract IVF index (n_assign=3) and PQ index over
each SF's embeddings table — both trainers are deterministic
functions of the sorted sample since round 5 — and writes the model
state (centroids + codebook) to
``stock_market_data_pipeline_v2_spark/index_state/<label>.json``.
The generated DuckDB oracles in ``ann_state.py`` expand this state
into VALUES literals; the pytest
``test_llm_ops.py::test_frozen_index_state_matches_live_build``
fails if a live rebuild ever drifts from the frozen copy.

Usage: python tools/dump_index_state.py [sf_dir ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def main() -> None:
    from stock_market_data_pipeline_v2_spark.ann_state import (
        STATE_DIR,
        compute_state,
        sf_label,
    )
    from stock_market_data_pipeline_v2_spark.session import get_spark

    spark = get_spark()
    STATE_DIR.mkdir(exist_ok=True)
    for sf_dir in sys.argv[1:] or DEFAULT_SFS:
        state = compute_state(spark, sf_dir)
        path = STATE_DIR / f"{sf_label(sf_dir)}.json"
        path.write_text(json.dumps(state))
        print(
            f"wrote {path}: n_cells={state['n_cells']} "
            f"pq {state['pq']['m']}x{state['pq']['ksub']}"
        )


if __name__ == "__main__":
    main()
