"""Golden-snapshot tests: key query outputs at sf0.001 must match the
checked-in snapshots (tools/update_goldens.py regenerates them —
only run it for INTENDED semantic changes that re-passed the oracle
gate; these exist to catch coordinated query+oracle drift)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

GOLDENS = Path(__file__).parent / "goldens"
SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "name", ["stock_performance", "daily_summary", "realtime_signals", "dedup_ngram_jaccard"]
)
def test_golden(spark, name):
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    import __spark_entry__ as m
    from tools.update_goldens import snapshot

    expected = json.loads((GOLDENS / f"{name}.json").read_text())
    rows, cols = snapshot(m.queries()[name](spark, SF))
    assert cols == expected["columns"]
    assert len(rows) == len(expected["rows"])
    for got, want in zip(rows, expected["rows"]):
        assert got == want
