"""Skew mitigation (SURVEY.md §4: at 100 TB, hot symbols need salting
beyond what AQE's skew-join splitting covers).

Two-phase salted aggregation: phase 1 aggregates on
(key, salt = hash(row) % N) spreading a hot key over N reducers;
phase 2 merges the N partials per key. Works for any ALGEBRAIC
aggregate (one whose partial states merge: sum/count/min/max/avg via
sum+count). The helper takes the phase-1 partial aggs and the phase-2
merge exprs explicitly, so the algebra is visible at the call site
rather than guessed by reflection.

AQE's skewJoin handles skewed JOINS automatically (enabled in
session.py); this helper is for skewed GROUP BYs, which AQE does not
re-balance (partial aggregation helps only when the map-side hash
table retains hot keys — high-cardinality-per-key payloads still
funnel to one reducer without salting).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a salted key.

    ``partial_aggs``: name → aggregate over raw rows (phase 1).
    ``merge_aggs``: name → aggregate over phase-1 columns (phase 2).

    Example (sum + count → avg)::

        salted_aggregate(
            events, ["event_type"],
            partial_aggs={"s": F.sum("value"), "c": F.count(F.lit(1))},
            merge_aggs={"total": F.sum("s"), "rows": F.sum("c")},
        )
    """
    salted = df.withColumn(
        "__salt", (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % salt_buckets)
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merge_aggs.items()]
    )
