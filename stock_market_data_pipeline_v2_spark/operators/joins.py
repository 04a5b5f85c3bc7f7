"""Join operators (SURVEY.md §2.3).

J1 — interval/range left join: assign each fine-grained window to its
containing coarse window (reference:
``spark_stream_batch_processor.py:64-72``). Kept generic: equi keys +
``left_ts ∈ [right_start, right_start + interval)``.

Scale note: a plain range-predicate join plans as
BroadcastNestedLoopJoin (small right side) or sort-merge with a
post-filter — both explode at 100 TB. :func:`interval_left_join`
therefore *derives* the coarse bucket on the left side
(``F.window(left_ts, interval).start``) and joins on
``keys + [bucket == right_start]`` — an EQUI join Catalyst can
hash/sort-merge-partition correctly. This is semantically identical
whenever the right side is keyed by aligned tumbling-window starts
(true for the reference's 1-hour aggregates) and turns an O(n·m)
range join into an O(n) co-partitioned join.

J2 (equi inner join, ``mart_stock_performance.sql:120-124``) is
exercised via :func:`broadcast_dim_join` and the dim-enrichment query
— in the performance mart itself the join is eliminated (see
operators/performance.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_left_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_start: str,
    interval: str = "1 hour",
) -> DataFrame:
    """J1 as an equi join on the derived containing-bucket start."""
    bucket = F.window(F.col(left_ts), interval).start.alias("__bucket")
    lhs = left.withColumn("__bucket", bucket)
    rhs = right.withColumnRenamed(right_start, "__bucket")
    return lhs.join(rhs, [*keys, "__bucket"], "left").drop("__bucket")


def interval_left_join_range(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_start: str,
    interval: str = "1 hour",
) -> DataFrame:
    """Literal J1 shape (range predicate) — reference parity form.

    Kept for genuinely unaligned right sides; prefer
    :func:`interval_left_join` when buckets are tumbling-aligned.
    """
    cond = F.lit(True)
    for k in keys:
        cond = cond & (left[k] == right[k])
    cond = (
        cond
        & (left[left_ts] >= right[right_start])
        & (left[left_ts] < right[right_start] + F.expr(f"INTERVAL {interval}"))
    )
    joined = left.join(right, cond, "left")
    for k in keys:
        joined = joined.drop(right[k])
    return joined.drop(right[right_start])


def broadcast_dim_join(
    fact: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """S14/J2: enrich a fact table with a small dimension, broadcast.

    The reference ships a ticker dimension seed it never joins
    (``dbt/seeds/sp500_tickers.csv``, SURVEY.md §2.1 S14); this is the
    broadcast equi-join it implies. Explicit ``F.broadcast`` removes
    the shuffle entirely — the dim rides to every executor.
    """
    return fact.join(F.broadcast(dim), list(keys), how)
