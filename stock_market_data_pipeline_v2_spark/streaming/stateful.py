"""Custom stateful streaming operator (SURVEY.md §2.9 extension):
per-symbol running features that are NOT window-expressible.

The windowed path (jobs.py) covers everything expressible as a
watermarked aggregation. What it cannot express is a RECURSIVE
per-key feature — an EMA whose value depends on every prior tick —
because streaming windows only see their own window's rows. The
reference has no counterpart (its "streaming" is cron re-reads);
batch-side the same recursion lives in MACD's per-symbol
``applyInPandas`` (operators/indicators_ext.py). This module is the
streaming twin: ``applyInPandasWithState`` keeps one small state row
per symbol and folds each micro-batch into it.

Scale/semantics design:

- State is O(live symbols), a handful of doubles each — the classic
  keyed-state shape that Spark shards across executors by group key;
  no state row ever exceeds a few hundred bytes regardless of stream
  length.
- EVICTION: symbols idle past ``idle_timeout`` (event time, judged
  against the watermark) are dropped via ``GroupStateTimeout``.
  Without eviction, a 100 TB stream with an unbounded key universe
  (think: document ids, not stock symbols) grows state forever —
  eviction is what makes keyed state safe at scale. A re-appearing
  evicted key re-seeds from its first new tick.
- ORDERING: rows are folded in event-time order WITHIN a micro-batch
  (sorted in the handler); cross-batch order is arrival order. Exact
  replay determinism therefore holds per checkpointed batch boundary
  — the same property every keyed-state engine (Flink included)
  offers. Feed through ``dedupe_ticks`` for effectively-once input.
- The handler is Arrow-batched (pandas in/out) and touches only the
  micro-batch's rows for the key — never history, which lives folded
  in the state tuple.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_OUT = StructType(
    [
        StructField("symbol", StringType()),
        StructField("ema_price", DoubleType()),
        StructField("vwap", DoubleType()),
        StructField("tick_cnt", LongType()),
        StructField("last_event_time", TimestampType()),
    ]
)
# (ema, cum_price_volume, cum_volume, n, last_event_micros)
_STATE = StructType(
    [
        StructField("ema", DoubleType()),
        StructField("cum_pv", DoubleType()),
        StructField("cum_vol", DoubleType()),
        StructField("n", LongType()),
        StructField("last_us", LongType()),
    ]
)

_US = 1_000_000


def _fold_ema(prior: float | None, prices: "pd.Series", alpha: float) -> float:
    """Recursive EMA seeded at ``prior`` (or the first price):
    pandas ewm(adjust=False) IS the recursion y_t = α·p_t + (1−α)·y_{t−1};
    prepending the prior as a synthetic first sample seeds it."""
    if prior is not None:
        series = pd.concat([pd.Series([prior]), prices], ignore_index=True)
    else:
        series = prices
    return float(series.ewm(alpha=alpha, adjust=False).mean().iloc[-1])


def stateful_tick_features(
    ticks: DataFrame,
    alpha: float = 0.2,
    watermark: str = "15 minutes",
    idle_timeout_us: int = 3600 * _US,
) -> DataFrame:
    """Streaming per-symbol running EMA + cumulative VWAP via keyed
    state. Input: a tick stream with (symbol, event_time, price,
    volume). Output (update mode): one row per (symbol, micro-batch
    with activity) carrying the post-batch running values.

    ``idle_timeout_us``: event-time idle horizon (µs) after which a
    symbol's state is evicted — judged against the watermark, so
    eviction is deterministic in event time, not wall clock.
    """

    def handle(
        key: tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Idle past the horizon: drop the state row entirely. A
            # later tick for this symbol re-seeds from scratch.
            state.remove()
            return
        ema: float | None
        cum_pv, cum_vol, n, last_us = 0.0, 0.0, 0, 0
        if state.exists:
            ema, cum_pv, cum_vol, n, last_us = state.get
        else:
            ema = None
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.dropna(subset=["event_time", "price"])
        if len(batch):
            batch = batch.sort_values("event_time", kind="stable")
            ema = _fold_ema(ema, batch["price"].astype("float64"), alpha)
            vol = batch["volume"].fillna(0).astype("float64")
            cum_pv += float((batch["price"].astype("float64") * vol).sum())
            cum_vol += float(vol.sum())
            n += len(batch)
            last_us = max(
                last_us, int(batch["event_time"].max().value // 1_000)
            )
        state.update((ema, cum_pv, cum_vol, n, last_us))
        # Event-time timer: fires once the watermark passes it.
        state.setTimeoutTimestamp((last_us + idle_timeout_us) // 1_000)
        if len(batch):
            yield pd.DataFrame(
                {
                    "symbol": [key[0]],
                    "ema_price": [ema],
                    "vwap": [cum_pv / cum_vol if cum_vol else None],
                    "tick_cnt": [n],
                    "last_event_time": [pd.Timestamp(last_us, unit="us")],
                }
            )

    return (
        ticks.withWatermark("event_time", watermark)
        .groupBy("symbol")
        .applyInPandasWithState(
            handle,
            outputStructType=_OUT,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
