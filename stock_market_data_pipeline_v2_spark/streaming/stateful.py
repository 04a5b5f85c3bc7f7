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


def _fold_state(
    prior: tuple | None, pdf: "pd.DataFrame", alpha: float
) -> tuple:
    """Fold event-time-sorted rows into the running state tuple
    ``(ema, cum_pv, cum_vol, n, last_us)`` — ONE explicit sequential
    pass SHARED by the streaming handler and the batch twin
    (:func:`stateful_features_batch`), so streaming↔batch equality is
    structural, not tolerance-based.

    The EMA recursion is hand-rolled as ``(1−α)·prev + α·p`` — the
    same double operations as the DuckDB recursive-CTE oracle and the
    MACD kernel (operators/indicators_ext.py); pandas
    ``ewm(adjust=False)`` is NOT bit-identical (its kernel skips the
    update when prev == x). ``cum_pv``/``cum_vol`` accumulate in the
    same left-associative order for the same reason. NULL volume
    counts as 0 (the tick still moves the EMA and the count)."""
    ema: float | None
    if prior is not None:
        ema, cum_pv, cum_vol, n, last_us = prior
    else:
        ema, cum_pv, cum_vol, n, last_us = None, 0.0, 0.0, 0, 0
    prices = pdf["price"].astype("float64").to_numpy()
    vols = pdf["volume"].fillna(0).astype("float64").to_numpy()
    for i in range(len(prices)):
        p = float(prices[i])
        v = float(vols[i])
        ema = p if ema is None else (1 - alpha) * ema + alpha * p
        cum_pv = cum_pv + p * v
        cum_vol = cum_vol + v
    n += len(prices)
    if len(pdf):
        last_us = max(last_us, int(pdf["event_time"].max().value // 1_000))
    return ema, cum_pv, cum_vol, n, last_us


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
        prior = tuple(state.get) if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.dropna(subset=["event_time", "price"])
        if len(batch):
            batch = batch.sort_values("event_time", kind="stable")
        ema, cum_pv, cum_vol, n, last_us = _fold_state(prior, batch, alpha)
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


def stateful_features_batch(
    rows: DataFrame,
    alpha: float = 0.2,
    id_col: str | None = None,
) -> DataFrame:
    """BATCH twin of :func:`stateful_tick_features` (round 10,
    VERDICT r9 #5) — the same per-key running-state fold, run to
    completion over a bounded table: one row per symbol carrying the
    FINAL ``(ema_price, vwap, tick_cnt, last_event_time)`` state, on
    the identical output schema. This is what makes the §2.9 stateful
    tier driver-visible: the recursion is gated by the recursive-CTE
    oracle exactly as MACD's is (oracles.py:stateful_features_sql —
    same double ops in the same order), and the streaming handler
    shares :func:`_fold_state` with this kernel, so the
    streaming-equivalence pytest is a structural identity, not a
    tolerance check.

    Input shape: (symbol, event_time timestamp, price double,
    volume long/double[, ``id_col`` for an ordering tiebreak]) — the
    tick-stream shape, or daily bars renamed into it (the registered
    query folds clean_bars' close/volume series: same state machine,
    bar grain, which keeps the oracle's recursion depth at
    days-per-symbol exactly like the MACD oracle).

    Rows with NULL event_time or price are dropped (the handler's
    ``dropna``); NULL volume counts 0. Ordering is (event_time
    [, id_col]) — pass ``id_col`` whenever event_time alone is not
    unique per symbol, or the fold order (hence the EMA) is
    undefined.

    100 TB shape: groupBy(symbol) + ``applyInPandas`` — one pandas
    frame per symbol per task, the MACD contract (symbol universes
    are thousands-scale and each series fits memory; an unbounded-key
    corpus would run the STREAMING twin, whose eviction bounds
    state). The recursion class is the documented Arrow-kernel
    exception: each output depends on every prior row.
    """
    sort_cols = ["event_time"] + ([id_col] if id_col else [])

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.dropna(subset=["event_time", "price"])
        if not len(pdf):
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _OUT.fields}
            )
        pdf = pdf.sort_values(sort_cols, kind="stable")
        ema, cum_pv, cum_vol, n, last_us = _fold_state(None, pdf, alpha)

        def rnd6(x: float) -> float:
            # DuckDB double rounding (half away from zero) — np.round
            # would round half-to-even and diverge on ties.
            import math

            s = x * 1e6
            return (
                math.floor(s + 0.5) / 1e6
                if x >= 0
                else -math.floor(-s + 0.5) / 1e6
            )

        return pd.DataFrame(
            {
                "symbol": [pdf["symbol"].iloc[0]],
                "ema_price": [rnd6(ema)],
                "vwap": [rnd6(cum_pv / cum_vol) if cum_vol else None],
                "tick_cnt": [n],
                "last_event_time": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return (
        rows.select(
            "symbol",
            "event_time",
            F.col("price").cast("double").alias("price"),
            "volume",
            *([id_col] if id_col else []),
        )
        .groupBy("symbol")
        .applyInPandas(kernel, schema=_OUT)
    )
