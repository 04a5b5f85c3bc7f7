"""Structured Streaming + pipeline tests (SURVEY.md §2.9, §2.11).

Covers what the batch oracle gate can't: incremental file-source
semantics, watermark late-data discard across restarts, checkpointed
exactly-once window emission, foreachBatch gold refresh, Kafka JSON
ser/de round-trip, and the medallion pipeline runner end-to-end.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F


def _write_ticks(path: str, rows: list[dict], name: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/{name}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _tick(sym: str, ts: str, price: float, volume: int = 10) -> dict:
    return {
        "symbol": sym,
        "timestamp": ts,
        "price": price,
        "open": price,
        "high": price,
        "low": price,
        "volume": volume,
    }


def test_streaming_windows_match_batch_and_drop_late(spark, tmp_path):
    from stock_market_data_pipeline_v2_spark.streaming.jobs import start_silver_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")

    _write_ticks(
        src,
        [
            _tick("AAPL", "2024-01-01 09:01:00", 100.0),
            _tick("AAPL", "2024-01-01 09:05:00", 102.0),
            _tick("AAPL", "2024-01-01 09:20:00", 104.0),
            _tick("AAPL", "2024-01-01 10:05:00", 110.0),
        ],
        "batch1",
    )
    q = start_silver_stream(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(120)

    first = spark.read.parquet(out)
    rows = {r.window_start.strftime("%H:%M"): r for r in first.collect()}
    # watermark = max_event(10:05) - 15m = 09:50 → 09:00 and 09:15
    # windows finalized; the 10:00 window stays in state (not emitted).
    assert "09:00" in rows and "09:15" in rows
    assert rows["09:00"].ma_15m == 101.0 and rows["09:00"].volume_sum_15m == 20
    assert "10:00" not in rows

    # Second trigger: one late event (08:59 < watermark) must be
    # DROPPED; one fresh event advances the watermark.
    _write_ticks(
        src,
        [
            _tick("AAPL", "2024-01-01 08:59:00", 999.0),
            _tick("AAPL", "2024-01-01 11:00:00", 120.0),
        ],
        "batch2",
    )
    q = start_silver_stream(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(120)

    final = spark.read.parquet(out)
    starts = [r.window_start.strftime("%H:%M") for r in final.collect()]
    assert sorted(starts).count("09:00") == 1  # late 08:59 dropped, no rewrite
    assert "10:00" in starts  # released once watermark passed
    ma = {r.window_start.strftime("%H:%M"): r.ma_15m for r in final.collect()}
    assert ma["09:00"] == 101.0  # unchanged by the late 999.0 tick


def test_streaming_signals_foreachbatch(spark, tmp_path):
    from stock_market_data_pipeline_v2_spark.streaming.jobs import start_signals_stream

    src = str(tmp_path / "src")
    rows = []
    for h in (9, 10):
        for m in range(0, 60, 5):
            rows.append(_tick("TICK", f"2024-01-01 {h:02d}:{m:02d}:00", 100.0 + h + m / 60))
    rows.append(_tick("TICK", "2024-01-01 12:00:00", 113.0))  # watermark pusher
    _write_ticks(src, rows, "all")

    q = start_signals_stream(
        spark,
        src,
        str(tmp_path / "silver"),
        str(tmp_path / "gold"),
        str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(180)

    gold = spark.read.parquet(str(tmp_path / "gold"))
    got = {r.window_start_at.strftime("%H:%M"): r for r in gold.collect()}
    assert len(got) >= 8
    r = got["09:15"]
    assert r.window_duration_minutes == 15
    assert r.momentum_signal in {"BULLISH", "BEARISH", "NEUTRAL"}
    # 1-h MA is the true tick average of the containing hour
    hour_ticks = [100.0 + 9 + m / 60 for m in range(0, 60, 5)]
    assert abs(r.ma_1h - sum(hour_ticks) / len(hour_ticks)) < 1e-6


def _partition_fingerprint(path: str) -> dict[str, tuple[int, float]]:
    """(size, mtime) per data file under a partition directory."""
    out = {}
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                st = os.stat(os.path.join(root, fn))
                out[os.path.join(root, fn)] = (st.st_size, st.st_mtime)
    return out


def test_streaming_gold_incremental_untouched_symbol(spark, tmp_path):
    """A trigger containing only symbol B must not rewrite symbol A's
    gold partition (incremental recompute + dynamic partition
    overwrite) — the scale guard against O(history) work per trigger."""
    from stock_market_data_pipeline_v2_spark.streaming.jobs import start_signals_stream

    src = str(tmp_path / "src")
    gold_dir = str(tmp_path / "gold")
    rows = []
    for sym in ("AAAA", "BBBB"):
        for m in range(0, 60, 5):
            rows.append(_tick(sym, f"2024-01-01 09:{m:02d}:00", 100.0 + m / 60))
    rows.append(_tick("BBBB", "2024-01-01 11:00:00", 113.0))  # watermark pusher
    _write_ticks(src, rows, "t1")

    q = start_signals_stream(
        spark, src, str(tmp_path / "silver"), gold_dir,
        str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(180)
    before_a = _partition_fingerprint(f"{gold_dir}/symbol=AAAA")
    before_b = _partition_fingerprint(f"{gold_dir}/symbol=BBBB")
    assert before_a and before_b

    # Second trigger: BBBB-only events finalize new BBBB windows.
    _write_ticks(src, [_tick("BBBB", "2024-01-01 12:00:00", 114.0)], "t2")
    q = start_signals_stream(
        spark, src, str(tmp_path / "silver"), gold_dir,
        str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(180)

    assert _partition_fingerprint(f"{gold_dir}/symbol=AAAA") == before_a
    assert _partition_fingerprint(f"{gold_dir}/symbol=BBBB") != before_b
    # And the rewrite is correct, not just different: BBBB gained the
    # 11:00 window once its watermark passed.
    gold = spark.read.parquet(gold_dir)
    b_windows = {
        r.window_start_at.strftime("%H:%M")
        for r in gold.filter(F.col("symbol") == "BBBB").collect()
    }
    assert "11:00" in b_windows


def test_kafka_json_roundtrip(spark):
    from stock_market_data_pipeline_v2_spark.schemas import RAW_TICKS
    from stock_market_data_pipeline_v2_spark.sources.kafka import (
        parse_kafka_json,
        serialize_for_kafka,
    )

    ticks = spark.createDataFrame(
        [
            Row(
                symbol="AAPL",
                timestamp="2024-01-01T09:00:00",
                price=101.5,
                open=101.0,
                high=102.0,
                low=100.5,
                volume=42,
            )
        ],
        schema=RAW_TICKS,
    )
    wire = serialize_for_kafka(ticks)
    assert wire.columns == ["key", "value"]
    assert wire.first().key == "AAPL"
    back = parse_kafka_json(wire, RAW_TICKS)
    assert back.first() == ticks.first()


def test_batch_pipeline_end_to_end(spark, tmp_path):
    from stock_market_data_pipeline_v2_spark.plans.pipeline import run_batch_pipeline

    res = run_batch_pipeline(spark, "/root/testdata/sf0.001", str(tmp_path / "lake"))
    assert res.silver_rows == 150
    assert res.performance_rows == 150
    assert res.summary_rows == 30
    assert res.checks.ok
    # silver zone is symbol-partitioned (partition pruning layout)
    assert any(
        p.startswith("symbol=") for p in os.listdir(str(tmp_path / "lake/silver/daily_bars"))
    )
    # idempotence: incremental re-run converges to the same rows
    res2 = run_batch_pipeline(
        spark, "/root/testdata/sf0.001", str(tmp_path / "lake"), incremental=True
    )
    assert res2.silver_rows == 150


def test_streaming_dedupe_within_watermark(spark, tmp_path):
    from stock_market_data_pipeline_v2_spark.streaming.jobs import start_silver_stream

    src = str(tmp_path / "src")
    # the same tick delivered twice (at-least-once replay) + a distinct one
    dup = _tick("AAPL", "2024-01-01 09:01:00", 100.0, volume=7)
    _write_ticks(src, [dup, dup, _tick("AAPL", "2024-01-01 09:05:00", 102.0, volume=3),
                       _tick("AAPL", "2024-01-01 10:00:00", 110.0)], "b1")
    q = start_silver_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ck"),
        available_now=True, dedupe=True,
    )
    q.awaitTermination(120)
    rows = {r.window_start.strftime("%H:%M"): r for r in
            spark.read.parquet(str(tmp_path / "out")).collect()}
    w = rows["09:00"]
    # duplicate counted ONCE: 2 ticks, volume 7+3, avg (100+102)/2
    assert w.price_cnt == 2 and w.volume_sum_15m == 10 and w.ma_15m == 101.0


def test_streaming_session_windows(spark, tmp_path):
    """session_window works under readStream with a watermark —
    sessions close when the watermark passes start + gap."""
    import json
    import os

    from pyspark.sql import functions as F

    from stock_market_data_pipeline_v2_spark.streaming.jobs import read_tick_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [
        _tick("U1", "2024-01-01 09:00:00", 1.0),
        _tick("U1", "2024-01-01 09:10:00", 2.0),   # same session (gap 10m < 30m)
        _tick("U1", "2024-01-01 11:00:00", 3.0),   # new session
        _tick("U1", "2024-01-01 23:00:00", 9.0),   # watermark pusher
    ]
    with open(f"{src}/f.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    ticks = read_tick_stream(spark, src)
    sessions = (
        ticks.withWatermark("event_time", "30 minutes")
        .groupBy("symbol", F.session_window("event_time", "30 minutes").alias("s"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("price").alias("total"))
        .select("symbol", F.col("s.start").alias("start"), F.col("s.end").alias("end"), "n", "total")
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.start.strftime("%H:%M"): r for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got["09:00"].n == 2 and got["09:00"].total == 3.0
    # session end = last event + gap
    assert got["09:00"].end.strftime("%H:%M") == "09:40"
    assert got["11:00"].n == 1


def test_stateful_tick_features_ema_and_eviction(spark, tmp_path):
    """applyInPandasWithState keyed EMA/VWAP: values match a hand
    recursion across micro-batches, and an idle symbol's state is
    EVICTED by the event-time timer (re-appearing key re-seeds) —
    the bounded-state property keyed streaming needs at scale."""
    from stock_market_data_pipeline_v2_spark.streaming.jobs import read_tick_stream
    from stock_market_data_pipeline_v2_spark.streaming.stateful import (
        stateful_tick_features,
    )

    src = str(tmp_path / "src")
    alpha = 0.2
    # t1: both symbols; t2/t3: only BBBB (advances the watermark past
    # AAAA's 1h idle horizon → timer fires in t3's batch, state
    # removed); t4: AAAA returns and must re-seed from 50.0.
    _write_ticks(src, [
        _tick("AAAA", "2024-01-01 09:00:00", 100.0, 10),
        _tick("AAAA", "2024-01-01 09:10:00", 104.0, 30),
        _tick("BBBB", "2024-01-01 09:10:00", 20.0, 10),
    ], "t1")
    _write_ticks(src, [_tick("BBBB", "2024-01-01 13:00:00", 22.0, 10)], "t2")
    _write_ticks(src, [_tick("BBBB", "2024-01-01 13:10:00", 24.0, 10)], "t3")
    _write_ticks(src, [
        _tick("AAAA", "2024-01-01 13:20:00", 50.0, 10),
        _tick("BBBB", "2024-01-01 13:20:00", 26.0, 10),
    ], "t4")
    # the file source orders micro-batches by mtime — sub-second
    # writes tie, so pin strictly increasing mtimes to fix the order
    for i, name in enumerate(("t1", "t2", "t3", "t4")):
        os.utime(f"{src}/{name}.json", (1704100000 + i, 1704100000 + i))

    ticks = read_tick_stream(spark, src, max_files_per_trigger=1)
    feats = stateful_tick_features(ticks, alpha=alpha)
    q = (
        feats.writeStream.format("memory")
        .queryName("stateful_feats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql(
        "select * from stateful_feats order by last_event_time"
    ).collect()
    last = {}
    for r in rows:  # latest update per symbol (NOT max tick_cnt —
        # eviction resets the count, so the re-seeded row has cnt 1)
        if (
            r.symbol not in last
            or r.last_event_time > last[r.symbol].last_event_time
        ):
            last[r.symbol] = r

    # BBBB never idles: EMA folds all four ticks from seed 20.
    ema_b = 20.0
    for p in (22.0, 24.0, 26.0):
        ema_b = alpha * p + (1 - alpha) * ema_b
    assert abs(last["BBBB"].ema_price - ema_b) < 1e-12
    assert last["BBBB"].tick_cnt == 4
    vwap_b = (20 * 10 + 22 * 10 + 24 * 10 + 26 * 10) / 40
    assert abs(last["BBBB"].vwap - vwap_b) < 1e-12

    # AAAA was evicted while idle: its final state reflects ONLY the
    # post-eviction tick — tick_cnt reset to 1 and EMA re-seeded at
    # 50.0 (continuation would give 0.2*50 + 0.8*ema_pre ≈ 51.3).
    assert last["AAAA"].tick_cnt == 1
    assert abs(last["AAAA"].ema_price - 50.0) < 1e-12
    assert abs(last["AAAA"].vwap - 50.0) < 1e-12
    # and the pre-eviction update WAS emitted earlier (the 2-tick
    # running state from the first micro-batch)
    pre = [r for r in rows if r.symbol == "AAAA" and r.tick_cnt == 2]
    assert len(pre) == 1
    assert abs(pre[0].ema_price - (alpha * 104.0 + (1 - alpha) * 100.0)) < 1e-12


def _alert(sym: str, ts: str, level: str, alert_id: int) -> dict:
    return {"symbol": sym, "alert_ts": ts, "level": level, "alert_id": alert_id}


def test_stream_stream_join_matches_batch_and_appends_once(spark, tmp_path):
    """Watermarked stream-stream inner join: (a) the drained result
    equals the batch join of the same files under the same predicate;
    (b) a second trigger emits only the NEW pairs (checkpointed
    append — no duplicates of finalized pairs); (c) cross-symbol and
    out-of-tolerance pairs never appear."""
    from stock_market_data_pipeline_v2_spark.streaming.jobs import (
        start_enriched_stream,
    )

    ticks = str(tmp_path / "ticks")
    alerts = str(tmp_path / "alerts")
    out = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "ckpt")

    _write_ticks(
        ticks,
        [
            _tick("AAPL", "2024-01-01 09:05:00", 100.0),
            _tick("AAPL", "2024-01-01 09:08:00", 101.0),
            _tick("AAPL", "2024-01-01 09:30:00", 102.0),  # outside tolerance of a1
            _tick("MSFT", "2024-01-01 09:05:00", 200.0),  # wrong symbol for a1
        ],
        "b1",
    )
    _write_alerts = lambda rows, name: _write_ticks(alerts, rows, name)  # noqa: E731
    _write_alerts([_alert("AAPL", "2024-01-01 09:00:00", "warn", 1)], "a1")

    q = start_enriched_stream(spark, ticks, alerts, out, ckpt, available_now=True)
    q.awaitTermination(120)
    got = {(r.symbol, r.event_time.strftime("%H:%M"), r.alert_id) for r in spark.read.parquet(out).collect()}
    assert got == {("AAPL", "09:05", 1), ("AAPL", "09:08", 1)}

    # batch equivalence on the same files
    from stock_market_data_pipeline_v2_spark.schemas import RAW_ALERTS, RAW_TICKS

    bt = (
        spark.read.schema(RAW_TICKS).json(ticks)
        .withColumn("event_time", F.try_to_timestamp("timestamp"))
    )
    ba = (
        spark.read.schema(RAW_ALERTS).json(alerts)
        .withColumn("alert_time", F.try_to_timestamp("alert_ts"))
    )
    batch = bt.alias("t").join(
        ba.alias("a"),
        (F.col("t.symbol") == F.col("a.symbol"))
        & (F.col("a.alert_time") <= F.col("t.event_time"))
        & (F.col("t.event_time") < F.col("a.alert_time") + F.expr("INTERVAL 10 minutes")),
    )
    bset = {
        (r["symbol"], r["event_time"].strftime("%H:%M"), r["alert_id"])
        for r in batch.select("t.symbol", "t.event_time", "a.alert_id").collect()
    }
    assert got == bset

    # second trigger: new alert pairs with an EXISTING buffered tick;
    # previously emitted pairs must not re-emit
    _write_alerts([_alert("AAPL", "2024-01-01 09:25:00", "crit", 2)], "a2")
    q = start_enriched_stream(spark, ticks, alerts, out, ckpt, available_now=True)
    q.awaitTermination(120)
    final = [
        (r.symbol, r.event_time.strftime("%H:%M"), r.alert_id)
        for r in spark.read.parquet(out).collect()
    ]
    assert sorted(final) == sorted(
        [("AAPL", "09:05", 1), ("AAPL", "09:08", 1), ("AAPL", "09:30", 2)]
    )


def test_streaming_admission_verdicts_and_exactly_once(spark, tmp_path):
    """Streaming admission: per-micro-batch verdicts match the batch
    operator's contract, each dropped file is processed exactly once
    across restarts, and the sink is verdict-partitioned."""
    import json

    from pyspark.sql import Row
    from stock_market_data_pipeline_v2_spark.streaming.admission import (
        start_admission_stream,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text="other corpus doc words")]
    )
    src = tmp_path / "drop"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drop(name, rows):
        (src / name).write_text("\n".join(json.dumps(r) for r in rows))

    drop(
        "b1.json",
        [
            {"doc_id": 100, "text": base.upper()},
            {"doc_id": 101, "text": base.replace("kappa", "lambda")},
            {"doc_id": 102, "text": "fresh unrelated content nothing shared here"},
        ],
    )
    q = start_admission_stream(spark, str(src), corpus, out, ckpt)
    q.awaitTermination(120)

    got = {
        r.doc_id: r.verdict
        for r in spark.read.parquet(out).select("doc_id", "verdict").collect()
    }
    assert got == {100: "drop_exact", 101: "drop_neardup", 102: "keep"}

    # restart with a second file: file 1 must NOT be reprocessed
    drop("b2.json", [{"doc_id": 103, "text": base}])
    q2 = start_admission_stream(spark, str(src), corpus, out, ckpt)
    q2.awaitTermination(120)
    rows = spark.read.parquet(out).select("doc_id", "verdict").collect()
    assert len(rows) == 4  # no duplicates of batch 1
    assert {r.doc_id: r.verdict for r in rows}[103] == "drop_exact"

    # verdict-partitioned layout: downstream tails verdict=keep
    import os

    parts = {d for d in os.listdir(out) if d.startswith("verdict=")}
    assert parts == {"verdict=drop_exact", "verdict=drop_neardup", "verdict=keep"}


def test_streaming_image_decode_exactly_once(spark, tmp_path):
    """The REAL PNG codec under readStream: feature rows match the
    batch decoder exactly, and a restart does not re-decode."""
    from stock_market_data_pipeline_v2_spark.operators.multimodal import (
        attach_png_images,
        decode_png_features,
    )
    from stock_market_data_pipeline_v2_spark.streaming.media import (
        start_image_decode_stream,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    media = attach_png_images(docs)
    src = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    media.filter("doc_id < 10").write.mode("append").parquet(src)
    q = start_image_decode_stream(spark, src, out, ckpt)
    q.awaitTermination(120)

    media.filter("doc_id >= 10").write.mode("append").parquet(src)
    q2 = start_image_decode_stream(spark, src, out, ckpt)
    q2.awaitTermination(120)

    got = {
        r.doc_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b, r.pixel_checksum)
        for r in spark.read.parquet(out).collect()
    }
    expect = {
        r.doc_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b, r.pixel_checksum)
        for r in decode_png_features(media).collect()
    }
    assert got == expect  # exactly-once: no dup rows, all 20 present
