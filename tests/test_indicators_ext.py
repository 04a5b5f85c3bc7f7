"""Extended indicators + BLAS dedup tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Row
from pyspark.sql import functions as F


def _bars(spark, closes, symbol="AAPL"):
    rows = [
        Row(
            symbol=symbol,
            trade_date=f"2024-01-{d+1:02d}",
            open_price=float(c),
            high_price=float(c) + 1,
            low_price=float(c) - 1,
            close_price=float(c),
            volume=100,
        )
        for d, c in enumerate(closes)
    ]
    return spark.createDataFrame(rows).withColumn("trade_date", F.to_date("trade_date"))


def test_bollinger_golden(spark):
    from stock_market_data_pipeline_v2_spark.operators.indicators_ext import (
        bollinger_bands,
    )

    out = bollinger_bands(_bars(spark, [10, 20, 30])).orderBy("trade_date").collect()
    # row 3: mid = 20, stddev_samp = 10 → upper 40, lower 0, %B = 75
    assert out[2].bb_mid == 20.0
    assert out[2].bb_upper == 40.0 and out[2].bb_lower == 0.0
    assert out[2].bb_pct_b == 75.0
    # single-row frame: stddev null → bands null, %B null
    assert out[0].bb_upper is None and out[0].bb_pct_b is None


def test_stochastic_golden(spark):
    from stock_market_data_pipeline_v2_spark.operators.indicators_ext import (
        stochastic_k,
    )

    out = stochastic_k(_bars(spark, [10, 20, 30])).orderBy("trade_date").collect()
    # row 3: high14 = 31, low14 = 9 → (30-9)/22*100 = 95.4545
    assert out[2].stoch_k == 95.4545


def test_macd_matches_pandas_ewm(spark):
    from stock_market_data_pipeline_v2_spark.operators.indicators_ext import macd

    closes = [10.0, 11.0, 10.5, 12.0, 13.0, 12.5, 14.0, 15.0, 14.5, 16.0]
    out = macd(_bars(spark, closes)).orderBy("trade_date").toPandas()
    s = pd.Series(closes)
    ema12 = s.ewm(span=12, adjust=False).mean()
    ema26 = s.ewm(span=26, adjust=False).mean()
    line = ema12 - ema26
    sig = line.ewm(span=9, adjust=False).mean()
    assert list(out["ema_12"]) == list(ema12.round(4))
    assert list(out["macd"]) == list(line.round(4))
    assert list(out["macd_signal"]) == list(sig.round(4))
    # first row: all EMAs seed at the first close → macd 0
    assert out["macd"].iloc[0] == 0.0


def test_blas_dedup_equals_exact(spark):
    from stock_market_data_pipeline_v2_spark.operators.dedup import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_blas,
    )

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_neardup_pairs(embs, threshold=0.35).collect()
    }
    blas = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_neardup_pairs_blas(embs, threshold=0.35).collect()
    }
    assert exact and blas == exact  # identical pairs AND identical values
    # Force a multi-block grid (500 vectors / block_rows=64 → 8 blocks,
    # 36 grid cells) so the diagonal/bipartite cell logic is exercised
    # — at default block_rows small corpora collapse to one block and
    # a grid bug (e.g. dropping cross-block pairs whose block-i member
    # has the larger id) would go unseen.
    blas_grid = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_neardup_pairs_blas(
            embs, threshold=0.35, block_rows=64
        ).collect()
    }
    assert blas_grid == exact


def test_atr_obv_golden(spark):
    from stock_market_data_pipeline_v2_spark.operators.indicators_ext import (
        atr_obv,
    )

    # closes 10, 20, 15, 15 with high = c+1, low = c-1, volume 100
    out = atr_obv(_bars(spark, [10, 20, 15, 15])).orderBy("trade_date").collect()
    # row 1: no prior close -> TR = high-low = 2, OBV flow 0
    assert out[0].true_range == 2.0 and out[0].obv == 0
    # row 2: TR = max(2, |21-10|, |19-10|) = 11; ATR = (2+11)/2 = 6.5
    assert out[1].true_range == 11.0 and out[1].atr_14 == 6.5
    # OBV: up day (+100)
    assert out[1].obv == 100
    # row 3: down day -> OBV 0; TR = max(2, |16-20|, |14-20|) = 6
    assert out[2].true_range == 6.0 and out[2].obv == 0
    # row 4: unchanged close -> flow 0, OBV stays 0
    assert out[3].obv == 0
    assert out[3].atr_14 == round((2 + 11 + 6 + 2) / 4, 4)


def test_drawdown_golden(spark):
    from stock_market_data_pipeline_v2_spark.operators.indicators_ext import (
        drawdown,
    )

    out = drawdown(_bars(spark, [10, 8, 12, 9])).orderBy("trade_date").collect()
    assert [r.peak_close for r in out] == [10.0, 10.0, 12.0, 12.0]
    assert out[1].drawdown_pct == -0.2
    assert out[2].drawdown_pct == 0.0
    assert out[3].drawdown_pct == -0.25
    # the full-partition minimum rides every row
    assert all(r.max_drawdown_pct == -0.25 for r in out)


def test_rolling_beta_planted(spark):
    """Two symbols, A's return always exactly 2x B's: the equal-weight
    market is 1.5x B, A's beta vs market = 2/1.5, B's = 1/1.5 —
    constant over every full window."""
    from pyspark.sql import Row

    from stock_market_data_pipeline_v2_spark.operators.stats import rolling_beta

    rows = []
    rets = [0.01, -0.02, 0.03, 0.005, -0.01, 0.02, 0.015, -0.005, 0.01, 0.02,
            -0.03, 0.01]
    for d, r in enumerate(rets):
        for sym, mult in (("A", 2.0), ("B", 1.0)):
            rows.append(Row(symbol=sym, trade_date=f"2024-01-{d+1:02d}",
                            daily_return_pct=r * mult))
    df = spark.createDataFrame(rows).withColumn(
        "trade_date", F.to_date("trade_date")
    )
    out = rolling_beta(df, n=10).collect()
    # 12 dates, window 10 -> 3 full frames per symbol
    assert len(out) == 6
    for r in out:
        expected = round((2.0 if r.symbol == "A" else 1.0) / 1.5, 6)
        assert abs(r.beta_10d - expected) < 1e-9, r


def test_pattern_match_short_series_empty(spark):
    """Symbols with fewer than `window` return rows produce no
    candidate windows (lag chain nulls filtered), not garbage."""
    from pyspark.sql import Row

    from stock_market_data_pipeline_v2_spark.operators.stats import (
        pattern_match_topk,
    )

    import datetime

    rows = [
        Row(
            symbol="A",
            trade_date=datetime.date(2024, 1, d),
            daily_return_pct=float(d),
        )
        for d in range(1, 11)
    ]
    out = pattern_match_topk(spark.createDataFrame(rows), k=5, window=20)
    assert out.count() == 0


def test_pattern_match_perfect_ramp_scores_one(spark):
    """A symbol whose trailing 20 returns ARE the rising ramp matches
    the pattern with correlation exactly 1 (z-normalization makes the
    score scale-free)."""
    import datetime

    from pyspark.sql import Row

    from stock_market_data_pipeline_v2_spark.operators.stats import (
        pattern_match_topk,
    )

    rows = [
        Row(
            symbol="RAMP",
            trade_date=datetime.date(2024, 1, 1) + datetime.timedelta(days=j),
            daily_return_pct=5.0 + 3.0 * j,  # affine ramp: corr is scale-free
        )
        for j in range(20)
    ]
    out = pattern_match_topk(spark.createDataFrame(rows), k=5, window=20).collect()
    assert len(out) == 1
    assert out[0]["pattern_corr"] == 1.0 and out[0]["match_rank"] == 1
