"""Market-wide daily summary — parity with
``dbt/models/marts/mart_daily_summary.sql``.

Aggregation inventory covered (SURVEY.md §2.4): A4 count-distinct,
A5 conditional counts (``countif``, 8 uses), A6 avg, A7 exact median,
A8 stddev, A9 max/min, A10 argmax/argmin (``max_by``/``min_by`` top
gainer/loser), A11 sum, A12 ratio-of-aggregates with nullif guard;
plus O1 global sort ``ORDER BY trade_date DESC``
(``mart_daily_summary.sql:22-77``).

Scale: one hash-aggregate shuffle keyed by trade_date. All measures
(including count_if / max_by / min_by) have map-side partial
aggregation; ``median`` is the one exception — exact percentiles
buffer per-group values. With date-grain keys the group count is tiny
(days), so the buffered state is bounded by rows-per-day; if a
percentile over a high-cardinality grain were ever needed at 100 TB,
swap in ``percentile_approx`` (sketch-mergeable) — kept exact here
because the oracle contract demands exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import null_if_zero_divide, round_away


def daily_summary(performance: DataFrame, date_col: str = "trade_date") -> DataFrame:
    ret = F.col("daily_return_pct")
    n_symbols = F.count_distinct(F.col("symbol"))
    return (
        performance.groupBy(date_col)
        .agg(
            n_symbols.alias("symbols_tracked"),
            F.count_if(ret > 0).alias("advancers"),
            F.count_if(ret < 0).alias("decliners"),
            F.count_if(ret == 0).alias("unchanged"),
            round_away(null_if_zero_divide(F.count_if(ret > 0), n_symbols) * 100, 1).alias(
                "advance_decline_ratio_pct"
            ),
            round_away(F.avg(ret), 4).alias("avg_return_pct"),
            round_away(F.median(ret), 4).alias("median_return_pct"),
            round_away(F.stddev_samp(ret), 4).alias("return_stddev"),
            F.max(ret).alias("best_return_pct"),
            F.min(ret).alias("worst_return_pct"),
            # Composite ordering key: two symbols tying on the 4dp-
            # rounded return would otherwise make the argmax
            # nondeterministic (struct compares ret first, then
            # symbol). The key is NULLed for null returns so both
            # engines skip those rows identically — a bare struct key
            # would rank a null field smallest in Spark but LARGEST in
            # DuckDB's struct max (verified empirically).
            F.max_by(
                "symbol", F.when(ret.isNotNull(), F.struct(ret, F.col("symbol")))
            ).alias("top_gainer_symbol"),
            F.min_by(
                "symbol", F.when(ret.isNotNull(), F.struct(ret, F.col("symbol")))
            ).alias("top_loser_symbol"),
            F.sum("volume").alias("total_volume"),
            round_away(F.avg("volume_vs_avg_20d"), 4).alias("avg_volume_vs_norm"),
            F.count_if(F.col("is_high_volume_day")).alias("high_volume_stocks"),
            round_away(F.avg("annualised_volatility_pct"), 2).alias("avg_annualised_vol_pct"),
            round_away(F.avg("intraday_range_pct"), 4).alias("avg_intraday_range_pct"),
            F.count_if(F.col("rsi_signal") == "OVERBOUGHT").alias("overbought_count"),
            F.count_if(F.col("rsi_signal") == "OVERSOLD").alias("oversold_count"),
            F.count_if(F.col("ma_signal_5_20") == "GOLDEN_CROSS").alias(
                "golden_cross_5_20_count"
            ),
            F.count_if(F.col("ma_signal_5_20") == "DEATH_CROSS").alias(
                "death_cross_5_20_count"
            ),
        )
        .orderBy(F.desc(date_col))
    )
