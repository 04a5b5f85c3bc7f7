"""DuckDB oracle SQL for every oracle-checkable query.

Each string is ANSI SQL the driver runs in DuckDB against the same
parquet tables as the Spark plans (views pre-registered: region nation
customer supplier part orders lineitem events documents embeddings).
Column aliases match the Spark output exactly — the driver sorts
columns by name before hashing values.

Shared CTE fragments keep the bar/returns/indicator lineage identical
across queries (same trick as the reference's ephemeral dbt models,
``dbt_project.yml:31-32``: intermediates inline as CTEs).
"""

# Events → typed tick view (entity=event_type stands in for ticker,
# value for price, props.k for traded quantity; FIXTURES.md §5).
EVENTS_TICKS = """
ticks AS (
    SELECT
        upper(trim(event_type))                             AS symbol,
        CAST(ts AS TIMESTAMP)                               AS ts,
        event_id,
        CAST(value AS DOUBLE)                               AS price,
        CAST(json_extract_string(props, '$.k') AS BIGINT)   AS qty
    FROM events
)
"""

# OHLCV bar per (symbol, day) — parity with operators.bars.bars_from_events.
DAILY_BARS = """
ranked_ticks AS (
    SELECT
        symbol,
        CAST(ts AS DATE)  AS trade_date,
        price,
        qty,
        row_number() OVER (PARTITION BY symbol, CAST(ts AS DATE)
                           ORDER BY ts, event_id)             AS rn_first,
        row_number() OVER (PARTITION BY symbol, CAST(ts AS DATE)
                           ORDER BY ts DESC, event_id DESC)   AS rn_last
    FROM ticks
),
daily_bars AS (
    SELECT
        symbol,
        trade_date,
        max(CASE WHEN rn_first = 1 THEN price END)  AS open_price,
        max(price)                                  AS high_price,
        min(price)                                  AS low_price,
        max(CASE WHEN rn_last = 1 THEN price END)   AS close_price,
        CAST(sum(qty) AS BIGINT)                    AS volume,
        count(*)                                    AS n_trades
    FROM ranked_ticks
    GROUP BY symbol, trade_date
)
"""

# Staging-quality filters — stg_daily_stock_metrics.sql:52-58 parity.
CLEAN_BARS = """
clean_bars AS (
    SELECT * FROM daily_bars
    WHERE symbol IS NOT NULL
      AND trade_date IS NOT NULL
      AND close_price IS NOT NULL
      AND close_price > 0
      AND volume >= 0
      AND trade_date <= current_date
)
"""

# int_daily_returns.sql:26-64 parity.
DAILY_RETURNS = """
daily_returns AS (
    SELECT
        *,
        lag(close_price) OVER w                                         AS prev_close_price,
        round((close_price - lag(close_price) OVER w)
              / nullif(lag(close_price) OVER w, 0) * 100, 4)            AS daily_return_pct,
        round(high_price - low_price, 4)                                AS intraday_range,
        round((high_price - low_price) / nullif(close_price, 0) * 100, 4)
                                                                        AS intraday_range_pct,
        round(open_price - lag(close_price) OVER w, 4)                  AS overnight_gap,
        CAST(row_number() OVER w AS BIGINT)                             AS symbol_row_num
    FROM clean_bars
    WINDOW w AS (PARTITION BY symbol ORDER BY trade_date)
)
"""


# int_rolling_metrics.sql:26-104 parity (frames share one named window).
ROLLING = """
rolling AS (
    SELECT
        *,
        round(avg(close_price) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4)   AS sma_5d,
        round(avg(close_price) OVER (w ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4)   AS sma_10d,
        round(avg(close_price) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 4)  AS sma_20d,
        round(avg(close_price) OVER (w ROWS BETWEEN 49 PRECEDING AND CURRENT ROW), 4)  AS sma_50d,
        round(stddev_samp(daily_return_pct) OVER
              (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 4)                        AS volatility_20d_pct,
        round(stddev_samp(daily_return_pct) OVER
              (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) * sqrt(252), 4)            AS annualised_volatility_pct,
        round(avg(volume) OVER (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 0)       AS avg_volume_20d,
        round(volume / nullif(avg(volume) OVER
              (w ROWS BETWEEN 19 PRECEDING AND CURRENT ROW), 0), 4)                    AS volume_vs_avg_20d,
        round(100 - (100 / (1 + nullif(
            avg(CASE WHEN daily_return_pct > 0 THEN daily_return_pct ELSE 0 END) OVER
                (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
            / nullif(
                avg(CASE WHEN daily_return_pct < 0 THEN abs(daily_return_pct) ELSE 0 END) OVER
                    (w ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
            0),
        0))), 2)                                                                        AS rsi_14
    FROM daily_returns
    WINDOW w AS (PARTITION BY symbol ORDER BY trade_date)
)
"""

# mart_stock_performance.sql:26-127 parity (join eliminated: same grain).
PERFORMANCE = """
performance AS (
    SELECT
        symbol, trade_date, open_price, high_price, low_price, close_price, volume,
        prev_close_price, daily_return_pct, intraday_range, intraday_range_pct, overnight_gap,
        sma_5d, sma_10d, sma_20d, sma_50d,
        CASE WHEN sma_5d > sma_20d THEN 'GOLDEN_CROSS'
             WHEN sma_5d < sma_20d THEN 'DEATH_CROSS'
             ELSE 'NEUTRAL' END                                        AS ma_signal_5_20,
        CASE WHEN sma_10d > sma_50d THEN 'GOLDEN_CROSS'
             WHEN sma_10d < sma_50d THEN 'DEATH_CROSS'
             ELSE 'NEUTRAL' END                                        AS ma_signal_10_50,
        volatility_20d_pct, annualised_volatility_pct,
        avg_volume_20d, volume_vs_avg_20d,
        CASE WHEN volume_vs_avg_20d >= 2.0 THEN true ELSE false END    AS is_high_volume_day,
        rsi_14,
        CASE WHEN rsi_14 >= 70 THEN 'OVERBOUGHT'
             WHEN rsi_14 <= 30 THEN 'OVERSOLD'
             ELSE 'NEUTRAL' END                                        AS rsi_signal,
        max(high_price) OVER (w ROWS BETWEEN 251 PRECEDING AND CURRENT ROW)  AS high_52w,
        min(low_price)  OVER (w ROWS BETWEEN 251 PRECEDING AND CURRENT ROW)  AS low_52w,
        round((close_price - min(low_price) OVER (w ROWS BETWEEN 251 PRECEDING AND CURRENT ROW))
              / nullif(max(high_price) OVER (w ROWS BETWEEN 251 PRECEDING AND CURRENT ROW)
                       - min(low_price) OVER (w ROWS BETWEEN 251 PRECEDING AND CURRENT ROW), 0)
              * 100, 2)                                                AS pct_of_52w_range
    FROM rolling
    WINDOW w AS (PARTITION BY symbol ORDER BY trade_date)
)
"""


# mart_daily_summary.sql:22-77 parity (countif → FILTER, max_by → arg_max).
DAILY_SUMMARY = """
daily_summary AS (
    SELECT
        trade_date,
        count(DISTINCT symbol)                                          AS symbols_tracked,
        count(*) FILTER (WHERE daily_return_pct > 0)                    AS advancers,
        count(*) FILTER (WHERE daily_return_pct < 0)                    AS decliners,
        count(*) FILTER (WHERE daily_return_pct = 0)                    AS unchanged,
        round(count(*) FILTER (WHERE daily_return_pct > 0)
              / nullif(count(DISTINCT symbol), 0) * 100, 1)             AS advance_decline_ratio_pct,
        round(avg(daily_return_pct), 4)                                 AS avg_return_pct,
        round(median(daily_return_pct), 4)                              AS median_return_pct,
        round(stddev_samp(daily_return_pct), 4)                         AS return_stddev,
        max(daily_return_pct)                                           AS best_return_pct,
        min(daily_return_pct)                                           AS worst_return_pct,
        arg_max(symbol, daily_return_pct)                               AS top_gainer_symbol,
        arg_min(symbol, daily_return_pct)                               AS top_loser_symbol,
        CAST(sum(volume) AS BIGINT)                                     AS total_volume,
        round(avg(volume_vs_avg_20d), 4)                                AS avg_volume_vs_norm,
        count(*) FILTER (WHERE is_high_volume_day)                      AS high_volume_stocks,
        round(avg(annualised_volatility_pct), 2)                        AS avg_annualised_vol_pct,
        round(avg(intraday_range_pct), 4)                               AS avg_intraday_range_pct,
        count(*) FILTER (WHERE rsi_signal = 'OVERBOUGHT')               AS overbought_count,
        count(*) FILTER (WHERE rsi_signal = 'OVERSOLD')                 AS oversold_count,
        count(*) FILTER (WHERE ma_signal_5_20 = 'GOLDEN_CROSS')         AS golden_cross_5_20_count,
        count(*) FILTER (WHERE ma_signal_5_20 = 'DEATH_CROSS')          AS death_cross_5_20_count
    FROM performance
    GROUP BY trade_date
)
"""


# spark_stream_batch_processor.py:42-62 parity. time_bucket and
# F.window both align tumbling buckets to midnight for divisors of 24h.
AGG_15M = """
agg_15m AS (
    SELECT
        symbol,
        time_bucket(INTERVAL '15 minutes', ts)                          AS window_start,
        time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes'  AS window_end,
        round(avg(price), 6)                                            AS ma_15m,
        round(stddev_samp(price), 6)                                    AS volatility_15m,
        CAST(sum(qty) AS BIGINT)                                        AS volume_sum_15m
    FROM ticks
    GROUP BY 1, 2, 3
)
"""

AGG_1H = """
agg_1h AS (
    SELECT
        symbol,
        time_bucket(INTERVAL '1 hour', ts)  AS window_start_1h,
        round(avg(price), 6)                AS ma_1h
    FROM ticks
    GROUP BY 1, 2
)
"""

# J1 interval left join (spark_stream_batch_processor.py:64-72).
WINDOWED_ANALYTICS = """
windowed_analytics AS (
    SELECT
        a.symbol, a.window_start, a.window_end,
        a.ma_15m, a.volatility_15m, a.volume_sum_15m,
        h.ma_1h
    FROM agg_15m a
    LEFT JOIN agg_1h h
      ON a.symbol = h.symbol
     AND a.window_start >= h.window_start_1h
     AND a.window_start <  h.window_start_1h + INTERVAL '1 hour'
)
"""

# stg_realtime_stock_analytics.sql parity (retention filter off — see
# operators/realtime.py:stage_realtime).
STAGED_RT = """
staged AS (
    SELECT
        symbol,
        window_start                                                    AS window_start_at,
        window_end                                                      AS window_end_at,
        CAST(date_diff('minute', window_start, window_end) AS BIGINT)   AS window_duration_minutes,
        ma_15m, ma_1h, volatility_15m,
        volume_sum_15m                                                  AS volume_15m
    FROM windowed_analytics
    WHERE symbol IS NOT NULL
      AND window_start IS NOT NULL
      AND window_end IS NOT NULL
      AND window_start < window_end
)
"""

# int_realtime_enriched.sql:26-104 parity.
ENRICHED_RT = """
enriched AS (
    SELECT
        *,
        CASE WHEN ma_spread > 0 AND ma_15m_delta > 0 THEN 'BULLISH'
             WHEN ma_spread < 0 AND ma_15m_delta < 0 THEN 'BEARISH'
             ELSE 'NEUTRAL' END                                         AS momentum_signal,
        CASE WHEN volatility_15m >= avg_volatility_1h * 2.0 THEN 'HIGH'
             WHEN volatility_15m >= avg_volatility_1h * 1.5 THEN 'ELEVATED'
             WHEN volatility_15m <= avg_volatility_1h * 0.5 THEN 'LOW'
             ELSE 'NORMAL' END                                          AS volatility_regime,
        CASE WHEN avg_volume_1h > 0 AND volume_15m >= avg_volume_1h * 2.0
             THEN true ELSE false END                                   AS is_volume_spike
    FROM (
        SELECT
            *,
            round(ma_15m - lag(ma_15m) OVER w, 4)                       AS ma_15m_delta,
            round(ma_1h - lag(ma_1h) OVER w, 4)                         AS ma_1h_delta,
            round(ma_15m - ma_1h, 4)                                    AS ma_spread,
            round(avg(volume_15m) OVER
                  (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 0)      AS avg_volume_1h,
            round(avg(volatility_15m) OVER
                  (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)      AS avg_volatility_1h
        FROM staged
        WINDOW w AS (PARTITION BY symbol ORDER BY window_start_at)
    )
)
"""

# mart_realtime_signals.sql:22-68 parity.
SIGNALS_RT = """
signals AS (
    SELECT
        symbol, window_start_at, window_end_at, window_duration_minutes,
        ma_15m, ma_1h, ma_spread, ma_15m_delta, ma_1h_delta, momentum_signal,
        volatility_15m, avg_volatility_1h, volatility_regime,
        volume_15m, avg_volume_1h, is_volume_spike,
        CASE WHEN momentum_signal != 'NEUTRAL'
              AND volatility_regime IN ('ELEVATED', 'HIGH')
              AND is_volume_spike THEN true ELSE false END              AS is_multi_signal_alert,
        symbol || ' | ' || momentum_signal || ' | Vol: ' || volatility_regime
               || CASE WHEN is_volume_spike THEN ' | VOLUME SPIKE' ELSE '' END
               || ' @ ' || strftime(window_start_at, '%Y-%m-%d %H:%M')  AS signal_summary
    FROM enriched
)
"""


def with_ctes(*fragments: str, select: str) -> str:
    return "WITH " + ",".join(f.strip() for f in fragments) + "\n" + select


DAILY_BARS_SQL = with_ctes(
    EVENTS_TICKS, DAILY_BARS, CLEAN_BARS, select="SELECT * FROM clean_bars"
)

DAILY_RETURNS_SQL = with_ctes(
    EVENTS_TICKS,
    DAILY_BARS,
    CLEAN_BARS,
    DAILY_RETURNS,
    select="SELECT * FROM daily_returns",
)

ROLLING_INDICATORS_SQL = with_ctes(
    EVENTS_TICKS,
    DAILY_BARS,
    CLEAN_BARS,
    DAILY_RETURNS,
    ROLLING,
    select="SELECT * FROM rolling",
)

DAILY_SUMMARY_SQL = with_ctes(
    EVENTS_TICKS,
    DAILY_BARS,
    CLEAN_BARS,
    DAILY_RETURNS,
    ROLLING,
    PERFORMANCE,
    DAILY_SUMMARY,
    select="SELECT * FROM daily_summary ORDER BY trade_date DESC",
)

STOCK_PERFORMANCE_SQL = with_ctes(
    EVENTS_TICKS,
    DAILY_BARS,
    CLEAN_BARS,
    DAILY_RETURNS,
    ROLLING,
    PERFORMANCE,
    select="SELECT * FROM performance",
)

# operators/dims.py + operators/upsert.py oracles (star schema).
REGIONAL_CUSTOMER_SUMMARY_SQL = """
SELECT
    r.r_name                                            AS region_name,
    count(*)                                            AS customers,
    round(sum(c.c_acctbal), 2)                          AS total_acctbal,
    round(avg(c.c_acctbal), 4)                          AS avg_acctbal,
    count(DISTINCT c.c_mktsegment)                      AS segments
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
"""

PRICING_SUMMARY_SQL = """
SELECT
    l_returnflag,
    l_linestatus,
    round(sum(l_quantity), 2)                                    AS sum_qty,
    round(sum(l_extendedprice), 2)                               AS sum_base_price,
    round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
    round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
    round(avg(l_quantity), 4)                                    AS avg_qty,
    round(avg(l_extendedprice), 4)                               AS avg_price,
    round(avg(l_discount), 4)                                    AS avg_disc,
    count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

TOP_REVENUE_ORDERS_SQL = """
SELECT
    o.o_orderkey,
    o.o_orderdate,
    o.o_orderpriority,
    round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 10
"""

# merge_upsert exercised as: "existing" = events from the first 20
# days, "updates" = the rest; latest (ts, event_id) wins per
# (user_id, event_type). Update-wins tiebreak can't bind on unique
# versions, so the oracle is a pure latest-row-per-key window.
MERGE_UPSERT_SQL = """
WITH tagged AS (
    SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
           row_number() OVER (
               PARTITION BY user_id, event_type
               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
           ) AS rn
    FROM events
)
SELECT user_id, event_type, ts, event_id, value
FROM tagged WHERE rn = 1
"""

WINDOW_AGG_15M_SQL = with_ctes(
    EVENTS_TICKS, AGG_15M, select="SELECT * FROM agg_15m"
)

WINDOWED_ANALYTICS_SQL = with_ctes(
    EVENTS_TICKS,
    AGG_15M,
    AGG_1H,
    WINDOWED_ANALYTICS,
    select="SELECT * FROM windowed_analytics",
)

REALTIME_SIGNALS_SQL = with_ctes(
    EVENTS_TICKS,
    AGG_15M,
    AGG_1H,
    WINDOWED_ANALYTICS,
    STAGED_RT,
    ENRICHED_RT,
    SIGNALS_RT,
    select="SELECT * FROM signals",
)
