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
