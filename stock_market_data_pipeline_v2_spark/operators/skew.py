"""Shuffle-skew hardening: the diagnostic a 100 TB job runs BEFORE
picking a join strategy, and the salt-split join it reaches for when
one key would sink a reducer.

At cluster scale a shuffle is only as fast as its heaviest key: a
single orderkey holding 1% of a 100 TB fact puts ~1 TB on one
reducer. The two operators here are the standard counter-moves,
expressed Spark-first:

- ``join_key_skew`` — per-key weight profile (top-k heaviest keys,
  share, cumulative share). One map-side-combinable count per key +
  a TakeOrdered top-k; nothing driver-side. This is what decides
  whether you broadcast, salt, or let AQE's skew-join handle it.
(``functions/skew.py:salted_aggregate`` is the third member of the
family — two-phase salted GROUP BY for hot grouping keys; this module
adds the JOIN-side technique and the diagnostic that decides between
them.)

- ``salted_priority_revenue`` — the pre-AQE manual skew join: heavy
  keys (found by the profiler's logic) get their big-side rows
  SALT-SPLIT across ``n_salts`` sub-keys while the other side's
  heavy rows are replicated once per salt; light keys join
  unsalted. The union of both joins reproduces the plain join's
  output multiset EXACTLY — the registered query's DuckDB oracle is
  the PLAIN join, so salt-invariance is oracle-checked, not
  asserted. Exactness under re-grouping holds because every
  aggregate is order-free (BIGINT counts, DECIMAL money sums —
  PERF.md lesson 2b); a double sum would be legal SQL but could
  flip pennies when the salt changes the addition order.

Reference parity: the reference's single-node engine never shuffles,
so it has no skew surface; these carry its join/aggregate semantics
(the join-then-aggregate marts of
dbt/models/marts/mart_stock_performance.sql) onto the distributed
plan the 100 TB target requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import round_away, single_partition_key


def join_key_skew(df: DataFrame, key: str, top_k: int = 10) -> DataFrame:
    """Weight profile of a prospective shuffle key: the ``top_k``
    heaviest values of ``key`` with exact row counts, share of the
    table, and cumulative share, plus the table-level context
    (row and distinct-key totals) carried on every row.

    Exactness: counts and totals are BIGINT; ``share`` and
    ``cum_share`` are single divisions of exact integers (each one
    IEEE-deterministic), rounded away-from-zero at 6 dp.

    Plan shape: one map-side-combinable count per key, a TakeOrdered
    ``top_k`` cut (never a global sort), and the totals reduce to a
    1-row broadcast. The cumulative window runs over the <= top_k
    post-limit rows — single-partition BY DESIGN (the
    ``single_partition_key`` contract).
    """
    counts = df.groupBy(F.col(key).alias("key_value")).agg(
        F.count(F.lit(1)).cast("long").alias("key_rows")
    )
    totals = counts.agg(
        F.sum("key_rows").cast("long").alias("total_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    top = counts.orderBy(F.desc("key_rows"), F.asc("key_value")).limit(top_k)
    w = Window.partitionBy(single_partition_key("key_value")).orderBy(
        F.desc("key_rows"), F.asc("key_value")
    )
    cum = F.sum("key_rows").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        top.withColumn("key_rank", F.row_number().over(w).cast("long"))
        .withColumn("__cum", cum)
        .crossJoin(F.broadcast(totals))
        .select(
            "key_rank",
            F.col("key_value").cast("long").alias("key_value"),
            "key_rows",
            round_away(
                F.col("key_rows").cast("double")
                / F.col("total_rows").cast("double"),
                6,
            ).alias("share"),
            round_away(
                F.col("__cum").cast("double")
                / F.col("total_rows").cast("double"),
                6,
            ).alias("cum_share"),
            "total_rows",
            "n_keys",
        )
        .orderBy("key_rank")
    )


def join_key_skew_oracle_sql(table: str, key: str, top_k: int = 10) -> str:
    """Generated DuckDB twin of :func:`join_key_skew` — same exact
    integer state, same single divisions, same tiebreak."""
    return f"""WITH counts AS (
    SELECT {key} AS key_value, CAST(count(*) AS BIGINT) AS key_rows
    FROM {table} GROUP BY 1
),
totals AS (
    SELECT CAST(sum(key_rows) AS BIGINT) AS total_rows,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM counts
),
ranked AS (
    SELECT key_value, key_rows,
        row_number() OVER (ORDER BY key_rows DESC, key_value) AS rk,
        sum(key_rows) OVER (ORDER BY key_rows DESC, key_value
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
    FROM counts
)
SELECT CAST(rk AS BIGINT) AS key_rank,
    CAST(key_value AS BIGINT) AS key_value,
    key_rows,
    floor(CAST(key_rows AS DOUBLE) / CAST(total_rows AS DOUBLE)
          * 1e6 + 0.5) / 1e6 AS share,
    floor(CAST(cum AS DOUBLE) / CAST(total_rows AS DOUBLE)
          * 1e6 + 0.5) / 1e6 AS cum_share,
    total_rows, n_keys
FROM ranked CROSS JOIN totals
WHERE rk <= {top_k}
ORDER BY key_rank
"""


def salted_priority_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    n_salts: int = 8,
    heavy_k: int = 16,
) -> DataFrame:
    """Order-priority revenue mart computed through a MANUAL
    skew-salted join (see module docstring): the ``heavy_k`` heaviest
    join keys (by big-side row count, count-desc/key-asc tiebreak)
    are split across ``n_salts`` sub-keys on the lineitem side while
    their orders rows are replicated once per salt; every other key
    joins with salt 0. The two legs union to the plain join's exact
    output multiset, so the DuckDB oracle is the UNSALTED join — the
    salt's no-op-ness is checked as data.

    Exactness: any aggregate of an identical row multiset matches iff
    the aggregate is order-free — BIGINT counts, an exact distinct
    count, and a DECIMAL revenue sum (rounded once, cast double last).
    The per-row salt is a deterministic hash of the line's identity,
    though ANY salt (even a random one) would produce the same
    output — that is the invariance the oracle checks.

    Plan shape at 100 TB: the heavy-key list is aggregate-sized and
    broadcast for a semi/anti split on each side; the salted leg's
    shuffle spreads each heavy key across ``n_salts`` reducers; the
    light leg shuffles as usual; both joins are equi-joins on
    (key, salt). AQE's skew-join does this re-split automatically for
    sort-merge plans — this is the explicit, engine-independent form
    (and the one you need when the skewed side feeds a grouping AQE
    cannot re-split).
    """
    key_counts = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # the heavy list feeds FOUR semi/anti broadcasts; uncached each one
    # re-scans the fact to recompute the 16-row aggregate (measured: 4
    # lineitem scans in the physical plan). heavy_k rows — the cache is
    # key-list-sized, released via the `_cached_inputs` contract.
    heavy = (
        key_counts.orderBy(F.desc("__c"), F.asc("l_orderkey"))
        .limit(heavy_k)
        .select("l_orderkey")
        .cache()
    )
    li = lineitem.select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_linenumber"
    )
    od = orders.select("o_orderkey", "o_orderpriority")

    li_heavy = li.join(F.broadcast(heavy), "l_orderkey", "left_semi").select(
        F.col("l_orderkey"),
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.pmod(
            F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber")),
            F.lit(n_salts),
        ).alias("__lsalt"),
    )
    li_light = li.join(F.broadcast(heavy), "l_orderkey", "left_anti").select(
        F.col("l_orderkey"),
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.lit(0).cast("bigint").alias("__lsalt"),
    )
    heavy_od = heavy.withColumnRenamed("l_orderkey", "o_orderkey")
    salts = orders.sparkSession.range(n_salts).select(
        F.col("id").alias("__osalt")
    )
    od_heavy = od.join(
        F.broadcast(heavy_od), "o_orderkey", "left_semi"
    ).crossJoin(F.broadcast(salts))
    od_light = od.join(
        F.broadcast(heavy_od), "o_orderkey", "left_anti"
    ).select("*", F.lit(0).cast("bigint").alias("__osalt"))

    joined = li_heavy.unionByName(li_light).join(
        od_heavy.unionByName(od_light),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("__lsalt") == F.col("__osalt")),
        "inner",
    )
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(8,2)")
    )
    out = (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("line_count"),
            F.countDistinct("l_orderkey").cast("long").alias("order_count"),
            rev.alias("__rev"),
        )
        .select(
            "o_orderpriority",
            "line_count",
            "order_count",
            F.round(F.col("__rev"), 2).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
    out._cached_inputs = (heavy,)  # type: ignore[attr-defined]
    return out


# The oracle is deliberately the PLAIN join: matching it proves the
# salt-split is a no-op on the result.
SALTED_PRIORITY_REVENUE_SQL = """
SELECT o.o_orderpriority,
    CAST(count(*) AS BIGINT) AS line_count,
    CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS order_count,
    CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l.l_discount AS DECIMAL(8,2))), 2)
         AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
"""
