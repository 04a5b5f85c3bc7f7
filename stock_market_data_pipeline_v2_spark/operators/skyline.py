"""Group-wise skyline (pareto-frontier) operator — the classic
multi-criteria OLAP query (Börzsönyi, Kossmann, Stocker, "The Skyline
Operator", ICDE 2001) the registry lacked, in its production form:
one frontier PER GROUP (here per brand) — "the undominated
price/size offerings in each brand's catalog".

Within a brand, a part is DOMINATED if some other part of the same
brand has p_retailprice ≤ its price AND p_size ≤ its size, strictly
better in at least one. The 2-D skyline has the textbook sort-scan
solution: order by price, keep a running minimum of size; a point
survives iff its size is strictly below every strictly-cheaper
point's size (price ties collapse to their min-size champion first —
the only candidate a tie group can contribute).

100 TB shape — nothing single-partition, nothing quadratic:
1. ONE fact aggregate to (brand, price, size) grain (map-side
   combinable; carries the point's part count and a representative
   key).
2. A second tiny aggregate to (brand, price) grain (min size).
3. The per-brand running strict-prefix minimum runs as the repo's
   TWO-LEVEL range pattern (``classifier.py:classifier_calibration``'s
   rank machinery, re-targeted at MIN): ``repartitionByRange`` on
   (brand, price), a local strictly-preceding-rows MIN window per
   (partition, brand), then a (partitions × brands)-sized
   per-partition-minimum frame whose per-brand strict-prefix MIN
   broadcasts back — each auxiliary window covers at most
   ``parallelism`` rows per brand, never a global sorted partition.
4. Survivors (frontier-sized) broadcast-join back to the grain frame
   for the per-point stats.

The naive oracle is the O(n²) NOT-EXISTS dominance test; the
registered DuckDB oracle instead replays the same per-price collapse
+ per-brand strict-prefix window MIN (provably equivalent on the
collapsed grain), so both engines run the linear-after-sort plan.

Reference parity: the reference has no skyline; this extends its
part-dimension marts (dbt/models/marts/) with a standard published
operator the star schema supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def part_skyline(part: DataFrame) -> DataFrame:
    """(brand, price, size, n_parts, min_partkey) pareto-frontier
    rows per brand — minimize both p_retailprice and p_size — ordered
    (brand, price)."""
    # the grain frame feeds BOTH the frontier chain and the final
    # stats join — cache it once (grain-sized, far below the fact) so
    # part scans once; callers release via the `_cached_inputs`
    # contract (dedup.release_cached_inputs / _materialize_and_release).
    g = (
        part.groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_retailprice").alias("price"),
            F.col("p_size").cast("long").alias("size"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.min("p_partkey").cast("long").alias("min_partkey"),
        )
        .cache()
    )
    pp = g.groupBy("brand", "price").agg(F.min("size").alias("size"))

    par = part.sparkSession.sparkContext.defaultParallelism
    # CACHED: `ranged` feeds BOTH the local-window branch and the
    # per-partition-minimum branch, and ``__pid`` comes from
    # ``spark_partition_id`` over a SAMPLED range partitioning — two
    # independent evaluations can sample different bounds (AQE can
    # even coalesce the two subtrees differently), making the local
    # and prior minima disagree. Materializing the pid assignment
    # once is what makes the two-level decomposition exact (caught at
    # sf0.1: 7 frontier rows flipped when only `g` was cached).
    ranged = (
        pp.repartitionByRange(par, F.asc("brand"), F.asc("price"))
        .withColumn("__pid", F.spark_partition_id())
        .cache()
    )
    w_loc = (
        Window.partitionBy("__pid", "brand")
        .orderBy(F.asc("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("__lmin", F.min("size").over(w_loc))
    # ≤ parallelism rows per brand — bounded by construction, never a
    # corpus-scale window.
    w_prior = (
        Window.partitionBy("brand")
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    priors = (
        ranged.groupBy("__pid", "brand")
        .agg(F.min("size").alias("__pmin"))
        .select(
            "__pid", "brand", F.min("__pmin").over(w_prior).alias("__prior")
        )
    )
    # least() skips NULLs: a brand-frontier head (no cheaper price for
    # the brand anywhere) has both bounds NULL and survives.
    frontier = (
        local.join(F.broadcast(priors), ["__pid", "brand"])
        .withColumn("__bound", F.least("__lmin", "__prior"))
        .filter(F.col("__bound").isNull() | (F.col("size") < F.col("__bound")))
        .select("brand", "price", "size")
    )
    out = (
        g.join(F.broadcast(frontier), ["brand", "price", "size"])
        .select("brand", "price", "size", "n_parts", "min_partkey")
        .orderBy("brand", "price")
    )
    out._cached_inputs = (g, ranged)
    return out


PART_SKYLINE_SQL = """
WITH g AS (
    SELECT p_brand AS brand, p_retailprice AS price,
        CAST(p_size AS BIGINT) AS size,
        CAST(count(*) AS BIGINT) AS n_parts,
        CAST(min(p_partkey) AS BIGINT) AS min_partkey
    FROM part GROUP BY 1, 2, 3
),
pp AS (SELECT brand, price, min(size) AS size FROM g GROUP BY 1, 2),
r AS (
    SELECT brand, price, size,
        min(size) OVER (
            PARTITION BY brand ORDER BY price
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ) AS prior_min
    FROM pp
)
SELECT r.brand, r.price, r.size, g.n_parts, g.min_partkey
FROM r JOIN g
    ON g.brand = r.brand AND g.price = r.price AND g.size = r.size
WHERE r.prior_min IS NULL OR r.size < r.prior_min
ORDER BY r.brand, r.price
"""
