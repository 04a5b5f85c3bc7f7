"""Record linkage / entity resolution over dimension attributes.

The classic blocking-join pattern: deduplicate the attribute to its
DISTINCT values first, fuzzy-match within cheap blocks, and only then
relate matches back to fact rows. The distinct-first step is the
whole 100 TB story — a name/entity dimension is orders of magnitude
smaller than the fact table it describes, so the quadratic-looking
similarity join runs over the dimension's distinct values
(|blocks| · avg_block²) while the fact table contributes one
map-side-combinable count aggregate and never enters a fuzzy
comparison. Edit distance is exact Levenshtein (identical DP in
Spark's ``levenshtein`` and DuckDB's — integer outputs, no float
drift), so unlike the similarity *search* tiers there is nothing
approximate to gate: the operator is hash-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    key_col: str,
    max_dist: int = 4,
) -> DataFrame:
    """Within-block fuzzy pairs over the DISTINCT values of
    ``name_col``, blocked on the first whitespace token (the classic
    cheap blocking key: candidate pairs must agree on it exactly,
    which bounds the comparison count and is how a misspelling-
    tolerant match stays subquadratic).

    Output: (block, name_a, name_b, lev_dist, n_rows_a, n_rows_b),
    ``name_a < name_b``, ``lev_dist <= max_dist`` — the row counts
    carried from the fact side make the match table directly usable
    for canonicalization decisions (merge the rarer spelling into the
    more frequent one).
    """
    names = (
        df.groupBy(name_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .select(
            F.col(name_col).alias("name"),
            F.split(F.col(name_col), " ").getItem(0).alias("block"),
            "n_rows",
        )
    )
    a = names.select(
        F.col("block"),
        F.col("name").alias("name_a"),
        F.col("n_rows").alias("n_rows_a"),
    )
    b = names.select(
        F.col("block").alias("__blk_b"),
        F.col("name").alias("name_b"),
        F.col("n_rows").alias("n_rows_b"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(
            b,
            (F.col("block") == F.col("__blk_b"))
            & (F.col("name_a") < F.col("name_b")),
        )
        .select(
            "block",
            "name_a",
            "name_b",
            dist.cast("long").alias("lev_dist"),
            "n_rows_a",
            "n_rows_b",
        )
        .filter(F.col("lev_dist") <= max_dist)
        .orderBy("block", "name_a", "name_b")
    )


def fuzzy_name_oracle_sql(
    table: str, name_col: str, max_dist: int = 4
) -> str:
    """DuckDB twin of :func:`fuzzy_name_pairs`, generated from the
    same parameters (single-source pattern)."""
    return f"""
WITH names AS (
    SELECT {name_col} AS name,
        string_split({name_col}, ' ')[1] AS block,
        CAST(count(*) AS BIGINT) AS n_rows
    FROM {table} GROUP BY 1, 2
)
SELECT a.block, a.name AS name_a, b.name AS name_b,
    CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev_dist,
    a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {max_dist}
ORDER BY a.block, a.name, b.name
"""
