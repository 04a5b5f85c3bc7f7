"""Similarity search over an ``array<float>`` embedding column
(BASELINE.json north star: ANN for training-data curation).

Two tiers:

- :func:`cosine_topk` — exact brute-force top-k. The query set is
  broadcast; the corpus side streams through a single scan with the
  cosine evaluated by Catalyst higher-order functions, then a
  per-query top-k via window row_number. Exact, oracle-checkable, and
  the recall ground truth for the ANN tier. Cost O(|corpus|·|queries|)
  — fine when the query set is bounded (it's broadcast anyway).

- :func:`hyperplane_lsh_topk` — the scale path: random-hyperplane LSH
  (SimHash for vectors). Each vector gets a ``n_planes``-bit signature
  (sign of dot with deterministic pseudo-random hyperplanes derived
  from xxhash64 — no stored model, reproducible across runs); probing
  compares only vectors whose signature hamming-distance ≤
  ``max_probe_hamming``, turning O(n·q) into O(candidates). Recall is
  tunable via n_planes/probe budget; verification is exact cosine on
  candidates, so emitted neighbors are never wrong, only possibly
  missing (checked against brute force in tests).

No UDFs, no collect — both tiers are pure DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import round_away
from ..functions.vectors import (
    as_double,
    cosine_from_parts,
    dot,
    dot_unrolled,
    l2_norm_unrolled,
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Exact top-k neighbors per query (self excluded), deterministic
    tiebreak (cosine desc, neighbor id asc)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", l2_norm_unrolled(F.col("qv"), dim))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", l2_norm_unrolled(F.col("cv"), dim))
    cos = cosine_from_parts(
        dot_unrolled(F.col("qv"), F.col("cv"), dim), F.col("qn"), F.col("cn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_raw"), F.asc("neighbor_id")
    )
    par = corpus.sparkSession.sparkContext.defaultParallelism
    return (
        c.repartition(par, "neighbor_id")
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_raw", cos)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            round_away(F.col("cosine_raw"), 6).alias("cosine"),
        )
    )


def _plane(j: int, dim: int) -> list[float]:
    """Deterministic integer-lattice hyperplane j (seeded PRNG — no
    stored model; identical across sessions and runs)."""
    import random

    rng = random.Random(0xC0FFEE + j)
    return [float(rng.randint(-1000, 1000)) for _ in range(dim)]


def _signature(vec: Column, n_planes: int, dim: int) -> Column:
    """n_planes-bit hyperplane signature as a long.

    Plane coefficients are materialized driver-side as literal arrays
    (constant per plan), so the per-row work is n_planes dot products
    in codegen — no per-row hash evaluation.
    """
    sig = F.lit(0).cast("long")
    for j in range(n_planes):
        coeffs = F.array(*[F.lit(c) for c in _plane(j, dim)])
        bit = (dot(vec, coeffs) > 0).cast("long")
        sig = sig.bitwiseOR(F.shiftleft(bit, j))
    return sig


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    max_probe_hamming: int = 7,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: signature hamming pre-filter → exact cosine on the
    surviving candidates. Same output shape as :func:`cosine_topk`."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("cv"),
        _signature(F.col(vec_col), n_planes, dim).alias("csig"),
    ).withColumn("cn", l2_norm_unrolled(F.col("cv"), dim))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
        _signature(F.col(vec_col), n_planes, dim).alias("qsig"),
    ).withColumn("qn", l2_norm_unrolled(F.col("qv"), dim))
    ham = F.bit_count(F.col("csig").bitwiseXOR(F.col("qsig")))
    cos = cosine_from_parts(
        dot_unrolled(F.col("qv"), F.col("cv"), dim), F.col("qn"), F.col("cn")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_raw"), F.asc("neighbor_id")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .filter(ham <= max_probe_hamming)
        .withColumn("cosine_raw", cos)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            round_away(F.col("cosine_raw"), 6).alias("cosine"),
        )
    )
