"""Model-based quality scoring: a frozen-weight linear classifier.

The standard LLM-curation stack scores documents with a small linear
model (fastText-style) beside its heuristic gates; the reference
pipeline has no model layer at all, so this is engine-forward surface
in the LLM-data family (SURVEY.md §6 disposition). The model is a
centroid-difference discriminant over the repo's deterministic
hashing-trick embeddings (``text.hash_embed_documents``), trained
OFFLINE and frozen as literals by ``tools/train_quality_weights.py``
(the ann_state pattern: the engine and the oracle only ever see
frozen numbers).

Cross-engine exactness: the logit is ``bias + Σ w_i·u_i`` over the
6-dp-rounded unit vector, evaluated as one UNROLLED left-associative
chain GENERATED from the same weight literals on both sides (the
``l2_norm_unrolled`` / ``embedding_diversity`` move) — identical IEEE
ops in identical order, so the 6-dp logit is bit-identical and
hash-gated. The sigmoid probability is deliberately NOT an output
column: exp never crosses the oracle boundary (PERF.md), sigmoid is
monotone so every downstream ranking/decile/threshold composes on
the logit unchanged, and the decision flag ``logit > 0`` is the
calibrated 0.5-probability cut.

100 TB design: scoring is a scan-shaped map over the embedding frame
(the expensive part, the token explode + bucket fold, is the already-
audited hash-embedding plan); the model is 65 literals baked into the
expression — no join, no broadcast, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import round_away
from ..quality_weights import QUALITY_BIAS, QUALITY_DIM, QUALITY_WEIGHTS


def _logit_col(vec: Column, weights: list[float], bias: float) -> Column:
    expr: Column = F.lit(float(bias))
    for i, w in enumerate(weights):
        expr = expr + F.lit(float(w)) * F.element_at(vec, i + 1)
    return expr


def quality_classifier(
    documents: DataFrame,
    weights: list[float] | None = None,
    bias: float | None = None,
    dim: int | None = None,
) -> DataFrame:
    """(doc_id, quality_logit 6 dp, predicted_high_quality) for every
    document — the frozen linear model applied to the hash-embedding
    unit vector. Logit hash-gated; flag = unrounded logit > 0."""
    from .text import hash_embed_documents

    weights = QUALITY_WEIGHTS if weights is None else weights
    bias = QUALITY_BIAS if bias is None else bias
    dim = QUALITY_DIM if dim is None else dim
    emb = hash_embed_documents(documents, dim=dim)
    logit = _logit_col(F.col("embedding"), weights, bias)
    return (
        emb.select(
            "doc_id",
            round_away(logit, 6).alias("quality_logit"),
            (logit > 0.0).alias("predicted_high_quality"),
        )
        .orderBy("doc_id")
    )


def quality_classifier_oracle_sql(
    weights: list[float] | None = None,
    bias: float | None = None,
) -> str:
    """DuckDB twin generated from the SAME frozen literals, reusing
    the shared hash-embedding CTE chain (``oracles.HASH_EMBED_CTES``)
    and the same left-associative term order as :func:`_logit_col`."""
    from ..oracles import HASH_EMBED_CTES

    weights = QUALITY_WEIGHTS if weights is None else weights
    bias = QUALITY_BIAS if bias is None else bias
    chain = f"CAST({float(bias)!r} AS DOUBLE)"
    for i, w in enumerate(weights):
        chain += f"\n        + CAST({float(w)!r} AS DOUBLE) * u[{i + 1}]"
    return f"""
WITH {HASH_EMBED_CTES},
uv AS (
    SELECT doc_id,
        CASE WHEN nrm > 0
             THEN list_transform(raw, x -> round(x / nrm, 6))
             ELSE raw END AS u
    FROM n
),
lg AS (
    SELECT doc_id,
        {chain} AS lraw
    FROM uv
)
SELECT doc_id, round(lraw, 6) AS quality_logit,
       lraw > 0.0 AS predicted_high_quality
FROM lg
ORDER BY doc_id
"""


def source_quality_profile(documents: DataFrame) -> DataFrame:
    """Per-source model-quality rollup — the dashboard a curation team
    reads after scoring: documents kept by the frozen classifier and
    the mean logit, per source. Composes :func:`quality_classifier`
    (the logit column is already 6-dp rounded and hash-gated, so the
    group mean can be made order-free by summing the logits as
    DECIMAL(12,6) — exact integer arithmetic in disguise, the
    embedding_diversity move — and dividing ONCE as double).

    Output: (source, n_docs, n_high, kept_frac 6 dp, mean_logit 6 dp).
    100 TB shape: scoring is scan-shaped; this adds one source-grain
    map-side-combinable aggregate."""
    scored = quality_classifier(documents)
    j = documents.select("doc_id", "source").join(scored, "doc_id")
    agg = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("predicted_high_quality"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_high"),
        F.sum(F.col("quality_logit").cast("decimal(12,6)")).alias("__sl"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_high",
        round_away(
            F.col("n_high").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("kept_frac"),
        round_away(
            F.col("__sl").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("mean_logit"),
    ).orderBy("source")


def source_quality_profile_oracle_sql() -> str:
    """DuckDB twin of :func:`source_quality_profile` — wraps the
    generated classifier oracle as a nested-WITH CTE (same frozen
    literals), then the identical decimal-sum/one-divide algebra."""
    qc = quality_classifier_oracle_sql().strip()
    qc = qc.replace("ORDER BY doc_id", "")
    return f"""
WITH qc AS (
{qc}
),
j AS (
    SELECT d.source, qc.quality_logit, qc.predicted_high_quality
    FROM documents d JOIN qc ON d.doc_id = qc.doc_id
)
SELECT source,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(CASE WHEN predicted_high_quality THEN 1 ELSE 0 END)
         AS BIGINT) AS n_high,
    round(CAST(sum(CASE WHEN predicted_high_quality THEN 1 ELSE 0 END)
               AS DOUBLE) / count(*), 6) AS kept_frac,
    round(CAST(sum(CAST(quality_logit AS DECIMAL(12,6))) AS DOUBLE)
          / count(*), 6) AS mean_logit
FROM j
GROUP BY source
ORDER BY source
"""
