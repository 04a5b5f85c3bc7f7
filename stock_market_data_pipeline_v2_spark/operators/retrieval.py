"""Lexical retrieval + hybrid rank fusion over the ``documents``
corpus — the sparse counterpart to operators/similarity.py's dense
ANN tiers (BASELINE.json north star: a curation pipeline scores and
retrieves training data both lexically and semantically, then fuses).

- :func:`bm25_topk` — Okapi BM25 (Lucene idf variant) for a bounded
  query-term set, entirely plan-side: doc lengths, corpus stats
  (N, avgdl), term df and tf are all DataFrame aggregates; no scalar
  ever visits the driver. Deterministic to the bit: the per-document
  term-contribution sum is an ORDERED fold over the token-sorted
  contribution list (a groupBy ``sum`` would sum in partition order —
  nondeterministic across engines and runs at the ulp level; PERF.md
  lesson 2), and ranking happens on the UNROUNDED score with a
  doc_id tiebreak.

- :func:`rrf_fuse` — reciprocal-rank fusion (Cormack et al. 2009):
  ``score(d) = Σ_lists 1/(k0 + rank_d)``, the standard way to merge
  a lexical and a semantic ranking without score calibration. Pure
  rational arithmetic on small integers → bit-exact across engines.

Scale shape: BM25's explode collapses through map-side combined
aggregates exactly like token_frequency; the query-term tf frame is
bounded by |terms|·n_docs_matching, the df/stats frames are
broadcast-sized model state. RRF is a full-outer join of two
ranked lists already bounded by their k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import round_away, single_partition_key
from .text import TOKEN_PATTERN, _norm


def bm25_topk(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 score for ``query_terms``.

    N (corpus size) and avgdl are computed over documents that
    tokenize to at least one token (a token-free doc can never match
    and contributes no length signal). idf is the Lucene/ATIRE form
    ``ln((N − df + 0.5)/(df + 0.5) + 1)`` — always positive, so
    stop-word-heavy queries cannot flip signs. Output:
    (doc_id, bm25, rank), rank dense from 1 with doc_id tiebreak.
    """
    terms = sorted({t.lower() for t in query_terms})
    toks = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(_norm(), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("token"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + 0.5)
        / (F.col("df") + 0.5)
        + 1.0
    )
    denom = F.col("tf") + k1 * (
        F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    # ordered fold: token-sorted contributions, summed left to right
    # (0.0 + c1 ≡ c1 in IEEE, so DuckDB's initial-less list_reduce
    # folds identically)
    score = F.aggregate(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("token"), contrib.alias("c")))
            ),
            lambda s: s["c"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(score.alias("score"))
    )
    rank_w = Window.partitionBy(single_partition_key("doc_id")).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .select("doc_id", round_away(F.col("score"), 6).alias("bm25"), "rank")
    )


def tfidf_topk(documents: DataFrame, k: int = 5) -> DataFrame:
    """Per-document TF-IDF keyword extraction: the top ``k`` terms of
    every document by ``tf · idf`` — the classic corpus-grounded
    summarization/tagging primitive (what a curation pipeline uses
    for topic tagging, near-dup triage, and retrieval-index keyword
    fields). idf is the smoothed sklearn form
    ``ln((1 + N)/(1 + df)) + 1`` (never zero, so tf always breaks
    frequency ties before the lexicographic one).

    Exactness: tf and df are integer aggregates; idf is one ln of an
    integer ratio; the score is a single double multiply rounded 6 dp
    at the output only — ranking happens on the UNROUNDED score with
    a token tiebreak, so the emitted rank is deterministic and
    engine-independent. Token-free documents emit no rows (no
    keywords to extract).

    Scale shape: the token explode collapses through two map-side
    combined aggregates (tf, then df); the df and N frames are
    model-sized broadcasts; the top-k window is PARTITIONED by
    doc_id — no global window, no corpus-wide sort.
    """
    toks = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(_norm(), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = (
        F.log(
            (F.lit(1.0) + F.col("n_docs"))
            / (F.lit(1.0) + F.col("df"))
        )
        + F.lit(1.0)
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("__raw"), F.asc("token"))
    return (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("__raw", F.col("tf").cast("double") * idf)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "token",
            "tf",
            round_away(F.col("__raw"), 6).alias("tfidf"),
            "rank",
        )
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k0: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists →
    (doc_id, rank_a, rank_b, rrf_score, fused_rank).

    An id absent from one list simply contributes nothing for it
    (full-outer join, missing term = 0) — the standard RRF contract.
    ``1/(k0 + rank)`` and a two-term ordered sum are bit-exact across
    engines; fused_rank breaks score ties by id.
    """
    fa = ranked_a.select(
        F.col(id_col).alias("id"), F.col(rank_col).alias("rank_a")
    )
    fb = ranked_b.select(
        F.col(id_col).alias("id"), F.col(rank_col).alias("rank_b")
    )
    score = F.coalesce(
        F.lit(1.0) / (F.lit(k0) + F.col("rank_a")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("rank_b")), F.lit(0.0))
    w = Window.partitionBy(single_partition_key("id")).orderBy(
        F.desc("rrf_raw"), F.asc("id")
    )
    return (
        fa.join(fb, "id", "full_outer")
        .withColumn("rrf_raw", score)
        .withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .select(
            F.col("id").alias("doc_id"),
            "rank_a",
            "rank_b",
            round_away(F.col("rrf_raw"), 6).alias("rrf_score"),
            "fused_rank",
        )
    )


def pmi_collocations(
    documents: DataFrame, min_count: int = 5, k: int = 100
) -> DataFrame:
    """Collocation mining: the corpus's top-``k`` adjacent-token
    bigrams by pointwise mutual information, PMI = ln(N·C(xy) /
    (C(x)·C(y))) — the classic phrase-extraction signal (tokenizer
    vocabulary design, stop-phrase lists, and index phrase fields all
    start from a PMI table). ``min_count`` floors the bigram count —
    PMI famously explodes on hapax pairs, so rare bigrams are noise
    by construction.

    Exactness: all counts are integers; PMI is one ln of an
    integer-ratio double, rounded 6 dp at output; ranking runs on the
    UNROUNDED score with a bigram tiebreak. Scale shape: two
    map-side-combined token aggregates (bigram grain + unigram
    grain), the unigram table joins in twice by token key
    (broadcast at model size), and the top-k is one ≤-k-sized
    TakeOrdered — never a corpus-wide sort.
    """
    toks = documents.select(
        F.regexp_extract_all(_norm(), F.lit(TOKEN_PATTERN), F.lit(0)).alias("ta")
    )
    bigrams = toks.select(
        F.explode(
            F.filter(
                F.zip_with(
                    F.col("ta"),
                    F.slice(
                        F.col("ta"), 2, F.greatest(F.size("ta") - 1, F.lit(0))
                    ),
                    lambda a, b: F.struct(
                        a.alias("w1"), b.alias("w2"),
                        F.concat(a, F.lit(" "), b).alias("bg"),
                    ),
                ),
                lambda s: s["bg"].isNotNull(),
            )
        ).alias("p")
    ).select("p.w1", "p.w2", "p.bg")
    uni = (
        toks.select(F.explode("ta").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    bi = (
        bigrams.groupBy("w1", "w2", "bg")
        .agg(F.count(F.lit(1)).alias("c_bg"))
        .filter(F.col("c_bg") >= min_count)
    )
    n_tok = uni.agg(F.sum("c_w").alias("n_tokens"))
    pmi = F.log(
        (F.col("n_tokens") * F.col("c_bg")).cast("double")
        / (F.col("c_w1") * F.col("c_w2")).cast("double")
    )
    return (
        bi.join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c_w").alias("c_w1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c_w").alias("c_w2"))),
            "w2",
        )
        .crossJoin(F.broadcast(n_tok))
        .withColumn("__pmi", pmi)
        .orderBy(F.desc("__pmi"), F.asc("bg"))
        .limit(k)
        .select(
            "bg",
            F.col("c_bg").cast("long").alias("n_occurrences"),
            round_away(F.col("__pmi"), 6).alias("pmi"),
        )
    )
