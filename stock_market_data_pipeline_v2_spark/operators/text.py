"""Text analysis over the ``documents`` table — the training-data
pipeline surface (BASELINE.json north star; no reference counterpart,
cited capabilities: quality scoring, language ID, token counting,
fingerprinting).

Everything is built-in Catalyst expressions (regexp_count /
regexp_replace / split / md5) — zero Python in the row path, so these
scale like any scan-shaped job: predicate/column pruning applies and
the only shuffle is the final fingerprint groupBy.

Portability notes (oracle = DuckDB):
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all; oracles set it.
- Regex patterns stay in the POSIX-safe subset (char classes,
  alternation, ``\\b``) identical under Java regex and RE2.
- Ratios are computed from raw integer counts and rounded once at the
  end (round-half-away on the binary double, functions/core.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import null_if_zero_divide, round_away

# Marker words per language for the n-gram/stopword heuristic.
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|is|in)\b",
    "de": r"\b(der|die|das|und|ist|ein)\b",
    "es": r"\b(el|la|de|que|y|en)\b",
    "fr": r"\b(le|la|et|les|des|est)\b",
}

STOPWORDS_PATTERN = r"\b(the|a|an|of|and|or|to|is|in|on|for)\b"

# BPE-ish tokenizer: letter runs, digit runs, single non-space symbols.
TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9 ]"


def _norm(col: str = "text") -> Column:
    return F.lower(F.trim(F.col(col)))


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-document counts, ratios and a deterministic quality score.

    quality = capped(words/100) · (1 − capped(punct_ratio·5))
              · (0.3 + 0.7·capped(stopword_ratio·5))
    — length, cleanliness and natural-language-ness factors, each in
    [0,1]; the composite mirrors common pretraining-data heuristics
    (length/punct/stopword gates) in one arithmetic expression.
    """
    t = _norm()
    n_chars = F.length(t)
    n_words = F.size(F.split(t, r"\s+"))
    n_tokens = F.regexp_count(t, F.lit(TOKEN_PATTERN))
    n_letters = F.length(F.regexp_replace(t, r"[^a-z]", ""))
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    n_stop = F.regexp_count(t, F.lit(STOPWORDS_PATTERN))
    punct_ratio = null_if_zero_divide(n_punct.cast("double"), n_chars.cast("double"))
    stop_ratio = null_if_zero_divide(n_stop.cast("double"), n_words.cast("double"))
    quality = (
        F.least(n_words.cast("double") / 100.0, F.lit(1.0))
        * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
        * (0.3 + 0.7 * F.least(stop_ratio * 5.0, F.lit(1.0)))
    )
    return documents.select(
        "doc_id",
        "lang",
        "source",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_tokens.cast("long").alias("n_tokens"),
        n_letters.cast("long").alias("n_letters"),
        n_punct.cast("long").alias("n_punct"),
        n_stop.cast("long").alias("n_stopwords"),
        round_away(null_if_zero_divide(n_letters.cast("double"), n_words.cast("double")), 4).alias(
            "avg_word_len"
        ),
        round_away(punct_ratio, 4).alias("punct_ratio"),
        round_away(stop_ratio, 4).alias("stopword_ratio"),
        round_away(quality, 4).alias("quality_score"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language scores + deterministic argmax prediction
    (tie order en > de > es > fr, as a CASE chain — no UDF)."""
    t = _norm()
    scores = {
        lang: F.regexp_count(t, F.lit(pat)).cast("long") for lang, pat in LANG_MARKERS.items()
    }
    s = {k: F.col(f"score_{k}") for k in scores}
    predicted = (
        F.when(
            (s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] >= s["fr"]), "en"
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]), "de")
        .when(s["es"] >= s["fr"], "es")
        .otherwise("fr")
    )
    return documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[scores[k].alias(f"score_{k}") for k in scores],
    ).withColumn("predicted_lang", predicted)


def doc_fingerprint(documents: DataFrame, shingle_len: int = 5) -> DataFrame:
    """Document fingerprints: full-text md5 + min character-shingle
    hash (a 1-permutation MinHash — the rolling-hash fingerprint used
    for container-level dedup manifests).

    Explode is bounded by text length; the groupBy re-collapses to one
    row per doc, so peak state is O(doc length), shuffle is
    O(total chars) — scan-shaped, safe at any corpus size when
    documents are capped (chunk longer docs upstream).
    """
    # Per-row array_min over the shingle-hash array: the whole
    # fingerprint is computed inside the scan projection — no explode,
    # no shuffle, no aggregation. Scan-shaped at any corpus size.
    t = F.col("t")
    positions = F.sequence(
        F.lit(1), F.greatest(F.length(t) - (shingle_len - 1), F.lit(1))
    )
    min_hash = F.array_min(
        F.transform(positions, lambda i: F.md5(t.substr(i, F.lit(shingle_len))))
    )
    # Small corpus files arrive as one input split; the hash work is
    # O(chars) per row, so buy parallelism with one cheap repartition
    # of (doc_id, text) — at real scale the scan itself has splits and
    # this becomes a no-op to remove.
    par = documents.sparkSession.sparkContext.defaultParallelism
    return (
        documents.select("doc_id", _norm().alias("t"))
        .repartition(par)
        .select(
            "doc_id",
            F.md5(t).alias("full_md5"),
            min_hash.alias("min_shingle_hash"),
        )
    )
