"""RAKE keyword extraction (Rose, Engel, Cramer, Cowley, "Automatic
Keyword Extraction from Individual Documents", 2010) — the corpus
keyword mart: candidate phrases are maximal runs of non-stopword
tokens (split at punctuation AND stopwords), each word scores
deg(w)/freq(w) (degree = Σ phrase length over its occurrences —
favoring words that live in long phrases), and a phrase scores the
sum of its word scores; top-k phrases corpus-wide.

Cross-engine exactness: deg and freq are exact BIGINT counts; each
word score is ONE double division quantized to DECIMAL(18,6) by the
house rounding (`round_away` ↔ DuckDB `round`), and the phrase score
is a DECIMAL sum of those quantized word scores — order-free, so the
join/aggregation order can never move a ulp. The 6-dp quantization is
part of the operator's spec, not an approximation caveat. Top-k ties
break on the phrase string; the rank window runs post-limit over ≤ k
rows (`single_partition_key` contract, the copurchase_rules
precedent).

Single-source pattern: the stopword list and split regexes below
generate BOTH the Spark expressions and the DuckDB oracle
(`rake_oracle_sql`) — no parallel maintenance. Regexes stay in the
RE2 ∩ Java subset (word boundaries only, no lookbehind).

100 TB shape: two scans of the phrase frame (occurrence grain →
distinct grain), a vocab-sized word-stats frame broadcast into the
per-phrase score fold, TakeOrderedAndProject for the top-k. Nothing
corpus-quadratic; the heavy lifting is two map-side-combinable
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import round_away, single_partition_key

RAKE_STOPWORDS = (
    "a", "an", "and", "the", "of", "to", "in", "on", "for", "with",
    "as", "by", "at", "or", "is", "are", "was", "were", "be", "this",
    "that", "it", "from",
)
_PUNCT_RE = "[^a-z0-9' ]+"
_STOP_RE = r"\b(" + "|".join(RAKE_STOPWORDS) + r")\b"
_SENTINEL = "§"


def _phrases(documents: DataFrame) -> DataFrame:
    txt = F.lower(F.col("text"))
    txt = F.regexp_replace(txt, _PUNCT_RE, _SENTINEL)
    txt = F.regexp_replace(txt, _STOP_RE, _SENTINEL)
    return (
        documents.select(
            F.explode(F.split(txt, _SENTINEL)).alias("__seg")
        )
        .select(
            F.trim(F.regexp_replace("__seg", " +", " ")).alias("phrase")
        )
        .filter(F.length("phrase") > 0)
    )


def rake_keywords(documents: DataFrame, k: int = 20) -> DataFrame:
    """(rank, phrase, n_words, n_occurrences, score) — the corpus's
    top-k RAKE keyword phrases, score-desc with phrase tiebreak."""
    ph = _phrases(documents)
    occ = ph.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    words_all = ph.select(
        F.explode(F.split("phrase", " ")).alias("word"),
        F.size(F.split("phrase", " ")).cast("long").alias("__plen"),
    )
    wstats = words_all.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("__freq"),
        F.sum("__plen").cast("long").alias("__deg"),
    )
    pw = occ.select(
        "phrase",
        "n_occurrences",
        F.explode(F.split("phrase", " ")).alias("word"),
    )
    scored = (
        pw.join(F.broadcast(wstats), "word")
        .groupBy("phrase", "n_occurrences")
        .agg(
            F.sum(
                round_away(
                    F.col("__deg").cast("double") / F.col("__freq"), 6
                ).cast("decimal(18,6)")
            ).alias("__s")
        )
    )
    top = scored.orderBy(F.desc("__s"), F.asc("phrase")).limit(int(k))
    from pyspark.sql import Window

    w = (
        Window.partitionBy(single_partition_key("phrase"))
        .orderBy(F.desc("__s"), F.asc("phrase"))
    )
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "phrase",
        F.size(F.split("phrase", " ")).cast("long").alias("n_words"),
        "n_occurrences",
        F.col("__s").cast("double").alias("score"),
    ).orderBy("rank")


def rake_oracle_sql(k: int = 20) -> str:
    """DuckDB twin, generated from the SAME stopword/regex/k literals."""
    # DuckDB single-quoted strings pass backslashes through verbatim,
    # so _STOP_RE embeds as-is; only the apostrophe in the punctuation
    # class needs SQL quoting.
    stop_sql = _STOP_RE
    punct_sql = _PUNCT_RE.replace("'", "''")
    return f"""
WITH seg AS (
    SELECT unnest(string_split(
        regexp_replace(
            regexp_replace(lower(text), '{punct_sql}', '{_SENTINEL}', 'g'),
            '{stop_sql}', '{_SENTINEL}', 'g'),
        '{_SENTINEL}')) AS s
    FROM documents
),
ph AS (
    SELECT trim(regexp_replace(s, ' +', ' ', 'g')) AS phrase FROM seg
),
phx AS (SELECT phrase FROM ph WHERE length(phrase) > 0),
occ AS (
    SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM phx GROUP BY 1
),
wa AS (
    SELECT u.w AS word,
        CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen
    FROM phx, unnest(string_split(phrase, ' ')) AS u(w)
),
ws AS (
    SELECT word, CAST(count(*) AS BIGINT) AS freq,
        CAST(sum(plen) AS BIGINT) AS deg
    FROM wa GROUP BY 1
),
pw AS (
    SELECT occ.phrase, occ.n_occurrences, u.w AS word
    FROM occ, unnest(string_split(occ.phrase, ' ')) AS u(w)
),
scored AS (
    SELECT pw.phrase, pw.n_occurrences,
        sum(CAST(round(CAST(ws.deg AS DOUBLE) / ws.freq, 6)
                 AS DECIMAL(18,6))) AS s
    FROM pw JOIN ws ON ws.word = pw.word
    GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (ORDER BY s DESC, phrase ASC) AS BIGINT)
        AS rank,
    phrase,
    CAST(len(string_split(phrase, ' ')) AS BIGINT) AS n_words,
    n_occurrences,
    CAST(s AS DOUBLE) AS score
FROM scored
ORDER BY s DESC, phrase ASC
LIMIT {int(k)}
"""
