"""Byte-pair-encoding subword tokenization — trainer and encoder as
pure DataFrame algebra (no UDFs, no per-row Python).

Why it belongs in a training-data engine: token COUNTS drive packing,
sharding, mixing budgets and cost estimates, and a whitespace lexer
systematically miscounts what a subword tokenizer will produce. This
module implements real BPE (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): symbols start as
characters, and each round merges the most frequent adjacent pair.

The Spark-first trick is that every merge pass is WINDOW ALGEBRA, not
an iterative per-string loop:

- a candidate is a position whose (sym, next sym) equals the merge
  pair;
- greedy left-to-right selection = "even offset within each run of
  consecutive candidates" (for a ≠ b runs are singletons, so all
  candidates merge; for a == b a run of k equal symbols merges
  ⌊k/2⌋ pairs — exactly the parity rule);
- selected rows rewrite to the merged symbol, their right neighbors
  drop, positions re-index.

Scale shape: all merge work runs on the WORD VOCABULARY — (word,
freq) — never on the corpus. Encoding a 100 TB corpus costs one
distinct-word aggregate, M vocab-sized merge passes (vocab ≪ corpus,
every window partitioned by word), and one broadcast join back onto
the token stream. The trainer's only driver action per round is the
argmax pair — ONE row, the same bounded-scalar pattern as the CC
fixed-point check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import TOKEN_PATTERN, _norm

# end-of-word marker (classic BPE): lets merges distinguish suffixes
# from in-word sequences, and makes de-tokenization unambiguous.
EOW = "</w>"


def word_vocab(documents: DataFrame) -> DataFrame:
    """(word, freq) over the shared lexer — the table every BPE stage
    runs on. Distinct words ≪ corpus tokens (the heavy-tail point of
    vocab-level BPE)."""
    return (
        documents.select(
            F.explode(
                F.regexp_extract_all(_norm(), F.lit(TOKEN_PATTERN), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _init_symbols(vocab: DataFrame) -> DataFrame:
    """(word, freq, pos, sym): one row per character, EOW appended."""
    # split(w, "(?!^)") keeps a trailing empty string (Spark splits
    # with limit -1); drop it before appending the EOW marker
    chars = F.concat(
        F.filter(F.split(F.col("word"), "(?!^)"), lambda s: s != ""),
        F.array(F.lit(EOW)),
    )
    return vocab.select(
        "word", "freq", F.posexplode(chars).alias("pos", "sym")
    ).withColumn("pos", F.col("pos").cast("long"))


def _merge_pass(sym: DataFrame, a: str, b: str) -> DataFrame:
    """One greedy merge of (a, b) over every word, window-only.

    Selection rule (see module docstring): candidates at even offsets
    within each run of consecutive candidate positions merge; their
    right neighbors drop; positions re-index."""
    # EVERY window here shares the one (word, pos) spec — a single
    # exchange + sort per pass (the first draft used three partition
    # specs: per-word, per-(word, cand), per-(word, run) — two extra
    # vocab shuffles per pass for the same answer).
    w = Window.partitionBy("word").orderBy("pos")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    cand = (F.col("sym") == a) & (F.lead("sym").over(w) == F.lit(b))
    stepped = sym.withColumn("__cand", F.coalesce(cand, F.lit(False)))
    # run start = first candidate of a consecutive-candidate run; the
    # running max of start positions gives each candidate its run's
    # origin, and greedy selection is even offset from that origin
    run_start = F.col("__cand") & ~F.coalesce(F.lag("__cand").over(w), F.lit(False))
    stepped = stepped.withColumn(
        "__rstart",
        F.max(F.when(run_start, F.col("pos"))).over(w_run),
    )
    sel = F.col("__cand") & (
        F.pmod(F.col("pos") - F.col("__rstart"), F.lit(2)) == 0
    )
    stepped = stepped.withColumn("__sel", sel).withColumn(
        "__drop", F.coalesce(F.lag("__sel").over(w), F.lit(False))
    )
    return (
        stepped.filter(~F.col("__drop"))
        .select(
            "word",
            "freq",
            F.row_number().over(w).cast("long").alias("pos"),
            F.when(F.col("__sel"), F.lit(a + b)).otherwise(F.col("sym")).alias(
                "sym"
            ),
        )
    )


def learn_bpe_merges(
    documents: DataFrame, n_merges: int = 16, min_freq: int = 2
) -> list[tuple[str, str]]:
    """Train: repeatedly merge the corpus's most frequent adjacent
    symbol pair (ties: higher freq, then lexicographic (a, b) — fully
    deterministic). Returns the ranked merge list (the MODEL — a few
    KB regardless of corpus size). Stops early when no pair reaches
    ``min_freq``."""
    sym = _init_symbols(word_vocab(documents)).localCheckpoint()
    merges: list[tuple[str, str]] = []
    w = Window.partitionBy("word").orderBy("pos")
    for _ in range(n_merges):
        pairs = (
            sym.withColumn("__next", F.lead("sym").over(w))
            .filter(F.col("__next").isNotNull())
            .groupBy("sym", "__next")
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), F.asc("sym"), F.asc("__next"))
        )
        top = pairs.first()
        if top is None or top["pair_freq"] < min_freq:
            break
        a, b = top["sym"], top["__next"]
        merges.append((a, b))
        sym = _merge_pass(sym, a, b).localCheckpoint()
    return merges


def bpe_encode_vocab(
    vocab: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply the ranked merges to the vocabulary: (word, freq,
    n_subwords, subwords array, pos-ordered)."""
    sym = _init_symbols(vocab)
    for i, (a, b) in enumerate(merges):
        sym = _merge_pass(sym, a, b)
        # bound plan depth: M chained passes of 3 windows each grow
        # the lazy plan superlinearly in analysis time; checkpoint
        # every few rounds (vocab-sized, cheap)
        if (i + 1) % 4 == 0:
            sym = sym.localCheckpoint()
    return sym.groupBy("word", "freq").agg(
        F.count(F.lit(1)).cast("long").alias("n_subwords"),
        F.array_sort(
            F.collect_list(F.struct("pos", "sym"))
        ).getField("sym").alias("subwords"),
    )


def bpe_token_counts(
    documents: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Per-document SUBWORD counts under the given merge table — the
    number packing/sharding/mixing should budget with, vs the naive
    word count. Encoding cost is vocab-sized: the encoded vocabulary
    broadcasts back onto the token stream."""
    encoded = bpe_encode_vocab(word_vocab(documents), merges).select(
        "word", "n_subwords"
    )
    toks = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(_norm(), F.lit(TOKEN_PATTERN), F.lit(0))
        ).alias("word"),
    )
    counted = (
        toks.join(F.broadcast(encoded), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_subwords").cast("long").alias("n_bpe_tokens"),
        )
    )
    return (
        documents.select("doc_id")
        .join(counted, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias(
                "n_bpe_tokens"
            ),
        )
        .orderBy("doc_id")
    )


# Fixed, corpus-independent merge ranking for the oracle-gated query
# (a trained table is corpus/sf-dependent, which a static oracle SQL
# cannot mirror; the TRAINER is gated by the hand-checkable classic
# corpus test instead). Common English subword merges.
FIXED_MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("the", "</w>"),
    ("i", "n"),
    ("in", "g"),
    ("ing", "</w>"),
    ("a", "n"),
    ("an", "d"),
    ("and", "</w>"),
    ("e", "r"),
    ("er", "</w>"),
    ("o", "n"),
]


def bpe_oracle_sql(merges: list[tuple[str, str]]) -> str:
    """Generate the DuckDB twin of :func:`bpe_token_counts` from the
    SAME merge literal — one pass = one CTE block of the identical
    window algebra (candidate → run → parity select → drop right →
    re-index), so cross-engine parity is by construction."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    parts = [
        """vocab AS (
    SELECT word, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(regexp_extract_all(lower(trim(text)),
                        '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS word
          FROM documents)
    GROUP BY word
),
sym0 AS (
    SELECT word, freq, CAST(i AS BIGINT) AS pos,
        CASE WHEN i <= len(word) THEN word[i:i] ELSE '</w>' END AS sym
    FROM vocab, unnest(generate_series(1, len(word) + 1)) AS g(i)
)"""
    ]
    for k, (a, b) in enumerate(merges):
        parts.append(
            f"""step{k} AS (
    SELECT word, freq, pos, sym,
        coalesce(sym = '{q(a)}' AND lead(sym) OVER
            (PARTITION BY word ORDER BY pos) = '{q(b)}', FALSE) AS cand
    FROM sym{k}
),
rs{k} AS (
    SELECT *, cand AND NOT coalesce(lag(cand) OVER
        (PARTITION BY word ORDER BY pos), FALSE) AS run_start
    FROM step{k}
),
run{k} AS (
    SELECT *, max(CASE WHEN run_start THEN pos END) OVER
        (PARTITION BY word ORDER BY pos
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rstart
    FROM rs{k}
),
sel{k} AS (
    SELECT *, cand AND ((pos - rstart) % 2 = 0) AS sel
    FROM run{k}
),
drop{k} AS (
    SELECT *, coalesce(lag(sel) OVER
        (PARTITION BY word ORDER BY pos), FALSE) AS drp
    FROM sel{k}
),
sym{k + 1} AS (
    SELECT word, freq,
        CAST(row_number() OVER (PARTITION BY word ORDER BY pos) AS BIGINT)
            AS pos,
        CASE WHEN sel THEN '{q(a + b)}' ELSE sym END AS sym
    FROM drop{k} WHERE NOT drp
)"""
        )
    m = len(merges)
    parts.append(
        f"""enc AS (
    SELECT word, CAST(count(*) AS BIGINT) AS n_subwords
    FROM sym{m} GROUP BY word, freq
),
tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(trim(text)),
                          '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS word
    FROM documents
),
cnt AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_subwords) AS BIGINT) AS n_bpe_tokens
    FROM tok JOIN enc USING (word) GROUP BY doc_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + """
SELECT d.doc_id,
       CAST(coalesce(c.n_words, 0) AS BIGINT)      AS n_words,
       CAST(coalesce(c.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN cnt c USING (doc_id)
ORDER BY d.doc_id"""
    )


def save_bpe_model(merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge ranking (the tokenizer MODEL) as JSON — a few
    KB regardless of corpus size; the build-once/apply-many artifact
    the encoder consumes, like the IVF/PQ index tables."""
    import json

    with open(path, "w", encoding="utf-8") as f:
        json.dump([[a, b] for a, b in merges], f)


def load_bpe_model(path: str) -> list[tuple[str, str]]:
    import json

    with open(path, encoding="utf-8") as f:
        return [(a, b) for a, b in json.load(f)]
