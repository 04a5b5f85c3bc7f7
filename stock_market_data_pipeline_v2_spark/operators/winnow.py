"""Winnowing fingerprints + passage-overlap detection over
``documents`` — local document fingerprinting (Schleimer, Wilkerson &
Aiken, SIGMOD 2003: the MOSS algorithm), the principled middle ground
between the full shingle inverted index (operators/dedup.py — exact
but indexes EVERY n-gram) and MinHash (global similarity only, no
positional guarantee).

Guarantee (why winnowing and not "every w-th shingle"): selecting the
minimum hash in every window of ``w`` consecutive k-gram hashes keeps
a ~``2/(w+1)`` fraction of all k-grams, yet any token run of length
≥ ``w + k − 1`` shared verbatim by two documents is CERTAIN to
contribute at least one common selected hash — the shared run contains
a full window of identical k-gram hashes in both docs, and the minimum
of that window is the same value in both (ties inside a window break
to the smaller position, which may differ across docs, but the JOIN is
on the hash value alone, so the guarantee holds). Random or strided
sampling has no such property.

Scale shape: the k-gram hash array is evaluated ONCE per document
inside a generator (posexplode — a lambda-slice formulation would
re-evaluate the whole md5 array per window: Catalyst does not CSE
higher-order-function subtrees, turning O(G) hash work into O(G²);
measured 96 s → 7 s at sf0.1), then ONE shuffle brings each doc's
grams to a window sort for the struct-min selection; the final
distinct reuses the window's hash(doc_id) partitioning (subset rule),
so no second exchange. Only the selected ~2/(w+1) fraction reaches
:func:`passage_overlap_pairs`'s inverted-index join, and that join is
bounded by the same document-frequency stop-list cap as the shingle
tier — at 100 TB the index is ~3× smaller than full shingling at w=5
before any pruning, with a deterministic detection floor instead of
probabilistic recall.

Cross-engine exactness: md5 hex strings compare byte-wise identically
in Spark and DuckDB, and both engines order ``struct<h,pos>``
lexicographically by field position — the oracle mirrors the window
min with ``min({'h': h, 'pos': pos}) OVER (...)`` and the same
full-window filter. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import round_away
from .dedup import _norm_text


def winnow_fingerprints(
    documents: DataFrame,
    k: int = 4,
    w: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Winnowed document fingerprints: (doc_id, pos, fp_hash), one row
    per selected k-gram occurrence (distinct — the same (hash, pos)
    selected by several overlapping windows is emitted once).

    Window start positions run 1..max(G−w+1, 1) (G = k-gram count):
    every FULL window selects its struct-min; a document with fewer
    than ``w`` k-grams gets one window covering all of them (the
    standard short-document convention — every doc with ≥1 k-gram
    yields ≥1 fingerprint), and a doc with <k words yields none.
    ``F.sequence`` is guarded against G ≤ 0 because Spark's
    sequence(1, 0) counts DOWN, not empty.

    ``k`` controls noise sensitivity (no match shorter than k tokens
    is ever detected), ``w`` the guarantee threshold (every shared run
    of ≥ w+k−1 tokens is detected) and the sampling density
    (~2/(w+1) of k-grams kept).
    """
    from .dedup import grams_from

    par = documents.sparkSession.sparkContext.defaultParallelism
    words = F.split(F.col("__t"), r"\s+")
    n_grams = F.size(words) - (k - 1)
    # grams_from's zip_with composition evaluates the split O(1)
    # times per row (not once per gram — the no-CSE-into-lambdas
    # trap); md5 rides a transform whose input is evaluated once.
    grams = F.transform(grams_from(F.col("__t"), k), lambda x: F.md5(x))
    exploded = (
        documents.select("doc_id", _norm_text(text_col).alias("__t"))
        .repartition(par)
        .select(
            "doc_id",
            n_grams.alias("n_grams"),
            F.posexplode(grams).alias("p0", "h"),
        )
        .select(
            "doc_id",
            "n_grams",
            (F.col("p0") + 1).cast("long").alias("pos"),
            "h",
        )
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    # distinct() here re-clusters on (doc_id, pos, fp_hash) — a SUPERSET
    # of the window's hash(doc_id) partitioning, so Catalyst satisfies
    # it without a second exchange (asserted in test_plan_shapes).
    return (
        exploded.withColumn(
            "m", F.min(F.struct(F.col("h"), F.col("pos"))).over(win)
        )
        .filter(F.col("pos") <= F.greatest(F.col("n_grams") - (w - 1), F.lit(1)))
        .select(
            "doc_id",
            F.col("m.pos").alias("pos"),
            F.col("m.h").alias("fp_hash"),
        )
        .distinct()
    )


def passage_overlap_pairs(
    documents: DataFrame,
    k: int = 4,
    w: int = 5,
    threshold: float = 0.3,
    max_fp_freq: int | None = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing winnowed fingerprints:
    (doc_a < doc_b, n_shared, overlap), where overlap =
    |shared hashes| / min(|fp_a|, |fp_b|) — the containment-style
    score MOSS reports, robust to length mismatch (a short doc fully
    embedded in a long one scores 1.0).

    The join runs on DISTINCT (doc, hash) — repeated selections of
    the same hash inside one doc count once, so ``n_shared`` is a set
    intersection. ``max_fp_freq`` is the same document-frequency
    stop-list cap as the shingle tier (dedup.py:
    _prune_frequent_shingles): boilerplate passages shared by >cap
    docs are pruned from the JOIN only; per-doc fingerprint set sizes
    stay unpruned, so overlap is a lower bound — pruning can hide
    pairs, never inflate them.
    """
    fp = (
        winnow_fingerprints(documents, k=k, w=w, text_col=text_col)
        .select("doc_id", "fp_hash")
        .distinct()
        .cache()
    )
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    joinable = fp
    if max_fp_freq is not None:
        freq = Window.partitionBy("fp_hash")
        joinable = (
            fp.withColumn("__df", F.count(F.lit(1)).over(freq))
            .filter(F.col("__df") <= max_fp_freq)
            .drop("__df")
        )
    a = joinable.select(F.col("doc_id").alias("doc_a"), "fp_hash")
    b = joinable.select(F.col("doc_id").alias("doc_b"), "fp_hash")
    shared = (
        a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("fp_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("fp_b"))
    overlap = F.col("n_shared").cast("double") / F.least("fp_a", "fp_b").cast(
        "double"
    )
    out = (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(overlap >= threshold)
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            round_away(overlap, 4).alias("overlap"),
        )
    )
    out._cached_inputs = (fp,)  # release via dedup.release_cached_inputs
    return out
