"""Corpus medallion runner — the LLM-data twin of plans/pipeline.py.

The market pipeline collapses the reference's Airflow day into plan
composition (bronze events → silver bars → gold marts → quality
gate). A pretraining-corpus build has the same lifecycle with
different stages, every one an already-gated operator:

    bronze documents
      → silver: curation_pipeline (Gopher + repetition gates, PII
        scrub, exact-dedup to canonicals) — oracle-gated plan,
        MATERIALIZED as a parquet zone (the honest cost model: zone
        boundaries, not a hand-fused mega-projection)
      → quality gate: one-pass checks + unique-key audit on the zone
      → split: leakage_safe_split over the near-dup pair graph (no
        cluster straddles train/val) — oracle-gated
      → gold: token-budgeted training shards (write_training_shards,
        hive-partitioned by shard) + the frozen validation zone

Re-running overwrites zones idempotently; the validation side stays
frozen under corpus growth because the split key is a pure function
of the near-dup group (see leakage_safe_split). At 100 TB each stage
boundary is a bucketed table and the admission stream
(streaming/admission.py) feeds the bronze zone continuously — the
runner's shape is unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import (
    curation_pipeline,
    leakage_safe_split,
    write_training_shards,
)
from ..operators.dedup import release_cached_inputs, shingle_jaccard_pairs
from ..sources.io import load_table, write_parquet
from .checks import CheckReport, expect_not_null, expect_zero_rows, validate


@dataclass
class CorpusPipelineResult:
    raw_rows: int
    silver_rows: int
    train_rows: int
    val_rows: int
    n_shards: int
    checks: CheckReport


def run_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    shard_tokens: int = 20_000,
    val_fraction: float = 0.1,
    max_shingle_freq: int | None = 1000,
) -> CorpusPipelineResult:
    """documents → silver curated zone → leakage-safe split → gold
    shards + frozen val zone, quality-gated at the silver boundary."""
    docs = load_table(spark, sf_dir, "documents")
    raw_rows = docs.count()

    silver_path = f"{out_root}/silver/curated"
    write_parquet(
        curation_pipeline(docs).withColumnRenamed("scrubbed", "text"),
        silver_path,
    )
    silver = spark.read.parquet(silver_path)

    report = validate(
        silver,
        [
            expect_not_null("doc_id"),
            expect_not_null("text"),
            expect_zero_rows("empty_text", F.length("text") == 0),
            expect_zero_rows("dup_count_lt_1", F.col("dup_count") < 1),
        ],
        unique_keys=[["doc_id"]],
    )

    pairs = shingle_jaccard_pairs(
        silver, threshold=0.5, max_shingle_freq=max_shingle_freq
    )
    split = leakage_safe_split(silver, pairs, val_fraction=val_fraction)
    train = silver.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    val = silver.join(
        split.filter(F.col("split") == "val").select("doc_id"), "doc_id"
    )

    val_path = f"{out_root}/gold/validation"
    write_parquet(val.select("doc_id", "text", "dup_count"), val_path)
    val_rows = spark.read.parquet(val_path).count()

    manifest = write_training_shards(
        train.select("doc_id", "text"),
        f"{out_root}/gold/shards",
        shard_tokens=shard_tokens,
    )
    manifest_path = f"{out_root}/gold/shard_manifest"
    write_parquet(manifest, manifest_path)
    manifest_rows = spark.read.parquet(manifest_path)
    release_cached_inputs(pairs)

    return CorpusPipelineResult(
        raw_rows=raw_rows,
        silver_rows=silver.count(),
        train_rows=train.count(),
        val_rows=val_rows,
        n_shards=manifest_rows.count(),
        checks=report,
    )
