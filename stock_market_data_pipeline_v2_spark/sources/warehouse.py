"""Warehouse JDBC boundary (SURVEY.md §2.1 S8/S9 analogue).

The reference lands marts in a cloud warehouse with an external
loader (``load_to_snowflake.py:27-91``: stage → PUT → COPY INTO →
MERGE). Spark-native, the warehouse boundary is the built-in JDBC
source/sink — no loader process, no staging files, the executors
stream rows straight over JDBC connections. The parquet-side MERGE
(operators/upsert.py) remains the upsert engine; these wrappers move
frames across the warehouse boundary.

Scale notes (the knobs that matter at 100 TB):

- READ parallelism comes ONLY from ``partition_column`` +
  ``num_partitions`` + bounds: without them Spark opens ONE
  connection and drags the whole table through it. With them, each
  executor reads its own range slice concurrently — and Spark pushes
  the range predicate (plus any pruned filters Catalyst derives)
  into the remote WHERE clause.
- WRITE parallelism is the frame's partition count (one JDBC
  connection per partition; ``batchsize`` rows per INSERT batch).
  Repartition DOWN before writing to stay under the warehouse's
  connection ceiling.
- Warehouses do their own distribution; JDBC is the right boundary
  for dimension-sized traffic. Fact-sized traffic belongs in bulk
  formats (parquet + the warehouse's bulk loader) — the reference's
  COPY INTO stage exists for exactly that reason.

The wrappers are driver-agnostic (URL decides); the test suite
exercises them end-to-end against embedded Derby (bundled with
Spark for the Hive metastore — no server needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _jdbc_options(
    url: str, table: str, driver: str | None, extra: dict[str, str] | None
) -> dict[str, str]:
    opts = {"url": url, "dbtable": table}
    if driver:
        opts["driver"] = driver
    if extra:
        opts.update(extra)
    return opts


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = 10_000,
    options: dict[str, str] | None = None,
) -> None:
    """S9 warehouse append / S8 full-refresh landing over JDBC.

    ``mode="append"`` is the incremental landing; ``mode="overwrite"``
    with ``truncate=true`` (pass via ``options``) keeps the remote
    table's grants/DDL and replaces rows only. For key-wise upserts,
    land into a staging table and run the warehouse's own MERGE — or
    keep marts in parquet and use ``operators/upsert.py:merge_upsert``.
    """
    opts = _jdbc_options(url, table, driver, options)
    opts.setdefault("batchsize", str(batchsize))
    df.write.format("jdbc").options(**opts).mode(mode).save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Warehouse scan. ``table`` may be a table name or a pushed-down
    subquery alias (``"(select ...) t"``). Pass the partition quartet
    for a parallel range-sliced read — omitting it means ONE
    connection reads everything (fine for dims, wrong for facts).
    """
    opts = _jdbc_options(url, table, driver, options)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions (the JDBC range-slicing quartet)"
            )
        opts.update(
            {
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    return spark.read.format("jdbc").options(**opts).load()
