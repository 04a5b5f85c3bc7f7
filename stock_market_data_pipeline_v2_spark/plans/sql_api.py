"""SQL entry point (SURVEY.md §2.1 S10/S11).

The reference materializes staging as warehouse VIEWs and marts as
TABLEs via dbt (``dbt_project.yml:28-32``). Spark-native, the same
surface is temp views + ``spark.sql`` — any mart here can be written
in pure SQL against the registered views and returns the identical
result to its DataFrame twin (both compile to the same Catalyst
plans; the pricing-summary twin is oracle-checked to prove it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TESTDATA_TABLES
from ..sources.io import load_table

PRICING_SUMMARY_VIEW_SQL = """
SELECT
    l_returnflag,
    l_linestatus,
    round(sum(l_quantity), 2)                                       AS sum_qty,
    round(sum(l_extendedprice), 2)                                  AS sum_base_price,
    round(sum(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
    round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
    round(avg(l_quantity), 4)                                       AS avg_qty,
    round(avg(l_extendedprice), 4)                                  AS avg_price,
    round(avg(l_discount), 4)                                       AS avg_disc,
    count(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """S11: one temp view per testdata table (staging-view parity)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def pricing_summary_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrame twin of operators/dims.py:pricing_summary,
    expressed as SQL text over registered views.

    Note: Spark SQL ``round`` has the shortest-string semantics
    (PERF.md lesson 1), so this SQL twin rounds the same way only
    because its aggregate results at this precision are boundary-free;
    the DataFrame twin with ``round_away`` is the canonical form.
    """
    register_testdata_views(spark, sf_dir)
    return spark.sql(PRICING_SUMMARY_VIEW_SQL)


def save_as_table(df: DataFrame, name: str, cluster_cols: list[str] | None = None) -> None:
    """S10: managed-table DDL path (CREATE TABLE AS semantics)."""
    writer = df.write.mode("overwrite")
    if cluster_cols:
        writer = writer.sortBy(*cluster_cols).bucketBy(8, cluster_cols[0])
    writer.saveAsTable(name)
