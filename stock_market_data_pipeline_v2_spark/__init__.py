"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference stock-market lakehouse pipeline
(atulpandey02/stock-market-data-pipeline-v2), rebuilt Spark-first.

Layout (SURVEY.md §7.4):
  session.py     SparkSession factory (UTC, AQE)
  schemas.py     canonical StructTypes (SURVEY.md §1.2-1.3)
  sources/       readers/writers, medallion layout (§1.4, §2.1)
  functions/     scalar/vector helpers (§2.7; safe_divide parity)
  operators/     batch relational operators (§2.2-2.8) + LLM-data ops
  plans/         pipeline composition + data-quality contract (§5)
  streaming/     Structured Streaming variants (§2.9)

All computation is declared via the DataFrame API so Catalyst handles
pushdown/pruning/join strategy; no Python row-at-a-time UDFs exist in
any hot path (parity with reference: zero UDFs, SURVEY.md §2.10).
"""

__version__ = "0.1.0"
