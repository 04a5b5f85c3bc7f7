"""Z-order (Morton) clustering for multi-dimensional data skipping.

At 100 TB a point/box query on two dimensions is only cheap if the
LAYOUT lets the scan skip files: parquet footers carry per-column
min/max, and an engine prunes a file when the query box misses its
range envelope. Sorting on ONE column makes that column's envelopes
tight and leaves every other column's spanning the full domain —
z-ordering interleaves the bits of several columns into one sort key
so a range-sort on the key keeps EVERY interleaved column's per-file
envelope tight (the Delta Lake ``OPTIMIZE ZORDER BY`` technique,
itself Morton 1966).

Everything here is exact integer arithmetic, generated ONCE as a SQL
expression string and compiled by both engines (Spark ``F.expr`` and
the DuckDB oracle) — a single source of truth, so cross-engine parity
is by construction rather than by parallel maintenance. No UDFs: the
interleave is ``bits × n_cols`` shift/mask/or terms inside
whole-stage codegen, and the grid-cell mapping is integer
multiply-divide (``div`` — never double division, which silently
misbins past 2^53).

Column domains are STATIC bounds supplied by the caller (clamped at
the edges), not data-derived min/max — a data scan to learn bounds
would add a full pass per write, and stable bounds keep cell
assignment append-invariant: tonight's increment lands in the same
grid as last year's files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (sql_expression, lo, hi) per dimension: lo/hi are the static integer
# domain bounds; the expression must evaluate to an integer type.
ZSpec = tuple[str, int, int]


def cell_sql(col_sql: str, lo: int, hi: int, bits: int, intdiv: str) -> str:
    """Grid-cell index in [0, 2**bits) for an integer expression with
    static bounds — exact long arithmetic in both dialects (``intdiv``
    is ``div`` for Spark, ``//`` for DuckDB)."""
    span = hi - lo
    top = (1 << bits) - 1
    if span <= 0:
        raise ValueError(
            f"z-order domain for {col_sql!r} is empty: lo={lo} hi={hi}"
        )
    # (x - lo) * top is evaluated before the integer divide; for wide
    # static domains (e.g. a nanosecond-epoch column) the product can
    # silently wrap the signed long. Refuse rather than misbin — the
    # caller rescales the expression (e.g. epoch seconds, not nanos).
    if span * top >= 1 << 63:
        raise ValueError(
            f"z-order domain for {col_sql!r} too wide: span {span} x "
            f"(2^{bits}-1) overflows the signed long; rescale the "
            "column expression or lower bits"
        )
    return (
        f"(((least(greatest(({col_sql}), {lo}), {hi}) - {lo}) * {top}) "
        f"{intdiv} {span})"
    )


def interleave_sql(cell_names: list[str], bits: int) -> str:
    """Morton interleave of pre-computed cell columns: bit j of
    column i lands at position j*n + i, so equal prefixes of the
    z-value correspond to aligned sub-boxes of the grid."""
    n = len(cell_names)
    terms = [
        f"((({name} >> {j}) & 1) << {j * n + i})"
        for j in range(bits)
        for i, name in enumerate(cell_names)
    ]
    return "(" + " | ".join(terms) + ")"


def with_zvalue(
    df: DataFrame, specs: list[ZSpec], bits: int = 16, out_col: str = "zval"
) -> DataFrame:
    """Append the z-value column. The cell expressions are named
    intermediates (computed once each); the interleave runs over
    them — all Catalyst expressions, scan-shaped, zero shuffles."""
    if bits * len(specs) > 63:
        raise ValueError(
            f"{len(specs)} cols x {bits} bits = {bits * len(specs)} bits "
            "overflows the signed-long z-value (max 63); lower bits"
        )
    out = df
    names = []
    for i, (col_sql, lo, hi) in enumerate(specs):
        name = f"__zcell{i}"
        out = out.withColumn(
            name, F.expr(cell_sql(col_sql, lo, hi, bits, "div")).cast("long")
        )
        names.append(name)
    return out.withColumn(
        out_col, F.expr(interleave_sql(names, bits)).cast("long")
    ).drop(*names)


def zvalue_oracle_sql(
    table: str,
    key_cols: str,
    specs: list[ZSpec],
    bits: int = 16,
) -> str:
    """The DuckDB twin, generated from the SAME spec: a CTE computes
    the cell columns, the select interleaves them."""
    cells = ", ".join(
        f"{cell_sql(col_sql, lo, hi, bits, '//')} AS __zcell{i}"
        for i, (col_sql, lo, hi) in enumerate(specs)
    )
    names = [f"__zcell{i}" for i in range(len(specs))]
    return (
        f"WITH __cells AS (SELECT {key_cols}, {cells} FROM {table})\n"
        f"SELECT {key_cols}, "
        f"CAST({interleave_sql(names, bits)} AS BIGINT) AS zval\n"
        f"FROM __cells ORDER BY zval, {key_cols.split(',')[0]}"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    specs: list[ZSpec],
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned
    and locally sorted on the z-value — the layout step. Range
    partitioning (a distributed sort by sampling) makes file
    boundaries z-contiguous, so every interleaved column's footer
    min/max envelope is a tight sub-box; a box predicate then prunes
    most files on footer stats alone (asserted from the real footers
    in tests/test_zorder.py). The z column itself is dropped from the
    output — it's a layout artifact, not data."""
    zdf = with_zvalue(df, specs, bits)
    (
        zdf.repartitionByRange(n_files, F.col("zval"))
        .sortWithinPartitions("zval")
        .drop("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
