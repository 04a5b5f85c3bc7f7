"""Hilbert-curve clustering — the locality-preserving sibling of
z-order (functions/zorder.py) for two-dimensional data skipping.

Morton interleave is cheap but has long diagonal jumps: adjacent
z-values can sit far apart in (x, y), so file envelopes near the
jumps are looser than they need to be. The Hilbert curve visits
every grid cell with UNIT steps — consecutive keys are always
grid-neighbors — which is why engines that cluster for data skipping
at scale prefer it when write cost allows (Hilbert 1891; the
curve-vs-Morton envelope comparison is standard lakehouse-layout
material). The price is per-cell state (rotation/reflection), paid
here at PLAN BUILD time: the classic xy2d bit loop (Wikipedia's
``d += s·s·((3·rx) ⊕ ry); rot(n, x, y, rx, ry)``) is UNROLLED into
``bits`` stages of exact integer CASE/shift/xor expressions,
generated ONCE from a single stage template compiled by both engines
— the zorder.py single-source-of-truth pattern, so the DuckDB oracle
is lockstep by construction. No UDFs, scan-shaped, zero shuffles.

Only the 2-D curve is implemented (the classic algorithm; ≥3-D needs
the generic Gray-code walk and 2-D covers the dominant layout case:
a time × key or key × key clustering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .zorder import ZSpec, cell_sql


def _stage_exprs(
    k: int, bits: int, x: str, y: str, d: str, dialect: str
) -> dict[str, str]:
    """One xy2d loop stage (s = 1<<k) as SQL over the prior stage's
    columns: the d increment and the rotated/reflected (x, y) for the
    next stage. ``dialect`` picks the xor spelling (Spark infix ``^``
    vs DuckDB ``xor()``) — the only token the engines disagree on."""
    n_side = 1 << bits
    s = 1 << k
    rx = f"(({x} >> {k}) & 1)"
    ry = f"(({y} >> {k}) & 1)"
    if dialect == "spark":
        gray = f"((3 * {rx}) ^ {ry})"
    else:
        gray = f"xor(CAST(3 * {rx} AS BIGINT), CAST({ry} AS BIGINT))"
    d_next = f"({d} + {s * s} * {gray})"
    refl = f"{ry} = 0 AND {rx} = 1"
    x_refl = f"(CASE WHEN {refl} THEN {n_side - 1} - {x} ELSE {x} END)"
    y_refl = f"(CASE WHEN {refl} THEN {n_side - 1} - {y} ELSE {y} END)"
    x_next = f"(CASE WHEN {ry} = 0 THEN {y_refl} ELSE {x_refl} END)"
    y_next = f"(CASE WHEN {ry} = 0 THEN {x_refl} ELSE {y_refl} END)"
    return {"d": d_next, "x": x_next, "y": y_next}


def with_hvalue(
    df: DataFrame, specs: list[ZSpec], bits: int = 16, out_col: str = "hval"
) -> DataFrame:
    """Append the Hilbert index column for exactly two ZSpec
    dimensions. Each stage is a named intermediate column (computed
    once — the same no-expression-blowup discipline as zorder's cell
    columns); 2·bits ≤ 62 keeps the index in the signed long."""
    if len(specs) != 2:
        raise ValueError("hilbert clustering is 2-D; use zorder for other arities")
    if 2 * bits > 62:
        raise ValueError(f"bits={bits} overflows the signed-long hilbert index")
    out = df
    for i, (col_sql, lo, hi) in enumerate(specs):
        out = out.withColumn(
            f"__hc{i}", F.expr(cell_sql(col_sql, lo, hi, bits, "div")).cast("long")
        )
    out = out.withColumn("__hd", F.lit(0).cast("long"))
    x, y, d = "__hc0", "__hc1", "__hd"
    for k in range(bits - 1, -1, -1):
        e = _stage_exprs(k, bits, x, y, d, "spark")
        nx, ny, nd = f"__hx{k}", f"__hy{k}", f"__hd{k}"
        out = (
            out.withColumn(nd, F.expr(e["d"]).cast("long"))
            .withColumn(nx, F.expr(e["x"]).cast("long"))
            .withColumn(ny, F.expr(e["y"]).cast("long"))
            .drop(x, y, d)
        )
        x, y, d = nx, ny, nd
    return out.withColumnRenamed(d, out_col).drop(x, y)


def hvalue_oracle_sql(
    table: str, key_cols: str, specs: list[ZSpec], bits: int = 16
) -> str:
    """The DuckDB twin, generated from the SAME stage template: one
    chained CTE per bit stage."""
    if len(specs) != 2:
        raise ValueError("hilbert clustering is 2-D")
    cells = ", ".join(
        f"{cell_sql(col_sql, lo, hi, bits, '//')} AS __hc{i}"
        for i, (col_sql, lo, hi) in enumerate(specs)
    )
    ctes = [
        f"__h{bits} AS (SELECT {key_cols}, {cells}, CAST(0 AS BIGINT) AS __hd"
        f" FROM {table})"
    ]
    x, y, d = "__hc0", "__hc1", "__hd"
    for k in range(bits - 1, -1, -1):
        e = _stage_exprs(k, bits, x, y, d, "duckdb")
        ctes.append(
            f"__s{k} AS (SELECT {key_cols}, "
            f"{e['x']} AS __hx{k}, "
            f"{e['y']} AS __hy{k}, "
            f"{e['d']} AS __hd{k} FROM __{'h' + str(bits) if k == bits - 1 else 's' + str(k + 1)})"
        )
        x, y, d = f"__hx{k}", f"__hy{k}", f"__hd{k}"
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT {key_cols}, "
        f"CAST({d} AS BIGINT) AS hval FROM __s0 "
        f"ORDER BY hval, {key_cols.split(',')[0]}"
    )


def hilbert_xy2d_ref(bits: int, x: int, y: int) -> int:
    """Independent Python reference (the classic loop, verbatim) —
    used by tests to pin both generated expression chains to the
    published algorithm rather than to each other."""
    n = 1 << bits
    rx = ry = 0
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d
