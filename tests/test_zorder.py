"""Z-order layout: the data-skipping claim, proven from real parquet
footers — not from plan strings. A 2-D box predicate must intersect
far fewer file envelopes under the z-ordered layout than under a
single-column sort, and the layout must not change query results."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

SPECS = [
    ("user_id", 0, 4095),
    ("cast(floor(value * 100) as bigint)", 0, 65535),
]

# box: half the user range (sf0.001 has users 0..14), a thin value
# slice — the shape a single-column sort can only prune on ONE side of
U_LO, U_HI = 0, 7
V_LO, V_HI = 100.0, 125.0


def _file_envelopes(path):
    """(min, max) of user_id and value per parquet data file, straight
    from the column-chunk statistics every engine prunes on."""
    out = []
    import glob

    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        ustats, vstats = [], []
        for rg in range(md.num_row_groups):
            ustats.append(md.row_group(rg).column(cols["user_id"]).statistics)
            vstats.append(md.row_group(rg).column(cols["value"]).statistics)
        out.append(
            (
                min(s.min for s in ustats),
                max(s.max for s in ustats),
                min(s.min for s in vstats),
                max(s.max for s in vstats),
            )
        )
    return out


def _hits(envelopes):
    return sum(
        1
        for (ulo, uhi, vlo, vhi) in envelopes
        if not (uhi < U_LO or ulo > U_HI or vhi < V_LO or vlo > V_HI)
    )


def test_zorder_layout_skips_files_and_preserves_results(spark, tmp_path):
    from stock_market_data_pipeline_v2_spark.functions.zorder import (
        with_zvalue,
        write_zordered,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    zdir = str(tmp_path / "zorder")
    sdir = str(tmp_path / "usersort")
    n_files = 16

    write_zordered(ev, zdir, SPECS, n_files=n_files)
    # the single-column-sort strawman: same file count, sorted on
    # user_id only — tight user envelopes, value spans everything
    (
        ev.repartitionByRange(n_files, F.col("user_id"), F.col("event_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    z_env = _file_envelopes(zdir)
    s_env = _file_envelopes(sdir)
    assert len(z_env) == n_files and len(s_env) == n_files

    # the skipping claim: the 2-D box intersects strictly fewer
    # z-ordered envelopes than single-sorted ones, and only a
    # minority of the z-ordered files
    assert _hits(z_env) < _hits(s_env)
    assert _hits(z_env) <= n_files // 4

    # layout must not change semantics: same rows back through the box
    pred = (
        (F.col("user_id") >= U_LO)
        & (F.col("user_id") <= U_HI)
        & (F.col("value") >= V_LO)
        & (F.col("value") <= V_HI)
    )
    expect = sorted(r.event_id for r in ev.filter(pred).select("event_id").collect())
    got = sorted(
        r.event_id
        for r in spark.read.parquet(zdir).filter(pred).select("event_id").collect()
    )
    assert got == expect and expect  # non-trivial box

    # and the z-value expression itself is scan-shaped: no exchange
    plan = (
        with_zvalue(ev, SPECS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_zvalue_matches_python_reference_3d(spark):
    """The interleave generalizes beyond 2-D: 3 columns × 8 bits vs a
    straightforward Python bit-interleave on random rows."""
    import random

    from pyspark.sql import Row
    from stock_market_data_pipeline_v2_spark.functions.zorder import with_zvalue

    rng = random.Random(7)
    rows = [
        Row(i=i, a=rng.randint(0, 255), b=rng.randint(0, 255), c=rng.randint(0, 255))
        for i in range(200)
    ]
    specs = [("a", 0, 255), ("b", 0, 255), ("c", 0, 255)]
    df = spark.createDataFrame(rows)
    got = {r.i: r.zval for r in with_zvalue(df, specs, bits=8).collect()}

    def py_z(vals, bits=8):
        z = 0
        n = len(vals)
        for j in range(bits):
            for i, v in enumerate(vals):
                z |= ((v >> j) & 1) << (j * n + i)
        return z

    for r in rows:
        assert got[r.i] == py_z([r.a, r.b, r.c]), r


def test_zvalue_rejects_sign_bit_overflow(spark):
    import pytest

    from stock_market_data_pipeline_v2_spark.functions.zorder import with_zvalue

    df = spark.range(1)
    specs4 = [("id", 0, 1)] * 4
    with pytest.raises(ValueError, match="overflows"):
        with_zvalue(df, specs4, bits=16)  # 64 bits hits the sign bit
    with_zvalue(df, specs4, bits=15)  # 60 bits: fine


def test_hilbert_matches_reference_and_locality(spark):
    """Both generated hilbert chains (Spark + oracle) are pinned to
    the PUBLISHED xy2d algorithm via an independent Python reference,
    exhaustively at bits=4; and the defining locality property holds:
    consecutive Hilbert indexes are unit-step grid neighbors —
    exactly the property Morton lacks (its worst adjacent-key jump
    spans half the grid side)."""
    from stock_market_data_pipeline_v2_spark.functions.hilbert import (
        hilbert_xy2d_ref,
        with_hvalue,
    )

    bits = 4
    rows = [
        (16 * x + y, x, y) for x in range(16) for y in range(16)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = {
        r["id"]: r["hval"]
        for r in with_hvalue(df, [("x", 0, 15), ("y", 0, 15)], bits=bits).collect()
    }
    assert all(
        out[i] == hilbert_xy2d_ref(bits, x, y) for i, x, y in rows
    )
    # bijection over the grid + unit-step locality
    inv = {hilbert_xy2d_ref(bits, x, y): (x, y) for _, x, y in rows}
    assert len(inv) == 256
    for d in range(255):
        (x1, y1), (x2, y2) = inv[d], inv[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, inv[d], inv[d + 1])


def test_hilbert_guards(spark):
    """Arity/width guards: the 2-D-only contract and the signed-long
    index ceiling fail fast instead of silently misbinning."""
    import pytest

    from stock_market_data_pipeline_v2_spark.functions.hilbert import with_hvalue

    df = spark.range(4).selectExpr("id AS x", "id AS y", "id AS z")
    with pytest.raises(ValueError, match="2-D"):
        with_hvalue(df, [("x", 0, 3), ("y", 0, 3), ("z", 0, 3)], bits=2)
    with pytest.raises(ValueError, match="overflows"):
        with_hvalue(df, [("x", 0, 3), ("y", 0, 3)], bits=32)
