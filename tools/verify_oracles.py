#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, when an
``oracle_sql()`` entry exists, the same query on DuckDB, then compares
row count, column names/types, and values (order-insensitive).

Usage: python tools/verify_oracles.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            import datetime

            import numpy as np

            def _norm(v):
                if isinstance(v, (list, tuple, np.ndarray)):
                    return tuple(v)
                if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
                    return pd.Timestamp(v)
                if isinstance(v, datetime.datetime):
                    return pd.Timestamp(v).tz_localize(None) if v.tzinfo else pd.Timestamp(v)
                return v

            df[c] = df[c].map(_norm)
    sort_cols = list(df.columns)
    try:
        df = df.sort_values(sort_cols, kind="mergesort")
    except TypeError:
        df = df.sort_values([c for c in sort_cols if df[c].map(type).nunique() <= 1], kind="mergesort")
    return df.reset_index(drop=True)


def values_equal(a, b, rel=1e-9) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= rel * max(abs(a), abs(b), 1e-300)
    if pd.isna(a) if not isinstance(a, (list, tuple)) else False:
        return (pd.isna(b) if not isinstance(b, (list, tuple)) else False) is True
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(values_equal(x, y, rel) for x, y in zip(a, b))
    return a == b


def _norm_dtype(dt) -> str:
    s = str(dt)
    if s.startswith("int") or s.startswith("uint"):
        return "int"
    if s.startswith("float"):
        return "float"
    if s.startswith("datetime64"):
        return "timestamp"
    if s == "bool" or s == "boolean":
        return "bool"
    return "object"


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    for c in sdf.columns:
        ds, do = _norm_dtype(sdf[c].dtype), _norm_dtype(odf[c].dtype)
        if ds != do and "object" not in (ds, do):
            problems.append(f"dtype differs on {c}: spark={sdf[c].dtype} oracle={odf[c].dtype}")
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
        return problems
    s, o = canon(sdf), canon(odf)
    exact = True
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        mism = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, ov))
            if not values_equal(a, b, rel=0.0)
        ]
        if mism:
            exact = False
            tol_mism = [m for m in mism if not values_equal(m[1], m[2], rel=1e-9)]
            if tol_mism:
                i, a, b = tol_mism[0]
                problems.append(
                    f"col {c}: {len(tol_mism)} mismatches beyond 1e-9 rel; first row {i}: spark={a!r} oracle={b!r}"
                )
            else:
                problems.append(
                    f"col {c}: {len(mism)} float-ulp-level diffs (within 1e-9; may still break driver hash) e.g. {mism[0]}"
                )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    # the IVF/PQ oracles embed per-SF frozen index state — tell
    # oracle_sql() which corpus this run reads (ann_state.py).
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF"] = Path(args.sf).name

    import __spark_entry__ as entrymod
    from stock_market_data_pipeline_v2_spark.session import get_spark

    spark = get_spark("verify-oracles")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    selected = args.queries or list(qs)
    con = duck_connect(args.sf)

    failed = []
    for name in selected:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"OK*   {name}: rows={len(sdf)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failed.append(name)
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL  {name}: rows={len(sdf)} vs {len(odf)} [{time.time()-t0:.1f}s]")
            for p in problems[:8]:
                print(f"      - {p}")
            failed.append(name)
        else:
            print(f"OK    {name}: rows={len(sdf)} match [{time.time()-t0:.1f}s]")

    print(f"\n{len(selected)-len(failed)}/{len(selected)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
