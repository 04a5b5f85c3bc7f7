"""Vector math over ``array<float|double>`` columns — JVM-side only.

Used by the similarity-search / embedding-dedup operators. All three
helpers compile to Catalyst higher-order functions (``zip_with`` +
``aggregate``), so they run inside codegen with zero Python transfer —
the brute-force ANN path stays scan-shaped at 100 TB (no UDF
serialization on the hot loop).

Summation is sequential in element order, which keeps the floating
point result deterministic and comparable with an oracle that loops
the same way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (||a||·||b||), NULL when either norm is zero."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
