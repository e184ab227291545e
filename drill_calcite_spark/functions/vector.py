"""Vector math over array<float|double> columns — JVM-side higher-order
functions (F.zip_with / F.aggregate), no Python in the hot path.

Arithmetic is an ordered left-fold in double precision so results are
bit-identical to the DuckDB oracle's
list_reduce(list_concat([0.0], list_transform(list_zip(a,b), ...)), +):
float→double casts are exact and IEEE addition order matches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Ordered-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column | None = None,
           norm_b: Column | None = None) -> Column:
    """Cosine similarity; pass precomputed norms to avoid recomputing them
    inside an N×N pair join (the caller should compute norms once per side
    before the join — that is the scale-relevant optimization)."""
    na = norm_a if norm_a is not None else l2_norm(a)
    nb = norm_b if norm_b is not None else l2_norm(b)
    return dot(a, b) / (na * nb)
