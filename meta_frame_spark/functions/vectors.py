"""Vector column functions over ``array<float>`` embeddings.

All math is done with built-in higher-order functions (``zip_with`` +
``aggregate``) in double precision — JVM-side, codegen'd, no UDFs.
The embeddings table ships ``embedding array<float>`` (TESTDATA.md);
everything casts elementwise to double before multiplying so results
are bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: str | Column) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dot(a: str | Column, b: str | Column) -> Column:
    """Dot product in double precision (left-to-right summation)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: str | Column) -> Column:
    """Euclidean norm of an array column — ``aggregate`` HOF, JVM-side."""
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """Cosine similarity of two array columns — built-in HOFs, no UDF."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: str | Column, b: str | Column) -> Column:
    """Euclidean distance of two array columns — ``zip_with`` HOF."""
    diffsq = F.zip_with(
        _c(a), _c(b),
        lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")),
    )
    return F.sqrt(F.aggregate(diffsq, F.lit(0.0), lambda acc, v: acc + v))
