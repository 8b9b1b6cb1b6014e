"""Vector math over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions (``zip_with`` + ``aggregate``) —
no UDF, no serialization boundary, whole-stage-codegen friendly. All
accumulation is in double with left-to-right fold order, which keeps
results bit-identical across engines that evaluate the same fold.
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


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
