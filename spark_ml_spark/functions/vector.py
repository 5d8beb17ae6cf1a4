"""Vector math as Catalyst expressions over ``array<double>`` columns.

The reference does its vector math driver-side with numpy inside Python
workers (``Data_transform.py:87-95``). Here every operation is a built-in
higher-order function (``zip_with`` / ``aggregate``) that runs JVM-side
inside whole-stage codegen — no Python worker, no serde, scales linearly
with partitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    """Cast array<float> (the embeddings storage type) to array<double> so
    all arithmetic happens in double precision — matches what any SQL
    engine does and keeps oracle comparison stable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Elementwise product + sum, fully JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors via nullif."""
    return dot(a, b) / F.nullif(l2_norm(a) * l2_norm(b), F.lit(0.0))
