"""Vector math over ``array<float>`` columns — all JVM-side higher-order
functions (no Python UDF in the hot path; SURVEY.md §2.5).

At 100 TB the brute-force paths below are the per-bucket kernels of the
LSH/IVF-pruned variants in ``operators/similarity.py`` — the math stays in
whole-stage codegen either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via ``zip_with`` + ``aggregate`` (Catalyst higher-order fns)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
