"""Vector column expressions (SURVEY.md §2.8 array/vector family).

The reference computes cosine/dot products in numpy over a dense matrix
(`scripts/analysis/analyze_peer_effects.py:55-97`;
`scripts/embeddings/generate_image_embeddings.py:278`). Here embeddings are
an ``ARRAY<FLOAT>`` column and the math is built-in higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, codegen'd, no Python boundary in
the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Elementwise product + fold: ``sum_i a_i * b_i``."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def l2_normalize(a: Column | str) -> Column:
    """Unit-normalize, mirroring the reference's CLIP post-processing
    (`generate_clip_embeddings.py:55-57`) so cosine == dot downstream."""
    a = F.col(a) if isinstance(a, str) else a
    n = l2_norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Full cosine (not assuming unit vectors)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
