"""Single-py4j-literal array constructors.

Three code sites independently discovered that building array literals
element-wise is a plan-construction hazard: ``F.array(*lits)`` — and
``F.lit(list)``, which loops ``lit()`` per element internally — pay
~1 ms of py4j round-trip per element (measured: ~15 s / ~4 s for an
8,192-long Bloom mask; 0.6 s per bench run for a 670-word profile in
operators/text.py). The fix is always the same: ONE string literal +
split + cast, which Catalyst constant-folds to the array. This module
is the shared home so the numeric variants stop drifting
(operators/text.py keeps its space-joined string variant, whose
no-space-in-word contract doesn't fit here).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F
from pyspark.sql import types as T


def lit_long_array(vals: Sequence[int]) -> F.Column:
    """One-literal array<long>. Empty input folds to array()."""
    if not len(vals):  # split('') would yield [''] -> [null] after cast
        return F.array().cast(T.ArrayType(T.LongType()))
    return F.split(F.lit(",".join(str(int(v)) for v in vals)), ",").cast(
        T.ArrayType(T.LongType())
    )


def _double_repr(v: float) -> str:
    """Spark-castable spelling of one double. repr() round-trips finite
    IEEE doubles exactly, but repr(inf)/repr(nan) yield 'inf'/'nan',
    which Spark's string→double cast does NOT accept ('Infinity'/'NaN'
    are the castable spellings) — non-finite elements would throw under
    ANSI or silently become NULL (r10 ADVICE)."""
    f = float(v)
    if f != f:
        return "NaN"
    if f == float("inf"):
        return "Infinity"
    if f == float("-inf"):
        return "-Infinity"
    return repr(f)


def lit_double_array(vals: Sequence[float]) -> F.Column:
    """One-literal array<double>; finite values repr()-round-trip
    exactly, non-finite values map to Spark-castable 'Infinity'/'NaN'
    spellings. Empty input folds to array()."""
    if not len(vals):
        return F.array().cast(T.ArrayType(T.DoubleType()))
    return F.split(
        F.lit(",".join(_double_repr(v) for v in vals)), ","
    ).cast(T.ArrayType(T.DoubleType()))
