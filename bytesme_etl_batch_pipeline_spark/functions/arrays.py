"""Constant-array Column builders.

``F.array(*[F.lit(x) for x in xs])`` costs one py4j round-trip PER ELEMENT
(PySpark's ``F.lit(list)`` expands to exactly that client-side), so the
hyperplane/centroid/codebook literals this engine rides into map-side
expressions were paying hundreds of driver round-trips per plan build —
measured 1.04 s for 16 dim-64 arrays, ~45% of several catalog queries'
wall at sf0.1 (plan construction repeats per run; it is NOT amortized).
Rendering the whole constant as one SQL ``array(...)`` string and parsing
it JVM-side with ``F.expr`` is one round-trip total (0.02 s for the same
16 arrays) and yields the SAME literal tree after constant folding:
``repr(float)`` is shortest-round-trip and both Python and the JVM parse
decimal strings correctly rounded, so values are bit-identical — asserted
element-wise against the fold form in tests/test_functions.py.

Only finite doubles take the fast path; non-finite values (SQL parse has
no inf/nan literal) and empty lists fall back to the element-wise form.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fmt(x: float) -> str | None:
    v = float(x)
    if not math.isfinite(v):
        return None
    return repr(v) + "D"


def lit_doubles(values: Iterable[float]) -> Column:
    """``array<double>`` literal from Python floats in ONE py4j call."""
    vals = list(values)
    parts = [_fmt(x) for x in vals]
    if not parts or any(p is None for p in parts):
        return F.array(*[F.lit(float(x)) for x in vals])
    return F.expr("array(" + ",".join(parts) + ")")


def lit_doubles_2d(rows: Sequence[Sequence[float]]) -> Column:
    """``array<array<double>>`` literal in ONE py4j call."""
    outer = []
    for row in rows:
        parts = [_fmt(x) for x in row]
        if not parts or any(p is None for p in parts):
            return F.array(*[lit_doubles(row) for row in rows])
        outer.append("array(" + ",".join(parts) + ")")
    if not outer:
        return F.array()
    return F.expr("array(" + ",".join(outer) + ")")
