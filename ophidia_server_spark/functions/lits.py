"""One-py4j-call construction of literal double arrays.

``F.array(*[F.lit(float(v)) for v in vec])`` pays one py4j round-trip PER
ELEMENT building the plan on the driver — measured 28.6 ms per 64-dim
vector (and ~1 s for a 2048-entry ADC distance table) of pure driver-side
marshalling, paid per probe / per k-means iteration / per classifier plan.
Rendering the same literal as ONE SQL text (``array(0.1D, ...)``) hands
construction to the JVM parser: 0.4 ms at dim 64, ~70x less (guide §5 —
the driver should do almost no data work; this was data work smuggled
into plan construction).

Bit-exactness: ``repr(float)`` is Python's shortest round-trip rendering
and Java's ``Double.parseDouble`` is correctly rounded, so the parsed
literal is the identical IEEE-754 double — including -0.0 and extreme
exponents (pinned by tests/test_lits.py). Non-finite values have no SQL
double literal, and an empty list would type as array<void> under the
old construction — both fall back to the per-element path unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _render(vals: list[float]) -> str:
    return "array(" + ",".join(repr(v) + "D" for v in vals) + ")"


def const_double_array(values) -> Column:
    """array<double> literal Column from a Python sequence — one py4j
    call on the finite fast path, the classic per-element build otherwise
    (same Column either way, bit-identical values)."""
    vals = [float(v) for v in values]
    if not vals or not all(map(math.isfinite, vals)):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr(_render(vals))


def const_double_matrix(rows) -> Column:
    """array<array<double>> literal Column (row-major) — the nested twin
    of const_double_array, one py4j call for the whole matrix."""
    mat = [[float(v) for v in row] for row in rows]
    if not mat or not all(
        row and all(map(math.isfinite, row)) for row in mat
    ):
        return F.array(*[
            F.array(*[F.lit(v) for v in row]) for row in mat
        ])
    return F.expr("array(" + ",".join(_render(row) for row in mat) + ")")
