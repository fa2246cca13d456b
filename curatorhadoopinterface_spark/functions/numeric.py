"""Numeric helpers kept JVM-side (whole-stage codegen friendly).

``round_pos_double`` exists because Spark's ``F.round`` on DoubleType
routes every value through ``BigDecimal.setScale`` (object allocation +
string conversion per row) — measured ~9x slower than pure double math
on a 600k-row projection. DuckDB's ``ROUND(DOUBLE, n)`` is itself pure
double arithmetic (``std::round(x * 10^n) / 10^n``), so for the oracle
contract the double-native form is the closer match. Verified equal to
``F.round`` over lineitem-derived positives at sf0.01 and sf0.1 — a
DATASET-SPECIFIC equivalence, not a general identity: on decimal-
boundary doubles (e.g. 2.675, whose nearest double is below 2.675)
BigDecimal HALF_UP and double-native rounding can differ by 1 ulp of
the last kept digit, and ``floor(x*10^s + 0.5)`` can differ from
``std::round`` when ``x*10^s`` sits within 0.5-epsilon of an integer.
New callers with arbitrary data should not rely on the identity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def round_pos_double(col: Column, scale: int) -> Column:
    """HALF_UP rounding of a double column, pure double math on the
    non-negative fast path.

    ``floor(x * 10^s + 0.5) / 10^s`` == BigDecimal HALF_UP for x >= 0.
    DOMAIN-GUARDED (not caller-trusted): negative values take Spark's
    ``F.round`` (BigDecimal HALF_UP) instead, because for x < 0 the
    floor form rounds toward +inf rather than away from zero. The guard
    is a codegen branch, not a second pass — the hot path (prices,
    distances, sqrt/ln outputs) stays allocation-free, and a caller that
    feeds a negative can no longer silently get the wrong rounding mode
    when the driver raises the scale factor."""
    p = F.lit(float(10**scale))
    fast = F.floor(col * p + F.lit(0.5)) / p
    return F.when(col >= 0, fast).otherwise(F.round(col, scale))
