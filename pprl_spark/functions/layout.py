"""Data-layout keys: Z-order (Morton) interleaving for multi-column locality.

A file sorted by ONE column gives tight parquet row-group min/max
stats on that column only; range filters on a second column scan
everything.  Sorting by the Morton interleave of both columns gives
*both* dimensions locality — each row group covers a small square of
the (c1, c2) grid instead of a thin full-width stripe, so min/max
stats can skip row groups for range predicates on EITHER column (the
standard Z-ORDER layout trick of Delta/Iceberg table optimizers,
re-expressed as a plain codegen'd column).

Pure bit arithmetic — shifts, masks, ORs — identical in every engine;
the driver oracle recomputes the key bit-for-bit in SQL.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(c1: Column | str, c2: Column | str, bits: int = 16) -> Column:
    """Morton key interleaving the low ``bits`` bits of two non-negative
    ints: bit i of c1 lands at position 2i, bit i of c2 at 2i+1.

    ``bits=16`` covers values to 65535 in a 32-bit key; raise to 31 for
    full int range (62-bit key). Values wider than ``bits`` wrap into
    the covered range (callers bucket/clamp first — layout keys need
    locality, not injectivity). The expression is a flat OR-chain of
    2*bits shift/mask terms: whole-stage codegen folds it into straight
    JVM bit ops, no UDF.
    """
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    a = (F.col(c1) if isinstance(c1, str) else c1).cast("long")
    b = (F.col(c2) if isinstance(c2, str) else c2).cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda x, y: x.bitwiseOR(y), terms).cast("long")


def zorder_key_sql(c1: str, c2: str, bits: int = 16) -> str:
    """The identical Morton key as portable SQL text (the oracle twin —
    generated from the same loop so the two can't drift)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(f"((({c1} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({c2} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
