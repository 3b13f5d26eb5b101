"""Data-layout operators: Z-order (space-filling-curve) clustering.

At 100 TB, scan cost is dominated by how much data the format can SKIP.
Min/max zone maps prune well on ONE sort key; Z-ordering interleaves
the bits of two keys so that consecutive key ranges ("tiles") are
small rectangles in BOTH dimensions — a table range-partitioned and
sorted by the z-key gives row-group pruning on either predicate
column (the Delta/Iceberg OPTIMIZE ZORDER layout, built here from
plain Catalyst bit arithmetic — no UDF).

The audit query groups rows by z-tile (a prefix of the z-key — the
rows a writer would pack into one file) and reports each tile's
per-dimension min/max spread: tight ranges on both dimensions = both
predicates prune.

Reference parity note: tteofili/certa has no layout operators — this
is part of the training-data-pipeline extension surface (SURVEY §2
extensions), built green-field.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a 2*bits-bit Z-value (a's bits at odd positions).
    Pure integer arithmetic — identical in any engine."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def duck_zorder_key(a: str, b: str, bits: int = 8) -> str:
    """DuckDB twin of :func:`zorder_key`."""
    parts = []
    for i in range(bits):
        parts.append(f"(((CAST({a} AS BIGINT) >> {i}) & 1) << {2 * i + 1})")
        parts.append(f"(((CAST({b} AS BIGINT) >> {i}) & 1) << {2 * i})")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"
