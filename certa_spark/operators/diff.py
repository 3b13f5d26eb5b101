"""Snapshot diff: key-level reconciliation of two versions of a table.

Given an old and a new snapshot sharing a key, classify every key as
``added`` / ``removed`` / ``changed`` / ``unchanged`` and report which
compared columns changed. This is the audit half of CDC — `orders_upsert`
(queries.py) applies a changelog; this derives one from two snapshots.
No counterpart in the reference (tteofili/certa has no versioned-table
operators) — training-data-pipeline extension surface, green-field.

Scale design: one full-outer sort-merge join on the (unique) key — the
single unavoidable shuffle — then pure Column expressions: null-safe
per-column equality folded into an array of changed column names. No
windows, no UDFs; the per-column comparisons stay inside whole-stage
codegen. The summary aggregates (change_type, changed_col) after an
explode whose fan-out is bounded by len(compare_cols).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff: ``key_cols + (change_type, changed_cols)``.

    ``changed_cols`` is the sorted array of compared columns whose
    values differ (null-safe); empty for added/removed/unchanged.
    """
    o = old.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
    )
    j = o.join(n, [f"k_{k}" for k in key_cols], "full_outer")
    changed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    ctype = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *[F.col(f"k_{k}").alias(k) for k in key_cols],
        ctype.alias("change_type"),
        F.when(ctype == "changed", changed)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Aggregate a :func:`snapshot_diff` result to
    ``(change_type, changed_col, n)`` — one row per change type, plus
    one row per (changed, column) pair. ``changed_col`` is NULL on the
    per-type rows."""
    by_type = diff.groupBy("change_type").agg(
        F.count("*").cast("long").alias("n")
    ).select("change_type", F.lit(None).cast("string").alias("changed_col"), "n")
    by_col = (
        diff.filter(F.col("change_type") == "changed")
        .select(F.explode("changed_cols").alias("changed_col"))
        .groupBy("changed_col")
        .agg(F.count("*").cast("long").alias("n"))
        .select(F.lit("changed").alias("change_type"), "changed_col", "n")
    )
    return by_type.unionByName(by_col)
