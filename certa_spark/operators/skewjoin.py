"""Salted equi-join for skewed keys.

When one join key dominates (a viral user, a default value, a null
sentinel), a plain shuffle join funnels that key's rows through one
reducer. The standard fix replicates the SMALL side across ``n_salt``
sub-keys and spreads the big side's hot rows across them, so the hot
key occupies ``n_salt`` reducers instead of one. AQE's skew-join
handles sort-merge cases adaptively at runtime; this operator is the
explicit, deterministic form for when the skew is known ahead of time
(and the form that works for any join the optimizer can't split).

The result is EXACTLY the plain inner join: every (left row, right
row) key pair still meets exactly once, because the left row's salt
picks exactly one of the right row's ``n_salt`` replicas.

Reference parity note: no skew handling in tteofili/certa (pandas,
single node) — green-field scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from certa_spark.functions.hashing import hash32


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    spread_col: str,
    n_salt: int = 8,
) -> DataFrame:
    """Inner-join ``left`` and ``right`` on ``key`` with ``n_salt``-way
    salting. ``spread_col`` is any left-side column whose values vary
    within a hot key (a row id, an event id) — its hash picks the
    salt deterministically, so reruns produce identical partitioning.
    The right side replicates ``n_salt``x (keep it the small side).
    Output columns = left columns + right columns (minus the duplicate
    join key).
    """
    salt = (hash32(F.col(spread_col), seed=99) % n_salt).cast("int")
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = l.join(r, [key, "_salt"]).drop("_salt")
    return out
