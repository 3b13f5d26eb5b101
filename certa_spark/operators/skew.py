"""Skew mitigation for hot join keys (100TB scale primitive).

AQE's skew-join handles skewed SHUFFLE partitions automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py); explicit
salting below is for the structural case AQE can't fix — one key so
hot that a single task would still receive it whole.

`salted_join` replicates the small side SALT times (explode over the
salt range — tiny side only) and scatters the big side's rows across
salts with a deterministic per-row hash, so a hot key's rows spread
over SALT reducers. Equality with the plain join is tested in
tests/test_pairs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` with ``small`` on ``key``, salting the key so a hot
    value fans out over ``salt`` shuffle partitions.

    The big side gets a deterministic salt from its full row hash (no
    rand() — plans stay reproducible and retries are safe); the small
    side is exploded salt-fold (acceptable because the small side is
    small — at 100TB pick salt ~ #cores on the hottest key's reducer).
    Supports inner/left joins (the salted small side stays unique per
    (key, salt))."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    big_cols = [c for c in big.columns]
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in big_cols]), F.lit(salt))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
