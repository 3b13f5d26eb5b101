"""Deterministic sampling / data mixing.

``df.sample`` draws from a per-partition RNG stream: the selected rows
change whenever partitioning, task scheduling, or Spark version
changes — useless for reproducible training-data curation, where the
sample must be re-derivable months later from the raw corpus. These
operators sample by CONTENT: a row is kept iff
``hash(key) mod 1e6 < rate * 1e6``, so the decision is a pure function
of the row's key.

Properties that matter at 100TB:
  * map-side only — NO shuffle, no driver coordination, no RNG state;
    composes with any partitioning and survives AQE re-planning;
  * engine-reproducible — the hash is the md5-derived
    ``functions/hashing.hash64`` that DuckDB (and any engine with md5)
    computes bit-identically, so the oracle/audit side can re-derive
    exactly which rows were kept;
  * nested samples: a seed change gives an independent sample; the
    same seed at a lower rate gives a strict SUBSET (rate monotonicity)
    — handy for scaling-law subsets (1%, 10%, 100% of the same mix).

Reference parity note: the reference's only sampling is pandas
``DataFrame.sample`` during support search (certa/local_explain.py:104,
183-186) — driver-side RNG, not content-hashed. This module is the
scale-correct replacement plus data-mixing extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from certa_spark.functions.hashing import duck_hash64, hash64

_GRAIN = 1_000_000


def _keep(key: Column, rate: Column, seed: int) -> Column:
    return (hash64(key, seed=seed) % _GRAIN) < (rate * _GRAIN).cast("long")


def hash_sample(
    df: DataFrame, key_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Uniform deterministic sample: keep ~``rate`` of rows, chosen by
    content hash of ``key_col`` (reproducible across runs/partitions/
    engines; same-seed lower-rate samples are subsets)."""
    return df.filter(_keep(F.col(key_col), F.lit(float(rate)), seed))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum rates — the data-mixing primitive (e.g. upweight
    curated sources, downsample crawl): ``rates[stratum]`` of each
    stratum is kept, ``default_rate`` for strata not listed."""
    rate = F.lit(float(default_rate))
    for value, r in rates.items():
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))).otherwise(rate)
    return df.filter(_keep(F.col(key_col), rate, seed))


def duck_keep_sql(key_expr: str, rate_expr: str, seed: int = 0) -> str:
    """DuckDB predicate matching :func:`_keep` bit-for-bit."""
    h = duck_hash64(key_expr, seed=seed)
    # floor, not CAST-rounding: Spark's double->long cast truncates
    return f"({h} % {_GRAIN}) < CAST(floor(({rate_expr}) * {_GRAIN}) AS BIGINT)"


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.7,
    target_frac: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixing rates (the multilingual/multi-source
    rebalancing rule: sampling weight ∝ count^alpha, alpha<1 upweights
    small sources): returns ``(stratum, n, rate)`` where ``rate`` is
    each stratum's keep-probability such that the expected overall
    sample is ``target_frac`` of the corpus, capped at 1.

    Cross-engine determinism: pow() terms round to 6 decimals and sum
    through DECIMAL (libm pow differs at ~1 ulp between engines; the
    round absorbs it), and the final rate rounds to 6 before the hash
    threshold, so both engines pick the identical row set.
    """
    counts = df.groupBy(strata_col).agg(F.count("*").cast("long").alias("n"))
    w = F.round(F.pow(F.col("n").cast("double"), F.lit(float(alpha))), 6)
    stats = counts.agg(
        F.sum("n").cast("double").alias("_N"),
        F.sum(w.cast("decimal(30,6)")).cast("double").alias("_W"),
    )
    return counts.crossJoin(F.broadcast(stats)).select(
        strata_col,
        "n",
        F.round(
            F.least(
                F.lit(1.0),
                ((F.lit(float(target_frac)) * F.col("_N")) * w)
                / F.col("_W")
                / F.col("n").cast("double"),
            ),
            6,
        ).alias("rate"),
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.7,
    target_frac: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """Apply :func:`temperature_rates` as a content-hash sample: the
    per-stratum rates broadcast back onto the corpus scan, so the
    sampling pass itself is map-side (one tiny agg pass, then filter)."""
    rates = temperature_rates(df, strata_col, alpha, target_frac)
    return df.join(
        F.broadcast(rates.select(strata_col, "rate")), strata_col
    ).filter(_keep(F.col(key_col).cast("string"), F.col("rate"), seed))


def weighted_sample_keys(
    df: DataFrame,
    key_col: str,
    weight: Column,
    seed: int = 0,
) -> DataFrame:
    """A-ES weighted sampling keys (Efraimidis-Spirakis): adds
    ``wkey = u^(1/w)`` with ``u`` a content-hash uniform — taking the
    top-n by ``wkey`` draws a weighted sample without replacement.
    Deterministic (no RNG state, any partitioning), entirely map-side;
    the top-n itself is the caller's rank/filter so the key column can
    also feed per-stratum or windowed variants. ``wkey`` is rounded to
    6 decimals so cross-engine pow() ulp differences cannot reorder;
    break remaining ties on the key column.
    """
    u = (hash64(F.col(key_col), seed=seed) % _GRAIN).cast("double") / float(_GRAIN)
    return df.withColumn(
        "wkey", F.round(F.pow(u, F.lit(1.0) / weight), 6)
    )


def rank_top(df: DataFrame, order_by: list[Column], name: str = "rnk") -> DataFrame:
    """Rank an ALREADY-LIMITED frame (the k survivors of an
    ``orderBy(...).limit(k)`` partial top-k) with ``row_number()`` —
    the semantically guaranteed form (r10 advice): the previous
    ``coalesce(1) + sortWithinPartitions + monotonically_increasing_id``
    idiom produced the same ranks but hinged on physical-plan details
    (exactly one partition, the projection not reordered past the
    sort) rather than an ordering semantic, and
    ``monotonically_increasing_id`` is documented nondeterministic.
    The window is unpartitioned BY DESIGN: it only ever sees the k
    post-limit rows, so the single-partition exchange is k rows, not
    the corpus. Callers must pass a TOTAL order (tie-break on a key
    column) or the rank is not reproducible."""
    from pyspark.sql.window import Window

    return df.withColumn(
        name, F.row_number().over(Window.orderBy(*order_by)).cast("long")
    )


def duck_weighted_key_sql(key_expr: str, weight_expr: str, seed: int = 0) -> str:
    """DuckDB expression matching :func:`weighted_sample_keys`."""
    h = duck_hash64(key_expr, seed=seed)
    u = f"(CAST({h} % {_GRAIN} AS DOUBLE) / {float(_GRAIN)})"
    return f"round(pow({u}, 1.0 / ({weight_expr})), 6)"


def token_budget_fill(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    tokens_col: Column,
    budget: int,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum token-budget fill — the "take N tokens per source"
    pretraining-mix primitive: order each stratum's docs by content
    hash (deterministic, partitioning-independent) and keep docs while
    the running token total stays within ``budget``. A doc that would
    cross the budget is excluded (and so is everything after it in
    hash order), so the selection is exactly reproducible and
    lower-budget selections are prefixes of higher-budget ones.

    One shuffle (the per-stratum window); the running sum is a plain
    cumulative window aggregate — no driver state. Adds ``_cum_tokens``
    (the running total INCLUDING the row) to the output.
    """
    from pyspark.sql.window import Window

    h = hash64(F.col(key_col), seed=seed)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum_tokens", F.sum(tokens_col).over(w))
        .filter(F.col("_cum_tokens") <= budget)
    )
