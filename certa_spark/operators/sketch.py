"""Mergeable cardinality sketches (HyperLogLog) — the 100TB COUNT
DISTINCT primitive.

An exact ``count_distinct`` over 100TB shuffles every distinct key; an
HLL register table is 2^p longs per partition/day/source, merges with a
``max`` per bucket, and answers within ~1.04/sqrt(2^p) relative error.
The implementation below is fully relational (no UDF, whole-stage
codegen end-to-end) and — unlike the engine-native ``approx_count_
distinct`` whose HLL++ internals differ per engine — is reproducible
bit-for-bit by the DuckDB oracle, because:

  * the 60-bit row hash is the shared md5-derived ``hash64`` from
    ``functions/hashing.py`` (identical in Spark and DuckDB);
  * the register value is computed from ``length(bin(w))`` (both
    engines render minimal binary strings — no leading zeros);
  * the estimator's register sum is the INTEGER ``sum(2^(51-M_j))``
    (a BIGINT left-shift, exact and order-independent — no
    floating-point partial-aggregation drift), with the float math
    confined to one final scalar expression written in the same
    operation order on both sides.

Spark's built-in ``approx_count_distinct`` remains the zero-effort
alternative when cross-run reproducibility of the estimate does not
matter; this module exists for when it does (incremental daily
sketches, auditable pipelines) and as the mergeable-sketch pattern
(see ``hll_merge``: union → max — associative, so partial sketches
from any partitioning combine losslessly).

Reference parity note: tteofili/certa has no sketch operators — this is
part of the training-data-pipeline extension surface (SURVEY §2
extensions), built green-field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from certa_spark.functions.hashing import duck_hash32, duck_hash64, hash32, hash64

# hash64 yields 60-bit values: top ``p`` bits pick the register, the
# remaining (60 - p) bits feed the leading-zero rank, whose maximum
# rank is (60 - p) + 1.
_HASH_BITS = 60


def hll_bucket_rho(col: str, p: int = 10):
    """The (bucket, rho) expression pair shared by every HLL builder —
    batch, grouped, sliding, and streaming."""
    wbits = _HASH_BITS - p
    h = hash64(F.col(col))
    bucket = F.shiftright(h, wbits)
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .cast("long")
    )
    return bucket, rho


def hll_registers(df: DataFrame, col: str, p: int = 10) -> DataFrame:
    """Sketch one column into 2^p HLL registers: ``(bucket, m)`` with
    ``m`` = max leading-zero rank seen in the bucket. Map-side partial
    aggregation does most of the work — at most 2^p rows per partition
    reach the shuffle regardless of input size."""
    wbits = _HASH_BITS - p
    h = hash64(F.col(col))
    bucket = F.shiftright(h, wbits)
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    # rank = leading zeros within the wbits window + 1;
    # length(bin(w)) is w's bit length (minimal binary string).
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .cast("long")
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge sketches: union the register tables, keep the max per
    bucket. Associative/commutative — partial sketches built per
    partition, per day, or per source combine into the global sketch
    without touching the raw data again."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("m").alias("m"))


def hll_estimate(registers: DataFrame, p: int = 10) -> DataFrame:
    """One-row DataFrame ``(hll_estimate: double)`` from a register
    table, with the standard small-range linear-counting correction.
    All aggregation is integer-exact; rounding to 4 decimals at the end
    absorbs any cross-engine libm difference in ln()."""
    m = 1 << p
    wbits = _HASH_BITS - p
    top = 1 << (wbits + 1)  # contribution 2^(wbits+1-rho) for rho=0 (empty)
    # pyspark's shiftleft() helper only takes a literal shift count;
    # the SQL form accepts a column expression
    agg = registers.agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), cast({wbits + 1} - m as int))"))
        .cast("long")
        .alias("sum_present"),
        F.count("*").cast("long").alias("n_buckets"),
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    v = F.lit(m) - F.col("n_buckets")  # empty registers
    sum_total = (F.col("sum_present") + v * F.lit(top)).cast("double")
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(top)) / sum_total
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(F.round(est, 4).alias("hll_estimate"))


def duck_hll_sql(table: str, expr: str, p: int = 10) -> str:
    """DuckDB oracle computing the identical estimate."""
    m = 1 << p
    wbits = _HASH_BITS - p
    top = 1 << (wbits + 1)
    h = duck_hash64(expr)
    return f"""
    WITH regs AS (
        SELECT ({h} >> {wbits}) AS bucket,
               max(CASE WHEN ({h} & {(1 << wbits) - 1}) = 0 THEN {wbits + 1}
                        ELSE {wbits + 1}
                             - length(bin(({h} & {(1 << wbits) - 1})::BIGINT))
                   END) AS m
        FROM {table} GROUP BY 1
    ), agg AS (
        SELECT CAST(sum(1::BIGINT << ({wbits + 1} - m)) AS BIGINT)
                   AS sum_present,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM regs
    )
    SELECT round(CASE WHEN (0.7213/(1.0 + 1.079/{float(m)})) * {float(m)}
                          * {float(m)} * {float(top)}
                          / CAST(sum_present + ({m} - n_buckets)
                                 * {top} AS DOUBLE) <= 2.5 * {m}
                      AND ({m} - n_buckets) > 0
                 THEN {float(m)} * ln({float(m)}
                          / CAST({m} - n_buckets AS DOUBLE))
                 ELSE (0.7213/(1.0 + 1.079/{float(m)})) * {float(m)}
                          * {float(m)} * {float(top)}
                          / CAST(sum_present + ({m} - n_buckets)
                                 * {top} AS DOUBLE)
                 END, 4) AS hll_estimate
    FROM agg
    """


def hll_sliding_by(
    df: DataFrame,
    col: str,
    bucket_col: str,
    window: int,
    p: int = 10,
) -> DataFrame:
    """Trailing-window distinct estimate per integer time bucket:
    ``(bucket_col, hll_estimate)`` where each estimate covers the
    ``window`` buckets ending at (and including) that one. Only
    buckets actually present in the data are emitted.

    This is THE case where mergeable sketches beat exact distinct at
    scale: a 24h-trailing exact count re-shuffles every (hour, key)
    pair into 24 windows; here the raw data is sketched ONCE into
    per-hour registers (map-side combine, <= hours * 2^p rows), the
    tiny register table is exploded forward to the <=``window`` target
    hours each register serves, and the merge is a max over
    (hour, bucket). Total shuffle: hours * 2^p * window register rows,
    independent of input size."""
    regs = hll_registers_by(df, col, [bucket_col], p)
    present = regs.select(bucket_col).distinct()
    targets = regs.select(
        F.explode(
            F.sequence(
                F.col(bucket_col), F.col(bucket_col) + F.lit(window - 1)
            )
        ).alias(bucket_col),
        "bucket",
        "m",
    )
    merged = (
        targets.join(F.broadcast(present), bucket_col)
        .groupBy(bucket_col, "bucket")
        .agg(F.max("m").alias("m"))
    )
    return hll_estimate_by(merged, [bucket_col], p)


def duck_hll_sliding_sql(
    table: str, expr: str, bucket_expr: str, window: int, p: int = 10
) -> str:
    """DuckDB oracle for :func:`hll_sliding_by` (backward range join —
    equivalent to the forward explode + present-bucket semi-join)."""
    m = 1 << p
    wbits = _HASH_BITS - p
    top = 1 << (wbits + 1)
    h = duck_hash64(expr)
    raw = (
        f"(0.7213/(1.0 + 1.079/{float(m)})) * {float(m)} * {float(m)}"
        f" * {float(top)}"
        f" / CAST(sum_present + ({m} - n_buckets) * {top} AS DOUBLE)"
    )
    return f"""
    WITH src AS (
        SELECT ({bucket_expr}) AS tb, {expr} AS v FROM {table}
    ),
    regs AS (
        SELECT tb, ({duck_hash64('v')} >> {wbits}) AS bucket,
               max(CASE WHEN ({duck_hash64('v')} & {(1 << wbits) - 1}) = 0
                        THEN {wbits + 1}
                        ELSE {wbits + 1}
                             - length(bin(({duck_hash64('v')}
                                           & {(1 << wbits) - 1})::BIGINT))
                   END) AS m
        FROM src GROUP BY 1, 2
    ),
    hours AS (SELECT DISTINCT tb FROM src),
    merged AS (
        SELECT t.tb, r.bucket, max(r.m) AS m
        FROM hours t JOIN regs r
          ON r.tb BETWEEN t.tb - {window - 1} AND t.tb
        GROUP BY 1, 2
    ),
    agg AS (
        SELECT tb,
               CAST(sum(1::BIGINT << ({wbits + 1} - m)) AS BIGINT)
                   AS sum_present,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM merged GROUP BY 1
    )
    SELECT tb,
           round(CASE WHEN {raw} <= 2.5 * {m} AND ({m} - n_buckets) > 0
                 THEN {float(m)} * ln({float(m)}
                          / CAST({m} - n_buckets AS DOUBLE))
                 ELSE {raw}
                 END, 4) AS hll_estimate
    FROM agg
    """


# ------------------------------------------------------------------
# Count-min sketch: mergeable heavy-hitter / frequency primitive.
# ------------------------------------------------------------------

def cm_registers(
    df: DataFrame,
    col: str,
    width: int = 64,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch registers over one column: ``(seed, bucket,
    cnt)`` with ``depth`` seeded hash rows of ``width`` buckets each.

    Relational shape: explode each value into its ``depth`` (row,
    bucket) cells with ONE select (no UDF, no per-row loop), then one
    counting aggregate — map-side partial combine means at most
    ``depth * width`` rows per partition reach the shuffle regardless
    of input size. Registers merge across partitions / days / sources
    by summing per cell (``cm_merge``) — the additive twin of the HLL
    max-merge above.

    ``weight_col`` builds the sketch from pre-aggregated (value, count)
    rows — sum the weights instead of counting rows. Sketching an
    already-grouped table touches |distinct| rows, not |stream|.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(seed).alias("seed"),
                (hash64(F.col(col), seed) % width).alias("bucket"),
            )
            for seed in range(depth)
        ]
    )
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col)
    return (
        df.select(F.explode(cells).alias("c"), w.alias("_w"))
        .groupBy(F.col("c.seed").alias("seed"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


def cm_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge count-min sketches: union + per-cell sum (additive, so
    partial sketches from any partitioning combine losslessly)."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("seed", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cm_lookup(
    registers: DataFrame,
    items: DataFrame,
    col: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate counts for each row of ``items``: the count-min
    estimate is the MIN over the ``depth`` rows of the addressed
    register (over-counts only — collisions inflate, never deflate).

    The register table is at most ``depth * width`` rows, so it
    broadcasts; the lookup is ``depth`` broadcast joins collapsed into
    one explode + join + min-agg, keeping ``items`` partition-local.
    """
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(seed).alias("seed"),
                        (hash64(F.col(col), seed) % width).alias("bucket"),
                    )
                    for seed in range(depth)
                ]
            )
        ).alias("c"),
    ).select(col, F.col("c.seed").alias("seed"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(registers), on=["seed", "bucket"], how="left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cm_est"))
    )


def duck_cm_est(expr: str, source_expr: str, width: int = 64, depth: int = 4) -> str:
    """DuckDB scalar fragment: count-min estimate of ``expr`` against a
    sketch built over ``source_expr`` (a FROM-able subquery returning
    column ``v``). Returns SQL for a correlated LEAST(...) over the
    depth rows."""
    ests = []
    for seed in range(depth):
        h = duck_hash64("v", seed)
        hq = duck_hash64(expr, seed)
        ests.append(
            f"(SELECT count(*) FROM ({source_expr}) WHERE ({h} % {width}) = ({hq} % {width}))"
        )
    return "LEAST(" + ", ".join(f"CAST({e} AS BIGINT)" for e in ests) + ")"


# ------------------------------------------------------------------
# Grouped HLL: one sketch PER GROUP in a single pass — the OLAP shape
# ("distinct users per event type / day / source") where exact
# count_distinct would shuffle every (group, key) pair.
# ------------------------------------------------------------------

def hll_registers_by(
    df: DataFrame, col: str, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Per-group HLL registers: ``group_cols + (bucket, m)``. One
    aggregation keyed by (group, bucket) — at most groups * 2^p rows
    reach the shuffle regardless of input size."""
    wbits = _HASH_BITS - p
    h = hash64(F.col(col))
    bucket = F.shiftright(h, wbits)
    w = h.bitwiseAND(F.lit((1 << wbits) - 1))
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .cast("long")
    )
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_estimate_by(
    registers: DataFrame, group_cols: list[str], p: int = 10
) -> DataFrame:
    """Per-group estimate from grouped registers: ``group_cols +
    (hll_estimate,)``. Same integer-exact register sum and
    linear-counting correction as :func:`hll_estimate`, evaluated once
    per group in one aggregation."""
    m = 1 << p
    wbits = _HASH_BITS - p
    top = 1 << (wbits + 1)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), cast({wbits + 1} - m as int))"))
        .cast("long")
        .alias("sum_present"),
        F.count("*").cast("long").alias("n_buckets"),
    )
    alpha = F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(m)))
    v = F.lit(m) - F.col("n_buckets")
    sum_total = (F.col("sum_present") + v * F.lit(top)).cast("double")
    raw = alpha * F.lit(float(m)) * F.lit(float(m)) * F.lit(float(top)) / sum_total
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("hll_estimate"))


def duck_hll_by_sql(table: str, expr: str, group_col: str, p: int = 10) -> str:
    """DuckDB oracle for the grouped sketch+estimate (one group col)."""
    m = 1 << p
    wbits = _HASH_BITS - p
    top = 1 << (wbits + 1)
    h = duck_hash64(expr)
    raw = (
        f"(0.7213/(1.0 + 1.079/{float(m)})) * {float(m)} * {float(m)} * {float(top)}"
        f" / CAST(sum_present + ({m} - n_buckets) * {top} AS DOUBLE)"
    )
    return f"""
    WITH regs AS (
        SELECT {group_col}, ({h} >> {wbits}) AS bucket,
               max(CASE WHEN ({h} & {(1 << wbits) - 1}) = 0 THEN {wbits + 1}
                        ELSE {wbits + 1}
                             - length(bin(({h} & {(1 << wbits) - 1})::BIGINT))
                   END) AS m
        FROM {table} GROUP BY 1, 2
    ), agg AS (
        SELECT {group_col},
               CAST(sum(1::BIGINT << ({wbits + 1} - m)) AS BIGINT) AS sum_present,
               CAST(count(*) AS BIGINT) AS n_buckets
        FROM regs GROUP BY 1
    )
    SELECT {group_col},
           round(CASE WHEN {raw} <= 2.5 * {m} AND ({m} - n_buckets) > 0
                 THEN {float(m)} * ln({float(m)} / CAST({m} - n_buckets AS DOUBLE))
                 ELSE {raw}
                 END, 4) AS hll_estimate
    FROM agg
    """


# ------------------------------------------------------------------ bloom

# 63 bits per word keeps 1 << bit inside a signed 64-bit integer on
# every engine (bit 63 would overflow DuckDB's BIGINT shift).
_BLOOM_WORD_BITS = 63


def _bloom_positions(col, m_bits: int, k: int):
    """k md5-derived bit positions for a key (seeded hash32 mod m)."""
    return [hash32(col, seed=i) % m_bits for i in range(k)]


def bloom_build(
    df: DataFrame, col: str, m_bits: int = 4032, k: int = 3
) -> DataFrame:
    """Mergeable Bloom filter over ``df[col]``: returns the non-zero
    words as (word_idx, bits) — the standard pre-shuffle-join reduction
    sketch. Build is one explode + one tiny groupBy (<= m_bits/63
    rows); filters from different partitions/sources merge with
    ``bit_or`` on word_idx, the same property the build itself uses.
    ``m_bits`` must be a multiple of 63 (63 data bits per long word —
    see _BLOOM_WORD_BITS).
    """
    assert m_bits % _BLOOM_WORD_BITS == 0
    pos = F.explode(F.array(*_bloom_positions(F.col(col), m_bits, k))).alias("pos")
    return (
        df.select(pos)
        .select(
            F.expr(f"pos div {_BLOOM_WORD_BITS}").cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(1L, CAST(pos % {_BLOOM_WORD_BITS} AS INT))"
            ).alias("_bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_bit").alias("bits"))
    )


def bloom_probe(
    df: DataFrame, col: str, words: DataFrame, m_bits: int = 4032, k: int = 3
) -> DataFrame:
    """Adds a ``bloom_member`` int column: 1 iff all k bits are set.
    Each of the k positions tests via a LEFT BROADCAST join against the
    tiny words table (≤ m_bits/63 rows) — no shuffle ever touches the
    probed side, which is what makes the bloom the right pre-filter
    before an expensive shuffle join at 100TB. (Collecting the words
    into a literal array was measured 10x slower to BUILD: py4j
    converts list literals element-by-element.)"""
    out = df
    checks = []
    tmp = []
    for i in range(k):
        pc = f"_bpos{i}"
        out = out.withColumn(pc, _bloom_positions(F.col(col), m_bits, k)[i])
        out = out.withColumn(
            f"_widx{i}", F.expr(f"{pc} div {_BLOOM_WORD_BITS}").cast("long")
        )
        wi = words.select(
            F.col("word_idx").alias(f"_widx{i}"), F.col("bits").alias(f"_bits{i}")
        )
        out = out.join(F.broadcast(wi), f"_widx{i}", "left")
        checks.append(
            F.coalesce(F.col(f"_bits{i}"), F.lit(0))
            .bitwiseAND(
                F.expr(f"shiftleft(1L, CAST({pc} % {_BLOOM_WORD_BITS} AS INT))")
            )
            != 0
        )
        tmp += [pc, f"_widx{i}", f"_bits{i}"]
    member = checks[0]
    for c in checks[1:]:
        member = member & c
    return out.withColumn("bloom_member", member.cast("int")).drop(*tmp)


def duck_bloom_member_sql(
    build_table_sql: str,
    build_expr: str,
    probe_key: str,
    m_bits: int = 4032,
    k: int = 3,
) -> tuple[str, str]:
    """DuckDB expression fragments reproducing bloom_build+probe:
    returns (words_cte, member_expr) where words_cte must be included
    as a CTE named ``bloom_words`` and member_expr evaluates to the
    0/1 membership of ``probe_key`` against it."""
    w = _BLOOM_WORD_BITS
    n_words = m_bits // w
    pos_exprs = [
        f"({duck_hash32(build_expr, seed=i)} % {m_bits})" for i in range(k)
    ]
    # dense-array CTE mirrors the Spark side's literal array: the words
    # scatter into arr once, probes index it (no correlated subqueries)
    words_cte = f"""
    bloom_pos AS (
        SELECT unnest([{', '.join(pos_exprs)}]) AS pos FROM ({build_table_sql})
    ),
    bloom_words AS (
        SELECT pos // {w} AS word_idx,
               bit_or(1::BIGINT << CAST(pos % {w} AS INT)) AS bits
        FROM bloom_pos GROUP BY 1
    ),
    bloom_arr AS (
        SELECT list(coalesce(bw.bits, 0) ORDER BY i.idx) AS arr
        FROM (SELECT unnest(range({n_words})) AS idx) i
        LEFT JOIN bloom_words bw ON bw.word_idx = i.idx
    )"""
    probe_pos = [
        f"({duck_hash32(probe_key, seed=i)} % {m_bits})" for i in range(k)
    ]
    checks = [
        f"(arr[CAST({p} // {w} AS INT) + 1] & (1::BIGINT << CAST({p} % {w} AS INT))) <> 0"
        for p in probe_pos
    ]
    member_expr = (
        "CASE WHEN " + " AND ".join(checks) + " THEN 1 ELSE 0 END"
    )
    return words_cte, member_expr


def bloom_semi_join(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    m_bits: int = 4032,
    k: int = 3,
) -> DataFrame:
    """Semi join with a Bloom pre-filter: build the filter over the
    right side's keys (one tiny agg), drop left rows whose keys cannot
    match map-side (broadcast filter, no shuffle), then run the exact
    semi join on the survivors. Result is EXACTLY the plain semi join
    — the bloom only prunes — but the shuffle moves only
    (true matches + false positives) instead of the whole left side.
    """
    words = bloom_build(right.select(right_key), right_key, m_bits, k)
    pruned = bloom_probe(left, left_key, words, m_bits, k).filter(
        F.col("bloom_member") == 1
    ).drop("bloom_member")
    return pruned.join(
        right.select(F.col(right_key).alias(left_key)).distinct(),
        left_key,
        "left_semi",
    )


# ------------------------------------------------------------------ KMV

def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 256
) -> DataFrame:
    """K-minimum-values distinct sketch (Beyer et al., SIGMOD'07):
    per group, the ``k`` smallest deterministic 60-bit value hashes
    as a sorted array. What it buys over HLL: KMV sketches support
    set INTERSECTION (and arbitrary set expressions) — cross-source
    overlap estimation, decontamination triage, join-cardinality
    bounds — which register-max sketches cannot express. Groups with
    fewer than k distinct values are EXACT by construction.

    Scale shape, no collect_set hazards: distinct (group, hash) pairs
    -> per-group rank window. Spark plans the rank cut as
    WindowGroupLimit, so every partition keeps only its local k
    smallest BEFORE the shuffle — the exchange carries at most
    k·partitions rows per group however large the group is. The final
    array is bounded at k elements (sorted collect after the cut,
    order restored deterministically by array_sort).
    """
    from pyspark.sql.window import Window

    hashed = df.select(
        *[F.col(c) for c in group_cols],
        hash64(F.col(value_col).cast("string")).alias("_h"),
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("_h")).alias("sketch"))
    )


def kmv_merge(a, b, k: int = 256):
    """Column expression merging two KMV sketches: the k smallest of
    the deduplicated union — associative/commutative, so partial
    sketches from any partitioning combine losslessly (same contract
    as hll_merge)."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


_KMV_SCALE = float(2**60)  # hash64 is a 60-bit non-negative hash


def kmv_distinct_estimate(sketch, k: int = 256):
    """Column expression estimating the distinct count from a KMV
    sketch: exact size when the sketch holds fewer than k hashes,
    else the unbiased (k-1)/u_k estimator with u_k = the kth smallest
    hash normalized to (0,1]."""
    kth = F.element_at(sketch, k).cast("double")
    return F.when(
        F.size(sketch) < k, F.size(sketch).cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / ((kth + F.lit(1.0)) / F.lit(_KMV_SCALE))
    )


def kmv_intersection_estimate(a, b, k: int = 256):
    """Column expression estimating |A ∩ B| from two KMV sketches:
    merge to the union's sketch S, then est = (|S ∩ A ∩ B| / k') ·
    D(union), where k' = |S| (Beyer et al.'s set-operation
    estimator). Pure array expressions — runs in whole-stage codegen
    on sketch-sized data."""
    s = kmv_merge(a, b, k)
    kk = F.size(s)
    in_both = F.size(F.array_intersect(F.array_intersect(s, a), b))
    return (
        in_both.cast("double") / kk.cast("double")
    ) * kmv_distinct_estimate(s, k)


# ----------------------------------------------------- OPH MinHash

def oph_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 128,
) -> DataFrame:
    """One-permutation-hashing MinHash registers (Li, Owen, Zhang,
    NIPS'12): hash each value once, route it to bin ``h mod k``, keep
    the per-bin MINIMUM — ``(group..., bin, mn)``. The min-merge makes
    this the STREAMABLE member of the minhash family (state: k longs
    per group, late data folds in with an idempotent min — the same
    contract as the HLL registers), and bin-wise register agreement
    estimates Jaccard similarity between groups, which one sketch pass
    over each side buys at any scale."""
    gcols = list(group_cols or [])
    h = hash64(F.col(value_col).cast("string"))
    return (
        df.select(
            *[F.col(c) for c in gcols],
            F.pmod(h, F.lit(k)).cast("int").alias("bin"),
            h.alias("_h"),
        )
        .groupBy(*gcols, "bin")
        .agg(F.min("_h").alias("mn"))
    )


def oph_jaccard(a_regs: DataFrame, b_regs: DataFrame) -> DataFrame:
    """Jaccard estimate from two OPH register tables (ungrouped or
    pre-filtered to one group each): J ≈ (#bins filled on both sides
    with EQUAL mins) / (#bins filled on either side). The
    empty-bin-aware denominator keeps the estimator usable when the
    sets are smaller than k (sparse bins); for |A|,|B| >> k every bin
    fills and this is the textbook estimator. Returns one row
    ``(matched, filled, jaccard_est)``."""
    # distinct output names on BOTH sides: callers routinely pass two
    # filters of the same register frame, and a shared lineage with a
    # shared column name is the classic Spark self-join ambiguity
    a = a_regs.select(F.col("bin").alias("_ba"), F.col("mn").alias("ma"))
    b = b_regs.select(F.col("bin").alias("_bb"), F.col("mn").alias("mb"))
    j = a.join(b, F.col("_ba") == F.col("_bb"), "full_outer")
    return j.agg(
        F.coalesce(
            F.sum((F.col("ma") == F.col("mb")).cast("long")), F.lit(0)
        ).cast("long").alias("matched"),
        F.count(F.lit(1)).cast("long").alias("filled"),
    ).select(
        "matched",
        "filled",
        (F.col("matched").cast("double") / F.col("filled").cast("double"))
        .alias("jaccard_est"),
    )


def misra_gries(
    df: DataFrame,
    col: str,
    k: int = 256,
) -> DataFrame:
    """Mergeable Misra-Gries heavy-hitter summary (Misra & Gries 1982;
    mergeability per Agarwal et al., "Mergeable Summaries", PODS'12):
    at most ``k`` (item, c) rows with the guarantee

        count(x) - n/(k+1)  <=  c(x)  <=  count(x)

    for EVERY item (absent items have c = 0), where n is the total row
    count. So any item with frequency above n/(k+1) is guaranteed
    present — which is what makes the two-pass
    :func:`heavy_hitters_exact` deterministic under ANY partitioning.

    Shape: one Arrow-batched ``mapInPandas`` pass keeps k decrement
    counters per PARTITION (bounded memory however large the item
    universe — the point of the sketch vs a full groupBy), then the
    partial summaries (<= k * partitions tiny rows) merge relationally:
    sum counters by item, subtract the (k+1)-th largest merged value,
    drop non-positives. Both steps preserve the MG error bound.
    """
    if k <= 0:
        raise ValueError("misra_gries: k must be positive")

    out_schema = "item string, c long"

    def _mg(batches):
        import pandas as pd

        # vectorized MG: each Arrow batch contributes its exact
        # value_counts, merged into the running summary with the
        # Agarwal et al. truncation (subtract the (k+1)-th largest,
        # drop non-positives) — every subtraction of v removes >=
        # (k+1)*v total mass, so the summed undercount stays <=
        # n/(k+1): the classic MG bound without per-row Python
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            # dropna BEFORE the str cast: pandas would stringify nulls
            # to a literal 'None' item that pass-2's equi semi-join
            # could never recount (null rows don't equi-match)
            vc = pdf[col].dropna().astype(str).value_counts()
            counters = counters.add(vc, fill_value=0).astype("int64")
            if len(counters) > k:
                sub = counters.nlargest(k + 1).iloc[-1]
                counters = counters - sub
                counters = counters[counters > 0]
        yield pd.DataFrame(
            {"item": counters.index.astype(str), "c": counters.values}
        )

    partial = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        _mg, schema=out_schema
    )
    summed = partial.groupBy("item").agg(F.sum("c").cast("long").alias("c"))
    # (k+1)-th largest merged counter (0 when fewer than k+1 items):
    # subtracting it restores |summary| <= k and keeps the error bound
    kth = (
        summed.orderBy(F.col("c").desc(), F.col("item").asc())
        .limit(k + 1)
        .orderBy(F.col("c").asc(), F.col("item").desc())
        .limit(1)
        .collect()
    )
    sub = int(kth[0]["c"]) if len(kth) and summed.count() > k else 0
    return (
        summed.select("item", (F.col("c") - F.lit(sub)).alias("c"))
        .filter(F.col("c") > 0)
    )


def heavy_hitters_exact(
    df: DataFrame,
    col: str,
    top_n: int = 20,
    k: int = 256,
) -> DataFrame:
    """Two-pass exact heavy hitters — the production pattern for
    "top-N items of a column whose cardinality is too large to
    groupBy": pass 1 sketches candidates with :func:`misra_gries`
    (bounded memory, guaranteed superset of every item with frequency
    > n/(k+1)); pass 2 recounts ONLY the <= k candidates exactly
    (broadcast hash semi-join — the big side never shuffles) and keeps
    the exact top ``top_n`` (ties to the smaller item).

    The output is EXACT and partition-invariant whenever the true
    top_n frequencies exceed n/(k+1) — size k accordingly (k >= 2 *
    n / freq(top_n) is a comfortable margin). Returns
    ``(item, cnt, rank)``.
    """
    from pyspark.sql.window import Window

    cand = misra_gries(df, col, k=k).select("item")
    counted = (
        df.select(F.col(col).cast("string").alias("item"))
        .join(F.broadcast(cand), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("item").asc())
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_n)
    )


def _kll_cascade(levels: list, k: int) -> None:
    """Deterministic compaction cascade: when a level holds more than
    ``k`` values, sort it and promote every second value (offset
    alternates by level parity, so the down/up rank bias of a fixed
    offset cancels across levels) to the next level, where each value
    weighs twice as much. In-place."""
    i = 0
    while i < len(levels):
        if len(levels[i]) > k:
            buf = sorted(levels[i])
            if i + 1 == len(levels):
                levels.append([])
            levels[i + 1].extend(buf[(i % 2):: 2])
            levels[i] = []
        i += 1


def kll_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-partition deterministic KLL/MRL quantile summaries (Manku
    et al. SIGMOD'98 collapse rule; level structure per Karnin/Lang/
    Liberty FOCS'16, with the random compaction offset replaced by a
    level-parity-deterministic one — reproducible run-to-run at the
    cost of the worst-case bound; empirical rank error on non-
    adversarial data stays ~1/k, and the registry query GATES it).

    One Arrow-batched ``mapInPandas`` pass: per (partition, group) a
    cascade of levels, level i holding values of weight 2^i, each
    capped at k — memory O(k log(n/k)) per group per partition however
    large n grows. Output rows ``(*group_cols, level, value)`` are the
    mergeable summary: <= k*levels rows per partition per group.
    """
    import pandas as pd

    gcols = list(group_cols)
    fields = ", ".join(f"{g} string" for g in gcols)
    out_schema = f"{fields}, level int, value double" if gcols else \
        "level int, value double"

    def _fn(batches):
        states: dict = {}
        for pdf in batches:
            if gcols:
                grouped = pdf.groupby(gcols, sort=False)
            else:
                grouped = [((), pdf)]
            for key, g in grouped:
                if not isinstance(key, tuple):
                    key = (key,)
                levels = states.setdefault(key, [[]])
                levels[0].extend(float(v) for v in g[value_col].dropna())
                _kll_cascade(levels, k)
        rows = []
        for key, levels in states.items():
            for lvl, vals in enumerate(levels):
                for v in vals:
                    rows.append((*[str(x) for x in key], lvl, v))
        yield pd.DataFrame(
            rows, columns=[*gcols, "level", "value"]
        )

    return df.select(
        *[F.col(g).cast("string").alias(g) for g in gcols],
        F.col(value_col).cast("double").alias(value_col),
    ).mapInPandas(_fn, schema=out_schema)


def kll_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    fractions: list[float],
    k: int = 256,
) -> DataFrame:
    """Grouped quantile estimates from the deterministic KLL summary:
    partials per partition (:func:`kll_partials`), then one
    ``applyInPandas`` merge per group — re-run the cascade over the
    (<= k * levels * partitions, tiny) weighted rows, then read each
    fraction off the weighted CDF (first value whose cumulative weight
    reaches q*W; ties to the smaller value by the sort). Fully
    deterministic given the partitioning; the rank-error contract is
    what the registry gate checks, mirroring the
    ``events_quantile_approx_gate`` rank-not-value philosophy.
    Returns ``(*group_cols, q, est)``."""
    import pandas as pd

    gcols = list(group_cols)
    parts = kll_partials(df, gcols, value_col, k=k)
    fields = ", ".join(f"{g} string" for g in gcols)
    out_schema = (
        f"{fields}, q double, est double" if gcols else "q double, est double"
    )
    fr = sorted(float(q) for q in fractions)

    def _merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        levels: list = [[]]
        for lvl, grp in pdf.groupby("level"):
            while len(levels) <= lvl:
                levels.append([])
            levels[lvl].extend(float(v) for v in grp["value"])
        _kll_cascade(levels, k)
        vals, ws = [], []
        for lvl, buf in enumerate(levels):
            vals.extend(buf)
            ws.extend([2 ** lvl] * len(buf))
        s = pd.DataFrame({"v": vals, "w": ws}).sort_values("v")
        cw = s["w"].cumsum()
        total = int(s["w"].sum())
        ests = []
        for q in fr:
            target = q * total
            idx = (cw >= target).idxmax() if total else None
            ests.append(float(s["v"].loc[idx]) if idx is not None else None)
        return pd.DataFrame(
            {
                **{g: [key[i]] * len(fr) for i, g in enumerate(gcols)},
                "q": fr,
                "est": ests,
            }
        )

    if gcols:
        return parts.groupBy(*gcols).applyInPandas(
            lambda key, pdf: _merge(key, pdf), schema=out_schema
        )

    def _merge_all(key, pdf):
        out = _merge((), pdf)
        out.insert(0, "_g", 1)
        return out

    return (
        parts.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(_merge_all, schema="_g int, " + out_schema)
        .drop("_g")
    )
