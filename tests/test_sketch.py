"""HLL sketch: accuracy, mergeability, and the linear-counting range."""

from pyspark.sql import functions as F

from certa_spark.operators.sketch import hll_estimate, hll_merge, hll_registers


def _est(regs, p=10):
    return hll_estimate(regs, p=p).collect()[0]["hll_estimate"]


def test_hll_accuracy_large_range(spark):
    # 20k distinct values >> 2.5 * 1024 -> the raw HLL estimator path;
    # expected relative error ~1.04/sqrt(1024) ~ 3.2%
    df = spark.range(20000).select(F.col("id").alias("v"))
    est = _est(hll_registers(df, "v"))
    assert abs(est - 20000) / 20000 < 0.10


def test_hll_linear_counting_small_range(spark):
    # 300 distinct << 2.5 * m -> linear counting; tight at this range
    df = spark.range(300).select(F.col("id").alias("v"))
    est = _est(hll_registers(df, "v"))
    assert abs(est - 300) / 300 < 0.05


def test_hll_duplicates_dont_move_estimate(spark):
    base = spark.range(5000).select(F.col("id").alias("v"))
    dup = base.union(base).union(base)
    assert _est(hll_registers(base, "v")) == _est(hll_registers(dup, "v"))


def test_hll_merge_equals_whole(spark):
    # sketch(A) merge sketch(B) == sketch(A union B), for overlapping
    # halves — the property that makes per-partition/per-day sketches
    # combine losslessly at 100TB
    a = spark.range(0, 6000).select(F.col("id").alias("v"))
    b = spark.range(4000, 10000).select(F.col("id").alias("v"))
    merged = hll_merge(hll_registers(a, "v"), hll_registers(b, "v"))
    whole = hll_registers(a.union(b), "v")
    assert _est(merged) == _est(whole)
    # register tables themselves are identical, not just the estimate
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


# ---------------------------------------------------------------- count-min

from certa_spark.operators.sketch import cm_lookup, cm_merge, cm_registers


def _cm_ests(df, items, w=32, d=3):
    regs = cm_registers(df, "v", width=w, depth=d)
    out = cm_lookup(regs, items, "v", width=w, depth=d)
    return {r["v"]: r["cm_est"] for r in out.collect()}


def test_cm_never_underestimates(spark):
    # skewed stream: value k appears k+1 times, k in 0..99
    df = spark.range(100).select(
        F.explode(F.sequence(F.lit(0), F.col("id"))).alias("_")
        , F.col("id").alias("v")
    ).select("v")
    items = spark.range(100).select(F.col("id").alias("v"))
    ests = _cm_ests(df, items)
    for k, est in ests.items():
        assert est >= k + 1


def test_cm_exact_when_wide(spark):
    # width >> distinct values -> no collisions -> estimates exact
    df = spark.range(20).select(F.col("id").alias("v"))
    items = spark.range(20).select(F.col("id").alias("v"))
    ests = _cm_ests(df.union(df), items, w=4096, d=4)
    assert all(est == 2 for est in ests.values())


def test_cm_merge_equals_whole(spark):
    a = spark.range(0, 500).select((F.col("id") % 37).alias("v"))
    b = spark.range(0, 300).select((F.col("id") % 23).alias("v"))
    merged = cm_merge(
        cm_registers(a, "v", width=32, depth=3),
        cm_registers(b, "v", width=32, depth=3),
    )
    whole = cm_registers(a.union(b), "v", width=32, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


# ---------------------------------------------------------------- grouped HLL

from certa_spark.operators.sketch import hll_estimate_by, hll_registers_by


def test_hll_by_group_matches_global_per_group(spark):
    # grouped sketch of one group == global sketch over that group's rows
    df = spark.range(8000).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("v")
    )
    grouped = hll_estimate_by(hll_registers_by(df, "v", ["g"]), ["g"])
    got = {r["g"]: r["hll_estimate"] for r in grouped.collect()}
    for g in ("0", "1"):
        solo = df.filter(F.col("g") == g)
        want = _est(hll_registers(solo, "v"))
        assert got[g] == want


def test_bloom_no_false_negatives_and_merge(spark):
    from certa_spark.operators.sketch import bloom_build, bloom_probe
    from pyspark.sql import functions as F

    a = spark.range(0, 300).select(F.col("id").alias("k"))
    b = spark.range(300, 600).select(F.col("id").alias("k"))
    w_a, w_b = bloom_build(a, "k"), bloom_build(b, "k")
    w_union = bloom_build(a.unionByName(b), "k")
    # mergeability: bit_or of per-source words == words of the union
    merged = (
        w_a.unionByName(w_b)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, w_union.collect())
    )
    # every inserted key is a member (no false negatives)
    probed = bloom_probe(a.unionByName(b), "k", w_union)
    assert probed.filter(F.col("bloom_member") == 0).count() == 0
    # disjoint keys are mostly non-members (FP rate sane for 600 keys
    # in 4032 bits / k=3 the theoretical rate is ~8%; allow slack)
    other = spark.range(10_000, 11_000).select(F.col("id").alias("k"))
    fp = bloom_probe(other, "k", w_union).filter(
        F.col("bloom_member") == 1
    ).count()
    assert fp < 300


def test_bloom_semi_join_exact(spark):
    """The bloom pre-filter must not change the semi-join result."""
    from certa_spark.operators.sketch import bloom_semi_join
    from pyspark.sql import functions as F

    left = spark.range(0, 2000).select(
        (F.col("id") % 700).alias("k"), F.col("id").alias("v")
    )
    right = spark.range(0, 100).select((F.col("id") * 3).alias("rk"))
    got = bloom_semi_join(left, "k", right, "rk")
    exp = left.join(
        right.select(F.col("rk").alias("k")).distinct(), "k", "left_semi"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_hll_sliding_matches_exact_on_small_cardinalities(spark):
    """Linear counting makes the estimate near-exact at tiny
    cardinality: trailing-3 sliding estimates must match the exact
    trailing distinct within 5%, and only present buckets emit."""
    from certa_spark.operators.sketch import hll_sliding_by
    from pyspark.sql import functions as F

    # buckets 0,1,2,4 present (3 missing); keys overlap across buckets
    rows = [(b, k) for b in [0, 1, 2, 4] for k in range(b * 10, b * 10 + 20)]
    rows += [(1, 5), (2, 5), (4, 45)]  # cross-bucket repeats
    df = spark.createDataFrame(rows, ["tb", "k"]).withColumn(
        "k", F.col("k").cast("string")
    )
    est = {r["tb"]: r["hll_estimate"] for r in
           hll_sliding_by(df, "k", "tb", window=3, p=10).collect()}
    assert set(est) == {0, 1, 2, 4}
    pdf = df.toPandas()
    for tb in [0, 1, 2, 4]:
        exact = pdf[(pdf.tb >= tb - 2) & (pdf.tb <= tb)].k.nunique()
        assert abs(est[tb] - exact) / exact < 0.05, (tb, est[tb], exact)


def test_hll_sliding_window1_equals_grouped(spark):
    """window=1 degenerates to the per-bucket grouped estimate."""
    from certa_spark.operators.sketch import (
        hll_estimate_by, hll_registers_by, hll_sliding_by,
    )
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 500)
        .select((F.col("id") % 5).alias("tb"),
                (F.col("id") % 97).cast("string").alias("k"))
    )
    slid = sorted(map(tuple, hll_sliding_by(df, "k", "tb", 1).collect()))
    grouped = sorted(map(tuple, hll_estimate_by(
        hll_registers_by(df, "k", ["tb"]), ["tb"]).collect()))
    assert slid == grouped


def test_kmv_exact_below_k(spark):
    from certa_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_sketch,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", i % 37) for i in range(500)], "g string, v long"
    )
    sk = kmv_sketch(df, ["g"], "v", k=64)
    est = sk.select(kmv_distinct_estimate(F.col("sketch"), 64).alias("e")).first()["e"]
    assert est == 37.0  # below k: the sketch IS the distinct set


def test_kmv_estimate_within_error(spark):
    from certa_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_sketch,
    )
    from pyspark.sql import functions as F

    n = 5000
    df = spark.createDataFrame([("a", i) for i in range(n)], "g string, v long")
    k = 256
    est = (
        kmv_sketch(df, ["g"], "v", k=k)
        .select(kmv_distinct_estimate(F.col("sketch"), k).alias("e"))
        .first()["e"]
    )
    # KMV std error ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(est - n) / n < 0.25


def test_kmv_merge_equals_single_pass_and_intersection(spark):
    from certa_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_intersection_estimate,
        kmv_merge,
        kmv_sketch,
    )
    from pyspark.sql import functions as F

    k = 128
    # A = 0..2999, B = 2000..4999 -> |A ∩ B| = 1000, |A ∪ B| = 5000
    a = spark.createDataFrame([("s", i) for i in range(0, 3000)], "g string, v long")
    b = spark.createDataFrame([("s", i) for i in range(2000, 5000)], "g string, v long")
    u = a.unionByName(b)
    ska = kmv_sketch(a, ["g"], "v", k=k).withColumnRenamed("sketch", "sa")
    skb = kmv_sketch(b, ["g"], "v", k=k).withColumnRenamed("sketch", "sb")
    sku = kmv_sketch(u, ["g"], "v", k=k)
    j = ska.join(skb, "g")
    # merge(A, B) must equal the sketch built over A ∪ B in one pass
    merged = j.select(kmv_merge(F.col("sa"), F.col("sb"), k).alias("m")).first()["m"]
    single = sku.first()["sketch"]
    assert list(merged) == list(single)
    inter = j.select(
        kmv_intersection_estimate(F.col("sa"), F.col("sb"), k).alias("i")
    ).first()["i"]
    # intersection estimator variance is higher (Jaccard ~ 0.2 over k=128
    # samples): assert the right order of magnitude, not tight bounds
    assert 400 < inter < 2200


def test_kmv_group_partition_invariant(spark):
    from certa_spark.operators.sketch import kmv_sketch

    df = spark.createDataFrame(
        [(f"g{i % 3}", i) for i in range(2000)], "g string, v long"
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted((r["g"], tuple(r["sketch"])) for r in kmv_sketch(df, ["g"], "v", k=32).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = sorted((r["g"], tuple(r["sketch"])) for r in kmv_sketch(df, ["g"], "v", k=32).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_misra_gries_bound_and_superset(spark):
    """MG guarantee: for every item, count - n/(k+1) <= c <= count;
    every item with frequency > n/(k+1) is present — under an
    adversarial cardinality far above k."""
    from certa_spark.operators.sketch import misra_gries

    # 3 heavy items in a sea of 2000 singletons
    rows = (
        [("hot1",)] * 400 + [("hot2",)] * 250 + [("hot3",)] * 120
        + [(f"tail{i}",) for i in range(2000)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    n = len(rows)
    k = 64
    got = {r["item"]: r["c"] for r in misra_gries(df, "v", k=k).collect()}
    true = {"hot1": 400, "hot2": 250, "hot3": 120}
    assert len(got) <= k
    for item, cnt in true.items():
        assert item in got  # freq > n/(k+1) = 42.6 -> guaranteed
        assert cnt - n / (k + 1) <= got[item] <= cnt
    # no overcounts anywhere
    for item, c in got.items():
        assert c <= true.get(item, 1)


def test_heavy_hitters_exact_two_pass(spark):
    """Two-pass output is EXACT and partition-invariant: equals the
    plain groupBy top-n on any repartitioning."""
    from certa_spark.operators.sketch import heavy_hitters_exact

    rows = (
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 30 + [("d",)] * 10
        + [(f"t{i}",) for i in range(500)]
    )
    df = spark.createDataFrame(rows, "v string")
    want = [("a", 50, 1), ("b", 30, 2), ("c", 30, 3), ("d", 10, 4)]
    for parts in (1, 7):
        got = [
            (r["item"], r["cnt"], r["rank"])
            for r in heavy_hitters_exact(
                df.repartition(parts), "v", top_n=4, k=128
            ).orderBy("rank").collect()
        ]
        assert got == want


def test_misra_gries_rejects_bad_k(spark):
    import pytest

    from certa_spark.operators.sketch import misra_gries

    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(ValueError, match="k must be positive"):
        misra_gries(df, "v", k=0)


def test_kll_exact_below_k_and_grouped(spark):
    """With n <= k no compaction happens: estimates are the exact
    weighted-CDF quantiles; grouped path keys summaries per group."""
    from certa_spark.operators.sketch import kll_quantiles

    rows = [("a", float(v)) for v in range(1, 101)] + [
        ("b", float(v)) for v in (10, 20, 30, 40)
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    out = {
        (r["g"], r["q"]): r["est"]
        for r in kll_quantiles(df, ["g"], "value", [0.5, 0.99], k=256).collect()
    }
    # first value whose cumulative weight >= q*W
    assert out[("a", 0.5)] == 50.0
    assert out[("a", 0.99)] == 99.0
    assert out[("b", 0.5)] == 20.0
    assert out[("b", 0.99)] == 40.0


def test_kll_rank_error_and_determinism(spark):
    """Deterministic-compaction KLL: rank error stays within 2% on a
    30k-value skewed stream at k=128, identical output on identical
    partitioning, and bound holds across different partitionings."""
    import numpy as np

    from certa_spark.operators.sketch import kll_quantiles

    rng = np.random.RandomState(5)
    vals = rng.lognormal(1.0, 1.2, size=30000)
    sv = np.sort(vals)
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    qs = [0.5, 0.9, 0.99]
    a = kll_quantiles(df.repartition(8), [], "value", qs, k=128).collect()
    b = kll_quantiles(df.repartition(8), [], "value", qs, k=128).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for rows in (a, kll_quantiles(df.repartition(3), [], "value", qs, k=128).collect()):
        for r in rows:
            rank = (sv <= r["est"]).sum() / len(sv)
            assert abs(rank - r["q"]) <= 0.02, (r["q"], rank)


def test_misra_gries_null_heavy_column(spark):
    """r6 fix regression (sketch.py dropna-before-cast): a null-heavy
    column must not fabricate a 'None' item — nulls are not items, and
    a stringified 'None' candidate could never be recounted by pass
    2's equi semi-join. Counts of real items stay within the MG bound
    computed over the NON-NULL row count."""
    from certa_spark.operators.sketch import heavy_hitters_exact, misra_gries

    rows = (
        [("a",)] * 40 + [("b",)] * 25
        + [(None,)] * 300            # nulls dominate the column
        + [(f"t{i}",) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "v string").repartition(8)
    got = {r["item"]: r["c"] for r in misra_gries(df, "v", k=32).collect()}
    assert "None" not in got and None not in got
    n = 40 + 25 + 200  # nulls contribute no mass to the bound either
    assert "a" in got and 40 - n / 33 <= got["a"] <= 40
    assert "b" in got and 25 - n / 33 <= got["b"] <= 25

    # two-pass recount agrees with the plain groupBy on the same data
    hh = {
        (r["item"], r["cnt"])
        for r in heavy_hitters_exact(df, "v", top_n=2, k=64).collect()
    }
    assert hh == {("a", 40), ("b", 25)}


def test_stream_hh_completeness_margin_tri_scale():
    """r7 verdict ask #6: the streaming heavy-hitters gate's k bounds
    the Misra-Gries merge error at max-per-window n/(k+1); the exact
    two-pass output is complete only while that bound sits strictly
    below every day's 3rd-place count. The r7 docstring proved this by
    hand at sf0.1 — this test recomputes BOTH sides from each fixture
    (DuckDB, no Spark) so a future fixture or SF that silently erodes
    the margin fails loudly instead of flipping the oracle hash."""
    import duckdb

    from certa_spark.queries import _STREAM_HH_K

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        row = duckdb.sql(
            f"""
            WITH c AS (
                SELECT strftime(ts, '%Y-%m-%d') AS d, user_id AS u,
                       count(*) AS cnt
                FROM '/root/testdata/{sf}/events.parquet'
                WHERE user_id IS NOT NULL
                GROUP BY 1, 2
            ),
            r AS (
                SELECT d, cnt,
                       row_number() OVER (
                           PARTITION BY d ORDER BY cnt DESC) AS rk,
                       sum(cnt) OVER (PARTITION BY d) AS n
                FROM c
            )
            SELECT max(n) AS max_n,
                   min(CASE WHEN rk = 3 THEN cnt END) AS min_third
            FROM r
            """
        ).fetchone()
        max_n, min_third = row
        bound = max_n / (_STREAM_HH_K + 1)
        # strict, with a 25% safety factor: the gate claims "safely
        # below", not "just below"
        assert bound * 1.25 < min_third, (
            f"{sf}: MG bound {bound:.2f} (n={max_n}, k={_STREAM_HH_K}) "
            f"is not safely below the weakest 3rd-place count "
            f"{min_third} — raise k or re-derive the gate's margin"
        )
