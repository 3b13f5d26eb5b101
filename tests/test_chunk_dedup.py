"""chunk_dedup: first-occurrence-kept semantics and reassembly order."""

from pyspark.sql import functions as F

from certa_spark.operators.dedup import chunk_dedup


def _run(spark, rows, chunk_tokens=2):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_dedup(df, chunk_tokens=chunk_tokens)
    return {r["doc_id"]: r for r in out.collect()}


def test_first_occurrence_wins(spark):
    # doc 2 repeats doc 1's chunk "a b"; only its novel tail survives
    res = _run(
        spark,
        [(1, "a b c d"), (2, "a b x y")],
    )
    assert res[1]["clean_text"] == "a b c d"
    assert res[1]["n_kept"] == 2 and res[1]["n_dropped"] == 0
    assert res[2]["clean_text"] == "x y"
    assert res[2]["n_kept"] == 1 and res[2]["n_dropped"] == 1


def test_within_doc_repeats_collapse(spark):
    res = _run(spark, [(1, "a b a b a b")])
    assert res[1]["clean_text"] == "a b"
    assert res[1]["n_kept"] == 1 and res[1]["n_dropped"] == 2


def test_order_preserved_and_tail_chunk(spark):
    # 5 tokens -> chunks "p q", "r s", "t" (short tail kept as chunk)
    res = _run(spark, [(1, "p q r s t")])
    assert res[1]["clean_text"] == "p q r s t"
    assert res[1]["n_kept"] == 3


def test_fully_duplicate_doc_empties(spark):
    res = _run(spark, [(1, "a b c d"), (2, "a b c d")])
    assert res[2]["clean_text"] == ""
    assert res[2]["n_kept"] == 0 and res[2]["n_dropped"] == 2


def test_duplicated_runs_finds_shared_span(spark):
    from certa_spark.operators.dedup import duplicated_runs
    docs = spark.createDataFrame(
        [
            (1, "x1 x2 a b c d e f g h y1 y2"),
            (2, "z1 a b c d e f g h z2 z3"),
            (3, "q1 q2 q3 q4 q5 q6 q7 q8"),
        ],
        ["doc_id", "text"],
    )
    out = duplicated_runs(docs, k=3, min_run=2, max_df=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    # "a b c d e f g h" = 8 shared tokens = 6 consecutive 3-shingles
    assert r["longest_run_tokens"] == 8
    assert r["n_runs"] == 1
    assert r["dup_shingles"] == 6


def test_duplicated_runs_df_cap_drops_stop_shingles(spark):
    from certa_spark.operators.dedup import duplicated_runs
    # the same span in 5 docs; max_df=4 suppresses every pair
    docs = spark.createDataFrame(
        [(i, f"f{i} a b c d e g{i}") for i in range(5)],
        ["doc_id", "text"],
    )
    assert duplicated_runs(docs, k=3, min_run=2, max_df=4).count() == 0
    # raising the cap surfaces all 10 pairs
    assert duplicated_runs(docs, k=3, min_run=2, max_df=8).count() == 10


def test_duplicated_runs_short_docs_skipped(spark):
    from certa_spark.operators.dedup import duplicated_runs
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], ["doc_id", "text"]
    )
    assert duplicated_runs(docs, k=3, min_run=1).count() == 0


def test_containment_asymmetric(spark):
    """A short doc fully copied into a long one: containment(short in
    long) = 1.0 while Jaccard stays low — the sub-document case."""
    from certa_spark.operators.dedup import containment, jaccard, shingles
    from pyspark.sql import functions as F

    short = "alpha beta gamma delta"
    # letters only: the words() tokenizer drops digits
    import string
    fill = [a + b for a in string.ascii_lowercase[:8]
            for b in string.ascii_lowercase[:5]]
    long_ = short + " " + " ".join(fill)
    df = spark.createDataFrame([(short, long_)], ["a", "b"])
    out = df.select(
        containment(shingles(F.col("a")), shingles(F.col("b"))).alias("c"),
        containment(shingles(F.col("b")), shingles(F.col("a"))).alias("c_rev"),
        jaccard(shingles(F.col("a")), shingles(F.col("b"))).alias("j"),
    ).collect()[0]
    assert out["c"] == 1.0
    assert out["c_rev"] < 0.1
    assert out["j"] < 0.1
    # empty-array guard
    empty = spark.createDataFrame([("", "x y z")], ["a", "b"])
    r = empty.select(
        containment(
            F.array().cast("array<string>"), shingles(F.col("b"))
        ).alias("c")
    ).collect()[0]
    assert r["c"] == 0.0


def test_widen_if_narrow_gates_on_split_count(spark):
    """r8 ADVICE low #1: the single-split widening exchange must be
    GATED on the source's actual partition count — a narrow frame is
    widened to defaultParallelism (the fixture-scale win), while a
    frame already at least that wide passes through IDENTICALLY (no
    repartition node at all), so at 100 TB (thousands of input splits)
    the full-corpus round-robin shuffle never happens."""
    from certa_spark.operators import widen_if_narrow

    p = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    w = widen_if_narrow(narrow)
    assert w.rdd.getNumPartitions() == p
    # plan-inert at fixture scale: the gated helper produces exactly
    # the plan the unconditional repartition produced (this is what
    # lets the gated queries keep their driver-green rows without a
    # plan-change regate)
    assert (
        w._jdf.queryExecution().optimizedPlan().toString()
        == narrow.repartition(p)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # at-scale shape: already-wide frames are returned untouched
    wide = spark.range(1000).repartition(p)
    assert widen_if_narrow(wide) is wide
    wider = spark.range(1000).repartition(p + 3)
    assert widen_if_narrow(wider) is wider
    # explicit parts override
    assert widen_if_narrow(narrow, parts=4).rdd.getNumPartitions() == 4
