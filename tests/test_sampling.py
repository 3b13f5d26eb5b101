"""Deterministic sampling: reproducibility, subset monotonicity, strata."""

from pyspark.sql import functions as F

from certa_spark.operators.sampling import hash_sample, stratified_sample


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def test_hash_sample_deterministic_across_partitionings(spark):
    df = spark.range(1000).select(F.col("id"))
    a = _ids(hash_sample(df.repartition(1), "id", 0.3, seed=1))
    b = _ids(hash_sample(df.repartition(13), "id", 0.3, seed=1))
    assert a == b and 200 < len(a) < 400


def test_hash_sample_rate_monotone_subset(spark):
    # same seed, lower rate => strict subset (scaling-law subsets)
    df = spark.range(1000)
    small = set(_ids(hash_sample(df, "id", 0.1, seed=5)))
    big = set(_ids(hash_sample(df, "id", 0.5, seed=5)))
    assert small < big


def test_hash_sample_seed_changes_selection(spark):
    df = spark.range(1000)
    assert _ids(hash_sample(df, "id", 0.3, seed=1)) != _ids(
        hash_sample(df, "id", 0.3, seed=2)
    )


def test_stratified_rates_and_default(spark):
    df = spark.range(2000).select(
        "id", F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("s")
    )
    out = stratified_sample(
        df, "s", {"a": 1.0, "c": 0.5}, key_col="id", default_rate=0.0
    )
    got = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert got == {"a": 1000}  # b gets default 0.0, a keeps everything


def test_word_bigrams(spark):
    from certa_spark.functions.textstats import word_bigrams, words

    df = spark.createDataFrame([("a b c d",), ("x y",)], "text string").select(
        words(F.col("text")).alias("w")
    )
    got = [r[0] for r in df.select(word_bigrams("w")).collect()]
    assert got == [["a b", "b c", "c d"], ["x y"]]


def test_token_budget_fill_prefix_stable(spark):
    from pyspark.sql import functions as F

    from certa_spark.operators.sampling import token_budget_fill

    rows = [(i, f"s{i % 3}", 10 + i % 7) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, ntok long")
    small = token_budget_fill(
        df, "source", "doc_id", F.col("ntok"), budget=60, seed=3
    )
    big = token_budget_fill(
        df, "source", "doc_id", F.col("ntok"), budget=150, seed=3
    )
    s_ids = {r["doc_id"] for r in small.collect()}
    b_ids = {r["doc_id"] for r in big.collect()}
    # lower budgets select PREFIXES of higher-budget selections
    assert s_ids < b_ids
    # budget respected per stratum
    for r in big.groupBy("source").agg(F.max("_cum_tokens").alias("m")).collect():
        assert r["m"] <= 150
    # partitioning-invariant
    again = {
        r["doc_id"]
        for r in token_budget_fill(
            df.repartition(11), "source", "doc_id", F.col("ntok"),
            budget=150, seed=3,
        ).collect()
    }
    assert again == b_ids
