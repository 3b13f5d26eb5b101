"""Sequence packing: hand-checked pack boundaries and key isolation."""

from certa_spark.operators.packing import pack_assign


def test_pack_assign_hand_values(spark):
    df = spark.createDataFrame(
        [("a", 1, 3), ("a", 2, 4), ("a", 3, 2), ("b", 1, 9)],
        "src string, i long, toks long",
    )
    out = pack_assign(df, "toks", seq_len=5, key_col="src", order_col="i")
    got = {
        (r["src"], r["i"]): (r["token_start"], r["pack_id"], r["offset_in_pack"])
        for r in out.collect()
    }
    assert got == {
        ("a", 1): (0, 0, 0),
        ("a", 2): (3, 0, 3),
        ("a", 3): (7, 1, 2),
        ("b", 1): (0, 0, 0),  # streams are independent per key
    }


def test_pack_assign_salted_equals_plain_on_skew(spark):
    """Segmented-scan twin == plain window cumsum, on a fixture where
    one key holds ~all rows (the case the salted path exists for)."""
    import random

    from certa_spark.operators.packing import pack_assign, pack_assign_salted

    rng = random.Random(7)
    rows = [("hot", i, rng.randint(1, 900)) for i in range(400)]
    rows += [("cold", i, rng.randint(1, 900)) for i in range(5)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens int")

    def canon(out):
        return sorted(
            (r["source"], r["doc_id"], r["token_start"], r["pack_id"], r["offset_in_pack"])
            for r in out.collect()
        )

    plain = pack_assign(df, "n_tokens", 512, "source", "doc_id")
    # block_size=32 -> ~13 blocks for the hot key
    salted = pack_assign_salted(df, "n_tokens", 512, "source", "doc_id", block_size=32)
    assert canon(plain) == canon(salted)


def test_pack_assign_salted_plan_is_two_phase(spark):
    """The hot-key window must partition by (key, block), not key."""
    from certa_spark.operators.packing import pack_assign_salted

    df = spark.createDataFrame(
        [("a", 1, 10)], "source string, doc_id long, n_tokens int"
    )
    plan = pack_assign_salted(df, "n_tokens", 512, "source", "doc_id")._jdf.queryExecution().optimizedPlan().toString()
    assert "_blk" in plan


def test_length_bucketed_batches_minimize_padding(spark):
    from certa_spark.operators.packing import length_bucketed_batches
    from pyspark.sql import functions as F

    # skewed lengths: arrival order would mix 5-token and 500-token
    # docs into one batch; bucketing must place similar lengths together
    rows = [(i, 5 + (i % 4)) for i in range(16)] + [
        (100 + i, 500 + i) for i in range(16)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = length_bucketed_batches(df, "doc_id", "n_tok", batch_size=8)
    batches = {}
    for r in out.collect():
        batches.setdefault(r["batch_id"], []).append(r)
    assert len(batches) == 4
    for rs in batches.values():
        assert len(rs) == 8
        lens = [r["n_tok"] for r in rs]
        # short docs never share a batch with long docs
        assert max(lens) - min(lens) < 100
        assert all(r["batch_max_len"] == max(lens) for r in rs)
        assert all(r["padding_waste"] == max(lens) - r["n_tok"] for r in rs)
    total_waste = out.agg(F.sum("padding_waste")).first()[0]
    # arrival-order pairing of 5-ish with 500-ish would waste ~4000
    assert total_waste < 200


def test_length_bucketed_batches_keyed_and_deterministic(spark):
    from certa_spark.operators.packing import length_bucketed_batches

    rows = [(i, f"s{i % 2}", 10 + i) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tok long")
    a = sorted(map(tuple, length_bucketed_batches(
        df, "doc_id", "n_tok", batch_size=4, key="src").collect()))
    b = sorted(map(tuple, length_bucketed_batches(
        df, "doc_id", "n_tok", batch_size=4, key="src").collect()))
    assert a == b
    # batches never cross the key boundary
    out = length_bucketed_batches(df, "doc_id", "n_tok", batch_size=4, key="src")
    per = out.groupBy("src", "batch_id").count().collect()
    assert all(r["count"] <= 4 for r in per)
