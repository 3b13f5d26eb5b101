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
