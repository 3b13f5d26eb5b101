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
