"""BPE merge-induction tests (operators/vocab.py)."""

from pyspark.sql import functions as F


def _one(spark, s, a, b):
    from certa_spark.operators.vocab import merge_pair

    df = spark.createDataFrame([(s,)], ["t"])
    return df.select(merge_pair(F.col("t"), a, b).alias("t")).collect()[0]["t"]


def test_merge_pair_basic_and_adjacent(spark):
    assert _one(spark, "x a b y a b", "a", "b") == "x a_b y a_b"
    # consecutive occurrences both merge (no shared-delimiter miss)
    assert _one(spark, "a b a b", "a", "b") == "a_b a_b"


def test_merge_pair_greedy_left_to_right(spark):
    # "b b b" with pair (b,b): leftmost non-overlapping -> "b_b b"
    assert _one(spark, "b b b", "b", "b") == "b_b b"
    assert _one(spark, "b b b b", "b", "b") == "b_b b_b"
    # "a a b": only the second a starts a match
    assert _one(spark, "a a b", "a", "b") == "a a_b"


def test_learn_merges_counts_and_chaining(spark):
    from certa_spark.operators.vocab import learn_merges

    docs = spark.createDataFrame(
        [
            (1, "new york city new york"),
            (2, "new york is big"),
            (3, "york city limits"),
        ],
        ["doc_id", "text"],
    )
    merges, cur = learn_merges(docs, iters=2)
    assert merges[0] == (1, "new york", 3)
    # round 2: "new_york city" appears 1x, ties broken alphabetically
    assert merges[1][0] == 2 and merges[1][2] == 1
    texts = {r["doc_id"]: r["t"] for r in cur.collect()}
    assert "new_york" in texts[1] and "new_york" in texts[2]


def test_learn_merges_empty_bigrams_stops(spark):
    from certa_spark.operators.vocab import learn_merges

    docs = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
    merges, _ = learn_merges(docs, iters=3)
    assert merges == []


def test_bpe_encode_rank_order_and_leftmost(spark):
    """bpe_encode contract: merges apply in rank order (layered
    merges compose: and = (a,n)+(an,d)), unmergeable words stay
    character-split, and overlapping occurrences merge leftmost
    non-overlapping ('aaa' + (a,a) -> [aa, a])."""
    from pyspark.sql import functions as F

    from certa_spark.operators.vocab import bpe_encode

    df = spark.createDataFrame(
        [(w,) for w in ["the", "thing", "and", "standing", "a", "xyz"]],
        "w string",
    )
    got = {
        r["w"]: r["toks"]
        for r in df.select(
            "w", bpe_encode(F.col("w")).alias("toks")
        ).collect()
    }
    assert got["the"] == ["the"]
    assert got["thing"] == ["th", "ing"]
    assert got["and"] == ["and"]
    # rank order: (a,n)/(an,d)/(in,g) fire first, then rank-18 (s,t)
    # still finds s,t adjacent — exactly true lowest-rank-first BPE
    assert got["standing"] == ["st", "and", "ing"]
    assert got["a"] == ["a"]
    assert got["xyz"] == ["x", "y", "z"]

    # leftmost non-overlapping merge on a custom table
    over = spark.createDataFrame([("aaa",)], "w string")
    assert over.select(
        bpe_encode(F.col("w"), [("a", "a")]).alias("t")
    ).first()["t"] == ["aa", "a"]

    # round-trip: concatenating tokens reproduces the word
    for w, toks in got.items():
        assert "".join(toks) == w


def test_bpe_encode_duck_twin_matches(spark):
    """The DuckDB twin tokenizes a word sample bit-identically."""
    import duckdb
    from pyspark.sql import functions as F

    from certa_spark.operators.vocab import bpe_encode, duck_bpe_encode

    sample = ["the", "standing", "organization", "restlessness",
              "aaa", "q", "interesting"]
    df = spark.createDataFrame([(w,) for w in sample], "w string")
    got = {
        r["w"]: list(r["toks"])
        for r in df.select("w", bpe_encode(F.col("w")).alias("toks")).collect()
    }
    con = duckdb.connect()
    for w in sample:
        duck = con.execute(
            "SELECT " + duck_bpe_encode(f"'{w}'")
        ).fetchone()[0]
        assert list(duck) == got[w], w
