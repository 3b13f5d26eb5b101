"""Overlap chunking and sorted-neighborhood blocking operators."""

from pyspark.sql import functions as F

from certa_spark.operators.blocking import global_rank, sorted_neighborhood_pairs
from certa_spark.operators.chunking import overlap_chunks


def test_overlap_chunks_windows_and_tail(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, ""), (4, "  ")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk"])
        for r in overlap_chunks(docs, size=4, stride=3).collect()
    }
    # doc 1: starts 0,3,6 -> windows of 4 with 1-token overlap, short tail
    assert got[(1, 0)] == (4, "a b c d")
    assert got[(1, 1)] == (4, "d e f g")
    assert got[(1, 2)] == (1, "g")
    assert got[(2, 0)] == (1, "x")
    # empty/whitespace docs emit nothing
    assert {k[0] for k in got} == {1, 2}


def test_global_rank_matches_single_partition_window(spark):
    import random

    rng = random.Random(5)
    rows = [(i, rng.randrange(10_000)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, k long").repartition(13)
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, ["k", "id"], partitions=7).collect()
    }
    want = {
        i: rank + 1
        for rank, (i, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want


def test_sorted_neighborhood_matches_naive(spark):
    rows = [
        ("l", i, f"name{i:03d}") for i in range(0, 40, 2)
    ] + [("r", i, f"name{i:03d}") for i in range(1, 40, 2)]
    df = spark.createDataFrame(rows, "side string, id long, skey string")
    w = 3
    got = {
        (r["lid"], r["rid"], r["dist"])
        for r in sorted_neighborhood_pairs(
            df, "skey", "side", "id", window=w, partitions=5
        ).collect()
    }
    ranked = sorted(rows, key=lambda t: (t[2], t[0], t[1]))
    want = set()
    for i, a in enumerate(ranked):
        for j in range(i + 1, min(i + 1 + w, len(ranked))):
            b = ranked[j]
            if a[0] != b[0]:
                lid, rid = (a[1], b[1]) if a[0] == "l" else (b[1], a[1])
                want.add((lid, rid, j - i))
    assert got == want
