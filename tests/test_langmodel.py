"""Unigram surprisal: hand-computed values on a 2-doc corpus."""

import math

from certa_spark.operators.langmodel import unigram_surprisal


def test_unigram_surprisal_hand_values(spark):
    # tokens: a a b | b c  -> total=5, c(a)=2, c(b)=2, c(c)=1
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_surprisal"])
        for r in unigram_surprisal(docs).collect()
    }
    ln5, ln2 = math.log(5.0), math.log(2.0)
    assert got[1][0] == 3 and got[2][0] == 2
    assert abs(got[1][1] - round(ln5 - ln2, 4)) < 1e-9
    assert abs(got[2][1] - round(((ln5 - ln2) + ln5) / 2, 4)) < 2e-4


def test_surprisal_orders_quality(spark):
    # a doc of corpus-common tokens scores lower than a doc of rare ones
    rows = [(i, "the quick brown fox") for i in range(20)]
    rows += [(100, "the the the the"), (101, "zyzzyva qoph xylem vex")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["avg_surprisal"] for r in unigram_surprisal(docs).collect()
    }
    assert got[100] < got[0] < got[101]
