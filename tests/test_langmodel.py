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


def test_bigram_logprob_hand_check(spark):
    import math

    from certa_spark.operators.langmodel import bigram_logprob

    # corpus: "a b" x2 and "a c"; V = 3
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_logprob(docs, add_k=1.0).collect()
    }
    # c("a b")=2, c("a c")=1, c("a ·")=3, V=3
    p_ab = math.log((2 + 1.0) / (3 + 1.0 * 3))
    p_ac = math.log((1 + 1.0) / (3 + 1.0 * 3))
    assert got[1] == (1, round(p_ab, 4)) == got[2]
    assert got[3] == (1, round(p_ac, 4))
    # natural text outscores its shuffled twin (context sensitivity —
    # the thing unigram surprisal cannot see)
    nat = [(i, "the cat sat on the mat") for i in range(10)]
    shuf = [(100, "mat the on sat cat the")]
    both = spark.createDataFrame(nat + shuf, "doc_id long, text string")
    sc = {r["doc_id"]: r["avg_logprob"] for r in bigram_logprob(both).collect()}
    assert sc[0] > sc[100]
