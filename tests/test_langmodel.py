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


def test_dsir_importance_separates_domains(spark):
    """DSIR hand-check: documents made of target-domain vocabulary
    must score strictly higher than documents of off-domain
    vocabulary (the importance weight is log p_target - log p_raw),
    the weight is partition-invariant (decimal-routed sums), and
    zero-token docs drop out of the output on both paths."""
    from pyspark.sql import functions as F

    from certa_spark.operators.langmodel import dsir_importance

    rows = [
        # target domain: legal-ish vocabulary
        (1, "the court finds the contract valid and binding", "legal"),
        (2, "the appeal court reviews the contract clause", "legal"),
        (3, "binding arbitration clause in the contract", "legal"),
        # raw pool: cooking vocabulary
        (4, "simmer the onions then add garlic and stir", "web"),
        (5, "bake the dough until golden and crisp", "web"),
        # mixed doc: some legal words
        (6, "the recipe contract binds garlic to onions", "web"),
        # looks fully legal but labeled web (selection candidate)
        (7, "the court contract clause is binding", "web"),
        # zero tokens after the word regex
        (8, "", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_importance(
            docs, F.col("source") == "legal", n_buckets=512
        ).collect()
    }
    assert 8 not in out and set(out) == {1, 2, 3, 4, 5, 6, 7}
    # every pure-legal-vocabulary doc (including the web-labeled one,
    # 7 — the selection candidate DSIR exists to find) outranks every
    # doc with cooking vocabulary; the mixed doc ranks with the
    # off-domain ones (its rare off-domain singletons dominate the
    # sum — DSIR weights are per-token sums, not means)
    assert min(out[1], out[2], out[3], out[7]) > max(
        out[4], out[5], out[6]
    )
    out2 = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_importance(
            docs.repartition(7), F.col("source") == "legal", n_buckets=512
        ).collect()
    }
    assert out == out2


def test_dsir_resample_is_aes_topk_of_importance(spark):
    """DSIR stage 2 (r10): the resample must be EXACTLY the top-k of
    the A-ES keys u^(1/exp(logw)) over dsir_importance's output —
    verified against a driver-side recomputation from the collected
    importance frame — with rank dense from 1, wkey monotone
    non-increasing, and the whole selection partition-invariant."""
    from pyspark.sql import functions as F

    from certa_spark.operators.langmodel import dsir_importance, dsir_resample

    rows = [
        (i, " ".join(
            ["court contract clause binding"] * (1 + i % 3)
            + ["garlic onion stir bake"] * (i % 4)
         ), "legal" if i % 5 == 0 else "web")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pred = F.col("source") == "legal"
    k = 7

    got = dsir_resample(docs, pred, k_docs=k, n_buckets=512, seed=29).collect()
    assert [r["rnk"] for r in got] == list(range(1, k + 1))
    wkeys = [r["wkey"] for r in got]
    assert wkeys == sorted(wkeys, reverse=True)

    # driver-side recomputation of the A-ES draw from the importance
    # frame, using the same content-hash uniform the operator uses
    import math

    from certa_spark.functions.hashing import hash64
    from certa_spark.operators.sampling import _GRAIN

    imp = dsir_importance(docs, pred, n_buckets=512).withColumn(
        "_u", (hash64(F.col("doc_id"), seed=29) % _GRAIN).cast("double")
        / float(_GRAIN)
    ).collect()
    keyed = [
        (round(math.pow(
            r["_u"], 1.0 / max(math.exp(r["dsir_logw"]), 1e-300)
         ), 6),
         r["doc_id"])
        for r in imp
    ]
    expect_ids = [d for w, d in sorted(keyed, key=lambda t: (-t[0], t[1]))[:k]]
    assert [r["doc_id"] for r in got] == expect_ids

    got2 = dsir_resample(
        docs.repartition(11), pred, k_docs=k, n_buckets=512, seed=29
    ).collect()
    assert [tuple(r) for r in got2] == [tuple(r) for r in got]


def test_dsir_resample_weight_underflow_edge(spark):
    """r11 advice: a log-weight below ~-745 underflows exp() to exactly
    0.0; without the 1e-300 clamp the wkey becomes pow(u, 1.0/0.0) and
    the two engines' division-by-zero semantics are no longer a shared
    contract. Pin the clamped expression to 0.0 on BOTH engines, and
    pin the end-to-end operator: a pathologically off-target document
    still ranks (last, wkey 0.0) instead of poisoning the draw."""
    import duckdb
    from pyspark.sql import functions as F

    from certa_spark.operators.langmodel import dsir_resample
    from certa_spark.operators.sampling import duck_weighted_key_sql

    # expression-level: identical wkey on both engines at logw = -800
    got_spark = (
        spark.range(1)
        .select(
            F.round(
                F.pow(
                    F.lit(0.5),
                    F.lit(1.0) / F.greatest(F.exp(F.lit(-800.0)),
                                            F.lit(1e-300)),
                ),
                6,
            ).alias("wkey")
        )
        .collect()[0]["wkey"]
    )
    # the oracle-side wkey fragment carries the clamped weight and
    # DuckDB evaluates it (uniform pinned to the same 0.5 as above)
    frag = duck_weighted_key_sql("'x'", "greatest(exp(-800.0), 1e-300)")
    assert "greatest(exp(-800.0), 1e-300)" in frag
    got_duck = duckdb.sql(
        "SELECT round(pow(0.5, 1.0 / greatest(exp(-800.0), 1e-300)), 6) AS w"
    ).fetchone()[0]
    assert got_spark == got_duck == 0.0

    # operator-level: one doc whose term-sum underflows exp (a long
    # pure-off-target doc) is still drawn when k covers the corpus
    rows = [
        (0, "court contract clause binding " * 5, "legal"),
        (1, "court contract binding " * 3, "web"),
        (2, "garlic onion stir bake " * 400, "web"),  # strongly negative
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    got = dsir_resample(
        docs, F.col("source") == "legal", k_docs=3, n_buckets=64, seed=29
    ).collect()
    assert [r["rnk"] for r in got] == [1, 2, 3]
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[2]["dsir_logw"] < 0
    # the off-target doc sorts last and its wkey is finite (0.0 when
    # the weight underflowed far enough, never NaN/None)
    assert got[-1]["wkey"] is not None and got[-1]["wkey"] >= 0.0
