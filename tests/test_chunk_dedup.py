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
