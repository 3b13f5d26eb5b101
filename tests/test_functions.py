"""Golden tests: scalar text/hash functions vs pandas/DuckDB oracles."""

import math
import re
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from certa_spark.functions.hashing import duck_hash32, duck_hash64, hash32, hash64
from certa_spark.functions.text import bow_cosine, token_diff
from certa_spark.functions import textstats as TS


def py_cosine(t1: str, t2: str) -> float:
    """Reference formula (certa/local_explain.py:221-234), lowercased."""
    w = re.compile(r"\w+")
    v1, v2 = Counter(w.findall(t1.lower())), Counter(w.findall(t2.lower()))
    inter = set(v1) & set(v2)
    num = sum(v1[x] * v2[x] for x in inter)
    den = math.sqrt(sum(v * v for v in v1.values())) * math.sqrt(
        sum(v * v for v in v2.values())
    )
    return float(num) / den if den else 0.0


CASES = [
    ("apple iphone 12 pro", "apple iphone 12 pro max"),
    ("hello world", "completely different text"),
    ("", "something"),
    ("", ""),
    ("a a a b", "a b b b"),
    ("Punct, marks! here?", "punct marks here"),
]


def test_bow_cosine_matches_pandas(spark):
    df = spark.createDataFrame(CASES, ["a", "b"])
    got = df.select(bow_cosine(F.col("a"), F.col("b")).alias("s")).collect()
    for (a, b), row in zip(CASES, got):
        assert abs(row["s"] - py_cosine(a, b)) < 1e-9, (a, b)


def test_token_diff(spark):
    df = spark.createDataFrame([("x y z", "y")], ["a", "b"])
    row = df.select(token_diff(F.col("a"), F.col("b")).alias("d")).collect()[0]
    assert row["d"] == ["x", "z"]


def test_hash_cross_engine(spark):
    vals = ["abc", "", "hello world", "ünïcode", "123"]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = df.select(
        "v",
        hash32(F.col("v")).alias("h32"),
        hash32(F.col("v"), 7).alias("h32s"),
        hash64(F.col("v")).alias("h64"),
    ).collect()
    con = duckdb.connect()
    for row in got:
        v = row["v"].replace("'", "''")
        d32 = con.execute(f"SELECT {duck_hash32(repr(row['v']))}").fetchone()[0]
        d32s = con.execute(f"SELECT {duck_hash32(repr(row['v']), 7)}").fetchone()[0]
        d64 = con.execute(f"SELECT {duck_hash64(repr(row['v']))}").fetchone()[0]
        assert row["h32"] == d32, v
        assert row["h32s"] == d32s, v
        assert row["h64"] == d64, v


def test_textstats_cross_engine(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "der hund und die katze sind nicht da",
        "le chat est dans la maison pour une nuit",
        "x! y? z.",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = df.select(
        "text",
        TS.token_count(F.col("text")).alias("tc"),
        TS.lang_id(F.col("text")).alias("lang"),
        TS.quality_score(F.col("text")).alias("q"),
        TS.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    con = duckdb.connect()
    for row in got:
        t = repr(row["text"])
        tc = con.execute(f"SELECT {TS.duck_token_count(t)}").fetchone()[0]
        lg = con.execute(f"SELECT {TS.duck_lang_id(t)}").fetchone()[0]
        q = con.execute(f"SELECT {TS.duck_quality_score(t)}").fetchone()[0]
        fp = con.execute(f"SELECT {TS.duck_fingerprint(t)}").fetchone()[0]
        assert row["tc"] == tc, row["text"]
        assert row["lang"] == lg, row["text"]
        assert abs(row["q"] - q) < 1e-9, row["text"]
        assert row["fp"] == fp, row["text"]


def test_pii_scrub_and_count(spark):
    from certa_spark.functions.scrub import count_pii, scrub_pii

    rows = [
        (1, "mail a.b+c@x-y.co.uk ip 192.168.0.1 tel +12345678 done"),
        (2, "no pii here, just 1.5 and 12. dots"),
        (3, "two mails a@b.io c@d.org"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {
        r["id"]: (r["n"], r["s"])
        for r in df.select(
            "id", count_pii(F.col("t")).alias("n"), scrub_pii(F.col("t")).alias("s")
        ).collect()
    }
    assert out[1] == (3, "mail [PII] ip [PII] tel [PII] done")
    assert out[2] == (0, "no pii here, just 1.5 and 12. dots")
    assert out[3] == (2, "two mails [PII] [PII]")
