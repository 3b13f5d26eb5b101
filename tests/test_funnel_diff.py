"""Funnel / cohort-retention / snapshot-diff operator tests."""

import datetime as dt

from pyspark.sql import functions as F


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_funnel_strict_order_and_horizon(spark):
    from certa_spark.operators.funnel import funnel_steps

    rows = [
        # u1 completes A->B->C in order
        (1, "A", _ts(1)), (1, "B", _ts(2)), (1, "C", _ts(3)),
        # u2 does B before A: B after A missing -> stops at A
        (2, "B", _ts(1)), (2, "A", _ts(2)),
        # u3 completes A->B but C exceeds the 48h horizon after B
        (3, "A", _ts(1)), (3, "B", _ts(2)), (3, "C", _ts(10)),
        # u4 never does A
        (4, "B", _ts(1)), (4, "C", _ts(2)),
    ]
    e = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {
        r["event_type"]: r["users"]
        for r in funnel_steps(e, ["A", "B", "C"], horizon_hours=48).collect()
    }
    assert out == {"A": 3, "B": 2, "C": 1}


def test_funnel_reentry_uses_earliest_qualifying(spark):
    from certa_spark.operators.funnel import funnel_steps

    # B happens twice; only the one after A qualifies
    rows = [(1, "A", _ts(5)), (1, "B", _ts(1)), (1, "B", _ts(6))]
    e = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = funnel_steps(e, ["A", "B"]).collect()
    by_step = {r["step"]: r for r in out}
    assert by_step[2]["users"] == 1
    assert by_step[2]["pct_of_first"] == 1.0


def test_cohort_retention_buckets(spark):
    from certa_spark.operators.funnel import cohort_retention

    rows = [
        (1, _ts(2)),   # cohort day 1 (bucket [1..7]), active offset 0
        (1, _ts(9)),   # offset 1
        (1, _ts(9, 5)),  # same bucket, deduped
        (2, _ts(8)),   # cohort day 8, offset 0
    ]
    e = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        (str(r["cohort_day"]), r["offset"]): r["users"]
        for r in cohort_retention(e, bucket_days=7).collect()
    }
    assert out == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }


def test_snapshot_diff_classification(spark):
    from certa_spark.operators.diff import diff_summary, snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, None)],
        ["k", "price", "tag"],
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 25.0, "z"), (4, 40.0, "c")],
        ["k", "price", "tag"],
    )
    d = snapshot_diff(old, new, ["k"], ["price", "tag"])
    by_key = {r["k"]: r for r in d.collect()}
    assert by_key[1]["change_type"] == "unchanged"
    assert by_key[2]["change_type"] == "changed"
    assert by_key[2]["changed_cols"] == ["price", "tag"]
    assert by_key[3]["change_type"] == "removed"
    assert by_key[4]["change_type"] == "added"

    s = {
        (r["change_type"], r["changed_col"]): r["n"]
        for r in diff_summary(d).collect()
    }
    assert s[("changed", None)] == 1
    assert s[("changed", "price")] == 1
    assert s[("added", None)] == 1
    assert s[("removed", None)] == 1


def test_snapshot_diff_null_safe(spark):
    from certa_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, None)], "k long, v string")
    r = snapshot_diff(old, new, ["k"], ["v"]).collect()[0]
    assert r["change_type"] == "unchanged"


def test_session_sequences_respects_gaps(spark):
    from certa_spark.operators.funnel import session_sequences

    ns = 1_000_000_000
    rows = [
        # one session: A B C D -> trigrams A>B>C, B>C>D
        (1, 1, "A", 0 * ns), (1, 2, "B", 60 * ns),
        (1, 3, "C", 120 * ns), (1, 4, "D", 180 * ns),
        # gap > 30min splits: no trigram spans it
        (2, 5, "A", 0 * ns), (2, 6, "B", 60 * ns),
        (2, 7, "C", 10_000 * ns),
    ]
    e = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_ns long"
    )
    out = {r["seq"]: r["n"] for r in session_sequences(e, n=3, top=10).collect()}
    assert out == {"A>B>C": 1, "B>C>D": 1}


def test_session_sequences_top_order_deterministic(spark):
    from certa_spark.operators.funnel import session_sequences

    ns = 1_000_000_000
    rows = []
    eid = 0
    for u, kinds in [(1, "ABAB"), (2, "ABAB"), (3, "XYXY")]:
        for i, t in enumerate(kinds):
            rows.append((u, eid, t, i * 60 * ns))
            eid += 1
    e = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_ns long"
    )
    got = session_sequences(e, n=2, top=2).collect()
    # A>B appears 4x; ties below broken by seq ASC
    assert (got[0]["seq"], got[0]["n"]) == ("A>B", 4)
    assert (got[1]["seq"], got[1]["n"]) == ("B>A", 2)


def test_funnel_user_times_complete_only(spark):
    from certa_spark.operators.funnel import funnel_user_times

    rows = [
        (1, "A", _ts(1)), (1, "B", _ts(2)), (1, "C", _ts(3)),
        (2, "A", _ts(1)), (2, "B", _ts(2)),   # never reaches C
    ]
    e = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = funnel_user_times(e, ["A", "B", "C"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["u"] == 1
    assert r["t_1"] < r["t_2"] < r["t_3"]


def test_shingle_novelty_bounds(spark):
    from certa_spark.operators.dedup import shingle_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),       # shares "a b c"-region with doc 2
            (2, "a b c d x"),
            (3, "p q r s t"),       # fully unique
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in shingle_novelty(docs, n=3).collect()}
    assert out[3]["novelty"] == 1.0 and out[3]["n_shared"] == 0
    # docs 1/2 share shingles "a b c" and "b c d" -> 2 of 3 shared
    for d in (1, 2):
        assert out[d]["n_shingles"] == 3
        assert out[d]["n_shared"] == 2
        assert abs(out[d]["novelty"] - (1 / 3)) < 1e-6
