"""Behavioral invariants for the late-round analytics operators."""

from pyspark.sql import functions as F


def test_gini_bounds(spark):
    """Equal values -> 0; extreme concentration -> near 1."""
    from certa_spark.operators.blocking import global_rank

    def gini(vals):
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(vals)], "k long, mon double"
        )
        ranked = global_rank(df, ["mon", "k"])
        s = ranked.agg(
            F.count("*").alias("n"),
            F.sum("mon").alias("sx"),
            F.sum(F.col("rank") * F.col("mon")).alias("six"),
        ).collect()[0]
        n, sx, six = s["n"], s["sx"], s["six"]
        return 2.0 * six / (n * sx) - (n + 1.0) / n

    assert abs(gini([5.0] * 20)) < 1e-9
    assert gini([0.000001] * 19 + [1000.0]) > 0.9


def test_kcore_input_order_invariant(spark):
    """Peeling is confluent: shuffled/reversed edge input gives the
    identical core."""
    from certa_spark.operators.graph import kcore

    edges = [(i, j) for i in range(1, 8) for j in range(i + 1, 8)]  # K7
    edges += [(7, 8), (8, 9), (9, 10)]  # tail
    e1 = spark.createDataFrame(edges, "src long, dst long")
    e2 = spark.createDataFrame(
        [(b, a) for a, b in reversed(edges)], "src long, dst long"
    ).repartition(5)
    a = sorted(map(tuple, kcore(e1, k=6).collect()))
    b = sorted(map(tuple, kcore(e2, k=6).collect()))
    assert a == b
    assert {n for n, _ in a} == set(range(1, 8))


def test_markov_rows_are_distributions(spark):
    from certa_spark.queries import q_events_markov_transitions

    out = q_events_markov_transitions(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_cur = {}
    for r in out:
        by_cur.setdefault(r["cur"], 0.0)
        by_cur[r["cur"]] += r["p"]
        assert 0.0 <= r["p"] <= 1.0
    for cur, total in by_cur.items():
        assert abs(total - 1.0) < 1e-3, (cur, total)


def test_pareto_shares_monotone(spark):
    from certa_spark.queries import q_orders_pareto

    rows = sorted(
        q_orders_pareto(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["top_pct"],
    )
    shares = [r["revenue_share"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(shares, shares[1:]))
    assert 0.0 < shares[0] <= shares[-1] <= 1.0
    # concentration: the top 1% must hold more than 1% of revenue
    assert shares[0] > 0.01


def test_snapshot_diff_vs_upsert_consistency(spark):
    """Deriving a changelog from two snapshots and replaying it as an
    upsert reproduces the new snapshot (round-trip property)."""
    from certa_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k long, v string"
    )
    d = snapshot_diff(old, new, ["k"], ["v"])
    # replay: start from old, drop removed, apply changed+added from new
    keep = old.join(
        d.filter(F.col("change_type").isin("removed", "changed")).select("k"),
        "k",
        "left_anti",
    )
    applied = keep.unionByName(
        new.join(
            d.filter(F.col("change_type").isin("added", "changed")).select("k"),
            "k",
        )
    )
    assert sorted(map(tuple, applied.collect())) == sorted(
        map(tuple, new.collect())
    )
