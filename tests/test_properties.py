"""Property-based invariants (hypothesis) for the behavioral operators.

Few examples + tiny frames: each example pays Spark job latency, so
the value is in the generated edge cases (ties, empty steps, all-dup
snapshots), not in volume.
"""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EV = st.lists(
    st.tuples(
        st.integers(1, 4),                 # user
        st.sampled_from(["A", "B", "C"]),  # type
        st.integers(0, 500),               # minutes offset
    ),
    min_size=1,
    max_size=25,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=_EV)
@_SETTINGS
def test_funnel_counts_monotone(spark, rows):
    from certa_spark.operators.funnel import funnel_steps

    ev = [
        (u, i, t, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m))
        for i, (u, t, m) in enumerate(rows)
    ]
    e = spark.createDataFrame(
        ev, "user_id long, event_id long, event_type string, ts timestamp"
    )
    out = {r["step"]: r["users"] for r in funnel_steps(e, ["A", "B", "C"]).collect()}
    assert out[1] >= out[2] >= out[3]
    # step-1 count is exactly the distinct users with an A event
    want = len({u for (u, t, m) in rows if t == "A"})
    assert out[1] == want


@given(
    old_keys=st.sets(st.integers(0, 12), max_size=8),
    new_keys=st.sets(st.integers(0, 12), max_size=8),
    flips=st.sets(st.integers(0, 12), max_size=6),
)
@_SETTINGS
def test_snapshot_diff_partitions_key_space(spark, old_keys, new_keys, flips):
    from certa_spark.operators.diff import snapshot_diff

    if not old_keys and not new_keys:
        return
    old = spark.createDataFrame(
        [(k, float(k)) for k in old_keys] or [(None, None)],
        "k long, v double",
    ).filter("k IS NOT NULL")
    new = spark.createDataFrame(
        [(k, float(k) + (1.0 if k in flips else 0.0)) for k in new_keys]
        or [(None, None)],
        "k long, v double",
    ).filter("k IS NOT NULL")
    d = snapshot_diff(old, new, ["k"], ["v"]).collect()
    # every key classified exactly once; classes partition the key space
    assert len(d) == len(old_keys | new_keys)
    by_type = {}
    for r in d:
        by_type.setdefault(r["change_type"], set()).add(r["k"])
    assert by_type.get("added", set()) == new_keys - old_keys
    assert by_type.get("removed", set()) == old_keys - new_keys
    assert by_type.get("changed", set()) == (old_keys & new_keys) & flips
    assert by_type.get("unchanged", set()) == (old_keys & new_keys) - flips


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 18), st.integers(0, 18)),
        min_size=0,
        max_size=24,
    )
)
@_SETTINGS
def test_lsss_equals_propagation_on_random_graphs(spark, edges):
    """Large-star/small-star and min-label propagation must compute the
    identical (node, cluster) labeling on ANY graph — including
    self-loops, duplicate edges, and disconnected scatter (the shapes
    hypothesis finds that hand fixtures miss)."""
    from certa_spark.operators.graph import (
        connected_components,
        connected_components_lsss,
    )

    clean = [(a, b) for a, b in edges if a != b]
    if not clean:
        return
    e = spark.createDataFrame(clean, "src long, dst long")
    plain = sorted(map(tuple, connected_components(e, max_iter=40).collect()))
    lsss = sorted(map(tuple, connected_components_lsss(e, max_iter=15).collect()))
    assert plain == lsss


@given(
    xs=st.sets(st.integers(0, 400), min_size=1, max_size=60),
    ys=st.sets(st.integers(0, 400), min_size=1, max_size=60),
)
@_SETTINGS
def test_kmv_merge_is_lossless_union(spark, xs, ys):
    """kmv_merge(sketch(A), sketch(B)) must equal sketch(A ∪ B) built
    in one pass — the mergeability contract that makes partial
    sketches from any partitioning combine losslessly. Below k both
    are the exact distinct hash set, so equality is total."""
    from pyspark.sql import functions as F

    from certa_spark.operators.sketch import kmv_merge, kmv_sketch

    k = 16
    a = spark.createDataFrame([("s", int(v)) for v in xs], "g string, v long")
    b = spark.createDataFrame([("s", int(v)) for v in ys], "g string, v long")
    u = a.unionByName(b)
    ska = kmv_sketch(a, ["g"], "v", k=k).withColumnRenamed("sketch", "sa")
    skb = kmv_sketch(b, ["g"], "v", k=k).withColumnRenamed("sketch", "sb")
    merged = (
        ska.join(skb, "g")
        .select(kmv_merge(F.col("sa"), F.col("sb"), k).alias("m"))
        .first()["m"]
    )
    single = kmv_sketch(u, ["g"], "v", k=k).first()["sketch"]
    assert list(merged) == list(single)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=3,
        max_size=30,
    )
)
@_SETTINGS
def test_ktruss_is_a_fixpoint_with_valid_support(spark, edges):
    """On any graph: every surviving edge's reported support must be
    >= k-2 when recounted IN the surviving subgraph, and running the
    peel again on the output changes nothing (fixpoint/idempotence —
    the property that makes the confluence claim testable)."""
    from certa_spark.operators.graph import ktruss

    from pyspark.sql import functions as F

    clean = [(a, b) for a, b in edges if a != b]
    if not clean:
        return
    e = spark.createDataFrame(clean, "src long, dst long")
    out = ktruss(e, k=3)
    rows = sorted((r["a"], r["b"], r["support"]) for r in out.collect())
    assert all(s >= 1 for _, _, s in rows)
    if rows:
        again = ktruss(
            out.select(F.col("a").alias("src"), F.col("b").alias("dst")), k=3
        )
        assert sorted((r["a"], r["b"], r["support"]) for r in again.collect()) == rows


_MG_STREAM = st.lists(
    st.one_of(
        st.sampled_from(["hotA", "hotB"]),          # recurring heavies
        st.integers(0, 400).map(lambda i: f"t{i}"),  # long tail
    ),
    min_size=1,
    max_size=120,
)


@given(items=_MG_STREAM, k=st.sampled_from([4, 8, 16]))
@_SETTINGS
def test_misra_gries_bound_holds_under_any_stream(spark, items, k):
    """MG invariants on arbitrary streams and partitionings:
    |summary| <= k, never an overcount, undercount <= n/(k+1), and
    every item with freq > n/(k+1) is present."""
    from collections import Counter

    from certa_spark.operators.sketch import misra_gries

    df = spark.createDataFrame([(v,) for v in items], "v string")
    n = len(items)
    true = Counter(items)
    for parts in (1, 5):
        got = {
            r["item"]: r["c"]
            for r in misra_gries(df.repartition(parts), "v", k=k).collect()
        }
        assert len(got) <= k
        slack = n / (k + 1)
        for item, c in got.items():
            assert c <= true[item]
        for item, cnt in true.items():
            assert got.get(item, 0) >= cnt - slack
            if cnt > slack:
                assert item in got


_LOUVAIN_EDGES = st.sets(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).map(
        lambda t: (min(t), max(t))
    ),
    min_size=1,
    max_size=16,
).map(lambda s: [(a, b) for a, b in s if a != b])


@given(edges=_LOUVAIN_EDGES)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_louvain_monotone_and_partition_invariant(spark, edges):
    """On random small graphs: accepted-round Q history is strictly
    increasing, the final Q matches the independent float scorer on
    the original graph, and the assignment is partition-invariant."""
    from hypothesis import assume

    from certa_spark.operators.graph import louvain, modularity

    assume(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    out, hist = louvain(
        df, max_rounds=4, max_levels=2, partitions=4, with_history=True
    )
    assert all(b > a for a, b in zip(hist, hist[1:]))
    comm = out.withColumnRenamed("community", "cluster")
    assert abs(hist[-1] - modularity(df, comm)) < 1e-9
    out2 = louvain(
        df.repartition(5), max_rounds=4, max_levels=2, partitions=4
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, out2.collect())
    )


_PSL_HOST = st.tuples(
    st.lists(st.sampled_from(["a", "bb", "sub", "x9"]), max_size=2),
    st.sampled_from(
        ["com", "co.uk", "ck", "kawasaki.jp", "com.au", "example.com"]
    ),
).map(lambda t: ".".join(t[0] + [t[1]]))


@given(host=_PSL_HOST)
@_SETTINGS
def test_registrable_domain_psl_is_idempotent_and_suffix(spark, host):
    """For any host: the registrable domain is null or a suffix of the
    host, and re-deriving the registrable domain of a registrable
    domain is a fixpoint (a registered name registers itself)."""
    from pyspark.sql import functions as F

    from certa_spark.functions.url import registrable_domain_psl

    df = spark.createDataFrame([(f"https://{host}/x",)], "u string")
    got = registrable_domain_psl(df, "u", out_col="d").collect()[0]["d"]
    if got is None:
        return
    assert host.endswith(got)
    df2 = spark.createDataFrame([(f"https://{got}/x",)], "u string")
    again = registrable_domain_psl(df2, "u", out_col="d").collect()[0]["d"]
    assert again == got


_EDGES = st.lists(
    st.tuples(st.integers(0, 18), st.integers(0, 18)),
    min_size=0,
    max_size=60,
)


@given(edges=_EDGES, k=st.integers(2, 5))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_local_finish_equivalence_random_graphs(spark, edges, k):
    # the bounded local-finish twins must equal the distributed loops
    # on arbitrary small graphs — self-loops, duplicate edges, empty
    # sets, and disconnected pieces included (hypothesis shrinks to
    # the failing topology if any divergence exists)
    from certa_spark.operators.graph import (
        connected_components,
        kcore,
        ktruss,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    for op, kw in (
        (connected_components, {}),
        (kcore, {"k": k}),
        (ktruss, {"k": k}),
    ):
        dist = op(df, partitions=4, **kw)
        loc = op(df, partitions=4, local_finish_edges=10**6, **kw)
        assert sorted(map(tuple, dist.collect())) == sorted(
            map(tuple, loc.collect())
        ), (op.__name__, k)
