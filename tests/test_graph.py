"""Connected components: components, chains, singletons, convergence."""

from certa_spark.operators.graph import assign_clusters, connected_components


def _clusters(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["cluster"] for r in connected_components(df, **kw).collect()
    }


def test_two_components(spark):
    got = _clusters(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_diameter(spark):
    # a path graph needs diameter rounds of propagation — exercises the
    # iteration + convergence logic, not just one-hop neighborhoods
    got = _clusters(spark, [(i, i + 1) for i in range(1, 8)])
    assert set(got.values()) == {1} and len(got) == 8


def test_direction_irrelevant(spark):
    assert _clusters(spark, [(5, 2), (2, 9)]) == {2: 2, 5: 2, 9: 2}


def test_assign_clusters_includes_singletons(spark):
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 99)], "doc_id long")
    edges = spark.createDataFrame([(2, 3)], "src long, dst long")
    got = {
        r["doc_id"]: r["cluster"]
        for r in assign_clusters(nodes, edges, "doc_id").collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 99: 99}
