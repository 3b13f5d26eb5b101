"""Connected components — cluster assignment from near-dup pairs.

Pair-finding (MinHash LSH, SimHash, embedding cosine — see
``operators/dedup.py`` / ``operators/similarity.py``) yields EDGES; a
dedup pipeline needs per-document CLUSTER IDS so it can keep one
canonical doc per cluster. That closure step is iterative min-label
propagation: every node repeatedly adopts the smallest label among
itself and its neighbors until a fixpoint — the classic distributed
connected-components scheme (each round is one hash-join + min
aggregate, so rounds = cluster diameter, which for near-dup clusters
is tiny).

Scale notes (the loop is driver-coordinated but the data never leaves
the cluster):
  * each round shuffles only (node, label) pairs — two longs — not the
    documents themselves;
  * ``repartition(n).localCheckpoint()`` per round truncates lineage,
    keeping round k's plan O(1) instead of O(k) (Catalyst re-analysis
    of an iteratively grown plan otherwise dominates wall-clock);
  * the convergence check is a count of changed labels — one cheap
    action per round, with a ``max_iter`` guard for pathological
    chains (a 100TB corpus with million-node duplicate chains would
    warrant the large-star/small-star variant; near-dup clusters in
    practice have single-digit diameter).

Reference parity note: tteofili/certa has no graph operators — this is
training-data-pipeline extension surface, built green-field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _default_partitions(df: DataFrame, partitions: int | None) -> int:
    """Shuffle width for the iterative loops: caller-pinned, else the
    cluster's ``defaultParallelism`` (a hardcoded small constant would
    serialize the shuffle on a 1000-executor cluster)."""
    if partitions is not None:
        return partitions
    return df.sparkSession.sparkContext.defaultParallelism


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    partitions: int | None = None,
) -> DataFrame:
    """Cluster nodes of an undirected graph: returns ``(node, cluster)``
    where ``cluster`` is the minimum node id reachable from ``node``.
    Nodes appearing only as edge endpoints are included; isolated nodes
    (no edges) are not — union them in as self-clusters if needed."""
    partitions = _default_partitions(edges, partitions)
    # no distinct() on the symmetrized edges: the min-aggregate below is
    # duplicate-insensitive and the dedup shuffle costs more than the
    # duplicates do
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .repartition(partitions, "b")
        .localCheckpoint()
    )

    # initial labels stay LAZY: round 1's shuffle computes them in the
    # same job, saving one materialization; from round 1 on, `labels`
    # is always a checkpointed leaf
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("cluster"))
    )

    null_long = F.lit(None).cast(labels.schema["cluster"].dataType)
    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels, sym.b == labels.node, "inner"
        ).select(F.col("a").alias("node"), "cluster", null_long.alias("old"))
        # carry each node's previous label through the same aggregate
        # (exactly one labels-side row per node => max(old) = old label),
        # so convergence detection needs no extra join: it's a
        # shuffle-free filter+count over the checkpointed result
        merged = labels.select(
            "node", "cluster", F.col("cluster").alias("old")
        ).unionByName(neighbor_labels)
        # no repartition after the agg: groupBy already leaves the frame
        # hash-partitioned by node, and an extra exchange per round
        # doubles the shuffle count
        new_labels = (
            merged.groupBy("node")
            .agg(F.min("cluster").alias("cluster"), F.max("old").alias("old"))
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("cluster") != F.col("old")).count()
        labels = new_labels.select("node", "cluster")
        if changed == 0:
            break
    return labels


def assign_clusters(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Per-node cluster ids over a full node set: nodes touched by an
    edge get their component's min id, isolated nodes cluster with
    themselves. Returns ``(node_col, cluster)``."""
    cc = connected_components(edges, src=src, dst=dst, max_iter=max_iter)
    return (
        nodes.select(F.col(node_col).alias("node"))
        .join(cc, "node", "left")
        .select(
            F.col("node").alias(node_col),
            F.coalesce("cluster", F.col("node")).alias("cluster"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    partitions: int = 8,
) -> DataFrame:
    """Fixed-iteration PageRank over a DIRECTED edge list (symmetrize
    first for undirected graphs): returns ``(node, r)``.

    Same loop discipline as :func:`connected_components`: the
    edge+out-degree table is repartitioned by source and checkpointed
    ONCE (the loop invariant), each iteration is one join + one
    groupBy(dst) aggregate + lineage truncation, and only (node, rank)
    pairs ever shuffle. Per-iteration contributions are rounded and
    routed through DECIMAL so partial-aggregation order cannot move
    the result (cross-engine reproducible — the driver query's oracle
    unrolls the same iterations as chained SQL CTEs).

    Nodes with no in-edges keep receiving only the teleport term; nodes
    with no OUT-edges (dangling) are not redistributed — callers that
    need the dangling-mass correction should add the standard
    "sum lost mass, add everywhere" term per iteration.
    """
    ed = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .repartition(partitions, "s")
        .localCheckpoint()
    )
    deg = ed.groupBy("s").agg(F.count("*").cast("double").alias("_deg"))
    ed = ed.join(deg, "s").localCheckpoint()
    nodes = (
        ed.select(F.col("s").alias("node"))
        .unionByName(ed.select(F.col("t").alias("node")))
        .distinct()
        .localCheckpoint()  # loop invariant - don't re-derive per iteration
    )
    n_nodes = nodes.count()
    inv_n = 1.0 / float(n_nodes)
    # ranks is one row per node; below ~4M nodes (~64MB of (long,
    # double) pairs) ship it broadcast so the |E|-row edge table never
    # re-shuffles per iteration — halves iteration wall time. Bigger
    # graphs fall back to the shuffled hash join (the 100TB-safe path).
    bcast = n_nodes <= 4_000_000
    # (1.0 - damping) folded in Python = the same IEEE subtraction the
    # SQL oracle performs at runtime; do NOT substitute a decimal
    # literal like 0.15 (1.0 - 0.85 != 0.15 in binary)
    teleport = F.lit(1.0 - damping) * F.lit(inv_n)
    ranks = nodes.select("node", F.lit(inv_n).alias("r"))
    for _ in range(iterations):
        contrib = F.round(F.col("r") / F.col("_deg"), 12).cast("decimal(38,18)")
        incoming = (
            ed.join(F.broadcast(ranks) if bcast else ranks, ed.s == ranks.node)
            .groupBy(F.col("t").alias("node"))
            .agg(F.sum(contrib).cast("double").alias("_in"))
        )
        ranks = (
            nodes.join(incoming, "node", "left")
            .select(
                "node",
                F.round(
                    teleport
                    + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0)),
                    12,
                ).alias("r"),
            )
            .repartition(partitions, "node")
            .localCheckpoint()
        )
    return ranks
