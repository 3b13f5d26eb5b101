"""Partitioning-invariance property: the registry's determinism claims
(content-hash sampling, arithmetic ids, segmented scans, decimal-routed
aggregates) must hold under ANY shuffle-partition count — the property
that makes results reproducible when a 100TB cluster re-plans.

Runs a hash of each query's sorted output at two very different
shuffle-partition settings and asserts equality. Queries chosen for
having the most partitioning-sensitive machinery (windows over salted
blocks, weighted-sample ranking, LSH band joins, segmented cumsums,
connected components)."""

import hashlib

import pytest

SF = "/root/testdata/sf0.001"

QUERIES_UNDER_TEST = [
    "doc_weighted_sample",
    "doc_pack_assign_salted",
    "events_sessionized_salted",
    "minhash_incremental",
    "neardup_keep_best",
    "augment_variants",
    "part_pagerank",
    # round 3: the exact-global-rank path (range partitioner + local
    # monotonic ids + offset map) is the most partitioning-sensitive
    # machinery in the repo; budget fill is a per-stratum running
    # cumsum; dangling pagerank adds a broadcast lost-mass scalar;
    # triangles ride the chunked pair build + degree orientation
    "er_sorted_neighborhood",
    "doc_token_budget_mix",
    "part_pagerank_dangling",
    "part_triangles",
    "doc_bigram_lm",  # DECIMAL-routed log-prob sums
    # late round 3: integer-grid linear algebra must be exact under any
    # partitioning (decimal moment sums); span-dedup rides grouped
    # in-row pair expansion + island windows; BPE merges are a
    # driver-coordinated loop whose top-pair pick must not depend on
    # the shuffle; the funnel/sequence ops ride chained windows
    "embedding_covariance",
    "embedding_standardize",
    "doc_span_dedup",
    "doc_bpe_merges",
    "events_funnel",
    "events_session_sequences",
    "events_sliding_hll",
    # analytics/graph additions: PMI rides the non-distinct pair
    # stream; centroid eval folds broadcast literals; personalized
    # pagerank adds the seed-conditional teleport to the PR loop
    "part_pmi",
    "embedding_centroid_eval",
    "part_pagerank_personalized",
    # final batch: pareto/gini ride the range-partitioned global rank
    # (the most partitioning-sensitive primitive); zipf routes
    # regression sums through DECIMAL; kcore is a convergence loop
    "orders_pareto",
    "orders_gini",
    "doc_zipf_slope",
    "part_kcore",
    # round 4: LS/SS rewrites the edge set itself — its fixpoint (and
    # the convergence signature) must not depend on shuffle width; the
    # weighted pagerank normalizes by a window sum; the quantile gate
    # rides grouped sketches whose merge order changes with partitions
    "neardup_clusters_lsss",
    "part_pagerank_weighted",
    "events_quantile_approx_gate",
    # round 7: the streaming gates must not depend on shuffle width
    # (the MG summary CONTENT may, but the recounted top-N and the
    # complete-mode session result must not); betweenness rides the
    # pivot-batched BFS with quantize-before-aggregate; louvain's
    # hybrid local-finish must equal itself under any width
    "events_stream_heavy_hitters",
    "events_stream_sessionized",
    "events_stream_funnel",
    "events_stream_zscore",
    "part_betweenness",
    "part_louvain",
]


def _out_hash(df) -> str:
    rows = sorted(
        "\x01".join("NULL" if v is None else f"{v:.6f}" if isinstance(v, float) else str(v) for v in r)
        for r in df.collect()
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_output_is_partitioning_invariant(spark, name):
    from certa_spark.queries import QUERIES

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        h3 = _out_hash(QUERIES[name](spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        h29 = _out_hash(QUERIES[name](spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert h3 == h29, name
