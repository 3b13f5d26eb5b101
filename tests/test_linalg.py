"""Covariance / PCA operator tests (operators/linalg.py)."""

import numpy as np
from pyspark.sql import functions as F


def _mat(n=40, d=5):
    # deterministic, full-rank-ish synthetic matrix
    i = np.arange(n)[:, None]
    j = np.arange(d)[None, :]
    return np.sin(i * 0.37 + j * 1.1) + 0.1 * j


def _df(spark, x):
    return spark.createDataFrame(
        [(int(k), [float(v) for v in row]) for k, row in enumerate(x)],
        "vec_id long, embedding array<float>",
    )


def test_covariance_matches_numpy(spark):
    from certa_spark.operators.linalg import covariance

    x = _mat()
    got = covariance(_df(spark, x), "embedding", x.shape[1]).collect()
    want = np.cov(x.astype(np.float32).astype(np.float64).T, bias=True)
    for r in got:
        assert abs(r["cov"] - want[r["i"], r["j"]]) < 5e-6, (r, want[r["i"], r["j"]])
    assert len(got) == x.shape[1] * (x.shape[1] + 1) // 2


def test_covariance_partition_invariant(spark):
    from certa_spark.operators.linalg import covariance

    x = _mat(60, 4)
    df = _df(spark, x)
    a = sorted(map(tuple, covariance(df, "embedding", 4).collect()))
    b = sorted(map(tuple, covariance(df.repartition(7), "embedding", 4).collect()))
    assert a == b  # exact-integer aggregation: bit-identical under any split


def test_principal_components_deterministic_sign(spark):
    from certa_spark.operators.linalg import covariance, principal_components

    x = _mat()
    rows = [
        (r["i"], r["j"], r["cov"])
        for r in covariance(_df(spark, x), "embedding", x.shape[1]).collect()
    ]
    c1 = principal_components(rows, x.shape[1], 2)
    c2 = principal_components(rows, x.shape[1], 2)
    assert c1 == c2
    # largest-|.| entry of each component is positive after the sign fix
    for w in c1:
        assert max(w, key=abs) > 0


def test_pca_project_matches_numpy(spark):
    from certa_spark.operators import linalg as LA

    x = _mat()
    df = _df(spark, x)
    rows = [
        (r["i"], r["j"], r["cov"])
        for r in LA.covariance(df, "embedding", x.shape[1]).collect()
    ]
    comps = LA.principal_components(rows, x.shape[1], 2)
    got = {r["vec_id"]: (r["pc1"], r["pc2"])
           for r in LA.pca_project(df, "embedding", "vec_id", comps).collect()}
    w = np.array(comps, dtype=np.float64) / LA.Q_W
    want = x.astype(np.float32).astype(np.float64) @ w.T
    for k, (p1, p2) in got.items():
        assert abs(p1 - want[k, 0]) < 1e-4
        assert abs(p2 - want[k, 1]) < 1e-4


def test_standardize_zero_mean_unit_std(spark):
    from certa_spark.operators.linalg import standardize

    x = _mat(50, 4)
    z = standardize(_df(spark, x), "embedding", "vec_id", 4).collect()
    cols = np.array([r["zvec"] for r in sorted(z, key=lambda r: r["vec_id"])])
    assert cols.shape == (50, 4)
    assert np.abs(cols.mean(axis=0)).max() < 1e-4
    assert np.abs(cols.std(axis=0) - 1.0).max() < 1e-4


def test_standardize_constant_dim_scores_zero(spark):
    from certa_spark.operators.linalg import standardize

    x = _mat(20, 3)
    x[:, 1] = 2.5  # zero variance
    z = standardize(_df(spark, x), "embedding", "vec_id", 3).collect()
    assert all(r["zvec"][1] == 0.0 for r in z)


def test_nearest_centroid_separable_clusters(spark):
    from certa_spark.operators.linalg import nearest_centroid_confusion

    # two well-separated clusters -> perfect diagonal
    rows = []
    for i in range(20):
        rows.append((i, [10.0 + (i % 3) * 0.1, 0.0, 0.0], 0))
        rows.append((100 + i, [0.0, 10.0 + (i % 3) * 0.1, 0.0], 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {(r["true_label"], r["pred_label"]): r["n"]
           for r in nearest_centroid_confusion(df, "embedding", "label", 3).collect()}
    assert out == {(0, 0): 20, (1, 1): 20}


def test_nearest_centroid_tie_prefers_smaller_label(spark):
    from certa_spark.operators.linalg import nearest_centroid_confusion

    # identical centroids for labels 3 and 7 -> every point ties ->
    # deterministic assignment to label 3
    rows = [(i, [1.0, 2.0], 3) for i in range(5)]
    rows += [(10 + i, [1.0, 2.0], 7) for i in range(5)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {(r["true_label"], r["pred_label"]): r["n"]
           for r in nearest_centroid_confusion(df, "embedding", "label", 2).collect()}
    assert out == {(3, 3): 5, (7, 3): 5}


def _blob_df(spark):
    # three well-separated 3-d blobs, 8 points each, values on a
    # 0.25 grid so the q=1e6 quantization is exact
    import itertools

    centers = [(0.0, 0.0, 0.0), (10.0, 10.0, 0.0), (-10.0, 5.0, 5.0)]
    rows = []
    vid = 0
    offsets = [-0.5, -0.25, 0.25, 0.5]
    for ci, (cx, cy, cz) in enumerate(centers):
        for dx, dy in itertools.product(offsets[:2], offsets[2:]):
            for rep in (0, 1):
                rows.append((vid, [cx + dx, cy + dy, cz + 0.25 * rep], ci))
                vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, blob int"
    )


def test_kmeans_recovers_separable_blobs(spark):
    from certa_spark.operators.linalg import kmeans_fit

    df = _blob_df(spark)
    cents, assign = kmeans_fit(df, "embedding", "vec_id", dim=3, k=3,
                               iterations=5)
    got = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    truth = {r["vec_id"]: r["blob"] for r in df.collect()}
    # cluster indices are arbitrary but the PARTITION must match the
    # blobs exactly
    by_cluster = {}
    for vid, c in got.items():
        by_cluster.setdefault(c, set()).add(truth[vid])
    assert len(by_cluster) == 3
    assert all(len(blobs) == 1 for blobs in by_cluster.values())


def test_kmeans_deterministic_and_partition_invariant(spark):
    from certa_spark.operators.linalg import kmeans_fit

    df = _blob_df(spark)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        c1, a1 = kmeans_fit(df, "embedding", "vec_id", dim=3, k=3)
        r1 = sorted(map(tuple, a1.collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        c2, a2 = kmeans_fit(df, "embedding", "vec_id", dim=3, k=3)
        r2 = sorted(map(tuple, a2.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert c1 == c2  # exact-integer update: no FP drift across widths
    assert r1 == r2


def test_nearest_centroid_col_equals_literal_twin(spark):
    """r10: kmeans_fit ships centroids as a broadcast DATA column
    (O(1) plan size, codegen cache hits across iterations) — the
    data-column argmin must be BIT-IDENTICAL to the literal-array
    twin, including squared-L2 ties resolving to the smaller index,
    because the sf0.01 goldens pin the old assignments."""
    from pyspark.sql import functions as F

    from certa_spark.operators.linalg import (
        _centroids_frame,
        nearest_centroid_col,
        nearest_centroid_expr,
    )

    rows = [
        (i, [float((i * 7 + j * 13) % 11) / 3.0 - 1.1 for j in range(5)])
        for i in range(60)
    ] + [
        # exact tie: equidistant from centroids 0 and 1 below
        (1000, [0.5, 0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [
        [0.0, 0.0, 0.0, 0.0, 0.0],
        [1.0, 0.0, 0.0, 0.0, 0.0],
        [0.3, -0.7, 1.2, 0.1, -0.4],
    ]
    lit = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id", nearest_centroid_expr("embedding", cents).alias("c")
        ).collect()
    }
    col = {
        r["vec_id"]: r["c"]
        for r in df.crossJoin(F.broadcast(_centroids_frame(spark, cents)))
        .select(
            "vec_id",
            nearest_centroid_col("embedding", F.col("_cents")).alias("c"),
        )
        .collect()
    }
    assert lit == col
    assert col[1000] == 0, "tie must resolve to the smaller index"


def test_kmeans_guards(spark):
    import pytest

    from certa_spark.operators.linalg import kmeans_fit

    df = _blob_df(spark)
    with pytest.raises(ValueError, match="distinct vectors"):
        kmeans_fit(df, "embedding", "vec_id", dim=3, k=1000)
    with pytest.raises(ValueError, match="positive"):
        kmeans_fit(df, "embedding", "vec_id", dim=3, k=0)


def test_semdedup_prunes_near_copies(spark):
    from certa_spark.operators.linalg import semdedup

    # two semantic regions; inside each, ids {base, base+1} are
    # near-copies (tiny angular nudge) and base+2 is genuinely distinct
    rows = []
    for base, center in ((0, [5.0, 0.0, 0.0]), (100, [0.0, 5.0, 5.0])):
        rows.append((base, center))
        rows.append((base + 1, [center[0] + 0.05, center[1] + 0.05, center[2]]))
        distinct = [center[0], center[1] + 3.0, center[2] - 2.0]
        rows.append((base + 2, distinct))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: (r["keep"], r["dup_of"])
        for r in semdedup(
            df, "embedding", "vec_id", dim=3, k=2, threshold=0.95
        ).collect()
    }
    assert out[0] == (True, None)
    assert out[1] == (False, 0)  # shadowed by the earlier kept copy
    assert out[2][0] is True
    assert out[100] == (True, None)
    assert out[101] == (False, 100)
    assert out[102][0] is True


def test_semdedup_partition_invariant(spark):
    from certa_spark.operators.linalg import semdedup

    rows = [
        (i, [float(i % 7), float((i * 3) % 5), 1.0 + 0.001 * (i % 2)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, semdedup(df, "embedding", "vec_id", dim=3, k=3).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = sorted(map(tuple, semdedup(df, "embedding", "vec_id", dim=3, k=3).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


def test_kmeans_sampled_init_equals_distributed_greedy(spark):
    """r11 init cut (verdict ask #6): the driver-side numpy greedy
    over the content-hash oversample must produce BIT-IDENTICAL
    centroids to the distributed per-pick scan. ``init_sample=1``
    reproduces the pre-r11 algorithm exactly (the first seed
    collects, the 1-row sample exhausts immediately, every remaining
    pick goes through the distributed fallback), so the two paths A/B
    against each other on the same fixture — including the near-tie
    distances the cumsum ordering note exists for. (The override is a
    kmeans_fit parameter, not a monkeypatched constant: the 8k floor
    silently widened a patched constant back to 24 rows and the A/B
    compared the sampled path against itself — r11 review finding.)"""
    from certa_spark.operators import linalg

    df = _blob_df(spark)
    c_fast, a_fast = linalg.kmeans_fit(df, "embedding", "vec_id", dim=3, k=3)
    c_slow, a_slow = linalg.kmeans_fit(
        df, "embedding", "vec_id", dim=3, k=3, init_sample=1
    )
    assert c_fast == c_slow
    assert sorted(map(tuple, a_fast.collect())) == sorted(
        map(tuple, a_slow.collect())
    )


def test_kmeans_sampled_init_fallback_on_duplicate_heavy_sample(spark):
    """If the oversample runs out of distinct vectors before k seeds,
    the remaining picks fall back to the distributed scan and still
    find seeds the sample missed; a genuinely <k-distinct corpus
    still raises."""
    import pytest

    from certa_spark.operators import linalg

    # 40 duplicate rows + 2 distinct outliers: a 3-row sample almost
    # surely holds duplicates of one vector, so k=3 needs the fallback
    rows = [(i, [0.0, 0.0, 0.0]) for i in range(40)]
    rows += [(100, [5.0, 5.0, 5.0]), (101, [-5.0, 0.0, 3.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents, assign = linalg.kmeans_fit(
        df, "embedding", "vec_id", dim=3, k=3, iterations=3, init_sample=3
    )
    assert len({tuple(c) for c in cents}) == 3
    got = {r["vec_id"]: r["cluster"] for r in assign.collect()}
    assert got[100] != got[0] and got[101] != got[0] and got[100] != got[101]
    # degenerate corpus: 2 distinct vectors, k=3 -> the fallback owns
    # the loud failure
    dup = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="distinct"):
        linalg.kmeans_fit(dup, "embedding", "vec_id", dim=3, k=3)


def test_kmeans_rejects_non_finite_vectors(spark):
    """A NaN embedding component must fail loudly at init (r11
    review: it would otherwise empty the argmax tie set — NaN != NaN
    — and crash with an unintelligible min() error)."""
    import pytest

    from certa_spark.operators import linalg

    df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [float("nan"), 1.0, 0.0]),
         (2, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="non-finite"):
        linalg.kmeans_fit(df, "embedding", "vec_id", dim=3, k=2)
