"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; LSH-bucketed
(random hyperplane signs) variant as the sub-quadratic scale path.
Dot products stay JVM-side via ``zip_with``/``aggregate`` — no Python.

At cluster scale the probe set is broadcast (small side) and the corpus
scan is embarrassingly parallel; top-k per probe is a partial top-k per
partition followed by one narrow window over (probe, rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def duck_cosine(a: str, b: str) -> str:
    """DuckDB twin. NOTE: accumulation order matters for float equality;
    DuckDB's list_cosine_similarity uses a different internal order, so
    the oracle spells out the same left-to-right fold as Spark's
    ``aggregate`` with DOUBLE casts."""
    d = f"list_aggregate(list_transform(range(1, len({a}) + 1), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    na = f"sqrt(list_aggregate(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    nb = f"sqrt(list_aggregate(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    return f"(CASE WHEN {na} * {nb} = 0 THEN 0.0 ELSE ({d}) / ({na} * {nb}) END)"


def knn_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each probe over the corpus.

    ``probes`` is broadcast; ranking is a window per probe with a
    deterministic (similarity desc, id asc) order. Returns
    (probe_id, neighbor_id, rank, sim).
    """
    p = F.broadcast(
        probes.select(
            F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(p).withColumn(
        "sim", F.round(cosine(F.col("_pv"), F.col("_cv")), 6)
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "sim")
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-dot-product LSH bucket id from fixed hyperplanes."""
    out = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        out = out + F.when(dot(vec, p) > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast(
            "long"
        )
    return out


def knn_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH
    bucket (equi-join on bucket id — one shuffle instead of a full
    scan per probe). Recall depends on #planes; the scale path for
    100TB corpora. Same output schema as :func:`knn_bruteforce`."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("_bkt"),
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pv"),
        hyperplane_bucket(F.col(vec_col), planes).alias("_bkt"),
    )
    scored = c.join(F.broadcast(p), "_bkt").withColumn(
        "sim", F.round(cosine(F.col("_pv"), F.col("_cv")), 6)
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "sim")
    )
