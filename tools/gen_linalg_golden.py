"""Capture sf0.01 goldens for the linalg registry queries
(`embedding_kmeans`, `doc_semdedup`) as DuckDB VALUES blocks.

Every stage of both queries is deterministic by construction
(content-hash seeding, farthest-point init, exact integer-grid
centroid sums, ascending-id greedy sweep), so a captured golden is a
real partition-invariance gate, not a snapshot of noise. Re-run when
linalg.kmeans_fit / linalg.semdedup or the sf0.01 fixture change and
paste the printed blocks over `_Q_EMBEDDING_KMEANS_GOLDEN_SQL` /
`_Q_DOC_SEMDEDUP_GOLDEN_SQL` in certa_spark/queries.py.
"""

import sys

sys.path.insert(0, "/root/repo")

from certa_spark.session import get_spark  # noqa: E402


def _lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    return repr(v)


def main() -> None:
    from certa_spark import queries as Q

    spark = get_spark()
    sf = "/root/testdata/sf0.01"

    km = Q.q_embedding_kmeans(spark, sf).collect()
    print('_Q_EMBEDDING_KMEANS_GOLDEN_SQL = """')
    print(
        "    SELECT CAST(cluster AS INT) AS cluster,"
        " CAST(n AS BIGINT) AS n,"
    )
    print(
        "           CAST(c_norm AS DOUBLE) AS c_norm,"
        " CAST(c_mean AS DOUBLE) AS c_mean"
    )
    print("    FROM (VALUES")
    rows = [
        f"        ({r['cluster']}, {r['n']}, "
        f"{_lit(r['c_norm'])}, {_lit(r['c_mean'])})"
        for r in sorted(km, key=lambda r: r["cluster"])
    ]
    print(",\n".join(rows))
    print("    ) AS t(cluster, n, c_norm, c_mean)")
    print('"""')
    print()

    sd = Q.q_doc_semdedup(spark, sf).collect()
    print('_Q_DOC_SEMDEDUP_GOLDEN_SQL = """')
    print(
        "    SELECT CAST(vec_id AS BIGINT) AS vec_id,"
        " CAST(cluster AS INT) AS cluster,"
    )
    print("           CAST(dup_of AS BIGINT) AS dup_of")
    print("    FROM (VALUES")
    rows = [
        f"        ({r['vec_id']}, {r['cluster']}, {_lit(r['dup_of'])})"
        for r in sorted(sd, key=lambda r: r["vec_id"])
    ]
    print(",\n".join(rows))
    print("    ) AS t(vec_id, cluster, dup_of)")
    print('"""')


if __name__ == "__main__":
    main()
