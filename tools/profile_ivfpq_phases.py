"""Phase breakdown of the ADC family at a given SF (perf-work scratch
tool, r11 session 4): times each subtree of knn_ivfpq_adc / knn_pq_adc
to the noop sink so the expensive phase is identified before any
rewrite (guide §1.4). Paired min-of-N; ambient sentinel printed."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    data_root = os.environ.get("SPARK_GRAFT_DATA_ROOT", "/root/testdata")
    sf_dir = os.path.join(data_root, sf)

    from pyspark.sql import SparkSession, functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("profile_ivfpq_phases")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    bench._warm_session(spark)
    print(f"sentinel={bench.calibration_sentinel(spark, runs=2):.3f}")

    from certa_spark.operators import similarity as S
    from certa_spark.queries import (
        _IVF_NPROBE,
        _PQ_K,
        _ivfpq_seed,
        _t,
    )

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cent, codebooks = _ivfpq_seed(e)
    probes = e.filter(F.col("vec_id") % 101 == 0)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    n_codes = len(codebooks[0])
    ncell = len(cent)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(label, make):
        best = None
        for _ in range(runs):
            t0 = time.time()
            noop(make())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label:28s} min={best:6.2f}s")

    centlit = F.lit([[float(x) for x in c] for c in cent])
    cblit = F.lit(
        [[list(map(float, code)) for code in book] for book in codebooks]
    )

    def cell_assign():
        cv = e.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("_v"),
        )
        celld = F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(ncell - 1)),
                lambda c: F.struct(
                    S._d2(F.col("_v"), F.element_at(centlit, c + 1)).alias(
                        "d"
                    ),
                    c.alias("cell"),
                ),
            )
        )
        return cv.select("neighbor_id", "_v", celld["cell"].alias("cell"))

    timed("cell assign (map)", cell_assign)

    def codes_subtree():
        cv = cell_assign()

        def residual(vec, cell):
            return F.zip_with(
                vec, F.element_at(centlit, cell + 1), lambda x, c: x - c
            )

        def sub_slices(res):
            return F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice(res, s * dsub + 1, dsub).alias("subv"),
                    )
                    for s in range(m)
                ]
            )

        sv = cv.select(
            "neighbor_id",
            "cell",
            F.explode(
                sub_slices(residual(F.col("_v"), F.col("cell")))
            ).alias("_sv"),
        ).select(
            "neighbor_id",
            "cell",
            F.col("_sv.sub").alias("sub"),
            F.col("_sv.subv").alias("subv"),
        )
        best = F.array_min(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_codes - 1)),
                lambda c: F.struct(
                    S._d2(
                        F.col("subv"),
                        F.element_at(
                            F.element_at(cblit, F.col("sub") + 1), c + 1
                        ),
                    ).alias("d"),
                    c.alias("code"),
                ),
            )
        )
        return sv.select(
            "neighbor_id", "cell", "sub", best["code"].alias("code")
        )

    timed("corpus encode (codes)", codes_subtree)

    def full_adc():
        return S.knn_ivfpq_adc(
            e, probes, cent, codebooks, k=_PQ_K, nprobe=_IVF_NPROBE
        )

    timed("full knn_ivfpq_adc", full_adc)

    def full_pq():
        cbv = [
            list(r["embedding"])
            for r in e.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
        ]
        cb2 = [[vec[s * 8 : (s + 1) * 8] for vec in cbv] for s in range(8)]
        return S.knn_pq_adc(e, probes, cb2, k=_PQ_K)

    timed("full knn_pq_adc", full_pq)
    print(f"sentinel={bench.calibration_sentinel(spark, runs=2):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
