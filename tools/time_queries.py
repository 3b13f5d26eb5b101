"""Time individual registry queries at a given SF — the iteration
loop for performance work, mirroring bench.py's measurement discipline
(warmed session, min-of-N to full materialization) without the
160-query sweep.

Usage: python tools/time_queries.py [--sf sf0.1] [--runs 3] query ...

The data root defaults to $SPARK_GRAFT_DATA_ROOT (falling back to
/root/testdata) so the tool isn't machine-specific; unknown query
names print near-miss suggestions instead of a bare KeyError
(ADVICE r8 low #5).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf = "sf0.1"
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] in ("--sf", "--runs"):
            if i + 1 >= len(args):
                print(f"{args[i]} needs a value", file=sys.stderr)
                return 2
            if args[i] == "--sf":
                sf = args[i + 1]
            else:
                try:
                    runs = int(args[i + 1])
                except ValueError:
                    print(f"--runs needs an integer, got {args[i + 1]!r}",
                          file=sys.stderr)
                    return 2
            i += 2
        else:
            names.append(args[i])
            i += 1
    if runs < 1 or not names:
        print("usage: time_queries.py [--sf sfX] [--runs N>=1] query ...",
              file=sys.stderr)
        return 2
    data_root = os.environ.get("SPARK_GRAFT_DATA_ROOT", "/root/testdata")
    sf_dir = sf if os.path.isabs(sf) else os.path.join(data_root, sf)

    # validate names BEFORE paying session startup
    import difflib

    from certa_spark.queries import QUERIES

    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        for n in unknown:
            near = difflib.get_close_matches(n, QUERIES, n=5, cutoff=0.5)
            hint = f" — did you mean: {', '.join(near)}?" if near else ""
            print(f"unknown query {n!r}{hint}", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("time_queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    bench._warm_session(spark)
    cal = bench.calibration_sentinel(spark, runs=2)
    print(f"calibration_sec={cal:.3f}", flush=True)

    for name in names:
        fn = QUERIES[name]
        best, all_runs = None, []
        for _ in range(runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.time() - t0
            all_runs.append(round(dt, 2))
            best = dt if best is None else min(best, dt)
        print(
            f"{name:35s} min={best:6.2f}s rows={n} runs={all_runs}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
