"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count + column names + order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --tri [query ...]   # all 3 SFs
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_hash(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(
        "\x01".join(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--tri":
        # tri-scale mode: same process, three sequential sweeps — the
        # cross-scale gate that caught the histogram rounding tie, the
        # jaccard blocking-cast divergence, and the k-core unroll depth
        rc = 0
        for sf in ("sf0.001", "sf0.01", "sf0.1"):
            print(f"=== {sf} ===", flush=True)
            rc |= run_sweep(f"/root/testdata/{sf}", set(sys.argv[2:]))
        return rc
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    return run_sweep(sf_dir, only)


def run_sweep(sf_dir: str, only: set) -> int:

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    from certa_spark.session import get_spark

    spark = get_spark(app_name="correctness")

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows={len(sdf)}) [{t_spark:.1f}s]")
            continue
        # golden-VALUES oracles are captured at sf0.01; at any other
        # scale a mismatch is guaranteed and meaningless — skip instead
        from certa_spark.queries import GOLDEN_SF001

        if name in GOLDEN_SF001 and os.path.basename(
            sf_dir.rstrip("/")
        ) != "sf0.01":
            print(f"SKIP  {name}: golden oracle is sf0.01-only (rows={len(sdf)})")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        sn, sc, sh = frame_hash(sdf)
        on, oc, oh = frame_hash(odf)
        if (sn, sc, sh) == (on, oc, oh):
            print(f"PASS  {name}: rows={sn} hash={sh} [{t_spark:.1f}s]")
        else:
            failures.append(name)
            print(f"FAIL  {name}: spark(rows={sn},cols={sc},h={sh}) vs oracle(rows={on},cols={oc},h={oh})")
            if sc == oc and sn and on:
                s_sorted = sdf[sorted(sdf.columns)].applymap(norm_cell)
                o_sorted = odf[sorted(odf.columns)].applymap(norm_cell)
                s_rows = set(map(tuple, s_sorted.values))
                o_rows = set(map(tuple, o_sorted.values))
                extra = list(s_rows - o_rows)[:3]
                missing = list(o_rows - s_rows)[:3]
                if extra:
                    print(f"      spark-only rows: {extra}")
                if missing:
                    print(f"      oracle-only rows: {missing}")
    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
