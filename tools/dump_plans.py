"""Dump `.explain("formatted")` output per registry query to files.

Used to capture the before/after physical plans the optimization
rounds commit under plans/<round>/. Run from any checkout:

    python tools/dump_plans.py <out_dir> <suffix> [sf_dir] <query ...>

writes <out_dir>/<query>_<suffix>.txt for each named query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.001", rest
    os.makedirs(out_dir, exist_ok=True)

    from certa_spark.queries import QUERIES
    from certa_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    rc = 0
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}", flush=True)
            rc = 1
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
