"""Plan audit: build every registry query and grep its physical plan
for scale red flags. Complements per-query spot checks in PLANS.md
with systematic evidence.

Flags:
  CARTESIAN  — CartesianProduct (a non-broadcast cross join: quadratic
               shuffle at scale; broadcast-scalar cross joins plan as
               BroadcastNestedLoopJoin and are fine)
  SINGLEPART — Exchange SinglePartition (a global funnel; benign only
               on post-limit or scalar frames)
  PY-ROW     — BatchEvalPython (row-at-a-time Python UDF — the slow
               path; Arrow ops plan as ArrowEvalPython/MapInPandas)

Usage: python tools/audit_plans.py [sf_dir] [query ...]
Exit code 1 if any query shows CARTESIAN or PY-ROW (SINGLEPART is
reported but non-fatal: several queries legitimately funnel <=50-row
frames).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGS = {
    "CARTESIAN": "CartesianProduct",
    "SINGLEPART": "Exchange SinglePartition",
    "PY-ROW": "BatchEvalPython",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from certa_spark.queries import QUERIES
    from certa_spark.session import get_spark

    spark = get_spark(app_name="plan-audit")
    fatal = []
    warned = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            fatal.append(name)
            print(f"ERROR {name}: {str(e)[:200]}")
            continue
        hits = [tag for tag, needle in FLAGS.items() if needle in plan]
        # a global scalar aggregate's FINAL stage is inherently a
        # 1-partition exchange — but it moves only one partial row per
        # upstream partition. Classify those as benign: the exchange's
        # child (the next plan line) is the partial-side HashAggregate/
        # SortAggregate.
        if "SINGLEPART" in hits:
            lines = plan.splitlines()
            real = False
            for i, ln in enumerate(lines):
                if "Exchange SinglePartition" not in ln:
                    continue
                child = lines[i + 1] if i + 1 < len(lines) else ""
                if "Aggregate" not in child:
                    real = True
            if not real:
                hits.remove("SINGLEPART")
        if "CARTESIAN" in hits or "PY-ROW" in hits:
            fatal.append(name)
            print(f"FATAL {name}: {hits}")
        elif hits:
            warned.append(name)
            print(f"warn  {name}: {hits}")
        else:
            print(f"ok    {name}")
    print(
        f"\n{len(fatal)} fatal, {len(warned)} warnings"
        + (f"; fatal: {fatal}" if fatal else "")
        + (f"; warnings: {warned}" if warned else "")
    )
    spark.stop()
    return 1 if fatal else 0


if __name__ == "__main__":
    sys.exit(main())
