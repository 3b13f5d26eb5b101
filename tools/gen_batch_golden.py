"""Capture the flagship_batch_saliency golden (sf0.01 VALUES oracle).

Deterministic end-to-end; re-run after changing _er_sources, the
matcher, or the support/explain pipeline, and paste over
_Q_FLAGSHIP_BATCH_GOLDEN_SQL in certa_spark/queries.py.

Usage: python tools/gen_batch_golden.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from certa_spark.queries import q_flagship_batch_saliency
    from certa_spark.session import get_spark

    spark = get_spark("gen-batch-golden")
    rows = q_flagship_batch_saliency(spark, sf_dir).collect()
    vals = ",\n        ".join(
        f"({r['instance']}, '{r['attr']}', {r['saliency']!r})" for r in rows
    )
    print('_Q_FLAGSHIP_BATCH_GOLDEN_SQL = """')
    print("    SELECT instance, attr, CAST(saliency AS DOUBLE) AS saliency")
    print("    FROM (VALUES")
    print(f"        {vals}")
    print("    ) AS t(instance, attr, saliency)")
    print('"""')


if __name__ == "__main__":
    main()
