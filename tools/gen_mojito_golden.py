"""Regenerate the mojito_token_saliency golden oracle.

The saliency pipeline is deterministic end-to-end (md5-derived mask
bits, fixed seed, NativeCosineMatcher, ridge solve), so its sf0.01
output can serve as a literal VALUES oracle for the driver's
correctness gate. Re-run this after changing _er_sources, the matcher,
or the mojito operator, and paste the output over
_Q_MOJITO_GOLDEN_SQL in certa_spark/queries.py.

Usage: python tools/gen_mojito_golden.py [--shap] [sf_dir]
(--shap captures the shap_token_saliency golden instead.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--shap"]
    shap = "--shap" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from certa_spark.session import get_spark
    from certa_spark.queries import q_mojito_token_saliency, q_shap_token_saliency

    spark = get_spark("gen-mojito-golden")
    fn = q_shap_token_saliency if shap else q_mojito_token_saliency
    rows = fn(spark, sf_dir).collect()
    vals = ",\n        ".join(
        f"('{r['side']}', '{r['attr']}', '{r['token']}', {r['weight']!r})"
        for r in rows
    )
    print(f'_Q_{"SHAP" if shap else "MOJITO"}_GOLDEN_SQL = """')
    print("    SELECT side, attr, token, CAST(weight AS DOUBLE) AS weight")
    print("    FROM (VALUES")
    print(f"        {vals}")
    print("    ) AS t(side, attr, token, weight)")
    print('"""')


if __name__ == "__main__":
    main()
