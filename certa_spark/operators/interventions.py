"""LENS-style exhaustive interventions + sufficiency/necessity degrees
(SURVEY.md §2.11; reference baselines/lens.py — intervention_order:17,
create_CF:54, deg_nec_suff:398).

The reference loops 2^k interventions per reference record in Python
and computes degrees with pandas masks. Spark-first shape:

  * the feature powerset is a broadcast literal array (k = #attrs is
    small), one `explode` materializes every (ref, subset) intervention
    record — a narrow stage, same machinery as the triangle
    perturbations (UD5);
  * degrees are one partial+final hash aggregation keyed by the
    intervention set: deg_suff(S) = P(F(x)=F(inp) | X_S = inp_S)  (r2i)
    and deg_nec(S) = P(F(x)≠F(inp) | X_S = ref_S)  (i2r).

No external explainability library is needed — unlike the LIME/SHAP
baseline wrappers, LENS is pure dataflow.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from certa_spark.functions.litfast import array_lit


def _powerset_literal(attrs: list[str]) -> Column:
    # one py4j round trip for the whole 2^k literal (litfast) — the
    # splat form paid one round trip per attr name per subset
    subs = [
        list(c) for k in range(len(attrs) + 1) for c in combinations(attrs, k)
    ]
    return array_lit(subs, empty_as="cast(array() as array<string>)")


def intervention_frame(
    inp: dict,
    refs: DataFrame,
    attrs: list[str],
    r2i: bool = True,
    id_col: str = "id",
) -> DataFrame:
    """All 2^k intervention records for every reference row.

    r2i (ref-to-input): base = reference record, attrs in the
    intervention set are assigned the INPUT's value (create_CF,
    lens.py:72-76). i2r: base = input, intervened attrs take the
    reference's value. ``intervention_set`` is the canonical sorted
    attr array; the input record enters the plan as literals.
    """
    exploded = refs.select(
        F.col(id_col).alias("ref_id"),
        *[F.col(a).cast("string").alias("_ref_" + a) for a in attrs],
    ).withColumn("intervention_set", F.explode(_powerset_literal(attrs)))
    vals = []
    for a in attrs:
        inp_v = F.lit(None if inp.get(a) is None else str(inp[a]))
        ref_v = F.col("_ref_" + a)
        in_set = F.array_contains(F.col("intervention_set"), a)
        if r2i:
            vals.append(F.when(in_set, inp_v).otherwise(ref_v).alias(a))
        else:
            vals.append(F.when(in_set, ref_v).otherwise(inp_v).alias(a))
    return exploded.select(
        "ref_id",
        F.array_sort("intervention_set").alias("intervention_set"),
        *vals,
    )


def degrees(
    scored: DataFrame,
    f_inp: int,
    r2i: bool = True,
    pred_col: str = "pred",
) -> DataFrame:
    """Sufficiency (r2i) / necessity (i2r) degree per intervention set
    (deg_nec_suff, lens.py:398-477): the empirical probability that the
    model output agrees (r2i) / disagrees (i2r) with F(inp) given the
    intervention. Returns (intervention_set string key, cardinality,
    degree, n)."""
    if r2i:
        agree = (F.col(pred_col) == f_inp).cast("double")
    else:
        agree = (F.col(pred_col) != f_inp).cast("double")
    return (
        scored.groupBy(
            F.array_join("intervention_set", "/").alias("intervention_set"),
            F.size("intervention_set").alias("cardinality"),
        )
        .agg(
            F.round(F.avg(agree), 6).alias("degree"),
            F.count("*").cast("long").alias("n"),
        )
    )
