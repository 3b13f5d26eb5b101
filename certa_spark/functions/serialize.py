"""Record serialization formats used by the reference model wrappers.

  F15 — Ditto COL/VAL serialization (models/ditto/matcher.py:37-70)
  F18 — L0_/R1_ token side-markup for LIME-style baselines
        (models/dm.py:89-96,117-176, baselines/mojito.py:106-135)
  F17 — NER/number normalization (models/ditto/knowledge.py) is a
        spaCy-bound step: stubbed behind an import guard.

All encoders are pure Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from certa_spark.schema import LPREFIX, RPREFIX


def colval_serialize(df: DataFrame, prefix: str) -> Column:
    """F15 — ``COL <name> VAL <value> `` per attribute of one side."""
    cols = [c for c in df.columns if c.startswith(prefix) and c != prefix + "id"]
    parts = []
    for c in cols:
        parts.append(
            F.concat(
                F.lit(f"COL {c[len(prefix):]} VAL "),
                F.coalesce(F.col(c).cast("string"), F.lit("")),
                F.lit(" "),
            )
        )
    return F.concat(*parts)


def colval_pair(df: DataFrame, lprefix: str = LPREFIX, rprefix: str = RPREFIX) -> Column:
    """Tab-joined serialized pair (Ditto input line)."""
    return F.concat_ws(
        "\t", colval_serialize(df, lprefix), colval_serialize(df, rprefix)
    )


def mark_tokens(col: Column, side: str, attr_idx: int) -> Column:
    """F18 encode — prefix each token with side+attr marker, e.g.
    ``L0_widget R1_gadget``."""
    marker = f"{side}{attr_idx}_"
    return F.array_join(
        F.transform(
            F.array_remove(F.split(col.cast("string"), r"\s+"), ""),
            lambda t: F.concat(F.lit(marker), t),
        ),
        " ",
    )


def unmark_tokens(col: Column) -> Column:
    """F18 decode — strip ``L<i>_``/``R<i>_`` markers."""
    return F.regexp_replace(col, r"\b[LR]\d+_", "")


def ner_normalize(df: DataFrame, cols: list[str]):
    """F17 — spaCy NER + number-normalization domain-knowledge injection
    (models/ditto/knowledge.py:53-160). spaCy is not available in this
    environment; the Spark plumbing would be a mapInPandas over ``cols``
    with an executor-cached pipeline."""
    try:
        import spacy  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "ner_normalize requires spaCy (not installed); "
            "plumbing contract: mapInPandas(batch -> batch with NER-tagged "
            "text), executor-cached nlp pipeline"
        ) from e
