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


# F17 number/ID path (models/ditto/knowledge.py:91-105). The reference
# walks spaCy tokens and rewrites
#   * like_num tokens parseable as float: '%d' if integral else '%.2f'
#   * len>=7 tokens containing a digit: prefix 'ID '
# Everything spaCy's like_num accepts but float() rejects ("ten",
# "1,000") falls through unchanged in the reference (the except arm),
# which is exactly what a non-match of _DK_NUM_RE does here — except
# digit-grouped numbers >=7 chars ("1,234,567"), which the reference
# leaves alone via like_num but would hit our ID arm; _DK_GROUPED_RE
# reproduces the reference's pass-through for those.
_DK_NUM_RE = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)$"
_DK_GROUPED_RE = r"^[+-]?[0-9]{1,3}(,[0-9]{3})+(\.[0-9]+)?$"
_LONG_MAX = float(2**63 - 1)


def dk_number_normalize(col: Column) -> Column:
    """F17 (number path) — Ditto domain-knowledge number rewrite as a
    pure Column expression (knowledge.py:91-105, sans spaCy):
    whitespace-tokenize, print integral numerics as '%d' and fractional
    ones as '%.2f', tag long digit-bearing tokens with 'ID ', rejoin.
    Runs in whole-stage codegen; no Python in the loop.

    Known tie divergence (documented, not exercised by any fixture):
    Java's ``%.2f`` rounds HALF_UP on the exact binary value while
    C/Python/DuckDB printf round half-even, so the four fractional
    parts exactly representable in binary with a tie at 2 decimals
    (.125/.375/.625/.875) format one ULP apart — '0.125' renders
    '0.13' here vs '0.12' in the reference. Non-tie values agree
    because both formatters see the same exact binary value."""

    def one(t: Column) -> Column:
        d = t.cast("double")
        in_long = (d >= -_LONG_MAX) & (d <= _LONG_MAX)
        return (
            F.when(t.rlike(_DK_GROUPED_RE), t)
            .when(
                t.rlike(_DK_NUM_RE) & d.isNotNull() & in_long,
                F.when(
                    d == F.floor(d), d.cast("long").cast("string")
                ).otherwise(F.format_string("%.2f", d)),
            )
            .when(
                (F.length(t) >= 7) & t.rlike("[0-9]"),
                F.concat(F.lit("ID "), t),
            )
            .otherwise(t)
        )

    toks = F.array_remove(F.split(col.cast("string"), r"\s+"), "")
    return F.array_join(F.transform(toks, one), " ")


def ner_normalize(df: DataFrame, cols: list[str], ner: bool = False) -> DataFrame:
    """F17 — Ditto domain-knowledge injection
    (models/ditto/knowledge.py:53-160). The number-normalization /
    ID-tagging half runs JVM-side via :func:`dk_number_normalize`.
    The NER entity-marker half (PRODUCT/NUM prefixes from a spaCy
    model) stays behind ``ner=True``: spaCy is not installed in this
    environment; the contract is a mapInPandas over ``cols`` with an
    executor-cached pipeline emitting the same start-index markers."""
    if ner:
        try:
            import spacy  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "ner=True requires spaCy (not installed); "
                "plumbing contract: mapInPandas(batch -> batch with "
                "NER-tagged text), executor-cached nlp pipeline"
            ) from e
    out = df
    for c in cols:
        out = out.withColumn(c, dk_number_normalize(F.col(c)))
    return out
