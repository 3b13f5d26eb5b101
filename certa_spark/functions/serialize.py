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

    Rounding: fractional values route through ``bround(d, 2)``
    (HALF_EVEN) before formatting, because Java's bare ``%.2f`` rounds
    HALF_UP while the reference's Python ``%.2f`` and DuckDB's printf
    round half-even — the exact-binary tie class (fractional parts
    .125/.375/.625/.875) renders '0.12' on all three engines
    (tie-fixture-tested). Remaining documented sliver: literals whose
    SHORTEST repr is a 2-decimal tie but whose binary value is not
    (e.g. '2.675', binary 2.67499…) — bround decides on the shortest
    repr (→2.68) while printf decides on the binary value (→2.67).
    Closing that needs exact binary-vs-decimal comparison, which no
    Column-expression path provides; no realistic catalog token hits
    it and no fixture exercises it."""

    toks = F.array_remove(F.split(col.cast("string"), r"\s+"), "")
    return F.array_join(F.transform(toks, _dk_norm_token), " ")


def _dk_norm_token(t: Column) -> Column:
    """Per-token number/ID rewrite shared by :func:`dk_number_normalize`
    and :func:`dk_ner_tag` (knowledge.py:91-103)."""
    d = t.cast("double")
    in_long = (d >= -_LONG_MAX) & (d <= _LONG_MAX)
    return (
        F.when(t.rlike(_DK_GROUPED_RE), t)
        .when(
            t.rlike(_DK_NUM_RE) & d.isNotNull() & in_long,
            F.when(
                d == F.floor(d), d.cast("long").cast("string")
            ).otherwise(F.format_string("%.2f", F.bround(d, 2))),
        )
        .when(
            (F.length(t) >= 7) & t.rlike("[0-9]"),
            F.concat(F.lit("ID "), t),
        )
        .otherwise(t)
    )


# Deterministic entity recognizer for the F17 NER half
# (knowledge.py:77-90): the reference asks spaCy for entity spans and
# prepends 'PRODUCT '/'NUM ' at each span START (its end_indices dict is
# populated but never emitted — knowledge.py:88-90 writes start markers
# only, and so do we). spaCy is replaced by a deterministic recognizer:
#   * PRODUCT — maximal runs of dictionary tokens (brand/product vocab,
#     case-insensitive); one marker per run start, like a multi-token
#     spaCy ent gets one marker;
#   * NUM — money / percent / date shaped tokens (the MONEY, PERCENT,
#     DATE ent classes), one marker each.
_DEFAULT_PRODUCT_VOCAB: tuple[str, ...] = (
    "promo", "economy", "standard", "small", "medium", "large",
    "anodized", "burnished", "plated", "polished", "brushed",
)
_DK_MONEY_RE = r"^[+-]?\$[0-9][0-9,.]*$"
_DK_PERCENT_RE = r"^[+-]?[0-9][0-9,.]*%$"
_DK_DATE_RE = (
    r"^([0-9]{4}-[0-9]{2}-[0-9]{2}|[0-9]{1,2}/[0-9]{1,2}/[0-9]{2,4})$"
)


def dk_ner_tag(
    col: Column,
    product_vocab: tuple[str, ...] = _DEFAULT_PRODUCT_VOCAB,
) -> Column:
    """F17 (entity half) — ProductDKInjector.transform
    (knowledge.py:60-104) with the deterministic recognizer above, as a
    pure Column expression: tokenize, prepend ``PRODUCT `` at each
    dictionary-run start and ``NUM `` before money/percent/date tokens,
    then apply the same per-token number normalization as
    :func:`dk_number_normalize`, rejoin. Whole-stage codegen; the
    prev-token lookback rides the transform index (no self-join)."""
    vocab = [v.lower() for v in product_vocab]
    toks = F.array_remove(F.split(col.cast("string"), r"\s+"), "")

    def is_prod(t: Column) -> Column:
        return F.lower(t).isin(*vocab)

    def is_num_ent(t: Column) -> Column:
        return (
            t.rlike(_DK_MONEY_RE)
            | t.rlike(_DK_PERCENT_RE)
            | t.rlike(_DK_DATE_RE)
        )

    def piece(t: Column, i: Column) -> Column:
        # element_at is 1-based, i is 0-based: element_at(toks, i) IS
        # the previous token; the when() guards the i == 0 edge
        prev_prod = F.when(
            i > 0, is_prod(F.element_at(toks, i))
        ).otherwise(F.lit(False))
        marker = (
            F.when(is_prod(t) & ~prev_prod, F.lit("PRODUCT "))
            .when(is_num_ent(t), F.lit("NUM "))
            .otherwise(F.lit(""))
        )
        return F.concat(marker, _dk_norm_token(t))

    return F.array_join(F.transform(toks, piece), " ")


def ner_normalize(
    df: DataFrame,
    cols: list[str],
    ner: bool | str = False,
    product_vocab: tuple[str, ...] = _DEFAULT_PRODUCT_VOCAB,
) -> DataFrame:
    """F17 — Ditto domain-knowledge injection
    (models/ditto/knowledge.py:53-160). ``ner=False`` runs the
    number-normalization / ID-tagging half only
    (:func:`dk_number_normalize`); ``ner=True`` adds the deterministic
    PRODUCT/NUM entity markers (:func:`dk_ner_tag`). ``ner='spacy'``
    keeps the original model-backed seam: spaCy is not installed in
    this environment; the contract is a mapInPandas over ``cols`` with
    an executor-cached pipeline emitting the same start-index
    markers."""
    if ner == "spacy":
        try:
            import spacy  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "ner='spacy' requires spaCy (not installed); "
                "plumbing contract: mapInPandas(batch -> batch with "
                "NER-tagged text), executor-cached nlp pipeline"
            ) from e
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            dk_ner_tag(F.col(c), product_vocab)
            if ner
            else dk_number_normalize(F.col(c)),
        )
    return out
