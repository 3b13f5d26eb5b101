"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, fingerprinting.

Green-field extensions beyond the reference (north-star scope): each
function returns a pure Column expression (JVM-side, codegen) and has a
``duck_*`` twin that emits the bit-identical DuckDB SQL used by the
correctness oracle. Keeping both in one module is what guarantees the
Spark plan and the oracle can never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = r"[a-z]+"

# compact stopword lists for the n-gram/stopword language-ID heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "pas", "une", "dans", "pour"],
    "es": ["el", "la", "que", "de", "en", "los", "es", "una", "por", "con"],
    "it": ["il", "la", "che", "di", "non", "una", "per", "con", "del", "sono"],
}


def words(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), 0)


def token_count(text: Column) -> Column:
    """Whitespace-ish token count (BPE-approximating regex variant is
    ``size(regexp_extract_all(text, r"\\w+|[^\\w\\s]"))``)."""
    return F.size(words(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Counts word + punctuation tokens — a cheap proxy for BPE size."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"\w+|[^\w\s]"), 0)
    ).cast("long")


def stopword_hits(text: Column, lang: str) -> Column:
    """Occurrences (with duplicates) of ``lang``'s stopwords in text."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words(text), lambda x: F.array_contains(sw, x))).cast("long")


def lang_id(text: Column) -> Column:
    """Argmax of stopword hit counts; 'und' (undetermined) when all 0.

    Ties break in STOPWORDS key order (en > de > fr > es > it) —
    mirrored exactly in :func:`duck_lang_id`.
    """
    langs = list(STOPWORDS)
    hits = [stopword_hits(text, lg) for lg in langs]
    best = F.greatest(*hits)
    expr = F.lit("und")
    for lg, h in reversed(list(zip(langs, hits))):
        expr = F.when((best > 0) & (h == best), F.lit(lg)).otherwise(expr)
    return expr


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def mean_word_len(text: Column) -> Column:
    w = words(text)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(w) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.size(w).cast("double")
    )


def quality_score(text: Column) -> Column:
    """Heuristic doc quality in [0,1]: rewards stopword presence and
    multi-token docs, penalizes punctuation soup and degenerate word
    lengths. Deterministic arithmetic only (oracle-parity)."""
    sw = sum(
        (stopword_hits(text, lg) for lg in STOPWORDS), start=F.lit(0)
    ).cast("double")
    n_tok = token_count(text).cast("double")
    sw_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(sw / n_tok)
    mwl = mean_word_len(text)
    len_ok = F.when((mwl >= 3.0) & (mwl <= 8.0), F.lit(1.0)).otherwise(F.lit(0.5))
    tok_ok = F.when(n_tok >= 10, F.lit(1.0)).otherwise(n_tok / F.lit(10.0))
    pr = punct_ratio(text)
    return F.round(
        (F.least(sw_ratio * 2.0, F.lit(1.0)) * 0.4 + len_ok * 0.3 + tok_ok * 0.3)
        * (F.lit(1.0) - F.least(pr * 2.0, F.lit(1.0)) * 0.5),
        6,
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: 60-bit hash of the normalized text
    (lowercase, collapsed whitespace-ish word sequence)."""
    from certa_spark.functions.hashing import hash64

    return hash64(F.array_join(words(text), " "))


def word_bigrams(words_col: str) -> Column:
    """Adjacent word pairs of an array<string> column (by NAME) as
    ``"a b"`` strings — Gopher-style repetition scoring input.
    JVM-side ``transform`` over an index sequence; caller must guard
    ``size >= 2`` (Spark's ``sequence(0,-1)`` counts DOWN, it is not
    empty)."""
    w = words_col
    return F.expr(
        f"transform(sequence(0, size({w}) - 2), i -> {w}[i] || ' ' || {w}[i+1])"
    )


# ---------------------------------------------------------------- DuckDB twins

def duck_words(expr: str) -> str:
    return f"regexp_extract_all(lower({expr}), '{WORD_RE}')"


def duck_token_count(expr: str) -> str:
    return f"CAST(len({duck_words(expr)}) AS BIGINT)"


def duck_bpe_ish_token_count(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '\\w+|[^\\w\\s]')) AS BIGINT)"


def _duck_sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


def duck_stopword_hits(expr: str, lang: str) -> str:
    return (
        f"CAST(len(list_filter({duck_words(expr)}, "
        f"x -> list_contains({_duck_sw_list(lang)}, x))) AS BIGINT)"
    )


def duck_lang_id(expr: str) -> str:
    langs = list(STOPWORDS)
    hits = {lg: duck_stopword_hits(expr, lg) for lg in langs}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    out = "'und'"
    for lg in reversed(langs):
        out = (
            f"CASE WHEN ({best}) > 0 AND {hits[lg]} = ({best}) "
            f"THEN '{lg}' ELSE {out} END"
        )
    return out


def duck_punct_ratio(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) = 0 THEN 0.0 ELSE "
        f"CAST(length(regexp_replace({expr}, '[^.,;:!?''\"()\\[\\]-]', '', 'g')) AS DOUBLE)"
        f" / length({expr}) END"
    )


def duck_mean_word_len(expr: str) -> str:
    w = duck_words(expr)
    return (
        f"CASE WHEN len({w}) = 0 THEN 0.0 ELSE "
        f"CAST(list_aggregate(list_transform({w}, x -> length(x)), 'sum') AS DOUBLE)"
        f" / len({w}) END"
    )


def duck_quality_score(expr: str) -> str:
    sw = "(" + " + ".join(duck_stopword_hits(expr, lg) for lg in STOPWORDS) + ")"
    n_tok = duck_token_count(expr)
    sw_ratio = f"(CASE WHEN {n_tok} = 0 THEN 0.0 ELSE CAST({sw} AS DOUBLE) / {n_tok} END)"
    mwl = duck_mean_word_len(expr)
    len_ok = f"(CASE WHEN {mwl} >= 3.0 AND {mwl} <= 8.0 THEN 1.0 ELSE 0.5 END)"
    tok_ok = f"(CASE WHEN {n_tok} >= 10 THEN 1.0 ELSE {n_tok} / 10.0 END)"
    pr = duck_punct_ratio(expr)
    return (
        f"round((least({sw_ratio} * 2.0, 1.0) * 0.4 + {len_ok} * 0.3 + {tok_ok} * 0.3)"
        f" * (1.0 - least({pr} * 2.0, 1.0) * 0.5), 6)"
    )


def duck_fingerprint(expr: str) -> str:
    from certa_spark.functions.hashing import duck_hash64

    # DuckDB's array_to_string([]) is NULL (Spark's array_join is '')
    return duck_hash64(f"coalesce(array_to_string({duck_words(expr)}, ' '), '')")
