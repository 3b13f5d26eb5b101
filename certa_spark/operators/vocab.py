"""BPE-style merge induction over a document corpus.

Learns the most frequent adjacent token pairs and merges them into
single vocabulary units, iteratively — the corpus-level mechanic of
byte-pair encoding / word2phrase collocation mining, applied at the
word level (the granularity that makes sense for a Spark corpus pass;
char-level BPE inside words is a per-record kernel, not a join).

Per iteration (driver-coordinated loop, like PageRank):
  1. bigram counts: one explode + map-side-combined groupBy — the only
     shuffle, carrying (pair, partial_count) rows;
  2. top pair chosen with a total deterministic order
     (count DESC, pair ASC) — cross-engine reproducible;
  3. corpus rewrite: one regexp_replace pass. Left-to-right
     non-overlapping greedy merge falls out of regex scan semantics;
     to keep it lookahead-free (RE2-compatible for the DuckDB oracle)
     adjacent tokens are temporarily double-spaced so consecutive
     matches never compete for a shared delimiter.

At 100 TB one would amortize the scan by learning the top-B
independent (non-chaining) pairs per pass instead of one — the
single-pair loop keeps exact classic-BPE semantics for parity; B>1 is
a flag away (`pairs_per_iter`), merging only pairs whose tokens don't
overlap the higher-ranked picks of the same round.

No counterpart in the reference (tteofili/certa has no corpus/vocab
operators) — training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from certa_spark.functions.textstats import words
from certa_spark.operators import widen_if_narrow


def _bigram_counts(df: DataFrame, tok_col: str) -> DataFrame:
    w = F.split(F.col(tok_col), " ")
    m = F.size(w) - 1
    pairs = F.when(
        m >= 1,
        F.zip_with(
            F.slice(w, 1, m), F.slice(w, 2, m),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )
    return (
        df.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
    )


def merge_pair(t: Column, a: str, b: str) -> Column:
    """Merge every left-to-right non-overlapping occurrence of adjacent
    tokens ``a b`` in a single-space-joined token string into ``a_b``.
    Tokens must be \\w+ (regex-safe) — true for the words() tokenizer."""
    doubled = F.concat(F.lit(" "), F.regexp_replace(t, " ", "  "), F.lit(" "))
    merged = F.regexp_replace(doubled, f" {a}  {b} ", f" {a}_{b} ")
    return F.trim(F.regexp_replace(merged, " +", " "))


def learn_merges(
    docs: DataFrame,
    text_col: str = "text",
    iters: int = 3,
) -> tuple[list[tuple[int, str, int]], DataFrame]:
    """Run ``iters`` merge rounds. Returns (merge table rows
    [(iter, pair, count)], rewritten corpus DataFrame with column
    ``t``). The corpus frame is re-derived lazily from the merge list —
    one scan per learned merge when finally executed."""
    # spread the corpus across the cluster once: a small parquet source
    # arrives as a single input split, and every round's bigram-count
    # scan (plus the chained regexp rewrites it re-derives) would run
    # inside one map task (r8 measurement: the same single-split trap
    # cost duplicated_runs 4.7s at sf0.1). Gated on the actual split
    # count (r8 ADVICE low #1) so an at-scale source skips the
    # full-corpus exchange.
    cur = widen_if_narrow(docs).select(
        F.col("doc_id"), F.array_join(words(F.col(text_col)), " ").alias("t")
    )
    merges: list[tuple[int, str, int]] = []
    for it in range(1, iters + 1):
        top = (
            _bigram_counts(cur, "t")
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, n = top[0]["pair"], top[0]["n"]
        merges.append((it, pair, int(n)))
        a, b = pair.split(" ")
        cur = cur.select("doc_id", merge_pair(F.col("t"), a, b).alias("t"))
    return merges, cur


def duck_learn_merges_sql(
    table: str = "documents",
    text_col: str = "text",
    iters: int = 3,
) -> str:
    """Unrolled DuckDB oracle: per round, the top pair is a scalar
    subquery feeding a dynamic regexp_replace — byte-identical merge
    semantics (RE2 leftmost non-overlapping, no lookahead)."""
    from certa_spark.functions.textstats import duck_words

    ctes = [
        f"d0 AS (SELECT doc_id, array_to_string({duck_words(text_col)}, ' ')"
        f" AS t FROM {table})"
    ]
    selects = []
    for it in range(1, iters + 1):
        prev = f"d{it - 1}"
        ctes.append(
            f"""p{it} AS (
        SELECT w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1] AS pair,
               CAST(count(*) AS BIGINT) AS n
        FROM (SELECT string_split(t, ' ') AS w FROM {prev}),
             UNNEST(range(1, len(w))) AS u(i)
        GROUP BY 1
    )"""
        )
        ctes.append(
            f"m{it} AS (SELECT pair, n FROM p{it} ORDER BY n DESC, pair ASC"
            f" LIMIT 1)"
        )
        pat = (
            f"(SELECT ' ' || split_part(pair, ' ', 1) || '  ' ||"
            f" split_part(pair, ' ', 2) || ' ' FROM m{it})"
        )
        rep = f"(SELECT ' ' || replace(pair, ' ', '_') || ' ' FROM m{it})"
        ctes.append(
            f"""d{it} AS (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(
                   ' ' || replace(t, ' ', '  ') || ' ', {pat}, {rep}, 'g'),
                   ' +', ' ', 'g')) AS t
        FROM {prev}
    )"""
        )
        selects.append(
            f"SELECT CAST({it} AS BIGINT) AS iter, pair, n FROM m{it}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


# A fixed 20-merge BPE table over [a-z] words (rank order; every
# merge's operands are base characters or products of EARLIER merges
# — the well-formedness that makes sequential global application
# below equal true lowest-rank-first BPE). Production pipelines load
# this from a trained merges.txt; the table is model DATA, shared
# verbatim with the DuckDB twin like _ANN_PLANES.
BPE_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("o", "u"), ("i", "s"), ("i", "t"),
    ("a", "l"), ("in", "g"), ("s", "t"), ("a", "r"), ("l", "e"),
]


def bpe_encode(word: Column, merges: list[tuple[str, str]] | None = None) -> Column:
    """BPE-encode a ``[a-z]+`` word into its token array by applying
    ``merges`` in rank order.

    Encoding rides a doubled-separator string: tokens joined by
    ``||`` with ``||`` at both ends, so applying merge (x, y) is ONE
    literal (non-regex) replace of ``|x||y|`` with ``|xy|`` — the
    shared inner pipes keep consecutive occurrences matchable, giving
    exactly BPE's leftmost non-overlapping semantics ('aaa' + (a,a)
    -> [aa, a]), and both engines' replace() scans left-to-right.
    Sequential global application equals true lowest-rank-first BPE
    for any well-formed table: a merge consuming token xy can only
    appear AFTER the merge that creates xy, so later merges never
    enable earlier ones.

    The whole chain is one codegen'd projection of M string replaces
    — no join, no shuffle, no Python. Encode DISTINCT words once and
    join token counts back (the word-cache shape every production
    tokenizer pipeline uses): cost is O(distinct words x M), not
    O(corpus tokens x M).
    """
    ms = BPE_MERGES if merges is None else merges
    s = F.concat(F.lit("||"), F.regexp_replace(word, r"(.)", r"$1||"))
    for x, y in ms:
        s = F.replace(s, F.lit(f"|{x}||{y}|"), F.lit(f"|{x}{y}|"))
    return F.filter(F.split(s, r"\|\|"), lambda t: t != F.lit(""))


def duck_bpe_encode(expr: str, merges: list[tuple[str, str]] | None = None) -> str:
    """DuckDB twin of :func:`bpe_encode` — same doubled-separator
    string, same literal replace chain, same trailing-empty filter."""
    ms = BPE_MERGES if merges is None else merges
    s = f"'||' || regexp_replace({expr}, '(.)', '\\1||', 'g')"
    for x, y in ms:
        s = f"replace({s}, '|{x}||{y}|', '|{x}{y}|')"
    return f"list_filter(string_split({s}, '||'), t -> t <> '')"
