"""Mojito — LIME-style token-masking explanation, natively
(SURVEY.md §2.11; reference baselines/mojito.py:12-213).

The reference delegates to the `lime` package (absent here). LIME over
text is, concretely: (1) draw N random token masks of the record pair,
(2) score each masked copy with the model, (3) fit a locally-weighted
ridge regression of score on mask bits; the coefficients are the
token saliencies. All three steps are re-expressed without the
library:

  * mask generation + masked-text construction run Spark-side as one
    `spark.range(n_samples)` + deterministic md5-derived Bernoulli bits
    per (sample, token) — fully reproducible, no RNG state;
  * scoring is the engine's Matcher (one distributed pass);
  * the (N x T) regression solve is driver-side numpy on the collected
    mask/score matrix — N and T are LIME-sized (hundreds), never data-
    sized, per SURVEY §2.11's "LIME itself stays driver-side".

Token->attribute attribution uses the F18 side+attr markup convention
(functions/serialize.py) instead of string prefixes in cell values.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from certa_spark.functions.hashing import hash32
from certa_spark.matching import Matcher
from certa_spark.schema import LPREFIX, RPREFIX


def _tokens(record: dict, prefix: str) -> list[tuple[str, str, str]]:
    """(marked_name, attr, token) per token, F18-style ordering."""
    out = []
    for i, (attr, val) in enumerate(
        (k, v) for k, v in record.items() if k not in ("id", "label")
    ):
        for tok in str(val).split():
            out.append((f"{prefix}{i}_{len(out)}", attr, tok))
    return out


def token_mask_samples(
    spark: SparkSession,
    l_record: dict,
    r_record: dict,
    n_samples: int = 256,
    seed: int = 42,
    lprefix: str = LPREFIX,
    rprefix: str = RPREFIX,
    mask_sides: tuple[str, ...] = ("l", "r"),
    empty_sample_id: int | None = None,
) -> tuple[DataFrame, list[tuple[str, str, str]]]:
    """N masked copies of the pair as one distributed select.

    Returns (samples, token_index): ``samples`` has the pair's attribute
    columns rebuilt from kept tokens plus ``_mask`` (array<int> of keep
    bits, one per token across both sides) and ``_sample_id``; row 0 is
    the unmasked original (LIME convention), and ``empty_sample_id``
    (KernelSHAP needs f(∅) as its base value) pins that row all-masked.
    Bits are md5-derived from (seed, sample, token) — deterministic,
    executor-side, no RNG state.
    """
    l_toks = _tokens(l_record, "L") if "l" in mask_sides else []
    r_toks = _tokens(r_record, "R") if "r" in mask_sides else []
    all_toks = [("l", *t) for t in l_toks] + [("r", *t) for t in r_toks]

    base = spark.range(n_samples).select(F.col("id").alias("_sample_id"))
    empty = (
        F.col("_sample_id") == empty_sample_id
        if empty_sample_id is not None
        else F.lit(False)
    )
    keep_bits = [
        F.when(empty, F.lit(0))
        .when(
            (F.col("_sample_id") == 0)
            | (hash32(F.concat_ws(":", F.lit(seed), F.col("_sample_id"), F.lit(j))) % 2 == 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        for j in range(len(all_toks))
    ]
    masked = base.select(
        "_sample_id", F.array(*keep_bits).alias("_mask")
    )

    def side_cols(record: dict, prefix: str, offset: int, toks):
        cols = []
        j = offset
        grouped: dict[str, list[int]] = {}
        tok_vals: dict[int, str] = {}
        for _, attr, tok in toks:
            grouped.setdefault(attr, []).append(j)
            tok_vals[j] = tok
            j += 1
        for attr, val in ((k, v) for k, v in record.items() if k not in ("id", "label")):
            idxs = grouped.get(attr, [])
            pieces = [
                F.when(F.element_at("_mask", i + 1) == 1, F.lit(tok_vals[i])).otherwise(
                    F.lit(None)
                )
                for i in idxs
            ]
            col = (
                F.concat_ws(" ", *pieces) if pieces else F.lit(str(val))
            )
            cols.append(col.alias(prefix + attr))
        cols.append(F.lit(str(record.get("id", 0))).alias(prefix + "id"))
        return cols

    return (
        masked.select(
            "_sample_id",
            "_mask",
            *side_cols(l_record, lprefix, 0, l_toks),
            *side_cols(r_record, rprefix, len(l_toks), r_toks),
        ),
        all_toks,
    )


def explain_pair(
    spark: SparkSession,
    l_record: dict,
    r_record: dict,
    matcher: Matcher,
    n_samples: int = 256,
    seed: int = 42,
    ridge_lambda: float = 1.0,
    kernel_width: float | None = None,
    lprefix: str = LPREFIX,
    rprefix: str = RPREFIX,
    landmark: str | None = None,
) -> list[dict]:
    """Token saliencies for one pair: Spark-side mask+score, driver-side
    weighted ridge solve. Returns one dict per token:
    (side, attr, token, weight), sorted by |weight| descending.

    ``landmark='left'|'right'`` pins that side unperturbed and explains
    only the other side's tokens — the Landmark baseline
    (baselines/landmark.py:11-293) as a mask-subset of the same
    operator."""
    import numpy as np

    mask_sides = ("l", "r")
    if landmark == "left":
        mask_sides = ("r",)
    elif landmark == "right":
        mask_sides = ("l",)
    samples, all_toks = token_mask_samples(
        spark, l_record, r_record, n_samples, seed, lprefix, rprefix, mask_sides
    )
    scored = matcher.predict(samples).select("_sample_id", "_mask", "match_score")
    rows = scored.collect()
    rows.sort(key=lambda r: r["_sample_id"])
    X = np.array([r["_mask"] for r in rows], dtype=float)
    y = np.array([r["match_score"] for r in rows], dtype=float)

    t = X.shape[1]
    if kernel_width is None:
        kernel_width = math.sqrt(t) * 0.75  # lime's default
    # cosine-ish distance from the all-ones original, exponential kernel
    d = 1.0 - X.sum(axis=1) / t
    w = np.exp(-(d**2) / kernel_width**2)
    Xw = X * w[:, None]
    A = X.T @ Xw + ridge_lambda * np.eye(t)
    b = X.T @ (w * y)
    coef = np.linalg.solve(A, b)

    out = [
        {"side": side, "attr": attr, "token": tok, "weight": float(c)}
        for (side, _, attr, tok), c in zip(all_toks, coef)
    ]
    out.sort(key=lambda r: -abs(r["weight"]))
    return out


def kernel_shap_pair(
    spark: SparkSession,
    l_record: dict,
    r_record: dict,
    matcher: Matcher,
    n_samples: int = 128,
    seed: int = 42,
    lprefix: str = LPREFIX,
    rprefix: str = RPREFIX,
    landmark: str | None = None,
) -> list[dict]:
    """KernelSHAP token ranking (reference baselines/shap_c.py:15-197,
    which calls ``shap.KernelExplainer(classifier_fn, background,
    link='identity')``) — natively, with no shap dependency.

    Same Spark-side machinery as :func:`explain_pair` (one
    ``token_mask_samples`` frame, ONE distributed model round); only the
    driver-side solve differs: samples are weighted by the Shapley
    kernel  π(z) = (T-1) / (C(T,|z|)·|z|·(T-|z|))  and the weighted
    least squares is solved under KernelSHAP's efficiency constraint
    Σφ = f(x) − f(∅)  (eliminate the last coefficient, regress the
    rest, recover it from the constraint) — the same estimator the shap
    library's regression path computes. Row 0 supplies f(x), a pinned
    all-masked row supplies f(∅); both are excluded from the regression
    (their kernel weight is infinite — the constraint encodes them).

    Returns one dict per token: (side, attr, token, weight), sorted by
    |weight| descending — plug directly into
    :func:`greedy_counterfactual` for the SHAP-C pipeline.
    """
    import numpy as np

    mask_sides = ("l", "r")
    if landmark == "left":
        mask_sides = ("r",)
    elif landmark == "right":
        mask_sides = ("l",)
    samples, all_toks = token_mask_samples(
        spark,
        l_record,
        r_record,
        n_samples,
        seed,
        lprefix,
        rprefix,
        mask_sides,
        empty_sample_id=1,
    )
    scored = matcher.predict(samples).select("_sample_id", "_mask", "match_score")
    rows = scored.collect()
    rows.sort(key=lambda r: r["_sample_id"])
    X = np.array([r["_mask"] for r in rows], dtype=float)
    y = np.array([r["match_score"] for r in rows], dtype=float)
    fx, f0 = y[0], y[1]
    t = X.shape[1]

    if t == 1:
        coef = np.array([fx - f0])
    else:
        k = X.sum(axis=1)
        sel = (k > 0) & (k < t)
        sel[0] = sel[1] = False
        Xs, ys, ks = X[sel], y[sel], k[sel]
        if len(ys) == 0:
            coef = np.full(t, (fx - f0) / t)  # degenerate: uniform split
        else:
            # Shapley kernel; T is token-sized (tens), math.comb is exact
            w = np.array(
                [
                    (t - 1) / (math.comb(t, int(kk)) * kk * (t - kk))
                    for kk in ks
                ]
            )
            # eliminate phi_T via the efficiency constraint
            Z = Xs[:, :-1] - Xs[:, -1:]
            yy = ys - f0 - Xs[:, -1] * (fx - f0)
            A = Z.T @ (Z * w[:, None]) + 1e-10 * np.eye(t - 1)
            b = Z.T @ (w * yy)
            head = np.linalg.solve(A, b)
            coef = np.append(head, (fx - f0) - head.sum())

    out = [
        {"side": side, "attr": attr, "token": tok, "weight": float(c)}
        for (side, _, attr, tok), c in zip(all_toks, coef)
    ]
    out.sort(key=lambda r: -abs(r["weight"]))
    return out


def greedy_counterfactual(
    spark: SparkSession,
    l_record: dict,
    r_record: dict,
    matcher: Matcher,
    ranking: list[dict],
    predicted_class: int = 1,
    threshold: float = 0.5,
    max_tokens: int = -1,
    lprefix: str = LPREFIX,
    rprefix: str = RPREFIX,
) -> dict | None:
    """SHAP-C/LIME-C-style greedy counterfactual search
    (baselines/shap_c.py:100-197, lime_c.py): drop the top-L
    class-supporting tokens (by the given saliency ranking) for
    L = 1, 2, … until the prediction crosses the threshold.

    The reference re-predicts per L sequentially; here every nested
    prefix-mask variant is one row of a single DataFrame and ONE model
    round scores them all — the smallest flipped L wins (identical
    result: the variants are exactly the prefixes the sequential loop
    would try). ``ranking`` is `explain_pair` output (any saliency
    source works — SHAP/LIME/CERTA). Returns
    {n_dropped, dropped, match_score} or None when no prefix flips.
    """
    supporting = [
        r for r in ranking
        if (r["weight"] > 0) == (predicted_class == 1)
    ]
    if max_tokens > 0:
        supporting = supporting[:max_tokens]
    if not supporting:
        return None

    base = spark.range(1, len(supporting) + 1).select(F.col("id").alias("_L"))

    def side_cols(record: dict, prefix: str, side: str):
        cols = []
        for attr, val in ((k, v) for k, v in record.items() if k not in ("id", "label")):
            toks = str(val).split()
            pieces = []
            for pos, tok in enumerate(toks):
                # rank of this token in the supporting list, if present
                rank = next(
                    (
                        i
                        for i, s in enumerate(supporting)
                        if s["side"] == side and s["attr"] == attr and s["token"] == tok
                    ),
                    None,
                )
                if rank is None:
                    pieces.append(F.lit(tok))
                else:
                    pieces.append(
                        F.when(F.col("_L") > rank, F.lit(None)).otherwise(F.lit(tok))
                    )
            cols.append(F.concat_ws(" ", *pieces).alias(prefix + attr))
        cols.append(F.lit(str(record.get("id", 0))).alias(prefix + "id"))
        return cols

    variants = base.select(
        "_L", *side_cols(l_record, lprefix, "l"), *side_cols(r_record, rprefix, "r")
    )
    scored = matcher.predict(variants).select("_L", "match_score").collect()
    flipped_when = (
        (lambda s: s < threshold) if predicted_class == 1 else (lambda s: s >= threshold)
    )
    flips = sorted(
        (r["_L"], r["match_score"]) for r in scored if flipped_when(r["match_score"])
    )
    if not flips:
        return None
    n, score = flips[0]
    return {
        "n_dropped": int(n),
        "dropped": [
            (s["side"], s["attr"], s["token"]) for s in supporting[: int(n)]
        ],
        "match_score": float(score),
    }
