"""Deterministic ER fixtures per FIXTURES.md §1.

tableA/tableB product tables with matched clusters: ~30% of B rows are
token-dropped/corrupted copies of an A row so real matches, non-matches
and near-misses all exist. Seeded — every run produces identical data.
"""

from __future__ import annotations

import random

COLS = ["id", "name", "description", "price"]

_BRANDS = ["apple", "samsung", "sony", "dell", "hp", "lenovo", "asus", "logitech",
           "canon", "nikon", "bose", "jbl", "garmin", "fitbit", "philips"]
_NOUNS = ["phone", "laptop", "tablet", "camera", "headphones", "speaker", "watch",
          "monitor", "keyboard", "mouse", "router", "charger", "drone", "printer"]
_ADJS = ["pro", "max", "ultra", "mini", "air", "plus", "lite", "neo", "prime",
         "slim", "x", "elite"]
_DESC = ["wireless", "bluetooth", "noise", "cancelling", "oled", "amoled",
         "display", "intel", "ergonomic", "portable", "fast", "charging",
         "waterproof", "smart", "hd", "4k", "compact", "premium", "gaming",
         "travel", "battery", "life"]


def _name(rng: random.Random) -> str:
    return " ".join(
        [rng.choice(_BRANDS), rng.choice(_NOUNS)]
        + rng.sample(_ADJS, rng.randint(1, 3))
    )


def _desc(rng: random.Random) -> str:
    return " ".join(rng.sample(_DESC, rng.randint(3, 6)))


def _corrupt(text: str, rng: random.Random) -> str:
    toks = text.split()
    if len(toks) > 2 and rng.random() < 0.7:
        del toks[rng.randrange(len(toks))]
    if rng.random() < 0.5:
        i, j = rng.sample(range(len(toks)), 2) if len(toks) > 1 else (0, 0)
        toks[i], toks[j] = toks[j], toks[i]
    return " ".join(toks)


def make_tables(n_a: int = 40, n_b: int = 40, seed: int = 7):
    """Returns (rows_a, rows_b) as lists of tuples matching COLS."""
    rng = random.Random(seed)
    rows_a = []
    for i in range(n_a):
        rows_a.append((i, _name(rng), _desc(rng), str(rng.randrange(50, 2000))))
    rows_b = []
    for i in range(n_b):
        if i < int(n_b * 0.3) and i < n_a:
            # corrupted copy of A[i] -> a true match
            _, name, desc, price = rows_a[i]
            rows_b.append(
                (i, _corrupt(name, rng), _corrupt(desc, rng),
                 str(int(price) + rng.randrange(-20, 20)))
            )
        else:
            rows_b.append((i, _name(rng), _desc(rng), str(rng.randrange(50, 2000))))
    return rows_a, rows_b


def make_pairs(rows_a, rows_b, seed: int = 11, neg_per_pos: int = 4):
    """Labeled pair table ~1 pos : 4 neg with shared endpoints
    (FIXTURES.md §1.2 — wedges require ids appearing in multiple pairs)."""
    rng = random.Random(seed)
    pairs = []
    n_match = int(len(rows_b) * 0.3)
    for i in range(min(n_match, len(rows_a))):
        pairs.append((i, i, 1))
        for _ in range(neg_per_pos):
            j = rng.randrange(len(rows_b))
            if j != i:
                pairs.append((i, j, 0))
            k = rng.randrange(len(rows_a))
            if k != i:
                pairs.append((k, i, 0))
    seen = set()
    out = []
    for p in pairs:
        if (p[0], p[1]) not in seen:
            seen.add((p[0], p[1]))
            out.append(p)
    return out
