"""Powerset lattice debug surface (certa/utils.py:84-177) — driver-side
by design: lattices are per-triangle powersets over <=~20 attribute
names (SURVEY.md §1.1 marks this non-distributed).

Provides the join(∪)/meet(∩) semilattice ops (U4) and the Hasse-diagram
DOT export (S5, utils.py:129-173 ``hasse``)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Lattice:
    """Attr-set lattice with per-node rank (match score)."""

    elements: list[frozenset]
    ranks: list[float]
    triangle: object = None

    def __post_init__(self):
        self.elements = [frozenset(e) for e in self.elements]

    def join(self, a: frozenset, b: frozenset) -> frozenset:
        return a | b

    def meet(self, a: frozenset, b: frozenset) -> frozenset:
        return a & b

    @property
    def top(self) -> frozenset:
        out = frozenset()
        for e in self.elements:
            out |= e
        return out

    @property
    def bottom(self) -> frozenset:
        out = self.top
        for e in self.elements:
            out &= e
        return out

    def _covers(self) -> dict[int, list[int]]:
        """Hasse cover relation: s -> minimal strict supersets."""
        covers: dict[int, list[int]] = {}
        for i, s in enumerate(self.elements):
            ups = [
                (j, d)
                for j, d in enumerate(self.elements)
                if s < d
            ]
            covers[i] = [
                j
                for j, d in ups
                if not any(self.elements[k] < d for k, _ in ups if k != j)
            ]
        return covers

    def hasse_dot(self) -> str:
        """S5 — Graphviz DOT of the Hasse diagram; nodes colored by rank
        (green > 0.5 match region, red < 0.5)."""
        def label(s: frozenset) -> str:
            return "{" + ", ".join(sorted(s)) + "}"

        lines = ['digraph G {', 'splines="line"', "rankdir=BT"]
        lines.append(f'"{label(self.top)}" [shape=box];')
        lines.append(f'"{label(self.bottom)}" [shape=box];')
        for i, s in enumerate(self.elements):
            color = ""
            if i < len(self.ranks):
                if self.ranks[i] > 0.5:
                    color = "green"
                elif self.ranks[i] < 0.5:
                    color = "red"
            lines.append(f'"{label(s)}" [color={color}];')
        for i, ups in self._covers().items():
            for j in ups:
                lines.append(
                    f'"{label(self.elements[i])}" -> "{label(self.elements[j])}";'
                )
        lines.append("}")
        return "\n".join(lines)


def lattices_from_predictions(
    predictions, saliency_columns: list[str], original_score: float
) -> list[Lattice]:
    """A8 — regroup a collected prediction log per triangle and build
    one lattice each (explain.py:79-153 debug path, driver-side over
    collected small data)."""
    import collections

    by_tri: dict[str, list] = collections.defaultdict(list)
    for row in predictions:
        by_tri[row["triangle"]].append(row)
    out = []
    for tri, rows in by_tri.items():
        side = "l" if tri.startswith("0") else "r"
        full = frozenset(c for c in saliency_columns if c.startswith(side))
        elems = [frozenset()] + [
            frozenset(r["alteredAttributes"]) for r in rows
        ] + [full]
        ranks = [original_score] + [r["match_score"] for r in rows]
        out.append(Lattice(elements=elems, ranks=ranks, triangle=tri))
    return out
