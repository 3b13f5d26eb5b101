"""Single-round-trip array literals for model constants.

PySpark's ``F.lit(list)`` expands CLIENT-side into
``array(*[lit(x) for x in v])`` — one py4j round trip per scalar plus
one per nesting level. For the model-constant arrays the ANN operators
embed in their plans (an 8x16x8 PQ codebook is 1024 scalars) that is
~9.7k round trips, ~2-4 s of driver wall per DataFrame BUILD, all spent
before Spark ever sees the query (measured r11 session 4 with cProfile:
``knn_ivfpq_adc``'s build was 2.5 s of the query's ~4.5 s bench cost,
96% of it inside ``socket.recv_into`` under ``F.lit``; the guide's §4
lesson — control what crosses the Python boundary — applies to the
driver's py4j socket just as much as to the executors' Arrow channel).

:func:`array_lit` renders the same nested literal as ONE SQL expression
string parsed JVM-side, a single round trip:

* floats render as ``repr(x) + "D"`` — ``repr`` is the shortest string
  that round-trips the IEEE-754 double, and the SQL parser reads a
  ``D``-suffixed literal with ``Double.parseDouble`` (correctly
  rounded), so the parsed value is BIT-IDENTICAL to what ``F.lit``
  built.  Verified element-for-element in ``tests/test_litfast.py``
  including -0.0, subnormals and 1e-17; non-finite components raise
  (no query constant is ever NaN/Inf — fail loudly).
* ints render as ``L``-suffixed BIGINT literals;
* strings render with backslash escaping.

Both forms produce the identical analyzed tree (``CreateArray`` over
``Literal``\\ s) and constant-fold to the identical ``Literal`` in the
physical plan — this module changes WHERE the tree is constructed
(the JVM's SQL parser vs thousands of py4j calls), never what any
query computes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

__all__ = ["array_lit"]


def _render(v, empty_as: str | None = None) -> str:
    if isinstance(v, (list, tuple)):
        if not v:
            if empty_as is not None:
                return empty_as
            # F.lit([]) is equally type-ambiguous; without an explicit
            # empty_as no call site passes an empty model constant, so
            # refuse instead of guessing
            raise ValueError("array_lit: empty array component")
        return (
            "array(" + ",".join(_render(x, empty_as) for x in v) + ")"
        )
    if isinstance(v, bool):
        raise TypeError("array_lit: bool component (cast it explicitly)")
    if isinstance(v, int):
        return f"{v}L"
    if isinstance(v, float):
        if not math.isfinite(v):
            raise ValueError("array_lit: non-finite component")
        return repr(v) + "D"
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace("'", "\\'")
        return f"'{escaped}'"
    raise TypeError(
        f"array_lit: unsupported component type {type(v).__name__}"
    )


def array_lit(v: list | tuple, empty_as: str | None = None) -> Column:
    """One-round-trip replacement for ``F.lit(nested_list)``: the same
    constant-folded array Literal, built by the JVM SQL parser instead
    of one py4j call per element. See the module docstring for the
    bit-identity argument; use for any model-constant array bigger
    than a handful of elements.

    ``empty_as`` supplies the SQL snippet for EMPTY inner lists (e.g.
    ``"cast(array() as array<string>)"`` for a powerset literal whose
    first subset is the empty set) — an untyped ``array()`` would be
    ``array<null>``, exactly the ambiguity ``F.lit([])`` has."""
    if not isinstance(v, (list, tuple)):
        raise TypeError("array_lit expects a list/tuple")
    return F.expr(_render(v, empty_as))
