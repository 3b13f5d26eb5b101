"""Driver-contract registry invariants (no Spark session needed)."""

from certa_spark.queries import ORACLES, QUERIES

# rows-only by design: not SQL-expressible (driver records weaker check)
WEAK: set[str] = set()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_weak_queries_are_exactly_the_documented_ones():
    assert set(QUERIES) - set(ORACLES) == WEAK


def test_entry_module_exposes_registries():
    import __spark_entry__ as entry

    assert set(entry.queries()) == set(QUERIES)
    assert set(entry.oracle_sql()) == set(ORACLES)
    assert all(callable(f) for f in entry.queries().values())
    assert all(isinstance(s, str) and s.strip() for s in entry.oracle_sql().values())


def test_goldens_are_registered_queries():
    from certa_spark.queries import GOLDEN_SF001

    assert GOLDEN_SF001 <= set(QUERIES)
    assert GOLDEN_SF001 <= set(ORACLES)


def test_rotation_puts_ungated_queries_first():
    """The driver gates the FIRST 50 entries; the rotation must place
    never-driver-gated queries before driver-green ones — otherwise
    gate coverage silently erodes as the registry grows. Round-7
    order: the r7 addition (ungated), the embedding_neardup re-gate
    pair (code changed in r5, last gated r4 — the window must attest
    the shipping BLAS path), then the stalest gated names (r1/r2, then
    the oldest r3 window entries) as padding. What matters
    invariantly: every ungated name sits inside the 50-entry window,
    and the window is exactly 50 deep so the padding actually rotates
    stale attestations forward."""
    from certa_spark.queries import (
        _DRIVER_GREEN,
        _DRIVER_GREEN_R3,
        _DRIVER_GREEN_R4,
        _DRIVER_GREEN_R56,
        _FRONT,
        _R2_OLDEST,
        _R3_OLDEST,
        _R7_NEW,
        _R7_REGATE,
    )

    gated = (
        _DRIVER_GREEN | _DRIVER_GREEN_R3 | _DRIVER_GREEN_R4
        | _DRIVER_GREEN_R56
    )
    names = list(QUERIES)
    front = _R7_NEW + _R7_REGATE + _R2_OLDEST + _R3_OLDEST
    assert front == _FRONT
    assert len(front) == 50, "driver window must be exactly 50 deep"
    assert len(set(front)) == 50, "front tier has duplicates"
    assert tuple(names[: len(front)]) == front, "front tier out of order"
    # the r7 additions are the only never-gated names, and lead
    assert [n for n in names if n not in gated] == list(_R7_NEW)
    # the re-gate pair's last gate is R4 (stale vs the r5 code swap)
    for n in _R7_REGATE:
        assert n in _DRIVER_GREEN_R4 and n not in _DRIVER_GREEN_R56
    # padding names come from the stalest ledgers, not recent windows
    assert set(_R2_OLDEST) <= _DRIVER_GREEN - _DRIVER_GREEN_R56
    assert set(_R3_OLDEST) <= _DRIVER_GREEN_R3 - _DRIVER_GREEN_R56
    # every ungated query fits inside the 50-entry driver window
    ungated = [n for n in names if n not in gated]
    assert set(ungated) <= set(names[:50]), "ungated query outside window"
    # the gated ledgers only name real queries
    assert gated <= set(QUERIES)
