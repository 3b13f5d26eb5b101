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
    gate coverage silently erodes as the registry grows. Round-9
    order: the two r9 additions (ungated), the changed-code re-gate
    tier (attribution drain sizing, hyperball / exact-betweenness
    local finishes), then the ENTIRE remaining r4-stale tail. What
    matters invariantly: every ungated name sits inside the 50-entry
    window, the window is exactly 50 deep, and after this window NO
    registry name's most recent driver gate predates round 6."""
    from certa_spark.queries import (
        _DRIVER_GREEN,
        _DRIVER_GREEN_R3,
        _DRIVER_GREEN_R4,
        _DRIVER_GREEN_R56,
        _DRIVER_GREEN_R7,
        _DRIVER_GREEN_R8,
        _FRONT,
        _R4_REMAINING,
        _R9_NEW,
        _R9_REGATE,
    )

    gated = (
        _DRIVER_GREEN | _DRIVER_GREEN_R3 | _DRIVER_GREEN_R4
        | _DRIVER_GREEN_R56 | _DRIVER_GREEN_R7 | _DRIVER_GREEN_R8
    )
    names = list(QUERIES)
    front = _R9_NEW + _R9_REGATE + _R4_REMAINING
    assert front == _FRONT
    assert len(front) == 50, "driver window must be exactly 50 deep"
    assert len(set(front)) == 50, "front tier has duplicates"
    assert tuple(names[: len(front)]) == front, "front tier out of order"
    # the r9 additions are the only never-gated names, and lead
    assert [n for n in names if n not in gated] == list(_R9_NEW)
    # the re-gate tier is code that changed in r9 — its members were
    # all driver-green before
    for n in _R9_REGATE:
        assert n in gated
    # the r4 tail is EXACTLY the set of names whose most recent gate
    # is r4 — i.e. this window clears every pre-r6 attestation
    assert set(_R4_REMAINING) == (
        _DRIVER_GREEN_R4 - _DRIVER_GREEN_R56 - _DRIVER_GREEN_R7
        - _DRIVER_GREEN_R8
    ), "r4-stale tail must be cleared in full this window"
    # every ungated query fits inside the 50-entry driver window
    ungated = [n for n in names if n not in gated]
    assert set(ungated) <= set(names[:50]), "ungated query outside window"
    # the gated ledgers only name real queries
    assert gated <= set(QUERIES)
