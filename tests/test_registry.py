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
    gate coverage silently erodes as the registry grows. Round-8
    order: the two r8 additions (ungated), the changed-code re-gate
    tier (append-mode sessionized, the Louvain exchange cut, the
    minhash banding refactor, the guarded streaming gates), the 39
    r3 names not yet rotated forward, then the oldest r4 names as
    padding. What matters invariantly: every ungated name sits inside
    the 50-entry window, and the window is exactly 50 deep so the
    padding actually rotates stale attestations forward."""
    from certa_spark.queries import (
        _DRIVER_GREEN,
        _DRIVER_GREEN_R3,
        _DRIVER_GREEN_R4,
        _DRIVER_GREEN_R56,
        _DRIVER_GREEN_R7,
        _FRONT,
        _R3_OLDEST,
        _R3_REMAINING,
        _R4_OLDEST,
        _R8_NEW,
        _R8_REGATE,
    )

    gated = (
        _DRIVER_GREEN | _DRIVER_GREEN_R3 | _DRIVER_GREEN_R4
        | _DRIVER_GREEN_R56 | _DRIVER_GREEN_R7
    )
    names = list(QUERIES)
    front = _R8_NEW + _R8_REGATE + _R3_REMAINING + _R4_OLDEST
    assert front == _FRONT
    assert len(front) == 50, "driver window must be exactly 50 deep"
    assert len(set(front)) == 50, "front tier has duplicates"
    assert tuple(names[: len(front)]) == front, "front tier out of order"
    # the r8 additions are the only never-gated names, and lead
    assert [n for n in names if n not in gated] == list(_R8_NEW)
    # the re-gate tier is code that changed in r8 — its members were
    # all driver-green before (most recently in r7 or r4)
    for n in _R8_REGATE:
        assert n in gated
    # the r3 rotation tiers partition the r3 ledger exactly: the 11
    # already rotated in r7's window plus the 39 rotated now
    assert set(_R3_OLDEST) | set(_R3_REMAINING) == set(_DRIVER_GREEN_R3)
    assert not set(_R3_OLDEST) & set(_R3_REMAINING)
    # padding comes from the stalest remaining ledger (r4 names whose
    # last gate is r4)
    assert set(_R4_OLDEST) <= (
        _DRIVER_GREEN_R4 - _DRIVER_GREEN_R56 - _DRIVER_GREEN_R7
    )
    # every ungated query fits inside the 50-entry driver window
    ungated = [n for n in names if n not in gated]
    assert set(ungated) <= set(names[:50]), "ungated query outside window"
    # the gated ledgers only name real queries
    assert gated <= set(QUERIES)
