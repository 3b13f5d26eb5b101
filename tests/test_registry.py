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
    gate coverage silently erodes as the registry grows. Round-11
    order (r10 verdict asks #2/#4/#5/#7): this round's changed-code
    re-gate tier FIRST (rank_top sites, all nine streaming gates, the
    betweenness guard), then the ENTIRE remaining r7-stale tail
    (clearing every pre-r8 attestation), then the oldest r8-gated
    pads. What matters invariantly: every ungated name sits inside
    the 50-entry window, the window is exactly 50 deep, and the
    r7-stale debt is cleared IN FULL this window."""
    from certa_spark.queries import (
        _FRONT,
        _GATED,
        _R7_STALE_REMAINING,
        _R8_STALE_FIRST,
        _R11_NEW,
        _R11_REGATE,
        _DRIVER_GREEN_R7,
        _DRIVER_GREEN_R8,
        _DRIVER_GREEN_R9,
        _DRIVER_GREEN_R10,
    )

    names = list(QUERIES)
    front = _R11_NEW + _R11_REGATE + _R7_STALE_REMAINING + _R8_STALE_FIRST
    assert front == _FRONT
    assert len(front) == 50, "driver window must be exactly 50 deep"
    assert len(set(front)) == 50, "front tier has duplicates"
    assert tuple(names[: len(front)]) == front, "front tier out of order"
    # the r10 window closed the never-gated set, so the only ungated
    # names are this round's additions — and they lead the window
    assert {n for n in names if n not in _GATED} == set(_R11_NEW)
    for n in _R11_NEW:
        assert n not in _GATED
    # the re-gate tier names only previously-driver-green queries
    for n in _R11_REGATE:
        assert n in _GATED
    # the r7-stale rotation is COMPLETE: every name last gated in r7
    # and not re-gated since is either in this window's stale tier or
    # in the regate tier
    r7_stale = (
        _DRIVER_GREEN_R7 - _DRIVER_GREEN_R8 - _DRIVER_GREEN_R9
        - _DRIVER_GREEN_R10
    )
    assert r7_stale <= set(_R7_STALE_REMAINING) | set(_R11_REGATE)
    for n in _R7_STALE_REMAINING:
        assert n in r7_stale
    # the pads draw from the r8-stale pool: last gated in r8, not
    # re-gated since
    r8_stale = _DRIVER_GREEN_R8 - _DRIVER_GREEN_R9 - _DRIVER_GREEN_R10
    for n in _R8_STALE_FIRST:
        assert n in r8_stale
    # the gated ledgers only name real queries
    assert _GATED <= set(QUERIES)
