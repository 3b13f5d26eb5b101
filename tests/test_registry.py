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
    gate coverage silently erodes as the registry grows. Round-5
    order: the r5 additions, then the 14 r2-era queries no driver
    window ever gated, then everything driver-green. With 150 of the
    pre-r5 registry already gated, the 50-entry window is PADDED with
    gated names — that's fine; what matters is every ungated name
    sits inside it."""
    from certa_spark.queries import (
        _DRIVER_GREEN,
        _DRIVER_GREEN_R3,
        _DRIVER_GREEN_R4,
        _NEVER_GATED,
        _R5_NEW,
    )

    gated = _DRIVER_GREEN | _DRIVER_GREEN_R3 | _DRIVER_GREEN_R4
    names = list(QUERIES)
    front = _R5_NEW + _NEVER_GATED
    assert tuple(names[: len(front)]) == front, "front tier out of order"
    tiers = [1 if n in gated else 0 for n in names]
    assert tiers == sorted(tiers), "registry tiers out of order"
    # every front-tier name really is never-driver-gated
    assert not (set(front) & gated)
    # every ungated query fits inside the 50-entry driver window
    ungated = [n for n in names if n not in gated]
    assert set(ungated) <= set(names[:50]), "ungated query outside window"
    # the gated ledgers only name real queries
    assert gated <= set(QUERIES)
