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
    """The driver gates the FIRST 50 entries; the three-tier rotation
    must place never-gated (round-3) queries before r2-era ones and
    driver-green ones last — otherwise gate coverage silently erodes
    as the registry grows."""
    from certa_spark.queries import _DRIVER_GREEN, _R2_ERA

    names = list(QUERIES)
    tiers = [
        0 if n not in _R2_ERA and n not in _DRIVER_GREEN
        else (1 if n not in _DRIVER_GREEN else 2)
        for n in names
    ]
    assert tiers == sorted(tiers), "registry tiers out of order"
    assert all(t == 0 for t in tiers[:50]), "gate window contains gated queries"
