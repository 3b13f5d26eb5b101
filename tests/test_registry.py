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
    gate coverage silently erodes as the registry grows. Round-10
    order (r9 verdict asks #1-#3): the two r10 additions (ungated),
    the r8/r9-BOUNDARY-commit re-gate tier FIRST, then this round's
    changed-plan tier (widen flips, shared drain helper, graph advice
    closures), then the oldest r7-stale names. What matters
    invariantly: every ungated name sits inside the 50-entry window,
    the window is exactly 50 deep, and the boundary-commit debt is
    cleared IN FULL this window."""
    from certa_spark.queries import (
        _DRIVER_GREEN,
        _DRIVER_GREEN_R3,
        _DRIVER_GREEN_R4,
        _DRIVER_GREEN_R56,
        _DRIVER_GREEN_R7,
        _DRIVER_GREEN_R8,
        _DRIVER_GREEN_R9,
        _FRONT,
        _R7_STALE_FIRST,
        _R10_NEW,
        _R10_REGATE_BOUNDARY,
        _R10_REGATE_CHANGED,
    )

    gated = (
        _DRIVER_GREEN | _DRIVER_GREEN_R3 | _DRIVER_GREEN_R4
        | _DRIVER_GREEN_R56 | _DRIVER_GREEN_R7 | _DRIVER_GREEN_R8
        | _DRIVER_GREEN_R9
    )
    names = list(QUERIES)
    front = (
        _R10_NEW + _R10_REGATE_BOUNDARY + _R10_REGATE_CHANGED
        + _R7_STALE_FIRST
    )
    assert front == _FRONT
    assert len(front) == 50, "driver window must be exactly 50 deep"
    assert len(set(front)) == 50, "front tier has duplicates"
    assert tuple(names[: len(front)]) == front, "front tier out of order"
    # the r10 additions are the only never-gated names, and lead
    assert [n for n in names if n not in gated] == list(_R10_NEW)
    # the boundary-commit debt (verdict ask #1) is the EXACT 11-name
    # set the r9 verdict enumerated, and it outranks everything except
    # the ungated additions
    assert set(_R10_REGATE_BOUNDARY) == {
        "part_ktruss", "part_clustering_coeff", "er_golden_record",
        "neardup_clusters_lsss", "part_pagerank_personalized",
        "doc_span_dedup", "doc_bpe_merges", "doc_novelty",
        "minhash_incremental", "curation_pipeline_v2",
        "doc_source_overlap",
    }
    # both re-gate tiers name only previously-driver-green queries
    for n in _R10_REGATE_BOUNDARY + _R10_REGATE_CHANGED:
        assert n in gated
    # the tail pads draw from the r7-stale pool: last gated in r7,
    # not re-gated since
    r7_stale = _DRIVER_GREEN_R7 - _DRIVER_GREEN_R8 - _DRIVER_GREEN_R9
    for n in _R7_STALE_FIRST:
        assert n in r7_stale
    # every ungated query fits inside the 50-entry driver window
    ungated = [n for n in names if n not in gated]
    assert set(ungated) <= set(names[:50]), "ungated query outside window"
    # the gated ledgers only name real queries
    assert gated <= set(QUERIES)
