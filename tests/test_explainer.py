"""End-to-end invariants of CertaExplainer (FIXTURES.md §6)."""

import pytest
from pyspark.sql import functions as F

from certa_spark.explainer import CertaExplainer
from certa_spark.matching import NativeCosineMatcher
from tests.fixtures import COLS


@pytest.fixture(scope="module")
def result(spark, er_tables):
    rows_a, rows_b, A, B = er_tables
    ex = CertaExplainer(spark, A, B, data_augmentation="no")
    l = dict(zip(COLS, rows_a[0]))
    r = dict(zip(COLS, rows_b[0]))
    return ex.explain(l, r, NativeCosineMatcher(), num_triangles=10), rows_a, rows_b


def test_saliency_bounds_and_base_rate(result):
    res, *_ = result
    n_tri = len(res.triangles)
    assert n_tri > 0
    sal = res.saliency_dict
    assert set(sal) == {
        "ltable_name", "ltable_description", "ltable_price",
        "rtable_name", "rtable_description", "rtable_price",
    }
    # flips >= n_triangles so base rate <= 1; every attr >= base rate
    base = min(sal.values())
    for v in sal.values():
        assert 0.0 <= v <= 1.0
        assert v >= base - 1e-12


def test_cf_summary_minimal_and_max(result):
    res, *_ = result
    if len(res.cf_summary) == 0:
        pytest.skip("no flips")
    assert res.cf_summary.nunique() <= 1  # all at the max PSS
    keys = [set(k.split("/")) for k in res.cf_summary.index]
    for i, a in enumerate(keys):
        for j, b in enumerate(keys):
            if i != j:
                assert not (b < a), "non-minimal set survived"


def test_counterfactuals_flipped(result):
    res, *_ = result
    cfs = res.counterfactuals
    if len(cfs) == 0:
        pytest.skip("no cfs")
    # class 1 explained -> flipped rows have match_score < 0.5
    assert (cfs["match_score"] < 0.5).all()
    # dedup respected
    key = cfs[["copiedValues", "alteredAttributes", "droppedValues"]]
    assert not key.duplicated().any()
    # simplest-first ordering
    assert list(cfs["attr_count"]) == sorted(cfs["attr_count"])


def test_triangle_invariant_repredicted(result, spark):
    """FIXTURES.md §6: every triangle's <pivot,anchor> pair must be
    predicted a match and <anchor,free> a non-match by the matcher."""
    res, rows_a, rows_b = result
    a_by_id = {r[0]: dict(zip(COLS, r)) for r in rows_a}
    b_by_id = {r[0]: dict(zip(COLS, r)) for r in rows_b}
    m = NativeCosineMatcher()

    def lookup(member):
        src, rid = member.split("@")
        return (a_by_id if src == "0" else b_by_id).get(int(rid))

    checked = 0
    for pivot, anchor, free in res.triangles[:5]:
        pr, ar, fr = lookup(pivot), lookup(anchor), lookup(free)
        if pr is None or ar is None or fr is None:
            continue  # DA-generated record beyond the base sources
        left_first = pivot.startswith("0@")
        lrec, rrec = (pr, ar) if left_first else (ar, pr)
        from certa_spark.operators.pairs import pair_row

        match_pair = pair_row(spark, lrec, rrec)
        s1 = m.predict(match_pair).collect()[0]["match_score"]
        assert s1 >= 0.5, (pivot, anchor)
        lrec2, rrec2 = (fr, ar) if left_first else (ar, fr)
        non_pair = pair_row(spark, lrec2, rrec2)
        s2 = m.predict(non_pair).collect()[0]["match_score"]
        assert s2 < 0.5, (anchor, free)
        checked += 1
    assert checked > 0


def test_empty_when_no_support(spark, er_tables):
    """A probe with no text overlap anywhere and DA off yields the empty
    explanation contract (explain.py:156-158)."""
    *_, A, B = er_tables
    ex = CertaExplainer(spark, A, B, data_augmentation="no")
    l = {"id": 999, "name": "zzz qqq", "description": "xxx", "price": "1"}
    r = {"id": 999, "name": "www vvv", "description": "uuu", "price": "2"}
    res = ex.explain(l, r, NativeCosineMatcher(), num_triangles=200)
    assert len(res.triangles) == 0
    assert len(res.saliency) == 0


def test_explain_debug_lattices(spark, er_tables):
    from certa_spark.explainer import CertaExplainer
    from certa_spark.matching import NativeCosineMatcher
    from tests.fixtures import COLS

    rows_a, rows_b, A, B = er_tables
    ex = CertaExplainer(spark, A, B, data_augmentation="no")
    res = ex.explain(
        dict(zip(COLS, rows_a[0])),
        dict(zip(COLS, rows_b[0])),
        NativeCosineMatcher(),
        num_triangles=4,
        debug=True,
    )
    assert len(res.lattices) == len(
        {t for t in (lat.triangle for lat in res.lattices)}
    )
    if res.lattices:
        lat = res.lattices[0]
        dot = lat.hasse_dot()
        assert dot.startswith("digraph G")
        assert lat.bottom == frozenset()


def test_explain_pandas_adapter_matches_native(spark, er_tables):
    """UD1 — an arbitrary pandas predict_fn wrapped in mapInPandas must
    yield the same explanation as the JVM-side Column matcher (the two
    compute identical scores by construction)."""
    from certa_spark.explainer import CertaExplainer
    from certa_spark.matching import NativeCosineMatcher, PandasPredictAdapter
    from tests.fixtures import COLS

    rows_a, rows_b, A, B = er_tables
    ex = CertaExplainer(spark, A, B, data_augmentation="no")
    l_rec = dict(zip(COLS, rows_a[0]))
    r_rec = dict(zip(COLS, rows_b[0]))

    native = NativeCosineMatcher()
    adapted = PandasPredictAdapter(predict_fn=native.predict_pandas)

    res_n = ex.explain(l_rec, r_rec, native, num_triangles=4)
    res_a = ex.explain(l_rec, r_rec, adapted, num_triangles=4)

    assert res_n.saliency_dict == res_a.saliency_dict
    assert sorted(res_n.triangles) == sorted(res_a.triangles)
    assert dict(res_n.pss) == dict(res_a.pss)


def test_explain_data_augmentation_always(spark, er_tables):
    """'always' widens sources upfront AND disables the batched
    early-exit scan (use_all -> one full predict pass)."""
    from certa_spark.explainer import CertaExplainer
    from certa_spark.matching import NativeCosineMatcher
    from tests.fixtures import COLS

    rows_a, rows_b, A, B = er_tables
    ex = CertaExplainer(spark, A, B, data_augmentation="always")
    n_l = A.count()
    assert ex.lsource.count() > n_l  # token-drop copies appended
    res = ex.explain(
        dict(zip(COLS, rows_a[0])),
        dict(zip(COLS, rows_b[0])),
        NativeCosineMatcher(),
        num_triangles=4,
    )
    assert res.saliency is not None


def test_explain_on_demand_fallback_expands_copies(spark, er_tables):
    """num_triangles far above what the sources can support forces the
    expand_copies DA fallback (support < budget) on the scan path."""
    from certa_spark.explainer import CertaExplainer
    from certa_spark.matching import NativeCosineMatcher
    from tests.fixtures import COLS

    rows_a, rows_b, A, B = er_tables
    ex = CertaExplainer(spark, A, B, data_augmentation="no")
    res = ex.explain(
        dict(zip(COLS, rows_a[0])),
        dict(zip(COLS, rows_b[0])),
        NativeCosineMatcher(),
        num_triangles=2,
    )
    assert isinstance(res.triangles, list)


def test_explain_batch_matches_per_instance(spark, er_tables):
    """Set-oriented explain_batch must reproduce per-instance explain
    outputs exactly — saliency, PSS, counterfactual sets, triangles —
    including a batch whose instances get DIFFERENT predicted classes
    (the per-tag polarity path through the fused scan)."""
    rows_a, rows_b, A, B = er_tables
    ex = CertaExplainer(spark, A, B, data_augmentation="no")
    m = NativeCosineMatcher()
    insts = [
        (dict(zip(COLS, rows_a[0])), dict(zip(COLS, rows_b[0]))),  # match
        (dict(zip(COLS, rows_a[1])), dict(zip(COLS, rows_b[1]))),
        (dict(zip(COLS, rows_a[2])), dict(zip(COLS, rows_b[40]))),  # likely non-match
    ]
    batch = ex.explain_batch(insts, m, num_triangles=10, parallelism=3)
    for inst, got in zip(insts, batch):
        want = ex.explain(inst[0], inst[1], m, num_triangles=10)
        assert got.saliency_dict == want.saliency_dict
        assert sorted(got.triangles) == sorted(want.triangles)
        assert dict(got.pss) == dict(want.pss)
        assert dict(got.cf_summary) == dict(want.cf_summary)
        wcf = want.counterfactuals
        gcf = got.counterfactuals
        assert len(wcf) == len(gcf)
        if len(wcf):
            key = ["alteredAttributes", "droppedValues"]
            assert sorted(map(tuple, gcf[key].values.tolist())) == sorted(
                map(tuple, wcf[key].values.tolist())
            )


def test_explain_batch_chunked_parity(spark, er_tables):
    """Batches above scan_batch_size split into overlapped chunk
    pipelines — outputs must be ordered and identical across the chunk
    boundary."""
    rows_a, rows_b, A, B = er_tables
    ex = CertaExplainer(spark, A, B, data_augmentation="no")
    m = NativeCosineMatcher()
    insts = [
        (dict(zip(COLS, rows_a[i])), dict(zip(COLS, rows_b[i])))
        for i in range(9)
    ]
    batch = ex.explain_batch(
        insts, m, num_triangles=10, parallelism=4, scan_batch_size=4
    )
    assert len(batch) == 9
    for i in (0, 5, 8):  # first chunk, middle chunk, last partial chunk
        want = ex.explain(insts[i][0], insts[i][1], m, num_triangles=10)
        assert batch[i].saliency_dict == want.saliency_dict
        assert sorted(batch[i].triangles) == sorted(want.triangles)
        assert dict(batch[i].pss) == dict(want.pss)
