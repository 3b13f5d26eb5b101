"""tmpcache scope semantics: tracking, nesting, thread isolation."""

import threading

from pyspark.sql import functions as F

from certa_spark import tmpcache


def _cached_count(spark):
    jcm = spark._jsparkSession.sharedState().cacheManager()  # noqa: SLF001
    return 0 if jcm.isEmpty() else 1  # isEmpty is the stable API


def test_track_noop_outside_scope(spark):
    df = spark.range(10).cache()
    try:
        assert tmpcache.track(df) is df  # no scope -> passthrough
    finally:
        df.unpersist(True)


def test_scope_unpersists_tracked_frames(spark):
    spark.catalog.clearCache()
    with tmpcache.scope():
        df = tmpcache.track(spark.range(5).select((F.col("id") * 3).alias("x")).cache())
        df.count()
        assert not spark._jsparkSession.sharedState().cacheManager().isEmpty()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_nested_scopes_release_only_their_own(spark):
    spark.catalog.clearCache()
    with tmpcache.scope():
        outer = tmpcache.track(spark.range(7).cache())
        outer.count()
        with tmpcache.scope():
            inner = tmpcache.track(spark.range(8).select((F.col("id") + 1).alias("y")).cache())
            inner.count()
        # inner released, outer still cached
        assert not spark._jsparkSession.sharedState().cacheManager().isEmpty()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_threads_have_independent_scopes(spark):
    spark.catalog.clearCache()
    errs = []

    def worker(tag):
        try:
            with tmpcache.scope():
                df = tmpcache.track(
                    spark.range(100).select((F.col("id") % tag).alias("m")).cache()
                )
                df.count()
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(t,)) for t in (3, 5, 7)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
