"""IO sinks/sources, lattice DOT, streaming, multimodal plumbing,
serialization formats, MLlib matcher, eval driver."""

import os

import pytest
from pyspark.sql import functions as F

from certa_spark import io as IO
from certa_spark.lattice import Lattice


def test_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "entities")
    df = spark.createDataFrame([(0, "a b", "10")], ["id", "name", "price"])
    IO.write_experiment_csv(df, p)
    assert IO.skip_if_exists(p)
    back = IO.read_entity_csv(spark, p)
    row = back.collect()[0]
    assert row["id"] == 0 and row["name"] == "a b"
    assert dict(back.dtypes)["id"] == "bigint"
    assert dict(back.dtypes)["price"] == "string"  # stringly-typed contract


def test_prediction_log_roundtrip(spark, tmp_path):
    p = str(tmp_path / "predlog")
    df = spark.createDataFrame(
        [(["a"], ["v1"], ["v2"], "0@1 1@2 0@3", 0.7, 0.3, 1)],
        "alteredAttributes array<string>, droppedValues array<string>, "
        "copiedValues array<string>, triangle string, match_score double, "
        "nomatch_score double, depth int",
    )
    IO.write_prediction_log(df, p)
    back = IO.read_prediction_log(spark, p)
    assert back.count() == 1
    assert back.collect()[0]["alteredAttributes"] == "a"


def test_lattice_dot():
    lat = Lattice(
        elements=[frozenset(), frozenset({"a"}), frozenset({"a", "b"})],
        ranks=[0.9, 0.3, 0.8],
    )
    dot = lat.hasse_dot()
    assert dot.startswith("digraph G")
    assert '"{a}" -> "{a, b}"' in dot
    assert lat.top == frozenset({"a", "b"})
    assert lat.bottom == frozenset()
    assert lat.join(frozenset({"a"}), frozenset({"b"})) == frozenset({"a", "b"})
    assert lat.meet(frozenset({"a"}), frozenset({"a", "b"})) == frozenset({"a"})


def test_streaming_dedup_matches_batch(spark, tmp_path):
    from certa_spark.streaming.events import watermarked_dedup

    src = str(tmp_path / "stream_src")
    rows = [
        (1, "2024-01-01 10:00:00", "click"),
        (1, "2024-01-01 10:00:00", "click"),   # exact duplicate
        (2, "2024-01-01 10:05:00", "view"),
    ]
    batch = spark.createDataFrame(rows, ["user_id", "ts", "event_type"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    deduped = watermarked_dedup(stream, ["user_id", "event_type"], "ts", "10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_test").count()
    assert got == 2


def test_streaming_windowed_counts(spark, tmp_path):
    from certa_spark.streaming.events import windowed_counts

    src = str(tmp_path / "stream_src2")
    rows = [
        ("2024-01-01 10:01:00", "click", 1.0),
        ("2024-01-01 10:20:00", "click", 2.0),
        ("2024-01-01 11:05:00", "view", 3.0),
    ]
    batch = spark.createDataFrame(rows, ["ts", "event_type", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    agg = windowed_counts(stream, "1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("wc_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], str(r["window_start"])): r["n"]
        for r in spark.sql("SELECT * FROM wc_test").collect()
    }
    assert got[("click", "2024-01-01 10:00:00")] == 2
    assert got[("view", "2024-01-01 11:00:00")] == 1


def test_multimodal_plumbing(spark):
    from certa_spark.operators.multimodal import (
        extract_features,
        make_fake_media,
        sample_frames,
    )

    media = make_fake_media(spark, n=8, kind="image")
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 8
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic: same input -> same features
    again = extract_features(media, dim=16).collect()
    assert rows[0]["features"] == again[0]["features"]
    with pytest.raises(NotImplementedError):
        extract_features(media, decode="real")

    vids = make_fake_media(spark, n=2, kind="video")
    frames = sample_frames(vids, every_ms=500)
    assert frames.count() == sum(
        (1000 + i) // 500 + 1 for i in range(2)
    )


def test_serialization_formats(spark):
    from certa_spark.functions.serialize import (
        colval_pair,
        mark_tokens,
        unmark_tokens,
    )

    df = spark.createDataFrame(
        [(1, "widget", 2, "gadget")],
        ["ltable_id", "ltable_name", "rtable_id", "rtable_name"],
    )
    s = df.select(colval_pair(df).alias("s")).collect()[0]["s"]
    assert s == "COL name VAL widget \tCOL name VAL gadget "

    marked = df.select(mark_tokens(F.col("ltable_name"), "L", 0).alias("m"))
    assert marked.collect()[0]["m"] == "L0_widget"
    um = marked.select(unmark_tokens(F.col("m")).alias("u")).collect()[0]["u"]
    assert um == "widget"


def test_mllib_matcher_train_eval_save_load(spark, er_tables, tmp_path):
    from certa_spark.models import MLlibMatcher
    from certa_spark.operators.pairs import merge_sources
    from tests.fixtures import make_pairs

    rows_a, rows_b, A, B = er_tables
    pairs = spark.createDataFrame(
        make_pairs(rows_a, rows_b), ["ltable_id", "rtable_id", "label"]
    )
    wide = merge_sources(pairs, A, B)
    train, test = wide.randomSplit([0.7, 0.3], seed=1)
    m = MLlibMatcher().train(train)
    p, r, f1 = m.evaluation(test)
    assert f1 > 0.5, (p, r, f1)  # corrupted-copy matches are learnable
    scored = m.predict(test.limit(3))
    assert {"match_score", "nomatch_score"} <= set(scored.columns)

    path = str(tmp_path / "model")
    m.save(path)
    m2 = MLlibMatcher().load(path)
    a = [r["match_score"] for r in m.predict(test.limit(5)).collect()]
    b = [r["match_score"] for r in m2.predict(test.limit(5)).collect()]
    assert a == b


def test_eval_driver(spark, er_tables):
    from certa_spark.eval import evaluate
    from certa_spark.explainer import CertaExplainer
    from certa_spark.matching import NativeCosineMatcher
    from tests.fixtures import COLS

    rows_a, rows_b, A, B = er_tables
    ex = CertaExplainer(spark, A, B, data_augmentation="no")
    instances = [
        (dict(zip(COLS, rows_a[0])), dict(zip(COLS, rows_b[0]))),
        (dict(zip(COLS, rows_a[1])), dict(zip(COLS, rows_b[1]))),
    ]
    out = evaluate(
        spark, ex, instances, NativeCosineMatcher(), num_triangles=6, parallelism=2
    )
    assert len(out) == 2
    assert (out["latency"] > 0).all()


def test_sessionize_batch_gap_split(spark):
    from certa_spark.streaming.events import sessionize_batch

    rows = [
        # user 1: two events 10 min apart (one session), then one 2h later
        (1, 1, 0, 10.0),
        (2, 1, 600 * 10**9, 5.0),
        (3, 1, 8000 * 10**9, 1.0),
        # user 2: single event
        (4, 2, 0, 7.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_ns long, value double"
    )
    out = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(e).collect()
    }
    assert out == {(1, 1): (2, 15.0), (1, 2): (1, 1.0), (2, 1): (1, 7.0)}


def test_minhash_lsh_finds_exact_dup(spark):
    from certa_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "completely unrelated text about spark catalyst optimizer internals"),
        ],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, threshold=0.9).collect()
    assert [(p["doc_id_a"], p["doc_id_b"], p["est_jaccard"]) for p in pairs] == [
        (1, 2, 1.0)
    ]


def test_lsh_verified_pairs_kills_banding_false_positives(spark):
    """Propose/verify contract: (1) a pair banding proposes whose TRUE
    shingle Jaccard is below the gate is in the candidate set but NOT
    the verified output; (2) a genuine near-dup survives with the
    exact Jaccard value; (3) est_jaccard rides through unchanged from
    stage 1; (4) deterministic under repartition."""
    from certa_spark.operators.dedup import (
        jaccard,
        lsh_verified_pairs,
        minhash_lsh_pairs,
        shingles,
    )

    # base/prefix chosen so the FIXED hash seeds band-collide at true
    # J = 0.5 (deterministic false positive — no randomness anywhere)
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        " lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    prefix = " ".join(base.split()[:11])
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " omega"),  # near-dup: true J = 18/19, above 0.6
            (3, prefix),           # proposed by banding, true J = 0.5
            (4, "completely unrelated text about catalyst optimizer internals"),
        ],
        "doc_id long, text string",
    )
    cand = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    out = lsh_verified_pairs(
        docs, est_threshold=0.0, true_threshold=0.6
    )
    got = {(r["doc_id_a"], r["doc_id_b"]): r for r in out.collect()}

    # the prefix doc shares every one of its shingles with doc 1, so
    # banding proposes (1, 3) — min-hashes agree often — but true
    # Jaccard = |prefix shingles| / |base shingles| < 0.6
    assert (1, 3) in cand
    assert (1, 3) not in got
    # the genuine near-dup survives with the EXACT jaccard value
    assert (1, 2) in got
    exact = docs.filter("doc_id in (1, 2)").select(
        shingles(F.col("text")).alias("sh")
    ).collect()
    inter = len(set(exact[0]["sh"]) & set(exact[1]["sh"]))
    union = len(set(exact[0]["sh"]) | set(exact[1]["sh"]))
    assert got[(1, 2)]["jaccard"] == round(inter / union, 6)
    # est_jaccard rides through from stage 1 unchanged
    est = {
        (r["doc_id_a"], r["doc_id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    for k, r in got.items():
        assert r["est_jaccard"] == est[k]
    # determinism under repartition
    got2 = lsh_verified_pairs(
        docs.repartition(3), est_threshold=0.0, true_threshold=0.6
    ).collect()
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, got2))


def test_knn_lsh_self_neighbor(spark):
    from certa_spark.operators.similarity import knn_lsh

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, -0.1, 0.0, 0.0]),
        (2, [-1.0, 0.0, 0.0, 0.0]),
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    planes = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = knn_lsh(e, e.filter("vec_id = 0"), planes, k=2).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in out]
    # vec 2 is in the opposite sign bucket -> excluded by LSH
    assert got == [(0, 1), (1, 2)]


def test_streaming_session_windows(spark, tmp_path):
    from certa_spark.streaming.events import run_to_memory, sessionized

    src = str(tmp_path / "stream_src3")
    rows = [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:10:00", 2.0),   # same session (gap 30m)
        (1, "2024-01-01 12:00:00", 4.0),   # new session
        (2, "2024-01-01 10:00:00", 8.0),
    ]
    batch = spark.createDataFrame(rows, ["user_id", "ts", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    run_to_memory(sessionized(stream, "30 minutes"), "sess_test", output_mode="complete")
    got = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }
    assert got[(1, "2024-01-01 10:00:00")] == (2, 3.0)
    assert got[(1, "2024-01-01 12:00:00")] == (1, 4.0)
    assert got[(2, "2024-01-01 10:00:00")] == (1, 8.0)


def test_streaming_pair_dedup(spark, tmp_path):
    from certa_spark.streaming.events import run_to_memory, streaming_pair_dedup

    src = str(tmp_path / "stream_src4")
    rows = [
        (1, 10, "2024-01-01 10:00:00"),
        (1, 10, "2024-01-01 10:05:00"),   # duplicate pair inside watermark
        (2, 20, "2024-01-01 10:00:00"),
    ]
    batch = spark.createDataFrame(
        rows, ["ltable_id", "rtable_id", "ts"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    run_to_memory(streaming_pair_dedup(stream), "pair_dedup_test")
    pairs = sorted(
        (r["ltable_id"], r["rtable_id"])
        for r in spark.sql("SELECT * FROM pair_dedup_test").collect()
    )
    assert pairs == [(1, 10), (2, 20)]


def test_knn_ivf_cells_and_recall(spark):
    from certa_spark.operators.similarity import knn_bruteforce, knn_ivf

    # two tight clusters around orthogonal axes; centroids = the axes
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.95, -0.05, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.1, 0.9, 0.0, 0.0]),
        (5, [-0.05, 0.95, 0.0, 0.0]),
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    probe = e.filter("vec_id = 1")
    # nprobe=1: only the probe's own cluster is searched
    out = knn_ivf(e, probe, cents, nprobe=1, k=10).collect()
    assert sorted(r["neighbor_id"] for r in out) == [0, 1, 2]
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])][0] == 1
    # nprobe = #cells: exact — matches brute force
    ivf_all = knn_ivf(e, probe, cents, nprobe=2, k=3).collect()
    bf = knn_bruteforce(e, probe, k=3).collect()
    assert [(r["neighbor_id"], r["sim"]) for r in ivf_all] == [
        (r["neighbor_id"], r["sim"]) for r in bf
    ]


def test_kmeans_centroids_shape(spark):
    from certa_spark.operators.similarity import kmeans_centroids

    vecs = [(i, [float(i % 3), float((i * 7) % 5), 1.0]) for i in range(30)]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(e, k=3, seed=7)
    assert len(cents) == 3 and all(len(c) == 3 for c in cents)
    # deterministic with the same seed
    assert kmeans_centroids(e, k=3, seed=7) == cents


def test_cosine_neardup_pairs(spark):
    from certa_spark.operators.similarity import cosine_neardup_pairs

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, -0.01, 0.0, 0.0]),  # near-dup of 0
        (2, [-1.0, 0.0, 0.0, 0.0]),    # opposite
        (3, [0.0, 0.0, 1.0, 0.0]),     # orthogonal
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    planes = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
              [0.0, 0.0, 1.0, 0.0], [0.0, 1.0, 1.0, 0.0]]
    out = cosine_neardup_pairs(e, planes, bands=2, threshold=0.9).collect()
    assert [(r["a_id"], r["b_id"]) for r in out] == [(0, 1)]
    assert out[0]["sim"] > 0.99


def test_cosine_neardup_blas_matches_exact(spark):
    from certa_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_blas,
    )

    vecs = [
        (i, [float(((i * 3 + j) % 7) - 3) / 3.0 + (0.001 * i if j == 0 else 0.0)
             for j in range(8)])
        for i in range(40)
    ]
    e = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    planes = [[1.0 if j == p else 0.0 for j in range(8)] for p in range(4)]
    exact = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in cosine_neardup_pairs(e, planes, bands=2, threshold=0.8).collect()
    }
    blas = {
        (r["a_id"], r["b_id"]): r["sim"]
        for r in cosine_neardup_pairs_blas(e, planes, bands=2, threshold=0.8).collect()
    }
    assert exact, "fixture must produce near-dup pairs"
    assert set(exact) == set(blas)
    for k in exact:
        assert abs(exact[k] - blas[k]) < 1e-4


def test_stateful_running_zscore_stream_matches_batch(spark, tmp_path):
    import math

    from certa_spark.streaming.stateful import (
        running_zscore_batch,
        running_zscore_stream,
    )

    rows = [
        # (user_id, event_id, ts_ns, value) — user 1 has a late outlier
        (1, 1, 1_000_000_000, 10.0),
        (1, 2, 2_000_000_000, 12.0),
        (1, 3, 3_000_000_000, 11.0),
        (1, 4, 4_000_000_000, 50.0),
        (2, 5, 1_500_000_000, 5.0),
        (2, 6, 2_500_000_000, 5.0),
        (2, 7, 3_500_000_000, 5.0),  # zero variance -> z stays null
    ]
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ns long, value double"
    )
    expected = {
        r["event_id"]: (r["n_prior"], r["z"])
        for r in running_zscore_batch(batch).collect()
    }
    # outlier event 4 scores against prior mean 11, sd 1 -> z = 39
    assert expected[4][1] == 39.0
    assert expected[7] == (2, None)

    src = str(tmp_path / "zsrc")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        running_zscore_stream(stream)
        .writeStream.format("memory")
        .queryName("zs_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: (r["n_prior"], r["z"])
        for r in spark.sql("SELECT * FROM zs_test").collect()
    }
    assert set(got) == set(expected)
    for eid in expected:
        assert got[eid][0] == expected[eid][0]
        ze, zg = expected[eid][1], got[eid][1]
        assert (ze is None) == (zg is None)
        if ze is not None:
            assert math.isclose(ze, zg, abs_tol=1e-3)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(200)],
        "o_key long, cust long, total double",
    )
    items = spark.createDataFrame(
        [(i % 150, i, float(i) / 2) for i in range(400)],
        "o_key long, item long, price double",
    )
    IO.write_bucketed(orders, "t_orders_b", "o_key", 4,
                      sort_col="o_key", path=str(tmp_path / "ob"))
    IO.write_bucketed(items, "t_items_b", "o_key", 4,
                      sort_col="o_key", path=str(tmp_path / "ib"))
    # tiny fixtures would broadcast (which bypasses bucketed scans);
    # force the sort-merge shape these tables would take at scale
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_orders_b").join(spark.table("t_items_b"), "o_key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same join unbucketed DOES shuffle — the bucketing is what saves it
        plain = orders.join(items, "o_key")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
        assert joined.count() == 400  # every item's o_key < 200 exists
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_items_b")


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    from certa_spark.streaming.events import (
        interval_join_batch,
        interval_join_stream,
    )

    clicks_src = str(tmp_path / "clicks_src")
    buys_src = str(tmp_path / "buys_src")
    clicks_rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 11:00:00"),
        (2, "2024-01-01 10:10:00"),
    ]
    buys_rows = [
        (1, "2024-01-01 10:20:00"),   # joins click@10:00 only
        (1, "2024-01-01 11:05:00"),   # joins click@11:00 only
        (2, "2024-01-01 12:00:00"),   # outside 30min -> no join
        (3, "2024-01-01 10:15:00"),   # no matching key
    ]
    clicks = spark.createDataFrame(clicks_rows, ["user_id", "ts"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    buys = spark.createDataFrame(buys_rows, ["user_id", "ts"]).select(
        F.col("user_id").alias("user_id_r"), F.col("ts").cast("timestamp").alias("ts_r")
    )
    clicks.write.mode("overwrite").parquet(clicks_src)
    buys.write.mode("overwrite").parquet(buys_src)

    cs = spark.readStream.schema(clicks.schema).parquet(clicks_src)
    bs = spark.readStream.schema(buys.schema).parquet(buys_src)
    joined = interval_join_stream(cs, bs)
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["user_id"], str(r["ts"]), str(r["ts_r"]))
        for r in spark.sql("SELECT * FROM ssj_test").collect()
    )
    want = sorted(
        (r["user_id"], str(r["ts"]), str(r["ts_r"]))
        for r in interval_join_batch(clicks, buys).collect()
    )
    assert got == want
    assert len(got) == 2


def test_pq_adc_finds_cluster_neighbors(spark):
    import random

    from certa_spark.operators.similarity import knn_pq_adc, pq_encode

    rnd = random.Random(7)
    # two well-separated 16-dim clusters
    def vec(center):
        return [center + rnd.uniform(-0.05, 0.05) for _ in range(16)]

    rows = [(i, vec(0.0)) for i in range(20)] + [(i, vec(5.0)) for i in range(20, 40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # codebooks: 4 subspaces x 4 dims, codes from the first 2 vectors
    # of each cluster
    cb_vecs = [rows[0][1], rows[1][1], rows[20][1], rows[21][1]]
    codebooks = [[v[s * 4 : (s + 1) * 4] for v in cb_vecs] for s in range(4)]

    codes = pq_encode(df, codebooks)
    assert codes.count() == 40 * 4  # one code per (vec, subspace)

    probes = df.filter(F.col("vec_id").isin(0, 25))
    res = knn_pq_adc(df, probes, codebooks, k=5)
    got = {
        p: [r["neighbor_id"] for r in rows_]
        for p, rows_ in (
            (p, [r for r in res.collect() if r["probe_id"] == p]) for p in (0, 25)
        )
    }
    # every approximate neighbor comes from the probe's own cluster
    assert all(n < 20 for n in got[0])
    assert all(n >= 20 for n in got[25])


def test_pq_adc_dense_fold_matches_relational_definition(spark):
    """r12 internals change: knn_pq_adc pivots the per-probe distance
    table into a dense LUT array and computes adist as an inline
    decimal fold instead of a join + groupBy sum. The fold must be
    BIT-identical to the relational definition: per (probe, neighbor),
    adist == round(sum_s Decimal(d2_s), 6) over the per-subspace
    rounded distances, with the corpus codes equal to pq_encode's
    argmin element-for-element."""
    import random
    from decimal import Decimal

    from certa_spark.operators.similarity import knn_pq_adc, pq_encode

    rnd = random.Random(11)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(16)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb_vecs = [rows[0][1], rows[7][1], rows[13][1], rows[21][1]]
    m, dsub = 4, 4
    codebooks = [[v[s * dsub : (s + 1) * dsub] for v in cb_vecs]
                 for s in range(m)]
    probes = df.filter(F.col("vec_id").isin(3, 17))

    # corpus codes: the dense path must agree with pq_encode exactly
    enc = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in pq_encode(df, codebooks).collect()
    }

    def d2(a, b):
        return round(sum((x - y) * (x - y) for x, y in zip(a, b)), 6)

    res = knn_pq_adc(df, probes, codebooks, k=30).collect()
    assert len(res) == 2 * 30
    by_vec = dict(rows)
    for r in res:
        codes = [enc[(r["neighbor_id"], s)] for s in range(m)]
        pv = by_vec[r["probe_id"]]
        want = float(
            sum(
                Decimal(
                    str(
                        d2(
                            pv[s * dsub : (s + 1) * dsub],
                            codebooks[s][codes[s]],
                        )
                    )
                )
                for s in range(m)
            )
        )
        assert r["adist"] == want, (r, want)


def test_streaming_upsert_sink_latest_wins(spark, tmp_path):
    from certa_spark.streaming.events import upsert_sink

    src = str(tmp_path / "upsert_src")
    dst = str(tmp_path / "upsert_dst")
    rows = [
        (1, 1, "a"),
        (1, 3, "c"),   # latest for key 1
        (1, 2, "b"),
        (2, 1, "x"),
    ]
    batch = spark.createDataFrame(rows, ["k", "ver", "val"])
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    upsert_sink(stream, dst, ["k"], "ver")
    got = {r["k"]: (r["ver"], r["val"]) for r in spark.read.parquet(dst).collect()}
    assert got == {1: (3, "c"), 2: (1, "x")}

    # second wave updates key 2, leaves key 1 untouched
    spark.createDataFrame([(2, 5, "y")], ["k", "ver", "val"]).write.mode(
        "append"
    ).parquet(src)
    stream2 = spark.readStream.schema(batch.schema).parquet(src)
    upsert_sink(stream2, dst, ["k"], "ver", query_name="upsert_sink2")
    got = {r["k"]: (r["ver"], r["val"]) for r in spark.read.parquet(dst).collect()}
    assert got == {1: (3, "c"), 2: (5, "y")}


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe searches a superset of buckets, so its top-k recall
    vs brute force can never be worse than single-probe LSH."""
    import random

    from pyspark.sql import functions as F

    from certa_spark.operators.similarity import (
        knn_bruteforce,
        knn_lsh,
        knn_lsh_multiprobe,
    )

    rng = random.Random(5)
    dim, n = 16, 200
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(4)]
    probes = e.filter(F.col("vec_id") % 40 == 0)

    def pairs(df):
        return {(r["probe_id"], r["neighbor_id"]) for r in df.collect()}

    truth = pairs(knn_bruteforce(e, probes, k=5))
    single = pairs(knn_lsh(e, probes, planes, k=5))
    multi = pairs(knn_lsh_multiprobe(e, probes, planes, k=5))
    assert len(multi & truth) >= len(single & truth)
    # self-match is always in its own bucket: perfect self-recall
    for pid in [r["vec_id"] for r in probes.collect()]:
        assert (pid, pid) in multi


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    from certa_spark.streaming.events import enrich_stream_static

    src = str(tmp_path / "enrich_src")
    rows = [
        (1, "2024-01-01 10:00:00", 10.0),
        (2, "2024-01-01 10:05:00", 20.0),
        (3, "2024-01-01 10:06:00", 30.0),   # no dim row -> null segment
    ]
    batch = spark.createDataFrame(rows, ["user_id", "ts", "value"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch.write.mode("overwrite").parquet(src)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], ["user_id", "segment"]
    )
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        enrich_stream_static(stream, dim, "user_id")
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: r["segment"]
        for r in spark.sql("SELECT * FROM enrich_test").collect()
    }
    exp = {
        r["user_id"]: r["segment"]
        for r in enrich_stream_static(batch, dim, "user_id").collect()
    }
    assert got == exp == {1: "gold", 2: "silver", 3: None}


def test_observed_filter_funnel(spark):
    """Observation metrics ride the pipeline's single action — per-stage
    in/kept counts with no extra count() jobs."""
    from certa_spark.operators.observe import funnel_report, observed_filter

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 10).alias("m")
    )
    s1, o1 = observed_filter(df, "keep_even", F.col("m") % 2 == 0)
    s2, o2 = observed_filter(s1, "keep_small", F.col("m") < 4)
    n = s2.count()  # the ONLY action
    funnel = funnel_report([o1, o2])
    assert funnel == {
        "keep_even_in": 1000,
        "keep_even_kept": 500,
        "keep_small_in": 500,
        "keep_small_kept": 200,
    }
    assert n == 200


def test_jsonl_roundtrip_and_corrupt_capture(spark, tmp_path):
    from certa_spark.io import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "hello world", ["a", "b"], {"k": 2}),
         (2, "second doc", [], {"k": 0})],
        "doc_id long, text string, tags array<string>, meta map<string,long>",
    )
    p = str(tmp_path / "docs.jsonl")
    write_jsonl(df, p, compression=None)
    back = read_jsonl(
        spark, p,
        schema="doc_id long, text string, tags array<string>, "
               "meta map<string,long>",
    )
    got = {r["doc_id"]: (r["text"], r["tags"], dict(r["meta"])) for r in back.collect()}
    assert got == {1: ("hello world", ["a", "b"], {"k": 2}),
                   2: ("second doc", [], {"k": 0})}

    # corrupt line degrades to a countable row, not a failed job
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-0.json").write_text(
        '{"doc_id": 3, "text": "fine"}\n{not json at all\n'
    )
    schema = "doc_id long, text string, _corrupt_record string"
    r = read_jsonl(spark, str(bad), schema=schema).cache()
    assert r.filter("_corrupt_record IS NOT NULL").count() == 1
    assert r.filter("doc_id = 3").count() == 1


def test_orc_roundtrip(spark, tmp_path):
    from certa_spark.io import read_orc, write_orc
    from pyspark.sql import functions as F

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
    )
    p = str(tmp_path / "orc_t")
    write_orc(df, p)
    back = read_orc(spark, p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # pushdown reaches the ORC scan
    plan = back.filter(F.col("k") == 3).select("id")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "pushed" in plan.lower()


def test_compact_parquet_reduces_files(spark, tmp_path):
    import glob
    from certa_spark.io import compact_parquet

    src = str(tmp_path / "many")
    # many tiny files (hash repartition leaves some partitions empty,
    # which write no file — dozens is plenty for the test)
    spark.range(0, 64).repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*")) > 20
    dst = str(tmp_path / "compact")
    n = compact_parquet(spark, src, dst, target_mb=128)
    assert n == 1
    assert len(glob.glob(f"{dst}/part-*")) == 1
    a = sorted(r["id"] for r in spark.read.parquet(src).collect())
    b = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == b


def test_streaming_hll_matches_batch(spark, tmp_path):
    """Streaming register maintenance == batch sketch over the same
    data (mergeable-sketch property), including the estimate."""
    from certa_spark.operators.sketch import hll_estimate_by, hll_registers_by
    from certa_spark.streaming.events import streaming_hll_registers
    from pyspark.sql import functions as F

    src = str(tmp_path / "hll_src")
    rows = [
        (f"2024-01-01 10:{m:02d}:00", f"u{m % 37}") for m in range(60)
    ] + [
        (f"2024-01-01 11:{m:02d}:00", f"u{m % 11}") for m in range(60)
    ]
    batch = spark.createDataFrame(rows, ["ts", "user"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    regs = streaming_hll_registers(stream, "user", window_duration="1 hour")
    q = (
        regs.writeStream.format("memory").queryName("hll_regs")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hll_regs")

    want = hll_registers_by(
        batch.withColumn(
            "window_start", F.date_trunc("hour", "ts")
        ),
        "user",
        ["window_start"],
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    est = {
        str(r["window_start"]): r["hll_estimate"]
        for r in hll_estimate_by(got, ["window_start"]).collect()
    }
    # 37 and 11 distinct users; linear counting is near-exact here
    assert abs(est["2024-01-01 10:00:00"] - 37) < 2
    assert abs(est["2024-01-01 11:00:00"] - 11) < 1


def test_streaming_funnel_matches_batch_twin(spark, tmp_path):
    """Stateful streaming funnel == batch funnel_user_times on a
    single-batch replay (same completers, same first/last step times)."""
    import datetime as dt
    from certa_spark.operators.funnel import funnel_user_times
    from certa_spark.streaming.stateful import funnel_stream
    from pyspark.sql import functions as F

    ns = 1_000_000_000
    rows = []
    eid = 0
    # u1 completes; u2 out of order; u3 exceeds horizon at step C;
    # u4 completes with noise events interleaved
    script = {
        1: [("A", 0), ("B", 60), ("C", 120)],
        2: [("B", 0), ("A", 60), ("C", 120)],
        3: [("A", 0), ("B", 60), ("C", 999_999)],
        4: [("A", 0), ("X", 30), ("B", 60), ("X", 90), ("C", 120)],
    }
    for u, evs in script.items():
        for t, m in evs:
            rows.append((u, eid, t, m * 60 * ns))
            eid += 1
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_ns long"
    )
    src = str(tmp_path / "funnel_src")
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    horizon = 72 * 3600 * ns
    out = funnel_stream(stream, ["A", "B", "C"], horizon_ns=horizon)
    q = (
        out.writeStream.format("memory").queryName("funnel_s")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["completed_ns"], r["duration_ns"])
        for r in spark.sql("SELECT * FROM funnel_s").collect()
    }

    bt = batch.withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
    want_rows = funnel_user_times(
        bt, ["A", "B", "C"], horizon_hours=72
    ).collect()
    want = {
        r["u"]: (
            int(r["t_3"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e9),
            int(
                (r["t_3"] - r["t_1"]).total_seconds() * 1e9
            ),
        )
        for r in want_rows
    }
    assert set(got) == set(want) == {1, 4}
    for u in got:
        assert got[u][1] == want[u][1]  # durations identical


def test_streaming_oph_matches_batch_and_jaccard(spark, tmp_path):
    """Streaming OPH register maintenance == batch sketch over the same
    data, and the register tables estimate Jaccard across windows."""
    from certa_spark.operators.sketch import oph_jaccard, oph_registers
    from certa_spark.streaming.events import streaming_oph_registers
    from pyspark.sql import functions as F

    src = str(tmp_path / "oph_src")
    # hour 10: users u0..u36; hour 11: u0..u10 (overlap 11, union 37)
    rows = [
        (f"2024-01-01 10:{m:02d}:00", f"u{m % 37}") for m in range(60)
    ] + [
        (f"2024-01-01 11:{m:02d}:00", f"u{m % 11}") for m in range(60)
    ]
    batch = spark.createDataFrame(rows, ["ts", "user"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    regs = streaming_oph_registers(stream, "user", window_duration="1 hour")
    q = (
        regs.writeStream.format("memory").queryName("oph_regs")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM oph_regs")
    want = oph_registers(
        batch.withColumn("window_start", F.date_trunc("hour", "ts")),
        "user",
        ["window_start"],
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    a = got.filter(F.col("window_start") == "2024-01-01 10:00:00")
    b = got.filter(F.col("window_start") == "2024-01-01 11:00:00")
    est = oph_jaccard(a, b).first()
    true_j = 11 / 37
    # sparse-bin estimator over k=128 bins: generous band, but a broken
    # sketch (J=0 or J=1) fails it decisively
    assert abs(est["jaccard_est"] - true_j) < 0.2
    assert est["filled"] > 0


def test_streaming_upsert_checkpoint_recovery(spark, tmp_path):
    """Restart semantics: the checkpoint remembers processed files, so
    a restarted query with no new data is a no-op, and a late LOWER
    version for a merged key cannot regress the stored row (max-version
    + checkpointed offsets = idempotent replays)."""
    from certa_spark.streaming.events import upsert_sink

    src = str(tmp_path / "rec_src")
    dst = str(tmp_path / "rec_dst")
    batch = spark.createDataFrame([(1, 5, "v5")], ["k", "ver", "val"])
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    upsert_sink(stream, dst, ["k"], "ver", query_name="rec1")
    before = sorted(map(tuple, spark.read.parquet(dst).collect()))

    # restart with the SAME checkpoint and no new files: no-op
    stream2 = spark.readStream.schema(batch.schema).parquet(src)
    upsert_sink(stream2, dst, ["k"], "ver", query_name="rec2")
    after = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert after == before

    # late arrival with a LOWER version: merged batch must lose to the
    # stored row
    spark.createDataFrame([(1, 2, "stale")], ["k", "ver", "val"]).write.mode(
        "append"
    ).parquet(src)
    stream3 = spark.readStream.schema(batch.schema).parquet(src)
    upsert_sink(stream3, dst, ["k"], "ver", query_name="rec3")
    got = {r["k"]: (r["ver"], r["val"]) for r in spark.read.parquet(dst).collect()}
    assert got == {1: (5, "v5")}


def test_ivfpq_adc_composite(spark):
    """IVF-PQ composite: residual-coded ADC must keep neighbors inside
    the probe's cluster, only search probed cells, and beat flat PQ's
    quantization error on the same code budget (residuals are smaller
    than raw vectors)."""
    import random

    from certa_spark.operators.similarity import knn_ivfpq_adc, knn_pq_adc

    rnd = random.Random(11)

    def vec(center):
        return [center + rnd.uniform(-0.2, 0.2) for _ in range(16)]

    rows = [(i, vec(0.0)) for i in range(20)] + [
        (i, vec(5.0)) for i in range(20, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # coarse quantizer: one seed vector per cluster
    centroids = [rows[0][1], rows[20][1]]
    # residual codebooks from 4 seed vectors' residuals to their centroid
    def resid(v, c):
        return [x - y for x, y in zip(v, c)]

    cb_vecs = [
        resid(rows[1][1], centroids[0]),
        resid(rows[2][1], centroids[0]),
        resid(rows[21][1], centroids[1]),
        resid(rows[22][1], centroids[1]),
    ]
    codebooks = [[v[s * 4 : (s + 1) * 4] for v in cb_vecs] for s in range(4)]

    probes = df.filter(F.col("vec_id").isin(0, 25))
    res = knn_ivfpq_adc(df, probes, centroids, codebooks, k=5, nprobe=1)
    rows_ = res.collect()
    got = {
        p: [r["neighbor_id"] for r in rows_ if r["probe_id"] == p]
        for p in (0, 25)
    }
    # nprobe=1 on separated clusters: every neighbor from the probe's
    # own cluster (non-probed cells are never scanned)
    assert len(got[0]) == 5 and all(n < 20 for n in got[0])
    assert len(got[25]) == 5 and all(n >= 20 for n in got[25])

    # residual coding beats flat PQ with the SAME codebook geometry:
    # flat PQ must spend codes on the cluster offset, so its top-1
    # approximate self-distance is far larger than IVF-PQ's
    flat_cb = [
        [rows[1][1][s * 4 : (s + 1) * 4] for _ in range(1)]
        + [rows[21][1][s * 4 : (s + 1) * 4]]
        for s in range(4)
    ]
    flat = knn_pq_adc(df, probes, flat_cb, k=1)
    ivf_self = {r["probe_id"]: r["adist"] for r in rows_ if r["rank"] == 1}
    flat_self = {r["probe_id"]: r["adist"] for r in flat.collect()}
    assert all(ivf_self[p] <= flat_self[p] for p in (0, 25))

    # determinism under repartition
    res2 = knn_ivfpq_adc(
        df.repartition(7), probes, centroids, codebooks, k=5, nprobe=1
    )
    assert sorted(map(tuple, res.collect())) == sorted(
        map(tuple, res2.collect())
    )


def test_streaming_heavy_hitters_bound_and_exact_smallcard(spark, tmp_path):
    """Streaming MG twin: per-window summaries obey the MG bound
    (superset of every item with freq > n/(k+1)); with cardinality
    <= k the summary is EXACT per window; state stays <= k rows."""
    from certa_spark.streaming.stateful import heavy_hitters_stream

    src = str(tmp_path / "hh_src")
    # hour 10: skewed tokens over cardinality 40 (> k=16)
    # hour 11: cardinality 5 (< k) -> exact
    rows = (
        [(f"2024-01-01 10:{m:02d}:00", "hot") for m in range(30)]
        + [
            (f"2024-01-01 10:{m:02d}:30", f"t{m}")
            for m in range(40)
        ]
        + [
            (f"2024-01-01 11:{m:02d}:00", f"w{m % 5}")
            for m in range(50)
        ]
    )
    batch = spark.createDataFrame(rows, ["ts", "tok"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = heavy_hitters_stream(stream, "tok", window_duration="1 hour", k=16)
    q = (
        out.writeStream.format("memory").queryName("hh_stream")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    import pandas as pd

    got = spark.sql(
        "SELECT * FROM hh_stream"
    ).toPandas()
    # keep only the LAST emitted summary per window (update mode may
    # emit once per micro-batch)
    h10 = got[got["window_start"].astype(str).str.contains("10:00")]
    h11 = got[got["window_start"].astype(str).str.contains("11:00")]
    # hour 10: n=70, k=16 -> every item with freq > 70/17=4.1 present
    assert len(h10) <= 16
    assert "hot" in set(h10["item"])
    hot_c = int(h10[h10["item"] == "hot"]["c"].iloc[0])
    assert 30 - 70 / 17 <= hot_c <= 30
    # hour 11: cardinality 5 < k -> exact counts
    want = {f"w{i}": 10 for i in range(5)}
    got11 = dict(zip(h11["item"], h11["c"].astype(int)))
    assert got11 == want


def test_streaming_heavy_hitters_null_rows(spark, tmp_path):
    """r6 fix regression (stateful.py dropna in the MG fold): null
    tokens in the stream must not fabricate a 'None' heavy hitter, and
    the surviving real counts must match the batch operator's on the
    same rows."""
    from certa_spark.operators.sketch import misra_gries
    from certa_spark.streaming.stateful import heavy_hitters_stream

    src = str(tmp_path / "hh_null_src")
    rows = (
        [("2024-01-01 10:00:00", "hot")] * 20
        + [("2024-01-01 10:30:00", None)] * 50
        + [(f"2024-01-01 10:{m:02d}:00", f"w{m % 3}") for m in range(12)]
    )
    batch = spark.createDataFrame(rows, ["ts", "tok"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = heavy_hitters_stream(stream, "tok", window_duration="1 hour", k=16)
    q = (
        out.writeStream.format("memory").queryName("hh_null_stream")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hh_null_stream").toPandas()
    assert "None" not in set(got["item"])
    # cardinality 4 <= k: the final summary is EXACT and equals the
    # batch operator's result on the same rows
    stream_final = dict(zip(got["item"], got["c"].astype(int)))
    batch_got = {
        r["item"]: r["c"] for r in misra_gries(batch, "tok", k=16).collect()
    }
    assert stream_final == batch_got
    assert stream_final["hot"] == 20


def test_cosine_neardup_blas_exact_equality_registry_planes(spark):
    """ADVICE r6 closure: the r5 registry swap to the BLAS scorer is
    safe at the ORACLE-HASH grain only if fold and BLAS sims are
    EXACTLY equal after rounding — not 1e-4-close. Pin that on the
    actual registry plane sets and banding, at every SF's embeddings
    table (sf0.001/0.01 share one 500-row table; sf0.1 is 2000 rows):
    both registry configurations (3x4 planes @ round 6, 3x2 @ round 4)
    must produce bitwise-identical (a_id, b_id, sim) sets."""
    from certa_spark.operators.similarity import (
        cosine_neardup_pairs,
        cosine_neardup_pairs_blas,
    )
    from certa_spark.queries import (
        _ANN_PLANES,
        _NEARDUP_BANDS,
        _NEARDUP_PLANES,
        _NEARDUP_TAU,
        _t,
    )

    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.1",
    ):
        e = _t(spark, sf_dir, "embeddings").select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        for planes, rnd in ((_NEARDUP_PLANES, 6), (_ANN_PLANES, 4)):
            fold = {
                (r["a_id"], r["b_id"]): r["sim"]
                for r in cosine_neardup_pairs(
                    e, planes, _NEARDUP_BANDS, _NEARDUP_TAU, round_to=rnd
                ).collect()
            }
            blas = {
                (r["a_id"], r["b_id"]): r["sim"]
                for r in cosine_neardup_pairs_blas(
                    e, planes, _NEARDUP_BANDS, _NEARDUP_TAU, round_to=rnd
                ).collect()
            }
            assert fold, f"{sf_dir} planes@{rnd}: fixture produced no pairs"
            assert fold == blas, (
                f"{sf_dir} planes@{rnd}: fold and BLAS diverge at the "
                f"rounded grain"
            )


def test_streaming_zscore_multichunk_order_and_nulls(spark, tmp_path):
    """r7 review fixes pinned: (a) a group spanning multiple Arrow
    chunks must fold in (ts_ns, event_id) order — per-chunk sorting
    would score chunk-2 rows with earlier timestamps after chunk-1
    rows; (b) null values must be emitted (z null, n_prior = prior
    NON-null count) without touching the Welford state. Equality with
    the batch twin is the oracle for both."""
    from certa_spark.streaming.stateful import (
        running_zscore_batch,
        running_zscore_stream,
    )

    ns = 1_000_000_000
    rows = []
    # one user, 40 events written in REVERSE time order so arrival
    # order disagrees with event time, with nulls sprinkled in
    for i in range(40):
        t = (40 - i) * 60 * ns
        v = None if i % 7 == 3 else float((i * 13) % 11) + 0.25
        rows.append((1, 1000 + i, t, v))
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ns long, value double"
    )
    src = str(tmp_path / "zmc_src")
    batch.write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        # force the 40-row group to arrive as ~6 Arrow chunks
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
        stream = spark.readStream.schema(batch.schema).parquet(src)
        out = running_zscore_stream(stream)
        q = (
            out.writeStream.format("memory").queryName("zmc_stream")
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(120)
        got = {
            r["event_id"]: (r["n_prior"], r["z"], r["value"])
            for r in spark.sql("SELECT * FROM zmc_stream").collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    want = {
        r["event_id"]: (r["n_prior"], r["z"], r["value"])
        for r in running_zscore_batch(batch).collect()
    }
    assert got == want
    # the nulls really are in the fixture and really emit null z
    nulls = [k for k, v in want.items() if v[2] is None]
    assert nulls and all(got[k][1] is None for k in nulls)


def test_streaming_funnel_multichunk_order(spark, tmp_path):
    """Funnel twin of the multi-chunk ordering fix: steps written in
    reverse arrival order across several Arrow chunks must still
    complete (the fold sorts the whole group once)."""
    from certa_spark.operators.funnel import funnel_user_times
    from certa_spark.streaming.stateful import funnel_stream
    from pyspark.sql import functions as F

    ns = 1_000_000_000
    rows = []
    eid = 0
    # 12 users, each A->B->C within horizon, rows appended in reverse
    # global time order; plus null-type noise rows
    for u in range(1, 13):
        for step, t in (("C", 300 + u), ("B", 200 + u), ("A", 100 + u)):
            rows.append((u, eid, step, t * 60 * ns))
            eid += 1
        rows.append((u, eid, None, (250 + u) * 60 * ns))
        eid += 1
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_ns long"
    )
    src = str(tmp_path / "fmc_src")
    batch.write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
        stream = spark.readStream.schema(batch.schema).parquet(src)
        out = funnel_stream(
            stream, ["A", "B", "C"], horizon_ns=72 * 3600 * ns
        )
        q = (
            out.writeStream.format("memory").queryName("fmc_stream")
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(120)
        got = {
            r["user_id"]: (r["completed_ns"], r["duration_ns"])
            for r in spark.sql("SELECT * FROM fmc_stream").collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    bt = batch.withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
    want = {}
    for r in funnel_user_times(bt, ["A", "B", "C"], horizon_hours=72).collect():
        import datetime as dt

        t3 = int(r["t_3"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e9)
        t1 = int(r["t_1"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e9)
        want[r["u"]] = (t3, t3 - t1)
    assert len(want) == 12
    assert got == want


def _write_slab_files(spark, batch, slabs, dest):
    """Write ``batch`` as one parquet FILE per slab predicate, with
    strictly increasing mtimes so FileStreamSource (oldest-first)
    ingests them in slab order under maxFilesPerTrigger=1."""
    import glob
    import os
    import shutil

    os.makedirs(dest, exist_ok=True)
    t0 = 1_700_000_000
    for i, pred in enumerate(slabs):
        tmp = f"{dest}/_slab{i}"
        batch.filter(pred).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        final = f"{dest}/{i:02d}.parquet"
        shutil.move(part, final)
        shutil.rmtree(tmp)
        os.utime(final, (t0 + 100 * i, t0 + 100 * i))


def _drain_batches(spark, out, name, nfiles):
    """Start an AvailableNow drain with maxFilesPerTrigger handled by
    the caller's source; return (rows, n_data_batches)."""
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    n_data = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
    return spark.sql(f"SELECT * FROM {name}").collect(), n_data


def test_streaming_zscore_multibatch_in_order_equals_batch(spark, tmp_path):
    """r7 verdict ask #2, part 1: the SAME fixture drained as SEVERAL
    micro-batches (one file per trigger, files in event-time order)
    must equal the batch twin — the Welford state carries across batch
    boundaries and in-order arrival keeps the fold total-ordered."""
    from certa_spark.streaming.stateful import (
        running_zscore_batch,
        running_zscore_stream,
    )
    from pyspark.sql import functions as F

    ns = 1_000_000_000
    rows = []
    for u in (1, 2):
        for i in range(30):
            v = None if i % 11 == 5 else float((u * 7 + i * 13) % 9) + 0.5
            rows.append((u, u * 1000 + i, (i + 1) * 60 * ns, v))
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ns long, value double"
    )
    src = str(tmp_path / "zmb_src")
    # three time slabs: [0,10), [10,20), [20,30) minutes-index
    _write_slab_files(
        spark, batch,
        [F.col("ts_ns") <= 10 * 60 * ns,
         (F.col("ts_ns") > 10 * 60 * ns) & (F.col("ts_ns") <= 20 * 60 * ns),
         F.col("ts_ns") > 20 * 60 * ns],
        src,
    )
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    got_rows, n_data = _drain_batches(
        spark, running_zscore_stream(stream), "zmb_stream", 3
    )
    assert n_data >= 2, "fixture must actually drain as multiple batches"
    got = {r["event_id"]: (r["n_prior"], r["z"]) for r in got_rows}
    want = {
        r["event_id"]: (r["n_prior"], r["z"])
        for r in running_zscore_batch(batch).collect()
    }
    assert got == want


def test_streaming_zscore_multibatch_late_rows_score_at_arrival(
    spark, tmp_path
):
    """r7 verdict ask #2, part 2 — the state-carry CONTRACT when a
    later micro-batch delivers EARLIER event times: late rows score
    against the state as of their ARRIVAL (per-batch (ts, event_id)
    sort, batches folded in arrival order), not a global re-sort. The
    oracle is the batch twin run over arrival order (ts_ns replaced by
    arrival rank), which is exactly that fold — independent of the
    stream implementation."""
    from certa_spark.streaming.stateful import (
        running_zscore_batch,
        running_zscore_stream,
    )
    from pyspark.sql import functions as F

    ns = 1_000_000_000
    rows = []
    # user 1: batch A has minutes 20..29, batch B has LATE minutes
    # 1..10 (arrive after), batch C has minutes 30..39
    for i in range(10):
        rows.append((1, 100 + i, (20 + i) * 60 * ns, float(i % 5) + 1.0, 0))
        rows.append((1, 200 + i, (1 + i) * 60 * ns, float(i % 7) + 2.0, 1))
        rows.append((1, 300 + i, (30 + i) * 60 * ns, float(i % 3) + 0.5, 2))
    batch = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts_ns long, value double, slab int",
    )
    src = str(tmp_path / "zlate_src")
    _write_slab_files(
        spark, batch,
        [F.col("slab") == 0, F.col("slab") == 1, F.col("slab") == 2],
        src,
    )
    stream = (
        spark.readStream
        .schema("user_id long, event_id long, ts_ns long, value double")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    got_rows, n_data = _drain_batches(
        spark, running_zscore_stream(stream), "zlate_stream", 3
    )
    assert n_data == 3
    got = {r["event_id"]: (r["n_prior"], r["z"]) for r in got_rows}
    # arrival-order oracle: slab-major, (ts, event_id) within a slab
    arr = batch.select(
        "user_id", "event_id",
        (F.col("slab").cast("long") * 10_000_000_000_000
         + F.col("ts_ns")).alias("ts_ns"),
        "value",
    )
    want = {
        r["event_id"]: (r["n_prior"], r["z"])
        for r in running_zscore_batch(arr).collect()
    }
    assert got == want
    # and it genuinely differs from the global-time-order fold —
    # otherwise this test wouldn't pin the arrival semantics at all
    glob_order = {
        r["event_id"]: (r["n_prior"], r["z"])
        for r in running_zscore_batch(batch.drop("slab")).collect()
    }
    assert got != glob_order


def test_streaming_funnel_multibatch_state_carry(spark, tmp_path):
    """Funnel twin of the multi-batch drain: steps split ACROSS
    micro-batches (view in batch 1, click in batch 2, purchase in
    batch 3) still complete — the four-longs state carries the stage
    across batch boundaries — and the in-order multi-batch result
    equals the batch twin."""
    from certa_spark.operators.funnel import funnel_user_times
    from certa_spark.streaming.stateful import funnel_stream
    from pyspark.sql import functions as F

    ns = 1_000_000_000
    rows, eid = [], 0
    # 8 users complete across slabs; user 9 never clicks (no output);
    # user 10 clicks past the horizon (failed)
    for u in range(1, 9):
        rows.append((u, eid, "A", (10 + u) * 60 * ns, 0)); eid += 1
        rows.append((u, eid, "B", (500 + u) * 60 * ns, 1)); eid += 1
        rows.append((u, eid, "C", (900 + u) * 60 * ns, 2)); eid += 1
    rows.append((9, eid, "A", 15 * 60 * ns, 0)); eid += 1
    rows.append((10, eid, "A", 16 * 60 * ns, 0)); eid += 1
    rows.append((10, eid, "B", (16 + 80 * 60) * 60 * ns, 2)); eid += 1
    batch = spark.createDataFrame(
        rows,
        "user_id long, event_id long, event_type string, ts_ns long, slab int",
    )
    src = str(tmp_path / "fmb_src")
    _write_slab_files(
        spark, batch,
        [F.col("slab") == 0, F.col("slab") == 1, F.col("slab") == 2],
        src,
    )
    stream = (
        spark.readStream
        .schema("user_id long, event_id long, event_type string, ts_ns long")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    got_rows, n_data = _drain_batches(
        spark,
        funnel_stream(stream, ["A", "B", "C"], horizon_ns=72 * 3600 * ns),
        "fmb_stream", 3,
    )
    assert n_data == 3
    got = {
        r["user_id"]: (r["completed_ns"], r["duration_ns"])
        for r in got_rows
    }
    bt = batch.withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
    import datetime as dt

    want = {}
    for r in funnel_user_times(bt, ["A", "B", "C"], horizon_hours=72).collect():
        t3 = int(r["t_3"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e9)
        t1 = int(r["t_1"].replace(tzinfo=dt.timezone.utc).timestamp() * 1e9)
        want[r["u"]] = (t3, t3 - t1)
    assert set(want) == set(range(1, 9))
    assert got == want


def test_stateful_operators_under_rocksdb_state_store(spark, tmp_path):
    """The 100TB state story, executed: the custom stateful operators
    run under the RocksDB state-store provider (off-heap, spillable —
    what a production cluster uses for large keyed state) and produce
    EXACTLY the default-provider/batch-twin results, across a
    multi-batch drain with state carry. Guards against the operators
    accidentally depending on HDFSBackedStateStore semantics."""
    from pyspark.sql import functions as F

    from certa_spark.streaming.stateful import (
        funnel_stream,
        running_zscore_batch,
        running_zscore_stream,
    )

    ns = 1_000_000_000
    rows = []
    for u in (1, 2, 3):
        for i in range(20):
            rows.append((u, u * 100 + i, (i + 1) * 60 * ns,
                         float((u * 3 + i) % 5) + 0.5))
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ns long, value double"
    )
    src = str(tmp_path / "rdb_src")
    _write_slab_files(
        spark, batch,
        [F.col("ts_ns") <= 10 * 60 * ns, F.col("ts_ns") > 10 * 60 * ns],
        src,
    )
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1").parquet(src)
        )
        got_rows, n_data = _drain_batches(
            spark, running_zscore_stream(stream), "rdb_z", 2
        )
        assert n_data == 2, "must exercise cross-batch RocksDB state"
        got = {r["event_id"]: (r["n_prior"], r["z"]) for r in got_rows}
        want = {
            r["event_id"]: (r["n_prior"], r["z"])
            for r in running_zscore_batch(batch).collect()
        }
        assert got == want

        # funnel: A in batch 1, B/C in batch 2 — stage carried in RocksDB
        frows = []
        for u in (1, 2):
            frows.append((u, u * 10, "A", (5 + u) * 60 * ns, 0))
            frows.append((u, u * 10 + 1, "B", (700 + u) * 60 * ns, 1))
            frows.append((u, u * 10 + 2, "C", (800 + u) * 60 * ns, 1))
        fb = spark.createDataFrame(
            frows,
            "user_id long, event_id long, event_type string, "
            "ts_ns long, slab int",
        )
        fsrc = str(tmp_path / "rdb_fsrc")
        _write_slab_files(
            spark, fb, [F.col("slab") == 0, F.col("slab") == 1], fsrc
        )
        fstream = (
            spark.readStream
            .schema("user_id long, event_id long, event_type string, "
                    "ts_ns long")
            .option("maxFilesPerTrigger", "1").parquet(fsrc)
        )
        fgot, fn = _drain_batches(
            spark,
            funnel_stream(fstream, ["A", "B", "C"],
                          horizon_ns=72 * 3600 * ns),
            "rdb_f", 2,
        )
        assert fn == 2
        assert {
            (r["user_id"], r["duration_ns"]) for r in fgot
        } == {(1, (801 - 6) * 60 * ns), (2, (802 - 7) * 60 * ns)}
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )


def test_running_zscore_transformwithstate_equals_batch(spark, tmp_path):
    """Spark 4's new arbitrary-state API (transformWithStateInPandas +
    StatefulProcessor, typed ValueState) must produce EXACTLY the
    applyInPandasWithState/batch-twin output across a multi-batch
    drain — both stateful APIs share one fold function, and this pins
    that the new API's state carry and chunk delivery behave the
    same. transformWithState requires the RocksDB state store AND the
    protobuf package (its state-server protocol); this sandbox lacks
    protobuf, so the test skips here and runs verbatim on a normal
    cluster image."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state server needs protobuf",
    )
    from pyspark.sql import functions as F

    from certa_spark.streaming.stateful import (
        running_zscore_batch,
        running_zscore_stream_tws,
    )

    ns = 1_000_000_000
    rows = []
    for u in (1, 2):
        for i in range(25):
            v = None if i % 9 == 4 else float((u * 5 + i * 3) % 7) + 0.25
            rows.append((u, u * 100 + i, (i + 1) * 60 * ns, v))
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ns long, value double"
    )
    src = str(tmp_path / "tws_src")
    _write_slab_files(
        spark, batch,
        [F.col("ts_ns") <= 12 * 60 * ns, F.col("ts_ns") > 12 * 60 * ns],
        src,
    )
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1").parquet(src)
        )
        got_rows, n_data = _drain_batches(
            spark, running_zscore_stream_tws(stream), "tws_z", 2
        )
        assert n_data == 2, "must exercise cross-batch state carry"
        got = {
            r["event_id"]: (r["n_prior"], r["z"], r["value"])
            for r in got_rows
        }
        want = {
            r["event_id"]: (r["n_prior"], r["z"], r["value"])
            for r in running_zscore_batch(batch).collect()
        }
        assert got == want
        nulls = [k for k, v in want.items() if v[2] is None]
        assert nulls and all(got[k][1] is None for k in nulls)
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )


def test_streaming_attribution_two_slab_drain_equals_batch(
    spark, tmp_path
):
    """r8 verdict ask #6: the stream-stream attribution join's
    exactly-once pair emission across micro-batch boundaries, pinned
    instead of argued from Spark semantics. Clicks arrive in batch 1,
    purchases in batch 2 — every qualifying pair must be emitted
    EXACTLY once (the click side is buffered in join state across the
    boundary; the purchase side probes it a batch later), and the
    drained result must equal the plain batch range join. Uses the
    gate's own join construction (queries._attribution_join), not a
    copy, so the test attests the shipping code path."""
    from pyspark.sql import functions as F

    from certa_spark.queries import _attribution_join

    h = 3600
    rows = [
        # (user, event_id, event_type, ts_sec)
        # u1: click then purchase 30 min later -> one pair
        (1, 10, "click", 1 * h),
        (1, 11, "purchase", 1 * h + 1800),
        # u2: TWO clicks within the hour before one purchase -> fan-out
        # of 2, each pair exactly once
        (2, 20, "click", 2 * h),
        (2, 21, "click", 2 * h + 600),
        (2, 22, "purchase", 2 * h + 1500),
        # u3: purchase 2h after the click -> outside the bound, no pair
        (3, 30, "click", 3 * h),
        (3, 31, "purchase", 5 * h),
        # u4: purchase BEFORE the click -> no pair
        (4, 40, "click", 6 * h),
        (4, 41, "purchase", 6 * h - 600),
        # u5: purchase with no click at all
        (5, 51, "purchase", 7 * h),
        # u6: click with no purchase
        (6, 60, "click", 8 * h),
        # u1 again: second purchase also within the hour of click 10
        (1, 12, "purchase", 1 * h + 3000),
    ]
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, sec long"
    ).withColumn("ts", F.timestamp_seconds("sec"))

    src = str(tmp_path / "attr_src")
    _write_slab_files(
        spark, batch,
        [F.col("event_type") == "click",
         F.col("event_type") == "purchase"],
        src,
    )
    stream = (
        spark.readStream
        .schema("user_id long, event_id long, event_type string, "
                "sec long, ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    got_rows, n_data = _drain_batches(
        spark, _attribution_join(clicks, purchases), "attr_two_slab", 2
    )
    assert n_data == 2, "clicks and purchases must arrive in separate batches"

    got_pairs = [(r["click_id"], r["purchase_id"]) for r in got_rows]
    assert len(got_pairs) == len(set(got_pairs)), (
        "a pair crossed the batch boundary twice"
    )

    cb = batch.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    pb = batch.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want_pairs = {
        (r["click_id"], r["purchase_id"])
        for r in cb.join(
            pb,
            F.expr(
                "c_user = p_user AND purchase_ts > click_ts "
                "AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
            ),
            "inner",
        ).collect()
    }
    assert want_pairs == {(10, 11), (10, 12), (20, 22), (21, 22)}
    assert set(got_pairs) == want_pairs

def test_streaming_ingest_dedup_horizon_semantics(spark, tmp_path):
    """The at-least-once ingest-dedup contract
    (streaming/events.ingest_dedup = dropDuplicatesWithinWatermark),
    pinned cross-batch: a re-delivery arriving while the first
    arrival's state is live is DROPPED; once the watermark passes the
    first arrival's event time + horizon its state is evicted (at the
    END of a batch — in-batch lookups see state before the eviction
    pass, verified against the per-batch numRowsRemoved metrics) and
    a later re-delivery RE-EMITS; rows below the watermark are late
    and never reach the operator. Tags mark which delivery survived,
    pinning first-arrival semantics too."""
    from pyspark.sql import functions as F

    from certa_spark.streaming.events import ingest_dedup

    m = 60
    rows = [
        # (key, tag, ts_sec, slab)
        (1, "a1", 600 * m, 0),   # A first arrival
        (2, "b1", 605 * m, 0),   # B first arrival
        (1, "a2", 608 * m, 1),   # A re-delivery, state live -> dropped
        (3, "c1", 690 * m, 1),   # new key C; wm after this batch =
                                 # 690-30 = 660 > A/B eviction points
                                 # (630/635)
        (4, "d1", 700 * m, 2),   # batch 2 runs with wm 660: its
                                 # end-of-batch pass EVICTS A and B
        (2, "b4", 701 * m, 3),   # B re-delivery after eviction ->
                                 # re-emits (the at-least-once horizon)
        (1, "a4", 644 * m, 3),   # below batch 3's wm (700-30 = 670):
                                 # late row, dropped at the watermark,
                                 # never reaches the dedup state
    ]
    batch = spark.createDataFrame(
        rows, "k long, tag string, sec long, slab int"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    src = str(tmp_path / "ingdedup_src")
    _write_slab_files(
        spark, batch,
        [F.col("slab") == i for i in range(4)],
        src,
    )
    stream = (
        spark.readStream
        .schema("k long, tag string, sec long, slab int, ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    got_rows, n_data = _drain_batches(
        spark,
        ingest_dedup(stream, ["k"], "ts", "30 minutes").select("k", "tag"),
        "ingdedup_stream", 4,
    )
    assert n_data == 4
    got = sorted((r["k"], r["tag"]) for r in got_rows)
    assert got == [
        (1, "a1"), (2, "b1"), (2, "b4"), (3, "c1"), (4, "d1")
    ]


def test_streaming_minhash_signatures_batch_boundary_independent(
    spark, tmp_path
):
    """The doc_stream_minhash_ingest gate rests on the claim that
    in-stream MinHash signatures are a STATELESS projection —
    batch-boundary-independent by construction. Pin it: the same
    corpus drained one file per trigger (2 data batches) must produce
    exactly the batch twin's (_id, _sig) set, signature arrays
    element-for-element."""
    from pyspark.sql import functions as F

    from certa_spark.operators.dedup import minhash_signatures_frame

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", 0),
        (2, "pack my box with five dozen liquor jugs", 0),
        (3, "the quick brown fox jumps over the lazy cat", 1),
        (4, "sphinx of black quartz judge my vow", 1),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string, slab int")
    src = str(tmp_path / "mhsig_src")
    _write_slab_files(
        spark, batch, [F.col("slab") == 0, F.col("slab") == 1], src
    )
    stream = (
        spark.readStream.schema("doc_id long, text string, slab int")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    got_rows, n_data = _drain_batches(
        spark, minhash_signatures_frame(stream), "mhsig_stream", 2
    )
    assert n_data == 2, "fixture must drain as two data batches"
    got = {r["_id"]: list(r["_sig"]) for r in got_rows}
    want = {
        r["_id"]: list(r["_sig"])
        for r in minhash_signatures_frame(batch.drop("slab")).collect()
    }
    assert got == want


def test_streaming_heavy_hitters_multibatch_state_carry(spark, tmp_path):
    """Misra-Gries state carry across micro-batch boundaries, pinned
    per batch via foreachBatch: a window whose rows arrive in three
    batches ends EXACT when cardinality stays <= k (counters monotone,
    batch 2's summary must include batch 1's rows), and a skewed
    window split across batches still satisfies the MG guarantee
    (every item with in-window freq > n/(k+1) present, hot count
    within the subtraction bound) in its FINAL summary."""
    from pyspark.sql import functions as F

    from certa_spark.streaming.stateful import heavy_hitters_stream

    rows = []
    # window A (hour 10): cardinality 5, rows spread over 3 slabs
    for m in range(30):
        rows.append((f"2024-01-01 10:{m:02d}:00", f"w{m % 5}", m // 10))
    # window B (hour 11): hot token + 40 singletons over 2 slabs
    for m in range(30):
        rows.append((f"2024-01-01 11:{m:02d}:00", "hot", m % 2))
    for m in range(40):
        rows.append((f"2024-01-01 11:{m:02d}:30", f"t{m}", m % 2))
    batch = spark.createDataFrame(rows, ["ts", "tok", "slab"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = str(tmp_path / "hhmb_src")
    _write_slab_files(
        spark, batch, [F.col("slab") == i for i in range(3)], src
    )
    stream = (
        spark.readStream.schema("ts timestamp, tok string, slab int")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = heavy_hitters_stream(stream, "tok", window_duration="1 hour", k=16)
    captured = []

    def _cap(df, bid):
        captured.append((bid, df.collect()))

    q = (
        out.writeStream.foreachBatch(_cap)
        .outputMode("update").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(180)
    with_rows = [b for b in captured if b[1]]
    assert len(with_rows) >= 3, "must drain as multiple data batches"

    def final_summary(hour):
        for bid, rws in sorted(captured, reverse=True):
            sel = {
                r["item"]: r["c"]
                for r in rws
                if f"{hour}:00" in str(r["window_start"])
            }
            if sel:
                return sel
        return {}

    # window A: splits across all 3 slabs; cardinality 5 <= k means
    # no truncation ever happens, so the final summary is the EXACT
    # count — impossible unless batch 3's fold saw batch 1/2 state
    assert final_summary(10) == {f"w{i}": 6 for i in range(5)}
    # window B: n=70, k=16 -> every item with freq > 70/17 ~ 4.1 must
    # survive; 'hot' (30) qualifies, and its counter can have been
    # truncated at most n/(k+1) in total
    fb = final_summary(11)
    assert len(fb) <= 16
    assert "hot" in fb
    assert 30 - 70 / 17 <= fb["hot"] <= 30


def test_streaming_attribution_late_purchase_dropped_at_watermark(
    spark, tmp_path
):
    """The attribution join's LATENESS contract, pinned cross-batch:
    a purchase arriving after the global watermark (min across both
    sides) has passed its event time is DROPPED — its click's join
    state is already evicted — so the stream result diverges from the
    batch oracle exactly by the too-late pairs, while fresh rows in
    the same batch still pair. This is the documented allowed-lateness
    trade of the 2h watermarks (the two-slab test pins the happy
    path)."""
    from pyspark.sql import functions as F

    from certa_spark.queries import _attribution_join

    h = 3600
    rows = [
        # (user, event_id, event_type, ts_sec, slab)
        (1, 10, "click", 10 * h, 0),
        (2, 20, "click", 30 * h, 0),
        # slab 1: u1's purchase pairs while wm is still 0; the u4
        # click and the unmatched u9 purchase advance BOTH sides'
        # watermarks (min policy) to 37h
        (1, 11, "purchase", 10 * h + 1800, 1),
        (4, 40, "click", 39 * h, 1),
        (9, 90, "purchase", 40 * h, 1),
        # slab 2: a dummy unmatched purchase — state eviction runs at
        # the END of a batch (the same timing the ingest-dedup test
        # observed), so u2's click state (evictable once wm 37h >
        # 30h + 1h) is physically removed HERE, a batch before the
        # late purchase arrives
        (9, 91, "purchase", 40 * h + 1800, 2),
        # slab 3: u2's purchase is below the 37h global watermark and
        # its click state is gone -> no pair; u4's fresh purchase
        # (39.5h > wm) still pairs against the live u4 click state
        (2, 21, "purchase", 30 * h + 1800, 3),
        (4, 41, "purchase", 39 * h + 1800, 3),
    ]
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, "
              "sec long, slab int"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    src = str(tmp_path / "attr_late_src")
    _write_slab_files(
        spark, batch, [F.col("slab") == i for i in range(4)], src
    )
    stream = (
        spark.readStream
        .schema("user_id long, event_id long, event_type string, "
                "sec long, slab int, ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )

    def sides(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        purchases = df.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        return clicks, purchases

    got_rows, n_data = _drain_batches(
        spark, _attribution_join(*sides(stream)), "attr_late", 4
    )
    assert n_data == 4
    got = {(r["click_id"], r["purchase_id"]) for r in got_rows}

    cb, pb = sides(batch)
    batch_pairs = {
        (r["click_id"], r["purchase_id"])
        for r in cb.join(
            pb,
            F.expr(
                "c_user = p_user AND purchase_ts > click_ts "
                "AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
            ),
            "inner",
        ).collect()
    }
    assert batch_pairs == {(10, 11), (20, 21), (40, 41)}
    # the late pair (20, 21) is dropped by the watermark; everything
    # else pairs — and the divergence from the batch oracle is exactly
    # that pair (this is what the 2h lateness contract MEANS)
    assert got == {(10, 11), (40, 41)}
    assert got != batch_pairs


def _outer_attribution_scenario(spark, tmp_path, sink: str):
    """Shared 3-slab LEFT OUTER fixture + drain (used by the contract
    test and its RocksDB twin, so the two can never pin different
    scenarios). Slab design: u1 converts (pair emits in-batch, no
    null twin ever); u2 never converts — the u4 click + u9 purchase
    in slab 1 advance BOTH watermarks (min policy) to 38h, past u2's
    match window, and eviction runs at batch END so slab 2's dummy
    purchase is where u2's null row physically surfaces; max event
    time 41h -> final wm 39h < 41h keeps the u4 click buffered, so
    it must emit NOTHING. Returns (rows, n_data_batches)."""
    from pyspark.sql import functions as F

    from certa_spark.queries import _attribution_join, _attribution_sides

    h = 3600
    rows = [
        (1, 10, "click", 10 * h, 0),
        (2, 20, "click", 10 * h, 0),
        (1, 11, "purchase", 10 * h + 1800, 1),
        (4, 40, "click", 40 * h, 1),
        (9, 90, "purchase", 40 * h, 1),
        (9, 91, "purchase", 41 * h, 2),
    ]
    batch = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, "
              "sec long, slab int"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    src = str(tmp_path / f"{sink}_src")
    _write_slab_files(
        spark, batch, [F.col("slab") == i for i in range(3)], src
    )
    stream = (
        spark.readStream
        .schema("user_id long, event_id long, event_type string, "
                "sec long, slab int, ts timestamp")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    clicks, purchases = _attribution_sides(stream)
    return _drain_batches(
        spark, _attribution_join(clicks, purchases, how="leftOuter"),
        sink, 3,
    )


def test_streaming_attribution_outer_null_emission_contract(
    spark, tmp_path
):
    """The LEFT OUTER attribution join's cross-batch contract (r10):
    (a) a matched click emits its pair and NEVER a null row, even
    after its state evicts; (b) an unmatched click emits its
    null-padded row EXACTLY ONCE, when the watermark passes its last
    possible match time; (c) a click the final watermark has NOT yet
    released emits nothing at all — outer results are
    eviction-driven, which is why the gate query needs the flush
    sentinel on finite replays."""
    got_rows, n_data = _outer_attribution_scenario(
        spark, tmp_path, "attr_outer"
    )
    assert n_data == 3
    got = [(r["click_id"], r["purchase_id"]) for r in got_rows]
    # (a) u1: the pair, no null twin; (b) u2: exactly one null row;
    # (c) u4: nothing (still buffered when the stream ends)
    assert sorted(got, key=lambda t: (t[0], t[1] or 0)) == [
        (10, 11), (20, None)
    ]


def test_drain_stream_sizes_and_restores_shuffle_partitions(
    spark, tmp_path
):
    """The shared gate-drain helper (r10): the drain itself runs at 8
    shuffle partitions (fixed state-store commit cost per partition
    per batch — the attribution root-cause applied suite-wide), the
    session conf is restored afterwards EVEN when the drain raises,
    and the single-batch guard fires through the helper."""
    from pyspark.sql import functions as F

    from certa_spark.queries import _drain_stream

    src = str(tmp_path / "drain_src")
    spark.range(100).select(
        F.col("id").alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    ).coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes"), F.col("user_id") % 3)
        .agg(F.count("*").alias("n"))
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    q = _drain_stream(spark, agg, "_t_drain_ok", "update")
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert spark.table("_t_drain_ok").count() > 0
    # the stateful aggregate really ran at 8 state partitions
    state_ops = [
        op
        for p in q.recentProgress
        for op in p["stateOperators"]
    ]
    assert state_ops, "expected a stateful operator in the drain"
    assert all(
        op["numShufflePartitions"] == 8 for op in state_ops
    ), state_ops

    # conf restored on FAILURE too: a frame that cannot stream-plan
    # raises inside start(); the finally must still restore
    import pytest

    bad = spark.range(5)  # batch frame: .writeStream does not exist path
    with pytest.raises(Exception):
        _drain_stream(spark, bad, "_t_drain_bad", "append")
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_drain_stream_cleans_up_tmpfs_checkpoint(spark, tmp_path):
    """r11: the drain checkpoints to /dev/shm when available (disk
    fsyncs of the offset WAL / commit log / state deltas were most of
    the per-gate driver overhead) and must remove that dir on return —
    success AND failure — or every gate run leaks state files into
    RAM-backed tmpfs."""
    import glob
    import os

    import pytest
    from pyspark.sql import functions as F

    from certa_spark.queries import _drain_stream

    if not (os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)):
        pytest.skip("no /dev/shm on this host")
    src = str(tmp_path / "ckpt_src")
    spark.range(50).select(
        F.col("id").alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    ).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
    )
    before = set(glob.glob("/dev/shm/certa_drain_ckpt_*"))
    _drain_stream(spark, agg, "_t_drain_ckpt", "update")
    assert set(glob.glob("/dev/shm/certa_drain_ckpt_*")) == before
    with pytest.raises(Exception):
        _drain_stream(spark, spark.range(5), "_t_drain_ckpt_bad", "append")
    assert set(glob.glob("/dev/shm/certa_drain_ckpt_*")) == before


def test_stage_events_sentinels_writes_schema_compatible_rows(
    spark, tmp_path
):
    """The staging helper used by the sessionized and outer-join
    gates: the staged dir must hold the original file plus a sentinel
    parquet that reads under the SAME schema, with unset columns null
    and overrides applied per row."""
    import datetime
    import shutil

    from certa_spark.queries import _stage_events_sentinels

    sf_dir = "/root/testdata/sf0.001"
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    far = datetime.datetime(2030, 1, 1)
    stage = _stage_events_sentinels(
        sf_dir, raw_schema,
        [
            {"ts": far, "user_id": -7, "event_id": -1,
             "event_type": "click", "value": 0.0},
            {"ts": far, "user_id": -13, "event_id": -2,
             "event_type": "purchase", "value": 0.0},
        ],
    )
    try:
        whole = spark.read.schema(raw_schema).parquet(stage)
        n_orig = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert whole.count() == n_orig + 2
        sents = {
            r["event_id"]: r
            for r in whole.filter(whole.user_id < 0).collect()
        }
        assert set(sents) == {-1, -2}
        assert sents[-1]["event_type"] == "click"
        assert sents[-2]["event_type"] == "purchase"
        assert sents[-1]["user_id"] == -7 and sents[-2]["user_id"] == -13
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_stage_events_sentinels_no_leak_on_failure(spark):
    """r10 advice: if staging fails BETWEEN mkdtemp and return (e.g. a
    schema type missing from the pa_types map), the helper must remove
    its own temp dir — on the hardlink-fallback path the leaked dir
    would hold a full copy of events.parquet. Caller cleanup only
    covers post-return."""
    import glob

    import pytest
    from pyspark.sql import types as T

    from certa_spark.queries import _stage_events_sentinels

    before = set(glob.glob("/tmp/certa_stream_stage_*"))
    bad_schema = T.StructType(
        [T.StructField("m", T.MapType(T.StringType(), T.LongType()))]
    )  # map<...> has no pa_types entry -> KeyError mid-staging
    with pytest.raises(KeyError):
        _stage_events_sentinels(
            "/root/testdata/sf0.001", bad_schema, [{"m": None}]
        )
    assert set(glob.glob("/tmp/certa_stream_stage_*")) == before


def test_streaming_attribution_outer_under_rocksdb(spark, tmp_path):
    """The outer join's null-emission contract holds unchanged under
    the RocksDB state-store provider (the matched-flag per buffered
    left row lives in join state — this pins that it round-trips
    through RocksDB exactly like the default provider). Same shared
    scenario as the contract test, by construction."""
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        got_rows, n_data = _outer_attribution_scenario(
            spark, tmp_path, "attr_outer_rdb"
        )
    finally:
        if prev:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
    assert n_data == 3
    got = [(r["click_id"], r["purchase_id"]) for r in got_rows]
    assert sorted(got, key=lambda t: (t[0], t[1] or 0)) == [
        (10, 11), (20, None)
    ]


def test_streaming_enrich_join_batch_boundary_independent(
    spark, tmp_path
):
    """The stream-static enrichment gate's determinism argument,
    executed: a stateless per-micro-batch broadcast join produces the
    SAME enriched row set whether the stream drains in one batch or
    several — no state, no watermark, so batching cannot reorder or
    drop anything. Two-slab drain vs the plain batch join."""
    from pyspark.sql import functions as F

    rows = [(i, i % 5, f"t{i % 3}", float(i) / 4) for i in range(40)]
    batch = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )
    dim = spark.createDataFrame(
        [(u, f"nation{u % 2}") for u in range(5)],
        "user_id long, nation string",
    )
    src = str(tmp_path / "enrich_src")
    _write_slab_files(
        spark, batch,
        [F.col("event_id") < 20, F.col("event_id") >= 20], src,
    )
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    got_rows, n_data = _drain_batches(
        spark, stream.join(F.broadcast(dim), "user_id"), "enrich_2slab", 2
    )
    assert n_data == 2, "must exercise a multi-batch drain"
    got = sorted(tuple(r) for r in got_rows)
    want = sorted(
        tuple(r) for r in batch.join(F.broadcast(dim), "user_id").collect()
    )
    assert got == want


def test_ivfpq_rerank_repairs_adc_order(spark):
    """Two-stage refine: (1) the final top-k is EXACTLY the exact-L2
    top-k computed over the ADC shortlist (rank inversions inside the
    shortlist are undone); (2) with the shortlist covering every
    candidate in the probed cells, rerank == brute-force exact L2
    over those cells; (3) dist is the true squared L2, adist rides
    along from stage 1; (4) deterministic under repartition."""
    import random

    from certa_spark.operators.similarity import (
        knn_ivfpq_adc,
        knn_ivfpq_rerank,
    )

    rnd = random.Random(7)

    def vec(center):
        return [center + rnd.uniform(-0.5, 0.5) for _ in range(16)]

    rows = [(i, vec(0.0)) for i in range(24)] + [
        (i, vec(5.0)) for i in range(24, 48)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = [rows[0][1], rows[24][1]]

    def resid(v, c):
        return [x - y for x, y in zip(v, c)]

    cb_vecs = [
        resid(rows[1][1], centroids[0]),
        resid(rows[2][1], centroids[0]),
        resid(rows[25][1], centroids[1]),
        resid(rows[26][1], centroids[1]),
    ]
    codebooks = [[v[s * 4 : (s + 1) * 4] for v in cb_vecs] for s in range(4)]
    probes = df.filter(F.col("vec_id").isin(0, 30))

    short = knn_ivfpq_adc(
        df, probes, centroids, codebooks, k=8, nprobe=1
    ).collect()
    out = knn_ivfpq_rerank(
        df, probes, centroids, codebooks, k=3, shortlist=8, nprobe=1
    )
    got = out.collect()

    by_vec = dict(rows)

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return round(acc, 6)

    for p in (0, 30):
        sl = [r["neighbor_id"] for r in short if r["probe_id"] == p]
        # exact rerank over the shortlist, ties to lowest id
        want = sorted(
            ((d2(by_vec[p], by_vec[n]), n) for n in sl)
        )[:3]
        mine = sorted(
            (r["rank"], r["neighbor_id"], r["dist"], r["adist"])
            for r in got
            if r["probe_id"] == p
        )
        assert [(n, d) for _, n, d, _ in mine] == [
            (n, d) for d, n in want
        ]
        # adist is stage-1's score for the same (probe, neighbor)
        adist_short = {
            (r["probe_id"], r["neighbor_id"]): r["adist"] for r in short
        }
        for _, n, _, a in mine:
            assert a == adist_short[(p, n)]

    # nprobe=1 on separated clusters: results stay in the probe's cell
    assert all(
        (r["neighbor_id"] < 24) == (r["probe_id"] == 0) for r in got
    )

    # determinism under repartition
    got2 = knn_ivfpq_rerank(
        df.repartition(5), probes, centroids, codebooks,
        k=3, shortlist=8, nprobe=1,
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))
