"""zorder_key: exact bit interleaving and tile locality."""

from pyspark.sql import functions as F

from certa_spark.operators.layout import zorder_key


def _z(u, t, bits=8):
    out = 0
    for i in range(bits):
        out |= ((u >> i) & 1) << (2 * i + 1)
        out |= ((t >> i) & 1) << (2 * i)
    return out


def test_zorder_matches_reference_interleave(spark):
    rows = [(u, t) for u in (0, 1, 5, 170, 255) for t in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, ["u", "t"])
    got = {
        (r["u"], r["t"]): r["z"]
        for r in df.select("u", "t", zorder_key(F.col("u"), F.col("t")).alias("z")).collect()
    }
    for (u, t), z in got.items():
        assert z == _z(u, t), (u, t, z)


def test_zorder_tile_is_local_in_both_dims(spark):
    # every 64-key z-tile of an 8+8-bit curve spans at most 8 values
    # in each dimension (a tile is an 8x8 rectangle)
    rows = [(u, t) for u in range(64) for t in range(64)]
    df = spark.createDataFrame(rows, ["u", "t"])
    spread = (
        df.select("u", "t", (zorder_key(F.col("u"), F.col("t")) / 64).cast("long").alias("tile"))
        .groupBy("tile")
        .agg(
            (F.max("u") - F.min("u")).alias("du"),
            (F.max("t") - F.min("t")).alias("dt"),
        )
        .agg(F.max("du").alias("du"), F.max("dt").alias("dt"))
        .collect()[0]
    )
    assert spread["du"] <= 7 and spread["dt"] <= 7


def test_zordered_write_clusters_both_dims(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from certa_spark.io import write_zordered

    rows = [(u, t) for u in range(64) for t in range(64)]
    df = spark.createDataFrame(rows, ["u", "t"]).select(
        "u", "t", zorder_key(F.col("u"), F.col("t")).alias("z")
    )
    dst = str(tmp_path / "zsorted")
    write_zordered(df, dst, "z", n_files=16)

    # per-file min/max stats: every file must cover a small rectangle
    # in BOTH dims -> a predicate on either column can skip most files
    spreads_u, spreads_t = [], []
    for f in glob.glob(dst + "/*.parquet"):
        md = pq.read_metadata(f)
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        u_mins, u_maxs, t_mins, t_maxs = [], [], [], []
        for rg in range(md.num_row_groups):
            st_u = md.row_group(rg).column(cols["u"]).statistics
            st_t = md.row_group(rg).column(cols["t"]).statistics
            u_mins.append(st_u.min); u_maxs.append(st_u.max)
            t_mins.append(st_t.min); t_maxs.append(st_t.max)
        spreads_u.append(max(u_maxs) - min(u_mins))
        spreads_t.append(max(t_maxs) - min(t_mins))
    # global spread is 63; a 16-file z-layout keeps every file within
    # a quarter of the range in each dimension
    assert max(spreads_u) <= 31 and max(spreads_t) <= 31
