"""Z-order layout clustering (operators/zorder.py): Morton key parity
vs the DuckDB twin, hand-computed bit interleave, stale-range clamping,
and the measured file-pruning win of a z-ordered layout over a
single-column sort."""

import duckdb

import pyspark.sql.functions as F

from ocr_documents_spark.operators import zorder as Z

PARQ = "/root/testdata/sf0.001/orders.parquet"
COLS = ["o_orderkey", "o_custkey"]


def test_morton_key_matches_duckdb_twin(spark):
    got = {r["o_orderkey"]: r["z"]
           for r in Z.zorder_key(
               spark.read.parquet(PARQ), COLS).select("o_orderkey", "z")
           .collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{PARQ}'")
    want = {r[0]: r[1] for r in con.execute(
        f"SELECT o_orderkey, z FROM ({Z.duckdb_zorder_sql('orders', COLS)})"
    ).fetchall()}
    assert got == want and len(got) == 1500


def test_interleave_bit_positions_hand_computed(spark):
    # ranges (0, 255) at bits=8 make the bucket the value itself, so the
    # key is the raw Morton interleave: bit j of col i lands at j*2 + i.
    df = spark.createDataFrame([(10, 6), (0, 0), (255, 255), (1, 2)],
                               "x long, y long")
    got = {(r["x"], r["y"]): r["z"] for r in Z.zorder_key(
        df, ["x", "y"], bits=8,
        ranges={"x": (0, 255), "y": (0, 255)}).collect()}
    # x=0b1010, y=0b0110 -> bits at 2 (x1), 3 (y1), 5 (y2), 6 (x3) = 108
    assert got[(10, 6)] == 108
    assert got[(0, 0)] == 0
    assert got[(255, 255)] == (1 << 16) - 1
    # x=1 -> bit 0; y=2 -> bit at 1*2+1 = 3 -> 1 + 8
    assert got[(1, 2)] == 9


def test_stale_ranges_clamp_never_corrupt(spark):
    # bounds narrower than the data: out-of-range values clamp to the
    # first/last bucket, the key stays inside [0, 2^(bits*m)).
    df = spark.createDataFrame([(-50, 999), (5, 5), (20, 20)],
                               "x long, y long")
    rows = Z.zorder_key(df, ["x", "y"], bits=4,
                        ranges={"x": (0, 15), "y": (0, 15)}).collect()
    zs = {(r["x"], r["y"]): r["z"] for r in rows}
    assert all(0 <= z < (1 << 8) for z in zs.values())
    # -50 clamps to bucket 0, 999 clamps to bucket 15 -> same key as (0, 15)
    lo_hi = Z.zorder_key(
        spark.createDataFrame([(0, 15)], "x long, y long"),
        ["x", "y"], bits=4,
        ranges={"x": (0, 15), "y": (0, 15)}).first()["z"]
    assert zs[(-50, 999)] == lo_hi


def test_zorder_layout_prunes_on_both_dims(spark, tmp_path):
    df = spark.read.parquet(PARQ).select(*COLS)
    n_files = 16
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    Z.cluster_by_zorder(df, COLS, n_files).write.parquet(zpath)
    (df.repartitionByRange(n_files, "o_orderkey")
       .sortWithinPartitions("o_orderkey").write.parquet(spath))

    zstats = Z.file_minmax_stats(spark, zpath, COLS)
    sstats = Z.file_minmax_stats(spark, spath, COLS)
    lo, hi = df.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    # a narrow box on the SECOND dim: invisible to the single-column
    # sort, prunable under z-order.
    width = max((hi - lo) // 8, 1)
    box = {"o_custkey": (lo, lo + width)}
    z_frac = Z.prunable_fraction(zstats, box)
    s_frac = Z.prunable_fraction(sstats, box)
    assert z_frac > s_frac
    assert z_frac >= 0.25
    # and the first dim still prunes under z-order (imperfectly, but
    # well above zero) while the dedicated sort prunes it near-perfectly.
    okey_lo = df.agg(F.min("o_orderkey")).first()[0]
    obox = {"o_orderkey": (okey_lo, okey_lo + 90)}  # ~1/16 of 1500 keys
    assert Z.prunable_fraction(sstats, obox) >= 0.8
    assert Z.prunable_fraction(zstats, obox) >= 0.25
