import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from raster_functions_spark import grid


def _rand_lonlat(n=5000, seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(-180, 180, n), rng.uniform(-90, 90, n)


def test_encode_roundtrip_ij():
    lon, lat = _rand_lonlat()
    for res in [0, 1, 7, 15]:
        cells = grid.encode_np(lon, lat, res)
        assert (grid.cell_res(cells) == res).all()
        i, j = grid.cell_to_ij(cells)
        i2, j2 = grid.lonlat_to_ij(lon, lat, res)
        assert np.array_equal(i, i2) and np.array_equal(j, j2)


def test_parent_contains_child():
    lon, lat = _rand_lonlat(2000, 2)
    fine = grid.encode_np(lon, lat, 12)
    coarse = grid.parent(fine, 7)
    direct = grid.encode_np(lon, lat, 7)
    assert np.array_equal(coarse, direct)


def test_children_inverse():
    c = grid.encode_np(np.array([12.3]), np.array([47.1]), 8)[0]
    kids = grid.children(c)
    assert len(set(kids.tolist())) == 4
    assert (grid.parent(kids, 8) == c).all()


def test_neighbors_count_and_symmetry():
    c = int(grid.encode_np(np.array([0.5]), np.array([0.5]), 10)[0])
    nbrs = grid.neighbors(c)
    assert len(nbrs) == 8
    for nb in nbrs.tolist():
        assert c in grid.neighbors(int(nb)).tolist()


def test_neighbors_wrap_and_clamp():
    # cell at the north edge: 3 neighbors fall off
    top = int(grid.ij_to_cell(np.array([5]), np.array([(1 << 10) - 1]), 10)[0])
    assert len(grid.neighbors(top)) == 5
    # cell at lon wrap: still 8 (wraps around)
    west = int(grid.ij_to_cell(np.array([0]), np.array([512]), 10)[0])
    assert len(grid.neighbors(west)) == 8


def test_cell_bounds_contains_point():
    lon, lat = _rand_lonlat(500, 3)
    cells = grid.encode_np(lon, lat, 9)
    x0, y0, x1, y1 = grid.cell_bounds(cells)
    assert ((lon >= x0) & (lon < x1) & (lat >= y0) & (lat < y1)).all()


def test_cover_bbox():
    cover = grid.cover_bbox(9.0, 44.0, 11.0, 46.0, 7)
    x0, y0, x1, y1 = grid.cell_bounds(cover)
    # every cover cell intersects the bbox
    assert ((x1 > 9.0) & (x0 < 11.0 + 360 / 128) & (y1 > 44.0)).all()
    # a point inside the bbox encodes to a cover cell
    pt = grid.encode_np(np.array([10.0]), np.array([45.0]), 7)[0]
    assert pt in set(cover.tolist())


def test_spark_column_matches_numpy(spark):
    lon, lat = _rand_lonlat(3000, 5)
    pdf = {"lon": lon.tolist(), "lat": lat.tolist()}
    df = spark.createDataFrame(zip(lon.tolist(), lat.tolist()), "lon double, lat double")
    for res in [3, 9, 15]:
        got = np.array(
            df.select(grid.encode_col(F.col("lon"), F.col("lat"), res).alias("c"))
            .toPandas()["c"], dtype=np.int64)
        want = grid.encode_np(lon, lat, res)
        assert np.array_equal(got, want), f"res={res} Column impl diverges"


def test_duckdb_sql_matches_numpy():
    lon, lat = _rand_lonlat(3000, 6)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
    for res in [3, 9, 15]:
        sql = grid.encode_sql("lon", "lat", res, "duckdb")
        got = con.sql(f"SELECT {sql} AS c FROM pts").fetchnumpy()["c"].astype(np.int64)
        want = grid.encode_np(lon, lat, res)
        assert np.array_equal(got, want), f"res={res} DuckDB impl diverges"


def test_spark_sql_text_matches(spark):
    lon, lat = _rand_lonlat(1000, 7)
    df = spark.createDataFrame(zip(lon.tolist(), lat.tolist()), "lon double, lat double")
    df.createOrReplaceTempView("pts_g")
    sql = grid.encode_sql("lon", "lat", 11, "spark")
    got = np.array(spark.sql(f"SELECT {sql} AS c FROM pts_g").toPandas()["c"], dtype=np.int64)
    assert np.array_equal(got, grid.encode_np(lon, lat, 11))


def test_parent_col(spark):
    lon, lat = _rand_lonlat(1000, 8)
    df = spark.createDataFrame(zip(lon.tolist(), lat.tolist()), "lon double, lat double")
    out = df.select(
        grid.parent_col(grid.encode_col(F.col("lon"), F.col("lat"), 12), 12, 7).alias("p"))
    got = np.array(out.toPandas()["p"], dtype=np.int64)
    assert np.array_equal(got, grid.encode_np(lon, lat, 7))


def test_hex_encode_basic():
    lon = np.array([0.0, 0.01, 5.0, 5.0])
    lat = np.array([0.0, 0.01, 5.0, -5.0])
    h = grid.hex_encode(lon, lat, 1.0)
    assert h[0] == h[1]          # nearby points share a hex
    assert h[2] != h[3]          # distant points differ
    assert h.dtype == np.int64


def test_splitmix64_matches_published_reference_vectors():
    """INDEPENDENT anchor for every splitmix-seeded surface (Random
    source, LSH hyperplanes, IVF init, fixtures): the numpy vectorized
    finalizer must equal the public-domain reference algorithm computed
    in pure Python big-int arithmetic, including the canonical first
    output for state 0 (0xE220A8397B1DCDAF — Vigna's splitmix64.c)."""
    import numpy as np
    from raster_functions_spark.fixtures import splitmix64

    def ref(x):
        z = (x + 0x9E3779B97F4A7C15) & (2 ** 64 - 1)
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (2 ** 64 - 1)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (2 ** 64 - 1)
        return (z ^ (z >> 31)) & (2 ** 64 - 1)

    assert int(splitmix64(np.uint64(0))) == 0xE220A8397B1DCDAF
    xs = np.array([0, 1, 2, 1234567, 2 ** 63, 2 ** 64 - 1,
                   0xDEADBEEFCAFEBABE], dtype=np.uint64)
    got = splitmix64(xs)
    for x, g in zip(xs.tolist(), got.tolist()):
        assert int(g) == ref(int(x)), hex(int(x))


def test_neighbors_tiny_grid_no_self_no_dups():
    """Coarse resolutions where the longitude wrap collides: a cell must
    never list itself, and every listed neighbor appears once."""
    import numpy as np
    from raster_functions_spark import grid

    for res in (0, 1, 2):
        c = int(grid.encode_np(np.array([0.0]), np.array([0.0]), res)[0])
        nb = grid.neighbors(c)
        assert c not in nb.tolist()
        vals = nb[nb >= 0].tolist()
        assert len(vals) == len(set(vals)), (res, vals)
    # res 0: single cell world -> no neighbors at all
    c0 = int(grid.encode_np(np.array([10.0]), np.array([20.0]), 0)[0])
    assert grid.neighbors(c0).size == 0
    # fine res unaffected: full 8-ring
    c5 = int(grid.encode_np(np.array([10.0]), np.array([20.0]), 5)[0])
    assert grid.neighbors(c5).size == 8


def test_polygon_area_centroid_known_square_and_orientation(spark):
    import pandas as pd
    from raster_functions_spark import spatial
    sq_ccw = {"pid": 0, "ring_x": [0.0, 4.0, 4.0, 0.0],
              "ring_y": [0.0, 0.0, 4.0, 4.0]}
    sq_cw = {"pid": 1, "ring_x": [0.0, 0.0, 4.0, 4.0],
             "ring_y": [0.0, 4.0, 4.0, 0.0]}
    tri = {"pid": 2, "ring_x": [0.0, 6.0, 0.0], "ring_y": [0.0, 0.0, 3.0]}
    degen = {"pid": 3, "ring_x": [1.0, 2.0, 3.0], "ring_y": [1.0, 2.0, 3.0]}
    df = spark.createDataFrame(pd.DataFrame([sq_ccw, sq_cw, tri, degen]))
    out = {r["pid"]: r for r in
           spatial.polygon_area_centroid(df).collect()}
    for pid in (0, 1):    # CW and CCW give identical results
        assert out[pid]["area"] == 16.0
        assert out[pid]["cx"] == 2.0 and out[pid]["cy"] == 2.0
    assert out[2]["area"] == 9.0
    assert abs(out[2]["cx"] - 2.0) < 1e-12 and abs(out[2]["cy"] - 1.0) < 1e-12
    assert out[3]["area"] == 0.0
    assert out[3]["cx"] is None and out[3]["cy"] is None
