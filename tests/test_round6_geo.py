"""Geodesic layer: radius self-join exactness (incl. antimeridian seam and
grid edges), track stats vs a pandas replay, parallelism invariance."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from raster_functions_spark import spatial


def _angles_np(lat1, lon1, lat2, lon2):
    c = math.pi / 180.0
    p1, p2 = lat1 * c, lat2 * c
    sp = np.sin((lat2 - lat1) * c / 2.0)
    sl = np.sin((lon2 - lon1) * c / 2.0)
    h = sp * sp + np.cos(p1) * np.cos(p2) * sl * sl
    return 2.0 * np.arcsin(np.minimum(1.0, np.sqrt(h)))


def _brute_pairs(pdf, theta):
    lat = pdf["lat"].to_numpy()
    lon = pdf["lon"].to_numpy()
    ids = pdf["id"].to_numpy()
    out = set()
    for i in range(len(pdf)):
        sig = _angles_np(lat[i], lon[i], lat, lon)
        for j in np.nonzero(sig <= theta)[0]:
            if ids[i] < ids[j]:
                out.add((int(ids[i]), int(ids[j])))
    return out


def _fixture_points(n=400, seed=3):
    rng = np.random.RandomState(seed)
    lat = rng.uniform(-75, 75, n)
    lon = rng.uniform(-180, 180, n)
    # seam cluster: pairs straddling the antimeridian must survive the wrap
    lat[:20] = rng.uniform(-5, 5, 20)
    lon[:10] = rng.uniform(179.0, 180.0, 10)
    lon[10:20] = rng.uniform(-180.0, -179.0, 10)
    # exact grid-edge coordinates (clamp/pmod paths)
    lat[20], lon[20] = 75.0, 180.0
    lat[21], lon[21] = -75.0, -180.0
    lat[22], lon[22] = 0.0, 0.0
    return pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                         "lat": lat, "lon": lon})


@pytest.mark.parametrize("theta", [0.02, 0.3])
def test_radius_join_matches_brute_force(spark, theta):
    pdf = _fixture_points()
    df = spark.createDataFrame(pdf).repartition(8)
    got = spatial.radius_join(df, theta).toPandas()
    want = _brute_pairs(pdf, theta)
    assert set(zip(got["id_a"], got["id_b"])) == want
    # distances agree with the numpy haversine
    by_pair = {(a, b): s for a, b, s in
               zip(got["id_a"], got["id_b"], got["sigma_rad"])}
    for (a, b), s in by_pair.items():
        ref = float(_angles_np(pdf["lat"][a], pdf["lon"][a],
                               np.array([pdf["lat"][b]]),
                               np.array([pdf["lon"][b]]))[0])
        assert abs(s - ref) < 1e-12


def test_radius_join_partition_invariant(spark):
    pdf = _fixture_points(n=250, seed=9)
    theta = 0.25
    outs = []
    for parts in (2, 7):
        df = spark.createDataFrame(pdf).repartition(parts)
        got = (spatial.radius_join(df, theta).toPandas()
               .sort_values(["id_a", "id_b"]).reset_index(drop=True))
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_radius_join_max_abs_lat_scan_matches_explicit(spark):
    pdf = _fixture_points(n=200, seed=5)
    df = spark.createDataFrame(pdf)
    a = spatial.radius_join(df, 0.1).toPandas()
    b = spatial.radius_join(df, 0.1, max_abs_lat=75.0).toPandas()
    key = ["id_a", "id_b"]
    assert (set(map(tuple, a[key].to_numpy()))
            == set(map(tuple, b[key].to_numpy())))


def test_track_stats_matches_pandas(spark):
    rng = np.random.RandomState(11)
    n = 500
    pdf = pd.DataFrame({
        "user": rng.randint(0, 17, n).astype(np.int64),
        "seq": np.arange(n, dtype=np.int64),
        "lat": rng.uniform(-80, 80, n),
        "lon": rng.uniform(-180, 180, n)})
    df = spark.createDataFrame(pdf).repartition(6)
    got = (spatial.track_stats(df, "user", ["seq"]).toPandas()
           .sort_values("user").reset_index(drop=True))

    rows = []
    for u, g in pdf.sort_values("seq").groupby("user"):
        lat, lon = g["lat"].to_numpy(), g["lon"].to_numpy()
        path = float(np.sum(_angles_np(lat[:-1], lon[:-1],
                                       lat[1:], lon[1:]))) if len(g) > 1 else 0.0
        rows.append((u, len(g), path, lat.min(), lat.max(),
                     lon.min(), lon.max()))
    want = pd.DataFrame(rows, columns=["user", "n_points", "path_rad",
                                       "lat_min", "lat_max",
                                       "lon_min", "lon_max"])
    assert (got["n_points"].to_numpy() == want["n_points"].to_numpy()).all()
    np.testing.assert_allclose(got["path_rad"], want["path_rad"], atol=1e-9)
    for c in ("lat_min", "lat_max", "lon_min", "lon_max"):
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy())


def test_track_stats_single_point_user(spark):
    pdf = pd.DataFrame({"user": [1], "seq": [0], "lat": [10.0], "lon": [20.0]})
    got = spatial.track_stats(spark.createDataFrame(pdf),
                              "user", ["seq"]).toPandas()
    assert got["n_points"][0] == 1 and got["path_rad"][0] == 0.0


def test_geo_grid_enclosure_bounds():
    # every (theta, band) config: cell widths really are >= the worst-case
    # coordinate deltas the haversine bound allows
    for theta in (0.001, 0.03, 0.3, 1.0):
        for band in (10.0, 60.0, 85.0):
            n_lat, n_lon = spatial._geo_grid(theta, band)
            assert 180.0 / n_lat >= math.degrees(theta) - 1e-12
            arg = min(1.0, math.sin(theta / 2) / math.cos(math.radians(band)))
            assert 360.0 / n_lon >= math.degrees(2 * math.asin(arg)) - 1e-12
