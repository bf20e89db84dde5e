import numpy as np
import pytest

from raster_functions_spark import codec, fixtures
from raster_functions_spark.operators import focal


def test_slope_aspect_analytic_plane():
    # plane z = 2x + 3y → slope = atan(|∇z|) everywhere, aspect constant
    yy, xx = np.mgrid[0:20, 0:20]
    z = (2.0 * xx + 3.0 * yy).astype(np.float64)
    zp = np.pad(z, 1, mode="reflect")  # any pad; interior checked
    slope, aspect = focal.slope_aspect_np(zp, cellsize=1.0)
    want_slope = np.degrees(np.arctan(np.hypot(2.0, 3.0)))
    assert np.allclose(slope[2:-2, 2:-2], want_slope, atol=1e-9)
    # downhill = -∇z = (2 west, 3 north in screen coords) → compass
    # bearing atan2(east, north) = atan2(-2, 3) = -33.69° ≡ 326.31°
    want_aspect = np.degrees(np.arctan2(-2.0, 3.0)) % 360.0
    assert np.isclose(aspect[5, 5], want_aspect, atol=1e-9)


def test_hillshade_flat_is_cos_zenith():
    z = np.zeros((12, 12))
    hs = focal.hillshade_np(np.pad(z, 1), altitude=45.0)
    assert np.allclose(hs, int(255 * np.cos(np.radians(45.0))), atol=1)


def test_hillshade_range_and_determinism():
    z = fixtures.dem_scene(2, 2, 16).astype(np.float64)
    h1 = focal.hillshade_np(np.pad(z, 1, mode="edge"), cellsize=0.001)
    h2 = focal.hillshade_np(np.pad(z, 1, mode="edge"), cellsize=0.001)
    assert np.array_equal(h1, h2)
    assert h1.dtype == np.uint8


def test_rank_filter_measures():
    rng = np.random.default_rng(0)
    band = rng.random((10, 10))
    p = np.pad(band, 1, mode="edge")
    med = focal.rank_filter_np(p, "median", 3)
    assert med.shape == (10, 10)
    # median of window containing the center ≥ min, ≤ max
    mx = focal.rank_filter_np(p, "max", 3)
    mn = focal.rank_filter_np(p, "min", 3)
    assert (mn <= med).all() and (med <= mx).all()
    assert (mx >= band).all() and (mn <= band).all()


def test_block_statistics_mean():
    band = np.arange(16, dtype=np.float64).reshape(4, 4)
    out = focal.block_statistics_np(band, "mean", 2)
    want = np.array([[2.5, 4.5], [10.5, 12.5]])
    assert np.allclose(out, want)
    assert focal.block_statistics_np(band, "nearest", 2).tolist() == [[0, 2], [8, 10]]


def test_aspect_slope_class_codes():
    yy, xx = np.mgrid[0:10, 0:10]
    z = (30.0 * xx).astype(np.float64)  # steep west-facing slope
    code = focal.aspect_slope_class_np(np.pad(z, 1, mode="reflect"), cellsize=1.0)
    inner = code[2:-2, 2:-2]
    assert (inner == inner[0, 0]).all()
    assert 31 <= inner[0, 0] <= 48  # steep class, some aspect


@pytest.mark.parametrize("op_builder,ref_fn", [
    (focal.hillshade, lambda zp, cs: focal.hillshade_np(zp, cs)),
    (focal.slope, lambda zp, cs: focal.slope_aspect_np(zp, cs)[0].astype(np.float32)),
])
def test_halo_join_matches_whole_scene(spark, op_builder, ref_fn):
    """Edge-aware kernel over independently-stored tiles must equal the
    kernel over the full mosaic — the core halo-exchange invariant."""
    tiles_x, tiles_y, tile = 3, 2, 16
    df = fixtures.dem_scene_df(spark, "s0", tiles_x, tiles_y, tile)
    out = focal.apply_focal(df, op_builder(cellsize=0.001), fmt_out="raw",
                            meta_cols=("cell_dx",)).toPandas()

    full = fixtures.dem_scene(tiles_x, tiles_y, tile).astype(np.float64)
    want_full = ref_fn(np.pad(full, 1, mode="edge"), 0.001)

    assert len(out) == tiles_x * tiles_y
    for _, row in out.iterrows():
        got = codec.decode(bytes(row["bytes"]))[0]
        tx, ty = int(row["tx"]), int(row["ty"])
        want = want_full[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
        assert np.allclose(got, want, atol=1e-4), f"tile ({tx},{ty}) diverges"


def test_halo_rank_filter_5x5(spark):
    """padding=2 op (5×5 median) through the halo exchange."""
    tiles_x, tiles_y, tile = 2, 2, 16
    df = fixtures.dem_scene_df(spark, "s1", tiles_x, tiles_y, tile)
    out = focal.apply_focal(df, focal.rank_filter("median", 5), fmt_out="raw").toPandas()
    full = fixtures.dem_scene(tiles_x, tiles_y, tile).astype(np.float64)
    want_full = focal.rank_filter_np(np.pad(full, 2, mode="edge"), "median", 5)
    for _, row in out.iterrows():
        got = codec.decode(bytes(row["bytes"]))[0]
        tx, ty = int(row["tx"]), int(row["ty"])
        want = want_full[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
        assert np.allclose(got, want, atol=1e-4)


def test_mask_erosion_monotonic():
    """FIXTURES §4 invariant: eroded mask ⊆ input mask, and interior of a
    solid region survives while a 1-px protrusion is removed."""
    rng = np.random.default_rng(9)
    mask = (rng.random((20, 20)) > 0.3)
    out = focal.erode_mask_np(mask, 3).astype(bool)
    assert not (out & ~mask).any()          # monotonic: output ⊆ input
    solid = np.zeros((12, 12), bool); solid[2:10, 2:10] = True
    solid[5, 10] = True                      # protrusion
    e = focal.erode_mask_np(solid, 3).astype(bool)
    assert e[4:8, 4:8].all()                 # interior survives
    assert not e[5, 10] and not e[2, 2]      # protrusion + corner eroded
    # op form: mask band eroded, value band untouched
    px = np.stack([np.full((12, 12), 7.0), solid.astype(np.float64)]).astype(np.float32)
    out_op = focal.mask_erode().apply(px, {})
    assert (out_op[0] == 7.0).all()
    assert np.array_equal(out_op[1].astype(bool), e)


def test_mask_erode_halo_no_seam_invalidation(spark):
    """The r5 seam fix: mask_erode through apply_focal must equal erosion
    of the WHOLE scene mask (zero border — the reference's raster-border
    rule) — in particular, interior tile seams of an all-valid scene stay
    valid (the pre-fix zero-pad-per-tile invalidated a grid of lines at
    every tile boundary)."""
    import pandas as pd
    tiles_x, tiles_y, tile = 3, 2, 16
    rng = np.random.default_rng(4)
    full_mask = rng.random((tiles_y * tile, tiles_x * tile)) > 0.2
    rows = []
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            m = full_mask[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
            px = np.stack([np.full((tile, tile), 3.0, np.float32),
                           m.astype(np.float32)])
            rows.append({"scene_id": "s", "tx": tx, "ty": ty,
                         "bytes": codec.encode(px, "raw")})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = focal.apply_focal(df, focal.mask_erode(3), fmt_out="raw").toPandas()
    want_full = focal.erode_mask_np(full_mask, 3).astype(bool)
    for _, row in out.iterrows():
        got = codec.decode(bytes(row["bytes"]))
        tx, ty = int(row["tx"]), int(row["ty"])
        want = want_full[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile]
        assert np.array_equal(got[1].astype(bool), want), (tx, ty)
        assert (got[0] == 3.0).all()                   # value band untouched
    # sanity: an all-valid scene keeps interior seams valid
    rows2 = [{"scene_id": "s2", "tx": tx, "ty": 0,
              "bytes": codec.encode(np.stack(
                  [np.full((tile, tile), 1.0, np.float32),
                   np.ones((tile, tile), np.float32)]), "raw")}
             for tx in range(2)]
    out2 = focal.apply_focal(spark.createDataFrame(pd.DataFrame(rows2)),
                             focal.mask_erode(3), fmt_out="raw").toPandas()
    m0 = codec.decode(bytes(out2[out2.tx == 0]["bytes"].iloc[0]))[1]
    m1 = codec.decode(bytes(out2[out2.tx == 1]["bytes"].iloc[0]))[1]
    assert m0[5, -1] == 1 and m1[5, 0] == 1           # seam columns VALID
    assert m0[0, 5] == 0 and m0[5, 0] == 0            # scene border invalid


def test_rank_filter_rejects_even_size():
    with pytest.raises(ValueError, match="odd"):
        focal.rank_filter("min", 4)
    with pytest.raises(ValueError, match="odd"):
        focal.mask_erode(2)


def test_apply_focal_custom_grid_cols(spark):
    """grid_cols parameterization end to end: custom names (and a bigint
    tile axis) must come back out under the caller's names — the pre-r5
    schema hardcoded scene_id/tx/ty."""
    import pandas as pd
    tile = 8
    rows = []
    for tx in range(2):
        z = np.arange(tile * tile, dtype=np.float32).reshape(1, tile, tile) + tx
        rows.append({"sid": 7, "gx": tx, "gy": 0,
                     "bytes": codec.encode(z, "raw")})
    df = spark.createDataFrame(pd.DataFrame(rows))   # sid/gx/gy are bigint
    out = focal.apply_focal(df, focal.rank_filter("max", 3), fmt_out="raw",
                            meta_cols=(), grid_cols=("sid", "gx", "gy"))
    pdf = out.toPandas()
    assert set(["sid", "gx", "gy"]).issubset(pdf.columns)
    assert sorted(pdf["gx"].tolist()) == [0, 1]
    assert pdf["sid"].unique().tolist() == [7]
    px = codec.decode(bytes(pdf[pdf.gx == 0]["bytes"].iloc[0]))
    assert px.shape == (1, tile, tile)
