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
    """EVERY .rft.xml that ships with the reference either compiles to an
    executable chain spec or fails with a ValueError that names the engine's
    table-level replacement — never an unexplained crash."""
    import glob
    files = sorted(glob.glob("/root/reference/functions/*.rft.xml")
                   + glob.glob("/root/reference/functions/deprecated/*.rft.xml"))
    assert len(files) >= 45
    loaded, redirected, other = [], [], []
    for f in files:
        try:
            spec = rft.load_rft(f)
            assert isinstance(spec, list) and spec, f
            loaded.append(f)
        except ValueError as e:
            (redirected if ("table-level" in str(e) or "two-pass" in str(e))
             else other).append((f, str(e)))
    assert len(loaded) >= 26, (len(loaded), other)
    # every non-loading template gets a redirect to the table-level API
    assert not other, other


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
