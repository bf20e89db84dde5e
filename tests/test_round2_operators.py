"""Round-2 new operators: FishHabitatSuitability (F7), geographic
z-factor terrain ops, CSS-SARIMA (A11/M5), multi-class GBT (M4),
whole-scene cloud fill (J9)."""

import numpy as np
import pandas as pd

from raster_functions_spark import codec, fixtures
from raster_functions_spark.operators import focal, ml, multiraster as mr, pointwise


# ------------------------------------------------- F7 fish habitat ---------

def test_fish_habitat_matches_reference_putmask():
    """Golden vs a direct transcription of FishHabitatSuitability.py:71-99
    (putmask cascade; conditions evaluate against the pre-mask values)."""
    t = np.array([[15.0, 20.0, 27.0, 30.0, 34.0]], dtype=np.float32)
    s = np.array([[30.0, 33.0, 36.0, 36.5, 37.0]], dtype=np.float32)
    px = np.stack([t, s])
    for depth, d_want in ((1.0, 0.5), (5.0, 1.0), (15.0, 5.0 / 9.0), (25.0, 0.0)):
        out = pointwise.fish_habitat_suitability(depth).apply(px, {})[0]

        tt = t.astype(np.float64).copy()
        np.putmask(tt, tt <= 26.37, (tt - 17.99) / (26.37 - 17.99))
        np.putmask(tt, tt >= 29.15, (tt - 33.35) / (29.15 - 33.35))
        np.putmask(tt, (tt > 26.37) & (tt < 29.15), 1)
        np.putmask(tt, tt < 0, 0)
        ss = s.astype(np.float64).copy()
        np.putmask(ss, ss <= 32.27, (ss - 28.81) / (32.27 - 28.81))
        np.putmask(ss, ss >= 35.81, (ss - 36.79) / (35.81 - 36.79))
        np.putmask(ss, (ss > 32.27) & (ss < 35.81), 1)
        np.putmask(ss, ss < 0, 0)
        want = tt * ss * d_want
        assert np.allclose(out, want, atol=1e-5), f"depth={depth}"


def test_fish_habitat_in_chain_registry(spark):
    from raster_functions_spark.plans import chain
    rows = [{"scene_id": "s", "tx": 0, "ty": 0,
             "bytes": codec.encode(np.stack([
                 np.full((8, 8), 27.0, np.float32),
                 np.full((8, 8), 33.0, np.float32)]))}]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = chain.build_chain(df, [{"op": "fish_habitat", "args": {"depth": 5.0}}],
                            fmt_out="raw").collect()[0]
    px = codec.decode(bytes(out["bytes"]))[0]
    assert np.allclose(px, 1.0)  # plateau T, plateau S, plateau depth


# ------------------------------------------------- geographic z-factor -----

def test_slope_geographic_zfactor_closed_form():
    """Plane DEM with meter elevations on a 0.001° grid: without the
    degrees→meters conversion the slope is ~89.99°; with it the slope
    matches atan(rise/run_m) in closed form."""
    a = 5.0  # meters of rise per cell step in x
    yy, xx = np.mgrid[0:34, 0:34]
    z = (a * xx).astype(np.float64)
    cs = 0.001
    op = focal.slope(cellsize=cs, geographic=True)
    out = op.fn(z[None], {})[0]
    want = np.degrees(np.arctan(a / (cs * focal.DEG_TO_M)))
    assert np.allclose(out, want, atol=1e-4)
    # and the uncorrected op is wildly different (the ~1e5× bug class)
    out_raw = focal.slope(cellsize=cs).fn(z[None], {})[0]
    assert out_raw.min() > 89.9


def test_slope_lat_correction_anisotropic():
    """At latitude 60° the x cell shrinks by cos(60°)=0.5, so an east-west
    gradient steepens 2× vs the isotropic conversion."""
    a = 5.0
    yy, xx = np.mgrid[0:34, 0:34]
    z = (a * xx).astype(np.float64)
    cs = 0.001
    meta = {"ymax": 60.0 + 16 * cs, "cell_dy": cs}  # tile center at 60°
    out = focal.slope(cellsize=cs, geographic=True, lat_correct=True).fn(
        z[None], meta)[0]
    dx_m = cs * focal.DEG_TO_M * np.cos(np.radians(60.0))
    want = np.degrees(np.arctan(a / dx_m))
    assert np.allclose(out, want, atol=1e-3)


# ------------------------------------------------- SARIMA ------------------

def _gen_sarima(n, phi, Phi, c, period=12, seed=3, noise=0.5):
    rng = np.random.default_rng(seed)
    y = np.zeros(n + 200)
    for t in range(period + 1, len(y)):
        y[t] = (c + phi * y[t - 1] + Phi * y[t - period]
                - phi * Phi * y[t - period - 1] + rng.normal(0, noise))
    return y[-n:]


def test_sarima_css_recovers_parameters():
    y = _gen_sarima(600, phi=0.6, Phi=0.5, c=2.0)
    c, phi, Phi = ml.sarima_css_fit_batch(y[None], period=12)
    assert abs(phi[0] - 0.6) < 0.08
    assert abs(Phi[0] - 0.5) < 0.08


def test_sarima_beats_seasonal_naive_on_ar_series():
    """Aggregate forecast MSE across seeds (any single draw can favor
    either model; the fitted model must win on average)."""
    mse_sarima = mse_naive = 0.0
    for seed in range(6):
        y = _gen_sarima(360, phi=0.8, Phi=0.6, c=1.0, noise=0.3, seed=seed)
        train, test = y[:-12], y[-12:]
        fc = ml.sarima_forecast_batch(train[None], horizon=12, period=12)[0]
        mse_sarima += np.mean((fc - test) ** 2)
        mse_naive += np.mean((train[-12:] - test) ** 2)
    assert mse_sarima < mse_naive


def test_sarima_by_group_and_stack(spark):
    # by-group shape
    rows = []
    for g in range(2):
        y = _gen_sarima(120, phi=0.5, Phi=0.4, c=1.0 + g, seed=g)
        rows += [{"g": g, "t": t, "v": float(v)} for t, v in enumerate(y)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = ml.sarima_forecast_by_group(df, ["g"], "v", "t", period=12).toPandas()
    assert len(out) == 2 and out["n_obs"].tolist() == [120, 120]
    assert np.isfinite(out["forecast"]).all()

    # per-pixel stack: constant-in-space series → uniform delta band
    tiles = []
    y = _gen_sarima(60, phi=0.5, Phi=0.4, c=1.0, seed=9)
    for t in range(60):
        tiles.append({"scene_id": "s", "t": t,
                      "bytes": codec.encode(np.full((1, 4, 4), y[t], np.float32))})
    sdf = spark.createDataFrame(pd.DataFrame(tiles))
    res = ml.sarima_stack_delta(sdf, period=12, horizon=6).collect()[0]
    band = codec.decode(bytes(res["bytes"]))[0]
    assert res["n_obs"] == 60
    assert np.allclose(band, band[0, 0], atol=1e-3)  # spatially uniform
    assert np.isfinite(band).all()


# ------------------------------------------------- multi-class GBT ---------

def test_gbt_multiclass_one_vs_rest():
    rng = np.random.default_rng(5)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    X = np.vstack([c + rng.normal(0, 0.8, (60, 2)) for c in centers])
    y = np.repeat([0, 1, 2], 60)
    op = ml.gradient_boosted_classifier(X, y, n_rounds=25)
    assert op.bands_out == 4  # class + 3 probability bands
    grid = np.stack([centers.T[0].reshape(1, 3), centers.T[1].reshape(1, 3)])
    out = op.apply(grid.astype(np.float32), {})
    assert out[0].ravel().tolist() == [0.0, 1.0, 2.0]  # centers classified
    probs = out[1:, 0, :]  # (3 classes, 3 points)
    assert np.allclose(probs.sum(axis=0), 1.0, atol=1e-6)
    assert (probs.argmax(axis=0) == np.array([0, 1, 2])).all()


def test_gbt_binary_unchanged():
    rng = np.random.default_rng(6)
    X = np.vstack([rng.normal(0, 1, (50, 2)), rng.normal(6, 1, (50, 2))])
    y = np.repeat([0, 1], 50)
    op = ml.gradient_boosted_classifier(X, y, n_rounds=15)
    assert op.bands_out == 2
    out = op.apply(np.array([[[0.0, 6.0]], [[0.0, 6.0]]], np.float32), {})
    assert out[0].ravel().tolist() == [0.0, 1.0]


# ------------------------------------------------- scene cloud fill --------

def test_cloud_fill_scene_crosses_tile_boundary(spark):
    """Mask region spanning the boundary between two 16px tiles: the
    whole-scene fill must equal ring_fill_np on the assembled mosaic
    (which per-tile fill cannot reproduce — its rings can't cross tiles)."""
    tile = 16
    yy, xx = np.mgrid[0:16, 0:32]
    t_full = (xx * 3.0).astype(np.float64)
    r_full = t_full * 0.9 + 4.0
    m_full = np.zeros((16, 32), np.float64)
    m_full[4:12, 10:22] = 1                      # spans x=16 boundary
    want = mr.ring_fill_np(t_full, r_full, m_full, window=8)

    def tiles(full, name):
        rows = []
        for tx in range(2):
            sl = full[:, tx * tile:(tx + 1) * tile]
            rows.append({"scene_id": "s", "tx": tx, "ty": 0,
                         "bytes": codec.encode(
                             np.ascontiguousarray(sl)[None].astype(np.float32))})
        return spark.createDataFrame(pd.DataFrame(rows))

    out = mr.cloud_fill_scene(tiles(t_full, "t"), tiles(r_full, "r"),
                              tiles(m_full, "m"), tile=tile,
                              fmt_out="raw").collect()
    got = np.zeros((16, 32), np.float32)
    for row in out:
        got[:, row["tx"] * tile:(row["tx"] + 1) * tile] = \
            codec.decode(bytes(row["bytes"]))[0]
    # same algorithm on f32-quantized mosaics — compare loosely
    assert np.allclose(got, want, atol=1e-2)
    assert np.isfinite(got).all()
