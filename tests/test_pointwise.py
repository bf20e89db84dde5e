import numpy as np

from raster_functions_spark.operators import pointwise as P


def _rng(seed=0):
    return np.random.default_rng(seed)


def test_ndvi_formula():
    px = _rng().integers(1, 250, (2, 16, 16)).astype(np.uint8)
    out = P.ndvi().apply(px, {})
    red, nir = px[0].astype(np.float64), px[1].astype(np.float64)
    want = (nir - red) / (nir + red)
    assert np.allclose(out[0], want, atol=1e-6)


def test_ndvi_scaled_range():
    px = _rng(1).integers(0, 255, (2, 8, 8)).astype(np.uint8)
    out = P.ndvi(scaled=True).apply(px, {})
    assert out.dtype == np.uint8
    assert out.min() >= 0 and out.max() <= 200


def test_ndvi_zero_denominator():
    px = np.zeros((2, 4, 4), dtype=np.uint8)
    out = P.ndvi().apply(px, {})
    assert np.all(out == 0)


def test_nbr_and_dnbr_composition():
    px1 = _rng(2).integers(1, 200, (2, 8, 8)).astype(np.float32)
    px2 = _rng(3).integers(1, 200, (2, 8, 8)).astype(np.float32)
    n1 = P.nbr(0, 1).apply(px1, {})
    n2 = P.nbr(0, 1).apply(px2, {})
    dnbr = n1 - n2  # DifferencedNormalizedBurnRatio = NBR1 - NBR2
    assert dnbr.shape == (1, 8, 8)
    assert np.isfinite(dnbr).all()


def test_arithmetic_div_by_zero_safe():
    px = np.stack([np.full((4, 4), 10.0), np.zeros((4, 4))]).astype(np.float32)
    out = P.band_arithmetic("div").apply(px, {})
    assert np.isfinite(out).all()


def test_windchill_nws_value():
    # NWS reference point: T=0F, wind=15mph → about -19F
    px = np.stack([np.full((2, 2), 0.0), np.full((2, 2), 15.0)]).astype(np.float32)
    out = P.windchill().apply(px, {})
    assert np.allclose(out, -19.0, atol=0.5)
    # calm wind / warm temp → passthrough
    px2 = np.stack([np.full((2, 2), 60.0), np.full((2, 2), 10.0)]).astype(np.float32)
    assert np.allclose(P.windchill().apply(px2, {}), 60.0)


def test_heat_index_value():
    # Rothfusz reference point: T=90F RH=70% → ~105-106F
    px = np.stack([np.full((2, 2), 90.0), np.full((2, 2), 70.0)]).astype(np.float32)
    out = P.heat_index().apply(px, {})
    assert 104.0 < float(out[0, 0, 0]) < 107.0


def test_fuzzy_membership_modes():
    px = np.linspace(0, 100, 64, dtype=np.float32).reshape(1, 8, 8)
    for mode, kw in [("linear", dict(lo=0, hi=100)),
                     ("gaussian", dict(midpoint=50, spread=0.001)),
                     ("small", dict(midpoint=50, spread=5)),
                     ("large", dict(midpoint=50, spread=5)),
                     ("near", dict(midpoint=50, spread=0.01)),
                     ("mssmall", dict(mean=50, std=20, spread=1)),
                     ("mslarge", dict(mean=50, std=20, spread=1))]:
        out = P.fuzzy_membership(mode, **kw).apply(px, {})
        assert out.min() >= 0.0 and out.max() <= 1.0, mode
    # hedges
    base = P.fuzzy_membership("linear", lo=0, hi=100).apply(px, {})
    sq = P.fuzzy_membership("linear", lo=0, hi=100, hedge="square").apply(px, {})
    assert np.allclose(sq, base ** 2, atol=1e-6)
    # monotonicity: large increases with x, small decreases
    lg = P.fuzzy_membership("large", midpoint=50, spread=5).apply(px, {})[0].ravel()
    assert (np.diff(lg[1:]) >= -1e-9).all()


def test_qa_bitmask_and_clear():
    qa = np.array([[672, 676, 680, 684], [712, 752, 6816, 0]], dtype=np.uint16)[None]
    clear = P.qa_clear(0, (672, 676, 680, 684)).apply(qa, {})
    assert clear[0, 0].all() and not clear[0, 1].any()
    bm = P.qa_bitmask(0, 0b10000).apply(qa, {})  # bit 4
    want = (qa[0] & 0b10000) != 0
    assert np.array_equal(bm[0].astype(bool), want)


def test_replace_and_fill_and_mask():
    px = np.array([[[0, 5], [0, 7]]], dtype=np.uint8)
    out = P.replace_value(0, 9).apply(px, {})
    assert out.tolist() == [[[9, 5], [9, 7]]]
    fill = P.fill_constant(3.5).apply(px, {})
    assert np.allclose(fill, 3.5)
    masked = P.mask_apply(0, 1).apply(np.stack([px[0], (px[0] > 4).astype(np.uint8)]), {})
    assert masked[0].tolist() == [[0, 5], [0, 7]]


def test_linear_unmixing_exact_recovery():
    sig = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])  # 3 bands, 2 endmembers
    frac = _rng(4).random((2, 6 * 6))
    y = (sig @ frac).reshape(3, 6, 6).astype(np.float32)
    out = P.linear_unmixing(sig).apply(y, {})
    assert out.shape == (3, 6, 6)  # 2 fractions + R2
    assert np.allclose(out[:2].reshape(2, -1), frac, atol=1e-4)
    assert np.allclose(out[2], 1.0, atol=1e-5)  # perfect fit → R²=1


def test_calculator_expression():
    px = _rng(5).random((2, 4, 4)).astype(np.float32)
    op = P.calculator("Sin(a)*Cos(b) + 1.5", {"a": 0, "b": 1})
    out = op.apply(px, {})
    want = np.sin(px[0].astype(np.float64)) * np.cos(px[1].astype(np.float64)) + 1.5
    assert np.allclose(out[0], want, atol=1e-6)


def test_calculator_rejects_unknown_names():
    import pytest
    with pytest.raises(ValueError):
        P.calculator("__import__('os')", {})


def test_latitude_source():
    px = np.zeros((1, 4, 8), dtype=np.float32)
    meta = {"ymax": 50.0, "ymin": 46.0}
    out = P.latitude_source().apply(px, meta)
    assert np.allclose(out[0][:, 0], [49.5, 48.5, 47.5, 46.5])
    assert np.allclose(out[0][0], out[0][0, 0])  # constant per row


def test_vineyard_score():
    px = np.stack([np.full((2, 2), 100.0), np.full((2, 2), 10.0), np.full((2, 2), 150.0)])
    assert (P.vineyard_suitability().apply(px.astype(np.float32), {}) == 3).all()


def test_remap_and_stretch_and_colormap():
    px = np.array([[[10, 60], [110, 200]]], dtype=np.uint8)
    r = P.remap([(0, 50, 1), (50, 100, 2), (100, 255, 3)]).apply(px, {})
    assert r[0].tolist() == [[1, 2], [3, 3]]
    s = P.stretch(0, 0, 200, 0, 1).apply(px, {})
    assert np.allclose(s[0], px[0] / 200.0, atol=1e-6)
    cm = P.colormap({1: (255, 0, 0), 2: (0, 255, 0)}, 0).apply(r.astype(np.uint8), {})
    assert cm.shape == (3, 2, 2) and cm[0, 0, 0] == 255


def test_per_second_to_per_month():
    px = np.ones((1, 2, 2), dtype=np.float32)
    out = P.per_second_to_per_month().apply(px, {"days_in_month": 30})
    assert np.allclose(out, 30 * 86400.0)
