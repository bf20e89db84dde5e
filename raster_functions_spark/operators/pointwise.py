"""Per-pixel (map) operators — SURVEY.md §2.8 F-class, §2.2 P-class.

Each builder returns a :class:`~raster_functions_spark.raster.TileOp` whose
kernel is a whole-array NumPy expression (vectorized; zero Python loops over
pixels). Formulas match the cited reference operators behaviorally; the
implementations are written fresh against the published formulas.
"""

from __future__ import annotations

import numpy as np

from ..raster import TileOp

# NoData sentinels by pixel-type code — the reference keeps a per-type
# sentinel table (/root/reference/functions/deprecated/AspectSlope.py:123-138).
NODATA = {"u1": 255, "u2": 65535, "i2": -32768, "i4": -2147483648,
          "f4": np.float32(-3.4028235e38), "f8": -1.7976931348623157e308}


def ndvi(red_band: int = 0, nir_band: int = 1, scaled: bool = False) -> TileOp:
    """(nir−red)/(nir+red); optional grayscale scaling *100+100 — behavior of
    /root/reference/functions/deprecated/NDVI.py:90-101."""
    def fn(px, meta):
        red = px[red_band].astype(np.float32)
        nir = px[nir_band].astype(np.float32)
        denom = nir + red
        with np.errstate(divide="ignore", invalid="ignore"):
            v = np.where(denom == 0, 0.0, (nir - red) / denom).astype(np.float32)
        if scaled:
            v = np.clip(v * 100.0 + 100.0, 0, 200).astype(np.uint8)
        return v
    return TileOp("ndvi", fn, bands_out=1, dtype_out="u1" if scaled else "f4")


def nbr(nir_band: int, swir_band: int) -> TileOp:
    """Normalized burn ratio (nir−swir)/(nir+swir) — the per-raster half of
    /root/reference/functions/deprecated/DifferencedNormalizedBurnRatio.py:99-117."""
    def fn(px, meta):
        nir = px[nir_band].astype(np.float32)
        swir = px[swir_band].astype(np.float32)
        d = nir + swir
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(d == 0, 0.0, (nir - swir) / d).astype(np.float32)
    return TileOp("nbr", fn, bands_out=1, dtype_out="f4")


def band_arithmetic(op: str, a_band: int = 0, b_band: int = 1) -> TileOp:
    """add/sub/mul/div of two bands — Arithmetic over co-registered inputs
    (/root/reference/functions/deprecated/Arithmetic.py:46-64)."""
    f = {"add": np.add, "sub": np.subtract, "mul": np.multiply,
         "div": np.divide}[op.lower()]
    def fn(px, meta):
        a = px[a_band].astype(np.float64)
        b = px[b_band].astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = f(a, b)
        return np.nan_to_num(out, nan=0.0, posinf=0.0, neginf=0.0).astype(np.float32)
    return TileOp(f"arith_{op}", fn, bands_out=1, dtype_out="f4")


_WC_T_IN = {"f": (1.0, 0.0), "k": (1.8, -459.67), "c": (1.8, 32.0)}
# NOTE: the knots and ft/s factors replicate the REFERENCE's own
# conversions verbatim (Windchill.py:108-115: ``ws /= 1.15077945`` for
# knots, ``ws *= 5280/3600`` for ft/s) — physically both are inverted
# (1 knot = 1.15078 mph ⇒ multiply; 1 ft/s = 0.682 mph ⇒ divide), but
# output parity with the reference is the contract here, exactly like the
# SARIMA index-arithmetic divergences documented in operators/ml.py. The
# m/s and kph entries are correct in both codebases.
_WC_W_IN = {"mph": 1.0, "m/s": 3600.0 / 1609.344, "kph": 1.0 / 1.609344,
            "knots": 1.0 / 1.15077945, "ft/s": 5280.0 / 3600.0}


def windchill(temp_band: int = 0, wind_band: int = 1, t_units: str = "f",
              w_units: str = "mph", out_units: str = "f") -> TileOp:
    """NWS wind-chill — formula behavior of
    /root/reference/functions/deprecated/Windchill.py:117-119, with the
    reference's full unit surface (Windchill.py:101-126): temperature in
    °F/K/°C, wind in mph/(m/s)/kph/knots/(ft/s), output in °F/K/°C. All
    conversions use the reference's exact constants."""
    ta, tb = _WC_T_IN[t_units.lower()]
    wk = _WC_W_IN[w_units.lower()]
    ou = out_units.lower()

    def fn(px, meta):
        t = px[temp_band].astype(np.float64) * ta + tb          # → °F
        w = px[wind_band].astype(np.float64) * wk               # → mph
        w16 = np.power(np.maximum(w, 0.0), 0.16)
        wc = 35.74 + 0.6215 * t - 35.75 * w16 + 0.4275 * t * w16
        wc = np.where((t <= 50.0) & (w > 3.0), wc, t)
        if ou == "k":
            wc = (wc + 459.67) / 1.8
        elif ou == "c":
            wc = (wc - 32.0) / 1.8
        return wc.astype(np.float32)
    return TileOp("windchill", fn, bands_out=1, dtype_out="f4")


def heat_index(temp_band: int = 0, rh_band: int = 1) -> TileOp:
    """Rothfusz heat-index regression (°F, %RH) with the standard low-HI
    fallback and both NWS conditional adjustments — behavior of
    /root/reference/functions/deprecated/HeatIndex.py:90-108: the full
    regression applies only where (simple + T)/2 > 80 (strict; == 80 keeps
    the simple formula), minus the low-RH correction (RH < 13, 80 ≤ T ≤ 112)
    and plus the high-RH correction (RH > 85, 80 ≤ T ≤ 87)."""
    def fn(px, meta):
        t = px[temp_band].astype(np.float64)
        r = px[rh_band].astype(np.float64)
        hi = (-42.379 + 2.04901523 * t + 10.14333127 * r
              - 0.22475541 * t * r - 6.83783e-3 * t * t - 5.481717e-2 * r * r
              + 1.22874e-3 * t * t * r + 8.5282e-4 * t * r * r
              - 1.99e-6 * t * t * r * r)
        simple = 0.5 * (t + 61.0 + (t - 68.0) * 1.2 + r * 0.094)
        use_full = 0.5 * (simple + t) > 80.0
        low_rh = use_full & (r < 13.0) & (t >= 80.0) & (t <= 112.0)
        with np.errstate(invalid="ignore"):
            hi = hi - np.where(
                low_rh,
                ((13.0 - r) / 4.0) * np.sqrt(np.maximum(17.0 - np.abs(t - 95.0), 0.0) / 17.0),
                0.0)
        high_rh = use_full & (r > 85.0) & (t >= 80.0) & (t <= 87.0)
        hi = hi + np.where(high_rh, ((t - 85.0) / 10.0) * ((87.0 - t) / 5.0), 0.0)
        return np.where(use_full, hi, simple).astype(np.float32)
    return TileOp("heat_index", fn, bands_out=1, dtype_out="f4")


def fuzzy_membership(mode: str, band: int = 0, lo: float = 0.0, hi: float = 1.0,
                     midpoint: float | None = None, spread: float = 0.1,
                     mean: float | None = None, std: float | None = None,
                     hedge: str | None = None) -> TileOp:
    """Fuzzy membership transforms (linear/gaussian/small/large/near/
    mssmall/mslarge) + sqrt/square hedges, clipped to [0,1] — the surface of
    /root/reference/functions/FuzzyMembership.py:114-161. The ms* modes take
    dataset-level mean/std (two-pass plan: compute stats first, then map —
    SURVEY.md §2.4 A10)."""
    def fn(px, meta):
        x = px[band].astype(np.float64)
        m = midpoint if midpoint is not None else (lo + hi) / 2.0
        if mode == "linear":
            with np.errstate(divide="ignore", invalid="ignore"):
                v = (x - lo) / (hi - lo) if hi != lo else np.zeros_like(x)
        elif mode == "gaussian":
            v = np.exp(-spread * (x - m) ** 2)
        elif mode == "small":
            with np.errstate(over="ignore"):
                v = 1.0 / (1.0 + (np.maximum(x, 1e-300) / m) ** spread)
        elif mode == "large":
            with np.errstate(over="ignore"):
                v = 1.0 / (1.0 + (np.maximum(x, 1e-300) / m) ** (-spread))
        elif mode == "near":
            v = 1.0 / (1.0 + spread * (x - m) ** 2)
        elif mode == "mssmall":
            mu = mean if mean is not None else meta["stat_mean"]
            sd = std if std is not None else meta["stat_std"]
            v = np.where(x <= mu, 1.0, (spread * sd) / np.maximum(np.abs(x - mu) + spread * sd, 1e-12))
        elif mode == "mslarge":
            mu = mean if mean is not None else meta["stat_mean"]
            sd = std if std is not None else meta["stat_std"]
            v = np.where(x >= mu, 1.0, (spread * sd) / np.maximum(np.abs(x - mu) + spread * sd, 1e-12))
        else:
            raise ValueError(f"unknown fuzzy mode {mode}")
        if hedge == "sqrt":
            v = np.sqrt(np.clip(v, 0, 1))
        elif hedge == "square":
            v = np.clip(v, 0, 1) ** 2
        return np.clip(v, 0.0, 1.0).astype(np.float32)
    return TileOp(f"fuzzy_{mode}", fn, bands_out=1, dtype_out="f4")


def qa_bitmask(band: int, mask_bits: int, invert: bool = False) -> TileOp:
    """Output 1 where ``qa & mask_bits`` is nonzero — bitmask predicate of
    /root/reference/functions/LandsatC2QA.py:100-127, vectorized (the
    reference loops per value; identical math)."""
    def fn(px, meta):
        hit = (px[band].astype(np.int64) & mask_bits) != 0
        return (~hit if invert else hit).astype(np.uint8)
    return TileOp("qa_bitmask", fn, bands_out=1, dtype_out="u1")


def qa_clear(band: int, clear_values: tuple[int, ...]) -> TileOp:
    """1 where QA ∈ whitelist — clear-pixel filter
    (/root/reference/functions/LandsatPixelPercentile.py:15-17,178-182,
    vectorized via np.isin like LandsatMedianImage.py:25-27)."""
    vals = np.asarray(clear_values)
    def fn(px, meta):
        return np.isin(px[band], vals).astype(np.uint8)
    return TileOp("qa_clear", fn, bands_out=1, dtype_out="u1")


def replace_value(match: float, fill: float, band: int | None = None) -> TileOp:
    """Replace matching pixels with a constant — ReplaceNulls behavior
    (/root/reference/functions/ReplaceNulls.py:47-57)."""
    def fn(px, meta):
        out = px.copy()
        sel = out if band is None else out[band:band + 1]
        sel[sel == match] = np.asarray(fill, dtype=out.dtype)
        return out
    return TileOp("replace_value", fn)


def fill_constant(value: float, dtype: str = "f4") -> TileOp:
    """Constant raster — FillRaster (/root/reference/functions/FillRaster.py:38-40)."""
    def fn(px, meta):
        return np.full_like(px[:1], value, dtype=np.dtype(dtype))
    return TileOp("fill", fn, bands_out=1, dtype_out=dtype)


def mask_apply(value_band: int, mask_band: int, nodata: float = 0) -> TileOp:
    """Apply a second band as validity mask: keep value where mask>0 else
    nodata — MaskRaster semantics (/root/reference/functions/MaskRaster.py:34-40)."""
    def fn(px, meta):
        v = px[value_band]
        return np.where(px[mask_band] > 0, v, np.asarray(nodata, v.dtype))
    return TileOp("mask_apply", fn, bands_out=1)


def linear_unmixing(signatures: np.ndarray, residual_band: bool = True) -> TileOp:
    """Per-pixel least squares vs endmember signatures (+R² band) —
    LinearSpectralUnmixing (/root/reference/functions/deprecated/
    LinearSpectralUnmixing.py:90-124), solved for ALL pixels in one lstsq
    call instead of per pixel."""
    A = np.asarray(signatures, dtype=np.float64)  # (n_bands, n_endmembers)
    def fn(px, meta):
        bands, h, w = px.shape
        y = px.reshape(bands, -1).astype(np.float64)
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)       # (n_end, h*w)
        out = [c.reshape(h, w) for c in coef]
        if residual_band:
            resid = y - A @ coef
            ss_res = (resid ** 2).sum(axis=0)
            ss_tot = ((y - y.mean(axis=0)) ** 2).sum(axis=0)
            with np.errstate(divide="ignore", invalid="ignore"):
                r2 = np.where(ss_tot == 0, 0.0, 1.0 - ss_res / ss_tot)
            out.append(r2.reshape(h, w))
        return np.stack(out).astype(np.float32)
    return TileOp("unmix", fn, dtype_out="f4")


def calculator(expression: str, band_names: dict[str, int]) -> TileOp:
    """String expression over named bands — RasterCalculator analog
    (SURVEY.md §2.8 F13; expression style of
    'Annual Direct Incident Radiation.rft.xml'). Evaluated with a restricted
    NumPy namespace (Sin/Cos/Tan/… as in the template language)."""
    ns = {"Sin": np.sin, "Cos": np.cos, "Tan": np.tan, "ASin": np.arcsin,
          "ACos": np.arccos, "ATan": np.arctan, "Sqrt": np.sqrt, "Abs": np.abs,
          "Exp": np.exp, "Ln": np.log, "Log10": np.log10, "Pow": np.power,
          "Min": np.minimum, "Max": np.maximum, "pi": np.pi,
          # RasterCalculatorFunction spellings (TerrainRuggedness template)
          "Square": np.square, "SquareRoot": np.sqrt}
    code = compile(expression, "<calculator>", "eval")
    for name in code.co_names:
        if name not in ns and name not in band_names:
            raise ValueError(f"unknown name {name!r} in calculator expression")
    def fn(px, meta):
        local = {k: px[v].astype(np.float64) for k, v in band_names.items()}
        out = eval(code, {"__builtins__": {}}, {**ns, **local})
        return np.asarray(out, dtype=np.float32)
    return TileOp("calculator", fn, dtype_out="f4")


def latitude_source() -> TileOp:
    """Per-pixel map latitude from tile georeference — Latitude source
    (/root/reference/functions/Latitude.py:53-59). Needs meta ymax + cell_dy."""
    def fn(px, meta):
        h, w = px.shape[1], px.shape[2]
        # lazy fallback: dict.get evaluates its default eagerly, which
        # would demand ymin even when cell_dy is present
        dy = (float(meta["cell_dy"]) if "cell_dy" in meta
              else (meta["ymax"] - meta["ymin"]) / h)
        lat = meta["ymax"] - (np.arange(h, dtype=np.float64) + 0.5) * dy
        return np.broadcast_to(lat[:, None], (h, w)).astype(np.float32).copy()
    return TileOp("latitude", fn, bands_out=1, dtype_out="f4")


def random_source(bands: int = 3) -> TileOp:
    """Deterministic pseudo-random raster (hash-seeded per tile) — Random
    source (/root/reference/functions/deprecated/Random.py:23-51) made
    reproducible for distributed runs. The seed is a process-independent
    splitmix64 over the md5 of the tile id (NOT Python hash(): str hashing
    is PYTHONHASHSEED-salted per process, so it only looks stable when the
    runtime pins the seed — the driver and a non-default worker env would
    produce different rasters)."""
    import hashlib
    from ..fixtures import splitmix64

    def fn(px, meta):
        h, w = px.shape[1], px.shape[2]
        key = str(meta.get("image_id", 0)).encode()
        base = int.from_bytes(hashlib.md5(key).digest()[:8], "little")
        seed = int(splitmix64(np.uint64(base)))
        rng = np.random.default_rng(seed)
        return rng.random((bands, h, w)).astype(np.float32)
    return TileOp("random", fn, bands_out=bands, dtype_out="f4")


def vineyard_suitability(elev_band: int = 0, slope_band: int = 1,
                         aspect_band: int = 2) -> TileOp:
    """Boolean-threshold suitability sum — VineyardAnalysis
    (/root/reference/functions/VineyardAnalysis.py:61-71)."""
    def fn(px, meta):
        e = px[elev_band].astype(np.float64)
        s = px[slope_band].astype(np.float64)
        a = px[aspect_band].astype(np.float64)
        score = (((e > 30) & (e < 400)).astype(np.uint8)
                 + ((s > 5) & (s < 60)).astype(np.uint8)
                 + ((a > 0) & (a < 200)).astype(np.uint8))
        return score.astype(np.uint8)
    return TileOp("vineyard", fn, bands_out=1, dtype_out="u1")


def _piecewise_suitability(x: np.ndarray, min_a: float, min_p: float,
                           max_p: float, max_a: float) -> np.ndarray:
    """Trapezoidal membership: 0 at/below min_a, ramp up to 1 at min_p,
    1 on the [min_p, max_p] plateau, ramp down to 0 at max_a — the
    putmask cascade of FishHabitatSuitability.py:75-96 (values beyond the
    absolute bounds go negative on the ramps and are clipped to 0, exactly
    like the reference's final ``t < 0 → 0`` mask)."""
    out = np.where(x <= min_p, (x - min_a) / (min_p - min_a), 1.0)
    out = np.where(x >= max_p, (x - max_a) / (max_p - max_a), out)
    return np.where(out < 0, 0.0, out)


def fish_habitat_suitability(depth: float, temp_band: int = 0,
                             salinity_band: int = 1) -> TileOp:
    """F7 FishHabitatSuitability: product of piecewise-linear temperature
    and salinity memberships with a scalar depth score — the exact
    parameters and putmask semantics of
    /root/reference/functions/FishHabitatSuitability.py:52-99 (shark
    habitat model: T 17.99/26.37/29.15/33.35 °C, S 28.81/32.27/35.81/36.79
    PSU, depth 0/2/11/20 m; depth outside [0, 20] → 0)."""
    d = abs(float(depth))
    if d < 0.0 or d > 20.0:
        d_score = 0.0
    else:
        d_score = float(_piecewise_suitability(np.asarray(d), 0.0, 2.0, 11.0, 20.0))

    def fn(px, meta):
        t = _piecewise_suitability(px[temp_band].astype(np.float64),
                                   17.99, 26.37, 29.15, 33.35)
        s = _piecewise_suitability(px[salinity_band].astype(np.float64),
                                   28.81, 32.27, 35.81, 36.79)
        return (t * s * d_score).astype(np.float32)

    return TileOp("fish_habitat", fn, bands_out=1, dtype_out="f4")


def per_second_to_per_month(band: int = 0) -> TileOp:
    """Scale a rate by seconds-in-acquisition-month — ConvertPerSecondToPerMonth
    (/root/reference/functions/deprecated/ConvertPerSecondToPerMonth.py:43-75).
    Needs meta ``days_in_month``."""
    def fn(px, meta):
        return (px[band].astype(np.float64)
                * float(meta["days_in_month"]) * 86400.0).astype(np.float32)
    return TileOp("per_month", fn, bands_out=1, dtype_out="f4")


def stretch(band: int = 0, in_min: float = 0, in_max: float = 255,
            out_min: float = 0, out_max: float = 255) -> TileOp:
    """Linear contrast stretch — StretchFunction XML built-in (SURVEY.md F14)."""
    def fn(px, meta):
        x = px[band].astype(np.float64)
        v = (x - in_min) / max(in_max - in_min, 1e-12) * (out_max - out_min) + out_min
        return np.clip(v, min(out_min, out_max), max(out_min, out_max)).astype(np.float32)
    return TileOp("stretch", fn, bands_out=1, dtype_out="f4")


def remap(intervals: list[tuple[float, float, float]], band: int = 0,
          default: float = 0.0) -> TileOp:
    """Interval value remap — RemapFunction XML built-in (SURVEY.md F14);
    same probe semantics as zonal remap but with a constant table."""
    def fn(px, meta):
        x = px[band].astype(np.float64)
        out = np.full_like(x, default)
        for lo, hi, val in intervals:
            out[(x >= lo) & (x < hi)] = val
        return out.astype(np.float32)
    return TileOp("remap", fn, bands_out=1, dtype_out="f4")


def colormap(cmap: dict[int, tuple[int, int, int]], band: int = 0) -> TileOp:
    """Value → RGB lookup — Colormap XML built-in; colormap structure per
    /root/reference/functions/Reference.py:150-153."""
    # JSON round-trips (the documented chain-spec string form) stringify
    # int dict keys — coerce back so '12' and 12 index identically
    cmap = {int(k): v for k, v in cmap.items()}
    keys = np.array(sorted(cmap), dtype=np.int64)
    lut = np.zeros((int(keys.max()) + 1, 3), dtype=np.uint8)
    for k, rgb in cmap.items():
        lut[k] = rgb
    def fn(px, meta):
        idx = np.clip(px[band].astype(np.int64), 0, lut.shape[0] - 1)
        return lut[idx].transpose(2, 0, 1).copy()
    return TileOp("colormap", fn, bands_out=3, dtype_out="u1")


def vector_field(u_band: int = 0, v_band: int = 1,
                 output: str = "magdir") -> TileOp:
    """UV flow field → magnitude/direction (or passthrough UV) — the
    VectorFieldFunction XML built-in (SURVEY.md F14, VF.rft.xml).
    Direction in meteorological compass degrees (0 = from north)."""
    def fn(px, meta):
        u = px[u_band].astype(np.float64)
        v = px[v_band].astype(np.float64)
        if output == "uv":
            return np.stack([u, v]).astype(np.float32)
        mag = np.hypot(u, v)
        direction = (np.degrees(np.arctan2(u, v)) + 180.0) % 360.0
        return np.stack([mag, direction]).astype(np.float32)
    return TileOp("vector_field", fn, bands_out=2, dtype_out="f4")


def composite_bands(*ops_or_bands, bands: list | None = None) -> TileOp:
    """Stack selected bands into one multiband tile — CompositeBandFunction/
    ExtractBandFunction analog (SURVEY.md U2) when inputs are co-registered
    bands. Band ids positionally or via ``bands=`` (chain-spec form)."""
    bands = tuple(bands) if bands is not None else (tuple(ops_or_bands) or None)
    def fn(px, meta):
        return px if bands is None else px[list(bands)]
    return TileOp("composite", fn, bands_in=None)
