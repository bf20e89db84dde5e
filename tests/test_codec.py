import numpy as np
import pytest

from raster_functions_spark import codec


def _samples():
    rng = np.random.default_rng(42)
    yield (rng.integers(0, 256, (1, 33, 47)).astype(np.uint8), "odd u1")
    yield (rng.integers(0, 60000, (6, 16, 16)).astype(np.uint16), "6-band u2")
    yield ((rng.random((2, 32, 64)) * 500 - 100).astype(np.float32), "f4")
    yield (np.zeros((1, 8, 8), dtype=np.uint8), "all zero")
    yield (np.full((3, 64, 64), 200, dtype=np.uint8), "constant")


@pytest.mark.parametrize("fmt", ["raw", "rle", "zlib"])
def test_lossless_roundtrip(fmt):
    for px, name in _samples():
        buf = codec.encode(px, fmt)
        out = codec.decode(buf)
        assert out.dtype == px.dtype, name
        assert np.array_equal(out, px), f"{fmt} roundtrip failed for {name}"


def test_dct_psnr_gate():
    """Lossy fmt must clear the PSNR≥40dB gate (BASELINE.json)."""
    rng = np.random.default_rng(7)
    for shape in [(1, 32, 32), (2, 33, 47), (1, 128, 128)]:
        px = rng.integers(0, 256, shape).astype(np.uint8)
        out = codec.decode(codec.encode(px, "dct"))
        assert out.shape == px.shape
        assert codec.psnr(px, out) >= 40.0


def test_dct_smooth_near_lossless():
    yy, xx = np.mgrid[0:64, 0:64]
    px = (128 + 100 * np.sin(xx / 9.0) * np.cos(yy / 7.0)).astype(np.uint8)
    out = codec.decode(codec.encode(px, "dct"))
    assert codec.psnr(px, out) >= 45.0


def test_encode_deterministic():
    px = np.arange(2 * 32 * 32, dtype=np.uint16).reshape(2, 32, 32) % 1000
    for fmt in ["raw", "rle", "zlib"]:
        assert codec.encode(px, fmt) == codec.encode(px.copy(), fmt)


def test_peek_header():
    px = np.ones((2, 10, 20), dtype=np.uint8)
    h = codec.peek_header(codec.encode(px, "zlib"))
    assert h == {"fmt": "zlib", "dtype": "u1", "bands": 2, "h": 10, "w": 20,
                 "nbytes": h["nbytes"]}


def test_rle_long_runs():
    px = np.zeros((1, 300, 300), dtype=np.uint8)  # run of 90000 > 65535
    px[0, 150:, :] = 7
    out = codec.decode(codec.encode(px, "rle"))
    assert np.array_equal(out, px)


def test_phash_properties():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (1, 64, 64)).astype(np.uint8)
    h1 = codec.phash64(px)
    assert h1 == codec.phash64(px.copy())            # deterministic
    assert isinstance(h1, int)
    # small perturbation → small hamming distance; unrelated → large
    noisy = np.clip(px.astype(np.int16) + rng.integers(-4, 5, px.shape), 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, (1, 64, 64)).astype(np.uint8)
    assert codec.hamming64(h1, codec.phash64(noisy)) <= 12
    assert codec.hamming64(h1, codec.phash64(other)) >= 16


def test_phash_survives_lossy():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (1, 64, 64)).astype(np.uint8)
    out = codec.decode(codec.encode(px, "dct"))
    # standard near-dup threshold for 64-bit phash is ~16
    assert codec.hamming64(codec.phash64(px), codec.phash64(out)) <= 16


def test_phash64_small_tiles_finite_and_stable():
    """Tiles under 32px per axis: the hash must be finite-math (no
    zero-width box bins), identical images must collide, and a visibly
    different image must not — the pre-r5 path produced inf DCT
    coefficients and arbitrary bits for every sub-32-px image."""
    import numpy as np
    from raster_functions_spark import codec

    rng = np.random.default_rng(3)
    for shape in ((16, 16), (8, 24), (40, 16), (16, 40), (31, 31)):
        a = rng.integers(0, 255, shape).astype(np.float64)
        h1 = codec.phash64(a[None])
        h2 = codec.phash64(a.copy()[None])
        assert h1 == h2                                   # deterministic
        b = 255.0 - a.T.copy() if shape[0] == shape[1] else 255.0 - a
        hb = codec.phash64(b[None])
        assert codec.hamming64(h1, hb) > 8, shape         # distinguishes
    # >=32px axes: arithmetic untouched (spot-check vs manual reduceat)
    big = rng.integers(0, 255, (64, 48)).astype(np.float64)
    ri = (np.arange(32) * 64) // 32
    ci = (np.arange(32) * 48) // 32
    rows = np.add.reduceat(big, ri, axis=0)
    small = np.add.reduceat(rows, ci, axis=1)
    small = small / (np.diff(np.append(ri, 64))[:, None]
                     * np.diff(np.append(ci, 48))[None, :])
    coef = codec._DCT32 @ small @ codec._DCT32.T
    block = coef[:8, :8].reshape(-1)[1:]
    med = np.median(block)
    want = 0
    for i, v in enumerate(block.tolist()):
        if v > med:
            want |= 1 << i
    want = want - (1 << 64) if want >= (1 << 63) else want
    assert codec.phash64(big[None]) == want
