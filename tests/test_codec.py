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
