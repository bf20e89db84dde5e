"""Pure-NumPy image codecs + perceptual hash for the tiled image table.

The engine's canonical input is an image+caption table where each row carries
one raster tile encoded as ``binary`` (BASELINE.json input_hint). The
reference receives pixel blocks as dense NumPy ndarrays shaped
``(bands, rows, cols)`` (/root/reference/functions/Reference.py:195-206);
we reproduce exactly that in-memory layout after decode.

Formats (``fmt`` column):

- ``raw``  — header + C-order element bytes (lossless)
- ``rle``  — element-level run-length encoding (lossless)
- ``zlib`` — DEFLATE of the raw payload, level 6 (lossless, PNG-class)
- ``dct``  — 8×8 orthonormal DCT-II with uniform quantization step 4,
             int16 coefficients zlib-packed (lossy; worst-case MSE ≈
             step²/12 ≈ 1.33 → PSNR ≈ 46.9 dB on 8-bit data, comfortably
             above the 40 dB gate in BASELINE.json). u1 only.

Every byte of the container is fixed-layout and deterministic so encode ∘
decode is reproducible across runs/partitions (required for byte-identical
outputs at two parallelism levels).

Header (little-endian, 16 bytes):
  magic ``RF`` | version u8 | fmt u8 | dtype u8 | bands u8 | h u32 | w u32 | pad u16
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"RF"
VERSION = 1
_HDR = struct.Struct("<2sBBBBIIH")
HEADER_SIZE = _HDR.size  # 16

FMT_CODES = {"raw": 0, "rle": 1, "zlib": 2, "dct": 3}
FMT_NAMES = {v: k for k, v in FMT_CODES.items()}

# Pixel scalar types use the reference's array-interface codes
# (/root/reference/functions/Reference.py:140-142); we support the fixture
# subset {u1, u2, f4} plus f8/i2/i4 for derived products.
DTYPE_CODES = {"u1": 0, "u2": 1, "f4": 2, "f8": 3, "i2": 4, "i4": 5}
DTYPE_NAMES = {v: k for k, v in DTYPE_CODES.items()}

DCT_BLOCK = 8
DCT_QSTEP = 4.0


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (float64 for determinism)."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    m[0] *= np.sqrt(1.0 / n)
    m[1:] *= np.sqrt(2.0 / n)
    return m


_DCT8 = _dct_matrix(DCT_BLOCK)
_DCT32 = _dct_matrix(32)
_PHASH_BITS = (np.uint64(1) << np.arange(63, dtype=np.uint64))


def _as_chw(pixels: np.ndarray) -> np.ndarray:
    """Normalize to (bands, h, w) — the reference's block shape."""
    if pixels.ndim == 2:
        return pixels[None, :, :]
    if pixels.ndim == 3:
        return pixels
    raise ValueError(f"pixels must be 2-D or 3-D, got shape {pixels.shape}")


# ---------------------------------------------------------------- RLE ------

def _rle_encode(flat: np.ndarray) -> bytes:
    """Element-level RLE: (u16 run_length, element value) pairs."""
    n = flat.size
    if n == 0:
        return b""
    change = np.flatnonzero(flat[1:] != flat[:-1])
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [n]))
    lengths = ends - starts
    # split runs longer than 65535
    nchunks = (lengths + 65534) // 65535
    if (nchunks > 1).any():
        values = np.repeat(flat[starts], nchunks)
        out_len = np.empty(int(nchunks.sum()), dtype=np.int64)
        pos = 0
        for ln, nc in zip(lengths.tolist(), nchunks.tolist()):
            full, rem = divmod(ln, 65535)
            chunk = [65535] * full + ([rem] if rem else [])
            out_len[pos:pos + nc] = chunk
            pos += nc
        lengths = out_len
    else:
        values = flat[starts]
    counts = lengths.astype("<u2")
    vals = values.astype(values.dtype.newbyteorder("<"))
    rec = np.zeros(len(counts), dtype=[("n", "<u2"), ("v", vals.dtype.str)])
    rec["n"] = counts
    rec["v"] = vals
    return rec.tobytes()


def _rle_decode(payload: bytes, dtype: np.dtype, count: int) -> np.ndarray:
    rec = np.frombuffer(payload, dtype=[("n", "<u2"), ("v", dtype.newbyteorder("<"))])
    out = np.repeat(rec["v"], rec["n"].astype(np.int64))
    if out.size != count:
        raise ValueError(f"RLE decode size mismatch: {out.size} != {count}")
    return out.astype(dtype)


# ---------------------------------------------------------------- DCT ------

def _pad_to_block(band: np.ndarray, b: int) -> np.ndarray:
    h, w = band.shape
    ph, pw = (-h) % b, (-w) % b
    if ph or pw:
        band = np.pad(band, ((0, ph), (0, pw)), mode="edge")
    return band


def _blockify(band: np.ndarray, b: int) -> np.ndarray:
    """(H, W) → (H//b * W//b, b, b) without copy games."""
    h, w = band.shape
    return band.reshape(h // b, b, w // b, b).transpose(0, 2, 1, 3).reshape(-1, b, b)


def _unblockify(blocks: np.ndarray, h: int, w: int, b: int) -> np.ndarray:
    return (blocks.reshape(h // b, w // b, b, b)
            .transpose(0, 2, 1, 3).reshape(h, w))


def _dct_encode(chw: np.ndarray) -> bytes:
    if chw.dtype != np.uint8:
        raise ValueError("dct fmt supports u1 pixels only")
    bands, h, w = chw.shape
    out = []
    for band in chw:
        padded = _pad_to_block(band.astype(np.float64), DCT_BLOCK)
        blocks = _blockify(padded, DCT_BLOCK)
        coef = _DCT8 @ blocks @ _DCT8.T
        q = np.round(coef / DCT_QSTEP)
        np.clip(q, -32768, 32767, out=q)
        out.append(q.astype("<i2").tobytes())
    return zlib.compress(b"".join(out), 6)


def _dct_decode(payload: bytes, bands: int, h: int, w: int) -> np.ndarray:
    raw = zlib.decompress(payload)
    ph, pw = h + ((-h) % DCT_BLOCK), w + ((-w) % DCT_BLOCK)
    per_band = (ph // DCT_BLOCK) * (pw // DCT_BLOCK)
    q = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    q = q.reshape(bands, per_band, DCT_BLOCK, DCT_BLOCK) * DCT_QSTEP
    out = np.empty((bands, h, w), dtype=np.uint8)
    for bi in range(bands):
        rec = _DCT8.T @ q[bi] @ _DCT8
        full = _unblockify(rec, ph, pw, DCT_BLOCK)[:h, :w]
        out[bi] = np.clip(np.round(full), 0, 255).astype(np.uint8)
    return out


# ------------------------------------------------------------- public ------

def encode(pixels: np.ndarray, fmt: str = "zlib",
           zlib_level: int = 6) -> bytes:
    """Encode a (bands,h,w) or (h,w) ndarray into the container format.

    ``zlib_level`` only affects the size/speed of the ``zlib`` payload
    (decode is level-agnostic); the default stays 6 because downstream
    consumers embed encoded byte LENGTHS (e.g. the mm_shards packing
    oracle literals) — callers for whom the bytes are a pure in-kernel
    intermediate (the flagship synthesize→decode pipeline) pass 3, which
    on the fixture data is both ~1.8× faster and slightly smaller."""
    chw = np.ascontiguousarray(_as_chw(pixels))
    dt = chw.dtype.str.lstrip("<>=|")
    if dt not in DTYPE_CODES:
        raise ValueError(f"unsupported pixel dtype {chw.dtype} (codes: {list(DTYPE_CODES)})")
    bands, h, w = chw.shape
    hdr = _HDR.pack(MAGIC, VERSION, FMT_CODES[fmt], DTYPE_CODES[dt], bands, h, w, 0)
    le = chw.astype(chw.dtype.newbyteorder("<"))
    if fmt == "raw":
        payload = le.tobytes()
    elif fmt == "rle":
        payload = _rle_encode(chw.reshape(-1))
    elif fmt == "zlib":
        payload = zlib.compress(le.tobytes(), zlib_level)
    elif fmt == "dct":
        payload = _dct_encode(chw)
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return hdr + payload


def decode(buf: bytes) -> np.ndarray:
    """Decode container bytes → (bands, h, w) ndarray (native byte order)."""
    magic, ver, fmt_c, dt_c, bands, h, w, _ = _HDR.unpack_from(buf, 0)
    if magic != MAGIC or ver != VERSION:
        raise ValueError("bad container header")
    fmt = FMT_NAMES[fmt_c]
    dtype = np.dtype(DTYPE_NAMES[dt_c])
    payload = buf[HEADER_SIZE:]
    count = bands * h * w
    if fmt == "raw":
        flat = np.frombuffer(payload, dtype=dtype.newbyteorder("<"), count=count)
    elif fmt == "rle":
        flat = _rle_decode(payload, dtype, count)
    elif fmt == "zlib":
        flat = np.frombuffer(zlib.decompress(payload), dtype=dtype.newbyteorder("<"), count=count)
    elif fmt == "dct":
        return _dct_decode(payload, bands, h, w)
    else:  # pragma: no cover
        raise ValueError(fmt)
    return flat.astype(dtype).reshape(bands, h, w)


def peek_header(buf: bytes) -> dict:
    """Cheap metadata read without decoding pixels (catalog-crawl path,
    analog of /root/reference/scripts/ExtractRasterInfo.py:1-11)."""
    magic, ver, fmt_c, dt_c, bands, h, w, _ = _HDR.unpack_from(buf, 0)
    return {"fmt": FMT_NAMES[fmt_c], "dtype": DTYPE_NAMES[dt_c],
            "bands": int(bands), "h": int(h), "w": int(w),
            "nbytes": len(buf)}


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB (fidelity gate: ≥ 40 dB for lossy)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)


# ------------------------------------------------------------- phash -------

def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: box-downsample band 0 to 32×32 → 32×32 DCT-II
    → 8×8 low-frequency block (minus DC) → sign vs median. Deterministic.

    Signed int64 (two's complement) so it fits a Spark/parquet ``bigint``.
    """
    band = _as_chw(pixels)[0].astype(np.float64)
    h, w = band.shape
    # box-mean resample to 32×32 via bin-mean (reduceat over row/col bins).
    # Axes shorter than 32 use nearest-neighbor GATHER instead: their bin
    # edges repeat, and zero-width bins divide by zero → inf coefficients
    # → garbage hash bits (every sub-32-px image used to collide or
    # scatter arbitrarily). For length ≥ 32 the bins are all ≥ 1 wide and
    # the original arithmetic is untouched (stored hashes stay valid).
    if h < 32:
        rows = band[(np.arange(32) * h) // 32]
        rcounts = np.ones((32, 1))
    else:
        ri = (np.arange(32) * h) // 32
        rows = np.add.reduceat(band, ri, axis=0)
        rcounts = np.diff(np.append(ri, h))[:, None].astype(np.float64)
    if w < 32:
        small = rows[:, (np.arange(32) * w) // 32]
        ccounts = np.ones((1, 32))
    else:
        ci = (np.arange(32) * w) // 32
        small = np.add.reduceat(rows, ci, axis=1)
        ccounts = np.diff(np.append(ci, w))[None, :].astype(np.float64)
    small = small / (rcounts * ccounts)
    coef = _DCT32 @ small @ _DCT32.T
    block = coef[:8, :8].reshape(-1)[1:]  # drop DC
    med = np.median(block)
    # vectorized bit-pack (r7): sum of distinct powers of two == the old
    # per-bit loop's OR, exactly (63 bits max < 2^64)
    bits = _PHASH_BITS[block > med].sum(dtype=np.uint64)
    return int(bits.view(np.int64))


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))
