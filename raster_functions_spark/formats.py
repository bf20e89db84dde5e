"""From-scratch standard-format codecs (pure struct + NumPy, no external
libraries): BMP (Windows DIB), PPM/PGM (netpbm), and WAV (RIFF PCM).

These give the multimodal layer REAL decode paths for common interchange
formats — the container has no PIL/imageio/soundfile, and the engine must
not depend on them anyway (the north rule requires from-scratch). Formats
are implemented against their public specifications:

- BMP: 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, uncompressed
  (BI_RGB) 24-bit BGR or 8-bit greyscale-palette, bottom-up rows padded
  to 4 bytes.
- PPM (P6) / PGM (P5): ASCII header (magic, width, height, maxval ≤ 255)
  + raw big-endian samples.
- WAV: RIFF/WAVE with an uncompressed 16-bit PCM ``fmt `` chunk.

All decoders return the engine's canonical (bands, h, w) uint8 layout
(WAV returns (channels, n_samples) int16 + sample rate).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- BMP ------

_BMP_FILE = struct.Struct("<2sIHHI")     # magic, file size, res1, res2, data offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")  # size, w, h, planes, bpp, comp, img size, ...


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h,w) or (1|3,h,w) uint8 → BMP bytes (8-bit grey palette or 24-bit)."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[None]
    bands, h, w = px.shape
    if px.dtype != np.uint8:
        raise ValueError("BMP encoder takes uint8 pixels")
    if bands == 1:
        row_len = (w + 3) & ~3
        palette = b"".join(struct.pack("<BBBB", g, g, g, 0) for g in range(256))
        data = np.zeros((h, row_len), np.uint8)
        data[:, :w] = px[0][::-1]                     # bottom-up
        offset = 14 + 40 + len(palette)
        body = palette + data.tobytes()
        bpp = 8
    elif bands == 3:
        row_len = (w * 3 + 3) & ~3
        data = np.zeros((h, row_len), np.uint8)
        bgr = px[::-1].transpose(1, 2, 0)             # (h,w,3) B,G,R
        data[:, :w * 3] = bgr[::-1].reshape(h, -1)    # bottom-up rows
        offset = 14 + 40
        body = data.tobytes()
        bpp = 24
    else:
        raise ValueError("BMP supports 1 or 3 bands")
    info = _BMP_INFO.pack(40, w, h, 1, bpp, 0, len(body), 2835, 2835,
                          256 if bpp == 8 else 0, 0)
    head = _BMP_FILE.pack(b"BM", 14 + 40 + len(body), 0, 0, offset)
    return head + info + body


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP bytes → (bands, h, w) uint8. Supports BI_RGB 8-bit (palette
    looked up; grey palettes collapse to 1 band) and 24-bit."""
    magic, _size, _r1, _r2, offset = _BMP_FILE.unpack_from(buf, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, _planes, bpp, comp, _isz, _xp, _yp,
     clr_used, _clr_imp) = _BMP_INFO.unpack_from(buf, 14)
    if comp != 0:
        raise ValueError(f"unsupported BMP compression {comp}")
    top_down = h < 0
    h = abs(h)
    if bpp == 8:
        n_pal = clr_used or 256
        pal = np.frombuffer(buf, np.uint8, n_pal * 4, 14 + hdr_size).reshape(-1, 4)
        row_len = (w + 3) & ~3
        data = np.frombuffer(buf, np.uint8, row_len * h, offset).reshape(h, row_len)
        idx = data[:, :w] if top_down else data[::-1, :w]
        rgb = pal[idx][:, :, :3][:, :, ::-1]          # palette is BGRX → RGB
        if (rgb[:, :, 0] == rgb[:, :, 1]).all() and (rgb[:, :, 1] == rgb[:, :, 2]).all():
            return rgb[:, :, 0][None].copy()
        return rgb.transpose(2, 0, 1).copy()
    if bpp == 24:
        row_len = (w * 3 + 3) & ~3
        data = np.frombuffer(buf, np.uint8, row_len * h, offset).reshape(h, row_len)
        rows = data[:, :w * 3].reshape(h, w, 3)
        rows = rows if top_down else rows[::-1]
        return rows[:, :, ::-1].transpose(2, 0, 1).copy()   # BGR → RGB bands
    raise ValueError(f"unsupported BMP bpp {bpp}")


# ---------------------------------------------------------------- PNM ------

def encode_pnm(pixels: np.ndarray) -> bytes:
    """(h,w)/(1,h,w) → PGM P5; (3,h,w) → PPM P6 (maxval 255)."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[None]
    bands, h, w = px.shape
    if px.dtype != np.uint8:
        raise ValueError("PNM encoder takes uint8 pixels")
    if bands == 1:
        return f"P5\n{w} {h}\n255\n".encode() + px[0].tobytes()
    if bands == 3:
        return f"P6\n{w} {h}\n255\n".encode() + px.transpose(1, 2, 0).tobytes()
    raise ValueError("PNM supports 1 or 3 bands")


def decode_pnm(buf: bytes) -> np.ndarray:
    """P5/P6 bytes → (bands, h, w) uint8. Handles comments and arbitrary
    whitespace in the header, per the netpbm spec."""
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":                   # comment to EOL
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(buf[start:pos]))
    pos += 1                                          # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    if buf[:2] == b"P5":
        return np.frombuffer(buf, np.uint8, h * w, pos).reshape(1, h, w).copy()
    arr = np.frombuffer(buf, np.uint8, h * w * 3, pos).reshape(h, w, 3)
    return arr.transpose(2, 0, 1).copy()


# ---------------------------------------------------------------- WAV ------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(channels, n) or (n,) int16 → RIFF PCM WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[None]
    ch, n = s.shape
    inter = s.T.reshape(-1).tobytes()                 # interleaved frames
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate,
                      byte_rate, ch * 2, 16)
    data = struct.pack("<4sI", b"data", len(inter)) + inter
    riff = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(riff)) + riff


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF PCM WAV → ((channels, n_samples) int16, sample_rate).
    Walks the chunk list (tolerates extra chunks like LIST/fact)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    ch = rate = bits = None
    data = None
    while pos + 8 <= len(buf):
        cid, sz = struct.unpack_from("<4sI", buf, pos)
        body = buf[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV codec {audio_fmt} (PCM only)")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)                      # chunks are word-aligned
    if data is None or ch is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    arr = np.frombuffer(data, "<i2")
    n = arr.size // ch
    return arr[:n * ch].reshape(n, ch).T.copy(), int(rate)


# ------------------------------------------------------------ dispatch -----

def sniff(buf: bytes) -> str | None:
    """Format from magic bytes: 'bmp' | 'pnm' | 'wav' | 'rf' (engine
    container) | None."""
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:2] in (b"P5", b"P6"):
        return "pnm"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    if buf[:2] == b"RF":
        return "rf"
    return None


def decode_image_any(buf: bytes) -> np.ndarray:
    """Decode any supported image payload to (bands, h, w)."""
    from . import codec
    kind = sniff(bytes(buf))
    if kind == "bmp":
        return decode_bmp(buf)
    if kind == "pnm":
        return decode_pnm(buf)
    if kind == "rf":
        return codec.decode(buf)
    raise ValueError(f"unrecognized image payload (magic {bytes(buf[:4])!r})")
