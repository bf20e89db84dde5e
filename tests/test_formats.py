"""From-scratch BMP / PNM / WAV codecs (formats.py) + multimodal wiring."""

import struct

import numpy as np
import pandas as pd
import pytest

from raster_functions_spark import formats, multimodal


def _img(bands, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (bands, h, w), dtype=np.uint8)


# ---------------------------------------------------------------- BMP ------

@pytest.mark.parametrize("bands,h,w", [(1, 7, 5), (1, 32, 32), (3, 9, 6), (3, 16, 33)])
def test_bmp_roundtrip(bands, h, w):
    px = _img(bands, h, w, seed=bands * h + w)
    buf = formats.encode_bmp(px)
    out = formats.decode_bmp(buf)
    assert out.shape == (bands, h, w)
    assert np.array_equal(out, px)


def test_bmp_golden_layout():
    """Hand-check the byte layout on a tiny 24-bit image: bottom-up BGR
    rows padded to 4 bytes, pixel data at the declared offset."""
    px = np.zeros((3, 2, 1), np.uint8)
    px[:, 0, 0] = (255, 0, 0)      # top pixel pure red
    px[:, 1, 0] = (0, 0, 255)      # bottom pixel pure blue
    buf = formats.encode_bmp(px)
    assert buf[:2] == b"BM"
    offset = struct.unpack_from("<I", buf, 10)[0]
    row_len = 4                    # 1 px × 3B padded to 4
    bottom = buf[offset:offset + row_len]
    top = buf[offset + row_len:offset + 2 * row_len]
    assert bottom[:3] == bytes([255, 0, 0])   # blue first (B,G,R)
    assert top[:3] == bytes([0, 0, 255])      # red as B=0,G=0,R=255


def test_bmp_top_down_and_color_palette():
    """Negative height = top-down rows; non-grey palettes expand to RGB."""
    px = _img(1, 4, 4, seed=3)
    buf = bytearray(formats.encode_bmp(px))
    # flip height sign → top-down; rows must then be reversed by us
    h = struct.unpack_from("<i", buf, 14 + 8)[0]
    struct.pack_into("<i", buf, 14 + 8, -h)
    out = formats.decode_bmp(bytes(buf))
    assert np.array_equal(out[0], px[0][::-1])


# ---------------------------------------------------------------- PNM ------

@pytest.mark.parametrize("bands", [1, 3])
def test_pnm_roundtrip(bands):
    px = _img(bands, 11, 13, seed=bands)
    out = formats.decode_pnm(formats.encode_pnm(px))
    assert np.array_equal(out, px)


def test_pnm_header_comments():
    px = _img(1, 2, 3, seed=9)
    buf = formats.encode_pnm(px)
    hacked = b"P5\n# a comment\n 3 # w\n2\n255\n" + buf.split(b"\n255\n", 1)[1]
    out = formats.decode_pnm(hacked)
    assert np.array_equal(out, px)


# ---------------------------------------------------------------- WAV ------

@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip(ch):
    rng = np.random.default_rng(5)
    s = rng.integers(-32768, 32767, (ch, 400), dtype=np.int16)
    out, rate = formats.decode_wav(formats.encode_wav(s, 22050))
    assert rate == 22050
    assert np.array_equal(out, s)


def test_wav_tolerates_extra_chunks():
    s = np.arange(100, dtype=np.int16)[None]
    buf = formats.encode_wav(s, 8000)
    # splice a LIST chunk between fmt and data
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
    hacked = buf[:fmt_end] + extra + buf[fmt_end:]
    hacked = struct.pack("<4sI", b"RIFF", len(hacked) - 8) + hacked[8:]
    out, rate = formats.decode_wav(hacked)
    assert rate == 8000 and np.array_equal(out, s)


# ------------------------------------------------------------- wiring ------

def test_sniff_dispatch():
    assert formats.sniff(formats.encode_bmp(_img(1, 2, 2))) == "bmp"
    assert formats.sniff(formats.encode_pnm(_img(3, 2, 2))) == "pnm"
    assert formats.sniff(formats.encode_wav(np.zeros(4, np.int16))) == "wav"
    from raster_functions_spark import codec
    assert formats.sniff(codec.encode(_img(1, 2, 2))) == "rf"
    assert formats.sniff(b"\x89PNG\r\n") is None      # truncated signature
    assert formats.sniff(formats.encode_png(_img(1, 2, 2))) == "png"


def test_image_features_decodes_bmp_column(spark):
    """A binary column of real BMP payloads flows through the multimodal
    feature kernel without PIL."""
    rows = []
    for i in range(6):
        px = _img(3, 8, 8, seed=i)
        rows.append({"image_id": f"b{i}", "bytes": formats.encode_bmp(px),
                     "fmt": "bmp", "want_mean": float(px.mean())})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = multimodal.image_features(df, keep_cols=("image_id", "want_mean")).toPandas()
    assert len(out) == 6
    assert np.allclose(out["px_mean"], out["want_mean"])


def test_decode_external_image_rejects_malformed_jpeg():
    """JPEG now decodes for real (jpeg.py); a payload with the right magic
    but no scan must fail loudly, not hang."""
    with pytest.raises(ValueError):
        multimodal.decode_external_image(b"\xff\xd8\xff\xe0JFIF....")
    with pytest.raises(ValueError, match="unrecognized"):
        multimodal.decode_external_image(b"\x00\x11\x22\x33")


# ----------------------------------------------------------- ISO-BMFF ------

def test_mp4_mux_demux_roundtrip_chunk_mapping():
    """Samples recovered through stsc/stsz/stco byte ranges, not by
    scanning mdat — uneven sample sizes + 3-per-chunk layout exercise the
    run-length chunk map."""
    from raster_functions_spark import jpeg
    frames = []
    for t in range(8):
        px = _img(1, 8 + 4 * (t % 2), 8, seed=t)   # alternating sizes
        frames.append(jpeg.encode_jpeg(px, quality=85))
    buf = formats.encode_mp4_samples(frames, "jpeg", 8, 8)
    tag, out = formats.demux_mp4(buf)
    assert tag.strip() == "jpeg"
    assert [len(s) for s in out] == [len(f) for f in frames]
    assert all(a == b for a, b in zip(frames, out))
    meta = formats.peek_mp4(buf)
    assert meta["n_samples"] == 8 and meta["codec"].strip() == "jpeg"
    assert meta["duration_s"] > 0


def test_mp4_png_samples_decode():
    frames = [formats.encode_png(_img(1, 8, 8, seed=t)) for t in range(3)]
    buf = formats.encode_mp4_samples(frames, "png", 8, 8)
    tag, out = formats.demux_mp4(buf)
    assert tag.strip() == "png"
    for t, s in enumerate(out):
        assert np.array_equal(formats.decode_png(s), _img(1, 8, 8, seed=t))


def test_mp4_corrupt_and_foreign_codec():
    frames = [b"\x00" * 40, b"\x01" * 41]
    buf = formats.encode_mp4_samples(frames, "avc1", 16, 16)
    tag, out = formats.demux_mp4(buf)
    assert tag == "avc1" and len(out) == 2        # demux works regardless
    with pytest.raises(ValueError):
        formats.demux_mp4(buf[: len(buf) // 3])   # truncated: no moov
    with pytest.raises(ValueError, match="ftyp"):
        formats.demux_mp4(b"\x00" * 64)


def test_video_decode_metrics_quarantine(spark):
    """The Spark surface: mixed corpus (MJPEG / avc1 / truncated) —
    quarantine rows stay joinable, good rows carry exact sampled sums."""
    from raster_functions_spark import fixtures
    df = fixtures.mp4_videos_df(spark, 18)
    out = multimodal.video_decode_metrics(df, every_n=2).toPandas() \
        .set_index("video_id").sort_index()
    pdf = fixtures.mp4_videos_pdf(18)
    for i, (_, r) in enumerate(pdf.iterrows()):
        row = out.loc[r["video_id"]]
        if i % 9 == 8:
            assert not row["ok"] and row["n_frames"] == -1
        elif i % 5 == 4:
            assert not row["ok"] and row["codec"] == "avc1" \
                and row["n_frames"] == r["n_frames"]
        else:
            assert row["ok"] and row["n_decoded"] == -(-r["n_frames"] // 2)
            from raster_functions_spark import jpeg
            want = sum(int(jpeg.decode_jpeg(jpeg.encode_jpeg(
                fixtures._mp4_frame(i, t)[None], quality=90))
                .astype(np.int64).sum()) for t in range(0, r["n_frames"], 2))
            assert int(row["px_sum"]) == want
