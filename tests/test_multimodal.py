"""Multimodal plumbing: the PIL gate must raise cleanly (the real
decoder is deliberately absent in this container), and the
mapInPandas Arrow path must agree with the scalar stub kernel."""

from __future__ import annotations

import pytest

from grader_etl_spark.operators.multimodal import (
    _HAVE_PIL,
    assets_from_documents,
    decode_assets,
    decode_image,
    fake_decode_meta,
)


@pytest.mark.skipif(_HAVE_PIL, reason="PIL present: the real decoder path applies")
def test_decode_image_gate_raises_cleanly():
    # PNG now decodes natively (round 7) — the gate applies to JPEG
    with pytest.raises(NotImplementedError, match="requires PIL"):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 16)


@pytest.mark.skipif(not _HAVE_PIL, reason="PIL absent in this container")
def test_decode_image_real_path():
    # If a future container ships PIL, the gate must open and decode a
    # 1x1 JPEG rather than raise (PNG no longer reaches PIL — the
    # native decoder owns it).
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (1, 1)).save(buf, format="JPEG")
    img = decode_image(buf.getvalue())
    assert img.size == (1, 1)


def test_decode_assets_matches_scalar_kernel(spark):
    docs = spark.createDataFrame(
        [(1, "short"), (2, "a much longer payload body " * 9)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in decode_assets(assets_from_documents(docs)).collect()}
    for doc_id, text in ((1, "short"), (2, "a much longer payload body " * 9)):
        n, w, h = fake_decode_meta(text.encode())
        r = got[doc_id]
        assert (r["byte_len"], r["width"], r["height"]) == (n, w, h)


# ---------------------------------------------------------------------------
# REAL uncompressed decode (PPM P6 / 24-bit BMP) — numpy-only, no PIL.
# The encoders below are written INDEPENDENTLY in the test (struct
# packing by hand) so engine decode and test encode can't share bugs.
# ---------------------------------------------------------------------------


def _encode_ppm(img) -> bytes:
    h, w, _ = img.shape
    return (f"P6\n# test comment\n{w} {h}\n255\n").encode() + img.tobytes()


def _encode_bmp(img, bottom_up: bool = True) -> bytes:
    import struct

    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    rows = img[::-1] if bottom_up else img
    raster = b"".join(bytes(r[..., ::-1].tobytes()) + pad for r in rows)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h if bottom_up else -h,
                      1, 24, 0, len(raster), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 14 + 40)
    return hdr + dib + raster


def _test_img(w=5, h=3, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_decode_image_raw_ppm_and_bmp_roundtrip():
    import numpy as np

    from grader_etl_spark.operators.multimodal import decode_image, decode_image_raw

    img = _test_img()
    np.testing.assert_array_equal(decode_image_raw(_encode_ppm(img)), img)
    np.testing.assert_array_equal(decode_image_raw(_encode_bmp(img)), img)
    # top-down BMP (negative height) and width needing row padding
    np.testing.assert_array_equal(decode_image_raw(_encode_bmp(img, bottom_up=False)), img)
    img2 = _test_img(w=3, h=2, seed=11)  # stride 12 vs 9 bytes: padding live
    np.testing.assert_array_equal(decode_image_raw(_encode_bmp(img2)), img2)
    # decode_image dispatches to the real path WITHOUT PIL
    np.testing.assert_array_equal(decode_image(_encode_ppm(img)), img)
    with pytest.raises(ValueError, match="PPM/BMP"):
        decode_image_raw(b"\x89PNG....")


def test_decode_assets_real_metadata_and_corrupt_rows(spark):
    import numpy as np

    from grader_etl_spark.operators.multimodal import decode_assets_real

    imgs = {1: _test_img(w=6, h=4, seed=1), 2: _test_img(w=3, h=5, seed=2)}
    rows = [
        (1, bytearray(_encode_ppm(imgs[1]))),
        (2, bytearray(_encode_bmp(imgs[2]))),
        (3, bytearray(b"not an image")),  # corrupt -> NULL metadata
        (4, None),                        # missing -> NULL metadata
    ]
    assets = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r.doc_id: r for r in decode_assets_real(assets).collect()}
    assert len(got) == 4
    for doc, img in imgs.items():
        r = got[doc]
        assert (r.width, r.height, r.channels) == (img.shape[1], img.shape[0], 3)
        want = (0.299 * img[..., 0].astype(np.float64)
                + 0.587 * img[..., 1] + 0.114 * img[..., 2]).mean()
        assert abs(r.mean_luma - want) < 1e-9
    for doc in (3, 4):
        r = got[doc]
        assert r.width is None and r.mean_luma is None


def _encode_wav(pcm, rate=16000) -> bytes:
    """Independent test-side WAV writer (stdlib `wave` would also work,
    but hand-packing keeps encode/decode implementations disjoint)."""
    import struct

    frames, ch = pcm.shape
    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_audio_raw_wav_roundtrip():
    import numpy as np

    from grader_etl_spark.operators.multimodal import decode_audio_raw

    rng = np.random.RandomState(3)
    pcm = rng.randint(-32768, 32767, size=(800, 2), dtype=np.int16)
    rate, ch, frames, got = decode_audio_raw(_encode_wav(pcm, rate=8000))
    assert (rate, ch, frames) == (8000, 2, 800)
    np.testing.assert_array_equal(got, pcm)
    # stdlib cross-check: python's own wave module reads our test bytes
    import io
    import wave

    with wave.open(io.BytesIO(_encode_wav(pcm, rate=8000))) as w:
        assert (w.getframerate(), w.getnchannels(), w.getnframes()) == (8000, 2, 800)
    with pytest.raises(ValueError, match="RIFF"):
        decode_audio_raw(b"OggS....")


def test_audio_features_real_duration_and_rms(spark):
    import numpy as np

    from grader_etl_spark.operators.multimodal import audio_features_real

    rng = np.random.RandomState(5)
    pcm1 = rng.randint(-1000, 1000, size=(16000, 1), dtype=np.int16)  # 1 s mono
    pcm2 = rng.randint(-32768, 32767, size=(4000, 2), dtype=np.int16)  # 0.25 s stereo
    rows = [
        (1, bytearray(_encode_wav(pcm1, rate=16000))),
        (2, bytearray(_encode_wav(pcm2, rate=16000))),
        (3, bytearray(b"mp3?" * 10)),  # compressed/unknown -> NULL
        (4, None),
    ]
    assets = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r.doc_id: r for r in audio_features_real(assets).collect()}
    assert got[1].sample_rate == 16000 and got[1].channels == 1
    assert abs(got[1].duration_s - 1.0) < 1e-9
    assert abs(got[2].duration_s - 0.25) < 1e-9 and got[2].channels == 2
    for doc, pcm in ((1, pcm1), (2, pcm2)):
        want = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
        assert abs(got[doc].rms - want) < 1e-9
    assert got[3].sample_rate is None and got[4].rms is None


def test_resize_assets_real_nearest_neighbor(spark):
    import numpy as np

    from grader_etl_spark.operators.multimodal import (
        decode_image_raw,
        resize_assets_real,
    )

    img = _test_img(w=8, h=6, seed=9)
    assets = spark.createDataFrame(
        [(1, bytearray(_encode_bmp(img))), (2, bytearray(b"junk")), (3, None)],
        "doc_id bigint, payload binary",
    )
    got = {r.doc_id: r.resized for r in resize_assets_real(assets, 4, 3).collect()}
    resized = decode_image_raw(bytes(got[1]))
    yi = (np.arange(3) * 6 // 3)
    xi = (np.arange(4) * 8 // 4)
    np.testing.assert_array_equal(resized, img[yi][:, xi])
    assert got[2] is None and got[3] is None


def test_truncated_payloads_become_null_rows_not_task_failures(spark):
    """Right magic, truncated body: struct.error must be absorbed into
    the NULL-metadata contract, not crash the Spark task."""
    from grader_etl_spark.operators.multimodal import (
        audio_features_real,
        decode_assets_real,
    )

    imgs = spark.createDataFrame(
        [(1, bytearray(b"BM\x00\x01")), (2, bytearray(b"P6\n"))],
        "doc_id bigint, payload binary",
    )
    got = {r.doc_id: r for r in decode_assets_real(imgs).collect()}
    assert got[1].width is None and got[2].width is None

    wavs = spark.createDataFrame(
        [(1, bytearray(b"RIFF\x04\x00\x00\x00WAVE")),
         (2, bytearray(b"RIFF\x20\x00\x00\x00WAVEfmt \x02\x00\x00\x00\x01\x00"))],
        "doc_id bigint, payload binary",
    )
    got = {r.doc_id: r for r in audio_features_real(wavs).collect()}
    assert got[1].sample_rate is None and got[2].sample_rate is None


def test_zero_frame_wav_rms_is_null_not_nan(spark):
    import numpy as np

    from grader_etl_spark.operators.multimodal import audio_features_real

    empty = np.zeros((0, 1), dtype=np.int16)
    assets = spark.createDataFrame(
        [(1, bytearray(_encode_wav(empty, rate=8000)))],
        "doc_id bigint, payload binary",
    )
    r = audio_features_real(assets).collect()[0]
    assert (r.sample_rate, r.channels, r.duration_s) == (8000, 1, 0.0)
    assert r.rms is None  # NULL, never NaN


# ---------------------------------------------------------------------------
# native PNG decode (round 7): independent test-side encoder, all five
# scanline filters, gray/RGB/RGBA, CRC + truncation refusal
# ---------------------------------------------------------------------------


def _encode_png(img, filters=None, color_type=2) -> bytes:
    """Independent PNG writer (struct+zlib only, shares no code with
    the decoder): per-row filter choice exercises every unfilter path.
    Prediction inputs are the RECONSTRUCTED bytes, which equal the
    original since we encode from ground truth."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    nch = img.shape[2] if img.ndim == 3 else 1
    flat = img.reshape(h, w * nch).astype(np.int32)
    bpp = nch
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        f = filters[y % len(filters)] if filters else 0
        enc = np.zeros_like(line)
        for x in range(len(line)):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (int(line[x]) - pred) & 0xFF
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(t, body):
        return (struct.pack(">I", len(body)) + t + body
                + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    comp = zlib.compress(bytes(raw))
    # split the stream across two IDAT chunks — decoders must concat
    mid = len(comp) // 2
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", comp[:mid]) + chunk(b"IDAT", comp[mid:])
            + chunk(b"IEND", b""))


def test_png_roundtrip_every_filter_type():
    import numpy as np

    from grader_etl_spark.operators.multimodal import decode_image_raw

    img = _test_img(w=9, h=10, seed=11)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        blob = _encode_png(img, filters=filters)
        out = decode_image_raw(blob)
        assert out.dtype == np.uint8 and out.shape == img.shape
        assert (out == img).all(), f"filters={filters}"


def test_png_rgba_and_gray_variants():
    import numpy as np

    from grader_etl_spark.operators.multimodal import decode_image_raw

    rng = np.random.RandomState(3)
    rgba = rng.randint(0, 256, size=(4, 6, 4), dtype=np.uint8)
    out = decode_image_raw(_encode_png(rgba, filters=[4, 2], color_type=6))
    assert (out == rgba[..., :3]).all()

    gray = rng.randint(0, 256, size=(5, 7, 1), dtype=np.uint8)
    out = decode_image_raw(_encode_png(gray, filters=[1, 3], color_type=0))
    assert out.shape == (5, 7, 3)
    assert (out == np.repeat(gray, 3, axis=2)).all()

    ga = rng.randint(0, 256, size=(3, 4, 2), dtype=np.uint8)
    out = decode_image_raw(_encode_png(ga, filters=[0, 4], color_type=4))
    assert (out == np.repeat(ga[..., :1], 3, axis=2)).all()


def test_png_corrupt_payloads_refused():
    import pytest as _pytest

    from grader_etl_spark.operators.multimodal import decode_image_raw

    blob = bytearray(_encode_png(_test_img(), filters=[1]))
    # flip one raster bit: the chunk CRC must catch it
    blob[60] ^= 0x01
    with _pytest.raises(ValueError, match="CRC|truncated|raster"):
        decode_image_raw(bytes(blob))
    # truncation mid-chunk
    with _pytest.raises(ValueError, match="truncated|missing"):
        decode_image_raw(_encode_png(_test_img())[:-20])
    # palette PNGs stay refused (PIL-gated)
    import struct
    import zlib

    def chunk(t, body):
        return (struct.pack(">I", len(body)) + t + body
                + struct.pack(">I", zlib.crc32(t + body) & 0xFFFFFFFF))

    pal = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
           + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="palette"):
        decode_image_raw(pal)


def test_decode_assets_real_handles_png_beside_ppm(spark):
    """The mapInPandas real-decode path accepts mixed PPM/PNG payloads
    and NULLs corrupt PNGs, with pixel-exact mean luma."""
    import numpy as np

    from grader_etl_spark.operators.multimodal import decode_assets_real

    img1 = _test_img(w=4, h=3, seed=1)
    img2 = _test_img(w=6, h=2, seed=2)
    corrupt = _encode_png(img2)[:-22]
    assets = spark.createDataFrame(
        [(1, bytearray(_encode_ppm(img1))),
         (2, bytearray(_encode_png(img2, filters=[0, 1, 2, 3, 4]))),
         (3, bytearray(corrupt))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_assets_real(assets).collect()}
    for doc, img in ((1, img1), (2, img2)):
        lum = (0.299 * img[..., 0].astype(np.float64)
               + 0.587 * img[..., 1] + 0.114 * img[..., 2]).mean()
        r = got[doc]
        assert (r.width, r.height, r.channels) == (img.shape[1], img.shape[0], 3)
        assert abs(r.mean_luma - float(lum)) < 1e-12
    assert got[3].width is None and got[3].mean_luma is None
