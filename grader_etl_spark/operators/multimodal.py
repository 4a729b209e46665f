"""Multimodal column plumbing (north star, BASELINE.json).

Images/audio/video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` so each Python worker touches one batch of blobs at a
time (never the whole partition as rows, never the driver).

The compressed-codec libraries (PIL/librosa/av) are NOT in this
container, so that half of the decode kernel is gated exactly as the
project brief directs: ``decode_image`` raises NotImplementedError
for JPEG-class formats unless PIL is importable. Formats whose codec
is in the standard library need no gate: ``decode_image_raw`` is a
REAL PPM(P6)/24-bit-BMP decoder (header parse, stride padding,
bottom-up flip, BGR→RGB) plus a full 8-bit PNG decoder (chunk walk
with CRC checks, stdlib-zlib inflate, all five scanline unfilters —
gray/RGB/gray+alpha/RGBA), and ``decode_assets_real`` runs them
through the same mapInPandas plumbing, pixel-verified against
independent test-side encoders. The oracle-checked registry path keeps the
deterministic fake decoder (pure function of blob bytes) so the Arrow
plumbing stays SQL-oracleable end-to-end.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from grader_etl_spark.io import load
from grader_etl_spark.registry import query

try:  # real decoder, absent in this container — the stub gate
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def decode_image(blob: bytes) -> object:
    """Image decode: REAL for the formats this container can own
    outright (PPM P6, 24-bit BMP, and — round 7 — 8-bit PNG via
    stdlib zlib; ``decode_image_raw``); only JPEG and the remaining
    exotic variants stay PIL-gated.

    Exception contract: the raw path raises ValueError/struct.error;
    when PIL is present, variants the raw decoder refuses fall through
    to ``Image.open`` and follow PIL's model instead (OSError-family
    UnidentifiedImageError, lazy raster errors at .load()). Operator
    kernels use ``decode_image_raw`` directly, whose contract is
    uniform."""
    if blob[:2] in (b"P6", b"BM") or blob[:8] == _PNG_MAGIC:
        try:
            return decode_image_raw(blob)
        except (ValueError, struct.error):
            if not _HAVE_PIL:
                raise
            # a variant the raw decoder refuses (palettized, RLE,
            # 16-bit, interlaced PNG): fall through to PIL if present
    if not _HAVE_PIL:
        raise NotImplementedError(
            "JPEG/compressed-image decode requires PIL; this environment "
            "ships without codecs — PPM/BMP/PNG decode natively, other "
            "formats use fake_decode_meta (deterministic stub) in "
            "tests/benches"
        )
    import io as _io

    return Image.open(_io.BytesIO(blob))


def _ppm_decode(blob: bytes):
    """PPM binary (P6): ASCII header 'P6 <w> <h> <maxval>' with
    #-comments, then raw big-endian RGB. maxval>255 (16-bit) refused."""
    import numpy as np

    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment to end of line
            pos = blob.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    raster = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def _bmp_decode(blob: bytes):
    """BMP, 24-bit uncompressed (BITMAPINFOHEADER): little-endian
    header, 4-byte-padded BGR rows, bottom-up unless height<0."""
    import numpy as np

    data_offset = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", blob, 14)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    bottom_up, h = h > 0, abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=data_offset)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        img = img[::-1]
    return img[..., ::-1].copy()  # BGR -> RGB


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_decode(blob: bytes):
    """PNG decode with stdlib zlib only — no PIL. Supports the formats
    a training-data pipeline actually stores: 8-bit depth, color types
    0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced. Full
    chunk walk with CRC verification (a bit-flipped chunk raises, it
    does not decode to garbage), inflate, then per-scanline unfilter of
    all five PNG filters (None/Sub/Up/Average/Paeth). Sub and Up are
    vectorized (uint8 wraparound IS the mod-256 the spec asks for;
    Sub = per-byte-lane prefix sum); Average/Paeth carry a genuine
    sequential dependence along x and run as per-byte loops — PNG
    rows are KB-scale, and this path exists for correctness-verified
    ingest, not pixel-rate throughput. Returns HxWx3 uint8 RGB (alpha
    dropped, gray replicated) — the decode_image_raw contract."""
    import zlib

    import numpy as np

    if blob[:8] != _PNG_MAGIC:
        raise ValueError(f"not a PNG payload (magic={blob[:8]!r})")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(blob):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"only 8-bit non-interlaced PNG supported (depth={depth}, "
            f"interlace={interlace})"
        )
    nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if nch is None:
        raise ValueError(f"palette PNG (color type {color_type}) not supported")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    stride = w * nch
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG raster size mismatch")
    img = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = nch  # bytes per pixel at depth 8
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: per-byte-lane prefix sum, uint8 wrap = mod 256
            line = np.add.accumulate(line.reshape(w, bpp), axis=0, dtype=np.uint8).reshape(stride)
        elif f == 2:  # Up
            line += prev
        elif f in (3, 4):  # Average / Paeth: sequential along x
            rec = line.astype(np.int32)
            pr = prev.astype(np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(pr[x])
                if f == 3:
                    rec[x] = (rec[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(pr[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (rec[x] + pred) & 0xFF
            line = rec.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        img[y] = line
        prev = img[y]
    px = img.reshape(h, w, nch)
    if nch == 1:
        return np.repeat(px, 3, axis=2).copy()
    if nch == 2:  # gray+alpha: replicate gray, drop alpha
        return np.repeat(px[..., :1], 3, axis=2).copy()
    if nch == 4:  # RGBA: drop alpha
        return px[..., :3].copy()
    return px.copy()


def decode_image_raw(blob: bytes):
    """REAL codec-library-free decode: PPM(P6) and 24-bit BMP
    (uncompressed containers) plus PNG (stdlib zlib inflate +
    unfilter). Returns an HxWx3 uint8 RGB array; raises ValueError on
    anything else — the operator layer maps that to NULL metadata,
    same as a NULL blob."""
    if blob[:2] == b"P6":
        return _ppm_decode(blob)
    if blob[:2] == b"BM":
        return _bmp_decode(blob)
    if blob[:8] == _PNG_MAGIC:
        return _png_decode(blob)
    raise ValueError(f"not a PPM/BMP/PNG payload (magic={blob[:2]!r})")


_REAL_DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, mean_luma double"
)


def decode_assets_real(assets: DataFrame) -> DataFrame:
    """The REAL-decoder twin of ``decode_assets``: Arrow batches of
    PPM/BMP payloads → pixel-derived metadata (dimensions + mean
    ITU-R 601 luma). Undecodable or NULL payloads keep their row with
    NULL metadata — the corrupt-asset discipline of the fake path."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "width": [], "height": [],
                   "channels": [], "mean_luma": []}
            for blob in pdf["payload"]:
                try:
                    img = decode_image_raw(bytes(blob))
                    lum = (
                        0.299 * img[..., 0].astype(np.float64)
                        + 0.587 * img[..., 1]
                        + 0.114 * img[..., 2]
                    ).mean()
                    vals = (img.shape[1], img.shape[0], img.shape[2], float(lum))
                except (ValueError, TypeError, IndexError, struct.error):
                    vals = (None, None, None, None)
                for k, v in zip(("width", "height", "channels", "mean_luma"), vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, schema=_REAL_DECODE_SCHEMA)


def fake_decode_meta(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a decoder: (byte_len, width, height)
    as pure functions of the payload size."""
    n = len(blob)
    return n, (n % 640) + 16, ((n * 7) % 480) + 16


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Wrap documents as multimodal assets: binary payload + typed
    metadata struct — the schema every multimodal operator rides on.

    The synthetic payload is the PRINTABLE-ASCII projection of the
    text (each non-[0x20,0x7E] code point becomes one '?'), UTF-8
    encoded. That makes byte ops ≡ char ops BY CONSTRUCTION for any
    input — payload byte length equals text char length, so the
    DuckDB oracles can recompute the byte-level kernels character-
    wise on unicode corpora too, not just ASCII fixtures (fuzz:
    test_fuzz_sweep). The payloads are deterministic fakes either
    way; a real pipeline swaps this synthesis for actual media
    bytes and the kernels/oracle discipline stay unchanged."""
    return docs.select(
        "doc_id",
        F.encode(
            F.regexp_replace("text", r"[^\x20-\x7E]", "?"), "UTF-8"
        ).alias("payload"),
        F.struct(
            F.lit("image/fake-png").alias("mime"),
            F.lit("synthetic").alias("origin"),
        ).alias("meta"),
    )


_DECODE_SCHEMA = "doc_id bigint, byte_len int, width int, height int"


def decode_assets(assets: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract: Arrow batches in, one
    metadata row per asset out. Partitioning is preserved — no
    shuffle; Python cost scales with bytes per partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # na_action: a NULL payload (missing/corrupt asset) keeps
            # its row with NULL metadata — the oracle's length(NULL)
            # arithmetic does the same (nulls fuzz shape).
            metas = pdf["payload"].map(fake_decode_meta, na_action="ignore")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": metas.map(lambda m: m[0], na_action="ignore"),
                    "width": metas.map(lambda m: m[1], na_action="ignore"),
                    "height": metas.map(lambda m: m[2], na_action="ignore"),
                }
            )

    return assets.mapInPandas(run, schema=_DECODE_SCHEMA)


@query(
    "q_multimodal_decode",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS INTEGER)                    AS byte_len,
       CAST((length(text) % 640) + 16 AS INTEGER)       AS width,
       CAST(((length(text) * 7) % 480) + 16 AS INTEGER) AS height
FROM documents
""",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing, end-to-end: text → binary payload →
    mapInPandas fake-decode → typed metadata. The oracle recomputes
    the deterministic decode arithmetic from the char length, proving
    the binary round-trip and the Arrow batch path bit-exact (payload
    bytes ≡ text chars by the ASCII projection in
    assets_from_documents, so this holds on unicode corpora too)."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return decode_assets(assets_from_documents(docs))


# Frame sampling: pick n deterministic byte offsets from a payload —
# the shape of video frame-sampling with the codec stubbed out.
_FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_offset int"


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Evenly-spaced deterministic frame offsets per asset (UDTF-shaped:
    one asset → n rows) via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # NULL asset still fans out its n_frames rows,
                    # offsets NULL — the oracle's cross join computes
                    # (i * length(NULL)) // 4 = NULL the same way.
                    rows.extend((doc_id, i, None) for i in range(n_frames))
                    continue
                n = len(payload)
                for i in range(n_frames):
                    rows.append((doc_id, i, (i * n) // n_frames))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_offset"])

    return assets.mapInPandas(run, schema=_FRAMES_SCHEMA)


@query(
    "q_multimodal_frames",
    oracle="""
SELECT doc_id,
       CAST(i AS INTEGER)                        AS frame_idx,
       CAST((i * length(text)) // 4 AS INTEGER)  AS frame_offset
FROM documents, (SELECT unnest(range(0, 4)) AS i)
""",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one asset fans out to 4 frame rows with
    deterministic offsets; oracle mirrors the arithmetic."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return sample_frames(assets_from_documents(docs))


# Resize: transform the payload itself (not just metadata) — the
# shape of image resizing with the codec stubbed. The fake kernel
# tiles/truncates the source bytes into a fixed-size frame buffer, a
# pure function of the payload, so the oracle can recompute it (and
# its md5) from the text column in SQL.
RESIZE_TARGET_BYTES = 4096  # "64x64 grayscale"


def fake_resize(payload: bytes, target: int = RESIZE_TARGET_BYTES) -> bytes:
    if not payload:
        return b"\x00" * target
    reps = -(-target // len(payload))  # ceil
    return (payload * reps)[:target]


_RESIZE_SCHEMA = "doc_id bigint, resized binary"


def resize_assets(assets: DataFrame, target: int = RESIZE_TARGET_BYTES) -> DataFrame:
    """mapInPandas payload transform: binary in, binary out, schema
    pinned — the real-resize path would decode, resample, re-encode
    inside the same kernel (decode_image gates on PIL). No shuffle;
    output bytes replace input bytes partition-locally."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "resized": pdf["payload"].map(lambda b: fake_resize(b, target)),
                }
            )

    return assets.mapInPandas(run, schema=_RESIZE_SCHEMA)


@query(
    "q_multimodal_resize",
    oracle=f"""
WITH proj AS (
  SELECT doc_id, regexp_replace(text, '[^\\x20-\\x7E]', '?', 'g') AS p
  FROM documents
)
SELECT doc_id,
       CAST({RESIZE_TARGET_BYTES} AS BIGINT) AS resized_len,
       md5(substr(repeat(p, CAST(ceil({RESIZE_TARGET_BYTES}.0 / length(p)) AS INT)),
                  1, {RESIZE_TARGET_BYTES})) AS resized_md5
FROM proj
WHERE length(p) > 0
""",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize plumbing end-to-end: binary payload →
    mapInPandas transform kernel → new binary column, verified
    bit-exact by md5 against the oracle's SQL reconstruction (the
    payload's ASCII projection ⇒ byte ops ≡ char ops on any corpus).
    Proves the full binary-in/binary-out Arrow path, not just
    metadata extraction."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"]).filter(
        F.length("text") > 0
    )
    resized = resize_assets(assets_from_documents(docs))
    return resized.select(
        "doc_id",
        F.length("resized").cast("long").alias("resized_len"),
        F.md5("resized").alias("resized_md5"),
    )


# ---------------------------------------------------------------------------
# mapInArrow decode twin — the zero-copy batch path for binary columns
# ---------------------------------------------------------------------------


def decode_assets_arrow(assets: DataFrame) -> DataFrame:
    """``mapInArrow`` rendition of :func:`decode_assets`: the kernel
    receives ``pyarrow.RecordBatch`` objects directly, skipping the
    Arrow→pandas materialization that ``mapInPandas`` performs on
    every column. For blob-heavy batches that conversion is the
    dominant cost — pandas copies each binary cell into a Python
    bytes object up front, while the arrow path only touches the
    buffers the kernel actually reads. Same deterministic fake-decode
    arithmetic, registered as q_multimodal_decode_arrow and
    hash-checked against the SAME oracle as the pandas route — the
    two kernels must be bit-identical."""
    import pyarrow as pa

    def run(batches):
        for batch in batches:
            doc_ids = batch.column("doc_id")
            # NULL payload → NULL metadata row, same as the pandas
            # kernel's na_action and the oracle's length(NULL).
            metas = [
                None if b.as_py() is None else fake_decode_meta(b.as_py())
                for b in batch.column("payload")
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    doc_ids,
                    pa.array([m and m[0] for m in metas], pa.int32()),
                    pa.array([m and m[1] for m in metas], pa.int32()),
                    pa.array([m and m[2] for m in metas], pa.int32()),
                ],
                names=["doc_id", "byte_len", "width", "height"],
            )

    return assets.mapInArrow(run, schema=_DECODE_SCHEMA)


@query(
    "q_multimodal_decode_arrow",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS INTEGER)                    AS byte_len,
       CAST((length(text) % 640) + 16 AS INTEGER)       AS width,
       CAST(((length(text) * 7) % 480) + 16 AS INTEGER) AS height
FROM documents
""",
)
def q_multimodal_decode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInArrow decode path (see decode_assets_arrow) over the
    same assets — proves the zero-copy RecordBatch kernel produces
    bit-identical metadata to the pandas route, against the identical
    SQL oracle."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return decode_assets_arrow(assets_from_documents(docs))


# ---------------------------------------------------------------------------
# q_multimodal_features — vectorized numpy feature extraction (L13c)
# ---------------------------------------------------------------------------

_FEATURES_SCHEMA = "doc_id bigint, byte_len int, n_spaces int, n_alpha int, mean_byte double"


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over raw payload BYTES with
    numpy — the real (not faked) half of the multimodal kernel
    surface: each Arrow batch's payloads are frombuffer'd and reduced
    vectorized (histogram-style counts + mean), exactly the shape a
    pixel-statistics or audio-energy extractor has once a codec
    replaces frombuffer. No shuffle; Python cost ∝ bytes/partition."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # NULL asset: row kept, every feature NULL (the
                    # oracle's length(NULL) arithmetic agrees).
                    rows.append((doc_id, None, None, None, None))
                    continue
                b = np.frombuffer(payload, dtype=np.uint8)
                rows.append(
                    (
                        doc_id,
                        int(b.size),
                        int((b == 0x20).sum()),
                        int(((b >= 0x61) & (b <= 0x7A)).sum()),
                        # Quantize the mean in INTEGER arithmetic
                        # (half-up at 4 dp): Python's round() is
                        # half-even, DuckDB's ROUND is half-up, and a
                        # sum/n landing exactly on .00005 flips
                        # between them. floor((s·1e4 + n/2)/n) as
                        # integers is engine-independent; the final
                        # /1e4 is one IEEE division of that integer.
                        # Mean of ZERO bytes is undefined — NULL, the
                        # SQL AVG-of-empty convention, so the oracle's
                        # CASE WHEN length = 0 twin agrees (found by
                        # the fuzz sweep on an empty-text doc; 0.0
                        # here silently disagreed with the oracle's
                        # divide-by-zero NULL).
                        ((int(b.sum(dtype=np.int64)) * 20000 + b.size) // (2 * b.size))
                        / 10000.0
                        if b.size
                        else None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "byte_len", "n_spaces", "n_alpha", "mean_byte"]
            )

    return assets.mapInPandas(run, schema=_FEATURES_SCHEMA)


@query(
    "q_multimodal_features",
    oracle="""
WITH proj AS (
  SELECT doc_id, regexp_replace(text, '[^\\x20-\\x7E]', '?', 'g') AS p
  FROM documents
)
SELECT doc_id,
       CAST(length(p) AS INTEGER) AS byte_len,
       CAST(length(p) - length(replace(p, ' ', '')) AS INTEGER) AS n_spaces,
       CAST(length(regexp_replace(p, '[^a-z]', '', 'g')) AS INTEGER) AS n_alpha,
       CASE WHEN length(p) = 0 THEN NULL ELSE
         CAST((CAST(list_sum(list_transform(string_split(p, ''), c -> unicode(c)))
                    AS BIGINT) * 20000 + length(p)) // (2 * length(p))
              AS DOUBLE) / 10000.0 END AS mean_byte
FROM proj
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over multimodal payload bytes: byte length,
    space count, lowercase-alpha count, mean byte value — computed by
    a REAL vectorized numpy kernel over Arrow batches (frombuffer +
    masked reductions), not a fake. Because the synthetic payload is
    the text's ASCII projection, DuckDB can recompute every feature
    character-wise on any corpus — so unlike the gated decode kernels
    this one is value-oracled end to end, pinning the payload
    round-trip, the Arrow batch path, AND the arithmetic. Swapping frombuffer for a codec turns this into
    pixel/audio statistics with the identical plan (map-side, zero
    shuffle, schema-typed output)."""
    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    return extract_features(assets_from_documents(docs))


# ---------------------------------------------------------------------------
# REAL audio decode — WAV/PCM, struct-only (the audio twin of
# decode_image_raw: uncompressed containers need no codec library)
# ---------------------------------------------------------------------------


def decode_audio_raw(blob: bytes):
    """Parse a RIFF/WAVE container with 16-bit PCM samples. Returns
    ``(sample_rate, channels, samples_per_channel, np.ndarray[int16]
    of shape (frames, channels))``; raises ValueError on anything that
    is not plain PCM (compressed audio stays librosa/av-gated)."""
    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload (magic={blob[:4]!r})")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2")
    frames = len(samples) // channels
    return sample_rate, channels, frames, samples[: frames * channels].reshape(frames, channels)


_AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, channels int, duration_s double, rms double"
)


def audio_features_real(assets: DataFrame) -> DataFrame:
    """Arrow-batched WAV feature extraction: duration + RMS energy per
    payload, NULL metadata for undecodable/NULL payloads — the audio
    twin of decode_assets_real, same mapInPandas plumbing, zero
    row-at-a-time Python."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf["doc_id"], "sample_rate": [], "channels": [],
                   "duration_s": [], "rms": []}
            for blob in pdf["payload"]:
                try:
                    rate, ch, frames, pcm = decode_audio_raw(bytes(blob))
                    # zero-frame WAV: rms is undefined — NULL, not NaN
                    rms = (float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2)))
                           if frames else None)
                    vals = (rate, ch, frames / rate, rms)
                except (ValueError, TypeError, ZeroDivisionError, struct.error):
                    vals = (None, None, None, None)
                for k, v in zip(("sample_rate", "channels", "duration_s", "rms"), vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return assets.mapInPandas(run, schema=_AUDIO_SCHEMA)


def _encode_ppm_raw(img) -> bytes:
    """Minimal P6 writer for the real resize path's output payload."""
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def resize_assets_real(assets: DataFrame, width: int, height: int) -> DataFrame:
    """REAL binary→binary resize for uncompressed payloads: decode
    (PPM/BMP) → nearest-neighbor index resample in numpy → re-encode
    as P6. Completes the decode→transform→encode path with zero codec
    dependencies; undecodable/NULL payloads → NULL output, the same
    corrupt-asset discipline as the decode operators. (The fake
    tile/truncate kernel stays the ORACLE path — this one's outputs
    are pixel data, pinned in pytest against numpy ground truth.)"""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf["payload"]:
                try:
                    img = decode_image_raw(bytes(blob))
                    h, w = img.shape[:2]
                    yi = (np.arange(height) * h // height)
                    xi = (np.arange(width) * w // width)
                    out.append(_encode_ppm_raw(np.ascontiguousarray(img[yi][:, xi])))
                except (ValueError, TypeError, IndexError, struct.error):
                    out.append(None)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "resized": out})

    return assets.mapInPandas(run, schema=_RESIZE_SCHEMA)
