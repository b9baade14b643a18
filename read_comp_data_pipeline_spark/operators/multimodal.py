"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shapes, ``mapInPandas`` iterator contracts.

Decode support is split by codec class:

* **uncompressed formats decode for real, numpy-only**: 24-bit BI_RGB
  BMP (images) and 16-bit PCM WAV (audio) — :func:`decode_bmp` /
  :func:`decode_wav`, with matching encoders for deterministic test
  asset synthesis. No codec library needed.
* **compressed formats (JPEG/PNG/MP3/MP4...) remain honestly stubbed**:
  the codec libraries (PIL/cv2/ffmpeg) are not in this container, so
  unknown payloads raise ``NotImplementedError``. ``fake=True``
  substitutes a deterministic content-hash-derived fake so downstream
  plumbing is exercised end-to-end regardless of payload format.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_KINDS = ["image", "audio", "video"]


def synth_assets(documents: DataFrame) -> DataFrame:
    """Deterministic multimodal table from the shared documents corpus:
    the text bytes stand in for media payloads; metadata is derived from
    doc_id (no randomness, replay-stable)."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    meta = F.struct(
        F.when(F.col("doc_id") % 3 == 0, (64 + F.col("doc_id") % 512).cast("int")).alias("width"),
        F.when(F.col("doc_id") % 3 == 0, (64 + F.col("doc_id") % 256).cast("int")).alias("height"),
        F.when(F.col("doc_id") % 3 == 1, F.lit(16000).cast("int")).alias("sample_rate"),
        F.when(F.col("doc_id") % 3 != 0, (100 + F.col("doc_id") % 60000).cast("long")).alias("duration_ms"),
    )
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("data"),
        meta.alias("meta"),
    )


def _fake_feature(data: bytes | None, dim: int = 8) -> list[float] | None:
    """Deterministic stand-in for a decoded-media feature vector: bytes of
    sha256(data) scaled to [0,1). Stable across runs/partitions."""
    if data is None:
        return None
    h = hashlib.sha256(bytes(data)).digest()
    return [h[i] / 256.0 for i in range(dim)]


# ── real numpy-only codecs for uncompressed formats ─────────────────────────

def encode_bmp(rgb: "np.ndarray") -> bytes:
    """Serialize an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up rows, BGR byte order, 4-byte row padding — the standard
    uncompressed layout)."""
    arr = np.asarray(rgb, dtype=np.uint8)
    h, w, c = arr.shape
    assert c == 3
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    # pixel rows: bottom-up, BGR, padded
    rows = arr[::-1, :, ::-1]
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    padded[:, : w * 3] = rows.reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + info + padded.tobytes()


class DecodeError(NotImplementedError):
    """Malformed payload that matched a supported format's magic but failed
    to parse (truncated chunk, inconsistent sizes, negative dimensions…).
    Subclasses NotImplementedError so every documented clean-rejection path
    (the honesty guards, decode_and_featurize's fake=False contract) catches
    it uniformly — callers never see a raw struct.error/ValueError."""


def decode_bmp(data: bytes) -> "np.ndarray":
    """Parse a 24-bit uncompressed (BI_RGB) BMP into (H, W, 3) uint8 RGB.
    Anything else — other depths, RLE/compressed BMPs, non-BMP payloads —
    raises NotImplementedError (compressed codecs are not available in
    this environment; see module docstring); malformed-but-magic-matching
    payloads raise :class:`DecodeError` with the payload context."""
    buf = bytes(data)
    if len(buf) < 54 or buf[:2] != b"BM":
        raise NotImplementedError("not an uncompressed BMP payload")
    try:
        (_, _, _, _, offset) = struct.unpack("<2sIHHI", buf[:14])
        (hsize, w, h, _planes, depth, compression, *_rest) = struct.unpack(
            "<IiiHHIIiiII", buf[14:54]
        )
    except struct.error as e:
        raise DecodeError(f"malformed BMP header ({len(buf)} bytes): {e}") from e
    if hsize < 40 or depth != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP decodes without codec libs (depth={depth}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise DecodeError(f"malformed BMP dimensions {w}x{h} ({len(buf)} bytes)")
    try:
        row_bytes = (w * 3 + 3) & ~3
        px = np.frombuffer(buf, dtype=np.uint8, count=row_bytes * h, offset=offset)
        rows = px.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    except ValueError as e:
        raise DecodeError(
            f"truncated/inconsistent BMP pixel data for {w}x{h} "
            f"({len(buf)} bytes): {e}"
        ) from e
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def _pnm_header(buf: bytes, magic: bytes, n_fields: int) -> tuple[list[int], int]:
    """Parse a binary PNM header (``P5``/``P6``): magic, then ``n_fields``
    whitespace-separated decimal fields with ``#`` comments, returning
    (fields, offset of the raster). Raises :class:`DecodeError` on any
    malformation past the magic."""
    pos, fields = len(magic), []
    try:
        while len(fields) < n_fields:
            while buf[pos : pos + 1].isspace():
                pos += 1
            if buf[pos : pos + 1] == b"#":
                pos = buf.index(b"\n", pos) + 1
                continue
            start = pos
            while buf[pos : pos + 1].isdigit():
                pos += 1
            if pos == start:
                raise ValueError(f"expected integer at byte {pos}")
            fields.append(int(buf[start:pos]))
        pos += 1  # single whitespace after maxval, then raster
    except (ValueError, IndexError) as e:
        raise DecodeError(f"malformed PNM header ({len(buf)} bytes): {e}") from e
    return fields, pos


def encode_ppm(rgb: "np.ndarray") -> bytes:
    """Serialize (H, W, 3) uint8 RGB as binary PPM (P6, maxval 255)."""
    arr = np.asarray(rgb, dtype=np.uint8)
    h, w, c = arr.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> "np.ndarray":
    """Parse a binary PPM (P6, maxval 255) into (H, W, 3) uint8 RGB.
    Plain-text P3 and >8-bit maxvals raise NotImplementedError; malformed
    P6 payloads raise :class:`DecodeError`."""
    buf = bytes(data)
    if buf[:2] != b"P6":
        raise NotImplementedError("not a binary PPM (P6) payload")
    (w, h, maxval), off = _pnm_header(buf, b"P6", 3)
    if maxval != 255:
        raise NotImplementedError(f"only 8-bit PPM decodes here (maxval={maxval})")
    if w <= 0 or h <= 0:
        raise DecodeError(f"malformed PPM dimensions {w}x{h}")
    try:
        px = np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=off)
        return px.reshape(h, w, 3).copy()
    except ValueError as e:
        raise DecodeError(f"truncated PPM raster for {w}x{h} ({len(buf)} bytes): {e}") from e


def encode_pgm(gray: "np.ndarray") -> bytes:
    """Serialize (H, W) uint8 grayscale as binary PGM (P5, maxval 255)."""
    arr = np.asarray(gray, dtype=np.uint8)
    h, w = arr.shape
    return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_pgm(data: bytes) -> "np.ndarray":
    """Parse a binary PGM (P5, maxval 255) into (H, W) uint8 grayscale."""
    buf = bytes(data)
    if buf[:2] != b"P5":
        raise NotImplementedError("not a binary PGM (P5) payload")
    (w, h, maxval), off = _pnm_header(buf, b"P5", 3)
    if maxval != 255:
        raise NotImplementedError(f"only 8-bit PGM decodes here (maxval={maxval})")
    if w <= 0 or h <= 0:
        raise DecodeError(f"malformed PGM dimensions {w}x{h}")
    try:
        px = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=off)
        return px.reshape(h, w).copy()
    except ValueError as e:
        raise DecodeError(f"truncated PGM raster for {w}x{h} ({len(buf)} bytes): {e}") from e


def encode_wav(samples: "np.ndarray", sample_rate: int = 16000) -> bytes:
    """Serialize int16 PCM samples (1-D mono or (N, ch)) as a RIFF/WAVE
    file (format tag 1 = uncompressed PCM)."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


def decode_wav(data: bytes) -> tuple["np.ndarray", int]:
    """Parse a 16-bit PCM RIFF/WAVE payload into ((N, ch) int16, rate).
    Compressed/float WAV variants raise NotImplementedError; malformed-
    but-magic-matching payloads (truncated fmt chunk, data length not a
    multiple of channels×2) raise :class:`DecodeError`."""
    buf = bytes(data)
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, fmt, rate, ch, bits, pcm = 12, None, None, None, None, None
    try:
        while pos + 8 <= len(buf):
            cid, csize = struct.unpack("<4sI", buf[pos:pos + 8])
            body = buf[pos + 8 : pos + 8 + csize]
            if cid == b"fmt ":
                tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
                pcm = tag == 1
            elif cid == b"data":
                fmt = body
            pos += 8 + csize + (csize & 1)
    except struct.error as e:
        raise DecodeError(f"malformed WAV chunk ({len(buf)} bytes): {e}") from e
    if fmt is None or not pcm or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV decodes without codec libs (pcm={pcm}, bits={bits})"
        )
    try:
        arr = np.frombuffer(fmt, dtype="<i2")
        return arr.reshape(-1, ch).copy(), int(rate)
    except ValueError as e:
        raise DecodeError(
            f"inconsistent WAV data chunk ({len(fmt)} bytes for {ch} "
            f"channel(s)): {e}"
        ) from e


def _pool(values: "np.ndarray", dim: int) -> list[float]:
    """Mean over ``dim`` contiguous chunks — the deterministic feature
    pooling shared by the image and audio paths."""
    if values.size == 0:
        return [0.0] * dim
    return [float(c.mean()) if c.size else 0.0 for c in np.array_split(values, dim)]


def image_feature(data: bytes, dim: int = 8) -> list[float]:
    """Real image feature: decode BMP → grayscale in [0,1] → ``dim``-chunk
    mean pooling over the flattened pixel sequence."""
    gray = decode_bmp(data).mean(axis=2).ravel() / 255.0
    return _pool(gray, dim)


def audio_feature(data: bytes, dim: int = 8) -> list[float]:
    """Real audio feature: decode WAV → mono [-1,1] → RMS over ``dim``
    contiguous windows."""
    samples, _rate = decode_wav(data)
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    if mono.size == 0:
        return [0.0] * dim
    return [float(np.sqrt((c ** 2).mean())) if c.size else 0.0 for c in np.array_split(mono, dim)]


def real_feature(data: bytes | None, dim: int = 8) -> list[float] | None:
    """Dispatch on payload magic: BMP/PPM/PGM → image pooling, WAV → RMS
    windows, anything else (compressed formats) raises NotImplementedError."""
    if data is None:
        return None
    buf = bytes(data)
    if buf[:2] == b"BM":
        return image_feature(buf, dim)
    if buf[:2] == b"P6":
        gray = decode_ppm(buf).mean(axis=2).ravel() / 255.0
        return _pool(gray, dim)
    if buf[:2] == b"P5":
        return _pool(decode_pgm(buf).ravel() / 255.0, dim)
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return audio_feature(buf, dim)
    raise NotImplementedError(
        "payload is not an uncompressed BMP/WAV; compressed codecs "
        "(JPEG/PNG/MP3/MP4) require libraries not present in this "
        "environment — pass fake=True for the deterministic stub"
    )


def synth_real_assets(documents: DataFrame) -> DataFrame:
    """Deterministic REAL-payload multimodal table from the documents
    corpus: even doc_ids become genuine 24-bit BMPs, odd ones genuine
    16-bit PCM WAVs, with pixel/sample content derived from doc_id (no
    randomness — replay-stable; decodable by :func:`real_feature`).
    The payload synthesis runs distributed in mapInPandas."""
    src = documents.select(F.col("doc_id").alias("asset_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for aid in pdf["asset_id"].astype("int64"):
                aid = int(aid)
                if aid % 2 == 0:
                    w, h = 8 + aid % 16, 6 + aid % 12
                    # deterministic gradient + id-keyed offset
                    yy, xx = np.mgrid[0:h, 0:w]
                    rgb = np.stack(
                        [(xx * 7 + aid) % 256, (yy * 11 + aid * 3) % 256,
                         (xx + yy + aid * 5) % 256], axis=2
                    ).astype(np.uint8)
                    data, kind = encode_bmp(rgb), "image"
                    meta = {"width": w, "height": h, "sample_rate": None,
                            "duration_ms": None}
                else:
                    n = 256 + (aid % 128)
                    t = np.arange(n, dtype=np.float64)
                    samples = (
                        np.sin(2 * np.pi * t * ((aid % 40) + 5) / 200.0) * 12000
                    ).astype(np.int16)
                    data, kind = encode_wav(samples, 16000), "audio"
                    meta = {"width": None, "height": None, "sample_rate": 16000,
                            "duration_ms": int(n * 1000 / 16000)}
                out_rows.append((aid, kind, data, meta))
            yield pd.DataFrame(out_rows, columns=["asset_id", "kind", "data", "meta"])

    return src.mapInPandas(gen, schema=ASSET_SCHEMA)


def decode_and_featurize(df: DataFrame, fake: bool = False, dim: int = 8) -> DataFrame:
    """mapInPandas over Arrow batches: binary payload → feature vector.

    ``fake=False`` decodes for REAL via the numpy-only codecs: BMP
    payloads → grayscale mean pooling, WAV payloads → windowed RMS
    (:func:`real_feature`); compressed formats raise NotImplementedError
    (codec libs absent — see module docstring). ``fake=True`` uses the
    deterministic hash feature regardless of format. The iterator
    contract, batch shapes, and output schema are identical either way.
    """
    featurize = (lambda b: _fake_feature(b, dim)) if fake else (lambda b: real_feature(b, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "feature": pdf["data"].map(featurize),
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def nn_resize(rgb: "np.ndarray", max_side: int) -> "np.ndarray":
    """Nearest-neighbor downscale so max(H, W) <= max_side (no upscale),
    preserving aspect ratio — pure numpy index selection."""
    h, w = rgb.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    ys = (np.arange(nh) * (h / nh)).astype(np.int64)
    xs = (np.arange(nw) * (w / nw)).astype(np.int64)
    return rgb[ys][:, xs]


def resize_images(df: DataFrame, max_side: int = 64, fake: bool = False) -> DataFrame:
    """Image resize: payload → payload' with scaled meta.

    ``fake=False``: REAL nearest-neighbor resize for BMP payloads —
    decode, index-select, re-encode BMP, sha the new bytes; dimensions
    come from the BMP header itself. Non-BMP payloads raise (compressed
    codecs absent). ``fake=True`` preserves the aspect-ratio arithmetic
    from meta and re-stamps the payload with a deterministic sha-derived
    body so downstream plumbing sees realistic (changed) bytes.
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("data_sha", T.StringType(), True),
        ]
    )

    def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            sel = pdf["kind"] == "image"
            for aid, data in zip(pdf.loc[sel, "asset_id"], pdf.loc[sel, "data"]):
                rgb = nn_resize(decode_bmp(data), max_side)
                out = encode_bmp(rgb)
                rows.append(
                    (int(aid), rgb.shape[1], rgb.shape[0], hashlib.sha256(out).hexdigest())
                )
            yield pd.DataFrame(rows, columns=["asset_id", "width", "height", "data_sha"]).astype(
                {"asset_id": "int64", "width": "int32", "height": "int32"}
            )

    if not fake:
        return df.mapInPandas(run_real, schema=out_schema)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # vectorized batch path: struct column → frame, numpy arithmetic
            # on whole columns; Python touches rows only for the sha digest
            # (inherently per-row), via a single column-wise map
            meta = pd.DataFrame(
                [m if m is not None else {} for m in pdf["meta"]],
                index=pdf.index,
            )
            w_s = meta.get("width", pd.Series(index=pdf.index, dtype="float"))
            h_s = meta.get("height", pd.Series(index=pdf.index, dtype="float"))
            # zero/negative dimensions are skipped like missing ones (a 0
            # would divide-by-zero in the scale arithmetic below)
            sel = (pdf["kind"] == "image") & (w_s > 0) & (h_s > 0)
            if not sel.any():
                yield pd.DataFrame(
                    {"asset_id": pd.Series(dtype="int64"),
                     "width": pd.Series(dtype="int32"),
                     "height": pd.Series(dtype="int32"),
                     "data_sha": pd.Series(dtype="object")}
                )
                continue
            w = meta.loc[sel, "width"].to_numpy(dtype="float64")
            h = meta.loc[sel, "height"].to_numpy(dtype="float64")
            scale = np.minimum(1.0, max_side / np.maximum(w, h))
            nw = np.maximum(1, (w * scale).astype("int64"))
            nh = np.maximum(1, (h * scale).astype("int64"))
            data = pdf.loc[sel, "data"]
            shas = [
                hashlib.sha256(bytes(d or b"") + f"{a}x{b}".encode()).hexdigest()
                for d, a, b in zip(data, nw, nh)
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf.loc[sel, "asset_id"].astype("int64"),
                    "width": nw.astype("int32"),
                    "height": nh.astype("int32"),
                    "data_sha": shas,
                }
            )

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp.

    Real decode stubbed; the fake emits ``duration_ms // every_ms`` rows
    per video with deterministic frame ids — exercising the 1→N row
    expansion, which is the part that matters for partitioning.
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField("frame_sha", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires codec libraries; pass fake=True"
                )
            # vectorized 1→N expansion: per-row frame counts → index.repeat
            # + groupwise cumcount, no iterrows
            meta = pd.DataFrame(
                [m if m is not None else {} for m in pdf["meta"]],
                index=pdf.index,
            )
            dur = (
                meta.get("duration_ms", pd.Series(index=pdf.index, dtype="float"))
                .fillna(0)
                .to_numpy(dtype="int64")
            )
            n_frames = np.where(pdf["kind"].to_numpy() == "video", dur // every_ms, 0)
            rep_idx = np.repeat(np.arange(len(pdf)), n_frames)
            if len(rep_idx) == 0:
                yield pd.DataFrame(
                    {"asset_id": pd.Series(dtype="int64"),
                     "frame_no": pd.Series(dtype="int32"),
                     "ts_ms": pd.Series(dtype="int64"),
                     "frame_sha": pd.Series(dtype="object")}
                )
                continue
            # frame_no = position within each repeated group (exclusive
            # prefix sums of the group sizes, repeated, subtracted)
            frame_no = np.arange(len(rep_idx)) - np.repeat(
                np.cumsum(np.concatenate([[0], n_frames[n_frames > 0][:-1]])),
                n_frames[n_frames > 0],
            )
            data = pdf["data"].to_numpy(dtype="object")[rep_idx]
            shas = [
                hashlib.sha256(bytes(d or b"") + int(i).to_bytes(4, "big")).hexdigest()
                for d, i in zip(data, frame_no)
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(dtype="int64")[rep_idx],
                    "frame_no": frame_no.astype("int32"),
                    "ts_ms": (frame_no * every_ms).astype("int64"),
                    "frame_sha": shas,
                }
            )

    return df.mapInPandas(run, schema=out_schema)
