"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shapes, ``mapInPandas`` iterator contracts. The actual media decode
is STUBBED: the codec libraries (PIL/ffmpeg/torchaudio) are not in this
container, so ``decode_*`` raise ``NotImplementedError`` unless
``fake=True``, which substitutes a deterministic content-hash-derived
fake so the downstream plumbing (feature extract, resize, frame sample)
is exercised end-to-end with stable expected values.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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


def decode_and_featurize(df: DataFrame, fake: bool = False, dim: int = 8) -> DataFrame:
    """mapInPandas over Arrow batches: binary payload → feature vector.

    Real decode is stubbed (codec libs absent); ``fake=True`` uses the
    deterministic hash feature. The iterator contract, batch shapes, and
    output schema are the production plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "feature": pdf["data"].map(lambda b: _fake_feature(b, dim)),
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, max_side: int = 64, fake: bool = False) -> DataFrame:
    """Image resize: payload → payload' with scaled meta.

    Real decode stubbed; the fake preserves aspect ratio arithmetic and
    re-stamps the payload with a deterministic sha-derived body so
    downstream plumbing sees realistic (changed) bytes.
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("data_sha", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires codec libraries; pass fake=True"
                )
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
