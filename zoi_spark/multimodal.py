"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, partition-friendly batch
shapes, Arrow-vectorized UDF signatures over ``mapInPandas`` — while the
actual media decode is STUBBED (codec libraries are not available in
this environment): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``deterministic_fake=True``, which
produces seeded fake features so the pipeline (including tests and
plans) is fully exercisable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried next to every media binary column
MEDIA_META_DDL = ("struct<mime:string,width:int,height:int,"
                  "duration_ms:bigint,codec:string>")

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def _fake_feature(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real image embedding: derived from
    byte statistics so tests get stable, content-dependent values."""
    if not payload:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload[:4096]):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [round(v / 997.0, 6) for v in acc]


def decode_image_features(df: DataFrame, *, id_col: str = "media_id",
                          bin_col: str = "payload", dim: int = 8,
                          deterministic_fake: bool = False) -> DataFrame:
    """media binary → (media_id, width, height, n_bytes, feature).

    Real decode path requires an image codec (PIL/opencv — not in this
    container): STUB. With ``deterministic_fake`` the Arrow batch
    plumbing runs end-to-end with seeded features.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires a codec library not present in this "
            "environment; pass deterministic_fake=True to exercise the "
            "pipeline with seeded features")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                # fake decode: dimensions derived from byte length
                "width": pdf[bin_col].map(
                    lambda b: 0 if b is None else (len(b) % 1920) + 1
                ).astype("int32"),
                "height": pdf[bin_col].map(
                    lambda b: 0 if b is None else (len(b) % 1080) + 1
                ).astype("int32"),
                "n_bytes": pdf[bin_col].map(
                    lambda b: 0 if b is None else len(b)).astype("int64"),
                "feature": pdf[bin_col].map(
                    lambda b: _fake_feature(b, dim)),
            })
            yield out

    return (df.select(id_col, bin_col)
            .mapInPandas(batches, IMAGE_FEATURES_SCHEMA))


def sample_frames(df: DataFrame, *, id_col: str = "media_id",
                  bin_col: str = "payload", every_n: int = 10,
                  max_frames: int = 4,
                  deterministic_fake: bool = False) -> DataFrame:
    """video binary → exploded (media_id, frame_idx, frame) rows.
    STUB decode; the fake slices the payload into pseudo-frames so
    downstream operators see realistic row multiplication."""
    if not deterministic_fake:
        raise NotImplementedError(
            "video decode requires a codec library not present in this "
            "environment; pass deterministic_fake=True")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    continue
                step = max(len(payload) // max(every_n, 1), 1)
                for k in range(min(max_frames, max(len(payload) // step, 1))):
                    ids.append(int(mid))
                    idxs.append(k)
                    frames.append(bytes(payload[k * step:(k + 1) * step]))
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": pd.Series(frames, dtype=object)})

    return df.select(id_col, bin_col).mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("thumb", T.BinaryType()),
])


def resize_images(df: DataFrame, *, id_col: str = "media_id",
                  bin_col: str = "payload", max_side: int = 64,
                  deterministic_fake: bool = False) -> DataFrame:
    """image binary -> (media_id, width, height, thumb) resized to fit
    ``max_side``. STUB decode/re-encode (no codec libs in this
    environment); the deterministic fake derives pseudo-dimensions from
    the payload hash, scales them with the exact fit-inside arithmetic
    a real resize would use, and emits a truncated payload as the
    thumbnail bytes — so batch shape, schema and the scaling math are
    real and tested while only the pixel work is faked."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image resize requires codec libraries unavailable in this "
            "environment; pass deterministic_fake=True to exercise the "
            "pipeline")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, thumbs = [], [], []
            for payload in pdf[bin_col]:
                payload = payload or b""
                # pseudo-dimensions from content (stable across runs)
                w0 = 64 + (sum(payload[:16]) % 1024)
                h0 = 64 + (sum(payload[16:32]) % 1024)
                scale = min(1.0, max_side / max(w0, h0))
                w, h = max(1, int(w0 * scale)), max(1, int(h0 * scale))
                ws.append(w)
                hs.append(h)
                thumbs.append(bytes(payload[: w * h // 8 or 1]))
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "width": pd.Series(ws, dtype="int32"),
                "height": pd.Series(hs, dtype="int32"),
                "thumb": pd.Series(thumbs, dtype=object)})

    return (df.select(id_col, bin_col)
            .mapInPandas(batches, RESIZED_SCHEMA))


def media_metadata_rules():
    """Validation rule-set for the media metadata struct — plain
    zoi_spark schema, so media tables run through the same validator."""
    import zoi_spark as z

    return z.fields({
        "mime": z.string().regex(r"^(image|audio|video)/[a-z0-9.+-]+$"),
        "width": z.integer(gte=1).optional(),
        "height": z.integer(gte=1).optional(),
        "duration_ms": z.integer(gte=0).optional(),
        "codec": z.string().optional(),
    })


def binary_stats(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Presence/size stats for a binary column — expression-only, one
    fused agg like tablechecks.column_stats."""
    c = F.col(bin_col)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(c.isNull().cast("long")).alias("n_null"),
        F.min(F.length(c)).alias("min_bytes"),
        F.max(F.length(c)).alias("max_bytes"),
        F.round(F.avg(F.length(c)), 2).alias("avg_bytes"),
    )
