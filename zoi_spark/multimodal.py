"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, partition-friendly batch
shapes, Arrow-vectorized UDF signatures over ``mapInPandas`` — and the
image decode path is REAL for uncompressed BMP (BI_RGB 24/32-bit),
parsed with pure numpy (no codec library needed): feature extraction
and resize run on actual pixel data. Compressed formats (JPEG/PNG/
video) still require codec libraries absent from this environment:
those raise ``NotImplementedError`` unless ``deterministic_fake=True``,
which produces seeded fake features so the pipeline (including tests
and plans) is fully exercisable.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# pure-numpy BMP codec (uncompressed BI_RGB, 24/32-bit)
# ---------------------------------------------------------------------------

def is_bmp(payload: bytes | None) -> bool:
    return bool(payload) and len(payload) >= 54 and payload[:2] == b"BM"


def decode_bmp(payload: bytes) -> "np.ndarray":
    """BMP bytes → (H, W, 3) uint8 RGB array. Supports the uncompressed
    BI_RGB 24- and 32-bit variants (the only forms decodable without a
    codec library); raises ValueError on anything else. Handles both
    bottom-up (positive height) and top-down (negative height) rows and
    the 4-byte row padding."""
    if not is_bmp(payload):
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression})"
            " — compressed forms need a codec library")
    top_down = height < 0
    height = abs(height)
    stride = ((bpp * width + 31) // 32) * 4
    nbytes = stride * height
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=nbytes, offset=data_offset)
    rows = raw.reshape(height, stride)
    ch = bpp // 8
    px = rows[:, : width * ch].reshape(height, width, ch)
    if not top_down:
        px = px[::-1]
    # BMP stores BGR(A) — reorder to RGB, drop alpha
    return px[:, :, 2::-1].copy()


def encode_bmp(arr: "np.ndarray") -> bytes:
    """(H, W, 3) uint8 RGB array → 24-bit bottom-up BI_RGB BMP bytes —
    the inverse of :func:`decode_bmp` (round-trips exactly)."""
    h, w, _ = arr.shape
    stride = ((24 * w + 31) // 32) * 4
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                      2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    return header + dib + rows.tobytes()

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


def _bmp_feature(px: "np.ndarray", dim: int) -> list[float]:
    """Real content features from decoded pixels: per-channel means and
    stds, gray min/max — first ``dim`` of the 8, zero-padded beyond."""
    f64 = px.astype(np.float64)
    gray = f64.mean(axis=2)
    feats = [*f64.mean(axis=(0, 1)), *f64.std(axis=(0, 1)),
             float(gray.min()), float(gray.max())]
    feats = feats[:dim] + [0.0] * max(0, dim - len(feats))
    return [round(float(v), 6) for v in feats]


def decode_image_features(df: DataFrame, *, id_col: str = "media_id",
                          bin_col: str = "payload", dim: int = 8,
                          deterministic_fake: bool = False) -> DataFrame:
    """media binary → (media_id, width, height, n_bytes, feature).

    REAL decode for uncompressed BMP payloads (pure-numpy
    :func:`decode_bmp` inside the Arrow batch — true dimensions +
    pixel-statistic features). Compressed formats (JPEG/PNG) need a
    codec library absent here: with ``deterministic_fake=True`` they
    get seeded byte-statistic features; otherwise they raise
    ``NotImplementedError``.
    """

    def one(payload: bytes | None) -> tuple:
        if payload is None:
            return 0, 0, 0, [0.0] * dim
        if is_bmp(payload):
            px = decode_bmp(payload)
            h, w = px.shape[:2]
            return w, h, len(payload), _bmp_feature(px, dim)
        if deterministic_fake:
            return ((len(payload) % 1920) + 1, (len(payload) % 1080) + 1,
                    len(payload), _fake_feature(payload, dim))
        raise NotImplementedError(
            "non-BMP image decode requires a codec library not present "
            "in this environment; pass deterministic_fake=True to "
            "exercise the pipeline with seeded features")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [one(b) for b in pdf[bin_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "width": pd.Series([d[0] for d in decoded], dtype="int32"),
                "height": pd.Series([d[1] for d in decoded], dtype="int32"),
                "n_bytes": pd.Series([d[2] for d in decoded], dtype="int64"),
                "feature": pd.Series([d[3] for d in decoded], dtype=object),
            })

    return (df.select(id_col, bin_col)
            .mapInPandas(batches, IMAGE_FEATURES_SCHEMA))


def sample_frames(df: DataFrame, *, id_col: str = "media_id",
                  bin_col: str = "payload", every_n: int = 10,
                  max_frames: int = 4,
                  deterministic_fake: bool = False) -> DataFrame:
    """video binary → exploded (media_id, frame_idx, frame) rows.

    REAL for uncompressed Y4M payloads (pure-python
    :func:`decode_y4m`): every ``every_n``-th frame up to
    ``max_frames``, ``frame_idx`` = the SOURCE frame number, ``frame``
    = the raw 4:2:0 planar YUV bytes (decodable downstream). Compressed
    containers (mp4/webm) need codec libraries absent here; with
    ``deterministic_fake=True`` they get payload-slice pseudo-frames,
    otherwise they raise."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[bin_col]):
                if payload is None:
                    continue
                if is_y4m(payload):
                    _w, _h, _fps, fl = decode_y4m(bytes(payload))
                    taken = 0
                    for j in range(0, len(fl), max(every_n, 1)):
                        if taken >= max_frames:
                            break
                        ids.append(int(mid))
                        idxs.append(j)
                        frames.append(fl[j])
                        taken += 1
                    continue
                if not deterministic_fake:
                    raise NotImplementedError(
                        "non-Y4M video decode requires a codec library "
                        "not present in this environment; pass "
                        "deterministic_fake=True")
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
    ``max_side``.

    REAL for BMP payloads: decode → nearest-neighbor downscale (numpy
    index sampling) → re-encode as 24-bit BMP, all pure numpy — the
    thumb is a decodable image. Non-BMP formats need codec libraries
    absent here; with ``deterministic_fake=True`` they get
    pseudo-dimensions from content bytes with the same fit-inside
    arithmetic and a truncated payload as the thumb."""

    def one(payload: bytes | None) -> tuple:
        payload = payload or b""
        if is_bmp(payload):
            px = decode_bmp(payload)
            h0, w0 = px.shape[:2]
            scale = min(1.0, max_side / max(w0, h0, 1))
            w, h = max(1, int(w0 * scale)), max(1, int(h0 * scale))
            yi = (np.arange(h) * (h0 / h)).astype(np.int64)
            xi = (np.arange(w) * (w0 / w)).astype(np.int64)
            return w, h, encode_bmp(px[yi][:, xi])
        if not deterministic_fake:
            raise NotImplementedError(
                "non-BMP image resize requires codec libraries "
                "unavailable in this environment; pass "
                "deterministic_fake=True to exercise the pipeline")
        # pseudo-dimensions from content (stable across runs)
        w0 = 64 + (sum(payload[:16]) % 1024)
        h0 = 64 + (sum(payload[16:32]) % 1024)
        scale = min(1.0, max_side / max(w0, h0))
        w, h = max(1, int(w0 * scale)), max(1, int(h0 * scale))
        return w, h, bytes(payload[: w * h // 8 or 1])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            res = [one(b) for b in pdf[bin_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "width": pd.Series([r[0] for r in res], dtype="int32"),
                "height": pd.Series([r[1] for r in res], dtype="int32"),
                "thumb": pd.Series([r[2] for r in res], dtype=object)})

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


# ---------------------------------------------------------------------------
# pure-numpy WAV codec (RIFF PCM 16-bit) — the audio analogue of the
# BMP path: uncompressed containers decode with no codec library
# ---------------------------------------------------------------------------

def is_wav(payload: bytes | None) -> bool:
    return (bool(payload) and len(payload) >= 44
            and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE")


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """WAV bytes → (sample_rate, (n_frames, n_channels) int16 array).
    Supports uncompressed PCM 16-bit (format tag 1); raises ValueError
    on compressed/float variants (those need codec libraries). Walks
    the RIFF chunk list properly — extra chunks (LIST/fact/cue) before
    `data` are skipped, as real-world files carry them."""
    if not is_wav(payload):
        raise ValueError("not a WAV payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
            if fmt is not None:
                break
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV variant (format={audio_format}, bits={bits})"
            " — compressed/float forms need a codec library")
    samples = np.frombuffer(data, dtype="<i2")
    frames = samples.size // max(n_channels, 1)
    return sample_rate, samples[: frames * n_channels].reshape(
        frames, n_channels)


def encode_wav(samples: "np.ndarray", sample_rate: int) -> bytes:
    """(n_frames, n_channels) int16 array → PCM-16 WAV bytes — the
    inverse of :func:`decode_wav` (round-trips exactly)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    data = samples.astype("<i2").tobytes()
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("duration_ms", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.IntegerType()),
    T.StructField("zero_cross_rate", T.DoubleType()),
])


def decode_audio_features(df: DataFrame, *, id_col: str = "media_id",
                          bin_col: str = "payload",
                          deterministic_fake: bool = False) -> DataFrame:
    """audio binary → (media_id, sample_rate, n_frames, duration_ms,
    rms, peak, zero_cross_rate). REAL decode for PCM-16 WAV payloads
    (pure numpy inside the Arrow batch; multi-channel audio is mixed
    down by per-frame mean before the stats). Compressed formats
    (mp3/ogg/aac) need codec libraries absent here: with
    ``deterministic_fake=True`` they get byte-statistic stand-ins,
    otherwise they raise."""

    def one(payload: bytes | None) -> tuple:
        if payload is None:
            return 0, 0, 0.0, 0.0, 0, 0.0
        if is_wav(payload):
            rate, frames = decode_wav(payload)
            mono = frames.astype(np.float64).mean(axis=1)
            nf = mono.size
            dur = round(1000.0 * nf / rate, 6) if rate else 0.0
            rms = round(float(np.sqrt(np.mean(mono ** 2))), 6) if nf else 0.0
            peak = int(np.abs(frames).max()) if frames.size else 0
            zc = (round(float(np.mean(np.signbit(mono[1:])
                                      != np.signbit(mono[:-1]))), 6)
                  if nf > 1 else 0.0)
            return rate, nf, dur, rms, peak, zc
        if deterministic_fake:
            n = len(payload)
            return (8000, n, round(1000.0 * n / 8000, 6),
                    round(float(sum(payload[:256]) % 997), 6),
                    int(max(payload[:256] or b"\0")), 0.0)
        raise NotImplementedError(
            "non-WAV audio decode requires a codec library not present "
            "in this environment; pass deterministic_fake=True")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [one(b) for b in pdf[bin_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "sample_rate": pd.Series([r[0] for r in rows], dtype="int32"),
                "n_frames": pd.Series([r[1] for r in rows], dtype="int64"),
                "duration_ms": pd.Series([r[2] for r in rows],
                                         dtype="float64"),
                "rms": pd.Series([r[3] for r in rows], dtype="float64"),
                "peak": pd.Series([r[4] for r in rows], dtype="int32"),
                "zero_cross_rate": pd.Series([r[5] for r in rows],
                                             dtype="float64"),
            })

    return (df.select(id_col, bin_col)
            .mapInPandas(batches, AUDIO_FEATURES_SCHEMA))


# ---------------------------------------------------------------------------
# pure-numpy Y4M codec (YUV4MPEG2, C420) — the video analogue of the
# BMP/WAV paths: uncompressed frames decode with no codec library
# ---------------------------------------------------------------------------

def is_y4m(payload: bytes | None) -> bool:
    return bool(payload) and payload[:9] == b"YUV4MPEG2"


def decode_y4m(payload: bytes) -> tuple[int, int, tuple[int, int],
                                        list[bytes]]:
    """Y4M bytes → (width, height, (fps_num, fps_den), [frame bytes]).
    Frames are raw 4:2:0 planar YUV (w·h luma + 2·(w/2·h/2) chroma
    bytes). Only C420 variants are supported — anything else raises
    (other samplings are rare in the wild and would silently skew the
    byte math)."""
    if not is_y4m(payload):
        raise ValueError("not a Y4M payload")
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "replace").split(" ")
    w = h = 0
    fps = (25, 1)
    for tok in header[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("F"):
            a, b = tok[1:].split(":")
            fps = (int(a), int(b))
        elif tok.startswith("C") and not tok[1:].startswith("420"):
            raise ValueError(f"unsupported Y4M chroma sampling {tok!r}")
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    frame_size = w * h + 2 * ((w // 2) * (h // 2))
    frames: list[bytes] = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame marker")
        start = fl + 1
        frames.append(payload[start:start + frame_size])
        pos = start + frame_size
    return w, h, fps, frames


def encode_y4m(frames: list["np.ndarray"], *, fps: tuple[int, int] = (25, 1)
               ) -> bytes:
    """[(H, W) uint8 luma planes] → Y4M bytes with neutral (128)
    chroma — the inverse of :func:`decode_y4m` for the luma plane."""
    h, w = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A0:0 C420jpeg\n"
           .encode("ascii")]
    chroma = bytes([128]) * (2 * (w // 2) * (h // 2))
    for f in frames:
        out.append(b"FRAME\n" + f.astype(np.uint8).tobytes() + chroma)
    return b"".join(out)


DHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("dhash", T.LongType()),
])


def dhash_bmp(px: "np.ndarray") -> int:
    """Difference hash (dHash) of a decoded RGB array: nearest-neighbor
    sample onto a 9×8 grayscale grid (integer index grid — no
    interpolation, so the value is exactly reproducible anywhere),
    then one bit per horizontal neighbor pair (bit r*8+c set iff
    g[r,c] > g[r,c+1]). Returned as a SIGNED 64-bit int (Spark long) —
    compare with hamming distance for near-dup images."""
    h, w = px.shape[:2]
    rows = (np.arange(8, dtype=np.int64) * h) // 8
    cols = (np.arange(9, dtype=np.int64) * w) // 9
    gray = px.astype(np.float64).mean(axis=2)[np.ix_(rows, cols)]
    bits = gray[:, :-1] > gray[:, 1:]
    val = 0
    for i, b in enumerate(bits.flatten()):
        if b:
            val |= 1 << i
    # wrap to signed 64-bit (Spark LongType)
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def image_dhash(df: DataFrame, *, id_col: str = "media_id",
                bin_col: str = "payload") -> DataFrame:
    """media binary → (media_id, width, height, dhash): perceptual
    near-dup hashing for the image modality — the image-side analogue
    of text SimHash (group or hamming-join on ``dhash`` exactly like
    simhash_pairs; resized/re-encoded copies of one image collide).
    REAL decode for uncompressed BMPs (pure numpy); compressed formats
    raise ``NotImplementedError`` like the rest of the decode family.
    Arrow-batched mapInPandas, no JVM round-trips per row."""

    def one(payload: bytes | None) -> tuple:
        if payload is None:
            return 0, 0, 0
        if is_bmp(payload):
            px = decode_bmp(payload)
            h, w = px.shape[:2]
            return w, h, dhash_bmp(px)
        raise NotImplementedError(
            "non-BMP image decode requires a codec library not present "
            "in this environment")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [one(b) for b in pdf[bin_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "width": pd.Series([d[0] for d in decoded],
                                   dtype="int32"),
                "height": pd.Series([d[1] for d in decoded],
                                    dtype="int32"),
                "dhash": pd.Series([d[2] for d in decoded],
                                   dtype="int64"),
            })

    return (df.select(id_col, bin_col)
            .mapInPandas(batches, DHASH_SCHEMA))


SCENE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("n_cuts", T.IntegerType()),
    T.StructField("max_diff", T.DoubleType()),
])


def scene_cuts(df: DataFrame, *, id_col: str = "media_id",
               bin_col: str = "payload",
               threshold: float = 30.0) -> DataFrame:
    """Video scene-cut detection: mean absolute luma difference between
    consecutive frames; a difference above *threshold* (0-255 scale) is
    a cut. The shot-boundary pass a video curation pipeline runs before
    frame sampling (sample one frame per SCENE, not per fixed stride).
    Output: (media_id, n_frames, n_cuts, max_diff round 6). REAL for
    uncompressed Y4M (pure-python decode, luma plane only); compressed
    codecs raise ``NotImplementedError`` like the rest of the decode
    family; NULL payloads → zeros.

    Arrow-batched mapInPandas over the binary column — each payload is
    decoded once per partition, frames never leave the worker."""
    import numpy as np

    thr = float(threshold)

    def one(payload: bytes | None) -> tuple:
        if payload is None:
            return 0, 0, 0.0
        if is_y4m(bytes(payload)):
            w, h, _fps, frames = decode_y4m(bytes(payload))
            lumas = [np.frombuffer(f[:w * h], dtype=np.uint8)
                     .astype(np.int64) for f in frames]
            cuts, mx = 0, 0.0
            for a, b in zip(lumas, lumas[1:]):
                d = float(np.abs(a - b).mean())
                mx = max(mx, d)
                if d > thr:
                    cuts += 1
            return len(frames), cuts, round(mx, 6)
        raise NotImplementedError(
            "non-Y4M video decode requires a codec library not present "
            "in this environment")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            d = [one(b) for b in pdf[bin_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "n_frames": pd.Series([x[0] for x in d], dtype="int32"),
                "n_cuts": pd.Series([x[1] for x in d], dtype="int32"),
                "max_diff": pd.Series([x[2] for x in d],
                                      dtype="float64"),
            })

    return df.select(id_col, bin_col).mapInPandas(batches, SCENE_SCHEMA)


SILENCE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("silence_ratio", T.DoubleType()),
    T.StructField("longest_silence", T.IntegerType()),
])


def audio_silence(df: DataFrame, *, id_col: str = "media_id",
                  bin_col: str = "payload",
                  threshold: int = 256) -> DataFrame:
    """Silence profiling for the audio modality: the fraction of frames
    whose mixed-down absolute amplitude is ≤ *threshold* (int16 scale)
    and the longest consecutive silent run — the pre-filter that drops
    dead-air recordings and trims lead-in/lead-out before expensive
    transcription. REAL for PCM-16 WAV (pure numpy, per-frame mean
    mixdown like decode_audio_features); compressed formats raise;
    NULL payloads → zeros. Output: (media_id, n_frames, silence_ratio
    round 6, longest_silence)."""
    import numpy as np

    thr = float(threshold)

    def one(payload: bytes | None) -> tuple:
        if payload is None:
            return 0, 0.0, 0
        if is_wav(bytes(payload)):
            _rate, frames = decode_wav(bytes(payload))
            mono = frames.astype(np.float64).mean(axis=1)
            n = mono.size
            if n == 0:
                return 0, 0.0, 0
            silent = np.abs(mono) <= thr
            ratio = round(float(silent.mean()), 6)
            # vectorized run-length: boundaries of silent stretches via
            # diff over a 0-padded int mask — a Python per-sample loop
            # would dominate the decode on hour-long payloads
            edges = np.diff(np.concatenate(
                ([0], silent.astype(np.int8), [0])))
            starts = np.flatnonzero(edges == 1)
            ends = np.flatnonzero(edges == -1)
            longest = int((ends - starts).max()) if starts.size else 0
            return n, ratio, longest
        raise NotImplementedError(
            "non-WAV audio decode requires a codec library not present "
            "in this environment")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            d = [one(b) for b in pdf[bin_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "n_frames": pd.Series([x[0] for x in d], dtype="int32"),
                "silence_ratio": pd.Series([x[1] for x in d],
                                           dtype="float64"),
                "longest_silence": pd.Series([x[2] for x in d],
                                             dtype="int32"),
            })

    return (df.select(id_col, bin_col)
            .mapInPandas(batches, SILENCE_SCHEMA))
