"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

Two tiers of kernel:

- **Real kernels** for the dependency-free PPM (P6) image format —
  ``decode_ppm_images`` / ``resize_ppm_images`` genuinely parse,
  resample and re-encode pixels with numpy alone.
- **Stub kernels** for codec-library formats (JPEG/PNG/MP4 decode,
  audio resampling) — gated behind ``_require_codec`` with
  deterministic fakes so the Spark-side plumbing (schema, Arrow batch
  shape, partitioning, UDF signatures) is real and tested. Swapping in
  Pillow/torchaudio/av later changes only the kernel body, not the
  plan.

Scale: every op is ``mapInPandas`` (Arrow-batched, zero-copy binary) so
a 100 TB media corpus streams through executors batch-by-batch without
row-at-a-time Python overhead; metadata extraction is pure column expr.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("content", T.BinaryType(), True),       # opaque payload
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

HAVE_IMAGE_CODEC = False  # flipped when a real codec lib is available
_FAKE = True


def _require_codec(op: str) -> None:
    if not HAVE_IMAGE_CODEC and not _FAKE:
        raise NotImplementedError(
            f"{op}: real media codecs are not installed in this environment; "
            "deterministic fake kernels are used instead (set _FAKE=False to fail hard)"
        )


def binary_metadata(content: Column) -> Column:
    """Cheap metadata without decoding: byte length + md5 — pure exprs."""
    return F.struct(
        F.length(content).alias("n_bytes"),
        F.md5(content).alias("content_md5"),
    )


def decode_image_features(df: DataFrame, *, content_col: str = "content",
                          id_col: str = "media_id", feat_dim: int = 8) -> DataFrame:
    """Decode + featurize images → (media_id, feature array<double>).

    STUB KERNEL: features are a deterministic fold of payload bytes (so
    tests assert exact values); a real build decodes and runs a vision
    embedding here. The mapInPandas plumbing — Arrow batches in, fixed
    schema out — is the production shape.
    """
    _require_codec("decode_image_features")
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for raw in pdf[content_col]:
                buf = bytes(raw) if raw is not None else b""
                acc = [0] * feat_dim
                for i, byte in enumerate(buf):
                    acc[i % feat_dim] = (acc[i % feat_dim] + byte) % 256
                feats.append([v / 255.0 for v in acc])
            yield pd.DataFrame({"media_id": pdf[id_col], "feature": feats})

    return df.select(id_col, content_col).mapInPandas(kernel, out_schema)


def resize_images(df: DataFrame, *, width: int, height: int,
                  content_col: str = "content") -> DataFrame:
    """Resize stub: passes bytes through, rewrites width/height metadata.
    Real kernel would re-encode; plumbing (schema-preserving mapInPandas)
    is identical."""
    _require_codec("resize_images")
    schema = df.schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            if "width" in pdf:
                pdf["width"] = width
            if "height" in pdf:
                pdf["height"] = height
            yield pdf

    return df.mapInPandas(kernel, schema)


def sample_video_frames(df: DataFrame, *, every_ms: int = 1000,
                        id_col: str = "media_id",
                        duration_col: str = "duration_ms") -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame timestamp.

    The *sampling schedule* is exact column math (explode a sequence) —
    only the frame *pixel extraction* is stubbed (frame_md5 fakes it from
    payload md5 + offset). At scale the explode happens map-side.
    """
    _require_codec("sample_video_frames")
    n = (F.col(duration_col) / F.lit(every_ms)).cast("long")
    return (
        df.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))))
        .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms))
        .withColumn("frame_md5", F.md5(F.concat(F.md5(F.col("content")),
                                                F.lit(":"), F.col("frame_idx").cast("string"))))
        .select(id_col, "frame_idx", "frame_ts_ms", "frame_md5")
    )


# ------------------------------------------------------- real PPM kernels
#
# PPM (P6) is a header + raw RGB bytes — decodable with numpy alone, so
# for this format the decode / resize / featurize kernels are REAL, not
# stubs: they parse pixels, resample them, and re-encode. Codec-library
# formats (JPEG/PNG/MP4) remain behind the stub kernels above until a
# codec lib is present; the Arrow plumbing is identical either way.

PPM_MAGIC = b"P6"


def encode_ppm(arr) -> bytes:
    """(H, W, 3) uint8 array → P6 bytes."""
    import numpy as np

    a = np.asarray(arr, dtype="uint8")
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(data: bytes):
    """P6 bytes → (H, W, 3) uint8 array; None for non-PPM payloads.

    Malformed payloads that pass the magic check (truncated pixel data,
    garbage header tokens) also return None — one corrupt blob in a
    mixed corpus must degrade to a NULL row, never fail the task."""
    import numpy as np

    if data is None or not bytes(data).startswith(PPM_MAGIC):
        return None
    buf = bytes(data)
    try:
        # header = magic, width, height, maxval — whitespace separated,
        # with optional '#' comment lines
        tokens: list[bytes] = []
        i = 2
        while len(tokens) < 3 and i < len(buf):
            while i < len(buf) and buf[i:i + 1].isspace():
                i += 1
            if buf[i:i + 1] == b"#":
                while i < len(buf) and buf[i:i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(buf) and not buf[j:j + 1].isspace():
                j += 1
            tokens.append(buf[i:j])
            i = j
        i += 1  # single whitespace after maxval
        w, h, maxval = (int(t) for t in tokens)
        if maxval != 255 or w <= 0 or h <= 0:
            return None  # 16-bit PPM out of scope
        pixels = np.frombuffer(buf, dtype="uint8", offset=i, count=h * w * 3)
        return pixels.reshape(h, w, 3)
    except ValueError:  # truncated pixels, non-numeric header, short buffer
        return None


def _resize_nearest(arr, width: int, height: int):
    import numpy as np

    h, w, _ = arr.shape
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return arr[np.ix_(yi, xi)]


def decode_ppm_images(df: DataFrame, *, content_col: str = "content",
                      id_col: str = "media_id") -> DataFrame:
    """REAL decode: parse P6 payloads → dimensions + per-channel means
    (the simplest true image feature). Non-PPM payloads yield NULLs so
    mixed corpora pass through without poisoning the batch."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[str, list] = {k.name: [] for k in out_schema.fields}
        for pdf in batches:
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                arr = decode_ppm(raw)
                rows["media_id"].append(mid)
                if arr is None:
                    for k in ("width", "height", "mean_r", "mean_g", "mean_b"):
                        rows[k].append(None)
                else:
                    rows["width"].append(arr.shape[1])
                    rows["height"].append(arr.shape[0])
                    means = arr.reshape(-1, 3).mean(axis=0)
                    rows["mean_r"].append(round(float(means[0]), 6))
                    rows["mean_g"].append(round(float(means[1]), 6))
                    rows["mean_b"].append(round(float(means[2]), 6))
            yield pd.DataFrame(rows)
            rows = {k.name: [] for k in out_schema.fields}

    return df.select(id_col, content_col).mapInPandas(kernel, out_schema)


def resize_ppm_images(df: DataFrame, *, width: int, height: int,
                      content_col: str = "content") -> DataFrame:
    """REAL resize: nearest-neighbor resample of P6 payloads, re-encoded
    as P6, metadata rewritten. Non-PPM payloads pass through untouched."""
    schema = df.schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            new_content = []
            resized = []
            for raw in pdf[content_col]:
                arr = decode_ppm(raw)
                if arr is None:
                    new_content.append(raw)
                    resized.append(False)
                else:
                    new_content.append(encode_ppm(_resize_nearest(arr, width, height)))
                    resized.append(True)
            pdf[content_col] = new_content
            if "width" in pdf:
                pdf.loc[resized, "width"] = width
            if "height" in pdf:
                pdf.loc[resized, "height"] = height
            yield pdf

    return df.mapInPandas(kernel, schema)


# ------------------------------------------------------- real WAV kernels
#
# WAV (RIFF PCM) is the dependency-free audio format: a chunked header
# + raw int16 samples, parseable with numpy alone — so the audio
# decode/stats kernel is REAL too (compressed formats stay stubbed).

def encode_wav(samples, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """int16 sample array → RIFF/WAVE PCM bytes."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(s)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(s)) + s)


def decode_wav(data: bytes):
    """RIFF/WAVE PCM bytes → (sample_rate, channels, int16 array) or
    None for non-WAV / non-PCM payloads. Walks the chunk list properly
    (fmt/data may be preceded by LIST/INFO chunks in real files)."""
    import struct

    import numpy as np

    if data is None:
        return None
    buf = bytes(data)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    try:
        i = 12
        rate = channels = None
        samples = None
        while i + 8 <= len(buf):
            cid = buf[i:i + 4]
            size = struct.unpack("<I", buf[i + 4:i + 8])[0]
            body = buf[i + 8:i + 8 + size]
            if cid == b"fmt ":
                audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
                if audio_fmt != 1:  # non-PCM out of scope
                    return None
            elif cid == b"data":
                samples = np.frombuffer(body, dtype="<i2")
            i += 8 + size + (size & 1)  # chunks are word-aligned
        if rate is None or not rate or not channels or samples is None:
            return None
        return rate, channels, samples
    except (ValueError, struct.error):  # short fmt chunk, odd data chunk
        return None


def decode_wav_audio(df: DataFrame, *, content_col: str = "content",
                     id_col: str = "media_id") -> DataFrame:
    """REAL audio decode: parse RIFF PCM payloads → sample stats. The
    mean-square power is reported instead of RMS so the value stays an
    exact rational (sqrt differs in the last ulp across engines — the
    correctness harness cross-checks this column bit-for-bit)."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("mean_square", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in out_schema.fields}
            for mid, raw in zip(pdf[id_col], pdf[content_col]):
                parsed = decode_wav(raw)
                rows["media_id"].append(mid)
                if parsed is None:
                    for k in ("sample_rate", "n_samples", "duration_ms",
                              "mean_square", "peak"):
                        rows[k].append(None)
                else:
                    # n_samples counts interleaved samples (frames ×
                    # channels); duration is frame-based, so a stereo
                    # clip is NOT reported twice as long.
                    rate, channels, s = parsed
                    rows["sample_rate"].append(rate)
                    rows["n_samples"].append(len(s))
                    rows["duration_ms"].append(
                        round(len(s) * 1000.0 / (rate * channels), 6))
                    sq = s.astype("int64") ** 2
                    rows["mean_square"].append(
                        round(float(sq.mean()), 6) if len(s) else None)
                    rows["peak"].append(
                        int(np.abs(s.astype("int64")).max()) if len(s) else None)
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(kernel, out_schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: fake a media corpus from the documents table (text bytes as
    payload) so multimodal plumbing has a deterministic fixture."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )
