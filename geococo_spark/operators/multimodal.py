"""Multimodal binary-column operators (driver brief): treat image/audio/
video as opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample as Arrow-batched kernels over
``mapInPandas``.

The Spark-side plumbing (schemas, batch shapes, partition-size control)
is real and tested. The *codec arithmetic* runs on the engine's
deterministic formats (kernels/codec.py); real cv2/PIL/ffmpeg codecs are
gated behind try-imports there and raise a clearly-marked
NotImplementedError when absent, per the driver's stub instruction.

Batch sizing: these operators stream Arrow batches of RAW payload rows,
so per-task memory ~= maxRecordsPerBatch x payload size. Spark 4.1 has
no byte-based Arrow bound for mapInPandas (``maxBytesPerBatch`` exists
but applies only to transformWithState — probed in the worker source),
and the records conf is read at ACTION time, so a per-plan override is
impossible. The session default (1024 rows, session.py) suits <=1 MB
payloads; for multi-MB rasters or media wrap the ACTION in
:func:`bounded_arrow_batches`, which sizes rows-per-batch from an
expected-bytes-per-row hint and restores the session conf afterwards
(ADVICE r02 — the flat 1024 default was a multi-GB batch risk).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from geococo_spark.kernels import codec


def arrow_rows_for_payload(
    payload_bytes: int, target_batch_bytes: int = 64 << 20, lo: int = 8, hi: int = 1024
) -> int:
    """Rows per Arrow batch such that rows x payload ~= target bytes,
    clamped to [lo, hi] (tiny batches thrash per-batch overhead;
    huge ones re-open the OOM risk the bound exists to close)."""
    if payload_bytes <= 0:
        return hi
    return max(lo, min(hi, target_batch_bytes // payload_bytes))


@contextmanager
def bounded_arrow_batches(spark, payload_bytes: int, target_batch_bytes: int = 64 << 20):
    """Scope ``maxRecordsPerBatch`` to a fat-payload ACTION so per-task
    Arrow batch memory stays ~= ``target_batch_bytes`` regardless of row
    width, then restore the session default.

    Session-scoped by necessity (the conf is read when the action runs,
    not when the plan is built); a concurrent query in the same session
    momentarily sees the smaller batch size too — the safe direction.

    Usage::

        with bounded_arrow_batches(spark, payload_bytes=8 << 20):
            extract_image_features(rasters).write.parquet(out)
    """
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    try:
        old = spark.conf.get(key)
    except Exception:
        old = None
    spark.conf.set(key, str(arrow_rows_for_payload(payload_bytes, target_batch_bytes)))
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


IMAGE_FEATURES = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bands", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("mean_px", DoubleType(), True),
        StructField("std_px", DoubleType(), True),
        StructField("phash", LongType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def extract_image_features(df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes") -> DataFrame:
    """Decode + feature-extract per image (mean/std/phash) in one Arrow
    pass; decode failures are captured per-row, never task-fatal."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, raw in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    arr = codec.decode_image(bytes(raw))
                    rows.append(
                        {
                            "image_id": str(iid),
                            "bands": int(arr.shape[0]),
                            "height": int(arr.shape[1]),
                            "width": int(arr.shape[2]),
                            "mean_px": round(float(arr.mean()), 6),
                            "std_px": round(float(arr.std()), 6),
                            "phash": codec.phash64(arr),
                            "decode_error": None,
                        }
                    )
                except Exception as exc:  # F6 analog: decode-failure row
                    rows.append(
                        {
                            "image_id": str(iid),
                            "bands": None, "height": None, "width": None,
                            "mean_px": None, "std_px": None, "phash": None,
                            "decode_error": f"{type(exc).__name__}: {exc}"[:200],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES.fields])

    return df.select(id_col, bytes_col).mapInPandas(_extract, IMAGE_FEATURES)


RESIZED = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("height", IntegerType(), True),
        StructField("width", IntegerType(), True),
    ]
)


def resize_images(
    df: DataFrame, out_h: int, out_w: int, id_col: str = "image_id", bytes_col: str = "bytes",
    fmt: str = "raw",
) -> DataFrame:
    """Nearest-neighbor resize (pure numpy index sampling — deterministic)
    re-encoded to ``fmt``. Real interpolation would drop into the same
    kernel via cv2 when available."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, raw in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    arr = codec.decode_image(bytes(raw))
                    b, h, w = arr.shape
                    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                    small = arr[:, ys[:, None], xs[None, :]]
                    rows.append(
                        {
                            "image_id": str(iid),
                            "bytes": codec.encode_image(np.ascontiguousarray(small), fmt),
                            "height": out_h,
                            "width": out_w,
                        }
                    )
                except Exception:
                    rows.append({"image_id": str(iid), "bytes": None, "height": None, "width": None})
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED.fields])

    return df.select(id_col, bytes_col).mapInPandas(_resize, RESIZED)


AUDIO_FEATURES = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("zero_crossings", LongType(), True),
        StructField("dominant_freq_hz", DoubleType(), True),
        StructField("decode_error", StringType(), True),
    ]
)


def extract_audio_features(
    df: DataFrame, id_col: str = "media_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Audio-modality analog of extract_image_features: decode engine-PCM
    binaries and compute duration / RMS / zero-crossing rate / dominant
    frequency (numpy rFFT) in one Arrow pass; decode failures are
    captured per-row (F6 pattern), never task-fatal."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    samples, sr = codec.decode_audio(bytes(raw))
                    mono = samples.astype(np.float64).mean(axis=0)
                    n = mono.shape[0]
                    if n:
                        spec = np.abs(np.fft.rfft(mono))
                        spec[0] = 0.0  # ignore DC
                        dom = float(np.argmax(spec)) * sr / n
                    else:  # valid zero-sample clip is data, not an error
                        dom = 0.0
                    rows.append(
                        {
                            "media_id": str(mid),
                            "sample_rate": int(sr),
                            "channels": int(samples.shape[0]),
                            "n_samples": int(n),
                            "duration_s": round(n / sr, 6),
                            "rms": round(float(np.sqrt(np.mean(mono**2))), 6),
                            "zero_crossings": int(np.count_nonzero(np.diff(np.signbit(mono)))),
                            "dominant_freq_hz": round(dom, 3),
                            "decode_error": None,
                        }
                    )
                except Exception as exc:
                    rows.append(
                        {
                            "media_id": str(mid),
                            "sample_rate": None, "channels": None, "n_samples": None,
                            "duration_s": None, "rms": None, "zero_crossings": None,
                            "dominant_freq_hz": None,
                            "decode_error": f"{type(exc).__name__}: {exc}"[:200],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES.fields])

    return df.select(id_col, bytes_col).mapInPandas(_extract, AUDIO_FEATURES)


FRAMES = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_bytes", BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame, every_n: int = 10, id_col: str = "media_id", bytes_col: str = "bytes"
) -> DataFrame:
    """Frame sampling for video-shaped binaries.

    STUB decode: a real container demuxer (ffmpeg) is unavailable here —
    the engine treats the binary as a stack of engine-format frames
    (bands = frames for the fake container). The mapInPandas plumbing
    (explode one row -> many frame rows, batch-bounded memory) is the
    real, tested part.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    arr = codec.decode_image(bytes(raw))  # (frames, h, w)
                except NotImplementedError:
                    raise NotImplementedError(
                        "STUB: real video demux requires ffmpeg (absent); "
                        "engine-format containers only"
                    )
                for k in range(0, arr.shape[0], every_n):
                    rows.append(
                        {
                            "media_id": str(mid),
                            "frame_idx": int(k),
                            "frame_bytes": codec.encode_image(arr[k : k + 1], "raw"),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES.fields])

    return df.select(id_col, bytes_col).mapInPandas(_sample, FRAMES)


def image_near_duplicates(
    df: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Perceptual near-duplicate image pairs over a 64-bit ``phash``
    column (input_hint schema; ``codec.phash64`` computes it at decode
    time, :func:`with_image_features` backfills it for raw corpora).
    Crops/re-encodes/minor edits move only a few phash bits, so pairs
    within ``max_hamming`` are the standard web-scale image-dedup
    signal. Delegates to the shared banding core
    ``dedup.hamming_near_duplicates`` — pigeonhole band join + exact
    ``bit_count(xor)`` verify, ids-only through the shuffle, hot-bucket
    cap for uniform/blank-image pileups (identical phash)."""
    from geococo_spark.operators.dedup import hamming_near_duplicates

    return hamming_near_duplicates(
        df,
        id_col=id_col,
        sig_col=phash_col,
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )
