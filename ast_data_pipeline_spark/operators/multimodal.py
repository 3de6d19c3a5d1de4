"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata structs (north-star extension).

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub: real Arrow/binary plumbing (schema, batching,
partitioning, UDF signature) with a deterministic fake feature
extractor; ``decode_image``/``decode_audio`` raise NotImplementedError
exactly where a real codec (Pillow/libsndfile/ffmpeg) would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, format string, byte_len int, mean_byte double, "
    "histogram8 array<double>, feature_ok boolean"
)

SUPPORTED_FAKE = {"png", "jpg", "wav"}


def decode_image(payload: bytes, fmt: str) -> np.ndarray:
    """STUB — a real implementation would decode with Pillow/opencv.

    Raises NotImplementedError; callers must use the deterministic
    fake-feature path (``extract_features``) in this environment.
    """
    raise NotImplementedError(
        f"binary decode for format {fmt!r} requires an image codec "
        "(Pillow/opencv), not present in this container"
    )


def with_multimodal_columns(docs: DataFrame) -> DataFrame:
    """Attach a synthetic binary payload + typed metadata struct.

    payload = utf-8 bytes of the text (deterministic stand-in for real
    media bytes); metadata mirrors what an ingest manifest would carry.
    """
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "jpg")
        .otherwise("wav")
    )
    meta = F.struct(
        fmt.alias("format"),
        (64 + (F.col("doc_id") % 16) * 32).cast("int").alias("width"),
        (64 + (F.col("doc_id") % 9) * 48).cast("int").alias("height"),
        (F.col("doc_id") % 3 == 2).alias("is_audio"),
    )
    return docs.withColumn("payload", F.encode(F.col("text"), "utf-8")).withColumn(
        "media_meta", meta
    )


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    Deterministic fake features (mean byte value + 8-bin byte
    histogram) computed where a real decoder would run; the Spark-side
    shape — Arrow binary batches in, fixed-schema feature rows out —
    is exactly what a real decode/extract stage uses.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {
                "doc_id": [], "format": [], "byte_len": [], "mean_byte": [],
                "histogram8": [], "feature_ok": [],
            }
            for doc_id, payload, fmt in zip(
                pdf["doc_id"], pdf["payload"], pdf["fmt"]
            ):
                b = np.frombuffer(payload, dtype=np.uint8)
                ok = fmt in SUPPORTED_FAKE
                hist = np.histogram(b, bins=8, range=(0, 256))[0] if len(b) else np.zeros(8)
                out["doc_id"].append(int(doc_id))
                out["format"].append(fmt)
                out["byte_len"].append(int(len(b)))
                out["mean_byte"].append(float(b.mean()) if len(b) else 0.0)
                out["histogram8"].append((hist / max(len(b), 1)).tolist())
                out["feature_ok"].append(bool(ok))
            yield pd.DataFrame(out)

    return df.select(
        "doc_id", "payload", F.col("media_meta.format").alias("fmt")
    ).mapInPandas(_extract, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, payload binary, width int, height int, "
    "src_width int, src_height int"
)


def resize_images(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize over the binary image column.

    The resampling kernel is REAL (numpy integer index mapping — the
    same arithmetic a production nearest-neighbor pass runs after
    decode); only the decode is faked: the payload is treated as a
    row-major uint8 (height, width) plane, deterministically padded /
    truncated to width*height bytes where the synthetic payload length
    differs. Arrow batches in, fixed-schema rows with the resized
    payload + updated dims out — the exact plumbing a Pillow-backed
    decode would slot into (see ``decode_image``).
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {
                "doc_id": [], "payload": [], "width": [], "height": [],
                "src_width": [], "src_height": [],
            }
            for doc_id, payload, w, h in zip(
                pdf["doc_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                w, h = int(w), int(h)
                b = np.frombuffer(payload, dtype=np.uint8)
                b = np.resize(b, w * h).reshape(h, w)  # deterministic pad/trunc
                xs = (np.arange(target_w) * w) // target_w
                ys = (np.arange(target_h) * h) // target_h
                resized = b[np.ix_(ys, xs)]
                out["doc_id"].append(int(doc_id))
                out["payload"].append(resized.tobytes())
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["src_width"].append(w)
                out["src_height"].append(h)
            yield pd.DataFrame(out)

    return df.select(
        "doc_id", "payload",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    ).mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_index int, n_frames int, frame_len int, "
    "frame_mean_byte double"
)


def sample_frames(df: DataFrame, frame_len: int = 64, every: int = 4) -> DataFrame:
    """Frame sampling over the binary video column: the payload is a
    concatenation of fixed-length frames (the container-parse step a
    real ffmpeg probe would do is faked by the fixed ``frame_len``);
    every ``every``-th frame is selected and summarized. One input row
    fans out to one output row per sampled frame — the mapInPandas
    iterator shape for 1->N extraction (same pattern a real
    frame-decoder would use, yielding pixel tensors instead of byte
    means)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = {
                "doc_id": [], "frame_index": [], "n_frames": [],
                "frame_len": [], "frame_mean_byte": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                n_frames = max(1, len(b) // frame_len)
                frames = np.resize(b, n_frames * frame_len).reshape(
                    n_frames, frame_len
                )
                for idx in range(0, n_frames, every):
                    out["doc_id"].append(int(doc_id))
                    out["frame_index"].append(idx)
                    out["n_frames"].append(int(n_frames))
                    out["frame_len"].append(frame_len)
                    out["frame_mean_byte"].append(float(frames[idx].mean()))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(_sample, schema=FRAME_SCHEMA)
