"""Multimodal column plumbing for LLM data pipelines (SURVEY.md §7 phase 6).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct alongside. The Spark-side plumbing — schemas, Arrow batch
shapes, mapInPandas operators, partition sizing — is real and tested; the
actual codec calls are stubbed (the image/audio libraries are not in this
container) behind clearly marked NotImplementedError / deterministic fakes.

Layout convention:
    payload  BINARY                 -- raw encoded bytes
    meta     STRUCT<modality:string, byte_len:long, mime:string>

At scale: payload columns dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition of
payloads fits executor memory, and push metadata-only predicates so parquet
row groups of payload bytes are skipped entirely (column pruning means a
metadata query never reads the payload pages).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_DIM = 4


def attach_binary_payload(df: DataFrame, content_col: str, modality: str = "text", mime: str = "text/plain") -> DataFrame:
    """Pack a content column into the payload+meta multimodal layout."""
    payload = F.col(content_col).cast("binary")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.length(payload).cast("long").alias("byte_len"),
            F.lit(mime).alias("mime"),
        ),
    )


def decode_image(payload: bytes):
    """Real image decode — requires an imaging library not present in this
    container. The Spark-side plumbing calls :func:`extract_features`'s
    deterministic fake instead; swap this in when PIL/turbojpeg is available.
    """
    raise NotImplementedError("image decoding requires PIL/libjpeg; not available in this container")


def decode_audio(payload: bytes):
    raise NotImplementedError("audio decoding requires soundfile/ffmpeg; not available in this container")


def sample_frames(payload: bytes, every_n: int = 10):
    raise NotImplementedError("video frame sampling requires ffmpeg; not available in this container")


def resize_image(payload: bytes, width: int, height: int):
    raise NotImplementedError("image resize requires PIL/opencv; not available in this container")


def _fake_features(payload: bytes) -> list[int]:
    """Deterministic stand-in for a decoded-feature vector: byte-level stats
    (length, first, last, checksum mod 997). Keeps the full Arrow/mapInPandas
    path real while the codec is stubbed."""
    if payload is None or len(payload) == 0:
        return [0, 0, 0, 0]
    return [len(payload), payload[0], payload[-1], sum(payload) % 997]


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over payload batches.

    This is the shape a real decoder runs in: Arrow record batches stream
    through Python once, emitting fixed-width feature vectors; no shuffle is
    introduced (narrow transformation), so it pipelines with the scan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_features)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": feats,
                    "byte_len": [f[0] for f in feats],
                    "checksum": [f[3] for f in feats],
                }
            )

    schema = f"{id_col} long, features array<long>, byte_len long, checksum long"
    return df.select(id_col, "payload").mapInPandas(run, schema=schema)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resize: tile/truncate the payload to
    exactly width*height bytes. Preserves the real operator's contract —
    fixed output size, pure function of (payload, w, h) — so the Spark
    plumbing (schema, batch shape, partition sizing) is exercised for real;
    swap :func:`resize_image` in when an imaging library is present."""
    n = width * height
    if not payload:
        return bytes(n)
    reps = -(-n // len(payload))
    return (payload * reps)[:n]


def resize_payloads(df: DataFrame, width: int, height: int, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas resize over payload batches: (id, payload) → (id, resized
    payload + refreshed meta). Narrow — pipelines with the scan; output rows
    are fixed-size so downstream partition sizing is exact
    (rows_per_partition = maxPartitionBytes / (width*height))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": pdf["payload"].map(lambda p: _fake_resize(p, width, height)),
                }
            )

    out = df.select(id_col, "payload").mapInPandas(run, schema=f"{id_col} long, payload binary")
    return out.withColumn(
        "meta",
        F.struct(
            F.lit("image").alias("modality"),
            F.length("payload").cast("long").alias("byte_len"),
            F.lit("image/raw").alias("mime"),
        ),
    )


def sample_frame_payloads(
    df: DataFrame, frame_bytes: int, every_n: int, id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas frame sampling: the payload is treated as a sequence of
    fixed-size frames; every n-th frame is emitted as one output ROW
    (id, frame_no, frame) — the exploding shape a real video pipeline needs
    (output rows ≫ input rows), so this is where
    ``spark.sql.files.maxPartitionBytes`` matters most: a partition's output
    is its payload bytes / every_n. Deterministic fake of the ffmpeg path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:
                    continue
                total = len(payload) // frame_bytes
                for fno in range(0, total, every_n):
                    ids.append(rid)
                    nos.append(fno)
                    frames.append(payload[fno * frame_bytes : (fno + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_no": nos, "frame": frames})

    return df.select(id_col, "payload").mapInPandas(
        run, schema=f"{id_col} long, frame_no long, frame binary"
    )
