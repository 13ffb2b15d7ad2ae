"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content in a Spark pipeline is an opaque ``binary`` column
plus typed metadata; decode / feature-extraction runs as Arrow-batched
pandas iterators (mapInPandas), never row-at-a-time Python. The decode step
itself is STUBBED here (no image/audio libraries in this container):
``decode_image`` raises NotImplementedError and the pipeline uses a
clearly-marked deterministic fake — the Spark-side plumbing (schema, batch
iteration, partitioning) is real and tested.

Scale notes: payloads stay columnar (parquet binary) end to end; metadata
extraction is builtin-expression-only (oracle-checkable); feature extraction
batches through Arrow with spark.sql.execution.arrow.maxRecordsPerBatch
bounding memory; the output schema is declared up front so Catalyst can
prune unselected features.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("id bigint, n_bytes bigint, byte_sum bigint, "
                  "head_byte int, tail_byte int, feature array<double>")


def attach_binary_payload(df: DataFrame, content_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Stand-in ingest: content -> binary payload + typed metadata struct.
    (With real images this is spark.read.format('binaryFile') providing
    path/length/content.)"""
    payload = F.encode(F.col(content_col), "UTF-8")
    meta = F.struct(
        F.octet_length(F.col(content_col)).cast("bigint").alias("n_bytes"),
        F.lit("application/octet-stream").alias("mime"),
        F.md5(payload).alias("checksum"),
    )
    return df.select(F.col(id_col).alias("id"), payload.alias("payload"),
                     meta.alias("meta"))


def payload_metadata(df: DataFrame, content_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Flat, oracle-checkable view of the ingest metadata."""
    d = attach_binary_payload(df, content_col, id_col)
    return d.select("id", F.col("meta.n_bytes").alias("n_bytes"),
                    F.col("meta.mime").alias("mime"),
                    F.col("meta.checksum").alias("checksum"))


def decode_image(payload: bytes) -> "object":
    """REAL image decode — intentionally unimplemented in this environment
    (no PIL/opencv in the container). The feature extractor below substitutes
    a deterministic fake derived from the raw bytes."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not available in this container")


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize — decode-dependent, so stubbed like decode_image.
    The Spark-side plumbing for a resize stage is extract_features' shape:
    binary in -> mapInPandas -> binary/struct out with a declared schema."""
    raise NotImplementedError(
        "image resize requires PIL/opencv; not available in this container")


def sample_frames(df: DataFrame, content_col: str = "text",
                  id_col: str = "doc_id", frame_size: int = 64,
                  stride: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: treat the content as
    consecutive fixed-size frames, keep every ``stride``-th frame, emit
    (id, frame_idx, frame_len, frame_md5).

    Entirely JVM-side — sequence + explode for the sampled indices,
    substr slicing, md5 checksum — so it is oracle-checkable and keeps
    Python out of the hot path; a real video pipeline swaps the substr
    slice for a decoder UDF with the same dataflow. Frames are defined on
    the character domain here because the stand-in payloads are text
    (Spark and DuckDB agree on code-point substring semantics); with real
    ``binary`` payloads the same plan uses byte offsets.

    Scale: output rows = ceil(payload/frame_size)/stride per doc — the
    explode fans out before any shuffle, and there is no shuffle at all.
    """
    c = F.col(content_col)
    n_frames = F.ceil(F.length(c) / F.lit(float(frame_size))).cast("int")
    d = (df.select(F.col(id_col).alias("id"), c.alias("__content"),
                   n_frames.alias("__nf"))
         .where(F.col("__nf") > 0))
    idx = F.explode(F.sequence(F.lit(0), F.col("__nf") - 1, F.lit(stride)))
    d = d.select("id", "__content", idx.alias("frame_idx"))
    frame = F.col("__content").substr(
        F.col("frame_idx") * frame_size + 1, F.lit(frame_size))
    return d.select("id", "frame_idx",
                    F.length(frame).cast("bigint").alias("frame_len"),
                    F.md5(frame).alias("frame_md5"))


def _fake_features(payload: bytes) -> tuple[int, int, int, int, list[float]]:
    """Deterministic stand-in for decode+embed: byte statistics."""
    n = len(payload)
    s = sum(payload)
    head = payload[0] if n else -1
    tail = payload[-1] if n else -1
    feature = [float(n % 251), float(s % 997), float(head), float(tail)]
    return n, s, head, tail, feature


def extract_features(df: DataFrame, content_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over the binary payload
    (mapInPandas): (id, n_bytes, byte_sum, head_byte, tail_byte,
    feature array<double>)."""
    d = attach_binary_payload(df, content_col, id_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [(int(i), *(_fake_features(bytes(p))))
                    for i, p in zip(pdf["id"], pdf["payload"])]
            yield pd.DataFrame(rows, columns=["id", "n_bytes", "byte_sum",
                                              "head_byte", "tail_byte",
                                              "feature"])

    return d.select("id", "payload").mapInPandas(batches, FEATURE_SCHEMA)
