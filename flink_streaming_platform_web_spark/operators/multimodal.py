"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is a `binary`
column that never leaves the executor JVM except through Arrow batches
into a Pandas UDF (`mapInPandas`), which decodes / feature-extracts /
resizes in vectorized chunks. The decode libraries (PIL/ffmpeg/etc.)
are NOT in this container, so the decode kernel is stubbed behind
``set_decoder`` with a deterministic fake — the Spark-side plumbing
(schema, Arrow batch shape, partitioning) is real and tested.

mm01 exercises the pure-JVM metadata path (no Python). mm02 drives the
full mapInPandas pipeline with the deterministic fake decoder; because
the fake derives (width, height, format) from byte length alone, the
DuckDB oracle can replay it and the Arrow plumbing gets a strong
value-hash check, not just a row count.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_streaming_platform_web_spark.tables import load

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder: derives a plausible
    (width, height, format) from the payload length. Replace via
    ``set_decoder`` when a real codec library is available."""
    n = len(payload)
    return (n % 64 + 1, n % 48 + 1, "png" if n % 2 == 0 else "jpeg")


_decoder: Callable[[bytes], tuple[int, int, str]] = _fake_decode


def set_decoder(fn: Callable[[bytes], tuple[int, int, str]]) -> None:
    """Install a real decoder (e.g. PIL-based). Not available in this
    container — attempting to import one should raise::

        raise NotImplementedError("image codec libs not in container")
    """
    global _decoder
    _decoder = fn


def decode_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode pipeline: binary column in, typed metadata out.

    Arrow-batched: each pandas chunk holds ~10k payloads; the decoder
    runs per element but data transfer is columnar. At scale, partition
    count (not driver memory) bounds throughput.
    """
    decoder = _decoder

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decoder(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "format": [m[2] for m in meta],
                }
            )

    return df.mapInPandas(decode, DECODED_SCHEMA)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Model the multimodal table: text re-encoded as an opaque binary
    payload column (the container has no real image bytes)."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


# --------------------------------------------------------------------------
# mm01 — binary column metadata, pure JVM path (octet length + digest).
# --------------------------------------------------------------------------


def mm01_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    payload = with_binary_payload(docs)
    return payload.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("digest"),
    )


ORACLE_MM01 = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS digest
FROM documents
"""


# --------------------------------------------------------------------------
# mm02 — full mapInPandas decode pipeline with the deterministic fake
# codec; oracle replays the fake's arithmetic on byte lengths.
# --------------------------------------------------------------------------


def mm02_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return decode_metadata(with_binary_payload(docs))


ORACLE_MM02 = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST(octet_length(encode(text)) % 64 + 1 AS INT) AS width,
       CAST(octet_length(encode(text)) % 48 + 1 AS INT) AS height,
       CASE WHEN octet_length(encode(text)) % 2 = 0
            THEN 'png' ELSE 'jpeg' END AS format
FROM documents
"""


# --------------------------------------------------------------------------
# mm03 — frame sampling: the video-shaped pipeline (payload → every
# k-th chunk as a "frame" row). Real codecs would decode via the same
# mapInPandas seam (set_decoder); the deterministic chunker keeps the
# Arrow plumbing oracle-checkable. One input row fans out to n_frames
# rows — the explode-shaped UDF output pattern.
# --------------------------------------------------------------------------

FRAME_STRIDE = 64

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", IntegerType()),
        StructField("frame_digest", StringType()),
    ]
)


def sample_frames(
    df: DataFrame, payload_col: str = "payload", stride: int = FRAME_STRIDE
) -> DataFrame:
    """Every stride-byte chunk of the payload becomes one frame row."""
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame_bytes": [],
                "frame_digest": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = bytes(payload)
                for idx in range(0, len(data), stride):
                    chunk = data[idx : idx + stride]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx // stride)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_digest"].append(
                        hashlib.md5(chunk).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(sample, FRAME_SCHEMA)


def mm03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return sample_frames(with_binary_payload(docs))


# ORACLE SCOPE: DuckDB has no byte-level blob substring/md5, so the
# digest column mirrors the byte chunking only where bytes == chars
# (the synthetic corpus is pure ASCII — verified). The multi-byte
# contract (frames chunk the UTF-8 BYTE payload, possibly splitting a
# codepoint) is pinned Python-side in
# tests/test_pipeline_ops_r2.py::test_mm03_frames_chunk_bytes_not_chars.
ORACLE_MM03 = f"""
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(least({FRAME_STRIDE},
                  octet_length(encode(text)) - i * {FRAME_STRIDE}) AS INT)
         AS frame_bytes,
       md5(substring(text, i * {FRAME_STRIDE} + 1, {FRAME_STRIDE}))
         AS frame_digest
FROM documents,
     LATERAL (SELECT unnest(generate_series(
        0, CAST(ceil(octet_length(encode(text)) / {FRAME_STRIDE}.0)
                AS BIGINT) - 1)) AS i)
"""


QUERIES = {
    "mm01_binary_meta": mm01_binary_meta,
    "mm02_decode_pipeline": mm02_decode_pipeline,
    "mm03_frame_sample": mm03_frame_sample,
}

ORACLES = {
    "mm01_binary_meta": ORACLE_MM01,
    "mm02_decode_pipeline": ORACLE_MM02,
    "mm03_frame_sample": ORACLE_MM03,
}
