"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is a `binary`
column that never leaves the executor JVM except through Arrow batches
into a Pandas UDF (`mapInPandas`), which decodes / feature-extracts /
resizes in vectorized chunks. The container has no PIL/ffmpeg, but the
default decoder is REAL: a pure-stdlib BMP/PNG codec (imagecodec.py)
that parses actual file headers (PNG signature + IHDR + CRC, BMP
BITMAPINFOHEADER) and, when asked, actual pixels. ``set_decoder``
remains the seam for swapping in PIL/ffmpeg-backed codecs.

mm01 exercises the pure-JVM metadata path (no Python). mm02 drives the
full mapInPandas pipeline end-to-end with REAL files: each document's
bytes are deterministically rendered into a real PNG (zlib stored
blocks) or BMP, then decoded back. Because the synthesis rule is
arithmetic in the source byte length — and stored-block PNG/24bpp BMP
file sizes are closed-form in (width, height) — the DuckDB oracle
predicts the exact byte size and dimensions of every generated file,
so the value-hash gate proves the encode→decode round trip, not just
the Arrow plumbing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
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


from flink_streaming_platform_web_spark.operators.imagecodec import (
    decode_image_meta,
    encode_bmp,
    encode_png,
)

_decoder: Callable[[bytes], tuple[int, int, str]] = decode_image_meta


def set_decoder(fn: Callable[[bytes], tuple[int, int, str]]) -> None:
    """Swap the decode kernel (e.g. a PIL/ffmpeg-backed one). The
    default is the pure-stdlib BMP/PNG header decoder
    (imagecodec.decode_image_meta) — undecodable payloads raise."""
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


def _spread(df: DataFrame) -> DataFrame:
    """Repartition a payload relation across all cores BEFORE a
    compute-heavy Python kernel: the corpus arrives as a handful of
    parquet splits (4 at sf1) and a mapInPandas stage inherits them,
    idling 28 of 32 cores. JVM-only consumers (mm01's octet/md5 pass)
    skip this — the exchange is only worth paying when per-row Python
    follows (round 12)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


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
# mm02 — full mapInPandas encode→decode round trip over REAL files.
#
# Synthesis rule (deterministic in n = source byte length):
#   width  = n % 64 + 1          (<= 64)
#   height = n % 48 + 1          (<= 48)
#   format = png if n even else bmp
#   pixels = source bytes tiled to width*height*3
# File sizes are then closed-form (imagecodec docstrings):
#   png (stored zlib, one block since raw <= 48*193 < 65535):
#       68 + height * (3*width + 1)
#   bmp (24bpp): 54 + height * ((3*width + 3) & ~3)
# The oracle predicts n_bytes/width/height/format of every REAL file;
# a header mis-write, CRC bug, or decode drift breaks the hash.
# --------------------------------------------------------------------------


def render_image(data: bytes) -> bytes:
    """Deterministically render source bytes as a real PNG or BMP."""
    n = len(data)
    w, h = n % 64 + 1, n % 48 + 1
    need = w * h * 3
    px = (
        (data * (need // n + 1))[:need] if n else bytes(need)
    )
    return (
        encode_png(w, h, px) if n % 2 == 0 else encode_bmp(w, h, px)
    )


def with_image_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload) where payload is a real image
    file rendered from the doc's bytes (mapInPandas, Arrow-batched —
    the synthesis stands in for reading real image blobs, which the
    synthetic testdata lacks)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
        ]
    )

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [
                        render_image(t.encode("utf-8"))
                        for t in pdf["text"]
                    ],
                }
            )

    # spread the synthesis (and every downstream decode stage, which
    # inherits this partitioning) across ALL cores: the corpus arrives
    # as a handful of parquet splits (4 at sf1), and a compute-heavy
    # Python stage on 4 of 32 cores is an 8× idle tax — the same
    # repartition-before-the-kernel shape _shingles uses (round 12;
    # at 100 TB the file count makes this a no-op, locally it is the
    # difference between 4-way and 32-way decode)
    par = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(par)
        .mapInPandas(render, schema)
    )


def mm02_decode_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return decode_metadata(with_image_payload(docs))


ORACLE_MM02 = """
WITH m AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n,
         octet_length(encode(text)) % 64 + 1 AS w,
         octet_length(encode(text)) % 48 + 1 AS h
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN n % 2 = 0
                 THEN 68 + h * (3 * w + 1)
                 ELSE 54 + h * (((3 * w + 3) // 4) * 4)
            END AS INT) AS n_bytes,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CASE WHEN n % 2 = 0 THEN 'png' ELSE 'bmp' END AS format
FROM m
"""


# --------------------------------------------------------------------------
# mm04 — resize: the remaining multimodal pipeline stage (decode →
# transform pixels → re-encode). Nearest-neighbor half-size via a
# numpy stride slice over the REAL decoded pixel matrix, re-encoded
# through the same real codec. The synthesis rule keeps output dims
# and file size closed-form in the source byte length, so the DuckDB
# oracle predicts every resized file's exact size — a pixel-indexing
# bug that changes geometry or a re-encode bug breaks the hash;
# pixel VALUES are pinned by the golden test in test_imagecodec.
# --------------------------------------------------------------------------

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("dst_w", IntegerType()),
        StructField("dst_h", IntegerType()),
        StructField("dst_bytes", IntegerType()),
        StructField("format", StringType()),
    ]
)


def halve_image(data: bytes) -> tuple[int, int, int, int, str, bytes]:
    """Decode → nearest-neighbor half-size (ceil: even source rows/
    cols survive, a 1×1 image stays 1×1) → re-encode in the source
    format. Returns (src_w, src_h, dst_w, dst_h, format, out_bytes)."""
    import numpy as np

    from flink_streaming_platform_web_spark.operators.imagecodec import (
        decode_image,
    )

    w, h, fmt, px = decode_image(data)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    small = arr[::2, ::2]
    dh, dw = small.shape[0], small.shape[1]
    out_px = small.tobytes()
    out = (
        encode_png(dw, dh, out_px)
        if fmt == "png"
        else encode_bmp(dw, dh, out_px)
    )
    return w, h, dw, dh, fmt, out


def resize_images(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode→resize→re-encode: the full multimodal
    transform stage, Arrow-batched. Geometry + re-encoded size out;
    swapping in a PIL/ffmpeg resize goes through the same seam."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k.name: [] for k in RESIZE_SCHEMA.fields
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                w, h, dw, dh, fmt, enc = halve_image(bytes(payload))
                out["doc_id"].append(doc_id)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["dst_w"].append(dw)
                out["dst_h"].append(dh)
                out["dst_bytes"].append(len(enc))
                out["format"].append(fmt)
            yield pd.DataFrame(out)

    return df.mapInPandas(resize, RESIZE_SCHEMA)


def mm04_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return resize_images(with_image_payload(docs))


ORACLE_MM04 = """
WITH m AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n,
         octet_length(encode(text)) % 64 + 1 AS w,
         octet_length(encode(text)) % 48 + 1 AS h
  FROM documents
), d AS (
  SELECT doc_id, n, w, h,
         (w + 1) // 2 AS dw, (h + 1) // 2 AS dh
  FROM m
)
SELECT doc_id,
       CAST(w AS INT) AS src_w,
       CAST(h AS INT) AS src_h,
       CAST(dw AS INT) AS dst_w,
       CAST(dh AS INT) AS dst_h,
       CAST(CASE WHEN n % 2 = 0
                 THEN 68 + dh * (3 * dw + 1)
                 ELSE 54 + dh * (((3 * dw + 3) // 4) * 4)
            END AS INT) AS dst_bytes,
       CASE WHEN n % 2 = 0 THEN 'png' ELSE 'bmp' END AS format
FROM d
"""


# --------------------------------------------------------------------------
# mm05 — feature extraction: per-channel pixel means over the REAL
# decoded pixel matrix (the embedding-prep stage of an image
# pipeline). The tiling synthesis rule makes each channel's pixel SUM
# an exact integer function of the source text's byte values, so the
# DuckDB oracle recomputes it arithmetically (ord() over tiled
# positions — ASCII corpus, so codepoint == byte) with no image code
# at all: a decode that mangles any pixel value breaks the hash.
# Means are a single IEEE division of integer sums (_portable rule).
# --------------------------------------------------------------------------

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def extract_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode → numpy channel statistics: int64-exact
    per-channel sums over the decoded (h, w, 3) matrix, one division
    at the end. Swapping in a CNN/CLIP embedder goes through the
    same seam (binary in, fixed-width feature row out)."""
    import numpy as np

    from flink_streaming_platform_web_spark.operators.imagecodec import (
        decode_image,
    )

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k.name: [] for k in FEATURE_SCHEMA.fields
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                w, h, _fmt, px = decode_image(bytes(payload))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(
                    h, w, 3
                )
                sums = arr.sum(axis=(0, 1), dtype=np.int64)
                cnt = float(w * h)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(float(sums[0]) / cnt)
                out["mean_g"].append(float(sums[1]) / cnt)
                out["mean_b"].append(float(sums[2]) / cnt)
            yield pd.DataFrame(out)

    return df.mapInPandas(features, FEATURE_SCHEMA)


def mm05_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return extract_features(with_image_payload(docs))


ORACLE_MM05 = """
WITH m AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         octet_length(encode(text)) % 64 + 1 AS w,
         octet_length(encode(text)) % 48 + 1 AS h
  FROM documents
), j AS (
  SELECT doc_id, n AS nn, w AS ww, h AS hh, text AS txt,
         unnest(range(0, w * h * 3)) AS p
  FROM m
), s AS (
  SELECT doc_id,
         MAX(ww) AS w, MAX(hh) AS h,
         SUM(CASE WHEN p % 3 = 0
             THEN ord(substr(txt, CAST(p % nn AS INT) + 1, 1))
             ELSE 0 END) AS sr,
         SUM(CASE WHEN p % 3 = 1
             THEN ord(substr(txt, CAST(p % nn AS INT) + 1, 1))
             ELSE 0 END) AS sg,
         SUM(CASE WHEN p % 3 = 2
             THEN ord(substr(txt, CAST(p % nn AS INT) + 1, 1))
             ELSE 0 END) AS sb
  FROM j GROUP BY doc_id
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(sr AS DOUBLE) / CAST(w * h AS DOUBLE) AS mean_r,
       CAST(sg AS DOUBLE) / CAST(w * h AS DOUBLE) AS mean_g,
       CAST(sb AS DOUBLE) / CAST(w * h AS DOUBLE) AS mean_b
FROM s
"""


# --------------------------------------------------------------------------
# mm06 — the audio-shaped pipeline: payload bytes framed as signed
# int8 PCM samples, per-frame ENERGY (sum of squares) extracted in
# numpy — the windowed-feature stage of an audio pipeline (RMS/VAD
# precursors), one input row fanning out to one row per frame.
# Energy is an exact integer, so the DuckDB oracle recomputes it
# from the source bytes (ord() with the signed-byte fold) with no
# audio code; a real decoder (ffmpeg PCM) swaps in through the same
# seam. ASCII corpus → codepoint == byte.
# --------------------------------------------------------------------------

AUDIO_FRAME = 64

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("energy", LongType()),
    ]
)


def frame_energy(
    df: DataFrame,
    payload_col: str = "payload",
    frame: int = AUDIO_FRAME,
) -> DataFrame:
    """mapInPandas PCM framing + per-frame energy: int8 samples in
    ``frame``-sized windows, int64 sum of squares per window (the
    tail frame keeps its short length, as PCM framing does)."""
    import numpy as np

    def energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k.name: [] for k in AUDIO_SCHEMA.fields
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                pcm = np.frombuffer(bytes(payload), dtype=np.int8)
                sq = pcm.astype(np.int64) ** 2
                for i in range(0, len(sq), frame):
                    chunk = sq[i : i + frame]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i // frame)
                    out["n_samples"].append(len(chunk))
                    out["energy"].append(int(chunk.sum()))
            yield pd.DataFrame(out)

    return df.mapInPandas(energies, AUDIO_SCHEMA)


def mm06_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return frame_energy(_spread(with_binary_payload(docs)))


ORACLE_MM06 = f"""
WITH j AS (
  SELECT doc_id, text AS txt,
         unnest(range(0, octet_length(encode(text)))) AS p
  FROM documents
), s AS (
  SELECT doc_id, CAST(p // {AUDIO_FRAME} AS INT) AS frame_idx,
         CASE WHEN ord(substr(txt, CAST(p AS INT) + 1, 1)) >= 128
              THEN ord(substr(txt, CAST(p AS INT) + 1, 1)) - 256
              ELSE ord(substr(txt, CAST(p AS INT) + 1, 1)) END AS v
  FROM j
)
SELECT doc_id, frame_idx,
       CAST(COUNT(*) AS INT) AS n_samples,
       CAST(SUM(v * v) AS BIGINT) AS energy
FROM s GROUP BY doc_id, frame_idx
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
    return sample_frames(_spread(with_binary_payload(docs)))


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


# --------------------------------------------------------------------------
# mm07 — scene-change keyframe extraction: the temporal-downsampling
# stage of a video pipeline (pick frames where the content jumps, drop
# near-static spans). Frames are mm03's stride-byte chunks; per-frame
# INTENSITY is the unsigned byte sum (exact int64), a cut opens a new
# scene when the intensity jumps more than KEYFRAME_DELTA from the
# previous frame (frame 0 always opens scene 1). Everything is
# per-document local, so the whole operator is ONE scan-bound
# mapInPandas — zero exchanges at any corpus size; a real decoder
# (ffmpeg frame luma) swaps in through the same seam. ASCII corpus →
# codepoint == byte, so the DuckDB oracle recomputes intensities with
# ord() and replays the cut rule as a LAG window.
# --------------------------------------------------------------------------

KEYFRAME_DELTA = 400

SCENE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("intensity", LongType()),
        StructField("scene_id", IntegerType()),
    ]
)


def scene_keyframes(
    df: DataFrame,
    payload_col: str = "payload",
    stride: int = FRAME_STRIDE,
    delta: int = KEYFRAME_DELTA,
) -> DataFrame:
    """mapInPandas frame intensities + sequential scene-cut fold —
    per-document state never leaves the executor."""
    import numpy as np

    def scenes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                f.name: [] for f in SCENE_SCHEMA.fields
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                data = np.frombuffer(
                    bytes(payload), dtype=np.uint8
                ).astype(np.int64)
                scene = 0
                prev = None
                for idx in range(0, -(-len(data) // stride)):
                    inten = int(data[idx * stride:(idx + 1) * stride].sum())
                    if prev is None or abs(inten - prev) > delta:
                        scene += 1
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["intensity"].append(inten)
                    out["scene_id"].append(scene)
                    prev = inten
            yield pd.DataFrame(out)

    return df.mapInPandas(scenes, SCENE_SCHEMA)


def mm07_scene_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return scene_keyframes(_spread(with_binary_payload(docs)))


ORACLE_MM07 = f"""
WITH j AS (
  SELECT doc_id, text AS txt,
         unnest(range(0, octet_length(encode(text)))) AS p
  FROM documents
), f AS (
  SELECT doc_id, CAST(p // {FRAME_STRIDE} AS INT) AS frame_idx,
         SUM(ord(substr(txt, CAST(p AS INT) + 1, 1))) AS inten
  FROM j GROUP BY 1, 2
), d AS (
  SELECT doc_id, frame_idx, CAST(inten AS BIGINT) AS intensity,
         CASE WHEN LAG(inten) OVER w IS NULL
                OR abs(inten - LAG(inten) OVER w) > {KEYFRAME_DELTA}
              THEN 1 ELSE 0 END AS cut
  FROM f WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
)
SELECT doc_id, frame_idx, intensity,
       CAST(SUM(cut) OVER (
         PARTITION BY doc_id ORDER BY frame_idx) AS INT) AS scene_id
FROM d
"""


# --------------------------------------------------------------------------
# mm08 — perceptual-hash image near-dup (round 11): the multimodal ×
# dedup bridge. Each decoded image reduces to a 60-bit average-hash
# (aHash) over a 6×10 grayscale grid — bit i set iff cell i's mean
# brightness exceeds the image mean, compared in exact integer
# cross-multiplied form (tc·cs > cc·ts) so no division enters the
# gate — then near-duplicate pairs come out of the SAME pigeonhole
# banding + exact-Hamming verify the 60-bit SimHash text dedup uses
# (dedup._banded_hamming_pairs: Hamming ≤ 3 ⇒ ≥ 1 of 4 15-bit bands
# equal, candidates are band collisions only). At 100 TB: decode +
# hash is a scan-speed Arrow kernel, signatures are 8-byte rows, and
# the pair space exists only as band-bucket collisions. The oracle
# replays the deterministic pixel-synthesis rule (mm05's) in SQL and
# the identical banding, so the gate proves decode → grid → hash →
# banding end to end on real bytes.
# --------------------------------------------------------------------------

PHASH_ROWS, PHASH_COLS = 6, 10  # 60 bits — SimHash60 banding applies

#: band-buckets holding more members are dropped from candidate
#: generation (the stop-shingle rule applied to LSH buckets). aHash
#: distributions CLUSTER on low-contrast corpora — without the cap
#: the sf0.1→sf5 ladder measured exponent 1.01 with output pairs
#: growing quadratically (5268 → 12.9M), all chance collisions in a
#: few crowded buckets. Bounded buckets ⇒ linear candidates; the
#: recall trade (a pair must collide in some non-crowded band) is
#: the standard LSH hygiene every production index applies.
PHASH_BUCKET_CAP = 64

PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("simhash", LongType()),
    ]
)


def phash_signatures(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode → 60-bit aHash rows (doc_id, simhash)."""
    import numpy as np

    from flink_streaming_platform_web_spark.operators.imagecodec import (
        decode_image,
    )

    def sigs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                w, h, _fmt, px = decode_image(bytes(payload))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
                gray = arr.sum(axis=2, dtype=np.int64)  # (h, w)
                rr = (np.arange(h) * PHASH_ROWS) // h
                cc = (np.arange(w) * PHASH_COLS) // w
                cell = (rr[:, None] * PHASH_COLS + cc[None, :]).ravel()
                n_cells = PHASH_ROWS * PHASH_COLS
                cs = np.bincount(
                    cell, weights=gray.ravel(), minlength=n_cells
                ).astype(np.int64)
                cnt = np.bincount(cell, minlength=n_cells).astype(
                    np.int64
                )
                ts, tc = int(cs.sum()), int(cnt.sum())
                bits = tc * cs > cnt * ts  # integer cross-multiply
                sig = int(
                    np.sum(np.where(bits, 1 << np.arange(n_cells), 0))
                )
                ids.append(doc_id)
                hashes.append(sig)
            yield pd.DataFrame({"doc_id": ids, "simhash": hashes})

    return df.mapInPandas(sigs, PHASH_SCHEMA)


def mm08_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_streaming_platform_web_spark.operators.dedup import (
        SIMHASH60_BANDS,
        SIMHASH60_BITS,
        _banded_hamming_pairs,
    )

    from flink_streaming_platform_web_spark.operators._cache import (
        memo_df,
    )

    # round 14 (optimization): persist the decoded signatures. The
    # banding helper consumes its sigs input from FOUR unshared
    # subtrees (the bucket-cap census, both sides of the band
    # self-join, and the verify projection), so the un-persisted form
    # ran the Python image decode over the whole corpus four times
    # (16 Python nodes in the before-plan). dd05/dd12 already persist
    # their signature tables for exactly this reason; one decode pass
    # is also the only sane shape at 100 TB.
    sigs = memo_df(
        spark,
        sf_dir,
        "phash_sigs",
        lambda: phash_signatures(
            with_image_payload(load(spark, sf_dir, "documents"))
        ),
    )
    return _banded_hamming_pairs(
        sigs,
        SIMHASH60_BANDS,
        SIMHASH60_BITS // SIMHASH60_BANDS,
        bucket_cap=PHASH_BUCKET_CAP,
    )


def _oracle_mm08() -> str:
    from flink_streaming_platform_web_spark.operators.dedup import (
        SIMHASH60_BANDS,
        SIMHASH60_BITS,
        _oracle_banded_pairs,
    )

    sig_sql = f"""
  SELECT doc_id,
         CAST(SUM(CASE WHEN t.tc * c.cs > c.cc * t.ts
                  THEN (CAST(1 AS BIGINT) << CAST(c.cell AS INT))
                  ELSE 0 END) AS BIGINT) AS simhash
  FROM (
    SELECT doc_id, cell, SUM(gray) AS cs, COUNT(*) AS cc
    FROM (
      SELECT doc_id,
             ((q // w) * {PHASH_ROWS} // h) * {PHASH_COLS}
               + ((q % w) * {PHASH_COLS} // w) AS cell,
             ord(substr(text, CAST((3 * q) % n AS INT) + 1, 1))
           + ord(substr(text, CAST((3 * q + 1) % n AS INT) + 1, 1))
           + ord(substr(text, CAST((3 * q + 2) % n AS INT) + 1, 1))
               AS gray
      FROM (
        SELECT doc_id, text, octet_length(encode(text)) AS n,
               octet_length(encode(text)) % 64 + 1 AS w,
               octet_length(encode(text)) % 48 + 1 AS h
        FROM documents
      ), unnest(range(0, w * h)) AS u(q)
    ) GROUP BY doc_id, cell
  ) c JOIN (
    SELECT doc_id, SUM(gray) AS ts, COUNT(*) AS tc
    FROM (
      SELECT doc_id,
             ord(substr(text, CAST((3 * q) % n AS INT) + 1, 1))
           + ord(substr(text, CAST((3 * q + 1) % n AS INT) + 1, 1))
           + ord(substr(text, CAST((3 * q + 2) % n AS INT) + 1, 1))
               AS gray
      FROM (
        SELECT doc_id, text, octet_length(encode(text)) AS n,
               octet_length(encode(text)) % 64 + 1 AS w,
               octet_length(encode(text)) % 48 + 1 AS h
        FROM documents
      ), unnest(range(0, w * h)) AS u(q)
    ) GROUP BY doc_id
  ) t USING (doc_id)
  GROUP BY doc_id
"""
    return _oracle_banded_pairs(
        sig_sql,
        SIMHASH60_BANDS,
        SIMHASH60_BITS // SIMHASH60_BANDS,
        bucket_cap=PHASH_BUCKET_CAP,
    )


QUERIES = {
    "mm01_binary_meta": mm01_binary_meta,
    "mm02_decode_pipeline": mm02_decode_pipeline,
    "mm03_frame_sample": mm03_frame_sample,
    "mm04_resize_pipeline": mm04_resize_pipeline,
    "mm05_feature_extract": mm05_feature_extract,
    "mm06_audio_frame_energy": mm06_audio_frame_energy,
    "mm07_scene_keyframes": mm07_scene_keyframes,
    "mm08_phash_neardup": mm08_phash_neardup,
}

ORACLES = {
    "mm01_binary_meta": ORACLE_MM01,
    "mm02_decode_pipeline": ORACLE_MM02,
    "mm03_frame_sample": ORACLE_MM03,
    "mm04_resize_pipeline": ORACLE_MM04,
    "mm05_feature_extract": ORACLE_MM05,
    "mm06_audio_frame_energy": ORACLE_MM06,
    "mm07_scene_keyframes": ORACLE_MM07,
    "mm08_phash_neardup": _oracle_mm08(),
}
