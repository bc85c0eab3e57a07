"""[EXT] Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
computed Spark-side. The decode / feature-extract step is a Pandas-UDF
``mapInPandas`` pipeline whose Spark plumbing (schema, batching,
partitioning) is real and tested; the actual media decode is STUBBED with
a deterministic fake (the image/audio libraries are not in this
container) behind an import-try — swap ``_fake_decode`` for a PIL/ffmpeg
call and nothing else changes.

Scale notes: binary payloads ride parquet; metadata extraction is
per-row (no shuffle); mapInPandas streams Arrow batches so peak memory is
one batch of decoded frames per core, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiny_mapreduce_rpc_server_spark.functions import portable as P
from tiny_mapreduce_rpc_server_spark.sources import load_table
from tiny_mapreduce_rpc_server_spark.spec import QuerySpec


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat each document's text bytes as an opaque media payload:
    byte length, content digest, and deterministic fake dimensions
    (stand-ins for decoded width/height metadata)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    h = P.h1(F.col("text"))
    return docs.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
        (h % 640 + 16).alias("fake_width"),
        (h % 480 + 16).alias("fake_height"),
        ((h % 640 + 16) * (h % 480 + 16)).alias("fake_pixels"),
    )


ORACLE_MULTIMODAL_META = f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       sha256(text) AS digest,
       {P.sql_h1("text")} % 640 + 16 AS fake_width,
       {P.sql_h1("text")} % 480 + 16 AS fake_height,
       ({P.sql_h1("text")} % 640 + 16) * ({P.sql_h1("text")} % 480 + 16) AS fake_pixels
FROM documents
"""


# ---------------------------------------------------------------------------
# decode pipeline (mapInPandas; decode step stubbed)
# ---------------------------------------------------------------------------

_DECODE_SCHEMA = (
    "doc_id long, n_bytes int, n_frames int, mean_byte double, decoder string"
)


def _fake_decode(payload: bytes) -> tuple[int, float]:
    """Deterministic stand-in for a real media decode: derive a frame
    count and a mean-sample statistic from the raw bytes. Replace with
    PIL/torchaudio/ffmpeg when available."""
    n_frames = len(payload) % 30 + 1
    mean_byte = (sum(payload) / len(payload)) if payload else 0.0
    return n_frames, mean_byte


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in, decoded-feature batch out."""
    try:
        import PIL.Image  # noqa: F401

        decoder = "pil"
    except ImportError:
        decoder = "fake"
    for pdf in batches:
        frames, means = [], []
        for payload in pdf["payload"]:
            b = bytes(payload)
            nf, mb = _fake_decode(b)  # real decoder would branch on `decoder`
            frames.append(nf)
            means.append(mb)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "n_frames": pd.Series(frames, dtype="int32"),
                "mean_byte": pd.Series(means, dtype="float64"),
                "decoder": decoder,
            }
        )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract pipeline over binary payloads via
    mapInPandas (Arrow-batched). Decode is a deterministic stub —
    rows-only check, but schema/partitioning/batch plumbing is the real
    thing."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))
    return payloads.mapInPandas(decode_batch, _DECODE_SCHEMA)


# ---------------------------------------------------------------------------
# frame sampling (mapInPandas 1->N expansion, oracle-checked)
# ---------------------------------------------------------------------------

_FRAME_STRIDE = 5
_FRAME_SCHEMA = "doc_id long, frame_idx int, feature long"


def frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: every 5th frame of each payload. The 1->N row
    expansion is the real plumbing a video frame-sampler needs; the
    per-frame feature is a deterministic stand-in for a decoded frame
    stat (function of the payload hash and frame index)."""
    for pdf in batches:
        ids, idxs, feats = [], [], []
        for doc_id, n_bytes, h in zip(pdf["doc_id"], pdf["n_bytes"], pdf["h"]):
            n_frames = int(n_bytes) % 30 + 1
            for idx in range(0, n_frames, _FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(idx)
                feats.append((int(h) * (idx + 1)) % 997)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "feature": pd.Series(feats, dtype="int64"),
            }
        )


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: explode each media payload into every 5th frame
    with a per-frame feature. Hash and length are computed JVM-side and
    shipped into the Arrow batch, so the Python step is pure row
    expansion — no formula duplication, and the whole op stays
    shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id",
        F.length(F.col("text").cast("binary")).alias("n_bytes"),
        P.h1(F.col("text")).alias("h"),
    )
    return payloads.mapInPandas(frame_sample_batch, _FRAME_SCHEMA)


ORACLE_FRAME_SAMPLE = f"""
WITH f AS (
  SELECT doc_id,
         octet_length(encode(text)) % 30 + 1 AS n_frames,
         {P.sql_h1("text")} AS h
  FROM documents)
SELECT doc_id, CAST(idx AS INTEGER) AS frame_idx, (h * (idx + 1)) % 997 AS feature
FROM (SELECT doc_id, h,
             unnest(generate_series(0, CAST(n_frames AS BIGINT) - 1,
                                    {_FRAME_STRIDE})) AS idx
      FROM f) t
"""


# ---------------------------------------------------------------------------
# resize / thumbnail (mapInPandas 1->1 transform, oracle-checked)
# ---------------------------------------------------------------------------

_THUMB_CHARS = 256
_RESIZE_SCHEMA = "doc_id long, thumb binary, out_w int, out_h int"


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: produce a bounded 'thumbnail' (payload
    truncated to 256 characters, re-encoded — stand-in for a real
    downscale; char-based so multibyte text truncates identically in any
    engine) plus output dimensions scaled to width 16 preserving the
    fake aspect ratio."""
    for pdf in batches:
        thumbs = [
            bytes(p).decode("utf-8")[:_THUMB_CHARS].encode("utf-8")
            for p in pdf["payload"]
        ]
        h = pdf["h"].astype("int64")
        in_w = h % 640 + 16
        in_h = h % 480 + 16
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "thumb": thumbs,
                "out_w": pd.Series([16] * len(pdf), dtype="int32"),
                "out_h": (in_h * 16 // in_w).astype("int32"),
            }
        )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline: binary in, bounded thumbnail + target dims out,
    digest computed JVM-side after the Python stage (binary columns
    round-trip through Arrow)."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        P.h1(F.col("text")).alias("h"),
    )
    resized = payloads.mapInPandas(resize_batch, _RESIZE_SCHEMA)
    return resized.select(
        "doc_id", F.sha2(F.col("thumb"), 256).alias("thumb_digest"), "out_w", "out_h"
    )


ORACLE_RESIZE = f"""
SELECT doc_id,
       sha256(substring(text, 1, {_THUMB_CHARS})) AS thumb_digest,
       16 AS out_w,
       CAST((({P.sql_h1("text")} % 480 + 16) * 16)
            // ({P.sql_h1("text")} % 640 + 16) AS INTEGER) AS out_h
FROM documents
"""


MULTIMODAL_QUERIES: list[QuerySpec] = [
    QuerySpec("multimodal_meta", q_multimodal_meta, ORACLE_MULTIMODAL_META, ("ext", "multimodal")),
    QuerySpec("multimodal_decode", q_multimodal_decode, None, ("ext", "multimodal", "udf")),
    QuerySpec("multimodal_frame_sample", q_multimodal_frame_sample, ORACLE_FRAME_SAMPLE, ("ext", "multimodal", "udf")),
    QuerySpec("multimodal_resize", q_multimodal_resize, ORACLE_RESIZE, ("ext", "multimodal", "udf")),
]
