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


MULTIMODAL_QUERIES: list[QuerySpec] = [
    QuerySpec("multimodal_meta", q_multimodal_meta, ORACLE_MULTIMODAL_META, ("ext", "multimodal")),
    QuerySpec("multimodal_decode", q_multimodal_decode, None, ("ext", "multimodal", "udf")),
]
