"""Sources: readers over the driver's parquet tables + text/csv/json.

Reference counterparts: ``InputSplit.h:8-30`` (byte-range splits),
``LineRecordReader.h:14-119`` (line records incl. split-straddle rule),
``MapReduceUtil.cpp:139-166`` (fixed-size split planning). All of that is
built into every Spark source (``spark.sql.files.maxPartitionBytes``
plans the splits; TextInputFormat handles line straddling identically),
so this module is a thin, schema-aware catalog layer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def spread(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out to the session's parallelism before a
    compute-heavy per-row pipeline.

    The sf* tables are single parquet files with one row group — one
    input split — so without this, per-document work (shingling,
    signature folds, regex suites) runs on ONE core of the session. The
    round-robin repartition shuffles only the scan's raw bytes (small)
    and buys full-width compute. At real scale inputs arrive in many
    splits and this is a structural no-op (partitions >= parallelism
    => returned unchanged), so the plan stays shuffle-free exactly when
    the shuffle would not pay for itself."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if _estimated_scan_partitions(df) < target:
        return df.repartition(target)
    return df


def _estimated_scan_partitions(df: DataFrame) -> int:
    """Estimate how many input splits a scan will plan WITHOUT converting
    the DataFrame to a classic RDD (``df.rdd.getNumPartitions()`` forces
    full analysis + physical planning through the RDD path on every
    call). For file scans: sum over files of ceil(size /
    maxPartitionBytes) — the same arithmetic Spark's
    FilePartition planner uses, ignoring openCostInBytes packing, which
    only ever makes Spark plan FEWER partitions than this estimate (so a
    no-op decision here is safe). Non-file plans (range, joins, …) fall
    back to the RDD probe — spread() is only applied to scans, so the
    fallback is effectively test-only."""
    import math
    from urllib.parse import urlparse

    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        return df.rdd.getNumPartitions()
    raw = str(
        df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728b"
        )
    ).lower()
    try:
        mpb = int(raw.rstrip("b")) or 128 * 1024 * 1024
    except ValueError:
        mpb = 128 * 1024 * 1024
    total = 0
    for f in files:
        u = urlparse(f)
        if u.scheme not in ("file", ""):
            # remote store: sizes not stat-able from here; treat each
            # file as at least one split (under-estimates huge files,
            # which at worst repartitions a scan that already had width)
            total += 1
            continue
        try:
            total += max(1, math.ceil(os.path.getsize(u.path) / mpb))
        except OSError:
            total += 1
    return total


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Parquet scan => column pruning +
    predicate pushdown for free once Catalyst sees the full plan."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw int64 (legacy conf, set
    dynamically so it works under any session) and convert to a
    microsecond timestamp with integer floor-division — the same ns->us
    truncation DuckDB applies, so oracle comparisons stay exact."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, "events"))
    if dict(df.dtypes).get("ts") == "bigint":
        # integer division — double math would lose precision above 2^53 ns
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries can use spark.sql."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """The reference's only input type: text lines (LineRecordReader).

    One column ``value: string``; Spark's TextInputFormat reproduces the
    reference's split-straddle rule (skip first partial line when
    offset != 0, read one line past the split end — LineRecordReader.h:44-62)
    """
    return spark.read.text(path)
