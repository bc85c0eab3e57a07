"""Text-format sources: CSV and JSON-lines readers, proven by round-trip.

Reference parity: the reference's ONE input format is line-delimited text
files split into byte ranges (``InputSplit.h:8-30``) with the straddling
rule in ``LineRecordReader.h:14-119`` — a record belongs to the split
where it *starts*. Spark's text-based sources (csv/json/text) implement
the identical rule inside FileScanRDD, with split planning governed by
``spark.sql.files.maxPartitionBytes``, so these readers ARE the
reference's source operator, generalized with schema + quoting.

Each query writes a driver table out through the text sink and reads it
back through the text source before aggregating; the DuckDB oracle runs
the same aggregate on the original parquet, so a pass proves the
round-trip is lossless (quoting, escaping, header handling, float
round-tripping via shortest-repr). Scale: both writer and reader are
embarrassingly parallel (one task per file split); the aggregate after
the read is a normal one-shuffle hash aggregate.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiny_mapreduce_rpc_server_spark.functions import dsum
from tiny_mapreduce_rpc_server_spark.sources import load_table
from tiny_mapreduce_rpc_server_spark.spec import QuerySpec

_DEC = "DECIMAL(38,6)"


def _tmp(sf_dir: str, tag: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(tempfile.gettempdir(), f"tmrs_fmt_{tag}_{sf}")


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    path = _tmp(sf_dir, "csv_nation")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    back = spark.read.schema(nation.schema).option("header", "true").csv(path)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.min("n_name").alias("first_name"),
        F.max("n_name").alias("last_name"),
    )


ORACLE_CSV_ROUNDTRIP = """
SELECT n_regionkey,
       count(*) AS n_nations,
       min(n_name) AS first_name,
       max(n_name) AS last_name
FROM nation GROUP BY n_regionkey
"""


def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    path = _tmp(sf_dir, "json_supplier")
    supplier.write.mode("overwrite").json(path)
    back = spark.read.schema(supplier.schema).json(path)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        dsum("s_acctbal", "sum_acctbal"),
        F.max("s_acctbal").alias("max_acctbal"),
    )


ORACLE_JSON_ROUNDTRIP = f"""
SELECT s_nationkey,
       count(*) AS n_suppliers,
       CAST(sum(CAST(s_acctbal AS {_DEC})) AS DOUBLE) AS sum_acctbal,
       max(s_acctbal) AS max_acctbal
FROM supplier GROUP BY s_nationkey
"""


def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 built-in XML source roundtrip (rowTag records): customer
    written as XML, read back with the ORIGINAL schema enforced (XML
    schema inference widens numerics — enforcing the source schema is
    the production pattern), aggregated identically to the parquet
    truth. min/max over c_name pins string fidelity through XML
    entity escaping; the decimal sum pins numeric fidelity through the
    text encoding.

    100 TB note: XML is an ingest format, not a lake format — the
    roundtrip models reading third-party feeds; rowTag splitting is
    line-oblivious, so Spark parallelizes by file, making many medium
    files the scalable layout."""
    cust = load_table(spark, sf_dir, "customer")
    path = _tmp(sf_dir, "xml_customer")
    (
        cust.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "customers")
        .option("rowTag", "customer")
        .save(path)
    )
    back = (
        spark.read.schema(cust.schema)
        .format("xml")
        .option("rowTag", "customer")
        .load(path)
    )
    return back.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count("*").alias("n_customers"),
        dsum("c_acctbal", "sum_acctbal"),
        F.min("c_name").alias("first_name"),
        F.max("c_name").alias("last_name"),
    )


ORACLE_XML_ROUNDTRIP = f"""
SELECT c_mktsegment, c_nationkey,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS {_DEC})) AS DOUBLE) AS sum_acctbal,
       min(c_name) AS first_name,
       max(c_name) AS last_name
FROM customer GROUP BY c_mktsegment, c_nationkey
"""


def q_partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned parquet sink + partition-pruned read-back:
    orders written partitionBy(o_orderstatus), then read with a status
    filter that prunes to ONE partition directory (no data from the
    others is even opened — at 100 TB this is the difference between a
    full scan and a directory listing). The aggregate over the pruned
    read must match the same filter+aggregate on the original table."""
    orders = load_table(spark, sf_dir, "orders")
    path = _tmp(sf_dir, "part_orders")
    (
        orders.write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum("o_totalprice", "sum_price"),
    )


ORACLE_PARTITIONED_SINK = f"""
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS sum_price
FROM orders WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


def q_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction: a fragmented write (64 tiny files) is
    compacted into 4 by a coalesce rewrite — the maintenance job every
    streaming-ingest lake needs, since at 100 TB a million tiny files
    costs more in scan/task overhead than the data itself. coalesce(4)
    narrows partitions WITHOUT a shuffle (unlike repartition). The check
    proves the rewrite is lossless AND the file count actually dropped."""
    docs = load_table(spark, sf_dir, "documents")
    frag, compact = _tmp(sf_dir, "frag_docs"), _tmp(sf_dir, "compact_docs")
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).coalesce(4).write.mode("overwrite").parquet(compact)
    n_files = len([f for f in os.listdir(compact) if f.endswith(".parquet")])
    if n_files > 4:
        raise AssertionError(f"compaction produced {n_files} files, expected <= 4")
    back = spark.read.parquet(compact)
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
    )


ORACLE_COMPACTION = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(doc_id) AS min_doc
FROM documents GROUP BY lang
"""


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: the other columnar format Spark ships a native
    vectorized reader for. Same contract as the parquet paths — columnar
    scan, predicate pushdown, column pruning — proven lossless by
    aggregating the read-back against the original table's oracle."""
    customer = load_table(spark, sf_dir, "customer")
    path = _tmp(sf_dir, "orc_customer")
    customer.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        dsum("c_acctbal", "sum_acctbal"),
        F.min("c_custkey").alias("min_custkey"),
    )


ORACLE_ORC_ROUNDTRIP = f"""
SELECT c_mktsegment,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS {_DEC})) AS DOUBLE) AS sum_acctbal,
       min(c_custkey) AS min_custkey
FROM customer GROUP BY c_mktsegment
"""


def q_bucketed_join_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: write orders AND customer bucketed
    by the join key into the session catalog, then join them. With both
    sides bucketed the same way, the join is shuffle-free on the fact
    side — at 100 TB, pre-bucketing the lake's biggest tables turns every
    key-join against them from a full shuffle into a local zip of
    buckets. The aggregate must match the plain join on the originals."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    wh = _tmp(sf_dir, "bucketed_wh")
    # catalog table names carry the sf label (as the temp paths already
    # do): fixed global names would race across concurrent sessions /
    # sf dirs on DROP TABLE + saveAsTable
    sf = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_").replace("-", "_")
    for name, df, key in (
        (f"tmrs_b_orders_{sf}", orders, "o_custkey"),
        (f"tmrs_b_customer_{sf}", customer, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", os.path.join(wh, name))
            .saveAsTable(name)
        )
    bo = spark.table(f"tmrs_b_orders_{sf}")
    bc = spark.table(f"tmrs_b_customer_{sf}")
    joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
    )


ORACLE_BUCKETED_JOIN = f"""
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: orders written Hive-partitioned by
    status, joined against a FILTERED tiny dimension. Catalyst inserts a
    runtime pruning subquery (``dynamicpruningexpression`` in the scan's
    PartitionFilters — asserted in test_plans), so only the partition
    directories whose status survives the dim filter are ever read. At
    100 TB this is the difference between scanning one partition and the
    whole fact table when the selective predicate lives on the dim."""
    orders = load_table(spark, sf_dir, "orders")
    path = _tmp(sf_dir, "dpp_orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("F", 1.0), ("O", 0.1), ("P", 0.2)], "status string, weight double"
    )
    return (
        fact.join(dim.filter(F.col("weight") > 0.5), fact.o_orderstatus == F.col("status"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "sum_price"))
    )


ORACLE_DPP_JOIN = f"""
WITH dim(status, weight) AS (VALUES ('F', 1.0), ('O', 0.1), ('P', 0.2))
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS {_DEC})) AS DOUBLE) AS sum_price
FROM orders JOIN dim ON o_orderstatus = dim.status AND weight > 0.5
GROUP BY o_orderpriority
"""


def _linefile_spec() -> QuerySpec:
    from tiny_mapreduce_rpc_server_spark.sources.linefile import (
        ORACLE_LINEFILE_WORDCOUNT,
        q_linefile_wordcount,
    )

    return QuerySpec(
        "linefile_wordcount",
        q_linefile_wordcount,
        ORACLE_LINEFILE_WORDCOUNT,
        ("source", "linefile", "datasource-v2"),
    )


def _kv_textsink_spec() -> QuerySpec:
    from tiny_mapreduce_rpc_server_spark.sources.linefile import (
        ORACLE_KV_TEXTSINK,
        q_kv_textsink_roundtrip,
    )

    return QuerySpec(
        "kv_textsink_roundtrip",
        q_kv_textsink_roundtrip,
        ORACLE_KV_TEXTSINK,
        ("sink", "linefile", "datasource-v2"),
    )


def q_schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet snapshots: an old snapshot written
    WITHOUT ``o_totalprice`` and a new snapshot WITH it are read back as
    one table via ``mergeSchema`` — the widened column is NULL for
    old-snapshot rows. This is the append-only lakehouse evolution rule
    (add-nullable-column), and the read-side merge is what makes ten
    years of heterogeneous files queryable as one 100 TB table without
    rewriting history.

    The aggregate distinguishes row count from non-null count, so a
    regression that drops old rows OR back-fills the column would both
    fail the oracle (which reproduces the snapshot split with CASE).
    """
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderpriority"
    )
    new = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = _tmp(sf_dir, "evo_orders")
    old.write.mode("overwrite").parquet(f"{base}/snap=0")
    new.write.mode("overwrite").parquet(f"{base}/snap=1")
    back = spark.read.option("mergeSchema", "true").parquet(base)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_rows"),
        F.count("o_totalprice").alias("n_with_price"),
        dsum("o_totalprice", "sum_price"),
    )


ORACLE_SCHEMA_EVOLUTION = f"""
SELECT o_orderpriority,
       count(*) AS n_rows,
       count(*) FILTER (WHERE o_orderkey % 2 = 1) AS n_with_price,
       CAST(sum(CASE WHEN o_orderkey % 2 = 1
                     THEN CAST(o_totalprice AS {_DEC}) END) AS DOUBLE)
         AS sum_price
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Z-order layout: multi-dimensional clustering for data skipping
# ---------------------------------------------------------------------------

_Z_BITS = 10  # 10 bits per dimension -> 20-bit z index
_Z_BUCKET_SHIFT = 10  # 1024 z buckets, comparable to the 1024 naive buckets


def _z_expr(x: str, y: str) -> str:
    """Bit-interleaved z-curve index, identical SQL text for both engines
    (shift/and/add only — generated from the same constants)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER clustering effectiveness, measured: bucket lineitem rows
    (a) by a bit-interleaved z-curve over (partkey, orderkey) and (b) by
    partkey alone (the naive single-column sort), then report the
    row-weighted average per-DIMENSION min/max range width per bucket —
    the quantity file statistics prune by.

    The tradeoff this makes visible: single-column ordering gives
    width-1 partkey ranges but FULL-range orderkey boxes (a predicate on
    orderkey prunes nothing); z-order widens partkey ranges to ~2^(B/2)
    but shrinks orderkey ranges by the same factor, so predicates on
    EITHER dimension prune ~sqrt-many buckets. Row-weighting makes the
    two layouts comparable at equal bucket granularity (1024 each).

    At 100 TB this is the maintenance operator behind OPTIMIZE ZORDER BY
    in lakehouse tables: compute z, repartitionByRange(z), write — the
    arithmetic bucketing here stands in for file assignment so the
    oracle can check the exact same computation. One scan per layout,
    aggregates partial map-side; nothing after the groupBy exceeds
    bucket granularity.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % (1 << _Z_BITS)).alias("x"),
        (F.col("l_orderkey") % (1 << _Z_BITS)).alias("y"),
    )
    z = F.expr(_z_expr("x", "y"))
    withz = li.select("x", "y", z.alias("z"))

    def width_summary(df: DataFrame, bucket, layout: str) -> DataFrame:
        bb = df.groupBy(bucket.alias("b")).agg(
            F.count("*").alias("n"),
            F.min("x").alias("x0"),
            F.max("x").alias("x1"),
            F.min("y").alias("y0"),
            F.max("y").alias("y1"),
        )
        xw = F.col("x1") - F.col("x0") + 1
        yw = F.col("y1") - F.col("y0") + 1
        n = F.col("n")
        return bb.select(
            n, (xw * n).alias("xwn"), (yw * n).alias("ywn")
        ).agg(
            F.lit(layout).alias("layout"),
            F.count("*").alias("n_buckets"),
            (F.sum("xwn").cast("double") / F.sum("n")).alias("avg_x_width"),
            (F.sum("ywn").cast("double") / F.sum("n")).alias("avg_y_width"),
        )

    zsum = width_summary(
        withz, F.shiftrightunsigned("z", _Z_BUCKET_SHIFT), "zorder"
    )
    nsum = width_summary(withz, F.col("x"), "naive_partkey")
    return zsum.unionAll(nsum)


ORACLE_LAYOUT_ZORDER = f"""
WITH li AS (
  SELECT l_partkey % {1 << _Z_BITS} AS x, l_orderkey % {1 << _Z_BITS} AS y
  FROM lineitem),
wz AS (SELECT x, y, {_z_expr("x", "y")} AS z FROM li),
zb AS (
  SELECT z >> {_Z_BUCKET_SHIFT} AS b, count(*) AS n,
         min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1
  FROM wz GROUP BY b),
nb AS (
  SELECT x AS b, count(*) AS n,
         min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1
  FROM wz GROUP BY b),
zs AS (
  SELECT 'zorder' AS layout, count(*) AS n_buckets,
         sum((x1 - x0 + 1) * n)::DOUBLE / sum(n) AS avg_x_width,
         sum((y1 - y0 + 1) * n)::DOUBLE / sum(n) AS avg_y_width
  FROM zb),
ns AS (
  SELECT 'naive_partkey' AS layout, count(*) AS n_buckets,
         sum((x1 - x0 + 1) * n)::DOUBLE / sum(n) AS avg_x_width,
         sum((y1 - y0 + 1) * n)::DOUBLE / sum(n) AS avg_y_width
  FROM nb)
SELECT * FROM zs UNION ALL SELECT * FROM ns
"""


# Range-partition count for the total-order sort. Sort parallelism ==
# this number (each range is one external-sort task), so it must be >=
# the session's cores; at cluster scale it is sized to data/target-file
# size, not cores. Round-7 stage accounting measured the 8-file setting
# running the sf1* sort on 8 of 32 cores (~47 s executor time in 8
# tasks); 32 restores full-width sorting at identical semantics (the
# oracle gates the file count on [1, requested], not equality).
_SORT_FILES = 32


def q_total_order_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed total-order sort (the terasort shape) with the sorted
    layout VERIFIED from the files it produced.

    Reference parity: a sorted global output is the reference engine's
    defining product — map-side sort/spill/k-way merge (SURVEY §2 W1-W5)
    feeding a reduce-side tiered merge (R1-R5) yields reducer files that
    are each sorted and span disjoint key ranges. Spark's equivalent is
    ``repartitionByRange`` (sampled range boundaries, one shuffle) +
    ``sortWithinPartitions`` (external sort per partition, spilling like
    W3/R3) + a parquet write: N output files, each internally sorted,
    with globally disjoint key ranges. That pair of properties IS total
    order, so the check reads the files back and proves (a) per-file
    [min,max] ranges don't overlap (0 expected) and (b) nothing was
    dropped or duplicated (count + key checksum + global min/max match
    the source table).

    Scale: the sort is one range-exchange over the full table — the
    unavoidable shuffle of a total sort — with boundary sampling reading
    only ~100 rows/partition. The verification aggregates per FILE
    (``input_file_name`` is a metadata column), so the post-sort pass is
    a single scan folding to ``_SORT_FILES`` rows; the boundary-overlap
    window runs on those N driver-small rows, not on data.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        # (orderkey, linenumber) is the table's unique key; linenumber
        # is 1..7, so 8*orderkey+linenumber is a unique, order-preserving
        # single BIGINT sort key (keeps the range compare scalar)
        (F.col("l_orderkey").cast("long") * 8 + F.col("l_linenumber")).alias(
            "sort_key"
        )
    )
    path = _tmp(sf_dir, "sorted_li")
    (
        li.repartitionByRange(_SORT_FILES, "sort_key")
        .sortWithinPartitions("sort_key")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).select(
        "sort_key",
        # r12: substring_index instead of regexp_extract — the verify
        # scan evaluates this per ROW, and the regexp engine cost
        # dominated it (order-balanced A/B at sf0.1: whole query 1.47 ->
        # 1.24 s median, identical output; guide §1.2 per-task work)
        F.substring_index(F.input_file_name(), "/", -1).alias("f"),
    )
    per_file = back.groupBy("f").agg(
        F.count("*").alias("n"),
        F.sum("sort_key").alias("s"),
        F.min("sort_key").alias("lo"),
        F.max("sort_key").alias("hi"),
    )
    w = Window.orderBy("lo")  # N-file summary rows, not data rows
    flagged = per_file.select(
        "n",
        "s",
        "lo",
        "hi",
        F.when(F.lag("hi").over(w) >= F.col("lo"), 1).otherwise(0).alias("ov"),
    )
    return flagged.agg(
        # Spark writes no parquet file for an empty non-first partition,
        # and skewed boundary sampling can legitimately produce an empty
        # range partition — so gate the file count on its valid interval
        # [1, requested], not on equality with the constant
        F.when(
            (F.count("*") >= 1) & (F.count("*") <= _SORT_FILES), 1
        )
        .otherwise(0)
        .cast("long")
        .alias("n_files_ok"),
        F.sum("n").alias("total_rows"),
        F.sum("ov").alias("n_overlapping_file_pairs"),
        F.sum("s").alias("key_checksum"),
        F.min("lo").alias("global_min_key"),
        F.max("hi").alias("global_max_key"),
    )


# The file boundaries are sample-derived (not oracle-reproducible), but
# every reported fact is closed-form: disjointness must hold exactly,
# the file count must land in [1, requested], and the totals must equal
# the source table's.
ORACLE_TOTAL_ORDER_SORT = f"""
SELECT CAST(1 AS BIGINT) AS n_files_ok,
       count(*) AS total_rows,
       CAST(0 AS BIGINT) AS n_overlapping_file_pairs,
       CAST(sum(k) AS BIGINT) AS key_checksum,
       min(k) AS global_min_key,
       max(k) AS global_max_key
FROM (SELECT l_orderkey::BIGINT * 8 + l_linenumber AS k FROM lineitem)
"""


_LAYOUT_TABLES = ("lineitem", "orders", "documents", "embeddings")


def q_file_layout_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-layout audit: per input FILE, the row count the scan
    layer actually delivers — the small-files / skewed-files report a
    pipeline runs before tuning ``maxPartitionBytes``. Engine side
    attributes rows to files with ``input_file_name()`` (a metadata
    column, no extra I/O); the oracle reads the parquet FOOTERS via
    DuckDB's ``parquet_file_metadata``, so this query cross-checks the
    scan layer against the file format's own metadata — a scan that
    dropped or duplicated rows per file would hash-mismatch here."""
    parts = []
    for t in _LAYOUT_TABLES:
        df = load_table(spark, sf_dir, t)
        parts.append(
            df.select(
                F.lit(t).alias("table_name"),
                F.regexp_extract(F.input_file_name(), r"([^/]+)$", 1).alias(
                    "file_name"
                ),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("table_name", "file_name")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("table_name", "file_name")
    )


def _oracle_file_layout(sf_dir_placeholder: str | None = None) -> str:
    # parquet_file_metadata needs literal paths, so this oracle bakes in
    # the gate's sf dir: the driver runs at sf0.01, and the local gate's
    # override (SPARK_GRAFT_ORACLE_SF) is honored the same way
    if sf_dir_placeholder is None:
        sf_dir_placeholder = os.environ.get(
            "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
        ).rstrip("/")
    parts = [
        f"""SELECT '{t}' AS table_name,
       regexp_extract(file_name, '([^/]+)$', 1) AS file_name,
       num_rows AS n_rows
FROM parquet_file_metadata('{sf_dir_placeholder}/{t}.parquet')"""
        for t in _LAYOUT_TABLES
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY table_name, file_name"


FORMAT_QUERIES = [
    QuerySpec(
        "file_layout_report",
        q_file_layout_report,
        _oracle_file_layout(),
        ("ext", "layout", "ops"),
    ),
    _linefile_spec(),
    _kv_textsink_spec(),
    QuerySpec(
        "compaction_roundtrip",
        q_compaction_roundtrip,
        ORACLE_COMPACTION,
        ("sink", "compaction"),
    ),
    QuerySpec(
        "partitioned_sink_roundtrip",
        q_partitioned_sink_roundtrip,
        ORACLE_PARTITIONED_SINK,
        ("sink", "partitioning"),
    ),
    QuerySpec(
        "csv_source_roundtrip",
        q_csv_roundtrip,
        ORACLE_CSV_ROUNDTRIP,
        ("source", "csv"),
    ),
    QuerySpec(
        "json_source_roundtrip",
        q_json_roundtrip,
        ORACLE_JSON_ROUNDTRIP,
        ("source", "json"),
    ),
    QuerySpec(
        "orc_source_roundtrip",
        q_orc_roundtrip,
        ORACLE_ORC_ROUNDTRIP,
        ("source", "orc"),
    ),
    QuerySpec(
        "xml_source_roundtrip",
        q_xml_roundtrip,
        ORACLE_XML_ROUNDTRIP,
        ("source", "xml"),
    ),
    QuerySpec(
        "bucketed_join_roundtrip",
        q_bucketed_join_roundtrip,
        ORACLE_BUCKETED_JOIN,
        ("source", "bucketing", "join"),
    ),
    QuerySpec(
        "dpp_partitioned_join",
        q_dpp_partitioned_join,
        ORACLE_DPP_JOIN,
        ("source", "partitioning", "dpp"),
    ),
    QuerySpec(
        "total_order_sort",
        q_total_order_sort,
        ORACLE_TOTAL_ORDER_SORT,
        ("layout", "sort", "scale"),
        bench=True,  # round-11 paired-gate sentinel: the work-heavy
        # range-partitioned global sort (SCALING grower class)
    ),
    QuerySpec(
        "layout_zorder",
        q_layout_zorder,
        ORACLE_LAYOUT_ZORDER,
        ("layout", "zorder", "scale"),
    ),
    QuerySpec(
        "schema_evolution_roundtrip",
        q_schema_evolution_roundtrip,
        ORACLE_SCHEMA_EVOLUTION,
        ("source", "schema-evolution"),
    ),
]


def q_csv_malformed_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode malformed-record handling, proven end to end: a
    CSV is generated from nation with every 5th row deliberately
    corrupted (a non-numeric token in the INT region column), read back
    with an explicit schema + ``columnNameOfCorruptRecord``, and the
    report proves the reader (a) quarantined exactly the corrupted rows
    into ``_corrupt_record``, (b) still parsed the leading valid fields
    of those rows, and (c) parsed every clean row fully. This is the
    ingest contract at 100 TB: one bad scrape line must cost one row in
    the quarantine column, never a failed job (FAILFAST) or a silent
    drop (DROPMALFORMED).

    The writer and reader are both distributed (one task per split);
    the oracle computes the identical report closed-form from nation."""
    nat = load_table(spark, sf_dir, "nation")
    bad = F.col("n_nationkey") % 5 == 0
    line = F.when(
        bad,
        F.concat_ws(",", F.col("n_nationkey"), F.col("n_name"), F.lit("x")),
    ).otherwise(
        F.concat_ws(
            ",", F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey")
        )
    )
    path = _tmp(sf_dir, "malformed_csv")
    nat.select(line.alias("value")).write.mode("overwrite").text(path)
    back = (
        spark.read.schema(
            "k INT, nm STRING, r INT, _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    return back.agg(
        F.count("*").alias("n_rows"),
        F.count("_corrupt_record").alias("n_corrupt"),
        F.count(F.when(F.col("_corrupt_record").isNull(), 1)).alias("n_good"),
        F.sum("r").alias("sum_region_good"),
        F.sum("k").alias("sum_key_all"),
    )


ORACLE_CSV_MALFORMED = """
SELECT count(*) AS n_rows,
       count(CASE WHEN n_nationkey % 5 = 0 THEN 1 END) AS n_corrupt,
       count(CASE WHEN n_nationkey % 5 <> 0 THEN 1 END) AS n_good,
       CAST(sum(CASE WHEN n_nationkey % 5 <> 0 THEN n_regionkey END) AS BIGINT)
         AS sum_region_good,
       CAST(sum(n_nationkey) AS BIGINT) AS sum_key_all
FROM nation
"""

FORMAT_QUERIES.append(
    QuerySpec(
        "csv_malformed_handling",
        q_csv_malformed_handling,
        ORACLE_CSV_MALFORMED,
        ("source", "csv", "quarantine"),
    )
)
