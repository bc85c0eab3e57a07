"""Data-layout tests: the storage-side half of the 100 TB discipline.

A 100 TB table is only queryable if the layout does part of the work:
directory partitioning lets the scan skip whole partitions (pruning),
and bucketing pre-shuffles a table ONCE at write time so every
subsequent equi-join/aggregation on the bucket key runs shuffle-free.
These tests prove both behaviors end-to-end through our sinks.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.test_plans import plan
from tiny_mapreduce_rpc_server_spark.sources import load_table
from tiny_mapreduce_rpc_server_spark.sources.sinks import write_parquet


def test_partitioned_write_prunes(spark, tmp_path):
    """A filter on the partition column must become a PartitionFilter
    (directory skip), not a row filter over the full scan."""
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "li_part")
    write_parquet(li, out, partition_by=["l_returnflag"])

    back = spark.read.parquet(out).filter("l_returnflag = 'R'")
    p = plan(spark, back)
    assert "PartitionFilters: [isnotnull(l_returnflag" in p.replace("#", "") or (
        "PartitionFilters" in p and "l_returnflag" in p.split("PartitionFilters", 1)[1][:120]
    ), p
    # and the pruned read returns exactly the R rows
    expect = li.filter("l_returnflag = 'R'").count()
    assert back.count() == expect


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with NO
    exchange — the write-once/join-forever co-location that replaces a
    per-query shuffle of the fact table."""
    orders = load_table(spark, SF_ORACLE, "orders")
    li = load_table(spark, SF_ORACLE, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a previously interrupted run can leave the managed location behind
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    joined = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders").hint("merge"),
            spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey,
        )
        .groupBy("o_orderstatus")
        .agg({"l_quantity": "sum"})
    )
    p = plan(spark, joined)
    assert "SortMergeJoin" in p, p
    # neither join side may shuffle: the only exchange allowed is the
    # final aggregation's (on o_orderstatus)
    assert "hashpartitioning(l_orderkey" not in p, p
    assert "hashpartitioning(o_orderkey" not in p, p
    # correctness: same result as the plain join
    expect = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg({"l_quantity": "sum"})
        .collect()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expect))


def test_sorted_kv_text_sink_contract(spark, tmp_path):
    """The reference's output contract via our sink: N files, each
    key-sorted, value persisted."""
    from tiny_mapreduce_rpc_server_spark.sources.sinks import write_sorted_kv_text

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "lang")
    out = str(tmp_path / "kv")
    write_sorted_kv_text(docs, out, "lang", "doc_id", num_partitions=5)

    import glob

    files = sorted(glob.glob(out + "/part-*"))
    # hash(key) % 5 routing: ≤5 files (empty partitions write no file)
    assert 1 <= len(files) <= 5
    seen = 0
    for f in files:
        with open(f) as fh:
            keys = [line.split(" ", 1)[0] for line in fh if line.strip()]
        assert keys == sorted(keys), f"{f} not key-sorted"
        seen += len(keys)
    assert seen == docs.count()


def test_parse_bytes_handles_spark_conf_suffixes():
    from tiny_mapreduce_rpc_server_spark.sources import _parse_bytes

    assert _parse_bytes("134217728b", 0) == 128 * 1024 * 1024
    assert _parse_bytes("128m", 0) == 128 * 1024 * 1024
    assert _parse_bytes("64MB", 0) == 64 * 1024 * 1024
    assert _parse_bytes("4194304", 0) == 4 * 1024 * 1024
    assert _parse_bytes("1g", 0) == 1024**3
    assert _parse_bytes("garbage", 7) == 7


def test_scan_estimate_models_packing_and_bytes_per_core(spark, tmp_path):
    """The estimator must reproduce BOTH FilePartition adjustments:
    openCost packing (many tiny files -> FEW partitions, so spread()
    still widens them) and the bytesPerCore shrink (est never lags far
    below Spark's actual plan). Pinned against Spark's real planning."""
    from tiny_mapreduce_rpc_server_spark.sources import (
        _estimated_scan_partitions,
        load_table,
    )

    docs = load_table(spark, SF_ORACLE, "documents")
    frag = str(tmp_path / "frag")
    docs.repartition(64).write.parquet(frag)
    df = spark.read.parquet(frag)
    est = _estimated_scan_partitions(df)
    actual = df.rdd.getNumPartitions()
    # 64 tiny files must NOT be reported as 64 scan partitions
    assert est < 64
    assert abs(est - actual) <= max(2, actual // 2), (est, actual)

    single = load_table(spark, SF_ORACLE, "lineitem")
    est_s = _estimated_scan_partitions(single)
    act_s = single.rdd.getNumPartitions()
    assert abs(est_s - act_s) <= max(2, act_s // 2), (est_s, act_s)


def test_paired_sentinels_are_oracle_backed_bench_queries():
    """bench.py's paired gate silently skips a sentinel whose name no
    longer resolves to an oracle-backed bench query (deliberate
    fault-tolerance at run time) — so pin the wiring here instead: every
    PAIRED_SENTINELS entry must exist in the registry, be a bench
    headliner, and carry a DuckDB oracle."""
    import bench
    from tiny_mapreduce_rpc_server_spark.registry import all_queries

    q = all_queries()
    assert len(bench.PAIRED_SENTINELS) >= 4
    for name in bench.PAIRED_SENTINELS:
        assert name in q, name
        assert q[name].bench, f"{name} is not a bench headliner"
        assert q[name].oracle, f"{name} has no oracle to pair against"
