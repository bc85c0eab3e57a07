"""Partition-count invariance: the engine's bit-exactness claims.

Every float-producing query in this repo argues determinism from
order-independent arithmetic (decimal moments, integer ratios, sorted
folds, portable LUTs). The oracle gate proves equality against DuckDB at
ONE partitioning; this file proves the claim that actually matters on a
cluster — the result is identical under a different shuffle layout,
where partial-aggregation order, merge order, and task scheduling all
change. A query whose floats survive DuckDB comparison by luck (summation
order happening to match) fails here.

Each query runs under the session's shuffle_partitions (8) and again
under 3 (conf flipped around the second collect — Spark reads the conf
at plan time, so laziness is respected by collecting eagerly inside each
regime), comparing full canonical rowsets.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_utils import _rowset
from tiny_mapreduce_rpc_server_spark.registry import all_queries

# The queries whose output contains derived floats and whose plans
# shuffle (per-row-only queries are trivially invariant):
FLOAT_SHUFFLE_QUERIES = [
    "covar_corr",
    "ols_trend",
    "weighted_median",
    "roc_auc",
    "gap_fill_interpolate",
    "quality_percentile_filter",
    "item_cooccurrence",
    "negative_sampling",
    "split_leakage_check",
    "theil_sen_trend",
    "ingest_anomaly",
    "text_tf_idf",
]

_CONF = "spark.sql.shuffle.partitions"


def _rows(spark, name):
    df = all_queries()[name].fn(spark, SF_ORACLE)
    return _rowset(df.columns, [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("name", FLOAT_SHUFFLE_QUERIES)
def test_partition_count_invariance(spark, name):
    base = _rows(spark, name)
    prev = spark.conf.get(_CONF)
    spark.conf.set(_CONF, "3")
    try:
        alt = _rows(spark, name)
    finally:
        spark.conf.set(_CONF, prev)
    assert base == alt, f"{name}: result depends on shuffle partitioning"
