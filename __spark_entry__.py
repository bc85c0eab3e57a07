"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``tiny_mapreduce_rpc_server_spark``
package; this module just adapts its query registry to the contract.

Exactly 3 of the 237 registered queries are deliberately rows-only
(absent from ``oracle_sql()``), each with a deterministic bounds test
instead (tests/test_invariants.py):

- ``approx_distinct_users`` — an HLL *estimate*; no SQL oracle can
  reproduce Spark's sketch bit-for-bit, so the test pins the published
  error bound against the exact distinct count.
- ``dedup_minhash_ml`` / ``ann_ml_brp`` — Spark-ML's MinHashLSH /
  BucketedRandomProjectionLSH internals (seeded hash families) are not
  SQL-expressible; tests bound them against the exact-join ground truth.

They are intentionally kept OUT of the driver's first-50 correctness
window so every slot records a hard oracle comparison.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tiny_mapreduce_rpc_server_spark.registry import all_queries  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the reference's own default job (word
    count with sorted output — ``Mapper.h:264-273`` + SURVEY §2.6) over
    the documents table."""
    return all_queries()["wordcount"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ [EXT])."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
