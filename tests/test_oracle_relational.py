"""Oracle tests: every registered query hash-matches DuckDB at sf0.01.

This mirrors the driver's t2 gate (CORRECTNESS_r{N}.json) so failures
surface locally first.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_utils import compare
from tiny_mapreduce_rpc_server_spark.registry import all_queries

_SPECS = [s for s in all_queries().values() if s.oracle is not None]


@pytest.mark.parametrize("spec", _SPECS, ids=[s.name for s in _SPECS])
def test_oracle_match(spark, spec):
    df = spec.fn(spark, SF_ORACLE)
    compare(df, spec.oracle, SF_ORACLE)


def test_rows_only_queries_run(spark):
    for spec in all_queries().values():
        if spec.oracle is None:
            n = spec.fn(spark, SF_ORACLE).count()
            assert n >= 0
