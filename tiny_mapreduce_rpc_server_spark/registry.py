"""Central query registry: every operator the engine claims, with oracle.

Imports are deliberately NOT guarded: a syntax error or missing symbol in
any operator module must crash the registry (and therefore the driver's
smoke check, the bench, and the tests) instead of silently shrinking
``queries()``. Genuinely optional dependencies (e.g. PIL) are gated
inside the operator modules themselves, at call time.
"""

from __future__ import annotations

from tiny_mapreduce_rpc_server_spark.operators.analytic import ANALYTIC_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.dedup import DEDUP_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.graph import GRAPH_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.ml import ML_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.multimodal import MULTIMODAL_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.relational import RELATIONAL_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.sampling import SAMPLING_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.similarity import SIMILARITY_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.skew import SKEW_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.stats import STATS_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.temporal import TEMPORAL_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.text import TEXT_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.tpch import TPCH_QUERIES
from tiny_mapreduce_rpc_server_spark.operators.udf_surface import UDF_SURFACE_QUERIES
from tiny_mapreduce_rpc_server_spark.sources.formats import FORMAT_QUERIES
from tiny_mapreduce_rpc_server_spark.spec import QuerySpec
from tiny_mapreduce_rpc_server_spark.streaming import STREAMING_QUERIES

_ALL_GROUPS: list[list[QuerySpec]] = [
    RELATIONAL_QUERIES,
    TPCH_QUERIES,
    TEMPORAL_QUERIES,
    SAMPLING_QUERIES,
    STATS_QUERIES,
    SKEW_QUERIES,
    DEDUP_QUERIES,
    SIMILARITY_QUERIES,
    TEXT_QUERIES,
    MULTIMODAL_QUERIES,
    ML_QUERIES,
    GRAPH_QUERIES,
    UDF_SURFACE_QUERIES,
    FORMAT_QUERIES,
    ANALYTIC_QUERIES,
    STREAMING_QUERIES,
]


def all_queries() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for group in _ALL_GROUPS:
        for s in group:
            if s.name in out:
                raise ValueError(f"duplicate query name {s.name}")
            out[s.name] = s
    return out
