"""Central query registry: every operator the engine claims, with oracle."""

from __future__ import annotations

from tiny_mapreduce_rpc_server_spark.operators.relational import RELATIONAL_QUERIES
from tiny_mapreduce_rpc_server_spark.spec import QuerySpec


def all_queries() -> dict[str, QuerySpec]:
    specs: list[QuerySpec] = []
    specs.extend(RELATIONAL_QUERIES)
    try:
        from tiny_mapreduce_rpc_server_spark.operators.tpch import TPCH_QUERIES

        specs.extend(TPCH_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.temporal import (
            TEMPORAL_QUERIES,
        )

        specs.extend(TEMPORAL_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.sampling import (
            SAMPLING_QUERIES,
        )

        specs.extend(SAMPLING_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.stats import STATS_QUERIES

        specs.extend(STATS_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.skew import SKEW_QUERIES

        specs.extend(SKEW_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.dedup import DEDUP_QUERIES

        specs.extend(DEDUP_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.similarity import (
            SIMILARITY_QUERIES,
        )

        specs.extend(SIMILARITY_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.text import TEXT_QUERIES

        specs.extend(TEXT_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.multimodal import (
            MULTIMODAL_QUERIES,
        )

        specs.extend(MULTIMODAL_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.ml import ML_QUERIES

        specs.extend(ML_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.graph import (
            GRAPH_QUERIES,
        )

        specs.extend(GRAPH_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.udf_surface import (
            UDF_SURFACE_QUERIES,
        )

        specs.extend(UDF_SURFACE_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.sources.formats import (
            FORMAT_QUERIES,
        )

        specs.extend(FORMAT_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.operators.analytic import (
            ANALYTIC_QUERIES,
        )

        specs.extend(ANALYTIC_QUERIES)
    except ImportError:
        pass
    try:
        from tiny_mapreduce_rpc_server_spark.streaming import STREAMING_QUERIES

        specs.extend(STREAMING_QUERIES)
    except ImportError:
        pass
    out: dict[str, QuerySpec] = {}
    for s in specs:
        if s.name in out:
            raise ValueError(f"duplicate query name {s.name}")
        out[s.name] = s
    return out
