"""Skew-resistant aggregation: explicit two-phase (salted) group-by.

At 100 TB a handful of hot keys (one user producing 1% of all events)
turn a single-shuffle group-by into a straggler stage: every row of the
hot key lands on one reducer. AQE's skew handling only splits *join*
partitions; for aggregations the classic fix is salting — group by
(key, salt) first so the hot key's rows spread over S reducers, then
re-aggregate the S partial rows per key.

The salt here is ``event_id % S`` — deterministic (reproducible plans,
oracle-checkable) and uniform (event_id is a dense sequence). Partial
sums stay DECIMAL through both phases, so the two-phase result is
bit-identical to the single-phase one — associativity is exact, unlike
double-precision sums.

This is also exactly the reference's shuffle story generalized: its
StringPartitioner (``StringPartitioner.h:11-27``) hashes the raw key to
pick 1 of 5 reducers, with no answer for a hot key; salting is the
scale-correct extension of that same hash-routing idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiny_mapreduce_rpc_server_spark.sources import load_table
from tiny_mapreduce_rpc_server_spark.spec import QuerySpec

_SALTS = 16
_DEC = "decimal(38,6)"


def salted_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event count and exact value sum via salted two-phase
    aggregation. Phase 1 shuffles on (user_id, salt) — hot users spread
    over 16 partitions; phase 2 shuffles only the tiny partial table.
    Result is identical to a direct group-by (the oracle does it the
    plain way)."""
    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", F.col("event_id") % _SALTS)
        .groupBy("user_id", "salt")
        .agg(
            F.count("*").alias("pc"),
            F.sum(F.col("value").cast(_DEC)).alias("pv"),
        )
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("pc").alias("n_events"),
            F.sum("pv").cast("double").alias("sum_value"),
        )
        .orderBy("user_id")
    )


ORACLE_SALTED = f"""
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(value AS {_DEC})) AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id
ORDER BY user_id
"""


SKEW_QUERIES: list[QuerySpec] = [
    QuerySpec("salted_user_stats", salted_user_stats, ORACLE_SALTED, ("scale", "skew")),
]
