"""Statistical aggregates: exact quantiles and sketch-based approximates.

The reference's only aggregate is sum-by-key (SURVEY §2.6); a warehouse
surface needs distribution statistics too. Two tiers:

- *exact* quantiles (``percentile`` — type-7 linear interpolation, the
  same definition DuckDB's ``quantile_cont`` uses, so it oracle-matches
  exactly). Exact percentile needs the group's values together — fine
  per-group, the shuffle is by group key.
- *approximate* distinct counts (HyperLogLog++ via
  ``approx_count_distinct``): the 100 TB path — fixed-size sketch,
  map-side combinable, one narrow shuffle regardless of cardinality.
  Sketch results are engine-specific, so this is a rows-only check (the
  exact companion `distinct` is the oracle-matched one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiny_mapreduce_rpc_server_spark.sources import load_table
from tiny_mapreduce_rpc_server_spark.spec import QuerySpec


def quantiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartiles + median of quantity and extended price per return flag
    (exact, interpolated)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.25)").alias("qty_p25"),
            F.expr("percentile(l_quantity, 0.5)").alias("qty_p50"),
            F.expr("percentile(l_quantity, 0.75)").alias("qty_p75"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("price_p50"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_QUANTILES = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS qty_p25,
       quantile_cont(l_quantity, 0.5)  AS qty_p50,
       quantile_cont(l_quantity, 0.75) AS qty_p75,
       quantile_cont(l_extendedprice, 0.5) AS price_p50
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event type at 2% relative error — the
    sketch path for count-distinct at 100 TB (constant memory, map-side
    merge; an exact countDistinct shuffles every distinct value)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
        .orderBy("event_type")
    )


STATS_QUERIES: list[QuerySpec] = [
    QuerySpec("quantiles_by_flag", quantiles_by_flag, ORACLE_QUANTILES, ("stats", "quantile")),
    QuerySpec("approx_distinct_users", approx_distinct_users, None, ("stats", "sketch")),
]
