"""[EXT] Declarative data-quality audit: constraint + referential checks.

No reference counterpart (SURVEY §2.11). The dbt-test / Great
Expectations analog: a fixed suite of declared invariants evaluated in
one pass each, reported as (constraint, rows checked, violations) —
the table a pipeline publishes before promoting a snapshot.

Shapes: column constraints are scan + count-filter aggregates (one scan
per table, partial map-side); referential checks are LEFT ANTI joins —
at 100 TB the parent key side broadcasts when it fits, else it's one
hash equi-join; nothing here is ever quadratic. Violation counts are
BIGINT in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiny_mapreduce_rpc_server_spark.sources import load_table
from tiny_mapreduce_rpc_server_spark.spec import QuerySpec


def q_dq_constraint_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the declared invariant suite; one output row per
    check. A healthy corpus reports zero violations everywhere —
    which is itself the assertion, since a violation count is data, not
    an exception."""
    docs = load_table(spark, sf_dir, "documents")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def check(name: str, df: DataFrame, bad) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count("*").alias("n_checked"),
            F.count(F.when(bad, 1)).alias("n_violations"),
        )

    c1 = check(
        "documents.n_chars_matches_text",
        docs,
        F.col("n_chars") != F.length("text"),
    )
    c2 = check("lineitem.quantity_positive", li, ~(F.col("l_quantity") > 0))
    c3 = check(
        "orders.totalprice_positive", orders, ~(F.col("o_totalprice") > 0)
    )
    orphan_orders = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_anti"
    )
    c4 = orders.agg(
        F.lit("orders.custkey_references_customer").alias("check_name"),
        F.count("*").alias("n_checked"),
    ).crossJoin(orphan_orders.agg(F.count("*").alias("n_violations")))
    orphan_items = li.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_anti",
    )
    c5 = li.agg(
        F.lit("lineitem.orderkey_references_orders").alias("check_name"),
        F.count("*").alias("n_checked"),
    ).crossJoin(orphan_items.agg(F.count("*").alias("n_violations")))
    return (
        c1.unionByName(c2)
        .unionByName(c3)
        .unionByName(c4)
        .unionByName(c5)
        .orderBy("check_name")
    )


ORACLE_DQ_CONSTRAINT_CHECK = """
SELECT 'documents.n_chars_matches_text' AS check_name,
       count(*) AS n_checked,
       count(*) FILTER (WHERE n_chars <> length(text)) AS n_violations
FROM documents
UNION ALL
SELECT 'lineitem.quantity_positive', count(*),
       count(*) FILTER (WHERE NOT (l_quantity > 0))
FROM lineitem
UNION ALL
SELECT 'orders.totalprice_positive', count(*),
       count(*) FILTER (WHERE NOT (o_totalprice > 0))
FROM orders
UNION ALL
SELECT 'orders.custkey_references_customer',
       (SELECT count(*) FROM orders),
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'lineitem.orderkey_references_orders',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
ORDER BY check_name
"""


DQ_QUERIES: list[QuerySpec] = [
    QuerySpec(
        "dq_constraint_check",
        q_dq_constraint_check,
        ORACLE_DQ_CONSTRAINT_CHECK,
        ("ext", "quality", "dq"),
    ),
]
