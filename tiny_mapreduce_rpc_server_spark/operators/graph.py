"""Graph clustering for dedup: connected components over near-dup pairs.

After candidate generation (LSH / inverted-index Jaccard — dedup.py), a
production dedup pipeline must turn the PAIR list into CLUSTER
assignments and pick one canonical document per cluster. Pairs are a
graph; clusters are its connected components. The reference has no
graph operators at all (SURVEY.md §2.11); this is a capability-gap fill
[EXT] and the step that makes the dedup family end-to-end usable.

Algorithm: iterative min-label propagation on DataFrames —
``label(v) <- min(label(v), min over neighbors label(u))`` until
fixpoint. Each round is ONE hash-shuffle join (edges ⋈ labels on src)
plus a groupBy(dst) min; convergence needs O(cluster diameter) rounds,
and near-dup text clusters are shallow (dups of dups of one source), so
this terminates in a handful of rounds. ``localCheckpoint`` after every
round truncates the lineage so the plan stays O(1) deep instead of
growing per iteration — without it round N re-executes rounds 1..N-1.

100 TB notes: on a real cluster use ``spark.sparkContext.setCheckpointDir``
+ ``checkpoint()`` (fault-tolerant, survives executor loss) instead of
localCheckpoint; for graphs with high-diameter components switch to the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond") which converges in O(log n) rounds with the
same per-round join shape. The iterative driver loop is control flow
only — every data operation stays distributed; nothing is collected but
the single convergence counter per round.

Oracle: DuckDB ``WITH RECURSIVE`` transitive label propagation — the
fixpoint of the same recurrence, so results match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiny_mapreduce_rpc_server_spark.operators.dedup import (
    ORACLE_DEDUP_NGRAM_JACCARD,
    q_dedup_ngram_jaccard,
)
from tiny_mapreduce_rpc_server_spark.sources import load_table
from tiny_mapreduce_rpc_server_spark.spec import QuerySpec

_MAX_ROUNDS = 20


def _components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component) for every doc in at least one near-dup pair;
    component = min doc_id in the doc's connected component."""
    pairs = q_dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    # materialize once — each iteration reuses the edge list, and the
    # Jaccard pair generation must not re-execute per round
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(_MAX_ROUNDS):
        nbr_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nbr_min"))
        )
        new_label = F.least(F.col("label"), F.coalesce("nbr_min", F.col("label")))
        stepped = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                new_label.alias("label"),
                (new_label < F.col("label")).alias("changed"),
            )
            .localCheckpoint()
        )
        changed = stepped.filter("changed").count()
        labels = stepped.drop("changed")
        if changed == 0:
            return labels.select("doc_id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected components did not converge in {_MAX_ROUNDS} rounds"
    )


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _components(spark, sf_dir)


_ORACLE_CC_CTE = f"""
WITH RECURSIVE pairs AS (
  {ORACLE_DEDUP_NGRAM_JACCARD}
),
nodes AS (SELECT doc_a AS node FROM pairs UNION SELECT doc_b FROM pairs),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
cc(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, cc.label FROM cc JOIN edges e ON cc.node = e.src
)
"""

ORACLE_DEDUP_COMPONENTS = (
    _ORACLE_CC_CTE
    + """
SELECT node AS doc_id, min(label) AS component FROM cc GROUP BY node
"""
)


def q_dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup OUTPUT: every document except non-canonical cluster
    members (cluster representative = min doc_id). Anti join — at scale
    this is a broadcast of the (small) duplicate list against the full
    corpus scan."""
    comp = _components(spark, sf_dir)
    dups = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    docs = load_table(spark, sf_dir, "documents")
    return docs.join(dups, "doc_id", "left_anti").select("doc_id", "source")


ORACLE_DEDUP_KEEP_CANONICAL = (
    _ORACLE_CC_CTE
    + """
SELECT doc_id, source FROM documents
WHERE doc_id NOT IN (
  SELECT node FROM (
    SELECT node, min(label) AS component FROM cc GROUP BY node
  ) WHERE node <> component
)
"""
)


GRAPH_QUERIES = [
    QuerySpec(
        "dedup_components",
        q_dedup_components,
        ORACLE_DEDUP_COMPONENTS,
        ("ext", "dedup", "graph"),
    ),
    QuerySpec(
        "dedup_keep_canonical",
        q_dedup_keep_canonical,
        ORACLE_DEDUP_KEEP_CANONICAL,
        ("ext", "dedup", "graph"),
    ),
]
