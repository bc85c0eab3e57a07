"""[EXT] Similarity search over the embeddings table.

Brute-force cosine top-k as the correctness baseline, plus a
sign-random-projection LSH-bucketed variant as the scale path (score only
same-bucket candidates). A third entry uses Spark ML's
BucketedRandomProjectionLSH — the built-in cluster-scale operator (not
oracle-expressible; rows-only check).

Determinism: dot products are ordered folds (functions.dot), hyperplanes
are integer-derived literals — both reproducible bit-for-bit by the
DuckDB oracle.

100 TB shape: brute-force is O(Q*N) — fine when Q (queries) is small and
N is scanned once with no shuffle (broadcast the queries). The LSH path
cuts candidate count by 2^planes; for a real corpus you'd also IVF-train
centroids, but LSH needs no training pass and stays deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tiny_mapreduce_rpc_server_spark.functions import cosine, davg, dot
from tiny_mapreduce_rpc_server_spark.functions import portable as P
from tiny_mapreduce_rpc_server_spark.operators.dedup import _pin
from tiny_mapreduce_rpc_server_spark.sources import load_table, spread
from tiny_mapreduce_rpc_server_spark.spec import QuerySpec

N_QUERIES = 10  # vec_id < 10 are the query vectors
TOP_K = 5
N_PLANES = 8
DIM = 64
_PLANE_MOD = 1009


def _plane(p: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: integer-derived doubles that
    every engine computes/parses identically."""
    return [((p * DIM + d) * P.C1 % _PLANE_MOD) / _PLANE_MOD - 0.5 for d in range(DIM)]


def _sql_plane(p: int) -> str:
    return "[" + ", ".join(repr(v) for v in _plane(p)) + "]::DOUBLE[]"


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for each query vector (vec_id < 10).

    The query side is tiny -> broadcast; the corpus is scanned once and
    never shuffled except the final per-query top-k (TakeOrdered via
    window over Q partitions)."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cos = cosine(F.col("qv"), F.col("embedding"))
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )


ORACLE_ANN_BRUTEFORCE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_dot_product(qv, e.v)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v)))
           AS cos_sim
  FROM q JOIN e ON e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM scored)
SELECT query_id, rnk, neighbor_id, cos_sim FROM ranked WHERE rnk <= {TOP_K}
"""


def q_ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: 8 sign-random-projection bits -> bucket; score
    only same-bucket candidates (expected 1/256 of the corpus per query).
    Approximate: a neighbor in another bucket is missed — that's the
    recall/cost trade the bucket count controls."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    bucket = F.lit(0)
    for p in range(N_PLANES):
        plane = F.lit(_plane(p))  # array<double> literal
        bucket = bucket + F.when(dot(F.col("embedding"), plane) > 0, F.lit(1 << p)).otherwise(0)
    eb = emb.withColumn("bucket", bucket)
    q = eb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cos = cosine(F.col("qv"), F.col("embedding"))
    scored = (
        eb.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )


def _sql_bucket(vexpr: str) -> str:
    terms = [
        f"(CASE WHEN list_dot_product({vexpr}, {_sql_plane(p)}) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    ]
    return "(" + " + ".join(terms) + ")"


ORACLE_ANN_LSH = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
eb AS (SELECT vec_id, v, {_sql_bucket("v")} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM eb WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT query_id, eb.vec_id AS neighbor_id,
         list_dot_product(qv, eb.v)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(eb.v, eb.v)))
           AS cos_sim
  FROM q JOIN eb ON eb.bucket = q.qbucket AND eb.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM scored)
SELECT query_id, rnk, neighbor_id, cos_sim FROM ranked WHERE rnk <= {TOP_K}
"""


N_CELLS = 16
N_PROBE = 2
# deterministic "trained" centroids: a fixed stride of corpus vectors
# (a real deployment would k-means these; fixing them keeps the operator
# oracle-checkable and the plan identical)
CENTROID_IDS = [20 + 30 * i for i in range(N_CELLS)]


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: partition the corpus into Voronoi cells around 16
    centroids, probe the 2 nearest cells per query, exact-score only
    those candidates.

    100 TB shape: ALL centroids travel as ONE broadcast row (the
    ``_ivf_cents_one`` pattern ann_ivf_pq proved out), so cell
    assignment is row-local — rank the 16 (csim, cell) structs inside
    the row — and the corpus is scanned with NO shuffle until the final
    per-query top-k; candidate count scales with nprobe/ncells, not
    corpus size. (The r11 form cross-joined the corpus against the
    16-row centroid table and ranked with a row_number window
    partitioned by vec_id — a 16N-row exchange carrying the full
    embedding payload, executed twice: once under the cell side, once
    under the broadcast probe side. r12 removes both.) Ranking
    semantics are bit-identical to that window: ``sort_array`` DESC
    over struct(csim, -cell) orders by csim DESC then cell ASC with
    the same NaN-largest / NULL-last double ordering, and each csim is
    the same ordered-fold cosine over the same values. Unlike LSH
    buckets, cells adapt to the data's density around the chosen
    centroids."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select("vec_id", "embedding")
    cents_one = (
        emb.filter(F.col("vec_id").isin(CENTROID_IDS))
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("cv"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("cell", "cv"))).alias("cents"))
    )
    # (csim, -cell) structs sorted DESC == csim DESC, cell ASC — the
    # exact order the old per-(vec, cent) row_number window used
    ranked = F.sort_array(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                cosine(F.col("embedding"), c["cv"]).alias("csim"),
                (-c["cell"]).alias("negcell"),
            ),
        ),
        asc=False,
    )
    assigned = emb.join(F.broadcast(cents_one)).select(
        "vec_id", "embedding", ranked.alias("rc")
    )
    cells = assigned.select(
        "vec_id",
        "embedding",
        (-F.col("rc")[0]["negcell"]).alias("cell"),
    )
    probes = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.explode(
            F.transform(
                F.slice("rc", 1, N_PROBE), lambda s: -s["negcell"]
            )
        ).alias("probe_cell"),
    )
    cos = cosine(F.col("qv"), F.col("embedding"))
    scored = (
        cells.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )


_SQL_CENTROID_IDS = ", ".join(str(i) for i in CENTROID_IDS)

ORACLE_ANN_IVF = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
         WHERE vec_id IN ({_SQL_CENTROID_IDS})),
assigned AS (
  SELECT e.vec_id, e.v, cent_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_dot_product(e.v, cv)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(cv, cv))) DESC,
                    cent_id ASC) AS crnk
  FROM e CROSS JOIN cent),
cells AS (SELECT vec_id, v, cent_id AS cell FROM assigned WHERE crnk = 1),
probes AS (SELECT vec_id AS query_id, v AS qv, cent_id AS probe_cell
           FROM assigned WHERE vec_id < {N_QUERIES} AND crnk <= {N_PROBE}),
scored AS (
  SELECT query_id, cells.vec_id AS neighbor_id,
         list_dot_product(qv, cells.v)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cells.v, cells.v)))
           AS cos_sim
  FROM probes JOIN cells
    ON cells.cell = probes.probe_cell AND cells.vec_id <> probes.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM scored)
SELECT query_id, rnk, neighbor_id, cos_sim FROM ranked WHERE rnk <= {TOP_K}
"""


def q_ann_ml_brp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH (pyspark.ml) approx nearest neighbors —
    the built-in cluster-scale operator. Hash family is Spark-internal =>
    rows-only check."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(emb)
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    pairs = model.approxSimilarityJoin(q, emb, 10.0, "dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("query_id"),
            F.col("datasetB.vec_id").alias("neighbor_id"),
            F.col("dist"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding feature ops: unit-normalization + per-label centroids
# ---------------------------------------------------------------------------


def q_embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize every embedding (per-row, shuffle-free). The unit
    vector is computed in full; the checked output projects it to exact
    scalars (norm, first/max/min components) so the comparison is robust
    to how a comparator canonicalizes array columns."""
    # no spread(): the per-row math is cheap and the operator's contract
    # IS the shuffle-free plan (asserted in test_plans)
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    l2 = F.sqrt(dot(v, v))
    unit = F.transform(v, lambda x: x / l2)
    return emb.select(
        "vec_id",
        l2.alias("l2_norm"),
        F.element_at(unit, 1).alias("first_unit"),
        F.array_max(unit).alias("max_unit"),
        F.array_min(unit).alias("min_unit"),
    )


ORACLE_EMBEDDING_NORMALIZE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
u AS (SELECT vec_id,
             sqrt(list_dot_product(v, v)) AS l2_norm,
             list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS unit
      FROM e)
SELECT vec_id, l2_norm,
       unit[1] AS first_unit,
       list_max(unit) AS max_unit,
       list_min(unit) AS min_unit
FROM u
"""


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector (class centroids), exactly: posexplode to
    (label, dim, x), then a decimal-exact average per (label, dim). One
    shuffle on (label, pos) with map-side partial aggregation; output is
    labels x dims — tiny at any corpus size. Order-independent thanks to
    the decimal sum, so any partitioning gives bit-identical centroids."""
    from tiny_mapreduce_rpc_server_spark.functions import davg

    # no spread(): the single exchange on (label, pos) with map-side
    # partial aggregation is the operator's asserted plan contract
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    return ex.groupBy("label", "pos").agg(
        F.count("*").alias("n"), davg("x", "centroid")
    )


ORACLE_EMBEDDING_CENTROIDS = """
WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (SELECT label,
              unnest(range(0, len(v))) AS pos,
              unnest(v) AS x
       FROM e)
SELECT label, pos, count(*) AS n,
       CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(x) AS centroid
FROM ex GROUP BY label, pos
"""


def q_ann_eval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN QA: recall of each approximate path (LSH-bucketed, IVF,
    PQ/ADC) against the brute-force top-k ground truth — the gate that
    decides whether an approximate path may replace the exact scan.

    The measured numbers on THIS corpus are deliberately low for the
    BUCKETED paths (IVF ~0.26, sign-LSH ~0): the synthetic embeddings
    are isotropic random vectors, and with no cluster structure
    locality-sensitive bucketing cannot beat chance — which is exactly
    the property this query exists to detect before a pipeline trusts
    bucketed ANN on a new embedding space. PQ is the contrast case: it
    scans EVERY candidate, so its loss is quantization distortion, not
    bucket misses — and on THIS corpus that distortion is also severe
    (~0.06 recall: isotropic 64-dim vectors carry near-maximal entropy,
    so 4x16 random-seed codewords reconstruct poorly). The measured
    split still tells the owner WHICH failure mode they face — pruning
    (fix: more probes / planes) vs compression (fix: more codewords /
    subspaces, or PQ-then-exact-rerank). Real text embeddings are
    strongly clustered and score high (ann_eval_recall_clustered is
    that positive control). Exact, not sampled: all inputs are
    deterministic registered queries and the oracle recomputes them in
    SQL."""
    # pin: the O(Q*N) brute-force truth feeds BOTH union branches —
    # without it the full cosine scan executes once per path. Routed
    # through dedup._pin so release_caches() drops it between queries
    # in a long-lived session (ADVICE r9).
    truth = _pin(
        q_ann_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    )

    def path_recall(approx: DataFrame, path: str) -> DataFrame:
        a = approx.select("query_id", "neighbor_id", F.lit(1).alias("in_a"))
        j = truth.join(a, ["query_id", "neighbor_id"], "left")
        return j.agg(
            F.lit(path).alias("path"),
            F.count("*").alias("n_truth"),
            F.count("in_a").alias("n_hit"),
            (F.count("in_a").cast("double") / F.count("*")).alias("recall"),
        )

    return (
        path_recall(q_ann_lsh_bucketed(spark, sf_dir), "lsh")
        .unionAll(path_recall(q_ann_ivf(spark, sf_dir), "ivf"))
        .unionAll(path_recall(q_ann_pq(spark, sf_dir), "pq"))
        .unionAll(path_recall(q_ann_ivf_pq(spark, sf_dir), "ivfpq"))
        # the refine stage's honest caveat: on a SMALL corpus RERANK_R
        # covers a large fraction of N, so this row overstates what a
        # 100 TB deployment would see (there R/N -> 0 and recall is
        # bounded by how many true neighbors quantization lets into the
        # candidate pool); the clustered eval is the structural signal
        .unionAll(path_recall(q_ann_pq_rerank(spark, sf_dir), "pq_rerank"))
    )


def _oracle_ann_eval_recall() -> str:
    return f"""
WITH t AS (SELECT query_id, neighbor_id FROM ({ORACLE_ANN_BRUTEFORCE})),
lsh AS (SELECT query_id, neighbor_id FROM ({ORACLE_ANN_LSH})),
ivf AS (SELECT query_id, neighbor_id FROM ({ORACLE_ANN_IVF})),
pq AS (SELECT query_id, neighbor_id FROM ({ORACLE_ANN_PQ})),
ivfpq AS (SELECT query_id, neighbor_id FROM ({ORACLE_ANN_IVF_PQ})),
pqr AS (SELECT query_id, neighbor_id FROM ({ORACLE_ANN_PQ_RERANK})),
jl AS (
  SELECT 'lsh' AS path, count(*) AS n_truth,
         count(a.neighbor_id) AS n_hit,
         count(a.neighbor_id)::DOUBLE / count(*) AS recall
  FROM t LEFT JOIN lsh a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id),
ji AS (
  SELECT 'ivf' AS path, count(*) AS n_truth,
         count(a.neighbor_id) AS n_hit,
         count(a.neighbor_id)::DOUBLE / count(*) AS recall
  FROM t LEFT JOIN ivf a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id),
jp AS (
  SELECT 'pq' AS path, count(*) AS n_truth,
         count(a.neighbor_id) AS n_hit,
         count(a.neighbor_id)::DOUBLE / count(*) AS recall
  FROM t LEFT JOIN pq a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id),
jip AS (
  SELECT 'ivfpq' AS path, count(*) AS n_truth,
         count(a.neighbor_id) AS n_hit,
         count(a.neighbor_id)::DOUBLE / count(*) AS recall
  FROM t LEFT JOIN ivfpq a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id),
jpr AS (
  SELECT 'pq_rerank' AS path, count(*) AS n_truth,
         count(a.neighbor_id) AS n_hit,
         count(a.neighbor_id)::DOUBLE / count(*) AS recall
  FROM t LEFT JOIN pqr a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id)
SELECT * FROM jl UNION ALL SELECT * FROM ji UNION ALL SELECT * FROM jp
UNION ALL SELECT * FROM jip UNION ALL SELECT * FROM jpr
"""


# Clustered-recall companion: the synthetic corpus embeddings are
# isotropic, so ann_eval_recall HONESTLY reports that bucketed paths
# fail there. This companion builds a deterministically CLUSTERED
# embedding set (EVAL_GROUPS tight clusters, EVAL_EPS jitter) from the
# same vec_ids and shows the same bucketed paths succeeding — together
# the two queries bracket the decision a pipeline owner faces: bucketed
# ANN is safe iff the embedding space is clustered, and this pair
# MEASURES that instead of assuming it.
EVAL_GROUPS = 16
EVAL_EPS = 0.05
_EVAL_MOD = 1013


def clustered_eval_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically CLUSTERED eval corpus (vec_id, embedding),
    derived in-plan from the corpus vec_ids with integer arithmetic both
    engines reproduce bit-for-bit: group g = vec_id % EVAL_GROUPS,
    vector = base(g) + EVAL_EPS * noise(vec_id) where base/noise
    components are modular-arithmetic doubles (the ``_plane``
    construction). Within a group, vectors are near-identical
    (cosine ~1). Shared by ``ann_eval_recall_clustered`` and
    ``dedup_eval_embedding`` so both evals measure the SAME clustered
    space; ``sql_clustered_eval_embeddings`` is the DuckDB twin."""
    ids = spread(load_table(spark, sf_dir, "embeddings")).select("vec_id")
    dseq = F.sequence(F.lit(0), F.lit(DIM - 1))
    g = F.col("vec_id") % EVAL_GROUPS

    def _base(d):
        return ((g * DIM + d) * P.C1 % _EVAL_MOD) / F.lit(_EVAL_MOD) - 0.5

    def _noise(d):
        return ((F.col("vec_id") * DIM + d) % _EVAL_MOD * P.C2 % _EVAL_MOD) / F.lit(
            _EVAL_MOD
        ) - 0.5

    return ids.select(
        "vec_id",
        F.transform(dseq, lambda d: _base(d) + F.lit(EVAL_EPS) * _noise(d)).alias(
            "embedding"
        ),
    )


def sql_clustered_eval_embeddings() -> str:
    """DuckDB derivation of the clustered eval corpus — the exact SQL
    twin of ``clustered_eval_embeddings`` (one shared string so the two
    eval oracles can never diverge)."""
    return (
        f"SELECT vec_id, list_transform(generate_series(0, {DIM - 1}), d -> "
        f"((vec_id % {EVAL_GROUPS}) * {DIM} + d) * {P.C1} % {_EVAL_MOD} / {_EVAL_MOD} - 0.5 "
        f"+ {EVAL_EPS} * ((vec_id * {DIM} + d) % {_EVAL_MOD} * {P.C2} % {_EVAL_MOD} / {_EVAL_MOD} - 0.5)"
        f") AS v FROM (SELECT vec_id FROM embeddings)"
    )


def q_ann_eval_recall_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the LSH-bucketed and IVF paths on a CLUSTERED embedding
    space — the positive control for ``ann_eval_recall``'s negative
    result on the isotropic corpus.

    The clustered set comes from ``clustered_eval_embeddings``: within a
    group, vectors are near-identical (cosine ~1), so ground-truth
    neighbors are group-mates; a bucketed path earns its recall by
    keeping groups together. Same plan shapes as the corpus-table paths:
    broadcast queries/centroids, no shuffle until the per-query top-k."""
    emb = clustered_eval_embeddings(spark, sf_dir)
    emb = emb.localCheckpoint(eager=False)  # 3 consumers, derive once

    def topk(scored: DataFrame) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cos_sim"), F.asc("neighbor_id")
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= TOP_K)
            .select("query_id", "neighbor_id")
        )

    cos = cosine(F.col("qv"), F.col("embedding"))
    # brute-force ground truth
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    truth = _pin(
        topk(
            emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
                "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim")
            )
        )
    )
    # sign-LSH path
    bucket = F.lit(0)
    for p in range(N_PLANES):
        bucket = bucket + F.when(
            dot(F.col("embedding"), F.lit(_plane(p))) > 0, F.lit(1 << p)
        ).otherwise(0)
    eb = emb.withColumn("bucket", bucket)
    qb = eb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    lsh = topk(
        eb.join(
            F.broadcast(qb),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        ).select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim")
        )
    )
    # IVF path (same fixed centroid ids as ann_ivf)
    cent = emb.filter(F.col("vec_id").isin(CENTROID_IDS)).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cv")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    assigned = (
        emb.join(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cent_id",
            cosine(F.col("embedding"), F.col("cv")).alias("csim"),
        )
        .withColumn("crnk", F.row_number().over(w_assign))
    )
    cells = assigned.filter(F.col("crnk") == 1).select(
        "vec_id", "embedding", F.col("cent_id").alias("cell")
    )
    probes = assigned.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("crnk") <= N_PROBE)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("cent_id").alias("probe_cell"),
    )
    ivf = topk(
        cells.join(
            F.broadcast(probes),
            (F.col("cell") == F.col("probe_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        ).select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_sim")
        )
    )

    # PQ path (same seed codebook construction as ann_pq, over the
    # derived set). Group-mates share codes, so ADC distances TIE within
    # a cluster and the id tiebreak picks the lowest-id mates — PQ finds
    # the right cluster but cannot rank inside it (the measured ~0.2
    # recall vs ~0.06 isotropic). The pq_rerank row then measures the
    # refine stage (q_ann_pq_rerank): exact-cosine rescore of the
    # top-RERANK_R ADC survivors — its top-TOP_K prefix IS the plain pq
    # answer, so one ADC scan feeds both rows.
    pv = emb.select("vec_id", F.col("embedding").alias("v"))
    cb_one = _pq_cb_one(_pq_codebook_entries(pv))
    cand_r = _pin(
        _pq_adc_topk(
            _pq_codes(pv, cb_one), _pq_luts(pv, cb_one), k=RERANK_R
        ).select("query_id", "rnk", "neighbor_id")
    )
    pq = cand_r.filter(F.col("rnk") <= TOP_K).select("query_id", "neighbor_id")

    # Recall-vs-R sweep (round-9 verdict #3): rerank recall is bounded
    # by candidate coverage — top-R ADC survivors cap how many true
    # neighbors the refine stage can ever recover. Measuring the curve
    # at R in RERANK_SWEEP_RS (one cached ADC scan feeds every point;
    # an R-point is just a rnk<=R filter on the same candidates) turns
    # the docstring's R/N caveat into data: recall should rise with R
    # and saturate once R covers the densest cluster.
    def pqr_at(r_cap: int) -> DataFrame:
        return topk(
            emb.join(
                F.broadcast(
                    cand_r.filter(F.col("rnk") <= r_cap).select(
                        "query_id", "neighbor_id"
                    )
                ),
                F.col("vec_id") == F.col("neighbor_id"),
            )
            .join(F.broadcast(q), "query_id")
            .select("query_id", "neighbor_id", cos.alias("cos_sim"))
        )

    pqr = pqr_at(RERANK_R)

    def path_recall(approx: DataFrame, path: str) -> DataFrame:
        a = approx.select("query_id", "neighbor_id", F.lit(1).alias("in_a"))
        j = truth.join(a, ["query_id", "neighbor_id"], "left")
        return j.agg(
            F.lit(path).alias("path"),
            F.count("*").alias("n_truth"),
            F.count("in_a").alias("n_hit"),
            (F.count("in_a").cast("double") / F.count("*")).alias("recall"),
        )

    out = (
        path_recall(lsh, "lsh")
        .unionAll(path_recall(ivf, "ivf"))
        .unionAll(path_recall(pq, "pq"))
        .unionAll(path_recall(pqr, "pq_rerank"))
    )
    for r_cap in RERANK_SWEEP_RS:
        if r_cap != RERANK_R:  # RERANK_R point IS the pq_rerank row
            out = out.unionAll(path_recall(pqr_at(r_cap), f"pq_rerank_r{r_cap}"))
    return out


def _oracle_ann_eval_recall_clustered() -> str:
    e = sql_clustered_eval_embeddings()
    return f"""
WITH e AS ({e}),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
tsc AS (
  SELECT query_id, e.vec_id AS neighbor_id, {_sql_cos('qv', 'e.v')} AS cos_sim
  FROM q JOIN e ON e.vec_id <> q.query_id),
t AS (SELECT query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM tsc) WHERE rnk <= {TOP_K}),
eb AS (SELECT vec_id, v, {_sql_bucket("v")} AS bucket FROM e),
qb AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM eb
       WHERE vec_id < {N_QUERIES}),
lsc AS (
  SELECT query_id, eb.vec_id AS neighbor_id, {_sql_cos('qv', 'eb.v')} AS cos_sim
  FROM qb JOIN eb ON eb.bucket = qb.qbucket AND eb.vec_id <> qb.query_id),
lsh AS (SELECT query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM lsc) WHERE rnk <= {TOP_K}),
cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
         WHERE vec_id IN ({_SQL_CENTROID_IDS})),
assigned AS (
  SELECT e.vec_id, e.v, cent_id,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_dot_product(e.v, cv)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(cv, cv))) DESC,
                    cent_id ASC) AS crnk
  FROM e CROSS JOIN cent),
cells AS (SELECT vec_id, v, cent_id AS cell FROM assigned WHERE crnk = 1),
probes AS (SELECT vec_id AS query_id, v AS qv, cent_id AS probe_cell
           FROM assigned WHERE vec_id < {N_QUERIES} AND crnk <= {N_PROBE}),
isc AS (
  SELECT query_id, cells.vec_id AS neighbor_id, {_sql_cos('qv', 'cells.v')} AS cos_sim
  FROM probes JOIN cells
    ON cells.cell = probes.probe_cell AND cells.vec_id <> probes.query_id),
ivf AS (SELECT query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM isc) WHERE rnk <= {TOP_K}),
{_sql_pq_cb_codes('e')},
plut AS (
  SELECT q.vec_id AS query_id, cb.m, cb.code, {_sql_sub_sqd('q.v')} AS ld
  FROM e q, cb WHERE q.vec_id < {N_QUERIES}),
padc AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         {_SQL_ADC_SUM} AS adc_dist
  FROM codes c JOIN plut l ON l.m = c.m AND l.code = c.code
  WHERE c.vec_id <> l.query_id
  GROUP BY 1, 2),
pcand AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk
    FROM padc) WHERE rnk <= {RERANK_R}),
pq AS (SELECT query_id, neighbor_id FROM pcand WHERE rnk <= {TOP_K}),
prsc AS (
  SELECT c.query_id, c.neighbor_id, {_sql_cos('qv', 'e.v')} AS cos_sim
  FROM pcand c
  JOIN e ON e.vec_id = c.neighbor_id
  JOIN q ON q.query_id = c.query_id),
pqr AS (SELECT query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM prsc) WHERE rnk <= {TOP_K}),
jl AS (
  SELECT 'lsh' AS path, count(*) AS n_truth,
         count(a.neighbor_id) AS n_hit,
         count(a.neighbor_id)::DOUBLE / count(*) AS recall
  FROM t LEFT JOIN lsh a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id),
ji AS (
  SELECT 'ivf' AS path, count(*) AS n_truth,
         count(a.neighbor_id) AS n_hit,
         count(a.neighbor_id)::DOUBLE / count(*) AS recall
  FROM t LEFT JOIN ivf a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id),
jp AS (
  SELECT 'pq' AS path, count(*) AS n_truth,
         count(a.neighbor_id) AS n_hit,
         count(a.neighbor_id)::DOUBLE / count(*) AS recall
  FROM t LEFT JOIN pq a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id),
jr AS (
  SELECT 'pq_rerank' AS path, count(*) AS n_truth,
         count(a.neighbor_id) AS n_hit,
         count(a.neighbor_id)::DOUBLE / count(*) AS recall
  FROM t LEFT JOIN pqr a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id){_sweep_ctes()}
SELECT * FROM jl UNION ALL SELECT * FROM ji UNION ALL SELECT * FROM jp
UNION ALL SELECT * FROM jr{_sweep_union()}
"""


def _sweep_ctes() -> str:
    """Per-R rerank CTEs for the coverage sweep (verdict-9 #3): each
    point filters the SAME pcand candidate table at rnk <= R, rescoring
    with the exact cosine — mirror of the Spark side's pqr_at()."""
    parts = []
    for r_cap in RERANK_SWEEP_RS:
        if r_cap == RERANK_R:
            continue
        parts.append(f""",
prsc{r_cap} AS (
  SELECT c.query_id, c.neighbor_id, {_sql_cos('qv', 'e.v')} AS cos_sim
  FROM pcand c
  JOIN e ON e.vec_id = c.neighbor_id
  JOIN q ON q.query_id = c.query_id
  WHERE c.rnk <= {r_cap}),
pqr{r_cap} AS (SELECT query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM prsc{r_cap}) WHERE rnk <= {TOP_K}),
jr{r_cap} AS (
  SELECT 'pq_rerank_r{r_cap}' AS path, count(*) AS n_truth,
         count(a.neighbor_id) AS n_hit,
         count(a.neighbor_id)::DOUBLE / count(*) AS recall
  FROM t LEFT JOIN pqr{r_cap} a
    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id)""")
    return "".join(parts)


def _sweep_union() -> str:
    return "".join(
        f" UNION ALL SELECT * FROM jr{r_cap}"
        for r_cap in RERANK_SWEEP_RS
        if r_cap != RERANK_R
    )


# ---------------------------------------------------------------------------
# hard-negative mining (contrastive-training data prep)
# ---------------------------------------------------------------------------

HARD_NEG_K = 3


def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} hardest negatives per query vector: the most-similar
    corpus vectors with a DIFFERENT label — the pairs that matter for
    contrastive/retrieval training (in-batch random negatives are too
    easy; the near-miss wrong-label ones carry the gradient signal).

    Complement of ``negative_sampling`` (hash-bucketed in-batch pick,
    no distances): this one ranks by true cosine. Same scale contract as
    ann_bruteforce — queries broadcast, one corpus scan, per-query top-k
    via window over Q partitions; at real scale the scan side would be
    the LSH/IVF-bucketed candidate set instead, same downstream shape."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", "embedding"
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("qv"),
    )
    cos = cosine(F.col("qv"), F.col("embedding"))
    scored = emb.join(
        F.broadcast(q), F.col("label") != F.col("query_label")
    ).select(
        "query_id",
        "query_label",
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        cos.alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HARD_NEG_K)
        .select(
            "query_id", "query_label", "rnk", "neighbor_id",
            "neighbor_label", "cos_sim",
        )
    )


ORACLE_HARD_NEGATIVE_MINING = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS query_label, v AS qv
      FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT query_id, query_label, e.vec_id AS neighbor_id,
         e.label AS neighbor_label,
         list_dot_product(qv, e.v)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v)))
           AS cos_sim
  FROM q JOIN e ON e.label <> q.query_label),
ranked AS (
  SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM scored)
SELECT query_id, query_label, rnk, neighbor_id, neighbor_label, cos_sim
FROM ranked WHERE rnk <= {HARD_NEG_K}
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization (the compression step in front of IVF/PQ search)
# ---------------------------------------------------------------------------

QUANT_LEVELS = 255  # uint8 codes 0..255


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization with a reconstruction-error
    audit — the memory-compression pass in front of large-scale ANN (a
    64-dim float32 corpus shrinks 4x; recall loss is bounded by the
    per-dim error this query measures).

    Two passes, both scale-safe: (1) per-dim min/max — one posexplode ->
    (pos) aggregate producing dims-many rows; (2) the 64-row stats table
    BROADCASTS back over a second scan, each value is coded as
    ``round((x - vmin) / scale)`` and reconstructed, and the per-dim
    error aggregates. All per-row math is IEEE +,-,*,/ and round on
    nonnegative operands (HALF_UP == away-from-zero there), so both
    engines produce bit-identical codes; the reported errors are a MAX
    (a pick) and a decimal-exact mean of per-row doubles.

    Constant dimensions (vmax == vmin) code to 0 and reconstruct
    exactly."""
    from tiny_mapreduce_rpc_server_spark.functions import davg

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    stats = ex.groupBy("pos").agg(
        F.min("x").alias("vmin"), F.max("x").alias("vmax")
    )
    scale = (F.col("vmax") - F.col("vmin")) / QUANT_LEVELS
    coded = (
        ex.join(F.broadcast(stats), "pos")
        .withColumn("scale", scale)
        .withColumn(
            "q",
            F.when(
                F.col("scale") > 0,
                F.round((F.col("x") - F.col("vmin")) / F.col("scale"), 0),
            )
            .otherwise(F.lit(0.0))
            .cast("int"),
        )
        .withColumn(
            "err",
            F.abs(F.col("x") - (F.col("vmin") + F.col("q") * F.col("scale"))),
        )
    )
    return coded.groupBy("pos").agg(
        F.count("*").alias("n"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
        F.max("err").alias("max_abs_err"),
        davg("err", "mean_abs_err"),
        F.countDistinct("q").alias("n_codes"),
    )


ORACLE_EMBEDDING_QUANTIZE = f"""
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (SELECT unnest(range(0, len(v))) AS pos, unnest(v) AS x FROM e),
stats AS (SELECT pos, min(x) AS vmin, max(x) AS vmax FROM ex GROUP BY pos),
coded AS (
  SELECT ex.pos, x, vmin, vmax,
         (vmax - vmin) / {QUANT_LEVELS} AS scale,
         CASE WHEN (vmax - vmin) / {QUANT_LEVELS} > 0
              THEN CAST(round((x - vmin) / ((vmax - vmin) / {QUANT_LEVELS}), 0) AS INT)
              ELSE 0 END AS q
  FROM ex JOIN stats USING (pos))
SELECT pos, count(*) AS n, min(vmin) AS vmin, max(vmax) AS vmax,
       max(abs(x - (vmin + q * scale))) AS max_abs_err,
       CAST(sum(CAST(abs(x - (vmin + q * scale)) AS DECIMAL(38,6))) AS DOUBLE)
         / count(*) AS mean_abs_err,
       count(DISTINCT q) AS n_codes
FROM coded
GROUP BY pos
"""


# matryoshka prefix lengths audited against the full 64-dim cosine
_MRL_DIMS = (8, 16, 32)


def q_embedding_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit: how much cosine similarity distorts
    when embeddings are cut to their first 8/16/32 dims — the
    measurement behind MRL-style "store the prefix, rerank with the
    full vector" serving, run over the same query-x-corpus pairs as
    ann_bruteforce. Reports, per prefix length, the decimal-exact mean
    and the max absolute cosine error vs the full 64 dims (one wide
    row: the per-dim columns share one scan).

    Shape: queries broadcast, corpus scanned ONCE; full and truncated
    cosines are aliased into their own projections (each ordered fold
    computed once per pair, expression-materialization rule), and the
    whole thing collapses in a single partial-aggregated global agg.
    The errors are differences of identically-computed doubles, so both
    engines agree bit-for-bit before the decimal cast."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    pairs = emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    cos_cols = [cosine(F.col("qv"), F.col("embedding")).alias("cos_full")]
    for d in _MRL_DIMS:
        cos_cols.append(
            cosine(
                F.slice(F.col("qv"), 1, d), F.slice(F.col("embedding"), 1, d)
            ).alias(f"cos_{d}")
        )
    scored = pairs.select(*cos_cols)
    errs = scored.select(
        *[
            F.abs(F.col(f"cos_{d}") - F.col("cos_full")).alias(f"err_{d}")
            for d in _MRL_DIMS
        ]
    )
    aggs = [F.count("*").alias("n_pairs")]
    for d in _MRL_DIMS:
        aggs.append(davg(f"err_{d}", f"mean_abs_err_d{d}"))
        aggs.append(F.max(f"err_{d}").alias(f"max_abs_err_d{d}"))
    return errs.agg(*aggs)


def _sql_cos(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


ORACLE_EMBEDDING_MATRYOSHKA = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT {_sql_cos('qv', 'e.v')} AS cos_full,
{','.join(f"         {_sql_cos(f'qv[1:{d}]', f'e.v[1:{d}]')} AS cos_{d}" for d in _MRL_DIMS)}
  FROM q JOIN e ON e.vec_id <> q.query_id),
errs AS (
  SELECT {', '.join(f'abs(cos_{d} - cos_full) AS err_{d}' for d in _MRL_DIMS)}
  FROM scored)
SELECT count(*) AS n_pairs,
{','.join(
    f'''       CAST(sum(CAST(err_{d} AS DECIMAL(38,6))) AS DOUBLE) / count(err_{d})
         AS mean_abs_err_d{d},
       max(err_{d}) AS max_abs_err_d{d}''' for d in _MRL_DIMS)}
FROM errs
"""


_DEC = "DECIMAL(38,6)"


def q_source_semantic_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic twin of dedup's source_overlap_matrix: which SOURCES are
    close in embedding space? Documents join their vectors (doc_id =
    vec_id), per-source centroids come from a decimal-exact per-dim
    mean, and every source pair gets a centroid cosine — the corpus-map
    a mixing strategy reads (near-duplicate feeds cluster, distinct
    domains spread out).

    Shape: one equi-join docs-to-vectors, one shuffle to (source, dim)
    partial-aggregated cells, then all pair math runs on the CELLS table
    (sources x 64 dims — driver-small at any corpus size).

    Exactness: cosine is scale-invariant, so the per-source count
    divisions cancel and the pair math runs on the exact decimal SUM
    vectors — no double->decimal recast of an arbitrary double anywhere
    (that cast rounds differently across engines in the last ulp). The
    sums are re-typed to DECIMAL(18,6) (exact: values are bounded far
    below 12 integer digits at these SFs; widen for a larger corpus) so
    decimal products stay exact in BOTH engines — at (38,6) Spark
    truncates product scale while DuckDB promotes to double, and the
    engines diverge. Each moment rounds to double exactly once."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    j = docs.join(emb, docs.doc_id == emb.vec_id)
    ex = j.select(
        "source",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    cells = ex.groupBy("source", "pos").agg(
        F.sum(F.col("x").cast(_DEC)).cast("decimal(18,6)").alias("s")
    )
    a = cells.select(
        F.col("source").alias("source_x"), "pos", F.col("s").alias("sa")
    )
    b = cells.select(
        F.col("source").alias("source_y"), "pos", F.col("s").alias("sb")
    )
    pairs = a.join(b, "pos").filter(F.col("source_x") < F.col("source_y"))
    g = pairs.groupBy("source_x", "source_y").agg(
        F.count("*").alias("n_dims"),
        F.sum(F.col("sa") * F.col("sb")).cast("double").alias("dp"),
        F.sum(F.col("sa") * F.col("sa")).cast("double").alias("na"),
        F.sum(F.col("sb") * F.col("sb")).cast("double").alias("nb"),
    )
    return g.select(
        "source_x",
        "source_y",
        "n_dims",
        (F.col("dp") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))).alias(
            "centroid_cos"
        ),
    )


ORACLE_SOURCE_SEMANTIC = f"""
WITH j AS (
  SELECT d.source, CAST(e.embedding AS DOUBLE[]) AS v
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
ex AS (SELECT source, unnest(range(0, len(v))) AS pos, unnest(v) AS x FROM j),
cells AS (
  SELECT source, pos,
         CAST(sum(CAST(x AS {_DEC})) AS DECIMAL(18,6)) AS s
  FROM ex GROUP BY source, pos),
pairs AS (
  SELECT a.source AS source_x, b.source AS source_y, a.s AS sa, b.s AS sb
  FROM cells a JOIN cells b ON a.pos = b.pos AND a.source < b.source),
g AS (
  SELECT source_x, source_y, count(*) AS n_dims,
         CAST(sum(sa * sb) AS DOUBLE) AS dp,
         CAST(sum(sa * sa) AS DOUBLE) AS na,
         CAST(sum(sb * sb) AS DOUBLE) AS nb
  FROM pairs GROUP BY source_x, source_y)
SELECT source_x, source_y, n_dims,
       dp / (sqrt(na) * sqrt(nb)) AS centroid_cos
FROM g
"""


# ---------------------------------------------------------------------------
# product-quantization ANN (ADC scan over code tables)
# ---------------------------------------------------------------------------

PQ_M = 4  # subspaces
PQ_SUBDIM = DIM // PQ_M  # 16 dims each
PQ_K = 16  # codewords per subspace
# deterministic "trained" codebook: sub-vectors of a fixed stride of corpus
# rows (same oracle-checkability trick as ann_ivf's CENTROID_IDS; a real
# deployment k-means-trains each subspace — kmeans_lloyd is that loop)
PQ_SEED_IDS = sorted(11 + 29 * c for c in range(PQ_K))  # 11..446, all >= N_QUERIES


def _sub_sqd(m, v, cw):
    """Squared L2 between ``v``'s m-th sub-vector and codeword ``cw``.

    Ordered fold (same shape ml._sq_dist pins against DuckDB's
    list_dot_product of the diff vector): per-element (x-y)*(x-y) rounds
    twice, the sum folds left-to-right from 0.0 — bit-identical in both
    engines."""
    sub = F.slice(v, m * PQ_SUBDIM + 1, PQ_SUBDIM)
    return F.aggregate(
        F.zip_with(sub, cw, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: the memory-bounded ANN path at corpus
    scale. The 64-dim vector is split into 4 sub-vectors, each encoded as
    its nearest of 16 codewords (argmin squared-L2, ties to the lowest
    code) — 4 small ints instead of 64 doubles, a 128x shrink. Queries
    precompute a 4x16 lookup grid of sub-distances once, and every
    corpus vector is scored by 4 table lookups + 3 adds (asymmetric
    distance computation), never a full dot product.

    100 TB shape: the codebook is M*K tiny rows collapsed into ONE
    broadcast row, so encoding is a single corpus scan with row-local
    argmin (no shuffle, no N x K explosion); the ADC scan reads only the
    code columns (on a real lake the codes are a persisted 4-byte
    column, the float vectors never re-read); the only shuffle is the
    final per-query top-k. Recall loss vs ann_bruteforce is the
    quantization trade — measured the same way ann_eval_recall audits
    the bucketed paths.

    No reference counterpart (SURVEY §2.11 — [EXT]; PQ/ADC per Jegou et
    al., "Product Quantization for Nearest Neighbor Search", TPAMI'11).
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cb_one = _pq_cb_one(_pq_codebook_entries(emb))
    coded = _pq_codes(emb, cb_one)
    luts = _pq_luts(emb, cb_one)
    return _pq_adc_topk(coded, luts)


def _pq_codebook_entries(emb: DataFrame) -> DataFrame:
    """Codebook entries (m, code, cw); code = rank of the seed id."""
    seeds = F.lit(PQ_SEED_IDS)
    return (
        emb.filter(F.col("vec_id").isin(PQ_SEED_IDS))
        .select(
            (F.array_position(seeds, F.col("vec_id")) - 1).cast("int").alias("code"),
            "v",
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.col("code").alias("code"),
                            F.slice("v", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("cw"),
                        )
                        for m in range(PQ_M)
                    ]
                )
            ).alias("e")
        )
        .select("e.m", "e.code", "e.cw")
    )


def _pq_cb_one(entries: DataFrame) -> DataFrame:
    """ONE row: all M*K entries sorted by (m, code) — filter(cb, m)
    downstream then yields code-ascending slices for grid indexing."""
    return entries.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("m", "code", "cw"))).alias("cb")
    )


def _pq_codes(emb: DataFrame, cb_one: DataFrame, keep=("vec_id",)) -> DataFrame:
    """(*keep, codes): row-local argmin encoding against the broadcast
    single-row codebook — one scan, no shuffle, no N x K explosion."""

    def _argmin_code(m):
        # nearest codeword in subspace m: sort (d, code) structs, take head
        return F.element_at(
            F.array_sort(
                F.transform(
                    F.filter(F.col("cb"), lambda e: e["m"] == m),
                    lambda e: F.struct(
                        _sub_sqd(m, F.col("v"), e["cw"]).alias("d"),
                        e["code"].alias("code"),
                    ),
                )
            ),
            1,
        )["code"]

    return emb.join(F.broadcast(cb_one)).select(
        *keep,
        F.transform(F.sequence(F.lit(0), F.lit(PQ_M - 1)), _argmin_code).alias(
            "codes"
        ),
    )


def _pq_grid_col():
    """ADC lookup grid over column ``v``: grid[m+1][code+1] = sqd(sub_m, cw)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: F.transform(
            F.filter(F.col("cb"), lambda e: e["m"] == m),
            lambda e: _sub_sqd(m, F.col("v"), e["cw"]),
        ),
    )


def _pq_luts(emb: DataFrame, cb_one: DataFrame) -> DataFrame:
    """Per-query ADC lookup grid rows (query_id, grid)."""
    return (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cb_one))
        .select(F.col("vec_id").alias("query_id"), _pq_grid_col().alias("grid"))
    )


def _pq_adc_topk(
    coded: DataFrame, luts: DataFrame, on_cell: bool = False, k: int = TOP_K
) -> DataFrame:
    """ADC scan (PQ_M lookups + ordered-fold adds per candidate) + top-k.

    ``on_cell=True`` additionally equi-joins on the IVF cell key (the
    IVF-PQ shape: a candidate is scored only by the probes that reached
    its cell). ``k`` is the candidate depth — TOP_K for the direct PQ
    answer, RERANK_R when the output feeds the exact-rescore refine
    stage."""
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        F.lit(0.0),
        lambda acc, m: acc
        + F.element_at(
            F.element_at(F.col("grid"), m + F.lit(1)),
            F.element_at(F.col("codes"), m + F.lit(1)) + F.lit(1),
        ),
    )
    cond = F.col("vec_id") != F.col("query_id")
    if on_cell:
        cond = (coded["cell"] == luts["cell"]) & cond
    scored = coded.join(F.broadcast(luts), cond).select(
        "query_id", F.col("vec_id").alias("neighbor_id"), adc.alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "rnk", "neighbor_id", "adc_dist")
    )


_PQ_IDS_SQL = ", ".join(str(i) for i in PQ_SEED_IDS)
_PQ_SEEDS_LIST = "[" + _PQ_IDS_SQL + "]"


def _sql_sub_sqd(vexpr: str) -> str:
    """DuckDB squared L2 between vexpr's m-th sub-vector and cb.cw."""
    diff = (
        f"list_transform(generate_series(1, {PQ_SUBDIM}),"
        f" i -> {vexpr}[cb.m * {PQ_SUBDIM} + i] - cb.cw[i])"
    )
    return f"list_dot_product({diff}, {diff})"


# the ADC sum is GENERATED from PQ_M (fixed-order left-assoc adds,
# matching the Spark fold) so changing the subspace count cannot leave
# the oracles covering only a prefix of the m range
_SQL_ADC_SUM = "\n         + ".join(
    f"max(CASE WHEN c.m = {m} THEN ld END)" for m in range(PQ_M)
)


def _sql_pq_cb_codes(src: str, keep: tuple = ()) -> str:
    """cb + codes CTE text over ``src`` rows (vec_id, v[, *keep]) —
    the single source of the codebook/encoding SQL shared by every
    PQ oracle (same lockstep discipline as dedup's _SQL_CANON_STAGES)."""
    k_outer = "".join(f"{c}, " for c in keep)
    k_inner = "".join(f"a.{c}, " for c in keep)
    return f"""ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
cb AS (
  SELECT ms.m,
         CAST(list_position({_PQ_SEEDS_LIST}, a.vec_id) - 1 AS INT) AS code,
         a.v[ms.m * {PQ_SUBDIM} + 1 : ms.m * {PQ_SUBDIM} + {PQ_SUBDIM}] AS cw
  FROM {src} a, ms WHERE a.vec_id IN ({_PQ_IDS_SQL})),
codes AS (
  SELECT vec_id, {k_outer}m, code FROM (
    SELECT a.vec_id, {k_inner}cb.m, cb.code,
           row_number() OVER (PARTITION BY a.vec_id, cb.m
                              ORDER BY {_sql_sub_sqd('a.v')} ASC, cb.code ASC) AS rn
    FROM {src} a, cb) WHERE rn = 1)"""


ORACLE_ANN_PQ = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
{_sql_pq_cb_codes('e')},
lut AS (
  SELECT q.vec_id AS query_id, cb.m, cb.code, {_sql_sub_sqd('q.v')} AS ld
  FROM e q, cb WHERE q.vec_id < {N_QUERIES}),
adc AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         {_SQL_ADC_SUM} AS adc_dist
  FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
  WHERE c.vec_id <> l.query_id
  GROUP BY 1, 2),
ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk
  FROM adc)
SELECT query_id, rnk, neighbor_id, adc_dist FROM ranked WHERE rnk <= {TOP_K}
"""


# Rerank candidate depth: how many ADC survivors get the exact rescore.
# Sized >= the eval corpus's densest cluster occupancy (2000/16 = 125 at
# sf0.1) so the refine stage can see past PQ's within-cluster ADC ties;
# production FAISS refine typically uses 4-50x k — the knob trades one
# exact distance per survivor against recall, never correctness.
RERANK_R = 128

# Coverage sweep for the clustered eval (round-9 verdict #3): rerank
# recall at each R, so the R/N coverage caveat is a measured curve (the
# eval emits a pq_rerank_r{R} row per point below RERANK_R; RERANK_R
# itself is the pq_rerank row). Measured on the clustered corpus,
# sf0.01 / sf0.1: r16 -> 0.48 / 0.08 (R below cluster occupancy —
# ADC ties truncate the pool inside the right cluster), r64 -> 1.00 /
# 0.66 (covers sf0.01's ~31-member clusters fully, sf0.1's ~125 only
# halfway), r128 = pq_rerank -> 1.00 / 1.00 (covers the densest cluster
# at both SFs). Recall rises with R and saturates exactly when R
# reaches cluster occupancy — the sizing rule a deployment applies to
# its own cluster-size histogram, now measured instead of asserted.
RERANK_SWEEP_RS = (16, 64, RERANK_R)


def q_ann_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN with an exact-rescore refine stage — FAISS's IndexRefine /
    IVFADC+R composition (Jegou et al. TPAMI'11 §VI): the ADC scan keeps
    its memory-bounded candidate generation, but the top-RERANK_R ADC
    survivors per query are re-scored with the EXACT cosine against the
    raw vectors, and the final top-k ranks on that. This closes the
    documented PQ failure mode (``ann_eval_recall_clustered``: ADC ties
    inside a cluster — right cluster, unrankable members, recall 0.20):
    ties among survivors are broken by true distance, so recall is
    bounded by candidate coverage, not quantization resolution. That
    coverage bound is MEASURED, not asserted: the clustered eval's
    ``pq_rerank_r{16,64}`` sweep rows (``RERANK_SWEEP_RS``) read
    0.48/1.00/1.00 at sf0.01 and 0.08/0.66/1.00 at sf0.1 for
    R=16/64/128 — recall saturates exactly when R reaches the densest
    cluster's occupancy, the sizing rule for choosing R at deployment.

    100 TB shape: stage 1 is ann_pq's single code-column scan (ONE
    broadcast codebook row, row-local encode, per-query top-R shuffle of
    Q*R id pairs only). Stage 2 broadcasts the Q*R candidate list (tiny
    by construction) back over the corpus scan, so only the survivors'
    raw vectors are ever re-read — on a real lake a vec_id-keyed point
    lookup; here a second scan pruned to (vec_id, v). The exact rescore
    is Q*R ordered-fold cosines, row-local; the only shuffle is the
    final top-k.

    No reference counterpart (SURVEY §2.11 — [EXT]).
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cb_one = _pq_cb_one(_pq_codebook_entries(emb))
    coded = _pq_codes(emb, cb_one)
    luts = _pq_luts(emb, cb_one)
    cands = _pq_adc_topk(coded, luts, k=RERANK_R).select(
        "query_id", "neighbor_id"
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    rescored = (
        emb.join(F.broadcast(cands), F.col("vec_id") == F.col("neighbor_id"))
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )


_SQL_COS_QV_EV = (
    "list_dot_product(qv, e.v)"
    " / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(e.v, e.v)))"
)

ORACLE_ANN_PQ_RERANK = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
{_sql_pq_cb_codes('e')},
lut AS (
  SELECT q.vec_id AS query_id, cb.m, cb.code, {_sql_sub_sqd('q.v')} AS ld
  FROM e q, cb WHERE q.vec_id < {N_QUERIES}),
adc AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         {_SQL_ADC_SUM} AS adc_dist
  FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
  WHERE c.vec_id <> l.query_id
  GROUP BY 1, 2),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk
    FROM adc) WHERE rnk <= {RERANK_R}),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
rescored AS (
  SELECT c.query_id, c.neighbor_id, {_SQL_COS_QV_EV} AS cos_sim
  FROM cand c
  JOIN e ON e.vec_id = c.neighbor_id
  JOIN q ON q.query_id = c.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM rescored)
SELECT query_id, rnk, neighbor_id, cos_sim FROM ranked WHERE rnk <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# IVF-PQ: coarse Voronoi cells + product quantization on RESIDUALS —
# the standard composition (FAISS IVFADC; Jegou et al. TPAMI'11 §V)
# ---------------------------------------------------------------------------


# full-vector squared L2: the ordered fold whose DuckDB bit-parity
# (list_dot_product of the diff vector) ml.py's kmeans tests pin —
# import, don't re-implement, so the pinned fold shape has ONE owner
from tiny_mapreduce_rpc_server_spark.operators.ml import _sq_dist as _sqd_full


def _ivf_cents_one(emb: DataFrame) -> DataFrame:
    """ONE broadcast row holding all IVF centroids sorted by cell id —
    the shared assignment input of ann_ivf_pq and ann_index_stats."""
    return (
        emb.filter(F.col("vec_id").isin(CENTROID_IDS))
        .select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"))
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("cell", "cv"))).alias("cents"))
    )


def _ranked_cells(v):
    """(d, cell) structs sorted ascending over the broadcast ``cents``
    column — head = nearest cell, ties to the lowest cell id."""
    return F.array_sort(
        F.transform(
            F.col("cents"),
            lambda c: F.struct(
                _sqd_full(v, c["cv"]).alias("d"), c["cell"].alias("cell")
            ),
        )
    )


def q_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN: corpus vectors are assigned to their nearest of 16
    coarse centroids (squared-L2, ties to the lowest cell id), the
    RESIDUAL v - centroid is PQ-encoded with a global 4x16 codebook, and
    a query probes its 2 nearest cells scoring only those cells'
    candidates by residual-ADC lookups. The composition is what both
    pieces exist for: coarse cells bound the candidate set (cost ~
    nprobe/ncells of the corpus), PQ bounds the per-candidate cost and
    memory (4 bytes vs 512), and encoding residuals instead of raw
    vectors removes the cell's mean from what the codebook must
    represent.

    100 TB shape: assignment is row-local against ONE broadcast row of
    16 centroids (no N x C shuffle — compare ann_ivf's window form);
    encoding is row-local against the broadcast codebook; the stored
    artifact per vector is (cell, 4 codes); query-time work is
    nprobe LUT builds + an equi-join on the cell key, so the corpus is
    scanned once and only candidate cells' codes flow; final top-k is
    the only shuffle.

    No reference counterpart (SURVEY §2.11 — [EXT]).
    """
    _, topk = _ivf_pq_pipeline(spark, sf_dir, TOP_K)
    return topk


def _ivf_pq_pipeline(spark: SparkSession, sf_dir: str, k: int):
    """The IVFADC stages shared by ``ann_ivf_pq`` (k=TOP_K) and
    ``ann_ivf_pq_rerank`` (k=RERANK_R, output feeds the exact-rescore
    refine). Returns (emb, adc_topk)."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents_one = _ivf_cents_one(emb)

    def _cv_of(cell):
        return F.element_at(
            F.filter(F.col("cents"), lambda c: c["cell"] == cell), 1
        )["cv"]

    def _residual(v, cell):
        return F.zip_with(v, _cv_of(cell), lambda x, y: x - y)

    with_cell = (
        emb.join(F.broadcast(cents_one))
        .withColumn("cell", _ranked_cells(F.col("v"))[0]["cell"])
        .select("vec_id", "cell", _residual(F.col("v"), F.col("cell")).alias("v"))
    )
    # global residual codebook from the same fixed seed rows (their
    # residuals), then row-local encoding — reuses the PQ stages verbatim
    cb_entries = _pq_codebook_entries(with_cell)
    cb_one = _pq_cb_one(cb_entries)
    coded = _pq_codes(with_cell, cb_one, keep=("vec_id", "cell"))
    # queries: NPROBE nearest cells, one residual LUT per (query, cell)
    probes = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cents_one))
        .select(
            F.col("vec_id").alias("query_id"),
            "v",
            F.explode(
                F.slice(
                    F.transform(_ranked_cells(F.col("v")), lambda s: s["cell"]),
                    1,
                    N_PROBE,
                )
            ).alias("cell"),
            F.col("cents").alias("cents"),
        )
        .select(
            "query_id",
            "cell",
            _residual(F.col("v"), F.col("cell")).alias("v"),
        )
    )
    luts = probes.join(F.broadcast(cb_one)).select(
        "query_id", "cell", _pq_grid_col().alias("grid")
    )
    return emb, _pq_adc_topk(coded, luts, on_cell=True, k=k)


def q_ann_ivf_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC+R — the full composition of Jegou et al. TPAMI'11 §VI and
    FAISS's ``IVFPQR``: coarse cells bound the candidate set, residual
    PQ bounds per-candidate cost/memory, and the top-RERANK_R ADC
    survivors per query get an exact-cosine rescore against the RAW
    vectors before the final top-k. Completes the rerank story started
    by ``ann_pq_rerank``: recall becomes bounded by candidate coverage
    (cells probed x R), not quantization resolution.

    100 TB shape: stages 1-2 are ``ann_ivf_pq``'s single coded-column
    scan (broadcast centroid row + codebook row, cell-keyed ADC join);
    the refine broadcasts the Q*R candidate id list back over one
    pruned corpus scan (a vec_id point lookup on a real lake) and the
    exact rescore is Q*R row-local ordered-fold cosines.

    No reference counterpart (SURVEY §2.11 — [EXT]).
    """
    emb, cands = _ivf_pq_pipeline(spark, sf_dir, RERANK_R)
    cands = cands.select("query_id", "neighbor_id")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    rescored = (
        emb.join(F.broadcast(cands), F.col("vec_id") == F.col("neighbor_id"))
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )


_IVFPQ_CENT_IDS_SQL = ", ".join(str(i) for i in CENTROID_IDS)


def _sql_sqd_full(a: str, b: str) -> str:
    diff = f"list_transform(generate_series(1, {DIM}), i -> {a}[i] - {b}[i])"
    return f"list_dot_product({diff}, {diff})"


ORACLE_ANN_IVF_PQ = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id IN ({_IVFPQ_CENT_IDS_SQL})),
assigned AS (
  SELECT vec_id, cell,
         list_transform(generate_series(1, {DIM}), i -> v[i] - cv[i]) AS v
  FROM (
    SELECT e.vec_id, cents.cell, e.v, cents.cv,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sql_sqd_full('e.v', 'cents.cv')} ASC,
                                       cents.cell ASC) AS rn
    FROM e, cents) WHERE rn = 1),
{_sql_pq_cb_codes('assigned', ('cell',))},
probes AS (
  SELECT query_id, cell,
         list_transform(generate_series(1, {DIM}), i -> qv[i] - cv[i]) AS v
  FROM (
    SELECT q.vec_id AS query_id, cents.cell, q.v AS qv, cents.cv,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_sql_sqd_full('q.v', 'cents.cv')} ASC,
                                       cents.cell ASC) AS rn
    FROM e q, cents WHERE q.vec_id < {N_QUERIES}) WHERE rn <= {N_PROBE}),
lut AS (
  SELECT p.query_id, p.cell, cb.m, cb.code, {_sql_sub_sqd('p.v')} AS ld
  FROM probes p, cb),
adc AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         {_SQL_ADC_SUM} AS adc_dist
  FROM codes c
  JOIN lut l ON l.cell = c.cell AND l.m = c.m AND l.code = c.code
  WHERE c.vec_id <> l.query_id
  GROUP BY 1, 2),
ranked AS (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist ASC, neighbor_id ASC) AS rnk
  FROM adc)
SELECT query_id, rnk, neighbor_id, adc_dist FROM ranked WHERE rnk <= {TOP_K}
"""


# IVFADC+R oracle: the SAME CTE chain as ORACLE_ANN_IVF_PQ (single
# owner — derived by swapping the final cut), candidates kept to
# RERANK_R, then exact-cosine rescore on the raw vectors.
# Import-time guard (ADVICE r9): if the base oracle's final SELECT ever
# drifts, str.replace would silently no-op and the rerank oracle would
# degrade to the plain IVFPQ oracle — fail loudly here instead.
_IVF_PQ_FINAL_SELECT = (
    f"SELECT query_id, rnk, neighbor_id, adc_dist FROM ranked WHERE rnk <= {TOP_K}"
)
assert _IVF_PQ_FINAL_SELECT in ORACLE_ANN_IVF_PQ, (
    "ORACLE_ANN_IVF_PQ final SELECT drifted; update _IVF_PQ_FINAL_SELECT"
)
ORACLE_ANN_IVF_PQ_RERANK = ORACLE_ANN_IVF_PQ.replace(
    _IVF_PQ_FINAL_SELECT,
    f""", cand AS (
  SELECT query_id, neighbor_id FROM ranked WHERE rnk <= {RERANK_R}),
qr AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
resc AS (
  SELECT c.query_id, c.neighbor_id, {_SQL_COS_QV_EV} AS cos_sim
  FROM cand c
  JOIN e ON e.vec_id = c.neighbor_id
  JOIN qr ON qr.query_id = c.query_id),
rr AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rnk
  FROM resc)
SELECT query_id, rnk, neighbor_id, cos_sim FROM rr WHERE rnk <= {TOP_K}""",
)


def q_ann_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index health report — FAISS's imbalance-factor diagnostics
    for BOTH index structures this module builds: IVF cell balance
    (a skewed cell turns nprobe into a corpus scan; an empty cell is
    wasted training) and per-subspace PQ code usage (dead codewords
    mean the effective codebook is smaller than K and quantization
    error is higher than budgeted). This is the query an index owner
    runs BEFORE trusting ann_ivf / ann_pq latencies at scale.

    Output: one row per index part ('ivf_cell', 'pq_m0'..'pq_m3') —
    keys used vs total, item count, min/max bucket, and the imbalance
    factor max_bucket * n_keys_total / n_items (1.0 = perfectly
    balanced; FAISS convention). Imbalance is an integer ratio, so the
    double is bit-identical in both engines.

    100 TB shape: both assignments are row-local against single
    broadcast rows (the IVF argmin reuses ann_ivf_pq's ranked-cells
    expression, the PQ encode reuses _pq_codes), so the whole report
    is one corpus scan + K-bounded aggregates.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cells = (
        emb.join(F.broadcast(_ivf_cents_one(emb)))
        .select(_ranked_cells(F.col("v"))[0]["cell"].alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.lit("ivf_cell").alias("part"), "k", "n")
    )
    codes = _pq_codes(emb, _pq_cb_one(_pq_codebook_entries(emb)))
    code_parts = (
        codes.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                    lambda m: F.struct(
                        F.concat(F.lit("pq_m"), m.cast("string")).alias("part"),
                        F.element_at(F.col("codes"), m + F.lit(1))
                        .cast("long")
                        .alias("k"),
                    ),
                )
            ).alias("e")
        )
        .select("e.part", "e.k")
        .groupBy("part", "k")
        .agg(F.count("*").alias("n"))
    )
    buckets = cells.unionAll(code_parts)
    total_keys = F.when(F.col("part") == "ivf_cell", F.lit(N_CELLS)).otherwise(
        F.lit(PQ_K)
    )
    return buckets.groupBy("part").agg(
        F.count("*").alias("n_keys_used"),
        F.max(total_keys).alias("n_keys_total"),
        F.sum("n").alias("n_items"),
        F.min("n").alias("min_bucket"),
        F.max("n").alias("max_bucket"),
        (
            (F.max("n") * F.max(total_keys)).cast("double") / F.sum("n")
        ).alias("imbalance"),
    )


ORACLE_ANN_INDEX_STATS = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id IN ({_IVFPQ_CENT_IDS_SQL})),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, cents.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_sql_sqd_full('e.v', 'cents.cv')} ASC,
                                       cents.cell ASC) AS rn
    FROM e, cents) WHERE rn = 1),
cellbuckets AS (
  SELECT 'ivf_cell' AS part, cell AS k, count(*) AS n
  FROM assigned GROUP BY cell),
{_sql_pq_cb_codes('e')},
codebuckets AS (
  SELECT 'pq_m' || CAST(m AS VARCHAR) AS part, CAST(code AS BIGINT) AS k,
         count(*) AS n
  FROM codes GROUP BY m, code),
buckets AS (SELECT * FROM cellbuckets UNION ALL SELECT * FROM codebuckets)
SELECT part, count(*) AS n_keys_used,
       max(CASE WHEN part = 'ivf_cell' THEN {N_CELLS} ELSE {PQ_K} END) AS n_keys_total,
       sum(n)::BIGINT AS n_items,
       min(n) AS min_bucket, max(n) AS max_bucket,
       CAST(max(n) * max(CASE WHEN part = 'ivf_cell' THEN {N_CELLS} ELSE {PQ_K} END)
            AS DOUBLE) / sum(n) AS imbalance
FROM buckets
GROUP BY part
"""


def q_ann_pq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_pq`` with the PQ index actually PERSISTED — the serving
    shape executed end-to-end (same lake-roundtrip discipline as
    ``dedup_incremental_persisted``). Two parquet tables model the
    stored index:

    - ``codebook``: the trained (m, code, cw) table — what the offline
      training job maintains;
    - ``codes``: the encoded corpus (vec_id, codes) — 4 small ints per
      vector, the 128x-compressed column the ADC scan actually reads.

    Build phase WRITES both; probe phase reads ONLY the stored tables
    plus the incoming query vectors (the one legitimately fresh input
    of a serving path) — no corpus float vector is re-read or
    re-encoded at query time. Same output contract and oracle as
    ``ann_pq``, so the hash comparison proves stored-probe == in-plan
    derivation.

    100 TB notes: the codes table is the only corpus-sized artifact and
    it is ~the size of a bigint column; re-encoding happens only when
    the codebook retrains. Here both tables are plain parquet (no
    catalog in this container); a real lake would sort/cluster codes by
    code prefix for cell-level skipping."""
    import os as _os
    import tempfile as _tempfile

    sf = _os.path.basename(_os.path.normpath(sf_dir))
    base = _os.path.join(_tempfile.gettempdir(), f"tmrs_pq_index_{sf}")
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cb_entries = _pq_codebook_entries(emb)
    # ---- build: offline train + encode jobs (write the lake state) ----
    cb_entries.write.mode("overwrite").parquet(base + "/codebook")
    _pq_codes(emb, _pq_cb_one(cb_entries)).write.mode("overwrite").parquet(
        base + "/codes"
    )
    # ---- probe: stored tables + fresh query vectors only ----
    stored_cb = spark.read.parquet(base + "/codebook")
    stored_codes = spark.read.parquet(base + "/codes")
    luts = _pq_luts(emb, _pq_cb_one(stored_cb))
    return _pq_adc_topk(stored_codes, luts)


def q_ann_pq_rerank_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_pq_rerank`` with the WHOLE serving index persisted — the
    FAISS ``IndexRefine`` deployment shape: the stored state is the
    codebook, the encoded codes, AND the raw-vector refine store (the
    refine stage's point-lookup table; in FAISS the refine index holds
    the full vectors next to the compressed ones). Probe reads ONLY the
    three stored tables plus fresh query vectors: stored codes drive
    the ADC top-RERANK_R, the candidate id list broadcasts over the
    stored refine table for the exact rescore — no live corpus input
    anywhere. Shares ``ORACLE_ANN_PQ_RERANK``, so the hash comparison
    proves stored-probe == in-plan derivation end to end.

    100 TB notes: the refine store is the corpus's float column keyed
    by vec_id — on a real lake a point-lookup-friendly layout (bucketed
    or sorted by vec_id) so the Q*R candidate fetch is file-pruned, not
    a full scan."""
    import os as _os
    import tempfile as _tempfile

    sf = _os.path.basename(_os.path.normpath(sf_dir))
    base = _os.path.join(_tempfile.gettempdir(), f"tmrs_pqr_index_{sf}")
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cb_entries = _pq_codebook_entries(emb)
    # ---- build: train + encode + refine-store writes ----
    cb_entries.write.mode("overwrite").parquet(base + "/codebook")
    _pq_codes(emb, _pq_cb_one(cb_entries)).write.mode("overwrite").parquet(
        base + "/codes"
    )
    emb.write.mode("overwrite").parquet(base + "/vectors")
    # ---- probe: stored tables + fresh query vectors only ----
    stored_cb_one = _pq_cb_one(spark.read.parquet(base + "/codebook"))
    stored_codes = spark.read.parquet(base + "/codes")
    stored_vecs = spark.read.parquet(base + "/vectors")
    luts = _pq_luts(emb, stored_cb_one)
    cands = _pq_adc_topk(stored_codes, luts, k=RERANK_R).select(
        "query_id", "neighbor_id"
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    rescored = (
        stored_vecs.join(
            F.broadcast(cands), F.col("vec_id") == F.col("neighbor_id")
        )
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "rnk", "neighbor_id", "cos_sim")
    )


SIMILARITY_QUERIES: list[QuerySpec] = [
    QuerySpec(
        "ann_pq",
        q_ann_pq,
        ORACLE_ANN_PQ,
        ("ext", "similarity", "pq"),
        bench=True,
    ),
    QuerySpec(
        "ann_pq_rerank",
        q_ann_pq_rerank,
        ORACLE_ANN_PQ_RERANK,
        ("ext", "similarity", "pq", "rerank"),
        bench=True,
    ),
    QuerySpec(
        "ann_pq_persisted",
        q_ann_pq_persisted,
        ORACLE_ANN_PQ,
        ("ext", "similarity", "pq", "lakehouse"),
    ),
    QuerySpec(
        "ann_pq_rerank_persisted",
        q_ann_pq_rerank_persisted,
        ORACLE_ANN_PQ_RERANK,
        ("ext", "similarity", "pq", "rerank", "lakehouse"),
    ),
    QuerySpec(
        "ann_ivf_pq",
        q_ann_ivf_pq,
        ORACLE_ANN_IVF_PQ,
        ("ext", "similarity", "pq", "ivf"),
    ),
    QuerySpec(
        "ann_ivf_pq_rerank",
        q_ann_ivf_pq_rerank,
        ORACLE_ANN_IVF_PQ_RERANK,
        ("ext", "similarity", "pq", "ivf", "rerank"),
    ),
    QuerySpec(
        "ann_index_stats",
        q_ann_index_stats,
        ORACLE_ANN_INDEX_STATS,
        ("ext", "similarity", "eval", "dq"),
    ),
    QuerySpec(
        "source_semantic_similarity",
        q_source_semantic_similarity,
        ORACLE_SOURCE_SEMANTIC,
        ("ext", "embedding", "similarity", "corpus-map"),
    ),
    QuerySpec(
        "embedding_matryoshka",
        q_embedding_matryoshka,
        ORACLE_EMBEDDING_MATRYOSHKA,
        ("ext", "embedding", "similarity", "eval"),
    ),
    QuerySpec(
        "hard_negative_mining",
        q_hard_negative_mining,
        ORACLE_HARD_NEGATIVE_MINING,
        ("ext", "similarity", "training"),
    ),
    QuerySpec(
        "embedding_quantize",
        q_embedding_quantize,
        ORACLE_EMBEDDING_QUANTIZE,
        ("ext", "similarity", "quantization"),
    ),
    QuerySpec(
        "ann_eval_recall",
        q_ann_eval_recall,
        _oracle_ann_eval_recall(),
        ("ext", "similarity", "eval"),
    ),
    QuerySpec(
        "embedding_normalize",
        q_embedding_normalize,
        ORACLE_EMBEDDING_NORMALIZE,
        ("ext", "embedding"),
    ),
    QuerySpec(
        "embedding_centroids",
        q_embedding_centroids,
        ORACLE_EMBEDDING_CENTROIDS,
        ("ext", "embedding", "ml"),
        bench=True,
    ),
    QuerySpec(
        "ann_eval_recall_clustered",
        q_ann_eval_recall_clustered,
        _oracle_ann_eval_recall_clustered(),
        ("ext", "similarity", "eval"),
    ),
    QuerySpec("ann_bruteforce", q_ann_bruteforce, ORACLE_ANN_BRUTEFORCE, ("ext", "similarity"), bench=True),
    QuerySpec("ann_lsh_bucketed", q_ann_lsh_bucketed, ORACLE_ANN_LSH, ("ext", "similarity")),
    QuerySpec("ann_ivf", q_ann_ivf, ORACLE_ANN_IVF, ("ext", "similarity", "ivf"), bench=True),
    QuerySpec("ann_ml_brp", q_ann_ml_brp, None, ("ext", "similarity", "ml")),
]
