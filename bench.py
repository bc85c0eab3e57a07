"""Bench harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (collect) so the timing covers the
whole plan including shuffles.

Drift protocol (round-9 verdict #4): EVERY headliner runs warm
median-of-3 — one untimed warm run (absorbs per-plan codegen/JIT, the
dominant single-run noise source: BENCH_r08's 1.33x-vs-baseline read
came from exactly this class of box drift), then 3 timed runs, median
reported. Session-level fixed costs (JVM spin-up, parquet-footer reader
init, first shuffle/SMJ/window codegen, Python worker pool) are
absorbed once up front. Internal caches are dropped between runs so a
query that .cache()s never gets warm-cache credit.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from tiny_mapreduce_rpc_server_spark import get_spark, release_caches
from tiny_mapreduce_rpc_server_spark.registry import all_queries


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench")
    # Absorb SESSION startup (not per-plan warmup): JVM spin-up, first
    # parquet-footer reader init, first shuffle exchange, and the Python
    # worker pool for Arrow UDFs. These are per-session fixed costs that
    # would otherwise land entirely on whichever query happens to run
    # first (registry order), making round-over-round per-query deltas
    # noise.
    spark.range(1).count()
    smallest = os.path.join(sf_dir, "region.parquet")
    if os.path.exists(smallest):
        spark.read.parquet(smallest).groupBy("r_regionkey").count().count()
    spark.range(2).mapInPandas(lambda it: it, "id long").count()
    # sort-merge join + window codegen warm (observed: the first SMJ of a
    # session costs ~2.5s extra regardless of which query runs it)
    r = spark.range(64)
    r.hint("merge").join(r.withColumnRenamed("id", "id2"), r.id == F.col("id2")).count()
    from pyspark.sql import Window

    r.select(F.sum("id").over(Window.orderBy("id"))).count()

    specs = [s for s in all_queries().values() if s.bench]
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    for spec in specs:

        def run_once():
            # drop cached blocks from prior runs: a query that .cache()s
            # internally must not get warm-cache credit across repetitions
            # (release_caches also drops the driver-side references the
            # dedup module tracks, so nothing accumulates across a run)
            release_caches()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            n = df.count() if spec.oracle is None else len(df.collect())
            return time.perf_counter() - t0, n

        try:
            _, n = run_once()  # untimed warm run (plan codegen/JIT)
            times = sorted(run_once()[0] for _ in range(reps))
            dt = times[len(times) // 2]
        except Exception as exc:  # one broken query must not kill the bench
            errors[spec.name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {spec.name}: FAILED {type(exc).__name__}", file=sys.stderr)
            continue
        timings[spec.name] = round(dt, 3)
        spread = times[-1] - times[0]
        print(
            f"# {spec.name}: {dt:.3f}s rows~{n} "
            f"(warm median of {reps}, spread {spread:.3f}s)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
