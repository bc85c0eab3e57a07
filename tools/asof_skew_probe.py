"""Measure the as-of skew guard on a synthetic hot-key corpus.

`asof_join_sliced` exists because the union-merge as-of join's one
hazard is per-key skew: a single user with millions of events pins one
window partition (operators/temporal.py). This probe makes that claim
a measurement instead of a docstring:

- synthesize an events/orders pair where ONE user holds `--hot` events
  (default 2M) spread over two years while 2,000 normal users hold 50
  each, write them as parquet in the real tables' schemas;
- run `asof_join` (per-uid window) and `asof_join_sliced`
  ((uid, slice) windows + slice carry) on the same files, draining
  each through a non-prunable count+xxhash64 aggregate (nothing
  leaves the executors; Catalyst cannot prune the window);
- assert the two results are IDENTICAL (count + order-insensitive
  row hash), then report best-of-`--reps` wall-clock for each.

Appends/updates the marked section in SHUFFLE.md.

Usage: python tools/asof_skew_probe.py [--hot 2000000] [--reps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from tiny_mapreduce_rpc_server_spark import get_spark, release_caches  # noqa: E402
from tiny_mapreduce_rpc_server_spark.operators.temporal import (  # noqa: E402
    asof_join_last_order,
    asof_join_sliced,
)

N_NORMAL_USERS = 2_000
EVENTS_PER_NORMAL = 50
ORDERS_PER_USER = 10
SPAN_DAYS = 730  # two years -> ~104 weekly slices for the hot key


def _synthesize(spark, base: str, hot: int) -> None:
    t0 = F.to_timestamp(F.lit("2024-01-01 00:00:00")).cast("timestamp_ntz")
    # normal users: 2000 x 50 events; hot user (uid = N_NORMAL_USERS):
    # `hot` events. Deterministic timestamps spread over SPAN_DAYS.
    normal = spark.range(N_NORMAL_USERS * EVENTS_PER_NORMAL).select(
        F.col("id").alias("event_id"),
        (F.col("id") % N_NORMAL_USERS).alias("user_id"),
        (
            t0
            + F.make_interval(
                secs=(F.col("id") * 104729 % (SPAN_DAYS * 86400)).cast("int")
            )
        ).alias("ts"),
    )
    hot_df = spark.range(hot).select(
        (F.col("id") + N_NORMAL_USERS * EVENTS_PER_NORMAL).alias("event_id"),
        F.lit(N_NORMAL_USERS).cast("long").alias("user_id"),
        (
            t0
            + F.make_interval(
                secs=(F.col("id") * 31 % (SPAN_DAYS * 86400)).cast("int")
            )
        ).alias("ts"),
    )
    normal.unionByName(hot_df).write.mode("overwrite").parquet(
        os.path.join(base, "events.parquet")
    )
    spark.range((N_NORMAL_USERS + 1) * ORDERS_PER_USER).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % (N_NORMAL_USERS + 1)).alias("o_custkey"),
        F.date_add(
            F.lit("2024-01-01").cast("date"),
            (F.col("id") * 97 % SPAN_DAYS).cast("int"),
        ).alias("o_orderdate"),
    ).write.mode("overwrite").parquet(os.path.join(base, "orders.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot", type=int, nargs="+",
                    default=[2_000_000, 20_000_000])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    base = "/tmp/asof_skew_probe"
    spark = get_spark("asof-skew")
    spark.range(1).count()

    def drain(df) -> tuple[int, int]:
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return row["n"], int(row["h"])

    variants = {"asof_join": asof_join_last_order, "asof_join_sliced": asof_join_sliced}
    table = []  # (hot, t_plain, t_sliced)
    for hot in args.hot:
        _synthesize(spark, base, hot)
        results: dict[str, tuple[float, int, int]] = {}
        for name, fn in variants.items():
            best = None
            for _ in range(args.reps + 1):  # first rep is the untimed warm
                release_caches()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n, h = drain(fn(spark, base))
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            results[name] = (best, n, h)
            print(f"# hot={hot:,} {name}: best {best:.2f}s rows {n}",
                  file=sys.stderr)
        (tp, n_p, h_p) = results["asof_join"]
        (ts_, n_s, h_s) = results["asof_join_sliced"]
        assert (n_p, h_p) == (n_s, h_s), (
            f"results diverged at hot={hot}: {(n_p, h_p)} vs {(n_s, h_s)}"
        )
        table.append((hot, tp, ts_))

    lines = [
        "",
        "### hot-key measurement (tools/asof_skew_probe.py)",
        "",
        f"Synthetic corpus: one user with N events across {SPAN_DAYS} "
        f"days ({N_NORMAL_USERS:,} normal users x {EVENTS_PER_NORMAL}); "
        "results asserted identical per size (count + order-insensitive "
        f"xxhash64); best-of-{args.reps} warm, drained through a "
        "non-prunable aggregate:",
        "",
        "| hot-key events | asof_join (s) | asof_join_sliced (s) | sliced vs plain |",
        "|---|---|---|---|",
    ]
    for hot, tp, ts_ in table:
        r = tp / ts_ if ts_ > 0 else float("nan")
        lines.append(
            f"| {hot:,} | {tp:.2f} | {ts_:.2f} | "
            f"{'%.1fx faster' % r if r >= 1 else '%.1fx slower' % (1 / r)} |"
        )
    big_hot, big_tp, big_ts = table[-1]
    lines += [
        "",
        "Reading: a single window partition sorts the hot key's rows in "
        "one task, so the guard only pays once that sort dominates — "
        "below the crossover the two variants time within noise (the "
        "guard's extra key/id-sized exchange is sub-second); at "
        f"{big_hot:,} hot-key rows the ~{SPAN_DAYS // 7} weekly slices "
        f"split the pinned stage and the guard runs "
        f"{big_tp / big_ts:.1f}x faster. The variant exists for the "
        "100 TB regime, where a hot key's per-partition row count is "
        "unbounded and the single-task sort ALSO risks executor "
        f"spill/OOM, not just wall-clock. loadavg1 "
        f"{os.getloadavg()[0]:.2f} at finish.",
        "",
    ]
    md = os.path.join(_REPO, "SHUFFLE.md")
    marker = "\n### hot-key measurement (tools/asof_skew_probe.py)"
    prev = open(md).read()
    i = prev.find(marker)
    head = prev[:i] if i >= 0 else prev
    with open(md, "w") as f:
        f.write(head.rstrip("\n") + "\n" + "\n".join(lines))
    print("wrote hot-key section to SHUFFLE.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
