"""Bucketed-layout probe: measure what the write-once bucket shuffle
actually buys on repeated joins, at 10M fact rows (one to two orders
above the sf0.1 bench).  Prints four wall-clocks:

  plain write      — parquet saveAsTable, no bucket spec
  plain join       — fact ⋈ fact groupBy (shuffles BOTH sides, every run)
  bucketed write   — same data, bucketBy(n, k): the shuffle paid once
  bucketed join    — same join, exchange-free (plan-asserted)

so the break-even is readable directly: bucketed-write overhead is
amortized after (bucketed_write − plain_write) / (plain_join −
bucketed_join) joins of this shape.  Records go to SCALE_NOTES.md by
hand.

    python scripts/bucketed_probe.py [n_rows] [n_buckets]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    sys.path.insert(0, ".")
    from market_insights_app_spark.session import get_spark
    from market_insights_app_spark.sources.bucketed import (
        drop_bucketed,
        read_bucketed,
        write_bucketed,
    )

    spark = get_spark(app_name="mias-bucketed-probe")
    # broadcast would bypass the exchange question we are measuring
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def synth(seed: int):
        # ~100k keys over n_rows rows → big enough that neither join
        # side is broadcastable in good faith at 100 TB scale-up
        return (
            spark.range(n_rows)
            .withColumn("k", F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(100_000)))
            .withColumn("v", (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(10_000)) / 100.0))
            .withColumnRenamed("id", "rid")
        )

    def timed(label: str, fn) -> float:
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        print(f"{label:18s} {dt:7.2f} s")
        return dt

    def join_agg(a, b):
        return (
            a.join(b.withColumnRenamed("v", "v2").withColumnRenamed("rid", "rid2"), "k")
            .groupBy("k")
            .agg(F.sum(F.col("v") + F.col("v2")).alias("s"), F.count(F.lit(1)).alias("n"))
        )

    def run(df):
        df.write.mode("overwrite").format("noop").save()

    print(f"rows per side: {n_rows:,}   buckets: {n_buckets}")

    for t in ("probe_plain_a", "probe_plain_b", "probe_bkt_a", "probe_bkt_b"):
        drop_bucketed(spark, t)

    w_plain = timed("plain write", lambda: (
        synth(1).write.mode("overwrite").format("parquet").saveAsTable("probe_plain_a"),
        synth(2).write.mode("overwrite").format("parquet").saveAsTable("probe_plain_b"),
    ))
    pa, pb = spark.table("probe_plain_a"), spark.table("probe_plain_b")
    t_plain = min(
        timed("plain join", lambda: run(join_agg(pa, pb))) for _ in range(2)
    )

    w_bkt = timed("bucketed write", lambda: (
        write_bucketed(synth(1), "probe_bkt_a", ["k"], n_buckets),
        write_bucketed(synth(2), "probe_bkt_b", ["k"], n_buckets),
    ))
    ba, bb = read_bucketed(spark, "probe_bkt_a"), read_bucketed(spark, "probe_bkt_b")
    plan = join_agg(ba, bb)._jdf.queryExecution().executedPlan().toString()
    n_exch = plan.count("Exchange")
    print(f"bucketed-join Exchange operators in plan: {n_exch}")
    assert n_exch == 0, "bucketed join must be exchange-free"
    t_bkt = min(
        timed("bucketed join", lambda: run(join_agg(ba, bb))) for _ in range(2)
    )

    saved = t_plain - t_bkt
    extra = w_bkt - w_plain
    be = extra / saved if saved > 0 else float("inf")
    print(
        f"per-join saving {saved:.2f} s; bucket-write overhead {extra:.2f} s; "
        f"break-even after {be:.1f} joins"
    )

    for t in ("probe_plain_a", "probe_plain_b", "probe_bkt_a", "probe_bkt_b"):
        drop_bucketed(spark, t)
    spark.stop()


if __name__ == "__main__":
    main()
