"""Streaming throughput probe: drive the micro-batch runtime one to
two orders above the sf0.1 bench and record rows/sec per operator —
the streaming sibling of scale_probe.py.  Events are written as
multiple parquet files and replayed with maxFilesPerTrigger, so the
run exercises real micro-batch boundaries (state carried across
batches), not one monolithic batch.

  tumbling_agg   — JVM-side windowed aggregation (the fast path)
  with_dedup     — watermark + dropDuplicates keyed state
  ema_stateful   — applyInPandasWithState, per-row Python loop by
                   design (sequential EMA): this is the SLOW lane and
                   the probe prices exactly how slow, so the repo's
                   "UDFs are the slow path" guidance carries a number

    python scripts/streaming_probe.py [n_fast] [n_python]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> None:
    n_fast = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_python = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    sys.path.insert(0, ".")
    from market_insights_app_spark.session import get_spark
    from market_insights_app_spark.streaming.ingest import (
        ema_stateful,
        run_available_now_to_memory,
        tumbling_agg,
        with_dedup,
    )

    spark = get_spark(app_name="mias-streaming-probe")
    root = tempfile.mkdtemp(prefix="stream_probe_")

    def gen(n: int, dup_every: int = 0):
        ev = (
            spark.range(n)
            .withColumn(
                "event_id",
                F.col("id") if not dup_every else F.col("id") - F.pmod("id", F.lit(dup_every)),
            )
            .withColumn("ts", F.timestamp_seconds(F.lit(1700000000) + F.pmod("id", F.lit(86_400))))
            .withColumn("user_id", F.pmod(F.xxhash64("id"), F.lit(10_000)))
            .withColumn("value", F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) / 100.0)
            .select("event_id", "ts", "user_id", "value")
        )
        return ev

    def replay(path: str, plan_fn, name: str, n: int, mode: str = "append"):
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
            .option("maxFilesPerTrigger", 2)
            .parquet(path)
        )
        t0 = time.perf_counter()
        q = run_available_now_to_memory(plan_fn(stream), name, output_mode=mode)
        dt = time.perf_counter() - t0
        out_rows = spark.table(name).count()
        print(
            f"{name:16s} {dt:7.2f} s  {n / dt / 1e6:6.2f} M rows/s in  "
            f"({out_rows:,} rows out, {len(q.recentProgress)} micro-batches)"
        )

    fast_path = f"{root}/fast"
    gen(n_fast).repartition(8).write.mode("overwrite").parquet(fast_path)
    py_path = f"{root}/py"
    gen(n_python, dup_every=0).repartition(8).write.mode("overwrite").parquet(py_path)
    dup_path = f"{root}/dup"
    gen(n_fast, dup_every=2).repartition(8).write.mode("overwrite").parquet(dup_path)

    print(f"fast-lane rows: {n_fast:,}   python-lane rows: {n_python:,}")
    replay(
        fast_path,
        lambda s: tumbling_agg(s, "15 minutes", key_col="user_id"),
        "probe_tumbling",
        n_fast,
    )
    replay(
        dup_path,
        lambda s: with_dedup(s, ["event_id"]),
        "probe_dedup",
        n_fast,
    )
    replay(py_path, lambda s: ema_stateful(s), "probe_ema", n_python)

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
