"""AQE skew-join probe: demonstrate that the session's
``spark.sql.adaptive.skewJoin`` setting actually engages on a hot-key
join, and price what it buys.

The repo's skew discipline is two-sided: AGGREGATION skew is handled
by explicit salting (operators/windows.salted_hot_agg — AQE cannot
split a skewed groupBy, the partial agg already collapsed the key),
while JOIN skew is delegated to AQE, which splits an oversized
shuffle partition into multiple tasks and replicates the matching
side.  This probe verifies the delegated half: one key owning ~30%
of a 20 M-row fact is joined to a 100 k-row dim (broadcast disabled
so the join genuinely shuffles), once with skewJoin off and once on.
The ON run must show ``skew=true`` on the SortMergeJoin node of the
executed plan; wall-clocks print for the imbalance cost.  Records go
to SCALE_NOTES.md by hand.

    python scripts/skew_probe.py [n_rows] [hot_share]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3

    sys.path.insert(0, ".")
    from market_insights_app_spark.session import get_spark

    spark = get_spark(app_name="mias-skew-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    # the default 256 MB threshold assumes cluster-sized partitions;
    # scale it to the probe so the hot partition (~60-80 MB of rows)
    # is recognized as skewed the same way a 100× one would be
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    # fact: hot_share of rows on key 0, rest uniform over 100k keys
    fact = (
        spark.range(n_rows)
        .withColumn(
            "k",
            F.when(
                (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1e6) < hot_share,
                F.lit(0),
            ).otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000))),
        )
        .withColumn("v", F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)) / 100.0)
        .withColumnRenamed("id", "rid")
    )
    dim = (
        spark.range(100_000)
        .withColumnRenamed("id", "k")
        .withColumn("w", F.pmod(F.xxhash64("k", F.lit(3)), F.lit(1_000)) / 10.0)
    )
    joined = fact.join(dim, "k").select(
        F.sum(F.col("v") * F.col("w")).alias("s"), F.count(F.lit(1)).alias("n")
    )

    def run(label: str) -> float:
        t0 = time.perf_counter()
        joined.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(f"{label:28s} {dt:7.2f} s")
        return dt

    print(f"fact rows: {n_rows:,}  hot-key share: {hot_share:.0%}")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t_off = min(run("skewJoin OFF") for _ in range(2))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t_on = min(run("skewJoin ON") for _ in range(2))
    # AQE finalizes per-ACTION: each write created its own
    # QueryExecution, so inspect a plan this very DataFrame executed
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    has_skew = "skew=true" in plan
    print(f"executed plan marks skew=true: {has_skew}")
    assert has_skew, "AQE did not mark the join skewed — thresholds off?"
    print(f"hot-task imbalance cost at local[32]: {t_off - t_on:+.2f} s")

    spark.stop()


if __name__ == "__main__":
    main()
