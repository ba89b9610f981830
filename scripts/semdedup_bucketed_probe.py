"""semdedup_bucketed probe at the 1M-vector scale (r12 verdict #8):
price the write-once cluster-bucketed layout where it matters — the
LARGE_K pandas-screen regime the 100 TB story rides — against the
in-session semdedup run the sf0.1 numbers already cover.

Prints four wall-clocks plus survivor-set equality:

  in-session semdedup      — fit + assign + screen, nothing persisted
  bucketed first run       — fit + assign + bucketed WRITE + screen
  re-screen @ same thr     — semdedup_rescreen only (the payoff path)
  re-screen @ looser thr   — the threshold-sweep shape

so the write premium and the per-re-screen payoff are readable
directly.  Records go to SCALE_NOTES.md by hand.

    python scripts/semdedup_bucketed_probe.py [n_vecs] [k]

Defaults 1_000_000 vectors / k=10_000 match the standing scale_probe
semdedup row for comparability.  Host CPU-steal on this VM spans 6x
minute-to-minute — judge by the within-session ratios, not absolutes.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    sys.path.insert(0, ".")
    from market_insights_app_spark.operators.similarity import (
        semdedup,
        semdedup_bucketed,
        semdedup_rescreen,
    )
    from market_insights_app_spark.session import get_spark
    from market_insights_app_spark.sources.bucketed import drop_bucketed

    spark = get_spark(app_name="mias-semdedup-bkt-probe")
    print(f"start 1-min loadavg: {os.getloadavg()[0]:.2f}")

    # same synthetic embedding recipe as scripts/scale_probe.py so the
    # numbers sit in one comparable series
    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id") * 100 + i), F.lit(2001)) - 1000
            )
            / 1000.0,
        ).alias("embedding"),
    )
    vecs.persist()
    print(f"vecs rows: {vecs.count():,}  dim=64  k={k}")

    table = "probe_semdedup_bkt_1m"
    drop_bucketed(spark, table)

    def timed(label: str, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"{label:34s} {dt:7.2f} s" + (f"   rows={out:,}" if out is not None else ""))
        return dt

    t_insess = timed(
        "in-session semdedup thr=0.999",
        lambda: semdedup(vecs, k=k, iters=1, threshold=0.999).count(),
    )
    t_first = timed(
        "bucketed fit+write+screen 0.999",
        lambda: semdedup_bucketed(
            vecs, table, k=k, iters=1, threshold=0.999
        ).count(),
    )
    t_re_same = timed(
        "re-screen only thr=0.999",
        lambda: semdedup_rescreen(spark, table, threshold=0.999).count(),
    )
    t_re_loose = timed(
        "re-screen only thr=0.95",
        lambda: semdedup_rescreen(spark, table, threshold=0.95).count(),
    )

    # incremental arrivals: 10% of corpus size assigned to the FROZEN
    # centroids and appended into the layout, then one full re-screen —
    # the production cadence (refit periodically, assign incrementally)
    from market_insights_app_spark.operators.similarity import (
        semdedup_bucketed_append,
    )

    n_delta = max(1, n_vecs // 10)
    delta = spark.range(n_vecs, n_vecs + n_delta).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id") * 100 + i), F.lit(2001)) - 1000
            )
            / 1000.0,
        ).alias("embedding"),
    )
    t_append = timed(
        f"append {n_delta:,} arrivals",
        lambda: semdedup_bucketed_append(delta, table),
    )
    t_re_after = timed(
        "re-screen after append",
        lambda: semdedup_rescreen(spark, table, threshold=0.999).count(),
    )

    s_in = {r[0] for r in semdedup(vecs, k=k, iters=1, threshold=0.999).collect()}
    s_all = {
        r[0] for r in semdedup_rescreen(spark, table, threshold=0.999).collect()
    }
    # min-id keep rule: higher-id arrivals cannot change base survivors
    s_bkt = {i for i in s_all if i < n_vecs}
    print(
        f"base survivor sets identical: {s_in == s_bkt}  "
        f"(base n={len(s_bkt):,}, +delta survivors "
        f"{len(s_all) - len(s_bkt):,})"
    )

    premium = t_first - t_insess
    saving = t_insess - t_re_same
    print(
        f"write premium {premium:+.2f} s once; re-screen saves "
        f"{saving:.2f} s/run vs in-session "
        f"({t_insess / max(t_re_same, 1e-9):.1f}x); loose-threshold "
        f"sweep pass {t_re_loose:.2f} s"
    )

    drop_bucketed(spark, table)
    drop_bucketed(spark, f"{table}__centroids")
    vecs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
