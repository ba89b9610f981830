"""Common-neighbor link-prediction probe (r13 continuation): price
the degree-capped wedge enumeration at graph sizes where the uncapped
form explodes — the synthetic skewed link graph's hub arm gives the
first ~2% of node ids degree 50+, so uncapped per-center work grows
as Σdeg² exactly where the prediction signal is weakest.

Prints the und-edge count, the capped vs uncapped wedge-work bound
(Σ C(deg,2) over capped centers vs over ALL nodes — what the cap
saves), predicted-pair counts, and the wall.

    python scripts/linkpred_probe.py [n_nodes] [cap]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    sys.path.insert(0, ".")
    from market_insights_app_spark.operators.graph import (
        link_predict_common_neighbors,
        synthetic_link_graph,
    )
    from market_insights_app_spark.session import get_spark

    spark = get_spark(app_name="mias-linkpred-probe")
    print(f"start 1-min loadavg: {os.getloadavg()[0]:.2f}  n={n:,} cap={cap}")

    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = synthetic_link_graph(docs)

    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
        .persist()
    )
    m = und.count()
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    work = F.col("deg") * (F.col("deg") - 1) / 2
    stats = deg.agg(
        F.sum(work).alias("uncapped"),
        F.sum(F.when(F.col("deg") <= cap, work)).alias("capped"),
        F.max("deg").alias("max_deg"),
        F.count(F.when(F.col("deg") > cap, 1)).alias("hubs_cut"),
    ).collect()[0]
    print(
        f"und edges: {m:,}   max deg: {stats['max_deg']:,}   "
        f"hubs past cap: {stats['hubs_cut']:,}"
    )
    print(
        f"wedge work: uncapped Σ C(deg,2) ≈ {int(stats['uncapped']):,}   "
        f"capped ≈ {int(stats['capped']):,}   "
        f"(cap saves {stats['uncapped'] / max(stats['capped'], 1):.1f}×)"
    )
    und.unpersist()

    t0 = time.perf_counter()
    out = link_predict_common_neighbors(edges, max_center_degree=cap)
    rows = out.count()
    top = out.agg(F.max("common_neighbors")).collect()[0][0]
    print(
        f"link_predict wall {time.perf_counter() - t0:7.2f} s   "
        f"predicted pairs={rows:,}   max common={top}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
