"""Triangle-count probe (r13): price the degree-ordered enumeration
at a graph size where the naive wedge form would be fatal — the
synthetic skewed link graph (quadratic + permutation + hub arms) at
n nodes has hub vertices of degree ~50+ and, at the default 1M nodes,
~3M directed arm edges.

Prints the und-edge count, triangle total, per-stage walls, and the
Σdeg² vs oriented-wedge work ratio (what the orientation saves).

    python scripts/triangle_probe.py [n_nodes]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    sys.path.insert(0, ".")
    from market_insights_app_spark.operators.graph import (
        synthetic_link_graph,
        triangle_count,
    )
    from market_insights_app_spark.session import get_spark

    spark = get_spark(app_name="mias-triangle-probe")
    print(f"start 1-min loadavg: {os.getloadavg()[0]:.2f}  n={n:,}")

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
    stats = deg.agg(
        F.sum(F.col("deg") * F.col("deg")).alias("sum_deg2"),
        F.max("deg").alias("max_deg"),
    ).collect()[0]
    print(
        f"und edges: {m:,}   max deg: {stats['max_deg']:,}   "
        f"naive wedge work Σdeg² ≈ {stats['sum_deg2']:,}"
    )
    und.unpersist()

    t0 = time.perf_counter()
    out = triangle_count(edges)
    rows = out.count()
    total = out.agg(F.sum("triangles")).collect()[0][0]
    print(
        f"triangle_count wall {time.perf_counter() - t0:7.2f} s   "
        f"nodes-in-triangles={rows:,}   triangle-incidences={total:,} "
        f"(triangles={total // 3:,})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
