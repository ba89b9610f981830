"""r9 scale probes — synthetic spark.range data, records folded into
SCALE_NOTES.md by hand:

1. PageRank mass-conserving variant: the documented per-iteration cost
   of ``redistribute_dangling=True`` (one global scalar + eager
   lineage cut) vs the evaporating default, at probe scale with a
   realistic dangling fraction.
2. hard_negatives chunked-anchor mining: the full-corpus path (anchors
   streamed in bounded panels) vs one monolithic panel — cost of the
   chunk seam at equal work.

    python scripts/r9_probe.py [n_nodes] [n_pool] [n_anchors] [dim]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_pool = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_anchors = int(sys.argv[3]) if len(sys.argv) > 3 else 4_096
    dim = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from market_insights_app_spark.operators.graph import pagerank
    from market_insights_app_spark.operators.similarity import hard_negatives
    from market_insights_app_spark.session import get_spark

    spark = get_spark(app_name="mias-r9-probe")

    def t(label, fn):
        t0 = time.perf_counter()
        fn()
        print(f"{label:55s} {time.perf_counter() - t0:7.2f} s")

    # --- 1. mass-conserving PageRank: permutation + hub arms only on
    # the FIRST 90% of nodes, so the top decile of ids is dangling
    # (receives hub in-links, forwards nothing) — a realistic sink set
    live = spark.range(int(n_nodes * 0.9)).select(F.col("id").alias("src"))
    edges = live.select(
        "src", ((F.col("src") * 31 + 7) % n_nodes).alias("dst")
    ).union(
        live.select("src", (F.col("src") % max(n_nodes // 50, 1)).alias("dst"))
    )
    print(
        f"pagerank: {n_nodes:,} nodes, ~{2 * int(n_nodes * 0.9):,} edges, "
        f"~10% dangling"
    )
    for flag in (False, True):
        label = "redistribute_dangling=" + str(flag)
        t(
            f"pagerank 10 iters, {label}",
            lambda flag=flag: pagerank(
                edges, iterations=10, redistribute_dangling=flag
            ).write.mode("overwrite").format("noop").save(),
        )

    # --- 2. chunked-anchor hard negatives at equal total work
    def vecs(n, salt, with_label=True):
        cols = [
            (
                F.pmod(F.xxhash64("id", F.lit(salt * 100 + i)), F.lit(2001))
                / 1000.0
                - 1.0
            ).cast("float")
            for i in range(dim)
        ]
        out = spark.range(n).select(
            F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
        )
        if with_label:
            out = out.withColumn("label", (F.col("vec_id") % 7).cast("int"))
        return out

    pool = vecs(n_pool, 1)
    anchors = vecs(n_anchors, 2)
    print(
        f"hard_negatives: {n_pool:,} pool x {n_anchors:,} anchors, "
        f"dim {dim}, k=8"
    )
    for chunk in (n_anchors, 1024):
        t(
            f"anchor_chunk={chunk} "
            f"({max(1, -(-n_anchors // chunk))} panel(s))",
            lambda chunk=chunk: hard_negatives(
                pool, anchors, k=8, anchor_chunk=chunk
            ).write.mode("overwrite").format("noop").save(),
        )

    spark.stop()


if __name__ == "__main__":
    main()
