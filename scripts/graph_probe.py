"""Scale probe for the r9-staged operators: PageRank at millions of
edges and semantic decontamination at hundreds of thousands of train
vectors — synthetic spark.range data, nothing on disk.  Records go to
SCALE_NOTES.md by hand.

    python scripts/graph_probe.py [n_nodes] [n_train] [dim]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from market_insights_app_spark.operators.graph import pagerank
    from market_insights_app_spark.operators.similarity import (
        semantic_decontaminate,
    )
    from market_insights_app_spark.session import get_spark

    spark = get_spark(app_name="mias-graph-probe")

    def t(label, fn):
        # fn CONSTRUCTS and writes inside the timer: pagerank's eager
        # localCheckpoints run at construction time, so timing only the
        # final noop write (the r8 version of this probe) undercounts
        # by the checkpointed iterations — the r8 "10 iters 3.66 s"
        # record measured just iterations 9-10 (see SCALE_NOTES r9
        # correction).
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        print(f"{label:45s} {time.perf_counter() - t0:7.2f} s")

    # --- PageRank: 3 deterministic arms per node (same shape as the
    # synthetic_link_graph fixture, scaled) → ~3M edges at 1M nodes
    base = spark.range(n_nodes).select(F.col("id").alias("src"))
    edges = (
        base.select(
            "src", ((F.col("src") * F.col("src") + 1) % n_nodes).alias("dst")
        )
        .union(base.select("src", ((F.col("src") * 31 + 7) % n_nodes).alias("dst")))
        .union(
            base.select(
                "src", (F.col("src") % max(n_nodes // 50, 1)).alias("dst")
            )
        )
    )
    print(f"pagerank: {n_nodes:,} nodes, ~{3 * n_nodes:,} edges")
    for iters in (5, 10):
        t(f"pagerank {iters} iterations",
          lambda iters=iters: pagerank(edges, iterations=iters))

    # --- semantic decontamination: n_train corpus vs 1k-eval broadcast
    def vecs(n, salt):
        cols = [
            (
                F.pmod(F.xxhash64("id", F.lit(salt * 100 + i)), F.lit(2001))
                / 1000.0
                - 1.0
            ).cast("float")
            for i in range(dim)
        ]
        return spark.range(n).select(
            F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")
        )

    tr = vecs(n_train, 1)
    ev = vecs(1_000, 2)
    print(f"semantic_decontaminate: {n_train:,} train x 1,000 eval, dim {dim}")
    t("semantic_decontaminate",
      lambda: semantic_decontaminate(tr, ev, threshold=0.9))

    spark.stop()


if __name__ == "__main__":
    main()
