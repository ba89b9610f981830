"""k-core peel probe (r13 continuation): price the synchronized
8-round peel on the synthetic skewed link graph + clique arm at graph
sizes where per-round lineage growth would be fatal without the eager
checkpoints (round r's plan otherwise re-derives all r−1 predecessors
— the pagerank lesson).

Prints per-round surviving-edge counts (the cascade the rounds
parameter bounds) and the total wall.

    python scripts/kcore_probe.py [n_nodes] [k] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    sys.path.insert(0, ".")
    from market_insights_app_spark.operators.graph import (
        kcore,
        synthetic_clique,
        synthetic_link_graph,
    )
    from market_insights_app_spark.session import get_spark

    spark = get_spark(app_name="mias-kcore-probe")
    print(
        f"start 1-min loadavg: {os.getloadavg()[0]:.2f}  "
        f"n={n:,} k={k} rounds={rounds}"
    )

    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = synthetic_link_graph(docs).union(synthetic_clique(docs))

    t0 = time.perf_counter()
    out = kcore(edges, k=k, rounds=rounds)
    survivors = out.count()
    mind = out.agg(F.min("degree"), F.max("degree")).collect()[0]
    print(
        f"kcore wall {time.perf_counter() - t0:7.2f} s   "
        f"survivors={survivors:,}   degree range "
        f"[{mind[0]}, {mind[1]}]"
    )
    spark.stop()


if __name__ == "__main__":
    main()
