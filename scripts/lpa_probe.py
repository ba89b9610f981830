"""Label-propagation probe: price the 4-round bulk-synchronous LPA on
the synthetic skewed link graph + clique arm at graph sizes where
per-round lineage growth would be fatal without the eager checkpoints
(round r's plan otherwise re-derives all r−1 predecessors and the
adjacency 2^r times — the pagerank lesson).

Prints the community count and total wall.

    python scripts/lpa_probe.py [n_nodes] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    sys.path.insert(0, ".")
    from market_insights_app_spark.operators.graph import (
        label_propagation,
        synthetic_clique,
        synthetic_link_graph,
    )
    from market_insights_app_spark.session import get_spark

    spark = get_spark(app_name="mias-lpa-probe")
    print(
        f"start 1-min loadavg: {os.getloadavg()[0]:.2f}  "
        f"n={n:,} rounds={rounds}"
    )

    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = synthetic_link_graph(docs).union(synthetic_clique(docs))

    t0 = time.perf_counter()
    out = label_propagation(edges, rounds=rounds)
    nodes = out.count()
    comms = out.select("label").distinct().count()
    top = out.groupBy("label").count().orderBy(F.desc("count")).first()
    print(
        f"lpa wall {time.perf_counter() - t0:7.2f} s   "
        f"nodes={nodes:,}   communities={comms:,}   "
        f"largest={top['count']:,}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
