"""r10 scale probes — records folded into SCALE_NOTES.md by hand:

1. PageRank tiny-regime checkpoint cadence: interleaved PAIRED A/B of
   cadence-1 vs cadence-3 on the real operator (both arms alternate
   inside one session so they see the same host phase — the only
   trustworthy comparison on a host whose steal swings single samples
   30-40 % for this query).
2. hard_negatives sequential-chunk panels vs one monolithic panel
   (the r9-ADVICE bounded-memory path) — see scripts/r9_probe.py for
   the original harness; this one prices the post-fix code.

    python scripts/r10_probe.py [n_pairs] [sf_dir]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    sys.path.insert(0, ".")
    from market_insights_app_spark.operators import graph as G
    from market_insights_app_spark.session import get_spark
    from market_insights_app_spark.sources.tables import load_table

    spark = get_spark(app_name="mias-r10-probe")
    docs = load_table(spark, sf_dir, "documents")
    edges = G.synthetic_link_graph(docs)
    edges.count()  # warm

    def run() -> float:
        t0 = time.perf_counter()
        G.pagerank(edges, iterations=10).write.mode("overwrite").format(
            "noop"
        ).save()
        return round(time.perf_counter() - t0, 2)

    run()  # untimed codegen warmup
    arms: dict[int, list[float]] = {1: [], 3: []}
    orig_cadence = G._TINY_CUT_EVERY
    try:
        for _ in range(n_pairs):
            for cadence in (1, 3):
                G._TINY_CUT_EVERY = cadence
                spark.sparkContext._jvm.System.gc()
                arms[cadence].append(run())
    finally:
        # restore whatever the module shipped with (r11 ADVICE: a
        # hard-coded restore would silently revert a future default,
        # and a mid-loop raise would leave the mutation in place)
        G._TINY_CUT_EVERY = orig_cadence
    for cadence, samples in arms.items():
        print(
            f"pagerank tiny-regime cadence-{cadence}: {samples} "
            f"best {min(samples)}"
        )
    wins = sum(a > b for a, b in zip(arms[1], arms[3]))
    print(f"cadence-3 wins {wins}/{n_pairs} interleaved pairs")
    spark.stop()


if __name__ == "__main__":
    main()
