"""Write-once LSH band index probe (r13): price what
lsh_band_index_write buys over repeated in-session candidate-pair
runs, at a corpus size where the signature scan actually costs
something.

Synthesizes n short documents (deterministic token sequences; every
97th doc is a near-dup of its anchor so the band join has real work),
then times:

  in-session pairs     — minhash signatures + banding + bucket join
  index write          — signatures + banding + bucketed WRITE (paid once)
  pairs from index     — bucket join off the stored layout
  pairs, capped        — same with max_bucket_size (the re-audit sweep)

    python scripts/lsh_index_probe.py [n_docs]

Host CPU-steal spans 6x minute-to-minute on this VM — judge by the
within-session ratios.  Records go to SCALE_NOTES.md by hand.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000

    sys.path.insert(0, ".")
    from market_insights_app_spark.operators.dedup import (
        lsh_band_index_write,
        lsh_candidate_pairs,
        lsh_candidate_pairs_from_index,
    )
    from market_insights_app_spark.session import get_spark
    from market_insights_app_spark.sources.bucketed import drop_bucketed

    spark = get_spark(app_name="mias-lsh-index-probe")
    print(f"start 1-min loadavg: {os.getloadavg()[0]:.2f}")

    # 20-token docs from a 1000-word vocab; doc i and its +97 twin
    # share the first 18 tokens (J ≈ 0.8 on 2-shingles) so bands
    # collide for real pairs, not just hash noise
    tok = lambda j: F.concat(
        F.lit("w"), F.pmod(F.xxhash64(F.col("doc_id") * 31 + j), F.lit(1000))
    )
    anchor = (F.col("doc_id") / 97).cast("long") * 97
    atok = lambda j: F.concat(
        F.lit("w"), F.pmod(F.xxhash64(anchor * 31 + j), F.lit(1000))
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[atok(j) for j in range(18)],
            *[tok(j) for j in range(18, 20)],
        ).alias("text"),
    ).persist()
    print(f"docs: {docs.count():,}")

    def timed(label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(
            f"{label:26s} {dt:7.2f} s"
            + (f"   pairs={out:,}" if out is not None else "")
        )
        return dt

    table = "probe_lsh_band_idx"
    drop_bucketed(spark, table)

    t_insess = timed(
        "in-session pairs",
        lambda: lsh_candidate_pairs(docs, num_hashes=32, bands=8).count(),
    )
    t_write = timed(
        "index write (once)",
        lambda: lsh_band_index_write(
            docs, table, num_hashes=32, bands=8, n_buckets=32
        ),
    )
    t_idx = timed(
        "pairs from index",
        lambda: lsh_candidate_pairs_from_index(spark, table).count(),
    )
    t_cap = timed(
        "pairs from index, cap=50",
        lambda: lsh_candidate_pairs_from_index(
            spark, table, max_bucket_size=50
        ).count(),
    )

    a = {
        tuple(r)
        for r in lsh_candidate_pairs(docs, num_hashes=32, bands=8).collect()
    }
    b = {
        tuple(r)
        for r in lsh_candidate_pairs_from_index(spark, table).collect()
    }
    print(f"pair sets identical: {a == b}  (n={len(b):,})")
    print(
        f"write premium {t_write - t_insess:+.2f} s once; indexed run saves "
        f"{t_insess - t_idx:.2f} s/run ({t_insess / max(t_idx, 1e-9):.1f}x); "
        f"capped re-audit {t_cap:.2f} s"
    )

    drop_bucketed(spark, table)
    docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
