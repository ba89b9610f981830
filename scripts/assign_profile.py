"""Stage decomposition of the LARGE_K semdedup lane at 1M x 64,
k=10k — where do the ~500 s actually go?  Times, as separate Spark
jobs over the same cached frame:

  decode-only      — mapInPandas that np.stacks each batch and emits a
                     count (Arrow + pandas-conversion floor)
  assign           — clustering._assign_pandas (decode + GEMM + argmin)
  assign tile=T    — same, but centroid matrix processed in tiles with
                     a running min (cache-friendlier than one (b,k) S)
  fit iter         — clustering._partial_means_pandas + reduce
  screen           — _semdedup_in_cluster_pandas off a checkpointed
                     assignment

    python scripts/assign_profile.py [n_vecs] [k] [batch_rows]
"""

from __future__ import annotations

import sys
import time
from typing import Iterator

from pyspark.sql import functions as F


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000

    sys.path.insert(0, ".")
    import numpy as np
    import pandas as pd

    from market_insights_app_spark.operators import clustering
    from market_insights_app_spark.operators.similarity import (
        _semdedup_in_cluster_pandas,
    )
    from market_insights_app_spark.session import get_spark

    spark = get_spark(app_name="mias-assign-profile")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
    import os

    print(f"loadavg {os.getloadavg()[0]:.2f}  batch={batch}")

    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id") * 100 + i), F.lit(2001)) - 1000
            )
            / 1000.0,
        ).alias("embedding"),
    ).persist()
    print(f"rows {vecs.count():,}")

    def timed(label, fn):
        t0 = time.perf_counter()
        fn()
        print(f"{label:26s} {time.perf_counter() - t0:7.2f} s")

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    def decode_only():
        def part(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            n = 0
            for pdf in batches:
                if len(pdf):
                    X = np.stack(pdf["embedding"].to_numpy()).astype(
                        np.float64, copy=False
                    )
                    n += len(X)
            yield pd.DataFrame({"n": [n]})

        noop(vecs.mapInPandas(part, schema="n long"))

    timed("decode-only", decode_only)

    t0 = time.perf_counter()
    cents = clustering.kmeans_fit(vecs, k=k, iters=1)
    print(f"{'kmeans_fit iters=1':26s} {time.perf_counter() - t0:7.2f} s")

    timed(
        "assign (_assign_pandas)",
        lambda: noop(
            clustering._assign_pandas(vecs, cents, "vec_id", "embedding")
        ),
    )

    C0 = np.asarray(cents, dtype=np.float64)
    sc = spark.sparkContext

    def assign_tiled(tile: int):
        bc = sc.broadcast(C0)

        def part(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            C = bc.value
            cn = (C * C).sum(axis=1)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["embedding"].to_numpy()).astype(
                    np.float64, copy=False
                )
                m = len(X)
                best = np.zeros(m, dtype=np.int64)
                bestv = np.full(m, np.inf)
                for s in range(0, len(C), tile):
                    e = min(s + tile, len(C))
                    S = X @ C[s:e].T
                    S *= -2.0
                    S += cn[None, s:e]
                    loc = S.argmin(axis=1)
                    locv = S[np.arange(m), loc]
                    upd = locv < bestv
                    best[upd] = loc[upd] + s
                    bestv[upd] = locv[upd]
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].astype("int64"),
                        "cluster": best.astype("int32"),
                    }
                )

        noop(vecs.mapInPandas(part, schema="vec_id long, cluster int"))

    for tile in (512, 2048):
        timed(f"assign tiled T={tile}", lambda tile=tile: assign_tiled(tile))

    assigned = clustering._assign_pandas(
        vecs, cents, "vec_id", "embedding", keep_vec=True
    ).localCheckpoint(eager=True)
    timed(
        "screen (in-cluster pandas)",
        lambda: noop(
            _semdedup_in_cluster_pandas(assigned, 0.999, "vec_id", "embedding")
        ),
    )
    vecs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
