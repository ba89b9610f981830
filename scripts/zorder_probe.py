"""Z-order layout probe: skip fractions for box predicates under 1-D
range layout vs Z-order, at 1M uniform 2-D rows / 64 files.  Records
go to SCALE_NOTES.md by hand.

    python scripts/zorder_probe.py [n_rows] [n_files]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from market_insights_app_spark.operators.layout import (
        layout_stats,
        linear_assign,
        skipped_fraction,
        zorder_assign,
    )
    from market_insights_app_spark.session import get_spark

    spark = get_spark(app_name="mias-zorder-probe")
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000)).alias("y"),
    )
    box_x = {"x": (50_000.0, 51_000.0)}          # 1 % of the x axis
    box_y = {"y": (50_000.0, 51_000.0)}
    box_xy = {**box_x, **box_y}

    t0 = time.perf_counter()
    lin = layout_stats(linear_assign(df, "x", files), ["x", "y"]).cache()
    lin.count()
    t_lin = time.perf_counter() - t0
    t0 = time.perf_counter()
    zo = layout_stats(zorder_assign(df, ["x", "y"], files), ["x", "y"]).cache()
    zo.count()
    t_zo = time.perf_counter() - t0

    print(f"{n:,} rows, {files} files; layout wall: linear {t_lin:.2f} s, "
          f"zorder {t_zo:.2f} s")
    for name, stats in (("linear(x)", lin), ("zorder(x,y)", zo)):
        print(
            f"{name:12s} skip x-box {skipped_fraction(stats, box_x):6.1%}  "
            f"y-box {skipped_fraction(stats, box_y):6.1%}  "
            f"xy-box {skipped_fraction(stats, box_xy):6.1%}"
        )

    # equality complement: per-file Bloom index on a unique id column
    from market_insights_app_spark.operators.layout import (
        bloom_file_index,
        bloom_skipped_fraction,
    )

    ids = df.withColumn("doc_id", F.monotonically_increasing_id())
    laid = linear_assign(ids, "x", files)
    t0 = time.perf_counter()
    idx = bloom_file_index(laid, "doc_id").cache()
    nf = idx.count()
    t_idx = time.perf_counter() - t0
    mb = idx.select(F.sum(F.length("bits"))).first()[0] / 1e6
    present = laid.select("doc_id").first()[0]
    print(
        f"bloom index: {nf} files built in {t_idx:.2f} s, {mb:.1f} MB "
        f"metadata; equality skip present {bloom_skipped_fraction(idx, present):6.1%} "
        f"absent {bloom_skipped_fraction(idx, -1):6.1%}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
