"""Scale probe for the right-to-be-forgotten path (storage/txnlog.py
delete_where -> truncate_history -> vacuum):

1. Build a table of `n_rows` across `n_dirs` append commits.
2. delete_where a ~2% forget set (full-table rewrite by design);
   time it.
3. truncate_history + vacuum(0); time both, report reclaimed dirs and
   the driver-side-only cost (no data job).
4. Verify physical erasure: re-read every surviving parquet file and
   count forgotten keys (must be 0), retained count intact.

    python scripts/forget_probe.py [n_rows] [n_dirs]

Records go to SCALE_NOTES.md by hand.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_dirs = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    sys.path.insert(0, ".")
    from market_insights_app_spark.session import get_spark
    from market_insights_app_spark.storage.txnlog import TxnTable

    spark = get_spark(app_name="mias-forget-probe")
    print(f"start 1-min loadavg: {os.getloadavg()[0]:.2f}  "
          f"n={n_rows:,} dirs={n_dirs}")

    root = tempfile.mkdtemp(prefix="mias_forget_probe_")
    try:
        t = TxnTable(spark, root)
        per = n_rows // n_dirs
        for d in range(n_dirs):
            df = (
                spark.range(d * per, (d + 1) * per)
                .select(
                    F.col("id"),
                    F.sha2(F.col("id").cast("string"), 256).alias("payload"),
                )
            )
            t.append(df, stats_col="id")
        size0 = sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(root, "data", "**", "*"),
                               recursive=True)
            if os.path.isfile(f)
        )

        # pruned arm first: forget ONE user's key range (the common
        # GDPR shape) — stats skip every other directory
        t0 = time.perf_counter()
        t.delete_where(
            F.col("id").between(10, 20), prune_hint=("id", 10, 20)
        )
        t_pruned = time.perf_counter() - t0
        rewrote = len(t.history()[-1]["remove"])

        t0 = time.perf_counter()
        t.delete_where(F.col("id") % 53 == 0)
        t_del = time.perf_counter() - t0

        t0 = time.perf_counter()
        dropped_v = t.truncate_history()
        t_trunc = time.perf_counter() - t0
        t0 = time.perf_counter()
        dropped_d = t.vacuum(retain_seconds=0.0)
        t_vac = time.perf_counter() - t0

        size1 = sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(root, "data", "**", "*"),
                               recursive=True)
            if os.path.isfile(f)
        )
        back = spark.read.parquet(
            *glob.glob(os.path.join(root, "data", "*"))
        )
        leaked = back.filter(F.col("id") % 53 == 0).count()
        kept = back.count()
        # pruned arm removed ids 10..20 (11 rows, none ≡ 0 mod 53)
        expect = n_rows - 11 - (n_rows + 52) // 53
        print(
            f"pruned delete {t_pruned:6.2f} s (rewrote {rewrote}/"
            f"{n_dirs} dirs)   full delete {t_del:6.2f} s   "
            f"truncate {t_trunc:6.3f} s ({len(dropped_v)} versions)   "
            f"vacuum {t_vac:6.3f} s ({len(dropped_d)} dirs)"
        )
        print(
            f"bytes {size0/1e6:,.1f} MB -> {size1/1e6:,.1f} MB   "
            f"leaked={leaked}   kept={kept:,} (expect {expect:,})"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
