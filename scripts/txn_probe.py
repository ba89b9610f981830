"""Scale probe for the ACID commit-log table (storage/txnlog.py):

1. Build a key-clustered table of `n_rows` across `n_dirs` append
   commits (disjoint key ranges — the layout a key-partitioned
   ingest produces).
2. MERGE a small update set whose keys live in ONE directory; assert
   the data-skipping stats rewrote exactly that directory; time it.
3. MERGE the same-size update set with pruning impossible (keys
   spanning every directory) for the unpruned comparison.
4. Fire `n_writers` key-disjoint concurrent merge threads and report
   total wall plus the commit-log retry/rebase profile.

    python scripts/txn_probe.py [n_rows] [n_dirs] [n_writers]

Records go to SCALE_NOTES.md by hand.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import threading
import time

from pyspark.sql import functions as F


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_dirs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_writers = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    sys.path.insert(0, ".")
    from market_insights_app_spark.session import get_spark
    from market_insights_app_spark.storage.txnlog import TxnTable

    spark = get_spark(app_name="mias-txn-probe")
    root = tempfile.mkdtemp(prefix="txn_probe_")
    per = n_rows // n_dirs

    def mk(lo: int, n: int):
        return (
            spark.range(lo, lo + n)
            .select(
                F.col("id").alias("k"),
                F.sha1(F.col("id").cast("string")).alias("payload"),
            )
        )

    t = TxnTable(spark, f"{root}/table")
    t0 = time.monotonic()
    for d in range(n_dirs):
        t.append(mk(d * per, per), stats_col="k")
    t_build = time.monotonic() - t0
    print(f"build: {n_rows} rows / {n_dirs} key-clustered dirs in {t_build:.1f}s")

    # --- pruned merge: updates confined to one directory's key range ---
    upd = mk(3 * per + 100, 10_000)
    t0 = time.monotonic()
    t.merge(upd, ["k"])
    t_pruned = time.monotonic() - t0
    last = t.history()[-1]
    assert last["op"] == "merge" and len(last["remove"]) == 1, last["remove"]
    print(
        f"pruned merge (10k updates -> 1/{n_dirs} dirs rewritten): "
        f"{t_pruned:.1f}s"
    )

    # --- unpruned merge: same size, keys span every directory ---------
    wide = (
        spark.range(10_000)
        .select(
            (F.col("id") * (n_rows // 10_000)).alias("k"),
            F.lit("wide").alias("payload"),
        )
    )
    t0 = time.monotonic()
    t.merge(wide, ["k"])
    t_wide = time.monotonic() - t0
    nrw = len(t.history()[-1]["remove"])
    print(f"unpruned merge (10k updates -> {nrw} dirs rewritten): {t_wide:.1f}s")

    # --- concurrent key-disjoint writers ------------------------------
    errs: list[Exception] = []

    def writer(i: int) -> None:
        try:
            TxnTable(spark, f"{root}/table").merge(
                mk(i * per + 5_000, 5_000), ["k"], max_retries=200
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t0 = time.monotonic()
    ths = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    [th.start() for th in ths]
    [th.join() for th in ths]
    t_conc = time.monotonic() - t0
    assert not errs, errs
    hist = t.history()
    merges = [c for c in hist if c["op"] == "merge"]
    rewrites = sum(len(c["remove"]) for c in merges[-n_writers:])
    print(
        f"{n_writers} concurrent key-disjoint merges: {t_conc:.1f}s total, "
        f"{rewrites} dirs rewritten across them, log at v{hist[-1]['version']}"
    )
    # --- OPTIMIZE: restore clustering after the wide merge blurred it --
    t0 = time.monotonic()
    t.optimize("k", target_dirs=n_dirs)
    t_opt = time.monotonic() - t0
    snap = t.snapshot()
    assert len(snap.dirs) == n_dirs
    t0 = time.monotonic()
    t.merge(mk(5 * per + 100, 10_000), ["k"])
    t_repruned = time.monotonic() - t0
    nrw2 = len(t.history()[-1]["remove"])
    print(
        f"optimize into {n_dirs} clustered dirs: {t_opt:.1f}s; "
        f"post-optimize 10k merge rewrote {nrw2} dirs in {t_repruned:.1f}s"
    )

    n_final = t.read().count()
    # every update set targeted existing keys -> cardinality unchanged
    assert n_final == n_rows, n_final
    n_distinct = t.read().select("k").distinct().count()
    assert n_distinct == n_rows, n_distinct  # keys stayed unique
    print(f"final count verified: {n_final} rows, all keys unique")

    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
