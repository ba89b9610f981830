"""Targeted oracle check for the r13 optimization round: run named
queries through the driver contract (``__spark_entry__``) and compare
each against its DuckDB twin at the given scale dir — the same
row-count + order-insensitive canonical-value comparison the verify
skill uses, but scoped to the queries a change touched so a single
optimization can be gated in seconds instead of a full sweep.

    python scripts/oracle_check.py [--sf DIR] name [name ...]
    python scripts/oracle_check.py --sf /root/testdata/sf0.1 split_leakage
"""

from __future__ import annotations

import argparse
import importlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    m = importlib.import_module("__spark_entry__")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )
    qs, os_ = m.queries(), m.oracle_sql()
    failures = []
    for name in args.names:
        t0 = time.perf_counter()
        sdf = qs[name](spark, args.sf)
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.perf_counter()
        if name not in os_:
            print(f"{name}: rows-only ({len(srows)} rows, {t1-t0:.2f}s)")
            continue
        d = con.sql(os_[name])
        drows = d.fetchall()
        dcols = [x[0] for x in d.description]
        ok = len(srows) == len(drows) and canon(srows, sdf.columns) == canon(
            drows, dcols
        )
        print(
            f"{name}: {'MATCH' if ok else 'MISMATCH'} "
            f"({len(srows)} vs {len(drows)} rows, spark {t1-t0:.2f}s)"
        )
        if not ok:
            failures.append(name)
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all match")


if __name__ == "__main__":
    main()
