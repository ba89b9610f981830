"""Bucketed-table storage layout — the CO-LOCATED JOIN primitive the
operator docstrings keep pointing at ("at 100 TB, write (id, cluster,
v) bucketed by cluster and the self-join needs no exchange" —
operators/similarity.semdedup; same story for the dedup candidate
self-joins and any repeatedly-joined fact table).

Spark bucketing hash-partitions rows into a fixed number of files per
partition AT WRITE TIME and records the layout in the catalog; a scan
of a bucketed table then reports its partitioning to the planner, so

- an equi-join of two tables bucketed the same way on the join key
  (same column, same bucket count) plans with NO Exchange on either
  side — the shuffle was paid once at write time and amortizes over
  every subsequent join;
- a groupBy on the bucket key aggregates without a shuffle;
- a self-join (the near-dup candidate pattern) co-locates for free.

This is the storage-layout half of the repo's shuffle discipline: the
query-side half (broadcast dims, partial aggs, bucketized band joins)
lives in the operators.  Verified by plan gates in
tests/test_bucketed_layout.py: the bucketed self-join and groupBy
plans contain zero Exchange operators.

No reference analog (the reference's SQLite storage has b-tree
indexes instead, db.py:36-45); this module exists for the cluster
story.  Requires a catalog (``saveAsTable``) — plain
``.parquet(path)`` writes cannot record bucketing metadata.
"""

from __future__ import annotations

import os
import shutil
import urllib.parse

from pyspark.sql import DataFrame, SparkSession


def clear_managed_table(spark: SparkSession, table: str) -> None:
    """DROP the catalog entry AND its warehouse directory.  A managed
    table's DIRECTORY can survive a previous session whose in-memory
    catalog is gone (crash, aborted test run); saveAsTable refuses to
    adopt it (LOCATION_ALREADY_EXISTS)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = urllib.parse.urlparse(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    ).path
    if wh:
        shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed by ``bucket_cols``
    into ``n_buckets`` buckets (optionally sorted within buckets, which
    additionally serves merge-joins and range pruning inside a bucket).

    Pick ``n_buckets`` for the TARGET cluster: buckets are the unit of
    join parallelism for exchange-free joins, so at 100 TB you want at
    least a few buckets per executor core working on the table — and
    the count is FROZEN at write time; changing it means rewriting."""
    if mode == "overwrite":
        clear_managed_table(df.sparkSession, table)
    writer = df.write.mode(mode).format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its layout metadata (a catalog
    read — ``spark.read.parquet`` on the files would lose the bucket
    spec and reintroduce the shuffle)."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int]:
    """(bucket columns, bucket count) recorded in the catalog for
    ``table`` — what an APPEND writer must redeclare: saveAsTable
    validates the writer's bucketBy against the table's spec, and a
    mismatch either fails or (worse, with no spec) silently writes
    unbucketed files that break the exchange-free-join guarantee."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    info = {r["col_name"].strip(): (r["data_type"] or "").strip() for r in rows}
    n = int(info["Num Buckets"])
    cols = [
        c.strip().strip("`")
        for c in info["Bucket Columns"].strip("[]").split(",")
    ]
    return cols, n


def append_bucketed(df: DataFrame, table: str) -> None:
    """Append ``df`` to an existing bucketed table, redeclaring the
    catalog's own bucket spec so the write lands IN the layout (new
    files per bucket; the exchange-free join property survives
    appends)."""
    cols, n = bucket_spec(df.sparkSession, table)
    write_bucketed(df, table, cols, n_buckets=n, mode="append")
