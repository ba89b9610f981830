"""Multi-dimensional clustering for data skipping: Z-order layout.

The storage layer's single-column answer to pruning is range
clustering (storage/txnlog.optimize: disjoint min/max per directory).
That is optimal for one key and USELESS for the second — a query on
column B touches every file of an A-ordered table.  The classic fix
(Delta/Iceberg ``OPTIMIZE ZORDER BY``) is to sort by the Morton
(Z-order) curve: interleave the bits of the rank-scaled dimensions so
files cover small HYPER-RECTANGLES of the key space instead of thin
slabs of one axis; any per-dimension box predicate then overlaps few
files, and min/max skipping works for EVERY z-ordered column at once.

Everything here is JVM-side expressions: per-column scaling uses one
broadcast 1-row min/max aggregate, bit interleaving is a fixed fan of
shift/and/or terms inside whole-stage codegen, and the layout write is
a single ``repartitionByRange`` on the z-value — the same one-shuffle
cost as the 1-D optimize.  File-level (min, max) stats per dimension —
what a table format's skipping layer consumes — come from one grouped
footer-style aggregate; :func:`skipped_fraction` prices a box
predicate against them.

At 100 TB this is the periodic re-layout pass a multi-tenant table
runs so that BOTH ``user_id`` and ``ts`` predicates (or symbol ×
date, domain × crawl-week …) prune.  Measured (1M uniform 2-D rows,
64 files, 1 %-per-axis boxes — scripts/zorder_probe.py): 1-D range
layout skips 98.4 % on its own axis and 0 % on the other; Z-order
skips 73.4 % / 79.7 % on each axis ALONE and 92.2 % on the 2-D box —
the classic trade of a little best-axis pruning for pruning on every
z-ordered dimension.  Layout write cost matched the 1-D pass (3.3 s
vs 4.6 s at 1M rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, Column]:
    """Return (df ⋈ broadcast per-column min/max, z-value Column).

    Each column is rank-scaled to an unsigned ``bits``-bit integer via
    its global min/max (one broadcast single-row aggregate — the only
    non-scan work), then the bit planes are interleaved
    column-major-by-level: z = Σ_i Σ_c ((v_c >> i) & 1) << (i·n + c).
    ``bits·len(cols)`` must fit a long (≤ 63).  Constant columns scale
    to 0 (they cannot discriminate anyway).  NULL scales to 0 — NULLs
    cluster with the minimum, the Delta convention."""
    n = len(cols)
    if not 1 <= n * bits <= 63:
        raise ValueError(f"{n} cols x {bits} bits does not fit a long")
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"__mn_{c}"),
            F.max(c).cast("double").alias(f"__mx_{c}"),
        ]
    ranges = df.groupBy().agg(*aggs)
    joined = df.crossJoin(F.broadcast(ranges))
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = mx - mn
        scaled = F.when(
            span > 0,
            F.floor(
                (F.col(c).cast("double") - mn) / span * F.lit(float(top))
            ),
        ).otherwise(F.lit(0)).cast("long")
        scaled = F.coalesce(scaled, F.lit(0).cast("long"))
        for i in range(bits):
            bit = F.shiftright(scaled, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + ci))
    return joined, z


def zorder_assign(
    df: DataFrame, cols: list[str], n_files: int, bits: int = 16
) -> DataFrame:
    """Assign every row to a z-order-clustered file: one
    ``repartitionByRange`` on the z-value (disjoint z-ranges per file
    by construction), file id in ``__file``.  The caller writes with
    ``partitionBy("__file")`` — same mechanics as the storage layer's
    1-D optimize, different curve.

    Stability caveat (applies to :func:`linear_assign` too):
    ``repartitionByRange`` re-samples its range boundaries per ACTION,
    so ``__file`` is only stable once materialized — derive stats /
    bloom indexes from the WRITTEN (or checkpointed) data, never from
    a second evaluation of the same plan (every storage-layer caller
    reads stats back from the written files for exactly this reason).
    """
    joined, z = zorder_value(df, cols, bits)
    out = (
        joined.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .withColumn("__file", F.spark_partition_id())
    )
    drop = [f"__mn_{c}" for c in cols] + [f"__mx_{c}" for c in cols]
    return out.drop(*drop, "__z")


def linear_assign(df: DataFrame, col: str, n_files: int) -> DataFrame:
    """1-D range layout baseline (what txnlog.optimize produces):
    disjoint ``col`` ranges per file."""
    return df.repartitionByRange(n_files, F.col(col)).withColumn(
        "__file", F.spark_partition_id()
    )


def layout_stats(df_with_file: DataFrame, cols: list[str]) -> DataFrame:
    """Per-file (min, max) for each dimension — the skipping metadata
    a table format records per data file.  One map-side-combinable
    groupBy; output one row per file."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return df_with_file.groupBy("__file").agg(
        F.count(F.lit(1)).alias("n_rows"), *aggs
    )


def skipped_fraction(
    stats: DataFrame, box: dict[str, tuple[float, float]]
) -> float:
    """Fraction of files a per-dimension box predicate SKIPS under
    min/max pruning: a file must be read iff every queried dimension's
    [min,max] overlaps the box.  (Driver-side over the stats frame —
    file counts are metadata-sized.)"""
    rows = stats.collect()
    if not rows:
        return 0.0
    read = 0
    for r in rows:
        if all(
            r[f"min_{c}"] is not None
            and r[f"max_{c}"] >= lo
            and r[f"min_{c}"] <= hi
            for c, (lo, hi) in box.items()
        ):
            read += 1
    return 1.0 - read / len(rows)


def bloom_file_index(
    df_with_file: DataFrame,
    col: str,
    bits_per_value: int = 16,
    n_hashes: int = 4,
    max_m_bits: int = 1 << 27,
) -> DataFrame:
    """Per-file Bloom skipping index — the EQUALITY complement of the
    min/max stats: range predicates prune via :func:`layout_stats` /
    Z-order, but a point lookup on a high-cardinality column (doc_id,
    url hash, user id) overlaps almost every file's [min, max] no
    matter the layout.  A ~16-bit-per-value Bloom per file answers
    "can this file contain v?" with no false negatives, so equality
    predicates skip every file whose k probe bits are not all set —
    the Parquet bloom_filter_enabled / Delta bloom index design, built
    here as an explicit metadata frame the same way layout_stats is.

    Bit positions are computed JVM-side (``xxhash64(value, seed) &
    (m-1)``, m a power of two — the exact decontaminate_bloom scheme,
    so no Python hash reimplementation exists to drift) and each
    file's positions are OR-packed into a byte array inside one Arrow
    ``applyInPandas`` group pass.  Every file gets the same m (sized
    from the LARGEST file's row count), so index rows are uniform and
    the probe needs no per-row geometry.

    Memory bound: each file's filter is ONE m/8-byte buffer, held in
    the Arrow group pass and in the returned metadata row, where
    ``m = min(max_m_bits, next_pow2(bits_per_value · max_file_rows))``
    (the pow2 rounding can reach ~2× the bits_per_value target).
    ``max_m_bits`` caps it — default 2²⁷ bits = 16 MB/file, which
    holds the full 16-bit/value budget up to ~8.4 M rows/file; files
    beyond the cap keep working with a gracefully higher
    false-positive rate ((1 − e^(−k·rows/m))^k) instead of an
    unbounded buffer (at 1e8 rows/file the uncapped build would
    allocate 256 MB per file).  No false negatives ever — the cap
    trades skip RATE, never correctness.

    Returns one row per file: (__file, m_bits long, n_hashes int,
    col_type string, bits binary) — m/8 bytes per file of metadata.
    The indexed column's Spark type rides along because xxhash64 is
    TYPE-SENSITIVE (an int literal and a bigint column hash
    differently); the probe casts its literal to this type.
    """
    import numpy as np
    import pandas as pd

    if max_m_bits < 1024 or max_m_bits & (max_m_bits - 1):
        raise ValueError("max_m_bits must be a power of two >= 1024")
    col_type = dict(df_with_file.dtypes)[col]
    max_rows = (
        df_with_file.groupBy("__file")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .first()[0]
    )
    if max_rows is None:
        return df_with_file.sparkSession.createDataFrame(
            [],
            "__file int, m_bits long, n_hashes int, col_type string, "
            "bits binary",
        )
    m_bits = 1 << max(10, (bits_per_value * int(max_rows) - 1).bit_length())
    m_bits = min(m_bits, max_m_bits)  # bound the per-file buffer
    mask = m_bits - 1
    m_bytes = m_bits >> 3

    pos = df_with_file.select(
        "__file",
        F.explode(
            F.array(
                *[
                    F.xxhash64(F.col(col), F.lit(i)).bitwiseAND(F.lit(mask))
                    for i in range(n_hashes)
                ]
            )
        ).alias("p"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        arr = np.zeros(m_bytes, dtype=np.uint8)
        p = pdf["p"].to_numpy().astype(np.int64)
        np.bitwise_or.at(
            arr, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8)
        )
        return pd.DataFrame(
            {
                "__file": pdf["__file"].iloc[:1],
                "m_bits": pd.Series([m_bits], dtype="int64"),
                "n_hashes": pd.Series([n_hashes], dtype="int32"),
                "col_type": pd.Series([col_type], dtype=object),
                "bits": pd.Series([arr.tobytes()], dtype=object),
            }
        )

    return pos.groupBy("__file").applyInPandas(
        pack,
        schema="__file int, m_bits long, n_hashes int, col_type string, "
        "bits binary",
    )


def bloom_skipped_fraction(index: DataFrame, value) -> float:
    """Fraction of files an equality predicate ``col = value`` SKIPS
    under the Bloom index (no false skips: Bloom filters have no
    false negatives).  Probe positions are computed through the SAME
    JVM xxhash64 expression the build used; the index frame is
    metadata-sized (m/8 bytes per file), so the probe is driver-side
    like :func:`skipped_fraction`."""
    import numpy as np

    if value is None:
        raise ValueError("equality with NULL matches no rows; nothing to probe")
    rows = index.collect()
    if not rows:
        return 0.0
    m_bits, k = rows[0]["m_bits"], rows[0]["n_hashes"]
    spark = index.sparkSession
    # cast to the INDEXED column's type: xxhash64 is type-sensitive
    lit = F.lit(value).cast(rows[0]["col_type"])
    probe = spark.range(1).select(
        *[
            F.xxhash64(lit, F.lit(i))
            .bitwiseAND(F.lit(m_bits - 1))
            .alias(f"p{i}")
            for i in range(k)
        ]
    ).first()
    ps = [probe[f"p{i}"] for i in range(k)]
    read = 0
    for r in rows:
        b = np.frombuffer(r["bits"], dtype=np.uint8)
        if all(b[p >> 3] & (1 << (p & 7)) for p in ps):
            read += 1
    return 1.0 - read / len(rows)
