"""Z-order layout (operators/layout.py): Morton-curve correctness vs a
pure-Python bit-interleave, and the data-skipping payoff — a 2-D box
predicate must prune z-ordered files on BOTH axes where the 1-D range
baseline prunes only its own."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_insights_app_spark.operators.layout import (
    layout_stats,
    linear_assign,
    skipped_fraction,
    zorder_assign,
    zorder_value,
)


def _interleave(vals: list[int], bits: int) -> int:
    z = 0
    for i in range(bits):
        for ci, v in enumerate(vals):
            z |= ((v >> i) & 1) << (i * len(vals) + ci)
    return z


def test_zorder_value_matches_python_interleave(spark):
    # x, y already spanning [0, 2^bits - 1] so scaling is the identity
    bits = 4
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    joined, z = zorder_value(df, ["x", "y"], bits=bits)
    got = {(r.x, r.y): r.z for r in joined.select("x", "y", z.alias("z")).collect()}
    for x, y in rows:
        assert got[(x, y)] == _interleave([x, y], bits), (x, y)


def test_zorder_value_guards(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError, match="fit a long"):
        zorder_value(df, ["x", "y"], bits=32)
    # constant column + NULLs scale to 0 instead of dividing by zero
    d2 = spark.createDataFrame([(5, None), (5, 2)], "x long, y long")
    joined, z = zorder_value(d2, ["x", "y"], bits=4)
    vals = [r[0] for r in joined.select(z).collect()]
    assert all(v is not None for v in vals)


def test_zorder_skips_on_both_axes_linear_only_on_one(spark):
    """The layout payoff, measured the way a skipping layer would:
    uniform 2-D data, 32 files, a ~3 %-per-axis box.  Linear-by-x
    prunes x-boxes and nothing for y-boxes; z-order prunes BOTH well."""
    n, files = 200_000, 32
    df = (
        spark.range(n)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("y"),
        )
    )
    box_x = {"x": (4000.0, 4300.0)}
    box_y = {"y": (4000.0, 4300.0)}
    box_xy = {**box_x, **box_y}

    lin = layout_stats(linear_assign(df, "x", files), ["x", "y"]).cache()
    zo = layout_stats(zorder_assign(df, ["x", "y"], files), ["x", "y"]).cache()

    # the baseline: perfect on its own axis, blind on the other
    assert skipped_fraction(lin, box_x) > 0.9
    assert skipped_fraction(lin, box_y) == 0.0
    # z-order: strong pruning on EITHER axis alone and better combined
    zx, zy, zxy = (
        skipped_fraction(zo, box_x),
        skipped_fraction(zo, box_y),
        skipped_fraction(zo, box_xy),
    )
    assert zx >= 0.5 and zy >= 0.5, (zx, zy)
    assert zxy >= max(zx, zy), (zx, zy, zxy)
    # correctness: no row lost by either layout
    assert lin.agg(F.sum("n_rows")).first()[0] == n
    assert zo.agg(F.sum("n_rows")).first()[0] == n


def test_zorder_files_are_disjoint_z_ranges(spark):
    """repartitionByRange on the z-value ⇒ files own disjoint z
    intervals (the property that makes stats usable at all)."""
    df = (
        spark.range(20_000)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(1000)).alias("x"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).alias("y"),
        )
    )
    joined, z = zorder_value(df, ["x", "y"], bits=10)
    with_file = (
        joined.withColumn("__z", z)
        .repartitionByRange(8, F.col("__z"))
        .withColumn("__file", F.spark_partition_id())
    )
    zr = (
        with_file.groupBy("__file")
        .agg(F.min("__z").alias("lo"), F.max("__z").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in zr)
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 <= l2, spans


def test_bloom_file_index_no_false_negatives_and_skips(spark):
    """Equality skipping: a value present in exactly one file must
    never be skipped from THAT file (no false negatives), and with
    16 bits/value the other files are almost all skipped; an absent
    value skips ~everything."""
    from market_insights_app_spark.operators.layout import (
        bloom_file_index,
        bloom_skipped_fraction,
    )

    n, files = 64_000, 16
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("x"),
    )
    # materialize ONCE: repartitionByRange re-samples its range
    # boundaries per action (seeded by the RDD id), so deriving the
    # index and the home-file lookup from separate evaluations can
    # disagree on file assignment (observed as a rare shard-run flake)
    laid = linear_assign(df, "doc_id", files).localCheckpoint(eager=True)
    idx = bloom_file_index(laid, "doc_id").cache()
    assert idx.count() == files
    # which file holds doc_id 12345?
    home = laid.filter(F.col("doc_id") == 12_345).select("__file").first()[0]
    rows = {r["__file"]: r for r in idx.collect()}
    import numpy as np

    m, k = rows[home]["m_bits"], rows[home]["n_hashes"]
    probe = spark.range(1).select(
        *[
            F.xxhash64(F.lit(12_345).cast("bigint"), F.lit(i))
            .bitwiseAND(F.lit(m - 1))
            .alias(f"p{i}")
            for i in range(k)
        ]
    ).first()
    b = np.frombuffer(rows[home]["bits"], dtype=np.uint8)
    assert all(b[p >> 3] & (1 << (p & 7)) for p in (probe[f"p{i}"] for i in range(k)))
    # present value: skipped fraction counts every file EXCEPT the
    # home file (plus rare false positives)
    frac = bloom_skipped_fraction(idx, 12_345)
    assert frac >= (files - 2) / files, frac
    # absent value: essentially everything skipped
    assert bloom_skipped_fraction(idx, 10_000_000) >= (files - 2) / files
    # NULL equality is a contract error, not a silent zero
    with pytest.raises(ValueError, match="NULL"):
        bloom_skipped_fraction(idx, None)


def test_bloom_file_index_empty_frame(spark):
    from market_insights_app_spark.operators.layout import bloom_file_index

    empty = spark.createDataFrame([], "doc_id long, __file int")
    assert bloom_file_index(empty, "doc_id").collect() == []


def test_zorder_value_three_columns(spark):
    """The interleave is dimension-generic: 3 columns x 3 bits against
    the pure-Python reference (identity scaling via full-range data)."""
    bits = 3
    rows = [(x, y, w) for x in range(8) for y in range(8) for w in range(8)]
    df = spark.createDataFrame(rows, "x long, y long, w long")
    joined, z = zorder_value(df, ["x", "y", "w"], bits=bits)
    got = {
        (r.x, r.y, r.w): r.z
        for r in joined.select("x", "y", "w", z.alias("z")).collect()
    }
    for x, y, w in rows:
        assert got[(x, y, w)] == _interleave([x, y, w], bits), (x, y, w)


def test_bloom_file_index_m_bits_cap_bounds_memory(spark):
    """ADVICE r8: the per-file buffer is bounded by max_m_bits — an
    oversized file gets a capped (higher-FPR) filter, never an
    unbounded allocation, and equality probes still have NO false
    negatives under the cap."""
    from market_insights_app_spark.operators.layout import (
        bloom_file_index,
        bloom_skipped_fraction,
    )

    n, files = 8_000, 4
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    laid = linear_assign(df, "doc_id", files).localCheckpoint(eager=True)
    # uncapped target would be next_pow2(16 * 2000) = 32768 bits; cap at 4096
    idx = bloom_file_index(laid, "doc_id", max_m_bits=4096).cache()
    rows = idx.collect()
    assert all(r["m_bits"] == 4096 for r in rows)
    assert all(len(r["bits"]) == 4096 // 8 for r in rows)
    # no false negatives: a present value is never skipped from its file
    home = laid.filter(F.col("doc_id") == 4_321).select("__file").first()[0]
    import numpy as np

    r = {x["__file"]: x for x in rows}[home]
    probe = spark.range(1).select(
        *[
            F.xxhash64(F.lit(4_321).cast("bigint"), F.lit(i))
            .bitwiseAND(F.lit(4096 - 1))
            .alias(f"p{i}")
            for i in range(r["n_hashes"])
        ]
    ).first()
    b = np.frombuffer(r["bits"], dtype=np.uint8)
    assert all(
        b[p >> 3] & (1 << (p & 7))
        for p in (probe[f"p{i}"] for i in range(r["n_hashes"]))
    )
    # probing through the public path agrees (home file never skipped)
    assert bloom_skipped_fraction(idx, 4_321) <= (files - 1) / files
    # non-power-of-two cap is a contract error
    with pytest.raises(ValueError, match="power of two"):
        bloom_file_index(laid, "doc_id", max_m_bits=5000)
