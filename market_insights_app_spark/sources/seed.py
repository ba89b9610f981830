"""Demo-seed generators — SURVEY.md §2.1 S8 (app/seed_demo.py).

The reference seeds 7 symbols × 25 hourly random-walk points, 40
synthetic journal trades, and 4 wealth transactions (seed_demo.py:28-121)
with Python loops. Spark-first: ``spark.range`` cross the symbol dim,
``rand(seed)`` for the step noise, and a running-sum window for the
walk — fully distributed, deterministic under a fixed seed.

S9 (clear_demo.py:14-19) is the filter-rewrite `clear_demo`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SEED_SYMBOLS = ["EURUSD", "GBPUSD", "USDJPY", "XAUUSD", "BTCUSD", "AAPL", "MSFT"]
SEED_BASES = {  # seed_demo.py:31-39 base prices
    "EURUSD": 1.08,
    "GBPUSD": 1.27,
    "USDJPY": 151.0,
    "XAUUSD": 2300.0,
    "BTCUSD": 64000.0,
    "AAPL": 190.0,
    "MSFT": 420.0,
}


def seed_prices(
    spark: SparkSession,
    n_points: int = 25,
    seed: int = 42,
    end_ts: str = "2025-01-01 00:00:00",
) -> DataFrame:
    """Random-walk quotes: price_i = max(1e-4, base + cumsum(noise)),
    noise ~ uniform(-.001, .001)·scale (seed_demo.py:43-47), hourly
    steps backward from ``end_ts``. Deterministic via rand(seed)."""
    symbols = spark.createDataFrame(
        [(s, SEED_BASES[s]) for s in SEED_SYMBOLS], "symbol string, base double"
    )
    steps = spark.range(n_points).withColumnRenamed("id", "i")
    grid = symbols.crossJoin(steps)
    scale = F.when(F.col("symbol") == "USDJPY", 100.0).when(
        F.col("symbol").isin("XAUUSD", "BTCUSD", "AAPL", "MSFT"), F.col("base") * 0.01
    ).otherwise(1.0)
    noise = (F.rand(seed) * 2 - 1) * 0.001 * scale
    w = Window.partitionBy("symbol").orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = grid.withColumn("step", noise).withColumn(
        "price", F.greatest(F.lit(1e-4), F.col("base") + F.sum("step").over(w))
    )
    as_of = F.to_timestamp(F.lit(end_ts)) - (
        F.lit(n_points - 1) - F.col("i")
    ).cast("int") * F.expr("INTERVAL 1 HOUR")
    return walk.select(
        (F.row_number().over(Window.orderBy("symbol", "i"))).alias("id"),
        "symbol",
        F.round("price", 6).alias("price"),
        as_of.alias("as_of"),
        F.lit(None).cast("string").alias("currency"),
        F.lit("demo").alias("source"),
    )


def seed_journal(spark: SparkSession, n: int = 40, seed: int = 42) -> DataFrame:
    """40 synthetic trades: 4 symbols round-robin, alternating
    Long/Short, daily spacing (seed_demo.py:58-94)."""
    syms = ["EURUSD", "XAUUSD", "AAPL", "BTCUSD"]
    sym_arr = F.array(*[F.lit(s) for s in syms])
    base = spark.range(n).withColumnRenamed("id", "i")
    entry = 100.0 + F.rand(seed) * 10
    exit_ = entry + (F.rand(seed + 1) * 2 - 1) * 5
    return base.select(
        (F.col("i") + 1).alias("id"),
        F.element_at(sym_arr, (F.col("i") % 4 + 1).cast("int")).alias("symbol"),
        (
            F.to_timestamp(F.lit("2025-01-01")) + F.col("i").cast("int") * F.expr("INTERVAL 1 DAY")
        ).alias("date"),
        F.when(F.col("i") % 2 == 0, "Long").otherwise("Short").alias("direction"),
        F.lit(1.0).alias("qty"),
        F.round(entry, 4).alias("entry"),
        F.round(entry * 0.98, 4).alias("stop"),
        F.round(exit_, 4).alias("exit"),
        F.lit(0.0).alias("fees"),
        F.lit("demo").alias("tags"),
        F.lit(None).cast("string").alias("notes"),
    )


def clear_demo(prices: DataFrame) -> DataFrame:
    """S9 (clear_demo.py:14-19): DELETE WHERE source='demo' as the
    batch filter-rewrite. Null-safe: the reference's SQL DELETE keeps
    NULL-source rows (NULL='demo' is not true), so the kept-set must
    include them — a plain != would drop NULLs."""
    return prices.filter(~F.col("source").eqNullSafe("demo"))
