"""Journal analytics — SURVEY.md §2.4 A2/A3/A5 + §2.5 W11 + §2.8 F7/F8.

The reference computes these client-side over collected arrays
(static/main.js:901-1017). Here the whole renderJournal pipeline
(SURVEY §3.4) is one DataFrame DAG: scalar PnL/R columns → stats agg /
equity-curve window / two-pass histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from market_insights_app_spark.functions.scalars import pnl, r_multiple


def with_trade_scalars(journal: DataFrame) -> DataFrame:
    """F7/F8 (main.js:901-916) as columns."""
    out = journal.withColumn("pnl", pnl("direction", "entry", "exit", "qty", "fees"))
    return out.withColumn("r", r_multiple("pnl", "entry", "stop", "qty"))


def journal_stats(trades: DataFrame, pnl_col: str = "pnl", r_col: str = "r") -> DataFrame:
    """A2/A3 (main.js:939-947, 1123-1129): trades, wins, winrate%,
    total pnl, avg R — one aggregation."""
    p = F.col(pnl_col)
    return trades.agg(
        F.count(F.lit(1)).alias("trades"),
        F.sum((p > 0).cast("long")).alias("wins"),
        F.round(100.0 * F.sum((p > 0).cast("long")) / F.count(F.lit(1)), 0).alias("winrate"),
        F.round(F.sum(p), 2).alias("total_pnl"),
        F.round(F.avg(F.col(r_col)), 4).alias("avg_r"),
    )


def equity_curve(
    trades: DataFrame,
    pnl_col: str = "pnl",
    date_col: str = "date",
    id_col: str | None = "id",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """W11 (main.js:990-1000): running sum of pnl in date order.
    The reference's curve is global over one account's trades; at scale
    pass ``partition_cols`` (account/portfolio) so the window is keyed —
    an unpartitioned running sum funnels through one task."""
    order = [F.col(date_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = Window.orderBy(*order)
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(*order)
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return trades.withColumn("equity", F.sum(F.col(pnl_col)).over(frame))


def histogram(
    df: DataFrame, value_col: str, bins: int = 10
) -> DataFrame:
    """A5 (main.js:1006-1011): equal-width histogram, clamp into
    [0, bins-1]. Two passes: a tiny min/max agg (collected — 2 scalars,
    never data-sized) then a map-side bin + one groupBy shuffle of at
    most ``bins`` groups."""
    v = F.col(value_col)
    lohi = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
    if lohi["lo"] is None:
        # empty / all-null input: any edges work — the bin groupBy
        # over zero rows yields the empty report either way
        lo, hi = 0.0, 1.0
    else:
        lo, hi = float(lohi["lo"]), float(lohi["hi"])
    step = (hi - lo) / bins if hi > lo else 1.0
    bin_idx = F.least(
        F.lit(bins - 1), F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(step)))
    ).cast("int")
    return (
        df.withColumn("bin", bin_idx)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bin_lo", F.round(F.lit(lo) + F.col("bin") * F.lit(step), 6))
        .withColumn("bin_hi", F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(step), 6))
    )
