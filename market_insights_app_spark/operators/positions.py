"""Position aggregation — SURVEY.md §2.4 A1 + §2.3 J1 (the flagship
aggregation path, GET /portfolios/{pid}/positions).

The reference scans transactions chronologically and hash-aggregates
row-at-a-time in Python (db.py:399-425), then issues one correlated
latest-price query per symbol (the N+1, db.py:422). Here the whole
path is ONE declarative plan: conditional-sum groupBy (order-
insensitive — the sums commute, so no sort is needed, SURVEY §2.6 T4
note) + a broadcast latest-price join. Catalyst gives partial (map-
side) aggregation for free; the shuffle is on ``symbol`` only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_insights_app_spark.operators.joins import latest_join


def aggregate_positions(transactions: DataFrame, symbol_col: str = "symbol") -> DataFrame:
    """A1 (db.py:406-421). Type comparisons are case-insensitive
    (``typ.upper()`` at db.py:409,414). DIV/CASH/FX affect nothing.
    avg_cost = cost/buys with 0 fallback when no buys (db.py:421)."""
    typ = F.upper(F.col("type"))
    qty, price, fees = F.col("qty"), F.col("price"), F.col("fees")
    zero = F.lit(0.0)
    agg = transactions.groupBy(symbol_col).agg(
        F.sum(
            F.when(typ == "BUY", qty).when(typ == "SELL", -qty).otherwise(zero)
        ).alias("qty"),
        F.sum(F.when(typ == "BUY", qty * price).otherwise(zero)).alias("cost"),
        F.sum(F.when(typ.isin("BUY", "SELL"), fees).otherwise(zero)).alias("fees"),
        F.sum(F.when(typ == "BUY", qty).otherwise(zero)).alias("buys"),
    )
    return agg.withColumn(
        "avg_cost", F.coalesce(F.col("cost") / F.nullif(F.col("buys"), F.lit(0.0)), F.lit(0.0))
    )


def compute_positions(
    transactions: DataFrame,
    prices: DataFrame,
    portfolio_id=None,
    symbol_col: str = "symbol",
    price_ts_col: str = "as_of",
    price_id_col: str | None = "id",
) -> DataFrame:
    """Full positions path (db.py:399-425): scope → aggregate → enrich
    with newest price per symbol (broadcast; left join so symbols with
    no quotes keep last=null, market_value=null — db.py:422-423)."""
    txns = transactions
    if portfolio_id is not None:
        txns = txns.filter(F.col("portfolio_id") == F.lit(portfolio_id))
    pos = aggregate_positions(txns, symbol_col)
    prices_renamed = prices.select(
        F.col(symbol_col),
        F.col(price_ts_col),
        *([F.col(price_id_col)] if price_id_col else []),
        F.col("price").alias("last"),
    )
    enriched = latest_join(
        pos, prices_renamed, symbol_col, price_ts_col, price_id_col, ["last"]
    )
    return enriched.withColumn("market_value", F.col("last") * F.col("qty"))
