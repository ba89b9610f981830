"""Explicit StructType registry.

The reference declares its schemas twice — SQLite DDL
(/root/reference/app/db.py:33-163) and Pydantic response models
(/root/reference/app/main.py:23-199). Here both collapse into one
explicit StructType per table; Spark reads always pass an explicit
schema so ingest never depends on inference (the reference only ever
infers at the JSON wire edge, alpha_vantage.py:29-47).

Two families:
- the reference-domain tables (prices / journal / transactions /
  portfolios / entry_plans), used by the domain operators and tests;
- the driver testdata tables (TESTDATA.md / FIXTURES.md §B), used by
  the oracle-checked query registry.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-domain schemas (db.py:36-45, 50-64, 82-89, 93-107, 113-123)
# ---------------------------------------------------------------------------

PRICES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),  # ingest-sequence tiebreaker
        T.StructField("symbol", T.StringType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("as_of", T.TimestampType(), False),
        T.StructField("currency", T.StringType(), True),
        T.StructField("source", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)
PRICES_NATURAL_KEY = ["symbol", "as_of", "source"]  # UNIQUE at db.py:44

JOURNAL = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("date", T.TimestampType(), False),
        T.StructField("direction", T.StringType(), False),  # Long | Short
        T.StructField("qty", T.DoubleType(), False),
        T.StructField("entry", T.DoubleType(), False),
        T.StructField("stop", T.DoubleType(), True),
        T.StructField("exit", T.DoubleType(), True),
        T.StructField("fees", T.DoubleType(), False),
        T.StructField("tags", T.StringType(), True),
        T.StructField("notes", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

PORTFOLIOS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("base_currency", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

TRANSACTIONS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("portfolio_id", T.LongType(), False),
        T.StructField("date", T.TimestampType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("type", T.StringType(), False),  # BUY|SELL|DIV|CASH|FX
        T.StructField("qty", T.DoubleType(), False),
        T.StructField("price", T.DoubleType(), False),
        T.StructField("fees", T.DoubleType(), False),
        T.StructField("currency", T.StringType(), True),
        T.StructField("notes", T.StringType(), True),
    ]
)

ENTRY_PLANS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("symbol", T.StringType(), False),
        T.StructField("horizon", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("notes", T.StringType(), True),
        T.StructField("images", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
    ]
)
ENTRY_PLANS_NATURAL_KEY = ["symbol", "text"]  # unique index db.py:126-131

# Multimodal extension: opaque media payload + typed metadata
# (reference passes base64 data-URLs transiently, main.py:88,702-707;
#  here media is a first-class binary column).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata schemas (FIXTURES.md §B — verified from parquet footers)
# ---------------------------------------------------------------------------

TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA)
