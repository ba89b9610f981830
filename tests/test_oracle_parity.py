"""Differential parity: every registered query vs its DuckDB oracle —
a local replica of the driver's CORRECTNESS gate (row count + column
set + order-insensitive stringified-value multiset).
"""

from __future__ import annotations

import math

import pytest

from market_insights_app_spark.plans.registry import ORACLES, QUERIES
from tests.conftest import SF_ORACLE


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, stringify
    values (floats via repr of rounded), sort row tuples."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)

    return sorted(tuple(cell(r[i]) for i in order) for r in rows)


def test_fingerprint_non_ascii_parity(spark):
    """Pin cross-engine fingerprint agreement on NON-ASCII text: Spark
    ``ascii()`` and DuckDB ``ord()`` both return Unicode codepoints, and
    md5 hashes UTF-8 bytes on both engines — verified here so a future
    non-ASCII corpus (e.g. zh) can't silently break parity."""
    import duckdb

    from market_insights_app_spark.functions.text import md5_fingerprint, rolling_fingerprint
    from market_insights_app_spark.plans.textml import TEXTML_ORACLES

    data = [(1, "naïve €42 中文 Hello"), (2, "plain ascii"), (3, "żółć ÄŁ–—…")]
    sdf = spark.createDataFrame(data, ["doc_id", "text"]).select(
        "doc_id", md5_fingerprint("text").alias("fp"), rolling_fingerprint("text").alias("rh")
    )
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in data)
        + ") d(doc_id, text)"
    )
    drows = sorted(con.sql(TEXTML_ORACLES["fingerprint_docs"]).fetchall())
    assert srows == [tuple(r) for r in drows]


def test_media_decode_non_ascii_parity(spark):
    """Byte-based media oracle vs Spark fake decoder on non-ASCII text
    (multi-byte UTF-8: chars != bytes)."""
    import duckdb

    from market_insights_app_spark.operators.multimodal import decode_media
    from market_insights_app_spark.plans.textml import TEXTML_ORACLES
    from pyspark.sql import functions as F

    data = [(1, "naïve €42 中文"), (2, "ascii only"), (3, "żółć")]
    media = spark.createDataFrame(data, ["doc_id", "text"]).select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    sdf = decode_media(media, fake=True).select(
        "media_id", "kind", "n_bytes", F.round("feat_mean", 4).alias("feat_mean")
    )
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in data)
        + ") d(doc_id, text)"
    )
    drows = sorted(con.sql(TEXTML_ORACLES["media_decode"]).fetchall())
    assert srows == [tuple(r) for r in drows]


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_ORACLE)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    ddf = duck.sql(ORACLES[name])
    drows = ddf.fetchall()
    dcols = [d[0] for d in ddf.description]
    assert sorted(scols) == sorted(dcols), f"{name}: column sets differ"
    assert len(srows) == len(drows), f"{name}: row counts {len(srows)} vs {len(drows)}"
    sc, dc = canon(srows, scols), canon(drows, dcols)
    mism = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b][:5]
    assert sc == dc, f"{name}: first mismatches at {mism}: " + "; ".join(
        f"spark={sc[i]} duck={dc[i]}" for i in mism
    )


# Driver-safe DuckDB output types: the driver's value-hash distinguishes
# physical types its stringified local replica does not — HUGEINT (bare
# sum() over integers) and surprise DECIMALs (sum(1.0), decimal division)
# have each cost a round (r2 decimal-width cliff, r6 robust_outliers /
# validate_lineitem).  DECIMAL is allowed only where the Spark twin
# verifiably emits the identical decimal type.
_SAFE_DUCK_TYPES = {
    "BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "INTEGER",
    "TIMESTAMP", "DATE",
}
_DECIMAL_WHITELIST = {
    ("incremental_agg", "revenue"): "DECIMAL(20,2)",
}


def test_oracle_type_hygiene(duck):
    """Every DuckDB oracle must emit only driver-safe column types.
    Planning only — ``rel.types`` never executes the query."""
    bad = []
    for name, sql in ORACLES.items():
        rel = duck.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ)
            if t in _SAFE_DUCK_TYPES:
                continue
            if _DECIMAL_WHITELIST.get((name, col)) == t:
                continue
            bad.append(f"{name}.{col}: {t}")
    assert not bad, (
        "oracle columns with driver-unsafe types (CAST them to "
        "BIGINT/DOUBLE, or whitelist decimals the Spark twin matches): "
        + "; ".join(bad)
    )


def test_decimal_whitelist_matches_spark(spark):
    """The decimal whitelist is only sound if the Spark twin emits the
    same decimal type — pin it (plan-only, no execution)."""
    from pyspark.sql.types import DecimalType

    for (name, col), t in _DECIMAL_WHITELIST.items():
        field = QUERIES[name](spark, SF_ORACLE).schema[col]
        assert isinstance(field.dataType, DecimalType), (name, col)
        p, s = field.dataType.precision, field.dataType.scale
        assert t == f"DECIMAL({p},{s})", (
            f"{name}.{col}: oracle {t} vs Spark DECIMAL({p},{s})"
        )


def test_ann_oracle_dim_assumption(spark):
    """The generated ANN oracles embed dim-64 hyperplane literals; fail
    loudly here if the testdata embedding dimension ever changes."""
    from pyspark.sql import functions as F

    from market_insights_app_spark.sources.tables import load_table

    dims = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select(F.size("embedding").alias("d"))
        .distinct()
        .collect()
    )
    assert [r["d"] for r in dims] == [64]
