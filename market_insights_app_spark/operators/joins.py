"""Join operators — SURVEY.md §2.3 (J1-J5).

The reference has no SQL JOINs; its join semantics are procedural:
an N+1 correlated latest-price lookup (db.py:422 → db.py:391-396) and a
client-side signature-keyed merge (main.js:853-867). Both become single
distributed plans here:

- J1 latest join  = ranking-window dedup + broadcast equi-join
- as-of join      = union + last_value(ignorenulls) forward-fill —
                    the scalable merge-join formulation (no range
                    cross-product, one shuffle on (key, time))
- J3 union merge  = unionByName + left-anti precedence

Scale notes: the latest-per-key side of J1 is bounded by key
cardinality (symbols), so it is broadcast explicitly. The as-of union
form shuffles each side once on the key and never materializes a
time-range cross-product — this is the 100 TB formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from market_insights_app_spark.functions.scalars import ts_us
from pyspark.sql.window import Window

from market_insights_app_spark.operators.windows import latest_per_key


def latest_join(
    facts: DataFrame,
    series: DataFrame,
    key: str,
    ts_col: str,
    id_col: str | None,
    value_cols: list[str],
    broadcast_latest: bool = True,
) -> DataFrame:
    """J1 (db.py:399-425): enrich ``facts`` with the newest ``series``
    row per key. LEFT join so keys with no series rows keep null
    value columns (null-propagating market_value contract, db.py:423,
    §7.4.4)."""
    latest = latest_per_key(series, [key], ts_col, id_col).select(key, *value_cols)
    if broadcast_latest:
        latest = F.broadcast(latest)
    return facts.join(latest, on=key, how="left")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance=None,
) -> DataFrame:
    """As-of (backward) join: for each left row, the newest right row
    with ``right_ts <= left_ts`` on the same key.

    Implementation = union-merge: tag both sides, sort by
    (key, ts, side) with right rows first at equal ts, forward-fill the
    right payload with last(ignorenulls) over a running frame, keep left
    rows. One shuffle per side on the key — no range cross-product, so
    it scales linearly where a naive theta-join would be quadratic.
    Generalizes J1 to backdated valuation (SURVEY §2.3 J1 note).
    """
    lcols = left.columns
    payload = [F.col(c).alias(f"__r_{c}") for c in value_cols]
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType
        ).alias("__l"),
        *payload,
    )
    merged = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    right_payload = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__t").alias("__rts"),
            *[F.col(f"__r_{c}").alias(c) for c in value_cols],
        ),
    )
    filled = merged.select(
        "*", F.last(right_payload, ignorenulls=True).over(w).alias("__rfill")
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__rfill",
            F.when(
                F.col("__rfill").isNotNull()
                & (F.col("__t").cast("long") - F.col("__rfill.__rts").cast("long") <= tolerance),
                F.col("__rfill"),
            ),
        )
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__rfill.{c}").alias(c) for c in value_cols],
    )


def union_merge(
    server: DataFrame,
    local: DataFrame,
    sig_cols: list[str],
) -> DataFrame:
    """J3/D6 (main.js:853-867): server rows win; local-only rows (by
    composite signature) are appended — unionByName + left-anti."""
    local_only = local.join(server.select(*sig_cols).distinct(), on=sig_cols, how="left_anti")
    return server.unionByName(local_only)


def scoped(facts: DataFrame, scope_col: str, scope_id) -> DataFrame:
    """J2 (db.py:380-384): FK scoping is a partition-prunable filter,
    not a join, when the fact table is partitioned by the FK."""
    return facts.filter(F.col(scope_col) == F.lit(scope_id))


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: left rows matched to right intervals
    with ``start <= ts <= end`` on the same key — WITHOUT a theta
    cross-product.

    Bucketization: time is chunked into ``bucket_seconds`` cells; each
    interval explodes into the cells it covers, each event maps to its
    one cell, and the join becomes an equi-join on (key, cell) followed
    by the exact range predicate. Work scales with
    events + interval-cells, not events × intervals. Pick the bucket
    near the median interval length; AQE absorbs cell skew.
    """
    cell = lambda c: F.floor(ts_us(c) / F.lit(bucket_seconds * 1_000_000))  # noqa: E731
    l_cells = left.withColumn("__cell", cell(ts_col))
    r_cells = right.withColumn(
        "__cell",
        F.explode(F.sequence(cell(start_col), cell(end_col))),
    )
    joined = l_cells.join(
        r_cells,
        on=[key, "__cell"],
        how="inner",
    ).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    ).drop("__cell")
    if how == "inner":
        return joined
    if how == "left":
        matched = joined
        unmatched = l_cells.drop("__cell").join(
            matched.select(key, ts_col).distinct(), on=[key, ts_col], how="left_anti"
        )
        for c in right.columns:
            if c not in unmatched.columns:
                unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}")
