"""Dataset profiling operators — the first thing a 100 TB ingest runs.

The reference has no profiling surface (its closest analog is the
overview stat endpoint, app/main.py:418-447); a training-data pipeline
needs schema-wide health stats before any downstream stage: null rates,
cardinalities, ranges, and distribution quantiles per column.

Scale shape: ``profile_table`` is ONE full-scan aggregate — every
per-column statistic is an expression inside a single HashAggregate, so
the pass over 100 TB happens once (map-side partials, one tiny final
exchange, output rows = number of profiled columns). Exact
``count_distinct`` adds one expand-shuffle per column; the
``approximate=True`` path swaps in HyperLogLog++ sketches
(``approx_count_distinct``) that stay inside the single aggregate —
that is the default at scale.

(Distribution quantiles live with the query layer: plans/core.
q_value_quantiles — exact percentile locally, percentile_approx
t-digest at scale.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approximate: bool = False,
) -> DataFrame:
    """Per-column profile: one row per column with row/null/distinct
    counts and min/max rendered as strings (schema-stable across
    column types). One aggregate pass; column order of the input is
    preserved in the output via an explicit ordinal."""
    cols = columns or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approximate
        else (lambda c: F.count_distinct(c))
    )
    # aliases are ORDINAL-derived (__p0_n, __p1_n, …), never built from
    # the profiled column's name — a frame containing both 'x' and a
    # column literally named 'x__n' (or names with dots/backticks) would
    # otherwise collide or break resolution
    aggs: list[Column] = []
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.lit(1)).alias(f"__p{i}_n"),
            F.count(df[c]).alias(f"__p{i}_nn"),          # df[c]: exact-name
            distinct(df[c]).alias(f"__p{i}_nd"),         # resolution (dots ok)
            # native-type min/max, rendered to string AFTER the agg —
            # lexicographic min/max of the rendering would be wrong for
            # numerics ('99' > '149')
            F.min(df[c]).cast("string").alias(f"__p{i}_min"),
            F.max(df[c]).cast("string").alias(f"__p{i}_max"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(i).alias("ordinal"),
            F.lit(c).alias("column"),
            F.col(f"__p{i}_n").alias("n_rows"),
            (F.col(f"__p{i}_n") - F.col(f"__p{i}_nn")).alias("n_null"),
            F.col(f"__p{i}_nd").alias("n_distinct"),
            F.col(f"__p{i}_min").alias("min_str"),
            F.col(f"__p{i}_max").alias("max_str"),
        )
        for i, c in enumerate(cols)
    ]
    return (
        wide.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
    )


def robust_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD robust outlier report per group — the anomaly gate
    that survives what breaks z-scores: mean and stddev are themselves
    dragged by the outliers they're supposed to find, median and MAD
    (median absolute deviation) are not.  A value is flagged when
    |v − median| > k · 1.4826 · MAD (1.4826 scales MAD to σ under
    normality — the standard robust z-score).

    Three grouped passes by construction (median → MAD needs the
    median per row → flags need the MAD): each intermediate is a
    k-row table broadcast back.  Note the exact grouped
    ``percentile`` is NOT a cheap partial aggregate — it buffers the
    group's values and moves those aggregation buffers through an
    exchange, so the first two passes each shuffle O(rows) of value
    data (the final flag pass is a true partial agg).  At 100 TB use
    :func:`robust_outliers_approx` — the same shape over mergeable
    ``approx_percentile`` sketches, where only fixed-size sketch
    buffers cross the exchange.  Groups with MAD = 0 (over half the
    values identical) flag any deviation from the median."""
    v = F.col(value_col).cast("double")
    med = df.groupBy(F.col(key_col).alias("k")).agg(
        F.percentile(v, F.lit(0.5)).alias("med")
    )
    dev = df.select(F.col(key_col).alias("k"), v.alias("v")).join(
        F.broadcast(med), "k"
    )
    mad = dev.groupBy("k").agg(
        F.percentile(F.abs(F.col("v") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "k").select(
        "k",
        (
            F.abs(F.col("v") - F.col("med"))
            > F.lit(k) * F.lit(1.4826) * F.col("mad")
        ).alias("is_outlier"),
        "med",
        "mad",
    )
    return flagged.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.first("med"), 6).alias("median"),
        F.round(F.first("mad"), 6).alias("mad"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        F.round(
            F.sum(F.col("is_outlier").cast("double")) / F.count(F.lit(1)), 6
        ).alias("outlier_rate"),
    ).withColumnRenamed("k", key_col)


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    key_col: str,
    value_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of a numeric column, per group — the ML-monitoring drift
    number (rule of thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25
    shifted).  Bins are the REFERENCE deciles (equi-depth on ref, so
    every ref bin holds ~1/n of mass and the statistic is sensitive
    where the data actually lives); PSI = Σ (q−p)·ln(q/p) over bin
    shares, with both shares clamped to ``eps`` so empty bins
    contribute a large-but-finite term.

    A group present ONLY in the current snapshot (a brand-new segment
    — arguably maximal drift) has no reference deciles to bin
    against; it is emitted with ``psi = NULL`` as the new-segment
    sentinel rather than silently dropped, so alerting layers must
    treat NULL as "new group, investigate" (not "no drift").

    Scale shape: the edge table is k × (n−1) doubles computed in one
    grouped percentile aggregate and broadcast; binning is a
    scan-stage expression (count of edges below the value) on each
    side; everything after the two (key, bin) counts is arithmetic
    over k×n tiny rows (the new-segment pass adds one tiny distinct
    anti-join).  Values equal to an edge go to the lower bin in both
    engines (strict ``v > edge`` count)."""
    pcts = [i / n_bins for i in range(1, n_bins)]
    v = F.col(value_col).cast("double")
    edges = ref.groupBy(F.col(key_col).alias("k")).agg(
        F.percentile(v, F.lit(pcts)).alias("edges")
    )

    def bin_counts(df: DataFrame, out: str) -> DataFrame:
        b = df.select(F.col(key_col).alias("k"), v.alias("v")).join(
            F.broadcast(edges), "k"
        )
        binned = b.select(
            "k",
            F.size(F.filter(F.col("edges"), lambda e: F.col("v") > e)).alias(
                "bin"
            ),
        )
        return binned.groupBy("k", "bin").agg(F.count(F.lit(1)).alias(out))

    r = bin_counts(ref, "n_ref")
    c = bin_counts(cur, "n_cur")
    both = r.join(c, ["k", "bin"], "full_outer").select(
        "k",
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    wk = Window.partitionBy("k")
    # a key with ZERO current rows (segment disappeared) would divide
    # by a zero window total — an ANSI job abort.  The guard yields
    # NULL shares, greatest() ignores NULL -> every bin floors to eps,
    # and the PSI comes out large: "segment vanished" reads as maximal
    # drift, the right signal.  (The symmetric ref-side guard can only
    # engage for keys whose ref rows are all outside the binned join —
    # defensive.)
    ref_tot = F.sum("n_ref").over(wk)
    cur_tot = F.sum("n_cur").over(wk)
    p = F.greatest(
        F.when(ref_tot > 0, F.col("n_ref") / ref_tot), F.lit(eps)
    )
    q = F.greatest(
        F.when(cur_tot > 0, F.col("n_cur") / cur_tot), F.lit(eps)
    )
    term = (q - p) * F.log(q / p)
    scored = (
        both.select("k", term.alias("term"))
        .groupBy("k")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
    )
    new_groups = (
        cur.select(F.col(key_col).alias("k"))
        .distinct()
        .join(ref.select(F.col(key_col).alias("k")).distinct(), "k", "left_anti")
        .select("k", F.lit(None).cast("double").alias("psi"))
    )
    return scored.unionByName(new_groups).withColumnRenamed("k", key_col)


def key_skew(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 20,
) -> DataFrame:
    """Partition-skew report for a prospective shuffle/join key — the
    first question before keying a 100 TB shuffle: the ``top_n``
    heaviest keys with their absolute counts, share of all rows, and
    cumulative share, plus the global key count for context.  A top
    key holding ≫ 1/n_partitions of the rows predicts a straggler task
    and argues for salting or an AQE skew join (see
    plans/core.q_salted_hot_agg for the remedy this report triggers).

    Scale shape: ONE map-side-combining groupBy over the rows; the
    global totals reduce to a single broadcast row; the heavy-hitter
    cut is orderBy+limit → TakeOrderedAndProject (per-partition heap,
    never a global sort); ranking/cumulating run over the ``top_n``-row
    result only."""
    keys = [F.col(k) for k in key_cols]
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("n_keys_total"),
    )
    top = counts.orderBy(
        F.col("n_rows").desc(), *[k.asc() for k in keys]
    ).limit(top_n)
    w = (
        Window.orderBy(F.col("n_rows").desc(), *[k.asc() for k in keys])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("n_rows").desc(), *[k.asc() for k in keys]
                )
            )
            .alias("rank"),
            *key_cols,
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("__total").cast("double")).alias(
                "share"
            ),
            (
                F.sum("n_rows").over(w).cast("double")
                / F.col("__total").cast("double")
            ).alias("cum_share"),
            "n_keys_total",
        )
    )


def corpus_manifest(
    df: DataFrame,
    split_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "manifest-v1",
) -> DataFrame:
    """Dataset release manifest: one row per split with the integrity
    facts a reproducible data release publishes alongside the shards —
    row count, distinct-id count (dup tripwire), payload bytes, id
    range, and an ORDER-INSENSITIVE content checksum (sum of 32-bit
    md5 prefixes over the canonical ``salt:id:text`` row string).
    Re-running the pipeline, re-sharding, or re-ordering rows leaves
    the manifest bit-identical; any dropped, duplicated, or edited row
    changes it — the property that lets a 100 TB consumer verify a
    delivery without re-reading the producer's job logs.

    Scale shape: one scan → one map-side-combinable groupBy(split);
    every output is a fixed-size aggregate buffer, so the single
    Exchange carries (n_splits × 7 longs), never rows. The checksum
    is engine-portable (md5 of UTF-8 bytes, same construction as
    ``sampling.shard_hash``) and overflow-safe to ~2^31 rows per
    split; past that, publish per-shard manifests (the natural unit
    of a release) or widen to the 16-hex-digit prefix.

    Determinism: counts/sums of exact longs only — no doubles
    anywhere, so there is nothing to round."""
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + ":"),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.coalesce(F.col(text_col), F.lit("")),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        df.groupBy(F.col(split_col).alias("split"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col(id_col)).alias("n_distinct_ids"),
            F.sum(F.octet_length(F.coalesce(F.col(text_col), F.lit("")))).alias(
                "n_bytes"
            ),
            F.min(F.col(id_col)).alias("min_id"),
            F.max(F.col(id_col)).alias("max_id"),
            F.sum(row_hash).alias("content_sum"),
        )
    )
