"""Approximate-sketch scale lane — the operators a REAL 100 TB run
uses where the exact lanes would sort or buffer whole value columns.

The exact siblings (profiling.robust_outliers, plans/core.
q_value_quantiles, quality.perplexity_buckets, profiling.profile_table
exact-distinct mode) all *document* "swap to sketches at scale"; this
module IS that swap, implemented and bound-tested rather than promised:

- quantiles ride ``percentile_approx`` (Greenwald-Khanna sketch,
  rank error ≤ n/accuracy, fixed-size mergeable buffers — only
  sketches cross the exchange, map-side combined),
- distinct counts ride ``approx_count_distinct`` (HyperLogLog++,
  relative error ~rsd, constant-size registers),
- :func:`sketch_accuracy_report` turns the error CONTRACTS into data:
  it emits per-group booleans asserting the sketch outputs sit inside
  their published bounds against exact counts computed in the same
  job.  The DuckDB oracle for the driver gate emits literal TRUEs —
  a sketch regression flips a boolean and hash-fails the round.

Both sketch families are deterministic for a fixed dataset (hash- and
merge-based, no RNG), so their outputs are stable across runs and safe
to gate on.

No reference analog (the reference computes overview stats exactly over
SQLite, app/main.py:418-447); this lane exists for the 100 TB story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_quantiles_approx(
    df: DataFrame,
    key_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group quantiles from ONE Greenwald-Khanna sketch aggregate —
    the scale twin of plans/core.q_value_quantiles.  Rank error is at
    most n/accuracy per group; the whole pass is a single partial-
    aggregable HashAggregate (no per-group sort, no value buffers in
    the exchange)."""
    arr = F.percentile_approx(
        value_col, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
    )
    out = df.groupBy(key_col).agg(arr.alias("__q"))
    cols = [F.col(key_col)] + [
        F.col("__q")[i].alias(f"p{int(round(p * 100))}")
        for i, p in enumerate(probs)
    ]
    return out.select(*cols)


def robust_outliers_approx(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: float = 3.0,
    accuracy: int = 10000,
) -> DataFrame:
    """Median/MAD outlier report with SKETCHED percentiles — the
    100 TB lane of profiling.robust_outliers.  Identical three-pass
    shape (median → per-row deviation → MAD → flags), but each
    percentile pass is a GK sketch aggregate: fixed-size buffers cross
    the exchanges instead of whole grouped value arrays.  The flagged
    set can differ from the exact lane only for values within the
    sketch's rank-error neighborhood of the median/MAD — bounded and
    property-tested in tests/test_sketches.py."""
    v = F.col(value_col).cast("double")
    med = df.groupBy(F.col(key_col).alias("k")).agg(
        F.percentile_approx(v, F.lit(0.5), F.lit(accuracy)).alias("med")
    )
    dev = df.select(F.col(key_col).alias("k"), v.alias("v")).join(
        F.broadcast(med), "k"
    )
    mad = dev.groupBy("k").agg(
        F.percentile_approx(
            F.abs(F.col("v") - F.col("med")), F.lit(0.5), F.lit(accuracy)
        ).alias("mad")
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
    return (
        flagged.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("med"), 6).alias("median"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
            F.round(
                F.sum(F.col("is_outlier").cast("double"))
                / F.count(F.lit(1)),
                6,
            ).alias("outlier_rate"),
        )
        .withColumnRenamed("k", key_col)
    )


def perplexity_buckets_approx(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    accuracy: int = 10000,
) -> DataFrame:
    """CCNet head/middle/tail tiers via sketched tertile THRESHOLDS —
    the documented scale path of quality.perplexity_buckets: one
    aggregate learns per-lang avg_logprob tertiles (GK sketch), the
    tiny threshold table broadcasts back, and bucketing is a
    comparison — no per-lang global sort, no ntile window.  Tier
    populations match the exact lane up to sketch rank error (±n/
    accuracy docs per boundary, property-tested)."""
    from market_insights_app_spark.operators.quality import unigram_logprob

    scores = unigram_logprob(df, id_col=id_col, text_col=text_col).join(
        df.select(F.col(id_col), F.col(lang_col)), id_col
    )
    thr = scores.groupBy(lang_col).agg(
        F.percentile_approx(
            "avg_logprob",
            F.array(F.lit(1.0 / 3.0), F.lit(2.0 / 3.0)),
            F.lit(accuracy),
        ).alias("__t")
    )
    j = scores.join(F.broadcast(thr), lang_col)
    s = F.col("avg_logprob")
    # head = highest avg_logprob (lowest perplexity): score above the
    # upper tertile threshold; tail below the lower one.
    bucket = (
        F.when(s > F.col("__t")[1], F.lit("head"))
        .when(s > F.col("__t")[0], F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return j.select(
        F.col(id_col),
        F.col(lang_col),
        "n_tokens",
        "avg_logprob",
        bucket.alias("bucket"),
    )


def sketch_accuracy_report(
    df: DataFrame,
    key_col: str,
    value_col: str,
    distinct_col: str,
    probs: tuple[float, ...] = (0.5, 0.9),
    accuracy: int = 10000,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group sketch-vs-exact error-bound report, built to be
    DRIVER-HASH-GATEABLE: the approximate values themselves are
    engine-specific (no DuckDB twin can reproduce Spark's GK/HLL++
    internals), so the report emits exact counts plus BOOLEANS
    asserting each sketch output honors its published bound —
    an oracle just writes TRUE.

    - ``p{p}_ok``: the sketched p-quantile's rank sits within
      n/accuracy (+1 slack for boundary ties) of p·n, checked with
      exact <=/< counts against the group's values.
    - ``distinct_ok``: |HLL++ estimate − exact distinct| ≤ 3·rsd·exact
      (three standard errors; HLL++ is exact in sparse mode so small
      groups pass trivially).

    Two scans of the input (sketch pass + exact-rank pass) joined on
    the group key — both are single partial-aggregable aggregates, and
    the sketch frame that joins back is k rows, broadcast."""
    v = F.col(value_col).cast("double")
    stats = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(distinct_col)).alias("n_distinct"),
        F.approx_count_distinct(F.col(distinct_col), rsd).alias("__ad"),
        F.percentile_approx(
            v, F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("__q"),
    )
    ranks = (
        df.select(F.col(key_col).alias("k"), v.alias("__v"))
        .join(F.broadcast(stats.select("k", "__q")), "k")
        .groupBy("k")
        .agg(
            *[
                agg
                for i in range(len(probs))
                for agg in (
                    F.sum((F.col("__v") <= F.col("__q")[i]).cast("long"))
                    .alias(f"__le{i}"),
                    F.sum((F.col("__v") < F.col("__q")[i]).cast("long"))
                    .alias(f"__lt{i}"),
                )
            ]
        )
    )
    nd = F.col("n").cast("double")
    slack = nd / F.lit(float(accuracy)) + F.lit(1.0)
    checks = [
        (
            (F.col(f"__le{i}").cast("double") >= nd * F.lit(p) - slack)
            & (F.col(f"__lt{i}").cast("double") <= nd * F.lit(p) + slack)
        ).alias(f"p{int(round(p * 100))}_ok")
        for i, p in enumerate(probs)
    ]
    dd = F.col("n_distinct").cast("double")
    distinct_ok = (
        F.abs(F.col("__ad").cast("double") - dd) <= F.lit(3.0 * rsd) * dd
    ).alias("distinct_ok")
    return (
        stats.join(ranks, "k")
        .select(
            F.col("k").alias(key_col),
            "n",
            "n_distinct",
            distinct_ok,
            *checks,
        )
    )


def hll_profile(
    df: DataFrame, columns: list[str] | None = None, rsd: float = 0.05
) -> DataFrame:
    """Single-aggregate HyperLogLog++ table profile — profiling.
    profile_table's ``approximate=True`` mode packaged as the named
    scale lane: one scan, per-column HLL registers only (no expand
    shuffle that exact multi-column count_distinct needs)."""
    from market_insights_app_spark.operators.profiling import profile_table

    del rsd  # profile_table uses the engine-default rsd; kept for API
    return profile_table(df, columns=columns, approximate=True)


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    max_items_tracked: int = 10_000,
) -> DataFrame:
    """Approximate top-k frequent items over an arbitrarily large key
    stream — the Misra-Gries/frequent-items sketch behind Spark 4's
    ``approx_top_k``, ridden JVM-side (one aggregate, fixed-size
    mergeable summaries across the exchange; nothing per-key ever
    shuffles).

    Output: (item string, est_count long), descending by estimate.

    Error contract (frequent-items sketch): while the number of
    distinct keys stays within ``max_items_tracked`` the counts are
    EXACT; past that, every key with true frequency > n/max_items_
    tracked is still reported and its estimate sits within
    n/max_items_tracked of the truth — the bound the exact-regime and
    overflow-regime tests in test_sketches.py assert against a full
    groupBy count.  The exact sibling (``pagination.top_k_per_group``
    / plain groupBy-orderBy-limit) sorts corpus-sized counts; this
    lane is what a 100 TB url/domain/token frequency pass actually
    runs."""
    item = F.expr(
        f"approx_top_k(CAST({key_col} AS STRING), {int(k)}, "
        f"{int(max_items_tracked)})"
    ).alias("__tk")
    return (
        df.agg(item)
        .select(F.explode("__tk").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").alias("est_count"),
        )
    )
