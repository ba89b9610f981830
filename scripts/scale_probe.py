"""Scale probe: drive the hot operator families on synthetic data one
to two orders of magnitude above the sf0.1 bench (generated with
spark.range — no testdata duplication, nothing written to disk) and
print per-operator wall-clock. Records go to SCALE_NOTES.md by hand.

    python scripts/scale_probe.py [n_events] [n_docs]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

    sys.path.insert(0, ".")
    from market_insights_app_spark.operators.dedup import minhash_near_dupes
    from market_insights_app_spark.operators.joins import asof_join, latest_join
    from market_insights_app_spark.operators.windows import (
        latest_per_key,
        series_window,
        sma,
    )
    from market_insights_app_spark.session import get_spark

    spark = get_spark(app_name="mias-scale-probe")

    # --- synthetic events: n_events rows, 10k users, skewed types ----------
    ev = (
        spark.range(n_events)
        .withColumn("user_id", F.pmod(F.xxhash64("id"), F.lit(10_000)))
        .withColumn("ts", F.col("id") * 1000 + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(997)))
        .withColumn("value", (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100_000)) / 100.0))
        .withColumn(
            "event_type",
            F.element_at(
                F.array(*[F.lit(t) for t in ["click", "view", "purchase", "signup", "error"]]),
                (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5)) + 1).cast("int"),
            ),
        )
        .withColumnRenamed("id", "event_id")
    )
    ev.persist()
    n = ev.count()

    def t(label, df):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        print(f"{label:35s} {time.perf_counter() - t0:7.2f} s")

    print(f"events rows: {n:,}  (~{n // 100_000}x the sf0.1 bench table)")
    w = series_window(["user_id"], "ts", "event_id")
    t("groupBy conditional agg", ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)).alias("q"),
        F.count(F.lit(1)).alias("n"),
    ))
    t("latest_per_key window", latest_per_key(ev, ["user_id"], "ts", "event_id"))
    t("sma5 window", ev.select("event_id", sma("value", w, 5).alias("s")))
    t("tumbling window agg", ev.groupBy(
        F.window(F.timestamp_micros(F.col("ts")), "15 minutes"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n")))
    dims = spark.range(10_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 100).alias("segment")
    )
    t("broadcast latest join", latest_join(
        dims, ev.select("user_id", "ts", "event_id", F.col("value").alias("last")),
        "user_id", "ts", "event_id", ["last"],
    ))
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", F.col("value").alias("vv"))
    t("as-of join (union-merge)", asof_join(purchases, views, "user_id", "ts", "ts", ["vv"]))

    # --- round-5 market ops over the same ticks ----------------------------
    from market_insights_app_spark.operators.market import (
        max_drawdown,
        moments,
        ohlc_bars,
        pairwise_corr,
    )

    evt = ev.withColumn(
        # one tick / 0.25 s from 2024-01-01 → ~29 days of daily/hourly buckets
        "tts",
        F.timestamp_micros(F.lit(1_704_067_200_000_000) + F.col("event_id") * 250_000),
    )
    t("ohlc daily bars", ohlc_bars(evt, ts_col="tts", volume=F.lit(1)))
    t("max drawdown", max_drawdown(evt, ts_col="tts"))
    t("series moments", moments(evt))
    # 500 keys × ~700 hourly buckets → ~125k pairs, ~87M joined pair rows:
    # the quadratic term runs over the ALIGNED table, never the raw ticks
    corr_in = evt.withColumn("user_id", F.pmod(F.col("user_id"), F.lit(500)))
    t("pairwise corr (500 keys)", pairwise_corr(corr_in, ts_col="tts"))
    from market_insights_app_spark.operators.market import pairwise_corr_dense

    t(
        "pairwise corr dense (500 keys)",
        pairwise_corr_dense(corr_in, ts_col="tts", n_blocks=4),
    )
    from market_insights_app_spark.operators.market import ols_trend

    t(
        "ols trend (10k keys)",
        ols_trend(evt, key_col="user_id", ts_col="tts"),
    )
    # snapshot diff: both snapshots are the full tick table ±1 in 89/97
    # keys, 1-in-5 values changed — the FullOuter SMJ moves each side once
    from market_insights_app_spark.operators.reconcile import snapshot_diff

    old_s = ev.filter(F.col("event_id") % 89 != 0).select("event_id", "value", "event_type")
    new_s = ev.filter(F.col("event_id") % 97 != 0).select(
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value") + 1.0)
        .otherwise(F.col("value"))
        .alias("value"),
        "event_type",
    )
    t(
        "snapshot diff (10M x 10M)",
        snapshot_diff(old_s, new_s, ["event_id"], ["value", "event_type"]),
    )

    # --- reconcile family at change-log scale ------------------------------
    from market_insights_app_spark.operators.reconcile import (
        agg_delta,
        incremental_agg_update,
        pit_lookup,
        scd2_build,
    )

    # SCD2 from the full tick table as a change log: 10k keys × ~1k
    # updates each; ~1/50 of consecutive rows collapse as no-ops
    log = ev.select(
        "user_id",
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000) + F.col("event_id") * 250_000
        ).alias("uts"),
        "event_id",
        F.pmod(F.xxhash64("event_id", F.lit(7)), F.lit(50)).alias("segment"),
        "event_type",
    )
    scd2 = scd2_build(
        log, ["user_id"], "uts", ["segment", "event_type"], tiebreak_col="event_id"
    )
    t("scd2 build (10M change log)", scd2)

    # PIT lookup: 1M facts against the materialized SCD2 dimension
    dim = scd2.persist()
    dim.count()
    facts = ev.filter(F.col("event_id") % 10 == 0).select(
        "event_id",
        "user_id",
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000) + F.col("event_id") * 250_000 + 1
        ).alias("fts"),
    )
    t(
        "pit lookup (1M facts x scd2 dim)",
        pit_lookup(facts, dim, "user_id", "fts", ["segment", "event_type"]),
    )
    dim.unpersist()

    # IVM: a 10M-vs-10M diff reduced to per-group deltas and merged into
    # the materialized aggregate — the base is never rescanned
    old_d = old_s.select(
        "event_id", F.col("value").cast("decimal(18,2)").alias("value"), "event_type"
    )
    new_d = new_s.select(
        "event_id", F.col("value").cast("decimal(18,2)").alias("value"), "event_type"
    )
    base_agg = old_d.groupBy("event_type").agg(
        F.sum("value").alias("s"), F.count(F.lit(1)).alias("c")
    )
    diff_d = snapshot_diff(
        old_d, new_d, ["event_id"], ["value", "event_type"]
    ).persist()
    diff_d.count()
    delta = agg_delta(diff_d, "event_type", "value")
    t(
        "ivm update (10M diff -> 5 groups)",
        incremental_agg_update(base_agg, delta, "event_type", "s", "c"),
    )
    diff_d.unpersist()

    # --- round-6 sequence/returns/skew ops over the same ticks --------------
    from market_insights_app_spark.operators.market import (
        beta_vs_benchmark,
        daily_returns,
        sharpe_ratio,
    )
    from market_insights_app_spark.operators.profiling import key_skew
    from market_insights_app_spark.operators.windows import (
        rolling_zscore_anomalies,
        transition_matrix,
    )

    rets = daily_returns(evt, ts_col="tts")
    t("daily returns + sharpe (10k keys)", sharpe_ratio(rets))
    t("beta vs benchmark (10k keys)", beta_vs_benchmark(rets))
    t("transition matrix (10M events)", transition_matrix(
        ev, ["user_id"], "event_type", ts_col="ts", id_col="event_id"
    ))
    t("zscore anomalies (10M ticks)", rolling_zscore_anomalies(
        ev, ["user_id"], value_col="value", ts_col="ts", id_col="event_id"
    ).filter(F.col("is_anomaly")))
    t("key skew report (10M rows)", key_skew(ev, ["user_id"]))
    from market_insights_app_spark.operators.market import (
        rolling_market_corr,
        var_cvar,
    )

    t("var/cvar tail risk (10k keys)", var_cvar(rets, alpha=0.10))
    t(
        "rolling market corr (10k keys)",
        rolling_market_corr(rets, n=20),
    )

    # --- round-7 sketch lane: exact vs approx on the same 10M ticks --------
    # The point of the comparison: the exact lanes buffer/sort whole
    # value columns through their exchanges; the sketch lanes move only
    # fixed-size GK/HLL++ buffers. Same output shape, bound-tested in
    # tests/test_sketches.py.
    from market_insights_app_spark.operators.profiling import (
        profile_table,
        robust_outliers,
    )
    from market_insights_app_spark.operators.sketches import (
        hll_profile,
        robust_outliers_approx,
        sketch_accuracy_report,
        value_quantiles_approx,
    )

    t("robust outliers EXACT (10M)", robust_outliers(ev, "event_type", "value"))
    t(
        "robust outliers SKETCH (10M)",
        robust_outliers_approx(ev, "event_type", "value"),
    )
    t(
        "value quantiles EXACT (10M)",
        ev.groupBy("event_type").agg(
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.9)).alias("p90"),
            F.percentile("value", F.lit(0.99)).alias("p99"),
        ),
    )
    t(
        "value quantiles SKETCH (10M)",
        value_quantiles_approx(ev, "event_type", "value"),
    )
    t("table profile EXACT-distinct (10M)", profile_table(ev))
    t("table profile HLL (10M)", hll_profile(ev))
    t0 = time.perf_counter()
    rep = sketch_accuracy_report(ev, "event_type", "value", "user_id").collect()
    ok = all(r["distinct_ok"] and r["p50_ok"] and r["p90_ok"] for r in rep)
    print(
        f"{'sketch accuracy report (10M)':35s} {time.perf_counter() - t0:7.2f} s"
        f"   all_bounds_ok={ok}"
    )
    ev.unpersist()

    # --- synthetic docs: n_docs rows, zipf-ish repeated phrases ------------
    words = "the spark engine shuffles data fast slow merge join sort hash table scan batch stream window filter group value".split()
    word_arr = F.array(*[F.lit(w_) for w_ in words])
    docs = (
        spark.range(n_docs)
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(80)),
                    lambda i: F.element_at(
                        word_arr,
                        (F.pmod(F.xxhash64(F.col("id") * 100 + i), F.lit(len(words))) + 1).cast("int"),
                    ),
                ),
            ),
        )
        .withColumnRenamed("id", "doc_id")
    )
    docs.persist()
    print(f"docs rows: {docs.count():,}  (~{n_docs // 5000}x the sf0.1 documents table)")
    t0 = time.perf_counter()
    npairs = minhash_near_dupes(docs, threshold=0.8).count()
    print(f"{'minhash near-dup (count)':35s} {time.perf_counter() - t0:7.2f} s   pairs={npairs}")

    from market_insights_app_spark.operators.quality import bigram_logprob

    t("bigram LM score", bigram_logprob(docs))
    from market_insights_app_spark.operators.dedup import decontaminate_bloom

    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    train_docs = docs.filter(F.col("doc_id") % 97 != 0)
    t0 = time.perf_counter()
    nkept = decontaminate_bloom(train_docs, eval_docs, shingle_n=3).count()
    print(
        f"{'bloom decontaminate':35s} {time.perf_counter() - t0:7.2f} s"
        f"   kept={nkept}"
    )
    from market_insights_app_spark.operators.quality import (
        ngram_novelty,
        pmi_collocations,
        quality_funnel,
    )

    t("quality funnel (docs)", quality_funnel(docs))
    t("pmi collocations (docs)", pmi_collocations(docs, min_count=5, k=50))
    t(
        "ngram novelty (docs vs 1/97 ref)",
        ngram_novelty(train_docs, eval_docs, shingle_n=3),
    )

    from market_insights_app_spark.operators.quality import nb_seed_classifier

    # 1/20 of the corpus is labeled seed (label = a deterministic hash
    # bit); the trained broadcast LLR model scores the other 95%
    seeds = docs.filter(F.col("doc_id") % 20 == 0).select(
        "text", (F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0).alias("is_pos")
    )
    t(
        "NB seed classifier (95% scored)",
        nb_seed_classifier(docs.filter(F.col("doc_id") % 20 != 0), seeds,
                           label_col="is_pos"),
    )
    docs.unpersist()

    # --- synthetic embeddings: n_vecs × dim 64, web-scale k ----------------
    # Exercises the LARGE_K broadcast-numpy assignment path (the literal-
    # expression path is planner-bound past k ≈ a few hundred) and the
    # SemDeDup end-to-end pipeline at k ≈ √n-and-beyond.
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    from market_insights_app_spark.operators.clustering import kmeans_assign
    from market_insights_app_spark.operators.similarity import semdedup

    vecs = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id") * 100 + i), F.lit(2001)) - 1000
            )
            / 1000.0,
        ).alias("embedding"),
    )
    vecs.persist()
    print(f"vecs rows: {vecs.count():,}  dim=64")
    t0 = time.perf_counter()
    kmeans_assign(vecs, k=1000, iters=2).write.mode("overwrite").format("noop").save()
    print(f"{'kmeans k=1000 iters=2 (1M vecs)':35s} {time.perf_counter() - t0:7.2f} s")
    t0 = time.perf_counter()
    nsurv = semdedup(vecs, k=10_000, iters=1, threshold=0.999).count()
    print(
        f"{'semdedup k=10000 (1M vecs)':35s} {time.perf_counter() - t0:7.2f} s"
        f"   survivors={nsurv}"
    )
    vecs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
