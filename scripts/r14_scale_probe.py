"""r14 scale probes (r13 verdict #5: make scale-term claims
falsifiable): drive this round's restructured operators one to two
orders of magnitude above the sf0.1 bench on synthetic in-memory data,
NEW shape vs the OLD shape (loaded verbatim from git history into a
scratch namespace), best-of-2 each, same session.  Records go to
SCALE_NOTES.md by hand.

    python scripts/r14_scale_probe.py [pairwise|bloom|tokenize] ...
    (no args = all)
"""

from __future__ import annotations

import subprocess
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from market_insights_app_spark.session import get_spark  # noqa: E402


def old_module(path: str, ref: str, template_module):
    """Exec an old revision of a module file into a copy of the current
    module's namespace (same trick as the r14 in-session A/Bs)."""
    src = subprocess.run(
        ["git", "show", f"{ref}:{path}"], capture_output=True, text=True
    ).stdout
    ns = dict(template_module.__dict__)
    exec(compile(src, f"{path}@{ref}", "exec"), ns)
    return ns


def bestof(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def synth_ticks(spark, n, keys=500):
    return (
        spark.range(n)
        .select(
            (F.col("id") % keys).alias("user_id"),
            (
                F.timestamp_seconds(
                    F.lit(1700000000) + (F.col("id") % 864000) / 10
                )
            ).alias("ts"),
            ((F.col("id") * 37 % 1000) / 100.0).alias("value"),
            F.col("id").alias("event_id"),
        )
        .localCheckpoint()
    )


def synth_docs(spark, n, words=2000, doc_words=80):
    w = F.concat(F.lit("w"), ((F.col("i") * 2654435761) % words).cast("string"))
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(doc_words - 1)),
                    lambda i: F.concat(
                        F.lit("w"),
                        (
                            (F.col("id") * 131 + i * 2654435761) % words
                        ).cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .localCheckpoint()
    )


def probe_pairwise(spark):
    import market_insights_app_spark.operators.market as M

    ticks = synth_ticks(spark, 10_000_000, keys=500)
    old = old_module(
        "market_insights_app_spark/operators/market.py", "b6124a0", M
    )
    new_s = bestof(
        lambda: M.pairwise_corr_dense(ticks)
        .write.mode("overwrite").format("noop").save()
    )
    old_s = bestof(
        lambda: old["pairwise_corr_dense"](ticks)
        .write.mode("overwrite").format("noop").save()
    )
    print(f"pairwise_corr_dense 10M ticks/500 keys: "
          f"new {new_s:.2f}s old(ckpt+2 joins) {old_s:.2f}s")


def probe_bloom(spark):
    import market_insights_app_spark.operators.dedup as D

    docs = synth_docs(spark, 300_000)
    eval_set = docs.filter(F.col("doc_id") % 89 == 0)
    train = docs.filter(F.col("doc_id") % 89 != 0)
    old = old_module(
        "market_insights_app_spark/operators/dedup.py", "1700343^", D
    )
    new_s = bestof(
        lambda: D.decontaminate_bloom(train, eval_set, shingle_n=4)
        .write.mode("overwrite").format("noop").save()
    )
    old_s = bestof(
        lambda: old["decontaminate_bloom"](train, eval_set, shingle_n=4)
        .write.mode("overwrite").format("noop").save()
    )
    print(f"decontaminate_bloom 300k docs (3.4k eval): "
          f"new(JVM pair) {new_s:.2f}s old(Python build+probe) {old_s:.2f}s")


def probe_tokenize(spark):
    from market_insights_app_spark.functions.text import (
        norm_tokens,
        normalize_text,
        tokens,
    )

    docs = synth_docs(spark, 500_000)
    new_s = bestof(
        lambda: docs.select(norm_tokens("text").alias("t"))
        .write.mode("overwrite").format("noop").save()
    )
    old_s = bestof(
        lambda: docs.select(tokens(normalize_text("text")).alias("t"))
        .write.mode("overwrite").format("noop").save()
    )
    print(f"tokenize 500k docs x80 words: norm_tokens {new_s:.2f}s "
          f"tokens(normalize_text) {old_s:.2f}s")


def main() -> None:
    which = sys.argv[1:] or ["pairwise", "bloom", "tokenize"]
    spark = get_spark(app_name="r14-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for name in which:
        spark.sparkContext.setJobDescription(f"r14-scale-probe:{name}")
        {"pairwise": probe_pairwise,
         "bloom": probe_bloom,
         "tokenize": probe_tokenize}[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
