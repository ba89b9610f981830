"""Distributed BPE tokenizer training and application.

Byte-pair-encoding subword training (Sennrich et al. 2016, ACL —
"Neural Machine Translation of Rare Words with Subword Units") is the
tokenizer-construction step of an LLM data pipeline.  The classic
algorithm is a sequential loop, but each iteration's work is two
corpus-free relational passes, which is what makes it Spark-shaped:

1. the corpus collapses ONCE into a frequency-weighted distinct-word
   table (the only corpus-sized shuffle — everything after runs on the
   vocabulary, which is orders of magnitude smaller than the corpus);
2. per merge iteration: adjacent-symbol pairs explode out of the
   vocabulary, one map-side-combinable groupBy ranks them, the single
   best pair comes back to the driver (one row — the same bounded
   driver scalar as a k-means centroid), and an ``F.aggregate`` fold
   rewrites every word's symbol array JVM-side (no Python in the
   loop).

Determinism: all counts are exact longs; the best pair is chosen by
(count DESC, left ASC, right ASC) — a total order, no floats anywhere,
so training is bit-identical across engines, partitionings and
cluster sizes.

``apply_bpe`` segments a corpus with a trained merge table via
``mapInPandas`` (the merge list is a broadcast dict; per-word results
are memoized within each Arrow batch) — the sanctioned custom-op shape
for logic a relational plan cannot express (the greedy lowest-rank
merge loop is inherently per-word sequential).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from market_insights_app_spark.functions.text import tokens

_CHECKPOINT_EVERY = 8  # cut the nested-aggregate lineage periodically


def _merge_pair_in_array(syms: Column, left: str, right: str) -> Column:
    """Replace every non-overlapping left-to-right (left, right)
    adjacency in a symbol array with the concatenated symbol — one
    JVM-side ``aggregate`` fold, no UDF.  The accumulator carries the
    emitted prefix plus one pending symbol; emitting a merged symbol
    clears the pending slot, so an emitted merge can never re-enter
    the SAME pass (the non-overlapping contract)."""
    merged = left + right
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc: Column, x: Column) -> Column:
        hit = (
            acc.getField("pend").isNotNull()
            & (acc.getField("pend") == F.lit(left))
            & (x == F.lit(right))
        )
        out = F.when(
            hit, F.concat(acc.getField("out"), F.array(F.lit(merged)))
        ).otherwise(
            F.when(
                acc.getField("pend").isNotNull(),
                F.concat(acc.getField("out"), F.array(acc.getField("pend"))),
            ).otherwise(acc.getField("out"))
        )
        pend = F.when(hit, F.lit(None).cast("string")).otherwise(x)
        return F.struct(out.alias("out"), pend.alias("pend"))

    def fin(acc: Column) -> Column:
        return F.when(
            acc.getField("pend").isNotNull(),
            F.concat(acc.getField("out"), F.array(acc.getField("pend"))),
        ).otherwise(acc.getField("out"))

    return F.aggregate(syms, init, step, fin)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges from a corpus; returns the
    ordered merge table ``[(left, right, pair_count), ...]`` (rank =
    list position).  Stops early when no adjacent pair reaches
    ``min_count`` occurrences.

    Scale shape: one corpus shuffle builds the (word, freq) table;
    every iteration after that explodes pairs out of the VOCABULARY
    (pair count ≤ total distinct-word characters), aggregates
    map-side, and collects exactly one row.  The symbol-array rewrite
    is a whole-stage-codegen ``aggregate`` fold; lineage is cut with a
    localCheckpoint every few merges so the plan never grows
    superlinearly (the k-means / connected-components pattern)."""
    spark = df.sparkSession
    vocab = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split("w", "").alias("syms"), "freq")
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for rank in range(n_merges):
        n = F.size("syms")
        pairs = vocab.select(
            F.explode(
                F.zip_with(
                    F.slice("syms", 1, F.greatest(n - 1, F.lit(0))),
                    F.slice("syms", 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p"),
            "freq",
        )
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0].c < min_count:
            break
        l, r, c = best[0].l, best[0].r, int(best[0].c)
        merges.append((l, r, c))
        vocab = vocab.withColumn("syms", _merge_pair_in_array(F.col("syms"), l, r))
        if (rank + 1) % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint()
    return merges


def _segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank BPE segmentation of one word (the standard
    apply loop): repeatedly merge ALL non-overlapping occurrences of
    the present pair with the smallest training rank."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_pair = rk, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        l, r = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def apply_bpe(
    df: DataFrame,
    merges: Iterable[tuple[str, str, int]] | Iterable[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Segment every document with a trained merge table: output is
    (id, n_tokens, out_col = array of subword strings, in whitespace-
    token order).  Arrow-batched ``mapInPandas``; the rank dict is
    closure-captured (broadcast with the task) and per-word results
    are memoized within each batch — crawl text repeats words heavily,
    so the amortized cost per row is a dict lookup."""
    import pandas as pd  # noqa: F401 (documented dependency of the lane)

    ranks = {(l, r): i for i, (l, r, *_rest) in enumerate(merges)}
    out_schema = (
        f"{id_col} long, n_tokens int, {out_col} array<string>"
    )

    import re

    # EXACTLY the training tokenization: Java's default \s is the
    # ASCII class, so the Python side must use re.ASCII (bare
    # str.split() would also split on unicode spaces and desync the
    # two lanes on exotic-whitespace text)
    ws = re.compile(r"\s+", re.ASCII)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            cache: dict[str, list[str]] = {}

            def seg_text(text):
                toks: list[str] = []
                for w in ws.split((text or "").strip()):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = _segment_word(w, ranks)
                        cache[w] = got
                    toks.extend(got)
                return toks

            segs = [seg_text(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_tokens": [len(s) for s in segs],
                    out_col: segs,
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)
