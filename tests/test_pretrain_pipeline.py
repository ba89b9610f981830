"""End-to-end pretraining-corpus pipeline (pipelines/pretrain_corpus):
integration invariants + composition determinism under a different
parallelism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_insights_app_spark.pipelines.pretrain_corpus import (
    build_pretraining_corpus,
)
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def built(spark):
    out = build_pretraining_corpus(spark, SF_ORACLE)
    corpus = out["corpus"].collect()
    manifest = sorted(tuple(r) for r in out["manifest"].collect())
    eval_ids = {r.doc_id for r in out["eval_set"].select("doc_id").collect()}
    return corpus, manifest, eval_ids


def test_pipeline_structural_invariants(spark, built):
    corpus, manifest, eval_ids = built
    assert len(corpus) > 0
    ids = [r.doc_id for r in corpus]
    assert len(ids) == len(set(ids))  # no duplicate ids survive
    assert not (set(ids) & eval_ids)  # eval slice never leaks in
    assert {r.split for r in corpus} <= {"train", "val"}
    assert all(0 <= r.shard < 8 for r in corpus)
    # per-shard positions are a contiguous 1..n ranking
    by_shard: dict[int, list[int]] = {}
    for r in corpus:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # manifest covers exactly the splits with matching row counts
    split_counts = {s: sum(1 for r in corpus if r.split == s) for s in
                    {r.split for r in corpus}}
    assert {m[0]: m[1] for m in manifest} == split_counts
    # distinct-id tripwire agrees (no dups -> equal counts)
    assert all(m[1] == m[2] for m in manifest)


def test_pipeline_decontamination_holds(spark, built):
    """No surviving corpus doc shares a 3-gram with the eval set —
    recomputed independently over the pipeline output."""
    corpus, _, eval_ids = built
    from market_insights_app_spark.functions.text import word_shingles

    docs = spark.createDataFrame(
        [(r.doc_id, r.text) for r in corpus], ["doc_id", "text"]
    )
    ev = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").filter(
        F.col("doc_id").isin([int(i) for i in eval_ids])
    )
    overlap = (
        docs.select(F.explode(word_shingles("text", 3)).alias("g"))
        .join(
            ev.select(F.explode(word_shingles("text", 3)).alias("g")).distinct(),
            "g",
        )
        .count()
    )
    assert overlap == 0


def test_pipeline_composition_deterministic_across_parallelism(spark, built):
    """Same inputs -> bit-identical manifest under a different shuffle
    partitioning (the composition inherits every stage's determinism)."""
    _, manifest, _ = built
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = sorted(
            tuple(r)
            for r in build_pretraining_corpus(spark, SF_ORACLE)["manifest"].collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert again == manifest
