"""Golden tests for the bigram LM score and the CCNet perplexity
tiers (operators/quality.bigram_logprob / perplexity_buckets)."""

from __future__ import annotations

import math

import pytest

from market_insights_app_spark.operators.quality import (
    bigram_logprob,
    perplexity_buckets,
)


def test_bigram_logprob_golden(spark):
    # corpus: c("a b")=3, c("b a")=1, contexts c1(a)=3 c1(b)=1, V=3 (a,b,c)
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in bigram_logprob(docs).collect()}
    # P(b|a) = (3+1)/(3+3) = 2/3 ; P(a|b) = (1+1)/(1+3) = 1/2
    lp_ab, lp_ba = math.log(2 / 3), math.log(1 / 2)
    assert got[1].n_bigrams == 3
    assert got[1].avg_logprob == pytest.approx((2 * lp_ab + lp_ba) / 3, abs=1e-6)
    assert got[2].n_bigrams == 1
    assert got[2].avg_logprob == pytest.approx(lp_ab, abs=1e-6)
    assert got[2].ppl == pytest.approx(1.5, abs=1e-4)
    # single-token doc has no bigrams -> absent (caller re-joins unscored)
    assert 3 not in got


def test_bigram_logprob_case_folds(spark):
    docs = spark.createDataFrame([(1, "A b"), (2, "a B")], ["doc_id", "text"])
    rows = bigram_logprob(docs).collect()
    # both docs collapse to the same bigram "a b" with c12=2
    assert len({r.avg_logprob for r in rows}) == 1


def test_perplexity_buckets_tiers(spark):
    # one language, six docs built from tokens of strictly decreasing
    # corpus frequency -> strictly ordered unigram scores
    texts = [
        "the the the",   # most typical
        "the the of",
        "the of of",
        "of of rare1",
        "rare1 rare2 rare3",
        "rare4 rare5 rare6",  # least typical
    ]
    docs = spark.createDataFrame(
        [(i + 1, t, "en") for i, t in enumerate(texts)],
        ["doc_id", "text", "lang"],
    )
    out = perplexity_buckets(docs).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert {b: len(v) for b, v in by_bucket.items()} == {
        "head": 2, "middle": 2, "tail": 2
    }
    # tiers must respect the score order: every head score >= every
    # middle score >= every tail score
    lo = lambda b: min(r.avg_logprob for r in by_bucket[b])
    hi = lambda b: max(r.avg_logprob for r in by_bucket[b])
    assert lo("head") >= hi("middle") >= lo("middle") >= hi("tail")


def test_perplexity_buckets_per_lang_independent(spark):
    # 3 docs per lang -> exactly one doc in each tier per lang
    rows = []
    for lang in ("en", "fr"):
        rows += [
            (hash(lang) % 100 * 10 + i, t, lang)
            for i, t in enumerate(["w w w", "w w x", "y z q"])
        ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = perplexity_buckets(docs).collect()
    for lang in ("en", "fr"):
        buckets = sorted(r.bucket for r in out if r.lang == lang)
        assert buckets == ["head", "middle", "tail"]
