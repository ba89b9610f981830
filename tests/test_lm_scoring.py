"""Golden tests for the bigram LM score and the CCNet perplexity
tiers (operators/quality.bigram_logprob / perplexity_buckets)."""

from __future__ import annotations

import math

import pytest

from tests.conftest import SF_ORACLE

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


# --- seed-set Naive Bayes classifier (operators/quality.nb_seed_classifier) --


def test_nb_seed_classifier_golden(spark):
    """Hand-computed Laplace NB log-odds on a 2-doc seed set."""
    from market_insights_app_spark.operators.quality import nb_seed_classifier

    seeds = spark.createDataFrame(
        [("good good fine", True), ("bad bad awful", False)],
        ["text", "is_positive"],
    )
    corpus = spark.createDataFrame(
        [(1, "good fine"), (2, "bad awful"), (3, "unseen")],
        ["doc_id", "text"],
    )
    # N_pos=3, N_neg=3, V=4; prior = ln(2/2) = 0
    def llr(cp, cn):
        return math.log((cp + 1) / (3 + 4)) - math.log((cn + 1) / (3 + 4))

    exp = {
        1: llr(2, 0) + llr(1, 0),           # good, fine
        2: llr(0, 2) + llr(0, 1),           # bad, awful
        3: llr(0, 0),                        # OOV token
    }
    got = {r.doc_id: r for r in nb_seed_classifier(corpus, seeds).collect()}
    for d, e in exp.items():
        assert got[d].nb_score == pytest.approx(e, abs=1e-6)
    assert got[1].keep and not got[2].keep
    assert got[3].nb_score == pytest.approx(0.0, abs=1e-9)  # symmetric OOV
    assert got[1].n_tokens == 2 and got[3].n_tokens == 1


def test_nb_seed_classifier_empty_doc_drops(spark):
    from market_insights_app_spark.operators.quality import nb_seed_classifier

    seeds = spark.createDataFrame([("x", True), ("y", False)], ["text", "is_positive"])
    corpus = spark.createDataFrame([(1, "   "), (2, "x")], ["doc_id", "text"])
    ids = [r.doc_id for r in nb_seed_classifier(corpus, seeds).collect()]
    assert ids == [2]


def test_nb_quality_staged_parity(spark, duck):
    """Direct Spark<->DuckDB parity for the nb_quality pair
    (plans/textml.q_nb_quality, registered r8) — the local twin of
    its driver gate."""
    from market_insights_app_spark.plans.textml import (
        TEXTML_ORACLES,
        q_nb_quality,
    )
    from tests.test_oracle_parity import canon

    sdf = q_nb_quality(spark, SF_ORACLE)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(TEXTML_ORACLES["nb_quality"])
    drows = rel.fetchall()
    dcols = [d[0] for d in rel.description]
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert canon(srows, sdf.columns) == canon(drows, dcols)
    # driver type hygiene, ahead of registration
    for col, typ in zip(rel.columns, rel.types):
        assert str(typ) in {"BIGINT", "DOUBLE", "BOOLEAN"}, (col, str(typ))
