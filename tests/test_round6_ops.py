"""Round-6 operator semantics: returns/Sharpe/beta, transition matrix,
z-score anomalies, key-skew report, per-group sampling, token entropy,
byte-domain frame sampling."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def _ts(day, sec=0):
    return dt.datetime(2024, 1, day, 0, 0, sec)


# ---------------------------------------------------------------------------
# daily_returns / sharpe_ratio / beta_vs_benchmark
# ---------------------------------------------------------------------------


def test_daily_returns_close_and_lag(spark):
    from market_insights_app_spark.operators.market import daily_returns

    rows = [
        # day 1: two ticks — close is the later (ts, id) one
        (1, _ts(1, 1), 1, 100.0),
        (1, _ts(1, 2), 2, 110.0),
        (1, _ts(2, 1), 3, 121.0),
        (2, _ts(1, 1), 4, 50.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    got = {
        (r["k"], r["d"].day): (r["close"], r["ret"])
        for r in daily_returns(df).collect()
    }
    assert got[(1, 1)][0] == 110.0 and got[(1, 1)][1] is None
    assert got[(1, 2)][0] == 121.0
    assert got[(1, 2)][1] == pytest.approx(0.1)
    assert got[(2, 1)] == (50.0, None)


def test_sharpe_zero_variance_is_null(spark):
    from market_insights_app_spark.operators.market import (
        daily_returns,
        sharpe_ratio,
    )

    # constant +10%/day: the integer fixed-point sufficient statistics
    # make the zero variance EXACT (s2 == s1²/n in representable
    # doubles) -> vol is exactly 0.0 and sharpe is NULL (var not > 0)
    rows = [
        (1, _ts(d), d, 100.0 * (1.1 ** (d - 1))) for d in range(1, 6)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = sharpe_ratio(daily_returns(df)).collect()[0]
    assert r["n_days"] == 4
    assert float(r["mean_ret"]) == pytest.approx(0.1, abs=1e-9)
    assert r["sharpe"] is None
    assert r["vol"] == 0.0


def test_sharpe_known_value(spark):
    from market_insights_app_spark.operators.market import (
        daily_returns,
        sharpe_ratio,
    )

    # closes 100, 110, 99, 108.9 -> returns +.1, -.1, +.1
    closes = [100.0, 110.0, 99.0, 108.9]
    rows = [(1, _ts(d + 1), d, c) for d, c in enumerate(closes)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = sharpe_ratio(daily_returns(df)).collect()[0]
    rets = [0.1, -0.1, 0.1]
    m = sum(rets) / 3
    var = sum((x - m) ** 2 for x in rets) / 2
    assert r["mean_ret"] == pytest.approx(m, abs=1e-8)
    assert r["sharpe"] == pytest.approx(
        m / math.sqrt(var) * math.sqrt(252), abs=1e-4
    )


def test_beta_identical_series_is_one(spark):
    from market_insights_app_spark.operators.market import (
        beta_vs_benchmark,
        daily_returns,
    )

    closes = [100.0, 105.0, 99.0, 107.0, 101.0]
    rows = [
        (u, _ts(d + 1), d * 10 + u, c)
        for u in (1, 2)
        for d, c in enumerate(closes)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r["k"]: r for r in beta_vs_benchmark(daily_returns(df)).collect()}
    # both series equal the market exactly -> beta 1, alpha 0
    for u in (1, 2):
        assert out[u]["beta"] == pytest.approx(1.0, abs=1e-6)
        assert float(out[u]["alpha"]) == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# transition_matrix
# ---------------------------------------------------------------------------


def test_transition_matrix_counts_and_probs(spark):
    from market_insights_app_spark.operators.windows import transition_matrix

    # user 1: A->B->A->B ; user 2: A->B  => A->B: 3, B->A: 1
    rows = [
        (1, _ts(1, i), i, s)
        for i, s in enumerate(["A", "B", "A", "B"])
    ] + [(2, _ts(1, i), 10 + i, s) for i, s in enumerate(["A", "B"])]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "state"])
    got = {
        (r["prev_state"], r["next_state"]): (r["n"], r["p"])
        for r in transition_matrix(df, ["user_id"], "state").collect()
    }
    assert got[("A", "B")] == (3, 1.0)
    assert got[("B", "A")] == (1, 1.0)
    assert len(got) == 2


def test_transition_matrix_row_normalizes(spark):
    from market_insights_app_spark.operators.windows import transition_matrix

    rows = [
        (1, _ts(1, i), i, s)
        for i, s in enumerate(["A", "B", "A", "C", "A", "B", "A", "B"])
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "state"])
    out = transition_matrix(df, ["user_id"], "state").collect()
    from collections import defaultdict

    by_prev = defaultdict(float)
    for r in out:
        by_prev[r["prev_state"]] += r["p"]
    for prev, total in by_prev.items():
        assert total == pytest.approx(1.0), prev
    got = {(r["prev_state"], r["next_state"]): r for r in out}
    assert got[("A", "B")]["n"] == 3 and got[("A", "B")]["p"] == pytest.approx(
        0.75
    )
    assert got[("A", "C")]["p"] == pytest.approx(0.25)


# ---------------------------------------------------------------------------
# rolling_zscore_anomalies
# ---------------------------------------------------------------------------


def test_zscore_flags_spike_not_baseline(spark):
    from market_insights_app_spark.operators.windows import (
        rolling_zscore_anomalies,
    )

    vals = [10.0, 11.0] * 12 + [50.0] + [10.0, 11.0] * 2
    rows = [(1, _ts(1, i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = rolling_zscore_anomalies(df, ["user_id"], n=20, threshold=3.0)
    flagged = [r["event_id"] for r in out.filter("is_anomaly").collect()]
    assert flagged == [24]  # only the spike
    # warm-up rows have NULL z and never flag
    rows_out = {r["event_id"]: r for r in out.collect()}
    for i in range(20):
        assert rows_out[i]["z"] is None
        assert rows_out[i]["is_anomaly"] is False


def test_zscore_excludes_current_row_from_baseline(spark):
    from market_insights_app_spark.operators.windows import (
        rolling_zscore_anomalies,
    )

    # 21st value identical to baseline -> z == 0 exactly (would be
    # diluted if the current row leaked into its own window)
    vals = [5.0, 7.0] * 10 + [6.0]
    rows = [(1, _ts(1, i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    r = (
        rolling_zscore_anomalies(df, ["user_id"], n=20)
        .filter("event_id = 20")
        .collect()[0]
    )
    assert r["z"] == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# key_skew
# ---------------------------------------------------------------------------


def test_key_skew_ranks_and_shares(spark):
    from market_insights_app_spark.operators.profiling import key_skew

    rows = (
        [("hot", i) for i in range(60)]
        + [("warm", i) for i in range(30)]
        + [("cold", i) for i in range(10)]
    )
    df = spark.createDataFrame(rows, ["k", "i"])
    out = key_skew(df, ["k"], top_n=2).orderBy("rank").collect()
    assert [(r["rank"], r["k"], r["n_rows"]) for r in out] == [
        (1, "hot", 60),
        (2, "warm", 30),
    ]
    assert out[0]["share"] == pytest.approx(0.6)
    assert out[0]["cum_share"] == pytest.approx(0.6)
    assert out[1]["cum_share"] == pytest.approx(0.9)
    assert out[0]["n_keys_total"] == 3


# ---------------------------------------------------------------------------
# sample_n_per_group
# ---------------------------------------------------------------------------


def test_sample_n_per_group_quota_and_determinism(spark):
    from market_insights_app_spark.operators.sampling import sample_n_per_group

    rows = [(f"g{j}", i) for j in range(3) for i in range(j * 40, j * 40 + 25)]
    df = spark.createDataFrame(rows, ["g", "doc_id"])
    out = sample_n_per_group(df, ["g"], 10, id_col="doc_id")
    sizes = {
        r["g"]: r["n"]
        for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert sizes == {"g0": 10, "g1": 10, "g2": 10}
    a = sorted((r["g"], r["doc_id"]) for r in out.collect())
    b = sorted(
        (r["g"], r["doc_id"])
        for r in sample_n_per_group(df, ["g"], 10, id_col="doc_id").collect()
    )
    assert a == b  # deterministic
    # undersized groups pass through whole
    small = spark.createDataFrame([("s", 1), ("s", 2)], ["g", "doc_id"])
    assert sample_n_per_group(small, ["g"], 10, id_col="doc_id").count() == 2


def test_sample_n_per_group_is_nested_under_larger_n(spark):
    """Growing the quota only ADDS rows (hash-order prefix property)."""
    from market_insights_app_spark.operators.sampling import sample_n_per_group

    rows = [("g", i) for i in range(50)]
    df = spark.createDataFrame(rows, ["g", "doc_id"])
    s5 = {r["doc_id"] for r in sample_n_per_group(df, ["g"], 5).collect()}
    s15 = {r["doc_id"] for r in sample_n_per_group(df, ["g"], 15).collect()}
    assert s5 < s15


# ---------------------------------------------------------------------------
# token_entropy
# ---------------------------------------------------------------------------


def test_token_entropy_golden_values(spark):
    from market_insights_app_spark.operators.quality import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # zero entropy, norm NULL
            (2, "a b"),              # ln 2, norm 1
            (3, "a a b"),            # -(2/3 ln 2/3 + 1/3 ln 1/3)
            (4, "   "),              # no tokens -> no row
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["entropy"] == 0.0 and got[1]["norm_entropy"] is None
    assert got[1]["n_tokens"] == 4 and got[1]["n_types"] == 1
    assert got[2]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert got[2]["norm_entropy"] == pytest.approx(1.0)
    expect3 = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert got[3]["entropy"] == pytest.approx(expect3, abs=1e-6)
    assert got[3]["norm_entropy"] == pytest.approx(
        expect3 / math.log(2), abs=1e-6
    )


# ---------------------------------------------------------------------------
# sample_frame_bytes
# ---------------------------------------------------------------------------


def test_frame_sample_stride_and_means(spark):
    from market_insights_app_spark.operators.multimodal import (
        sample_frame_bytes,
    )

    fs = 4 * 4 * 3  # 48
    payload = bytes(range(0, 240)) + b"\x05" * 10  # 5 frames + tail junk
    media = spark.createDataFrame(
        [(1, "video", payload)], "media_id long, kind string, payload binary"
    )
    out = sample_frame_bytes(media, 4, 4, every_n=2).orderBy("frame_idx")
    rows = out.collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert all(r["n_frames"] == 5 for r in rows)
    # frame i holds bytes 48i..48i+47 -> mean = 48i + 23.5
    for r in rows:
        assert r["frame_mean"] == pytest.approx(48 * r["frame_idx"] + 23.5)


def test_frame_sample_short_payload_emits_nothing(spark):
    from market_insights_app_spark.operators.multimodal import (
        sample_frame_bytes,
    )

    media = spark.createDataFrame(
        [(1, "video", b"\x01" * 47), (2, "video", None)],
        "media_id long, kind string, payload binary",
    )
    assert sample_frame_bytes(media, 4, 4).count() == 0


# ---------------------------------------------------------------------------
# rolling_market_corr
# ---------------------------------------------------------------------------


def test_rolling_corr_perfect_when_series_is_market_multiple(spark):
    from market_insights_app_spark.operators.market import (
        daily_returns,
        rolling_market_corr,
    )

    # two series with proportional (but non-constant) daily returns:
    # the equal-weight market is proportional to both -> corr == 1
    closes = [100.0, 105.0, 99.0, 108.0, 102.0, 111.0]
    rows = []
    for d, c in enumerate(closes):
        rows.append((1, _ts(d + 1), d * 10 + 1, c))
        rows.append((2, _ts(d + 1), d * 10 + 2, 2.0 * c))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = rolling_market_corr(daily_returns(df), n=3).collect()
    vals = [r["roll_corr"] for r in out if r["roll_corr"] is not None]
    assert len(vals) == 6  # (5 ret days - 2 warmup) x 2 series
    assert all(v == pytest.approx(1.0, abs=1e-6) for v in vals)


def test_rolling_corr_warmup_is_null(spark):
    from market_insights_app_spark.operators.market import (
        daily_returns,
        rolling_market_corr,
    )

    closes = [100.0, 105.0, 99.0, 108.0]
    rows = [
        (u, _ts(d + 1), d * 10 + u, c * u)
        for u in (1, 2)
        for d, c in enumerate(closes)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = rolling_market_corr(daily_returns(df), n=3).orderBy(
        "k", "d"
    ).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["k"], []).append(r["roll_corr"])
    for _u, vals in per_user.items():
        assert vals[0] is None and vals[1] is None  # warm-up
        assert vals[2] is not None


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_golden(spark):
    from market_insights_app_spark.operators.quality import ngram_novelty

    ref = spark.createDataFrame([(0, "a b c d e")], ["doc_id", "text"])
    train = spark.createDataFrame(
        [
            (1, "a b c x y z"),  # 4 distinct trigrams, 1 shared -> 3/4
            (2, "b c d e"),      # both trigrams in ref -> 0.0
            (3, "hi there"),     # too short for a trigram -> no row
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in ngram_novelty(train, ref).collect()}
    assert set(got) == {1, 2}
    assert (got[1]["n_grams"], got[1]["n_novel"]) == (4, 3)
    assert got[1]["novelty"] == pytest.approx(0.75)
    assert (got[2]["n_grams"], got[2]["n_novel"]) == (2, 0)
    assert got[2]["novelty"] == 0.0


# ---------------------------------------------------------------------------
# var_cvar
# ---------------------------------------------------------------------------


def test_var_cvar_golden(spark):
    from market_insights_app_spark.operators.market import var_cvar

    # ten returns on the 1e-9 grid; alpha=0.2 -> k=2 smallest
    rets = [-0.10, -0.02, 0.01, 0.02, 0.03, 0.04, 0.05, 0.06, 0.07, 0.08]
    rows = [(1, _ts(i + 1), r) for i, r in enumerate(rets)]
    df = spark.createDataFrame(rows, "k long, d timestamp, r double").select(
        "k", "d", F.col("r").cast("decimal(13,9)").alias("ret_d")
    )
    out = var_cvar(df, alpha=0.2).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["n_days"], row["tail_n"]) == (10, 2)
    assert row["var_a"] == pytest.approx(-0.02)
    assert row["cvar_a"] == pytest.approx(-0.06)


def test_var_cvar_null_returns_excluded(spark):
    from market_insights_app_spark.operators.market import var_cvar

    rows = [(1, _ts(1), None), (1, _ts(2), -0.05), (1, _ts(3), 0.01)]
    df = spark.createDataFrame(rows, "k long, d timestamp, r double").select(
        "k", "d", F.col("r").cast("decimal(13,9)").alias("ret_d")
    )
    row = var_cvar(df, alpha=0.5).collect()[0]
    assert row["n_days"] == 2  # the NULL first-day return never counts
    assert row["var_a"] == pytest.approx(-0.05)


# ---------------------------------------------------------------------------
# quality_funnel
# ---------------------------------------------------------------------------


def test_quality_funnel_cascade_counts(spark):
    from market_insights_app_spark.operators.quality import quality_funnel

    mk = lambda toks: " ".join(toks)  # noqa: E731
    docs = [
        # passes wc/len/stopword rules: 30 tokens, mean len 4.37
        (1, mk(["the", "scan", "that", "vector"] * 7 + ["queries", "lines"])),
        # fails word-count (too short)
        (2, "tiny doc"),
        # passes wc, fails mean-word-len (all 2-char tokens)
        (3, mk(["ab"] * 30)),
        # passes wc + len (mean 4.5), fails stopword floor (none)
        (4, mk(["scan", "vector", "line", "data"] * 8)),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {r["rule"]: r for r in quality_funnel(df).collect()}
    assert out["total"]["survivors"] == 4
    assert out["word_count"]["survivors"] == 3
    assert out["word_count"]["dropped"] == 1
    assert out["mean_word_len"]["survivors"] == 2
    assert out["stopword_ratio"]["survivors"] == 1
    assert out["distinct_ratio"]["survivors"] <= 1
    # survivors are monotone non-increasing down the cascade
    order = ["total", "word_count", "mean_word_len", "stopword_ratio",
             "distinct_ratio"]
    surv = [out[n]["survivors"] for n in order]
    assert surv == sorted(surv, reverse=True)
    # dropped reconciles pairwise
    for hi, lo in zip(order, order[1:]):
        assert out[lo]["dropped"] == out[hi]["survivors"] - out[lo]["survivors"]


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


def test_pmi_collocations_golden(spark):
    import math

    from market_insights_app_spark.operators.quality import pmi_collocations

    # "a b" always collocates; "c" floats freely
    docs = [(i, "a b c a b") for i in range(5)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = pmi_collocations(df, min_count=5, k=10).collect()
    got = {(r["w1"], r["w2"]): r for r in out}
    # per doc: bigrams = (a,b) (b,c) (c,a) (a,b) -> 4 per doc, 20 total
    ab = got[("a", "b")]
    assert (ab["c_xy"], ab["c1"], ab["c2"]) == (10, 10, 10)
    # PMI(a,b) = ln(10*20/(10*10)) = ln 2
    assert ab["pmi"] == pytest.approx(round(math.log(2.0), 6))
    # the strongest collocation ranks first
    assert (out[0]["w1"], out[0]["w2"]) == ("a", "b")


def test_pmi_min_count_filters(spark):
    from market_insights_app_spark.operators.quality import pmi_collocations

    docs = [(1, "x y"), (2, "p q p q p q p q p q p q")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = pmi_collocations(df, min_count=5, k=10).collect()
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("x", "y") not in pairs  # count 1 < 5
    assert ("p", "q") in pairs


def test_daily_returns_grid_overflow_nulls_not_errors(spark):
    """A >=10^6%-in-a-day move cannot live on the DECIMAL(13,9) grid:
    the grid return must NULL out (ANSI-safe), never error the job —
    found by the 10M-row scale probe."""
    from market_insights_app_spark.operators.market import daily_returns

    rows = [
        (1, _ts(1), 1, 0.01),       # prev close
        (1, _ts(2), 2, 120_000.0),  # ret = 11_999_999 -> off-grid
        (1, _ts(3), 3, 120_001.2),  # ret = 1e-5 -> on-grid
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "value"])
    out = {r["d"].day: r for r in daily_returns(df).collect()}
    assert out[2]["ret_d"] is None           # guarded, not crashed
    assert out[2]["ret"] == pytest.approx(11_999_999.0)  # raw survives
    assert out[3]["ret_d"] is not None


def test_quality_funnel_empty_corpus_reports_zeros(spark):
    from market_insights_app_spark.operators.quality import quality_funnel

    df = spark.createDataFrame([], "doc_id long, text string")
    out = {r["rule"]: r for r in quality_funnel(df).collect()}
    assert len(out) == 5
    assert all(r["survivors"] == 0 and r["dropped"] == 0 for r in out.values())
