"""Semantics tests for the round-5 continuation extensions:
snapshot reconciliation (operators/reconcile.py), Bloom-prefilter
decontamination (operators/dedup.decontaminate_bloom), and the exact
DECIMAL OLS trend (operators/market.ols_trend). Cross-engine parity
is covered by the driver-gate twins; these pin semantics on
hand-computed fixtures and path-equivalence on real testdata."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from market_insights_app_spark.operators.reconcile import diff_summary, snapshot_diff

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------


@pytest.fixture()
def snaps(spark):
    cols = ["k", "price", "note"]
    old = spark.createDataFrame(
        [
            (1, 10.0, "a"),     # unchanged
            (2, 20.0, "b"),     # changed: price moves
            (3, None, "c"),     # changed: NULL -> value
            (4, 40.0, None),    # unchanged: NULL == NULL (null-safe)
            (5, 50.0, "e"),     # removed
        ],
        cols,
    )
    new = spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, 21.0, "b"),
            (3, 30.0, "c"),
            (4, 40.0, None),
            (6, 60.0, "f"),     # added
        ],
        cols,
    )
    return old, new


def test_snapshot_diff_statuses(snaps):
    old, new = snaps
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ["k"], ["price", "note"]).collect()
    }
    assert got == {2: "changed", 3: "changed", 5: "removed", 6: "added"}


def test_snapshot_diff_null_transitions(snaps):
    """NULL->value is a change; NULL==NULL is not (eqNullSafe)."""
    old, new = snaps
    rows = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], ["price", "note"]).collect()
    }
    assert rows[3]["old_price"] is None and rows[3]["new_price"] == 30.0
    assert 4 not in rows  # NULL note on both sides is unchanged


def test_snapshot_diff_include_unchanged(snaps):
    old, new = snaps
    out = snapshot_diff(old, new, ["k"], ["price"], include_unchanged=True)
    got = {r["k"]: r["status"] for r in out.collect()}
    assert got[1] == "unchanged" and got[4] == "unchanged"
    # every key from either side is present exactly once
    assert sorted(got) == [1, 2, 3, 4, 5, 6]


def test_diff_summary_counts(snaps):
    old, new = snaps
    diff = snapshot_diff(old, new, ["k"], ["price", "note"])
    got = {r["status"]: r["n_rows"] for r in diff_summary(diff, ["k"]).collect()}
    assert got == {"changed": 2, "removed": 1, "added": 1}


# ---------------------------------------------------------------------------
# decontaminate_bloom == decontaminate (no false negatives, confirm
# join kills false positives)
# ---------------------------------------------------------------------------


def test_bloom_matches_exact_path(spark):
    from market_insights_app_spark.operators.dedup import (
        decontaminate,
        decontaminate_bloom,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    eval_set = docs.filter(F.col("doc_id") % 7 == 0)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    exact = {
        r["doc_id"]
        for r in decontaminate(train, eval_set, shingle_n=3).select("doc_id").collect()
    }
    bloom = {
        r["doc_id"]
        for r in decontaminate_bloom(train, eval_set, shingle_n=3)
        .select("doc_id")
        .collect()
    }
    assert bloom == exact


def test_bloom_tiny_filter_still_exact(spark):
    """Deliberately undersized Bloom (2 bits/gram, 1 hash -> high FPR):
    the confirm join must still make the result exact."""
    from market_insights_app_spark.operators.dedup import (
        decontaminate,
        decontaminate_bloom,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    eval_set = docs.filter(F.col("doc_id") % 5 == 0)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    exact = {
        r["doc_id"]
        for r in decontaminate(train, eval_set, shingle_n=2).select("doc_id").collect()
    }
    bloom = {
        r["doc_id"]
        for r in decontaminate_bloom(
            train, eval_set, shingle_n=2, bits_per_gram=2, n_hashes=1
        )
        .select("doc_id")
        .collect()
    }
    assert bloom == exact


def test_bloom_empty_eval_keeps_everything(spark):
    from market_insights_app_spark.operators.dedup import decontaminate_bloom

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    eval_set = docs.filter(F.lit(False))
    assert decontaminate_bloom(docs, eval_set).count() == 20


# ---------------------------------------------------------------------------
# ols_trend
# ---------------------------------------------------------------------------


def test_ols_trend_exact_line(spark):
    """Points exactly on y = 2x + 5 (x in seconds from the origin):
    slope/intercept/R^2 recovered exactly."""
    from market_insights_app_spark.operators.market import ols_trend

    rows = [
        ("a", f"2024-01-01 00:00:{s:02d}", 2.0 * s + 5.0) for s in range(0, 50, 7)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"]).select(
        "event_type",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "value",
    )
    out = ols_trend(df, key_col="event_type").collect()[0]
    assert out["n_obs"] == 8
    assert out["slope_per_s"] == pytest.approx(2.0, abs=1e-9)
    assert out["intercept"] == pytest.approx(5.0, abs=1e-6)
    assert out["r2"] == pytest.approx(1.0, abs=1e-9)


def test_ols_trend_matches_numpy(spark):
    """Noisy series: slope/intercept agree with numpy lstsq to the
    rounding the operator promises."""
    import numpy as np

    from market_insights_app_spark.operators.market import ols_trend

    xs = list(range(0, 3600, 97))
    ys = [round(0.01 * x + 3.0 + ((x * 2654435761) % 100) / 100.0, 2) for x in xs]
    rows = [
        ("k", f"2024-01-01 {x // 3600:02d}:{(x % 3600) // 60:02d}:{x % 60:02d}", y)
        for x, y in zip(xs, ys)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"]).select(
        "event_type",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "value",
    )
    out = ols_trend(df, key_col="event_type").collect()[0]
    slope_np, icept_np = np.polyfit(np.array(xs, dtype=float), np.array(ys), 1)
    assert out["slope_per_s"] == pytest.approx(slope_np, rel=1e-9)
    assert out["intercept"] == pytest.approx(icept_np, rel=1e-6)
    assert 0.0 < out["r2"] < 1.0


def test_ols_trend_degenerate_series(spark):
    """n=1 and zero-time-variance series yield NULL slope/R^2 instead
    of a division blow-up."""
    from market_insights_app_spark.operators.market import ols_trend

    df = spark.createDataFrame(
        [
            ("one", "2024-01-02 00:00:00", 1.0),
            ("flat", "2024-01-03 00:00:00", 1.0),
            ("flat", "2024-01-03 00:00:00", 2.0),
        ],
        ["event_type", "ts", "value"],
    ).select(
        "event_type", F.col("ts").cast("timestamp_ntz").alias("ts"), "value"
    )
    got = {r["event_type"]: r for r in ols_trend(df, key_col="event_type").collect()}
    assert got["one"]["slope_per_s"] is None
    assert got["flat"]["slope_per_s"] is None
    assert got["flat"]["r2"] is None
    assert got["flat"]["n_obs"] == 2


def test_ols_trend_shift_invariant_slope(spark):
    """Moving the origin changes the intercept, never the slope (the
    sufficient-statistics algebra is shift-covariant)."""
    from market_insights_app_spark.operators.market import ols_trend

    rows = [
        ("k", f"2024-01-05 00:{m:02d}:00", 3.0 + 0.5 * m) for m in range(10)
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts", "value"]).select(
        "event_type", F.col("ts").cast("timestamp_ntz").alias("ts"), "value"
    )
    a = ols_trend(df, key_col="event_type", origin="2024-01-01 00:00:00").collect()[0]
    b = ols_trend(df, key_col="event_type", origin="2024-01-05 00:00:00").collect()[0]
    assert a["slope_per_s"] == b["slope_per_s"] == pytest.approx(0.5 / 60, abs=1e-12)
    assert b["intercept"] == pytest.approx(3.0, abs=1e-6)
    assert math.isclose(a["r2"], 1.0)


# ---------------------------------------------------------------------------
# weighted_sample (Efraimidis-Spirakis A-Res)
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_guarded(spark):
    from market_insights_app_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + i % 7)) for i in range(200)]
    rows += [(900, 0.0), (901, -3.0), (902, None)]  # excluded: w <= 0 / NULL
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    a = [r["doc_id"] for r in weighted_sample(df, 20, "w").collect()]
    b = [r["doc_id"] for r in weighted_sample(df, 20, "w").collect()]
    assert a == b and len(a) == 20
    assert not {900, 901, 902} & set(a)


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """Two weight classes 50x apart: the heavy class must dominate the
    sample far beyond its population share (deterministic, so this is
    a fixed fact about the salt, not a flaky statistical test)."""
    from market_insights_app_spark.operators.sampling import weighted_sample

    rows = [(i, 50.0 if i % 10 == 0 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = [r["doc_id"] for r in weighted_sample(df, 100, "w").collect()]
    heavy = sum(1 for i in got if i % 10 == 0)
    # heavy rows are 10% of the population; with 50x weight they
    # should take well over half the sample
    assert heavy > 60


def test_weighted_sample_salt_changes_sample(spark):
    from market_insights_app_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(i, 1.0) for i in range(500)], ["doc_id", "w"])
    a = {r["doc_id"] for r in weighted_sample(df, 50, "w", salt="s1").collect()}
    b = {r["doc_id"] for r in weighted_sample(df, 50, "w", salt="s2").collect()}
    assert a != b


# ---------------------------------------------------------------------------
# apply_changes: the CDC round-trip law
# ---------------------------------------------------------------------------


def test_apply_changes_roundtrip(snaps):
    from market_insights_app_spark.operators.reconcile import apply_changes

    old, new = snaps
    diff = snapshot_diff(old, new, ["k"], ["price", "note"])
    rebuilt = apply_changes(old, diff, ["k"], ["price", "note"])
    want = sorted(map(tuple, new.collect()))
    got = sorted(map(tuple, rebuilt.select("k", "price", "note").collect()))
    assert got == want


def test_apply_changes_empty_feed_is_identity(snaps):
    from market_insights_app_spark.operators.reconcile import apply_changes

    old, _ = snaps
    empty = snapshot_diff(old, old, ["k"], ["price", "note"])
    assert empty.count() == 0
    rebuilt = apply_changes(old, empty, ["k"], ["price", "note"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, old.select("k", "price", "note").collect())
    )


# ---------------------------------------------------------------------------
# validate_table expectation gate
# ---------------------------------------------------------------------------


def test_validate_table_counts_each_rule(spark):
    from market_insights_app_spark.operators.expectations import validate_table

    df = spark.createDataFrame(
        [
            (1, 5.0, "A"),
            (2, None, "B"),      # not_null(v) violation
            (3, 99.0, "A"),      # range violation
            (3, 1.0, "Z"),       # dup key + accepted violation
            (None, 1.0, "A"),    # not_null(k) violation (and FK-exempt)
        ],
        ["k", "v", "flag"],
    )
    parent = spark.createDataFrame([(1,), (2,), (4,)], ["pk"])
    rep = {
        r["rule"]: (r["violations"], r["status"])
        for r in validate_table(
            df,
            not_null=["k", "v"],
            ranges={"v": (0.0, 50.0)},
            accepted={"flag": ["A", "B"]},
            unique=["k"],
            foreign_key=("k", parent, "pk"),
        ).collect()
    }
    assert rep["not_null(k)"] == (1, "fail")
    assert rep["not_null(v)"] == (1, "fail")
    assert rep["in_range(v,0.0,50.0)"] == (1, "fail")
    assert rep["accepted_values(flag)"] == (1, "fail")
    assert rep["unique(k)"] == (1, "fail")        # k=3 twice -> 1 excess row
    assert rep["foreign_key(k)"] == (2, "fail")   # k=3 twice orphaned; NULL exempt


def test_validate_table_all_pass(spark):
    from market_insights_app_spark.operators.expectations import validate_table

    df = spark.createDataFrame([(1, 2.0), (2, 3.0)], ["k", "v"])
    rep = validate_table(
        df, not_null=["k"], ranges={"v": (0.0, 10.0)}, unique=["k"]
    ).collect()
    assert all(r["status"] == "pass" and r["violations"] == 0 for r in rep)


def test_validate_table_requires_rules(spark):
    from market_insights_app_spark.operators.expectations import validate_table

    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        validate_table(df)


# ---------------------------------------------------------------------------
# scd2_build
# ---------------------------------------------------------------------------


def test_scd2_collapses_noops_and_orders_intervals(spark):
    from market_insights_app_spark.operators.reconcile import scd2_build

    rows = [
        # user 1: A, A (no-op), B, B (no-op), A  -> 3 intervals
        (1, 10, 1, "A"),
        (1, 20, 2, "A"),
        (1, 30, 3, "B"),
        (1, 40, 4, "B"),
        (1, 50, 5, "A"),
        # user 2: NULL then value -> NULL opens, change opens
        (2, 10, 6, None),
        (2, 20, 7, "X"),
    ]
    df = spark.createDataFrame(rows, ["k", "t", "i", "attr"])
    out = sorted(
        (
            (r["k"], r["valid_from"], r["valid_to"], r["attr"], r["is_current"])
            for r in scd2_build(df, ["k"], "t", ["attr"], "i").collect()
        )
    )
    assert out == [
        (1, 10, 30, "A", False),
        (1, 30, 50, "B", False),
        (1, 50, None, "A", True),
        (2, 10, 20, None, False),
        (2, 20, None, "X", True),
    ]


def test_scd2_same_ts_tiebreak(spark):
    """Two updates at the same timestamp: the tiebreak column decides
    which opens first; the later one closes it with a zero-length
    interval (standard audit-log behavior)."""
    from market_insights_app_spark.operators.reconcile import scd2_build

    df = spark.createDataFrame(
        [(1, 10, 1, "A"), (1, 10, 2, "B")], ["k", "t", "i", "attr"]
    )
    out = sorted(
        (r["attr"], r["valid_from"], r["valid_to"])
        for r in scd2_build(df, ["k"], "t", ["attr"], "i").collect()
    )
    assert out == [("A", 10, 10), ("B", 10, None)]


# ---------------------------------------------------------------------------
# pit_lookup (point-in-time feature join)
# ---------------------------------------------------------------------------


def test_pit_lookup_no_future_leakage(spark):
    """A fact must see the interval open AT its timestamp, never a
    later one; facts before the first interval get NULL."""
    from market_insights_app_spark.operators.reconcile import pit_lookup

    dim = spark.createDataFrame(
        [
            (1, "bronze", 10, 20),
            (1, "silver", 20, 40),
            (1, "gold", 40, None),
        ],
        ["k", "tier", "valid_from", "valid_to"],
    )
    facts = spark.createDataFrame(
        [(1, 5, 100), (1, 10, 101), (1, 39, 102), (1, 40, 103), (1, 99, 104)],
        ["k", "t", "fid"],
    )
    got = {
        r["fid"]: r["pit_tier"]
        for r in pit_lookup(facts, dim, "k", "t", ["tier"]).collect()
    }
    assert got == {
        100: None,        # before any interval
        101: "bronze",    # boundary: interval opening at t is visible
        102: "silver",
        103: "gold",      # transition boundary goes to the new interval
        104: "gold",      # current interval, open-ended
    }


def test_pit_lookup_gap_expires_attributes(spark):
    """Coverage gap in the dimension: a fact inside the gap matches the
    stale interval by as-of but the expiry check nulls it out."""
    from market_insights_app_spark.operators.reconcile import pit_lookup

    dim = spark.createDataFrame(
        [(1, "a", 10, 20), (1, "b", 50, None)],
        ["k", "attr", "valid_from", "valid_to"],
    )
    facts = spark.createDataFrame([(1, 30, 1), (1, 60, 2)], ["k", "t", "fid"])
    got = {
        r["fid"]: r["pit_attr"]
        for r in pit_lookup(facts, dim, "k", "t", ["attr"]).collect()
    }
    assert got == {1: None, 2: "b"}


# ---------------------------------------------------------------------------
# robust_outliers (median/MAD anomaly gate)
# ---------------------------------------------------------------------------


def test_robust_outliers_flags_only_the_spike(spark):
    """Symmetric cluster at 10+-2 with one spike at 1000: exactly the
    spike is flagged; median/MAD are untouched by it (the point of
    robust statistics)."""
    from market_insights_app_spark.operators.profiling import robust_outliers

    vals = [8.0, 9.0, 10.0, 11.0, 12.0, 1000.0]
    df = spark.createDataFrame([("a", v) for v in vals], ["g", "v"])
    r = robust_outliers(df, "g", "v").collect()[0]
    assert r["n"] == 6 and r["n_outliers"] == 1
    assert r["median"] == pytest.approx(10.5)
    assert r["mad"] == pytest.approx(1.5)


def test_robust_outliers_mad_zero_flags_any_deviation(spark):
    """Over half the group identical -> MAD 0: any differing value is
    an outlier (threshold collapses to |v - median| > 0)."""
    from market_insights_app_spark.operators.profiling import robust_outliers

    df = spark.createDataFrame(
        [("a", 5.0)] * 6 + [("a", 5.1)], ["g", "v"]
    )
    r = robust_outliers(df, "g", "v").collect()[0]
    assert r["mad"] == 0.0 and r["n_outliers"] == 1


# ---------------------------------------------------------------------------
# psi_drift (population stability index)
# ---------------------------------------------------------------------------


def test_psi_identical_distributions_near_zero(spark):
    from market_insights_app_spark.operators.profiling import psi_drift

    rows = [("a", float(i % 100)) for i in range(1000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = psi_drift(df, df, "g", "v").collect()[0]
    assert r["psi"] == pytest.approx(0.0, abs=1e-9)


def test_psi_shifted_distribution_is_large(spark):
    """Current shifted wholesale past the reference's top decile: all
    current mass lands in one bin -> PSI far beyond the 0.25 'shifted'
    rule of thumb."""
    from market_insights_app_spark.operators.profiling import psi_drift

    ref = spark.createDataFrame(
        [("a", float(i % 100)) for i in range(1000)], ["g", "v"]
    )
    cur = spark.createDataFrame(
        [("a", 1000.0 + i) for i in range(500)], ["g", "v"]
    )
    r = psi_drift(ref, cur, "g", "v").collect()[0]
    assert r["psi"] > 1.0


def test_psi_symmetric_under_mild_shift(spark):
    """A mild shift must register between the stable and shifted
    thresholds, and empty-bin smoothing keeps it finite."""
    from market_insights_app_spark.operators.profiling import psi_drift
    import math

    ref = spark.createDataFrame(
        [("a", float(i % 100)) for i in range(1000)], ["g", "v"]
    )
    cur = spark.createDataFrame(
        [("a", float((i % 100) + 8)) for i in range(1000)], ["g", "v"]
    )
    r = psi_drift(ref, cur, "g", "v").collect()[0]
    assert 0.0 < r["psi"] < 10.0 and math.isfinite(r["psi"])


def test_psi_vanished_segment_large_not_abort(spark):
    """A key with reference rows but ZERO current rows used to divide
    by a zero window total (ANSI job abort, r7 single-row sweep); it
    must instead come out as a large finite PSI — "segment vanished"
    is maximal drift, and one dead segment must never kill the whole
    monitoring job."""
    import math

    ref = spark.createDataFrame(
        [("a", float(i % 100)) for i in range(200)]
        + [("b", float(i % 100)) for i in range(200)],
        ["g", "v"],
    )
    cur = spark.createDataFrame(
        [("a", float(i % 100)) for i in range(200)], ["g", "v"]
    )
    from market_insights_app_spark.operators.profiling import psi_drift

    got = {r["g"]: r for r in psi_drift(ref, cur, "g", "v").collect()}
    assert got["a"]["psi"] == pytest.approx(0.0, abs=1e-9)
    assert math.isfinite(got["b"]["psi"]) and got["b"]["psi"] > 1.0


# ---------------------------------------------------------------------------
# incremental aggregate maintenance (IVM)
# ---------------------------------------------------------------------------


def test_incremental_agg_matches_recompute_with_migrations(spark):
    """Changed rows that also move groups, a group that empties out,
    and a brand-new group: base + delta must equal recompute."""
    from market_insights_app_spark.operators.reconcile import (
        agg_delta,
        incremental_agg_update,
        snapshot_diff,
    )

    cols = ["k", "v", "g"]
    old = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 30, "b"), (4, 40, "c")], cols
    )
    new = spark.createDataFrame(
        [(1, 10, "a"), (2, 25, "b"), (4, 40, "c"), (5, 50, "d")], cols
    )
    # row 2 migrates a->b with a reprice, row 3 (sole 'b' member at 30)
    # is removed, 'd' is new
    base = old.groupBy("g").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    )
    diff = snapshot_diff(old, new, ["k"], ["v", "g"])
    upd = incremental_agg_update(
        base, agg_delta(diff, "g", "v"), "g", "s", "c"
    )
    want = sorted(
        map(
            tuple,
            new.groupBy("g")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect(),
        )
    )
    assert sorted(map(tuple, upd.collect())) == want


def test_incremental_agg_empty_diff_is_identity(spark):
    from market_insights_app_spark.operators.reconcile import (
        agg_delta,
        incremental_agg_update,
        snapshot_diff,
    )

    df = spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], ["k", "v", "g"])
    base = df.groupBy("g").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    )
    diff = snapshot_diff(df, df, ["k"], ["v", "g"])
    upd = incremental_agg_update(
        base, agg_delta(diff, "g", "v"), "g", "s", "c"
    )
    assert sorted(map(tuple, upd.collect())) == sorted(
        map(tuple, base.collect())
    )


# ---------------------------------------------------------------------------
# ab_welch_t (experiment readout)
# ---------------------------------------------------------------------------


def test_welch_t_matches_numpy_formula(spark):
    import numpy as np

    from market_insights_app_spark.plans.core import q_ab_welch_t  # noqa: F401

    # build a tiny events-shaped frame and go through the same math
    treat = [10.0, 12.0, 11.0, 13.0]
    ctrl = [9.0, 8.5, 9.5, 10.0, 9.0]
    rows = [(1, "x", v) for v in treat] + [(2, "x", v) for v in ctrl]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "value"])

    from pyspark.sql import functions as G

    t = (G.col("user_id") % 2 == 1).cast("int")
    v = G.col("value").cast("decimal(7,2)")
    stats = df.groupBy("event_type").agg(
        G.sum(t).alias("n1"),
        G.sum(G.when(t == 1, v)).alias("s1"),
        G.sum(G.when(t == 1, v * v)).alias("ss1"),
        (G.count(G.lit(1)) - G.sum(t)).alias("n0"),
        G.sum(G.when(t == 0, v)).alias("s0"),
        G.sum(G.when(t == 0, v * v)).alias("ss0"),
    ).collect()[0]
    m1, m0 = np.mean(treat), np.mean(ctrl)
    v1, v0 = np.var(treat, ddof=1), np.var(ctrl, ddof=1)
    want_t = (m1 - m0) / np.sqrt(v1 / len(treat) + v0 / len(ctrl))
    n1, s1, ss1 = float(stats["n1"]), float(stats["s1"]), float(stats["ss1"])
    n0, s0, ss0 = float(stats["n0"]), float(stats["s0"]), float(stats["ss0"])
    got_t = (s1 / n1 - s0 / n0) / (
        ((ss1 - s1 * s1 / n1) / (n1 - 1) / n1
         + (ss0 - s0 * s0 / n0) / (n0 - 1) / n0) ** 0.5
    )
    assert got_t == pytest.approx(want_t, rel=1e-12)


# ---------------------------------------------------------------------------
# chi2 categorical drift
# ---------------------------------------------------------------------------


def test_chi2_matches_scipy_formula(spark):
    """2x2 contingency with a known chi-square value (no continuity
    correction): [[10, 20], [20, 10]] -> chi2 = n(ad-bc)^2/(r1 r2 c1 c2)
    = 60 * 300^2 / 30^4 = 20/3."""
    from market_insights_app_spark.plans.registry import QUERIES  # noqa: F401
    import numpy as np
    from pyspark.sql import functions as G

    rows = (
        [(2 * i, "s", "en") for i in range(10)]       # half_a en: 10
        + [(2 * i + 1, "s", "en") for i in range(20)]  # half_b en: 20
        + [(2 * i + 100000, "s", "fr") for i in range(20)]  # half_a fr: 20
        + [(2 * i + 100001, "s", "fr") for i in range(10)]  # half_b fr: 10
    )
    df = spark.createDataFrame(rows, ["doc_id", "source", "lang"])
    cells = df.groupBy(
        "source", "lang", (G.col("doc_id") % 2 == 0).alias("half_a")
    ).agg(G.count(G.lit(1)).alias("obs"))
    obs = {(r["lang"], r["half_a"]): r["obs"] for r in cells.collect()}
    O = np.array(
        [[obs[("en", True)], obs[("en", False)]],
         [obs[("fr", True)], obs[("fr", False)]]],
        dtype=float,
    )
    row = O.sum(1, keepdims=True); col = O.sum(0, keepdims=True)
    E = row @ col / O.sum()
    want = float((((O - E) ** 2) / E).sum())
    # textbook 2x2 shortcut: n(ad-bc)^2 / (r1 r2 c1 c2)
    a, b, c, d = O.ravel()
    n = O.sum()
    shortcut = n * (a * d - b * c) ** 2 / (
        (a + b) * (c + d) * (a + c) * (b + d)
    )
    assert want == pytest.approx(shortcut, rel=1e-12)
    assert want == pytest.approx(20 / 3, abs=1e-9)


# ---------------------------------------------------------------------------
# Mann-Whitney U
# ---------------------------------------------------------------------------


def test_mann_whitney_hand_computed(spark):
    """treatment {1,2} vs control {3,4,5}: every control beats every
    treatment -> U1 = 0; with ties absent the z uses the plain
    variance."""
    from market_insights_app_spark.plans.registry import QUERIES

    import duckdb

    # replicate via the registered oracle on an in-memory table to keep
    # one source of truth for the formula
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        "(1, 'x', 1.0), (3, 'x', 2.0), (2, 'x', 3.0), (4, 'x', 4.0), (6, 'x', 5.0)"
        ") AS t(user_id, event_type, value)"
    )
    from market_insights_app_spark.plans.core_oracles import CORE_ORACLES

    row = con.execute(CORE_ORACLES["ab_mann_whitney"]).fetchone()
    # treatment = odd user_id = {1, 3} with values {1.0, 2.0}: ranks 1+2
    # -> R1 = 3, U1 = R1 - n1(n1+1)/2 = 0
    assert row[1] == 2 and row[2] == 3
    assert row[3] == 0.0
    assert row[4] < 0  # treatment stochastically smaller
