"""Sketch-lane error-bound tests — the approx operators are only
worth shipping if their error CONTRACTS hold, so every test here
asserts a published bound against the exact lane, not just shape.

Determinism note: both sketch families (Greenwald-Khanna quantiles,
HyperLogLog++ distinct) are hash/merge based with no RNG, so repeated
runs over the same data give identical outputs — the bound asserts are
stable, not flaky-probabilistic.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE


def _rank_bounds(
    values: list[float], q: float, p: float, eps: float, tol: float = 0.0
):
    """Exact rank window check: the sketched p-quantile q must have
    rank within eps*n (+1 tie slack) of p*n.  ``tol`` widens the value
    comparison for REPORT-ROUNDED q (6 dp output rounding can land q a
    hair below a heavy tie atom — compare `le` at q+tol and `lt` at
    q−tol so the atom counts on the correct side)."""
    n = len(values)
    le = sum(1 for v in values if v <= q + tol)
    lt = sum(1 for v in values if v < q - tol)
    slack = eps * n + 1.0
    return le >= p * n - slack and lt <= p * n + slack


@pytest.fixture(scope="module")
def skewed_df(spark):
    """60k rows, 3 groups with different shapes (uniform, lognormal-ish
    via exp of uniform sums, heavy point mass) — seeded, reproducible."""
    rng = random.Random(0xC0FFEE)
    rows = []
    for i in range(20000):
        rows.append(("uniform", i, rng.uniform(0.0, 1000.0)))
        u = sum(rng.uniform(-1, 1) for _ in range(6))
        rows.append(("lognormalish", i, 2.718281828 ** u * 50.0))
        # 40% point mass at 7.0 → nearly-degenerate quantiles
        rows.append(
            ("pointmass", i, 7.0 if rng.random() < 0.4 else rng.uniform(0, 100))
        )
    return spark.createDataFrame(rows, "grp string, uid long, v double")


ACC = 1000  # coarse sketch → real approximation error, real bound test


def test_value_quantiles_approx_rank_bounds(spark, skewed_df):
    from market_insights_app_spark.operators.sketches import (
        value_quantiles_approx,
    )

    approx = {
        r["grp"]: (r["p50"], r["p90"], r["p99"])
        for r in value_quantiles_approx(
            skewed_df, "grp", "v", probs=(0.5, 0.9, 0.99), accuracy=ACC
        ).collect()
    }
    exact_vals = {
        g: [r["v"] for r in skewed_df.filter(F.col("grp") == g).collect()]
        for g in approx
    }
    eps = 1.0 / ACC
    for g, (q50, q90, q99) in approx.items():
        vals = exact_vals[g]
        assert _rank_bounds(vals, q50, 0.5, eps), (g, "p50", q50)
        assert _rank_bounds(vals, q90, 0.9, eps), (g, "p90", q90)
        assert _rank_bounds(vals, q99, 0.99, eps), (g, "p99", q99)


def test_approx_count_distinct_bound(spark):
    """HLL++ relative error ≤ 3·rsd across two decades of cardinality
    (exact below the sparse-mode threshold, estimated above)."""
    rows = [(c, i % c) for c in (100, 5000, 50000) for i in range(60000)]
    df = spark.createDataFrame(rows, "card int, x long")
    got = {
        r["card"]: (r["ad"], r["ed"])
        for r in df.groupBy("card")
        .agg(
            F.approx_count_distinct("x", 0.05).alias("ad"),
            F.count_distinct("x").alias("ed"),
        )
        .collect()
    }
    for card, (ad, ed) in got.items():
        assert ed == card
        assert abs(ad - ed) <= 3 * 0.05 * ed, (card, ad, ed)


def test_robust_outliers_approx_vs_exact(spark, skewed_df):
    """The sketch twin's median/MAD must satisfy the rank bound against
    the group's raw values, and the flagged population may differ from
    the exact lane only by values inside the sketch-error neighborhood
    of the threshold."""
    from market_insights_app_spark.operators.profiling import robust_outliers
    from market_insights_app_spark.operators.sketches import (
        robust_outliers_approx,
    )

    exact = {r["grp"]: r for r in robust_outliers(skewed_df, "grp", "v").collect()}
    approx = {
        r["grp"]: r
        for r in robust_outliers_approx(
            skewed_df, "grp", "v", accuracy=ACC
        ).collect()
    }
    vals = {
        g: sorted(
            r["v"] for r in skewed_df.filter(F.col("grp") == g).collect()
        )
        for g in approx
    }
    eps = 1.0 / ACC
    for g, a in approx.items():
        e = exact[g]
        assert a["n"] == e["n"]
        v = vals[g]
        assert _rank_bounds(v, a["median"], 0.5, eps, tol=1e-4), (g, "median")
        # MAD rank-checked against deviations from the APPROX median
        # (that is the quantity the second sketch pass actually ranks);
        # tol absorbs the 6dp output rounding of median and mad
        devs = sorted(abs(x - a["median"]) for x in v)
        assert _rank_bounds(devs, a["mad"], 0.5, eps, tol=1e-4), (g, "mad")
        # flag count: recompute the exact flag count at the approx
        # thresholds — the operator's counting itself must be exact
        thr = 3.0 * 1.4826 * a["mad"]
        manual = sum(1 for x in v if abs(x - a["median"]) > thr)
        # 6dp rounding of median/mad in the report can move values at
        # the knife edge; allow only those
        near = sum(
            1 for x in v if abs(abs(x - a["median"]) - thr) < 1e-3
        )
        assert abs(a["n_outliers"] - manual) <= near, (g, a, manual, near)


def test_perplexity_buckets_approx_tier_sizes(spark):
    """Sketched tertile thresholds must reproduce the exact lane's tier
    populations within rank error, and bucket assignment must agree
    with the exact lane except near tier boundaries."""
    from market_insights_app_spark.operators.quality import perplexity_buckets
    from market_insights_app_spark.operators.sketches import (
        perplexity_buckets_approx,
    )
    from market_insights_app_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "text", F.substring("text", 1, 2).alias("lang")
    )
    exact = perplexity_buckets(docs, lang_col="lang")
    approx = perplexity_buckets_approx(docs, lang_col="lang", accuracy=ACC)
    ecnt = {
        (r["lang"], r["bucket"]): r["n"]
        for r in exact.groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    acnt = {
        (r["lang"], r["bucket"]): r["n"]
        for r in approx.groupBy("lang", "bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals: dict[str, int] = {}
    for (lang, _b), n in ecnt.items():
        totals[lang] = totals.get(lang, 0) + n
    assert sum(totals.values()) == approx.count()
    for key in set(ecnt) | set(acnt):
        lang = key[0]
        # each tier boundary can move by eps*n docs (+ntile floor/ceil
        # rounding +1); a tier touches two boundaries
        tol = 2 * (totals[lang] / ACC + 2)
        assert abs(ecnt.get(key, 0) - acnt.get(key, 0)) <= tol, (
            key,
            ecnt.get(key, 0),
            acnt.get(key, 0),
        )


def test_hll_profile_matches_exact_within_bound(spark):
    from market_insights_app_spark.operators.profiling import profile_table
    from market_insights_app_spark.operators.sketches import hll_profile
    from market_insights_app_spark.sources.tables import load_table

    ev = load_table(spark, SF_ORACLE, "events")
    exact = {
        r["column"]: r for r in profile_table(ev, approximate=False).collect()
    }
    approx = {r["column"]: r for r in hll_profile(ev).collect()}
    assert set(exact) == set(approx)
    for c, a in approx.items():
        e = exact[c]
        # everything except n_distinct is computed identically
        assert (a["n_rows"], a["n_null"], a["min_str"], a["max_str"]) == (
            e["n_rows"],
            e["n_null"],
            e["min_str"],
            e["max_str"],
        )
        # default rsd 0.05 → 3σ bound
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(
            3 * 0.05 * e["n_distinct"], 1
        ), (c, a["n_distinct"], e["n_distinct"])


def test_sketch_accuracy_report_all_true(spark):
    """The driver-gated query's booleans must hold on the real events
    table — this is the local twin of the sketch_profile oracle row."""
    from market_insights_app_spark.operators.sketches import (
        sketch_accuracy_report,
    )
    from market_insights_app_spark.sources.tables import load_table

    ev = load_table(spark, SF_ORACLE, "events")
    rows = sketch_accuracy_report(ev, "event_type", "value", "user_id").collect()
    assert rows
    for r in rows:
        assert r["distinct_ok"] and r["p50_ok"] and r["p90_ok"], r


# --- dataset release manifest (operators/profiling.corpus_manifest) ---------


def test_corpus_manifest_order_insensitive_and_edit_sensitive(spark):
    from market_insights_app_spark.operators.profiling import corpus_manifest

    rows = [(1, "alpha", "s0"), (2, "beta", "s0"), (3, "gamma", "s1")]
    a = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    b = spark.createDataFrame(list(reversed(rows)), ["doc_id", "text", "source"])
    ra = sorted(tuple(r) for r in corpus_manifest(a).collect())
    rb = sorted(tuple(r) for r in corpus_manifest(b).collect())
    assert ra == rb  # permutation-invariant
    s0 = next(r for r in ra if r[0] == "s0")
    assert s0[1] == 2 and s0[2] == 2 and s0[3] == len("alpha") + len("beta")
    # one-character edit moves the checksum
    edited = spark.createDataFrame(
        [(1, "alphA", "s0"), (2, "beta", "s0"), (3, "gamma", "s1")],
        ["doc_id", "text", "source"],
    )
    re_ = sorted(tuple(r) for r in corpus_manifest(edited).collect())
    assert re_ != ra
    # a duplicated id is visible in n_rows vs n_distinct_ids
    dup = spark.createDataFrame(rows + [(1, "alpha", "s0")], ["doc_id", "text", "source"])
    d0 = next(r for r in sorted(tuple(r) for r in corpus_manifest(dup).collect()) if r[0] == "s0")
    assert d0[1] == 3 and d0[2] == 2


def test_corpus_manifest_staged_parity(spark, duck):
    """Direct Spark<->DuckDB parity for the corpus_manifest pair
    (registered r8), plus driver type hygiene."""
    from market_insights_app_spark.plans.textml import (
        TEXTML_ORACLES,
        q_corpus_manifest,
    )
    from tests.conftest import SF_ORACLE
    from tests.test_oracle_parity import canon

    sdf = q_corpus_manifest(spark, SF_ORACLE)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(TEXTML_ORACLES["corpus_manifest"])
    drows = rel.fetchall()
    dcols = [d[0] for d in rel.description]
    assert sorted(sdf.columns) == sorted(dcols)
    assert len(srows) == len(drows) > 0
    assert canon(srows, sdf.columns) == canon(drows, dcols)
    for col, typ in zip(rel.columns, rel.types):
        assert str(typ) in {"BIGINT", "VARCHAR"}, (col, str(typ))


# --- heavy hitters (sketches.heavy_hitters / approx_top_k) -------------------


def test_heavy_hitters_exact_regime(spark):
    """Distinct keys within max_items_tracked -> counts are exact and
    the top-k set matches a full groupBy."""
    from market_insights_app_spark.operators.sketches import heavy_hitters

    rows = [(f"k{i % 7}",) for i in range(500)] + [("hot",)] * 300
    df = spark.createDataFrame(rows, ["key"])
    got = {r.item: r.est_count for r in heavy_hitters(df, "key", k=8).collect()}
    exact = {r.key: r.n for r in df.groupBy("key").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert got == exact  # 8 distinct keys, all tracked, all exact


def test_heavy_hitters_overflow_regime_bounds(spark):
    """Distinct keys far beyond max_items_tracked: every key with true
    frequency > n/max_tracked is reported, within the MG error bound."""
    from market_insights_app_spark.operators.sketches import heavy_hitters

    hot = [("hot_a",)] * 4000 + [("hot_b",)] * 2500
    tail = [(f"t{i}",) for i in range(3000)]
    df = spark.createDataFrame(hot + tail, ["key"]).repartition(8)
    n = len(hot) + len(tail)
    max_tracked = 64
    err = n / max_tracked  # ~148
    got = {r.item: r.est_count for r in heavy_hitters(
        df, "key", k=10, max_items_tracked=max_tracked).collect()}
    for key, true in (("hot_a", 4000), ("hot_b", 2500)):
        assert key in got, key
        assert abs(got[key] - true) <= err, (key, got[key], true, err)
