"""Query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract) and the parity tests.

``QUERIES[name]`` : (spark, sf_dir) -> DataFrame  (Spark plan)
``ORACLES[name]``  : DuckDB ANSI-SQL twin (absent ⇒ rows-only check —
                     LSH-family / approximate operators, verified in
                     tests/ against Python references instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from market_insights_app_spark.plans import core, textml
from market_insights_app_spark.plans.core_oracles import CORE_ORACLES
from market_insights_app_spark.plans.textml import TEXTML_ORACLES

QueryFn = Callable[[SparkSession, str], DataFrame]


def _collect(module) -> dict[str, QueryFn]:
    return {
        name[2:]: fn
        for name, fn in vars(module).items()
        if name.startswith("q_") and callable(fn)
    }


_COLLECTED: dict[str, QueryFn] = {**_collect(core), **_collect(textml)}

# Driver-sweep priority. The per-round CORRECTNESS sweep checks the FIRST
# 50 names in ``QUERIES`` (dict insertion order). Round-4 tiers:
#   1. red or oracle-less in CORRECTNESS_r03 (all four now fixed/oracled)
#      + queries new this round — these MUST get a fresh driver row
#   2. not in the r03 sweep (last green r01/r02) — stalest evidence next
#   3. green in r03 — re-swept only with leftover slots (via dict merge)
_PRIORITY: list[str] = [
    # --- tier 1: fixed this round + new this round ---------------------
    "prices_filter_range_limit",  # r03 red: NTZ unix_micros — fixed
    "ict_analysis",               # r03 red: same root cause — fixed
    "media_features",             # r03 no_oracle — full oracle added
    "near_dedup_corpus",          # r03 no_oracle — portable hash + oracle
    "table_profile",
    "grouping_sets_revenue",
    "ewma_macd",
    "semdedup",
    "passage_dedup",
    "zipf_slope",
    # --- tier 2: rotated out of the r03 sweep (stalest driver rows) ----
    "autocorr_lag1",
    "bollinger",
    "click_attribution",
    "cohort_retention",
    "cube_agg",
    "dedup_latest_wins",
    "equity_cumsum",
    "funnel_conversion",
    "group_topk",
    "histogram",
    "json_extract_props",
    "lag_delta",
    "latest_join_enrich",
    "latest_per_key",
    "local_extrema",
    "ma_slope_trend",
    "minhash_neardup",
    "minmax_mid_premium",
    "minmax_normalize",
    "pivot_event_counts",
    "pnl_r_scalars",
    "prices_keyset_page",
    "prices_page2",
    "range_join_sessions",
    "recent_n_tail",
    "rolling_min_volatility",
    "rolling_stddev10",
    "rollup_revenue",
    "rsi14",
    "salted_hot_agg",
    "session_window_agg",
    "set_ops",
    "simhash_neardup",
    "sliding_window_agg",
    "sma5",
    "trailing_max_argmax",
    "tumbling_window_agg",
    "union_merge_dedup",
    "value_quantiles",
    "window_delta_stats",
]

_unknown = set(_PRIORITY) - set(_COLLECTED)
assert not _unknown, f"priority name without query: {_unknown}"

QUERIES: dict[str, QueryFn] = {
    **{name: _COLLECTED[name] for name in _PRIORITY},
    **{name: fn for name, fn in _COLLECTED.items() if name not in set(_PRIORITY)},
}

ORACLES: dict[str, str] = {**CORE_ORACLES, **TEXTML_ORACLES}

# every oracle key must have a query
_missing = set(ORACLES) - set(QUERIES)
assert not _missing, f"oracle without query: {_missing}"
