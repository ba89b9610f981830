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
# 50 names in ``QUERIES`` (dict insertion order), so names that have never
# received a driver row must enumerate first.  Tiers:
#   1. never driver-swept as of r02 (22 names) + new round-3 queries
#   2. green in r01 only, rotated out of the r02 sweep (12 names)
#   3. green in r02 — re-swept only with leftover slots
_PRIORITY: list[str] = [
    # --- tier 1: no driver CORRECTNESS row yet -------------------------
    "timestamp_normalize",
    "connector_yahoo_parse",
    "simhash_neardup_portable",
    "media_decode",
    "media_features",
    "near_dedup_corpus",
    "near_dedup_corpus_exact",
    "ngram_jaccard_bigram",
    "training_corpus",
    "corpus_split",
    "stratified_sample",
    "mixture_sample",
    "doc_chunks",
    "doc_repetition",
    "seq_pack",
    "vocab_topk",
    "pii_scrub",
    "tfidf_top_terms",
    "decontaminate",
    "fuzzy_match",
    "inverted_index",
    "quantize_int8",
    # new in round 3 — no driver row yet by construction
    "bm25_search",
    "hybrid_search",
    "corpus_shuffle",
    "seq_len_histogram",
    "lm_quality",
    "kmeans_assign",
    # --- tier 2: green in r01, rotated out of the r02 sweep ------------
    "connector_fx_parse",
    "impact_classify",
    "tag_split",
    "level_extract",
    "fingerprint_docs",
    "embedding_topk",
    "embedding_neardup",
    "tokens_count",
    "text_quality",
    "lang_id",
    "ann_lsh_topk",
    "ivf_topk",
    # --- tier 3: green in r02 (fill the remaining sweep slots) ---------
    "prices_filter_range_limit",
    "positions_agg",
    "tpch_q1_style",
    "journal_stats",
    "asof_join",
    "multi_join_revenue",
    "ict_analysis",
    "minhash_neardup_portable",
    "dedup_exact",
    "ngram_jaccard",
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
