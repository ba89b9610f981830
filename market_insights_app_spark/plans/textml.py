"""Text-analysis / dedup / similarity / connector query registry —
the training-data-pipeline surface (SURVEY.md §7.2 step 9 + §2.1
connectors) with DuckDB oracle twins where SQL can express the
semantics. Even the ANN approximate top-k queries are fully
oracle-backed (deterministic hyperplanes/centroids replayed in SQL);
only the engine-hash (xxhash64) MinHash/SimHash variants and the
iterative connected-components dedup stay rows-only, each gated by a
portable twin or a pure-Python reference in tests/.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from market_insights_app_spark.functions import text as TX
from market_insights_app_spark.functions.scalars import ts_us
from market_insights_app_spark.operators.dedup import (
    minhash_near_dupes,
    ngram_jaccard_vs_query,
    simhash_near_dupes,
)
from market_insights_app_spark.operators.multimodal import decode_media
from market_insights_app_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_self_join_neardup,
    cosine_topk,
    ivf_topk,
)
from market_insights_app_spark.sources.http_quotes import (
    parse_alpha_vantage_fx,
    parse_alpha_vantage_quote,
    parse_yahoo_chart,
)
from market_insights_app_spark.sources.tables import load_table

# normalized-text SQL fragment shared by several oracles
_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_TOKS_SQL = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')"


def _docs(spark, sf):
    return load_table(spark, sf, "documents")


def _emb(spark, sf):
    return load_table(spark, sf, "embeddings")


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """D1/D2 content form (db.py:44, 126-131): md5-of-normalized-text
    fingerprint groups; keeper = min doc_id (first-insert-wins)."""
    docs = _docs(spark, sf)
    return (
        docs.select(TX.md5_fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n"))
    )


def q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """1-gram Jaccard of every document vs doc_id=0 — the exact-verify
    stage of near-dup dedup, in the token-join formulation."""
    docs = _docs(spark, sf)
    return ngram_jaccard_vs_query(docs, docs.filter(F.col("doc_id") == 0), n=1)


# r10 consolidation (sanctioned by the r9 verdict): the rows-only
# registry rows `minhash_neardup` / `simhash_neardup` are RETIRED — the
# xxhash64 engine lanes they exercised remain first-class operators
# (minhash_near_dupes / simhash_near_dupes, default portable=False),
# verified vs independent Python references in
# tests/test_dedup_reference.py, while every pipeline stage is
# hash-gated via the ★_portable twins below.


def q_minhash_neardup_portable(spark: SparkSession, sf: str) -> DataFrame:
    """The FULL MinHash-LSH pipeline (signatures → banding → candidate
    pairs → estimate prefilter → exact-Jaccard verify) with the
    md5-derived portable base hash and string band keys, so a DuckDB
    oracle reproduces every stage bit-for-bit — a hard differential
    gate on the whole LSH machinery, complementing the rows-only
    xxhash64 engine lane (minhash_near_dupes, unit-gated)."""
    return minhash_near_dupes(_docs(spark, sf), threshold=0.5, portable=True)


def q_simhash_neardup_portable(spark: SparkSession, sf: str) -> DataFrame:
    """The FULL SimHash pipeline (32-bit md5-derived bit votes →
    pigeonhole chunk bucketing → Hamming verify) in its engine-portable
    form, hash-gated against a DuckDB oracle (complements the rows-only
    64-bit xxhash64 engine lane, simhash_near_dupes, unit-gated)."""
    return simhash_near_dupes(
        _docs(spark, sf), max_hamming=3, bits=32, portable=True
    )


# ---------------------------------------------------------------------------
# text analysis family
# ---------------------------------------------------------------------------


def q_tokens_count(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    return docs.select(
        "doc_id",
        TX.token_count("text").alias("n_tokens"),
        TX.bpe_ish_token_count("text").alias("n_bpe"),
    )


def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    feats = TX.quality_features("text")
    return docs.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
        F.round(TX.quality_score("text"), 6).alias("quality"),
    )


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    return docs.select("doc_id", TX.lang_id("text").alias("pred_lang"))


def q_impact_classify(spark: SparkSession, sf: str) -> DataFrame:
    """F3 keyword-tier classifier (main.py:645-653) with corpus-domain
    keyword tiers; aggregated class counts."""
    from market_insights_app_spark.functions.scalars import score_impact

    docs = _docs(spark, sf)
    impact = score_impact("text", high=["dup", "slow"], medium=["merge", "hash"])
    return docs.select(impact.alias("impact")).groupBy("impact").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_tag_split(spark: SparkSession, sf: str) -> DataFrame:
    """F9 (main.js:958) generalized: explode whitespace tokens, count."""
    docs = _docs(spark, sf)
    return (
        docs.select(F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_level_extract(spark: SparkSession, sf: str) -> DataFrame:
    """F11 (main.js:474-492) UDTF shape: one row per numeric token
    extracted from events.props."""
    ev = load_table(spark, sf, "events")
    exploded = ev.select(
        "event_id",
        F.explode(F.regexp_extract_all("props", F.lit(TX.NUMBER_RE), 0)).alias("lvl"),
    )
    return exploded.select("event_id", F.col("lvl").cast("double").alias("level"))


def q_fingerprint_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Document fingerprints: md5 of normalized text + polynomial
    rolling hash (mod 2^31-1) — both pure column expressions."""
    docs = _docs(spark, sf)
    return docs.select(
        "doc_id",
        TX.md5_fingerprint("text").alias("fp"),
        TX.rolling_fingerprint("text").alias("rh"),
    )


# ---------------------------------------------------------------------------
# similarity family
# ---------------------------------------------------------------------------


def _query_vec(spark, sf) -> list[float]:
    row: Row = (
        _emb(spark, sf).filter(F.col("vec_id") == 0).select("embedding").first()
    )
    if row is None:
        # empty corpus: a zero query vector keeps every downstream
        # top-k plan valid and returning 0 rows instead of crashing
        # on a missing seed (dim 64 pinned by
        # test_ann_oracle_dim_assumption)
        return [0.0] * 64
    return [float(x) for x in row["embedding"]]


def q_embedding_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 vs vec_id=0 (the correctness baseline
    for ANN)."""
    return cosine_topk(_emb(spark, sf), _query_vec(spark, sf), k=10)


def q_embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs bucketed by label (the coarse
    bucket standing in for an LSH/cluster key at scale).

    Threshold 0.40 is fixture-calibrated: the synthetic embeddings are
    near-orthogonal (max within-label cosine ≈ 0.47 at sf0.01), so the
    production-style 0.95 threshold made this gate vacuous (0 rows on
    both engines — r5 verdict).  0.40 keeps the compare non-empty at
    sf0.001 AND sf0.01 while the operator itself stays
    threshold-agnostic."""
    return cosine_self_join_neardup(_emb(spark, sf), "label", threshold=0.40)


def q_ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH. Fully
    oracle-backed: the deterministic hyperplanes are embedded in the
    DuckDB twin as double literals, so the signature filter and the
    final cosines reproduce exactly (see the ANN-oracles section at the
    bottom of this module)."""
    return ann_lsh_topk(_emb(spark, sf), _query_vec(spark, sf), k=10)


def q_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate top-10 via IVF coarse quantization. Fully
    oracle-backed — centroid seeding, nearest-cell assignment (first-max
    tie-break) and the nprobe ranking are all replayed in SQL."""
    return ivf_topk(_emb(spark, sf), _query_vec(spark, sf), k=10)


# ---------------------------------------------------------------------------
# connector parsing (S1-S3) — deterministic payloads, no network
# ---------------------------------------------------------------------------

_FX_PAYLOAD = (
    '{"Realtime Currency Exchange Rate": {"1. From_Currency Code": "EUR", '
    '"3. To_Currency Code": "USD", "5. Exchange Rate": "1.08250000", '
    '"6. Last Refreshed": "2024-03-01 10:15:30"}}'
)

_YAHOO_PAYLOAD = (
    '{"chart": {"result": [{"meta": {"symbol": "AAPL", "currency": "USD"}, '
    '"timestamp": [1709290000, 1709290060, 1709290120], '
    '"indicators": {"quote": [{"close": [189.5, null, 190.25]}]}}]}}'
)


def q_connector_fx_parse(spark: SparkSession, sf: str) -> DataFrame:
    """S2 (alpha_vantage_fx.py:16-62): nested-JSON FX quote → normalized
    row, via from_json — no network, deterministic payload."""
    raw = spark.createDataFrame([(_FX_PAYLOAD,)], ["payload"])
    out = parse_alpha_vantage_fx(raw)
    return out.select(
        "symbol",
        F.round("price", 6).alias("price"),
        ts_us("as_of").alias("ts_us"),
        "currency",
        "source",
    )


def q_connector_yahoo_parse(spark: SparkSession, sf: str) -> DataFrame:
    """S3 (yahoo.py:7-47): chart arrays → last non-null close."""
    raw = spark.createDataFrame([(_YAHOO_PAYLOAD,)], ["payload"])
    out = parse_yahoo_chart(raw)
    return out.select(
        "symbol",
        F.round("price", 6).alias("price"),
        ts_us("as_of").alias("ts_us"),
        "currency",
        "source",
    )


# S1 payload matrix: dotted-key variant, underscored-key variant (the
# reference falls back between them, alpha_vantage.py:33-36), a throttle
# Note (alpha_vantage.py:29-31), and an empty body (alpha_vantage.py:37-38).
_AV_QUOTE_PAYLOADS = [
    (
        0,
        '{"Global Quote": {"01. symbol": "ibm", "05. price": "239.5000", '
        '"07. latest trading day": "2024-03-01"}}',
    ),
    (
        1,
        '{"Global Quote": {"01_symbol": "msft", "05_price": "411.2500", '
        '"07_latest_trading_day": "2024-02-29"}}',
    ),
    (2, '{"Note": "API call frequency exceeded, please slow down"}'),
    (3, "{}"),
]


def q_connector_av_quote_parse(spark: SparkSession, sf: str) -> DataFrame:
    """S1 (alpha_vantage.py:15-48): GLOBAL_QUOTE JSON → normalized row.
    Covers the "05. price"/"05_price" key-variant coalesce fallback,
    date-only timestamp normalization to midnight, and throttle-Note /
    empty-body surfacing as the ``error`` column (the reference raises;
    here errors are data).  ``ts_us`` is gated on error IS NULL because
    the unparseable-day fallback is current_timestamp (alpha_vantage_
    fx.py:59-61) — nondeterministic by design, so excluded from the
    differential surface."""
    raw = spark.createDataFrame(_AV_QUOTE_PAYLOADS, ["qid", "payload"])
    # rows are distinguished by parsed content (the compare is an
    # order-insensitive multiset), so qid never needs to survive the parse
    parsed = parse_alpha_vantage_quote(raw.select("payload"))
    return parsed.select(
        "symbol",
        F.round("price", 6).alias("price"),
        F.when(F.col("error").isNull(), ts_us("as_of")).alias("ts_us"),
        "currency",
        "source",
        "error",
    )


# ---------------------------------------------------------------------------
# multimodal plumbing (rows-only; deterministic fake decoder)
# ---------------------------------------------------------------------------


def q_media_decode(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column pipeline: documents' text bytes stand in for media
    payloads; mapInPandas fake decoder computes byte statistics.
    Oracle covers the exact columns (n_bytes) and 4-dp mean."""
    docs = _docs(spark, sf)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    decoded = decode_media(media, fake=True)
    return decoded.select(
        "media_id", "kind", "n_bytes", F.round("feat_mean", 4).alias("feat_mean")
    )



# near_dedup_corpus (MinHash-portable pairs -> CC -> anti-join) was
# CONSOLIDATED in r8 per the r5 verdict's sanction: its pair source is
# hash-gated by minhash_neardup_portable, its CC + representative +
# anti-join stages by near_dedup_corpus_exact, and the composed
# dedup_corpus operator stays covered by tests/test_dedup.py.


def _doc_urls(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic messy URLs derived from doc_id — the documents
    table has no URL column, so the fixture exercises every branch of
    the canonicalizer: mixed-case scheme/host, default + explicit
    ports, tracking params mixed into real ones, fragments, trailing
    slashes, compound public suffixes."""
    d = _docs(spark, sf).select("doc_id")
    hosts = F.array(
        F.lit("WWW.Example.COM"),
        F.lit("news.Example.co.uk:443"),
        F.lit("Blog.Test.ORG:8080"),
        F.lit("cdn.site.com:80"),
    )
    paths = F.array(F.lit("/a/b/"), F.lit("/a/b"), F.lit("/"), F.lit(""))
    queries = F.array(
        F.lit("?utm_source=feed&id=7"),
        F.lit("?id=7&utm_campaign=x&q=spark"),
        F.lit("?fbclid=abc"),
        F.lit(""),
    )
    frags = F.array(F.lit("#sec2"), F.lit(""))
    scheme = F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    url = F.concat(
        scheme,
        F.lit("://"),
        F.element_at(hosts, (F.col("doc_id") % 4 + 1).cast("int")),
        F.element_at(paths, (F.col("doc_id") % 3 + 1).cast("int")),
        F.element_at(queries, (F.col("doc_id") % 4 + 1).cast("int")),
        F.element_at(frags, (F.col("doc_id") % 2 + 1).cast("int")),
    )
    return d.select("doc_id", url.alias("url"))


def q_domain_split(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe train/val/test split: the hash fraction is keyed on
    the REGISTERED DOMAIN, not the doc id, so every page of a site
    lands in the same split (near-duplicate pages from one domain can
    never straddle train and eval — the contamination mode a per-doc
    split invites).  Same engine-portable md5 contract as corpus_split;
    still zero shuffles — the domain and its split label are scan-stage
    expressions."""
    from market_insights_app_spark.functions.urls import registered_domain
    from market_insights_app_spark.operators.sampling import split_column

    u = _doc_urls(spark, sf).select(
        "doc_id", registered_domain("url").alias("domain")
    )
    return u.select(
        "doc_id",
        "domain",
        split_column(
            F.col("domain"),
            [("train", 0.9), ("val", 0.05), ("test", 0.05)],
            salt="domain-v1",
        ),
    )


def q_dsir_select(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance selection (operators/sampling.dsir_select): rank
    the whole corpus by hashed-n-gram likelihood ratio against the
    English subset as the target distribution; top-100 by weight.
    Portable md5 bucketing makes the entire pipeline — tokenize,
    bigram, hash, smooth, log-ratio, per-doc sum — DuckDB-replayable."""
    from market_insights_app_spark.operators.sampling import dsir_select

    docs = _docs(spark, sf)
    return dsir_select(docs, docs.filter(F.col("lang") == "en"), k=100)


def q_url_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Web-corpus URL canonicalization (functions/urls.py): fragment /
    tracking-param / default-port / case / trailing-slash cleanup plus
    the eTLD+1-heuristic registered domain, all as scan-stage JVM
    expressions."""
    from market_insights_app_spark.functions.urls import (
        normalize_url,
        registered_domain,
    )

    u = _doc_urls(spark, sf)
    return u.select(
        "doc_id",
        "url",
        normalize_url("url").alias("norm_url"),
        registered_domain("url").alias("domain"),
    )


def q_domain_doc_cap(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain document cap (the CommonCrawl anti-spam stage): keep
    the 100 lowest-id docs per registered domain; emits survivors with
    their domain and the domain's pre-cap total."""
    from market_insights_app_spark.functions.urls import registered_domain
    from market_insights_app_spark.operators.pagination import top_k_per_group

    u = _doc_urls(spark, sf).select(
        "doc_id", registered_domain("url").alias("domain")
    )
    tot = u.groupBy("domain").agg(F.count(F.lit(1)).alias("domain_docs"))
    capped = top_k_per_group(u, ["domain"], [F.col("doc_id").asc()], 100)
    return capped.join(F.broadcast(tot), "domain").select(
        "doc_id", "domain", "domain_docs"
    )


def q_near_dedup_corpus_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-Jaccard near-dup CLUSTERING with a full differential
    oracle: all-pairs exact unigram Jaccard >= 0.5 (token-join, no
    cross product) -> connected components (iterative min-label
    propagation) -> (doc_id, cluster=min member id). Gives the CC
    machinery (operators/dedup.duplicate_clusters) a hash-match gate —
    the MinHash variant is inherently rows-only.  Uses the fused
    jaccard_clusters operator: on this corpus's dense small-vocabulary
    path the components come from the distinct-bitmask graph, so the
    8.9M-edge doc-pair set never materializes."""
    from market_insights_app_spark.operators.dedup import jaccard_clusters

    clusters = jaccard_clusters(_docs(spark, sf), threshold=0.5, shingle_n=1)
    return clusters.select(F.col("id").alias("doc_id"), "cluster")


def q_corpus_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5) of the documents
    corpus: md5-hash fraction of the doc id — reproducible across
    engines/runs/cluster sizes, zero shuffles, scan-level predicate.
    Returns per-split per-language counts (the stratification report a
    training pipeline logs)."""
    from market_insights_app_spark.operators.sampling import hash_split

    docs = hash_split(_docs(spark, sf), id_col="doc_id", salt="corpus-v1")
    return docs.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),  # integer sum: exact both engines
    )


def q_seq_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy sequence packing into 2048-token context windows over the
    corpus in doc_id order, reported per bin. The prefix sum underneath
    is the distributed range-partition + broadcast-offsets form, not a
    single-partition window — the oracle's plain SUM() OVER proves the
    distributed result identical."""
    from market_insights_app_spark.functions.text import token_count
    from market_insights_app_spark.operators.packing import pack_greedy

    docs = _docs(spark, sf).select("doc_id", token_count("text").alias("n_tokens"))
    packed = pack_greedy(docs, "doc_id", "n_tokens", target=2048)
    return packed.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def q_vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by term frequency with
    document frequency — the first artifact of tokenizer/vocab
    construction. Exact COUNT(DISTINCT doc) per token here; at 100 TB
    swap to approx_count_distinct (HLL sketch, map-side mergeable) —
    same plan shape, one shuffle on the token."""
    from market_insights_app_spark.functions.text import tokens as _tok

    docs = _docs(spark, sf)
    t = docs.select("doc_id", F.explode(_tok(F.lower(F.col("text")))).alias("tok"))
    return (
        t.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("tok"))
        .limit(100)
    )


def q_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub pass: per-kind match counts + md5 of the redacted
    text. The synthetic corpus contains no PII, so the query injects a
    deterministic email/phone/IP per document (same expression in the
    oracle) — the regex machinery is exercised on real positives, not
    vacuously on zero matches."""
    from market_insights_app_spark.functions.pii import pii_counts, redact_pii

    docs = _docs(spark, sf)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call +1 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" from 10.0.0."),
        (F.col("doc_id") % 256).cast("string"),
    )
    counts = pii_counts(aug)
    return docs.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["ssn"].alias("n_ssn"),
        counts["phone"].alias("n_phone"),
        counts["ip"].alias("n_ip"),
        F.md5(redact_pii(aug)).alias("redacted_md5"),
    )


def q_doc_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition/diversity signals per document
    (distinct-token ratio, top token/bigram share) — the filters a
    training-data pipeline thresholds on before dedup. Ratios emitted
    unrounded (IEEE divisions of exact integer counts are bit-identical
    across engines; rounding could land on decimal half-way points)."""
    from market_insights_app_spark.operators.quality import repetition_features

    return repetition_features(_docs(spark, sf))


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-language corpus balancing: downsample each
    language to ≈60 docs via the md5-hash-fraction predicate (pure
    per-row decision; group sizes broadcast). Returns the per-language
    before/after report."""
    from market_insights_app_spark.operators.sampling import stratified_cap

    docs = _docs(spark, sf)
    kept = stratified_cap(docs, "lang", cap=60, salt="strat-v1")
    before = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    after = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    return before.join(after, "lang", "left").select(
        "lang",
        "n_before",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )


def q_training_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """Composed training-data pipeline: quality gate + token floor ->
    exact dedup (first-wins on content fingerprint) -> per-language
    corpus stats. The shape every LLM-data pipeline runs; each stage is
    an operator already oracle-checked in isolation."""
    docs = _docs(spark, sf)
    feats = TX.quality_features("text")
    scored = docs.select(
        "doc_id",
        "lang",
        TX.md5_fingerprint("text").alias("fp"),
        feats["n_tokens"].alias("n_tokens"),
        TX.quality_score("text").alias("q"),
    )
    kept = scored.filter((F.col("q") >= 0.55) & (F.col("n_tokens") >= 20))
    from market_insights_app_spark.operators.dedup import first_wins

    deduped = first_wins(kept, ["fp"], "doc_id")
    return deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.round(F.col("q"), 6).cast("decimal(18,6)")).cast("double").alias("sum_q"),
    )

# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

TEXTML_ORACLES: dict[str, str] = {
    "dedup_exact": f"""
        SELECT md5({_NORM_SQL}) AS fp, min(doc_id) AS keeper, COUNT(*) AS n
        FROM documents GROUP BY 1
    """,
    "ngram_jaccard": f"""
        WITH norm AS (SELECT doc_id,
               list_distinct(list_filter(
                 string_split_regex({_NORM_SQL}, '\\s+'), x -> x <> '')) AS grams
             FROM documents),
        d AS (SELECT doc_id, unnest(grams) AS g FROM norm),
        q AS (SELECT DISTINCT unnest(grams) AS g FROM norm WHERE doc_id = 0),
        qs AS (SELECT COUNT(*) AS qn FROM q),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM d GROUP BY 1),
        inter AS (SELECT d.doc_id, COUNT(*) AS i FROM d JOIN q USING (g) GROUP BY 1)
        SELECT s.doc_id,
               round(COALESCE(i, 0) / (sz + qn - COALESCE(i, 0)), 6) AS jaccard
        FROM sizes s LEFT JOIN inter USING (doc_id) CROSS JOIN qs
    """,
    "tokens_count": f"""
        SELECT doc_id,
               len({_TOKS_SQL}) AS n_tokens,
               len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe
        FROM documents
    """,
    "text_quality": f"""
        WITH f AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 len({_TOKS_SQL}) AS n_tokens,
                 len(list_filter({_TOKS_SQL},
                   x -> lower(x) IN ('the','a','and','of','to','in','is','it','that','for')))
                   AS n_stop,
                 length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct
          FROM documents)
        SELECT doc_id, n_chars, n_tokens,
               round(CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE) / n_tokens
                          ELSE 0.0 END, 6) AS stopword_ratio,
               round(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars
                          ELSE 0.0 END, 6) AS punct_ratio,
               round(least(1.0, n_tokens / 50.0) * 0.4
                     + least(1.0, (CASE WHEN n_tokens > 0
                                        THEN CAST(n_stop AS DOUBLE) / n_tokens
                                        ELSE 0.0 END) * 5.0) * 0.3
                     + greatest(0.0, 1.0 - (CASE WHEN n_chars > 0
                                                 THEN CAST(n_punct AS DOUBLE) / n_chars
                                                 ELSE 0.0 END) * 4.0) * 0.3, 6) AS quality
        FROM f
    """,
    "lang_id": f"""
        WITH t AS (SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')
                 AS toks
             FROM documents),
        h AS (SELECT doc_id,
               len(list_filter(toks, x -> x IN ('the','and','of','is','to','a','in'))) AS h_en,
               len(list_filter(toks, x -> x IN ('el','la','de','que','los','una'))) AS h_es,
               len(list_filter(toks, x -> x IN ('le','la','les','des','est','une'))) AS h_fr,
               len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht'))) AS h_de,
               len(list_filter(toks, x -> x IN ('的','是','了','在'))) AS h_zh
             FROM t)
        SELECT doc_id,
               CASE WHEN h_en > 0 AND h_en = best THEN 'en'
                    WHEN h_es > 0 AND h_es = best THEN 'es'
                    WHEN h_fr > 0 AND h_fr = best THEN 'fr'
                    WHEN h_de > 0 AND h_de = best THEN 'de'
                    WHEN h_zh > 0 AND h_zh = best THEN 'zh'
                    ELSE 'und' END AS pred_lang
        FROM (SELECT *, greatest(h_en, h_es, h_fr, h_de, h_zh) AS best FROM h)
    """,
    "impact_classify": """
        SELECT impact, COUNT(*) AS n FROM (
          SELECT CASE WHEN regexp_matches(lower(text), 'dup|slow') THEN 'High'
                      WHEN regexp_matches(lower(text), 'merge|hash') THEN 'Medium'
                      ELSE 'Low' END AS impact
          FROM documents)
        GROUP BY impact
    """,
    "tag_split": f"""
        SELECT tok, COUNT(*) AS n
        FROM (SELECT unnest({_TOKS_SQL}) AS tok FROM documents)
        GROUP BY tok
    """,
    "level_extract": """
        SELECT event_id,
               CAST(unnest(regexp_extract_all(props, '[0-9]+(\\.[0-9]+)?')) AS DOUBLE)
                 AS level
        FROM events
    """,
    "fingerprint_docs": f"""
        SELECT doc_id,
               md5({_NORM_SQL}) AS fp,
               list_reduce(
                 list_transform(regexp_extract_all({_NORM_SQL}, '.'),
                                x -> CAST(ord(x) AS BIGINT)),
                 (a, b) -> (a * 257 + b) % 2147483647) AS rh
        FROM documents
    """,
    "embedding_topk": """
        WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                   FROM embeddings WHERE vec_id = 0),
        e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
              FROM embeddings)
        SELECT vec_id,
               round(
                 list_reduce(list_transform(list_zip(ev, qv), p -> p[1] * p[2]),
                             (a, b) -> a + b)
                 / NULLIF(
                     sqrt(list_reduce(list_transform(ev, x -> x * x), (a, b) -> a + b))
                     * sqrt(list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b)),
                     0), 6) AS cosine
        FROM e CROSS JOIN q
        ORDER BY cosine DESC, vec_id ASC
        LIMIT 10
    """,
    "embedding_neardup": """
        WITH e AS (SELECT vec_id, label,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings)
        SELECT a, b, cosine FROM (
          SELECT l.vec_id AS a, r.vec_id AS b,
                 round(
                   list_reduce(list_transform(list_zip(l.v, r.v), p -> p[1] * p[2]),
                               (x, y) -> x + y)
                   / NULLIF(
                       sqrt(list_reduce(list_transform(l.v, x -> x * x), (x, y) -> x + y))
                       * sqrt(list_reduce(list_transform(r.v, x -> x * x), (x, y) -> x + y)),
                       0), 6) AS cosine
          FROM e l JOIN e r ON l.label = r.label AND l.vec_id < r.vec_id)
        WHERE cosine >= 0.40
    """,
    "connector_fx_parse": """
        SELECT 'EURUSD' AS symbol, CAST(1.0825 AS DOUBLE) AS price,
               epoch_us(TIMESTAMP '2024-03-01 10:15:30') AS ts_us,
               'USD' AS currency, 'alpha_vantage_fx' AS source
    """,
    "connector_yahoo_parse": """
        SELECT 'AAPL' AS symbol, CAST(190.25 AS DOUBLE) AS price,
               epoch_us(to_timestamp(1709290120)) AS ts_us,
               'USD' AS currency, 'yahoo' AS source
    """,
    "connector_av_quote_parse": """
        SELECT * FROM (VALUES
          ('IBM',  239.5,  epoch_us(TIMESTAMP '2024-03-01 00:00:00'),
           CAST(NULL AS VARCHAR), 'alpha_vantage', CAST(NULL AS VARCHAR)),
          ('MSFT', 411.25, epoch_us(TIMESTAMP '2024-02-29 00:00:00'),
           CAST(NULL AS VARCHAR), 'alpha_vantage', CAST(NULL AS VARCHAR)),
          (CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), 'alpha_vantage',
           'API call frequency exceeded, please slow down'),
          (CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), 'alpha_vantage', 'empty or malformed quote')
        ) t(symbol, price, ts_us, currency, source, error)
    """,
    "media_decode": f"""
        -- Byte-based to match the Spark fake decoder (UTF-8 payload byte
        -- stats), not codepoint-based: DuckDB can't index blob bytes, so
        -- decode via hex() pairs. Holds for non-ASCII corpora too.
        WITH c AS (SELECT doc_id,
                          regexp_extract_all(hex(encode(text)), '..') AS hx
                   FROM documents)
        SELECT doc_id AS media_id, 'image' AS kind,
               CAST(len(hx) AS INT) AS n_bytes,
               round(COALESCE(CAST(list_sum(list_transform(hx, x ->
                       (strpos('0123456789ABCDEF', x[1]) - 1) * 16
                     + (strpos('0123456789ABCDEF', x[2]) - 1))) AS DOUBLE)
                     / NULLIF(len(hx), 0), 0.0), 4) AS feat_mean
        FROM c
    """,
    "media_features": """
        -- Full differential twin of the decode→resize→features chain:
        -- the fake decoder tiles payload bytes cyclically into an
        -- (8,8,3) frame and the 8×8 bilinear resize is the identity, so
        -- channel c of flat pixel k is payload byte (3k + c) mod n.
        -- numpy's mean/std over 64 samples are exact-sum/64 ⇒ stddev_pop
        -- matches bit-for-bit at 4 dp.
        WITH c AS (SELECT doc_id,
                          regexp_extract_all(hex(encode(text)), '..') AS hx
                   FROM documents),
        px AS (SELECT doc_id, ks.k AS k, ch.c AS ch,
                      CASE WHEN len(hx) = 0 THEN 0.0 ELSE CAST(
                          (strpos('0123456789ABCDEF', hx[((3 * ks.k + ch.c) % len(hx)) + 1][1]) - 1) * 16
                        + (strpos('0123456789ABCDEF', hx[((3 * ks.k + ch.c) % len(hx)) + 1][2]) - 1)
                      AS DOUBLE) END AS v
               FROM c,
                    (SELECT unnest(range(0, 64)) AS k) ks,
                    (SELECT unnest(range(0, 3)) AS c) ch)
        SELECT doc_id AS media_id,
               round(avg(v) FILTER (ch = 0), 4) AS mean_r,
               round(stddev_pop(v) FILTER (ch = 0), 4) AS std_r,
               round(avg(v) FILTER (ch = 1), 4) AS mean_g,
               round(stddev_pop(v) FILTER (ch = 1), 4) AS std_g,
               round(avg(v) FILTER (ch = 2), 4) AS mean_b,
               round(stddev_pop(v) FILTER (ch = 2), 4) AS std_b
        FROM px GROUP BY doc_id
    """,
}


# events.ts ns→µs truncation (see plans/core_oracles.EV_SUB)
from market_insights_app_spark.plans.core_oracles import EV_SUB as _EV_SUB  # noqa: E402

TEXTML_ORACLES = {
    k: v.replace("FROM events", f"FROM {_EV_SUB} events")
    for k, v in TEXTML_ORACLES.items()
}


# q_ngram_jaccard_bigram retired in r9 (sanctioned consolidation,
# registry.py pre-stage note): it was ngram_jaccard with n=2 instead of
# n=1 — the same ngram_jaccard_vs_query code path, whose shingle
# construction stays oracle-gated via ★ngram_jaccard and covered at
# n∈{1,2,3} by tests/test_dedup_reference.py.


def q_timestamp_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """F2 (alpha_vantage_fx.py:50-61): normalize the reference's three
    accepted timestamp string shapes back to timestamps — derived
    deterministically from events.ts, round-tripped through strings."""
    from market_insights_app_spark.functions.scalars import normalize_timestamp

    ev = load_table(spark, sf, "events")
    shaped = ev.select(
        "event_id",
        F.when(
            F.col("event_id") % 3 == 0,
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        )
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .otherwise(F.date_format("ts", "yyyy-MM-dd"))
        .alias("raw"),
    )
    return shaped.select(
        "event_id", ts_us(normalize_timestamp("raw")).alias("ts_us")
    )


TEXTML_ORACLES["corpus_split"] = """
    WITH s AS (
      SELECT doc_id, lang, n_chars,
             CAST(('0x' || substr(md5('corpus-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) / 4294967296.0 AS frac
      FROM documents)
    SELECT CASE WHEN frac < 0.9 THEN 'train'
                WHEN frac < 0.95 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM s GROUP BY 1, 2
"""

# seed constants for the portable-MinHash oracle — the SAME splitmix
# affine params the Spark side uses (dedup._affine_params), inlined as a
# VALUES list so DuckDB reproduces the signatures bit-for-bit
from market_insights_app_spark.operators.dedup import (  # noqa: E402
    MERSENNE_P as _P,
)
from market_insights_app_spark.operators.dedup import (  # noqa: E402
    _affine_params,
)

_SEEDS_SQL = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in ((i, _affine_params(i)) for i in range(32))
)

# The portable MinHash-LSH pipeline as a reusable CTE chain (through
# exact-Jaccard verified `pairs`) — shared by the pair-level oracle and
# the end-to-end corpus-dedup oracle so both gate the identical stages.
_PORTABLE_PAIR_CTES = f"""
    norm AS (SELECT doc_id,
           list_filter(string_split_regex({_NORM_SQL}, '\\s+'), x -> x <> '') AS toks
         FROM documents),
    sets AS (SELECT doc_id,
           list_distinct(list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1])) AS sh
         FROM norm),
    g AS (SELECT doc_id, unnest(sh) AS g FROM sets),
    gh AS (SELECT doc_id,
           CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % {_P} AS h
         FROM g),
    seeds(seed, a, b) AS (VALUES {_SEEDS_SQL}),
    mh AS (SELECT doc_id, seed, MIN((a * h + b) % {_P}) AS mh
           FROM gh CROSS JOIN seeds GROUP BY 1, 2),
    bandkey AS (SELECT doc_id, seed // 4 AS band,
                       string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS key
                FROM mh GROUP BY doc_id, seed // 4),
    cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
             FROM bandkey x JOIN bandkey y
               ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
    est AS (SELECT c.a, c.b,
                   SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS m
            FROM cand c
            JOIN mh ma ON ma.doc_id = c.a
            JOIN mh mb ON mb.doc_id = c.b AND mb.seed = ma.seed
            GROUP BY 1, 2),
    keep AS (SELECT a, b FROM est WHERE m / 32.0 >= 0.25),
    pairs AS (SELECT k.a, k.b,
                     len(list_intersect(sa.sh, sb.sh)) AS i,
                     len(sa.sh) AS na, len(sb.sh) AS nb
              FROM keep k
              JOIN sets sa ON sa.doc_id = k.a
              JOIN sets sb ON sb.doc_id = k.b)"""

TEXTML_ORACLES["minhash_neardup_portable"] = f"""
    WITH {_PORTABLE_PAIR_CTES}
    SELECT a, b,
           round(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
    FROM pairs
    WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5
"""

TEXTML_ORACLES["seq_pack"] = """
    WITH s AS (SELECT doc_id,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
                           x -> x <> '')) AS n
         FROM documents),
    c AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id) AS cs FROM s)
    SELECT CAST(floor((cs - n) / 2048.0) AS BIGINT) AS bin,
           COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS sum_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c GROUP BY 1
"""

TEXTML_ORACLES["vocab_topk"] = """
    WITH t AS (SELECT doc_id,
           unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                              x -> x <> '')) AS tok
         FROM documents)
    SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM t GROUP BY 1
    ORDER BY tf DESC, tok ASC
    LIMIT 100
"""

# PII-scrub oracle: the SAME patterns the Spark side uses (Java regex /
# RE2 common subset), the same injected-PII augmentation, the same
# redaction order
from market_insights_app_spark.functions.pii import PII_RULES as _PII  # noqa: E402

_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or call +1 555-01'"
    " || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')"
    " || ' from 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)"
)
_PII_RED_SQL = "aug"
for _kind, _pat, _tok in _PII:
    _PII_RED_SQL = f"regexp_replace({_PII_RED_SQL}, '{_pat}', '{_tok}', 'g')"

TEXTML_ORACLES["pii_scrub"] = f"""
    WITH a AS (SELECT doc_id, {_AUG_SQL} AS aug FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(aug, '{_PII[0][1]}')) AS n_email,
           len(regexp_extract_all(aug, '{_PII[1][1]}')) AS n_ssn,
           len(regexp_extract_all(aug, '{_PII[2][1]}')) AS n_phone,
           len(regexp_extract_all(aug, '{_PII[3][1]}')) AS n_ip,
           md5({_PII_RED_SQL}) AS redacted_md5
    FROM a
"""

# 32-bit portable-SimHash oracle: bit votes and fingerprint assembly are
# generated expressions (32 SUM(CASE)s / 32 CASE bit masks), mirroring
# the Spark groupBy votes exactly
_SIM_VOTES_SQL = ",\n           ".join(
    f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(32)
)
_SIM_FP_SQL = " + ".join(f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(32))

TEXTML_ORACLES["simhash_neardup_portable"] = f"""
    WITH norm AS (SELECT doc_id,
           list_filter(string_split_regex({_NORM_SQL}, '\\s+'), x -> x <> '') AS toks
         FROM documents),
    g AS (SELECT doc_id, unnest(list_distinct(toks)) AS g FROM norm),
    gh AS (SELECT doc_id,
           CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) AS h
         FROM g),
    votes AS (SELECT doc_id,
           {_SIM_VOTES_SQL}
         FROM gh GROUP BY 1),
    fp AS (SELECT doc_id, CAST({_SIM_FP_SQL} AS BIGINT) AS h FROM votes),
    ch AS (SELECT doc_id, h, ci, (h >> (ci * 8)) & 255 AS cv
           FROM fp CROSS JOIN (VALUES (0), (1), (2), (3)) c(ci))
    SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
           CAST(bit_count(xor(x.h, y.h)) AS INTEGER) AS hamming
    FROM ch x JOIN ch y
      ON x.ci = y.ci AND x.cv = y.cv AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.h, y.h)) <= 3
"""

TEXTML_ORACLES["doc_repetition"] = """
    WITH tk AS (SELECT doc_id,
           list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                       x -> x <> '') AS toks
         FROM documents),
    t AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
    pt AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                  COUNT(*) AS n_distinct, MAX(c) AS top_tok
           FROM tc GROUP BY 1),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1])) AS g
           FROM tk),
    bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    pb AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                  MAX(c) AS top_big
           FROM bc GROUP BY 1)
    SELECT pt.doc_id, n_tokens,
           n_distinct / CAST(n_tokens AS DOUBLE) AS distinct_ratio,
           top_tok / CAST(n_tokens AS DOUBLE) AS top_token_share,
           top_big / CAST(n_bigrams AS DOUBLE) AS top_bigram_share
    FROM pt LEFT JOIN pb USING (doc_id)
"""

TEXTML_ORACLES["stratified_sample"] = """
    WITH c AS (SELECT lang, COUNT(*) AS gn FROM documents GROUP BY 1),
    k AS (SELECT d.lang FROM documents d JOIN c USING (lang)
          WHERE CAST(('0x' || substr(md5('strat-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) / 4294967296.0
                < least(1.0, 60.0 / gn)),
    a AS (SELECT lang, COUNT(*) AS n_kept FROM k GROUP BY 1)
    SELECT c.lang, gn AS n_before, COALESCE(n_kept, 0) AS n_kept
    FROM c LEFT JOIN a USING (lang)
"""

# shared CTE: the deterministic messy-URL fixture + canonicalization,
# replaying functions/urls.py step for step
_URL_CTES = """
    u AS (SELECT doc_id,
                 (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END)
                 || '://'
                 || (['WWW.Example.COM', 'news.Example.co.uk:443',
                      'Blog.Test.ORG:8080', 'cdn.site.com:80'])[CAST(doc_id % 4 + 1 AS INT)]
                 || (['/a/b/', '/a/b', '/', ''])[CAST(doc_id % 3 + 1 AS INT)]
                 || (['?utm_source=feed&id=7', '?id=7&utm_campaign=x&q=spark',
                      '?fbclid=abc', ''])[CAST(doc_id % 4 + 1 AS INT)]
                 || (['#sec2', ''])[CAST(doc_id % 2 + 1 AS INT)] AS url
          FROM documents),
    parts AS (
      SELECT doc_id, url,
             regexp_replace(url, '#.*$', '') AS nofrag
      FROM u),
    comp AS (
      SELECT doc_id, url,
             lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
             regexp_extract(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS rawpath,
             regexp_extract(nofrag, '\\?([^#]*)', 1) AS rawq
      FROM parts),
    canon AS (
      SELECT doc_id, url, scheme,
             CASE WHEN scheme = 'http'  AND hostport LIKE '%:80'
                    THEN regexp_replace(hostport, ':80$', '')
                  WHEN scheme = 'https' AND hostport LIKE '%:443'
                    THEN regexp_replace(hostport, ':443$', '')
                  ELSE hostport END AS host,
             CASE WHEN len(rawpath) > 1 AND rawpath LIKE '%/'
                  THEN regexp_replace(rawpath, '/$', '') ELSE rawpath END AS path,
             array_to_string(list_filter(string_split(rawq, '&'),
               p -> len(p) > 0 AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)=')),
               '&') AS qstr,
             regexp_replace(lower(regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), ':[0-9]+$', '') AS bare_host
      FROM comp),
    dom AS (
      SELECT doc_id, url, scheme, host, path, qstr, bare_host,
             string_split(bare_host, '.') AS labels
      FROM canon),
    urls AS (
      SELECT doc_id, url,
             scheme || '://' || host || path ||
               CASE WHEN len(qstr) > 0 THEN '?' || qstr ELSE '' END AS norm_url,
             CASE WHEN len(labels) >= 3
                       AND labels[-2] || '.' || labels[-1] IN
                           ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
                            'org.au','co.jp','ne.jp','or.jp','com.br','com.mx',
                            'co.in','co.kr','com.cn','com.tr')
                    THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                  WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
                  ELSE bare_host END AS domain
      FROM dom)"""

TEXTML_ORACLES["domain_split"] = f"""
    WITH {_URL_CTES}
    SELECT doc_id, domain,
           CASE WHEN frac < 0.9 THEN 'train'
                WHEN frac < 0.95 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, domain,
                 CAST(('0x' || substr(md5('domain-v1:' || domain), 1, 8))
                      AS BIGINT) / 4294967296.0 AS frac
          FROM urls)
"""

TEXTML_ORACLES["dsir_select"] = f"""
    WITH dt AS (SELECT doc_id, lang,
                       list_filter(string_split_regex({_NORM_SQL}, '\\s+'),
                                   x -> x <> '') AS tk
                FROM documents),
    grams AS (SELECT doc_id, lang,
                     unnest(list_concat(tk,
                       list_transform(range(1, len(tk)),
                                      i -> tk[i] || ' ' || tk[i + 1]))) AS g
              FROM dt),
    bk AS (SELECT doc_id, lang,
                  CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % 1024 AS b
           FROM grams),
    tc AS (SELECT b, COUNT(*) AS tc FROM bk WHERE lang = 'en' GROUP BY 1),
    rc AS (SELECT b, COUNT(*) AS rc FROM bk GROUP BY 1),
    lr AS (SELECT rc.b,
                  ln((COALESCE(tc.tc, 0) + 1.0)
                     / CAST((SELECT COUNT(*) FROM bk WHERE lang = 'en') + 1024 AS DOUBLE))
                - ln((rc.rc + 1.0)
                     / CAST((SELECT COUNT(*) FROM bk) + 1024 AS DOUBLE)) AS lr
           FROM rc LEFT JOIN tc USING (b)),
    db AS (SELECT doc_id, b, COUNT(*) AS n FROM bk GROUP BY 1, 2),
    w AS (SELECT doc_id, round(SUM(n * lr), 6) AS weight
          FROM db JOIN lr USING (b) GROUP BY 1)
    SELECT doc_id, weight FROM w
    ORDER BY weight DESC, doc_id ASC LIMIT 100
"""

TEXTML_ORACLES["url_normalize"] = f"""
    WITH {_URL_CTES}
    SELECT doc_id, url, norm_url, domain FROM urls
"""

TEXTML_ORACLES["domain_doc_cap"] = f"""
    WITH {_URL_CTES},
    tot AS (SELECT domain, COUNT(*) AS domain_docs FROM urls GROUP BY domain),
    ranked AS (SELECT doc_id, domain,
                      row_number() OVER (PARTITION BY domain ORDER BY doc_id ASC) AS rn
               FROM urls)
    SELECT r.doc_id, r.domain, t.domain_docs
    FROM ranked r JOIN tot t USING (domain)
    WHERE r.rn <= 100
"""

TEXTML_ORACLES["near_dedup_corpus_exact"] = f"""
    WITH RECURSIVE
    norm AS (SELECT doc_id,
           list_distinct(list_filter(
             string_split_regex({_NORM_SQL}, '\\s+'), x -> x <> '')) AS grams
         FROM documents),
    d AS (SELECT doc_id, unnest(grams) AS g FROM norm),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM d GROUP BY 1),
    inter AS (SELECT l.doc_id AS a, r.doc_id AS b, COUNT(*) AS i
              FROM d l JOIN d r ON l.g = r.g AND l.doc_id < r.doc_id
              GROUP BY 1, 2),
    pairs AS (SELECT a, b FROM inter
              JOIN sizes sa ON inter.a = sa.doc_id
              JOIN sizes sb ON inter.b = sb.doc_id
              WHERE i / (sa.sz + sb.sz - i) >= 0.5),
    edges AS (SELECT a AS x, b AS y FROM pairs
              UNION ALL SELECT b AS x, a AS y FROM pairs),
    nodes AS (SELECT DISTINCT x AS id FROM edges),
    -- min reachable node id == connected-component representative ==
    -- the min member id that duplicate_clusters converges to
    reach(id, r) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.x, re.r FROM edges e JOIN reach re ON e.y = re.id
    )
    SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id
"""

TEXTML_ORACLES["timestamp_normalize"] = """
    SELECT event_id,
           epoch_us(CASE
             WHEN event_id % 3 = 0 THEN strptime(strftime(ts, '%Y-%m-%dT%H:%M:%SZ'),
                                                 '%Y-%m-%dT%H:%M:%SZ')
             WHEN event_id % 3 = 1 THEN strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
                                                 '%Y-%m-%d %H:%M:%S')
             ELSE strptime(strftime(ts, '%Y-%m-%d'), '%Y-%m-%d')
           END) AS ts_us
    FROM (SELECT event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events) e
"""

TEXTML_ORACLES["training_corpus"] = f"""
    WITH f AS (
      SELECT doc_id, lang,
             md5({_NORM_SQL}) AS fp,
             len({_TOKS_SQL}) AS n_tokens,
             len(list_filter({_TOKS_SQL},
               x -> lower(x) IN ('the','a','and','of','to','in','is','it','that','for')))
               AS n_stop,
             length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
             length(text) AS n_chars
      FROM documents),
    scored AS (
      SELECT doc_id, lang, fp, n_tokens,
             least(1.0, n_tokens / 50.0) * 0.4
             + least(1.0, (CASE WHEN n_tokens > 0
                                THEN CAST(n_stop AS DOUBLE) / n_tokens
                                ELSE 0.0 END) * 5.0) * 0.3
             + greatest(0.0, 1.0 - (CASE WHEN n_chars > 0
                                         THEN CAST(n_punct AS DOUBLE) / n_chars
                                         ELSE 0.0 END) * 4.0) * 0.3 AS q
      FROM f),
    kept AS (SELECT * FROM scored WHERE q >= 0.55 AND n_tokens >= 20),
    deduped AS (
      SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
                     FROM kept) WHERE rn = 1)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CAST(round(q, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_q
    FROM deduped GROUP BY lang
"""


def q_doc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window chunking for a training/RAG pipeline: 64-token
    chunks with 16-token overlap. Zero shuffle — tokenize + posexplode
    happen map-side where the document lives (operators/packing.py:
    chunk_tokens)."""
    from market_insights_app_spark.operators.packing import chunk_tokens

    out = chunk_tokens(_docs(spark, sf), chunk_size=64, overlap=16)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk_text",
        F.col("chunk_tokens").cast("long").alias("chunk_tokens"),
    )


def q_tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Term frequencies and document
    frequencies are two groupBys (the df side reduces to |vocab| rows —
    AQE broadcasts it back into the join); the per-doc rank orders by
    the integer pair (tf desc, df asc) so cross-engine ordering never
    depends on float math, with the float tfidf emitted alongside."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
    )


TEXTML_ORACLES["doc_chunks"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id, toks, len(toks) AS n, gs.start AS start
          FROM t, LATERAL (SELECT unnest(range(0, CAST(greatest(len(toks) - 17, 0) + 1 AS BIGINT), 48)) AS start) gs)
    SELECT doc_id,
           start // 48 AS chunk_idx,
           array_to_string(list_slice(toks, start + 1, least(start + 64, n)), ' ') AS chunk_text,
           CAST(least(64, n - start) AS BIGINT) AS chunk_tokens
    FROM s
"""

TEXTML_ORACLES["tfidf_top_terms"] = """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, tf, df,
             round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dfq USING (term) CROSS JOIN nd),
    ranked AS (
      SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                     ORDER BY tf DESC, df ASC, term ASC) AS INT) AS rk
      FROM scored)
    SELECT doc_id, term, tf, df, tfidf, rk FROM ranked WHERE rk <= 3
"""


def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: docs with doc_id % 97 == 0 stand in
    for an eval benchmark; every other doc sharing a word trigram with
    that set is removed (operators/dedup.py: decontaminate — broadcast
    eval-gram semi-join, one wide exchange on contaminated ids)."""
    from market_insights_app_spark.operators.dedup import decontaminate

    docs = _docs(spark, sf)
    eval_set = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    kept = decontaminate(train, eval_set, shingle_n=3)
    return kept.select("doc_id", "source", "n_chars")


def q_fuzzy_match(spark: SparkSession, sf: str) -> DataFrame:
    """Blocked entity resolution on customer names: pairs agreeing on
    (nation, mktsegment) within Levenshtein distance 2
    (operators/dedup.py: blocked_fuzzy_pairs — the quadratic edit-
    distance verify is confined to each block by the equi-join)."""
    from market_insights_app_spark.operators.dedup import blocked_fuzzy_pairs

    cust = load_table(spark, sf, "customer")
    return blocked_fuzzy_pairs(
        cust, "c_custkey", "c_name", ["c_nationkey", "c_mktsegment"], max_distance=2
    )


def q_inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted index over the corpus: term → document frequency +
    head of the sorted posting list (10 smallest doc_ids).

    Aggregation state is bounded even for stop-word terms: the posting
    head comes from a row_number ranking window (rank functions stream —
    no per-group buffering) filtered to rn <= 10 BEFORE the
    collect_list, so no aggregate ever holds more than 10 ids. Document
    frequency is a separate map-side-combinable count whose exchange
    carries one row per vocabulary term; the final join is between two
    term-partitioned sides."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf)
    terms = docs.select(
        "doc_id",
        F.explode(F.array_distinct(TX.norm_tokens("text"))).alias(
            "term"
        ),
    )
    dfs = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    heads = (
        terms.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .groupBy("term")
        .agg(
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "postings_head"
            )
        )
    )
    return heads.join(dfs, "term").select("term", "df", "postings_head")


TEXTML_ORACLES["decontaminate"] = f"""
    WITH toks AS (SELECT doc_id, list_filter(string_split({_NORM_SQL}, ' '),
                                             x -> x <> '') AS w
                  FROM documents),
    grams AS (SELECT doc_id,
                     unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
                            i -> array_to_string(w[i:i+2], ' '))) AS g
              FROM toks),
    eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
    contaminated AS (SELECT DISTINCT t.doc_id
                     FROM grams t JOIN eval_g e USING (g)
                     WHERE t.doc_id % 97 <> 0)
    SELECT d.doc_id, d.source, d.n_chars FROM documents d
    WHERE d.doc_id % 97 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
"""

TEXTML_ORACLES["fuzzy_match"] = """
    SELECT l.c_custkey AS a, r.c_custkey AS b,
           CAST(levenshtein(l.c_name, r.c_name) AS INT) AS distance
    FROM customer l JOIN customer r
      ON l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment
     AND l.c_custkey < r.c_custkey
    WHERE levenshtein(l.c_name, r.c_name) <= 2
"""

TEXTML_ORACLES["inverted_index"] = f"""
    WITH t AS (SELECT DISTINCT doc_id,
                      unnest(list_filter(string_split({_NORM_SQL}, ' '),
                                         x -> x <> '')) AS term
               FROM documents)
    SELECT term, COUNT(*) AS df,
           array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',') AS postings_head
    FROM t GROUP BY term
"""


def q_media_features(spark: SparkSession, sf: str) -> DataFrame:
    """Image-feature pipeline over binary media columns: fake decode
    (codec container-blocked) → REAL numpy bilinear resize to 8×8 →
    per-channel mean/std (operators/multimodal.py). Fully
    oracle-checked: the fake decode tiles payload bytes into the
    (8,8,3) frame deterministically, so the whole pipeline is
    re-expressible as byte arithmetic over hex pairs in DuckDB."""
    from market_insights_app_spark.operators.multimodal import (
        image_channel_features,
        resize_media,
    )

    docs = _docs(spark, sf)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    resized = resize_media(media, 8, 8, fake=True).select(
        "media_id",
        F.lit("image").alias("kind"),
        F.col("pixels").alias("payload"),
        "width",
        "height",
    )
    feats = image_channel_features(resized, fake=True)
    return feats.select(
        "media_id",
        *[F.round(f"{m}_{ch}", 4).alias(f"{m}_{ch}")
          for ch in "rgb" for m in ("mean", "std")],
    )


def q_mixture_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Training-data mixing: resample sources src1/src2/src3 to a
    50/30/20 target mixture (operators/sampling.mixture_sample — pure
    hash predicate selection, largest feasible corpus). Returns the
    surviving (doc_id, source) rows so the differential check covers
    the exact selection, not just the counts."""
    from market_insights_app_spark.operators.sampling import mixture_sample

    docs = _docs(spark, sf)
    kept = mixture_sample(
        docs, {"src1": 0.5, "src2": 0.3, "src3": 0.2}, group_col="source"
    )
    return kept.select("doc_id", "source")


TEXTML_ORACLES["mixture_sample"] = """
    WITH w(source, w) AS (VALUES ('src1', 0.5), ('src2', 0.3), ('src3', 0.2)),
    c AS (SELECT source, COUNT(*) AS gn FROM documents GROUP BY 1),
    j AS (SELECT c.source, c.gn, CAST(w.w AS DOUBLE) AS w
          FROM c JOIN w USING (source)),
    n AS (SELECT min(CAST(floor(gn / w) AS BIGINT)) AS N FROM j),
    r AS (SELECT j.source, least(1.0, n.N * j.w / j.gn) AS rate FROM j, n)
    SELECT d.doc_id, d.source
    FROM documents d JOIN r USING (source)
    WHERE CAST(('0x' || substr(md5('mix-v1:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0 < r.rate
"""


def q_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    """Int8 embedding quantization (operators/similarity.quantize_int8):
    per-vector symmetric scale + codes, folded to scalar outputs
    (sum + head string) so the differential hash covers the exact code
    values without array-representation skew between engines."""
    from market_insights_app_spark.operators.similarity import quantize_int8

    q = quantize_int8(_emb(spark, sf))
    return q.select(
        "vec_id",
        "scale",
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("codes_sum"),
        F.array_join(F.slice("codes", 1, 8), ",").alias("codes_head"),
    )


TEXTML_ORACLES["quantize_int8"] = """
    WITH s AS (
      SELECT vec_id,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
             embedding
      FROM embeddings),
    q AS (
      SELECT vec_id, scale,
             list_transform(embedding,
               x -> CAST(greatest(-127.0, least(127.0,
                         floor(CAST(x AS DOUBLE) / scale + 0.5))) AS BIGINT))
               AS codes
      FROM s WHERE scale > 0)
    SELECT vec_id, scale,
           CAST(list_sum(codes) AS BIGINT) AS codes_sum,
           array_to_string(codes[1:8], ',') AS codes_head
    FROM q
"""


# ---------------------------------------------------------------------------
# ANN oracles — full DuckDB twins for the LSH / IVF approximate top-k.
#
# The hyperplanes/centroid math is deterministic and engine-portable, so
# the "approximate" queries are exactly reproducible in SQL: the planes
# are embedded as double literals (same IEEE values Spark gets via
# F.lit), and every dot product uses the index-ordered
# list_zip/list_reduce pattern already proven bit-identical to Spark's
# zip_with/aggregate by the embedding_topk oracle. Testdata embeddings
# are dim-64 at every sf (asserted in tests).
# ---------------------------------------------------------------------------


def _dot_cols_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), "
        "(x, y) -> x + y)"
    )


def _cos_sql(a: str, b: str) -> str:
    na = f"sqrt(list_reduce(list_transform({a}, x -> x * x), (x, y) -> x + y))"
    nb = f"sqrt(list_reduce(list_transform({b}, x -> x * x), (x, y) -> x + y))"
    return f"({_dot_cols_sql(a, b)} / NULLIF({na} * {nb}, 0))"


def _sig_sql(vec_expr: str) -> str:
    from market_insights_app_spark.operators.similarity import (
        _deterministic_hyperplanes,
    )

    terms = []
    for i, plane in enumerate(_deterministic_hyperplanes(64, 8)):
        arr = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
        terms.append(
            f"CASE WHEN {_dot_cols_sql(vec_expr, arr)} >= 0 "
            f"THEN {1 << i} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


TEXTML_ORACLES["ann_lsh_topk"] = f"""
    WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
               FROM embeddings WHERE vec_id = 0),
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
          FROM embeddings),
    sigs AS (SELECT vec_id, ev, {_sig_sql('ev')} AS sig FROM e),
    qs AS (SELECT {_sig_sql('qv')} AS qsig FROM q)
    SELECT vec_id, round({_cos_sql('ev', 'qv')}, 6) AS cosine
    FROM sigs CROSS JOIN q CROSS JOIN qs
    WHERE bit_count(xor(CAST(sig AS BIGINT), CAST(qsig AS BIGINT))) <= 3
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
"""

TEXTML_ORACLES["ivf_topk"] = f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev
               FROM embeddings),
    q AS (SELECT ev AS qv FROM e WHERE vec_id = 0),
    cents AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
                     ev AS cv
              FROM e WHERE vec_id BETWEEN 0 AND 15),
    asgn AS (SELECT vec_id, cell FROM (
               SELECT v.vec_id, c.cell,
                      row_number() OVER (PARTITION BY v.vec_id
                        ORDER BY {_cos_sql('v.ev', 'c.cv')} DESC, c.cell ASC) AS rn
               FROM e v CROSS JOIN cents c) WHERE rn = 1),
    probe AS (SELECT cell FROM (
               SELECT c.cell,
                      row_number() OVER (
                        ORDER BY {_cos_sql('c.cv', 'qv')} DESC, c.cell ASC) AS rn
               FROM cents c CROSS JOIN q) WHERE rn <= 4)
    SELECT v.vec_id, round({_cos_sql('v.ev', 'qv')}, 6) AS cosine
    FROM e v
    JOIN asgn a USING (vec_id)
    JOIN probe p ON a.cell = p.cell
    CROSS JOIN q
    ORDER BY cosine DESC, vec_id ASC
    LIMIT 10
"""


# ---------------------------------------------------------------------------
# round-3 batch: retrieval (BM25 + hybrid RRF), corpus shuffle,
# sequence-length histogram, unigram-LM quality, k-means clustering
# ---------------------------------------------------------------------------

from market_insights_app_spark.operators.clustering import kmeans_assign  # noqa: E402
from market_insights_app_spark.operators.quality import unigram_logprob  # noqa: E402
from market_insights_app_spark.operators.retrieval import bm25_topk  # noqa: E402
from market_insights_app_spark.operators.sampling import shard_assign  # noqa: E402

# 'dup' is the one rare term in the synthetic vocabulary (~29 hits vs
# ~900+ for everything else) — the query mixes one discriminative and
# two common terms so BM25's idf weighting is actually exercised.
_BM25_QUERY = "spark dup merge"


def q_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 top-20 lexical retrieval (k1=1.2, b=0.75, Lucene idf) —
    content retrieval the reference approximates with recency top-N
    only (main.js:193-203)."""
    return bm25_topk(_docs(spark, sf), _BM25_QUERY, k=20)


# q_hybrid_search retired in r9 (sanctioned consolidation, registry.py
# pre-stage note): it was rrf_fuse(bm25_topk top-50, cosine_topk top-50)
# — both inputs stay independently oracle-gated (★bm25_search,
# ★embedding_topk) and the RRF fusion arithmetic keeps its exact golden
# (tests/test_retrieval_clustering.py::test_rrf_fusion_known_case).


def q_corpus_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic training-corpus shuffle: md5-hash shard (8-way) +
    in-shard position — a reproducible global permutation with no
    global sort (operators/sampling.py shard_assign)."""
    return shard_assign(_docs(spark, sf), n_shards=8).select(
        "doc_id", "shard", "pos"
    )


# log2 bucket ladder shared verbatim by the Spark expression and the
# SQL CASE — bucket = largest power of two <= n_tokens (0 for empty)
_LEN_BUCKETS = [1 << p for p in range(11)]  # 1 .. 1024


def q_seq_len_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Token-length distribution in log2 buckets — the
    sequence-length diagnostic a packing/truncation config is tuned
    against (complements seq_pack)."""
    docs = _docs(spark, sf)
    n = TX.token_count("text")
    bucket = F.when(n < 1, F.lit(0))
    for lo in _LEN_BUCKETS:
        bucket = bucket.when(n < lo * 2, F.lit(lo))
    bucket = bucket.otherwise(F.lit(2 * _LEN_BUCKETS[-1]))
    return (
        docs.select(bucket.alias("bucket"), n.alias("n"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n").alias("min_tokens"),
            F.max("n").alias("max_tokens"),
            F.sum("n").alias("sum_tokens"),
        )
    )


def q_lm_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-LM quality score (CCNet-style perplexity filter shape):
    corpus-trained P(w), per-doc avg ln P(w), low-quality flag below
    -3.45 (rare-token-heavy docs)."""
    return unigram_logprob(
        _docs(spark, sf), low_quality_below=-3.45
    )


def q_kmeans_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Two Lloyd iterations of k-means (k=8, deterministic smallest-id
    init) over the embeddings — the IVF centroid trainer — with the
    FULL iterative pipeline replayed hash-exactly by the DuckDB twin."""
    return kmeans_assign(_emb(spark, sf), k=8, iters=2)


TEXTML_ORACLES["corpus_shuffle"] = """
    WITH s AS (SELECT doc_id,
           CAST(('0x' || substr(md5('shuf-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) AS h
         FROM documents)
    SELECT doc_id,
           CAST(h % 8 AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY h % 8
                                   ORDER BY h ASC, doc_id ASC) AS INT) AS pos
    FROM s
"""

_LEN_CASE_SQL = (
    "CASE WHEN n < 1 THEN 0 "
    + " ".join(f"WHEN n < {lo * 2} THEN {lo}" for lo in _LEN_BUCKETS)
    + f" ELSE {2 * _LEN_BUCKETS[-1]} END"
)

TEXTML_ORACLES["seq_len_histogram"] = f"""
    WITH l AS (SELECT CAST(len({_TOKS_SQL}) AS INT) AS n FROM documents)
    SELECT CAST({_LEN_CASE_SQL} AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(n) AS min_tokens,
           MAX(n) AS max_tokens,
           CAST(SUM(n) AS BIGINT) AS sum_tokens
    FROM l GROUP BY 1
"""

_LTOKS_SQL = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"
)

TEXTML_ORACLES["lm_quality"] = f"""
    WITH toks AS (SELECT doc_id, unnest({_LTOKS_SQL}) AS term FROM documents),
    vocab AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    lp AS (SELECT doc_id, ln(CAST(cnt AS DOUBLE) / total) AS lp
           FROM toks JOIN vocab USING (term) CROSS JOIN tot)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(AVG(lp), 6) AS avg_logprob,
           round(AVG(lp), 6) < -3.45 AS low_quality
    FROM lp GROUP BY doc_id
"""

# BM25 oracle: shared CTE body so the top-20 query and the hybrid
# fusion reuse the identical scoring pipeline
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_QUERY.split())
_BM25_CTES_SQL = f"""
    toks AS (SELECT doc_id, unnest({_LTOKS_SQL}) AS term FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
           WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    idf AS (SELECT term,
                   ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) AS idf
            FROM dfq CROSS JOIN stats),
    sc AS (SELECT t.doc_id,
                  idf * t.tf * 2.2
                    / (t.tf + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
                    AS contrib
           FROM tf t JOIN dl USING (doc_id) JOIN idf USING (term)
           CROSS JOIN stats),
    bm25 AS (SELECT doc_id, round(SUM(contrib), 6) AS bm25
             FROM sc GROUP BY doc_id)
"""

TEXTML_ORACLES["bm25_search"] = f"""
    WITH {_BM25_CTES_SQL}
    SELECT doc_id, bm25 FROM bm25
    ORDER BY bm25 DESC, doc_id ASC LIMIT 20
"""

def _kmeans_d2_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        "p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)"
    )


# k-means (k=8, 2 Lloyd iterations, smallest-id init) as a reusable CTE
# chain ending at a3(vec_id, cl, d) — shared by the assignment oracle
# and the SemDeDup oracle.
_KMEANS_CTES = f"""
    e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl,
                  v AS cv
           FROM e ORDER BY vec_id LIMIT 8),
    a1 AS (SELECT vec_id, v, cl FROM (
             SELECT e.vec_id, e.v, c0.cl,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY round({_kmeans_d2_sql('e.v', 'c0.cv')}, 9) ASC,
                               c0.cl ASC) AS rn
             FROM e CROSS JOIN c0) WHERE rn = 1),
    c1m AS (SELECT cl, list(val ORDER BY dim) AS cv FROM (
              SELECT cl, dim, round(AVG(x), 6) AS val FROM (
                SELECT cl, unnest(v) AS x,
                       unnest(generate_series(1, 64)) AS dim
                FROM a1)
              GROUP BY cl, dim)
            GROUP BY cl),
    c1 AS (SELECT c0.cl, COALESCE(c1m.cv, c0.cv) AS cv
           FROM c0 LEFT JOIN c1m USING (cl)),
    a2 AS (SELECT vec_id, v, cl FROM (
             SELECT e.vec_id, e.v, c1.cl,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY round({_kmeans_d2_sql('e.v', 'c1.cv')}, 9) ASC,
                               c1.cl ASC) AS rn
             FROM e CROSS JOIN c1) WHERE rn = 1),
    c2m AS (SELECT cl, list(val ORDER BY dim) AS cv FROM (
              SELECT cl, dim, round(AVG(x), 6) AS val FROM (
                SELECT cl, unnest(v) AS x,
                       unnest(generate_series(1, 64)) AS dim
                FROM a2)
              GROUP BY cl, dim)
            GROUP BY cl),
    c2 AS (SELECT c1.cl, COALESCE(c2m.cv, c1.cv) AS cv
           FROM c1 LEFT JOIN c2m USING (cl)),
    a3 AS (SELECT vec_id, cl, d FROM (
             SELECT e.vec_id, c2.cl,
                    round({_kmeans_d2_sql('e.v', 'c2.cv')}, 9) AS d,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY round({_kmeans_d2_sql('e.v', 'c2.cv')}, 9) ASC,
                               c2.cl ASC) AS rn
             FROM e CROSS JOIN c2) WHERE rn = 1)"""

TEXTML_ORACLES["kmeans_assign"] = f"""
    WITH {_KMEANS_CTES}
    SELECT vec_id, CAST(cl AS INT) AS cluster, round(d, 6) AS dist2
    FROM a3
"""

TEXTML_ORACLES["semdedup"] = f"""
    WITH {_KMEANS_CTES},
    a AS (SELECT a3.vec_id AS id, CAST(a3.cl AS INT) AS cluster, e.v
          FROM a3 JOIN e ON e.vec_id = a3.vec_id),
    drops AS (SELECT DISTINCT l.id
              FROM a l JOIN a r ON l.cluster = r.cluster AND r.id < l.id
              WHERE round({_cos_sql('l.v', 'r.v')}, 6) >= 0.4)
    SELECT id AS vec_id, cluster FROM a
    WHERE id NOT IN (SELECT id FROM drops)
"""


# ---------------------------------------------------------------------------
# round 4: semantic dedup, passage dedup, Zipf fit
# ---------------------------------------------------------------------------


def q_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup over the embeddings: k-means (k=8, 2 iterations,
    deterministic init) confines the quadratic cosine check to each
    cluster; near-identical lower-id neighbors win
    (operators/similarity.semdedup). Threshold 0.4 fits the synthetic
    embedding spread (max pairwise cosine ≈ 0.51) so the drop rule is
    actually exercised; production embedding spaces use ≈ 0.95."""
    from market_insights_app_spark.operators.similarity import semdedup

    return semdedup(_emb(spark, sf), k=8, iters=2, threshold=0.4)


def q_passage_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide passage-level exact dedup (C4 line-dedup / CCNet
    paragraph-dedup analog, operators/dedup.passage_dedup): 3-token
    passages, global first-occurrence-wins, documents reassembled from
    their surviving passages."""
    from market_insights_app_spark.operators.dedup import passage_dedup

    return passage_dedup(_docs(spark, sf), passage_tokens=3)


def q_zipf_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    log(tf) on log(rank) for the top-100 terms — the standard
    distribution-health check for a training corpus (natural text
    ≈ −1; the synthetic word-soup is much flatter). The regression
    sums fold over rank-ordered lists in BOTH engines, so the double
    arithmetic is order-identical (no unordered SUM noise)."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf)
    tf = (
        docs.select(F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ranked = (
        tf.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("tf").desc(), F.col("tok").asc())
            ),
        )
        .filter(F.col("rank") <= 100)
        .select(F.log(F.col("rank").cast("double")).alias("lx"),
                F.log(F.col("tf").cast("double")).alias("ly"),
                "rank")
    )
    arr = ranked.agg(
        F.array_sort(F.collect_list(F.struct("rank", "lx", "ly"))).alias("pts")
    )
    def fold(expr):
        return F.aggregate(expr, F.lit(0.0), lambda a, b: a + b)
    pts = F.col("pts")
    xs = F.transform(pts, lambda s: s.getField("lx"))
    ys = F.transform(pts, lambda s: s.getField("ly"))
    n = F.size(pts).cast("double")
    sx, sy = fold(xs), fold(ys)
    sxy = fold(F.zip_with(xs, ys, lambda a, b: a * b))
    sxx = fold(F.zip_with(xs, xs, lambda a, b: a * b))
    den = n * sxx - sx * sx
    return arr.select(
        F.size(pts).alias("n_terms"),
        # den == 0 (empty corpus, or a single distinct term) must be
        # NULL, not an ANSI DIVIDE_BY_ZERO job abort
        F.round(
            F.when(den != 0.0, (n * sxy - sx * sy) / den), 6
        ).alias("slope"),
    )


TEXTML_ORACLES["passage_dedup"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    ex AS (SELECT doc_id, toks,
                  unnest(range(0, CAST(ceil(len(toks) / 3.0) AS BIGINT))) AS k
           FROM t),
    p AS (SELECT doc_id, k AS idx,
                 array_to_string(toks[3*k + 1 : 3*k + 3], ' ') AS passage
          FROM ex),
    r AS (SELECT doc_id, idx, passage,
                 row_number() OVER (PARTITION BY passage ORDER BY doc_id, idx) AS rn
          FROM p)
    SELECT doc_id,
           COUNT(*) AS n_passages,
           COUNT(*) FILTER (rn = 1) AS n_kept,
           COALESCE(string_agg(passage, ' ' ORDER BY idx) FILTER (rn = 1), '')
             AS text_dedup
    FROM r GROUP BY doc_id
"""

TEXTML_ORACLES["zipf_slope"] = """
    WITH tok AS (SELECT unnest(list_filter(
                   string_split_regex(trim(lower(text)), '\\s+'), x -> x <> ''))
                   AS tok
                 FROM documents),
    tf AS (SELECT tok, COUNT(*) AS tf FROM tok GROUP BY tok),
    ranked AS (SELECT ln(CAST(row_number() OVER (ORDER BY tf DESC, tok ASC) AS DOUBLE)) AS lx,
                      ln(CAST(tf AS DOUBLE)) AS ly,
                      row_number() OVER (ORDER BY tf DESC, tok ASC) AS rank
               FROM tf QUALIFY rank <= 100),
    l AS (SELECT list(lx ORDER BY rank) AS xs, list(ly ORDER BY rank) AS ys
          FROM ranked),
    s AS (SELECT CAST(len(xs) AS DOUBLE) AS n,
                 list_reduce(list_prepend(0.0, xs), (a, b) -> a + b) AS sx,
                 list_reduce(list_prepend(0.0, ys), (a, b) -> a + b) AS sy,
                 list_reduce(list_prepend(0.0,
                   list_transform(list_zip(xs, ys), p -> p[1] * p[2])), (a, b) -> a + b) AS sxy,
                 list_reduce(list_prepend(0.0,
                   list_transform(list_zip(xs, xs), p -> p[1] * p[2])), (a, b) -> a + b) AS sxx,
                 len(xs) AS n_terms
          FROM l)
    SELECT n_terms, round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope
    FROM s
"""


# ---------------------------------------------------------------------------
# bigram LM + CCNet perplexity tiers (round 5)
# ---------------------------------------------------------------------------


def q_bigram_lm(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram-LM quality score with Laplace smoothing (operators/
    quality.bigram_logprob) — one order above ★lm_quality's unigram LM,
    the SQL-expressible stand-in for CCNet's KenLM filter, reporting
    CCNet's perplexity number per document."""
    from market_insights_app_spark.operators.quality import bigram_logprob

    return bigram_logprob(_docs(spark, sf))


def q_perplexity_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet head/middle/tail tiers per language (operators/quality.
    perplexity_buckets): corpus-trained unigram LM score, ntile(3) over
    the per-lang (score DESC, id) order — integer rank arithmetic, no
    interpolated-threshold cross-engine edge; approx_percentile
    thresholds are the documented 100 TB path."""
    from market_insights_app_spark.operators.quality import perplexity_buckets

    return perplexity_buckets(_docs(spark, sf))


TEXTML_ORACLES["bigram_lm"] = f"""
    WITH toks AS (SELECT doc_id, {_LTOKS_SQL} AS t FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(t)),
                         i -> t[i] || ' ' || t[i + 1])) AS bg
           FROM toks),
    bgc AS (SELECT bg, COUNT(*) AS c12 FROM bg GROUP BY 1),
    w1c AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(c12) AS c1
            FROM bgc GROUP BY 1),
    voc AS (SELECT COUNT(DISTINCT tok) AS v
            FROM (SELECT unnest(t) AS tok FROM toks)),
    lp AS (SELECT doc_id,
                  ln(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)) AS lp
           FROM bg JOIN bgc USING (bg)
           JOIN w1c ON split_part(bg, ' ', 1) = w1
           CROSS JOIN voc)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           round(AVG(lp), 6) AS avg_logprob,
           round(exp(-AVG(lp)), 4) AS ppl
    FROM lp GROUP BY doc_id
"""

TEXTML_ORACLES["perplexity_buckets"] = f"""
    WITH toks AS (SELECT doc_id, unnest({_LTOKS_SQL}) AS term FROM documents),
    vocab AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    lp AS (SELECT doc_id, ln(CAST(cnt AS DOUBLE) / total) AS lp
           FROM toks JOIN vocab USING (term) CROSS JOIN tot),
    sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                  round(AVG(lp), 6) AS avg_logprob
           FROM lp GROUP BY doc_id),
    tiers AS (SELECT sc.doc_id, d.lang, sc.n_tokens, sc.avg_logprob,
                     ntile(3) OVER (PARTITION BY d.lang
                                    ORDER BY sc.avg_logprob DESC,
                                             sc.doc_id ASC) AS tier
              FROM sc JOIN documents d ON sc.doc_id = d.doc_id)
    SELECT doc_id, lang, n_tokens, avg_logprob,
           CASE tier WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM tiers
"""


def q_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Exact substring-span dedup (operators/dedup.span_dedup) — the
    fixed-length Lee et al. 2022 ExactSubstr form: global
    first-occurrence 8-gram spans, overlap-merged by a single
    union-merge coverage window, covered tokens removed."""
    from market_insights_app_spark.operators.dedup import span_dedup

    return span_dedup(_docs(spark, sf), span_tokens=8)


TEXTML_ORACLES["span_dedup"] = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    tok0 AS (SELECT doc_id, unnest(range(0, len(toks))) AS pos, toks FROM t),
    tok AS (SELECT doc_id, pos, toks[pos + 1] AS tok FROM tok0),
    g0 AS (SELECT doc_id, unnest(range(0, len(toks) - 7)) AS p, toks
           FROM t WHERE len(toks) >= 8),
    g AS (SELECT doc_id, p, array_to_string(toks[p + 1 : p + 8], ' ') AS gram
          FROM g0),
    r AS (SELECT doc_id, p,
                 row_number() OVER (PARTITION BY gram ORDER BY doc_id, p) AS rn
          FROM g),
    dup AS (SELECT doc_id, p FROM r WHERE rn > 1),
    ev AS (SELECT doc_id, pos, 1 AS is_tok, tok FROM tok
           UNION ALL
           SELECT doc_id, p AS pos, 0 AS is_tok, NULL AS tok FROM dup),
    m AS (SELECT doc_id, pos, is_tok, tok,
                 MAX(CASE WHEN is_tok = 0 THEN pos END)
                   OVER (PARTITION BY doc_id ORDER BY pos, is_tok
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS smax
          FROM ev),
    k AS (SELECT doc_id, pos, tok,
                 (smax IS NULL OR smax + 8 <= pos) AS keep
          FROM m WHERE is_tok = 1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) FILTER (NOT keep) AS BIGINT) AS n_removed,
           COALESCE(string_agg(tok, ' ' ORDER BY pos) FILTER (keep), '')
             AS text_dedup
    FROM k GROUP BY doc_id
"""


def q_corpus_report(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset-datasheet rollup per (source, lang) — the corpus-level
    report a training-data pipeline publishes next to the data: doc
    and token volumes, length profile, short-doc fraction, and the
    exact-duplicate rate from content fingerprints. One aggregate pass
    (count_distinct is the only expand; HLL++ `approx_count_distinct`
    is the 100 TB swap, as in ★table_profile)."""
    from market_insights_app_spark.functions.text import token_count

    d = _docs(spark, sf)
    toks = token_count(F.col("text"))
    out = (
        d.select(
            "source",
            "lang",
            toks.alias("nt"),
            F.md5(F.col("text")).alias("fp"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            F.round(F.sum("nt") / F.count(F.lit(1)), 4).alias("avg_tokens"),
            F.sum(F.when(F.col("nt") < 20, 1).otherwise(0)).alias("n_short"),
            F.count_distinct(F.col("fp")).alias("n_unique"),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "total_tokens",
            "avg_tokens",
            "n_short",
            F.round(
                F.lit(1.0) - F.col("n_unique") / F.col("n_docs"), 6
            ).alias("dup_rate"),
        )
    )
    return out


TEXTML_ORACLES["corpus_report"] = f"""
    WITH d AS (SELECT source, lang,
                      len({_LTOKS_SQL}) AS nt,
                      md5(text) AS fp
               FROM documents)
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS total_tokens,
           round(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 4) AS avg_tokens,
           CAST(SUM(CASE WHEN nt < 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
           round(1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*), 6)
             AS dup_rate
    FROM d GROUP BY source, lang
"""


def q_decontaminate_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """Decontamination via the broadcast-Bloom prefilter (operators/
    dedup.decontaminate_bloom): docs with doc_id % 89 == 0 stand in
    for the eval benchmark; training docs sharing a word 4-gram are
    dropped. Same exact result as the join path — the Bloom array
    (xxhash64 positions computed JVM-side on both sides, vectorized
    bit probe in one Arrow batch UDF, exact confirm join after) is
    the runtime-filter shape that keeps the shuffle candidate-sized
    at 100 TB."""
    from market_insights_app_spark.operators.dedup import decontaminate_bloom

    docs = _docs(spark, sf)
    eval_set = docs.filter(F.col("doc_id") % 89 == 0)
    train = docs.filter(F.col("doc_id") % 89 != 0)
    kept = decontaminate_bloom(train, eval_set, shingle_n=4)
    return kept.select("doc_id", "lang", "n_chars")


TEXTML_ORACLES["decontaminate_bloom"] = f"""
    WITH toks AS (SELECT doc_id, list_filter(string_split({_NORM_SQL}, ' '),
                                             x -> x <> '') AS w
                  FROM documents),
    grams AS (SELECT doc_id,
                     unnest(list_transform(generate_series(1, greatest(len(w)-3, 0)),
                            i -> array_to_string(w[i:i+3], ' '))) AS g
              FROM toks),
    eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % 89 = 0),
    contaminated AS (SELECT DISTINCT t.doc_id
                     FROM grams t JOIN eval_g e USING (g)
                     WHERE t.doc_id % 89 <> 0)
    SELECT d.doc_id, d.lang, d.n_chars FROM documents d
    WHERE d.doc_id % 89 <> 0
      AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
"""


def q_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-weighted corpus sampling (operators/sampling.
    weighted_sample): Efraimidis–Spirakis A-Res over the documents
    with n_chars as the weight — inclusion odds proportional to
    length, deterministic md5 uniforms, key rounded to 9 dp before
    the TakeOrderedAndProject top-k so the ranking is engine-exact."""
    from market_insights_app_spark.operators.sampling import weighted_sample

    docs = _docs(spark, sf)
    out = weighted_sample(docs, k=100, weight_col="n_chars")
    return out.select("doc_id", "lang", "n_chars", "sample_key")


TEXTML_ORACLES["weighted_sample"] = """
    SELECT doc_id, lang, n_chars,
           round(ln((CAST(('0x' || substr(md5('wsample-v1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) + 1) / 4294967296.0)
                 / CAST(n_chars AS DOUBLE), 9) AS sample_key
    FROM documents
    WHERE n_chars IS NOT NULL AND n_chars > 0
    ORDER BY sample_key DESC, doc_id ASC
    LIMIT 100
"""


def q_chi2_lang_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Categorical drift: chi-square statistic of the language
    distribution between two halves of the corpus (doc_id parity),
    per source — the categorical sibling of ★psi_drift's numeric PSI.
    One grouped count pass; expectations and the statistic are
    arithmetic over (source × lang × 2) tiny rows, joined back via
    k-row broadcasts. Cells: chi2 = sum (obs - exp)^2 / exp over the
    2 x L contingency table per source."""
    docs = _docs(spark, sf)
    cells = docs.groupBy(
        "source", "lang", (F.col("doc_id") % 2 == 0).alias("half_a")
    ).agg(F.count(F.lit(1)).alias("obs"))
    tot_src = cells.groupBy("source").agg(F.sum("obs").alias("n_src"))
    tot_half = cells.groupBy("source", "half_a").agg(
        F.sum("obs").alias("n_half")
    )
    tot_lang = cells.groupBy("source", "lang").agg(F.sum("obs").alias("n_lang"))
    j = (
        cells.join(F.broadcast(tot_src), "source")
        .join(F.broadcast(tot_half), ["source", "half_a"])
        .join(F.broadcast(tot_lang), ["source", "lang"])
    )
    exp = (
        F.col("n_half").cast("double")
        * F.col("n_lang").cast("double")
        / F.col("n_src").cast("double")
    )
    term = (F.col("obs").cast("double") - exp) * (
        F.col("obs").cast("double") - exp
    ) / exp
    return (
        j.select("source", term.alias("term"))
        .groupBy("source")
        .agg(F.round(F.sum("term"), 6).alias("chi2"))
    )


TEXTML_ORACLES["chi2_lang_drift"] = """
    WITH cells AS (
        SELECT source, lang, (doc_id % 2 = 0) AS half_a, count(*) AS obs
        FROM documents GROUP BY 1, 2, 3
    ),
    ts AS (SELECT source, sum(obs) AS n_src FROM cells GROUP BY 1),
    th AS (SELECT source, half_a, sum(obs) AS n_half FROM cells GROUP BY 1, 2),
    tl AS (SELECT source, lang, sum(obs) AS n_lang FROM cells GROUP BY 1, 2)
    SELECT c.source,
           round(sum(
               (CAST(obs AS DOUBLE)
                - CAST(n_half AS DOUBLE) * CAST(n_lang AS DOUBLE)
                  / CAST(n_src AS DOUBLE))
               * (CAST(obs AS DOUBLE)
                  - CAST(n_half AS DOUBLE) * CAST(n_lang AS DOUBLE)
                    / CAST(n_src AS DOUBLE))
               / (CAST(n_half AS DOUBLE) * CAST(n_lang AS DOUBLE)
                  / CAST(n_src AS DOUBLE))
           ), 6) AS chi2
    FROM cells c
    JOIN ts USING (source)
    JOIN th USING (source, half_a)
    JOIN tl USING (source, lang)
    GROUP BY c.source
"""


def q_sample_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-quota per-group corpus sampling — 30 docs per language
    (operators/sampling.sample_n_per_group): the bounded-quota sibling
    of stratified_sample, hash-ordered so engines and reruns agree."""
    from market_insights_app_spark.operators.sampling import sample_n_per_group

    out = sample_n_per_group(_docs(spark, sf), ["lang"], 30)
    return out.select("doc_id", "lang")


def q_token_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document unigram Shannon entropy + type counts
    (operators/quality.token_entropy) — the information-density
    quality signal."""
    from market_insights_app_spark.operators.quality import token_entropy

    return token_entropy(_docs(spark, sf))


def q_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Byte-domain video frame sampling (operators/multimodal.
    sample_frame_bytes): documents' text bytes stand in for packed
    4×4-RGB video payloads; every 2nd frame is kept with its
    byte-mean.  The mapInPandas fan-out (row per sampled frame) is the
    real plumbing; the oracle replays the slicing over hex pairs."""
    from market_insights_app_spark.operators.multimodal import (
        sample_frame_bytes,
    )

    docs = _docs(spark, sf)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out = sample_frame_bytes(media, frame_w=4, frame_h=4, every_n=2)
    return out.select(
        "media_id",
        "frame_idx",
        "n_frames",
        F.round("frame_mean", 4).alias("frame_mean"),
    )


TEXTML_ORACLES["sample_per_group"] = """
    WITH r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('groupsample-v1:' || CAST(doc_id AS VARCHAR)) ASC,
                        doc_id ASC) AS rn
      FROM documents)
    SELECT doc_id, lang FROM r WHERE rn <= 30
"""

TEXTML_ORACLES["token_entropy"] = """
    WITH tk AS (SELECT doc_id,
           list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                       x -> x <> '') AS toks
         FROM documents),
    t AS (SELECT doc_id, unnest(toks) AS tok FROM tk),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
    p AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                 COUNT(*) AS n_types,
                 sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS slnc
          FROM tc GROUP BY 1)
    SELECT doc_id, n_tokens, n_types,
           round(ln(CAST(n_tokens AS DOUBLE)) - slnc / CAST(n_tokens AS DOUBLE),
                 6) AS entropy,
           round(CASE WHEN n_types > 1
                 THEN (ln(CAST(n_tokens AS DOUBLE))
                       - slnc / CAST(n_tokens AS DOUBLE))
                      / ln(CAST(n_types AS DOUBLE)) END, 6) AS norm_entropy
    FROM p
"""

TEXTML_ORACLES["frame_sample"] = """
    WITH c AS (SELECT doc_id,
                      regexp_extract_all(hex(encode(text)), '..') AS hx
               FROM documents),
    f AS (SELECT doc_id, hx, CAST(len(hx) // 48 AS INT) AS n_frames
          FROM c WHERE len(hx) >= 48),
    g AS (SELECT doc_id, n_frames, hx,
                 CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx
          FROM f)
    SELECT doc_id AS media_id, frame_idx, n_frames,
           round(CAST(list_sum(list_transform(
                   hx[frame_idx*48+1 : frame_idx*48+48], x ->
                     (strpos('0123456789ABCDEF', x[1]) - 1) * 16
                   + (strpos('0123456789ABCDEF', x[2]) - 1)))
                 AS DOUBLE) / 48.0, 4) AS frame_mean
    FROM g
"""


def q_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Graded n-gram novelty of the training split against the
    doc_id % 97 == 0 benchmark reference (operators/quality.
    ngram_novelty) — the scoring sibling of ★decontaminate."""
    from market_insights_app_spark.operators.quality import ngram_novelty

    docs = _docs(spark, sf)
    ref = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return ngram_novelty(train, ref, shingle_n=3)


TEXTML_ORACLES["ngram_novelty"] = f"""
    WITH toks AS (SELECT doc_id, list_filter(string_split({_NORM_SQL}, ' '),
                                             x -> x <> '') AS w
                  FROM documents),
    grams0 AS (SELECT doc_id,
                      unnest(list_transform(generate_series(1, greatest(len(w)-2, 0)),
                             i -> array_to_string(w[i:i+2], ' '))) AS g
               FROM toks),
    grams AS (SELECT DISTINCT doc_id, g FROM grams0),
    ref AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
    tr AS (SELECT gr.doc_id, r.g IS NOT NULL AS hit
           FROM grams gr LEFT JOIN ref r USING (g)
           WHERE gr.doc_id % 97 <> 0)
    SELECT doc_id, COUNT(*) AS n_grams,
           CAST(sum(CASE WHEN NOT hit THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN NOT hit THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS novelty
    FROM tr GROUP BY doc_id
"""


def q_quality_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style rule-cascade funnel over the corpus
    (operators/quality.quality_funnel): survivors after each of the
    four filter stages, thresholds calibrated to this corpus's token
    statistics so every stage drops a real slice (500 -> 412 -> 338
    -> 218 -> ~120 at sf0.01)."""
    from market_insights_app_spark.operators.quality import quality_funnel

    return quality_funnel(_docs(spark, sf))


TEXTML_ORACLES["quality_funnel"] = """
    WITH toks AS (SELECT doc_id,
            list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                        x -> x <> '') AS w
          FROM documents),
    m AS (SELECT len(w) AS wc,
                 CAST(list_sum(list_transform(w, x -> CAST(length(x) AS BIGINT)))
                      AS DOUBLE) / CAST(len(w) AS DOUBLE) AS mlen,
                 CAST(len(list_filter(w, x -> list_contains(
                        ['the','a','and','of','to','in','is','it','that','for'],
                        x))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS stopr,
                 CAST(len(list_distinct(w)) AS DOUBLE)
                 / CAST(len(w) AS DOUBLE) AS distr
          FROM toks WHERE len(w) > 0),
    f AS (SELECT wc BETWEEN 25 AND 95 AS p1,
                 mlen BETWEEN 4.3 AND 4.8 AS m2,
                 stopr >= 0.05 AS m3,
                 distr >= 0.4 AS m4
          FROM m),
    agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS s0,
                   CAST(coalesce(sum(CASE WHEN p1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS s1,
                   CAST(coalesce(sum(CASE WHEN p1 AND m2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS s2,
                   CAST(coalesce(sum(CASE WHEN p1 AND m2 AND m3 THEN 1 ELSE 0 END), 0) AS BIGINT) AS s3,
                   CAST(coalesce(sum(CASE WHEN p1 AND m2 AND m3 AND m4 THEN 1 ELSE 0 END), 0) AS BIGINT) AS s4
            FROM f)
    SELECT 0 AS rule_idx, 'total' AS rule, s0 AS survivors,
           CAST(0 AS BIGINT) AS dropped FROM agg
    UNION ALL SELECT 1, 'word_count', s1, s0 - s1 FROM agg
    UNION ALL SELECT 2, 'mean_word_len', s2, s1 - s2 FROM agg
    UNION ALL SELECT 3, 'stopword_ratio', s3, s2 - s3 FROM agg
    UNION ALL SELECT 4, 'distinct_ratio', s4, s3 - s4 FROM agg
"""


def q_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Top-50 bigram collocations by PMI with pair count >= 5
    (operators/quality.pmi_collocations) — collocation mining for
    tokenizer/vocab work; ranking rides the raw probability ratio so
    the cut is libm-free."""
    from market_insights_app_spark.operators.quality import pmi_collocations

    return pmi_collocations(_docs(spark, sf), min_count=5, k=50)


TEXTML_ORACLES["pmi_collocations"] = """
    WITH toks AS (SELECT doc_id,
            list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                        x -> x <> '') AS w
          FROM documents),
    tot AS (SELECT CAST(sum(len(w)) AS BIGINT) AS t_uni,
                   CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS t_big
            FROM toks),
    uni AS (SELECT unnest(w) AS tok FROM toks),
    unic AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY tok),
    big AS (SELECT unnest(list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                                         i -> w[i] || ' ' || w[i+1])) AS g
            FROM toks),
    bigc AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c_xy
             FROM big GROUP BY g HAVING COUNT(*) >= 5),
    j AS (SELECT string_split(g, ' ')[1] AS w1,
                 string_split(g, ' ')[2] AS w2, c_xy
          FROM bigc),
    sc AS (SELECT j.w1, j.w2, j.c_xy, u1.c AS c1, u2.c AS c2,
                  (CAST(j.c_xy AS DOUBLE) * CAST(t.t_big AS DOUBLE))
                  / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS ratio
           FROM j JOIN unic u1 ON j.w1 = u1.tok
                  JOIN unic u2 ON j.w2 = u2.tok
                  CROSS JOIN tot t)
    SELECT w1, w2, c_xy, c1, c2, round(ln(ratio), 6) AS pmi
    FROM sc ORDER BY ratio DESC, w1 ASC, w2 ASC LIMIT 50
"""


# ---------------------------------------------------------------------------
# REGISTERED in r8 (previously staged one round, gated locally by
# tests/test_lm_scoring.py / test_sketches.py direct Spark<->DuckDB
# parity plus the unicode + degenerate-input sweeps).  The staging
# shelf for future rounds is STAGED_ORACLES (end of this module).
# ---------------------------------------------------------------------------


def q_nb_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Seed-set Naive Bayes quality filter (GPT-3 §A / CCNet shape):
    every 5th document is a labeled seed (positive = source 'src0'),
    the trained log-likelihood-ratio model scores the other 80% of the
    corpus, keep = positive NB log-odds."""
    from market_insights_app_spark.operators.quality import nb_seed_classifier

    docs = _docs(spark, sf)
    seeds = docs.filter(F.col("doc_id") % 5 == 0).select(
        "text", (F.col("source") == "src0").alias("is_pos")
    )
    rest = docs.filter(F.col("doc_id") % 5 != 0)
    return nb_seed_classifier(rest, seeds, label_col="is_pos")


TEXTML_ORACLES["nb_quality"] = f"""
    WITH seed AS (SELECT text, source = 'src0' AS is_pos
                  FROM documents WHERE doc_id % 5 = 0),
    rest AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
    st AS (SELECT is_pos, unnest({_LTOKS_SQL}) AS term FROM seed),
    counts AS (SELECT term,
                      CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT)
                        AS c_pos,
                      CAST(sum(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT)
                        AS c_neg
               FROM st GROUP BY term),
    tot AS (SELECT CAST(sum(c_pos) AS BIGINT) AS n_pos,
                   CAST(sum(c_neg) AS BIGINT) AS n_neg,
                   CAST(count(*) AS BIGINT) AS v
            FROM counts),
    prior AS (SELECT ln(CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) + 1
                             AS DOUBLE)
                        / CAST(sum(CASE WHEN is_pos THEN 0 ELSE 1 END) + 1
                               AS DOUBLE)) AS log_prior
              FROM seed),
    llr AS (SELECT term,
                   ln(CAST(c_pos + 1 AS DOUBLE) / CAST(n_pos + v AS DOUBLE))
                   - ln(CAST(c_neg + 1 AS DOUBLE) / CAST(n_neg + v AS DOUBLE))
                     AS llr
            FROM counts CROSS JOIN tot),
    toks AS (SELECT doc_id, unnest({_LTOKS_SQL}) AS term FROM rest),
    scored AS (SELECT t.doc_id,
                      coalesce(l.llr,
                               ln(CAST(1 AS DOUBLE)
                                  / CAST(n_pos + v AS DOUBLE))
                               - ln(CAST(1 AS DOUBLE)
                                    / CAST(n_neg + v AS DOUBLE))) AS llr
               FROM toks t LEFT JOIN llr l USING (term) CROSS JOIN tot),
    per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   sum(llr) AS s
            FROM scored GROUP BY doc_id)
    SELECT doc_id, n_tokens,
           round(s + log_prior, 6) AS nb_score,
           round(s + log_prior, 6) > 0.0 AS keep
    FROM per CROSS JOIN prior
"""


def q_corpus_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source dataset release manifest: counts, distinct ids,
    payload bytes, id range, order-insensitive md5-prefix content
    checksum (operators/profiling.corpus_manifest).  r8-STAGED like
    q_nb_quality (registered r8, staged r7)."""
    from market_insights_app_spark.operators.profiling import corpus_manifest

    return corpus_manifest(_docs(spark, sf))


TEXTML_ORACLES["corpus_manifest"] = """
    SELECT source AS split,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct_ids,
           CAST(sum(strlen(coalesce(text, ''))) AS BIGINT) AS n_bytes,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id,
           CAST(sum(CAST(('0x' || substr(md5('manifest-v1:'
                         || CAST(doc_id AS VARCHAR) || ':'
                         || coalesce(text, '')), 1, 8)) AS BIGINT))
                AS BIGINT) AS content_sum
    FROM documents GROUP BY source
"""


# ---------------------------------------------------------------------------
# r9 registrations: the three r8-staged pairs (pagerank_links,
# semantic_decontaminate, readability), promoted per the registry
# pre-stage plan, paid for by the two sanctioned consolidations
# (ngram_jaccard_bigram, hybrid_search) -> N = 148 < 3W.
# ---------------------------------------------------------------------------


def q_pagerank_links(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank over the deterministic skewed link graph
    (operators/graph.py): 10 integer-grid iterations, damping 0.85.
    Every iteration is exact int64 arithmetic (contribution =
    rank div outdeg, damped sum = 85·Σ div 100), so rank_grid is
    bit-identical across engines — the DuckDB twin replays the same
    integers through 10 unrolled CTEs.

    r12 plan flip: ``tiny_threshold=100_000`` routes sub-threshold
    graphs through the single-Arrow-task lane (graph.py, bit-identical
    to the distributed grid, property-tested across all lanes in
    tests/test_graph.py) — measured 4.23 → 1.19 s at the sf0.1
    fixture; graphs above the threshold still take the distributed
    per-iteration equi-join grid, the 100 TB shape."""
    from market_insights_app_spark.operators.graph import (
        pagerank,
        synthetic_link_graph,
    )

    return pagerank(
        synthetic_link_graph(_docs(spark, sf)),
        iterations=10,
        tiny_threshold=100_000,
    )


def _pagerank_oracle(iters: int = 10) -> str:
    grid, damp = 1_000_000_000, 85
    tel = f"(CAST({100 - damp} AS BIGINT) * {grid}) // (100 * m)"
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
    pr{k} AS (
      SELECT nd.node,
             CAST({tel} + coalesce(({damp} * c.s) // 100, 0) AS BIGINT)
               AS rank_grid
      FROM nodes nd CROSS JOIN m_t
      LEFT JOIN (SELECT e.dst, sum(p.rank_grid // o.outd) AS s
                 FROM edges e
                 JOIN pr{k - 1} p ON e.src = p.node
                 JOIN outdeg o ON o.src = e.src
                 GROUP BY e.dst) c ON c.dst = nd.node
    )""")
    return f"""
    WITH n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    raw AS (
      SELECT doc_id AS src,
             ((doc_id % n) * (doc_id % n) + 1) % n AS dst
      FROM documents CROSS JOIN n_t
      UNION ALL
      SELECT doc_id, (doc_id * 31 + 7) % n FROM documents CROSS JOIN n_t
      UNION ALL
      SELECT doc_id, doc_id % greatest(n // 50, 1)
      FROM documents CROSS JOIN n_t
    ),
    edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outd
               FROM edges GROUP BY src),
    m_t AS (SELECT CAST(count(*) AS BIGINT) AS m FROM nodes),
    pr0 AS (SELECT node, CAST({grid} // m AS BIGINT) AS rank_grid
            FROM nodes CROSS JOIN m_t),{",".join(steps)}
    SELECT node, rank_grid,
           rank_grid / CAST({grid} AS DOUBLE) AS pagerank
    FROM pr{iters}
"""


TEXTML_ORACLES["pagerank_links"] = _pagerank_oracle()


def q_semantic_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space decontamination (operators/similarity.py):
    every 20th vector is the 'eval suite', the rest is the training
    corpus; flag train vectors whose best cosine vs the broadcast eval
    set reaches 0.40 (fixture-calibrated like embedding_neardup — the
    synthetic embeddings are near-orthogonal, so the production-style
    0.95 would make the gate vacuous)."""
    from market_insights_app_spark.operators.similarity import (
        semantic_decontaminate,
    )

    emb = _emb(spark, sf)
    ev = emb.filter(F.col("vec_id") % 20 == 0)
    tr = emb.filter(F.col("vec_id") % 20 != 0)
    return semantic_decontaminate(tr, ev, threshold=0.40)


TEXTML_ORACLES["semantic_decontaminate"] = """
    WITH ev AS (SELECT vec_id AS eid,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                FROM embeddings WHERE vec_id % 20 = 0),
    tr AS (SELECT vec_id,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings WHERE vec_id % 20 <> 0),
    pairs AS (
      SELECT t.vec_id, e.eid,
             coalesce(
               list_reduce(list_transform(list_zip(t.v, e.v),
                                          p -> p[1] * p[2]),
                           (a, b) -> a + b)
               / NULLIF(
                   sqrt(list_reduce(list_transform(t.v, x -> x * x),
                                    (a, b) -> a + b))
                   * sqrt(list_reduce(list_transform(e.v, x -> x * x),
                                      (a, b) -> a + b)), 0),
               CAST(-2 AS DOUBLE)) AS raw
      FROM tr t CROSS JOIN ev e),
    best AS (SELECT vec_id, eid, raw,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY raw DESC, eid ASC) AS rn
             FROM pairs)
    SELECT vec_id, eid AS nearest_eval_id, round(raw, 6) AS max_cosine,
           round(raw, 6) >= CAST(0.4 AS DOUBLE) AS contaminated
    FROM best WHERE rn = 1
"""


def q_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch reading-ease quality signal (operators/quality.py
    readability_report): scan-stage regexp counts + one fixed double
    expression, emitted unrounded (bit-identical across engines)."""
    from market_insights_app_spark.operators.quality import readability_report

    return readability_report(_docs(spark, sf))


TEXTML_ORACLES["readability"] = """
    WITH c AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(
                    trim(coalesce(text, '')), '\\s+'), x -> x <> ''))
                  AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(
                    coalesce(text, ''), '[.!?]+')), 1) AS BIGINT)
               AS n_sentences,
             CAST(len(regexp_extract_all(
                    coalesce(text, ''), '[aeiouyAEIOUY]+')) AS BIGINT)
               AS n_syllable_groups
      FROM documents),
    s AS (
      SELECT *,
             CASE WHEN n_words > 0 THEN
               CAST(206.835 AS DOUBLE)
               - CAST(1.015 AS DOUBLE)
                 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
               - CAST(84.6 AS DOUBLE)
                 * (CAST(n_syllable_groups AS DOUBLE)
                    / CAST(n_words AS DOUBLE))
             END AS flesch
      FROM c)
    SELECT doc_id, n_words, n_sentences, n_syllable_groups, flesch,
           CASE WHEN n_words = 0 THEN NULL
                WHEN flesch >= CAST(90 AS DOUBLE) THEN 'very_easy'
                WHEN flesch >= CAST(60 AS DOUBLE) THEN 'standard'
                WHEN flesch >= CAST(30 AS DOUBLE) THEN 'difficult'
                ELSE 'very_confusing' END AS band
    FROM s
"""


# ---------------------------------------------------------------------------
# r10 registrations — the r9-staged trio, promoted per the r9 verdict
# and funded by the three sanctioned consolidations (pairwise_corr_dense,
# minhash_neardup, simhash_neardup retired from the registry; their
# operators and bit-equality/unit gates all stay).
# ---------------------------------------------------------------------------


def q_hard_negatives(spark: SparkSession, sf: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py hard_negatives):
    labels are vec_id mod 7, every 50th vector is an anchor (the
    training-batch side), the rest is the candidate pool; k=5 hardest
    different-label negatives per anchor.  Generalizes the reference's
    "most similar but different" top-K-per-group ranking semantics
    (static/main.js:1101-1103 family) to the contrastive-mining shape.
    Both lanes rank on UNROUNDED cosines with ties to the lower pool
    id — exactly the twin's row_number order."""
    from market_insights_app_spark.operators.similarity import hard_negatives

    emb = _emb(spark, sf).select(
        "vec_id", "embedding", (F.col("vec_id") % 7).alias("label")
    )
    anchors = emb.filter(F.col("vec_id") % 50 == 0)
    pool = emb.filter(F.col("vec_id") % 50 != 0)
    return hard_negatives(pool, anchors, k=5)


TEXTML_ORACLES["hard_negatives"] = """
    WITH e AS (SELECT vec_id, vec_id % 7 AS label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    a AS (SELECT * FROM e WHERE vec_id % 50 = 0),
    p AS (SELECT * FROM e WHERE vec_id % 50 <> 0),
    pairs AS (
      SELECT a.vec_id AS anchor_id, p.vec_id AS pid, p.label AS label,
             list_reduce(list_transform(list_zip(p.v, a.v),
                                        q -> q[1] * q[2]),
                         (x, y) -> x + y)
             / NULLIF(
                 sqrt(list_reduce(list_transform(p.v, x -> x * x),
                                  (x, y) -> x + y))
                 * sqrt(list_reduce(list_transform(a.v, x -> x * x),
                                    (x, y) -> x + y)), 0) AS raw
      FROM p CROSS JOIN a
      WHERE p.label <> a.label AND p.vec_id <> a.vec_id),
    ranked AS (SELECT anchor_id, pid, label, raw,
                      row_number() OVER (PARTITION BY anchor_id
                                         ORDER BY raw DESC, pid ASC) AS rnk
               FROM pairs WHERE raw IS NOT NULL)
    SELECT anchor_id, CAST(rnk AS INT) AS rank, pid AS vec_id, label,
           round(raw, 6) AS cosine
    FROM ranked WHERE rnk <= 5
"""


def q_kfold_column(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe k-fold CV assignment (operators/sampling.py
    kfold_column): fold_by_source keys the hash on the GROUP column so
    near-duplicate members of one source can never straddle a fold
    boundary (the domain_split construction restated for CV);
    fold_by_doc is the row-keyed shape.  Pure md5 predicates — portable
    by construction, stable under repartitioning."""
    from market_insights_app_spark.operators.sampling import kfold_column

    docs = _docs(spark, sf)
    return docs.select(
        "doc_id",
        "source",
        kfold_column("source", k=5).alias("fold_by_source"),
        kfold_column("doc_id", k=5, salt="kfold-doc-v1").alias("fold_by_doc"),
    )


TEXTML_ORACLES["kfold_column"] = """
    SELECT doc_id, source,
           CAST(CAST(('0x' || substr(md5('kfold-v1:'
                 || coalesce(CAST(source AS VARCHAR), 'NULL-key')), 1, 8))
                AS BIGINT) % 5 AS INT) AS fold_by_source,
           CAST(CAST(('0x' || substr(md5('kfold-doc-v1:'
                 || coalesce(CAST(doc_id AS VARCHAR), 'NULL-key')), 1, 8))
                AS BIGINT) % 5 AS INT) AS fold_by_doc
    FROM documents
"""


def q_temperature_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based mixture resampling (operators/sampling.py
    temperature_mixture, alpha=0.5): target proportions ∝ √|source| —
    the mT5/XLM-R sampling-temperature knob over the corpus's own
    counts, landing on mixture_sample's hash-predicate machinery.
    Returns the surviving rows so the differential hash covers the
    exact selection."""
    from market_insights_app_spark.operators.sampling import (
        temperature_mixture,
    )

    docs = _docs(spark, sf)
    return temperature_mixture(docs, alpha=0.5).select("doc_id", "source")


TEXTML_ORACLES["temperature_mixture"] = """
    WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS gn
               FROM documents WHERE source IS NOT NULL GROUP BY 1),
    j AS (SELECT source, gn, pow(CAST(gn AS DOUBLE), 0.5) AS w
          FROM c WHERE gn > 0),
    n AS (SELECT min(CAST(floor(gn / w) AS BIGINT)) AS N FROM j),
    r AS (SELECT j.source, least(1.0, n.N * j.w / j.gn) AS rate FROM j, n)
    SELECT d.doc_id, d.source
    FROM documents d JOIN r USING (source)
    WHERE CAST(('0x' || substr(md5('temp-mix-v1:'
               || CAST(d.doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) / 4294967296.0 < r.rate
"""


def q_split_leakage(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-split contamination audit (operators/dedup.py
    split_leakage_report): documents get the ★corpus_split 90/5/5
    hash split, then every exact (md5-fingerprint) and near
    (portable MinHash-LSH + exact-Jaccard ≥ 0.5) duplicate pair whose
    members straddle splits is reported per (rule, split_a, split_b)
    with a deterministic example pair — the leak audit a training
    pipeline runs when the partition was cut after imperfect dedup.
    The near lane rides the ★minhash_neardup_portable machinery, so
    every LSH stage of this oracle is already independently
    hash-gated."""
    from market_insights_app_spark.operators.dedup import (
        split_leakage_report,
    )
    from market_insights_app_spark.operators.sampling import hash_split

    docs = hash_split(_docs(spark, sf), id_col="doc_id", salt="corpus-v1")
    return split_leakage_report(docs, threshold=0.5, portable=True)


TEXTML_ORACLES["split_leakage"] = f"""
    WITH {_PORTABLE_PAIR_CTES},
    verified AS (SELECT a, b FROM pairs
                 WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5),
    sp AS (SELECT doc_id,
                  CASE WHEN frac < 0.9 THEN 'train'
                       WHEN frac < 0.95 THEN 'val'
                       ELSE 'test' END AS split
           FROM (SELECT doc_id,
                        CAST(('0x' || substr(md5('corpus-v1:'
                              || CAST(doc_id AS VARCHAR)), 1, 8))
                             AS BIGINT) / 4294967296.0 AS frac
                 FROM documents)),
    fp AS (SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents),
    exact AS (SELECT x.doc_id AS a, y.doc_id AS b
              FROM fp x JOIN fp y
                ON x.fp = y.fp AND x.doc_id < y.doc_id),
    united AS (
      SELECT 'exact' AS rule, a, b FROM exact
      UNION ALL
      SELECT 'near' AS rule, v.a, v.b FROM verified v
      WHERE NOT EXISTS (SELECT 1 FROM exact e
                        WHERE e.a = v.a AND e.b = v.b)),
    crossed AS (SELECT u.rule, u.a, u.b,
                       least(sa.split, sb.split) AS split_a,
                       greatest(sa.split, sb.split) AS split_b
                FROM united u
                JOIN sp sa ON sa.doc_id = u.a
                JOIN sp sb ON sb.doc_id = u.b
                WHERE sa.split <> sb.split),
    ranked AS (SELECT rule, split_a, split_b, a, b,
                      row_number() OVER (PARTITION BY rule, split_a,
                                         split_b ORDER BY a, b) AS rn,
                      COUNT(*) OVER (PARTITION BY rule, split_a,
                                     split_b) AS n
               FROM crossed)
    SELECT rule, split_a, split_b, CAST(n AS BIGINT) AS n_pairs,
           a AS example_a, b AS example_b
    FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# r12 registration: host_authority (staged in r11, promoted per the
# registry pre-stage plan, funded by the sanctioned sma5 consolidation
# -> N = 148 = 3W - 2 preserved).  The staging shelf below
# (STAGED_ORACLES — NOT collected: no q_ prefix) holds future rounds'
# candidates; each pair is gated NOW by direct Spark<->DuckDB parity
# tests plus the unicode and degenerate-input sweeps; a future round
# renames `staged_q_<name>` -> `q_<name>`, moves the oracle into
# TEXTML_ORACLES, and lists the name in _NEW_THIS_ROUND.
# ---------------------------------------------------------------------------

STAGED_ORACLES: dict[str, str] = {}


def q_host_authority(spark: SparkSession, sf: str) -> DataFrame:
    """The crawl front door's authority chain, hash-gated end-to-end:
    deterministic HTML pages synthesized from ``documents`` (pure
    codegen concat — each doc's page carries two real cross-host
    anchors, one commented-out ghost, one script-embedded ghost, one
    relative link, one fragment to cut) feed the REAL operators —
    functions/html.extract_outlinks → pipelines/crawl_corpus.
    host_link_graph_from_pages → host_pagerank (xxhash64 host ids into
    the integer-grid pagerank, ranks joined back to host names).

    The DuckDB twin never parses HTML: it derives the same host edge
    set from the same doc_id arithmetic (a STRONGER independent check
    than replaying the regex — if extract_outlinks ever matched a
    ghost anchor, missed a real one, or kept a fragment, the edge set
    and therefore every rank would diverge) and replays the proven
    ★pagerank_links 10-CTE integer grid keyed on host ids.  Rank
    values depend only on graph STRUCTURE, so the engines' different
    internal node ids (xxhash64 vs small ints) cannot matter."""
    from market_insights_app_spark.pipelines.crawl_corpus import (
        host_link_graph_from_pages,
        host_pagerank,
    )

    dm = (F.col("doc_id") % 97).cast("long")
    a1 = ((dm * 31 + 7) % 97).cast("string")
    a2 = ((dm * dm + 1) % 97).cast("string")
    pages = _docs(spark, sf).select(
        F.col("doc_id"),
        F.concat(
            F.lit('<html><body><!-- <a href="http://ghost.com/x">c</a>'
                  ' --><p>prose</p><a href="http://site'),
            a1,
            F.lit('.com/a">1</a><script>var s="<a href=\'http://sghost'
                  '.com/y\'>g</a>";</script><a href="https://site'),
            a2,
            F.lit('.com/b#frag">2</a><a href="/rel">r</a></body></html>'),
        ).alias("html"),
        F.concat(
            F.lit("http://site"), dm.cast("string"), F.lit(".com/p")
        ).alias("uri"),
    )
    # the synthesized universe is ≤ 97 hosts — the single-Arrow-task
    # pagerank lane (bit-identical, tests/test_graph.py) replaces ~30
    # scheduler-bound jobs with one
    return host_pagerank(
        host_link_graph_from_pages(pages),
        iterations=10,
        tiny_threshold=100_000,
    )


def _host_pagerank_oracle(iters: int = 10) -> str:
    grid, damp = 1_000_000_000, 85
    tel = f"(CAST({100 - damp} AS BIGINT) * {grid}) // (100 * m)"
    steps = []
    for k in range(1, iters + 1):
        steps.append(f"""
    pr{k} AS (
      SELECT nd.node,
             CAST({tel} + coalesce(({damp} * c.s) // 100, 0) AS BIGINT)
               AS rank_grid
      FROM nodes nd CROSS JOIN m_t
      LEFT JOIN (SELECT e.dst, sum(p.rank_grid // o.outd) AS s
                 FROM edges e
                 JOIN pr{k - 1} p ON e.src = p.node
                 JOIN outdeg o ON o.src = e.src
                 GROUP BY e.dst) c ON c.dst = nd.node
    )""")
    return f"""
    WITH hm AS (SELECT doc_id % 97 AS src,
                       (doc_id % 97) * 31 + 7 AS r1,
                       (doc_id % 97) * (doc_id % 97) + 1 AS r2
                FROM documents),
    raw AS (SELECT src, r1 % 97 AS dst FROM hm
            UNION ALL SELECT src, r2 % 97 FROM hm),
    edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outd
               FROM edges GROUP BY src),
    m_t AS (SELECT CAST(count(*) AS BIGINT) AS m FROM nodes),
    pr0 AS (SELECT node, CAST({grid} // m AS BIGINT) AS rank_grid
            FROM nodes CROSS JOIN m_t),{",".join(steps)}
    SELECT 'site' || CAST(node AS VARCHAR) || '.com' AS host,
           rank_grid / CAST({grid} AS DOUBLE) AS host_pagerank
    FROM pr{iters}
"""


TEXTML_ORACLES["host_authority"] = _host_pagerank_oracle()


# single cleanup slot for q_txn_merge's discard-after-read gate table
# (bounds the per-call mkdtemp leak to one directory; see below).  The
# atexit hook clears the LAST dir when the process ends — without it
# every bench/sweep process would strand one table on the RAM-backed
# filesystem.
_TXN_MERGE_DIR: list = []


def _txn_merge_cleanup() -> None:
    import shutil

    while _TXN_MERGE_DIR:
        shutil.rmtree(_TXN_MERGE_DIR.pop(), ignore_errors=True)


import atexit  # noqa: E402

atexit.register(_txn_merge_cleanup)


def q_txn_merge(spark: SparkSession, sf: str) -> DataFrame:
    """r13 registration (staged r12): the ACID MERGE surface (D5's
    transactional form, storage/txnlog.TxnTable.merge — reference
    db.py:166-201's update-else-insert) hash-gated ROW-LEVEL instead
    of unit-only: build a fresh log-backed table from a deterministic
    `events` slice, MERGE a deterministic update set (overlap →
    replace, novel keys → insert), and return the post-merge table
    read back through the snapshot log.

    Slice design (all arithmetic on the unique int64 event_id, exact
    in both engines): base = event_id % 7 ∈ {0..3}; updates =
    event_id % 7 ∈ {2..5} carrying value*2+1 (FP-exact: one scale by
    2, one add).  MERGE on event_id therefore REPLACES {2,3},
    INSERTS {4,5}, and leaves {0,1} untouched — the final state
    exercises every MERGE branch plus the min/max data-skipping stats
    the table writes per directory.

    The DuckDB twin never replays the log: it derives the same final
    state declaratively as (base NOT EXISTS updates) ∪ updates — the
    anti/union algebra MERGE is defined by.  The table lives in a
    per-call temp dir (POSIX path, like the streaming replays' memory
    sinks); output depends only on the input slice."""
    import shutil
    import tempfile

    from market_insights_app_spark.storage.txnlog import TxnTable

    ev = load_table(spark, sf, "events").select(
        "event_id", "user_id", "value"
    )
    m = F.col("event_id") % 7
    base = ev.filter(m <= 3)
    updates = ev.filter((m >= 2) & (m <= 5)).select(
        "event_id",
        "user_id",
        (F.col("value") * 2 + 1).alias("value"),
    )
    # Single-use gate table on a RAM-backed dir when available (r13,
    # same contract as the streaming replays' _replay_checkpoint_dir):
    # the table is written, read once and discarded, so disk-backed
    # /tmp paid pure fsync overhead — and the old mkdtemp LEAKED one
    # data dir per call.  Single cleanup slot: the previous call's dir
    # is removed on the next call (its action is long finished by
    # then), bounding the footprint to one ~MB-scale table.
    base_dir = os.environ.get("SPARK_GRAFT_CKPT_BASE")
    if base_dir is None and os.path.isdir("/dev/shm") and os.access(
        "/dev/shm", os.W_OK
    ):
        base_dir = "/dev/shm"
    prev = _TXN_MERGE_DIR.pop() if _TXN_MERGE_DIR else None
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    path = tempfile.mkdtemp(prefix="mias_txn_merge_", dir=base_dir)
    _TXN_MERGE_DIR.append(path)
    t = TxnTable(spark, path)
    t.append(base, stats_col="event_id")
    t.merge(updates, key_cols=["event_id"])
    return t.read().select("event_id", "user_id", "value")


TEXTML_ORACLES["txn_merge"] = """
    WITH upd AS (SELECT event_id, user_id, value * 2 + 1 AS value
                 FROM events WHERE event_id % 7 BETWEEN 2 AND 5)
    SELECT event_id, user_id, value FROM events
    WHERE event_id % 7 <= 3
      AND NOT EXISTS (SELECT 1 FROM upd WHERE upd.event_id = events.event_id)
    UNION ALL
    SELECT event_id, user_id, value FROM upd
"""


def staged_q_heavy_hitters_stream(spark: SparkSession, sf: str) -> DataFrame:
    """r13 staging candidate: the streaming frequent-items readout
    (streaming/ingest.windowed_heavy_hitters — Spark 4's
    ``approx_top_k`` mergeable sketch inside a windowed streaming
    aggregate) hash-gated end-to-end: events replayed as an
    availableNow file stream, 30-minute tumbling windows per
    event_type, drained complete-mode into a memory sink (the
    ohlc-replay pattern, so every window's final summary lands).

    Exactness contract that makes a value-hash possible: the sketch is
    EXACT while distinct keys fit ``max_items_tracked`` (10k here vs
    a handful of event types), and k=16 exceeds the key cardinality so
    no window truncates — the only nondeterminism left is the sketch's
    tie ORDER, which this query discards by re-ranking with a
    deterministic row_number over (est_count desc, item).  The DuckDB
    twin computes the same windows with plain GROUP BY + row_number.
    On a real unbounded-cardinality stream the same query is
    MG-bounded (approximate) — that regime is exercised by the batch
    sketches tests, not hash-gated here."""
    import uuid

    from pyspark.sql.window import Window as SqlWindow

    from market_insights_app_spark.streaming.ingest import (
        events_file_stream,
        run_available_now_to_memory,
        windowed_heavy_hitters,
    )

    name = f"hh_replay_{uuid.uuid4().hex[:8]}"
    stream = events_file_stream(spark, sf, max_files_per_trigger=10_000)
    hh = windowed_heavy_hitters(
        stream,
        key_col="event_type",
        ts_col="ts",
        duration="30 minutes",
        k=16,
        max_items_tracked=10_000,
    )
    run_available_now_to_memory(hh, name, "complete", shuffle_partitions=8)
    out = spark.table(name)
    rw = SqlWindow.partitionBy("window_start").orderBy(
        F.desc("est_count"), F.asc("item")
    )
    return out.select(
        ts_us("window_start").alias("window_start_us"),
        F.col("item"),
        F.col("est_count").cast("long").alias("est_count"),
        F.row_number().over(rw).cast("int").alias("rank"),
    )


STAGED_ORACLES["heavy_hitters_stream"] = """
    WITH c AS (
      SELECT epoch_us(time_bucket(INTERVAL '30 minutes', ts))
               AS window_start_us,
             event_type AS item, COUNT(*) AS est_count
      FROM events GROUP BY 1, 2
    )
    SELECT window_start_us, item, est_count,
           CAST(row_number() OVER (PARTITION BY window_start_us
                ORDER BY est_count DESC, item) AS INT) AS rank
    FROM c
"""


def staged_q_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """r15 staging candidate: per-node triangle counts over the
    deterministic skewed link graph (operators/graph.triangle_count —
    degree-ordered wedge enumeration, Schank & Wagner 2005 / Suri &
    Vassilvitskii WWW'11) — the third graph primitive after PageRank
    and connected components, and the one whose naive form is the
    canonical scale killer (sum(deg²) wedges at a power-law hub).
    The Spark lane enumerates each triangle exactly once via the
    (degree, id) total order; the DuckDB twin enumerates the same
    triangle SET the naive a<b<c way over the identically-derived
    canonical edge list — orientation changes the join plan, never the
    triangle set, so per-corner counts hash-match exactly (pure int64
    arithmetic end-to-end)."""
    from market_insights_app_spark.operators.graph import (
        synthetic_link_graph,
        triangle_count,
    )

    return triangle_count(synthetic_link_graph(_docs(spark, sf)))


STAGED_ORACLES["triangle_count"] = """
    WITH n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    raw AS (
      SELECT doc_id AS src,
             ((doc_id % n) * (doc_id % n) + 1) % n AS dst
      FROM documents CROSS JOIN n_t
      UNION ALL
      SELECT doc_id, (doc_id * 31 + 7) % n FROM documents CROSS JOIN n_t
      UNION ALL
      SELECT doc_id, doc_id % greatest(n // 50, 1)
      FROM documents CROSS JOIN n_t
    ),
    und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM raw WHERE src <> dst),
    tri AS (SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
            FROM und e1
            JOIN und e2 ON e2.a = e1.b
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
    corners AS (SELECT ta AS node FROM tri
                UNION ALL SELECT tb FROM tri
                UNION ALL SELECT tc FROM tri)
    SELECT node, CAST(count(*) AS BIGINT) AS triangles
    FROM corners GROUP BY node
"""


def staged_q_semdedup_bucketed_roundtrip(
    spark: SparkSession, sf: str
) -> DataFrame:
    """r15 staging candidate: the write-once bucketed SemDeDup layout
    hash-gated THROUGH the catalog round-trip — fit + label + bucketed
    WRITE + read-back + screen (operators/similarity.semdedup_bucketed)
    with the same parameters as ★semdedup, so the DuckDB twin is
    ★semdedup's oracle verbatim: survivors are bit-identical by the
    shared-screen construction (pinned in tests), and a driver row
    would close the one residual gap the r12 verdict named — the
    write→read round-trip through the catalog is itself logic the
    in-session row never executes.  The per-call uuid table lives in
    the session warehouse (the txn_merge temp-dir pattern; output
    depends only on the input slice)."""
    import uuid

    from market_insights_app_spark.operators.similarity import (
        semdedup_bucketed,
    )

    return semdedup_bucketed(
        _emb(spark, sf),
        f"sdd_bkt_rt_{uuid.uuid4().hex[:8]}",
        k=8,
        iters=2,
        threshold=0.4,
    )


STAGED_ORACLES["semdedup_bucketed_roundtrip"] = TEXTML_ORACLES["semdedup"]


def staged_q_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """r16 staging candidate: classical additive seasonal
    decomposition per event_type (operators/market.seasonal_decompose
    — hourly bucket sums, centered 25-row moving-average trend,
    hour-of-day seasonal means of the detrended series, residual
    remainder).  The reference charts raw series (main.js chart
    panels); this is the follow-on question every metrics consumer
    asks of them — "is that spike seasonal or real" — decomposed with
    the module's DECIMAL discipline so trend/seasonal/residual are
    single double expressions over exact sums, value-hashable
    cross-engine.  The DuckDB twin replays bucket→window→slot algebra
    declaratively; ns→µs timestamp truncation cannot move an hour
    boundary, so the staged oracle reads events raw (the
    heavy_hitters_stream precedent)."""
    from market_insights_app_spark.operators.market import (
        seasonal_decompose,
    )

    ev = load_table(spark, sf, "events")
    return seasonal_decompose(ev)


STAGED_ORACLES["seasonal_decompose"] = """
    WITH b AS (
      SELECT event_type AS k, date_trunc('hour', ts) AS h,
             sum(CAST(value AS DECIMAL(8,2))) AS y
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT k, h, y,
             sum(y)   OVER w AS tsum,
             count(y) OVER w AS tn,
             count(*) OVER w AS nr
      FROM b WINDOW w AS (PARTITION BY k ORDER BY h
                          ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    t2 AS (
      SELECT k, h, y,
             CASE WHEN tn = 25 AND nr = 25
                  THEN CAST(tsum AS DOUBLE) / 25.0 END AS trend,
             CASE WHEN tn = 25 AND nr = 25
                  THEN y * 25 - tsum END AS det,
             hour(h) AS slot
      FROM t
    ),
    s AS (
      SELECT k, slot, sum(det) AS sn, count(det) AS sc
      FROM t2 GROUP BY 1, 2
    )
    SELECT t2.k AS event_type, epoch_us(t2.h) AS bucket_us,
           round(CAST(t2.y AS DOUBLE), 6) AS bucket_value,
           round(t2.trend, 6) AS trend,
           round(CASE WHEN s.sc > 0
                 THEN CAST(s.sn AS DOUBLE) / (25.0 * CAST(s.sc AS DOUBLE))
                 END, 6) AS seasonal,
           round(CASE WHEN t2.trend IS NOT NULL AND s.sc > 0
                 THEN CAST(t2.y AS DOUBLE) - t2.trend
                      - CAST(s.sn AS DOUBLE) / (25.0 * CAST(s.sc AS DOUBLE))
                 END, 6) AS residual
    FROM t2 JOIN s ON s.k = t2.k AND s.slot = t2.slot
"""


def staged_q_link_prediction_cn(spark: SparkSession, sf: str) -> DataFrame:
    """r16 staging candidate: common-neighbor link prediction over the
    deterministic skewed link graph (operators/graph.
    link_predict_common_neighbors — Liben-Nowell & Kleinberg 2003) —
    the fourth graph primitive, and the first whose SCALE SEMANTICS
    (the max_center_degree wedge cap, see the operator docstring) are
    part of the query definition: the DuckDB twin replays the SAME cap
    over the same degree table, so the gate hash-checks the capped
    enumeration itself, hub exclusions included (the synthetic graph's
    hub arm pushes nodes past the cap at every sf — 10 hubs at the
    500-doc gate scales, 111 at sf0.1 — so the cap genuinely binds).
    Pure int64 arithmetic end-to-end."""
    from market_insights_app_spark.operators.graph import (
        link_predict_common_neighbors,
        synthetic_link_graph,
    )

    return link_predict_common_neighbors(
        synthetic_link_graph(_docs(spark, sf))
    )


STAGED_ORACLES["link_prediction_cn"] = """
    WITH n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    raw AS (
      SELECT doc_id AS src,
             ((doc_id % n) * (doc_id % n) + 1) % n AS dst
      FROM documents CROSS JOIN n_t
      UNION ALL
      SELECT doc_id, (doc_id * 31 + 7) % n FROM documents CROSS JOIN n_t
      UNION ALL
      SELECT doc_id, doc_id % greatest(n // 50, 1)
      FROM documents CROSS JOIN n_t
    ),
    und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM raw WHERE src <> dst),
    deg AS (SELECT node, count(*) AS d
            FROM (SELECT a AS node FROM und
                  UNION ALL SELECT b FROM und)
            GROUP BY node),
    adj AS (SELECT a AS node, b AS nbr FROM und
            UNION ALL SELECT b, a FROM und),
    cadj AS (SELECT adj.node, adj.nbr FROM adj
             JOIN deg ON deg.node = adj.node AND deg.d <= 32),
    pairs AS (SELECT a1.nbr AS a, a2.nbr AS b
              FROM cadj a1 JOIN cadj a2
                ON a1.node = a2.node AND a1.nbr < a2.nbr),
    fresh AS (SELECT a, b FROM pairs
              WHERE NOT EXISTS (SELECT 1 FROM und
                                WHERE und.a = pairs.a AND und.b = pairs.b))
    SELECT a AS node_a, b AS node_b,
           CAST(count(*) AS BIGINT) AS common_neighbors
    FROM fresh GROUP BY a, b HAVING count(*) >= 2
"""


def staged_q_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """r17 staging candidate: k-core decomposition survivors over the
    deterministic skewed link graph PLUS a ~20-node clique arm
    (operators/graph.kcore / synthetic_clique, k=5, 8 synchronized
    peeling rounds — the pagerank fixed-iterations contract, so the
    DuckDB twin replays the identical 8-round peel as unrolled
    MATERIALIZED CTEs and the gate hash-checks every round's
    simultaneous-deletion semantics).  Fixture calibration (measured
    at staging): k=5 peels deeply THROUGH a multi-round cascade
    (sf0.1: 879 → 200 → 23 survivors by rounds 1/2/4) and stabilizes
    on the clique core — the bare link graph is too homogeneous (k=4
    empties, k=3 never peels), which is exactly why the clique arm
    exists.  The fifth graph primitive (after PageRank, connected
    components, triangles, link prediction): the standard "dense
    enough to matter" filter a graph pipeline runs before
    community/motif work.  Pure int64."""
    from market_insights_app_spark.operators.graph import (
        kcore,
        synthetic_clique,
        synthetic_link_graph,
    )

    docs = _docs(spark, sf)
    g = synthetic_link_graph(docs).union(synthetic_clique(docs))
    return kcore(g, k=5, rounds=8)


# shared by the kcore and label_propagation twins: the deterministic
# skewed link graph + ~20-node clique arm, canonicalized undirected
_LINK_CLIQUE_E0_SQL = """
    WITH n_t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    raw AS (
      SELECT doc_id AS src,
             ((doc_id % n) * (doc_id % n) + 1) % n AS dst
      FROM documents CROSS JOIN n_t
      UNION ALL
      SELECT doc_id, (doc_id * 31 + 7) % n FROM documents CROSS JOIN n_t
      UNION ALL
      SELECT doc_id, doc_id % greatest(n // 50, 1)
      FROM documents CROSS JOIN n_t
      UNION ALL
      SELECT c1.doc_id, c2.doc_id
      FROM documents c1 CROSS JOIN n_t, documents c2
      WHERE c1.doc_id % greatest(n // 20, 1) = 0
        AND c2.doc_id % greatest(n // 20, 1) = 0
        AND c1.doc_id < c2.doc_id
    ),
    e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
           FROM raw WHERE src <> dst)"""


def _kcore_oracle(k: int = 3, rounds: int = 8) -> str:
    # Every CTE is AS MATERIALIZED: DuckDB inlines plain CTEs, and each
    # peel round references its predecessor ~4 times (degree union x2,
    # survivor joins x2), so the inlined e8 expands ~4^8 subtrees and
    # re-opens the parquet at every leaf ("Too many open files", found
    # at staging).  The pagerank oracle survives unmaterialized only
    # because its chain is linear.
    steps = []
    for r in range(rounds):
        steps.append(f"""
    d{r} AS MATERIALIZED (SELECT node, count(*) AS c
             FROM (SELECT a AS node FROM e{r}
                   UNION ALL SELECT b FROM e{r})
             GROUP BY node),
    s{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE c >= {k}),
    e{r + 1} AS MATERIALIZED (SELECT e{r}.a, e{r}.b FROM e{r}
                 JOIN s{r} x ON x.node = e{r}.a
                 JOIN s{r} y ON y.node = e{r}.b)""")
    return f"""{_LINK_CLIQUE_E0_SQL},{",".join(steps)}
    SELECT node, CAST(count(*) AS BIGINT) AS degree
    FROM (SELECT a AS node FROM e{rounds}
          UNION ALL SELECT b FROM e{rounds})
    GROUP BY node
"""


STAGED_ORACLES["kcore"] = _kcore_oracle(k=5)


def staged_q_zorder_skip_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """r18 staging candidate: the Z-order data-skipping path hash-gated
    THROUGH storage (the semdedup_bucketed_roundtrip pattern applied to
    layout.py, whose gates today are unit-only): events are z-order
    clustered on (user_id, value) into 16 files (operators/layout.
    zorder_assign — Morton interleave, one repartitionByRange), written
    to parquet partitioned by file, per-file min/max stats derived from
    the READ-BACK data (what a table format's footer records), a 2-D
    box predicate prunes files on those stats, and ONLY surviving files
    are re-read and row-filtered.  The DuckDB twin is the plain WHERE —
    so a hash match proves min/max pruning dropped no qualifying row
    (false-negative-free skipping), whatever file boundaries the range
    partitioner sampled.  The skip RATIO is deliberately not in the
    gate (boundaries are sampling-dependent); it is priced in
    scripts/zorder_probe.py and pinned directionally in
    tests/test_zorder_layout.py."""
    import tempfile

    from market_insights_app_spark.operators.layout import (
        layout_stats,
        zorder_assign,
    )

    lo_u, hi_u, lo_v, hi_v = 10, 40, 20.0, 80.0
    ev = load_table(spark, sf, "events").select(
        "event_id", "user_id", "value"
    )
    root = tempfile.mkdtemp(prefix="mias_zorder_rt_")
    laid = zorder_assign(ev, ["user_id", "value"], n_files=16)
    laid.write.mode("overwrite").partitionBy("__file").parquet(root)
    # explicit schema: an EMPTY corpus writes no partition dirs, and a
    # schema-less read of the bare root cannot infer one (found by the
    # degenerate sweep)
    back = spark.read.schema(laid.schema).parquet(root)
    stats = layout_stats(back, ["user_id", "value"]).collect()
    keep = [
        r["__file"]
        for r in stats
        if r["min_user_id"] is not None
        and r["max_user_id"] >= lo_u
        and r["min_user_id"] <= hi_u
        and r["max_value"] >= lo_v
        and r["min_value"] <= hi_v
    ]
    row_filter = (
        F.col("user_id").between(lo_u, hi_u)
        & F.col("value").between(lo_v, hi_v)
    )
    cols = ["event_id", "user_id", "value"]
    if not keep:
        return ev.filter(row_filter).limit(0).select(*cols)
    pruned = spark.read.parquet(
        *[f"{root}/__file={k}" for k in keep]
    )
    return pruned.filter(row_filter).select(*cols)


STAGED_ORACLES["zorder_skip_roundtrip"] = """
    SELECT event_id, user_id, value FROM events
    WHERE user_id BETWEEN 10 AND 40 AND value BETWEEN 20.0 AND 80.0
"""


def staged_q_cdc_stream_apply(spark: SparkSession, sf: str) -> DataFrame:
    """r19 staging candidate: the CDC round-trip law extended through
    STREAMING and ACID storage in one gate — the ★cdc_apply_roundtrip
    change feed (reconcile.snapshot_diff over the deterministic orders
    snapshots) is written to files, replayed as a file STREAM in
    multiple micro-batches (maxFilesPerTrigger=2 over 8 files), and
    each micro-batch lands on a TxnTable seeded with OLD as one atomic
    MERGE via streaming/ingest.cdc_apply_batch (soft-delete
    tombstones, no driver key collection).  The final non-tombstone
    state read back through the snapshot log must equal NEW computed
    directly — the DuckDB twin never sees the diff, the stream, or
    the log.  What this gates that the batch row cannot: micro-batch
    boundary invariance (diff rows are one-per-key so disjoint merges
    commute), the foreachBatch→MERGE composition, and the read-after-
    stream snapshot."""
    import tempfile

    from market_insights_app_spark.operators.reconcile import snapshot_diff
    from market_insights_app_spark.storage.txnlog import TxnTable
    from market_insights_app_spark.streaming.ingest import (
        cdc_apply_batch,
        run_available_now_foreach_batch,
    )

    orders = load_table(spark, sf, "orders")
    old = orders.filter(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderpriority") == "1-URGENT",
                F.col("o_totalprice") + F.lit(10.0),
            ).otherwise(F.col("o_totalprice")),
        )
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )
    diff = snapshot_diff(
        old, new, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
    )
    feed = tempfile.mkdtemp(prefix="mias_cdc_feed_")
    diff.repartition(8).write.mode("overwrite").parquet(feed)

    t = TxnTable(spark, tempfile.mkdtemp(prefix="mias_cdc_tbl_"))
    t.append(
        old.withColumn("deleted", F.lit(False)), stats_col="o_orderkey"
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(feed).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(feed)
    )
    run_available_now_foreach_batch(
        stream,
        lambda b: cdc_apply_batch(
            b, t, ["o_orderkey"], ["o_totalprice", "o_orderstatus"]
        ),
        shuffle_partitions=8,
    )
    return (
        t.read()
        .filter(~F.col("deleted"))
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "o_orderstatus",
        )
    )


STAGED_ORACLES["cdc_stream_apply"] = """
    SELECT o_orderkey,
           round(CASE WHEN o_orderpriority = '1-URGENT'
                      THEN o_totalprice + 10.0 ELSE o_totalprice END, 2)
             AS totalprice,
           o_orderstatus
    FROM orders WHERE o_orderkey % 97 <> 0
"""


def staged_q_forget_propagation(spark: SparkSession, sf: str) -> DataFrame:
    """r20 staging candidate: the right-to-be-forgotten law gated
    through ACID storage AND derived-view recompute in one hash.  A
    deterministic duplicate corpus (documents ∪ a doc_id+100000 copy of
    itself) is appended to a TxnTable, the forget set (doc_id % 53 = 0)
    is removed with delete_where, history is truncated and vacuumed so
    the forgotten bytes physically leave storage (storage/txnlog.
    truncate_history — the Delta logRetentionDuration analog; a row
    DELETE alone keeps the bytes reachable via time travel), and
    exact-dedup survivors are RECOMPUTED from the surviving snapshot
    (generalizing reference db.py:92-99 delete + db.py:126-131 dedup).
    The DuckDB twin computes survivors over the retained corpus
    directly — it never sees the table, the log, or the vacuum.

    What the hash distinguishes that a filter-the-old-output
    implementation gets wrong: clusters whose keeper was forgotten
    (doc_id ≡ 0 mod 53) must RE-ELECT the retained copy as keeper
    (keeper becomes doc_id+100000); clusters that lost only the copy
    (doc_id ≡ 11 mod 53, since 100000 ≡ 42 mod 53) shrink n 2→1 with
    the keeper unchanged; every other cluster is untouched.  Physical
    erasure itself is unit-pinned (tests/test_txn_table.py
    test_truncate_history_enables_physical_forget) — a value hash
    cannot see storage."""
    import tempfile

    from market_insights_app_spark.storage.txnlog import TxnTable

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.select((F.col("doc_id") + F.lit(100000)).alias("doc_id"), "text")
    )
    out_schema = "fp string, keeper bigint, n bigint"
    if corpus.isEmpty():
        # an empty corpus has no first commit to delete from; the
        # degenerate-sweep contract is an empty result, not a stacktrace
        return spark.createDataFrame([], out_schema)
    t = TxnTable(spark, tempfile.mkdtemp(prefix="mias_forget_"))
    t.append(corpus, stats_col="doc_id")
    t.delete_where(F.col("doc_id") % 53 == 0)
    t.truncate_history()
    t.vacuum(retain_seconds=0.0)
    retained = t.read()
    return (
        retained.select(TX.md5_fingerprint("text").alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n"))
    )


STAGED_ORACLES["forget_propagation"] = f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents
    )
    SELECT md5({_NORM_SQL}) AS fp, min(doc_id) AS keeper, COUNT(*) AS n
    FROM corpus WHERE doc_id % 53 <> 0
    GROUP BY 1
"""


def staged_q_label_propagation(spark: SparkSession, sf: str) -> DataFrame:
    """Shelf alternate (registerable whenever a round frees a slot —
    every named round through r20 already carries a primary): community
    detection by synchronous min-tie label propagation over the
    deterministic skewed link graph + clique arm (operators/graph.
    label_propagation, 4 bulk-synchronous rounds — the pagerank
    fixed-iterations contract, so the DuckDB twin replays the identical
    4 rounds as unrolled MATERIALIZED CTEs with a row_number argmax per
    node and the gate hash-checks every round's simultaneous-adoption
    semantics).  The sixth graph primitive: connected components give
    reachability classes, LPA splits them into densely-linked
    communities (the clique arm must collapse onto its minimum member —
    pinned in tests/test_graph.py).  Pure int64."""
    from market_insights_app_spark.operators.graph import (
        label_propagation,
        synthetic_clique,
        synthetic_link_graph,
    )

    docs = _docs(spark, sf)
    g = synthetic_link_graph(docs).union(synthetic_clique(docs))
    return label_propagation(g, rounds=4)


def _lpa_oracle(rounds: int = 4) -> str:
    steps = []
    for r in range(rounds):
        steps.append(f"""
    c{r} AS MATERIALIZED (SELECT adj.node, l.label, count(*) AS c
             FROM adj JOIN l{r} l ON l.node = adj.nbr
             GROUP BY 1, 2),
    l{r + 1} AS MATERIALIZED (SELECT node, label FROM (
               SELECT node, label,
                      row_number() OVER (PARTITION BY node
                                         ORDER BY c DESC, label ASC) AS rn
               FROM c{r}) WHERE rn = 1)""")
    return f"""{_LINK_CLIQUE_E0_SQL},
    adj AS MATERIALIZED (SELECT a AS node, b AS nbr FROM e0
           UNION ALL SELECT b AS node, a AS nbr FROM e0),
    l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM adj),{",".join(steps)}
    SELECT node, label FROM l{rounds}
"""


STAGED_ORACLES["label_propagation"] = _lpa_oracle(rounds=4)


def staged_q_bootstrap_ci(spark: SparkSession, sf: str) -> DataFrame:
    """Shelf alternate: per-language bootstrap CI of mean document
    length by the POISSON bootstrap (Chamandy et al. 2012 — the
    one-pass, coordination-free resampling a 100 TB readout needs:
    each row enters replicate b with a hash-deterministic Poisson(1)
    weight; operators/sampling.poisson_bootstrap_ci).  Engine-exact by
    construction: identical md5-uniforms and CDF literals on both
    sides, DECIMAL replicate sums, and LOWER-ORDER-STATISTIC interval
    bounds via row_number (no percentile interpolation arithmetic to
    drift a ULP).  201 replicates put the 2.5/97.5 cut indices on
    exact percentile positions.  The twin replays every stage in SQL —
    weights, replicate means, ranking, order-statistic selection."""
    from market_insights_app_spark.operators.sampling import (
        poisson_bootstrap_ci,
    )

    docs = _docs(spark, sf)
    return poisson_bootstrap_ci(
        docs, value_col="n_chars", group_col="lang", id_col="doc_id"
    )


STAGED_ORACLES["bootstrap_ci"] = """
    WITH base AS (
      SELECT lang AS g, doc_id AS id, CAST(n_chars AS DECIMAL(8,2)) AS v
      FROM documents
    ),
    rep AS (
      SELECT g, id, v, b
      FROM base CROSS JOIN (SELECT unnest(range(201)) AS b)
    ),
    wtd AS (
      SELECT g, b, v,
        CASE
          WHEN u < 0.36787944117144233 THEN 0
          WHEN u < 0.7357588823428847 THEN 1
          WHEN u < 0.9196986029286058 THEN 2
          WHEN u < 0.9810118431238463 THEN 3
          WHEN u < 0.9963401531726563 THEN 4
          WHEN u < 0.9994058151824183 THEN 5
          WHEN u < 0.999916758850712 THEN 6
          WHEN u < 0.9999897508033253 THEN 7
          WHEN u < 0.999998874797402 THEN 8
          ELSE 9 END AS k
      FROM (SELECT g, id, v, b,
              CAST(('0x' || substr(md5('boot-v1:' || CAST(id AS VARCHAR)
                    || ':' || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT)
                / 4294967296.0 AS u
            FROM rep) t
    ),
    means AS (
      SELECT g, b, CAST(SUM(k * v) AS DOUBLE) / CAST(SUM(k) AS DOUBLE) AS m
      FROM wtd GROUP BY 1, 2 HAVING SUM(k) > 0
    ),
    ranked AS (
      SELECT g, b, m,
             row_number() OVER (PARTITION BY g ORDER BY m, b) AS rn,
             count(*) OVER (PARTITION BY g) AS cnt
      FROM means
    ),
    ci AS (
      SELECT g,
             max(CASE WHEN rn = CAST(floor(0.025 * (cnt - 1)) AS BIGINT) + 1
                      THEN m END) AS ci_lo,
             max(CASE WHEN rn = CAST(floor(0.975 * (cnt - 1)) AS BIGINT) + 1
                      THEN m END) AS ci_hi,
             count(*) AS n_replicates
      FROM ranked GROUP BY 1
    ),
    overall AS (
      SELECT g, count(*) AS n, CAST(SUM(v) AS DOUBLE) / count(*) AS mean
      FROM base GROUP BY 1
    )
    SELECT overall.g AS lang, n, mean, ci_lo, ci_hi, n_replicates
    FROM overall JOIN ci USING (g)
"""


def staged_q_bfs_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Shelf alternate: multi-source BFS depth from the clique-arm hub
    set over the deterministic link graph (operators/graph.
    bfs_distance, 6 frontier-relaxation rounds — the pagerank
    fixed-iterations contract; the DuckDB twin replays the identical
    6 relaxations as unrolled MATERIALIZED CTEs).  The crawl
    scheduler's primitive — depth from seed hosts prioritizes the
    fetch frontier — and the seventh graph primitive.  Seeds are the
    ~20 clique members (doc_id ≡ 0 mod max(n/20, 1), the same hub set
    synthetic_clique links), so the depth field radiates from the
    densely-connected core.  Pure int64."""
    from market_insights_app_spark.operators.graph import (
        bfs_distance,
        synthetic_clique,
        synthetic_link_graph,
    )

    docs = _docs(spark, sf)
    g = synthetic_link_graph(docs).union(synthetic_clique(docs))
    cnt = docs.groupBy().agg(F.count(F.lit(1)).alias("n"))
    step = F.greatest(F.expr("n div 20"), F.lit(1).cast("long"))
    seeds = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(cnt))
        .filter(F.col("doc_id") % step == 0)
        .select(F.col("doc_id").alias("node"))
    )
    return bfs_distance(g, seeds, rounds=6)


def _bfs_oracle(rounds: int = 6) -> str:
    steps = []
    for r in range(rounds):
        steps.append(f"""
    d{r + 1} AS MATERIALIZED (
      SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{r}
        UNION ALL
        SELECT adj.node, d.dist + 1 AS dist
        FROM adj JOIN d{r} d ON d.node = adj.nbr
      ) GROUP BY 1)""")
    return f"""{_LINK_CLIQUE_E0_SQL},
    adj AS MATERIALIZED (SELECT a AS node, b AS nbr FROM e0
           UNION ALL SELECT b AS node, a AS nbr FROM e0),
    d0 AS MATERIALIZED (
      SELECT doc_id AS node, CAST(0 AS BIGINT) AS dist
      FROM documents CROSS JOIN n_t
      WHERE doc_id % greatest(n // 20, 1) = 0),{",".join(steps)}
    SELECT node, dist FROM d{rounds}
"""


STAGED_ORACLES["bfs_distance"] = _bfs_oracle(rounds=6)


def staged_q_holt_stateful_replay(spark: SparkSession, sf: str) -> DataFrame:
    """Shelf alternate: the THIRD custom stateful operator hash-gated
    through a real stream replay — per-key Holt double exponential
    smoothing (level + trend; streaming/ingest.holt_stateful, α=1/4,
    β=1/8 — dyadic, so 1−α / 1−β are exact doubles and the fold is
    bit-reproducible from plain literals) run by applyInPandasWithState
    over the events parquet replayed as an availableNow file stream.
    The DuckDB twin replays the identical fold as a struct-accumulator
    list_reduce in (ts, event_id) order — the l-expression appears
    twice in the lambda (SQL lambdas bind no intermediates) but
    deterministic FP makes the recomputation bit-identical to the
    operator's reuse.  Forecast surface: forecast1 = level + trend is
    the one-step-ahead prediction the EMA's trendless state cannot
    express."""
    import uuid as _uuid

    from pyspark.sql.window import Window as W

    from market_insights_app_spark.streaming.ingest import (
        events_file_stream,
        holt_stateful,
        run_available_now_to_memory,
    )

    name = f"holt_replay_{_uuid.uuid4().hex[:8]}"
    stream = events_file_stream(spark, sf, max_files_per_trigger=10_000)
    run_available_now_to_memory(
        holt_stateful(stream), name, "append", shuffle_partitions=8
    )
    out = spark.table(name)
    w = W.partitionBy("key").orderBy(F.col("n_seen").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("key").alias("user_id"),
            "level",
            "trend",
            "forecast1",
            "n_seen",
        )
    )


STAGED_ORACLES["holt_stateful_replay"] = """
    WITH s AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY user_id),
    f AS (
      -- accumulator is a DOUBLE[2] = [level, trend].  NOT a struct:
      -- DuckDB 1.0 list_reduce evaluates struct-literal lambda fields
      -- sequentially with acc fields REBOUND to already-computed new
      -- fields from the 2nd application on (found at staging: the
      -- trend expression saw the new level) — list literals fold
      -- correctly
      SELECT user_id,
             list_reduce(
               list_transform(vs, x -> [CAST(x AS DOUBLE),
                                        CAST(0 AS DOUBLE)]),
               (acc, x) -> [
                 0.25::DOUBLE * x[1] + 0.75::DOUBLE * (acc[1] + acc[2]),
                 0.125::DOUBLE * ((0.25::DOUBLE * x[1]
                     + 0.75::DOUBLE * (acc[1] + acc[2])) - acc[1])
                   + 0.875::DOUBLE * acc[2]
               ]) AS st,
             CAST(len(vs) AS BIGINT) AS n_seen
      FROM s)
    SELECT user_id, st[1] AS level, st[2] AS trend,
           st[1] + st[2] AS forecast1, n_seen
    FROM f
"""
