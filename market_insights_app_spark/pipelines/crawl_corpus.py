"""Crawl front end: WARC container → documents-shaped corpus.

Closes the loop between the crawl front door (sources/warc) and the
pretraining pipeline (pipelines/pretrain_corpus): a Common Crawl-style
WARC directory becomes a frame with EXACTLY the testdata ``documents``
schema (doc_id, text, lang, source, n_chars), so everything downstream
— quality gates, dedup, decontamination, splits, manifests — runs
unchanged on crawl output.

Stages (one lazy chain, all linear):

1. ``read_warc``            one row per WARC record, HTTP peeled
                            (binaryFile: one ~1 GB WARC = one task)
2. HTTP 200 + text/html     scan-stage filters
3. ``extract_main_text``    Arrow link-density boilerplate removal
4. lang-ID + length gates   scan-stage expressions
5. documents projection     deterministic doc_id =
                            xxhash64(file, uri, date) — stable across
                            reruns and partitionings; duplicate
                            fetches of one page collide on purpose and
                            fall to the exact-dedup stage downstream.
                            Honest birthday math: cross-page collisions
                            run ≈ n²/2⁶⁵ (10⁹ pages → ~2.7 %, each
                            silently merging two distinct pages at
                            dedup); a full-crawl-scale run should widen
                            to a 2-column 128-bit id (second xxhash64
                            with a different seed) before dedup — the
                            documents schema pins one long here because
                            that is the testdata contract

At 100 TB this parallelizes per WARC file with no shuffle anywhere —
the first exchange of the whole crawl→corpus path is the downstream
dedup's fingerprint groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from market_insights_app_spark.functions.html import extract_main_text
from market_insights_app_spark.functions.text import lang_id
from market_insights_app_spark.functions.urls import registered_domain
from market_insights_app_spark.sources.warc import read_warc, read_warc_stream


def _documents_from_records(
    recs: DataFrame,
    min_chars: int,
    langs: tuple[str, ...] | None,
    max_link_density: float,
) -> DataFrame:
    """records → documents-schema transform shared by the batch and
    streaming lanes (every stage is stateless, so it composes onto a
    streaming frame unchanged)."""
    pages = recs.filter(
        (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
    ).select(
        F.xxhash64("warc_file", "target_uri", "warc_date").alias("doc_id"),
        F.col("payload").cast("string").alias("html"),
        F.col("target_uri").alias("uri"),
    )
    # the uri rides THROUGH the Arrow extraction batch (keep_cols) —
    # a self-join back onto the WARC parse would read and parse every
    # archive twice
    extracted = extract_main_text(
        pages, id_col="doc_id", html_col="html",
        max_link_density=max_link_density, keep_cols=("uri",),
    )
    docs = extracted.select(
        "doc_id",
        "text",
        lang_id("text").alias("lang"),
        registered_domain("uri").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    ).filter(F.col("n_chars") >= min_chars)
    if langs is not None:
        docs = docs.filter(F.col("lang").isin(list(langs)))
    return docs


def warc_to_documents(
    spark: SparkSession,
    path: str,
    min_chars: int = 50,
    langs: tuple[str, ...] | None = None,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Read WARC files under ``path`` into a documents-schema frame.

    ``min_chars`` drops pages whose extracted main text is shorter
    (boilerplate-only pages extract to near-empty); ``langs`` keeps
    only the listed language codes (None keeps everything, including
    'und').  Output columns match the testdata ``documents`` table:
    (doc_id long, text string, lang string, source string,
    n_chars long)."""
    recs = read_warc(spark, path, record_types=("response",))
    return _documents_from_records(recs, min_chars, langs, max_link_density)


def warc_to_documents_stream(
    spark: SparkSession,
    path: str,
    min_chars: int = 50,
    langs: tuple[str, ...] | None = None,
    max_link_density: float = 0.33,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Continuous-crawl twin of :func:`warc_to_documents`: the WARC
    directory as a file-stream source, each micro-batch turning
    newly-arrived archives into documents rows through the SAME
    stateless transform — so the stream's cumulative output equals the
    batch lane over the same files (pinned by
    tests/test_crawl_pipeline.py).  Sink it with foreachBatch into the
    ACID table (streaming/ingest.idempotent_append_batch keyed on
    doc_id) for an always-current corpus."""
    recs = read_warc_stream(
        spark, path, record_types=("response",),
        max_files_per_trigger=max_files_per_trigger,
    )
    return _documents_from_records(recs, min_chars, langs, max_link_density)
