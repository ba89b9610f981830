"""Crawl front end (pipelines/crawl_corpus): synthetic WARC files →
documents-schema frame → the pretraining pipeline — the full
crawl→training-corpus path in one lazy composition."""

from __future__ import annotations

import gzip

from market_insights_app_spark.pipelines.crawl_corpus import warc_to_documents

_BODY = (
    "<html><body>"
    "<p>The quick brown fox jumps over the lazy dog and the dog is not "
    "amused by it at all, which is a fine sentence for extraction.</p>"
    "<div><a href='/a'>nav</a> <a href='/b'>menu</a> <a href='/c'>links"
    "</a></div>"
    "</body></html>"
)


def _record(rtype, uri, body, ctype):
    head = (
        f"WARC/1.0\r\nWARC-Type: {rtype}\r\nWARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-08-15T00:00:00Z\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def _http(body: bytes, status=200, ctype="text/html; charset=utf-8"):
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _warc(uris, status=200, body=_BODY.encode()):
    out = b""
    for u in uris:
        out += _record(
            "response", u, _http(body, status),
            "application/http; msgtype=response",
        )
    return out


def test_warc_to_documents_schema_and_filters(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(
        _warc(["http://ex.com/1", "http://news.ex.com/2"])
        + _warc(["http://ex.com/404"], status=404)
        + _record("response", "http://ex.com/img",
                  _http(b"png-bytes", ctype="image/png"),
                  "application/http; msgtype=response")
    )
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(_warc(["http://other.org/x"]))
    )
    docs = warc_to_documents(spark, str(tmp_path / "*.warc*"))
    rows = docs.collect()
    # 404 and image rows are gone; 3 HTML 200 pages survive
    assert len(rows) == 3
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    by_src = {r.source for r in rows}
    assert by_src == {"ex.com", "other.org"}
    for r in rows:
        assert "quick brown fox" in r.text
        assert "nav" not in r.text  # link farm block dropped
        assert r.lang == "en"
        assert r.n_chars == len(r.text) >= 50


def test_warc_to_documents_deterministic_ids(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_warc(["http://ex.com/1"]))
    d1 = warc_to_documents(spark, str(tmp_path / "a.warc")).collect()
    d2 = warc_to_documents(spark, str(tmp_path / "a.warc")).collect()
    assert sorted(tuple(r) for r in d1) == sorted(tuple(r) for r in d2)


def test_warc_to_documents_min_chars_and_lang_gate(spark, tmp_path):
    # 30 chars: survives the 25-char extraction segment floor but sits
    # under the pipeline's 50-char document gate
    tiny = b"<html><body><p>a short bit of page text here.</p></body></html>"
    (tmp_path / "a.warc").write_bytes(
        _warc(["http://ex.com/long"])
        + _warc(["http://ex.com/short"], body=tiny)
    )
    path = str(tmp_path / "a.warc")
    assert warc_to_documents(spark, path).count() == 1  # short page gated
    assert warc_to_documents(spark, path, min_chars=10).count() == 2
    assert warc_to_documents(spark, path, langs=("fr",)).count() == 0


def test_crawl_feeds_pretraining_pipeline(spark, tmp_path):
    """The crawl output plugs into build_pretraining_corpus unchanged —
    one lazy WARC→corpus→splits→manifest chain."""
    from market_insights_app_spark.pipelines.pretrain_corpus import (
        build_pretraining_corpus,
    )

    from pyspark.sql import functions as F

    # distinct vocabulary per page: no shared n-grams, so the corpus
    # survives dedup AND eval-decontamination (identical bodies would
    # correctly be decontaminated to zero — n-gram overlap with eval)
    warc = b""
    for i in range(12):
        body = ("<html><body><p>"
                + " ".join(f"w{i}token{j}" for j in range(40))
                + ".</p></body></html>").encode()
        warc += _warc([f"http://site{i % 3}.com/page{i}"], body=body)
    (tmp_path / "a.warc").write_bytes(warc)
    docs = warc_to_documents(spark, str(tmp_path / "a.warc"))
    out = build_pretraining_corpus(
        spark, sf_dir="unused-when-docs-given", docs=docs, eval_mod=5,
        n_shards=2,
    )
    n_eval = docs.filter(F.col("doc_id") % 5 == 0).count()
    corpus = out["corpus"].collect()
    manifest = {r.split: r for r in out["manifest"].collect()}
    assert len(corpus) == 12 - n_eval > 0
    assert set(manifest) <= {"train", "val"}
    assert sum(r.n_rows for r in manifest.values()) == len(corpus)


def test_streaming_crawl_matches_batch_and_sinks_idempotently(spark, tmp_path):
    """Continuous-crawl lane: the WARC directory as a file stream.
    With maxFilesPerTrigger=1 the availableNow drain crosses real
    micro-batch boundaries, and the cumulative stream output must
    equal the batch lane over the same files; re-draining into the
    idempotent foreachBatch sink must not duplicate rows."""
    from market_insights_app_spark.pipelines.crawl_corpus import (
        warc_to_documents,
        warc_to_documents_stream,
    )
    from market_insights_app_spark.streaming.ingest import (
        idempotent_append_batch,
    )

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    for f in range(3):
        uris = [f"http://s{f}.com/p{i}" for i in range(4)]
        body = ("<html><body><p>"
                + " ".join(f"f{f}w{i}tok{j}" for i in range(1) for j in range(30))
                + ".</p></body></html>").encode()
        (crawl / f"{f}.warc").write_bytes(_warc(uris, body=body))
    path = str(crawl / "*.warc")
    batch = sorted(tuple(r) for r in warc_to_documents(spark, path).collect())
    assert len(batch) == 12

    stream = warc_to_documents_stream(spark, path, max_files_per_trigger=1)
    target = str(tmp_path / "docs_table")
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _i: idempotent_append_batch(b, target, ["doc_id"])
        )
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.read.parquet(target).collect())
    assert got == batch

    # second drain from a FRESH checkpoint replays every file; the
    # idempotent sink must keep the table identical
    q2 = (
        warc_to_documents_stream(spark, path, max_files_per_trigger=1)
        .writeStream.foreachBatch(
            lambda b, _i: idempotent_append_batch(b, target, ["doc_id"])
        )
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    again = sorted(tuple(r) for r in spark.read.parquet(target).collect())
    assert again == batch
