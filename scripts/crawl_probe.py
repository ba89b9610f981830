"""Crawl front-door throughput probe: synthetic gzipped WARC archives
through warc_to_documents (parse → HTTP peel → boilerplate extraction
→ lang/length gates), plus the r10 link-graph quality-prior lanes
(host_link_graph codegen href scan → host PageRank → broadcast join,
and the full warc_to_documents_with_rank composition).  Records go to
SCALE_NOTES.md by hand.

    python scripts/crawl_probe.py [n_files] [pages_per_file]
"""

from __future__ import annotations

import gzip
import shutil
import sys
import tempfile
import time


def _record(uri: str, body: bytes) -> bytes:
    http = (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
    head = (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}\r\n"
        f"WARC-Date: 2026-08-15T00:00:00Z\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    sys.path.insert(0, ".")
    from market_insights_app_spark.pipelines.crawl_corpus import (
        host_link_graph,
        host_pagerank,
        warc_to_documents,
        warc_to_documents_with_rank,
    )
    from market_insights_app_spark.session import get_spark
    from market_insights_app_spark.sources.warc import read_warc

    root = tempfile.mkdtemp(prefix="crawl_probe_")
    para = ("<p>" + "the quick brown fox jumps over the lazy dog and "
            "keeps going with enough words to look like an article "
            "paragraph of ordinary english text. " * 3 + "</p>")
    # half relative (never edges), half absolute cross-host links so the
    # host graph is real: site f links to sites (f+1..f+10) mod n_files
    nav = "<div>" + "".join(
        f"<a href='/{i}'>link{i}</a>" for i in range(10)
    ) + "{abs_links}</div>"
    total_bytes = 0
    for f in range(n_files):
        abs_links = "".join(
            f"<a href='http://site{(f + d) % n_files}.com/p0'>x{d}</a>"
            for d in range(1, 11)
        )
        fnav = nav.format(abs_links=abs_links)
        buf = bytearray()
        for p in range(pages):
            body = (f"<html><body>{fnav}{para}<p>page f{f}p{p} marker "
                    f"token{p % 97} body text continues here with more "
                    f"filler words for realism.</p>{para}</body></html>"
                    ).encode()
            buf += gzip.compress(_record(f"http://site{f}.com/p{p}", body))
        path = f"{root}/{f:05d}.warc.gz"
        with open(path, "wb") as fh:
            fh.write(buf)
        total_bytes += len(buf)

    spark = get_spark(app_name="mias-crawl-probe")
    n_pages = n_files * pages
    print(f"{n_files} gzipped WARCs, {n_pages:,} pages, "
          f"{total_bytes / 1e6:.1f} MB compressed")
    for run in (1, 2):
        t0 = time.perf_counter()
        out = warc_to_documents(spark, f"{root}/*.warc.gz")
        n = out.count()
        dt = time.perf_counter() - t0
        print(f"run {run}: {n:,} docs in {dt:6.2f} s "
              f"({n_pages / dt:,.0f} pages/s, "
              f"{total_bytes / 1e6 / dt:.1f} MB/s compressed)")
    # link-graph quality-prior lanes
    for run in (1, 2):
        t0 = time.perf_counter()
        recs = read_warc(spark, f"{root}/*.warc.gz",
                         record_types=("response",))
        rank = host_pagerank(host_link_graph(recs))
        n_hosts = rank.count()
        dt = time.perf_counter() - t0
        print(f"link lane {run}: {n_hosts:,} host ranks in {dt:6.2f} s "
              f"(codegen href scan + host PageRank; "
              f"{n_pages / dt:,.0f} pages/s)")
    # r11 A/B: single-parse (default — page table materialized once,
    # both lanes off it) vs the r10 double-parse lane, with per-file
    # parse accounting so the parse multiplicity is measured, not
    # assumed
    # r12 adds the parquet-sink lane (pages_path=) so all three
    # materialization shapes are priced side by side; each lane
    # asserts its parse multiplicity (the single-parse law at probe
    # scale, not just the 2-archive pytest fixture).
    lanes = (
        ("single-parse/checkpoint", dict(single_parse=True), 1),
        ("single-parse/parquet-sink", dict(single_parse=True), 1),
        ("single-parse/ckpt+tiny-pr",
         dict(single_parse=True, tiny_threshold=100_000), 1),
        ("double-parse (r10)", dict(single_parse=False), None),
    )
    for lane, kw, mult in lanes:
        for run in (1, 2):
            kw2 = dict(kw)
            if "parquet" in lane:
                kw2["pages_path"] = f"{root}/pages_{run}"
            acc = spark.sparkContext.accumulator(0)
            t0 = time.perf_counter()
            full = warc_to_documents_with_rank(
                spark, f"{root}/*.warc.gz", parse_counter=acc, **kw2
            )
            n = full.count()
            dt = time.perf_counter() - t0
            print(f"full composition [{lane}] {run}: {n:,} ranked docs "
                  f"in {dt:6.2f} s ({n_pages / dt:,.0f} pages/s, "
                  f"{acc.value} file parses / {n_files} files)")
            if mult is not None:
                assert acc.value == mult * n_files, (
                    f"{lane}: {acc.value} parses != {mult}x{n_files}"
                )
            else:
                assert acc.value > n_files, (
                    f"double-parse lane unexpectedly parsed once: "
                    f"{acc.value}"
                )
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
