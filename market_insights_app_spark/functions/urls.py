"""URL canonicalization + domain extraction — the first stage of any
web-corpus (CommonCrawl-style) training-data pipeline, and a unit the
reference has no analog for (its closest is symbol canonicalization,
ingest/alpha_vantage.py:20-24).

All pure JVM column expressions (regexp/array ops — no UDF, no
network): at 100 TB this runs inside the scan stage and the canonical
URL/domain columns become the partition/dedup keys for everything
downstream (per-domain caps, host-level dedup, robots filtering).

Canonicalization contract (spelled so a DuckDB twin can replay it
exactly):

1. strip the fragment (``#…``);
2. lowercase the scheme and the host[:port];
3. drop default ports (``:80`` for http, ``:443`` for https);
4. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``), keep the rest in original order; an emptied query drops
   its ``?``;
5. strip one trailing slash from a non-root path.

``registered_domain`` is the eTLD+1 HEURISTIC: last two host labels,
or last three when the 2-label tail is a compound public suffix from a
small built-in set (co.uk-style).  The full Public Suffix List is a
data file, not an algorithm — at production scale broadcast-join the
real PSL instead; documented deviation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# compound suffixes the heuristic recognizes without the PSL
COMPOUND_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.mx", "co.in", "co.kr", "com.cn", "com.tr",
]

_TRACKING_RE = "^(utm_[^=]*|fbclid|gclid|ref)="


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(col: Column | str) -> Column:
    """Lowercased host WITHOUT port, '' when the input has no
    ``scheme://`` part."""
    c = _c(col)
    hostport = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    return F.lower(F.regexp_replace(hostport, r":\d+$", ""))


def normalize_url(col: Column | str) -> Column:
    """Canonical URL per the module contract — fragment gone, scheme +
    host lowercased, default port dropped, tracking params dropped,
    non-root trailing slash stripped."""
    c = _c(col)
    nofrag = F.regexp_replace(c, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    path = F.regexp_extract(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.regexp_replace(path, r"/$", ""),
    ).otherwise(path)
    query = F.regexp_extract(nofrag, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_TRACKING_RE),
    )
    qstr = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(qstr) > 0, F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )


def registered_domain(col: Column | str) -> Column:
    """eTLD+1 heuristic over a URL column (see module docstring)."""
    host = url_host(col)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tail2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    is_compound = tail2.isin(COMPOUND_SUFFIXES)
    return F.when(
        (n >= 3) & is_compound,
        F.concat_ws(
            ".",
            F.element_at(labels, -3),
            F.element_at(labels, -2),
            F.element_at(labels, -1),
        ),
    ).when(n >= 2, tail2).otherwise(host)
