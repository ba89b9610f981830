"""Text-analysis column expressions — F3/F9/F11 generalized plus the
training-data-pipeline text operators (language ID, quality scoring,
token counting, fingerprinting, shingling).

All hot-path functions are built-in column expressions (JVM, codegen).
Python appears nowhere here; heavy per-doc work that genuinely needs it
lives in operators/multimodal.py as Pandas UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"
# BPE-ish word/number/punct pieces for token estimation.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Canonical form used by dedup/fingerprinting: lowercase, collapse
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (no empties)."""
    return F.filter(F.split(F.trim(_c(col)), TOKEN_SPLIT_RE), lambda x: x != "")


def norm_tokens(col: Column | str) -> Column:
    """``tokens(normalize_text(col))`` minus the redundant regex pass
    (r14): splitting on ``\\s+`` and dropping empty strings yields
    EXACTLY the tokens of the collapsed-and-trimmed form — both
    expressions use the same ASCII ``\\s`` class — so normalize_text's
    whitespace-collapse ``regexp_replace`` bought every tokenizing
    caller a second full regex scan over the text for nothing.  Use
    this for token/shingle derivation; keep :func:`normalize_text`
    where the normalized STRING itself is the value (fingerprints)."""
    return tokens(F.lower(_c(col)))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token estimate: count regex pieces (letters runs,
    digit runs, single punct)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_RE), 0))


# --- language ID (n-gram / stopword heuristic) ------------------------------
# Tiny per-language marker lists; deterministic scoring: predicted lang =
# argmax of marker-hit share, ties broken by fixed language order, 'und'
# when nothing matches.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to", "a", "in"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "fr": ["le", "la", "les", "des", "est", "une"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "zh": ["的", "是", "了", "在"],
}


def lang_marker_hits(col: Column | str, lang: str) -> Column:
    toks = tokens(F.lower(_c(col)))
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id(col: Column | str) -> Column:
    """Greedy argmax over marker-hit counts, first-listed language wins
    ties; 'und' when zero hits everywhere."""
    hits = {lang: lang_marker_hits(col, lang) for lang in LANG_MARKERS}
    best = F.greatest(*hits.values()) if len(hits) > 1 else list(hits.values())[0]
    expr = F.lit("und")
    # build reversed so earlier languages take precedence on ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


# --- quality scoring --------------------------------------------------------
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"]


def quality_features(col: Column | str) -> dict[str, Column]:
    c = _c(col)
    toks = tokens(c)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return {
        "n_chars": F.length(c),
        "n_tokens": n_tok,
        "mean_token_len": F.when(
            n_tok > 0, F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)) / n_tok
        ).otherwise(F.lit(0)),
        "punct_ratio": F.when(
            F.length(c) > 0,
            F.length(F.regexp_replace(c, r"[^\p{Punct}]", "")) / F.length(c),
        ).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(
            n_tok > 0,
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t)))) / n_tok,
        ).otherwise(F.lit(0.0)),
    }


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] heuristic: reward moderate length, presence of
    stopwords, low punctuation density — the shape of C4/Gopher-style
    rule filters, reduced to portable column math."""
    f = quality_features(col)
    len_score = F.least(F.lit(1.0), f["n_tokens"] / F.lit(50.0))
    stop_score = F.least(F.lit(1.0), f["stopword_ratio"] * F.lit(5.0))
    punct_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * F.lit(4.0))
    return (len_score * F.lit(0.4) + stop_score * F.lit(0.3) + punct_penalty * F.lit(0.3))


# --- fingerprinting ---------------------------------------------------------
def md5_fingerprint(col: Column | str) -> Column:
    """Content fingerprint = md5 of normalized text — the exact-dedup key
    (generalizes entry_plans' UNIQUE(symbol,text), db.py:126-131)."""
    return F.md5(normalize_text(col))


def rolling_fingerprint(col: Column | str, mod: int = (1 << 31) - 1, base: int = 257) -> Column:
    """Polynomial rolling hash over normalized-text codepoints:
    h = fold(h * base + c) mod (2^31-1) — pure column expression, no
    UDF. The modulus keeps every intermediate < 2^39, safe for long
    arithmetic under ANSI overflow checking (and bit-identical to the
    DuckDB list_reduce twin)."""
    norm = normalize_text(col)
    codes = F.transform(F.regexp_extract_all(norm, F.lit("."), 0), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, b: (acc * F.lit(base) + b) % F.lit(mod),
    )


# --- shingling (n-gram sets for Jaccard / MinHash) --------------------------
def word_shingles(col: Column | str, n: int = 2) -> Column:
    """Distinct word n-grams as array<string> ('w1 w2 ... wn').

    Built by zipping n shifted O(1)-count slices of the token array —
    O(tokens) per document. (The naive per-index ``slice(toks, i, n)``
    transform is O(tokens²) per document: ~40% of the whole MinHash
    pipeline's runtime at 5k docs.)"""
    toks = norm_tokens(col)
    if n == 1:
        return F.array_distinct(toks)
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, k)
    for j in range(1, n):
        shifted = F.slice(toks, 1 + j, k)
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(grams)


# --- level extraction (F11, main.js:474-492) --------------------------------
LEVEL_KEYWORDS = ["entry", "stop", "target", "support", "resistance", "risk"]
NUMBER_RE = r"[0-9]+(\.[0-9]+)?"


def extract_levels(col: Column | str):
    """Split text into lines on [\\n.;], pull every numeric token, label
    the line by first matching keyword. Returns array<struct<label,
    level:double>> — explode downstream for the UDTF shape (one row per
    level)."""
    # Deviation from the reference: its /\n|\.|;/ split breaks decimal
    # numbers apart ("1.0850" → "1" + "0850"); here a period only
    # splits when not followed by a digit.
    lines = F.split(_c(col), r"\n|;|\.(?!\d)")
    label = lambda line: F.coalesce(  # noqa: E731
        *[
            F.when(F.lower(line).contains(kw), F.lit(kw))
            for kw in LEVEL_KEYWORDS
        ],
        F.lit("level"),
    )
    per_line = F.transform(
        lines,
        lambda line: F.transform(
            F.regexp_extract_all(line, F.lit(NUMBER_RE), 0),
            lambda num: F.struct(
                label(line).alias("label"), num.cast("double").alias("level")
            ),
        ),
    )
    return F.flatten(per_line)
