"""Connector parsing (S1-S3) incl. error paths, and the scalar library
(F1-F19) — mirrors the reference's mocked-network test strategy
(tests/test_alpha_vantage.py, tests/test_ingest.py) without any HTTP.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


# --- S1: equity quote --------------------------------------------------------


def test_alpha_vantage_dotted_keys(spark):
    from market_insights_app_spark.sources.http_quotes import parse_alpha_vantage_quote

    payload = (
        '{"Global Quote": {"01. symbol": "aapl", "05. price": "123.45", '
        '"07. latest trading day": "2024-01-02"}}'
    )
    r = one(parse_alpha_vantage_quote(spark.createDataFrame([(payload,)], ["payload"])))
    assert r["symbol"] == "AAPL" and r["price"] == 123.45
    assert r["error"] is None
    assert str(r["as_of"]).startswith("2024-01-02")  # date-only → midnight (F2)


def test_alpha_vantage_underscore_fallback(spark):
    """Key-variant fallback (alpha_vantage.py:33-36)."""
    from market_insights_app_spark.sources.http_quotes import parse_alpha_vantage_quote

    payload = '{"Global Quote": {"01_symbol": "MSFT", "05_price": "9.5"}}'
    r = one(parse_alpha_vantage_quote(spark.createDataFrame([(payload,)], ["payload"])))
    assert r["symbol"] == "MSFT" and r["price"] == 9.5


def test_alpha_vantage_throttle_note(spark):
    """Throttle Note surfaces as error (alpha_vantage.py:30-32)."""
    from market_insights_app_spark.sources.http_quotes import parse_alpha_vantage_quote

    payload = '{"Note": "Thank you for using Alpha Vantage! 5 calls/min"}'
    r = one(parse_alpha_vantage_quote(spark.createDataFrame([(payload,)], ["payload"])))
    assert r["price"] is None and "Alpha Vantage" in r["error"]


def test_alpha_vantage_empty_quote(spark):
    from market_insights_app_spark.sources.http_quotes import parse_alpha_vantage_quote

    r = one(parse_alpha_vantage_quote(spark.createDataFrame([('{"Global Quote": {}}',)], ["payload"])))
    assert r["error"] == "empty or malformed quote"


# --- S2: FX ------------------------------------------------------------------


def test_fx_invalid_rate(spark):
    """Non-numeric rate → error, null price (alpha_vantage_fx.py:40-47)."""
    from market_insights_app_spark.sources.http_quotes import parse_alpha_vantage_fx

    payload = (
        '{"Realtime Currency Exchange Rate": {"1. From_Currency Code": "EUR", '
        '"3. To_Currency Code": "USD", "5. Exchange Rate": "not-a-number"}}'
    )
    r = one(parse_alpha_vantage_fx(spark.createDataFrame([(payload,)], ["payload"])))
    assert r["price"] is None and r["error"] == "invalid or missing exchange rate"


# --- S3: Yahoo ---------------------------------------------------------------


def test_yahoo_all_null_closes(spark):
    """All-null close array → error (yahoo.py:33-40 null handling)."""
    from market_insights_app_spark.sources.http_quotes import parse_yahoo_chart

    payload = (
        '{"chart": {"result": [{"meta": {"symbol": "X", "currency": "USD"}, '
        '"timestamp": [1, 2], "indicators": {"quote": [{"close": [null, null]}]}}]}}'
    )
    r = one(parse_yahoo_chart(spark.createDataFrame([(payload,)], ["payload"])))
    assert r["price"] is None and r["error"] == "no non-null close"


# --- scalar library ----------------------------------------------------------


def test_parse_pair(spark):
    from market_insights_app_spark.functions.scalars import parse_pair

    df = spark.createDataFrame([("eur/usd",), ("XAUUSD",), ("bad",)], ["p"])
    rows = df.select(parse_pair("p").alias("pp")).collect()
    assert (rows[0]["pp"]["base"], rows[0]["pp"]["quote"]) == ("EUR", "USD")
    assert rows[1]["pp"]["base"] == "XAU"
    assert rows[2]["pp"] is None  # len != 6 → null (reference raises 400)


def test_normalize_timestamp_variants(spark):
    """F2 (alpha_vantage_fx.py:50-61): space-form, T-form, Z-suffix,
    date-only; garbage falls back to now() (non-null)."""
    from market_insights_app_spark.functions.scalars import format_iso_z, normalize_timestamp

    df = spark.createDataFrame(
        [("2024-03-01 10:15:30",), ("2024-03-01T10:15:30Z",), ("2024-03-01",), ("garbage",)],
        ["s"],
    )
    out = df.select(format_iso_z(normalize_timestamp("s")).alias("z")).collect()
    assert out[0]["z"] == "2024-03-01T10:15:30Z"
    assert out[1]["z"] == "2024-03-01T10:15:30Z"
    assert out[2]["z"] == "2024-03-01T00:00:00Z"
    assert out[3]["z"] is not None  # now() fallback


def test_score_impact_reference_keywords(spark):
    """F3 with the reference's own vocab (main.py:645-653)."""
    from market_insights_app_spark.functions.scalars import score_impact

    df = spark.createDataFrame(
        [("US CPI inflation surges",), ("Retail PMI revised",), ("quiet day",)], ["t"]
    )
    got = [r[0] for r in df.select(score_impact("t")).collect()]
    assert got == ["High", "Medium", "Low"]


def test_fmt_price_decimals(spark):
    """F6 (main.js:41-47): JPY→3dp, XA*→2dp, 6-char FX→5dp, else 4dp."""
    from market_insights_app_spark.functions.scalars import fmt_price

    df = spark.createDataFrame(
        [("USDJPY", 151.23456), ("XAUUSD", 2315.5), ("EURUSD", 1.08251), ("AAPL", 189.5)],
        ["s", "p"],
    )
    got = [r[0] for r in df.select(fmt_price("p", "s")).collect()]
    assert got == ["151.235", "2,315.50", "1.08251", "189.5000"]


def test_split_tags_and_signature(spark):
    from market_insights_app_spark.functions.scalars import composite_signature, split_tags

    df = spark.createDataFrame(
        [(" a , b ,, c ", "AAPL", "Long", 1.0, 2.0)], ["tags", "sym", "d", "e", "x"]
    ).withColumn("dt", F.to_timestamp(F.lit("2025-01-02 03:04:05")))
    r = df.select(
        split_tags("tags").alias("tags"),
        composite_signature("sym", "dt", "d", "e", "x").alias("sig"),
    ).collect()[0]
    assert r["tags"] == ["a", "b", "c"]
    assert r["sig"] == "AAPL|2025-01-02T03:04|Long|1.0|2.0"


def test_extract_levels(spark):
    """F11 (main.js:474-492): numbers per line, labeled by keyword."""
    from market_insights_app_spark.functions.text import extract_levels

    text = "Entry at 1.0850; stop 1.0800. target zone 1.0950 and 1.1000"
    df = spark.createDataFrame([(text,)], ["text"])
    rows = df.select(F.explode(extract_levels("text")).alias("l")).select("l.*").collect()
    got = [(r["label"], r["level"]) for r in rows]
    assert ("entry", 1.085) in got and ("stop", 1.08) in got
    assert ("target", 1.095) in got and ("target", 1.1) in got


def test_is_fx_symbol(spark):
    from market_insights_app_spark.operators.filters import is_fx_symbol

    df = spark.createDataFrame([("EURUSD",), ("XAGUSD",), ("AAPL",)], ["s"])
    got = [r[0] for r in df.select(is_fx_symbol("s")).collect()]
    assert got == [True, True, False]


def test_lang_id_markers(spark):
    from market_insights_app_spark.functions.text import lang_id

    df = spark.createDataFrame(
        [("the cat and the dog",), ("el perro de la casa",), ("qqq zzz",)], ["text"]
    )
    got = [r[0] for r in df.select(lang_id("text")).collect()]
    assert got == ["en", "es", "und"]


def test_data_url_to_binary(spark):
    from market_insights_app_spark.operators.multimodal import data_url_to_binary

    df = spark.createDataFrame([("data:image/png;base64,aGVsbG8=",)], ["u"])
    r = df.select(data_url_to_binary("u").alias("m")).select("m.*").collect()[0]
    assert r["mime"] == "image/png" and bytes(r["payload"]) == b"hello"


def test_canon_email_and_symbol(spark):
    """F4/F5 (main.py:436-438, main.js:634-635)."""
    from market_insights_app_spark.functions.scalars import canon_email, canon_symbol

    df = spark.createDataFrame(
        [("  User@Example.COM  ", " eur/usd "), ("not-an-email", "aapl!")], ["e", "s"]
    )
    rows = df.select(canon_email("e").alias("e"), canon_symbol("s").alias("s")).collect()
    assert rows[0]["e"] == "user@example.com" and rows[0]["s"] == "EURUSD"
    assert rows[1]["e"] is None and rows[1]["s"] == "AAPL"  # invalid email → null


def test_calendar_country_filter(spark):
    """P4 (main.py:668-669): case-insensitive country equality."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("US", "NFP"), ("us", "CPI"), ("DE", "IFO")], ["country", "event"]
    )
    out = df.filter(F.lower(F.col("country")) == "us")
    assert out.count() == 2


def test_session_auth_lookup(spark):
    """J4 (main.py:237-251, db.py:528-534): broadcast token lookup +
    expiry predicate — expired and unknown tokens both reject."""
    import datetime as dt

    from pyspark.sql import functions as F

    now = dt.datetime.now()
    sessions = spark.createDataFrame(
        [
            ("tok-live", "a@x.com", now + dt.timedelta(days=1)),
            ("tok-dead", "b@x.com", now - dt.timedelta(minutes=1)),
        ],
        "token string, email string, expires_at timestamp",
    )
    requests = spark.createDataFrame(
        [("tok-live",), ("tok-dead",), ("tok-unknown",)], ["token"]
    )
    auth = requests.join(F.broadcast(sessions), "token", "left").withColumn(
        "authed",
        F.col("email").isNotNull() & (F.current_timestamp() < F.col("expires_at")),
    )
    got = {r["token"]: r["authed"] for r in auth.collect()}
    assert got == {"tok-live": True, "tok-dead": False, "tok-unknown": False}


def test_head_caps(spark):
    """T8 (main.js:193,203; main.py:703): top-5 head caps via limit and
    array slice."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(list(range(9)),)], "xs array<int>")
    assert df.select(F.slice("xs", 1, 5).alias("h")).collect()[0]["h"] == [0, 1, 2, 3, 4]
    long_df = spark.range(20)
    assert long_df.orderBy("id").limit(5).count() == 5


def test_real_audio_decode_wav_roundtrip(spark):
    """The REAL (non-fake) audio lane: generate PCM16 WAV bytes with the
    stdlib, run audio_features(fake=False) through the actual Spark
    plan, and check RMS/ZCR against a direct numpy computation."""
    import io
    import math
    import struct
    import wave

    import numpy as np

    from market_insights_app_spark.operators.multimodal import audio_features

    sr, n = 8000, 800
    samples = [math.sin(2 * math.pi * 440 * i / sr) for i in range(n)]
    pcm = struct.pack(f"<{n}h", *(int(s * 32767) for s in samples))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm)
    payload = buf.getvalue()

    media = spark.createDataFrame(
        [(1, "audio", payload)], ["media_id", "kind", "payload"]
    )
    row = audio_features(media, fake=False).collect()[0]
    ref = np.array([int(s * 32767) for s in samples], dtype=np.float64) / 32768.0
    assert row["n_samples"] == n
    assert abs(row["rms"] - float(np.sqrt((ref**2).mean()))) < 1e-9
    zc = float((np.diff(np.sign(ref)) != 0).sum()) / (n - 1)
    assert abs(row["zcr"] - zc) < 0.01


def test_real_audio_decode_rejects_non_wav(spark):
    from market_insights_app_spark.operators.multimodal import real_decode_audio

    try:
        real_decode_audio(b"\x00\x01\x02 definitely not a wav")
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass


def _png_bytes(arr, ctype=2, filters=None):
    """Pure-stdlib PNG encoder (zlib + struct) for test fixtures:
    8-bit, non-interlaced; ``filters[y]`` selects the scanline filter
    (0-4) so the decoder's every unfilter branch can be exercised."""
    import struct
    import zlib

    import numpy as np

    h, w = arr.shape[:2]
    nch = arr.shape[2] if arr.ndim == 3 else 1
    flat = arr.reshape(h, w * nch).astype(np.int32)
    raw = b""
    prev = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        f = filters[y] if filters else 0
        line = flat[y]
        left = np.concatenate([np.zeros(nch, np.int32), line[:-nch]])
        upleft = np.concatenate([np.zeros(nch, np.int32), prev[:-nch]])
        if f == 0:
            enc = line
        elif f == 1:
            enc = line - left
        elif f == 2:
            enc = line - prev
        elif f == 3:
            enc = line - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left),
                np.abs(p - prev),
                np.abs(p - upleft),
            )
            pr = np.where(
                (pa <= pb) & (pa <= pc),
                left,
                np.where(pb <= pc, prev, upleft),
            )
            enc = line - pr
        raw += bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes()
        prev = line

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_image_decode_png_all_filters():
    """The REAL image lane must execute here (stdlib PNG decoder when
    PIL is absent, PIL when present — both decode losslessly): a 6x5
    RGB image encoded with every scanline filter type round-trips
    pixel-exact."""
    import numpy as np

    from market_insights_app_spark.operators.multimodal import real_decode_image

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    payload = _png_bytes(img, ctype=2, filters=[0, 1, 2, 3, 4])
    got = real_decode_image(payload)
    assert got.shape == (5, 6, 3)
    assert (got == img).all()
    # metadata-driven resize engages (interpolation is lane-specific,
    # so assert the contract — shape — not pixel values)
    assert real_decode_image(payload, width=3, height=2).shape == (2, 3, 3)


def test_real_image_decode_grayscale_and_rgba():
    import numpy as np

    from market_insights_app_spark.operators.multimodal import real_decode_image

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(4, 4), dtype=np.uint8)
    got = real_decode_image(_png_bytes(gray, ctype=0, filters=[0, 2, 1, 4]))
    assert (got == np.repeat(gray[:, :, None], 3, axis=2)).all()
    rgba = rng.integers(0, 256, size=(3, 4, 4), dtype=np.uint8)
    got = real_decode_image(_png_bytes(rgba, ctype=6, filters=[0, 3, 4]))
    assert (got == rgba[:, :, :3]).all()


def test_real_image_decode_end_to_end(spark):
    """decode_media(fake=False) through Spark with a REAL PNG payload:
    the real lane runs inside the Arrow-batched kernel, not just as a
    local function call."""
    import numpy as np

    from market_insights_app_spark.operators.multimodal import decode_media

    img = np.zeros((3, 4, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # solid red
    media = spark.createDataFrame(
        [(1, "image", _png_bytes(img), None, None)],
        "media_id long, kind string, payload binary, width int, height int",
    )
    row = decode_media(media, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (4, 3)
    assert abs(row["feat_mean"] - 255.0 / 3) < 1e-6


def test_real_image_decode_pil_crosscheck():
    """PIL-vs-stdlib agreement on the same PNG bytes — SKIPPED (never
    silently passed) where pillow is not installed."""
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    from market_insights_app_spark.operators.multimodal import (
        _decode_png_stdlib,
        real_decode_image,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    payload = _png_bytes(img, ctype=2, filters=[0, 1, 3, 4])
    via_pil = np.asarray(
        PIL_Image.open(io.BytesIO(payload)).convert("RGB"), dtype=np.uint8
    )
    assert (via_pil == _decode_png_stdlib(payload)).all()
    assert (real_decode_image(payload) == img).all()


def test_real_image_decode_rejects_non_png_without_pil():
    import pytest

    from market_insights_app_spark.operators.multimodal import real_decode_image

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: non-PNG payloads decode via PIL")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        real_decode_image(b"\x89PNG fake")


def test_url_functions_edge_cases(spark):
    from market_insights_app_spark.functions.urls import (
        normalize_url,
        registered_domain,
        url_host,
    )

    cases = [
        # (raw, expected_norm, expected_domain)
        ("HTTPS://WWW.Ex.COM:443/a/?utm_source=x#f", "https://www.ex.com/a", "ex.com"),
        ("http://Host.co.uk:80/p?ref=1&q=2", "http://host.co.uk/p?q=2", "host.co.uk"),
        ("http://a.b.news.Example.co.uk/x/", "http://a.b.news.example.co.uk/x", "example.co.uk"),
        ("https://single/", "https://single/", "single"),  # root slash kept
        ("http://h:8080/?fbclid=z", "http://h:8080/", "h"),  # root slash kept
        ("not a url", "://", "not a url"),
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)], ["i", "u"])
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            normalize_url("u").alias("n"),
            registered_domain("u").alias("d"),
            url_host("u").alias("h"),
        ).collect()
    }
    for i, (raw, want_n, want_d) in enumerate(cases):
        if raw == "not a url":
            # no scheme → empty host; domain falls back to the host ('')
            assert rows[i]["h"] == ""
            continue
        assert rows[i]["n"] == want_n, (raw, rows[i]["n"])
        assert rows[i]["d"] == want_d, (raw, rows[i]["d"])


def test_real_image_decode_jpeg_stdlib_lane(spark):
    """The REAL image lane now also executes for baseline-JPEG payloads
    without PIL: encode with the in-house codec, decode through the
    full Spark decode_media plan."""
    import numpy as np

    from market_insights_app_spark.functions.jpegcodec import encode_baseline_jpeg
    from market_insights_app_spark.operators.multimodal import (
        decode_media,
        real_decode_image,
    )

    img = np.zeros((8, 16, 3), dtype=np.uint8)
    img[:, :, 1] = 200  # solid green
    payload = encode_baseline_jpeg(img, quality=95)
    # direct kernel: decode agrees with the source within codec rounding
    out = real_decode_image(payload)
    assert out.shape == (8, 16, 3)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 4
    # full Spark plan
    media = spark.createDataFrame(
        [(1, "image", payload, None, None)],
        "media_id long, kind string, payload binary, width int, height int",
    )
    row = decode_media(media, fake=False).collect()[0]
    assert (row["width"], row["height"]) == (16, 8)
    assert abs(row["feat_mean"] - 200.0 / 3) < 2.0
