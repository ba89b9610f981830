"""Baseline JPEG codec on the stdlib + numpy only — the JPEG twin of
multimodal's stdlib PNG decoder (operators/multimodal.py
:func:`_decode_png_stdlib`): it makes the REAL image lane executable
for JPEG payloads in containers without PIL.

Scope (honest boundaries, like the PNG lane's):

- **decoder**: baseline sequential DCT (SOF0), 8-bit precision,
  1 or 3 components with 1x1 sampling (no chroma subsampling), no
  restart markers, Huffman tables read from the file's own DHT
  segments (canonical assignment per ITU T.81 §C.2) — anything else
  raises NotImplementedError;
- **encoder**: the matching subset — 4:4:4 YCbCr (or grayscale),
  per-image canonical Huffman tables built from the actual symbol
  frequencies (JPEG carries the tables in the stream, so nothing
  depends on hardcoded spec tables), IJG-style quality scaling of the
  public Annex-K quantization matrices.

Everything here derives from the public JPEG specification (ITU T.81 /
ISO 10918-1) and the JFIF conventions.  Self-validation strategy
(tests/test_jpegcodec.py): component-level invariants that cannot
cancel between encoder and decoder (the published zigzag prefix, DCT
orthogonality, canonical-Huffman prefix-freeness), lossy roundtrips
with PSNR floors, a near-lossless roundtrip under unit quantization
tables, and a PIL cross-check that runs wherever pillow exists (skip-
gated here, same pattern as the PNG lane).
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared tables -----------------------------------------------------------

# zigzag scan order, generated algorithmically (diagonal walk per
# T.81 Figure 5) and pinned against the published sequence in tests
def _zigzag_order() -> list[int]:
    order = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1)
        if s % 2 == 1:
            rng = reversed(rng)
        for i in rng:
            j = s - i
            order.append(i * 8 + j)
    return order


ZIGZAG = _zigzag_order()
UNZIGZAG = [0] * 64
for _pos, _idx in enumerate(ZIGZAG):
    UNZIGZAG[_idx] = _pos

# public Annex-K quantization matrices (luminance / chrominance)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: C @ C.T == I (test-pinned)."""
    n = np.arange(8)
    k = n.reshape(8, 1)
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(1 / 2)
    return c * np.sqrt(2 / 8)


DCT_M = _dct_matrix()


def scaled_quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-convention quality scaling of the Annex-K matrices."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for t in (QUANT_LUMA, QUANT_CHROMA):
        s = (t * scale + 50) // 100
        out.append(np.clip(s, 1, 255).astype(np.int32))
    return out[0], out[1]


# --- color -------------------------------------------------------------------

def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# --- canonical Huffman -------------------------------------------------------

def _build_huffman(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Canonical Huffman (BITS counts per length 1..16, symbol list in
    code order) from symbol frequencies — package-merge-free variant:
    plain heap Huffman, then depth-capping at 16 by the standard JPEG
    BITS adjustment (T.81 §K.3's length-limiting loop)."""
    import heapq

    syms = sorted(freqs)
    if not syms:
        return [0] * 16, []
    if len(syms) == 1:
        # code "0" at length 1; "1" (the all-1s codeword) stays unassigned
        return [1] + [0] * 15, syms
    # heap of (weight, tiebreak, node); node = symbol or (l, r).
    # The K.2 dummy symbol 256 reserves the all-1s codeword (T.81: 1-fill
    # padding must never decode as a valid symbol): weight 1 with
    # tiebreak -1 means it is popped FIRST, and the first two nodes
    # merged are siblings at the final tree's maximum depth — so the
    # dummy always carries the longest code, sorts last (256 > any real
    # symbol), takes the all-1s codeword, and is dropped at the end.
    heap = [(freqs[s], i, s) for i, s in enumerate(syms)]
    heap.append((1, -1, 256))
    heapq.heapify(heap)
    uid = len(syms)
    while len(heap) > 1:
        w1, _, n1 = heapq.heappop(heap)
        w2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (w1 + w2, uid, (n1, n2)))
        uid += 1
    depths: dict[int, int] = {}

    def walk(node, d):
        if isinstance(node, tuple):
            walk(node[0], d + 1)
            walk(node[1], d + 1)
        else:
            depths[node] = max(d, 1)

    walk(heap[0][2], 0)
    counts = [0] * 33
    for d in depths.values():
        counts[min(d, 32)] += 1
    # T.81 K.3 AdjustBits: fold lengths > 16 down into the tree
    for i in range(32, 16, -1):
        while counts[i] > 0:
            j = i - 2
            while counts[j] == 0:
                j -= 1
            counts[i] -= 2
            counts[i - 1] += 1
            counts[j + 1] += 2
            counts[j] -= 1
    bits = counts[1:17]
    ordered = sorted(depths, key=lambda s: (min(depths[s], 16), s))
    # reassign exact lengths per the adjusted BITS, shortest first
    out_syms: list[int] = []
    it = iter(ordered)
    for _ln, cnt in enumerate(bits, start=1):
        for _ in range(cnt):
            out_syms.append(next(it))
    # drop the dummy: it is the last code of the longest length — the
    # all-1s codeword — so removing it leaves that code point reserved
    assert out_syms[-1] == 256, "K.2 dummy must carry the all-1s code"
    out_syms.pop()
    for ln in range(15, -1, -1):
        if bits[ln]:
            bits[ln] -= 1
            break
    return bits, out_syms


def _huffman_codes(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 §C.2): symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[syms[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


# --- bit IO with 0xFF stuffing ----------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise EOFError("jpeg scan truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # stuffed zero
                else:
                    raise EOFError("marker inside entropy data")
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _receive_extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` magnitude bits to the signed
    coefficient value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --- encoder -----------------------------------------------------------------

def encode_baseline_jpeg(
    img: np.ndarray,
    quality: int = 90,
    quant_override: tuple[np.ndarray, np.ndarray] | None = None,
    subsampling: str = "444",
) -> bytes:
    """Encode a (h, w, 3) uint8 RGB or (h, w) uint8 grayscale array as
    a baseline JFIF JPEG (per-image canonical Huffman tables).
    ``subsampling``: '444' (no chroma subsampling) or '420' (2x2-mean
    chroma downsample, the dominant wild format — luma sampling factor
    2x2, interleaved 4-Y + Cb + Cr MCUs).  ``quant_override`` swaps in
    explicit (luma, chroma) quantization matrices — unit matrices give
    the near-lossless roundtrip the tests use."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("444", "420"):
        raise NotImplementedError("subsampling must be '444' or '420'")
    sub420 = subsampling == "420" and not gray
    if quant_override is not None:
        ql, qc = (np.asarray(q, dtype=np.int32) for q in quant_override)
    else:
        ql, qc = scaled_quant_tables(quality)
    planes = (
        [img.astype(np.float64)]
        if gray
        else [rgb_to_ycbcr(img)[..., i] for i in range(3)]
    )
    qts = [ql] if gray else [ql, qc, qc]
    tids = [0] if gray else [0, 1, 1]
    samps = [0x11] if gray else ([0x22, 0x11, 0x11] if sub420 else [0x11] * 3)

    # pad via edge replication (to 16 on luma for 4:2:0 so the chroma
    # halves land on whole blocks), downsample chroma, DCT, quantize
    unit = 16 if sub420 else 8
    ph, pw = -(-h // unit) * unit, -(-w // unit) * unit
    coefs = []
    for ci, (plane, qt) in enumerate(zip(planes, qts)):
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        if sub420 and ci > 0:  # 2x2 mean chroma downsample
            p = p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        p = p - 128.0
        hh, ww = p.shape
        blocks = p.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
        f = np.einsum("ij,abjk,lk->abil", DCT_M, blocks, DCT_M)
        coefs.append(np.round(f / qt).astype(np.int32))

    # MCU block order: per MCU, each component contributes its
    # (v x h) sampling-factor blocks in raster order (T.81 A.2.3)
    if sub420:
        mcuy, mcux = ph // 16, pw // 16
        def mcu_blocks(my, mx):
            for by in range(2):
                for bx in range(2):
                    yield 0, 2 * my + by, 2 * mx + bx
            yield 1, my, mx
            yield 2, my, mx
    else:
        mcuy, mcux = ph // 8, pw // 8
        def mcu_blocks(my, mx):
            for ci in range(len(coefs)):
                yield ci, my, mx

    # symbol streams (shared Huffman tables across components)
    dc_syms: list[int] = []
    ac_syms: list[int] = []
    tokens: list[tuple] = []  # ("dc", size, bits) / ("ac", sym, bits, size)
    prev_dc = [0] * len(coefs)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, by, bx in mcu_blocks(my, mx):
                block = coefs[ci][by, bx].ravel()
                zz = block[ZIGZAG]
                diff = int(zz[0]) - prev_dc[ci]
                prev_dc[ci] = int(zz[0])
                size = _category(diff)
                bits = diff if diff >= 0 else diff + (1 << size) - 1
                dc_syms.append(size)
                tokens.append(("dc", size, bits))
                run = 0
                last_nz = 0
                for i in range(63, 0, -1):
                    if zz[i] != 0:
                        last_nz = i
                        break
                for i in range(1, last_nz + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ac_syms.append(0xF0)
                        tokens.append(("ac", 0xF0, 0, 0))
                        run -= 16
                    size = _category(v)
                    sym = (run << 4) | size
                    bits = v if v >= 0 else v + (1 << size) - 1
                    ac_syms.append(sym)
                    tokens.append(("ac", sym, bits, size))
                    run = 0
                if last_nz < 63:
                    ac_syms.append(0x00)
                    tokens.append(("ac", 0x00, 0, 0))

    dc_bits, dc_vals = _build_huffman(
        {s: dc_syms.count(s) for s in set(dc_syms)}
    )
    ac_bits, ac_vals = _build_huffman(
        {s: ac_syms.count(s) for s in set(ac_syms)}
    )
    dc_codes = _huffman_codes(dc_bits, dc_vals)
    ac_codes = _huffman_codes(ac_bits, ac_vals)

    bw = _BitWriter()
    for tok in tokens:
        if tok[0] == "dc":
            _, size, bits = tok
            code, ln = dc_codes[size]
            bw.write(code, ln)
            if size:
                bw.write(bits, size)
        else:
            _, sym, bits, size = tok
            code, ln = ac_codes[sym]
            bw.write(code, ln)
            if size:
                bw.write(bits, size)
    bw.flush()

    # --- container -----------------------------------------------------
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql.ravel()[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(
            0xDB, bytes([0x01]) + bytes(qc.ravel()[ZIGZAG].astype(np.uint8))
        )
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += struct.pack(">BBB", ci + 1, samps[ci], tids[ci])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 (shared)
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -----------------------------------------------------------------

def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG with 1x1 sampling into (h, w, 3)
    uint8 RGB (grayscale replicates luma).  Unsupported features raise
    NotImplementedError — the same honest boundary as the PNG lane."""
    if not payload or payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode maps
    comps: list[dict] = []
    h = w = None
    scan_comps: list[tuple[int, int, int]] = []
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("jpeg segment desync")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                vals = body[at + 1 : at + 65]
                for i, v in enumerate(vals):
                    tbl[ZIGZAG[i]] = v
                qt[tq] = tbl.reshape(8, 8)
                at += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline SOF0 supported (got SOF marker {marker:#x})"
            )
        elif marker == 0xC0:
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            at = 6
            for _ in range(nc):
                cid, samp, tq_id = body[at], body[at + 1], body[at + 2]
                hi, vi = samp >> 4, samp & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        "stdlib jpeg lane supports sampling factors 1-2 "
                        f"(4:4:4 / 4:2:0 / 4:2:2); got {hi}x{vi}"
                    )
                comps.append({"id": cid, "tq": tq_id, "h": hi, "v": vi})
                at += 3
        elif marker == 0xC4:
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 0x0F
                bits = list(body[at + 1 : at + 17])
                nsym = sum(bits)
                vals = list(body[at + 17 : at + 17 + nsym])
                codes = _huffman_codes(bits, vals)
                # code -> symbol lookup per length
                lookup: dict[tuple[int, int], int] = {
                    (ln2, code): sym for sym, (code, ln2) in codes.items()
                }
                huff[(tc, th)] = lookup
                at += 17 + nsym
        elif marker == 0xDD:
            raise NotImplementedError("restart markers not supported")
        elif marker == 0xDA:
            ns = body[0]
            at = 1
            for _ in range(ns):
                cid, tt = body[at], body[at + 1]
                scan_comps.append((cid, tt >> 4, tt & 0x0F))
                at += 2
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if h is None or data_start is None:
        raise NotImplementedError("missing SOF0/SOS")

    # entropy-coded data runs until the EOI marker
    end = payload.rfind(b"\xff\xd9")
    br = _BitReader(payload[data_start : end if end > 0 else len(payload)])

    def read_symbol(lookup) -> int:
        code, ln = 0, 0
        while ln <= 16:
            code = (code << 1) | br.read_bit()
            ln += 1
            sym = lookup.get((ln, code))
            if sym is not None:
                return sym
        raise EOFError("invalid huffman code")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcuy, mcux = -(-h // (8 * vmax)), -(-w // (8 * hmax))
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"])) for c in comps
    ]
    prev_dc = [0] * len(comps)
    order = []
    for cid, tdc, tac in scan_comps:
        ci = next(i for i, c in enumerate(comps) if c["id"] == cid)
        order.append(
            (ci, huff[(0, tdc)], huff[(1, tac)], qt[comps[ci]["tq"]])
        )
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, dct_l, act_l, q in order:
                # each component contributes its (v x h) blocks per MCU,
                # raster order (T.81 A.2.3)
                for sub_y in range(comps[ci]["v"]):
                    for sub_x in range(comps[ci]["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        size = read_symbol(dct_l)
                        diff = _receive_extend(br.read_bits(size), size)
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        i = 1
                        while i < 64:
                            sym = read_symbol(act_l)
                            if sym == 0x00:
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0 and run == 15:
                                i += 16
                                continue
                            i += run
                            if i > 63:
                                raise EOFError("AC run escapes block")
                            zz[i] = _receive_extend(br.read_bits(size), size)
                            i += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz
                        block = block.reshape(8, 8) * q
                        pix = DCT_M.T @ block @ DCT_M + 128.0
                        py = (my * comps[ci]["v"] + sub_y) * 8
                        px = (mx * comps[ci]["h"] + sub_x) * 8
                        planes[ci][py : py + 8, px : px + 8] = pix
    # upsample subsampled components by replication, crop to (h, w)
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    return ycbcr_to_rgb(np.stack(full, axis=-1))
