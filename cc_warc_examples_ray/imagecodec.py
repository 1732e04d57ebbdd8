"""Pure-python/numpy image codecs, perceptual hash and PSNR.

The reference decodes images with ``javax.imageio.ImageIO`` plus a
greyscale-JPEG fallback reader
(`/root/reference/src/org/commoncrawl/mklab/analysis/ImageUtils.java:89-132`)
and probes dimensions from headers without a full decode
(`ArffController.java:117-156`).  No image libraries (Pillow etc.) exist in
this environment, so this module provides deterministic stdlib/numpy codecs
with the same roles:

- ``png``  — real PNG (zlib, filter type 0), lossless: exact-byte round trip.
- ``bmp``  — 24-bit bottom-up BMP, lossless.
- ``jpg``  — a deterministic 8x8-DCT quantizing lossy codec (JPEG-shaped:
  RGB→YCbCr, blockwise DCT-II, uniform quantization, zlib entropy stage)
  used to exercise the lossy PSNR>=40dB validation path of the north rule.

All functions operate on ``uint8`` RGB arrays of shape (h, w, 3).
pHash follows the classic public algorithm: 32x32 grayscale → 2D DCT →
top-left 8x8 coefficients → median threshold → 64-bit code.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG (truecolor 8-bit, filter 0 on encode; decoder handles filters 0-4)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray, level: int = 6) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None) per scanline
    raw[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_probe(data: bytes) -> tuple[int, int]:
    """Header-only (w, h) probe — the ~1ms path of `ArffController.java:116`."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def _paeth(a, b, c):
    p = a.astype(np.int16) + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, hh, bit, color, comp, filt, inter = struct.unpack(">IIBBBBB", body)
            h = hh
            if bit != 8 or color != 2 or inter != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * 3
    raw = raw.reshape(h, stride)
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        ft = raw[y, 0]
        line = raw[y, 1:].astype(np.uint8)
        prev = out[y - 1] if y > 0 else np.zeros(w * 3, dtype=np.uint8)
        if ft == 0:
            out[y] = line
        elif ft == 2:  # Up
            out[y] = line + prev
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need a serial scan
            cur = np.zeros(w * 3, dtype=np.uint8)
            for x in range(w * 3):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    cur[x] = line[x] + a
                elif ft == 3:
                    cur[x] = line[x] + ((int(a) + int(b)) >> 1)
                else:
                    cur[x] = line[x] + _paeth(
                        np.uint8(a), np.uint8(b), np.uint8(c)
                    )
            out[y] = cur
        else:
            raise ValueError(f"bad filter {ft}")
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB, bottom-up)
# ---------------------------------------------------------------------------

def bmp_encode(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return header + dib + rows.tobytes()


def bmp_probe(data: bytes) -> tuple[int, int]:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    w, h = struct.unpack("<ii", data[18:26])
    return w, abs(h)


def bmp_decode(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    w, h = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    if bpp != 24:
        raise ValueError("unsupported BMP bpp")
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * abs(h), offset=off)
    rows = rows.reshape(abs(h), row_size)[:, : w * 3].reshape(abs(h), w, 3)
    img = rows[::-1] if h > 0 else rows
    return img[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------------------
# "fjpg" — deterministic lossy DCT codec (stored with fmt == 'jpg')
# ---------------------------------------------------------------------------

_FJPG_MAGIC = b"FJPG"
_QY = 3.0  # uniform quant steps chosen so PSNR stays >= 40 dB
_QC = 5.0


def _dct_mat(n: int) -> np.ndarray:
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_mat(8)
_D32 = _dct_mat(32)


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
    out = ycc @ m.T
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _blockify(ch: np.ndarray) -> np.ndarray:
    h, w = ch.shape
    return ch.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _unblockify(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return blocks.transpose(0, 2, 1, 3).reshape(h, w)


def fjpg_encode(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    padded = np.pad(img, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded) - 128.0
    planes = []
    for ci in range(3):
        blocks = _blockify(ycc[:, :, ci])  # [bh, bw, 8, 8]
        coef = _D8 @ blocks @ _D8.T
        q = _QY if ci == 0 else _QC
        qc = np.rint(coef / q).astype(np.int16)
        planes.append(qc.tobytes())
    payload = zlib.compress(b"".join(planes), 6)
    return _FJPG_MAGIC + struct.pack("<II", w, h) + payload


def fjpg_probe(data: bytes) -> tuple[int, int]:
    if data[:4] != _FJPG_MAGIC:
        raise ValueError("not an FJPG")
    w, h = struct.unpack("<II", data[4:12])
    return w, h


def fjpg_decode(data: bytes) -> np.ndarray:
    if data[:4] != _FJPG_MAGIC:
        raise ValueError("not an FJPG")
    w, h = struct.unpack("<II", data[4:12])
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    raw = np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16)
    per = (ph // 8) * (pw // 8) * 64
    ycc = np.empty((ph, pw, 3), dtype=np.float64)
    for ci in range(3):
        qc = raw[ci * per : (ci + 1) * per].reshape(ph // 8, pw // 8, 8, 8)
        q = _QY if ci == 0 else _QC
        coef = qc.astype(np.float64) * q
        blocks = _D8.T @ coef @ _D8
        ycc[:, :, ci] = _unblockify(blocks, ph, pw)
    return _ycbcr_to_rgb(ycc + 128.0)[:h, :w]


# ---------------------------------------------------------------------------
# Dispatch by fmt string (the `fmt` column of the images table)
# ---------------------------------------------------------------------------

_ENCODERS = {"png": png_encode, "bmp": bmp_encode, "jpg": fjpg_encode}
# gif_encode is registered below, after its definition
# ---------------------------------------------------------------------------
# GIF87a/89a (public GIF spec + LZW): real web-image format — the
# reference decoded GIFs via ImageIO (ProcessingService image path)
# ---------------------------------------------------------------------------

def gif_probe(data: bytes) -> tuple[int, int]:
    if data[:4] != b"GIF8":
        raise ValueError("not a GIF stream")
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    return w, h


def _gif_lzw_decode(min_code: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW expansion (LSB-first variable-width codes, CLEAR
    resets the table, widths grow at table fill) → palette indices."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    bits = np.unpackbits(np.frombuffer(data, np.uint8), bitorder="little")
    pos, width = 0, min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    out = bytearray()
    while pos + width <= len(bits) and len(out) < n_pixels:
        code = int(np.dot(bits[pos : pos + width],
                          1 << np.arange(width, dtype=np.int64)))
        pos += width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # the cScSc case
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def gif_decode(data: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a stream → RGB uint8 (global/local
    palette, interlace supported; animation frames beyond the first are
    ignored — the crawl treats a GIF as one image, like the reference's
    ImageIO.read)."""
    w, h = gif_probe(data)
    pos = 10
    flags = data[pos]
    pos += 3  # flags, bg, aspect
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:
            left = int.from_bytes(data[pos + 1 : pos + 3], "little")
            top = int.from_bytes(data[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(data[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(data[pos + 7 : pos + 9], "little")
            iflags = data[pos + 9]
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                pal = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image without a color table")
            min_code = data[pos]
            pos += 1
            chunks = []
            while data[pos]:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _gif_lzw_decode(min_code, b"".join(chunks), iw * ih)
            if len(idx) < iw * ih:
                idx = np.pad(idx, (0, iw * ih - len(idx)))
            rows = idx.reshape(ih, iw)
            if iflags & 0x40:  # de-interlace (4 passes per the spec)
                order = np.concatenate([np.arange(0, ih, 8), np.arange(4, ih, 8),
                                        np.arange(2, ih, 4), np.arange(1, ih, 2)])
                de = np.empty_like(rows)
                de[order] = rows
                rows = de
            img = np.zeros((h, w, 3), np.uint8)
            img[top : top + ih, left : left + iw] = pal[
                np.minimum(rows, len(pal) - 1)]
            return img
        else:  # 0x3B trailer or junk
            break
    raise ValueError("GIF stream has no image block")


def gif_encode(img: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal GIF89a writer (test/synth source): palette from unique
    colors (>256 → 3-3-2 quantization), uncompressed-style LZW (literal
    codes with CLEAR resets before any width change — valid output per
    the spec, decodable by any conforming reader)."""
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        q = (flat[:, 0] & 0xE0) | ((flat[:, 1] & 0xE0) >> 3) | (flat[:, 2] >> 6)
        colors = np.stack([(np.arange(256) & 0xE0),
                           ((np.arange(256) << 3) & 0xE0),
                           ((np.arange(256) << 6) & 0xC0)], axis=1).astype(np.uint8)
        inverse = q.astype(np.int64)
    pal_bits = max(1, int(len(colors) - 1).bit_length())
    n_pal = 1 << pal_bits
    pal = np.zeros((n_pal, 3), np.uint8)
    pal[: len(colors)] = colors
    idx = inverse.astype(np.uint16).reshape(h, w)
    if interlace:
        order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                np.arange(2, h, 4), np.arange(1, h, 2)])
        idx = idx[order]
    min_code = max(2, pal_bits)
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    # literal-codes LZW: CLEAR before the table would force a width bump
    codes, count = [clear], 0
    room = (1 << width) - clear - 2
    for v in idx.ravel():
        if count == room:
            codes.append(clear)
            count = 0
        codes.append(int(v))
        count += 1
    codes.append(end)
    total_bits = len(codes) * width
    bits = np.zeros(total_bits, np.uint8)
    at = 0
    for c in codes:
        for b in range(width):
            bits[at + b] = (c >> b) & 1
        at += width
    payload = np.packbits(bits, bitorder="little").tobytes()
    out = [b"GIF89a", w.to_bytes(2, "little"), h.to_bytes(2, "little"),
           bytes([0x80 | (pal_bits - 1), 0, 0]), pal.tobytes(),
           b"\x2c", (0).to_bytes(2, "little"), (0).to_bytes(2, "little"),
           w.to_bytes(2, "little"), h.to_bytes(2, "little"),
           bytes([0x40 if interlace else 0]), bytes([min_code])]
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(bytes([len(chunk)]) + chunk)
    out.append(b"\x00\x3b")
    return b"".join(out)


from . import jfif as _jfif  # real baseline JFIF (spec 10918-1) codec

_ENCODERS["gif"] = gif_encode
_ENCODERS["jfif"] = _jfif.jfif_encode
_DECODERS = {"png": png_decode, "bmp": bmp_decode, "jpg": fjpg_decode,
             "gif": gif_decode, "jfif": _jfif.jfif_decode}
_PROBES = {"png": png_probe, "bmp": bmp_probe, "jpg": fjpg_probe,
           "gif": gif_probe, "jfif": _jfif.jfif_probe}
LOSSLESS_FMTS = frozenset({"png", "bmp"})


def encode(img: np.ndarray, fmt: str) -> bytes:
    return _ENCODERS[fmt](img)


def decode(data: bytes, fmt: str) -> np.ndarray:
    return _DECODERS[fmt](data)


def probe(data: bytes, fmt: str) -> tuple[int, int]:
    """Header-only dimension probe (no full decode) — M22 in SURVEY.md §2."""
    return _PROBES[fmt](data)


def sniff_fmt(data: bytes) -> str | None:
    if data[:8] == _PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == _FJPG_MAGIC:
        return "jpg"
    if data[:4] == b"GIF8":
        return "gif"
    if data[:2] == b"\xff\xd8":
        return "jfif"
    return None


# ---------------------------------------------------------------------------
# PSNR + pHash
# ---------------------------------------------------------------------------

def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images.

    Hot path notes: the exact-equality probe is a memcmp (no float
    conversion) — lossless round-trips exit there; mismatching images
    compute MSE from an integer |diff| histogram (int16 + uint8
    temporaries instead of two full float64 copies — this stage is
    memory-bandwidth-bound at high core counts)."""
    if a.shape != b.shape:
        return 0.0
    if a.dtype == np.uint8 and b.dtype == np.uint8:
        if np.array_equal(a, b):
            return float("inf")
        d = a.astype(np.int16)
        np.subtract(d, b, out=d)
        np.abs(d, out=d)
        cnt = np.bincount(d.ravel().astype(np.uint8), minlength=256)
        mse = float(np.dot(cnt, _SQ256)) / d.size
    else:
        mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


_SQ256 = np.arange(256, dtype=np.int64) ** 2


def resize_gray(img: np.ndarray, gw: int, gh: int) -> np.ndarray:
    """Grayscale + resize to (gw, gh) by area-mean pooling (deterministic).
    Generalized from the former _resize_gray32 — at gw=gh=32 the
    expressions are identical, so phash64 output is unchanged."""
    g = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = g.shape
    ys = (np.arange(gh + 1) * h) // gh
    xs = (np.arange(gw + 1) * w) // gw
    # integral-image area pooling — exact mean over each cell
    ii = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = g.cumsum(0).cumsum(1)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    y1 = np.minimum(y1, h)
    x1 = np.minimum(x1, w)
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    s = ii[y1][:, x1] - ii[y1][:, x0] - ii[y0][:, x1] + ii[y0][:, x0]
    return s / area


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash: 32x32 gray → DCT-II → top-left 8x8 → median
    threshold.  Replaces the reference's SURF/VLAD/PCA + IVFPQ visual
    near-dup index (`ImageVectorization.java:26-231`, `IndexingManage.java:68-80`)
    with an int64 column groupby (SURVEY.md §2.6 O9)."""
    small = resize_gray(img, 32, 32)
    coef = _D32 @ small @ _D32.T
    block = coef[:8, :8].flatten()
    # median of 64 == np.median's exact formula (mean of the two
    # partitioned middle elements), without its dispatch overhead;
    # packbits(bitorder big) == the MSB-first shift loop, bit-identical
    med = np.mean(np.partition(block, (31, 32))[31:33])
    return int.from_bytes(np.packbits(block > med).tobytes(), "big")


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash (Krawetz dHash): 9x8 gray area-mean resize,
    bit = cell strictly brighter than its right neighbor, row-major
    MSB-first.  Complements :func:`phash64` (gradient-based vs
    DCT-based) for the visual near-dup family (SURVEY.md §2.6 O9)."""
    small = resize_gray(img, 9, 8)  # shape (8, 9)
    bits = small[:, :-1] > small[:, 1:]
    return int.from_bytes(np.packbits(bits.flatten()).tobytes(), "big")


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash: 8x8 gray area-mean resize, bit = cell
    strictly brighter than the 64-cell mean, row-major MSB-first."""
    small = resize_gray(img, 8, 8)
    bits = small > small.mean()
    return int.from_bytes(np.packbits(bits.flatten()).tobytes(), "big")


def hamming64(a, b) -> np.ndarray:
    """Vectorized Hamming distance between uint64/int64 arrays."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    for _ in range(8):
        cnt += _POPCNT8[(x & np.uint64(0xFF)).astype(np.uint8)]
        x = x >> np.uint64(8)
    return cnt


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
