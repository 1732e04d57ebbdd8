"""Baseline JFIF codec tests.

Covers the reference's real-JPEG decode role (`ImageUtils.java:89-132`,
incl. the greyscale fallback) and SOF header probing
(`ArffController.java:117-156`): hand-crafted literal JPEG byte streams
with exactly-known pixel output (bit-validation independent of our own
encoder), encoder round trips at the PSNR>=40dB north-rule bar,
subsampling, restart markers, and dispatch registration."""

import numpy as np
import pytest

from cc_warc_examples_ray import imagecodec, jfif, synth


def _dqt_unit() -> bytes:
    return b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64


def _sof0_gray8() -> bytes:
    return b"\xff\xc0" + (11).to_bytes(2, "big") + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0])


def _dht(tc: int, th: int, bits: list, vals: list) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits + [0] * (16 - len(bits))) + bytes(vals)
    return b"\xff\xc4" + (2 + len(body)).to_bytes(2, "big") + body


def _sos_gray() -> bytes:
    return b"\xff\xda" + (8).to_bytes(2, "big") + bytes([1, 1, 0x00, 0, 63, 0])


def test_literal_dc_only_block():
    """Hand-assembled 8x8 greyscale JPEG: quant all-1s, DC table maps
    code '0' -> category 4, scan bits '0 1000' encode DC=8, AC table maps
    '0' -> EOB.  DC-only IDCT: every pixel exactly 128 + 8/8 = 129."""
    data = (
        b"\xff\xd8" + _dqt_unit() + _sof0_gray8()
        + _dht(0, 0, [1], [0x04])   # DC: '0' -> SSSS=4
        + _dht(1, 0, [1], [0x00])   # AC: '0' -> EOB
        + _sos_gray()
        + bytes([0b01000011])       # 0 | 1000 | 0 | pad 11
        + b"\xff\xd9"
    )
    out = jfif.jfif_decode(data)
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out, np.full((8, 8, 3), 129, np.uint8))
    assert jfif.jfif_probe(data) == (8, 8)


def test_literal_single_ac_coefficient():
    """DC=0 then one AC coefficient at zigzag position 1 (raster (0,1) =
    horizontal frequency v=1) with value 1: pixel rows all equal
    clip(rint(128 + (1/4)(1/sqrt(2)) cos((2x+1) pi/16))) — validates
    zigzag placement, AC run/size decode, and the IDCT normalization
    against the spec formula computed independently here."""
    data = (
        b"\xff\xd8" + _dqt_unit() + _sof0_gray8()
        + _dht(0, 0, [1], [0x00])          # DC: '0' -> SSSS=0 (diff 0)
        + _dht(1, 0, [0, 2], [0x01, 0x00])  # AC: '00' -> run0/size1, '01' -> EOB
        + _sos_gray()
        + bytes([0b00010111])              # 0 | 00 | 1 | 01 | pad 11
        + b"\xff\xd9"
    )
    out = jfif.jfif_decode(data)
    x = np.arange(8)
    row = 128.0 + 0.25 * (1 / np.sqrt(2)) * np.cos((2 * x + 1) * np.pi / 16)
    want = np.clip(np.rint(row), 0, 255).astype(np.uint8)
    expect = np.stack([np.tile(want, (8, 1))] * 3, axis=-1)
    assert np.array_equal(out, expect)


def test_roundtrip_psnr_bar():
    """North-rule lossy validation: PSNR >= 40 dB at 4:4:4 over the
    synthetic corpus, all size classes."""
    for k in (0, 1, 2, 7, 13, 96):
        img = np.asarray(synth.expected_pixels(k))
        out = jfif.jfif_decode(jfif.jfif_encode(img))
        assert out.shape == img.shape
        assert imagecodec.psnr(img, out) >= 40.0


def test_roundtrip_odd_dims():
    img = synth.render_image(99, 37, 29)
    out = jfif.jfif_decode(jfif.jfif_encode(img))
    assert out.shape == (29, 37, 3)
    assert imagecodec.psnr(img, out) >= 40.0


def test_roundtrip_tiny():
    img = synth.render_image(7, 3, 2)
    out = jfif.jfif_decode(jfif.jfif_encode(img))
    assert out.shape == (2, 3, 3)


def test_subsampling_420():
    """4:2:0 decodes with correct geometry; luma-dominant content still
    clears ~30 dB on the noisy synthetic corpus (chroma is halved)."""
    img = np.asarray(synth.expected_pixels(3))
    b = jfif.jfif_encode(img, subsampling="420")
    out = jfif.jfif_decode(b)
    assert out.shape == img.shape
    assert jfif.jfif_probe(b) == (img.shape[1], img.shape[0])
    assert imagecodec.psnr(img, out) >= 28.0
    assert len(b) < len(jfif.jfif_encode(img))  # chroma really subsampled


def test_greyscale_fallback():
    """1-component frames decode to replicated-channel RGB — the
    ImageUtils.java greyscale-JPEG fallback semantics."""
    g = np.asarray(synth.expected_pixels(4))[:, :, 0]
    out = jfif.jfif_decode(jfif.jfif_encode(g))
    assert out.shape == (*g.shape, 3)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 0], out[:, :, 2])
    assert imagecodec.psnr(np.stack([g, g, g], -1), out) >= 40.0


def test_restart_markers_bit_identical():
    """DRI/RSTn segmentation must not change decoded pixels (it resets
    DC predictors + realigns bits, nothing else)."""
    img = np.asarray(synth.expected_pixels(5))
    plain = jfif.jfif_decode(jfif.jfif_encode(img))
    restarted = jfif.jfif_decode(jfif.jfif_encode(img, restart_interval=3))
    assert np.array_equal(plain, restarted)


def test_progressive_raises():
    data = (b"\xff\xd8" + _dqt_unit()
            + b"\xff\xc2" + (11).to_bytes(2, "big")
            + bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    with pytest.raises(NotImplementedError):
        jfif.jfif_decode(data)


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError):
        jfif.jfif_decode(b"PNG whatever")


def test_dispatch_registration():
    """imagecodec encode/decode/probe/sniff route 'jfif'; the synthetic
    'jpg' (FJPG) codec is untouched."""
    img = np.asarray(synth.expected_pixels(8))
    b = imagecodec.encode(img, "jfif")
    assert imagecodec.sniff_fmt(b) == "jfif"
    assert imagecodec.probe(b, "jfif") == (img.shape[1], img.shape[0])
    out = imagecodec.decode(b, "jfif")
    assert imagecodec.psnr(img, out) >= 40.0
    fb = imagecodec.encode(img, "jpg")
    assert imagecodec.sniff_fmt(fb) == "jpg"


def test_huffman_table_is_spec_legal():
    """The optimized tables must satisfy BITS sum == len(HUFFVAL), code
    lengths <= 16, and never assign the all-ones code (Annex C)."""
    img = np.asarray(synth.expected_pixels(1))
    data = jfif.jfif_encode(img)
    seen = 0
    for marker, seg, _ in jfif._segments(data):
        if marker != 0xC4:
            continue
        o = 0
        while o < len(seg):
            bits = list(seg[o + 1 : o + 17])
            nv = sum(bits)
            assert nv == len(seg[o + 17 : o + 17 + nv])
            code, k = 0, 0
            for l in range(1, 17):
                for _ in range(bits[l - 1]):
                    assert code < (1 << l) - 1, "all-ones code assigned"
                    code += 1
                    k += 1
                code <<= 1
            o += 17 + nv
            seen += 1
    assert seen == 4  # dcY, acY, dcC, acC
