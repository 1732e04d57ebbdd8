import numpy as np
import pytest

from cc_warc_examples_ray import imagecodec as ic


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(42)
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [xx * 255 // (w - 1), yy * 255 // (h - 1), (xx + yy) * 255 // (w + h - 2)], -1
    )
    return np.clip(base + rng.integers(-8, 9, (h, w, 3)), 0, 255).astype(np.uint8)


def test_png_roundtrip_exact(img):
    e = ic.png_encode(img)
    assert ic.png_probe(e) == (img.shape[1], img.shape[0])
    assert (ic.png_decode(e) == img).all()


def test_bmp_roundtrip_exact(img):
    e = ic.bmp_encode(img)
    assert ic.bmp_probe(e) == (img.shape[1], img.shape[0])
    assert (ic.bmp_decode(e) == img).all()


def test_fjpg_lossy_psnr(img):
    e = ic.fjpg_encode(img)
    assert ic.fjpg_probe(e) == (img.shape[1], img.shape[0])
    d = ic.fjpg_decode(e)
    assert ic.psnr(img, d) >= 40.0
    assert len(e) < len(ic.png_encode(img))  # actually compresses


@pytest.mark.parametrize("hw", [(33, 47), (8, 8), (100, 31)])
def test_odd_sizes(hw):
    rng = np.random.default_rng(1)
    im = rng.integers(0, 256, (*hw, 3)).astype(np.uint8)
    assert (ic.png_decode(ic.png_encode(im)) == im).all()
    assert (ic.bmp_decode(ic.bmp_encode(im)) == im).all()
    assert ic.fjpg_probe(ic.fjpg_encode(im)) == (hw[1], hw[0])


def test_dispatch_and_sniff(img):
    for fmt in ("png", "bmp", "jpg"):
        e = ic.encode(img, fmt)
        assert ic.sniff_fmt(e) == fmt
        assert ic.probe(e, fmt) == (img.shape[1], img.shape[0])
        d = ic.decode(e, fmt)
        if fmt in ic.LOSSLESS_FMTS:
            assert (d == img).all()
        else:
            assert ic.psnr(img, d) >= 40


def test_gif_roundtrip():
    """GIF87a/89a LZW codec: palette images round-trip pixel-exact at
    every code width (palette sizes straddle min_code 2..8), interlaced
    streams de-interlace, >256-color inputs quantize via the documented
    3-3-2 map, and extension blocks are skipped."""
    rng = np.random.default_rng(7)
    for n_colors in (2, 5, 16, 100, 256):
        pal = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
        img = pal[rng.integers(0, n_colors, (23, 31))]
        for inter in (False, True):
            gif = ic.gif_encode(img, interlace=inter)
            assert ic.sniff_fmt(gif) == "gif"
            assert ic.gif_probe(gif) == (31, 23)
            assert np.array_equal(ic.gif_decode(gif), img), (n_colors, inter)

    # >256 colors: deterministic 3-3-2 quantization
    big = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    assert len(np.unique(big.reshape(-1, 3), axis=0)) > 256
    back = ic.gif_decode(ic.gif_encode(big))
    want = np.stack([big[..., 0] & 0xE0, big[..., 1] & 0xE0,
                     big[..., 2] & 0xC0], axis=-1)
    assert np.array_equal(back, want)

    # a graphic-control extension before the image block is skipped
    pal_img = np.zeros((4, 4, 3), np.uint8)
    gif = ic.gif_encode(pal_img)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = gif[:13 + 3 * 2] + gce + gif[13 + 3 * 2:]  # after 2-entry GCT
    assert np.array_equal(ic.gif_decode(spliced), pal_img)


def test_phash_properties(img):
    p1 = ic.phash64(img)
    shifted = np.clip(img.astype(int) + 3, 0, 255).astype(np.uint8)
    p2 = ic.phash64(shifted)
    rng = np.random.default_rng(9)
    other = rng.integers(0, 256, img.shape).astype(np.uint8)
    p3 = ic.phash64(other)
    assert ic.hamming64(np.uint64(p1), np.uint64(p2)) <= 4
    assert ic.hamming64(np.uint64(p1), np.uint64(p3)) > 10


def test_hamming_vectorized():
    a = np.array([0, 0xFF, 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    b = np.array([0, 0, 0], dtype=np.uint64)
    assert list(ic.hamming64(a, b)) == [0, 8, 64]


def test_pinned_literal_hashes():
    """Hard-pinned dHash/aHash literals for one row per lossy/lossless
    codec family in the mixed rotation (computed once, frozen).  The
    image_hashes / image_augment oracles recompute through the SAME
    codec library as the queries, so a silent codec regression could
    pass both sides — these literals break that shared-code dependency
    (ADVICE r4)."""
    from cc_warc_examples_ray import synth

    want = {
        0: ("png", 0x101010101010101, 0x20E3FFFFF7F),
        1: ("jpg", 0x3030303030303030, 0x20E1E7FFFFE30000),
        3: ("gif", 0x6040606060406060, 0xC1C7DFFFFF000041),
        4: ("jfif", 0xC0C0C0C0C0C0C0C, 0x1078F9FFFF7800),
    }
    for k, (fmt, dh, ah) in want.items():
        assert synth.FMTS_MIXED[k % 5] == fmt
        img = ic.decode(ic.encode(np.asarray(synth.expected_pixels(k)), fmt), fmt)
        assert ic.dhash64(img) == dh, (k, fmt)
        assert ic.ahash64(img) == ah, (k, fmt)
