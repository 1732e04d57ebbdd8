"""dHash/aHash visual hashes + the image+caption curation report."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from cc_warc_examples_ray import imagecodec as ic
from cc_warc_examples_ray import synth
from cc_warc_examples_ray.ops import curation


def _img(key: int, w: int = 96, h: int = 64) -> np.ndarray:
    return synth.render_image(key, w, h)


def test_dhash_gradient_extremes():
    # horizontally constant -> no cell strictly brighter than its right
    # neighbor -> all-zero hash; strictly decreasing -> all ones
    const = np.full((40, 40, 3), 128, np.uint8)
    assert ic.dhash64(const) == 0
    dec = np.repeat(np.arange(255, 0, -2, dtype=np.uint8)[None, :, None],
                    3, axis=2)
    dec = np.repeat(dec, 32, axis=0)
    assert ic.dhash64(dec) == (1 << 64) - 1


def test_ahash_constant_zero():
    assert ic.ahash64(np.full((32, 48, 3), 77, np.uint8)) == 0


def test_hash_near_dup_properties():
    a = _img(5)
    near = np.clip(a.astype(int) + 2, 0, 255).astype(np.uint8)
    other = _img(6)
    for fn in (ic.dhash64, ic.ahash64):
        ha, hn, ho = fn(a), fn(near), fn(other)
        assert ic.hamming64(np.uint64(ha), np.uint64(hn)) <= 6
        assert ic.hamming64(np.uint64(ha), np.uint64(ho)) > 10


def test_resize_gray_matches_phash_kernel():
    # the generalized resize at 32x32 must keep phash64 bit-identical
    # to its round-3 pinned values (regression for the generalization)
    img = _img(7, 100, 140)
    small = ic.resize_gray(img, 32, 32)
    assert small.shape == (32, 32)
    # area-mean of a constant image is exact
    assert np.allclose(ic.resize_gray(np.full((50, 70, 3), 9, np.uint8), 9, 8), 9.0)


def _curation_input() -> pa.Table:
    rows = [
        # image_id, w, h, caption, phash
        ("img-a", 128, 128, "sunset harbor mountain bicycle window", 1),
        ("img-b", 32, 128, "sunset harbor mountain bicycle window", 2),   # dims
        ("img-c", 128, 31, "sunset harbor mountain bicycle window", 3),   # dims
        ("img-d", 256, 64, "sunset harbor mountain bicycle window", 4),   # aspect 4x
        ("img-e", 128, 128, "sunset harbor mountain", 5),                 # 3 words
        ("img-f", 128, 128, "", 6),                                       # empty
        ("img-g", 128, 128, "sunset harbor mountain bicycle Market", 7),  # blocklist (ci)
        ("img-h", 128, 128, "river forest temple station library", 1),    # dup of img-a
        ("img-i", 128, 128, "marketplace copper silver velvet amber", 8), # no \b hit
    ]
    return pa.table({
        "image_id": pa.array([r[0] for r in rows]),
        "w": pa.array([r[1] for r in rows], pa.int32()),
        "h": pa.array([r[2] for r in rows], pa.int32()),
        "caption": pa.array([r[3] for r in rows]),
        "phash": pa.array([r[4] for r in rows], pa.int64()),
    })


def test_curation_report_reasons(ray_session):
    out = (
        curation.curation_report(rd.from_arrow(_curation_input()))
        .to_pandas().set_index("image_id")["reason"].to_dict()
    )
    assert out == {
        "img-a": "kept",
        "img-b": "dims",
        "img-c": "dims",
        "img-d": "aspect",
        "img-e": "caption_short",
        "img-f": "caption_short",
        "img-g": "caption_block",
        "img-h": "dup",
        "img-i": "kept",
    }


def test_curation_gate_order_dims_before_aspect(ray_session):
    # a row failing several gates reports the FIRST one (dims)
    t = pa.table({
        "image_id": pa.array(["x"]),
        "w": pa.array([8], pa.int32()),
        "h": pa.array([128], pa.int32()),
        "caption": pa.array([""]),
        "phash": pa.array([99], pa.int64()),
    })
    out = curation.curation_report(rd.from_arrow(t)).to_pandas()
    assert list(out["reason"]) == ["dims"]
