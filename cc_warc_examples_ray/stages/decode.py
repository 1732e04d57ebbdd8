"""Decode + validate stage (SURVEY.md §2.2 M19-M22, north-rule per-row
invariant).

The reference decodes with ``ImageIO.read`` + a greyscale fallback
(`/root/reference/src/org/commoncrawl/mklab/analysis/ImageUtils.java:89-132`),
gates on content-length/type (`ImageUtils.java:26,81-83`) and decoded
dims >= 400x400 (`ImageUtils.java:27-28,85-87`), and probes dimensions
header-only for speed (`ArffController.java:117-156`).

This stage is an **actor-pool ``map_batches`` callable**: per batch it

1. header-probes (w, h) without a full decode and checks them against
   the table's ``w``/``h`` columns (M22);
2. fully decodes the payload with the pure-numpy codecs;
3. validates per-row against the recomputable reference pixels:
   exact equality for lossless formats, PSNR >= 40 dB for lossy
   (the north rule's decoded-pixel allclose), plus caption equality and
   a phash re-computation check;
4. applies the min-dimension admission gate (>=400 px at production
   scale; the synthetic fixture uses a scaled-down gate).

Output: input columns minus ``bytes`` (payloads are never carried past
validation into the shuffle-adjacent tables) plus
``decode_ok, dims_ok, psnr_db, phash_rt, valid, big``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .. import imagecodec, synth

_ID_RE = re.compile(r"^img-(\d+)$")


class DecodeValidate:
    """Callable class for ``map_batches(DecodeValidate, concurrency=N)``."""

    # lossy pHash round-trip tolerance: the synthetic fixture images carry
    # per-pixel noise that puts many DCT coefficients near the median, so
    # quantization legitimately flips up to ~12/64 bits (measured); natural
    # images are far more stable.  Lossless must round-trip exactly.
    LOSSY_PHASH_HAMMING = 16

    def __init__(self, min_dim: int = synth.SMALL_DIM_GATE, check_reference: bool = True,
                 keep_bytes: bool = False):
        self.min_dim = min_dim
        self.check_reference = check_reference
        self.keep_bytes = keep_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        # zero_copy_only=False: fetch-miss rows carry null w/h (→ NaN)
        ws = batch.column("w").to_numpy(zero_copy_only=False)
        hs = batch.column("h").to_numpy(zero_copy_only=False)
        ids = batch.column("image_id").to_pylist()
        captions = batch.column("caption").to_pylist()

        decode_ok = np.zeros(n, dtype=bool)
        dims_ok = np.zeros(n, dtype=bool)
        psnr_db = np.zeros(n, dtype=np.float64)
        caption_ok = np.zeros(n, dtype=bool)
        # stored phashes pulled once as an array (a per-row pyarrow
        # scalar .as_py() round-trip is measurable at 10^6-row epochs);
        # round-trip hashes collected per row, hamming done in ONE
        # vectorized call after the loop
        # fill nulls (fetch-miss rows) in Arrow so the conversion stays
        # int64-exact — a nullable column would go through lossy float64
        stored_ph = (
            pa.compute.fill_null(batch.column("phash"), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        rt_ph = np.zeros(n, dtype=np.uint64)

        for i in range(n):
            fmt = fmts[i]
            data = blobs[i]
            try:
                pw, ph_ = imagecodec.probe(data, fmt)
                dims_ok[i] = pw == ws[i] and ph_ == hs[i]
                img = imagecodec.decode(data, fmt)
                decode_ok[i] = img.shape == (hs[i], ws[i], 3)
            except Exception:
                continue
            if not decode_ok[i]:
                continue
            rt_ph[i] = imagecodec.phash64(img)
            m = _ID_RE.match(ids[i]) if self.check_reference else None
            if m:
                ref = synth.expected_pixels(int(m.group(1)))
                p = imagecodec.psnr(img, ref)
                psnr_db[i] = p if np.isfinite(p) else 99.0
                caption_ok[i] = captions[i] == synth.caption_for(int(m.group(1)))
            else:
                # no recomputable reference: self-consistency only
                psnr_db[i] = 99.0
                caption_ok[i] = True

        # phash of the decoded pixels must land in the same bucket as
        # the stored phash (exact for lossless, near for lossy)
        ham = imagecodec.hamming64(stored_ph, rt_ph)
        lossless = np.array([f in imagecodec.LOSSLESS_FMTS for f in fmts])
        phash_rt = decode_ok & np.where(
            lossless, ham == 0, ham <= self.LOSSY_PHASH_HAMMING
        )

        pixel_ok = np.where(lossless, psnr_db >= 99.0, psnr_db >= 40.0)
        valid = decode_ok & dims_ok & phash_rt & pixel_ok & caption_ok
        big = (ws >= self.min_dim) & (hs >= self.min_dim)

        out = batch if self.keep_bytes else batch.drop_columns(["bytes"])
        return (
            out.append_column("decode_ok", pa.array(decode_ok))
            .append_column("dims_ok", pa.array(dims_ok))
            .append_column("psnr_db", pa.array(psnr_db))
            .append_column("phash_rt", pa.array(phash_rt))
            .append_column("valid", pa.array(valid))
            .append_column("big", pa.array(big))
        )
