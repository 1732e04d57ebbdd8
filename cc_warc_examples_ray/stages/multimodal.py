"""Multimodal column stages: decode / resize / feature-extract /
frame-sample over opaque ``binary`` payload columns with typed metadata.

Images are fully real (pure-numpy codecs from
:mod:`cc_warc_examples_ray.imagecodec` — the reference's ``ImageIO``
decode + 1024x768 scale cap, `ImageVectorization.java:31,156-157`).
Audio is real for RIFF/WAVE PCM (8/16-bit + float32); video is real for
UNCOMPRESSED 24-bit DIB AVI (RIFF container per the public spec) plus
the deterministic ``fvid`` fake.  COMPRESSED audio/video codecs need
libraries this container does not ship, so those decode kernels are
STUBS behind ``NotImplementedError`` — the Ray-side plumbing (schemas,
actor-pool signatures, batch sizing, output layout) is real and tested,
so swapping a real decoder in changes one function.

All stages are ``map_batches`` callable classes (actor-pool-ready:
state in ``__init__``) operating on Arrow batches; payload bytes never
leave the stage's task.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import imagecodec

# image features: 8x8x8 RGB color histogram + pHash, the engine-native
# replacement shape for SURF/VLAD/PCA vectors (ImageVectorization.java)
IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("phash", pa.int64()),
        ("color_hist", pa.list_(pa.float32())),
        ("mean_luma", pa.float32()),
        # undecodable rows flag False (their phash=0 placeholder would
        # otherwise cluster all broken images as visual duplicates)
        ("decoded", pa.bool_()),
    ]
)


def resize_area_mean(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic area-mean resize (downscale; upscale = nearest)."""
    h, w, _ = img.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    ii = np.zeros((h + 1, w + 1, 3), dtype=np.float64)
    ii[1:, 1:] = img.astype(np.float64).cumsum(0).cumsum(1)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    y1 = np.minimum(y1, h)
    x1 = np.minimum(x1, w)
    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.float64)
    s = ii[y1][:, x1] - ii[y1][:, x0] - ii[y0][:, x1] + ii[y0][:, x0]
    return np.clip(np.rint(s / area[..., None]), 0, 255).astype(np.uint8)


class ImageResizer:
    """Resize payloads to fit within (max_w, max_h), preserving aspect —
    the reference's vectorization scale cap (1024x768,
    `ImageVectorization.java:31`).  Output: same schema, re-encoded
    bytes + updated w/h."""

    def __init__(self, max_w: int = 1024, max_h: int = 768):
        self.max_w, self.max_h = max_w, max_h

    def __call__(self, tbl: pa.Table) -> pa.Table:
        blobs = tbl.column("bytes").to_pylist()
        fmts = tbl.column("fmt").to_pylist()
        out_bytes, out_w, out_h = [], [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                # header-only dimension probe first: images under the cap
                # (the common case) pass through UNTOUCHED — no decode
                # cost, and no extra lossy generation for jpg rows
                w, h = imagecodec.probe(blob, fmt)
                if w <= self.max_w and h <= self.max_h:
                    out_bytes.append(blob)
                    out_w.append(np.int32(w))
                    out_h.append(np.int32(h))
                    continue
                img = imagecodec.decode(blob, fmt)
            except Exception:
                out_bytes.append(None)
                out_w.append(None)
                out_h.append(None)
                continue
            h, w, _ = img.shape
            scale = min(self.max_w / w, self.max_h / h, 1.0)
            if scale < 1.0:
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                img = resize_area_mean(img, nw, nh)
            out_bytes.append(imagecodec.encode(img, fmt))
            out_h.append(np.int32(img.shape[0]))
            out_w.append(np.int32(img.shape[1]))
        return (
            tbl.drop_columns(["bytes", "w", "h"])
            .append_column("bytes", pa.array(out_bytes, pa.binary()))
            .append_column("w", pa.array(out_w, pa.int32()))
            .append_column("h", pa.array(out_h, pa.int32()))
        )


AUG_OPS = ("hflip", "vflip", "rot90", "center_crop")


def augment_pixels(img: np.ndarray, op: str,
                   crop: tuple[int, int] = (64, 64)) -> np.ndarray:
    """Deterministic pixel augmentation: horizontal/vertical flip,
    90°-counterclockwise rotation, or center crop (clamped to the
    image).  Pure index permutations — exactly invertible (flips are
    involutions, rot90⁴ = identity), which is what the tests pin."""
    if op == "hflip":
        return img[:, ::-1]
    if op == "vflip":
        return img[::-1]
    if op == "rot90":
        return np.rot90(img)
    if op == "center_crop":
        cw, ch = crop
        h, w, _ = img.shape
        cw, ch = min(cw, w), min(ch, h)
        y0, x0 = (h - ch) // 2, (w - cw) // 2
        return img[y0:y0 + ch, x0:x0 + cw]
    raise ValueError(f"unknown augment op {op!r} (one of {AUG_OPS})")


class ImageAugmenter:
    """Actor-pool augmentation stage: decode → :func:`augment_pixels`
    → re-encode.  A training-data pipeline fans one image out to K
    augmented variants; here each call applies ONE op (chain stages,
    or union K stages, for multi-variant fan-out).  Lossless formats
    round-trip pixel-exactly; jpg rows pay one extra lossy generation
    (same trade ImageResizer documents).  ``suffix`` disambiguates the
    output ids (``image_id + suffix``)."""

    def __init__(self, op: str = "hflip", crop: tuple[int, int] = (64, 64),
                 suffix: str | None = None):
        if op not in AUG_OPS:
            raise ValueError(f"unknown augment op {op!r} (one of {AUG_OPS})")
        self.op, self.crop = op, crop
        self.suffix = f"#{op}" if suffix is None else suffix

    def __call__(self, tbl: pa.Table) -> pa.Table:
        blobs = tbl.column("bytes").to_pylist()
        fmts = tbl.column("fmt").to_pylist()
        out_bytes, out_w, out_h = [], [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                img = augment_pixels(imagecodec.decode(blob, fmt),
                                     self.op, self.crop)
            except Exception:
                out_bytes.append(None)
                out_w.append(None)
                out_h.append(None)
                continue
            out_bytes.append(imagecodec.encode(np.ascontiguousarray(img), fmt))
            out_h.append(np.int32(img.shape[0]))
            out_w.append(np.int32(img.shape[1]))
        ids = pc.binary_join_element_wise(
            pc.cast(tbl.column("image_id"), pa.string()),
            pa.array([self.suffix] * tbl.num_rows, pa.string()), "")
        return (
            tbl.drop_columns(["bytes", "w", "h", "image_id"])
            .append_column("image_id", ids)
            .append_column("bytes", pa.array(out_bytes, pa.binary()))
            .append_column("w", pa.array(out_w, pa.int32()))
            .append_column("h", pa.array(out_h, pa.int32()))
        )


class ImageFeatureExtractor:
    """bytes → (phash, 512-bin color histogram, mean luma).  The
    engine-native stand-in for the SURF/VLAD/PCA pipeline
    (`ImageVectorization.java:26-231`): stateful (bin edges prepared
    once), vectorized per image."""

    def __init__(self, bins_per_channel: int = 8):
        self.b = bins_per_channel

    def __call__(self, tbl: pa.Table) -> pa.Table:
        blobs = tbl.column("bytes").to_pylist()
        fmts = tbl.column("fmt").to_pylist()
        ids = tbl.column("image_id").to_pylist()
        phashes, hists, lumas, oks = [], [], [], []
        shift = 8 - int(np.log2(self.b))
        for blob, fmt in zip(blobs, fmts):
            try:
                img = imagecodec.decode(blob, fmt)
            except Exception:
                phashes.append(0)
                hists.append(np.zeros(self.b**3, dtype=np.float32))
                lumas.append(0.0)
                oks.append(False)
                continue
            oks.append(True)
            q = (img >> shift).astype(np.int32)
            code = (q[..., 0] * self.b + q[..., 1]) * self.b + q[..., 2]
            hist = np.bincount(code.ravel(), minlength=self.b**3).astype(np.float32)
            hist /= max(1.0, hist.sum())
            hists.append(hist)
            phashes.append(np.int64(np.uint64(imagecodec.phash64(img)).view(np.int64)))
            lumas.append(float((img.astype(np.float64) @ [0.299, 0.587, 0.114]).mean()))
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "phash": pa.array(phashes, pa.int64()),
                "color_hist": pa.array([h.tolist() for h in hists], pa.list_(pa.float32())),
                "mean_luma": pa.array(np.array(lumas, dtype=np.float32)),
                "decoded": pa.array(oks, pa.bool_()),
            },
            schema=IMAGE_FEATURES_SCHEMA,
        )


# ---------------------------------------------------------------------------
# Audio / video: real plumbing, stubbed codecs
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("bytes", pa.binary()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("codec", pa.string()),
    ]
)

VIDEO_FRAMES_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("frame_index", pa.int32()),
        ("ts_ms", pa.int64()),
        ("frame_bytes", pa.binary()),  # encoded like an image payload
        ("fmt", pa.string()),
    ]
)


def _g711_decode(codes: np.ndarray, alaw: bool) -> np.ndarray:
    """ITU-T G.711 expansion (the public segmented-companding spec) →
    float32 in [-1, 1], vectorized over the byte stream."""
    c = codes.astype(np.int32)
    if alaw:
        c ^= 0x55
        # A-law sign bit 1 = POSITIVE (opposite of μ-law's complemented bit)
        sign = np.where(c & 0x80, 1, -1)
        exp = (c >> 4) & 0x07
        mant = c & 0x0F
        mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    else:
        c = ~c & 0xFF
        sign = np.where(c & 0x80, -1, 1)
        exp = (c >> 4) & 0x07
        mant = c & 0x0F
        mag = (((mant << 3) + 0x84) << exp) - 0x84
    return (sign * mag).astype(np.float32) / 32768.0


def g711_encode(samples: np.ndarray, alaw: bool) -> np.ndarray:
    """ITU-T G.711 compression of float32 [-1, 1] → uint8 codes (test /
    synth source; exact inverse pairing with :func:`_g711_decode` is
    pinned by the round-trip test)."""
    x = np.clip((samples * 32768.0), -32768, 32767).astype(np.int32)
    # A-law: bit 7 = 1 for positive; μ-law: bit set pre-complement for negative
    sign_bit = np.where(x < 0, 0x80, 0) if not alaw else np.where(x >= 0, 0x80, 0)
    mag = np.abs(x)
    if alaw:
        mag = np.minimum(mag, 0x7FFF)
        exp = np.maximum(np.int32(np.floor(np.log2(np.maximum(mag, 1)))) - 7, 0)
        exp = np.minimum(exp, 7)
        mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
        code = (sign_bit | (exp << 4) | mant) ^ 0x55
    else:
        mag = np.minimum(mag + 0x84, 0x7FFF)
        exp = np.int32(np.floor(np.log2(mag))) - 7
        exp = np.clip(exp, 0, 7)
        mant = (mag >> (exp + 3)) & 0x0F
        code = ~(sign_bit | (exp << 4) | mant) & 0xFF
    return code.astype(np.uint8)


def parse_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Real RIFF/WAVE parser (public ISO/IEC + Microsoft RIFF layout —
    plain struct framing, no codec library needed): walks the chunk list,
    reads the ``fmt `` chunk (PCM8 / PCM16 / IEEE-float32 / G.711
    A-law / μ-law) and the ``data`` chunk, averages channels to mono.

    Returns (float32 mono samples in [-1, 1], sample_rate).  Lenient on a
    truncated ``data`` chunk (uses the bytes present); raises ValueError
    on non-RIFF input or compressed format tags."""

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, n = 12, len(blob)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = blob[pos : pos + 4]
        (clen,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body  # possibly truncated: len(body) < clen is fine
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, _block, bits = fmt
    if channels < 1:
        raise ValueError("zero channels")
    if audio_format == 1 and bits == 16:
        x = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2")
        x = x.astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(data[: len(data) - len(data) % 4], dtype="<f4").astype(np.float32)
    elif audio_format in (6, 7) and bits == 8:
        # G.711 A-law (6) / μ-law (7) — real telephony codecs, decoded
        # from the public ITU-T G.711 tables (pure numpy expansion)
        x = _g711_decode(np.frombuffer(data, dtype=np.uint8),
                         alaw=(audio_format == 6))
    else:
        raise ValueError(f"unsupported WAVE format tag {audio_format}/{bits}-bit")
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return x.astype(np.float32), int(rate)


def write_wav(samples: np.ndarray, rate: int, bits: int = 16,
              channels: int = 1) -> bytes:
    """Encode float32 mono samples as a PCM WAVE file (test/fixture
    helper; ``channels>1`` duplicates the mono signal)."""

    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if channels > 1:
        x = np.repeat(x[:, None], channels, axis=1).ravel()
    if bits == 16:
        raw = (np.rint(x * 32767.0)).astype("<i2").tobytes()
    elif bits == 8:
        raw = (np.rint(x * 127.0) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError("write_wav supports 8/16-bit PCM")
    byte_rate = rate * channels * bits // 8
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, block, bits)
    chunks = b"".join(
        [b"fmt ", struct.pack("<I", len(fmt)), fmt,
         b"data", struct.pack("<I", len(raw)), raw]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_audio(blob: bytes, codec: str) -> np.ndarray:
    """Audio decode.  REAL paths: ``pcm16`` (raw PCM) and ``wav``
    (RIFF/WAVE via :func:`parse_wav` — PCM8/PCM16/float32, mono-mixed).
    Compressed codecs (mp3/aac/opus) need external libraries this
    container does not ship → ``NotImplementedError`` (honest stub)."""
    if codec == "pcm16":
        return np.frombuffer(blob, dtype=np.int16).astype(np.float32) / 32768.0
    if codec == "wav":
        return parse_wav(blob)[0]
    raise NotImplementedError(f"audio codec {codec!r} requires external libraries")


class AudioFeaturizer:
    """Actor-pool stage: audio payload → (rms, zero-crossing-rate,
    duration).  Decode goes through :func:`decode_audio` (stubbed for
    compressed codecs); undecodable rows get nulls + an error flag —
    the swallow-and-count convention (`TagCounterMap.java:64-67`)."""

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids = tbl.column("media_id").to_pylist()
        blobs = tbl.column("bytes").to_pylist()
        codecs = tbl.column("codec").to_pylist()
        rates = tbl.column("sample_rate").to_pylist()
        rms, zcr, dur, ok = [], [], [], []
        for blob, codec, rate in zip(blobs, codecs, rates):
            try:
                if codec == "wav":
                    # the WAVE header is authoritative for the rate
                    x, rate = parse_wav(blob)
                else:
                    x = decode_audio(blob, codec)
                rms.append(float(np.sqrt(np.mean(x**2))) if len(x) else 0.0)
                zcr.append(float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0)
                dur.append(len(x) / max(1, rate or 1))
                ok.append(True)
            except (NotImplementedError, ValueError, TypeError):
                # stubbed codec OR malformed payload (odd-length pcm16
                # buffer etc.): swallow-and-flag, never fail the batch
                rms.append(None)
                zcr.append(None)
                dur.append(None)
                ok.append(False)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "rms": pa.array(rms, pa.float64()),
                "zero_crossing_rate": pa.array(zcr, pa.float64()),
                "duration_s": pa.array(dur, pa.float64()),
                "decoded": pa.array(ok, pa.bool_()),
            }
        )


class VideoFrameSampler:
    """Actor-pool stage: video payload → N sampled frames.  Container
    parsing for real codecs is stubbed; the deterministic fake container
    ``fvid`` (a concatenation of length-prefixed encoded images) decodes
    for real, exercising schema/batch plumbing end-to-end."""

    def __init__(self, every_nth: int = 10, max_frames: int = 8):
        self.every_nth = every_nth
        self.max_frames = max_frames

    @staticmethod
    def make_fake_video(frames: list[bytes], fmt: str = "png") -> bytes:
        """Build an 'fvid' container from encoded frames (test helper)."""

        out = [b"FVID", struct.pack("<I", len(frames)), fmt.ljust(4).encode()]
        for f in frames:
            out.append(struct.pack("<I", len(f)))
            out.append(f)
        return b"".join(out)

    @staticmethod
    def avi_encode(frames: list[np.ndarray], fps: int = 25) -> bytes:
        """Minimal UNCOMPRESSED AVI (RIFF 'AVI ', 'DIB ' vids stream,
        24-bit bottom-up BGR '00db' movi chunks) — the public container
        layout from the Microsoft AVI/RIFF spec.  Real-format test/synth
        source for :meth:`_parse_avi`."""

        h, w, _ = frames[0].shape
        stride = (w * 3 + 3) & ~3

        def dib(img: np.ndarray) -> bytes:
            rows = np.zeros((h, stride), np.uint8)
            rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
            return rows.tobytes()

        def chunk(cc: bytes, payload: bytes) -> bytes:
            pad = b"\x00" if len(payload) & 1 else b""
            return cc + struct.pack("<I", len(payload)) + payload + pad

        avih = struct.pack(
            "<10I", 1_000_000 // fps, stride * h * fps, 0, 0x10,
            len(frames), 0, 1, stride * h, w, h,
        ) + b"\x00" * 16
        strh = (b"vids" + b"DIB " + struct.pack("<I", 0) + b"\x00" * 8
                + struct.pack("<3I", 1, fps, 0)
                + struct.pack("<3I", len(frames), stride * h, 0xFFFFFFFF)
                + struct.pack("<I", 0) + b"\x00" * 8)
        strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           stride * h, 0, 0, 0, 0)
        strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
        hdrl = b"hdrl" + chunk(b"avih", avih) + chunk(b"LIST", strl)
        movi = b"movi" + b"".join(chunk(b"00db", dib(f)) for f in frames)
        body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    @staticmethod
    def _iter_riff(blob: bytes, pos: int, end: int):

        while pos + 8 <= end:
            cc = blob[pos : pos + 4]
            (ln,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
            yield cc, blob[pos + 8 : pos + 8 + ln]
            pos += 8 + ln + (ln & 1)

    def _parse_avi(self, blob: bytes):
        """REAL container path: uncompressed 24-bit DIB AVI → frames,
        re-encoded as BMP so the output schema matches the fvid path.
        Only the 'vids' stream's strf is parsed (an audio strl's strf is
        a WAVEFORMAT, not a BITMAPINFOHEADER), frames inside the
        spec-standard interleaved 'LIST rec ' groupings are descended
        into, and the frame period comes from avih.  Compressed codecs
        (mjpg/h264/...) still need external libraries →
        NotImplementedError."""

        w = h = None
        movi = None
        frame_ms = 40.0  # 25 fps fallback when avih is absent
        for cc, payload in self._iter_riff(blob, 12, len(blob)):
            if cc != b"LIST":
                continue
            kind = payload[:4]
            if kind == b"hdrl":
                for cc2, p2 in self._iter_riff(payload, 4, len(payload)):
                    if cc2 == b"avih" and len(p2) >= 4:
                        (us_per_frame,) = struct.unpack("<I", p2[:4])
                        if us_per_frame:
                            frame_ms = us_per_frame / 1000.0
                    if cc2 == b"LIST" and p2[:4] == b"strl":
                        is_vids = False
                        for cc3, p3 in self._iter_riff(p2, 4, len(p2)):
                            if cc3 == b"strh":
                                is_vids = p3[:4] == b"vids"
                            elif cc3 == b"strf" and is_vids and len(p3) >= 40:
                                (_, w, h, _, bits, comp) = struct.unpack(
                                    "<IiiHHI", p3[:20])
                                if comp != 0 or bits != 24:
                                    raise NotImplementedError(
                                        "compressed AVI codecs require external libraries")
            elif kind == b"movi":
                movi = payload
        if w is None or movi is None:
            raise ValueError("not a DIB AVI")
        h = abs(h)
        stride = (w * 3 + 3) & ~3

        def frames(chunks):
            for cc, fb in chunks:
                if cc == b"LIST" and fb[:4] == b"rec ":
                    # interleaved layout: frames grouped in rec records
                    yield from frames(self._iter_riff(fb, 4, len(fb)))
                elif cc.endswith(b"db"):
                    yield fb

        for i, fb in enumerate(frames(self._iter_riff(movi, 4, len(movi)))):
            rows = np.frombuffer(fb[: stride * h], np.uint8).reshape(h, stride)
            rgb = rows[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]
            yield ("bmp", imagecodec.bmp_encode(np.ascontiguousarray(rgb)),
                   int(round(i * frame_ms)))

    def _parse(self, blob: bytes):
        """Yield (fmt, encoded_frame_bytes, ts_ms) per frame."""

        if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
            yield from self._parse_avi(blob)
            return
        if blob[:4] != b"FVID":
            raise NotImplementedError("real video containers require external libraries")
        (n,) = struct.unpack("<I", blob[4:8])
        fmt = blob[8:12].decode().strip()
        pos = 12
        for i in range(n):
            (ln,) = struct.unpack("<I", blob[pos : pos + 4])
            pos += 4
            yield fmt, blob[pos : pos + ln], i * 40  # fvid is 25 fps nominal
            pos += ln

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids = tbl.column("media_id").to_pylist()
        blobs = tbl.column("bytes").to_pylist()
        o_id, o_idx, o_ts, o_fb, o_fmt = [], [], [], [], []
        for mid, blob in zip(ids, blobs):
            try:
                frames = list(self._parse(blob))
            except Exception:
                continue  # stub path (NotImplementedError) or corrupt container; skip the row
            taken = 0
            for i, (fmt, fb, ts) in enumerate(frames):
                if i % self.every_nth:
                    continue
                if taken >= self.max_frames:
                    break
                o_id.append(mid)
                o_idx.append(np.int32(i))
                o_ts.append(np.int64(ts))
                o_fb.append(fb)
                o_fmt.append(fmt)
                taken += 1
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.string()),
                "frame_index": pa.array(o_idx, pa.int32()),
                "ts_ms": pa.array(o_ts, pa.int64()),
                "frame_bytes": pa.array(o_fb, pa.binary()),
                "fmt": pa.array(o_fmt, pa.string()),
            },
            schema=VIDEO_FRAMES_SCHEMA,
        )
