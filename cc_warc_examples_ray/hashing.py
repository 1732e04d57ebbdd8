"""Vectorized xxhash64 (public XXH64 spec) in numpy, plus scalar reference.

The reference engine identifies URLs with ``UUID.nameUUIDFromBytes`` (MD5)
(`/root/reference/src/org/commoncrawl/mklab/analysis/ProcessingService.java:350-355`)
and admits them through a guava BloomFilter keyed on the raw URL string
(`Statistics.java:26`).  This engine standardizes on xxhash64 of the
canonical (SURT) URL form as the 64-bit key for the seen-set shards, exact
dedup and partition routing — computed vectorized over Arrow string columns
so the canonicalize stage stays a zero-copy ``map_batches``.

Implementation is from the public xxHash specification
(github.com/Cyan4973/xxHash — XXH64 algorithm description). No external
xxhash package is available in this environment.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_M = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

uP1 = np.uint64(_P1)
uP2 = np.uint64(_P2)
uP3 = np.uint64(_P3)
uP4 = np.uint64(_P4)
uP5 = np.uint64(_P5)


# ---------------------------------------------------------------------------
# Scalar reference implementation (pure python, used for tests + tiny inputs)
# ---------------------------------------------------------------------------

def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """Scalar XXH64 of ``data`` with ``seed``; returns unsigned 64-bit int."""
    n = len(data)
    pos = 0
    if n >= 32:
        a1 = (seed + _P1 + _P2) & _M
        a2 = (seed + _P2) & _M
        a3 = seed & _M
        a4 = (seed - _P1) & _M
        while pos + 32 <= n:
            a1 = _round(a1, int.from_bytes(data[pos : pos + 8], "little"))
            a2 = _round(a2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            a3 = _round(a3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            a4 = _round(a4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        acc = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M
        for a in (a1, a2, a3, a4):
            acc = _merge_round(acc, a)
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while pos + 8 <= n:
        lane = int.from_bytes(data[pos : pos + 8], "little")
        acc = (_rotl(acc ^ _round(0, lane), 27) * _P1 + _P4) & _M
        pos += 8
    if pos + 4 <= n:
        lane = int.from_bytes(data[pos : pos + 4], "little")
        acc = (_rotl(acc ^ ((lane * _P1) & _M), 23) * _P2 + _P3) & _M
        pos += 4
    while pos < n:
        acc = (_rotl(acc ^ ((data[pos] * _P5) & _M), 11) * _P1) & _M
        pos += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M
    acc ^= acc >> 29
    acc = (acc * _P3) & _M
    acc ^= acc >> 32
    return acc


# ---------------------------------------------------------------------------
# Vectorized implementation over Arrow / object arrays of strings or bytes
# ---------------------------------------------------------------------------

def _vrotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _vround(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _vrotl(acc + lane * uP2, 31) * uP1


def _to_padded_matrix(arr) -> tuple[np.ndarray, np.ndarray]:
    """Byte matrix [n, P] (P % 32 == 0, P >= 32) + lengths, from a pyarrow
    string/binary array (zero-copy from its offsets+data buffers) or any
    iterable of str/bytes."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array):
        if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
            off_dtype = np.int64
        elif pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
            off_dtype = np.int32
        else:
            arr = arr.cast(pa.string())
            off_dtype = np.int32
        n = len(arr)
        bufs = arr.buffers()
        offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=n + 1 + arr.offset)[
            arr.offset :
        ].astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
        starts = offsets[:-1]
    else:
        vals = [
            v.encode() if isinstance(v, str) else (b"" if v is None else bytes(v))
            for v in arr
        ]
        n = len(vals)
        lens = np.array([len(v) for v in vals], dtype=np.int64)
        data = np.frombuffer(b"".join(vals), dtype=np.uint8)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    maxlen = int(lens.max()) if n else 0
    P = max(32, ((maxlen + 31) // 32) * 32)
    mat = np.zeros((n, P), dtype=np.uint8)
    total = int(lens.sum())
    if total:
        rows = np.repeat(np.arange(n), lens)
        flat_starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
        cols = np.arange(total, dtype=np.int64) - np.repeat(flat_starts, lens)
        contiguous = n > 0 and (n == 1 or bool(np.all(starts[1:] - starts[:-1] == lens[:-1])))
        if contiguous:
            flat = data[int(starts[0]) : int(starts[0]) + total]
        else:
            flat = np.concatenate([data[s : s + l] for s, l in zip(starts, lens)])
        mat[rows, cols] = flat
    return mat, lens


# padded-matrix budget: beyond this, pathologically long rows (one 1 MB
# URL in a 100k-row batch would pad EVERY row to 1 MB → ~100 GB) are
# split off to the scalar xxh64 path instead of inflating the matrix.
_MATRIX_BUDGET = 1 << 28
_OUTLIER_LEN = 4096


def xxh64_many(arr, seed: int = 0) -> np.ndarray:
    """Vectorized XXH64 over an array of strings/bytes → uint64 ndarray.

    Accepts a ``pyarrow`` (large_)string/binary Array or ChunkedArray
    (read zero-copy from its buffers), or any iterable of str/bytes.
    Nulls hash as empty strings.  Rows far longer than the batch's 99.9th
    percentile are hashed via the scalar kernel so one outlier cannot
    explode the padded matrix (every row pads to the batch maximum).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array) and len(arr):
        import pyarrow.compute as pc

        probe = arr
        if not (pa.types.is_string(probe.type) or pa.types.is_binary(probe.type)
                or pa.types.is_large_string(probe.type)
                or pa.types.is_large_binary(probe.type)):
            probe = probe.cast(pa.string())
        plens = pc.fill_null(pc.binary_length(probe), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n = len(probe)
        maxlen = int(plens.max())
        pad = max(32, ((maxlen + 31) // 32) * 32)
        if n * pad > _MATRIX_BUDGET and maxlen > _OUTLIER_LEN:
            cutoff = max(_OUTLIER_LEN, int(np.quantile(plens, 0.999)))
            if maxlen > cutoff:
                big_idx = np.flatnonzero(plens > cutoff)
                small_idx = np.flatnonzero(plens <= cutoff)
                res = np.empty(n, dtype=np.uint64)
                res[small_idx] = xxh64_many(
                    probe.take(pa.array(small_idx, pa.int64())), seed
                )
                for i in big_idx:
                    v = probe[int(i)].as_py()
                    b = v.encode() if isinstance(v, str) else (b"" if v is None else bytes(v))
                    res[int(i)] = xxh64(b, seed)
                return res
    mat, lens = _to_padded_matrix(arr)
    n = mat.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    useed = np.uint64(seed & _M)
    lanes64 = mat.view("<u8")  # [n, P//8]
    lanes32 = mat.view("<u4")  # [n, P//4]
    ulens = lens.astype(np.uint64)

    long_mask = lens >= 32
    acc = np.full(n, (seed + _P5) & _M, dtype=np.uint64)
    if long_mask.any():
        a = np.empty((4, n), dtype=np.uint64)
        a[0] = np.uint64((seed + _P1 + _P2) & _M)
        a[1] = np.uint64((seed + _P2) & _M)
        a[2] = useed
        a[3] = np.uint64((seed - _P1) & _M)
        nstripes = (lens // 32).astype(np.int64)
        for s in range(int(nstripes.max())):
            active = nstripes > s
            idx = np.flatnonzero(active)
            base = s * 4
            for k in range(4):
                a[k, idx] = _vround(a[k, idx], lanes64[idx, base + k])
        conv = _vrotl(a[0], 1) + _vrotl(a[1], 7) + _vrotl(a[2], 12) + _vrotl(a[3], 18)
        for k in range(4):
            conv = (conv ^ _vround(np.zeros(n, np.uint64), a[k])) * uP1 + uP4
        acc = np.where(long_mask, conv, acc)
    acc = acc + ulens

    start = (lens // 32) * 32  # tail start byte offset (multiple of 32, or 0)
    rem = lens - start  # 0..31
    n8 = rem // 8  # up to 3 u64 lanes
    rows = np.arange(n)
    for k in range(3):
        idx = np.flatnonzero(n8 > k)
        if len(idx) == 0:
            continue
        lane = lanes64[idx, (start[idx] // 8) + k]
        acc[idx] = _vrotl(acc[idx] ^ _vround(np.zeros(len(idx), np.uint64), lane), 27) * uP1 + uP4
    off4 = start + n8 * 8
    has4 = (rem - n8 * 8) >= 4
    idx = np.flatnonzero(has4)
    if len(idx):
        lane = lanes32[idx, off4[idx] // 4].astype(np.uint64)
        acc[idx] = _vrotl(acc[idx] ^ (lane * uP1), 23) * uP2 + uP3
    offb = off4 + np.where(has4, 4, 0)
    nb = lens - offb  # up to 3 trailing bytes
    for j in range(3):
        idx = np.flatnonzero(nb > j)
        if len(idx) == 0:
            continue
        b = mat[idx, offb[idx] + j].astype(np.uint64)
        acc[idx] = _vrotl(acc[idx] ^ (b * uP5), 11) * uP1

    acc ^= acc >> np.uint64(33)
    acc *= uP2
    acc ^= acc >> np.uint64(29)
    acc *= uP3
    acc ^= acc >> np.uint64(32)
    return acc


def xxh64_int64(arr, seed: int = 0) -> np.ndarray:
    """xxh64_many reinterpreted as int64 (for Arrow int64 columns)."""
    return xxh64_many(arr, seed).view(np.int64)


def combine64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Mix two uint64 hash arrays into one (boost-style hash_combine, 64-bit)."""
    a = a.astype(np.uint64, copy=True)
    b = b.astype(np.uint64, copy=False)
    a ^= b + np.uint64(0x9E3779B97F4A7C15) + (a << np.uint64(6)) + (a >> np.uint64(2))
    return a


def md5_64(s: str) -> int:
    """64-bit md5-derived hash matching DuckDB's ``md5_number_lower``:
    bytes 8..16 of the digest, little-endian, as uint64.  Used only by
    the oracle-checked query variants (md5 is the one 64-bit hash both
    Python and DuckDB SQL can compute identically); xxh64 remains the
    hot-path hash."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")


def md5_64_many(strings, cache: dict | None = None) -> "np.ndarray":
    """Vector md5_64 with an optional memo cache (per-actor token cache)."""
    import hashlib

    out = np.empty(len(strings), dtype=np.uint64)
    if cache is None:
        for i, s in enumerate(strings):
            out[i] = int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
        return out
    for i, s in enumerate(strings):
        v = cache.get(s)
        if v is None:
            v = int.from_bytes(hashlib.md5(s.encode()).digest()[8:], "little")
            if len(cache) < 1_000_000:
                cache[s] = v
        out[i] = v
    return out
