"""Cuckoo filter: the URL-seen set primitive (SURVEY.md §2.3 T1/T2, §2.6 O8).

The reference uses guava ``BloomFilter``s as the URL/domain seen-sets
(`/root/reference/src/org/commoncrawl/mklab/analysis/Statistics.java:26,60`)
with a commented-out 7-way host-hash-sharded pool to reach ~20B keys
(`Statistics.java:37-51`).  This engine generalizes that design: a cuckoo
filter (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT 2014 — public paper) per shard, sharded by host hash across an
actor pool (see :mod:`.frontier_shard`).  Cuckoo over bloom because it
supports deletion, bounded FPP, and compact serialization for the
per-epoch checkpoints the resume path needs.

Layout: ``nbuckets`` (power of two) buckets x 4 slots of ``fp_bits``-bit
fingerprints (0 = empty).  With 32-bit fingerprints FPP ~= 8/2^32 ~ 2e-9,
i.e. ~20 expected false-positive drops across a 10^10-URL frontier and
effectively zero at test scale (SURVEY.md §7 "Hard parts": golden tests
need FPP ~ 0).  Memory: ~5.7 B/key at 70% load → a 10^10-key frontier
fits in ~57 GB across shards (e.g. 64 shards x ~0.9 GB).
"""

from __future__ import annotations

import numpy as np

_MUL = np.uint64(0x5BD1E995)  # index-mixing constant (public MurmurHash2 M)


class CuckooFilter:
    """Single-shard cuckoo filter over uint64 keys.

    ``contains``/membership is fully vectorized; inserts are a tight
    per-key loop only over keys that passed the vectorized
    not-present check (new keys), with standard random-walk eviction.
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int = 1 << 16, fp_bits: int = 32, seed: int = 0):
        nb = 1
        while nb * self.SLOTS < capacity:
            nb <<= 1
        self.nbuckets = nb
        self.fp_bits = fp_bits
        self.fp_dtype = np.uint32 if fp_bits == 32 else np.uint16
        self.fp_mask = np.uint64((1 << fp_bits) - 1)
        self.table = np.zeros((nb, self.SLOTS), dtype=self.fp_dtype)
        self.count = 0
        self._rng = np.random.default_rng(seed)
        self._mask = np.uint64(nb - 1)

    # -- key → (fingerprint, bucket index) ---------------------------------
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = (keys >> np.uint64(64 - self.fp_bits)) & self.fp_mask
        return np.where(fp == 0, np.uint64(1), fp)  # 0 is the empty marker

    def _i1(self, keys: np.ndarray) -> np.ndarray:
        return keys & self._mask

    def _alt(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (i ^ (fp.astype(np.uint64) * _MUL)) & self._mask

    # -- vectorized membership ---------------------------------------------
    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        fp = self._fp(keys).astype(self.fp_dtype)
        i1 = self._i1(keys)
        i2 = self._alt(i1, fp.astype(np.uint64))
        hit1 = (self.table[i1.astype(np.int64)] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2.astype(np.int64)] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    # -- inserts ------------------------------------------------------------
    def _insert_one(self, i: int, fp: int) -> bool:
        table = self.table
        for idx in (i, int(self._alt(np.uint64(i), np.uint64(fp)))):
            row = table[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
        # random-walk eviction
        idx = i if self._rng.random() < 0.5 else int(self._alt(np.uint64(i), np.uint64(fp)))
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(0, self.SLOTS))
            fp, table[idx, slot] = int(table[idx, slot]), fp
            idx = int(self._alt(np.uint64(idx), np.uint64(fp)))
            row = table[idx]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
        raise RuntimeError("cuckoo filter full — grow capacity or add shards")

    def add_if_absent(self, keys: np.ndarray) -> np.ndarray:
        """Insert each key not already present; returns an admit mask.

        First occurrence of a duplicated key within the call is admitted,
        later occurrences are not (the reference's first-seen admit,
        `ProcessingService.java:186-192`).
        """
        keys = np.asarray(keys, dtype=np.uint64)
        present = self.contains(keys)
        admit = np.zeros(len(keys), dtype=bool)
        # first occurrence of each new key within this batch
        new_idx = np.flatnonzero(~present)
        if len(new_idx):
            _, first = np.unique(keys[new_idx], return_index=True)
            winners = new_idx[np.sort(first)]
            fps = self._fp(keys[winners])
            i1s = self._i1(keys[winners])
            for j, i, fp in zip(winners, i1s, fps):
                self._insert_one(int(i), int(fp))
                admit[j] = True
            self.count += len(winners)
        return admit

    def delete(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        out = np.zeros(len(keys), dtype=bool)
        for j, k in enumerate(keys):
            fp = int(self._fp(np.array([k], np.uint64))[0])
            for idx in (int(self._i1(k)), int(self._alt(self._i1(k), np.uint64(fp)))):
                row = self.table[idx]
                hits = np.flatnonzero(row == fp)
                if len(hits):
                    row[hits[0]] = 0
                    self.count -= 1
                    out[j] = True
                    break
        return out

    @property
    def load_factor(self) -> float:
        return self.count / (self.nbuckets * self.SLOTS)

    # -- checkpoint serialization (the resume path) -------------------------
    def to_bytes(self) -> bytes:
        """Full state incl. the eviction RNG: without it, a resumed run's
        random-walk evictions diverge from an uninterrupted run's at high
        load, and later checkpoints stop being bit-identical (membership
        stays correct either way — the invariant is stronger than that)."""
        import pickle
        import struct

        head = struct.pack("<IIQ", self.nbuckets, self.fp_bits, self.count)
        rng_blob = pickle.dumps(self._rng.bit_generator.state, protocol=4)
        return head + self.table.tobytes() + rng_blob

    @classmethod
    def from_bytes(cls, data: bytes, seed: int = 0) -> "CuckooFilter":
        import pickle
        import struct

        nbuckets, fp_bits, count = struct.unpack("<IIQ", data[:16])
        f = cls(capacity=nbuckets * cls.SLOTS, fp_bits=fp_bits, seed=seed)
        assert f.nbuckets == nbuckets
        tbl_len = nbuckets * cls.SLOTS * f.fp_dtype(0).itemsize
        f.table = np.frombuffer(data[16 : 16 + tbl_len], dtype=f.fp_dtype).reshape(
            nbuckets, cls.SLOTS
        ).copy()
        f.count = count
        rest = data[16 + tbl_len :]
        if rest:  # blobs from before the rng field fall back to the seed
            f._rng.bit_generator.state = pickle.loads(rest)
        return f
