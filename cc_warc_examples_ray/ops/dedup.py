"""Deduplication operators for large-scale training-data pipelines.

The reference has exact URL dedup (first-per-key reducer,
`/root/reference/src/org/commoncrawl/mklab/MediaReduce.java:12-19`),
approximate first-seen via bloom admit (`ProcessingService.java:186-192`)
and visual near-dup via a VLAD/PCA + IVFPQ index
(`IndexingManage.java:68-103`).  This module generalizes the family to
text + embeddings + pHash, each as a composition of ``map_batches`` +
one groupby shuffle:

- :func:`exact_dedup` — content-hash partition + per-group min.
- :func:`minhash_lsh_pairs` / :func:`minhash_dedup` — shingle → minhash
  → band buckets (Broder 1997 / LSH banding, public MMDS ch.3).
- :func:`simhash_pairs` — Charikar 2002 simhash over token hashes.
- :func:`ngram_jaccard_verify` — exact Jaccard on candidate pairs.
- :func:`embedding_neardup_pairs` — cosine-similar pairs, bucketed by a
  random-hyperplane LSH sketch so comparisons stay block-local.
- :func:`phash_neardup_groups` — pHash Hamming clustering with explicit
  host-salting (SURVEY.md §2.6 O9, the north-rule upgrade of the
  reference's IVFPQ membership test).

All shuffles move (key, id, sketch) rows only — never payloads.
"""

from __future__ import annotations

import functools
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..hashing import xxh64_many
from ..imagecodec import hamming64

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# broadcast-verify regimes cap the driver/worker-resident candidate data
BROADCAST_TEXT_MAX_BYTES = 256 * 1024 * 1024

# per-worker-process cache of broadcast objects: ray.get deserializes a
# dict on every call, so without this every map_batches task would pay a
# full rebuild of the text map.  Keyed by ObjectRef; bounded to a few
# entries (one live broadcast per verify pipeline).
_BCAST_CACHE: dict = {}


def _bcast_cached(ref):
    import ray

    if ref not in _BCAST_CACHE:
        if len(_BCAST_CACHE) > 4:
            _BCAST_CACHE.clear()
        _BCAST_CACHE[ref] = ray.get(ref)
    return _BCAST_CACHE[ref]

# deterministic 64-bit odd multipliers for the k minhash permutations
def _minhash_params(k: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**63, k, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**63, k, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingles → uint64 hashes (vectorized via xxh64_many)."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.unique(xxh64_many(shingles))


class MinHasher:
    """Stateful map_batches callable: text → k-minhash signature +
    LSH band keys.  Permutation params built once per actor."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 k: int = 64, bands: int = 16, shingle_n: int = 3):
        assert k % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.k, self.bands, self.rows = k, bands, k // bands
        self.a, self.b = _minhash_params(k)
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.shingle_n)
        if len(sh) == 0:
            return np.zeros(self.k, dtype=np.uint64)
        # (a*x + b) for each perm — vectorized [k, n_shingles]
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None])
        return vals.min(axis=1)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        """Emit (id, band, band_hash) rows — exploded for the bucket groupby."""
        texts = tbl.column(self.text_col).to_pylist()
        ids = tbl.column(self.id_col).to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = np.empty((n, self.k), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self.signature(t or "")
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int64), n)
        out_ids = np.tile(ids, self.bands)
        bh = np.empty(n * self.bands, dtype=np.uint64)
        for b in range(self.bands):
            seg = sigs[:, b * self.rows : (b + 1) * self.rows]
            # mix the band's rows into one 64-bit bucket key
            acc = seg[:, 0].copy()
            for j in range(1, self.rows):
                acc ^= seg[:, j] + np.uint64(0x9E3779B97F4A7C15) + (acc << np.uint64(6)) + (acc >> np.uint64(2))
            bh[b * n : (b + 1) * n] = acc
        return pa.table(
            {
                self.id_col: pa.array(out_ids),
                "band": pa.array(band_ids),
                "band_hash": pa.array(bh.view(np.int64)),
            }
        )


def _typed_empty(id_dtype, extra: dict | None = None) -> pd.DataFrame:
    """Schema-stable empty pair frame (object-dtype empties make Ray's
    streaming executor emit block-schema-mismatch warnings)."""
    cols = {"id_a": pd.Series(dtype=id_dtype), "id_b": pd.Series(dtype=id_dtype)}
    for name, dt in (extra or {}).items():
        cols[name] = pd.Series(dtype=dt)
    return pd.DataFrame(cols)


def distinct_pairs(cand: rd.Dataset, extra_cols: tuple[str, ...] = ()) -> rd.Dataset:
    """Distinct (id_a, id_b) rows: per-batch grouped partial + ONE global
    grouped aggregate — the exact_dedup pattern.  Never one pandas group
    per pair (death by group overhead at corpus scale).  ``extra_cols``
    are pair-constant payloads (hamming, cosine) carried via Min.  The
    global pass is :func:`relational.grouped_min` — pair keys are
    high-cardinality at corpus scale, where Ray's sort-based aggregate
    degrades (~50 s / 3.3M rows measured)."""
    from .relational import grouped_min

    return grouped_min(cand, ["id_a", "id_b"], list(extra_cols))


def _pairs_from_buckets(id_col: str):
    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g[id_col].to_numpy())
        ids = np.unique(ids)
        if len(ids) < 2:
            return _typed_empty(g[id_col].dtype)
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    return pairs


def grouped_bucket_pairs(exploded: rd.Dataset, keys: list[str], per_bucket_fn,
                         out_schema: pa.Schema,
                         num_partitions: int = 32) -> rd.Dataset:
    """Run ``per_bucket_fn`` over every distinct bucket of ``keys``
    WITHOUT one pandas group per bucket: buckets are hash-partitioned
    into ``num_partitions`` groups (one shuffle, bounded group count),
    and each group's kernel walks its bucket boundaries with numpy —
    per-bucket Python work only happens for buckets that can pair
    (>= 2 rows), which near-dup explosion makes rare by construction.
    Runs in pyarrow format with an explicit ``out_schema`` so every
    emitted block (including empty partitions) is a schema-stable Arrow
    block — empty blocks bypass map UDFs, so a pandas empty here would
    leak through downstream Arrow stages and crash unions."""
    from .relational import make_part_assigner

    add_part = make_part_assigner(keys, num_partitions)

    def kern(gt: pa.Table) -> pa.Table:
        g = gt.to_pandas()
        outs = []
        if len(g) >= 2:
            g = g.sort_values(keys, kind="mergesort")
            karr = g[keys].to_numpy()
            change = (karr[1:] != karr[:-1]).any(axis=1)
            starts = np.concatenate([[0], np.flatnonzero(change) + 1, [len(g)]])
            for s0, s1 in zip(starts[:-1], starts[1:]):
                if s1 - s0 < 2:
                    continue
                sub = per_bucket_fn(g.iloc[s0:s1])
                if len(sub):
                    outs.append(sub)
        if not outs:
            return out_schema.empty_table()
        res = pd.concat(outs)
        return pa.Table.from_pandas(
            res, schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)  # pandas blob makes schemas unhashable

    return exploded.map_batches(add_part, batch_format="pyarrow").groupby(
        "_part"
    ).map_groups(kern, batch_format="pyarrow")


def minhash_lsh_pairs(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 64, bands: int = 16, shingle_n: int = 3) -> rd.Dataset:
    """Candidate near-dup pairs: any two docs sharing an LSH band bucket.
    Pair explosion is bounded per bucket; hot buckets indicate a
    degenerate shingle (e.g. empty text) and should be pre-filtered."""
    # instance-based task pool: the hasher state (permutation params) is
    # tiny — serialized once with the task closure; an actor pool's
    # spin-up latency would dominate at small inputs for zero benefit.
    exploded = ds.map_batches(
        MinHasher(text_col=text_col, id_col=id_col, k=k, bands=bands,
                  shingle_n=shingle_n),
        batch_format="pyarrow",
    )
    from .relational import _arrow_types

    idt = _arrow_types(ds.schema()).get(id_col, pa.string())
    cand = grouped_bucket_pairs(
        exploded, ["band", "band_hash"], _pairs_from_buckets(id_col),
        out_schema=pa.schema([("id_a", idt), ("id_b", idt)]),
    )
    # distinct pairs (a pair can collide in several bands)
    return distinct_pairs(cand)


# all-shingles-empty docs share this sentinel token so they can still
# pair (their exact Jaccard is defined as 1.0 by _jaccard_rows, matching
# the minhash oracle's empty-doc clause)
_EMPTY_SHINGLE_SENTINEL = np.uint64(0xE3B0C44298FC1C14)


def _hot_shingles(ds: rd.Dataset, text_col: str, shingle_n: int,
                  hot_min: int, max_hot: int, sample: int = 2000,
                  seed: int = 13) -> tuple[np.ndarray, np.ndarray]:
    """Estimated document frequencies for the Zipf HEAD of the shingle
    vocabulary, from a bounded seeded Bernoulli doc sample (driver-safe
    at any corpus size — the broadcast is the head only, never the
    vocabulary, and no shingle shuffle happens at all).

    The head only steers the PPJoin prefix ORDER; any consistent global
    order is exact, so a sampled (imperfect) head can only change the
    candidate count, never the verified result.  A full-corpus grouped
    count was 4.3 s of a 7.6 s candidate stage at sf0.1 for identical
    output.  hot_min scales by the sample fraction (floor 2: a repeat
    within a small sample already marks a globally common shingle)."""
    n = ds.count()
    if n == 0:
        return np.array([], np.int64), np.array([], np.int64)
    sub = ds.select_columns([text_col])
    frac = 1.0
    if n > sample:
        frac = min(1.0, 1.2 * sample / n)
        sub = sub.random_sample(frac, seed=seed)

    # shingle the sample WHERE IT LIVES: per-batch (shingle, count)
    # partials — the driver only ever folds tiny unique/count arrays
    # (serially shingling the sample on the driver was ~3 s of a ~15 s
    # sf0.1 join; the fold is np.unique + add.reduceat, microseconds)
    def partial(tbl: pa.Table) -> pa.Table:
        texts = tbl.column(text_col).to_pylist()
        hs = [h for h in (_shingles_cached(t or "", shingle_n) for t in texts)
              if len(h)]
        if not hs:
            return pa.table({"sh": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        u, c = np.unique(np.concatenate(hs).view(np.int64), return_counts=True)
        return pa.table({"sh": pa.array(u), "c": pa.array(c.astype(np.int64))})

    parts = sub.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts) or "sh" not in parts.columns:
        return np.array([], np.int64), np.array([], np.int64)
    all_u = parts["sh"].to_numpy()
    all_c = parts["c"].to_numpy()
    if not len(all_u):
        return np.array([], np.int64), np.array([], np.int64)
    order0 = np.argsort(all_u, kind="stable")
    su, sc = all_u[order0], all_c[order0]
    uniq, starts = np.unique(su, return_index=True)
    cnt = np.add.reduceat(sc, starts)
    cutoff = max(2, int(round(hot_min * frac)))
    keep = cnt >= cutoff
    uniq, cnt = uniq[keep], cnt[keep]
    if len(uniq) > max_hot:
        top = np.argpartition(-cnt, max_hot - 1)[:max_hot]
        uniq, cnt = uniq[top], cnt[top]
    order = np.argsort(uniq)
    return uniq[order], cnt[order].astype(np.int64)


def jaccard_prefix_pairs(ds: rd.Dataset, text_col: str = "text",
                         id_col: str = "doc_id", threshold: float = 0.7,
                         shingle_n: int = 3, hot_min: int = 8,
                         max_hot: int = 1 << 17) -> rd.Dataset:
    """EXACT candidate generation for an n-gram Jaccard similarity join
    via prefix filtering (Chaudhuri et al. 2006 SSJoin; Xiao et al. 2008
    PPJoin) — the deterministic sibling of :func:`minhash_lsh_pairs`
    (LSH recall is probabilistic; this path provably has no false
    negatives).

    Lemma: J(A,B) >= t implies |A∩B| >= t·|A∪B| >= ceil(t·max(|A|,|B|)),
    and two sets with overlap >= α must collide within each side's first
    ``|S| - α + 1`` elements under ANY common total order.  Using the
    per-set bound α_S = ceil(t·|S|) <= ceil(t·max) only lengthens the
    prefix, so correctness holds.  Only prefix shingles enter the
    inverted index — at t=0.8 ~20% of each doc's shingles.

    The total order is PPJoin's rarest-first: (global doc-freq if the
    shingle is in the broadcast hot head else 0, hash) — boilerplate
    shingles shared by thousands of docs sort LAST and fall out of every
    prefix, which is what bounds bucket fan-out (hash order alone left
    hot shingles in ~30% of prefixes and exploded candidates ~1000x the
    true pair count on the synthetic corpus).  A bucket pair must also
    pass the size filter min(|A|,|B|) >= t·max(|A|,|B|) (J <= min/max).
    Shuffle moves (shingle_hash, id, set_size) rows only."""
    import math

    import ray

    hot_hash, hot_freq = _hot_shingles(ds, text_col, shingle_n, hot_min, max_hot)
    hot_ref = ray.put((hot_hash, hot_freq))

    def explode(tbl: pa.Table) -> pa.Table:
        hh, hf = _bcast_cached(hot_ref)
        texts = tbl.column(text_col).to_pylist()
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        hs, out_idx, out_sz, out_pos = [], [], [], []
        for i, t in enumerate(texts):
            sh = _shingles_cached(t or "", shingle_n)
            if len(sh) == 0:
                hs.append(np.array([_EMPTY_SHINGLE_SENTINEL], dtype=np.uint64))
                out_idx.append(np.array([i]))
                out_sz.append(np.array([0], dtype=np.int64))
                out_pos.append(np.array([0], dtype=np.int64))
                continue
            # -1e-9: float fuzz must never push an exact t·n UP a step
            # (a too-large α shortens the prefix and loses pairs)
            alpha = int(math.ceil(threshold * len(sh) - 1e-9))
            plen = len(sh) - alpha + 1
            shi = sh.view(np.int64)
            ranks = np.zeros(len(shi), dtype=np.int64)
            if len(hh):
                pos = np.minimum(np.searchsorted(hh, shi), len(hh) - 1)
                hit = hh[pos] == shi
                ranks[hit] = hf[pos[hit]]
            order = np.lexsort((shi, ranks))
            hs.append(sh[order[:plen]])
            out_idx.append(np.full(plen, i))
            out_sz.append(np.full(plen, len(sh), dtype=np.int64))
            out_pos.append(np.arange(plen, dtype=np.int64))
        if not hs:
            return pa.table({
                "shingle": pa.array([], pa.int64()),
                id_col: pa.array([], tbl.schema.field(id_col).type),
                "sz": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            })
        flat = np.concatenate(hs).view(np.int64)
        take = np.concatenate(out_idx)
        return pa.table({
            "shingle": pa.array(flat),
            id_col: pa.array(ids[take]),
            "sz": pa.array(np.concatenate(out_sz)),
            "pos": pa.array(np.concatenate(out_pos)),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g[id_col].to_numpy())
        ids = g[id_col].to_numpy()[order]
        szs = g["sz"].to_numpy()[order]
        poss = g["pos"].to_numpy()[order]
        ia, ib = np.triu_indices(len(ids), k=1)
        sa, sb = szs[ia], szs[ib]
        # size filter: J(A,B) <= min/max, so min < t·max can never verify
        keep = np.minimum(sa, sb) >= threshold * np.maximum(sa, sb) - 1e-9
        # duplicate doc_id values in the corpus must not emit (x, x)
        # self-pairs (they'd verify at J=1.0 and pollute the join)
        keep &= ids[ia] != ids[ib]
        # positional filter (PPJoin): the shared token at ordered-set
        # positions (pa, pb) caps the overlap at 1 + min(remaining);
        # J >= t needs overlap >= t/(1+t)·(|A|+|B|).  Exact: a
        # qualifying pair's SMALLEST common token always passes (all
        # other common tokens sort after it on both sides).
        alpha = np.ceil(threshold / (1.0 + threshold) * (sa + sb) - 1e-9)
        ubound = 1 + np.minimum(sa - poss[ia] - 1, sb - poss[ib] - 1)
        keep &= ubound >= alpha
        if not keep.any():
            return _typed_empty(g[id_col].dtype)
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]]})

    from .relational import _arrow_types

    idt = _arrow_types(ds.schema()).get(id_col, pa.string())
    exploded = ds.map_batches(explode, batch_format="pyarrow")
    cand = grouped_bucket_pairs(
        exploded, ["shingle"], bucket_pairs,
        out_schema=pa.schema([("id_a", idt), ("id_b", idt)]),
    )
    # a pair can share several prefix shingles
    return distinct_pairs(cand)


def jaccard_join(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id",
                 threshold: float = 0.7, shingle_n: int = 3) -> rd.Dataset:
    """Exact n-gram Jaccard similarity self-join: prefix-filtered
    candidates → exact shingle-Jaccard verify.  Returns every pair with
    J >= threshold (id_a < id_b, jaccard) — exhaustive, unlike the
    MinHash path whose recall is probabilistic.  Duplicate ``id_col``
    values are tolerated when they carry the SAME text (no self-pairs
    emitted); conflicting texts under one id are out of contract — an
    id-keyed pair output cannot represent them.

    The corpus is materialized once up front: four downstream consumers
    (count, freq sample, prefix explode, verify prune) would otherwise
    each re-execute the source read; object-store blocks spill, so this
    holds at corpus scale."""
    ds = ds.materialize()
    pairs = jaccard_prefix_pairs(ds, text_col=text_col, id_col=id_col,
                                 threshold=threshold, shingle_n=shingle_n)
    return ngram_jaccard_verify(pairs, ds, threshold=threshold,
                                shingle_n=shingle_n, text_col=text_col,
                                id_col=id_col)


# per-process shingle memo: a hot document appears in MANY candidate
# pairs, and re-hashing its text per pair dominates verify wall time.
# BYTE-bounded (not entry-bounded) and keyed by text hash so neither the
# texts themselves nor an unbounded array set is pinned — an
# entry-bounded lru_cache of 1 MB documents would hold GBs per worker.
_SHINGLE_CACHE: dict = {}
_SHINGLE_CACHE_BYTES = [0]
_SHINGLE_CACHE_MAX_BYTES = 64 * 1024 * 1024


def _shingles_cached(text: str, n: int) -> np.ndarray:
    key = (xxh64_many([text])[0].item(), n, len(text))
    hit = _SHINGLE_CACHE.get(key)
    if hit is not None:
        return hit
    arr = shingle_hashes(text, n)
    if _SHINGLE_CACHE_BYTES[0] + arr.nbytes > _SHINGLE_CACHE_MAX_BYTES:
        _SHINGLE_CACHE.clear()
        _SHINGLE_CACHE_BYTES[0] = 0
    _SHINGLE_CACHE[key] = arr
    _SHINGLE_CACHE_BYTES[0] += arr.nbytes
    return arr


def _jaccard_rows(tbl: pa.Table, shingle_n: int) -> pa.Table:
    """Exact shingle Jaccard per (text_a, text_b) row — block-local.
    Shingles memoize by DOC ID within the batch: a hot doc appears in
    many pairs, and even a cache hit in ``_shingles_cached`` pays a
    full-text hash for the key — the id dict lookup does not."""
    a = tbl.column("text_a").to_pylist()
    b = tbl.column("text_b").to_pylist()
    ia = tbl.column("id_a").to_pylist()
    ib = tbl.column("id_b").to_pylist()
    memo: dict = {}

    def sh(doc_id, text):
        r = memo.get(doc_id)
        if r is None:
            r = memo[doc_id] = _shingles_cached(text or "", shingle_n)
        return r

    sims = np.zeros(len(a))
    for i, (x, y) in enumerate(zip(a, b)):
        sa = sh(ia[i], x)
        sb = sh(ib[i], y)
        if len(sa) == 0 and len(sb) == 0:
            sims[i] = 1.0
        else:
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            sims[i] = inter / union if union else 0.0
    return tbl.drop_columns(["text_a", "text_b"]).append_column(
        "jaccard", pa.array(sims, pa.float64())
    )


def ngram_jaccard_verify(pairs: rd.Dataset, docs: rd.Dataset,
                         threshold: float = 0.8, shingle_n: int = 3,
                         text_col: str = "text", id_col: str = "doc_id",
                         num_buckets: int = 8,
                         broadcast_pairs: int = 100_000) -> rd.Dataset:
    """Verify candidate pairs with exact shingle Jaccard.  The corpus is
    never broadcast — verification scales with the PAIR list, not the
    corpus (the 100 TB shape).  The docs side is first pruned with a
    broadcast SEMI-join on the pair-id set (ids only — tiny relative to
    texts by construction: it is the candidate list).  Two regimes on
    the pair count:

    - ``<= broadcast_pairs``: the pruned candidate texts (O(|pairs|)
      rows) are shipped once via ``ray.put`` and pairs verify in a
      single map_batches — no shuffle.
    - larger: two bucketed hash joins attach text_a/text_b and Jaccard
      runs block-locally."""
    import pyarrow.compute as pc
    import ray

    from .relational import hash_join

    pairs = pairs.materialize()  # consumed multiple times (ids + verify)
    if pairs.count() == 0:
        # empty candidate list: to_pandas() of an empty materialized
        # dataset drops its columns, so exit with a TYPED empty result
        # (id type from the docs side — the pairs side has no schema)
        from .relational import _arrow_types

        idt_ = _arrow_types(docs.schema()).get(id_col, pa.string())
        sch = pa.schema([("id_a", idt_), ("id_b", idt_), ("jaccard", pa.float64())])
        return rd.from_arrow(sch.empty_table())
    idt = pairs.select_columns(["id_a", "id_b"]).to_pandas()
    need = ray.put(pa.array(sorted(set(idt["id_a"]) | set(idt["id_b"]))))

    # one corpus scan, shared by both regimes: the pruned candidate
    # texts live in the object store (spillable), and size_bytes() gives
    # the byte bound the count gate alone cannot (100k pairs of 1 MB
    # docs would be 200 GB — driver-fatal to collect, fine to spill).
    # Task pool + per-process broadcast cache, NOT an actor pool: the id
    # set deserializes once per worker via _bcast_cached, and a pool's
    # spin-up latency would dominate this one-scan stage.
    def prune(t: pa.Table) -> pa.Table:
        keys = _bcast_cached(need)
        return t.select([id_col, text_col]).filter(
            pc.is_in(t.column(id_col), value_set=keys)
        )

    docs_small = docs.map_batches(prune, batch_format="pyarrow").materialize()

    if docs_small.count() == 0:
        # no candidate id matched docs: inner-join semantics → no pairs
        # (an empty materialized dataset has no schema to join on)
        from .relational import _arrow_types

        sch = pa.schema(list(_arrow_types(pairs.schema()).items())
                        + [("jaccard", pa.float64())])
        return rd.from_arrow(sch.empty_table())

    use_broadcast = (len(idt) <= broadcast_pairs
                     and docs_small.size_bytes() <= BROADCAST_TEXT_MAX_BYTES)
    if use_broadcast:
        # shingle each pruned doc ONCE, distributed, and broadcast the
        # id→shingle-array map: verification becomes dict lookups +
        # intersect1d, with no per-pair text re-hash (keying the shingle
        # memo by full-text hash cost ~50 µs/pair — the dominant verify
        # term at sf0.1).  Shingle bytes ≈ 8 × words ≈ text bytes, so
        # the size gate above still bounds the broadcast.
        def to_shingles(t: pa.Table) -> pa.Table:
            texts = t.column(text_col).to_pylist()
            arrs = [shingle_hashes(x or "", shingle_n).view(np.int64) for x in texts]
            flat = np.concatenate(arrs) if arrs else np.array([], np.int64)
            offsets = np.concatenate(
                [[0], np.cumsum([len(a) for a in arrs], dtype=np.int64)]
            ).astype(np.int32)
            return pa.table({
                id_col: t.column(id_col),
                "sh": pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat)),
            })

        sdf = docs_small.map_batches(to_shingles, batch_format="pyarrow").to_pandas()
        # a fully-pruned (empty) result may drop its columns in pandas.
        # PRECONDITION (both regimes): a doc_id maps to ONE text —
        # duplicate (id, text) rows are fine (identical shingles), but
        # conflicting texts under one id are unrepresentable in an
        # id-keyed pair output and each regime would pick arbitrarily.
        smap: dict = {}
        if id_col in sdf.columns:
            for k, v in zip(sdf[id_col], sdf["sh"]):
                if k not in smap:
                    smap[k] = np.asarray(v, dtype=np.int64).view(np.uint64)
        smap_ref = ray.put(smap)

        # plain task (not an actor pool): the pair list is small here by
        # the regime gate, so spin-up would dominate; the shingle map is
        # deserialized once per worker process via _bcast_cached.
        def attach_and_verify(tbl: pa.Table) -> pa.Table:
            smap = _bcast_cached(smap_ref)
            a_ids = tbl.column("id_a").to_pylist()
            b_ids = tbl.column("id_b").to_pylist()
            # inner-join semantics: pairs whose ids are absent from docs
            # are DROPPED (the join regime would never emit them)
            keep = [i for i, (a, b) in enumerate(zip(a_ids, b_ids))
                    if a in smap and b in smap]
            if len(keep) < tbl.num_rows:
                tbl = tbl.take(pa.array(keep, pa.int64()))
                a_ids = [a_ids[i] for i in keep]
                b_ids = [b_ids[i] for i in keep]
            sims = np.zeros(len(a_ids))
            for i, (x, y) in enumerate(zip(a_ids, b_ids)):
                sa, sb = smap[x], smap[y]
                if len(sa) == 0 and len(sb) == 0:
                    sims[i] = 1.0
                else:
                    inter = len(np.intersect1d(sa, sb, assume_unique=True))
                    union = len(sa) + len(sb) - inter
                    sims[i] = inter / union if union else 0.0
            return tbl.append_column("jaccard", pa.array(sims, pa.float64()))

        verified = pairs.map_batches(attach_and_verify, batch_format="pyarrow")
        return verified.filter(expr=f"jaccard >= {threshold}")

    def rename(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns([f"id_{side}", f"text_{side}"])

        return fn

    docs_a = docs_small.map_batches(rename("a"), batch_format="pyarrow")
    docs_b = docs_small.map_batches(rename("b"), batch_format="pyarrow")
    witha = hash_join(pairs, docs_a, "id_a", num_buckets=num_buckets)
    withb = hash_join(witha, docs_b, "id_b", num_buckets=num_buckets)
    verified = withb.map_batches(
        lambda t: _jaccard_rows(t, shingle_n), batch_format="pyarrow"
    )
    return verified.filter(expr=f"jaccard >= {threshold}")


def minhash_dedup(ds: rd.Dataset, docs: rd.Dataset | None = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  threshold: float = 0.8) -> pd.DataFrame:
    """Full near-dup pipeline → pandas (id, group) assignment: LSH pairs →
    Jaccard verify (rejoin, no corpus broadcast) → connected components.
    Components run driver-side (union-find) over the verified pair list,
    which is tiny relative to the corpus; at extreme scale use
    :func:`pair_components` (distributed min-label propagation)."""
    if docs is None:
        docs = ds
    pairs = minhash_lsh_pairs(ds, text_col=text_col, id_col=id_col)
    ver = ngram_jaccard_verify(
        pairs, docs, threshold=threshold, text_col=text_col, id_col=id_col
    )
    good = ver.to_pandas()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    if good.empty:  # Dataset.to_pandas() drops columns when 0 rows
        # match the non-empty path's id dtype (the verify Dataset keeps
        # its typed Arrow schema even at 0 rows — pandas does not)
        from .relational import _arrow_types

        idt = _arrow_types(ver.schema()).get("id_a", pa.string())
        dt = idt.to_pandas_dtype()
        return pd.DataFrame({id_col: pd.Series(dtype=dt),
                             "group_id": pd.Series(dtype=dt)})
    for x, y in zip(good["id_a"], good["id_b"]):
        parent.setdefault(x, x)
        parent.setdefault(y, y)
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    rows = [(x, find(x)) for x in parent]
    return pd.DataFrame(rows, columns=[id_col, "group_id"]).sort_values(id_col)


# ---------------------------------------------------------------------------
# SimHash (Charikar 2002)
# ---------------------------------------------------------------------------

class SimHasher:
    """``token_hash``: "xxh64" (default, hot path) or "md5" — the md5
    variant matches DuckDB's ``md5_number_lower`` so the SQL oracle can
    recompute identical simhashes (see SQL_SIMHASH_PAIRS)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 token_hash: str = "xxh64"):
        self.text_col, self.id_col = text_col, id_col
        self.token_hash = token_hash
        self._md5_cache: dict = {}

    def _hash_tokens(self, toks: list[str]) -> np.ndarray:
        if self.token_hash == "md5":
            from ..hashing import md5_64_many

            return md5_64_many(toks, cache=self._md5_cache)
        return xxh64_many(toks)

    def simhash(self, text: str) -> np.uint64:
        """Single-doc convenience wrapper over the batch kernel."""
        return np.uint64(
            self._codes([_TOKEN_RE.findall((text or "").lower())])[0]
        )

    def _codes(self, toks_per_doc: list[list[str]]) -> np.ndarray:
        """Vectorized Charikar simhash across the WHOLE batch: hash every
        token once, unpack all bits in one kernel, segment-sum per doc —
        no per-doc 64-iteration Python loop."""
        n = len(toks_per_doc)
        counts = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        codes = np.zeros(n, dtype=np.uint64)
        all_toks = [tok for toks in toks_per_doc for tok in toks]
        if not all_toks:
            return codes
        hs = self._hash_tokens(all_toks)  # uint64 [T]
        # little-endian byte view + bitorder="little" → column b == (h>>b)&1
        bits = np.unpackbits(
            hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int64)  # [T, 64]
        nz = counts > 0
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        seg_sums = np.add.reduceat(bits, offsets[nz], axis=0)  # [n_nz, 64]
        maj = (2 * seg_sums) > counts[nz, None]  # bit set iff majority
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        codes[nz] = (maj.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return codes

    def __call__(self, tbl: pa.Table) -> pa.Table:
        toks = [
            _TOKEN_RE.findall((t or "").lower())
            for t in tbl.column(self.text_col).to_pylist()
        ]
        codes = self._codes(toks)
        return pa.table(
            {
                self.id_col: tbl.column(self.id_col),
                "simhash": pa.array(codes.view(np.int64)),
            }
        )


def simhash_pairs(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, token_hash: str = "xxh64") -> rd.Dataset:
    """Near-dup pairs by simhash: 4×16-bit block keys (pigeonhole — any
    pair within Hamming<=3 of 64 bits shares at least one exact 16-bit
    block), groupby block, verify Hamming within bucket."""
    sigs = ds.map_batches(
        SimHasher(text_col=text_col, id_col=id_col, token_hash=token_hash),
        batch_format="pyarrow",
    )

    def explode(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        sh = tbl.column("simhash").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        n = len(ids)
        blocks = np.repeat(np.arange(4, dtype=np.int64), n)
        keys = np.empty(4 * n, dtype=np.uint64)
        for b in range(4):
            keys[b * n : (b + 1) * n] = (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        return pa.table(
            {
                id_col: pa.array(np.tile(ids, 4)),
                "simhash": pa.array(np.tile(sh.view(np.int64), 4)),
                "block": pa.array(blocks),
                "block_key": pa.array(keys.view(np.int64)),
            }
        )

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        if len(ids) < 2:
            return _typed_empty(g[id_col].dtype, {"hamming": "int64"})
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = hamming64(sh[ia], sh[ib])
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "hamming": ham[keep].astype(np.int64)})

    from .relational import _arrow_types

    idt = _arrow_types(ds.schema()).get(id_col, pa.string())
    cand = grouped_bucket_pairs(
        exploded, ["block", "block_key"], pairs,
        out_schema=pa.schema([("id_a", idt), ("id_b", idt), ("hamming", pa.int64())]),
    )
    return distinct_pairs(cand, extra_cols=("hamming",))


def pair_components(pairs: rd.Dataset, max_iters: int = 100,
                    finish_cutoff: int = 2_000_000) -> rd.Dataset:
    """Connected components over (id_a, id_b) pair edges.

    Two regimes, gated on the PAIR count (not the corpus size — the pair
    list is the output of a bucketed LSH pass, orders of magnitude
    smaller than the corpus):

    - ``<= finish_cutoff`` pairs (~32 MB of two ids at the 2M default):
      exact driver union-find with min-id roots.  One ``count()`` + one
      two-column collect replaces D all-to-all propagation rounds.
    - larger: distributed **large-star/small-star alternation**
      (:func:`_star_components`, the default — 5.3x faster than label
      propagation on the 1M-edge benchmark graph) or min-label
      propagation with pointer doubling (``CC_ENGINE=labelprop``,
      :func:`_labelprop_components`).  Both raise rather than return
      wrong labels if ``max_iters`` is exhausted.

    Both return (node, group_id) with group_id = min node id of the
    component (deterministic, matches the SQL transitive-closure
    oracle)."""
    pairs = pairs.materialize()
    if pairs.count() <= finish_cutoff:
        from .relational import _arrow_types

        idt = _arrow_types(pairs.schema()).get("id_a", pa.string())
        df = pairs.select_columns(["id_a", "id_b"]).to_pandas()
        parent: dict = {}

        def find(x):
            r = x
            while parent.setdefault(r, r) != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        # an empty collect may drop its columns in pandas
        ab = zip(df["id_a"], df["id_b"]) if "id_a" in df.columns else ()
        for a, b in ab:
            ra, rb = find(a), find(b)
            if ra != rb:
                # min-id root keeps group_id = component min deterministically
                lo, hi = (ra, rb) if ra <= rb else (rb, ra)
                parent[hi] = lo
        nodes = sorted(parent)
        groups = [find(n) for n in nodes]
        return rd.from_arrow(pa.table({"node": pa.array(nodes, idt),
                                       "group_id": pa.array(groups, idt)}))

    import os

    if os.environ.get("CC_ENGINE", "star") != "labelprop":
        return _star_components(pairs, max_iters)
    return _labelprop_components(pairs, max_iters)


def _star_components(pairs: rd.Dataset, max_iters: int,
                     num_partitions: int = 32) -> rd.Dataset:
    """Distributed components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): the EDGE SET itself is rewritten each phase —

    - large-star (keyed on every endpoint ``u``, symmetric): connect
      each neighbor ``v > u`` to ``m = min(N(u) ∪ {u})``;
    - small-star (keyed on the LARGER endpoint): connect every smaller
      neighbor and ``u`` itself to the group min.

    Each phase is ONE hash-partition shuffle (route by ``u``) + a
    vectorized per-partition kernel (lexsort → group heads → masked
    emits) — no joins, and the edge set contracts toward min-rooted
    stars, so later rounds move less data (label propagation pays
    join + grouped-min + doubling join + grouped-min per round on a
    CONSTANT-size edge list).  Converged when BOTH phases leave the
    (count, order-independent checksum) signature unchanged — the
    paper's "no change in either phase" criterion.  Output matches the
    union-find path: (node, group_id = component min)."""
    from .relational import _arrow_types, grouped_min, make_part_assigner

    idt = _arrow_types(pairs.schema()).get("id_a", pa.string())

    def canonical(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        a, b = t.column("id_a"), t.column("id_b")
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        keep = pc.not_equal(lo, hi)  # self-pairs carry no structure
        return pa.table({"lo": lo.combine_chunks(), "hi": hi.combine_chunks()}).filter(keep)

    def self_singletons(t: pa.Table) -> pa.Table:
        # a node whose ONLY edge is (x, x) must still appear in the
        # output as its own singleton component (union-find and
        # labelprop both keep it; the star iteration drops self-pairs)
        import pyarrow.compute as pc

        a, b = t.column("id_a"), t.column("id_b")
        n = pa.table({"node": a.combine_chunks()}).filter(pc.equal(a, b))
        node = n.column("node").combine_chunks()
        return pa.table({"node": node, "group_id": node})

    add_part = make_part_assigner(["u"], num_partitions)

    def route(large: bool):
        def fn(t: pa.Table) -> pa.Table:
            lo, hi = t.column("lo").combine_chunks(), t.column("hi").combine_chunks()
            if large:  # adjacency of every endpoint
                u = pa.concat_arrays(lo.chunks + hi.chunks) if isinstance(lo, pa.ChunkedArray) else pa.concat_arrays([lo, hi])
                v = pa.concat_arrays(hi.chunks + lo.chunks) if isinstance(hi, pa.ChunkedArray) else pa.concat_arrays([hi, lo])
            else:  # keyed on the larger endpoint
                u, v = hi, lo
            return add_part(pa.table({"u": u, "v": v}))
        return fn

    def star_kernel(large: bool):
        def emit(gt: pa.Table) -> pa.Table:
            if gt.num_rows == 0:
                return pa.table({"lo": pa.array([], idt), "hi": pa.array([], idt)})
            u = gt.column("u").to_numpy(zero_copy_only=False)
            v = gt.column("v").to_numpy(zero_copy_only=False)
            if u.dtype == object:  # C-level string compares
                u, v = u.astype("U"), v.astype("U")
            order = np.lexsort((v, u))  # groups by u, v ascending inside
            us, vs = u[order], v[order]
            starts = np.concatenate([[0], np.flatnonzero(us[1:] != us[:-1]) + 1])
            counts = np.diff(np.append(starts, len(us)))
            heads, minv = us[starts], vs[starts]
            if large:
                # elementwise min via where: np.minimum has no ufunc
                # loop for numpy unicode dtypes
                m = np.where(minv <= heads, minv, heads)  # min(N(u) ∪ {u})
                rep_m, rep_u = np.repeat(m, counts), np.repeat(heads, counts)
                mask = vs > rep_u  # only larger neighbors re-point
                lo_out, hi_out = rep_m[mask], vs[mask]  # m <= u < v
            else:
                m = minv  # every v < u, so min(Γ+) = min(N)
                rep_m = np.repeat(m, counts)
                mask = vs != rep_m
                lo_out = np.concatenate([rep_m[mask], m])
                hi_out = np.concatenate([vs[mask], heads])  # + (u, m)
            if len(lo_out):  # local dedup: shrink the next shuffle
                o2 = np.lexsort((hi_out, lo_out))
                lo_out, hi_out = lo_out[o2], hi_out[o2]
                keep = np.concatenate(
                    [[True], (lo_out[1:] != lo_out[:-1]) | (hi_out[1:] != hi_out[:-1])]
                )
                lo_out, hi_out = lo_out[keep], hi_out[keep]
            return pa.table(
                {"lo": pa.array(lo_out).cast(idt), "hi": pa.array(hi_out).cast(idt)}
            )
        return emit

    def signature(ds: rd.Dataset) -> tuple[int, int]:
        """(row count, order/partition-independent mod-2^64 checksum)."""
        from ..hashing import combine64

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"_n": pa.array([0], pa.int64()),
                                 "_s": pa.array([0], pa.int64())})
            if pa.types.is_integer(idt):
                a = t.column("lo").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
                b = t.column("hi").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            else:
                a, b = xxh64_many(t.column("lo")), xxh64_many(t.column("hi"))
            s = np.uint64(combine64(a, b).sum(dtype=np.uint64))
            return pa.table({"_n": pa.array([t.num_rows], pa.int64()),
                             "_s": pa.array([np.int64(s.view(np.int64))], pa.int64())})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        if not len(parts):
            return (0, 0)
        n = int(parts["_n"].sum())
        s = int(parts["_s"].to_numpy().astype(np.int64).view(np.uint64).sum(dtype=np.uint64))
        return (n, s)

    def phase(ds: rd.Dataset, large: bool) -> rd.Dataset:
        out = (
            ds.map_batches(route(large), batch_format="pyarrow")
            .groupby("_part")
            .map_groups(star_kernel(large), batch_format="pyarrow")
            .materialize()
        )
        # flat lineage: Ray's recursive StatsSummary walk overflows after
        # ~10 rounds of carried materializations (see _labelprop_components)
        return rd.from_arrow_refs(out.to_arrow_refs())

    edges = pairs.map_batches(canonical, batch_format="pyarrow").materialize()
    edges = rd.from_arrow_refs(edges.to_arrow_refs())
    sig = signature(edges)
    converged = False
    for _ in range(max_iters):
        edges = phase(edges, large=True)
        s1 = signature(edges)
        edges = phase(edges, large=False)
        s2 = signature(edges)
        if s1 == sig and s2 == s1:
            converged = True
            break
        sig = s2
    if not converged:
        raise RuntimeError(
            f"star components did not converge in {max_iters} rounds; "
            "raise max_iters"
        )

    def to_labels(t: pa.Table) -> pa.Table:
        lo, hi = t.column("lo").combine_chunks(), t.column("hi").combine_chunks()
        lo_c = lo.chunks if isinstance(lo, pa.ChunkedArray) else [lo]
        hi_c = hi.chunks if isinstance(hi, pa.ChunkedArray) else [hi]
        # (lo, lo) keeps roots labeled with themselves; (hi, lo) labels
        # every leaf — at the star fixpoint that IS the component min
        return pa.table({"node": pa.concat_arrays(lo_c + hi_c),
                         "group_id": pa.concat_arrays(lo_c + lo_c)})

    singles = pairs.map_batches(self_singletons, batch_format="pyarrow")
    return grouped_min(
        edges.map_batches(to_labels, batch_format="pyarrow").union(singles),
        "node", "group_id",
    )


def _labelprop_components(pairs: rd.Dataset, max_iters: int) -> rd.Dataset:
    """Min-label propagation with pointer doubling — the previous
    distributed engine, kept selectable (``CC_ENGINE=labelprop``) for
    A/B against :func:`_star_components`."""

    def to_edges(t: pa.Table) -> pa.Table:
        a = t.column("id_a").combine_chunks()
        b = t.column("id_b").combine_chunks()
        return pa.table(
            {"src": pa.concat_arrays([a, b]), "dst": pa.concat_arrays([b, a])}
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()

    from .relational import grouped_min

    # grouped_min, not Ray groupby().aggregate(Min): the node key is the
    # FULL vertex set (millions of groups) and Ray's sort-based aggregate
    # measured ~50 s on 3.3M rows / 1.1M keys vs ~2 s for the
    # hash-partitioned Arrow kernel — per round, twice per round.
    labels = grouped_min(
        edges.map_batches(
            lambda t: pa.table({"node": t.column("src"), "label": t.column("src")}),
            batch_format="pyarrow",
        ),
        "node", "label",
    ).materialize()

    def labsum(ds: rd.Dataset) -> int:
        """Convergence checksum: per-block label sums folded mod 2^64.
        Explicit uint64 wraparound on BOTH the block partial and the
        driver fold — mod addition is commutative, so the checksum is
        block-boundary-independent (int64 partials + an unbounded Python
        reduce previously overflowed Arrow and made the checksum
        partition-dependent)."""

        def partial(t: pa.Table) -> pa.Table:
            lab = t.column("label")
            if pa.types.is_integer(lab.type):
                v = lab.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            else:
                v = xxh64_many(lab)
            s = np.uint64(v.sum(dtype=np.uint64))
            return pa.table({"_s": pa.array([np.int64(s.view(np.int64))], pa.int64())})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        if not len(parts):
            return 0
        return int(parts["_s"].to_numpy().astype(np.int64).view(np.uint64).sum(dtype=np.uint64))

    from .relational import hash_join

    # Bound the label table's block count for the whole loop.  Each round
    # unions a 32-bucket join output with the current labels and groups —
    # without a repartition the block count COMPOUNDS round over round
    # (32 → 64 → …) and per-round task-launch overhead grows
    # geometrically (measured: round 0 ≈ 1.6 s, round 3 ≈ 26 s on a
    # 113-node graph).  Labels are (node,label) rows — 16 bytes each —
    # so size blocks to ~4M rows (~64 MB): tiny graphs run O(1) tasks
    # per round, 10^10-node graphs still get memory-safe blocks.
    nblocks = max(2, (labels.count() + 4_000_000 - 1) // 4_000_000)

    prev = labsum(labels)
    converged = False
    for _ in range(max_iters):
        lab_src = labels.map_batches(
            lambda t: t.rename_columns(["src", "label"]), batch_format="pyarrow"
        )
        prop = hash_join(edges, lab_src, "src").map_batches(
            lambda t: pa.table({"node": t.column("dst"), "label": t.column("label")}),
            batch_format="pyarrow",
        )
        # materialize: the hop result feeds THREE consumers below
        # (lab_l, lab_r, the union) — unmaterialized, each would
        # re-execute the join lineage (hash_join also calls .schema()).
        labels = (
            grouped_min(prop.union(labels), "node", "label")
            .repartition(nblocks)
            .materialize()
        )
        # pointer doubling (shortcutting): every label IS a node id in
        # the same component, so node→label→label-of-label is a valid
        # (and monotonically smaller) label too.  One extra labels⋈labels
        # join per round turns O(diameter) convergence into O(log d) —
        # each round a node learns what its label learned, so reach
        # doubles (a 64-hop chain converges in ~7 rounds, not 64).
        lab_l = labels.map_batches(
            lambda t: t.rename_columns(["node", "_lk"]), batch_format="pyarrow"
        )
        lab_r = labels.map_batches(
            lambda t: pa.table({"_lk": t.column("node"), "_l2": t.column("label")}),
            batch_format="pyarrow",
        )
        doubled = hash_join(lab_l, lab_r, "_lk").map_batches(
            lambda t: pa.table({"node": t.column("node"), "label": t.column("_l2")}),
            batch_format="pyarrow",
        )
        labels = (
            grouped_min(
                doubled.union(labels.map_batches(
                    lambda t: t.select(["node", "label"]), batch_format="pyarrow"
                )),
                "node", "label",
            )
            .repartition(nblocks)
            .materialize()
        )
        # reset lineage: MaterializedDataset keeps its stats PARENTS, so
        # round over round the stats tree deepens and Ray's recursive
        # StatsSummary walk hits Python's recursion limit (~10+ rounds
        # of join+agg ops).  Rebuilding from the materialized block refs
        # is zero-copy and starts the next round with a flat tree.
        labels = rd.from_arrow_refs(labels.to_arrow_refs())
        cur = labsum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # one min-label hop + one doubling per round: exhausting
        # max_iters means labels are WRONG (one component, several
        # group_ids) — never return them silently
        raise RuntimeError(
            f"pair_components did not converge in {max_iters} rounds; "
            "raise max_iters (log2(graph diameter) exceeds it)"
        )
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "group_id"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, content_col: str, id_col: str) -> rd.Dataset:
    """Exact content dedup: xxhash64(content) → per-batch min-id partials
    → one grouped Min (A3/O7 semantics, deterministic min-id winner).
    Fully vectorized — no per-hash python groups; the shuffle moves one
    (hash, id) row per distinct content per batch.  The final grouped
    Min is :func:`grouped_min` (hash-partitioned Arrow kernel), not
    Ray's sort-based aggregate — distinct hashes ≈ distinct docs, a
    high-cardinality key at corpus scale."""
    from .relational import grouped_min

    def partial(tbl: pa.Table) -> pa.Table:
        h = xxh64_many(tbl.column(content_col)).view(np.int64)
        t = pa.table({"_chash": pa.array(h, pa.int64()), id_col: tbl.column(id_col)})
        return t.group_by(["_chash"]).aggregate([(id_col, "min")]).rename_columns(
            ["_chash", id_col]
        )

    return grouped_min(
        ds.map_batches(partial, batch_format="pyarrow"), "_chash", id_col
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (random-hyperplane LSH buckets)
# ---------------------------------------------------------------------------

class HyperplaneSketch:
    """map_batches callable: embedding list<float> → b-bit sign sketch.
    Hyperplanes are seeded once per actor (identical across actors)."""

    def __init__(self, dim: int, bits: int = 16, id_col: str = "vec_id",
                 emb_col: str = "embedding", seed: int = 11):
        from .ann import lsh_planes

        self.planes = lsh_planes(dim, bits, seed)
        self.dim = dim
        self.id_col, self.emb_col = id_col, emb_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .ann import _as_matrix, _sign_buckets

        # null embeddings have nothing to compare — drop, don't crash
        tbl = tbl.filter(pc.is_valid(tbl.column(self.emb_col)))
        if tbl.num_rows == 0:
            # typed empty with the CONFIGURED dim so the fixed-size-list
            # width matches non-empty batches (all-null block would
            # otherwise hit _sign_buckets with a (0,)-shaped matrix)
            return pa.table(
                {
                    self.id_col: tbl.column(self.id_col),
                    "bucket": pa.array([], pa.int64()),
                    "unit": pa.FixedSizeListArray.from_arrays(
                        pa.array([], pa.float32()), self.dim
                    ),
                }
            )
        emb = _as_matrix(tbl.column(self.emb_col))
        keys = _sign_buckets(emb, self.planes)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        unit = (emb / np.where(norm == 0, 1.0, norm)).astype(np.float32)
        # vectorized list build from the flat values buffer (no per-row
        # python lists); float32 halves the bucket shuffle's bytes
        unit_arr = pa.FixedSizeListArray.from_arrays(
            pa.array(unit.ravel(), pa.float32()), unit.shape[1] if len(unit) else 1
        )
        return pa.table(
            {
                self.id_col: tbl.column(self.id_col),
                "bucket": pa.array(keys),
                "unit": unit_arr,
            }
        )


def embedding_neardup_pairs(ds: rd.Dataset, dim: int, threshold: float = 0.95,
                            bits: int = 8, id_col: str = "vec_id",
                            emb_col: str = "embedding") -> rd.Dataset:
    """Cosine-similar pairs: hyperplane-LSH bucket groupby, exact cosine
    verification within buckets (numpy matmul per group).  Recall is
    bounded by the sketch (near-identical vectors collide with high
    probability); for exhaustive small-scale checks use
    :func:`brute_force_pairs`."""
    sk = ds.map_batches(
        HyperplaneSketch,
        fn_constructor_kwargs=dict(dim=dim, bits=bits, id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # grouped_bucket_pairs only invokes this for buckets with >= 2 rows
        ids = g[id_col].to_numpy()
        mat = np.stack(g["unit"].to_numpy())
        sim = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sim[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[ia][keep], ids[ib][keep]),
                "id_b": np.maximum(ids[ia][keep], ids[ib][keep]),
                "cosine": sim[ia, ib][keep],
            }
        )

    from .relational import _arrow_types

    idt = _arrow_types(ds.schema()).get(id_col, pa.string())
    # each vector lands in exactly ONE bucket (single sketch, no banding),
    # so bucket-local pairs are already distinct — no cross-bucket dedup
    # shuffle needed (unlike the banded minhash/simhash paths).
    return grouped_bucket_pairs(
        sk, ["bucket"], pairs,
        out_schema=pa.schema([("id_a", idt), ("id_b", idt), ("cosine", pa.float64())]),
    )


def brute_force_pairs(ds: rd.Dataset, threshold: float, id_col: str = "vec_id",
                      emb_col: str = "embedding", block: int = 2048) -> pd.DataFrame:
    """Exhaustive cosine pair search — O(n²) verification baseline used by
    tests and the DuckDB oracle comparison.  Blocks stream through the
    driver; only for oracle-scale inputs."""
    import pyarrow.compute as pc

    rows = ds.select_columns([id_col, emb_col]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column(emb_col))), batch_format="pyarrow"
    ).to_pandas()  # null embeddings dropped in Arrow (to_pandas tensor-casts)
    ids = rows[id_col].to_numpy()
    mat = np.asarray(list(rows[emb_col]), dtype=np.float64)
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(norm == 0, 1.0, norm)
    out = []
    for i0 in range(0, len(ids), block):
        sim = mat[i0 : i0 + block] @ mat.T
        for r in range(sim.shape[0]):
            gi = i0 + r
            js = np.flatnonzero(sim[r] >= threshold)
            js = js[js > gi]
            for j in js:
                out.append((min(ids[gi], ids[j]), max(ids[gi], ids[j]), sim[r, j]))
    return pd.DataFrame(out, columns=["id_a", "id_b", "cosine"]).sort_values(["id_a", "id_b"])


def _blocked_lower_id_hits(mat: np.ndarray, threshold: float,
                           block: int) -> np.ndarray:
    """dropped[j] = any(cos(i, j) >= threshold for i < j), computed in
    ``block``×``block`` matmul tiles so a skew-hot cluster can never
    materialize its full m×m cosine matrix (the ``brute_force_pairs``
    blocking pattern).  ``mat`` rows must be pre-normalized."""
    m = len(mat)
    dropped = np.zeros(m, bool)
    for j0 in range(0, m, block):
        j1 = min(j0 + block, m)
        sub = mat[j0:j1]
        hitj = np.zeros(j1 - j0, bool)
        for i0 in range(0, j1, block):
            i1 = min(i0 + block, j1)
            cs = mat[i0:i1] @ sub.T
            if i1 > j0:  # diagonal tile: mask i >= j
                ii = np.arange(i0, i1)[:, None]
                jj = np.arange(j0, j1)[None, :]
                cs = np.where(ii < jj, cs, -np.inf)
            hitj |= (cs >= threshold).any(axis=0)
        dropped[j0:j1] = hitj
    return dropped


def semdedup_keep(ds: rd.Dataset, centroids: np.ndarray, threshold: float,
                  id_col: str = "vec_id", emb_col: str = "embedding",
                  num_partitions: int = 32, cos_block: int = 2048) -> rd.Dataset:
    """SemDedup-style semantic dedup (Abbas et al. 2023, public):
    cluster the embedding space (spherical assignment against broadcast
    k-means centroids — :func:`..ops.ann.ivf_assign`), then within each
    cluster DROP any vector whose cosine to a lower-id vector of the
    same cluster is >= ``threshold`` (the deterministic keep-first
    variant of the paper's per-cluster pruning; rows with null
    embeddings are dropped by assignment).  Cross-cluster near-dups are
    out of scope by design — that recall trade is the point of the
    method (no all-pairs pass).

    Shuffle shape: clusters are HASH-PARTITIONED into a bounded number
    of groups (the grouped_bucket_pairs pattern — one shuffle, 32 Ray
    groups regardless of k) and each partition's kernel walks its
    cluster boundaries with numpy; a group-per-cluster ``map_groups``
    would pay per-group overhead k times at the paper's k ∝ corpus
    size.  Within a cluster the cosine scan runs in ``cos_block``²
    matmul tiles (:func:`_blocked_lower_id_hits`) so one skew-hot
    cluster cannot materialize an m×m matrix and blow the worker heap.
    Output: (id_col, cluster, kept)."""
    from .ann import ivf_assign
    from .relational import _arrow_types, make_part_assigner

    assigned = ivf_assign(ds.select_columns([id_col, emb_col]), centroids,
                          id_col=id_col, emb_col=emb_col)
    add_part = make_part_assigner(["ivf_list"], num_partitions)
    idt = _arrow_types(ds.schema()).get(id_col, pa.int64())
    out_schema = pa.schema(
        [(id_col, idt), ("cluster", pa.int64()), ("kept", pa.bool_())])

    def kern(gt: pa.Table) -> pa.Table:
        if gt.num_rows == 0:
            return out_schema.empty_table()
        g = gt.to_pandas().sort_values(["ivf_list", id_col], kind="mergesort")
        clusters = g["ivf_list"].to_numpy().astype(np.int64)
        ids = g[id_col].to_numpy()
        emb = g[emb_col].to_numpy()
        kept = np.ones(len(g), dtype=bool)
        starts = np.concatenate(
            [[0], np.flatnonzero(clusters[1:] != clusters[:-1]) + 1, [len(g)]])
        for s0, s1 in zip(starts[:-1], starts[1:]):
            if s1 - s0 < 2:
                continue
            mat = np.asarray(list(emb[s0:s1]), dtype=np.float64)
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(nrm == 0, 1.0, nrm)
            dropped = _blocked_lower_id_hits(mat, threshold, cos_block)
            kept[s0:s1] &= ~dropped  # lower-id witness ⇒ drop
        return pa.table({
            id_col: pa.array(ids).cast(idt),
            "cluster": pa.array(clusters, pa.int64()),
            "kept": pa.array(kept),
        })

    return assigned.map_batches(add_part, batch_format="pyarrow").groupby(
        "_part"
    ).map_groups(kern, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# pHash near-dup groups (O9) with host salting
# ---------------------------------------------------------------------------

def phash_neardup_groups(ds: rd.Dataset, max_hamming: int = 2,
                         id_col: str = "image_id", phash_col: str = "phash",
                         salt: int = 0) -> rd.Dataset:
    """Visual near-dup pairs: explode each pHash into 4 x 16-bit block
    keys — by pigeonhole, ANY pair within Hamming<=3 of the 64 bits
    shares at least one exact block, so recall is guaranteed for
    ``max_hamming<=3``.  Exact Hamming verification within buckets;
    distinct-pair dedup across blocks.

    ``salt``>1 splits hot buckets EXACTLY via salt-PAIR replication
    (the fragment-replicate skew self-join): each row takes salt
    ``s = xxhash64(id) % S`` and is emitted to every bucket ``(block,
    block_key, {i,j})`` with ``s ∈ {i,j}`` — a pair with salts
    ``(sa, sb)`` meets in exactly one bucket ``{sa, sb}``, so the
    output is IDENTICAL to the unsalted run (pinned by
    ``test_phash_salted_equals_unsalted``) while the largest bucket
    shrinks ~``2/S``.  Replication is S× on ~50 B/row of key metadata
    only; choose ``S ≈ ceil(hot_bucket_rows / target_bucket_rows)``.
    This is the skew-breaking required at 10^10 scale (SURVEY.md §2.6
    O9); no cross-salt merge pass is needed — the recall loss of
    partition-local salting is designed out."""

    def explode(tbl: pa.Table) -> pa.Table:
        ph = tbl.column(phash_col).to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        n = len(ph)
        ids = tbl.column(id_col)
        blocks = np.repeat(np.arange(4, dtype=np.int64), n)
        keys = np.empty(4 * n, dtype=np.int64)
        for b in range(4):
            keys[b * n : (b + 1) * n] = ((ph >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        out = pa.table(
            {
                id_col: pa.concat_arrays([ids.combine_chunks()] * 4),
                phash_col: pa.array(np.tile(ph.view(np.int64), 4)),
                "block": pa.array(blocks),
                "block_key": pa.array(keys),
            }
        )
        if salt > 1:
            s_own = (xxh64_many(out.column(id_col)) % np.uint64(salt)).astype(np.int64)
            n4 = out.num_rows
            idx = np.repeat(np.arange(n4, dtype=np.int64), salt)
            partner = np.tile(np.arange(salt, dtype=np.int64), n4)
            so = s_own[idx]
            lo = np.minimum(so, partner)
            hi = np.maximum(so, partner)
            rep = out.take(pa.array(idx))
            return rep.append_column("s", pa.array(so)).append_column(
                "salt_pair", pa.array(lo * salt + hi)
            )
        z = np.zeros(4 * n, dtype=np.int64)
        return out.append_column("s", pa.array(z)).append_column(
            "salt_pair", pa.array(z)
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col)
        ids = g[id_col].to_numpy()
        ph = g[phash_col].to_numpy().astype(np.int64).view(np.uint64)
        if len(ids) < 2:
            return _typed_empty(g[id_col].dtype, {"hamming": "int64"})
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = np.ones(len(ia), dtype=bool)
        if salt > 1:
            sp = int(g["salt_pair"].iloc[0])
            if sp // salt != sp % salt:  # cross-salt bucket {i,j}, i != j:
                # same-salt pairs here duplicate bucket {i,i} — drop them
                sv = g["s"].to_numpy()
                keep &= sv[ia] != sv[ib]
        ham = hamming64(ph[ia], ph[ib])
        keep &= ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "hamming": ham[keep].astype(np.int64)})

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    from .relational import _arrow_types

    idt = _arrow_types(ds.schema()).get(id_col, pa.string())
    cand = grouped_bucket_pairs(
        exploded, ["block", "block_key", "salt_pair"], verify,
        out_schema=pa.schema([("id_a", idt), ("id_b", idt), ("hamming", pa.int64())]),
    )
    return distinct_pairs(cand, extra_cols=("hamming",))


# ---------------------------------------------------------------------------
# Exact-substring duplicate-span coverage (Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better" — suffix-array substring
# dedup, restated at word-n-gram granularity)
# ---------------------------------------------------------------------------

def _gram_pos_explode(t: pa.Table, n: int, id_col: str,
                      text_col: str) -> pa.Table:
    """Per-batch (id, pos, gram-hash) explode of word n-grams — the
    shared front half of :func:`dup_span_stats` and
    :func:`remove_dup_spans`."""
    from .text import _word_ngram_flat

    i64 = pa.int64()
    texts = t.column(text_col).to_pylist()
    grams, parents, _, _ = _word_ngram_flat(texts, n, word_stats=True)
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(parents):
        h = xxh64_many(grams).view(np.int64)
        starts = np.concatenate(
            [[0], np.flatnonzero(parents[1:] != parents[:-1]) + 1])
        runl = np.diff(np.append(starts, len(parents)))
        pos = np.arange(len(parents), dtype=np.int64) - np.repeat(starts, runl)
        out_ids = ids[parents]
    else:
        h = pos = out_ids = np.array([], np.int64)
    return pa.table({
        id_col: pa.array(out_ids, i64),
        "pos": pa.array(pos, i64),
        "gh": pa.array(h, i64),
    })


def _dup_gram_rows(docs: rd.Dataset, n: int, id_col: str, text_col: str,
                   min_count: int, num_partitions: int,
                   salt: int = 4) -> rd.Dataset:
    """(id, pos) of every corpus-duplicated word n-gram occurrence:
    explode → grouped_count by hash → filter ≥min_count → hash_join
    back.  Shared by :func:`dup_span_stats` / :func:`remove_dup_spans`.

    The occurrence→dup-hash join is SALTED (default 4): a boilerplate
    gram covering 30% of the corpus puts 30% of the left rows under ONE
    gh — with ≤500k distinct dup hashes the join broadcasts (skew-
    immune), but past that cutoff the unsalted shuffle would hand one
    merge task the whole hot gram.  Salting fans it across ``salt``
    sub-buckets at the cost of ``salt``× the 8-byte-hash right side;
    results are identical (pinned by test_dup_spans_hot_gram_salted).
    The adversarial-skew probe for this is
    tests/test_ops.py::test_dup_span_hot_gram_skew."""
    import pyarrow.compute as pc

    from . import relational

    i64 = pa.int64()
    grams_ds = docs.map_batches(
        lambda t: _gram_pos_explode(t, n, id_col, text_col),
        batch_format="pyarrow").materialize()
    counts = relational.grouped_count(
        grams_ds.select_columns(["gh"]), ["gh"], alias="cnt")
    dups = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("cnt"), min_count))
                   .select(["gh"]),
        batch_format="pyarrow")
    return relational.hash_join(
        grams_ds, dups, "gh", num_buckets=num_partitions, salt=salt,
        left_schema=pa.schema([(id_col, i64), ("pos", i64), ("gh", i64)]),
        right_schema=pa.schema([("gh", i64)]))


def dup_span_stats(docs: rd.Dataset, n: int = 4, id_col: str = "doc_id",
                   text_col: str = "text", min_count: int = 2,
                   num_partitions: int = 32) -> rd.Dataset:
    """Per-document duplicate-SPAN statistics: a word ``n``-gram is
    *duplicated* when it occurs >= ``min_count`` times across the whole
    corpus (within- or cross-document — suffix-array "repeated
    substring" semantics); each document reports how many of its grams
    are duplicated and how many of its tokens fall inside the UNION of
    their [pos, pos+n) spans (the fraction such spans cover is the
    metric exact-substring dedup cuts on).

    Shape: explode (id, pos, gram-hash) inside ``map_batches`` →
    ``grouped_count`` by hash (hash-partitioned, 10^9+-gram safe) →
    filter to duplicated hashes → partitioned ``hash_join`` back →
    per-doc interval-union kernel on a doc-hash shuffle.  Corpus text
    never leaves the explode stage; everything that shuffles is
    fixed-width (hash, count, pos) rows.  Gram equality is xxh64
    equality (the decontaminate/ repetition convention; the SQL oracle
    compares exact strings).  Output: (id, n_tokens, n_grams,
    n_dup_grams, covered_tokens)."""
    import pyarrow.compute as pc

    from . import relational
    from .text import _word_ngram_flat

    i64 = pa.int64()

    def doc_stats(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        _, _, nw, _ = _word_ngram_flat(texts, n, word_stats=True)
        return pa.table({
            id_col: pc.cast(t.column(id_col), i64),
            "n_tokens": pa.array(nw, i64),
            "n_grams": pa.array(np.maximum(nw - n + 1, 0), i64),
        })

    dup_rows = _dup_gram_rows(docs, n, id_col, text_col, min_count,
                              num_partitions)

    add_part = relational.make_part_assigner([id_col], num_partitions)
    cover_schema = pa.schema(
        [(id_col, i64), ("n_dup_grams", i64), ("covered_tokens", i64)])

    def cover_kern(gt: pa.Table) -> pa.Table:
        if gt.num_rows == 0:
            return cover_schema.empty_table()
        ids = gt.column(id_col).to_numpy(zero_copy_only=False)
        pos = gt.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids))
        i_s, p_s = ids[order], pos[order]
        # covered = Σ min(gap to next dup pos in the same doc, n); the
        # last dup pos of each doc contributes n
        contrib = np.full(len(p_s), np.int64(n))
        if len(p_s) > 1:
            same = i_s[1:] == i_s[:-1]
            gaps = np.minimum(np.diff(p_s), n)
            contrib[:-1] = np.where(same, gaps, n)
        starts = np.concatenate(
            [[0], np.flatnonzero(i_s[1:] != i_s[:-1]) + 1])
        covered = np.add.reduceat(contrib, starts)
        runl = np.diff(np.append(starts, len(i_s)))
        return pa.table({
            id_col: pa.array(i_s[starts], i64),
            "n_dup_grams": pa.array(runl.astype(np.int64)),
            "covered_tokens": pa.array(covered.astype(np.int64)),
        })

    coverage = (dup_rows
                .map_batches(add_part, batch_format="pyarrow")
                .groupby("_part")
                .map_groups(lambda g: cover_kern(g.drop_columns(["_part"])),
                            batch_format="pyarrow"))
    stats = docs.map_batches(doc_stats, batch_format="pyarrow")
    out = relational.hash_join(
        stats, coverage, id_col, num_buckets=num_partitions, how="left",
        left_schema=pa.schema(
            [(id_col, i64), ("n_tokens", i64), ("n_grams", i64)]),
        right_schema=cover_schema)

    def fill0(t: pa.Table) -> pa.Table:
        for c in ("n_dup_grams", "covered_tokens"):
            t = t.set_column(t.column_names.index(c), c,
                             pc.fill_null(t.column(c), 0))
        return t

    return out.map_batches(fill0, batch_format="pyarrow")


def remove_dup_spans(docs: rd.Dataset, n: int = 4, id_col: str = "doc_id",
                     text_col: str = "text", min_count: int = 2,
                     num_partitions: int = 32) -> rd.Dataset:
    """Exact-substring dedup TRANSFORM (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", at word-n-gram
    granularity): drop every token covered by the union of
    corpus-duplicated ``n``-gram spans and rebuild each document from
    the kept tokens.  Complements :func:`dup_span_stats` (which only
    MEASURES coverage).  Output text is the space-joined, lowercased
    ``\\w+`` token stream — the token-stream simplification;
    punctuation/whitespace between tokens is not preserved.

    Shape: the shared ``_dup_gram_rows`` plumbing down to duplicated
    ``(id, pos)`` rows; per-doc duplicated positions are PACKED into
    one binary blob per doc (``np.int64.tobytes`` — a plain binary
    payload the bucketed join ships without list-column support), then
    hash_joined to the text rows and unioned into a keep mask by a
    difference-array kernel.  Text crosses exactly ONE bucket shuffle
    (the rebuild join).  Output: ``(id, clean_text, n_tokens,
    kept_tokens)``; a fully-covered document comes back with
    ``clean_text = ''``."""
    import pyarrow.compute as pc

    from . import relational
    from .text import _WORD_RE

    i64 = pa.int64()
    dup_rows = _dup_gram_rows(docs, n, id_col, text_col, min_count,
                              num_partitions)
    add_part = relational.make_part_assigner([id_col], num_partitions)
    pack_schema = pa.schema([(id_col, i64), ("dup_pos", pa.binary())])

    def pack_kern(gt: pa.Table) -> pa.Table:
        if gt.num_rows == 0:
            return pack_schema.empty_table()
        ids = gt.column(id_col).to_numpy(zero_copy_only=False)
        pos = gt.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids))
        i_s, p_s = ids[order], pos[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(i_s[1:] != i_s[:-1]) + 1])
        bounds = np.append(starts, len(i_s))
        blobs = [p_s[bounds[k]:bounds[k + 1]].astype(np.int64).tobytes()
                 for k in range(len(starts))]
        return pa.table({
            id_col: pa.array(i_s[starts], i64),
            "dup_pos": pa.array(blobs, pa.binary()),
        })

    packs = (dup_rows
             .map_batches(add_part, batch_format="pyarrow")
             .groupby("_part")
             .map_groups(lambda g: pack_kern(g.drop_columns(["_part"])),
                         batch_format="pyarrow"))
    joined = relational.hash_join(
        docs.select_columns([id_col, text_col]), packs, id_col,
        num_buckets=num_partitions, how="left",
        left_schema=pa.schema([(id_col, i64), (text_col, pa.string())]),
        right_schema=pack_schema)

    def rebuild(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        blobs = t.column("dup_pos").to_pylist()
        clean, n_tok, kept = [], [], []
        for txt, blob in zip(texts, blobs):
            words = _WORD_RE.findall((txt or "").lower())
            nw = len(words)
            n_tok.append(nw)
            if not blob or nw == 0:
                clean.append(" ".join(words))
                kept.append(nw)
                continue
            pos = np.frombuffer(blob, np.int64)
            delta = np.zeros(nw + 1, np.int64)
            np.add.at(delta, pos, 1)
            np.add.at(delta, np.minimum(pos + n, nw), -1)
            keep = np.cumsum(delta[:-1]) == 0
            out_words = [w for w, k in zip(words, keep) if k]
            clean.append(" ".join(out_words))
            kept.append(len(out_words))
        return pa.table({
            id_col: pc.cast(t.column(id_col), i64),
            "clean_text": pa.array(clean, pa.string()),
            "n_tokens": pa.array(n_tok, i64),
            "kept_tokens": pa.array(kept, i64),
        })

    return joined.map_batches(rebuild, batch_format="pyarrow")
