"""Similarity search over embedding columns.

Replaces the reference's IVFPQ visual index
(`/root/reference/src/org/commoncrawl/mklab/analysis/IndexingManage.java:21-103`
— 1024-d, m=64, 8192 coarse lists, w=64 probed) with Ray-Data-native
search over a ``list<float>`` column:

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  ``ray.put`` once and every batch does one numpy matmul against it;
  per-batch local top-k partials are merged in a final tiny reduce.
  Scales linearly in corpus size with zero shuffle of the corpus.
- :func:`ivf_topk` — IVF-style scale path: k-means coarse centroids
  (trained on a sample), corpus bucketed by nearest centroid
  (groupby shuffle once, reusable), queries probe the ``nprobe``
  nearest lists only.
- :func:`lsh_topk` — random-hyperplane LSH path (Charikar 2002): the
  corpus is sign-sketched against ``bits`` shared hyperplanes (one
  stateless pass, no training), and a query only scores vectors whose
  bucket is within ``max_hamming`` bit flips of its own — multiprobe
  LSH (Lv et al. 2007).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd


def _as_matrix(col) -> np.ndarray:
    """``list<float>`` column → float64 [n, d] matrix.

    Fast path: null-free constant-width list arrays reshape straight from
    the flattened values buffer (one vectorized kernel, no per-row Python
    objects — embedding columns are by far the widest rows these stages
    touch).  Ragged/null inputs fall back to ``to_pylist``."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count == 0:
        if pa.types.is_fixed_size_list(arr.type):
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return np.asarray(flat, dtype=np.float64).reshape(
                len(arr), arr.type.list_size
            )
        if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
            offs = arr.offsets.to_numpy()
            widths = np.diff(offs)
            if len(widths) and widths[0] > 0 and (widths == widths[0]).all():
                flat = arr.flatten().to_numpy(zero_copy_only=False)
                return np.asarray(flat, dtype=np.float64).reshape(
                    len(arr), widths[0]
                )
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


def _local_topk(sim_row: np.ndarray, ids: np.ndarray, k: int) -> np.ndarray:
    """Batch-local top-k indices under the GLOBAL tie order (cosine DESC,
    id ASC).  argpartition on cosine alone would drop equal-cosine
    candidates arbitrarily — with > k ties at the k-th score inside one
    batch (exact-duplicate embeddings), the survivor set could disagree
    with the final merge's / SQL oracle's (cos DESC, id) row_number."""
    k = min(k, len(sim_row))
    if k == len(sim_row):
        order = np.lexsort((ids, -sim_row))
    else:
        # O(n) argpartition finds the provisional k-th score; every row
        # >= that score (i.e. every row that could belong in the top-k
        # under any tie order) is then ranked with the full tie-break
        part = np.argpartition(-sim_row, k - 1)[:k]
        kth = sim_row[part].min()
        cand = np.flatnonzero(sim_row >= kth)
        order = cand[np.lexsort((ids[cand], -sim_row[cand]))]
    return order[:k]


class BatchScorer:
    """map_batches callable: per-batch exact cosine vs the broadcast query
    matrix, emitting each batch's local top-k (query_id, vec_id, cosine)
    partials — the combiner that keeps the final merge tiny."""

    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str):
        q = ray.get(queries_ref)  # dict: query_id -> vector
        self.qids = np.array(sorted(q))
        self.qmat = _unit(np.asarray([q[i] for i in self.qids], dtype=np.float64))
        self.k = k
        self.id_col, self.emb_col = id_col, emb_col

    def _allowed(self, tbl: pa.Table) -> np.ndarray | None:
        """Per-query candidate mask [nq, batch] (None = all allowed);
        the ONLY hook the IVF / LSH subclasses override."""
        return None

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tbl = tbl.filter(pc.is_valid(tbl.column(self.emb_col)))  # null emb = no match
        if tbl.num_rows == 0:
            return pa.table(
                {"query_id": pa.array(self.qids[:0]),
                 self.id_col: pa.array([], tbl.schema.field(self.id_col).type),
                 "cosine": pa.array([], pa.float64())}
            )
        ids = tbl.column(self.id_col).to_numpy(zero_copy_only=False)
        mat = _unit(_as_matrix(tbl.column(self.emb_col)))
        sim = self.qmat @ mat.T  # [nq, batch]
        mask = self._allowed(tbl)
        if mask is not None:
            sim = np.where(mask, sim, -np.inf)
        out_q, out_v, out_s = [], [], []
        for qi in range(sim.shape[0]):
            sel = _local_topk(sim[qi], ids, self.k)
            if mask is not None:
                sel = sel[sim[qi, sel] > -np.inf]
            out_q.append(np.full(len(sel), self.qids[qi]))
            out_v.append(ids[sel])
            out_s.append(sim[qi, sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q) if out_q else []),
                self.id_col: pa.array(
                    np.concatenate(out_v) if out_v else [],
                    tbl.schema.field(self.id_col).type,
                ),
                "cosine": pa.array(
                    np.concatenate(out_s) if out_s else [], pa.float64()
                ),
            }
        )


def brute_force_topk(ds: rd.Dataset, queries: dict, k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding") -> pd.DataFrame:
    """Exact cosine top-k per query.  Returns a pandas frame
    (query_id, id, cosine, rank) — final merge is tiny (nq × k × #batches)."""
    ref = ray.put(queries)
    partials = ds.map_batches(
        BatchScorer,
        fn_constructor_args=(ref, k),
        fn_constructor_kwargs=dict(id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    ).to_pandas()
    out = (
        partials.sort_values(["query_id", "cosine", id_col], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


# ---------------------------------------------------------------------------
# IVF scale path
# ---------------------------------------------------------------------------

def kmeans_centroids(mat: np.ndarray, n_centroids: int, iters: int = 10,
                     seed: int = 5) -> np.ndarray:
    """Spherical k-means over a (pre-normalized or raw) sample matrix —
    pure numpy, deterministic in ``seed``.  Shared by the Ray training
    path and the sf-independent oracle fixture."""
    mat = _unit(np.asarray(mat, dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = mat[mask].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def train_centroids(ds: rd.Dataset, n_centroids: int, emb_col: str = "embedding",
                    sample: int = 10_000, iters: int = 10, seed: int = 5) -> np.ndarray:
    """k-means|| -lite: train coarse centroids on a driver-side sample
    (the IVF training step; sample size bounds driver memory).  The
    sample is a seeded Bernoulli draw across the WHOLE corpus, not a
    prefix — ``limit(sample)`` would train every centroid on the first
    blocks (one host/epoch slice of a crawl-ordered table) and collapse
    the rest of the corpus into a few far lists."""
    import pyarrow.compute as pc

    n = ds.count()
    # drop null embeddings in Arrow BEFORE collecting (Ray's to_pandas
    # tensor-casts list columns and fails on nulls)
    sub = ds.select_columns([emb_col]).map_batches(
        lambda t: t.filter(pc.is_valid(t.column(emb_col))), batch_format="pyarrow"
    )
    if n > sample:
        sub = sub.random_sample(min(1.0, 1.2 * sample / n), seed=seed)
    take = sub.to_pandas()
    return kmeans_centroids(np.asarray(list(take[emb_col]), dtype=np.float64),
                            n_centroids, iters=iters, seed=seed)


def kmeans_lloyd(ds: rd.Dataset, init: np.ndarray, iters: int = 1,
                 emb_col: str = "embedding", return_counts: bool = False):
    """Distributed EXACT Lloyd k-means over the whole Dataset (contrast
    :func:`train_centroids`, which trains on a driver-side sample).
    Each iteration is ONE streaming pass: every batch assigns rows to
    the broadcast centroids (squared-L2 argmin, ties to the lowest
    cluster id — :func:`kmeans_l2` semantics) and emits at most k
    partial rows ``(cluster, cnt, per-dim sum)``; the driver folds
    k×blocks partial rows, never the corpus.  Empty clusters keep their
    previous centroid.  Determinism: partial rows are SORTED BY VALUE
    before the driver fold (``iter_batches`` arrival order is not
    deterministic under Ray's default ``preserve_order=False``), so a
    fixed block split reproduces bit-identical centroids on every run;
    across different splits float64 summation order may still differ by
    ulps (pinned against the single-process :func:`kmeans_l2` loop in
    pytest)."""
    cent = np.asarray(init, dtype=np.float64).copy()
    k, d = cent.shape
    counts = np.zeros(k, dtype=np.int64)
    empty = pa.table({
        "cluster": pa.array([], pa.int64()),
        "cnt": pa.array([], pa.int64()),
        "s": pa.array([], pa.list_(pa.float64())),
    })
    # prune to the one needed column: every iteration re-executes the
    # input (an unmaterialized source re-reads per pass — the standard
    # streaming-EM shape at corpus scale; materialize upstream if the
    # embeddings fit the object store and iters is large)
    ds = ds.select_columns([emb_col])
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            tbl = tbl.filter(pc.is_valid(tbl.column(emb_col)))
            if tbl.num_rows == 0:
                return empty
            c = ray.get(ref)
            mat = _as_matrix(tbl.column(emb_col)).astype(np.float64)
            xx = (mat * mat).sum(axis=1)[:, None]
            cc = (c * c).sum(axis=1)[None, :]
            a = np.argmin(xx - 2.0 * (mat @ c.T) + cc, axis=1)
            order = np.argsort(a, kind="stable")
            asort = a[order]
            starts = np.concatenate([[0], np.flatnonzero(np.diff(asort)) + 1])
            sums = np.add.reduceat(mat[order], starts, axis=0)
            cnts = np.diff(np.concatenate([starts, [len(asort)]]))
            return pa.table({
                "cluster": pa.array(asort[starts], pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
                "s": pa.array(list(sums), pa.list_(pa.float64())),
            })

        tot = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        cls, cns, sms = [], [], []
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            if not b.num_rows:
                continue
            cls.append(b.column("cluster").to_numpy(zero_copy_only=False))
            cns.append(b.column("cnt").to_numpy(zero_copy_only=False))
            sms.append(np.asarray(b.column("s").to_pylist(), dtype=np.float64))
        if cls:
            cl = np.concatenate(cls)
            cn = np.concatenate(cns)
            sm = np.vstack(sms)
            # fold in an order that is a pure function of the partial
            # VALUES (identical rows are interchangeable under +), not
            # of batch arrival order
            order = np.lexsort((*sm.T[::-1], cn, cl))
            cl, cn, sm = cl[order], cn[order], sm[order]
            np.add.at(counts, cl, cn)
            np.add.at(tot, cl, sm)
        nz = counts > 0
        cent[nz] = tot[nz] / counts[nz, None]
    return (cent, counts) if return_counts else cent


def ivf_assign(ds: rd.Dataset, centroids: np.ndarray, id_col: str = "vec_id",
               emb_col: str = "embedding") -> rd.Dataset:
    """Bucket the corpus by nearest centroid (one shuffle, reusable as a
    persisted layout — the 'index build')."""
    ref = ray.put(centroids)

    class Assign:
        def __init__(self):
            self.cent = ray.get(ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            tbl = tbl.filter(pc.is_valid(tbl.column(emb_col)))  # null emb: unindexable
            if tbl.num_rows == 0:
                return tbl.append_column("ivf_list", pa.array([], pa.int64()))
            mat = _unit(_as_matrix(tbl.column(emb_col)))
            lst = np.argmax(mat @ self.cent.T, axis=1).astype(np.int64)
            return tbl.append_column("ivf_list", pa.array(lst))

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 8))


class IVFBatchScorer(BatchScorer):
    """Per-batch scorer honoring PER-QUERY probe lists (the reference's
    w-probed-lists-per-query semantics, `IndexingManage.java:68-80`):
    candidates outside a query's probed lists are masked to -inf before
    the local top-k, so each query sees exactly its nprobe lists."""

    def __init__(self, queries_ref, probe_mask_ref, k: int, id_col: str, emb_col: str):
        super().__init__(queries_ref, k, id_col, emb_col)
        self.mask = ray.get(probe_mask_ref)  # bool [nq, n_lists]

    def _allowed(self, tbl: pa.Table) -> np.ndarray:
        lists = tbl.column("ivf_list").to_numpy(zero_copy_only=False).astype(np.int64)
        return self.mask[:, lists]  # [nq, batch]


def build_index(assigned: rd.Dataset, path: str, key_col: str):
    """Persist a bucketed corpus (``ivf_assign`` / ``lsh_assign`` output)
    as a partitioned lancelite table, one committed fragment per bucket —
    the 'index build once, query many' layout.  Queries then open ONLY
    their probed buckets' files (``query_index``): at 100 TB the probe
    read is nprobe/n_lists of the corpus instead of a full scan, and the
    build is resumable (completed buckets are skipped on rerun)."""
    from .. import lancelite

    return lancelite.write_ray_partitioned(assigned, path, key_col)


def query_index(path: str, buckets) -> rd.Dataset:
    """Partition-pruned open of a persisted ANN index: a Dataset over
    ONLY the probed buckets' fragments (buckets with no committed rows
    are skipped — reading zero files is an error, an empty index is)."""
    from .. import lancelite

    t = lancelite.LanceLiteTable(path)
    paths = t.partition_fragment_paths(buckets)
    if not paths:
        # no probed bucket holds rows; an empty typed Dataset keeps the
        # scorer path uniform (schema from any committed fragment)
        allp = t.fragment_paths()
        if not allp:
            raise FileNotFoundError(f"empty ANN index at {path}")
        sch = pq.read_schema(allp[0])
        return rd.from_arrow(sch.empty_table())
    return rd.read_parquet(paths)


def ivf_topk_indexed(path: str, centroids: np.ndarray, queries: dict,
                     k: int = 10, nprobe: int = 4, id_col: str = "vec_id",
                     emb_col: str = "embedding") -> pd.DataFrame:
    """IVF top-k over a persisted index: identical results to
    :func:`ivf_topk` on the live assignment, but the read is pruned to
    the union of probed lists at the FILE level."""
    qids = sorted(queries)
    qmat = _unit(np.asarray([queries[i] for i in qids], dtype=np.float64))
    probes = np.argsort(-(qmat @ centroids.T), axis=1, kind="stable")[:, :nprobe]
    lists_needed = sorted({int(x) for row in probes for x in row})
    sub = query_index(path, lists_needed)
    return ivf_topk(sub, centroids, queries, k=k, nprobe=nprobe,
                    id_col=id_col, emb_col=emb_col)


def lsh_topk_indexed(path: str, planes: np.ndarray, queries: dict,
                     k: int = 10, max_hamming: int = 1, id_col: str = "vec_id",
                     emb_col: str = "embedding") -> pd.DataFrame:
    """LSH top-k over a persisted index (file-level probe pruning)."""
    bits = planes.shape[1]
    qmat = np.asarray([queries[i] for i in sorted(queries)], dtype=np.float64)
    union = sorted({b for qb in _sign_buckets(qmat, planes)
                    for b in _probe_buckets(int(qb), bits, max_hamming)})
    sub = query_index(path, union)
    return lsh_topk(sub, planes, queries, k=k, max_hamming=max_hamming,
                    id_col=id_col, emb_col=emb_col)


def _empty_topk(ds: rd.Dataset, id_col: str) -> pd.DataFrame:
    """Typed empty top-k result — the id dtype comes from the corpus
    schema (an object-dtype empty would mismatch the non-empty path's
    int64/string ids in concatenations and oracle compares)."""
    from .relational import _arrow_types

    idt = _arrow_types(ds.schema()).get(id_col, pa.string())
    return pd.DataFrame({"query_id": pd.Series(dtype="int64"),
                         id_col: pd.Series(dtype=idt.to_pandas_dtype()),
                         "cosine": pd.Series(dtype="float64"),
                         "rank": pd.Series(dtype="int64")})


def lsh_planes(dim: int, bits: int = 16, seed: int = 11) -> np.ndarray:
    """Deterministic [dim, bits] random-hyperplane matrix — shared by the
    dedup sketch (:class:`..dedup.HyperplaneSketch`), the ANN index and
    the DuckDB oracle fixture so all three bucket identically."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, bits))


def _sign_buckets(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit sketch: bucket b has bit i set iff mat[b]·planes[:,i] > 0."""
    signs = (mat @ planes) > 0
    keys = np.zeros(len(mat), dtype=np.uint64)
    for b in range(signs.shape[1]):
        keys |= signs[:, b].astype(np.uint64) << np.uint64(b)
    return keys.view(np.int64)


def lsh_assign(ds: rd.Dataset, planes: np.ndarray, id_col: str = "vec_id",
               emb_col: str = "embedding") -> rd.Dataset:
    """Append ``lsh_bucket``: the 'index build' is a single stateless
    pass (no training, no shuffle) — the bucket is a partition key the
    query path row-prunes on.  RAW embeddings go in (signs must match
    the oracle's inner products on the stored doubles)."""
    ref = ray.put(planes)

    class Assign:
        def __init__(self):
            self.planes = ray.get(ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            tbl = tbl.filter(pc.is_valid(tbl.column(emb_col)))  # null emb: unindexable
            if tbl.num_rows == 0:
                return tbl.append_column("lsh_bucket", pa.array([], pa.int64()))
            mat = _as_matrix(tbl.column(emb_col))
            return tbl.append_column("lsh_bucket",
                                     pa.array(_sign_buckets(mat, self.planes)))

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 8))


def _probe_buckets(bucket: int, bits: int, max_hamming: int) -> list[int]:
    """All bucket codes within ``max_hamming`` bit flips (multiprobe set)."""
    import itertools

    out = [bucket]
    for h in range(1, max_hamming + 1):
        for flips in itertools.combinations(range(bits), h):
            m = 0
            for f in flips:
                m |= 1 << f
            out.append(bucket ^ m)
    return out


class LSHBatchScorer(BatchScorer):
    """Per-batch scorer honoring PER-QUERY probe-bucket sets: candidates
    outside a query's multiprobe set are masked to -inf before the local
    top-k (the hyperplane analog of IVFBatchScorer)."""

    def __init__(self, queries_ref, allowed_ref, k: int, id_col: str, emb_col: str):
        super().__init__(queries_ref, k, id_col, emb_col)
        # list of sorted int64 arrays, one per query (qids order)
        self.allowed = ray.get(allowed_ref)

    def _allowed(self, tbl: pa.Table) -> np.ndarray:
        buckets = tbl.column("lsh_bucket").to_numpy(zero_copy_only=False)
        return np.stack([np.isin(buckets, al) for al in self.allowed])


def lsh_topk(assigned: rd.Dataset, planes: np.ndarray, queries: dict, k: int = 10,
             max_hamming: int = 1, id_col: str = "vec_id",
             emb_col: str = "embedding") -> pd.DataFrame:
    """Multiprobe hyperplane-LSH top-k: each query scores ONLY vectors
    whose ``lsh_bucket`` is within ``max_hamming`` flips of its own
    sketch.  The corpus is first row-pruned to the union of all probe
    buckets (at 100 TB this is the partition-pruning read), then batches
    score with the per-query bucket mask — approximate by construction;
    recall grows with ``max_hamming`` and shrinks with ``bits``."""
    bits = planes.shape[1]
    qids = sorted(queries)
    qmat = np.asarray([queries[i] for i in qids], dtype=np.float64)
    qbuckets = _sign_buckets(qmat, planes)
    allowed = [np.sort(np.array(_probe_buckets(int(b), bits, max_hamming),
                                dtype=np.int64))
               for b in qbuckets]
    union = sorted({int(x) for al in allowed for x in al})
    sub = assigned.filter(expr=f"lsh_bucket in {union}")
    partials = sub.map_batches(
        LSHBatchScorer,
        fn_constructor_args=(ray.put(queries), ray.put(allowed), k),
        fn_constructor_kwargs=dict(id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    ).to_pandas()
    if partials.empty:
        return _empty_topk(assigned, id_col)
    out = (
        partials.sort_values(["query_id", "cosine", id_col], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def ivf_topk(assigned: rd.Dataset, centroids: np.ndarray, queries: dict, k: int = 10,
             nprobe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding") -> pd.DataFrame:
    """Probe the ``nprobe`` nearest lists PER QUERY: filter the bucketed
    corpus to the union of probed lists (row pruning), then score each
    batch with the per-query probe mask — a query only ever ranks
    vectors from its own nprobe lists."""
    qids = sorted(queries)
    qmat = _unit(np.asarray([queries[i] for i in qids], dtype=np.float64))
    # stable sort: exact-tie probe choice is lowest list index, matching
    # the SQL oracle's (cos DESC, list_id ASC) row_number semantics
    probes = np.argsort(-(qmat @ centroids.T), axis=1, kind="stable")[:, :nprobe]
    lists_needed = sorted({int(x) for row in probes for x in row})
    sub = assigned.filter(expr=f"ivf_list in {lists_needed}")
    mask = np.zeros((len(qids), len(centroids)), dtype=bool)
    for i in range(len(qids)):
        mask[i, probes[i]] = True
    partials = sub.map_batches(
        IVFBatchScorer,
        fn_constructor_args=(ray.put(queries), ray.put(mask), k),
        fn_constructor_kwargs=dict(id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 8),
    ).to_pandas()
    if partials.empty:
        # every probed list was empty (k-means can keep empty clusters):
        # return a typed empty result instead of KeyError-ing on sort
        return _empty_topk(assigned, id_col)
    out = (
        partials.sort_values(["query_id", "cosine", id_col], ascending=[True, False, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


# ---------------------------------------------------------------------------
# Product quantization (PQ / IVFPQ)
#
# Reference analog: `IndexingManage.java:70-84` — an IVFPQ index
# (m2=64 subquantizers x k_c=256 centroids over 1024-d vectors, 8192
# coarse lists, w=64 probed lists per query) whose codebooks are trained
# OFFLINE and loaded from files.  Here the codebook is a deterministic
# driver-side k-means over a corpus sample (training a PQ codebook on a
# sample is the standard practice the reference's files encode), and
# encode / scan are Ray map_batches stages:
#   * pq_encode: vectors -> m uint8 codes (32x+ compression at the
#     reference's geometry — the layout that makes a 100 TB embedding
#     corpus scannable from memory),
#   * pq_adc_topk: asymmetric-distance (ADC) top-k — per query ONE
#     [m, k_c] lookup table, per batch m vectorized gathers, per-batch
#     local top-k partials so the driver merge stays nq x k x #batches.
# Public method: Jegou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011.
# ---------------------------------------------------------------------------

def kmeans_l2(mat: np.ndarray, n_centroids: int, iters: int = 10,
              seed: int = 5) -> np.ndarray:
    """Plain (non-spherical) Lloyd k-means — PQ quantizes raw subvectors,
    so centroids must live in the data's own scale, not on the unit
    sphere (contrast :func:`kmeans_centroids`).  Deterministic in
    ``seed``; empty clusters keep their previous centroid."""
    mat = np.asarray(mat, dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)].copy()
    for _ in range(iters):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2) if len(mat) * len(cent) < 2**22 else None
        if d is None:
            # blockwise |x-c|^2 = xx - 2xc + cc to bound memory
            xx = (mat * mat).sum(axis=1)[:, None]
            cc = (cent * cent).sum(axis=1)[None, :]
            d = xx - 2.0 * (mat @ cent.T) + cc
        assign = np.argmin(d, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = mat[m].mean(axis=0)
    return cent


def pq_train_codebook(mat: np.ndarray, m: int, k: int, iters: int = 10,
                      seed: int = 7) -> np.ndarray:
    """Train a PQ codebook on a sample matrix: split the d columns into
    ``m`` contiguous subspaces, run deterministic L2 k-means per
    subspace.  Returns float64 [m, k, d//m].  (The reference trains
    offline and ships CSV codebooks — `IndexingManage.java:74-76`; this
    is that training step, seeded for reproducibility.)"""
    mat = np.asarray(mat, dtype=np.float64)
    d = mat.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack([
        kmeans_l2(mat[:, j * dsub:(j + 1) * dsub], k, iters=iters, seed=seed + j)
        for j in range(m)
    ])


def _pq_codes(mat: np.ndarray, codebook: np.ndarray) -> np.ndarray:
    """Encode [n, d] rows against a [m, k, dsub] codebook → uint8 [n, m].
    Ties break to the LOWEST centroid id (np.argmin), matching the SQL
    oracle's (distance ASC, cent_id ASC) row_number."""
    m, k, dsub = codebook.shape
    n = mat.shape[0]
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        c = codebook[j]
        d = ((sub * sub).sum(axis=1)[:, None]
             - 2.0 * (sub @ c.T)
             + (c * c).sum(axis=1)[None, :])
        codes[:, j] = np.argmin(d, axis=1).astype(np.uint8)
    return codes


def pq_encode(ds: rd.Dataset, codebook: np.ndarray, id_col: str = "vec_id",
              emb_col: str = "embedding") -> rd.Dataset:
    """Corpus → (id, pq_code fixed_size_list<uint8, m>).  The broadcast
    codebook rides the object store once; encode is one matmul per
    subspace per batch.  Null embeddings are unindexable and dropped
    (same policy as ivf_assign)."""
    ref = ray.put(np.asarray(codebook, dtype=np.float64))
    m = codebook.shape[0]

    class Encode:
        def __init__(self):
            self.cb = ray.get(ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            tbl = tbl.filter(pc.is_valid(tbl.column(emb_col)))
            if tbl.num_rows == 0:
                return pa.table({
                    id_col: pa.array([], tbl.schema.field(id_col).type),
                    "pq_code": pa.array([], pa.list_(pa.uint8(), m)),
                })
            mat = _as_matrix(tbl.column(emb_col))
            codes = _pq_codes(mat, self.cb)
            flat = pa.array(codes.reshape(-1), pa.uint8())
            return pa.table({
                id_col: tbl.column(id_col),
                "pq_code": pa.FixedSizeListArray.from_arrays(flat, m),
            })

    return ds.map_batches(Encode, batch_format="pyarrow", concurrency=(1, 8))


def _codes_matrix(code_col) -> np.ndarray:
    """pq_code column → uint8 [n, m].  Handles both fixed_size_list
    (the live encode output) and plain list (the parquet round-trip of a
    persisted index — parquet has no fixed-size list type)."""
    arr = code_col.combine_chunks() if isinstance(code_col, pa.ChunkedArray) else code_col
    if pa.types.is_fixed_size_list(arr.type):
        m = arr.type.list_size
    else:
        offs = arr.offsets.to_numpy()
        widths = np.diff(offs)
        m = int(widths[0])
        if not (widths == m).all():
            raise ValueError("ragged pq_code column")
    return arr.flatten().to_numpy(zero_copy_only=False).reshape(len(arr), m)


class PQADCScorer:
    """map_batches callable: ADC distance of every code row to every
    query via the per-query [m, k] lookup table; emits per-batch local
    top-k (query_id, id, adc) partials.  Distance basis is squared L2
    accumulated per subspace as qq - 2*qc + cc — term-for-term the shape
    the DuckDB oracle computes with list_inner_product, so the two
    engines agree to fp-rounding."""

    def __init__(self, lut_ref, qids: np.ndarray, k: int, id_col: str):
        self.lut = ray.get(lut_ref)      # float64 [nq, m, k_c]
        self.qids = qids
        self.k = k
        self.id_col = id_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                self.id_col: pa.array([], tbl.schema.field(self.id_col).type),
                "adc": pa.array([], pa.float64()),
            })
        ids = tbl.column(self.id_col).to_numpy(zero_copy_only=False)
        codes = _codes_matrix(tbl.column("pq_code"))
        m = codes.shape[1]
        nq = self.lut.shape[0]
        adc = np.zeros((nq, len(ids)), dtype=np.float64)
        for j in range(m):
            adc += self.lut[:, j, codes[:, j]]
        out_q, out_v, out_s = [], [], []
        for qi in range(nq):
            sel = _local_topk(-adc[qi], ids, self.k)  # adc ASC == -adc DESC
            out_q.append(np.full(len(sel), self.qids[qi]))
            out_v.append(ids[sel])
            out_s.append(adc[qi, sel])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q) if out_q else []),
            self.id_col: pa.array(np.concatenate(out_v) if out_v else [],
                                  tbl.schema.field(self.id_col).type),
            "adc": pa.array(np.concatenate(out_s) if out_s else [], pa.float64()),
        })


def pq_lut(queries: dict, codebook: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(qids, LUT [nq, m, k]) — LUT[q, j, c] = ||q_j - C[j, c]||^2
    expanded as qq - 2*qc + cc (the oracle-matching term order)."""
    qids = np.array(sorted(queries))
    m, k, dsub = codebook.shape
    lut = np.empty((len(qids), m, k), dtype=np.float64)
    for i, qid in enumerate(qids):
        qv = np.asarray(queries[qid], dtype=np.float64)
        for j in range(m):
            qs = qv[j * dsub:(j + 1) * dsub]
            c = codebook[j]
            lut[i, j] = (qs @ qs) - 2.0 * (c @ qs) + (c * c).sum(axis=1)
    return qids, lut


def pq_adc_topk(codes: rd.Dataset, codebook: np.ndarray, queries: dict,
                k: int = 10, id_col: str = "vec_id") -> pd.DataFrame:
    """ADC top-k over a PQ-encoded corpus: smallest approximate squared
    L2 per query, ties to the lower id.  Returns (query_id, id, adc,
    rank).  The scan touches ONLY the m-byte codes — the full vectors
    never leave the encode stage."""
    qids, lut = pq_lut(queries, np.asarray(codebook, dtype=np.float64))
    partials = codes.map_batches(
        PQADCScorer,
        fn_constructor_args=(ray.put(lut), qids, k),
        fn_constructor_kwargs=dict(id_col=id_col),
        batch_format="pyarrow",
        batch_size=65536,
        concurrency=(1, 8),
    ).to_pandas()
    if partials.empty:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype="int64"),
                             "adc": pd.Series([], dtype="float64"),
                             "rank": pd.Series([], dtype="int64")})
    out = (
        partials.sort_values(["query_id", "adc", id_col],
                             ascending=[True, True, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def ivfpq_encode(ds: rd.Dataset, coarse: np.ndarray, codebook: np.ndarray,
                 id_col: str = "vec_id", emb_col: str = "embedding") -> rd.Dataset:
    """IVFPQ build: coarse-assign (spherical, same quantizer as ivf_assign)
    then PQ-encode the RESIDUAL v - coarse_centroid — the reference's
    index layout (`IndexingManage.java:78`: coarse quantizer + product
    quantizer files).  Output: (id, ivf_list, pq_code)."""
    cref = ray.put(np.asarray(coarse, dtype=np.float64))
    bref = ray.put(np.asarray(codebook, dtype=np.float64))
    m = codebook.shape[0]

    class Encode:
        def __init__(self):
            self.coarse = ray.get(cref)
            self.cb = ray.get(bref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            tbl = tbl.filter(pc.is_valid(tbl.column(emb_col)))
            if tbl.num_rows == 0:
                return pa.table({
                    id_col: pa.array([], tbl.schema.field(id_col).type),
                    "ivf_list": pa.array([], pa.int64()),
                    "pq_code": pa.array([], pa.list_(pa.uint8(), m)),
                })
            mat = _as_matrix(tbl.column(emb_col))
            lst = np.argmax(_unit(mat) @ _unit(self.coarse).T, axis=1).astype(np.int64)
            resid = mat - self.coarse[lst]
            codes = _pq_codes(resid, self.cb)
            flat = pa.array(codes.reshape(-1), pa.uint8())
            return pa.table({
                id_col: tbl.column(id_col),
                "ivf_list": pa.array(lst),
                "pq_code": pa.FixedSizeListArray.from_arrays(flat, m),
            })

    return ds.map_batches(Encode, batch_format="pyarrow", concurrency=(1, 8))


def ivfpq_topk(encoded: rd.Dataset, coarse: np.ndarray, codebook: np.ndarray,
               queries: dict, k: int = 10, nprobe: int = 4,
               id_col: str = "vec_id") -> pd.DataFrame:
    """IVFPQ search: per query probe the ``nprobe`` nearest coarse lists
    (same spherical probe order as ivf_topk), build ONE residual LUT per
    (query, probed list) — LUT[j, c] = ||(q - coarse_l)_j - C[j, c]||^2
    — and ADC-scan only rows of probed lists.  w-lists-per-query
    semantics per the reference (`IndexingManage.java:82-84`)."""
    coarse = np.asarray(coarse, dtype=np.float64)
    codebook = np.asarray(codebook, dtype=np.float64)
    qids = np.array(sorted(queries))
    qmat = np.asarray([queries[i] for i in qids], dtype=np.float64)
    probes = np.argsort(-(_unit(qmat) @ _unit(coarse).T), axis=1, kind="stable")[:, :nprobe]
    lists_needed = sorted({int(x) for row in probes for x in row})
    # per-(query, list) residual LUTs, keyed small and broadcast once
    luts: dict[tuple[int, int], np.ndarray] = {}
    for i, qid in enumerate(qids):
        for l in probes[i]:
            rq = {int(qid): qmat[i] - coarse[int(l)]}
            _, lut = pq_lut(rq, codebook)
            luts[(int(qid), int(l))] = lut[0]
    sub = encoded.filter(expr=f"ivf_list in {lists_needed}")
    lut_ref = ray.put(luts)
    kk = k

    class Scorer:
        def __init__(self):
            self.luts = ray.get(lut_ref)

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if tbl.num_rows == 0:
                return pa.table({
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], tbl.schema.field(id_col).type),
                    "adc": pa.array([], pa.float64()),
                })
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            lsts = tbl.column("ivf_list").to_numpy(zero_copy_only=False).astype(np.int64)
            codes = _codes_matrix(tbl.column("pq_code"))
            m = codes.shape[1]
            out_q, out_v, out_s = [], [], []
            for (qid, l), lut in self.luts.items():
                rows = np.flatnonzero(lsts == l)
                if not len(rows):
                    continue
                adc = np.zeros(len(rows), dtype=np.float64)
                cr = codes[rows]
                for j in range(m):
                    adc += lut[j, cr[:, j]]
                sel = _local_topk(-adc, ids[rows], kk)
                out_q.append(np.full(len(sel), qid))
                out_v.append(ids[rows][sel])
                out_s.append(adc[sel])
            if not out_q:
                return pa.table({
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], tbl.schema.field(id_col).type),
                    "adc": pa.array([], pa.float64()),
                })
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q).astype(np.int64)),
                id_col: pa.array(np.concatenate(out_v),
                                 tbl.schema.field(id_col).type),
                "adc": pa.array(np.concatenate(out_s), pa.float64()),
            })

    partials = sub.map_batches(
        Scorer, batch_format="pyarrow", batch_size=65536, concurrency=(1, 8)
    ).to_pandas()
    if partials.empty:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype="int64"),
                             "adc": pd.Series([], dtype="float64"),
                             "rank": pd.Series([], dtype="int64")})
    out = (
        partials.sort_values(["query_id", "adc", id_col],
                             ascending=[True, True, True])
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out


def ivfpq_topk_indexed(path: str, coarse: np.ndarray, codebook: np.ndarray,
                       queries: dict, k: int = 10, nprobe: int = 4,
                       id_col: str = "vec_id") -> pd.DataFrame:
    """IVFPQ top-k over a persisted index (``build_index`` of
    ``ivfpq_encode`` output keyed by ``ivf_list``): identical results to
    :func:`ivfpq_topk` on the live encoding, but the read opens ONLY the
    probed lists' fragment files — at the reference's geometry (w=64 of
    8192 lists) the scan touches <1% of the code table's files."""
    qids = sorted(queries)
    qmat = _unit(np.asarray([queries[i] for i in qids], dtype=np.float64))
    probes = np.argsort(-(qmat @ _unit(np.asarray(coarse, dtype=np.float64)).T),
                        axis=1, kind="stable")[:, :nprobe]
    lists_needed = sorted({int(x) for row in probes for x in row})
    sub = query_index(path, lists_needed)
    return ivfpq_topk(sub, coarse, codebook, queries, k=k, nprobe=nprobe,
                      id_col=id_col)


# ---------------------------------------------------------------------------
# PCA over an embedding column (distributed integer-exact moments)
# ---------------------------------------------------------------------------

def pca_moment_partials(tbl: pa.Table, emb_col: str = "embedding",
                        scale_bits: int = 20) -> pa.Table:
    """Per-batch EXACT integer moment partial for PCA: embeddings are
    quantized to ``floor(e * 2**scale_bits)`` int64 and the batch
    contributes one row carrying (count, Σq, ΣqqT) as int64 blobs.
    Integer sums re-associate, so the merged moments — and everything
    derived from them — are BIT-IDENTICAL regardless of block split or
    merge order (the ridge-trainer / forest-histogram convention; float
    Gram partials would make the eigenvectors run-dependent).

    Overflow bound: ``n · 2**(2·scale_bits) < 2**63`` — the default
    20 bits holds to ~8.4e6 unit-scale rows; callers fitting at larger
    corpus scale lower scale_bits (10 bits holds to ~8.8e12 rows).
    The train fixture here is 500 rows."""
    m = _as_matrix(tbl.column(emb_col))
    q = np.floor(m * float(1 << scale_bits)).astype(np.int64)
    g = q.T @ q  # int64 exact
    return pa.table({
        "n": pa.array([q.shape[0]], pa.int64()),
        "s": pa.array([q.sum(axis=0).tobytes()], pa.binary()),
        "g": pa.array([g.tobytes()], pa.binary()),
        "d": pa.array([q.shape[1]], pa.int64()),
    })


def pca_train(ds: rd.Dataset, n_components: int = 2,
              emb_col: str = "embedding", scale_bits: int = 20) -> np.ndarray:
    """Distributed PCA fit: one streaming pass of integer moment
    partials (one tiny row per block reaches the driver — the textbook
    distributed-covariance shape), then a d×d eigendecomposition on the
    driver.  Returns the top ``n_components`` eigenvectors as rows,
    sign-canonicalized (the entry with the largest magnitude is made
    positive) so the result is unique.  Because the merged moments are
    integer-exact, distributed and local fits agree bit-for-bit and
    ``numpy.linalg.eigh`` sees the identical matrix."""
    parts = ds.map_batches(
        lambda t: pca_moment_partials(t, emb_col, scale_bits),
        batch_format="pyarrow").to_arrow_refs()
    n = 0
    s = g = None
    d = None
    for ref in parts:
        t = ray.get(ref)
        for i in range(t.num_rows):
            d = int(t.column("d")[i].as_py())
            n += int(t.column("n")[i].as_py())
            si = np.frombuffer(t.column("s")[i].as_py(), np.int64)
            gi = np.frombuffer(t.column("g")[i].as_py(), np.int64).reshape(d, d)
            s = si if s is None else s + si
            g = gi if g is None else g + gi
    return pca_components_from_moments(n, s, g, scale_bits, n_components)


def pca_components_from_moments(n: int, s: np.ndarray, g: np.ndarray,
                                scale_bits: int,
                                n_components: int) -> np.ndarray:
    """(count, Σq, ΣqqT) → top eigenvector rows.  Deterministic given
    the exact integer moments: the float covariance is a fixed
    expression of them and ``eigh`` is deterministic for identical
    input on one platform."""
    sc = float(1 << scale_bits)
    mean = s.astype(np.float64) / (n * sc)
    cov = g.astype(np.float64) / (n * sc * sc) - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    comps = v[:, np.argsort(w)[::-1][:n_components]].T
    for r in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    return comps


def pca_train_local(tbl: pa.Table, n_components: int = 2,
                    emb_col: str = "embedding",
                    scale_bits: int = 20) -> np.ndarray:
    """No-Ray fit over a pyarrow table — the oracle-builder path; bit
    identical to :func:`pca_train` (same integer moments)."""
    p = pca_moment_partials(tbl, emb_col, scale_bits)
    d = int(p.column("d")[0].as_py())
    return pca_components_from_moments(
        int(p.column("n")[0].as_py()),
        np.frombuffer(p.column("s")[0].as_py(), np.int64),
        np.frombuffer(p.column("g")[0].as_py(), np.int64).reshape(d, d),
        scale_bits, n_components)


def pca_project_batch(tbl: pa.Table, comps: np.ndarray, id_col: str = "vec_id",
                      emb_col: str = "embedding") -> pa.Table:
    """Project a batch onto the fitted components with a LEFT-TO-RIGHT
    fold over dimensions (``acc += e[:, j] * w[j]``), matching the SQL
    oracle's explicit ``e[1]*w1 + e[2]*w2 + ...`` evaluation order —
    ``np.dot``'s pairwise/SIMD summation would differ in ulps and could
    flip the 5-decimal rounding."""
    m = _as_matrix(tbl.column(emb_col))
    out = {id_col: tbl.column(id_col)}
    for r in range(comps.shape[0]):
        acc = np.zeros(m.shape[0], np.float64)
        for j in range(m.shape[1]):
            acc = acc + m[:, j] * comps[r, j]
        out[f"pc{r + 1}"] = pa.array(
            np.floor(acc * 100000.0 + 0.5) / 100000.0)
    return pa.table(out)
