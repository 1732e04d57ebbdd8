"""Iterative graph operators: PageRank and multi-source BFS hop
distance, Ray-Data-first.

The reference stops at per-node link COUNTS (server tallies in
``WATServerType.java:30-59``, per-domain stats in
``CommonCrawlAnalyzer.java:96-182``); these operators add the iterative
fixed-point computations a large-scale crawl-analysis pipeline runs
over the same edge lists — rank propagation for frontier
prioritization, hop distance from a seed set for crawl-depth audits.
They complement the connected-components engines in ``ops/dedup.py``
(``pair_components`` / ``_star_components``): CC answers "same group?",
these answer "how important?" / "how far?".

Scale shape (100 TB): the EDGE list is the big side and never moves —
in the fully-distributed tier it is hash-bucketed by ``src`` ONCE into
driver-owned object-store tables (with per-bucket src/dst codes and
outdegrees precompiled), and each sweep is ONE Ray execution that
shuffles only |V|-sized rank rows: rank rows group by their
(node-hash) bucket, each group joins its resident edge bucket in numpy
(argsort + searchsorted + bincount) and emits ≤ |V| per-dst partials
pre-tagged with the dst bucket, which a second groupby folds into the
next rank vector.  Exchanged volume per sweep is O(|V|), not O(|E|),
and edge bytes cross the wire at most once per node per sweep (object
-store fetch of the resident buckets, cached by Ray's plasma layer).
Skewed in-degree (hub nodes) is absorbed by the per-bucket bincount
partials the same way word_count absorbs hot words.  Float caveat:
contributions are summed in bucket-local code order, so ranks are
deterministic only up to fp summation order (~1e-15 relative) —
consumers that need hashable output round (see
``entry_queries.q_pagerank``, 6 decimals on the n-scaled rank).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from . import relational


def _rename(ds: rd.Dataset, names: list[str]) -> rd.Dataset:
    return ds.map_batches(
        lambda t: t.rename_columns(names).replace_schema_metadata(None),
        batch_format="pyarrow",
    )


def edge_nodes(edges: rd.Dataset, src: str = "src", dst: str = "dst") -> rd.Dataset:
    """Distinct node set of an edge list, as a (node) Dataset."""
    s = _rename(edges.select_columns([src]), ["node"])
    d = _rename(edges.select_columns([dst]), ["node"])
    return relational.grouped_min(s.union(d), "node", [])


def pagerank(
    edges: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    incore_nodes: int = 2_000_000,
    incore_edges: int = 4_000_000,
) -> rd.Dataset:
    """Power-iteration PageRank over a directed edge list (Brin & Page
    1998), fixed ``iters`` sweeps from the uniform vector.

    Semantics (mirrored exactly by the unrolled-CTE SQL oracle):
    nodes = distinct(src) ∪ distinct(dst); every node starts at 1/N;
    pr'(v) = (1-d)/N + d * Σ_{(u,v)∈E} pr(u)/outdeg(u).  Dangling-node
    mass is NOT redistributed (symmetric edge lists have none; for
    one-directional graphs the result is the standard "dangling mass
    leaks" variant).  Duplicate edges count once per occurrence —
    deduplicate upstream if multigraph weighting is not wanted.

    Returns a (node, pr) Dataset.  Three regimes (the repo's usual
    size-gated dispatch, cf. ``dedup.pair_components``):

    - ``|E| <= incore_edges``: the whole graph fits the driver (4M
      edges = 32 MB of int32 positions) — one collect, zero Ray
      executions per sweep.  At this size Ray's per-execution fixed
      cost dwarfs the bincount math.
    - ``n <= incore_nodes``: the rank VECTOR lives on the driver
      (n × 8 B — 2M nodes = 16 MB); node ids are compiled once into
      int32 positions on the materialized edge list, then each sweep is
      ONE Ray execution: broadcast ranks via ``ray.put``, per-batch
      ``np.bincount`` partials (≤ #distinct-dst rows per batch come
      back), driver folds.  Edges never move after the index pass.
    - larger ``n``: fully distributed — edge buckets compiled once
      into resident object-store tables, then ONE Ray execution per
      sweep (two |V|-row groupby shuffles: ranks→src-bucket join,
      partials→dst-bucket fold); edges never re-shuffle.
    """
    edges = edges.select_columns([src, dst]).materialize()
    if edges.count() <= incore_edges:
        return _pagerank_local(edges, src, dst, iters, damping)
    nodes = edge_nodes(edges, src, dst).materialize()
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda t: t.append_column("pr", pa.array([], pa.float64())),
            batch_format="pyarrow",
        )
    sch = nodes.schema()  # ray.data.Schema: .names / .types (Arrow)
    node_t = pa.field("node", sch.types[sch.names.index("node")])

    if n <= incore_nodes:
        # outdegree is a bincount over the compiled src positions —
        # no grouped_count and, crucially, no |E|-wide degree join
        return _pagerank_incore(edges, nodes, n, src, dst, iters, damping, node_t)

    return _pagerank_bucketed(edges, nodes, n, src, dst, iters, damping, node_t)


def _bucket_col(col, num_buckets: int) -> np.ndarray:
    """Bucket codes for an Arrow column: the SAME hash discipline as
    ``relational.make_part_assigner`` (ints directly, everything else
    via string cast + xxh64) — src-bucketed edges, node-bucketed ranks
    and prep-computed dst buckets must all agree."""
    from ..hashing import xxh64_many

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    else:
        v = xxh64_many(pc.cast(col, pa.string()))
    return (v % np.uint64(num_buckets)).astype(np.int64)


def _pagerank_bucketed(
    edges: rd.Dataset, nodes: rd.Dataset, n: int, src: str, dst: str,
    iters: int, damping: float, node_t: pa.Field, num_buckets: int = 32,
) -> rd.Dataset:
    """Huge-|V| regime (rank vector beyond driver memory): bucket-
    resident sweeps.

    Prep (once): edges are hash-bucketed by ``src`` and compiled into
    ``num_buckets`` driver-owned object-store tables holding integer
    src/dst codes, per-src outdegrees and each distinct dst's TARGET
    bucket — so a sweep does no hashing, no degree join and no edge
    movement at all.  Per sweep, ONE Ray execution with two |V|-row
    shuffles:

    1. rank rows group by node bucket; each group ``ray.get``s its
       resident edge bucket (plasma zero-copy on the owning node,
       cached per node otherwise), joins pr onto the distinct srcs via
       one argsort+searchsorted, and bincounts per-dst partials —
       emitting ≤ |distinct dst in bucket| rows pre-tagged ``_b`` with
       the dst's bucket, PLUS one zero-contribution row per node of
       its own bucket (the group's rank rows ARE the bucket's node
       set, so no separate node-table union is needed — a union would
       also grow the block count by |zero blocks| every sweep, which
       made per-sweep sort cost double per iteration);
    2. those rows group by ``_b``; one Arrow group_by-sum per bucket
       folds them into the next rank vector, already tagged for sweep
       k+1.  Block count is a sweep invariant.

    fp caveat: per-dst sums run in bucket-local code order (numpy
    bincount), deterministic for a fixed bucket count."""
    import ray

    base = (1.0 - damping) / n
    node_type = node_t.type
    P = max(2, int(num_buckets))

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "s": t.column(src), "d": t.column(dst),
            "_b": pa.array(_bucket_col(t.column(src), P)),
        })

    emat = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    @ray.remote(num_returns=P)
    def split_block(t: pa.Table):
        bs = t.column("_b").to_numpy(zero_copy_only=False)
        return tuple(
            t.filter(pa.array(bs == p)).drop_columns(["_b"]) for p in range(P)
        )

    parts = [split_block.remote(r) for r in emat.to_arrow_refs()]

    @ray.remote
    def prep_bucket(*tables):
        tabs = [t for t in tables if t.num_rows]
        if not tabs:
            return None
        t = pa.concat_tables(tabs).combine_chunks()
        sv = t.column("s").to_numpy(zero_copy_only=False)
        dv = t.column("d").to_numpy(zero_copy_only=False)
        s_uniq, s_codes = np.unique(sv, return_inverse=True)
        d_uniq, d_codes = np.unique(dv, return_inverse=True)
        return {
            "s_uniq": s_uniq,
            "s_codes": s_codes.astype(np.int32),
            # src is bucket-pure (bucketed BY src), so the bucket-local
            # count is the exact global outdegree
            "outdeg": np.bincount(s_codes).astype(np.float64),
            "d_uniq": d_uniq,
            "d_codes": d_codes.astype(np.int32),
            "d_bucket": _bucket_col(pa.array(d_uniq, node_type), P),
        }

    prep_refs = [
        prep_bucket.remote(*[blocks[p] for blocks in parts]) for p in range(P)
    ]

    def tag_nodes(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"),
            "_b": pa.array(_bucket_col(t.column("node"), P)),
        })

    node_b = nodes.map_batches(tag_nodes, batch_format="pyarrow").materialize()
    ranks = node_b.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "pr": pa.array(np.full(len(t), 1.0 / n)),
                            "_b": t.column("_b")}),
        batch_format="pyarrow",
    ).materialize()

    partial_schema = pa.schema([pa.field("node", node_type),
                                pa.field("_s", pa.float64()),
                                pa.field("_b", pa.int64())])

    def sweep_contrib(gt: pa.Table) -> pa.Table:
        bid = int(gt.column("_b")[0].as_py())
        # zero rows: this group's rank rows ARE the bucket's node set —
        # they guarantee every node reappears in the fold stage even
        # with no inbound contributions (left-join semantics)
        zeros = pa.table({"node": gt.column("node"),
                          "_s": pa.array(np.zeros(gt.num_rows)),
                          "_b": gt.column("_b")})
        info = ray.get(prep_refs[bid])
        if info is None:
            return zeros.cast(partial_schema)
        nv = gt.column("node").to_numpy(zero_copy_only=False)
        pv = gt.column("pr").to_numpy(zero_copy_only=False)
        order = np.argsort(nv, kind="stable")
        # every src IS a node hashed to this same bucket — total lookup
        pos = np.searchsorted(nv[order], info["s_uniq"])
        rod = pv[order][pos] / info["outdeg"]
        s = np.bincount(info["d_codes"], weights=rod[info["s_codes"]],
                        minlength=len(info["d_uniq"]))
        part = pa.table({"node": pa.array(info["d_uniq"], node_type),
                         "_s": pa.array(s),
                         "_b": pa.array(info["d_bucket"])})
        return pa.concat_tables([part.cast(partial_schema),
                                 zeros.cast(partial_schema)])

    def fold_ranks(gt: pa.Table) -> pa.Table:
        bid = gt.column("_b")[0]
        agg = gt.select(["node", "_s"]).group_by("node").aggregate([("_s", "sum")])
        pr = pc.add(pc.multiply(agg.column("_s_sum"),
                                pa.scalar(damping, pa.float64())),
                    pa.scalar(base, pa.float64()))
        return pa.table({"node": agg.column("node"), "pr": pr,
                         "_b": pa.array(np.full(agg.num_rows, bid.as_py(),
                                                dtype=np.int64))})

    for _ in range(iters):
        # one execution per sweep: both shuffles live in this plan
        ranks = ranks.groupby("_b").map_groups(
            sweep_contrib, batch_format="pyarrow"
        ).groupby("_b").map_groups(
            fold_ranks, batch_format="pyarrow").materialize()

    return _rename(ranks.drop_columns(["_b"]), ["node", "pr"])


def _pagerank_local(
    edges: rd.Dataset, src: str, dst: str, iters: int, damping: float,
) -> rd.Dataset:
    """Tiny-|E| regime: one collect, then pure-numpy power iteration on
    the driver.  Bit-comparable to the distributed regimes up to fp
    summation order (same math: bincount contribution sums)."""
    esch = edges.schema()
    node_type = esch.types[esch.names.index(src)]
    s_parts, d_parts = [], []
    for b in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
        s_parts.append(b.column(src).to_numpy(zero_copy_only=False))
        d_parts.append(b.column(dst).to_numpy(zero_copy_only=False))
    if not s_parts or sum(len(p) for p in s_parts) == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], node_type), "pr": pa.array([], pa.float64())}))
    sv = np.concatenate(s_parts)
    dv = np.concatenate(d_parts)
    node_ids = np.unique(np.concatenate([sv, dv]))
    n = len(node_ids)
    si = np.searchsorted(node_ids, sv).astype(np.int64)
    di = np.searchsorted(node_ids, dv).astype(np.int64)
    outdeg = np.bincount(si, minlength=n).astype(np.float64)
    base = (1.0 - damping) / n
    ranks = np.full(n, 1.0 / n)
    for _ in range(iters):
        rod = np.divide(ranks, outdeg, out=np.zeros(n), where=outdeg > 0)
        acc = np.bincount(di, weights=rod[si], minlength=n)
        ranks = base + damping * acc
    return rd.from_arrow(pa.table({"node": pa.array(node_ids, node_type),
                                   "pr": pa.array(ranks, pa.float64())}))


def _pagerank_incore(
    edges: rd.Dataset, nodes: rd.Dataset, n: int, src: str, dst: str,
    iters: int, damping: float, node_t: pa.Field,
) -> rd.Dataset:
    """Small-|V| regime: driver-held rank vector, one Ray execution per
    sweep.  Node ids are compiled to int32 positions on the RAW edge
    list ONCE — the index pass also returns per-batch outdegree
    partials, so no grouped_count and no |E|-wide degree join run at
    all.  Each sweep broadcasts the 8n-byte ranks/outdeg vector and
    folds the per-batch ``np.bincount`` partials (≤ #distinct-dst rows
    each) on the driver.  Same fp-summation-order caveat as the
    distributed path."""
    import ray

    parts = [b.column("node").to_numpy(zero_copy_only=False)
             for b in nodes.iter_batches(batch_size=None, batch_format="pyarrow")]
    node_ids = np.sort(np.concatenate(parts))
    ids_ref = ray.put(node_ids)

    def index_batch(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        si = np.searchsorted(ids, t.column(src).to_numpy(zero_copy_only=False))
        di = np.searchsorted(ids, t.column(dst).to_numpy(zero_copy_only=False))
        return pa.table({"si": si.astype(np.int32), "di": di.astype(np.int32)})

    ewi = edges.map_batches(index_batch, batch_format="pyarrow").materialize()

    def deg_part(t: pa.Table) -> pa.Table:
        c = np.bincount(t.column("si").to_numpy())
        nz = np.flatnonzero(c)
        return pa.table({"i": nz.astype(np.int64), "c": c[nz]})

    outdeg = np.zeros(n)
    for b in ewi.map_batches(deg_part, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        np.add.at(outdeg, b.column("i").to_numpy(), b.column("c").to_numpy())

    base = (1.0 - damping) / n
    ranks = np.full(n, 1.0 / n)
    for _ in range(iters):
        # rod[v] = pr(v)/outdeg(v); positions with outdeg 0 never occur
        # as si, so their (zeroed) entries are never read
        rod = np.divide(ranks, outdeg, out=np.zeros(n), where=outdeg > 0)
        rref = ray.put(rod)

        def sweep(t: pa.Table, _rref=rref) -> pa.Table:
            r = ray.get(_rref)
            w = r[t.column("si").to_numpy()]
            s = np.bincount(t.column("di").to_numpy(), weights=w)
            nz = np.flatnonzero(s)
            return pa.table({"di": nz.astype(np.int64), "s": s[nz]})

        acc = np.zeros(n)
        for b in ewi.map_batches(sweep, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"):
            np.add.at(acc, b.column("di").to_numpy(), b.column("s").to_numpy())
        ranks = base + damping * acc

    out = pa.table({"node": pa.array(node_ids, node_t.type),
                    "pr": pa.array(ranks, pa.float64())})
    return rd.from_arrow(out)


def _bfs_local(
    edges: rd.Dataset, seeds: rd.Dataset, src: str, dst: str, max_hops: int,
) -> rd.Dataset:
    """Tiny-|E| regime: one collect, vectorized frontier expansion on
    the driver (mask edges whose src settled last hop, settle unseen
    targets).  Integer-exact like the distributed path."""
    esch = edges.schema()
    node_type = esch.types[esch.names.index(src)]
    s_parts, d_parts, seed_parts = [], [], []
    for b in edges.iter_batches(batch_size=None, batch_format="pyarrow"):
        s_parts.append(b.column(src).to_numpy(zero_copy_only=False))
        d_parts.append(b.column(dst).to_numpy(zero_copy_only=False))
    for b in seeds.iter_batches(batch_size=None, batch_format="pyarrow"):
        seed_parts.append(
            b.column(b.column_names[0]).to_numpy(zero_copy_only=False))
    sv = np.concatenate(s_parts) if s_parts else np.array([], np.int64)
    dv = np.concatenate(d_parts) if d_parts else np.array([], np.int64)
    sd = np.concatenate(seed_parts) if seed_parts else np.array([], np.int64)
    node_ids = np.unique(np.concatenate([sv, dv, sd]))
    n = len(node_ids)
    si = np.searchsorted(node_ids, sv)
    di = np.searchsorted(node_ids, dv)
    dist = np.full(n, -1, np.int64)
    dist[np.searchsorted(node_ids, sd)] = 0
    for h in range(1, max_hops + 1):
        targets = di[dist[si] == h - 1]
        new = targets[dist[targets] < 0]
        if len(new) == 0:
            break
        dist[new] = h
    reach = dist >= 0
    return rd.from_arrow(pa.table({
        "node": pa.array(node_ids[reach], node_type),
        "hops": pa.array(dist[reach], pa.int64())}))


def bfs_hops(
    edges: rd.Dataset,
    seeds: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 8,
    incore_edges: int = 4_000_000,
) -> rd.Dataset:
    """Multi-source BFS hop distance: min #edges from any seed node,
    capped at ``max_hops`` (crawl depth from a seed list; the iterative
    sibling of the discovery pipeline's per-epoch depth column,
    ``pipelines/discovery.py``).  Unreachable nodes are absent from the
    output.  Integer-exact, so the recursive-CTE oracle matches
    bitwise.

    ``seeds``: a single-column (node) Dataset.  ``|E| <= incore_edges``
    collects once and expands frontiers in driver numpy (Ray's
    per-execution fixed cost dwarfs the masking math there, cf.
    ``pagerank``); otherwise per hop: one adaptive hash_join (edges ⋈
    frontier on src — frontier broadcast while it fits) + one
    grouped-min over |visited|+|candidates| rows; stops early when a
    sweep discovers nothing new.  Returns (node, hops).
    """
    edges = edges.select_columns([src, dst]).materialize()
    if edges.count() <= incore_edges:
        return _bfs_local(edges, seeds, src, dst, max_hops)
    esch = edges.schema()
    node_type = esch.types[esch.names.index(src)]

    def with_hop(h: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": t.column(t.column_names[0]),
                "hops": pa.array(np.full(len(t), h, np.int64)),
            })
        return fn

    visited = relational.grouped_min(
        seeds.map_batches(with_hop(0), batch_format="pyarrow"), "node", ["hops"]
    ).materialize()
    frontier = visited
    n_visited = visited.count()

    for h in range(1, max_hops + 1):
        hits = relational.hash_join(
            edges, _rename(frontier.select_columns(["node"]), [src]), key=src,
            left_schema=pa.schema([pa.field(src, node_type),
                                   pa.field(dst, node_type)]),
            right_schema=pa.schema([pa.field(src, node_type)]),
        )
        cand = hits.map_batches(
            lambda t, _h=h: pa.table({
                "node": t.column(dst),
                "hops": pa.array(np.full(len(t), _h, np.int64)),
            }),
            batch_format="pyarrow",
        )
        # min-hop union: previously-visited nodes keep their smaller hop;
        # rows that come back with hops == h are exactly the new frontier
        visited = relational.grouped_min(
            visited.union(cand), "node", ["hops"]).materialize()
        now = visited.count()
        if now == n_visited:
            break
        n_visited = now
        frontier = visited.map_batches(
            lambda t, _h=h: t.filter(pc.equal(t.column("hops"), _h)),
            batch_format="pyarrow",
        )

    return visited


def node_triangles(
    edges: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    num_partitions: int = 32,
    incore_edges: int = 4_000_000,
    chunk_pairs: int = 16_000_000,
) -> rd.Dataset:
    """Per-node triangle counts over an UNDIRECTED graph (edge list may
    contain either or both directions and duplicates; it is
    canonicalized to distinct ``u < v`` pairs, self-loops dropped).
    Returns (node, tri_cnt); nodes on no triangle are absent.

    Algorithm: degree-oriented node-iterator (Suri & Vassilvitskii,
    WWW'11 MapReduce triangle counting): orient every edge from its
    lower-(degree, id) endpoint to the higher, generate the oriented
    wedges (x, y) under each apex a from a's SORTED out-neighborhood,
    and close a wedge iff the oriented edge (x, y) exists.  Each
    triangle is produced exactly once.  The orientation bounds every
    out-degree by O(sqrt(|E|)) regardless of hub skew, which caps the
    wedge volume at O(|E|^1.5) — the standard scale mitigation; a raw
    id-orientation would square the hottest hub's degree instead.

    Shape: canonicalize (grouped_min) -> two adaptive degree joins
    (degree table is |V| rows -> broadcast while small) -> one
    apex-bucket shuffle for wedges -> one two-sided x-bucket shuffle
    for the closing-edge membership test -> grouped_count per node.
    ``|E| <= incore_edges`` short-circuits to one collect + the same
    numpy kernels on the driver (cf. ``pagerank``), chunked at
    ``chunk_pairs`` wedges so a dense graph can't spike driver memory.

    Partitioning assumption (distributed regime): each of the
    ``num_partitions`` apex buckets materializes its wedge table in
    one worker — size ``num_partitions`` ~ O(|E|^1.5 / target_block)
    for very dense graphs so a bucket's wedges stay block-sized.
    """
    edges = edges.select_columns([src, dst]).materialize()
    esch = edges.schema()
    node_type = esch.types[esch.names.index(src)]

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(src)
        b = t.column(dst)
        u = pc.min_element_wise(a, b)
        v = pc.max_element_wise(a, b)
        keep = pc.not_equal(u, v)
        return pa.table({"u": u.filter(keep), "v": v.filter(keep)})

    pairs = relational.grouped_min(
        edges.map_batches(canon, batch_format="pyarrow"), ["u", "v"], [])

    if edges.count() <= incore_edges:
        return _node_triangles_local(pairs, node_type, chunk_pairs)

    both = pairs.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays(
            [t.column("u").combine_chunks(), t.column("v").combine_chunks()])}),
        batch_format="pyarrow")
    deg = relational.grouped_count(both, ["node"], alias="_deg")

    ju = relational.hash_join(
        pairs, _rename(deg, ["u", "_deg_u"]), key="u")
    juv = relational.hash_join(
        ju, _rename(deg, ["v", "_deg_v"]), key="v")

    def orient(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        du = t.column("_deg_u").to_numpy(zero_copy_only=False)
        dv = t.column("_deg_v").to_numpy(zero_copy_only=False)
        # rank(u) < rank(v) in (deg, id) lexicographic order?  (u < v
        # always holds, so the deg tie-break resolves to u-first)
        u_first = du <= dv
        return pa.table({
            "a": np.where(u_first, u, v),
            "b": np.where(u_first, v, u),
            "_deg_b": np.where(u_first, dv, du).astype(np.int64),
        })

    oriented = juv.map_batches(orient, batch_format="pyarrow").materialize()

    wedge_schema = pa.schema([
        pa.field("x", node_type), pa.field("y", node_type),
        pa.field("apex", node_type)])

    def wedges(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        db = t.column("_deg_b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, db, a))  # group by apex, neighbors rank-sorted
        a, b = a[order], b[order]
        xs, ys, aps = _pairs_within_groups(a, b)
        return pa.table({"x": pa.array(xs, node_type),
                         "y": pa.array(ys, node_type),
                         "apex": pa.array(aps, node_type)})

    wedge_ds = relational.partitioned_map_arrow(
        oriented, ["a"], wedges, wedge_schema, num_partitions=num_partitions)

    # two-sided bucket on the wedge's x / the edge's a: membership test
    types = {"x": node_type, "y": node_type, "apex": node_type}
    all_cols = ["x", "y", "apex"]
    wb = wedge_ds.map_batches(
        relational._union_bucketer("x", 0, all_cols, types, num_partitions),
        batch_format="pyarrow")
    eb = oriented.select_columns(["a", "b"]).map_batches(
        lambda t: t.rename_columns(["x", "y"]), batch_format="pyarrow"
    ).map_batches(
        relational._union_bucketer("x", 1, all_cols, types, num_partitions),
        batch_format="pyarrow")

    tri_schema = pa.schema([pa.field("node", node_type)])

    def close(gt: pa.Table) -> pa.Table:
        side = gt.column("_side").to_numpy(zero_copy_only=False)
        x = gt.column("x").to_numpy(zero_copy_only=False)
        y = gt.column("y").to_numpy(zero_copy_only=False)
        ap = gt.column("apex").to_numpy(zero_copy_only=False)
        w = side == 0
        e = ~w
        hit = _pair_member(x[w], y[w], x[e], y[e])
        nodes = np.concatenate([x[w][hit], y[w][hit], ap[w][hit]])
        return pa.table({"node": pa.array(nodes, node_type)})

    tri_nodes = wb.union(eb).groupby("_bucket").map_groups(
        lambda gt: close(gt).cast(tri_schema).replace_schema_metadata(None),
        batch_format="pyarrow")
    return relational.grouped_count(tri_nodes, ["node"], alias="tri_cnt")


def _pairs_within_groups(g: np.ndarray, vals: np.ndarray):
    """All ordered index pairs (i < j) within runs of equal ``g``
    (assumed grouped/sorted): returns (vals[i], vals[j], g[i]) arrays,
    fully vectorized."""
    n = len(g)
    if n == 0:
        return vals[:0], vals[:0], g[:0]
    starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
    sizes = np.diff(np.concatenate((starts, [n])))
    npairs = sizes * (sizes - 1) // 2
    total = int(npairs.sum())
    if total == 0:
        return vals[:0], vals[:0], g[:0]
    # j index: for each group, rows 1..k-1 repeated (local_j) times
    row_gstart = np.repeat(starts, sizes)                # group start per row
    local = np.arange(n) - row_gstart                    # position in group
    j_idx = np.repeat(np.arange(n), local)               # each row j appears local_j times
    # i index: within each j's block, i runs group-start..j-1
    block_starts = np.repeat(row_gstart, local)
    i_idx = np.arange(total) - np.repeat(
        np.cumsum(np.concatenate(([0], local[:-1]))), local) + block_starts
    return vals[i_idx], vals[j_idx], g[i_idx]


class _PairSet:
    """Vectorized membership in a set of (x, y) pairs.  Node values are
    coded against the sorted unique EDGE endpoints only (queries can be
    30x the edges — sorting their union would dominate); query values
    absent from the edge set get a sentinel code, so their packed keys
    can never equal a real edge key (no false positives).  Packed-key
    width is |uniq|+2 — bucket-local cardinalities keep ``width**2``
    far below 2**63.  Build once, probe many chunks."""

    def __init__(self, ex, ey):
        self.empty = len(ex) == 0
        if self.empty:
            return
        self.uniq = np.unique(np.concatenate([ex, ey]))
        self.width = np.int64(len(self.uniq) + 2)
        self.ek = self._code(ex) * self.width + self._code(ey)
        self.ek.sort()

    def _code(self, v):
        uniq = self.uniq
        pos = np.searchsorted(uniq, v)
        clipped = np.minimum(pos, len(uniq) - 1)
        pos = pos.astype(np.int64)
        pos[uniq[clipped] != v] = len(uniq)  # sentinel
        return pos

    def contains(self, qx, qy) -> np.ndarray:
        if self.empty or len(qx) == 0:
            return np.zeros(len(qx), bool)
        qk = self._code(qx) * self.width + self._code(qy)
        pos = np.searchsorted(self.ek, qk)
        ok = pos < len(self.ek)
        hit = np.zeros(len(qk), bool)
        hit[ok] = self.ek[pos[ok]] == qk[ok]
        return hit


def _pair_member(qx, qy, ex, ey) -> np.ndarray:
    """One-shot convenience wrapper over :class:`_PairSet`."""
    return _PairSet(ex, ey).contains(qx, qy)


def _node_triangles_local(pairs: rd.Dataset, node_type,
                          chunk_pairs: int = 16_000_000) -> rd.Dataset:
    """Tiny-|E| regime: one collect, same oriented-wedge kernels on the
    driver."""
    us, vs = [], []
    for b in pairs.iter_batches(batch_size=None, batch_format="pyarrow"):
        us.append(b.column("u").to_numpy(zero_copy_only=False))
        vs.append(b.column("v").to_numpy(zero_copy_only=False))
    if not us or sum(len(p) for p in us) == 0:
        return rd.from_arrow(pa.table({
            "node": pa.array([], node_type),
            "tri_cnt": pa.array([], pa.int64())}))
    u = np.concatenate(us)
    v = np.concatenate(vs)
    nodes = np.unique(np.concatenate([u, v]))
    deg = (np.bincount(np.searchsorted(nodes, u), minlength=len(nodes))
           + np.bincount(np.searchsorted(nodes, v), minlength=len(nodes)))
    du, dv = deg[np.searchsorted(nodes, u)], deg[np.searchsorted(nodes, v)]
    u_first = du <= dv
    a = np.where(u_first, u, v)
    b = np.where(u_first, v, u)
    db = np.where(u_first, dv, du)
    order = np.lexsort((b, db, a))
    a, b = a[order], b[order]
    # wedge volume is O(|E|^1.5): at the 4M-edge gate a dense graph can
    # emit billions of wedges — process apex groups in pair-count-capped
    # chunks so the peak footprint stays ~CAP rows, accumulating
    # per-node triangle counts as codes into `nodes`
    starts = np.flatnonzero(np.concatenate(([True], a[1:] != a[:-1])))
    ends = np.concatenate((starts[1:], [len(a)]))
    npairs = (ends - starts) * (ends - starts - 1) // 2
    edge_set = _PairSet(a, b)
    counts = np.zeros(len(nodes), np.int64)
    CAP = max(1, int(chunk_pairs))
    g_lo = 0
    while g_lo < len(starts):
        g_hi, acc = g_lo, 0
        while g_hi < len(starts) and (acc == 0 or acc + npairs[g_hi] <= CAP):
            acc += npairs[g_hi]
            g_hi += 1
        lo, hi = starts[g_lo], ends[g_hi - 1]
        xs, ys, aps = _pairs_within_groups(a[lo:hi], b[lo:hi])
        hit = edge_set.contains(xs, ys)
        tri = np.concatenate([xs[hit], ys[hit], aps[hit]])
        np.add.at(counts, np.searchsorted(nodes, tri), 1)
        g_lo = g_hi
    nz = np.flatnonzero(counts)
    return rd.from_arrow(pa.table({
        "node": pa.array(nodes[nz], node_type),
        "tri_cnt": pa.array(counts[nz], pa.int64())}))
