"""Iterative graph operators (ops/graph.py): PageRank and multi-source
BFS pinned against driver-side numpy/python references on randomized
graphs, plus the degenerate shapes (empty graph, isolated seeds,
single-node early stop)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from cc_warc_examples_ray.ops import graph


def _random_edges(seed: int, n_nodes: int = 60, n_draws: int = 400):
    rng = np.random.default_rng(seed)
    e = rng.integers(0, n_nodes, size=(n_draws, 2))
    e = e[e[:, 0] != e[:, 1]]
    return np.unique(e, axis=0)


def _ref_pagerank(E: np.ndarray, iters: int = 5, d: float = 0.85):
    nodes = np.unique(E)
    idx = {int(v): i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for a, b in E:
        outdeg[idx[a]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        s = np.zeros(n)
        for a, b in E:
            if outdeg[idx[a]]:
                s[idx[b]] += pr[idx[a]] / outdeg[idx[a]]
        pr = (1 - d) / n + d * s
    return {int(v): pr[idx[int(v)]] for v in nodes}


def _ref_bfs(E: np.ndarray, seeds, max_hops: int):
    adj: dict[int, list[int]] = {}
    for a, b in E:
        adj.setdefault(int(a), []).append(int(b))
    dist = {int(v): 0 for v in seeds}
    frontier = [int(v) for v in seeds]
    h = 0
    while frontier and h < max_hops:
        h += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    return dist


# gates pick the regime: driver-local sweeps / driver-held rank vector
# with distributed edges / fully distributed join+groupby sweeps
_PR_REGIMES = {
    "local": {},
    "driver-ranks": {"incore_edges": 0},
    "distributed": {"incore_edges": 0, "incore_nodes": 0},
}


@pytest.mark.parametrize("seed,regime", [
    (0, "local"), (1, "local"), (2, "local"),
    (0, "driver-ranks"), (1, "driver-ranks"),
    (0, "distributed"),
])
def test_pagerank_matches_reference(ray_session, seed, regime):
    E = _random_edges(seed)
    ds = rd.from_arrow(pa.table({"src": E[:, 0], "dst": E[:, 1]})).repartition(7)
    got = graph.pagerank(ds, iters=5, **_PR_REGIMES[regime]).to_pandas()
    ref = _ref_pagerank(E)
    assert len(got) == len(ref)
    for node, pr in zip(got["node"], got["pr"]):
        assert abs(pr - ref[int(node)]) < 1e-12
    # ranks + leaked dangling mass stay a probability distribution bound
    assert got["pr"].sum() <= 1.0 + 1e-9


def test_pagerank_simple_directed_chain(ray_session):
    # a -> b -> c: hand-computable 1-iteration ranks with leaked mass
    ds = rd.from_arrow(pa.table({"src": [10, 11], "dst": [11, 12]}))
    got = graph.pagerank(ds, iters=1, damping=0.85).to_pandas()
    n = 3
    base = 0.15 / n
    ref = {10: base, 11: base + 0.85 * (1 / n), 12: base + 0.85 * (1 / n)}
    for node, pr in zip(got["node"], got["pr"]):
        assert abs(pr - ref[int(node)]) < 1e-15


@pytest.mark.parametrize("seed,max_hops,incore_edges", [
    (3, 3, 4_000_000), (4, 8, 4_000_000), (3, 3, 0), (4, 8, 0),
])
def test_bfs_matches_reference(ray_session, seed, max_hops, incore_edges):
    E = _random_edges(seed)
    seeds = np.unique(E)[:4]
    ds = rd.from_arrow(pa.table({"src": E[:, 0], "dst": E[:, 1]})).repartition(5)
    sd = rd.from_arrow(pa.table({"node": seeds}))
    got = graph.bfs_hops(ds, sd, max_hops=max_hops,
                         incore_edges=incore_edges).to_pandas()
    ref = _ref_bfs(E, seeds, max_hops)
    assert {int(k): int(v) for k, v in zip(got["node"], got["hops"])} == ref


def test_bfs_isolated_seed_and_early_stop(ray_session):
    # seed 99 has no edges; component {0,1} exhausts after hop 1 out of 8
    ds = rd.from_arrow(pa.table({"src": [0, 1], "dst": [1, 0]}))
    sd = rd.from_arrow(pa.table({"node": [0, 99]}))
    got = graph.bfs_hops(ds, sd, max_hops=8).to_pandas()
    assert {int(k): int(v) for k, v in zip(got["node"], got["hops"])} == {
        0: 0, 99: 0, 1: 1}


def _ref_triangles(E_canon):
    adj = {}
    for u, v in E_canon:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    cnt = {}
    for u, v in E_canon:
        for w in adj[u] & adj[v]:
            if u < v < w:
                for x in (u, v, w):
                    cnt[x] = cnt.get(x, 0) + 1
    return cnt


@pytest.mark.parametrize("seed,incore_edges", [
    (0, 4_000_000), (1, 4_000_000), (0, 0), (2, 0),
])
def test_node_triangles_matches_reference(ray_session, seed, incore_edges):
    rng = np.random.default_rng(seed)
    e = rng.integers(0, 40, size=(500, 2))
    e = e[e[:, 0] != e[:, 1]]
    canon = set((min(a, b), max(a, b)) for a, b in e)
    # both directions + duplicates: exercises canonicalization
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(5)
    got = graph.node_triangles(ds, incore_edges=incore_edges).to_pandas()
    ref = _ref_triangles(canon)
    assert dict(zip(got["node"].astype(int), got["tri_cnt"].astype(int))) == ref


def test_node_triangles_triangle_free(ray_session):
    # star graph: no triangles -> empty output, schema intact
    ds = rd.from_arrow(pa.table({"src": [0, 0, 0], "dst": [1, 2, 3]}))
    got = graph.node_triangles(ds)
    # ray to_pandas drops columns at 0 rows; assert on the Dataset schema
    assert got.schema().names == ["node", "tri_cnt"]
    assert got.count() == 0


def test_pair_member_absent_values_never_match():
    # query pairs with components outside the edge set must not collide
    # with real keys via the sentinel code
    ex = np.array([1, 2, 3]); ey = np.array([2, 3, 4])
    qx = np.array([1, 99, 98, 2]); qy = np.array([2, 97, 97, 3])
    hit = graph._pair_member(qx, qy, ex, ey)
    assert hit.tolist() == [True, False, False, True]


def test_pairs_within_groups_exhaustive():
    g = np.array([0, 0, 0, 2, 2, 5])
    v = np.array([7, 8, 9, 1, 2, 3])
    xs, ys, aps = graph._pairs_within_groups(g, v)
    got = sorted(zip(aps.tolist(), xs.tolist(), ys.tolist()))
    assert got == [(0, 7, 8), (0, 7, 9), (0, 8, 9), (2, 1, 2)]


def test_node_triangles_chunked_local_matches(ray_session):
    # chunk_pairs=7 forces many pair-capped chunks through the local
    # path; counts must be identical to the unchunked run
    rng = np.random.default_rng(7)
    e = rng.integers(0, 30, size=(300, 2))
    e = e[e[:, 0] != e[:, 1]]
    ds = rd.from_arrow(pa.table({"src": e[:, 0], "dst": e[:, 1]}))
    big = graph.node_triangles(ds).to_pandas()
    small = graph.node_triangles(ds, chunk_pairs=7).to_pandas()
    assert big.sort_values("node").values.tolist() == \
        small.sort_values("node").values.tolist()
    ref = _ref_triangles(set((min(a, b), max(a, b)) for a, b in e))
    assert dict(zip(big["node"].astype(int), big["tri_cnt"].astype(int))) == ref


def test_graph_edge_cases(ray_session):
    # iters=0 -> uniform distribution; BFS with zero seeds -> empty
    ds = rd.from_arrow(pa.table({"src": [1, 2], "dst": [2, 3]}))
    out = graph.pagerank(ds, iters=0).to_pandas()
    assert all(abs(p - 1 / 3) < 1e-15 for p in out["pr"])
    sd = rd.from_arrow(pa.table({"node": pa.array([], pa.int64())}))
    assert graph.bfs_hops(ds, sd).count() == 0
