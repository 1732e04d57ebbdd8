"""Distributed decision-tree forest: CART grown level-wise from
feature-value histograms.

Closes the declared ridge substitution for the reference's offline
RandomForest training (`WekaTrainer.java:23-47` trains RandomForest×2
on labeled crawled-media features) with a REAL tree ensemble:

* **Level-wise histogram growth** — one streaming ``map_batches`` pass
  per depth level; each batch routes its rows through the
  tree-so-far and emits at most ``frontier × features × distinct-values``
  partial rows ``(node, feat, value, cnt, pos)``.  The driver folds
  partials and picks splits; the corpus never leaves the workers.
  This is the classic distributed construction (Ben-Haim & Tom-Tov
  JMLR'10 streaming-histogram trees; LightGBM's feature-histogram
  growth).  At 100 TB the driver state per level is bounded by the
  histogram key space — pre-quantize continuous features (the media
  features here are already small-integer-valued).

* **Exact integer split scoring** — counts and 0/1-label sums are
  integers, so merged histograms are exact under ANY block split, and
  weighted Gini impurities are compared as integer cross-products
  (``score = posL·negL/nL + posR·negR/nR`` compared over a common
  denominator in arbitrary-precision Python ints).  NO float enters
  training, so the distributed trainer is **bit-identical** to the
  local reference trainer on the same data — which is what lets the
  DuckDB oracle embed locally-trained trees as CASE expressions while
  the driver's query trains distributed (entry_queries.q_forest_classify).

* **Deterministic forest variation** — tree ``t`` sees feature subset
  ``features[t::stride]`` and the rows with
  ``xxh64(rowid, seed=bag_seed+t) % bag_mod != 0`` (hash-Bernoulli
  bagging — RNG-free, partition/resume-independent, same device as
  ops/sampling.weighted_mix).  A deterministic substitution for Weka's
  seeded bootstrap, declared as such.

Split semantics (pinned, mirrored by :func:`tree_case_sql`):
``value <= threshold`` goes LEFT; thresholds are observed feature
values; ties between candidate splits break to the lowest
(feature-subset index, threshold); a node splits only when the best
candidate STRICTLY reduces weighted impurity and both children keep
``min_leaf`` rows.  Leaves carry ``(pos, n)``; probability = pos/n.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..hashing import xxh64_int64

# flat node arrays: feat == -1 marks a leaf
_LEAF = -1


class Tree:
    """Flat-array binary tree: parallel lists indexed by node id."""

    __slots__ = ("feat", "thr", "left", "right", "pos", "n")

    def __init__(self):
        self.feat: list[int] = [_LEAF]
        self.thr: list[float] = [0.0]
        self.left: list[int] = [_LEAF]
        self.right: list[int] = [_LEAF]
        self.pos: list[int] = [0]
        self.n: list[int] = [0]

    def arrays(self):
        return (np.asarray(self.feat, np.int64), np.asarray(self.thr, np.float64),
                np.asarray(self.left, np.int64), np.asarray(self.right, np.int64))

    def assign(self, X: np.ndarray) -> np.ndarray:
        """Vectorized leaf assignment for an (n, k) feature matrix."""
        feat, thr, left, right = self.arrays()
        node = np.zeros(len(X), np.int64)
        while True:
            f = feat[node]
            live = f != _LEAF
            if not live.any():
                return node
            fv = np.take_along_axis(X, np.maximum(f, 0)[:, None], axis=1)[:, 0]
            nxt = np.where(fv <= thr[node], left[node], right[node])
            node = np.where(live, nxt, node)

    def proba(self, X: np.ndarray) -> np.ndarray:
        leaf = self.assign(X)
        pos = np.asarray(self.pos, np.float64)[leaf]
        n = np.asarray(self.n, np.float64)[leaf]
        return pos / np.maximum(n, 1.0)


def _feature_matrix(tbl: pa.Table, feature_cols: Sequence[str]) -> np.ndarray:
    return np.stack(
        [tbl.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
         for c in feature_cols], axis=1)


_HIST_SCHEMA = pa.schema([
    ("node", pa.int64()), ("feat", pa.int64()), ("value", pa.float64()),
    ("cnt", pa.int64()), ("pos", pa.int64()),
])


def _hist_partial(X: np.ndarray, y: np.ndarray, node: np.ndarray,
                  frontier: np.ndarray) -> pa.Table:
    """Per-batch histogram over rows whose node is in ``frontier``:
    one (node, feat, value) → (cnt, pos) group-by per feature."""
    live = np.isin(node, frontier)
    if not live.any():
        return _HIST_SCHEMA.empty_table()
    X, y, node = X[live], y[live], node[live]
    nodes_o, feats_o, vals_o, cnts_o, poss_o = [], [], [], [], []
    for f in range(X.shape[1]):
        key = np.stack([node, X[:, f]], axis=1)
        order = np.lexsort((X[:, f], node))
        ks = key[order]
        new = np.ones(len(ks), bool)
        new[1:] = (ks[1:] != ks[:-1]).any(axis=1)
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate([starts, [len(ks)]]))
        pos = np.add.reduceat(y[order], starts)
        nodes_o.append(ks[starts, 0].astype(np.int64))
        feats_o.append(np.full(len(starts), f, np.int64))
        vals_o.append(ks[starts, 1])
        cnts_o.append(cnt.astype(np.int64))
        poss_o.append(pos.astype(np.int64))
    return pa.table({
        "node": np.concatenate(nodes_o), "feat": np.concatenate(feats_o),
        "value": np.concatenate(vals_o), "cnt": np.concatenate(cnts_o),
        "pos": np.concatenate(poss_o),
    }, schema=_HIST_SCHEMA)


def _merge_hist(parts: list[pa.Table]) -> pa.Table:
    t = pa.concat_tables([p for p in parts if p.num_rows] or
                         [_HIST_SCHEMA.empty_table()])
    if t.num_rows == 0:
        return t
    node = t.column("node").to_numpy()
    feat = t.column("feat").to_numpy()
    val = t.column("value").to_numpy()
    cnt = t.column("cnt").to_numpy()
    pos = t.column("pos").to_numpy()
    order = np.lexsort((val, feat, node))
    node, feat, val, cnt, pos = (a[order] for a in (node, feat, val, cnt, pos))
    new = np.ones(len(node), bool)
    new[1:] = ((node[1:] != node[:-1]) | (feat[1:] != feat[:-1])
               | (val[1:] != val[:-1]))
    starts = np.flatnonzero(new)
    return pa.table({
        "node": node[starts], "feat": feat[starts], "value": val[starts],
        "cnt": np.add.reduceat(cnt, starts), "pos": np.add.reduceat(pos, starts),
    }, schema=_HIST_SCHEMA)


def _best_split(node_rows: dict[int, np.ndarray], hist: pa.Table,
                min_leaf: int):
    """Exact-integer best split per frontier node.

    Returns {node: (feat, thr, nL, posL) | None} (left-child stats ride
    along so children are stamped without another pass).  Weighted-Gini
    candidates are compared as integer cross-products — ``A/nL + B/nR``
    with ``A = posL·negL`` — over common denominator ``nL·nR``; strict
    improvement over the parent's ``pos·neg/n`` is required."""
    node = hist.column("node").to_numpy()
    feat = hist.column("feat").to_numpy()
    val = hist.column("value").to_numpy()
    cnt = hist.column("cnt").to_numpy()
    pos = hist.column("pos").to_numpy()
    out: dict[int, tuple[int, float, int, int] | None] = {}
    for nd, (n_tot, pos_tot) in node_rows.items():
        best = None  # (N, D, feat, thr, nl, pl) with score N/D
        parent_num = pos_tot * (n_tot - pos_tot)  # over denominator n_tot
        m = node == nd
        for f in np.unique(feat[m]):
            fm = m & (feat == f)
            v = val[fm]
            c_cum = np.cumsum(cnt[fm])
            p_cum = np.cumsum(pos[fm])
            # candidate i: left = values <= v[i]  (skip the last: empty right)
            for i in range(len(v) - 1):
                nl, pl = int(c_cum[i]), int(p_cum[i])
                nr, pr = n_tot - nl, pos_tot - pl
                if nl < min_leaf or nr < min_leaf:
                    continue
                N = pl * (nl - pl) * nr + pr * (nr - pr) * nl
                D = nl * nr
                # strict gain: N/D < parent_num/n_tot
                if N * n_tot >= parent_num * D:
                    continue
                if best is None or N * best[1] < best[0] * D:
                    best = (N, D, int(f), float(v[i]), nl, pl)
        out[nd] = None if best is None else best[2:]
    return out


def train_tree(data, feature_cols: Sequence[str], label_col: str = "label",
               max_depth: int = 4, min_leaf: int = 20,
               bag: tuple[str, int, int] | None = None) -> Tree:
    """Grow one CART tree level-wise.  ``data`` is a ``ray.data.Dataset``
    (distributed histogram passes) or a ``pyarrow.Table`` (the no-Ray
    path used by fixture/oracle builders) — both produce the SAME tree
    bit-for-bit (integer-exact histograms and scoring).

    ``bag=(id_col, seed, mod)`` keeps only rows with
    ``xxh64(id, seed) % mod != 0`` (deterministic bagging)."""
    feature_cols = list(feature_cols)
    is_ray = isinstance(data, rd.Dataset)
    tree = Tree()

    if is_ray:
        cols = feature_cols + [label_col] + ([bag[0]] if bag else [])
        ds = data.select_columns(list(dict.fromkeys(cols))).materialize()
    else:
        tbl_X = _feature_matrix(data, feature_cols)
        tbl_y = data.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if bag is not None:
            ids = data.column(bag[0]).to_numpy(zero_copy_only=False).astype(np.int64)
            keep = xxh64_int64(ids, seed=bag[1]) % np.uint64(bag[2]) != 0
            tbl_X, tbl_y = tbl_X[keep], tbl_y[keep]

    def hist_pass(frontier: np.ndarray) -> pa.Table:
        ft = tree.feat[:]
        th = tree.thr[:]
        lf = tree.left[:]
        rg = tree.right[:]

        def snapshot() -> Tree:
            t2 = Tree()
            t2.feat, t2.thr, t2.left, t2.right = ft, th, lf, rg
            t2.pos = [0] * len(ft)
            t2.n = [0] * len(ft)
            return t2

        if not is_ray:
            t2 = snapshot()
            return _merge_hist([_hist_partial(
                tbl_X, tbl_y, t2.assign(tbl_X), frontier)])

        def part(tbl: pa.Table) -> pa.Table:
            X = _feature_matrix(tbl, feature_cols)
            y = tbl.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if bag is not None:
                ids = tbl.column(bag[0]).to_numpy(zero_copy_only=False).astype(np.int64)
                keep = xxh64_int64(ids, seed=bag[1]) % np.uint64(bag[2]) != 0
                X, y = X[keep], y[keep]
            t2 = snapshot()
            return _hist_partial(X, y, t2.assign(X), frontier)

        parts = list(ds.map_batches(part, batch_format="pyarrow")
                     .iter_batches(batch_format="pyarrow"))
        return _merge_hist([pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
                            for b in parts])

    # frontier = splittable leaves; children stats come from the chosen
    # split candidate itself, so each level costs exactly ONE pass and
    # no trailing stamp pass is needed.  Root stats are read off the
    # first pass's feature-0 histogram.
    frontier = np.array([0], np.int64)
    root_stamped = False
    for depth in range(max(max_depth, 1)):
        if len(frontier) == 0:
            break
        hist = hist_pass(frontier)
        frontier, root_stamped = _grow_level(
            tree, hist, frontier, min_leaf, root_stamped,
            allow_split=depth < max_depth)
        if frontier is None:
            break
    return tree


def _grow_level(tree: Tree, hist: pa.Table, frontier: np.ndarray,
                min_leaf: int, root_stamped: bool, allow_split: bool):
    """Apply ONE level's merged histogram to ``tree``: stamp root stats
    on the first non-empty pass, pick/apply the best splits, append the
    children.  Returns ``(next_frontier | None, root_stamped)`` —
    ``None`` means the tree is finished (the shared level driver of
    :func:`train_tree` and :func:`train_trees_joint`; body extracted
    verbatim from the round-4 train_tree loop)."""
    if hist.num_rows == 0:
        return None, root_stamped
    if not root_stamped:
        feat_a = hist.column("feat").to_numpy()
        m = feat_a == feat_a.min()
        tree.n[0] = int(hist.column("cnt").to_numpy()[m].sum())
        tree.pos[0] = int(hist.column("pos").to_numpy()[m].sum())
        root_stamped = True
    if not allow_split:  # max_depth=0: stats-only pass, no split
        return None, root_stamped
    node_rows = {
        int(nd): (tree.n[int(nd)], tree.pos[int(nd)]) for nd in frontier
        if 0 < tree.pos[int(nd)] < tree.n[int(nd)]
        and tree.n[int(nd)] >= 2 * min_leaf
    }
    if not node_rows:
        return None, root_stamped
    splits = _best_split(node_rows, hist, min_leaf)
    nxt = []
    for nd in sorted(splits):
        sp = splits[nd]
        if sp is None:
            continue
        f, thr, nl, pl = sp
        n_tot, pos_tot = node_rows[nd]
        tree.feat[nd] = f
        tree.thr[nd] = thr
        for side, side_n, side_pos in (("left", nl, pl),
                                       ("right", n_tot - nl, pos_tot - pl)):
            child = len(tree.feat)
            getattr(tree, side)[nd] = child
            tree.feat.append(_LEAF)
            tree.thr.append(0.0)
            tree.left.append(_LEAF)
            tree.right.append(_LEAF)
            tree.pos.append(side_pos)
            tree.n.append(side_n)
        nxt.extend([tree.left[nd], tree.right[nd]])
    return np.asarray(nxt, np.int64), root_stamped


_HIST_TREE_SCHEMA = pa.schema(list(_HIST_SCHEMA) + [("tree", pa.int64())])


def train_trees_joint(data: rd.Dataset, specs, label_col: str = "label",
                      max_depth: int = 4, min_leaf: int = 20) -> list[Tree]:
    """Train MANY trees level-wise with ONE Ray execution per level:
    each histogram task computes every live tree's partial over its
    batch (per-tree feature subset + hash bag), tagged with the tree
    index; the driver merges per tree and grows all frontiers.  Bit
    identical to per-tree :func:`train_tree` (the per-tree partials and
    integer merges are untouched — only the pass scheduling fuses), but
    a T-tree forest costs ``max_depth`` full-data passes instead of
    ``T × max_depth`` — the difference between 5 and 20 corpus scans
    for the RF×2 media ensemble, and the 100 TB-relevant shape.

    ``specs``: ``[(feature_cols, bag | None), ...]`` with ``bag =
    (id_col, seed, mod)`` as in :func:`train_tree`."""
    specs = [(list(fc), bag) for fc, bag in specs]
    cols = {label_col}
    for fc, bag in specs:
        cols.update(fc)
        if bag:
            cols.add(bag[0])
    ds = data.select_columns(sorted(cols)).materialize()
    trees = [Tree() for _ in specs]
    frontiers: list[np.ndarray | None] = [np.array([0], np.int64)
                                          for _ in specs]
    stamped = [False] * len(specs)
    for depth in range(max(max_depth, 1)):
        live = [i for i, fr in enumerate(frontiers)
                if fr is not None and len(fr)]
        if not live:
            break
        snaps = {i: (trees[i].feat[:], trees[i].thr[:],
                     trees[i].left[:], trees[i].right[:]) for i in live}
        frs = {i: frontiers[i] for i in live}
        lspecs = {i: specs[i] for i in live}

        def part(tbl: pa.Table, live=live, snaps=snaps, frs=frs,
                 lspecs=lspecs) -> pa.Table:
            y_all = tbl.column(label_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            outs = []
            for i in live:
                fc, bag = lspecs[i]
                X = _feature_matrix(tbl, fc)
                y = y_all
                if bag is not None:
                    ids = tbl.column(bag[0]).to_numpy(
                        zero_copy_only=False).astype(np.int64)
                    keep = xxh64_int64(ids, seed=bag[1]) % np.uint64(bag[2]) != 0
                    X, y = X[keep], y[keep]
                t2 = Tree()
                t2.feat, t2.thr, t2.left, t2.right = snaps[i]
                t2.pos = [0] * len(t2.feat)
                t2.n = [0] * len(t2.feat)
                h = _hist_partial(X, y, t2.assign(X), frs[i])
                outs.append(h.append_column(
                    "tree", pa.array(np.full(h.num_rows, i, np.int64))))
            return (pa.concat_tables(outs) if outs
                    else _HIST_TREE_SCHEMA.empty_table())

        batches = list(ds.map_batches(part, batch_format="pyarrow")
                       .iter_batches(batch_format="pyarrow"))
        big = pa.concat_tables(
            [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
             else b for b in batches] or [_HIST_TREE_SCHEMA.empty_table()])
        tcol = big.column("tree") if big.num_rows else None
        allow = depth < max_depth
        for i in live:
            hist_i = (_merge_hist(
                [big.filter(pc.equal(tcol, i)).drop_columns(["tree"])])
                if tcol is not None else _HIST_SCHEMA.empty_table())
            frontiers[i], stamped[i] = _grow_level(
                trees[i], hist_i, frs[i], min_leaf, stamped[i],
                allow_split=allow)
    return trees


def forest_specs(feature_cols: Sequence[str], n_trees: int = 2,
                 id_col: str | None = None, bag_seed: int = 7100,
                 bag_mod: int = 4, stride: int = 2):
    """The (feature subset, bag) spec per tree of a hash-bagged forest —
    shared by :func:`train_forest` and callers fusing several forests
    into one :func:`train_trees_joint` schedule."""
    feature_cols = list(feature_cols)
    return [
        (feature_cols[t % stride::stride],
         (id_col, bag_seed + t, bag_mod) if id_col else None)
        for t in range(n_trees)
    ]


def train_forest(data, feature_cols: Sequence[str], label_col: str = "label",
                 n_trees: int = 2, max_depth: int = 4, min_leaf: int = 20,
                 id_col: str | None = None, bag_seed: int = 7100,
                 bag_mod: int = 4, stride: int = 2) -> list[tuple[Tree, list[str]]]:
    """Train ``n_trees`` trees; tree t uses feature subset
    ``feature_cols[t % stride::stride]`` and (when ``id_col`` is given)
    the deterministic hash-bag ``xxh64(id, bag_seed+t) % bag_mod != 0``.
    Returns ``[(tree, its feature subset), ...]``.  A Ray Dataset input
    trains all trees JOINTLY (one pass per level —
    :func:`train_trees_joint`); the pyarrow path stays per-tree (the
    no-Ray oracle builder) — both bit-identical."""
    specs = forest_specs(feature_cols, n_trees, id_col, bag_seed,
                         bag_mod, stride)
    if isinstance(data, rd.Dataset):
        trees = train_trees_joint(data, specs, label_col=label_col,
                                  max_depth=max_depth, min_leaf=min_leaf)
        return [(tr, sub) for tr, (sub, _) in zip(trees, specs)]
    return [(train_tree(data, sub, label_col=label_col, max_depth=max_depth,
                        min_leaf=min_leaf, bag=bag), sub)
            for sub, bag in specs]


def forest_proba(tbl: pa.Table, forest: list[tuple[Tree, list[str]]]) -> np.ndarray:
    """Mean of per-tree leaf probabilities, column-stacked per tree
    first (same expression order as the SQL mirror: (p0+p1+...)/T)."""
    ps = [tree.proba(_feature_matrix(tbl, sub)) for tree, sub in forest]
    acc = ps[0].copy()
    for p in ps[1:]:
        acc = acc + p
    return acc / float(len(ps))


def tree_case_sql(tree: Tree, feature_cols: Sequence[str],
                  node: int = 0) -> str:
    """The tree as a nested SQL CASE expression yielding the leaf
    probability ``pos/n`` as a DuckDB DOUBLE division of the embedded
    integers (same IEEE division the numpy side performs)."""
    f = tree.feat[node]
    if f == _LEAF:
        n = max(tree.n[node], 1)
        return f"(CAST({tree.pos[node]} AS DOUBLE) / {n})"
    thr = repr(tree.thr[node])
    lhs = tree_case_sql(tree, feature_cols, tree.left[node])
    rhs = tree_case_sql(tree, feature_cols, tree.right[node])
    return (f"(CASE WHEN {feature_cols[f]} <= {thr} THEN {lhs} "
            f"ELSE {rhs} END)")
