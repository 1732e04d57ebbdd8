"""Distributed CART forest: local == distributed bit-parity, split
semantics, SQL mirror."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from cc_warc_examples_ray import synth
from cc_warc_examples_ray.ops import forest

FEATS = ["attr_w", "attr_h", "url_w", "url_h", "alt_len", "elem_img",
         "same_domain", "dom_depth", "dom_sib", "suffix_gif"]


def _train_table(n=1200):
    t = synth.media_training_table(n)
    return t.append_column("rowid", pa.array(np.arange(n), pa.int64()))


def _tree_tuple(tr: forest.Tree):
    return (tr.feat, tr.thr, tr.left, tr.right, tr.pos, tr.n)


def test_local_vs_distributed_bit_identical(ray_session):
    t = _train_table()
    local = forest.train_tree(t, FEATS, max_depth=4, min_leaf=20)
    # different block splits must not change the tree (integer-exact)
    for nblocks in (3, 17):
        ds = rd.from_arrow(t).repartition(nblocks)
        dist = forest.train_tree(ds, FEATS, max_depth=4, min_leaf=20)
        assert _tree_tuple(dist) == _tree_tuple(local)


def test_bagging_and_subsets_differ():
    t = _train_table()
    f = forest.train_forest(t, FEATS, n_trees=2, max_depth=3,
                            min_leaf=20, id_col="rowid")
    (t0, sub0), (t1, sub1) = f
    assert sub0 == FEATS[0::2] and sub1 == FEATS[1::2]
    assert _tree_tuple(t0) != _tree_tuple(t1)
    # forest accuracy beats the base rate on its own training data
    proba = forest.forest_proba(t, f)
    y = t.column("label").to_numpy()
    acc = ((proba >= 0.5).astype(int) == y).mean()
    base = max(y.mean(), 1 - y.mean())
    assert acc > base + 0.05


def test_forest_heldout_f1():
    # same bar as the ridge ensemble (test_features F1 >= 0.9): the
    # 2-tree forest must generalize to a differently-seeded eval table
    train = synth.media_training_table(4000)
    train = train.append_column(
        "rowid", pa.array(np.arange(train.num_rows), pa.int64()))
    f = forest.train_forest(train, FEATS, n_trees=2, max_depth=5,
                            min_leaf=20, id_col="rowid")
    ev = synth.media_training_table(1500, seed=synth.GLOBAL_SEED + 10)
    pred = (forest.forest_proba(ev, f) >= 0.5).astype(int)
    y = ev.column("label").to_numpy()
    tp = ((pred == 1) & (y == 1)).sum()
    fp = ((pred == 1) & (y == 0)).sum()
    fn = ((pred == 0) & (y == 1)).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.9


def test_split_semantics_tiny():
    # one feature cleanly separates at x <= 1
    x = np.array([0, 0, 1, 1, 2, 2, 3, 3] * 4, np.float64)
    y = np.array([1, 1, 1, 1, 0, 0, 0, 0] * 4, np.int64)
    t = pa.table({"x": x, "label": y})
    tr = forest.train_tree(t, ["x"], max_depth=2, min_leaf=2)
    assert tr.feat[0] == 0 and tr.thr[0] == 1.0
    lf, rt = tr.left[0], tr.right[0]
    assert (tr.pos[lf], tr.n[lf]) == (16, 16)
    assert (tr.pos[rt], tr.n[rt]) == (0, 16)
    # children are pure -> no further split
    assert tr.feat[lf] == forest._LEAF and tr.feat[rt] == forest._LEAF


def test_pure_node_no_split():
    t = pa.table({"x": np.arange(40, dtype=np.float64),
                  "label": np.zeros(40, np.int64)})
    tr = forest.train_tree(t, ["x"], max_depth=3, min_leaf=2)
    assert tr.feat[0] == forest._LEAF and tr.n[0] == 40 and tr.pos[0] == 0


def test_forest_edge_cases():
    # max_depth=0 -> a single stamped leaf
    t = pa.table({"x": np.arange(100, dtype=np.float64),
                  "label": (np.arange(100) % 2).astype(np.int64)})
    tr = forest.train_tree(t, ["x"], max_depth=0, min_leaf=2)
    assert tr.feat == [forest._LEAF] and tr.n[0] == 100 and tr.pos[0] == 50
    # single distinct feature value -> no candidate, root stays a leaf
    t1 = pa.table({"x": np.full(60, 7.0),
                   "label": (np.arange(60) % 2).astype(np.int64)})
    tr1 = forest.train_tree(t1, ["x"], max_depth=3, min_leaf=2)
    assert tr1.feat[0] == forest._LEAF and tr1.n[0] == 60
    # min_leaf larger than any admissible child -> no split
    t2 = pa.table({"x": np.array([0.0, 1.0] * 20),
                   "label": np.array([1, 0] * 20, np.int64)})
    tr2 = forest.train_tree(t2, ["x"], max_depth=3, min_leaf=30)
    assert tr2.feat[0] == forest._LEAF
    # proba on an empty-region leaf never divides by zero
    assert np.isfinite(tr2.proba(np.array([[5.0]]))).all()


def test_tree_sql_mirror():
    t = _train_table(800)
    tr = forest.train_tree(t, FEATS[0::2], max_depth=4, min_leaf=15)
    expr = forest.tree_case_sql(tr, FEATS[0::2])
    con = duckdb.connect()
    con.register("t", t)
    got = con.execute(f"SELECT {expr} AS p FROM t").fetchnumpy()["p"]
    want = tr.proba(forest._feature_matrix(t, FEATS[0::2]))
    assert np.array_equal(got, want)  # bit-identical IEEE divisions
