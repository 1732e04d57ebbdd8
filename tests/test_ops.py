"""Unit tests for the generic operator library (relational, dedup, text,
ann) on small synthetic Arrow tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from cc_warc_examples_ray.ops import ann, dedup, relational, text


@pytest.fixture()
def docs_ds(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "completely different content about rivers and mountains",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "",                                               # empty
        "unique short text",
    ]
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(6), pa.int64()), "text": texts})
    )


def test_grouped_count_and_topk(ray_session):
    t = pa.table({"k": ["a", "b", "a", "c", "a", "b"], "v": [1, 2, 3, 4, 5, 6]})
    ds = rd.from_arrow(t)
    out = relational.grouped_count(ds, ["k"], alias="cnt").to_pandas().sort_values("k")
    assert out["cnt"].tolist() == [3, 2, 1]
    top = relational.topk(rd.from_arrow(t), "v", 2).to_pandas()
    assert top["v"].tolist() == [6, 5]


def test_first_per_key(ray_session):
    t = pa.table({"k": ["x", "x", "y", "y"], "r": [5, 2, 9, 1], "p": ["a", "b", "c", "d"]})
    out = relational.first_per_key(rd.from_arrow(t), "k", "r").to_pandas().sort_values("k")
    assert out["r"].tolist() == [2, 1]
    assert out["p"].tolist() == ["b", "d"]


def test_first_per_key_tiebreak_deterministic(ray_session):
    """Equal (key, order_col) rows: the winner must come from the
    tiebreak columns, not from block-assembly order — both input orders
    give the same survivor."""
    rows = {"k": ["x", "x"], "r": [1, 1], "p": ["zz", "aa"]}
    rev = {c: v[::-1] for c, v in rows.items()}
    for data in (rows, rev):
        out = relational.first_per_key(
            rd.from_arrow(pa.table(data)), "k", "r", tiebreak=("p",)
        ).to_pandas()
        assert out["p"].tolist() == ["aa"]


def test_embedding_ops_tolerate_null_rows(ray_session):
    """A null embedding row (failed upstream compute) is dropped by the
    sketch/scorer/assign stages instead of crashing the batch."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal((8, 8))
    emb = pa.array(list(base) + [None], pa.list_(pa.float64()))
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(range(9), pa.int64()),
                                 "embedding": emb}))
    pairs = dedup.embedding_neardup_pairs(ds, dim=8, threshold=0.999, bits=4).to_pandas()
    assert 8 not in set(pairs.get("id_a", [])) | set(pairs.get("id_b", []))
    top = ann.brute_force_topk(ds, {0: base[0].tolist()}, k=3)
    assert 8 not in top["vec_id"].tolist() and top["vec_id"].iloc[0] == 0
    cent = ann.train_centroids(ds, n_centroids=2, sample=20)
    assigned = ann.ivf_assign(ds, cent)
    assert assigned.count() == 8  # null row unindexable
    bf = dedup.brute_force_pairs(ds, threshold=0.999)
    assert 8 not in set(bf["id_a"]) | set(bf["id_b"])


def test_quality_scores_non_ascii():
    """Codepoint classes, not utf-8 bytes: clean non-ASCII prose has ~0
    punctuation ratio (bytes would score every continuation byte)."""
    t = pa.table({"doc_id": [1, 2],
                  "text": ["naïve café prose située ailleurs",
                           "これは日本語のきれいな文章です"]})
    out = text.quality_scores(t).to_pandas()
    assert (out["punct_ratio"] == 0.0).all()
    assert out.loc[0, "n_chars_text"] == len("naïve café prose située ailleurs")


def test_repetition_scores_handcrafted():
    """Gopher-style repetition metrics against hand-computed values,
    chunk-boundary stable (the line kernel folds flattened list values
    by parent index — a wrong offset base would shift every doc)."""
    t = pa.table({"doc_id": ["a", "b", "c", "d"], "text": [
        "hello world\nhello world\nbye",   # 1 dup line of 3
        "x y x y x y x y",                 # bigram 'x y' covers all chars
        "",                                # degenerate
        "one\n\ntwo\nthree",               # blank line must not count
    ]})
    for tab in (t, pa.Table.from_batches(t.to_batches(max_chunksize=2))):
        out = text.repetition_scores(tab).to_pandas().set_index("doc_id")
        assert out.loc["a", "dup_line_frac"] == pytest.approx(1 / 3)
        assert out.loc["a", "dup_line_char_frac"] == pytest.approx(11 / 25)
        # 'hello world' x2 occurrences x 10 chars over 23 word chars
        assert out.loc["a", "top_bigram_char_frac"] == pytest.approx(20 / 23)
        assert out.loc["b", "top_bigram_char_frac"] == 1.0
        metrics = ["dup_line_frac", "dup_line_char_frac", "top_bigram_char_frac"]
        assert (out.loc["c", metrics] == 0.0).all()
        assert out.loc["d", "dup_line_frac"] == 0.0
        # tie between 'one two' and 'two three' -> smallest bigram wins
        assert out.loc["d", "top_bigram_char_frac"] == pytest.approx(6 / 11)


def test_decontaminate_handcrafted(ray_session):
    """Benchmark n-gram decontamination: hand-computed hit counts, drop
    mode, and the no-benchmark edge (empty index ⇒ nothing flagged)."""
    import ray.data as rd

    docs = pa.table({"doc_id": [0, 1, 2, 3], "text": [
        "the quick brown fox jumps",    # shares 'the quick brown' w/ bench
        "a totally different sentence here",
        "quick brown fox",              # exactly one bench 3-gram
        "xy",                           # < 3 words -> zero ngrams
    ]})
    bench = pa.table({"doc_id": [100], "text": ["the quick brown fox"]})
    out = text.decontaminate(
        rd.from_arrow(docs), rd.from_arrow(bench), n=3
    ).to_pandas().set_index("doc_id").sort_index()
    # bench grams: {'the quick brown', 'quick brown fox'}
    assert out["n_ngrams"].tolist() == [3, 3, 1, 0]
    assert out["n_hits"].tolist() == [2, 0, 1, 0]
    assert out["contaminated"].tolist() == [True, False, True, False]
    kept = text.decontaminate(
        rd.from_arrow(docs), rd.from_arrow(bench), n=3, drop=True
    ).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [1, 3]
    # empty benchmark: index is empty, nothing contaminated
    none = text.decontaminate(
        rd.from_arrow(docs), rd.from_arrow(bench.slice(0, 0)), n=3
    ).to_pandas()
    assert not none["contaminated"].any()


def test_kmeans_lloyd_matches_single_process(ray_session):
    """Distributed Lloyd == the numpy kmeans_l2 loop from the same init
    (same assignment rule, same empty-cluster rule), across block splits."""
    rng = np.random.default_rng(42)
    mat = rng.normal(size=(300, 16))
    init = mat[:5].copy()
    # single-process reference: 3 exact Lloyd iterations from init
    want = init.copy()
    for _ in range(3):
        d = ((mat[:, None, :] - want[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)
        for c in range(len(want)):
            m = a == c
            if m.any():
                want[c] = mat[m].mean(axis=0)
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float64())),
    }))
    for nblocks in (1, 7):
        got, counts = ann.kmeans_lloyd(
            ds.repartition(nblocks), init, iters=3, return_counts=True)
        assert np.allclose(got, want, atol=1e-9)
        assert counts.sum() == 300
    # run-to-run BITWISE determinism on a fixed split: the driver fold
    # sorts partial rows by value, so batch arrival order cannot leak
    ds7 = ds.repartition(7).materialize()
    g1 = ann.kmeans_lloyd(ds7, init, iters=3)
    g2 = ann.kmeans_lloyd(ds7, init, iters=3)
    assert np.array_equal(g1, g2)
    # null embeddings are dropped, not crashed on
    with_null = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([None, mat[0].tolist()], pa.list_(pa.float64())),
    })
    got1, c1 = ann.kmeans_lloyd(rd.from_arrow(with_null), init, iters=1,
                                return_counts=True)
    assert c1.sum() == 1


def test_semdedup_keep_first(ray_session):
    """Within-cluster keep-first pruning: a vector drops iff a LOWER-id
    same-cluster vector is cosine-similar above the threshold."""
    # two well-separated clusters on axes; c0 has 3 near-identical
    # vectors + 1 orthogonal-ish, c1 has 2 distinct vectors
    e = np.eye(8)
    vecs = {
        0: e[0], 1: e[0] * 0.99 + e[1] * 0.01, 2: e[1],
        3: e[0] * 0.98 + e[1] * 0.02,
        10: e[4], 11: e[4] * 0.5 + e[5] * 0.5,  # cluster 1; cos(10,11)=.707
    }
    cent = np.stack([e[0], e[4]])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(sorted(vecs), pa.int64()),
        "embedding": pa.array([vecs[k].tolist() for k in sorted(vecs)],
                              pa.list_(pa.float64())),
    }))
    out = dedup.semdedup_keep(ds, cent, threshold=0.95).to_pandas()
    out = out.sort_values("vec_id").set_index("vec_id")
    # ids 1 and 3 are near-dups of 0 (cos ~0.9999); id 2 is orthogonal
    # to 0 but assigned to cluster 0? e[1]: cos to e[0]-centroid = 0,
    # to e[4]-centroid = 0 -> tie breaks to cluster 0 (lowest id).
    assert out.loc[0, "kept"] and out.loc[2, "kept"]
    assert not out.loc[1, "kept"] and not out.loc[3, "kept"]
    assert out.loc[10, "kept"] and out.loc[11, "kept"]
    assert out.loc[10, "cluster"] == 1 and out.loc[11, "cluster"] == 1


def test_semdedup_blocked_kernel_huge_cluster(ray_session):
    """One deliberately HUGE cluster: the tiled cosine scan (tiny
    cos_block forces many diagonal + off-diagonal tiles) must equal the
    full-matrix triu reference — no skew-hot cluster may change
    results, only bound memory."""
    rng = np.random.default_rng(5)
    n, d = 500, 16
    base = rng.normal(size=(40, d))
    vecs = base[rng.integers(0, 40, n)] + rng.normal(scale=0.05, size=(n, d))
    cent = np.zeros((2, d)); cent[0, 0] = 1.0; cent[1, 1] = -1.0
    # all vectors into one cluster: centroid 0 dominates after the
    # spherical assign for almost all; what matters is cluster sizes >>
    # cos_block so tiles really exercise the masking
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float64())),
    })).repartition(4)
    thr = 0.98
    out = dedup.semdedup_keep(ds, cent, threshold=thr, cos_block=17).to_pandas()
    ref = dedup.semdedup_keep(ds, cent, threshold=thr, cos_block=1 << 20).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    ref = ref.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)
    # also pin the tile kernel itself against the triu reference
    mat = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ia, ib = np.triu_indices(n, k=1)
    hit = (mat @ mat.T)[ia, ib] >= thr
    exp = np.zeros(n, bool)
    exp[np.unique(ib[hit])] = True
    got = dedup._blocked_lower_id_hits(mat, thr, 17)
    assert (got == exp).all()
    assert exp.any() and not exp.all()  # non-degenerate fixture


def test_semdedup_composes_with_kmeans_lloyd(ray_session):
    """The real-world composition: distributed-Lloyd-trained centroids
    feed semdedup; near-identical vectors land in one cluster and only
    the lowest id survives."""
    rng = np.random.default_rng(9)
    base = rng.normal(size=(6, 12))
    rows, ids = [], []
    vid = 0
    for b in base:
        for _ in range(5):  # 5 near-copies of each base vector
            rows.append(b + 1e-4 * rng.normal(size=12))
            ids.append(vid)
            vid += 1
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r.tolist() for r in rows], pa.list_(pa.float64())),
    }))
    cent = ann.kmeans_lloyd(ds, np.stack(rows[::5]), iters=3)
    out = dedup.semdedup_keep(ds, cent, threshold=0.999).to_pandas()
    kept = sorted(out[out["kept"]]["vec_id"])
    assert kept == [0, 5, 10, 15, 20, 25]  # first of each 5-copy family
    # no family is ever SPLIT across clusters (two families may merge:
    # Lloyd trains on L2 while semdedup assigns spherically)
    fam = out.assign(family=out["vec_id"] // 5)
    assert (fam.groupby("family")["cluster"].nunique() == 1).all()


def test_pair_components_raises_when_unconverged(ray_session):
    """Exhausting max_iters must raise, never silently return wrong
    labels (a chain far longer than max_iters rounds can cover, even
    with pointer doubling's exponential reach)."""
    a = pa.array(range(0, 60), pa.int64())
    b = pa.array(range(1, 61), pa.int64())
    pairs = rd.from_arrow(pa.table({"id_a": a, "id_b": b}))
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.pair_components(pairs, max_iters=2, finish_cutoff=0)


def test_shuffle_blocks_have_hashable_schemas(ray_session):
    """Blocks leaving the shuffle ops must carry NO schema metadata:
    pa.Table.from_pandas (ours or Ray's pandas→arrow conversion) attaches
    a b'pandas' blob that makes schemas unhashable, which defeats Ray's
    schema-dedup early exit in unify_schemas and warns per batch."""
    t = pa.table({"k": ["x", "x", "y", "y"], "r": [5, 2, 9, 1], "p": ["a", "b", "c", "d"]})
    for made in (
        relational.first_per_key(rd.from_arrow(t), "k", "r"),
        relational.hash_join(
            rd.from_arrow(pa.table({"k": [1, 2], "a": ["x", "y"]})),
            rd.from_arrow(pa.table({"k": [2, 3], "b": [20, 30]})),
            "k", num_buckets=2,
        ),
    ):
        for ref in made.materialize().to_arrow_refs():
            tbl = ray.get(ref)
            assert tbl.schema.metadata is None
            hash(tbl.schema)  # raises TypeError if metadata sneaks back


def test_broadcast_joins(ray_session):
    t = pa.table({"k": pa.array([1, 2, 3, 4, 5], pa.int64())})
    ref = ray.put([2, 4])
    semi = relational.broadcast_semi_join(rd.from_arrow(t), "k", ref).to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    anti = relational.broadcast_anti_join(rd.from_arrow(t), "k", ref).to_pandas()
    assert sorted(anti["k"]) == [1, 3, 5]


def test_hash_join(ray_session):
    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "a": ["x", "y", "z"]}))
    right = rd.from_arrow(pa.table({"k": [2, 3, 4], "b": [20, 30, 40]}))
    out = relational.hash_join(left, right, "k", num_buckets=4).to_pandas().sort_values("k")
    assert out["k"].tolist() == [2, 3]
    assert out["a"].tolist() == ["y", "z"]
    assert out["b"].tolist() == [20, 30]


def test_grouped_quantiles_disc_matches_duckdb(ray_session):
    """grouped_quantiles_disc == duckdb quantile_disc GROUP BY, with a
    null key group, null values (ignored), heavy duplicates, and
    block-split invariance."""
    import duckdb
    rng = np.random.default_rng(17)
    n = 6000
    keys = pd.Series(rng.integers(0, 12, n).astype(object)).map(lambda i: f"g{i}")
    keys[rng.random(n) < 0.05] = None
    vals = pd.Series(rng.integers(0, 40, n).astype("float64"))
    vals[rng.random(n) < 0.03] = None
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.int64())})
    qs = [0.25, 0.5, 0.9]
    exp = duckdb.query_df(
        t.to_pandas(), "df",
        f"SELECT k, unnest({qs}) AS q, unnest(quantile_disc(v, {qs})) AS value "
        "FROM df WHERE v IS NOT NULL GROUP BY k ORDER BY k NULLS LAST, q"
    ).to_df()
    for nblocks in (1, 11):
        ds = rd.from_arrow(t).repartition(nblocks)
        got = relational.grouped_quantiles_disc(ds, "k", "v", qs).to_pandas()
        got = got.sort_values(["k", "q"], na_position="last").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_topk_per_key_matches_window(ray_session):
    """topk_per_key == pandas rank-per-group (order DESC, tiebreak ASC):
    duplicate order values across block boundaries, a null key group,
    k larger than some groups, and block-split invariance."""
    rng = np.random.default_rng(9)
    n = 4000
    keys = pd.Series(rng.integers(0, 25, n).astype(object)).map(
        lambda i: f"g{i}")
    keys[rng.random(n) < 0.04] = None
    t = pa.table({
        "k": pa.array(keys, pa.string()),
        "v": pa.array(rng.integers(0, 30, n), pa.int64()),  # heavy ties
        "id": pa.array(np.arange(n), pa.int64()),
    })
    df = t.to_pandas()
    df["rn"] = df.sort_values(["v", "id"], ascending=[False, True]) \
        .groupby("k", dropna=False).cumcount()
    exp = df[df["rn"] < 4].drop(columns="rn").sort_values(
        ["k", "v", "id"], ascending=[True, False, True],
        na_position="last").reset_index(drop=True)
    for nblocks in (1, 13):
        ds = rd.from_arrow(t).repartition(nblocks)
        got = relational.topk_per_key(
            ds, "k", "v", k=4, descending=True, tiebreak="id"
        ).to_pandas().sort_values(
            ["k", "v", "id"], ascending=[True, False, True],
            na_position="last").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_quantiles_disc_exact(ray_session):
    """quantiles_disc == duckdb quantile_disc rank rule
    (rank = max(1, ceil(q*n)), nulls ignored) on a multi-block column
    with duplicates and nulls."""
    import duckdb
    rng = np.random.default_rng(2)
    v = rng.integers(0, 500, 20000).astype("float64")
    mask = rng.random(20000) < 0.03
    col = pd.Series(v).where(~mask, None)
    ds = rd.from_arrow(pa.table({"x": pa.array(col, pa.int64())})).repartition(16)
    qs = [0.0, 0.1, 0.25, 0.5, 0.624, 0.625, 0.75, 0.99, 1.0]
    got = relational.quantiles_disc(ds, "x", qs)
    exp = duckdb.sql(
        f"SELECT unnest({qs}) AS q, unnest(quantile_disc(x, {qs})) AS value "
        "FROM df", params=None
    ) if False else duckdb.query_df(
        pd.DataFrame({"x": col}).dropna().astype({"x": "int64"}), "df",
        f"SELECT unnest({qs}) AS q, unnest(quantile_disc(x, {qs})) AS value FROM df"
    ).to_df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True),
        check_dtype=False)

    # empty input → empty frame, no crash
    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    assert len(relational.quantiles_disc(empty, "x", [0.5])) == 0


def test_arrow_group_by_null_string_multikey():
    """Pins the pyarrow 16.1 grouper bug workaround: multi-key group_by
    with a nullable string key splits the null group above ~1k rows
    (plain pa.Table.group_by returns DUPLICATE key rows).
    relational.arrow_group_by must return exactly the true group count."""
    rng = np.random.default_rng(0)
    n = 10000
    k1 = [None if rng.random() < 0.05 else f"k{rng.integers(0, 40)}" for _ in range(n)]
    k2 = rng.integers(0, 7, n)
    t = pa.table({
        "k1": pa.array(k1, pa.string()),
        "k2": pa.array(k2, pa.int64()),
        "v": pa.array(rng.integers(0, 10, n), pa.int64()),
    })
    truth = len(set(zip(k1, k2.tolist())))
    got = relational.arrow_group_by(t, ["k1", "k2"], [("v", "sum")])
    assert got.num_rows == truth
    # values match a python-side aggregation, null group included
    exp = t.to_pandas().groupby(["k1", "k2"], dropna=False)["v"].sum().reset_index()
    gp = got.to_pandas().sort_values(["k1", "k2"], na_position="last").reset_index(drop=True)
    exp = exp.sort_values(["k1", "k2"], na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        gp.rename(columns={"v_sum": "v"}), exp, check_dtype=False)


def test_grouped_agg_matches_pandas(ray_session):
    """grouped_agg (hash-partitioned Arrow kernels) == pandas groupby on
    a mixed workload: multi-key, all agg kinds, null keys (SQL null
    group semantics), many partitions so partials really merge."""
    rng = np.random.default_rng(3)
    n = 5000
    k1 = rng.integers(0, 40, n).astype(object)
    k1[rng.random(n) < 0.05] = None  # null string keys
    k1 = pa.array([None if v is None else f"k{v}" for v in k1], pa.string())
    k2 = pa.array(rng.integers(0, 7, n), pa.int64())
    v = pa.array(rng.integers(-100, 100, n), pa.int64())
    t = pa.table({"k1": k1, "k2": k2, "v": v})
    ds = rd.from_arrow(t).repartition(16)

    got = relational.grouped_agg(
        ds, ["k1", "k2"],
        [("v", "sum", "s"), ("v", "min", "lo"), ("v", "max", "hi"),
         (None, "count", "n")],
        num_partitions=8,
    ).to_pandas().sort_values(["k1", "k2"], na_position="last").reset_index(drop=True)

    exp = (t.to_pandas().groupby(["k1", "k2"], dropna=False)["v"]
           .agg(s="sum", lo="min", hi="max", n="count").reset_index()
           .sort_values(["k1", "k2"], na_position="last").reset_index(drop=True))
    assert got["k1"].isna().any()  # the null group survived
    pd.testing.assert_frame_equal(
        got[["k1", "k2", "s", "lo", "hi", "n"]], exp, check_dtype=False)

    # empty aggs = grouped DISTINCT
    dist = relational.grouped_agg(ds, ["k2"], []).to_pandas()
    assert sorted(dist["k2"]) == sorted(t.to_pandas()["k2"].unique())

    # adaptive dispatch: the single-task small merge (default cutoff)
    # and the forced hash-partitioned big merge agree exactly
    big = relational.grouped_agg(
        ds, ["k1", "k2"],
        [("v", "sum", "s"), ("v", "min", "lo"), ("v", "max", "hi"),
         (None, "count", "n")],
        num_partitions=8, small_merge_rows=0,
    ).to_pandas().sort_values(["k1", "k2"], na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k1", "k2", "s", "lo", "hi", "n"]],
        big[["k1", "k2", "s", "lo", "hi", "n"]], check_dtype=False)


def test_exact_dedup(ray_session, docs_ds):
    out = dedup.exact_dedup(docs_ds, "text", "doc_id").to_pandas()
    # doc 3 is an exact dup of doc 0 → survivor is 0
    assert 3 not in set(out["doc_id"])
    assert 0 in set(out["doc_id"])
    assert len(out) == 5


def test_minhash_near_dup(ray_session, docs_ds):
    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox jumps over the lazy cat",
        2: "completely different content about rivers and mountains",
        3: "the quick brown fox jumps over the lazy dog",
        4: "",
        5: "unique short text",
    }
    groups = dedup.minhash_dedup(docs_ds, threshold=0.5)
    gmap = dict(zip(groups["doc_id"], groups["group_id"]))
    # 0 and 3 identical → same group; 1 near-dup → same group at 0.5
    assert gmap[0] == gmap[3]
    assert gmap[1] == gmap[0]
    assert 2 not in gmap or gmap.get(2) == 2


def test_minhash_no_candidates(ray_session):
    """A corpus with no LSH candidate pairs must yield empty results, not
    crash: an empty materialized pairs dataset's to_pandas() drops its
    columns, so verify needs the typed-empty exit."""
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["alpha beta gamma delta epsilon zeta",
                 "one two three four five six seven",
                 "red orange yellow green blue indigo"],
    }))
    pairs = dedup.minhash_lsh_pairs(docs)
    ver = dedup.ngram_jaccard_verify(pairs, docs, threshold=0.8)
    assert ver.count() == 0
    # Dataset keeps the typed schema even when empty (to_pandas drops it)
    assert {"id_a", "id_b", "jaccard"} <= set(ver.schema().names)
    groups = dedup.minhash_dedup(docs, threshold=0.8)
    assert len(groups) == 0 and list(groups.columns) == ["doc_id", "group_id"]


def test_jaccard_verify_join_path_matches_broadcast(ray_session, docs_ds):
    """Both verify regimes (broadcast candidate texts vs hash-join
    rejoin) must produce identical verified pairs."""
    cand = dedup.minhash_lsh_pairs(docs_ds).materialize()
    bc = dedup.ngram_jaccard_verify(cand, docs_ds, threshold=0.5).to_pandas()
    jn = dedup.ngram_jaccard_verify(cand, docs_ds, threshold=0.5,
                                    broadcast_pairs=0).to_pandas()
    key = ["id_a", "id_b"]
    bc = bc.sort_values(key).reset_index(drop=True)
    jn = jn.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc[key + ["jaccard"]], jn[key + ["jaccard"]])

    # pairs whose ids are absent from docs: BOTH regimes drop them
    # (inner-join semantics), never score them as jaccard=1 phantoms
    ghost = rd.from_pandas(pd.DataFrame({"id_a": [997], "id_b": [998]}))
    for kw in ({}, {"broadcast_pairs": 0}):
        out = dedup.ngram_jaccard_verify(ghost, docs_ds, threshold=0.0, **kw).to_pandas()
        assert len(out) == 0


def test_asof_join(ray_session):
    """asof_join semantics: latest right row at-or-before each left ts
    per key; equal-ts ties -> max tiebreak; no match -> typed nulls;
    exact-timestamp matches included (backward, inclusive)."""
    ts = pd.Timestamp
    left = rd.from_pandas(pd.DataFrame({
        "eid": [1, 2, 3, 4],
        "k": [10, 10, 20, 30],
        "t": [ts("2024-01-05"), ts("2024-01-01"), ts("2024-01-03"), ts("2024-01-02")],
    }))
    right = rd.from_pandas(pd.DataFrame({
        "rk": [10, 10, 10, 20, 20],
        "rt": [ts("2024-01-02"), ts("2024-01-02"), ts("2024-01-04"),
               ts("2024-01-03"), ts("2024-01-06")],
        "rid": [100, 101, 102, 200, 201],
    }))
    out = relational.asof_join(
        left, right, left_by="k", left_on="t", right_by="rk", right_on="rt",
        right_cols=["rid"], tiebreak=["rid"],
    ).to_pandas().sort_values("eid").reset_index(drop=True)
    # eid1: k=10 t=01-05 -> rt=01-04 rid=102
    # eid2: k=10 t=01-01 -> nothing at/before -> null
    # eid3: k=20 t=01-03 -> EXACT match rt=01-03 rid=200 (inclusive)
    # eid4: k=30 -> no right rows -> null
    assert out["rid"].tolist()[0] == 102
    assert pd.isna(out["rid"].tolist()[1])
    assert out["rid"].tolist()[2] == 200
    assert pd.isna(out["rid"].tolist()[3])
    # tie determinism: at t=01-02 two k=10 rows (rid 100, 101) -> max wins
    left2 = rd.from_pandas(pd.DataFrame(
        {"eid": [9], "k": [10], "t": [ts("2024-01-02")]}))
    out2 = relational.asof_join(
        left2, right, left_by="k", left_on="t", right_by="rk", right_on="rt",
        right_cols=["rid"], tiebreak=["rid"],
    ).to_pandas()
    assert out2["rid"].tolist() == [101]


def test_asof_join_null_keys_and_ts(ray_session):
    """Arrow-native asof kernel: null left keys / null left timestamps
    match nothing (typed-null padding); null right keys / right
    timestamps never match anything."""
    left = rd.from_arrow(pa.table({
        "eid": pa.array([1, 2, 3], pa.int64()),
        "k": pa.array([10, None, 10], pa.int64()),
        "t": pa.array([5, 5, None], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([10, 10, None], pa.int64()),
        "rt": pa.array([3, None, 4], pa.int64()),
        "rid": pa.array([100, 101, 102], pa.int64()),
    }))
    out = relational.asof_join(
        left, right, left_by="k", left_on="t", right_by="rk", right_on="rt",
        right_cols=["rid"], tiebreak=["rid"],
    ).to_pandas().sort_values("eid").reset_index(drop=True)
    assert out["rid"].tolist()[0] == 100   # only valid right row matches
    assert pd.isna(out["rid"].tolist()[1])  # null left key
    assert pd.isna(out["rid"].tolist()[2])  # null left ts


def test_asof_join_matches_pandas_brute(ray_session):
    """Randomized pin: the composite-rank asof kernel == per-row
    brute-force latest-at-or-before scan with max-tiebreak ties."""
    rng = np.random.default_rng(11)
    nl, nr = 400, 300
    lt = pd.DataFrame({
        "eid": np.arange(nl), "k": rng.integers(0, 12, nl),
        "t": rng.integers(0, 50, nl)})
    rt = pd.DataFrame({
        "rk": rng.integers(0, 12, nr), "rt": rng.integers(0, 50, nr),
        "rid": np.arange(nr)})
    out = relational.asof_join(
        rd.from_pandas(lt).repartition(4), rd.from_pandas(rt).repartition(3),
        left_by="k", left_on="t", right_by="rk", right_on="rt",
        right_cols=["rid"], tiebreak=["rid"], num_buckets=5,
    ).to_pandas().sort_values("eid").reset_index(drop=True)
    exp = []
    for _, row in lt.iterrows():
        elig = rt[(rt["rk"] == row["k"]) & (rt["rt"] <= row["t"])]
        if len(elig):
            best = elig.sort_values(["rt", "rid"]).iloc[-1]
            exp.append(best["rid"])
        else:
            exp.append(np.nan)
    got = out["rid"].to_numpy(dtype=float)
    assert np.allclose(got, np.array(exp, dtype=float), equal_nan=True)


def test_range_join_brute_force(ray_session):
    """range_join (composite-rank kernel) must equal the brute-force
    double loop on random data — integer AND datetime on-columns, ties,
    empty windows, keys on one side only."""
    rng = np.random.default_rng(31)
    nl, nr = 120, 150
    lk = rng.integers(0, 12, nl)
    rk = rng.integers(0, 14, nr)  # some right keys never on the left
    lt_ = rng.integers(0, 100, nl)
    rt_ = rng.integers(0, 100, nr)

    # integer on-column
    left = rd.from_pandas(pd.DataFrame({"lid": np.arange(nl), "k": lk, "t": lt_}))
    right = rd.from_pandas(pd.DataFrame({"rk": rk, "rt": rt_, "rid": np.arange(nr)}))
    got = relational.range_join(
        left, right, left_by="k", left_on="t", right_by="rk", right_on="rt",
        right_cols=["rid"], lo=-3, hi=5,
    ).to_pandas()
    got_pairs = sorted(zip(got["lid"], got["rid"])) if len(got) else []
    want = sorted(
        (li, ri)
        for li in range(nl) for ri in range(nr)
        if lk[li] == rk[ri] and lt_[li] - 3 <= rt_[ri] < lt_[li] + 5
    )
    assert got_pairs == want

    # datetime on-column (us-precision Arrow vs ns-promoted pandas bounds)
    base = pd.Timestamp("2024-03-01")
    ldt = base + pd.to_timedelta(lt_, unit="min")
    rdt = base + pd.to_timedelta(rt_, unit="min")
    left2 = rd.from_pandas(pd.DataFrame({"lid": np.arange(nl), "k": lk, "t": ldt}))
    right2 = rd.from_pandas(pd.DataFrame({"rk": rk, "rt": rdt, "rid": np.arange(nr)}))
    got2 = relational.range_join(
        left2, right2, left_by="k", left_on="t", right_by="rk", right_on="rt",
        right_cols=["rid"], lo=pd.Timedelta("-3min"), hi=pd.Timedelta("5min"),
    ).to_pandas()
    got2_pairs = sorted(zip(got2["lid"], got2["rid"])) if len(got2) else []
    assert got2_pairs == want


def test_two_sided_joins_preserve_big_int64(ray_session):
    """The union's typed-null padding must never round int64 values
    through float64: on-columns above 2^53 (epoch-nanosecond scale) and
    payload ids near 2^63 must come back exact from range/asof/hash
    joins (sides are filtered in Arrow before pandas)."""
    big = 1 << 60
    bid = (1 << 62) + 12345
    left = rd.from_arrow(pa.table({
        "lid": pa.array([bid, bid + 1], pa.int64()),
        "k": pa.array([1, 1], pa.int64()),
        "t": pa.array([big, big + 100], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, 1], pa.int64()),
        "rt": pa.array([big + 2, big + 101], pa.int64()),
        "rid": pa.array([bid + 7, bid + 8], pa.int64()),
    }))
    rj = relational.range_join(
        left, right, left_by="k", left_on="t", right_by="rk", right_on="rt",
        right_cols=["rid"], lo=0, hi=5,
    ).to_pandas()
    assert sorted(zip(rj["lid"], rj["rid"])) == [
        (bid, bid + 7), (bid + 1, bid + 8)]
    aj = relational.asof_join(
        left, right, left_by="k", left_on="t", right_by="rk", right_on="rt",
        right_cols=["rid"], tiebreak=["rid"],
    ).to_pandas().sort_values("lid")
    # lid@big has no right row at/before big; lid@big+100 -> rt=big+2
    assert pd.isna(aj["rid"].iloc[0]) and aj["rid"].iloc[1] == bid + 7
    assert aj["lid"].tolist() == [bid, bid + 1]


def test_jaccard_join_empty_corpus(ray_session):
    """jaccard_join on an empty corpus returns an empty typed result
    (the sampled hot-head pass must survive 0-row to_pandas)."""
    docs = rd.from_arrow(pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string())]).empty_table())
    out = dedup.jaccard_join(docs, threshold=0.7)
    assert out.count() == 0


def test_jaccard_join_exhaustive(ray_session):
    """The prefix-filter join (SSJoin lemma) must equal brute-force exact
    Jaccard over ALL pairs — no false negatives at any threshold, on a
    corpus with planted near-dups, empty docs, and sub-shingle docs."""
    import itertools

    import numpy as np

    rng = np.random.default_rng(42)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(40):
        n = int(rng.integers(0, 12))
        texts.append(" ".join(rng.choice(vocab, size=n)))
    # planted near-dups: copies and one-token edits of earlier docs
    texts += [texts[0], texts[1] + " extra", "", "", "solo", "solo two"]
    ids = list(range(len(texts)))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()), "text": texts,
    }))

    def jac(a: str, b: str) -> float:
        sa, sb = dedup.shingle_hashes(a), dedup.shingle_hashes(b)
        if len(sa) == 0 and len(sb) == 0:
            return 1.0
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        return inter / union if union else 0.0

    for t in (0.5, 0.7, 0.99):
        want = sorted(
            (a, b, jac(texts[a], texts[b]))
            for a, b in itertools.combinations(ids, 2)
            if jac(texts[a], texts[b]) >= t
        )
        got = dedup.jaccard_join(docs, threshold=t).to_pandas()
        got = sorted(zip(got["id_a"], got["id_b"], got["jaccard"]))
        assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want], t
        assert np.allclose([j for *_, j in got], [j for *_, j in want])


def test_simhash_pairs(ray_session, docs_ds):
    out = dedup.simhash_pairs(docs_ds, max_hamming=3).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 3) in pairs  # identical texts → hamming 0


def test_as_matrix_fast_paths():
    """The list<float>->matrix kernel must agree with the to_pylist
    fallback on every layout: plain list, sliced list (non-zero offsets),
    fixed_size_list, ragged fallback, null fallback."""
    vals = np.arange(24, dtype=np.float64).reshape(6, 4)
    want = vals.tolist()
    plain = pa.array(want, pa.list_(pa.float64()))
    assert np.array_equal(ann._as_matrix(plain), vals)
    assert np.array_equal(ann._as_matrix(plain.slice(2, 3)), vals[2:5])
    fixed = pa.array(want, pa.list_(pa.float64(), 4))
    assert np.array_equal(ann._as_matrix(fixed), vals)
    chunked = pa.chunked_array([plain.slice(0, 3), plain.slice(3, 3)])
    assert np.array_equal(ann._as_matrix(chunked), vals)
    ragged = pa.array([[1.0], [2.0, 3.0]], pa.list_(pa.float64()))
    with pytest.raises(ValueError):  # fallback keeps the strict contract
        ann._as_matrix(ragged)


def test_embedding_neardup_and_ann(ray_session):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 16))
    base[7] = base[3] + 0.01 * rng.standard_normal(16)  # near-dup pair (3, 7)
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array(range(20), pa.int64()),
                  "embedding": pa.array(list(base), pa.list_(pa.float64()))})
    )
    pairs = dedup.embedding_neardup_pairs(ds, dim=16, threshold=0.99, bits=6).to_pandas()
    assert (3, 7) in set(zip(pairs["id_a"], pairs["id_b"]))
    bf = dedup.brute_force_pairs(ds, threshold=0.99)
    assert (3, 7) in set(zip(bf["id_a"], bf["id_b"]))

    top = ann.brute_force_topk(ds, {3: base[3].tolist()}, k=3)
    assert top["vec_id"].tolist()[:2] == [3, 7]  # self then near-dup

    cent = ann.train_centroids(ds, n_centroids=4, sample=20)
    assigned = ann.ivf_assign(ds, cent)
    ivf = ann.ivf_topk(assigned, cent, {3: base[3].tolist()}, k=3, nprobe=2)
    assert ivf["vec_id"].iloc[0] == 3


def test_pq_adc_matches_reference_numpy(ray_session):
    """PQ encode + ADC scan == an INDEPENDENT driver-side numpy
    reference (codes via explicit per-row argmin loops, ADC via explicit
    per-pair sums) — pins the vectorized kernels' semantics; and the
    distributed result is identical across block splits."""
    rng = np.random.default_rng(41)
    n, d, m, kc = 300, 16, 4, 8
    mat = rng.standard_normal((n, d))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    }))
    cb = ann.pq_train_codebook(mat[:150], m=m, k=kc, iters=5, seed=3)
    queries = {0: list(map(float, mat[0])), 7: list(map(float, mat[7]))}

    # independent reference: per-row python loops, no shared kernels
    dsub = d // m
    ref_codes = np.zeros((n, m), dtype=np.int64)
    for i in range(n):
        for j in range(m):
            sub = mat[i, j * dsub:(j + 1) * dsub]
            dists = [float(((sub - cb[j, c]) ** 2).sum()) for c in range(kc)]
            ref_codes[i, j] = int(np.argmin(dists))
    rows = []
    for qid, qv in queries.items():
        qv = np.asarray(qv)
        adcs = []
        for i in range(n):
            tot = 0.0
            for j in range(m):
                qs = qv[j * dsub:(j + 1) * dsub]
                c = cb[j, ref_codes[i, j]]
                tot += float(qs @ qs) - 2.0 * float(c @ qs) + float(c @ c)
            adcs.append(tot)
        order = sorted(range(n), key=lambda i: (adcs[i], i))[:5]
        rows += [(qid, i, adcs[i], r + 1) for r, i in enumerate(order)]
    ref = pd.DataFrame(rows, columns=["query_id", "vec_id", "adc", "rank"])

    for nblocks in (1, 7):
        codes = ann.pq_encode(ds.repartition(nblocks), cb)
        got = ann.pq_adc_topk(codes, cb, queries, k=5)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), ref.reset_index(drop=True),
            check_dtype=False, atol=1e-9)


def test_ivfpq_topk_probed_lists(ray_session):
    """IVFPQ: residual encoding + per-query probed lists.  With
    nprobe == n_lists the result must equal a full residual-ADC
    reference; with nprobe=1 every hit must come from the query's own
    nearest coarse list."""
    rng = np.random.default_rng(5)
    n, d, m, kc = 400, 16, 4, 8
    mat = rng.standard_normal((n, d)) + np.repeat(
        rng.standard_normal((4, d)) * 3.0, n // 4, axis=0)  # 4 clear clusters
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    })).repartition(5)
    coarse = ann.kmeans_centroids(mat[:200], n_centroids=4, iters=8, seed=9)
    cb = ann.pq_train_codebook(mat[:200], m=m, k=kc, iters=5, seed=3)
    queries = {1: list(map(float, mat[1])), 250: list(map(float, mat[250]))}

    enc = ann.ivfpq_encode(ds, coarse, cb).materialize()
    full = ann.ivfpq_topk(enc, coarse, cb, queries, k=5, nprobe=4)
    # reference: same ADC over ALL lists via driver numpy on the encoded table
    et = enc.to_pandas()
    lists = et["ivf_list"].to_numpy()
    codes = np.stack(et["pq_code"].to_numpy())
    ids = et["vec_id"].to_numpy()
    rows = []
    for qid, qv in queries.items():
        qv = np.asarray(qv)
        adc = np.zeros(len(ids))
        for li in range(4):
            sel = lists == li
            if not sel.any():
                continue
            rq = qv - coarse[li]
            _, lut = ann.pq_lut({0: rq}, cb)
            a = np.zeros(sel.sum())
            for j in range(m):
                a += lut[0, j, codes[sel, j]]
            adc[sel] = a
        order = np.lexsort((ids, adc))[:5]
        rows += [(qid, int(ids[i]), float(adc[i]), r + 1)
                 for r, i in enumerate(order)]
    ref = pd.DataFrame(rows, columns=["query_id", "vec_id", "adc", "rank"])
    pd.testing.assert_frame_equal(full.reset_index(drop=True), ref,
                                  check_dtype=False, atol=1e-9)

    # nprobe=1: results restricted to each query's nearest coarse list
    one = ann.ivfpq_topk(enc, coarse, cb, queries, k=5, nprobe=1)
    qmat = np.asarray([queries[i] for i in sorted(queries)])
    near = np.argmax((qmat / np.linalg.norm(qmat, axis=1, keepdims=True))
                     @ (coarse / np.linalg.norm(coarse, axis=1, keepdims=True)).T, axis=1)
    lst_of = dict(zip(ids.tolist(), lists.tolist()))
    for (qid, nl) in zip(sorted(queries), near):
        hits = one[one["query_id"] == qid]["vec_id"]
        assert all(lst_of[v] == nl for v in hits)


def test_phash_neardup_groups(ray_session):
    ph = np.array([0x1111, 0x1111, 0x1110, 0x7FFF00000000, 0x42], dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"image_id": [f"i{k}" for k in range(5)], "phash": pa.array(ph)})
    )
    out = dedup.phash_neardup_groups(ds, max_hamming=2).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert ("i0", "i1") in pairs and ("i0", "i2") in pairs and ("i1", "i2") in pairs
    assert not any("i3" in p for pair in pairs for p in pair)


def test_text_kernels():
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": ["The quick brown fox! 123", ""]})
    tc = text.token_counts(t)
    assert tc.column("n_ws_tokens").to_pylist() == [5, 0]
    q = text.quality_scores(t)
    assert q.column("n_chars_text").to_pylist() == [24, 0]
    assert 0 < q.column("digit_ratio")[0].as_py() < 0.2
    fp = text.fingerprint(t)
    assert fp.column("text_hash")[0].as_py() != fp.column("text_hash")[1].as_py()


def test_ann_persisted_index(ray_session, tmp_path):
    """build_index → query_index must (a) return exactly the live
    ivf_topk/lsh_topk results and (b) open ONLY the probed buckets'
    fragment files (the partition-pruned read)."""
    import ray.data as rd

    from cc_warc_examples_ray import lancelite
    from cc_warc_examples_ray.ops import ann

    rng = np.random.default_rng(23)
    mat = rng.standard_normal((400, 8))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(400), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    }))
    queries = {0: list(map(float, mat[0])), 5: list(map(float, mat[5]))}

    cent = ann.train_centroids(ds, n_centroids=8, sample=400, seed=5)
    ipath = str(tmp_path / "ivf_idx")
    ann.build_index(ann.ivf_assign(ds, cent), ipath, "ivf_list")
    live = ann.ivf_topk(ann.ivf_assign(ds, cent), cent, queries, k=5, nprobe=2)
    idx = ann.ivf_topk_indexed(ipath, cent, queries, k=5, nprobe=2)
    pd.testing.assert_frame_equal(live.reset_index(drop=True),
                                  idx.reset_index(drop=True))

    planes = ann.lsh_planes(8, bits=5, seed=11)
    lpath = str(tmp_path / "lsh_idx")
    ann.build_index(ann.lsh_assign(ds, planes), lpath, "lsh_bucket")
    live = ann.lsh_topk(ann.lsh_assign(ds, planes), planes, queries,
                        k=5, max_hamming=1)
    idx = ann.lsh_topk_indexed(lpath, planes, queries, k=5, max_hamming=1)
    pd.testing.assert_frame_equal(live.reset_index(drop=True),
                                  idx.reset_index(drop=True))

    # pruned read: probe union of 2 queries at hamming<=1 over 5 bits is
    # at most 12 buckets — far fewer fragments than the full index
    t = lancelite.LanceLiteTable(lpath)
    qb = ann._sign_buckets(np.asarray([queries[0], queries[5]]), planes)
    union = sorted({b for q in qb for b in ann._probe_buckets(int(q), 5, 1)})
    pruned = t.partition_fragment_paths(union)
    assert 0 < len(pruned) <= len(union)
    assert len(pruned) < len(t.fragment_paths())

    # IVFPQ persisted: indexed == live, and the read opens only the
    # probed lists' fragments
    cb = ann.pq_train_codebook(mat[:200], m=4, k=8, iters=5, seed=3)
    enc = ann.ivfpq_encode(ds, cent, cb)
    ppath = str(tmp_path / "ivfpq_idx")
    ann.build_index(enc, ppath, "ivf_list")
    live = ann.ivfpq_topk(ann.ivfpq_encode(ds, cent, cb), cent, cb,
                          queries, k=5, nprobe=2)
    idx = ann.ivfpq_topk_indexed(ppath, cent, cb, queries, k=5, nprobe=2)
    pd.testing.assert_frame_equal(live.reset_index(drop=True),
                                  idx.reset_index(drop=True))
    pt = lancelite.LanceLiteTable(ppath)
    probed = sorted({int(x) for row in np.argsort(
        -(ann._unit(np.asarray([queries[0], queries[5]], dtype=np.float64))
          @ ann._unit(cent).T), axis=1, kind="stable")[:, :2] for x in row})
    ppruned = pt.partition_fragment_paths(probed)
    assert 0 < len(ppruned) < len(pt.fragment_paths())

    # build is resumable/idempotent: a second build commits nothing new
    ann.build_index(ann.lsh_assign(ds, planes), lpath, "lsh_bucket")
    assert lancelite.LanceLiteTable(lpath).count_rows() == 400


def test_token_counts_match_duckdb_whitespace():
    """The whitespace-token count must agree with the DuckDB oracle
    expression on every whitespace edge: python \\s matches \\v (RE2's
    does not), DuckDB trim() strips spaces only (leading \\t/\\n used to
    count a phantom empty token)."""
    import duckdb

    texts = ["a b", "\na b", "\t", "a\x0bb", "", " x ", "a\r\nb", "\f\fz"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    got = text.token_counts(t).column("n_ws_tokens").to_pylist()
    con = duckdb.connect()
    con.register("documents", t)
    want = [r[0] for r in con.execute(
        "SELECT len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))"
        " FROM documents ORDER BY doc_id"
    ).fetchall()]
    assert got == want, (texts, got, want)


def test_langid(ray_session):
    t = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": [
            "the cat and the dog are in the house and it is warm",
            "der hund und die katze sind in dem haus und das ist warm",
            "xyzzy plugh qwfp",
        ],
    })
    ds = rd.from_arrow(t)
    out = ds.map_batches(text.LangIdentifier, batch_format="pyarrow",
                         concurrency=1).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist()[:2] == ["en", "de"]
    assert out["lang_pred"].tolist()[2] == "und"


def test_windowed_aggregate(ray_session):
    ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:50", "2024-01-01 01:10"])
    ds = rd.from_pandas(pd.DataFrame({"k": ["a", "a", "a"], "ts": ts, "v": [1.0, 2.0, 4.0]}))
    out = relational.windowed_aggregate(ds, "k", "ts", "1h", "v").to_pandas()
    out = out.sort_values("window_start")
    assert out["value_sum"].tolist() == [3.0, 4.0]
    assert out["n_events"].tolist() == [2, 1]


def test_native_join(ray_session):
    import pyarrow as pa
    import ray.data as rd

    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "a": ["x", "y", "z"]}))
    right = rd.from_arrow(pa.table({"k": [2, 3, 4], "b": [20, 30, 40]}))
    out = relational.native_join(left, right, "k", num_partitions=2).to_pandas().sort_values("k")
    assert out["k"].tolist() == [2, 3]
    assert out["b"].tolist() == [20, 30]


def test_phash_salted_recall_tradeoff(ray_session):
    import pyarrow as pa
    import ray.data as rd

    ph = np.array([0x1111, 0x1111, 0x1110], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"image_id": ["a", "b", "c"], "phash": pa.array(ph)}))
    unsalted = dedup.phash_neardup_groups(ds, max_hamming=2).to_pandas()
    assert len(unsalted) == 3  # all three pairs found
    salted = dedup.phash_neardup_groups(ds, max_hamming=2, salt=16).to_pandas()
    # salting splits buckets: pairs found <= unsalted (documented tradeoff)
    assert len(salted) <= len(unsalted)


def test_pair_components_matches_union_find(ray_session):
    import pyarrow as pa
    import ray.data as rd

    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([1, 2, 5, 9, 9], pa.int64()),
        "id_b": pa.array([2, 3, 6, 10, 11], pa.int64()),
    }))
    for cutoff in (2_000_000, 0):  # 0 forces the distributed propagation path
        out = dedup.pair_components(pairs, finish_cutoff=cutoff).to_pandas()
        gmap = dict(zip(out["node"], out["group_id"]))
        assert gmap[1] == gmap[2] == gmap[3] == 1
        assert gmap[5] == gmap[6] == 5
        assert gmap[9] == gmap[10] == gmap[11] == 9

    # larger random graph: distributed propagation == driver union-find
    rng = np.random.default_rng(11)
    a = rng.integers(0, 120, 200)
    b = rng.integers(0, 120, 200)
    m = a != b
    rpairs = rd.from_arrow(pa.table({
        "id_a": pa.array(np.minimum(a[m], b[m]), pa.int64()),
        "id_b": pa.array(np.maximum(a[m], b[m]), pa.int64()),
    }))
    fin = dedup.pair_components(rpairs).to_pandas().sort_values("node").reset_index(drop=True)
    prop = dedup.pair_components(rpairs, finish_cutoff=0).to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(fin, prop, check_dtype=False)


def test_pair_components_self_pairs_stay_singletons(ray_session, monkeypatch):
    """A node whose only edge is (x, x) must appear as its own singleton
    in every regime — union-find, star (which filters self-pairs from
    the edge iteration), and labelprop."""
    import pyarrow as pa
    import ray.data as rd

    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([7, 1, 3], pa.int64()),   # 7 and 3 are self-pair-only
        "id_b": pa.array([7, 2, 3], pa.int64()),   # nodes; (1,2) is a real edge
    }))
    want = {1: 1, 2: 1, 3: 3, 7: 7}
    runs = [dedup.pair_components(pairs).to_pandas()]
    for engine in ("star", "labelprop"):
        monkeypatch.setenv("CC_ENGINE", engine)
        runs.append(dedup.pair_components(pairs, finish_cutoff=0).to_pandas())
    for out in runs:
        assert dict(zip(out["node"], out["group_id"])) == want


def test_pair_components_empty_is_typed(ray_session):
    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"id_a": pa.array([], pa.int64()),
                                    "id_b": pa.array([], pa.int64())}))
    out = dedup.pair_components(empty)
    sch = out.schema()
    assert dict(zip(sch.names, sch.types))["node"] == pa.int64()
    assert out.count() == 0


def test_distinct_pairs_typed_and_exact(ray_session):
    import pandas as pd
    import ray.data as rd

    cand = rd.from_pandas(pd.DataFrame({
        "id_a": ["a", "a", "b", "a"],
        "id_b": ["b", "b", "c", "c"],
        "hamming": [1, 1, 2, 0],
    }))
    out = dedup.distinct_pairs(cand, extra_cols=("hamming",)).to_pandas()
    out = out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert list(zip(out["id_a"], out["id_b"], out["hamming"])) == [
        ("a", "b", 1), ("a", "c", 0), ("b", "c", 2)]


def test_ivf_per_query_probe_semantics(ray_session):
    """Every IVF candidate must come from its query's OWN probed lists
    (reference: w probed lists per query, IndexingManage.java:68-80)."""
    import pandas as pd
    import ray.data as rd

    from cc_warc_examples_ray.ops import ann

    rng = np.random.default_rng(9)
    mat = rng.standard_normal((300, 8))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    }))
    cent = ann.train_centroids(ds, n_centroids=8, sample=300, seed=5)
    assigned = ann.ivf_assign(ds, cent).materialize()
    queries = {0: list(map(float, mat[0])), 1: list(map(float, mat[1]))}
    out = ann.ivf_topk(assigned, cent, queries, k=5, nprobe=2)

    qmat = mat[[0, 1]] / np.linalg.norm(mat[[0, 1]], axis=1, keepdims=True)
    centn = cent  # already unit
    probes = np.argsort(-(qmat @ centn.T), axis=1)[:, :2]
    lists_of = dict(zip(
        assigned.to_pandas()["vec_id"], assigned.to_pandas()["ivf_list"]))
    for q, vid in zip(out["query_id"], out["vec_id"]):
        qi = 0 if q == 0 else 1
        assert lists_of[vid] in set(probes[qi]), (q, vid)
    # the query vector itself lives in its own nearest list → rank 1, cos 1
    top = out[out["rank"] == 1].set_index("query_id")["vec_id"]
    assert top[0] == 0 and top[1] == 1


def test_lsh_topk_probe_semantics(ray_session):
    """Every LSH-ANN candidate must sit within max_hamming bit flips of
    its query's own sketch, and the query vector itself (hamming 0 by
    construction) must come back at rank 1 with cosine 1."""
    import ray.data as rd

    from cc_warc_examples_ray.ops import ann

    rng = np.random.default_rng(17)
    mat = rng.standard_normal((300, 16))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    }))
    planes = ann.lsh_planes(16, bits=6, seed=11)
    assigned = ann.lsh_assign(ds, planes).materialize()
    queries = {0: list(map(float, mat[0])), 1: list(map(float, mat[1]))}
    out = ann.lsh_topk(assigned, planes, queries, k=5, max_hamming=1)

    adf = assigned.to_pandas()
    bucket_of = dict(zip(adf["vec_id"], adf["lsh_bucket"]))
    qb = ann._sign_buckets(mat[[0, 1]], planes)
    for q, vid in zip(out["query_id"], out["vec_id"]):
        qi = 0 if q == 0 else 1
        ham = bin(int(bucket_of[vid]) ^ int(qb[qi])).count("1")
        assert ham <= 1, (q, vid, ham)
    top = out[out["rank"] == 1].set_index("query_id")
    assert top.loc[0, "vec_id"] == 0 and top.loc[1, "vec_id"] == 1
    assert np.allclose(top["cosine"], 1.0)

    # widening the probe radius only ADDS candidates (monotone recall)
    wide = ann.lsh_topk(assigned, planes, queries, k=5, max_hamming=2)
    for q in (0, 1):
        narrow_set = set(out[out["query_id"] == q]["cosine"])
        wide_top = wide[wide["query_id"] == q]["cosine"]
        # top-5 cosines can only improve (supersets rank at least as high)
        assert wide_top.iloc[0] >= max(narrow_set)


def test_hyperplane_sketch_all_null_block(ray_session):
    """A block whose embeddings are ALL null must yield a typed empty
    sketch (configured dim), not a matmul crash in _sign_buckets."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((6, 8))
    valid = pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in base],
                              pa.list_(pa.float64())),
    })
    allnull = pa.table({
        "vec_id": pa.array([100, 101], pa.int64()),
        "embedding": pa.array([None, None], pa.list_(pa.float64())),
    })
    ds = rd.from_arrow([valid, allnull])  # one block each
    pairs = dedup.embedding_neardup_pairs(ds, dim=8, threshold=0.999, bits=4).to_pandas()
    touched = set(pairs.get("id_a", [])) | set(pairs.get("id_b", []))
    assert not touched & {100, 101}


def test_range_join_null_keys_never_match(ray_session):
    """SQL inner-join semantics: NULL keys match nothing — null-keyed
    left rows must not pair with null-keyed right rows (the factorize -1
    sentinel must not form a shared group), for string AND int keys."""
    for karr_l, karr_r in [
        (pa.array(["a", None, "b"]), pa.array(["a", None, None])),
        (pa.array([1, None, 2], pa.int64()), pa.array([1, None, None], pa.int64())),
    ]:
        left = rd.from_arrow(pa.table({
            "lid": pa.array([0, 1, 2], pa.int64()),
            "k": karr_l,
            "t": pa.array([10, 10, 10], pa.int64()),
        }))
        right = rd.from_arrow(pa.table({
            "rk": karr_r,
            "rt": pa.array([10, 10, 10], pa.int64()),
            "rid": pa.array([7, 8, 9], pa.int64()),
        }))
        out = relational.range_join(
            left, right, left_by="k", left_on="t", right_by="rk", right_on="rt",
            right_cols=["rid"], lo=0, hi=1,
        ).to_pandas()
        assert sorted(zip(out["lid"], out["rid"])) == [(0, 7)]


def test_hash_join_broadcast_equals_shuffle(ray_session):
    """The adaptive broadcast path (small right side) and the forced
    two-sided bucket shuffle produce identical rows — inner AND left,
    with null keys and duplicate-key fan-out on both sides."""
    rng = np.random.default_rng(7)
    lt = pa.table({
        "k": pa.array([None if x == 0 else int(x)
                       for x in rng.integers(0, 8, 300)], pa.int64()),
        "lv": pa.array(np.arange(300), pa.int64()),
    })
    rt = pa.table({
        "k": pa.array([None if x == 7 else int(x)
                       for x in rng.integers(0, 9, 40)], pa.int64()),
        "rv": pa.array(np.arange(40) * 10, pa.int64()),
    })
    for how in ("inner", "left"):
        outs = []
        for bcast in (500_000, 0):  # adaptive broadcast vs forced shuffle
            out = relational.hash_join(
                rd.from_arrow(lt).repartition(4),
                rd.from_arrow(rt).repartition(3),
                "k", num_buckets=4, how=how, broadcast_rows=bcast,
            ).to_pandas().sort_values(["lv", "rv"]).reset_index(drop=True)
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        if how == "left":
            assert outs[0]["rv"].isna().any()  # null-padded left rows


def test_hash_join_inner_drops_null_keys(ray_session):
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 2], pa.int64()), "a": pa.array([0, 1, 2], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, None], pa.int64()), "b": pa.array([10, 11], pa.int64())}))
    out = relational.hash_join(left, right, "k", num_buckets=2).to_pandas()
    assert sorted(zip(out["a"], out["b"])) == [(0, 10)]


def test_jaccard_duplicate_doc_ids_no_self_pairs(ray_session):
    """Duplicate doc_id values in the corpus must not emit (x, x)
    self-pairs from the prefix buckets (they'd verify at J=1.0)."""
    t = "the quick brown fox jumps over the lazy dog"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 1, 2], pa.int64()),
        "text": [t, t, t + " tail"],
    }))
    got = dedup.jaccard_join(docs, threshold=0.5).to_pandas()
    assert (got["id_a"] != got["id_b"]).all()
    assert {(1, 2)} == set(zip(got["id_a"], got["id_b"]))


def test_phash_salted_equals_unsalted(ray_session):
    """Salt-pair replication is EXACT: the salted run's pair set and the
    resulting components equal the unsalted run's on a Zipf-hot corpus
    (one huge near-dup cluster — the bucket salting exists to split —
    plus chains that cross salt boundaries)."""
    rng = np.random.default_rng(13)
    phs = []
    base = np.uint64(0x0123456789ABCDEF)
    # hot cluster: 60 hashes within hamming<=2 of base (shared blocks)
    for _ in range(60):
        h = base
        for b in rng.choice(64, size=rng.integers(0, 2), replace=False):
            h ^= np.uint64(1) << np.uint64(b)
        phs.append(h)
    # chain cluster: consecutive flips so adjacency crosses any salt split
    h = np.uint64(0xFEDCBA9876543210)
    for i in range(12):
        phs.append(h)
        h ^= np.uint64(1) << np.uint64(i % 16)
    # background noise
    phs += [np.uint64(x) for x in rng.integers(0, 2**63, size=80, dtype=np.int64)]
    t = pa.table({
        "image_id": pa.array([f"im{i:04d}" for i in range(len(phs))], pa.string()),
        "phash": pa.array(np.array(phs, dtype=np.uint64).view(np.int64)),
    })
    ds = rd.from_arrow(t)
    plain = dedup.phash_neardup_groups(ds, max_hamming=2, salt=0).to_pandas()
    key = ["id_a", "id_b", "hamming"]
    plain = plain.sort_values(key).reset_index(drop=True)
    assert len(plain) >= 60  # the hot cluster really is hot
    for s in (2, 4, 7):
        salted = dedup.phash_neardup_groups(ds, max_hamming=2, salt=s).to_pandas()
        salted = salted.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(plain[key], salted[key])
    comp_plain = dedup.pair_components(
        dedup.phash_neardup_groups(ds, max_hamming=2, salt=0)).to_pandas()
    comp_salt = dedup.pair_components(
        dedup.phash_neardup_groups(ds, max_hamming=2, salt=4)).to_pandas()
    merged = comp_plain.merge(comp_salt, on="node", suffixes=("_p", "_s"))
    assert (merged["group_id_p"] == merged["group_id_s"]).all()


@pytest.mark.parametrize("engine,iters", [("star", 10), ("labelprop", 5)])
def test_pair_components_distributed_regime_on_fixture(ray_session, monkeypatch,
                                                       engine, iters):
    """VERDICT r2 #6: the distributed regimes (finish_cutoff=0) must equal
    the driver union-find regime on a real fixture-scale pHash pair graph,
    not only on a 200-edge unit graph.  Both engines are pinned: the
    default large-star/small-star alternation and the kept-selectable
    min-label propagation (CC_ENGINE=labelprop)."""
    monkeypatch.setenv("CC_ENGINE", engine)
    rng = np.random.default_rng(23)
    phs = []
    # chains of diameter ~7 (multi-round propagation without paying one
    # hash_join round per hop for dozens of hops) + hot clusters + noise
    for c in range(6):
        h = np.uint64(rng.integers(0, 2**63))
        for i in range(8):
            phs.append(h)
            h ^= np.uint64(1) << np.uint64((i * 7 + c) % 64)
    for c in range(3):  # hot clusters: all within hamming 2 of a center
        base = np.uint64(rng.integers(0, 2**63))
        for _ in range(20):
            h = base
            for b in rng.choice(64, size=rng.integers(0, 2), replace=False):
                h ^= np.uint64(1) << np.uint64(b)
            phs.append(h)
    phs += [np.uint64(x) for x in rng.integers(0, 2**63, size=300, dtype=np.int64)]
    t = pa.table({
        "image_id": pa.array([f"im{i:05d}" for i in range(len(phs))], pa.string()),
        "phash": pa.array(np.array(phs, dtype=np.uint64).view(np.int64)),
    })
    pairs = dedup.phash_neardup_groups(
        rd.from_arrow(t), max_hamming=2, salt=2
    ).materialize()
    assert pairs.count() > 200  # real multi-component near-dup structure
    uf = dedup.pair_components(pairs).to_pandas().sort_values(
        "node").reset_index(drop=True)
    # tight budgets: labelprop's pointer doubling must converge in
    # O(log d) rounds on these multi-hop chains (one-hop-per-round
    # propagation would exhaust 5 and raise); star contracts the edge
    # set toward min-rooted stars within 10 alternations
    dist = dedup.pair_components(
        pairs, max_iters=iters, finish_cutoff=0
    ).to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(uf, dist)


def test_prefix_sum_matches_numpy_cumsum():
    rng = np.random.RandomState(7)
    order = rng.permutation(2000).astype(np.int64)
    vals = rng.randint(0, 50, 2000).astype(np.int64)
    t = pa.table({"k": order, "v": vals})
    # shuffled input, many small blocks: the sort path must restore order
    ds = rd.from_arrow(t).repartition(13)
    out = relational.prefix_sum(ds, "k", "v", out_col="run").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    srt = np.argsort(order)
    expect = vals[srt].cumsum() - vals[srt]  # exclusive
    assert (out["run"].to_numpy() == expect).all()
    # inclusive variant
    out2 = relational.prefix_sum(rd.from_arrow(t).repartition(5), "k", "v",
                                 out_col="run", exclusive=False).to_pandas()
    out2 = out2.sort_values("k").reset_index(drop=True)
    assert (out2["run"].to_numpy() == vals[srt].cumsum()).all()


def test_prefix_sum_range_partitioned_fast_path():
    t = pa.table({"k": pa.array(range(100), pa.int64()),
                  "v": pa.array([1] * 100, pa.int64())})
    ds = rd.from_arrow(t).repartition(4)  # contiguous splits keep ranges
    out = relational.prefix_sum(ds, "k", "v", out_col="run",
                                assume_range_partitioned=True).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert (out["run"].to_numpy() == np.arange(100)).all()


def test_prefix_sum_rejects_duplicate_block_minima():
    t = pa.table({"k": pa.array([1, 1, 2, 2], pa.int64()),
                  "v": pa.array([1, 1, 1, 1], pa.int64())})
    with pytest.raises(ValueError, match="duplicate"):
        relational.prefix_sum(rd.from_arrow(t).repartition(4), "k", "v",
                              assume_range_partitioned=True).to_pandas()


def test_prefix_sum_rejects_overlapping_block_ranges():
    # interleaved ranges across blocks: valid (unique) keys, but the
    # fast path's disjoint-range precondition is violated
    t = pa.table({"k": pa.array([0, 2, 4, 1, 3, 5], pa.int64()),
                  "v": pa.array([1] * 6, pa.int64())})
    with pytest.raises(ValueError, match="overlap"):
        relational.prefix_sum(rd.from_arrow(t).repartition(2), "k", "v",
                              assume_range_partitioned=True).to_pandas()


def test_pca_distributed_equals_local_and_split_invariant(ray_session):
    """pca_train (Ray, any block split) == pca_train_local (no Ray):
    the integer moment partials re-associate exactly, so components are
    bit-equal; projections recover a planted 2-D structure."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from cc_warc_examples_ray.ops import ann

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    local = ann.pca_train_local(t, n_components=3)
    for nblocks in (1, 7):
        dist = ann.pca_train(
            rd.from_arrow(t).repartition(nblocks), n_components=3)
        assert np.array_equal(local, dist), nblocks
    # rows are unit eigenvectors of the covariance, mutually orthogonal
    gram = local @ local.T
    assert np.allclose(gram, np.eye(3), atol=1e-10)
    # projection parity: the left-to-right fold equals the oracle-style
    # explicit sum for a probe row
    proj = ann.pca_project_batch(t.slice(0, 5), local)
    m = ann._as_matrix(t.slice(0, 5).column("embedding"))
    acc = 0.0
    for j in range(m.shape[1]):
        acc = acc + m[0, j] * local[0, j]
    import math
    assert proj.column("pc1")[0].as_py() == math.floor(acc * 1e5 + 0.5) / 1e5
