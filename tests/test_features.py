"""Tests for feature extraction + ensemble (M23-M27, T3, A12)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from cc_warc_examples_ray.ops import features, text
from cc_warc_examples_ray.schemas import CRAWLED_MEDIA


def _media_table():
    rows = [
        {"src": "http://a.example/pics/photo_350x250.jpg", "alt": "a big photo", "w": "350",
         "h": "250", "page_url": "http://a.example/page", "parent_txt": "context",
         "dom_sib": 2, "dom_depth": 5, "dom_elem": "img"},
        {"src": "http://cdn.example/icons/i_16.gif?w=16", "alt": "", "w": "", "h": "",
         "page_url": "http://a.example/page", "parent_txt": None,
         "dom_sib": 30, "dom_depth": 12, "dom_elem": "img"},
        {"src": "http://b.example/video.mp4", "alt": "", "w": "", "h": "",
         "page_url": "http://b.example/watch", "parent_txt": "",
         "dom_sib": 0, "dom_depth": 3, "dom_elem": "video"},
    ]
    cols = {n: [r[n] for r in rows] for n in CRAWLED_MEDIA.names}
    return pa.table(cols, schema=CRAWLED_MEDIA)


def test_dims_from_url():
    assert features.dims_from_url("x/350x250.jpg") == (350, 250)
    assert features.dims_from_url("x/w_75/a.jpg") == (75, 75)
    assert features.dims_from_url("x/a_250px.jpg") == (250, 250)
    assert features.dims_from_url("x/a.jpg?width=150") == (150, 150)
    assert features.dims_from_url("x/img_75.jpg") == (75, 75)
    assert features.dims_from_url("x/a.jpg") == (0, 0)


def test_name_and_suffix():
    assert features.name_and_suffix("http://x/a/photo.JPG?x=1") == ("photo.JPG", "jpg")
    assert features.name_and_suffix("http://x/a/noext") == ("noext", "")


def test_media_features():
    out = features.media_features_batch(_media_table())
    assert out.column("suffix_jpg").to_pylist() == [1.0, 0.0, 0.0]
    assert out.column("suffix_gif").to_pylist() == [0.0, 1.0, 0.0]
    assert out.column("url_w").to_pylist() == [350.0, 16.0, 0.0]
    assert out.column("attr_w").to_pylist() == [350.0, 0.0, 0.0]
    assert out.column("same_domain").to_pylist() == [1.0, 0.0, 1.0]
    assert out.column("elem_video").to_pylist() == [0.0, 0.0, 1.0]
    assert out.column("alt_len").to_pylist() == [11.0, 0.0, 0.0]


def test_ngram_vocab_and_presence(ray_session):
    docs = rd.from_arrow(pa.table({
        "text": ["big photo gallery wallpaper", "tiny icon sprite button"] * 10,
        "lang": ["en", "de"] * 10,
    }))
    scores = text.ngram_class_scores(docs, "text", "lang", pos_label="en", min_count=2)
    vocab = features.build_ngram_vocab(scores, top_n=50)
    assert len(vocab) > 0 and all(3 <= len(g) <= 5 for g in vocab)

    media = _media_table()
    np_stage = features.NgramPresence(vocab, url_col="src")
    out = np_stage(media)
    assert out.column("ngram_hits").to_pylist()[0] >= 0
    assert len(out.column("ngram_vec")[0].as_py()) == len(vocab)


def test_presence_and_ensemble_fused_matches_composition():
    vocab = ["pho", "wal", "ico"]
    feats = features.media_features_batch(_media_table())
    composed = features.EnsembleClassifier()(
        features.NgramPresence(vocab, url_col="src")(feats)
    )
    fused = features.PresenceAndEnsemble(vocab, url_col="src")(feats)
    assert fused.equals(composed)


def test_ensemble_semantics():
    feats = features.media_features_batch(_media_table())
    clf = features.EnsembleClassifier()
    out = clf(feats)
    assert out.column("is_big").type == pa.bool_()
    p_feat = np.array(out.column("p_feat").to_pylist())
    assert ((p_feat > 0) & (p_feat < 1)).all()
    # big 350x250 jpg with alt text scores higher than the 16px icon
    assert p_feat[0] > p_feat[1]

    # agreement rule: construct explicit disagreement and check the
    # ngram-biased margin tie-break (ProcessingService.java:209-222)
    t = pa.table({"attr_w": pa.array([1000.0]), "ngram_hits": pa.array([0], pa.int64())})
    r = features.EnsembleClassifier({"attr_w": 0.002})(t)
    # p_feat=sigmoid(1.5)=0.82 (big, margin .32); p_ngram=sigmoid(-.5)=0.38
    # (small, margin .12+.05=.17) → feature side wins → big
    assert r.column("is_big").to_pylist() == [True]
    t2 = pa.table({"attr_w": pa.array([300.0]), "ngram_hits": pa.array([0], pa.int64())})
    r2 = features.EnsembleClassifier({"attr_w": 0.002})(t2)
    # p_feat=sigmoid(.1)=.525 (big, margin .025); ngram margin .17 → small
    assert r2.column("is_big").to_pylist() == [False]


def test_f1_eval():
    labels = np.array([True, True, False, False])
    preds = np.array([True, False, False, False])
    m = features.f1_eval(labels, preds)
    assert m["big"]["precision"] == 1.0
    assert m["big"]["recall"] == 0.5
    assert 0 < m["avg_f1"] <= 1.0


def test_train_feature_weights_deterministic_and_accurate(ray_session):
    """VERDICT r2 #7: one-pass ridge trainer — identical coefficients
    under ANY batch split (exact integer Gram partials), and the trained
    linear model separates the deterministic fixture labels."""
    import ray.data as rd

    from cc_warc_examples_ray import synth
    from cc_warc_examples_ray.ops import features

    t = synth.media_training_table(4000)
    cols = [c for c in t.column_names if c != "label"]
    w_ref, b_ref = features.train_feature_weights(t, cols)
    for nblocks in (3, 17):
        step = t.num_rows // nblocks + 1
        ds = rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])
        w_ds, b_ds = features.train_feature_weights(ds, cols)
        assert w_ds == w_ref and b_ds == b_ref  # bit-exact, any split
    clf = features.EnsembleClassifier(feature_weights=w_ref, bias=b_ref - 0.5)
    scored = clf(t)
    labels = t.column("label").to_numpy().astype(bool)
    preds = scored.column("p_feat").to_numpy() >= 0.5
    ev = features.f1_eval(labels, preds)
    assert ev["avg_f1"] >= 0.9, ev
