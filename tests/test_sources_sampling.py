"""Tests for the gz-jsonl source (S6/M14), seeds reader (S8), sampling
(O5), substring join (J4), containment dedup (O11), statistics (S12)."""

import gzip
import json
import os

import pyarrow as pa
import pytest
import ray
import ray.data as rd

from cc_warc_examples_ray.ops import sampling, stats_report
from cc_warc_examples_ray.sources import jsonl


def test_gz_jsonl_lenient(ray_session, tmp_path):
    rows = [
        {"src": "http://x/a.jpg", "alt": "a", "w": "10", "h": "20",
         "pageUrl": "http://x/p", "parentTxt": "t", "domSib": 1, "domDepth": 2,
         "domElem": "img"},
        {"src": "http://x/b.png", "domSib": "notanint"},
    ]
    lines = [json.dumps(rows[0]) + ",", "{broken json", json.dumps(rows[1])]
    p = tmp_path / "part-0.gz"
    p.write_bytes(gzip.compress("\n".join(lines).encode()))
    ds = jsonl.read_gz_jsonl(str(tmp_path))
    out = ds.to_pandas().sort_values("src").reset_index(drop=True)
    assert len(out) == 2
    assert out["src"].tolist() == ["http://x/a.jpg", "http://x/b.png"]
    assert out["dom_sib"].tolist()[0] == 1
    assert out["parse_errors"].tolist() == [1, 1]  # one broken line counted
    assert out["dom_sib"].isna().tolist()[1]  # lenient: bad int → null


def test_read_seeds(tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("http://www.foo.example/a\nbar.example\n\nhttp://baz.example/x\n")
    t = jsonl.read_seeds(str(p))
    assert t.column("host").to_pylist() == ["foo.example", "bar.example", "baz.example"]
    assert t.column("seed_rank").to_pylist() == [0, 1, 2]


def test_stratified_sample(ray_session):
    t = pa.table({"cls": ["a"] * 10 + ["b"] * 3, "r": list(range(13))})
    out = sampling.stratified_sample(rd.from_arrow(t), "cls", "r").to_pandas()
    assert out.groupby("cls").size().tolist() == [3, 3]
    assert sorted(out[out["cls"] == "a"]["r"]) == [0, 1, 2]  # deterministic: lowest r


def test_substring_any_join(ray_session):
    t = pa.table({"u": ["http://news.example/a", "http://other.example/b",
                        "http://x.news.example/c"]})
    ref = ray.put(["news.example"])
    out = sampling.substring_any_join(rd.from_arrow(t), "u", ref).to_pandas()
    assert len(out) == 2


def test_weighted_mix_deterministic(ray_session):
    """Per-source rate semantics: base copies + hash-Bernoulli fraction,
    identical output under any block split, copy_idx dense per row."""
    import numpy as np

    from cc_warc_examples_ray.hashing import xxh64_many

    n = 400
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array((["a", "b", "c", "d"] * (n // 4))),
    })
    rates = {"a": 2.0, "b": 0.5, "c": 1.25}  # d falls to default 0.0
    outs = []
    for nblocks in (1, 5):
        out = sampling.weighted_mix(
            rd.from_arrow(t).repartition(nblocks), rates,
            default=0.0, seed=3,
        ).to_pandas().sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)
        outs.append(out)
    assert outs[0].equals(outs[1])
    out = outs[0]
    got = out.groupby("source")["doc_id"].nunique().to_dict()
    # a: rate 2.0 -> exactly 2 copies of every row; d: rate 0 -> gone
    assert got["a"] == 100
    assert (out[out["source"] == "a"].groupby("doc_id").size() == 2).all()
    assert "d" not in got
    # b: Bernoulli(0.5) — the EXACT expected rows from the hash rule
    h = xxh64_many([f"{i}:3" for i in range(n)]) % np.uint64(1 << 20)
    exp_b = {i for i in range(n) if i % 4 == 1 and h[i] < (1 << 19)}
    assert set(out[out["source"] == "b"]["doc_id"]) == exp_b
    assert 20 <= len(exp_b) <= 80  # sanity: the draw is not degenerate
    # c: 1 or 2 copies, expected ~1.25 mean
    cc = out[out["source"] == "c"].groupby("doc_id").size()
    assert set(cc.unique()) <= {1, 2} and len(cc) == 100
    # copy_idx dense 0..k-1
    assert (out.groupby("doc_id")["copy_idx"].max() + 1
            == out.groupby("doc_id").size()).all()


def test_mix_rates_table_rejects_negative_and_nan():
    """Misconfigured rates fail at compile time with a clear message,
    not deep inside weighted_mix's np.repeat."""
    import pytest as _pytest

    for bad in (-0.5, -2.0, float("nan")):
        with _pytest.raises(ValueError, match="rate must be >= 0"):
            sampling.mix_rates_table({"a": bad}, default=1.0)
        with _pytest.raises(ValueError, match="rate must be >= 0"):
            sampling.mix_rates_table({"a": 1.0}, default=bad)


def test_substring_containment_dedup():
    kept = sampling.substring_containment_dedup(["photo", "photos", "pho", "icon"])
    assert kept == ["icon", "photos"]


def test_classify_url_kind():
    kinds = stats_report.classify_url_kind(
        ["http://x/a.jpg", "http://x/v.mp4", "http://x/page.html",
         "http://youtube.com/watch?v=1"]
    )
    assert kinds == ["image", "video", "webpage", "video"]
