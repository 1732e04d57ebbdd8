"""Inverted index (ops/text.inverted_index) pinned against a hand
reference: per-term document frequency and md5 of the ascending
comma-joined posting list."""

import hashlib

import pyarrow as pa
import ray.data as rd

from cc_warc_examples_ray.ops.text import inverted_index


def test_inverted_index_reference(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": [5, 2, 9, 7],
        "text": ["b a  a", "a c", "c\tb\nc", ""],
    })).repartition(3)
    out = inverted_index(docs).to_pandas().set_index("term")
    ref = {"a": [2, 5], "b": [5, 9], "c": [2, 9]}
    assert set(out.index) == set(ref)
    for term, postings in ref.items():
        assert out.loc[term, "df"] == len(postings)
        want = hashlib.md5(",".join(map(str, postings)).encode()).hexdigest()
        assert out.loc[term, "postings_md5"] == want


def test_inverted_index_string_ids(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": ["d9", "d2"], "text": ["a b", "a"]}))
    out = inverted_index(docs).to_pandas().set_index("term")
    assert out.loc["a", "postings_md5"] == hashlib.md5(b"d2,d9").hexdigest()
    assert out.loc["a", "df"] == 2 and out.loc["b", "df"] == 1
