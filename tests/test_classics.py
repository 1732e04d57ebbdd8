"""Golden tests for the WARC-classic pipelines (tag/word/server counts,
media extraction) against plain-python oracles implementing the
reference mapper semantics (FIXTURES.md F6)."""

import json
import re
from collections import Counter

import pyarrow as pa
import pytest
import ray.data as rd

from cc_warc_examples_ray import synth
from cc_warc_examples_ray.pipelines import classics
from cc_warc_examples_ray.stages import parse

N = 300


@pytest.fixture(scope="module")
def records():
    return synth.warc_records_table(N)


@pytest.fixture(scope="module")
def records_ds(ray_session, records):
    return rd.from_arrow(records)


def _golden_tags(records: pa.Table) -> Counter:
    """TagCounterMap.java:32-68 semantics, naive python."""
    c = Counter()
    rx = re.compile(r"(?i)<(?!/)([^\s>]+)([^>]*)>")
    for mime, payload in zip(records.column("mime").to_pylist(), records.column("payload").to_pylist()):
        if mime != "application/http; msgtype=response":
            continue
        txt = payload.decode("utf-8", errors="replace")
        i = txt.find("\r\n\r\n")
        header, body = txt[:i], txt[i + 4 :]
        if "Content-Type: text/html" not in header:
            continue
        for m in rx.finditer(body):
            c[m.group(1).lower()] += 1
    return c


def test_tag_counts_golden(records_ds, records):
    got = classics.tag_counts(records_ds).to_pandas()
    want = _golden_tags(records)
    assert dict(zip(got["tag"], got["cnt"])) == dict(want)


def test_word_counts_golden(records_ds, records):
    got = classics.word_counts(records_ds).to_pandas()
    want = Counter()
    for mime, payload in zip(records.column("mime").to_pylist(), records.column("payload").to_pylist()):
        if mime == "text/plain":
            want.update(payload.decode().split())
    assert dict(zip(got["word"], got["cnt"])) == dict(want)


def test_server_counts_golden(records_ds, records):
    got = classics.server_counts(records_ds).to_pandas()
    want = Counter()
    for mime, payload in zip(records.column("mime").to_pylist(), records.column("payload").to_pylist()):
        if mime == "application/json":
            try:
                want[json.loads(payload)["Envelope"]["Payload-Metadata"][
                    "HTTP-Response-Metadata"]["Headers"]["Server"]] += 1
            except KeyError:
                pass
    assert dict(zip(got["server"], got["cnt"])) == dict(want)


def test_job_counters(records_ds, records):
    got = classics.job_counters(records_ds).to_pandas()
    c = dict(zip(got["counter"], got["total"]))
    assert c["RECORDS_IN"] == N
    assert c["NON_PLAIN_TEXT"] == sum(
        1 for m in records.column("mime").to_pylist()
        if m not in ("text/plain", "application/json", "application/http; msgtype=response")
    )


def test_media_extract_dedup(records_ds):
    raw = classics.media_extract(records_ds, dedup=False).to_pandas()
    deduped = classics.media_extract(records_ds, dedup=True).to_pandas()
    assert len(deduped) == raw["src"].nunique()
    assert set(deduped.columns) == {
        "src", "alt", "w", "h", "page_url", "parent_txt", "dom_sib", "dom_depth", "dom_elem"
    }
    # every <img> in the fixture HTML produces a row
    assert (raw["dom_elem"] == "img").any()
    assert (raw["dom_elem"] == "a").any()
    # alt text is truncated to 500 chars
    assert raw["alt"].str.len().max() <= 500


def test_media_visitor_single_doc():
    html = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        '<html><body><div><p>ctx text</p>'
        '<img src="/a.jpg" alt="pic" width="300">'
        '<a href="http://x.example/v.mov">m</a>'
        '<a href="http://x.example/page.html">not media</a>'
        '<video src="/v.mp4"></video>'
        '<iframe src="http://youtube.com/watch?v=1"></iframe>'
        "</div></body></html>"
    )
    t = pa.table(
        {
            "record_url": ["http://h.example/p"],
            "warc_type": ["response"],
            "mime": ["application/http; msgtype=response"],
            "payload": [html.encode()],
        }
    )
    out = parse.extract_media_batch(t)
    rows = out.to_pylist()
    elems = sorted(r["dom_elem"] for r in rows)
    assert elems == ["a", "iframe", "img", "video"]
    img = next(r for r in rows if r["dom_elem"] == "img")
    assert img["alt"] == "pic" and img["w"] == "300"
    assert img["page_url"] == "http://h.example/p"
    assert img["dom_depth"] >= 2


def test_media_visitor_unclosed_tag_no_parent_text_leak():
    """A pending parent-text slot registered under an UNCLOSED element
    must not survive its implicit close and absorb text from an
    unrelated element that later reuses the same stack index."""
    html = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        '<div><span><img src="/a.jpg"></div>'
        "<table><tr><td>x</td>UNRELATED TEXT</tr></table>"
    )
    t = pa.table(
        {
            "record_url": ["http://h.example/p"],
            "warc_type": ["response"],
            "mime": ["application/http; msgtype=response"],
            "payload": [html.encode()],
        }
    )
    rows = parse.extract_media_batch(t).to_pylist()
    img = next(r for r in rows if r["dom_elem"] == "img")
    assert img["parent_txt"] == ""  # the span had no text of its own


def test_is_media_url():
    # MediaNodeVisitor.main's own fixture: "asdfsdf.mov" matches
    assert parse.is_media_url("http://x/asdfsdf.mov")
    assert parse.is_media_url("http://youtube.com/watch?v=abc")
    assert not parse.is_media_url("http://x/page.html")
