"""WARC-record parsing kernels (SURVEY.md §2.2 M1-M9).

Per-batch, vectorized re-expressions of the reference's three mapper
families plus the Jsoup media visitor:

- HTTP header/body split on the first CRLFCRLF
  (`/root/reference/src/org/commoncrawl/examples/mapreduce/TagCounterMap.java:45,53`)
- tag extraction regex ``(?i)<(?!/)([^\\s>]+)([^>]*)>``
  (`TagCounterMap.java:27,55-60`)
- whitespace word tokens + EMPTY_PAGE_TEXT counter
  (`WordCounterMap.java:39-47`)
- WAT JSON ``Envelope→…→Headers→Server`` walk (`ServerTypeMap.java:41-47`)
- DOM media extraction — one row per media element with page context
  (`MediaMap.java:46-67`, `MediaNodeVisitor.java:61-139`) — via the
  stdlib ``html.parser`` instead of Jsoup.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

RESPONSE_MIME = "application/http; msgtype=response"
TAG_RE = re.compile(r"(?i)<(?!/)([^\s>]+)([^>]*)>")  # TagCounterMap.java:27 verbatim semantics

# MediaNodeVisitor.java:28,32 — media suffixes + per-site URL patterns (:36-42)
MEDIA_SUFFIXES = (
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".tif", ".tiff", ".svg", ".webp",
    ".mp4", ".avi", ".mov", ".mpg", ".mpeg", ".wmv",
)
MEDIA_SUFFIX_RE = re.compile(
    r"(?i)\.(jpe?g|png|gif|bmp|tiff?|svg|webp|mp4|avi|mov|mpe?g|wmv)([?#].*)?$"
)
SITE_PATTERN_RE = re.compile(
    r"(?i)(instagram\.com/p/|youtube\.com/watch|youtu\.be/|vimeo\.com/\d+|"
    r"twitpic\.com/|dailymotion\.com/video|facebook\.com/photo|flickr\.com/photos)"
)


def is_media_url(u: str) -> bool:
    """M10 predicate: suffix OR site pattern (`MediaNodeVisitor.java:159-168`)."""
    return bool(MEDIA_SUFFIX_RE.search(u) or SITE_PATTERN_RE.search(u))


def split_http_payload(payload: bytes) -> tuple[str, str]:
    """(header_text, body_text); empty header when no CRLFCRLF (M4)."""
    try:
        text = payload.decode("utf-8", errors="replace")
    except Exception:
        return "", ""
    idx = text.find("\r\n\r\n")
    if idx < 0:
        return "", text
    return text[:idx], text[idx + 4 :]


def extract_tags_batch(tbl: pa.Table) -> pa.Table:
    """response records → one row per HTML tag occurrence (M1+M4-M6)."""
    mimes = tbl.column("mime").to_pylist()
    payloads = tbl.column("payload").to_pylist()
    tags: list[str] = []
    for mime, payload in zip(mimes, payloads):
        if mime != RESPONSE_MIME:
            continue
        header, body = split_http_payload(payload)
        # deliberately lax Content-Type check, mirroring TagCounterMap.java:48-49
        if "Content-Type: text/html" not in header:
            continue
        for m in TAG_RE.finditer(body):
            tags.append(m.group(1).lower())
    return pa.table({"tag": pa.array(tags, pa.string())})


def extract_words_batch(tbl: pa.Table) -> pa.Table:
    """WET text/plain records → one row per whitespace token (M2+M7);
    counters EMPTY_PAGE_TEXT / NON_PLAIN_TEXT ride as a metrics table."""
    mimes = tbl.column("mime").to_pylist()
    payloads = tbl.column("payload").to_pylist()
    words: list[str] = []
    for mime, payload in zip(mimes, payloads):
        if mime != "text/plain":
            continue
        words.extend(payload.decode("utf-8", errors="replace").split())
    return pa.table({"word": pa.array(words, pa.string())})


def warc_counters_batch(tbl: pa.Table) -> pa.Table:
    """A10 job counters per batch: RECORDS_IN / NON_PLAIN_TEXT /
    EMPTY_PAGE_TEXT / NO_SERVER — one partial row per counter."""
    mimes = tbl.column("mime").to_pylist()
    payloads = tbl.column("payload").to_pylist()
    c = {"RECORDS_IN": len(mimes), "NON_PLAIN_TEXT": 0, "EMPTY_PAGE_TEXT": 0, "NO_SERVER": 0}
    for mime, payload in zip(mimes, payloads):
        if mime == "text/plain":
            if not payload.decode("utf-8", errors="replace").strip():
                c["EMPTY_PAGE_TEXT"] += 1
        elif mime == "application/json":
            if extract_server(payload) is None:
                c["NO_SERVER"] += 1
        elif mime != RESPONSE_MIME:
            c["NON_PLAIN_TEXT"] += 1
    return pa.table(
        {
            "counter": pa.array(list(c), pa.string()),
            "value": pa.array([np.int64(v) for v in c.values()], pa.int64()),
        }
    )


def extract_server(payload: bytes):
    """M8: nested JSON path walk, missing path → None
    (`ServerTypeMap.java:41-47`)."""
    try:
        obj = json.loads(payload)
        return obj["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]["Headers"]["Server"]
    except Exception:
        return None


def extract_servers_batch(tbl: pa.Table) -> pa.Table:
    mimes = tbl.column("mime").to_pylist()
    payloads = tbl.column("payload").to_pylist()
    servers = [
        s
        for mime, p in zip(mimes, payloads)
        if mime == "application/json" and (s := extract_server(p)) is not None
    ]
    return pa.table({"server": pa.array(servers, pa.string())})


# ---------------------------------------------------------------------------
# M9: DOM media extraction (MediaNodeVisitor re-expressed on html.parser)
# ---------------------------------------------------------------------------

_TRUNC = 500  # alt/parentTxt cap (MediaNodeVisitor.java:44,146-152)


class _MediaVisitor(HTMLParser):
    """Streaming HTML visitor emitting one media row per matched element:
    img / a / link[href=media] / video / video>source / iframe / embed /
    object (`MediaNodeVisitor.java:75-120`), with dom depth, sibling
    count and parent text (`:121-132`)."""

    def __init__(self, page_url: str):
        super().__init__(convert_charrefs=True)
        self.page_url = page_url
        self.rows: list[dict] = []
        self.stack: list[list] = []  # [tag, n_children, text_parts]
        self._pending_text_rows: list[tuple[int, dict]] = []

    def _depth(self) -> int:
        return len(self.stack)

    def _emit(self, src, elem, attrs: dict):
        if not src:
            return
        parent = self.stack[-1] if self.stack else None
        row = {
            "src": src,
            "alt": (attrs.get("alt") or "")[:_TRUNC],
            "w": attrs.get("width") or "",
            "h": attrs.get("height") or "",
            "page_url": self.page_url,
            "parent_txt": "",
            "dom_sib": int(parent[1]) if parent else 0,
            "dom_depth": self._depth(),
            "dom_elem": elem,
        }
        self.rows.append(row)
        if parent is not None:
            self._pending_text_rows.append((len(self.stack) - 1, row))

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if self.stack:
            self.stack[-1][1] += 1
        if tag == "img":
            self._emit(a.get("src"), "img", a)
        elif tag in ("a", "link"):
            href = a.get("href") or ""
            if is_media_url(href):
                self._emit(href, tag, a)
        elif tag == "video":
            if a.get("src"):
                self._emit(a.get("src"), "video", a)
        elif tag == "source":
            if self.stack and self.stack[-1][0] == "video":
                self._emit(a.get("src"), "source", a)
        elif tag in ("iframe", "embed"):
            src = a.get("src") or ""
            if is_media_url(src):
                self._emit(src, tag, a)
        elif tag == "object":
            data = a.get("data") or ""
            if is_media_url(data):
                self._emit(data, "object", a)
        if tag not in ("img", "br", "hr", "meta", "link", "input", "source"):
            self.stack.append([tag, 0, []])

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i][0] == tag:
                # resolve pending rows for EVERY element being closed —
                # stack[i] explicitly, deeper ones implicitly (unclosed
                # tags).  An entry left behind would later match an
                # unrelated element that reuses its stack index and
                # receive that element's text.
                texts = {
                    lvl: " ".join(self.stack[lvl][2]).strip()[:_TRUNC]
                    for lvl in range(i, len(self.stack))
                }
                for lvl, row in self._pending_text_rows:
                    if lvl >= i and not row["parent_txt"]:
                        row["parent_txt"] = texts[lvl]
                self._pending_text_rows = [(l, r) for l, r in self._pending_text_rows if l < i]
                del self.stack[i:]
                break

    def handle_data(self, data):
        if self.stack and data.strip():
            self.stack[-1][2].append(data.strip())


def extract_media_batch(tbl: pa.Table, with_page_index: bool = False) -> pa.Table:
    """response+HTML records → CRAWLED_MEDIA rows (one per media element).

    ``with_page_index=True`` appends ``_page_idx`` = the input-batch row
    each media row came from (rows are emitted grouped by page, in page
    order) — lets callers derive per-page positions vectorized instead
    of re-invoking the visitor one page at a time."""
    from ..schemas import CRAWLED_MEDIA

    mimes = tbl.column("mime").to_pylist()
    payloads = tbl.column("payload").to_pylist()
    urls = tbl.column("record_url").to_pylist()
    rows: list[dict] = []
    page_of: list[int] = []
    for pi, (mime, payload, url) in enumerate(zip(mimes, payloads, urls)):
        if mime != RESPONSE_MIME:
            continue
        header, body = split_http_payload(payload)
        if "Content-Type: text/html" not in header:
            continue
        v = _MediaVisitor(url)
        try:
            v.feed(body)
            v.close()
        except Exception:
            continue  # swallow-and-continue (MediaMap.java:63-65)
        rows.extend(v.rows)
        page_of.extend([pi] * len(v.rows))
    if not rows:
        out = CRAWLED_MEDIA.empty_table()
    else:
        cols = {name: [r[name] for r in rows] for name in CRAWLED_MEDIA.names}
        out = pa.table(cols, schema=CRAWLED_MEDIA)
    if with_page_index:
        out = out.append_column("_page_idx", pa.array(page_of, pa.int64()))
    return out
