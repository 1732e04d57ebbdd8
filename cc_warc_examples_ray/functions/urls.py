"""URL canonicalization: whitespace strip → RFC 3986 resolve → normalize →
SURT form → xxhash64 key (SURVEY.md §2.2 M15-M18).

The reference normalizes URLs with a hand-rolled relative resolver that
walks ``..`` segments against the page URL
(`/root/reference/src/org/commoncrawl/mklab/analysis/ProcessingService.java:436-474`,
duplicated at `URLProcessor.java:78-116`), strips whitespace
(`ProcessingService.java:170-171`), strips a leading ``www.`` from hosts
(`URLProcessor.java:60-62`), and derives a deterministic id with
``UUID.nameUUIDFromBytes`` (`ProcessingService.java:350-355`).

This engine upgrades that to the standard public form: RFC 3986 resolution
(``urllib.parse.urljoin``), scheme/host lowercasing, default-port and
fragment stripping, SURT (Sort-friendly URI Reordering Transform — the
form used by public web-archive tooling: host labels reversed and
comma-joined), and ``url_hash = xxhash64(surt)`` as the 64-bit identity
used for dedup, seen-set routing and shuffle keys.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

import numpy as np
import pyarrow as pa

from ..hashing import xxh64_many

_WS = re.compile(r"\s+")
_DEFAULT_PORTS = {"http": "80", "https": "443"}
# RFC 3986 scheme: a URL is absolute iff it STARTS with one — a bare
# '"://" in u' test misclassifies relative URLs whose query embeds an
# absolute URL (e.g. '/redir?to=http://a/b') and drops them
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


def _remove_dot_segments(p: str) -> str:
    """RFC 3986 §5.2.4 — keeps the trailing slash ('/a/b/..' → '/a/',
    not '/a': those are distinct resources and standard SURT tooling
    preserves the distinction)."""
    out: list[str] = []
    while p:
        if p.startswith("../"):
            p = p[3:]
        elif p.startswith("./"):
            p = p[2:]
        elif p.startswith("/./"):
            p = "/" + p[3:]
        elif p == "/.":
            p = "/"
        elif p.startswith("/../"):
            p = "/" + p[4:]
            if out:
                out.pop()
        elif p == "/..":
            p = "/"
            if out:
                out.pop()
        elif p in (".", ".."):
            p = ""
        else:
            i = p.find("/", 1)
            if i < 0:
                out.append(p)
                p = ""
            else:
                out.append(p[:i])
                p = p[i:]
    return "".join(out)


def _canon_one(src: str, page: str) -> tuple[str, str, str, str]:
    """→ (resolved_url, surt, host, path); empty strings when unparseable."""
    u = _WS.sub("", src or "")
    if not u:
        return "", "", "", ""
    if not _SCHEME_RE.match(u):
        u = urljoin(_WS.sub("", page or ""), u)
    try:
        parts = urlsplit(u)
        port = parts.port  # lazily raises on malformed/out-of-range ports
    except ValueError:
        return "", "", "", ""
    scheme = (parts.scheme or "http").lower()
    host = (parts.hostname or "").lower()
    if not host:
        return "", "", "", ""
    if host.startswith("www."):
        host = host[4:]
    netloc = host if port is None or str(port) == _DEFAULT_PORTS.get(scheme) else f"{host}:{port}"
    path = parts.path or "/"
    # remove dot segments (urljoin already resolves relative refs; absolute
    # inputs may still carry them)
    if "./" in path or path.endswith(("/.", "/..")):
        path = _remove_dot_segments(path) or "/"
        if not path.startswith("/"):
            path = "/" + path
    query = f"?{parts.query}" if parts.query else ""
    url = f"{scheme}://{netloc}{path}{query}"
    surt_host = ",".join(reversed(netloc.split(":")[0].split(".")))
    portsfx = f":{port}" if netloc != host else ""
    surt = f"{surt_host}{portsfx})/{path.lstrip('/')}{query}"
    return url, surt, host, path


def canonicalize_batch(batch: pa.Table) -> pa.Table:
    """map_batches kernel: FRONTIER_SEEDS cols → + (url, surt, url_hash,
    host, path).  Unparseable URLs get url_hash = 0 and empty host (the
    pipeline filters them into a rejected-count, mirroring the swallowed
    MalformedURLException at `ProcessingService.java:468-473`)."""
    srcs = batch.column("seed_url").to_pylist()
    pages = batch.column("page_url").to_pylist()
    urls, surts, hosts, paths = [], [], [], []
    for s, p in zip(srcs, pages):
        url, surt, host, path = _canon_one(s, p)
        urls.append(url)
        surts.append(surt)
        hosts.append(host)
        paths.append(path)
    surt_arr = pa.array(surts, pa.string())
    hashes = xxh64_many(surt_arr).view(np.int64)
    hashes = np.where(np.array([not s for s in surts]), np.int64(0), hashes)
    return (
        batch.append_column("url", pa.array(urls, pa.string()))
        .append_column("surt", surt_arr)
        .append_column("url_hash", pa.array(hashes, pa.int64()))
        .append_column("host", pa.array(hosts, pa.string()))
        .append_column("path", pa.array(paths, pa.string()))
    )


def host_of(urls) -> list[str]:
    """Vector host extraction w/ www-strip (M17)."""
    out = []
    for u in urls:
        try:
            h = (urlsplit(u).hostname or "").lower()
        except ValueError:
            h = ""
        out.append(h[4:] if h.startswith("www.") else h)
    return out
