"""Gzip JSON-lines source (SURVEY.md §2.1 S6, M14).

The reference walks a directory tree, streams each ``.gz`` file line by
line and parses each line leniently into a ``CrawledImage``; malformed
lines are counted, not fatal
(`/root/reference/src/org/commoncrawl/mklab/CommonCrawlAnalyzer.java:96-182`,
lenient gson at `:82-94,131-135`).

Ray-native shape: ``read_binary_files`` (one block per file — mirrors
the non-splittable-gzip rule, `WARCFileInputFormat.java:29-32`) →
``flat_map``-style ``map_batches`` that gunzips + parses, emitting data
rows plus a per-file ``_parse_errors`` count column.
"""

from __future__ import annotations

import gzip
import json
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")

FIELDS = ("src", "alt", "w", "h", "pageUrl", "parentTxt", "domSib", "domDepth", "domElem")
_SNAKE = {
    "src": "src", "alt": "alt", "w": "w", "h": "h", "pageUrl": "page_url",
    "parentTxt": "parent_txt", "domSib": "dom_sib", "domDepth": "dom_depth",
    "domElem": "dom_elem",
}


def parse_gz_jsonl_batch(batch: pa.Table) -> pa.Table:
    """(path, bytes) → CrawledImage-ish rows + parse-error counts."""
    paths = batch.column("path").to_pylist()
    blobs = batch.column("bytes").to_pylist()
    out: dict[str, list] = {v: [] for v in _SNAKE.values()}
    out["source_file"] = []
    out["parse_errors"] = []
    for path, blob in zip(paths, blobs):
        errors = 0
        try:
            # Arrow's filesystem layer may have already inflated .gz
            # payloads (compression inferred from the extension);
            # decompress only when the magic is present.
            if blob[:2] == b"\x1f\x8b":
                blob = gzip.decompress(blob)
            text = bytes(blob).decode("utf-8", errors="replace")
        except Exception:
            text = ""
            errors += 1  # unreadable file = one counted error
        rows = []
        for line in text.splitlines():
            line = line.strip().rstrip(",")
            if not line:
                continue
            try:
                obj = json.loads(line)
                if isinstance(obj, dict):
                    rows.append(obj)
                else:
                    errors += 1  # valid JSON but not a record object
            except json.JSONDecodeError:
                errors += 1  # counted, not fatal (CommonCrawlAnalyzer.java:131-135)
        if not rows and errors:
            # all-malformed / unreadable file: emit one null record row
            # so the per-file error count survives — these are exactly
            # the files the lenient-counting contract must surface
            for snake in _SNAKE.values():
                out[snake].append(None)
            out["source_file"].append(path)
            out["parse_errors"].append(errors)
            continue
        for obj in rows:
            for camel, snake in _SNAKE.items():
                v = obj.get(camel)
                if snake in ("dom_sib", "dom_depth"):
                    try:
                        v = int(v) if v is not None else None
                    except (TypeError, ValueError):
                        v = None
                elif v is not None:
                    v = str(v)
                out[snake].append(v)
            out["source_file"].append(path)
            out["parse_errors"].append(errors)
    arrays = {
        "src": pa.array(out["src"], pa.string()),
        "alt": pa.array(out["alt"], pa.string()),
        "w": pa.array(out["w"], pa.string()),
        "h": pa.array(out["h"], pa.string()),
        "page_url": pa.array(out["page_url"], pa.string()),
        "parent_txt": pa.array(out["parent_txt"], pa.string()),
        "dom_sib": pa.array(out["dom_sib"], pa.int32()),
        "dom_depth": pa.array(out["dom_depth"], pa.int32()),
        "dom_elem": pa.array(out["dom_elem"], pa.string()),
        "source_file": pa.array(out["source_file"], pa.string()),
        "parse_errors": pa.array(np.array(out["parse_errors"] or [], dtype=np.int64)),
    }
    return pa.table(arrays)


def read_gz_jsonl(paths: str | list[str], **kw) -> rd.Dataset:
    """Recursive dir walk → gz jsonl → CrawledImage rows (lenient).

    Files are enumerated driver-side and the read is pinned to one block
    per file (the non-splittable-gzip rule) — this also avoids Ray's
    empty read blocks, which skip the UDF and would poison the unified
    schema with a 0-column block."""
    import os

    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, dirs, names in os.walk(p):
                dirs.sort()  # deterministic traversal across filesystems
                files.extend(os.path.join(root, n) for n in sorted(names) if n.endswith(".gz"))
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no .gz files under {paths}")
    ds = rd.read_binary_files(files, include_paths=True,
                              override_num_blocks=len(files), **kw)
    return ds.map_batches(parse_gz_jsonl_batch, batch_format="pyarrow")


def read_seeds(path: str) -> pa.Table:
    """S8: seed-URL list file → (seed_url, seed_rank, host) with
    leading-``www.`` stripped (`MultithreadedAnalyzer.java:185-202`)."""
    from urllib.parse import urlsplit

    urls, hosts = [], []
    with open(path) as f:
        for line in f:
            u = line.strip()
            if not u:
                continue
            urls.append(u)
            try:
                # scheme must START the string — '://' later in the URL
                # (e.g. inside a query) does not make it absolute
                absu = u if _SCHEME_RE.match(u) else "http://" + u
                h = (urlsplit(absu).hostname or "").lower()
            except ValueError:
                h = ""
            hosts.append(h[4:] if h.startswith("www.") else h)
    return pa.table(
        {
            "seed_url": pa.array(urls, pa.string()),
            "seed_rank": pa.array(np.arange(len(urls), dtype=np.int64)),
            "host": pa.array(hosts, pa.string()),
        }
    )
