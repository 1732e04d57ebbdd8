"""Single-process reference-semantics oracle (SURVEY.md §5, FIXTURES.md F6).

A deliberately naive sequential implementation of the crawl spec —
first-seen admit in seed order (`ProcessingService.java:186-192`),
robots gating, per-host politeness schedule (the spec'd generalization
of the global 150 ms mutex, `ProcessingService.java:57,235-239`) — used
as the golden for the distributed pipeline's URL-seen set and crawl
order.  Everything here is O(n) python; it exists only for tests and
small-scale verification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .functions.urls import _canon_one
from .hashing import xxh64


def crawl_oracle(
    seeds: pa.Table, robots: pa.Table, num_epochs: int = 1, default_delay_ms: int = 150
) -> pa.Table:
    """Golden admitted-URL sequence in crawl order
    ``(epoch, fetch_time_ms, seed_rank)``."""
    delays = dict(
        zip(robots.column("host").to_pylist(), robots.column("crawl_delay_ms").to_pylist())
    )
    disallow = {
        h: p
        for h, p in zip(
            robots.column("host").to_pylist(),
            robots.column("disallow_prefixes").to_pylist(),
        )
        if p
    }
    seed_urls = seeds.column("seed_url").to_pylist()
    page_urls = seeds.column("page_url").to_pylist()
    ranks = seeds.column("seed_rank").to_pylist()

    n = len(seed_urls)
    bounds = [(k * n) // num_epochs for k in range(num_epochs + 1)]
    seen: set[int] = set()
    host_idx: dict[str, int] = {}
    rows: list[tuple] = []
    for epoch in range(num_epochs):
        for j in range(bounds[epoch], bounds[epoch + 1]):
            url, surt, host, path = _canon_one(seed_urls[j], page_urls[j])
            if not host:
                continue
            if any(path.startswith(p) for p in disallow.get(host, ())):
                continue
            h = int(np.uint64(xxh64(surt.encode())).astype(np.int64))
            if h in seen:
                continue
            seen.add(h)
            i = host_idx.get(host, 0)
            host_idx[host] = i + 1
            ft = i * int(delays.get(host, default_delay_ms))
            rows.append((epoch, ft, ranks[j], h, host, i, url))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    cols = list(zip(*rows)) if rows else [[]] * 7
    return pa.table(
        {
            "epoch": pa.array(cols[0], pa.int64()),
            "fetch_time_ms": pa.array(cols[1], pa.int64()),
            "seed_rank": pa.array(cols[2], pa.int64()),
            "url_hash": pa.array(cols[3], pa.int64()),
            "host": pa.array(cols[4], pa.string()),
            "host_index": pa.array(cols[5], pa.int64()),
            "url": pa.array(cols[6], pa.string()),
        }
    )


def discovery_oracle(
    page_seeds: pa.Table, robots: pa.Table, pages_tbl: pa.Table,
    default_delay_ms: int = 150,
) -> pa.Table:
    """Golden for the two-level discovery crawl: sequential first-seen
    admit + politeness over page seeds (level 0), media extraction from
    fetched pages, then the discovered frontier (level 1).  Returns the
    combined crawl order with a ``level`` == epoch column."""
    from .stages.parse import extract_media_batch

    delays = dict(
        zip(robots.column("host").to_pylist(), robots.column("crawl_delay_ms").to_pylist())
    )
    disallow = {
        h: p
        for h, p in zip(
            robots.column("host").to_pylist(),
            robots.column("disallow_prefixes").to_pylist(),
        )
        if p
    }
    page_index = {
        u: i for i, u in enumerate(pages_tbl.column("record_url").to_pylist())
    }
    seen: set[int] = set()
    host_idx: dict[str, int] = {}
    rows: list[tuple] = []

    def admit_level(level: int, seed_urls, page_urls, ranks):
        admitted = []
        for u, p, r in zip(seed_urls, page_urls, ranks):
            url, surt, host, path = _canon_one(u, p)
            if not host:
                continue
            if any(path.startswith(pre) for pre in disallow.get(host, ())):
                continue
            h = int(np.uint64(xxh64(surt.encode())).astype(np.int64))
            if h in seen:
                continue
            seen.add(h)
            i = host_idx.get(host, 0)
            host_idx[host] = i + 1
            ft = i * int(delays.get(host, default_delay_ms))
            rows.append((level, ft, r, h, host, i, url))
            admitted.append((r, ft, url))
        return admitted

    seed_urls = page_seeds.column("seed_url").to_pylist()
    page_urls = page_seeds.column("page_url").to_pylist()
    ranks = page_seeds.column("seed_rank").to_pylist()
    admitted0 = admit_level(0, seed_urls, page_urls, ranks)

    # discovery: extract media from fetched pages in schedule order
    admitted0.sort(key=lambda t: (t[1], t[0]))
    discovered: list[tuple] = []
    base = page_seeds.num_rows
    # ordering spec: (parent seed_rank, intra-page position)
    per_parent = []
    for r, ft, url in admitted0:
        j = page_index.get(url)
        if j is None:
            continue
        one = pages_tbl.slice(j, 1)
        media = extract_media_batch(
            pa.table(
                {
                    "record_url": pa.array([url]),
                    "warc_type": pa.array(["response"]),
                    "mime": one.column("mime"),
                    "payload": one.column("payload"),
                }
            )
        )
        for k in range(media.num_rows):
            per_parent.append((r, k, media.column("src")[k].as_py(), url))
    per_parent.sort(key=lambda t: (t[0], t[1]))
    d_urls = [t[2] for t in per_parent]
    d_pages = [t[3] for t in per_parent]
    d_ranks = list(range(base, base + len(per_parent)))
    admit_level(1, d_urls, d_pages, d_ranks)

    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    cols = list(zip(*rows)) if rows else [[]] * 7
    return pa.table(
        {
            "epoch": pa.array(cols[0], pa.int64()),
            "fetch_time_ms": pa.array(cols[1], pa.int64()),
            "seed_rank": pa.array(cols[2], pa.int64()),
            "url_hash": pa.array(cols[3], pa.int64()),
            "host": pa.array(cols[4], pa.string()),
            "host_index": pa.array(cols[5], pa.int64()),
            "url": pa.array(cols[6], pa.string()),
        }
    )
