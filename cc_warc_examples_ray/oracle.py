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


class _AdmitState:
    """THE sequential admission rule — canon → robots gate → first-seen
    dedup → per-host politeness counter — kept in exactly one place so
    the flagship (per-epoch) and discovery (per-level) goldens can never
    drift from each other."""

    def __init__(self, robots: pa.Table, default_delay_ms: int):
        self.delays = dict(
            zip(robots.column("host").to_pylist(),
                robots.column("crawl_delay_ms").to_pylist())
        )
        self.disallow = {
            h: p
            for h, p in zip(
                robots.column("host").to_pylist(),
                robots.column("disallow_prefixes").to_pylist(),
            )
            if p
        }
        self.default_delay_ms = default_delay_ms
        self.seen: set[int] = set()
        self.host_idx: dict[str, int] = {}
        self.rows: list[tuple] = []

    def admit(self, label: int, seed_urls, page_urls, ranks) -> list[tuple]:
        """Admit one epoch/level slice in order; returns the admitted
        (seed_rank, fetch_time_ms, url) triples."""
        admitted = []
        for u, p, r in zip(seed_urls, page_urls, ranks):
            url, surt, host, path = _canon_one(u, p)
            if not host:
                continue
            if any(path.startswith(pre) for pre in self.disallow.get(host, ())):
                continue
            h = int(np.uint64(xxh64(surt.encode())).astype(np.int64))
            if h in self.seen:
                continue
            self.seen.add(h)
            i = self.host_idx.get(host, 0)
            self.host_idx[host] = i + 1
            ft = i * int(self.delays.get(host, self.default_delay_ms))
            self.rows.append((label, ft, r, h, host, i, url))
            admitted.append((r, ft, url))
        return admitted

    def table(self) -> pa.Table:
        rows = sorted(self.rows, key=lambda r: (r[0], r[1], r[2]))
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


def crawl_oracle(
    seeds: pa.Table, robots: pa.Table, num_epochs: int = 1, default_delay_ms: int = 150
) -> pa.Table:
    """Golden admitted-URL sequence in crawl order
    ``(epoch, fetch_time_ms, seed_rank)``."""
    st = _AdmitState(robots, default_delay_ms)
    seed_urls = seeds.column("seed_url").to_pylist()
    page_urls = seeds.column("page_url").to_pylist()
    ranks = seeds.column("seed_rank").to_pylist()

    n = len(seed_urls)
    bounds = [(k * n) // num_epochs for k in range(num_epochs + 1)]
    for epoch in range(num_epochs):
        lo, hi = bounds[epoch], bounds[epoch + 1]
        st.admit(epoch, seed_urls[lo:hi], page_urls[lo:hi], ranks[lo:hi])
    return st.table()


def discovery_oracle(
    page_seeds: pa.Table, robots: pa.Table, pages_tbl: pa.Table,
    default_delay_ms: int = 150,
) -> pa.Table:
    """Golden for the two-level discovery crawl: sequential first-seen
    admit + politeness over page seeds (level 0), media extraction from
    fetched pages, then the discovered frontier (level 1).  Returns the
    combined crawl order with a ``level`` == epoch column."""
    from .stages.parse import extract_media_batch

    st = _AdmitState(robots, default_delay_ms)
    page_index = {
        u: i for i, u in enumerate(pages_tbl.column("record_url").to_pylist())
    }

    admitted0 = st.admit(
        0,
        page_seeds.column("seed_url").to_pylist(),
        page_seeds.column("page_url").to_pylist(),
        page_seeds.column("seed_rank").to_pylist(),
    )

    # discovery: extract media from fetched pages in schedule order
    admitted0.sort(key=lambda t: (t[1], t[0]))
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
    st.admit(1, d_urls, d_pages, d_ranks)
    return st.table()
