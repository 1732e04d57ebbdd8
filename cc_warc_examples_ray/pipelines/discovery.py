"""Discovery crawl: multi-level frontier growth (SURVEY.md §3.2 + §3.3
chained — the reference's MediaExtractor → Analyzer pipeline as ONE
streaming crawl).

Level 0 fetches page URLs from the page store (WARC-record shaped),
extracts media elements from their HTML
(`/root/reference/src/org/commoncrawl/mklab/MediaMap.java:46-67`), and
the extracted media URLs become the next level's frontier — resolved,
first-seen-deduped and politeness-scheduled through the SAME
FrontierShard pool (per-host counters continue across levels, exactly
like the reference feeding extractor output files into the analyzer,
`CommonCrawlAnalyzer.java:96-139`).  The final level fetches image
payloads and decode-validates them.

Determinism: discovered URLs get ``seed_rank = base + row_number`` in
``(parent_rank, intra-page position)`` order, so the admitted sequence
and politeness schedule are reproducible under any parallelism
(crawl-order spec of SURVEY.md §2.8, extended with a ``level`` axis).
Checkpoint/resume granularity = level (partition per level).
"""

from __future__ import annotations

import numpy as np

import pyarrow as pa
import ray
import ray.data as rd

from .. import lancelite, synth
from ..functions.urls import canonicalize_batch
from ..hashing import xxh64_many
from ..stages.decode import DecodeValidate
from ..stages.fetch import MAX_FETCH_ROWS_PER_BLOCK, add_image_ids, fetch_from_store
from ..stages.parse import extract_media_batch
from ..state.frontier_shard import FrontierPool
from .crawl import (
    ORDER_COLS,
    CrawlRun,
    _robots_maps,
    admit_table,
    canonicalized_ds,
    lineage_table,
)


def _admit(pool: FrontierPool, ct: pa.Table) -> pa.Table:
    """Rank-ordered epoch admission — the flagship's shared
    :func:`..pipelines.crawl.admit_table` (one protocol, all modes)."""
    return admit_table(pool, ct)


def _canonicalize(seeds: pa.Table, disallow, nblocks: int) -> pa.Table:
    eds = canonicalized_ds(seeds, disallow, nblocks)
    tables = [t for t in ray.get(eds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return canonicalize_batch(seeds.slice(0, 0))  # empty, right schema
    return pa.concat_tables(tables).combine_chunks()


def discover_kernel(tbl: pa.Table) -> pa.Table:
    """map_batches kernel: fetched page records → CRAWLED_MEDIA rows +
    (parent_rank, intra_pos) for deterministic discovery ordering.  ONE
    visitor pass over the whole batch; per-page positions derive from
    the extractor's ``_page_idx`` column (rows arrive grouped by page in
    page order), not from a per-page table slice + re-invocation."""
    media = extract_media_batch(
        pa.table(
            {
                "record_url": tbl.column("url"),
                "warc_type": pa.array(["response"] * tbl.num_rows),
                "mime": tbl.column("mime"),
                "payload": tbl.column("payload"),
            }
        ),
        with_page_index=True,
    )
    if media.num_rows == 0:
        return _EMPTY_MEDIA
    idx = media.column("_page_idx").to_numpy()
    ranks = tbl.column("seed_rank").to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.bincount(idx, minlength=tbl.num_rows)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    intra = np.arange(len(idx), dtype=np.int64) - starts[idx]
    return media.drop_columns(["_page_idx"]).append_column(
        "parent_rank", pa.array(ranks[idx])
    ).append_column("intra_pos", pa.array(intra))


from ..schemas import CRAWLED_MEDIA as _CM  # noqa: E402

_EMPTY_MEDIA = pa.schema(
    list(_CM) + [pa.field("parent_rank", pa.int64()), pa.field("intra_pos", pa.int64())]
).empty_table()


def discover_media(pages: pa.Table, nblocks: int = 16) -> pa.Table:
    """Distributed discovery: split fetched pages into blocks and run
    :func:`discover_kernel` as parallel tasks."""
    if pages.num_rows == 0:
        return _EMPTY_MEDIA
    step = max(16, min(MAX_FETCH_ROWS_PER_BLOCK, pages.num_rows // nblocks + 1))
    chunks = [pages.slice(i, step) for i in range(0, pages.num_rows, step)]
    ds = rd.from_arrow(chunks).map_batches(discover_kernel, batch_format="pyarrow")
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return _EMPTY_MEDIA
    return pa.concat_tables(tables).combine_chunks().cast(_EMPTY_MEDIA.schema)


# broadcast page-store table + url index, cached per store so the fresh
# and resume call sites (and repeated runs in one process) read it once
_PAGES_IDX_CACHE: dict[tuple, tuple[pa.Table, dict]] = {}


def _pages_index(paths: tuple) -> tuple[pa.Table, dict]:
    import os

    import pyarrow.parquet as pq

    # cache key includes file stats: fixture paths can be overwritten
    # with different content (e.g. per-sf regeneration at a fixed path)
    key = (paths, tuple((os.path.getmtime(p), os.path.getsize(p)) for p in paths))
    got = _PAGES_IDX_CACHE.get(key)
    if got is None:
        if len(_PAGES_IDX_CACHE) > 2:
            _PAGES_IDX_CACHE.clear()
        tbl = pa.concat_tables([pq.read_table(p) for p in paths])
        urls = tbl.column("record_url").to_pylist()
        idx = {u: i for i, u in enumerate(urls)}
        if len(idx) != len(urls):
            # PRECONDITION for both fetch modes: duplicate record_url
            # rows would make broadcast (dict keeps one copy) and scan
            # (fans out to every copy) diverge AND make the discovered
            # ordering block-arrival-dependent — dedupe upstream
            # (exact_dedup on record_url) before discovery
            raise ValueError(
                f"page store has {len(urls) - len(idx)} duplicate "
                "record_url rows; discovery requires a unique page key"
            )
        got = _PAGES_IDX_CACHE.setdefault(key, (tbl, idx))
    return got


def _page_fetch_and_discover(
    admitted: pa.Table, pages_store_paths: list[str], nblocks: int,
    force_scan: bool = False,
) -> tuple[pa.Table, int]:
    """Fetch admitted level-0 pages and extract media → (media table,
    n_pages_fetched).  Two modes, mirroring the image fetch dispatch:

    - **broadcast** (page store fits the object store): driver-side url
      index + take — fastest at bench scale.
    - **scan** (the 100 TB path, or ``force_scan``): stream the page
      store's parquet fragments and semi-join each batch against the
      broadcast admitted epoch on canonical url
      (:func:`..stages.fetch.fetch_scan_keyed`); page payloads never
      touch the driver — extraction runs inside the same ``map_batches``
      chain.  Hit count comes from a column-pruned ``record_url`` scan."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.fetch import BROADCAST_STORE_MAX_BYTES, fetch_scan_keyed

    size = sum(os.path.getsize(p) for p in pages_store_paths)
    if force_scan or size > BROADCAST_STORE_MAX_BYTES:
        sel = admitted.select(["url", "seed_rank"])
        fetched_ds = fetch_scan_keyed(
            pages_store_paths, sel, store_key="record_url", admitted_key="url",
            meta_cols=("url", "seed_rank"), num_blocks=nblocks,
            # called once per level/sub-epoch over the SAME page store:
            # scan it once, re-map the materialized blocks afterwards
            reuse_store=True,
        )
        media_ds = fetched_ds.map_batches(discover_kernel, batch_format="pyarrow")
        mtabs = [t for t in ray.get(media_ds.to_arrow_refs()) if t.num_rows]
        media = (
            pa.concat_tables(mtabs).combine_chunks().cast(_EMPTY_MEDIA.schema)
            if mtabs else _EMPTY_MEDIA
        )
        from ..stages.fetch import _store_id_column

        store_urls = _store_id_column(tuple(pages_store_paths), "record_url")
        hit_mask = pc.is_in(admitted.column("url"), value_set=store_urls)
        n_hit = int(pc.sum(pc.cast(hit_mask, pa.int64())).as_py() or 0)
        return media, n_hit

    pages_tbl, page_index = _pages_index(tuple(pages_store_paths))
    pos = [page_index.get(u, -1) for u in admitted.column("url").to_pylist()]
    hit = [i for i, p in enumerate(pos) if p >= 0]
    fetched_pages = pages_tbl.take(pa.array([pos[i] for i in hit], pa.int64()))
    meta = admitted.take(pa.array(hit, pa.int64()))
    fetched = meta.append_column("mime", fetched_pages.column("mime")).append_column(
        "payload", fetched_pages.column("payload")
    )
    return discover_media(fetched), len(hit)


# Default sub-epoch size: bounds the frontier metadata the driver holds
# at any moment (one sub-epoch + the partitions overlapping one rank
# range) — the discovery analog of the flagship's per-epoch
# canonicalization.  2^18 URLs x ~100 B of metadata ≈ 25 MB driver-side.
URLS_PER_EPOCH = 1 << 18

_DISC_SCHEMA = pa.schema(
    [
        pa.field("seed_url", pa.string()),
        pa.field("page_url", pa.string()),
        pa.field("seed_rank", pa.int64()),
    ]
)


def _bounds(n: int, per: int | None) -> list[tuple[int, int]]:
    """Rank-contiguous even split of ``n`` rows into ceil(n/per) epochs
    (deterministic — resume recomputes the identical split)."""
    per = per or max(n, 1)
    k = max(1, (n + per - 1) // per)
    return [((i * n) // k, ((i + 1) * n) // k) for i in range(k)]


def _discovered_rows(disc: "lancelite.LanceLiteTable", n_parts: int) -> list[int]:
    """Committed discovered-row count per level-0 partition, from the
    manifest alone (no data read)."""
    rows = [0] * n_parts
    for f in disc.manifest()["fragments"]:
        p = f["partition"]
        if p is not None and 0 <= p < n_parts:
            rows[p] += f["rows"]
    return rows


def _read_discovered_range(
    disc: "lancelite.LanceLiteTable", rows: list[int], base: int, lo: int, hi: int
) -> pa.Table:
    """Read discovered-frontier global positions [lo, hi) touching only
    the level-0 partitions that overlap the range (ranks are absolute:
    ``base + position``)."""
    import pyarrow.compute as pc

    if hi <= lo:
        return _DISC_SCHEMA.empty_table()
    cum = np.concatenate([[0], np.cumsum(rows)])
    tabs = [
        disc.partition_table(p)
        for p in range(len(rows))
        if rows[p] and cum[p] < hi and cum[p + 1] > lo
    ]
    tabs = [t for t in tabs if t.num_columns]  # skip empty-partition sentinels
    if not tabs:
        return _DISC_SCHEMA.empty_table()
    t = pa.concat_tables(tabs)
    r = t.column("seed_rank")
    return t.filter(
        pc.and_(pc.greater_equal(r, base + lo), pc.less(r, base + hi))
    ).sort_by([("seed_rank", "ascending")])


def run_discovery_crawl(
    page_seeds: pa.Table,
    robots: pa.Table,
    pages_store_paths: list[str],
    images_store_paths: list[str],
    out_dir: str,
    *,
    num_shards: int = 4,
    store_size: int | None = None,
    min_dim: int = synth.SMALL_DIM_GATE,
    shard_capacity: int = 1 << 20,
    force_scan_pages: bool = False,
    urls_per_epoch: int | None = URLS_PER_EPOCH,
    fail_after_part: int | None = None,
) -> CrawlRun:
    """Two-level crawl: pages (level 0) → discovered media (level 1).

    Each level is processed in rank-contiguous **sub-epochs** of
    ``urls_per_epoch`` URLs (``None`` = whole level at once), so driver
    metadata is O(sub-epoch) — never O(level) — and sub-epoch is the
    checkpoint/resume granularity (lancelite partition = global sub-epoch
    index across levels; the order table's ``epoch`` column remains the
    LEVEL, the oracle-checked surface).  Discovered media are committed
    to a persistent ``discovered`` table per level-0 sub-epoch with their
    deterministic ranks (``n_seeds + global (parent_rank, intra_pos)
    position`` — sub-epochs are contiguous parent-rank ranges, so
    concatenation order IS the global order); level 1 streams rank ranges
    back from it, and a resume never re-runs level-0 extraction.

    ``force_scan_pages`` forces the streaming scan-store page join even
    when the page store would fit a broadcast (test hook for the scale
    path)."""
    import pyarrow.parquet as pq

    run = CrawlRun(out_dir)
    run.discovered = lancelite.LanceLiteTable(f"{out_dir}/discovered")
    if store_size is None:
        store_size = sum(pq.read_metadata(p).num_rows for p in images_store_paths)
    delays, disallow = _robots_maps(robots)
    nblocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)

    n_seeds = page_seeds.num_rows
    b0 = _bounds(n_seeds, urls_per_epoch)
    n0 = len(b0)

    start = run.resume_epoch()
    pool = FrontierPool(num_shards, capacity_per_shard=shard_capacity)
    try:
        hs = list(delays)
        # ONE vectorized hash call over all hosts (per-host 1-element
        # xxh64_many calls cost ~0.1 ms each — serial driver seconds at
        # a 10^5-host robots table)
        pool.set_robots(delays, dict(zip(hs, (int(v) for v in xxh64_many(hs)))) if hs else {})
        if start > 0:
            blobs_tbl = run.state.partition_table(start - 1)
            order = np.argsort(blobs_tbl.column("shard").to_numpy())
            pool.restore([blobs_tbl.column("blob")[int(i)].as_py() for i in order])

        def commit(level: int, part: int, admitted: pa.Table, counters: dict):
            """Commit one sub-epoch's (order, lineage, state) — state
            LAST: it is the completion marker ``resume_epoch`` checks
            (state ∧ images), and everything before it is idempotent and
            deterministic, so a crash mid-commit replays cleanly."""
            if admitted.num_rows and "image_id" not in admitted.column_names:
                admitted = admitted.append_column(
                    "image_id", pa.nulls(admitted.num_rows, pa.string())
                )
            run.crawl_order.append_partition(
                admitted if admitted.num_rows else pa.table({}), part
            )
            run.lineage.append_partition(
                lineage_table(level, part, "discovery", counters), part
            )
            run.state.append_partition(
                pa.table(
                    {
                        "shard": pa.array(range(num_shards), pa.int64()),
                        "blob": pa.array(pool.checkpoints(), pa.binary()),
                    }
                ),
                part,
            )
            if fail_after_part is not None and part >= fail_after_part:
                raise RuntimeError(f"injected failure after sub-epoch {part}")

        # ---- level 0: pages, one sub-epoch at a time -----------------------
        disc_counts = _discovered_rows(run.discovered, n0)
        disc_base = sum(disc_counts[: min(start, n0)])
        for p in range(min(start, n0), n0):
            lo, hi = b0[p]
            ct = _canonicalize(page_seeds.slice(lo, hi - lo), disallow, nblocks)
            admitted = _admit(pool, ct)
            admitted = admitted.append_column(
                "epoch", pa.array(np.zeros(admitted.num_rows, dtype=np.int64))
            ).sort_by([("fetch_time_ms", "ascending"), ("seed_rank", "ascending")])
            media, n_hit = _page_fetch_and_discover(
                admitted, pages_store_paths, nblocks, force_scan_pages
            )
            m = media.sort_by([("parent_rank", "ascending"), ("intra_pos", "ascending")])
            disc = pa.table(
                {
                    "seed_url": m.column("src"),
                    "page_url": m.column("page_url"),
                    "seed_rank": pa.array(
                        n_seeds + disc_base + np.arange(m.num_rows, dtype=np.int64),
                        pa.int64(),
                    ),
                }
            ).cast(_DISC_SCHEMA)
            # images sentinel + discovered BEFORE the state commit (the
            # completion marker): both are idempotent on replay
            run.images_out.append_partition(pa.table({}), p)
            run.discovered.append_partition(disc, p)
            order_cols = [c for c in ORDER_COLS if c in admitted.column_names]
            commit(
                0,
                p,
                admitted.select(order_cols),
                {
                    "seeds_in": hi - lo,
                    "admitted": admitted.num_rows,
                    "pages_fetched": n_hit,
                    "media_extracted": media.num_rows,
                },
            )
            disc_counts[p] = disc.num_rows
            disc_base += disc.num_rows

        # ---- level 1: discovered media → image fetch + validate -----------
        n_disc = sum(disc_counts)
        b1 = _bounds(n_disc, urls_per_epoch)
        for q in range(max(0, start - n0), len(b1)):
            part = n0 + q
            lo, hi = b1[q]
            frontier = _read_discovered_range(
                run.discovered, disc_counts, n_seeds, lo, hi
            )
            ct = _canonicalize(frontier, disallow, nblocks)
            admitted = _admit(pool, ct)
            admitted = admitted.append_column(
                "epoch", pa.array(np.ones(admitted.num_rows, dtype=np.int64))
            )
            admitted = add_image_ids(admitted, store_size)
            admitted = admitted.sort_by(
                [("fetch_time_ms", "ascending"), ("seed_rank", "ascending")]
            ).select(list(ORDER_COLS) + ["image_id"])
            fetched = fetch_from_store(images_store_paths, admitted, num_blocks=nblocks)
            validated = fetched.map_batches(
                DecodeValidate(min_dim=min_dim), batch_format="pyarrow", batch_size=256
            )
            run.images_out.append_ray_partition(validated, part)
            flags = run.images_out.partition_table(part, columns=["valid", "big"])
            commit(
                1,
                part,
                admitted,
                {
                    "seeds_in": hi - lo,
                    "admitted": admitted.num_rows,
                    "fetched": flags.num_rows,
                    "valid": int(pa.compute.sum(flags.column("valid")).as_py() or 0)
                    if flags.num_rows else 0,
                },
            )
    finally:
        pool.shutdown()
    return run
