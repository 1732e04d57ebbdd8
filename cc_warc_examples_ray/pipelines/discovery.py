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
    canonicalized_ds,
    lineage_table,
)


def _admit(pool: FrontierPool, ct: pa.Table) -> pa.Table:
    """Rank-ordered epoch admission, Arrow end-to-end (mirrors the
    flagship's admit_epoch — pandas round-trips were the dominant serial
    cost at large frontiers)."""
    ct = ct.sort_by([("seed_rank", "ascending")])
    if ct.num_rows == 0:
        return ct.append_column("fetch_time_ms", pa.array([], pa.int64())).append_column(
            "host_index", pa.array([], pa.int64())
        )
    uh = ct.column("url_hash").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    hh = xxh64_many(ct.column("host"))
    a, ft, hi = pool.admit_and_schedule_pipelined(uh, hh)
    out = ct.filter(pa.array(a))
    return out.append_column("fetch_time_ms", pa.array(ft[a], pa.int64())).append_column(
        "host_index", pa.array(hi[a], pa.int64())
    )


def _canonicalize(seeds: pa.Table, disallow, nblocks: int) -> pa.Table:
    eds = canonicalized_ds(seeds, disallow, nblocks)
    tables = [t for t in ray.get(eds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return canonicalize_batch(seeds.slice(0, 0))  # empty, right schema
    return pa.concat_tables(tables).combine_chunks()


def discover_kernel(tbl: pa.Table) -> pa.Table:
    """map_batches kernel: fetched page records → CRAWLED_MEDIA rows +
    (parent_rank, intra_pos) for deterministic discovery ordering."""
    out = []
    for i in range(tbl.num_rows):
        one = tbl.slice(i, 1)
        media = extract_media_batch(
            pa.table(
                {
                    "record_url": one.column("url"),
                    "warc_type": pa.array(["response"]),
                    "mime": one.column("mime"),
                    "payload": one.column("payload"),
                }
            )
        )
        if media.num_rows:
            media = media.append_column(
                "parent_rank",
                pa.array(np.full(media.num_rows, one.column("seed_rank")[0].as_py(), dtype=np.int64)),
            ).append_column(
                "intra_pos", pa.array(np.arange(media.num_rows, dtype=np.int64))
            )
            out.append(media)
    if not out:
        return _EMPTY_MEDIA
    return pa.concat_tables(out)


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
        idx = {u: i for i, u in enumerate(tbl.column("record_url").to_pylist())}
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
) -> CrawlRun:
    """Two-level crawl: pages (level 0) → discovered media (level 1).
    ``force_scan_pages`` forces the streaming scan-store page join even
    when the page store would fit a broadcast (test hook for the scale
    path)."""
    import pyarrow.parquet as pq

    run = CrawlRun(out_dir)
    if store_size is None:
        store_size = sum(pq.read_metadata(p).num_rows for p in images_store_paths)
    delays, disallow = _robots_maps(robots)
    nblocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)

    start_level = run.resume_epoch()
    pool = FrontierPool(num_shards, capacity_per_shard=shard_capacity)
    try:
        if start_level > 0:
            blobs_tbl = run.state.partition_table(start_level - 1)
            order = np.argsort(blobs_tbl.column("shard").to_numpy())
            pool.restore([blobs_tbl.column("blob")[int(i)].as_py() for i in order])
        pool.set_robots(delays, {h: int(xxh64_many([h])[0]) for h in delays})

        def commit(level: int, admitted: pa.Table, counters: dict):
            if admitted.num_rows and "image_id" not in admitted.column_names:
                admitted = admitted.append_column(
                    "image_id", pa.nulls(admitted.num_rows, pa.string())
                )
            run.crawl_order.append_partition(
                admitted if admitted.num_rows else pa.table({}), level
            )
            run.state.append_partition(
                pa.table(
                    {
                        "shard": pa.array(range(num_shards), pa.int64()),
                        "blob": pa.array(pool.checkpoints(), pa.binary()),
                    }
                ),
                level,
            )
            run.lineage.append_partition(
                lineage_table(level, level, "discovery", counters), level
            )

        # ---- level 0: pages ------------------------------------------------
        frontier = page_seeds
        if start_level == 0:
            ct0 = _canonicalize(frontier, disallow, nblocks)
            admitted = _admit(pool, ct0)
            admitted = admitted.append_column(
                "epoch", pa.array(np.zeros(admitted.num_rows, dtype=np.int64))
            )
            admitted = admitted.sort_by(
                [("fetch_time_ms", "ascending"), ("seed_rank", "ascending")]
            )
            media, n_hit = _page_fetch_and_discover(
                admitted, pages_store_paths, nblocks, force_scan_pages
            )
            order_cols = [c for c in ORDER_COLS if c in admitted.column_names]
            # images sentinel BEFORE the order/state commit: commit()'s
            # state partition is the level-completion marker resume_epoch
            # checks (state ∧ images) — writing state first would mark
            # the level complete with its images partition absent
            run.images_out.append_partition(pa.table({}), 0)
            commit(
                0,
                admitted.select(order_cols),
                {
                    "seeds_in": frontier.num_rows,
                    "admitted": admitted.num_rows,
                    "pages_fetched": n_hit,
                    "media_extracted": media.num_rows,
                },
            )
            # discovered frontier (deterministic rank assignment)
            m = media.sort_by([("parent_rank", "ascending"), ("intra_pos", "ascending")])
            base = int(frontier.num_rows)
            discovered = pa.table(
                {
                    "seed_url": m.column("src"),
                    "page_url": m.column("page_url"),
                    "seed_rank": pa.array(
                        base + np.arange(m.num_rows, dtype=np.int64), pa.int64()
                    ),
                }
            )
        elif start_level == 1:
            # resuming at level 1: rebuild discovered frontier
            # deterministically by re-running the (idempotent) level-0
            # extraction against the committed level-0 crawl order.
            # (start_level >= 2 = fully complete: skip the rebuild — an
            # idempotent re-run must not pay the whole extraction.)
            order0 = run.crawl_order.partition_table(0)
            media, _ = _page_fetch_and_discover(
                order0, pages_store_paths, nblocks, force_scan_pages
            )
            m = media.sort_by([("parent_rank", "ascending"), ("intra_pos", "ascending")])
            base = int(page_seeds.num_rows)
            discovered = pa.table(
                {
                    "seed_url": m.column("src"),
                    "page_url": m.column("page_url"),
                    "seed_rank": pa.array(
                        base + np.arange(m.num_rows, dtype=np.int64), pa.int64()
                    ),
                }
            )

        # ---- level 1: discovered media → image fetch + validate -----------
        if start_level <= 1:
            ct1 = _canonicalize(discovered, disallow, nblocks)
            admitted1 = _admit(pool, ct1)
            admitted1 = admitted1.append_column(
                "epoch", pa.array(np.ones(admitted1.num_rows, dtype=np.int64))
            )
            admitted1 = add_image_ids(admitted1, store_size)
            admitted1 = admitted1.sort_by(
                [("fetch_time_ms", "ascending"), ("seed_rank", "ascending")]
            ).select([c for c in ORDER_COLS] + ["image_id"])
            fetched1 = fetch_from_store(images_store_paths, admitted1, num_blocks=nblocks)
            validated = fetched1.map_batches(
                DecodeValidate(min_dim=min_dim), batch_format="pyarrow", batch_size=256
            )
            run.images_out.append_ray_partition(validated, 1)
            flags = run.images_out.partition_table(1, columns=["valid", "big"])
            commit(
                1,
                admitted1,
                {
                    "seeds_in": discovered.num_rows,
                    "admitted": admitted1.num_rows,
                    "fetched": flags.num_rows,
                    "valid": int(pa.compute.sum(flags.column("valid")).as_py() or 0)
                    if flags.num_rows else 0,
                },
            )
    finally:
        pool.shutdown()
    return run
