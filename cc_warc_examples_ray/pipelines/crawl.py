"""The flagship crawl pipeline (north rule): URL frontier + fetch
scheduler over Lance-style image+caption tables.

Replaces the reference's single-JVM analyzer loop
(`/root/reference/src/org/commoncrawl/mklab/CommonCrawlAnalyzer.java:96-139`
→ `ProcessingService.java:176-252`) with a Ray-Data-native streaming
pipeline:

    seeds (rank-contiguous epochs)
      → map_batches canonicalize (RFC 3986 + SURT + xxhash64)   [stateless]
      → robots gate (broadcast disallow prefixes)               [stateless]
      → FrontierShard actors, two balanced rounds:
          first-seen cuckoo admit (routed by url-hash — uniform)
          + per-host politeness schedule (routed by host-hash)   [actor pool]
      → crawl-order table commit (epoch partition)
      → fetch: semi-join against the content store              [stateless]
        (broadcast-store mode for cached stores / scan-store
         streaming mode for stores beyond object-store size)
      → DecodeValidate (PSNR / phash / caption)                 [task pool]
      → images-out Lance partition commit + shard checkpoints + lineage

    Epochs PIPELINE: admission is sequential (the seen-set defines
    epoch order) but epoch k+1's admission+fetch overlap epoch k's
    fetch/decode/write; commits stay in epoch order for the resume
    invariant.

**Epochs are the checkpoint/resume granularity** (the Ray-native version
of the reference's manual 500-WARC-files-per-job slicing,
`AWSMediaExtractor.java:71-84`): each epoch is a contiguous seed_rank
range, processed in order; after an epoch's images partition commits,
every FrontierShard checkpoints its cuckoo filter + host counters to the
state table.  A killed run restores the newest complete epoch's shard
state and re-runs only later epochs — recomputation is deterministic, so
the resumed tables are bit-identical (kill/resume test).

**Crawl order** is the explicit deterministic key
``(epoch, fetch_time_ms, seed_rank)`` with ``fetch_time_ms = host_index
* crawl_delay_ms(host)`` — the spec'd version of the ordering the
reference gets implicitly from its global 150 ms politeness mutex
(`ProcessingService.java:57,235-239`); see SURVEY.md §2.8.

Scale notes (10^10-URL frontier design): frontier *metadata* (urls,
hashes, schedule keys — ~100 B/row) is what flows through the shard
groupby and the driver; image payload bytes only ever stream
store→decode inside ``map_batches`` and are never shuffled or collected.
Shard count and epoch size are the two knobs: shards spread admission
state/CPU across the cluster; epochs bound in-flight frontier metadata
and checkpoint cost.
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
from ..stages.fetch import (
    BROADCAST_STORE_MAX_BYTES,
    add_image_ids,
    fetch_broadcast_store,
    fetch_scan_store,
)
from ..state.frontier_shard import FrontierPool

ORDER_COLS = [
    "epoch", "fetch_time_ms", "seed_rank", "url_hash", "host", "host_index", "url",
]

# Upper bound on seed rows per canonicalize task: like the fetch wave's
# MAX_FETCH_ROWS_PER_BLOCK, chunk size must not grow with epoch size
# (a CPU-derived block COUNT lets a bigger epoch silently fatten every
# task; bounded chunks keep task cost flat from 10^5- to 10^8-row epochs).
MAX_CANON_ROWS_PER_BLOCK = 16384


def _robots_maps(robots: pa.Table) -> tuple[dict[str, int], dict[str, list[str]]]:
    delays = dict(
        zip(robots.column("host").to_pylist(), robots.column("crawl_delay_ms").to_pylist())
    )
    dis = {
        h: p
        for h, p in zip(
            robots.column("host").to_pylist(),
            robots.column("disallow_prefixes").to_pylist(),
        )
        if p
    }
    return delays, dis


def _make_robots_gate(disallow: dict[str, list[str]]):
    """Vectorized robots gate: drop rows with empty host or a path under
    a disallowed prefix.  Per batch: one equality + one ``starts_with``
    kernel per (host-with-disallows present in the batch, prefix) — the
    disallow map is the small broadcast side (robots table)."""
    import pyarrow.compute as pc

    def gate(tbl: pa.Table) -> pa.Table:
        hosts = tbl.column("host")
        keep = pc.not_equal(hosts, "")
        if disallow:
            paths = tbl.column("path")
            present = set(pc.unique(hosts.combine_chunks()).to_pylist())
            for h in present:
                prefs = disallow.get(h)
                if not prefs:
                    continue
                hm = pc.equal(hosts, h)
                for pref in prefs:
                    bad = pc.and_(hm, pc.starts_with(paths, pref))
                    keep = pc.and_(keep, pc.invert(bad))
        return tbl.filter(keep)

    return gate


def canonicalized_ds(seeds: pa.Table, disallow: dict, nblocks: int) -> rd.Dataset:
    """Chunk-split → canonicalize → robots gate, as a lazy Dataset —
    shared by the batch / discovery / streaming pipelines so chunk
    sizing and gating cannot silently drift between them."""
    step = max(256, min(MAX_CANON_ROWS_PER_BLOCK, seeds.num_rows // nblocks + 1))
    chunks = [seeds.slice(i, step) for i in range(0, seeds.num_rows, step)] or [seeds]
    eds = rd.from_arrow(chunks)
    eds = eds.map_batches(canonicalize_batch, batch_format="pyarrow")
    return eds.map_batches(_make_robots_gate(disallow), batch_format="pyarrow")


def default_shard_capacity(n_seeds: int, num_shards: int) -> int:
    """Seen-set slots per shard: 2.5x a UNIFORM split (admission routes
    by url-hash, which is provably uniform — host-hash routing would
    need worst-case-host sizing), rounded up to a power of two, floor
    2^16.  One formula for all three pipelines."""
    need = max(1 << 16, int(2.5 * n_seeds / num_shards))
    return 1 << (need - 1).bit_length()


def admit_table(pool: FrontierPool, ct: pa.Table) -> pa.Table:
    """Rank-ordered admission through the PIPELINED shard protocol (all
    chunks' admit calls in flight at once, schedule calls streamed
    behind — no per-chunk driver sync), Arrow end-to-end.  THE single
    admission implementation: the flagship, discovery and streaming
    paths all route here so the protocol can't drift between modes.
    ``host_hash`` comes from the canonicalized column when present,
    else is hashed from ``host``."""
    ct = ct.sort_by([("seed_rank", "ascending")])
    if ct.num_rows == 0:
        return ct.append_column(
            "fetch_time_ms", pa.array([], pa.int64())
        ).append_column("host_index", pa.array([], pa.int64()))
    uh = ct.column("url_hash").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    if "host_hash" in ct.column_names:
        hh = ct.column("host_hash").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    else:
        hh = xxh64_many(ct.column("host"))
    admit, ft, hi = pool.admit_and_schedule_pipelined(uh, hh)
    out = ct.filter(pa.array(admit))
    return out.append_column(
        "fetch_time_ms", pa.array(ft[admit], pa.int64())
    ).append_column("host_index", pa.array(hi[admit], pa.int64()))


def lineage_table(epoch: int, partition: int, stage: str, counters: dict) -> pa.Table:
    """One LINEAGE partition's rows (shared shape across pipelines)."""
    return pa.table(
        {
            "epoch": pa.array([epoch] * len(counters), pa.int64()),
            "partition": pa.array([partition] * len(counters), pa.int64()),
            "stage": pa.array([stage] * len(counters), pa.string()),
            "counter": pa.array(list(counters), pa.string()),
            "value": pa.array([int(v) for v in counters.values()], pa.int64()),
        }
    )


class CrawlRun:
    """Handle over one crawl's output directory (tables + resume)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.images_out = lancelite.LanceLiteTable(f"{out_dir}/images")
        self.crawl_order = lancelite.LanceLiteTable(f"{out_dir}/crawl_order")
        self.state = lancelite.LanceLiteTable(f"{out_dir}/state")
        self.lineage = lancelite.LanceLiteTable(f"{out_dir}/lineage")

    def resume_epoch(self) -> int:
        """First epoch that still needs work = newest fully-committed
        (images ∧ state) epoch + 1."""
        if not self.state.exists():
            return 0
        done = self.state.completed_partitions() & self.images_out.completed_partitions()
        e = 0
        while e in done:
            e += 1
        return e

    def order_table(self) -> pa.Table:
        t = self.crawl_order.to_table()
        return t.sort_by([("epoch", "ascending"), ("fetch_time_ms", "ascending"), ("seed_rank", "ascending")])


def run_crawl(
    seeds: pa.Table,
    robots: pa.Table,
    store_paths: list[str],
    out_dir: str,
    *,
    num_shards: int = 4,
    num_epochs: int = 4,
    store_size: int | None = None,
    min_dim: int = synth.SMALL_DIM_GATE,
    shard_capacity: int | None = None,
    fail_after_epoch: int | None = None,
    concurrency: int | tuple | None = None,
    force_scan: bool | None = None,
    one_pass: bool | None = None,
) -> CrawlRun:
    """Run (or resume) the crawl.  ``seeds``/``robots`` follow the
    FRONTIER_SEEDS / ROBOTS schemas; ``store_paths`` are the content
    store's parquet fragments (input_hint images table).

    ``shard_capacity`` (seen-set slots per shard) auto-sizes to 2.5x the
    expected per-shard key count when None — URL-hash routing keeps
    shard load uniform, so this headroom is ample.

    ``concurrency`` caps concurrent fetch→decode tasks (int, or a tuple
    whose max is used — the small-session knob; None = Ray default).

    ``force_scan`` forces the store-SCAN fetch path even for small
    stores (None = read ``$CRAWL_FORCE_SCAN``): the 100 TB dispatch
    branch, benchmarkable at fixture scale (mode parity is separately
    pinned by tests).

    ``one_pass`` (scan mode only; None = ``$CRAWL_ONE_PASS`` != "0"):
    the flagship's frontier is STATIC — admission has no fetch→admit
    feedback (unlike discovery) — so every epoch's admits are
    computable up front and ONE store scan can serve them all.
    Admission still runs per epoch in order (the seen-set defines
    epoch order, shard checkpoints are captured per epoch), then a
    single fetch→decode wave writes per-epoch partition files routed
    by the ``epoch`` column, and commits apply per epoch in order —
    the resume invariant (contiguous committed epoch prefix) is
    unchanged.  Driver-memory bound: one-pass holds the remaining
    epochs' admitted METADATA (~100 B/URL, no payloads); at 10^10
    frontier scale cap the pass by splitting the run into super-passes
    (call run_crawl per epoch range) — the per-epoch scan path below
    remains the fallback (`one_pass=False`)."""
    import pyarrow.parquet as pq

    if shard_capacity is None:
        shard_capacity = default_shard_capacity(seeds.num_rows, num_shards)

    run = CrawlRun(out_dir)
    if store_size is None:
        store_size = sum(pq.read_metadata(p).num_rows for p in store_paths)
    delays, disallow = _robots_maps(robots)

    import os
    from concurrent.futures import ThreadPoolExecutor

    start_epoch = run.resume_epoch()
    store_bytes = sum(os.path.getsize(p) for p in store_paths)
    if force_scan is None:
        force_scan = os.environ.get("CRAWL_FORCE_SCAN") == "1"
    broadcast_mode = store_bytes <= BROADCAST_STORE_MAX_BYTES and not force_scan
    if broadcast_mode:
        one_pass = False
    elif one_pass is None:
        one_pass = os.environ.get("CRAWL_ONE_PASS", "1") != "0"
    decoder = DecodeValidate(min_dim=min_dim)
    nblocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    pool = FrontierPool(num_shards, capacity_per_shard=shard_capacity)
    try:
        def canonicalize_range(sl: pa.Table) -> pa.Table:
            """One parallel execution: canonicalize + robots gate.  The
            range's METADATA (no payloads, ~100 B/URL) is collected on
            the driver as Arrow — range size (ONE epoch) is the
            driver-memory bound.  Arrow end-to-end: pandas conversions
            here were the dominant serial cost at large frontiers
            (~tens of µs/URL)."""
            keep_cols = ["seed_rank", "url", "url_hash", "host", "host_hash", "path"]

            def project(tbl: pa.Table) -> pa.Table:
                hh = xxh64_many(tbl.column("host")).view(np.int64)
                tbl = tbl.append_column("host_hash", pa.array(hh, pa.int64()))
                return tbl.select(keep_cols)

            eds = canonicalized_ds(sl, disallow, nblocks).map_batches(
                project, batch_format="pyarrow"
            )
            tables = [t for t in ray.get(eds.to_arrow_refs()) if t.num_rows]
            if not tables:
                return project(canonicalize_batch(sl.slice(0, 0)))  # empty, right schema
            return pa.concat_tables(tables).combine_chunks()

        def admit_epoch(ct: pa.Table) -> pa.Table:
            return admit_table(pool, ct)

        decode_cap = (concurrency if isinstance(concurrency, int)
                      else max(concurrency) if concurrency else None)

        def build_validated_ds(admitted: pa.Table):
            if broadcast_mode:
                fetched = fetch_broadcast_store(store_paths, admitted, num_blocks=nblocks * 2)
            else:
                # multi-epoch crawls re-scan the store every epoch:
                # reuse_store materializes the scan once (object-store
                # blocks) and later epochs map over it zero-copy
                fetched = fetch_scan_store(
                    store_paths, admitted, num_blocks=nblocks,
                    reuse_store=(num_epochs - start_epoch) > 1,
                )
            return fetched.map_batches(
                decoder, batch_format="pyarrow", batch_size=256,
                concurrency=decode_cap,
            )

        # Epoch pipelining: admission is inherently sequential (the
        # seen-set defines epoch order), but fetch/decode/write is not —
        # epoch k+1's admission and fetch overlap epoch k's fetch, and a
        # single committer thread applies commits strictly in epoch
        # order (the resume invariant: contiguous committed prefix)
        # without ever blocking the admission loop.
        executor = ThreadPoolExecutor(max_workers=2)
        inflight: list[tuple] = []

        def apply_commit(epoch_, admitted_, blobs_, nums_, frags):
            run.images_out.commit_fragments(frags)
            if not frags:
                # EMPTY epoch: register the partition explicitly (an
                # empty-sentinel fragment) — commit_fragments([]) is a
                # no-op, and resume_epoch's contiguous committed-prefix
                # scan would otherwise stall at the gap forever and
                # recompute the whole crawl on every rerun
                run.images_out.append_partition(pa.table({}), epoch_)
            flags = run.images_out.partition_table(epoch_, columns=["valid", "big"])
            run.crawl_order.append_partition(
                admitted_ if admitted_.num_rows else pa.table({}), epoch_
            )
            n_in_, d_admit_, d_dup_ = nums_
            counters = {
                "seeds_in": n_in_,
                "rej_gate": n_in_ - d_admit_ - d_dup_,  # invalid + robots-disallowed
                "admitted": d_admit_,
                "rej_dup": d_dup_,
                "fetched": flags.num_rows,
                "valid": int(pa.compute.sum(flags.column("valid")).as_py() or 0)
                if flags.num_rows else 0,
                "big": int(pa.compute.sum(flags.column("big")).as_py() or 0)
                if flags.num_rows else 0,
            }
            run.lineage.append_partition(
                lineage_table(epoch_, epoch_, "crawl", counters), epoch_
            )
            # state LAST: it is the epoch-completion marker resume_epoch
            # checks (state ∧ images) — committing it before lineage
            # could leave a permanent lineage gap after a crash between
            # the two appends
            run.state.append_partition(
                pa.table(
                    {
                        "shard": pa.array(range(num_shards), pa.int64()),
                        "blob": pa.array(blobs_, pa.binary()),
                    }
                ),
                epoch_,
            )

        def commit_oldest():
            # peek, pop only AFTER the commit applies: the epoch being
            # committed must stay visible to the main loop's in-flight
            # backpressure count (pop-first made it invisible and let a
            # third epoch's write start)
            epoch_, admitted_, blobs_, nums_, fut_ = inflight[0]
            _ct = time.time()
            frags = fut_.result()
            if _dbg:
                print(f"[crawl-timing] epoch {epoch_} commit: frags_wait {time.time()-_ct:.2f}s", flush=True)
            _ct = time.time()
            apply_commit(epoch_, admitted_, blobs_, nums_, frags)
            inflight.pop(0)
            if _dbg:
                print(f"[crawl-timing] epoch {epoch_} commit: apply {time.time()-_ct:.2f}s", flush=True)

        import queue
        import time

        executor2 = ThreadPoolExecutor(max_workers=1)
        commit_q: "queue.Queue" = queue.Queue()
        commit_err: list[BaseException] = []
        committer = None

        def commit_loop():
            while True:
                tok = commit_q.get()
                if tok is StopIteration:
                    # drain whatever is queued, in order
                    while inflight and not commit_err:
                        try:
                            commit_oldest()
                        except BaseException as ex:  # surfaced to the main thread
                            commit_err.append(ex)
                    return
                if commit_err:
                    continue
                try:
                    commit_oldest()
                except BaseException as ex:
                    commit_err.append(ex)

        n = seeds.num_rows
        bounds = [(k * n) // num_epochs for k in range(num_epochs + 1)]
        # Canonicalization is PER EPOCH: the driver holds at most two
        # epochs of frontier metadata at a time (the one being admitted
        # + the next, prefetched on a thread while epoch k's admission /
        # fetch runs).  This is the 10^10-frontier driver-memory bound:
        # O(epoch), never O(frontier).
        canon_pool = ThreadPoolExecutor(max_workers=1)
        canon_futs: dict[int, object] = {}

        def canon_epoch(e: int):
            return canonicalize_range(seeds.slice(bounds[e], bounds[e + 1] - bounds[e]))

        def prefetch_from(e: int) -> None:
            for e2 in range(e, num_epochs):
                if bounds[e2 + 1] > bounds[e2]:
                    if e2 not in canon_futs:
                        canon_futs[e2] = canon_pool.submit(canon_epoch, e2)
                    return

        import os as _os

        _dbg = _os.environ.get("CRAWL_TIMING") == "1"

        def admit_one_epoch(epoch: int) -> tuple:
            """Sequential per-epoch admission (shared by the batch and
            one-pass modes): canonicalized metadata → shard admit →
            ordered admitted table with ``epoch`` + ``image_id``.
            Returns ``(admitted, blobs, nums)``."""
            lo, hi = bounds[epoch], bounds[epoch + 1]
            stats_before = pool.stats()
            cdf = canon_futs.pop(epoch).result()
            prefetch_from(epoch + 1)
            admitted = admit_epoch(cdf)
            stats_after = pool.stats()
            d_admit = sum(s["admitted"] for s in stats_after) - sum(
                s["admitted"] for s in stats_before
            )
            d_dup = sum(s["rejected_dup"] for s in stats_after) - sum(
                s["rejected_dup"] for s in stats_before
            )
            blobs = pool.checkpoints()  # exactly epochs <= this one
            admitted = admitted.append_column(
                "epoch", pa.array(np.full(admitted.num_rows, epoch, dtype=np.int64))
            )
            admitted = add_image_ids(admitted, store_size)
            admitted = admitted.sort_by(
                [("fetch_time_ms", "ascending"), ("seed_rank", "ascending")]
            ).select(list(ORDER_COLS) + ["image_id"])
            return admitted, blobs, (hi - lo, d_admit, d_dup)

        def run_one_pass():
            """Scan-mode one-pass fetch: admit every remaining epoch in
            order (driver holds only admitted METADATA), then ONE
            store-scan fetch→decode wave writes all epochs' partition
            files (routed by the ``epoch`` column), then commits apply
            per epoch in order — same resume invariant, 1/num_epochs
            the store-read I/O of the per-epoch scan path."""
            end_epoch = num_epochs
            if fail_after_epoch is not None:
                # batch-mode parity: at least one epoch is processed
                # before the injected failure fires
                end_epoch = min(num_epochs, max(fail_after_epoch, start_epoch) + 1)
            pending: list[tuple] = []
            for epoch in range(start_epoch, end_epoch):
                lo, hi = bounds[epoch], bounds[epoch + 1]
                if hi <= lo:
                    pending.append((epoch, pa.table({}), pool.checkpoints(), (0, 0, 0)))
                    continue
                _t = time.time()
                admitted, blobs, nums = admit_one_epoch(epoch)
                if _dbg:
                    print(f"[crawl-timing] epoch {epoch} admit(one-pass) {time.time()-_t:.2f}s", flush=True)
                pending.append((epoch, admitted, blobs, nums))
            union = [t for (_, t, _, _) in pending if t.num_rows]
            frags_by: dict = {}
            if union:
                u = pa.concat_tables(union).combine_chunks()
                _t = time.time()
                vds = fetch_scan_store(
                    store_paths, u, num_blocks=nblocks
                ).map_batches(
                    decoder, batch_format="pyarrow", batch_size=256,
                    concurrency=decode_cap,
                )
                frags_by = run.images_out.write_partition_files_multi(
                    vds, "epoch", [e for (e, _, _, _) in pending]
                )
                if _dbg:
                    print(f"[crawl-timing] one-pass fetch+decode+write {time.time()-_t:.2f}s", flush=True)
            for (epoch_, admitted_, blobs_, nums_) in pending:
                apply_commit(epoch_, admitted_, blobs_, nums_, frags_by.get(epoch_, []))
            if (fail_after_epoch is not None and end_epoch > start_epoch
                    and end_epoch - 1 >= fail_after_epoch):
                raise RuntimeError(f"injected failure after epoch {end_epoch - 1}")

        prefetch_from(start_epoch)
        # shard-state restore + robots install run WHILE the first epoch
        # canonicalizes on the prefetch thread (the cold wave used to
        # serialize ~2-3 s ahead of epoch 0's admission)
        if start_epoch > 0:
            blobs_tbl = run.state.partition_table(start_epoch - 1)
            order = np.argsort(blobs_tbl.column("shard").to_numpy())
            pool.restore([blobs_tbl.column("blob")[int(i)].as_py() for i in order])
        hs = list(delays)
        # ONE vectorized hash call over all hosts (per-host 1-element
        # xxh64_many calls cost ~0.1 ms each — serial driver seconds at
        # a 10^5-host robots table)
        pool.set_robots(delays, dict(zip(hs, (int(v) for v in xxh64_many(hs)))) if hs else {})
        try:
            if one_pass:
                run_one_pass()
            for epoch in range(start_epoch, num_epochs) if not one_pass else ():
                lo, hi = bounds[epoch], bounds[epoch + 1]
                if hi <= lo:
                    # empty epochs still commit (state marker + empty
                    # partitions) in commit order — skipping would leave
                    # a permanent resume gap (see commit_oldest)
                    inflight.append(
                        (epoch, pa.table({}), pool.checkpoints(), (0, 0, 0),
                         executor.submit(list))
                    )
                    if committer is None:
                        committer = executor2.submit(commit_loop)
                    commit_q.put(None)
                    if commit_err:
                        raise commit_err[0]
                    continue
                _t = time.time()
                admitted, blobs, (_, d_admit, d_dup) = admit_one_epoch(epoch)
                if _dbg:
                    print(f"[crawl-timing] epoch {epoch} admit+order_prep {time.time()-_t:.2f}s", flush=True)

                _t = time.time()
                vds = build_validated_ds(admitted)
                if _dbg:
                    print(f"[crawl-timing] epoch {epoch} build_ds {time.time()-_t:.2f}s", flush=True)
                fut = executor.submit(
                    run.images_out.write_partition_files, vds, epoch
                )
                inflight.append((epoch, admitted, blobs, (hi - lo, d_admit, d_dup), fut))
                if committer is None:
                    committer = executor2.submit(commit_loop)
                commit_q.put(None)  # signal one epoch ready
                if commit_err:
                    raise commit_err[0]
                # backpressure: at most 2 epochs' writes in flight
                _t = time.time()
                while sum(1 for t in list(inflight) if not t[4].done()) > 1:
                    time.sleep(0.02)
                if _dbg:
                    print(f"[crawl-timing] epoch {epoch} backpressure_wait {time.time()-_t:.2f}s", flush=True)
                if fail_after_epoch is not None and epoch >= fail_after_epoch:
                    commit_q.put(StopIteration)
                    committer.result()
                    committer = None  # already drained; finally must not re-drain
                    if commit_err:
                        raise commit_err[0]
                    raise RuntimeError(f"injected failure after epoch {epoch}")
            if committer is not None:
                commit_q.put(StopIteration)
                committer.result()
                committer = None
            if commit_err:
                raise commit_err[0]
        finally:
            # ALWAYS unblock the committer: if the epoch loop raised, the
            # thread would otherwise sit in commit_q.get() forever and be
            # joined at interpreter exit (process hang after a crawl
            # failure).  Drain-on-StopIteration is safe on every path.
            if committer is not None:
                commit_q.put(StopIteration)
                try:
                    committer.result(timeout=300)
                except Exception:
                    pass
            executor.shutdown(wait=False, cancel_futures=True)
            executor2.shutdown(wait=False, cancel_futures=True)
            canon_pool.shutdown(wait=False, cancel_futures=True)
    finally:
        pool.shutdown()
    return run
