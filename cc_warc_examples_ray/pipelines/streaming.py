"""Streaming (continuous) crawl mode: the min-heap politeness priority
queue EMITS the fetch batches (the north-star scheduler shape), instead
of the batch pipeline's analytic schedule.

Each FrontierShard owns per-host FIFO queues + a min-heap keyed
``(next_fetch_time, host)`` in virtual time; the driver drains shards in
rounds and fetches each round as it arrives.  The emitted schedule is
provably the same as :func:`..pipelines.crawl.run_crawl`'s analytic
``fetch_time = host_index * crawl_delay`` order (tested:
``test_streaming_crawl_order_equivalence``) — per-shard emissions are
nondecreasing in virtual time, and the union sorted by
``(fetch_time_ms, seed_rank)`` is identical.

Admission routing: the first-seen check fans out by **url-hash** (round
A of the batch path, uniformly balanced — a hot Zipf host cannot
overflow one shard's cuckoo filter); only admitted rows are then
enqueued on their **host-owning** shard.  The canonical query-free
``path`` computed by canonicalization rides the queue tuples end-to-end,
so ``image_id`` derivation is identical to the batch pipeline for
query-bearing URLs.

Checkpoint/resume: every drain round commits ``(images, crawl_order,
state, lineage)`` partitions in round order — shard checkpoints include
the heap + per-host queues, so a killed run restores the newest complete
round and continues mid-drain bit-identically (the batch pipeline's
kill/resume invariant, `crawl.py`, extended to continuous mode).

This mode exists for continuous/incremental crawling (URLs keep
arriving); the epoch-checkpointed batch pipeline remains the bulk path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..hashing import xxh64_many
from ..stages.decode import DecodeValidate
from ..stages.fetch import add_image_ids, fetch_from_store
from ..state.frontier_shard import FrontierPool
from .crawl import (
    MAX_CANON_ROWS_PER_BLOCK,
    CrawlRun,
    _robots_maps,
    canonicalized_ds,
    default_shard_capacity,
    lineage_table,
)


def _admit_enqueue_chunk(pool: FrontierPool, num_shards: int, ct: pa.Table) -> None:
    """One rank-sorted chunk through the two admission rounds: round A
    first-seen admit routed by url-hash (uniform, Zipf-safe), round B
    enqueue of admitted rows on their host-owning shard.  Only ADMITTED
    rows are converted out of Arrow (one ``take`` + per-shard column
    conversion) — the rejected majority of a deduped frontier never
    becomes python objects."""
    uh = ct.column("url_hash").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    hh = xxh64_many(ct.column("host"))

    admit = pool.admit_only(uh)
    adm_idx = np.flatnonzero(admit)
    if not len(adm_idx):
        return
    shard_h = pool.route(hh[adm_idx])
    enq = []
    for s in range(num_shards):
        sel = adm_idx[shard_h == s]
        if len(sel):
            sub = ct.take(pa.array(sel, pa.int64()))
            enq.append(
                pool.shards[s].enqueue.remote(
                    uh[sel],
                    sub.column("host").to_pylist(),
                    sub.column("seed_rank").to_numpy(zero_copy_only=False).astype(np.int64),
                    sub.column("url").to_pylist(),
                    sub.column("path").to_pylist(),
                    admit=False,
                )
            )
    ray.get(enq)


def run_streaming_crawl(
    seeds: pa.Table,
    robots: pa.Table,
    store_paths: list[str],
    out_dir: str,
    *,
    num_shards: int = 4,
    store_size: int | None = None,
    batch_urls: int = 4096,
    min_dim: int | None = None,
    fail_after_round: int | None = None,
    seed_feed=None,
    round_target: int | None = None,
    shard_capacity: int | None = None,
    max_inflight_rounds: int = 4,
) -> CrawlRun:
    """Continuous-mode crawl over a (finite) seed list: enqueue in rank
    order, then drain the per-shard heaps round by round; fetch + decode
    each round's emission; commit one partition per drain round.  Calling
    again on the same ``out_dir`` resumes from the newest complete round.

    ``seed_feed``: optional ``round -> pa.Table | None`` callable — the
    CONTINUOUS ingest hook.  Called once at the start of every round;
    a returned FRONTIER_SEEDS table is canonicalized, first-seen-deduped
    against everything already admitted, and enqueued before that
    round's drain.  The crawl ends when a drain emits nothing AND the
    feed returned no table for that round.  The feed MUST be a
    deterministic function of the round index: a resumed run re-invokes
    it for rounds after the checkpoint (earlier feeds' effects are in
    the shard state) — that is what keeps kill/resume bit-identical.

    ``shard_capacity``: seen-set slots per shard.  The default sizes
    from the INITIAL seed table only — a long-running feed that
    delivers many times ``seeds.num_rows`` must pass the expected
    total here (the cuckoo filter raises when full rather than
    degrade)."""
    import pyarrow.parquet as pq

    from .. import synth

    if store_size is None:
        store_size = sum(pq.read_metadata(p).num_rows for p in store_paths)
    if min_dim is None:
        min_dim = synth.SMALL_DIM_GATE
    delays, disallow = _robots_maps(robots)

    run = CrawlRun(out_dir)
    start_round = run.resume_epoch()
    pool = FrontierPool(
        num_shards,
        capacity_per_shard=(shard_capacity if shard_capacity is not None
                            else default_shard_capacity(seeds.num_rows, num_shards)),
    )
    try:
        hs = list(delays)
        # ONE vectorized hash call over all hosts (per-host 1-element
        # xxh64_many calls cost ~0.1 ms each — serial driver seconds at
        # a 10^5-host robots table)
        pool.set_robots(delays, dict(zip(hs, (int(v) for v in xxh64_many(hs)))) if hs else {})

        if start_round > 0:
            # resume: queue/heap/seen state all live in the round checkpoint
            blobs_tbl = run.state.partition_table(start_round - 1)
            order = np.argsort(blobs_tbl.column("shard").to_numpy())
            pool.restore([blobs_tbl.column("blob")[int(i)].as_py() for i in order])
        else:
            # canonicalize (parallel), then admit+enqueue CHUNK-STREAMED in
            # rank order: the rank sort is a distributed shuffle and the
            # driver only ever holds one chunk (first-seen dedup stays
            # rank-deterministic because chunks arrive rank-sorted and the
            # shard admission state persists across chunks) — the whole
            # canonicalized frontier never materializes on the driver.
            nblocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
            eds = canonicalized_ds(seeds, disallow, nblocks).sort("seed_rank")
            for ct in eds.iter_batches(
                batch_size=MAX_CANON_ROWS_PER_BLOCK, batch_format="pyarrow"
            ):
                if ct.num_rows:
                    _admit_enqueue_chunk(pool, num_shards, ct)

        # Round pipelining (the batch pipeline's committer-thread shape,
        # `crawl.py`): the drain of round k+1 is inherently sequential
        # AFTER round k's drain (each next_batch mutates the heaps), but
        # it does NOT need round k's fetch/decode/commit — those run on
        # a writer thread while the driver drains ahead.  A single
        # committer thread applies commits strictly in round order (the
        # resume invariant: contiguous committed prefix).  Shard
        # checkpoints are captured immediately after each drain, BEFORE
        # the next drain mutates the heaps.
        import queue as _queue
        import time
        from concurrent.futures import ThreadPoolExecutor

        decoder = DecodeValidate(min_dim=min_dim)
        writer_pool = ThreadPoolExecutor(max_workers=max_inflight_rounds)
        committer_pool = ThreadPoolExecutor(max_workers=1)
        inflight: list[tuple] = []
        commit_q: "_queue.Queue" = _queue.Queue()
        commit_err: list[BaseException] = []
        committer = None

        def commit_oldest():
            # peek; pop only after the commit applies (the committing
            # round must stay visible to the backpressure count)
            round_, admitted_, blobs_, fut_ = inflight[0]
            blobs_ = ray.get(list(blobs_))  # async checkpoint refs
            frags = fut_.result()
            run.images_out.commit_fragments(frags)
            if not frags:
                run.images_out.append_partition(pa.table({}), round_)
            # counter semantics match the batch pipeline: 'fetched' =
            # committed image rows (store misses emit null-payload rows,
            # so fetched == admitted only when every id resolves)
            flags = run.images_out.partition_table(round_, columns=["valid", "big"])
            run.crawl_order.append_partition(admitted_, round_)
            run.lineage.append_partition(
                lineage_table(round_, round_, "stream", {
                    "admitted": admitted_.num_rows,
                    "fetched": flags.num_rows,
                    "valid": int(pa.compute.sum(flags.column("valid")).as_py() or 0)
                    if flags.num_rows else 0,
                    "big": int(pa.compute.sum(flags.column("big")).as_py() or 0)
                    if flags.num_rows else 0,
                }),
                round_,
            )
            # state LAST: it is the round-completion marker resume_epoch
            # checks — writing it earlier could leave a permanent lineage
            # gap if the process dies between the two appends
            run.state.append_partition(
                pa.table(
                    {
                        "shard": pa.array(range(num_shards), pa.int64()),
                        "blob": pa.array(blobs_, pa.binary()),
                    }
                ),
                round_,
            )
            inflight.pop(0)

        def commit_loop():
            while True:
                tok = commit_q.get()
                if tok is StopIteration:
                    while inflight and not commit_err:
                        try:
                            commit_oldest()
                        except BaseException as ex:
                            commit_err.append(ex)
                    return
                if commit_err:
                    continue
                try:
                    commit_oldest()
                except BaseException as ex:
                    commit_err.append(ex)

        import os as _os

        timing = _os.environ.get("STREAM_TIMING") == "1"
        tstats = {"feed": 0.0, "drain": 0.0, "ckpt": 0.0, "merge": 0.0,
                  "submit": 0.0, "backpressure": 0.0, "n_rounds": 0}

        def _tick():
            return time.perf_counter() if timing else 0.0

        nblocks_feed = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        rounds = start_round
        try:
            while True:
                t_ph = _tick()
                fed = False
                if seed_feed is not None:
                    ft = seed_feed(rounds)
                    if ft is not None and ft.num_rows:
                        feds = canonicalized_ds(ft, disallow, nblocks_feed).sort("seed_rank")
                        for ct in feds.iter_batches(
                            batch_size=MAX_CANON_ROWS_PER_BLOCK, batch_format="pyarrow"
                        ):
                            if ct.num_rows:
                                _admit_enqueue_chunk(pool, num_shards, ct)
                        fed = True
                # accumulate drains until the round reaches its target
                # size: under Zipf host skew a single drain caps at
                # batch_urls on the hot shard(s) while the others run
                # dry, and a long tail of tiny rounds pays one Dataset
                # execution + checkpoint each (measured 20 rounds /
                # 15.5 s at 160k seeds; ~5 rounds after).  Per-shard
                # virtual-time order is preserved across consecutive
                # drains, so the combined round sorts identically.
                # Drains arrive as COLUMN arrays (next_batch_arrays):
                # 160k python tuples per round cost more to build,
                # serialize and re-sort than the arrays.
                if timing:
                    tstats["feed"] += _tick() - t_ph
                    t_ph = _tick()
                # default 2x(batch_urls x shards): the A/B sweep at 1.28M
                # seeds (BENCH/BASELINE.md round 4) found 2x rounds with 4
                # inflight ~10-15% faster than both 1x/36-round and
                # 4x/10-round shapes — small-enough rounds keep the
                # executor continuously fed, big-enough ones amortize the
                # per-round Dataset + checkpoint cost
                target = (round_target if round_target is not None
                          else batch_urls * num_shards * 2)
                chunks: list[tuple] = []
                n_emitted = 0
                while True:
                    batches = ray.get(
                        [s.next_batch_arrays.remote(batch_urls) for s in pool.shards]
                    )
                    got = [b for b in batches if b is not None]
                    if not got:
                        break
                    chunks.extend(got)
                    n_emitted += sum(len(c[0]) for c in got)
                    if n_emitted >= target:
                        break
                if timing:
                    tstats["drain"] += _tick() - t_ph
                    t_ph = _tick()
                if not n_emitted and not fed:
                    break
                # checkpoint NOW — but without blocking: actor-FIFO
                # ordering pins each blob to the heap state after THIS
                # drain and before the next one even though the bytes
                # serialize concurrently with the driver's next drain;
                # the committer resolves the refs at commit time
                blobs = pool.checkpoints_async()
                if timing:
                    tstats["ckpt"] += _tick() - t_ph
                    t_ph = _tick()
                if chunks:
                    from itertools import chain

                    ts = np.concatenate([c[0] for c in chunks])
                    ranks = np.concatenate([c[1] for c in chunks])
                    urls = list(chain.from_iterable(c[2] for c in chunks))
                    uhs = np.concatenate([c[3] for c in chunks])
                    hosts = list(chain.from_iterable(c[4] for c in chunks))
                    his = np.concatenate([c[5] for c in chunks])
                    paths = list(chain.from_iterable(c[6] for c in chunks))
                else:
                    ts = ranks = his = np.array([], np.int64)
                    uhs = np.array([], np.uint64)
                    urls, hosts, paths = [], [], []
                order = np.lexsort((ranks, ts))  # (virtual time, rank)
                oa = pa.array(order)
                admitted = pa.table(
                    {
                        "epoch": pa.array(np.full(n_emitted, rounds, dtype=np.int64)),
                        "fetch_time_ms": pa.array(ts[order], pa.int64()),
                        "seed_rank": pa.array(ranks[order], pa.int64()),
                        "url_hash": pa.array(uhs[order].view(np.int64)),
                        "host": pa.array(hosts, pa.string()).take(oa),
                        "host_index": pa.array(his[order], pa.int64()),
                        "url": pa.array(urls, pa.string()).take(oa),
                        "path": pa.array(paths, pa.string()).take(oa),
                    }
                )
                admitted = add_image_ids(admitted, store_size).drop_columns(["path"])
                if timing:
                    tstats["merge"] += _tick() - t_ph
                    t_ph = _tick()
                def _build_and_write(adm, rnd):
                    # Dataset construction (from_arrow serialization +
                    # plan building, ~0.4 s/round) runs on the writer
                    # thread too, overlapping the driver's next drain
                    fetched = fetch_from_store(store_paths, adm)
                    validated = fetched.map_batches(
                        decoder, batch_format="pyarrow", batch_size=256
                    )
                    return run.images_out.write_partition_files(validated, rnd)

                fut = writer_pool.submit(_build_and_write, admitted, rounds)
                inflight.append((rounds, admitted, blobs, fut))
                if committer is None:
                    committer = committer_pool.submit(commit_loop)
                commit_q.put(None)
                if commit_err:
                    raise commit_err[0]
                if timing:
                    tstats["submit"] += _tick() - t_ph
                    t_ph = _tick()
                # backpressure: bound rounds' writes in flight (memory
                # stays bounded: a round is ~round_target admitted rows)
                while sum(1 for t in list(inflight)
                          if not t[3].done()) >= max_inflight_rounds:
                    time.sleep(0.02)
                if timing:
                    tstats["backpressure"] += _tick() - t_ph
                    tstats["n_rounds"] += 1
                rounds += 1
                if fail_after_round is not None and rounds > fail_after_round:
                    commit_q.put(StopIteration)
                    committer.result()
                    committer = None  # drained; finally must not re-drain
                    if commit_err:
                        raise commit_err[0]
                    raise RuntimeError(f"injected failure after round {fail_after_round}")
            if committer is not None:
                commit_q.put(StopIteration)
                committer.result()
                committer = None
            if commit_err:
                raise commit_err[0]
            if timing:
                print("STREAM_TIMING " + " ".join(
                    f"{k}={v:.2f}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in tstats.items()))
        finally:
            # ALWAYS unblock the committer thread (see crawl.py)
            if committer is not None:
                commit_q.put(StopIteration)
                try:
                    committer.result(timeout=300)
                except Exception:
                    pass
            writer_pool.shutdown(wait=False, cancel_futures=True)
            committer_pool.shutdown(wait=False, cancel_futures=True)
    finally:
        pool.shutdown()
    return run
