"""The flagship crawl pipeline (north rule): URL frontier + fetch
scheduler over Lance-style image+caption tables.

Replaces the reference's single-JVM analyzer loop
(`/root/reference/src/org/commoncrawl/mklab/CommonCrawlAnalyzer.java:96-139`
→ `ProcessingService.java:176-252`) with a Ray-Data-native streaming
pipeline:

    seeds (rank-contiguous epochs)
      → map_batches canonicalize (RFC 3986 + SURT + xxhash64)   [stateless]
      → robots gate (broadcast disallow prefixes)               [stateless]
      → groupby(host-hash shard) → FrontierShard actors:
          first-seen cuckoo admit + per-host politeness schedule [actor pool]
      → crawl-order table commit (epoch partition)
      → fetch: broadcast semi-join against the content store    [stateless]
      → DecodeValidate actor pool (PSNR / phash / caption)      [actor pool]
      → images-out Lance partition commit + shard checkpoints + lineage

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
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .. import lancelite, synth
from ..functions.urls import canonicalize_batch
from ..hashing import xxh64_many
from ..stages.decode import DecodeValidate
from ..stages.fetch import add_image_ids, fetch_from_store
from ..state.frontier_shard import FrontierPool

ORDER_COLS = [
    "epoch", "fetch_time_ms", "seed_rank", "url_hash", "host", "host_index", "url",
]


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


def _shard_col(tbl: pa.Table, num_shards: int) -> pa.Table:
    hh = xxh64_many(tbl.column("host"))
    shard = (hh % np.uint64(num_shards)).astype(np.int64)
    return tbl.append_column("host_hash", pa.array(hh.view(np.int64), pa.int64())).append_column(
        "shard", pa.array(shard, pa.int64())
    )


def _make_robots_gate(disallow: dict[str, list[str]]):
    def gate(tbl: pa.Table) -> pa.Table:
        hosts = tbl.column("host").to_pylist()
        paths = tbl.column("path").to_pylist()
        keep = np.ones(len(hosts), dtype=bool)
        n_invalid = 0
        for i, (h, p) in enumerate(zip(hosts, paths)):
            if not h:
                keep[i] = False
                n_invalid += 1
                continue
            for pref in disallow.get(h, ()):
                if p.startswith(pref):
                    keep[i] = False
                    break
        out = tbl.filter(pa.array(keep))
        rej = len(hosts) - out.num_rows - n_invalid
        return out.append_column(
            # per-batch reject counters ride along as repeated columns and
            # are summed into lineage after admission (A10-style counters)
            "rej_invalid", pa.array(np.full(out.num_rows, n_invalid, dtype=np.int64))
        ).append_column("rej_robots", pa.array(np.full(out.num_rows, rej, dtype=np.int64)))

    return gate


def _make_admit_fn(shards, chunk: int = 8192):
    """Per-shard map_groups fn: sort the shard's rows by seed_rank and
    stream them to the owning FrontierShard actor in bounded chunks.
    Runs as one Ray task per shard → admission parallelism = #shards,
    no driver bottleneck, per-host FIFO order preserved."""

    def admit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("seed_rank", kind="mergesort")
        s = int(g["shard"].iloc[0])
        actor = shards[s]
        outs = []
        for st in range(0, len(g), chunk):
            sub = g.iloc[st : st + chunk]
            hashes = sub["url_hash"].to_numpy().astype(np.int64).view(np.uint64)
            a, ft, hi = ray.get(
                actor.admit_and_schedule.remote(hashes, sub["host"].tolist())
            )
            keep = sub.loc[a].copy()
            keep["fetch_time_ms"] = ft[a]
            keep["host_index"] = hi[a]
            outs.append(keep)
        return pd.concat(outs) if outs else g.iloc[0:0]

    return admit


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
    shard_capacity: int = 1 << 18,
    fail_after_epoch: int | None = None,
    concurrency: int | tuple = (2, 8),
) -> CrawlRun:
    """Run (or resume) the crawl.  ``seeds``/``robots`` follow the
    FRONTIER_SEEDS / ROBOTS schemas; ``store_paths`` are the content
    store's parquet fragments (input_hint images table)."""
    import pyarrow.parquet as pq

    run = CrawlRun(out_dir)
    if store_size is None:
        store_size = sum(pq.read_metadata(p).num_rows for p in store_paths)
    delays, disallow = _robots_maps(robots)

    start_epoch = run.resume_epoch()
    pool = FrontierPool(num_shards, capacity_per_shard=shard_capacity)
    try:
        if start_epoch > 0:
            blobs_tbl = run.state.partition_table(start_epoch - 1)
            order = np.argsort(blobs_tbl.column("shard").to_numpy())
            pool.restore([blobs_tbl.column("blob")[int(i)].as_py() for i in order])
        host_hashes = {
            h: int(xxh64_many([h])[0]) for h in delays
        }
        pool.set_robots(delays, host_hashes)

        n = seeds.num_rows
        bounds = [(k * n) // num_epochs for k in range(num_epochs + 1)]
        for epoch in range(start_epoch, num_epochs):
            lo, hi = bounds[epoch], bounds[epoch + 1]
            if hi <= lo:
                continue
            eds = rd.from_arrow(seeds.slice(lo, hi - lo))
            eds = eds.map_batches(canonicalize_batch, batch_format="pyarrow")
            eds = eds.map_batches(_make_robots_gate(disallow), batch_format="pyarrow")
            eds = eds.map_batches(
                lambda t: _shard_col(t, num_shards), batch_format="pyarrow"
            )
            admitted_ds = eds.groupby("shard").map_groups(
                _make_admit_fn(pool.shards), batch_format="pandas"
            )
            adf = admitted_ds.to_pandas()  # epoch frontier METADATA only (no payloads)
            n_in = hi - lo
            rej_invalid = int(adf["rej_invalid"].max()) if len(adf) else 0
            rej_robots = int(adf["rej_robots"].max()) if len(adf) else 0
            admitted = pa.Table.from_pandas(
                adf.drop(columns=["rej_invalid", "rej_robots"]), preserve_index=False
            ).append_column("epoch", pa.array(np.full(len(adf), epoch, dtype=np.int64)))
            admitted = admitted.sort_by(
                [("fetch_time_ms", "ascending"), ("seed_rank", "ascending")]
            )
            admitted = add_image_ids(admitted, store_size)

            # fetch + decode/validate + commit epoch partition
            fetched = fetch_from_store(store_paths, admitted, concurrency=concurrency)
            validated = fetched.map_batches(
                DecodeValidate,
                fn_constructor_kwargs={"min_dim": min_dim},
                batch_format="pyarrow",
                batch_size=256,
                concurrency=concurrency,
                num_cpus=1,
            )
            run.images_out.append_ray_partition(validated, epoch)

            # commit in order: images → crawl order → shard state → lineage.
            # A crash at any point re-runs this epoch from the previous
            # state snapshot; committed partitions are idempotent no-ops.
            run.crawl_order.append_partition(
                admitted.select([c for c in ORDER_COLS if c in admitted.column_names]
                                + ["image_id"]),
                epoch,
            )
            blobs = pool.checkpoints()
            run.state.append_partition(
                pa.table(
                    {
                        "shard": pa.array(range(num_shards), pa.int64()),
                        "blob": pa.array(blobs, pa.binary()),
                    }
                ),
                epoch,
            )
            part = run.images_out.partition_table(epoch, columns=["valid", "big"])
            counters = {
                "seeds_in": n_in,
                "rej_invalid": rej_invalid,
                "rej_robots": rej_robots,
                "admitted": admitted.num_rows,
                "rej_dup": n_in - rej_invalid - rej_robots - admitted.num_rows,
                "fetched": part.num_rows,
                "valid": int(pa.compute.sum(part.column("valid")).as_py() or 0),
                "big": int(pa.compute.sum(part.column("big")).as_py() or 0),
            }
            run.lineage.append_partition(
                pa.table(
                    {
                        "epoch": pa.array([epoch] * len(counters), pa.int64()),
                        "partition": pa.array([epoch] * len(counters), pa.int64()),
                        "stage": pa.array(["crawl"] * len(counters), pa.string()),
                        "counter": pa.array(list(counters), pa.string()),
                        "value": pa.array([int(v) for v in counters.values()], pa.int64()),
                    }
                ),
                epoch,
            )
            if fail_after_epoch is not None and epoch >= fail_after_epoch:
                raise RuntimeError(f"injected failure after epoch {epoch}")
    finally:
        pool.shutdown()
    return run
