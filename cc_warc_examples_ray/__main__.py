"""CLI: run the demo pipelines end-to-end.

    python -m cc_warc_examples_ray crawl --seeds 5000 --out /tmp/crawl_demo
    python -m cc_warc_examples_ray streaming --seeds 5000 --out /tmp/stream_demo
    python -m cc_warc_examples_ray discovery --pages 500 --out /tmp/disc_demo
    python -m cc_warc_examples_ray stats --run /tmp/crawl_demo

``streaming`` is the continuous-mode crawl of the north rule: a killed
run (`kill -9`, lost `ray job submit` driver, …) re-invoked with the
SAME ``--out`` resumes from the newest complete round and produces
bit-identical tables to an uninterrupted run.

Must be run from the repo root (Ray workers import this package via the
driver's working directory).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="cc_warc_examples_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the flagship crawl on synthetic fixtures")
    c.add_argument("--seeds", type=int, default=5000)
    c.add_argument("--hosts", type=int, default=50)
    c.add_argument("--store-size", type=int, default=500)
    c.add_argument("--epochs", type=int, default=4)
    c.add_argument("--shards", type=int, default=4)
    c.add_argument("--out", required=True)
    c.add_argument("--num-cpus", type=int, default=8)

    t = sub.add_parser(
        "streaming",
        help="run the continuous (streaming) crawl; rerun with the same"
             " --out to resume a killed run")
    t.add_argument("--seeds", type=int, default=5000)
    t.add_argument("--hosts", type=int, default=50)
    t.add_argument("--store-size", type=int, default=500)
    t.add_argument("--shards", type=int, default=4)
    t.add_argument("--batch-urls", type=int, default=4096)
    t.add_argument("--out", required=True)
    t.add_argument("--num-cpus", type=int, default=8)

    d = sub.add_parser("discovery", help="run the two-level discovery crawl")
    d.add_argument("--pages", type=int, default=500)
    d.add_argument("--store-size", type=int, default=500)
    d.add_argument("--shards", type=int, default=4)
    d.add_argument("--out", required=True)
    d.add_argument("--num-cpus", type=int, default=8)

    s = sub.add_parser("stats", help="print the statistics report for a crawl run dir")
    s.add_argument("--run", required=True)

    args = p.parse_args(argv)

    if args.cmd == "stats":
        from .ops.stats_report import statistics_report
        from .pipelines.crawl import CrawlRun

        print(statistics_report(CrawlRun(args.run)))
        return 0

    import os

    import ray

    if not ray.is_initialized():
        # under `ray job submit` the runtime sets RAY_ADDRESS to the
        # cluster; standalone runs default to a local session.  num_cpus
        # is only legal for local sessions — a cluster brings its own.
        addr = os.environ.get("RAY_ADDRESS", "local")
        kw = {"num_cpus": args.num_cpus} if addr == "local" else {}
        ray.init(address=addr, include_dashboard=False,
                 logging_level="ERROR", **kw)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from . import lancelite, synth

    store = lancelite.LanceLiteTable("/tmp/ccwarc_store_cache")
    if not store.exists() or store.count_rows() < args.store_size:
        store.write(synth.images_table(args.store_size))

    if args.cmd == "crawl":
        from .pipelines.crawl import run_crawl

        run = run_crawl(
            synth.frontier_seeds_table(args.seeds, n_hosts=args.hosts),
            synth.robots_table(args.hosts),
            store.fragment_paths(), args.out,
            num_shards=args.shards, num_epochs=args.epochs,
            store_size=args.store_size,
        )
    elif args.cmd == "streaming":
        from .pipelines.streaming import run_streaming_crawl

        run = run_streaming_crawl(
            synth.frontier_seeds_table(args.seeds, n_hosts=args.hosts),
            synth.robots_table(args.hosts),
            store.fragment_paths(), args.out,
            num_shards=args.shards, store_size=args.store_size,
            batch_urls=args.batch_urls,
        )
    else:
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from .pipelines.discovery import run_discovery_crawl

        warc = synth.warc_records_table(args.pages)
        pages_path = "/tmp/ccwarc_cli_pages.parquet"
        pq.write_table(warc.select(["record_url", "mime", "payload"]), pages_path)
        urls = warc.column("record_url").to_pylist()
        seeds = pa.table(
            {
                "seed_url": pa.array(urls, pa.string()),
                "page_url": pa.array([""] * len(urls), pa.string()),
                "seed_rank": pa.array(np.arange(len(urls), dtype=np.int64)),
            }
        )
        run = run_discovery_crawl(
            seeds, synth.robots_table(20), [pages_path], store.fragment_paths(),
            args.out, num_shards=args.shards, store_size=args.store_size,
        )

    order = run.order_table()
    imgs = run.images_out.to_table()
    valid = int(imgs.to_pandas()["valid"].sum()) if imgs.num_rows else 0
    print(f"admitted={order.num_rows} fetched={imgs.num_rows} valid={valid} out={args.out}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
