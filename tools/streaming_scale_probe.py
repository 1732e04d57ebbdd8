"""10× streaming-crawl scale probe (VERDICT r4 #5): run the continuous
streaming crawl over a 12.8M-seed frontier (10× the 1.28M bench leg) and
record (a) the MEMORY CEILING — per-shard frontier heaps and checkpoint
blobs are sized by hosts and in-flight rounds, NOT by total URLs, so RSS
must plateau — and (b) per-round throughput, to show no cliff as the
admitted count grows into the tens of millions.

Memory is sampled two ways every 2 s on a daemon thread:
  * system used (MemTotal - MemAvailable from /proc/meminfo) — covers
    the whole Ray process tree including object store;
  * the driver's own VmRSS — the shard heaps + checkpoint staging live
    in actors, so a flat driver line shows nothing accumulates there.

Usage: python tools/streaming_scale_probe.py [seeds_mult] [num_cpus]
(defaults 2560 → 12.8M seeds at sf0.1, 32 CPUs).  Appends one JSON line
to BENCH/streaming_scale_probe.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
LOG = os.path.join(REPO, "BENCH", "streaming_scale_probe.jsonl")
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _meminfo_used_mb() -> float:
    vals = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            vals[k] = int(v.split()[0])  # kB
    return (vals["MemTotal"] - vals["MemAvailable"]) / 1024.0


def _self_rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class MemSampler(threading.Thread):
    def __init__(self, period: float = 2.0):
        super().__init__(daemon=True)
        self.period = period
        self.sys_used: list[float] = []
        self.drv_rss: list[float] = []
        self._stop = threading.Event()

    def run(self):
        while not self._stop.is_set():
            self.sys_used.append(_meminfo_used_mb())
            self.drv_rss.append(_self_rss_mb())
            self._stop.wait(self.period)

    def stop(self):
        self._stop.set()


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from cc_warc_examples_ray import synth
    from cc_warc_examples_ray.entry_queries import _STORE_N, _sf_scale, _store
    from cc_warc_examples_ray.pipelines.streaming import run_streaming_crawl

    store = _store()
    n_seeds = mult * _sf_scale(SF_DIR)
    baseline_mb = _meminfo_used_mb()
    t0 = time.time()
    seeds = synth.frontier_seeds_table(n_seeds, n_hosts=50)
    robots = synth.robots_table(50)
    synth_sec = time.time() - t0

    sampler = MemSampler()
    sampler.start()
    out_dir = tempfile.mkdtemp(prefix="stream_scale_")
    t0 = time.time()
    run = run_streaming_crawl(
        seeds, robots, store.fragment_paths(), out_dir,
        num_shards=8, store_size=_STORE_N, batch_urls=4096,
    )
    wall = time.time() - t0
    sampler.stop()
    n_admitted = run.crawl_order.to_table().num_rows
    # per-round rows from the partition manifest = the throughput-cliff
    # check (rounds are committed in order; a cliff would show as the
    # later partitions shrinking or the wall/round growing — wall/round
    # is not recorded per round here, so row counts + flat RSS carry it)
    per_part: dict = {}
    for frag in run.crawl_order.manifest()["fragments"]:
        key = json.dumps(frag.get("partition"))
        per_part[key] = per_part.get(key, 0) + frag["rows"]
    parts = sorted(per_part.items())
    shutil.rmtree(out_dir, ignore_errors=True)

    used = sampler.sys_used or [0.0]
    drv = sampler.drv_rss or [0.0]
    k = max(len(used) // 4, 1)
    rec = {
        "probe": "streaming_scale_10x",
        "n_seeds": n_seeds,
        "n_admitted": n_admitted,
        "num_cpus": ncpu,
        "wall_sec": round(wall, 2),
        "urls_per_sec": round(n_admitted / wall, 1),
        "frontier_synth_sec": round(synth_sec, 2),
        "mem_baseline_mb": round(baseline_mb, 1),
        "sys_used_peak_mb": round(max(used), 1),
        "sys_used_first_quarter_peak_mb": round(max(used[:k]), 1),
        "sys_used_last_quarter_peak_mb": round(max(used[-k:]), 1),
        "driver_rss_peak_mb": round(max(drv), 1),
        "driver_rss_last_mb": round(drv[-1], 1),
        "n_mem_samples": len(used),
        "rounds_committed": len(parts),
        "attempt_ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    ray.shutdown()
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
