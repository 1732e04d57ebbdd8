"""One scaling-leg attempt, load-gated: runs the 1.28M-seed single-epoch
headline crawl at the given CPU count IF the 1-minute loadavg is below
the gate (and, optionally, the single-proc decode-kernel rate is above
``min_kernel_rate`` — loadavg cannot see co-tenant DRAM contention),
and appends the result to BENCH/scaling_attempts.jsonl.

Usage: python tools/scaling_attempt.py <num_cpus> [max_load] [min_kernel_rate]

The co-tenant load on this box swings 0.3..20 within minutes; single
--scaling invocations are a noise lottery.  Collecting legs only in
quiet windows and assembling best-per-leg (identical input + config,
loadavg recorded per attempt) is the honest min-wall methodology
documented in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "scaling_attempts.jsonl")


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def kernel_rate() -> float:
    """Single-process decode-kernel rows/s (no Ray, ~5 s).  Loadavg is
    BLIND to co-tenant DRAM-bandwidth contention from other VMs — a
    window with loadavg 0.05 measured the kernel at HALF its normal rate
    (731 vs 1,460 rows/s); legs taken then undershoot by the same
    factor.  Gate on this, not just loadavg."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bandwidth_probe.py"),
         "4096", "1"],
        capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout
    return float(json.loads(out.strip().splitlines()[-1])["legs"][0][
        "per_core_rows_per_sec"
    ])


def main() -> int:
    ncpu = int(sys.argv[1])
    max_load = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    min_rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    load = loadavg()
    if load > max_load:
        print(json.dumps({"skipped": True, "load": load, "ncpu": ncpu}))
        return 0
    rate = kernel_rate() if min_rate > 0 else None
    if rate is not None and rate < min_rate:
        print(json.dumps({"skipped": True, "kernel_rate": rate,
                          "min_rate": min_rate, "ncpu": ncpu}))
        return 0
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        BENCH_EPOCHS=os.environ.get("BENCH_EPOCHS", "1"),
        # after the round-2 decode speedup the 640k frontier finishes a
        # 32-cpu leg in ~30s; 256x (1.28M) keeps the O(1) session cost
        # (~4-5s of ray.init + fixture build) a small fraction of wall
        BENCH_SEEDS_MULT=os.environ.get("BENCH_SEEDS_MULT", "256"),
        BENCH_SKIP_QUERIES="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout
    rec = json.loads(out.strip().splitlines()[-1])
    rec["attempt_ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    if rate is not None:
        rec["kernel_rate_1proc"] = rate
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps({"ncpu": ncpu, "urls_per_sec": rec["crawl"]["urls_per_sec"],
                      "load_start": rec["loadavg_1m_at_start"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
