"""Harvest one kernel-MATCHED scaling pair: when the window gates open
(loadavg below ``max_load`` AND single-proc kernel rate at/above
``min_rate``), run the 8-CPU and 32-CPU headline legs BACK-TO-BACK so
both see the same co-tenant DRAM window, re-probing the kernel between
legs.  Appends both legs (via tools/scaling_attempt.py, which records
per-leg kernel rates) and prints the pair's efficiency.

Usage: python tools/scaling_pair.py [max_load] [min_rate] [max_wait_min]

Waits up to ``max_wait_min`` (default 45) polling every 60 s for a
window; exits 0 with {"skipped": true} if none opens.  The 8-leg runs
FIRST (it is 3x longer; if the window closes mid-pair the 32-leg's
recorded kernel rate exposes it, and the pair reads conservatively
because the DENOMINATOR leg got the better window).
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
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bandwidth_probe.py"),
         "4096", "1"],
        capture_output=True, text=True, check=True, cwd=REPO,
    ).stdout
    return float(json.loads(out.strip().splitlines()[-1])["legs"][0][
        "per_core_rows_per_sec"])


def run_leg(ncpu: int, max_load: float, min_rate: float) -> dict | None:
    before = sum(1 for _ in open(LOG)) if os.path.exists(LOG) else 0
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_attempt.py"),
         str(ncpu), str(max_load), str(min_rate)],
        check=True, cwd=REPO, capture_output=True, text=True)
    lines = open(LOG).read().strip().splitlines()
    if len(lines) <= before:
        return None  # gate skipped the leg
    return json.loads(lines[-1])


def main() -> int:
    max_load = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    min_rate = float(sys.argv[2]) if len(sys.argv) > 2 else 950.0
    max_wait = float(sys.argv[3]) if len(sys.argv) > 3 else 45.0
    deadline = time.time() + max_wait * 60
    leg8 = leg32 = None
    while time.time() < deadline:
        load = loadavg()
        if load > max_load:
            print(json.dumps({"waiting": True, "load": load}), flush=True)
            time.sleep(60)
            continue
        rate = kernel_rate()
        if rate < min_rate:
            print(json.dumps({"waiting": True, "load": load,
                              "kernel_rate": rate}), flush=True)
            time.sleep(60)
            continue
        leg8 = run_leg(8, max_load, min_rate)
        if leg8 is None:
            # the window closed between the probe and the leg gate
            # (another process grabbed the box) — keep hunting
            print(json.dumps({"retry": True, "reason": "closed pre-8"}),
                  flush=True)
            time.sleep(60)
            continue
        # let the 8-leg's own 1-min loadavg contribution decay, then run
        # the 32-leg with a loose load gate — the kernel probe is
        # re-recorded (min_rate=1 probes without effectively gating) so
        # a mid-pair window closure is visible in the pair record
        time.sleep(90)
        leg32 = run_leg(32, 8.0, 1.0)
        if leg32 is not None:
            break
        print(json.dumps({"retry": True, "reason": "closed pre-32"}),
              flush=True)
        leg8 = None
        time.sleep(60)
    if leg8 is None or leg32 is None:
        print(json.dumps({"skipped": True, "reason": "no window"}))
        return 0
    r8 = leg8["crawl"]["urls_per_sec"]
    r32 = leg32["crawl"]["urls_per_sec"]
    pair = {
        "pair": True,
        "urls_per_sec_8": r8,
        "urls_per_sec_32": r32,
        "kernel_8": leg8.get("kernel_rate_1proc"),
        "kernel_32": leg32.get("kernel_rate_1proc"),
        "efficiency": round(r32 / (4 * r8), 4),
        "attempt_ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    # hardware-floor control in the SAME window: the no-Ray decode
    # kernel at 8 vs 32 procs — if the pipeline's efficiency matches
    # this, the loss is shared-DRAM, not engine overhead
    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "bandwidth_probe.py"),
             "4096", "8", "32"],
            capture_output=True, text=True, check=True, cwd=REPO,
        ).stdout
        legs = json.loads(out.strip().splitlines()[-1])["legs"]
        agg = {leg["procs"]: leg["agg_rows_per_sec"] for leg in legs}
        pair["control_agg_8"] = agg.get(8)
        pair["control_agg_32"] = agg.get(32)
        if agg.get(8) and agg.get(32):
            pair["control_efficiency"] = round(agg[32] / (4 * agg[8]), 4)
    except Exception as ex:  # control is best-effort
        pair["control_error"] = str(ex)[:200]
    with open(LOG, "a") as f:
        f.write(json.dumps(pair) + "\n")
    print(json.dumps(pair))
    return 0


if __name__ == "__main__":
    sys.exit(main())
