"""Memory-bandwidth probe for the decode-validate kernel, NO Ray.

Runs the exact per-batch kernel of the crawl's hot stage
(``stages.fetch`` broadcast lookup + ``stages.decode.DecodeValidate``)
under plain ``multiprocessing`` at 1, 8 and 32 processes and prints
per-process and aggregate rows/s.

Purpose (BENCH/BASELINE.md): separates *hardware* scaling loss from
*engine* scaling loss on this single shared box.  The stage moves
~1-2 MB of pixel traffic per row; once the box's DRAM bandwidth
saturates, per-core throughput MUST drop no matter how the work is
scheduled.  A real multi-node cluster adds bandwidth with every node,
so the single-box 8-vs-32-CPU efficiency is a floor, not an estimate,
for N-vs-4N-node scaling.  If this probe's 32-process per-core rate
matches the Ray pipeline's per-core rate, the pipeline adds no
coordination overhead on top of the hardware ceiling.

Usage: python tools/bandwidth_probe.py [rows_per_proc] [procs ...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
PROCS = [int(a) for a in sys.argv[2:]] or [1, 8, 32]


def _worker(rows: int, out_q, barrier) -> None:
    import pyarrow as pa

    from cc_warc_examples_ray import synth
    from cc_warc_examples_ray.stages.decode import DecodeValidate

    store = synth.images_table(500)
    # admitted batch: every store row repeated until `rows`, with the
    # metadata columns the decode stage expects (same shape as the
    # fused fetch output in the crawl wave)
    reps = rows // store.num_rows + 1
    tbl = pa.concat_tables([store] * reps).slice(0, rows)
    import numpy as np

    for col in ("fetch_time_ms", "host_index", "seed_rank", "url_hash", "epoch"):
        tbl = tbl.append_column(col, pa.array(np.zeros(rows, np.int64)))
    for col in ("url", "host"):
        tbl = tbl.append_column(col, pa.array(["x"] * rows, pa.string()))
    dec = DecodeValidate()
    # warm the per-process expected-pixels cache outside the timed loop
    dec(tbl.slice(0, 500))
    # all processes start the timed loop together — otherwise early
    # starters time their loop while late ones still synthesize their
    # store (CPU-heavy), contaminating the per-core rate
    barrier.wait()
    t0 = time.time()
    for lo in range(0, rows, 256):
        dec(tbl.slice(lo, 256))
    out_q.put(rows / (time.time() - t0))


def probe(nproc: int) -> dict:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(nproc + 1)
    ps = [mp.Process(target=_worker, args=(ROWS, q, barrier)) for _ in range(nproc)]
    for p in ps:
        p.start()
    barrier.wait()  # every process warmed; timed region starts now
    t0 = time.time()
    rates = [q.get() for _ in ps]
    wall = time.time() - t0
    for p in ps:
        p.join()
    total = ROWS * nproc / wall
    return {
        "procs": nproc,
        "rows_per_proc": ROWS,
        "agg_rows_per_sec": round(total, 1),
        "per_core_rows_per_sec": round(total / nproc, 1),
        "per_proc_rates": [round(r, 1) for r in sorted(rates)],
        "wall_sec": round(wall, 2),
    }


if __name__ == "__main__":
    res = {"loadavg_1m": float(open("/proc/loadavg").read().split()[0]),
           "legs": [probe(n) for n in PROCS]}
    base = res["legs"][0]["per_core_rows_per_sec"]
    for leg in res["legs"]:
        leg["per_core_vs_1proc"] = round(leg["per_core_rows_per_sec"] / base, 3)
    print(json.dumps(res))
