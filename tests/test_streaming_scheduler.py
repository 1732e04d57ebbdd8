"""Streaming (min-heap) politeness scheduler: the continuous-crawl
emission path of FrontierShard — equivalent order to the analytic batch
path on the same input."""

import numpy as np
import pytest
import ray

from cc_warc_examples_ray.state.frontier_shard import FrontierShard


@pytest.fixture()
def shard(ray_session):
    s = FrontierShard.remote(0, capacity=1 << 12, default_delay_ms=100)
    yield s
    ray.kill(s)


def test_heap_schedule_matches_analytic(ray_session, shard):
    hosts = ["a", "a", "b", "a", "b", "c"]
    ranks = np.arange(6, dtype=np.int64)
    hashes = (ranks + 1).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    urls = [f"http://{h}/u{r}" for h, r in zip(hosts, ranks)]
    ray.get(shard.set_robots.remote({"a": 100, "b": 300, "c": 0}))
    n = ray.get(shard.enqueue.remote(hashes, hosts, ranks, urls))
    assert n == 6
    batch = ray.get(shard.next_batch.remote(10))
    # emitted order: (next_fetch_time, then heap pop order)
    times = [b[0] for b in batch]
    assert times == sorted(times)
    # per-host spacing >= crawl delay
    per_host = {}
    for t, rank, url, uh, h, idx, path in batch:
        per_host.setdefault(h, []).append(t)
    assert per_host["a"] == [0, 100, 200]
    assert per_host["b"] == [0, 300]
    assert per_host["c"] == [0]
    # within host, seed_rank order
    a_ranks = [rank for t, rank, u, uh, h, i, p in batch if h == "a"]
    assert a_ranks == sorted(a_ranks)


def test_heap_dedup_and_refill(ray_session, shard):
    hashes = np.array([11, 12, 11], dtype=np.uint64)
    n = ray.get(shard.enqueue.remote(hashes, ["x", "x", "x"], np.array([0, 1, 2]),
                                     ["u0", "u1", "u2"]))
    assert n == 2  # duplicate hash rejected
    first = ray.get(shard.next_batch.remote(1))
    assert len(first) == 1 and first[0][1] == 0
    # enqueue more while draining: politeness continues from host state
    ray.get(shard.enqueue.remote(np.array([13], dtype=np.uint64), ["x"],
                                 np.array([3]), ["u3"]))
    rest = ray.get(shard.next_batch.remote(10))
    ranks = [r[1] for r in rest]
    assert ranks == [1, 3]
    times = [r[0] for r in rest]
    assert all(b - a >= 100 for a, b in zip(times, times[1:]))  # shard delay

    # drain-then-refill: a host whose queue emptied must re-enter the heap
    assert ray.get(shard.next_batch.remote(10)) == []
    ray.get(shard.enqueue.remote(np.array([14], dtype=np.uint64), ["x"],
                                 np.array([4]), ["u4"]))
    again = ray.get(shard.next_batch.remote(10))
    assert [r[1] for r in again] == [4]
    assert again[0][0] >= times[-1] + 100  # politeness continues