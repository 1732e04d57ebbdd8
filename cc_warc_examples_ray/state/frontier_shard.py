"""Sharded frontier state: URL-seen cuckoo shards + per-host politeness.

This is the Ray-native replacement for the reference's JVM-static crawl
state: the synchronized bloom URL-seen set
(`/root/reference/src/org/commoncrawl/mklab/analysis/Statistics.java:21-26`,
admit at `ProcessingService.java:186-192`), the domain-seen set
(`Statistics.java:60`), and the single global >=150 ms politeness mutex
(`ProcessingService.java:57,235-239`).  The reference's own scale blueprint
— shard N filters by ``host.hashCode() % N`` (`Statistics.java:37-51`) —
becomes a pool of ``FrontierShard`` **actors** partitioned by
``xxhash64(host) % num_shards``:

- every URL of a host lands on one shard → seen-set admission and the
  host's politeness queue need no cross-shard coordination;
- the politeness throttle generalizes from one global interval to a
  per-host ``next_fetch_time`` schedule derived from robots crawl-delay
  (SURVEY.md §2.3 T7);
- each shard checkpoints ``(cuckoo bytes, host counters)`` per epoch to
  the Lance-style state table so a killed run resumes exactly.

Crawl-order spec (SURVEY.md §2.8): admitted URLs are ordered by
``(fetch_time_ms, seed_rank, url_hash)`` where ``fetch_time_ms =
host_index * crawl_delay_ms(host)`` and ``host_index`` is the admission
position within the host (continues across epochs).  This makes the
reference's accidental, mutex-made ordering an explicit deterministic
key, reproducible under any parallelism.
"""

from __future__ import annotations

import pickle

import numpy as np
import ray

from .cuckoo import CuckooFilter


@ray.remote(num_cpus=0.1)
class FrontierShard:
    """One shard of the frontier state.  All URLs whose host hashes to
    this shard are admitted/scheduled here, in submission order."""

    def __init__(self, shard_id: int, capacity: int = 1 << 20, default_delay_ms: int = 150):
        self.shard_id = shard_id
        self.seen = CuckooFilter(capacity=capacity, fp_bits=32, seed=shard_id)
        self.domains_seen = CuckooFilter(capacity=max(capacity // 64, 1 << 12), fp_bits=32, seed=shard_id + 7)
        # politeness state keyed by xxhash64(host) — no python strings in
        # the hot path: counters[h] = next host_index, delays[h] = crawl delay
        self.counters: dict[int, int] = {}
        self.delays: dict[int, int] = {}
        # string-keyed state for the streaming heap path only
        self.hosts: dict[str, list[int]] = {}
        self.default_delay_ms = default_delay_ms
        self.admitted = 0
        self.rejected_dup = 0

    def set_robots(self, delays: dict[str, int]) -> None:
        """Install per-host crawl delays (robots.txt crawl-delay)."""
        from ..hashing import xxh64

        for h, d in delays.items():
            st = self.hosts.setdefault(h, [0, self.default_delay_ms])
            st[1] = int(d)
            self.delays[int(xxh64(h.encode()))] = int(d)

    def admit_batch(self, url_hashes: np.ndarray) -> np.ndarray:
        """First-seen admit (cuckoo, vectorized).  Routed by URL hash —
        uniform across shards regardless of host skew, so no shard's
        filter can overflow from a hot host (the failure mode of
        host-routed seen-sets under Zipf frontiers)."""
        admit = self.seen.add_if_absent(np.asarray(url_hashes, dtype=np.uint64))
        self.admitted += int(admit.sum())
        self.rejected_dup += int(len(admit) - admit.sum())
        return admit

    def schedule_batch(
        self, host_hashes: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Politeness schedule for already-admitted rows — routed by host
        hash so each host's counter has a single owner.  Vectorized
        per-host cumcount; returns (fetch_time_ms, host_index).  Rows
        must arrive in seed_rank order (the pipeline sorts each epoch
        and awaits each chunk round)."""
        hh = np.asarray(host_hashes, dtype=np.uint64)
        n = len(hh)
        fetch_time = np.empty(n, dtype=np.int64)
        host_index = np.empty(n, dtype=np.int64)
        if n:
            uniq, inv, counts = np.unique(hh, return_inverse=True, return_counts=True)
            order = np.argsort(inv, kind="stable")
            starts = np.zeros(len(uniq), dtype=np.int64)
            starts[1:] = np.cumsum(counts)[:-1]
            occ = np.empty(n, dtype=np.int64)
            occ[order] = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
            base = np.array([self.counters.get(int(u), 0) for u in uniq], dtype=np.int64)
            delay = np.array(
                [self.delays.get(int(u), self.default_delay_ms) for u in uniq],
                dtype=np.int64,
            )
            host_index = base[inv] + occ
            fetch_time = host_index * delay[inv]
            for u, b, c in zip(uniq, base, counts):
                self.counters[int(u)] = int(b + c)
            # domain-seen namespace (Statistics.java:60) — approximate
            # distinct-host accounting per shard (A6)
            self.domains_seen.add_if_absent(uniq)
        return fetch_time, host_index

    def seen_domains_add(self, host_hashes: np.ndarray) -> np.ndarray:
        """Domain-seen namespace (Statistics.java:60 analog)."""
        return self.domains_seen.add_if_absent(np.asarray(host_hashes, dtype=np.uint64))

    # -- streaming emission: per-host min-heap priority queue --------------
    # The batch path above computes fetch times analytically; this is the
    # literal scheduler for CONTINUOUS crawling: enqueue admitted URLs,
    # then repeatedly pop the globally next-due URL batch.  Heap key =
    # (next_fetch_time(host), seed_rank) — the north-rule priority queue.

    def enqueue(self, url_hashes: np.ndarray, hosts: list[str], ranks: np.ndarray,
                urls: list[str], paths: list[str] | None = None,
                admit: bool = True) -> int:
        """Push URLs into per-host FIFO queues; hosts enter the
        ready-heap at their next legal fetch time.  Returns #enqueued.

        ``admit=True`` runs the first-seen check on THIS shard (single
        shard / test use).  The streaming pipeline instead pre-admits
        rows via url-hash-routed :meth:`admit_batch` (uniform — immune
        to Zipf host skew overflowing a host-routed filter) and calls
        ``enqueue(..., admit=False)`` with only the admitted rows,
        routed by host.  ``paths`` carries the canonical query-free path
        so downstream never re-derives it from the URL.

        Vectorized: rows are grouped by host with one factorize +
        lexsort, item tuples built by one C-level ``zip``, and each
        host's queue extended with a rank-sorted slice + one timsort
        (linear on the nearly-sorted result; a SORTED list is a valid
        min-heap, so ``next_batch``'s heappop stays correct) — no
        per-row heappush."""
        import heapq

        import pandas as pd

        if not hasattr(self, "_queues"):
            self._queues: dict[str, list] = {}
            self._heap: list = []
            self._in_heap: set = set()
        uh = np.asarray(url_hashes, dtype=np.uint64)
        ranks = np.asarray(ranks, dtype=np.int64)
        if admit:
            adm = self.seen.add_if_absent(uh)
            self.admitted += int(adm.sum())
            self.rejected_dup += int(len(adm) - adm.sum())
            keep = np.flatnonzero(adm)
        else:
            keep = np.arange(len(uh))
        if not len(keep):
            return 0
        hosts_k = np.asarray(hosts, dtype=object)[keep]
        paths_k = (np.asarray(paths, dtype=object)[keep]
                   if paths is not None else np.full(len(keep), "", dtype=object))
        codes, uniq = pd.factorize(hosts_k, sort=False)
        order = np.lexsort((ranks[keep], codes))
        ks = keep[order]
        codes_s = codes[order]
        items = list(zip(
            ranks[ks].tolist(),
            np.asarray(urls, dtype=object)[ks].tolist(),
            uh[ks].tolist(),  # uint64 .tolist() keeps unsigned python ints
            paths_k[order].tolist(),
        ))
        bounds = np.flatnonzero(np.diff(codes_s)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(ks)]])
        for gi in range(len(starts)):
            h = uniq[codes_s[starts[gi]]]
            st = self.hosts.setdefault(h, [0, self.default_delay_ms])
            q = self._queues.setdefault(h, [])
            if h not in self._in_heap:
                next_t = st[0] * st[1]  # continue politeness across calls
                heapq.heappush(self._heap, (next_t, h))
                self._in_heap.add(h)
            seg = items[starts[gi]:ends[gi]]  # rank-sorted within host
            if q:
                q.extend(seg)
                q.sort()  # timsort: linear when q was (nearly) sorted
            else:
                # full TUPLE sort, not just rank order: duplicate ranks
                # must pop in (rank, url, ...) order like heappush did
                seg.sort()
                self._queues[h] = seg
        return int(len(keep))

    def next_batch(self, max_urls: int = 256) -> list[tuple]:
        """Pop up to ``max_urls`` due URLs in global schedule order
        ``(next_fetch_time, seed_rank)``.  Each pop advances the host's
        next_fetch_time by its crawl delay and re-heaps the host —
        deterministic regardless of wall clock (virtual time).  Tuple
        shape: ``(t, rank, url, url_hash, host, host_index, path)``.
        Thin row-tuple view over :meth:`next_batch_arrays` (ONE pop
        loop owns the scheduler invariant)."""
        r = self.next_batch_arrays(max_urls)
        if r is None:
            return []
        ts, ranks, urls, uhs, hosts, his, paths = r
        return list(zip(ts.tolist(), ranks.tolist(), urls, uhs.tolist(),
                        hosts, his.tolist(), paths))

    def next_batch_arrays(self, max_urls: int = 256):
        """:meth:`next_batch` in COLUMN form: identical pop order, but
        the emission returns as numpy arrays + string lists instead of
        one python tuple per URL — at a 32k-URL round the tuples cost
        more to build and serialize than the whole drain's heap work.
        Returns None when nothing is due.  Columns: (fetch_time_ms,
        seed_rank, url, url_hash(uint64), host, host_index, path)."""
        import heapq

        if not hasattr(self, "_heap"):
            return None
        ts: list[int] = []
        ranks: list[int] = []
        urls: list[str] = []
        uhs: list[int] = []
        hosts: list[str] = []
        his: list[int] = []
        paths: list[str] = []
        while self._heap and len(ts) < max_urls:
            t, h = heapq.heappop(self._heap)
            q = self._queues.get(h)
            if not q:
                self._in_heap.discard(h)
                continue
            rank, url, uh, path = heapq.heappop(q)
            st = self.hosts.setdefault(h, [0, self.default_delay_ms])
            ts.append(t)
            ranks.append(rank)
            urls.append(url)
            uhs.append(uh)
            hosts.append(h)
            his.append(st[0])
            paths.append(path)
            st[0] += 1
            if q:
                heapq.heappush(self._heap, (t + st[1], h))
            else:
                self._in_heap.discard(h)
        if not ts:
            return None
        return (
            np.asarray(ts, np.int64), np.asarray(ranks, np.int64), urls,
            np.asarray(uhs, np.uint64), hosts, np.asarray(his, np.int64), paths,
        )

    def stats(self) -> dict:
        return {
            "shard": self.shard_id,
            "admitted": self.admitted,
            "rejected_dup": self.rejected_dup,
            "seen_count": int(self.seen.count),
            "domains_seen": int(self.domains_seen.count),
            "hosts": len(self.hosts),
            "load_factor": self.seen.load_factor,
        }

    # -- checkpoint / restore ----------------------------------------------
    def checkpoint(self) -> bytes:
        return pickle.dumps(
            {
                "shard_id": self.shard_id,
                "seen": self.seen.to_bytes(),
                "domains": self.domains_seen.to_bytes(),
                "hosts": self.hosts,
                "counters": self.counters,
                "delays": self.delays,
                "admitted": self.admitted,
                "rejected_dup": self.rejected_dup,
                # streaming-mode scheduler state (queues + heap), so a
                # killed continuous crawl resumes mid-drain exactly
                "queues": getattr(self, "_queues", {}),
                "heap": getattr(self, "_heap", []),
                "in_heap": getattr(self, "_in_heap", set()),
            },
            protocol=4,
        )

    def restore(self, blob: bytes) -> None:
        st = pickle.loads(blob)
        assert st["shard_id"] == self.shard_id, "checkpoint routed to wrong shard"
        self.seen = CuckooFilter.from_bytes(st["seen"], seed=self.shard_id)
        self.domains_seen = CuckooFilter.from_bytes(st["domains"], seed=self.shard_id + 7)
        self.hosts = st["hosts"]
        self.counters = st.get("counters", {})
        self.delays.update(st.get("delays", {}))
        self.admitted = st["admitted"]
        self.rejected_dup = st["rejected_dup"]
        if st.get("queues") or st.get("heap"):
            self._queues = st["queues"]
            self._heap = st["heap"]
            self._in_heap = st["in_heap"]


class FrontierPool:
    """Driver-side handle over the shard actors.

    Routing key: ``xxhash64(host) % num_shards`` — identical to the
    sharding rule sketched at `Statistics.java:37-44`.  At cluster scale
    shards spread across nodes; state per shard stays bounded
    (~6 B/key cuckoo + a dict entry per host).
    """

    def __init__(self, num_shards: int = 8, capacity_per_shard: int = 1 << 20,
                 default_delay_ms: int = 150):
        self.num_shards = num_shards
        self.shards = [
            FrontierShard.options(name=None).remote(
                s, capacity=capacity_per_shard, default_delay_ms=default_delay_ms
            )
            for s in range(num_shards)
        ]

    def route(self, host_hashes: np.ndarray) -> np.ndarray:
        return (host_hashes.astype(np.uint64) % np.uint64(self.num_shards)).astype(np.int64)

    def set_robots(self, delays: dict[str, int], host_hashes: dict[str, int]) -> None:
        per_shard: list[dict[str, int]] = [dict() for _ in range(self.num_shards)]
        for h, d in delays.items():
            per_shard[int(host_hashes[h] % self.num_shards)][h] = d
        ray.get([s.set_robots.remote(m) for s, m in zip(self.shards, per_shard)])

    def admit_only(self, url_hashes: np.ndarray) -> np.ndarray:
        """Round A alone: first-seen cuckoo admit, routed by URL-hash
        (uniform — Zipf-host-safe).  THE single implementation of the
        admit fan-out/reassembly, shared by admit_and_schedule and the
        streaming enqueue path."""
        uh = np.asarray(url_hashes, dtype=np.uint64)
        admit = np.zeros(len(uh), dtype=bool)
        shard_of = self.route(uh)
        futs, idxs = [], []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard_of == s)
            if len(idx) == 0:
                continue
            futs.append(self.shards[s].admit_batch.remote(uh[idx]))
            idxs.append(idx)
        for idx, a in zip(idxs, ray.get(futs)):
            admit[idx] = a
        return admit

    def admit_and_schedule(
        self, url_hashes: np.ndarray, host_hashes: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Route one (seed_rank-ordered) batch across shards in TWO
        rounds; reassemble aligned outputs.  Round A: first-seen admit,
        routed by ``url_hash % shards`` — uniformly balanced, so hot
        hosts cannot overflow one shard's filter.  Round B: politeness
        schedule for admitted rows, routed by ``host_hash % shards`` —
        each host's counter has a single owner.  numpy-only routing;
        ordering preserved per shard by awaiting each round."""
        n = len(url_hashes)
        uh = np.asarray(url_hashes, dtype=np.uint64)
        hh = np.asarray(host_hashes, dtype=np.uint64)
        fetch_time = np.full(n, -1, dtype=np.int64)
        host_index = np.full(n, -1, dtype=np.int64)

        # round A: seen-set admit by url-hash
        admit = self.admit_only(uh)

        # round B: politeness schedule by host-hash, admitted rows only
        adm_idx = np.flatnonzero(admit)
        if len(adm_idx):
            shard_of_h = self.route(hh[adm_idx])
            futs, idxs = [], []
            for s in range(self.num_shards):
                sub = adm_idx[shard_of_h == s]
                if len(sub) == 0:
                    continue
                futs.append(self.shards[s].schedule_batch.remote(hh[sub]))
                idxs.append(sub)
            for sub, (ft, hi) in zip(idxs, ray.get(futs)):
                fetch_time[sub] = ft
                host_index[sub] = hi
        return admit, fetch_time, host_index

    def admit_and_schedule_pipelined(
        self, url_hashes: np.ndarray, host_hashes: np.ndarray, chunk: int = 65536
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Same semantics as :meth:`admit_and_schedule`, pipelined: every
        chunk's round-A admit calls are submitted UP FRONT (actor tasks
        execute in submission order, so per-shard rank order is
        preserved without awaiting), round-B schedule calls are submitted
        as each chunk's admit mask arrives and gathered once at the end.
        The driver never sits in a per-chunk sync barrier — shards stay
        busy across the whole epoch.  Correctness: admit_batch touches
        only the seen-set, schedule_batch only the per-host counters, so
        their interleaving per shard is free; each method's calls arrive
        in rank order."""
        n = len(url_hashes)
        uh = np.asarray(url_hashes, dtype=np.uint64)
        hh = np.asarray(host_hashes, dtype=np.uint64)
        admit = np.zeros(n, dtype=bool)
        fetch_time = np.full(n, -1, dtype=np.int64)
        host_index = np.full(n, -1, dtype=np.int64)

        rounds = []
        for st in range(0, n, chunk):
            en = min(st + chunk, n)
            shard_of = self.route(uh[st:en])
            futs, idxs = [], []
            for s in range(self.num_shards):
                idx = st + np.flatnonzero(shard_of == s)
                if len(idx):
                    futs.append(self.shards[s].admit_batch.remote(uh[idx]))
                    idxs.append(idx)
            rounds.append((st, en, futs, idxs))

        pending: list[tuple[np.ndarray, "ray.ObjectRef"]] = []
        for st, en, futs, idxs in rounds:
            for idx, a in zip(idxs, ray.get(futs)):
                admit[idx] = a
            adm_idx = st + np.flatnonzero(admit[st:en])
            if len(adm_idx):
                shard_of_h = self.route(hh[adm_idx])
                for s in range(self.num_shards):
                    sub = adm_idx[shard_of_h == s]
                    if len(sub):
                        pending.append(
                            (sub, self.shards[s].schedule_batch.remote(hh[sub]))
                        )
        for sub, fut in pending:
            ft, hi = ray.get(fut)
            fetch_time[sub] = ft
            host_index[sub] = hi
        return admit, fetch_time, host_index

    def checkpoints(self) -> list[bytes]:
        return ray.get(self.checkpoints_async())

    def checkpoints_async(self) -> list:
        """Fire checkpoint tasks WITHOUT waiting: per-actor FIFO ordering
        (same submitter) guarantees each blob captures the shard state
        after every already-submitted mutation and before any mutation
        submitted later — so the driver can keep draining while blob
        serialization runs on the shards; resolve the refs when the
        round commits.  (Serial checkpoints measured 32 s of a 99 s
        1.28M-seed streaming run.)"""
        return [s.checkpoint.remote() for s in self.shards]

    def restore(self, blobs: list[bytes]) -> None:
        assert len(blobs) == self.num_shards
        ray.get([s.restore.remote(b) for s, b in zip(self.shards, blobs)])

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
