"""Lance-style versioned table on Parquet: fragments + atomic JSON manifest.

The real ``lance`` package is not installed in this sandbox; this module
implements the subset of its semantics the engine needs — append-only
fragment files, atomic manifest commits, versioned reads, per-partition
idempotent writes for resumability — on top of ``pyarrow.parquet``.  The
API is isolated here so real Lance can be dropped in later.

Replaces the reference's sinks: Mongo collections
(`/root/reference/src/org/commoncrawl/mklab/analysis/MorphiaManager.java:19-34`),
gzip text part-files (`WARCTagCounter.java:53-61`) and loose image files
(`ProcessingService.java:350-358`).

Layout::

    table_dir/
      _versions/000001.json   # manifest: list of fragment files + metadata
      _versions/000002.json
      _latest                 # text file holding the latest version number
      data/frag-<uuid>.parquet

Commit protocol: write fragments → write new manifest (tmp+rename) →
rename ``_latest`` (tmp+rename).  Readers resolve ``_latest`` then read
only fragments listed in that manifest, so a crash mid-commit leaves the
previous version intact (the atomicity the resume test relies on).
Partitioned writes record a ``partition`` key per fragment; a resumed run
asks ``completed_partitions()`` and skips those.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

# orphan part-* dirs younger than this are left alone by the startup
# vacuum in write_ray_partitioned: they may belong to a LIVE concurrent
# writer that has not committed yet (crashed attempts age past it)
VACUUM_MIN_AGE_SEC = 30 * 60


def _warm_fsspec_http() -> None:
    """Kill an intermittent ImportError in concurrent ``write_parquet``.

    Ray's datasink path resolution runs ``from
    fsspec.implementations.http import HTTPFileSystem`` on EVERY write
    and catches only ``ModuleNotFoundError``.  In this environment
    aiohttp is absent, so that module can never finish importing — each
    attempt fails (normally caught) and is evicted from ``sys.modules``,
    re-running the import every call.  When two writer threads race the
    attempt (this repo's committer/writer pools do exactly that), the
    import lock's deadlock-avoidance can hand one thread the
    half-initialized module, surfacing as a plain ``ImportError:
    cannot import name 'HTTPFileSystem'`` that Ray does NOT catch —
    observed killing ~1-in-5 streaming runs.  Fix: if (and only if) the
    real module cannot import, install a sentinel stub ONCE, here,
    single-threaded at package import — future imports are stable
    ``sys.modules`` hits, and Ray's ``isinstance(fs, HTTPFileSystem)``
    is False for the never-instantiated sentinel (correct: with aiohttp
    absent no real HTTP filesystem can exist)."""
    try:
        import fsspec.implementations.http  # noqa: F401  (real module)
        return
    except ModuleNotFoundError:
        pass
    except ImportError:
        pass
    import sys
    import types

    try:
        import fsspec.implementations  # noqa: F401
    except ImportError:  # no fsspec at all: Ray's except handles it
        return
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel — never instantiated
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod
    # parent attribute too: `import fsspec.implementations.http` resolves
    # the dotted attribute chain, not just sys.modules
    sys.modules["fsspec.implementations"].http = mod


_warm_fsspec_http()


class LanceLiteTable:
    def __init__(self, path: str):
        self.path = path
        self._vdir = os.path.join(path, "_versions")
        self._data = os.path.join(path, "data")

    # -- helpers ----------------------------------------------------------
    def _latest_file(self) -> str:
        return os.path.join(self.path, "_latest")

    def latest_version(self) -> int:
        try:
            with open(self._latest_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._vdir, f"{version:06d}.json")

    def manifest(self, version: int | None = None) -> dict:
        v = self.latest_version() if version is None else version
        if v == 0:
            return {"version": 0, "fragments": [], "metadata": {}}
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def exists(self) -> bool:
        return self.latest_version() > 0

    # -- write path -------------------------------------------------------
    def _write_fragment(self, table: pa.Table, partition) -> dict:
        os.makedirs(self._data, exist_ok=True)
        name = f"frag-{uuid.uuid4().hex}.parquet"
        fp = os.path.join(self._data, name)
        pq.write_table(table, fp)
        return {
            "file": os.path.join("data", name),
            "rows": table.num_rows,
            "partition": partition,
        }

    def _commit(self, fragments: list[dict], metadata: dict) -> int:
        os.makedirs(self._vdir, exist_ok=True)
        v = self.latest_version() + 1
        man = {"version": v, "fragments": fragments, "metadata": metadata}
        tmp = self._manifest_path(v) + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(man, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._manifest_path(v))
        ltmp = self._latest_file() + f".tmp{os.getpid()}"
        with open(ltmp, "w") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.rename(ltmp, self._latest_file())
        return v

    def write(self, table: pa.Table, mode: str = "overwrite", metadata: dict | None = None) -> int:
        """Write a whole table as one fragment (new version)."""
        frag = self._write_fragment(table, partition=None)
        prev = [] if mode == "overwrite" else self.manifest()["fragments"]
        return self._commit(prev + [frag], metadata or {})

    def append_partition(self, table: pa.Table, partition, metadata: dict | None = None) -> int:
        """Idempotently append one partition's data: if ``partition`` is
        already present in the latest manifest, this is a no-op (the
        resume path — a partition is either fully committed or absent)."""
        man = self.manifest()
        if any(f["partition"] == partition for f in man["fragments"]):
            return man["version"]
        if table.num_columns == 0:
            frag = {"file": "", "rows": 0, "partition": partition}  # sentinel
        else:
            frag = self._write_fragment(table, partition)
        md = dict(man.get("metadata", {}))
        md.update(metadata or {})
        return self._commit(man["fragments"] + [frag], md)

    def write_partition_files(self, ds, partition) -> list[dict]:
        """Write one partition's fragment files from a ray Dataset
        (streaming — the driver never holds the data) WITHOUT committing.
        Safe to run concurrently for different partitions; the commit is
        :meth:`commit_fragments` (serialize commits on one thread).
        Returns the fragment records to commit, or [] if the partition is
        already committed."""
        import shutil

        man = self.manifest()
        if any(f["partition"] == partition for f in man["fragments"]):
            return []
        sub = f"part-{partition}"
        subdir = os.path.join(self._data, sub)
        if os.path.exists(subdir):
            shutil.rmtree(subdir)  # stale files from a crashed attempt
        os.makedirs(subdir)
        ds.write_parquet(subdir)
        if os.environ.get("CRAWL_TIMING") == "1":
            print(f"[crawl-timing] write part-{partition} stats:\n{ds.stats()}", flush=True)
        frags = []
        for name in sorted(os.listdir(subdir)):
            fp = os.path.join(subdir, name)
            frags.append(
                {
                    "file": os.path.join("data", sub, name),
                    "rows": pq.read_metadata(fp).num_rows,
                    "partition": partition,
                }
            )
        if not frags:
            # empty partition: record a schema-less sentinel so the
            # partition still counts as committed (resume skips it)
            frags = [{"file": "", "rows": 0, "partition": partition}]
        return frags

    def write_partition_files_multi(
        self, ds, partition_col: str, partitions: list
    ) -> dict:
        """Write MANY partitions' fragment files from ONE ray Dataset in a
        single streaming pass, routing each row by ``partition_col``
        (int64).  The one-pass crawl fetch uses this: one store scan
        serves every epoch's admits, and the output still lands in
        per-epoch partition dirs so commits (and resume) stay per-epoch.

        Workers write a parquet file per (block, partition-present-in-
        block); only tiny fragment RECORDS flow back to the driver.
        Nothing is committed here — call :meth:`commit_fragments` per
        partition, in order, afterwards.  Partitions already committed
        are excluded from the write (their rows are dropped) and absent
        from the result.  Returns ``{partition: [frag records]}`` with an
        empty-sentinel record for requested partitions that got no rows."""
        import shutil

        man = self.manifest()
        have = {f["partition"] for f in man["fragments"]}
        want = [p for p in partitions if p not in have]
        if not want:
            return {}
        for p in want:  # stale files from a crashed attempt
            sub = os.path.join(self._data, f"part-{p}")
            if os.path.exists(sub):
                shutil.rmtree(sub)
        os.makedirs(self._data, exist_ok=True)
        data_dir, want_set = self._data, set(want)

        def write_blocks(batch: pa.Table) -> pa.Table:
            import numpy as np
            import pyarrow.compute as pc

            parts = batch.column(partition_col).to_numpy(zero_copy_only=False)
            recs: list[tuple] = []
            for p in np.unique(parts):
                p = int(p)
                if p not in want_set:
                    continue
                sub = batch.filter(pc.equal(batch.column(partition_col), p))
                d = os.path.join(data_dir, f"part-{p}")
                os.makedirs(d, exist_ok=True)
                name = f"frag-{uuid.uuid4().hex}.parquet"
                pq.write_table(sub, os.path.join(d, name))
                recs.append((p, os.path.join("data", f"part-{p}", name), sub.num_rows))
            return pa.table(
                {
                    "partition": pa.array([r[0] for r in recs], pa.int64()),
                    "file": pa.array([r[1] for r in recs], pa.string()),
                    "rows": pa.array([r[2] for r in recs], pa.int64()),
                }
            )

        rec_rows = ds.map_batches(
            write_blocks, batch_format="pyarrow", batch_size=None
        ).take_all()
        out: dict = {p: [] for p in want}
        for r in rec_rows:
            out[int(r["partition"])].append(
                {"file": r["file"], "rows": int(r["rows"]), "partition": int(r["partition"])}
            )
        for p in want:
            if not out[p]:  # empty partition: committed-marker sentinel
                out[p] = [{"file": "", "rows": 0, "partition": p}]
        return out

    def commit_fragments(self, frags: list[dict], metadata: dict | None = None) -> int:
        """Atomically add fragment records to the manifest (no-op when
        their partitions are already present)."""
        man = self.manifest()
        have = {f["partition"] for f in man["fragments"]}
        frags = [f for f in frags if f["partition"] not in have]
        if not frags:
            return man["version"]
        md = dict(man.get("metadata", {}))
        md.update(metadata or {})
        return self._commit(man["fragments"] + frags, md)

    def append_ray_partition(self, ds, partition, metadata: dict | None = None) -> int:
        """Idempotently append one partition from a ray Dataset: fragment
        files written by the Ray workers, then one atomic manifest commit.
        A crash between the write and the commit leaves unreferenced files
        in the partition dir; the rerun clears them (the manifest, not the
        filesystem, is the source of truth)."""
        frags = self.write_partition_files(ds, partition)
        if not frags:
            return self.latest_version()
        return self.commit_fragments(frags, metadata)

    def partition_table(self, partition, columns: list[str] | None = None) -> pa.Table:
        """Read only one committed partition's fragments."""
        frags = [f for f in self.manifest()["fragments"] if f["partition"] == partition]
        if not frags:
            raise KeyError(f"partition {partition} not committed in {self.path}")
        paths = [os.path.join(self.path, f["file"]) for f in frags if f["file"]]
        if not paths:
            return pa.table({})  # empty-partition sentinel
        return pa.concat_tables([pq.read_table(p, columns=columns) for p in paths])

    def partition_fragment_paths(self, partitions) -> list[str]:
        """Fragment files of ONLY the given partitions — the
        partition-pruned read an ANN index / key-range scan uses (probed
        buckets are opened; everything else never leaves storage)."""
        ps = set(partitions)
        return [
            os.path.join(self.path, f["file"])
            for f in self.manifest()["fragments"]
            if f["partition"] in ps and f["file"]
        ]

    def completed_partitions(self) -> set:
        return {
            f["partition"]
            for f in self.manifest()["fragments"]
            if f["partition"] is not None
        }

    # -- read path --------------------------------------------------------
    def fragment_paths(self, version: int | None = None) -> list[str]:
        return [
            os.path.join(self.path, f["file"])
            for f in self.manifest(version)["fragments"]
            if f["file"]
        ]

    def to_table(self, version: int | None = None, columns: list[str] | None = None) -> pa.Table:
        paths = self.fragment_paths(version)
        if not paths:
            return pa.table({})
        return pa.concat_tables([pq.read_table(p, columns=columns) for p in paths])

    def count_rows(self, version: int | None = None) -> int:
        return sum(f["rows"] for f in self.manifest(version)["fragments"])

    def read_ray(self, version: int | None = None, columns: list[str] | None = None, **kw):
        """Open as a ray.data.Dataset over the manifest's fragments only
        (uncommitted/garbage fragments are never read)."""
        import ray.data

        paths = self.fragment_paths(version)
        if not paths:
            raise FileNotFoundError(f"empty lancelite table at {self.path}")
        return ray.data.read_parquet(paths, columns=columns, **kw)


def write_ray_partitioned(ds, path: str, partition_col: str, metadata: dict | None = None):
    """Write a ray Dataset to a LanceLiteTable, one fragment per value of
    ``partition_col``, committing each partition atomically (resumable:
    completed partitions are skipped on rerun).

    The per-partition fan-in happens on Ray workers (map_groups writes the
    fragment file); only the tiny manifest commit is serialized on the
    driver, preserving streaming execution for the data itself.

    Concurrency: fragment writes land in a per-writer unique subdir (no
    writer ever deletes another writer's files — a racing loser's fragment
    simply goes unreferenced when ``commit_fragments`` dedups the
    partition) and the manifest commit is atomic.  The startup vacuum of
    unreferenced ``part-*`` dirs only touches dirs whose newest file is
    older than ``VACUUM_MIN_AGE_SEC`` — a LIVE concurrent writer's
    in-flight dir (written seconds ago, committed soon after) is never
    eligible; crashed attempts are reclaimed by any later run.
    """
    import shutil
    import time

    import pandas as pd

    t = LanceLiteTable(path)
    done = t.completed_partitions() if t.exists() else set()
    data_dir = os.path.join(path, "data")
    os.makedirs(data_dir, exist_ok=True)
    # vacuum: drop part-* dirs from crashed attempts whose files never
    # made the manifest (referenced or recently-touched dirs stay)
    referenced = {f["file"] for f in t.manifest()["fragments"] if f["file"]}
    cutoff = time.time() - VACUUM_MIN_AGE_SEC
    for d in os.listdir(data_dir):
        sub = os.path.join(data_dir, d)
        if not (d.startswith("part-") and os.path.isdir(sub)):
            continue
        names = os.listdir(sub)
        keeps = any(os.path.join("data", d, name) in referenced for name in names)
        if keeps:
            continue
        newest = max(
            [os.path.getmtime(sub)]
            + [os.path.getmtime(os.path.join(sub, n)) for n in names],
            default=0,
        )
        if newest < cutoff:
            shutil.rmtree(sub, ignore_errors=True)

    def _write_group(g: pa.Table) -> pa.Table:
        # partition keeps its NATIVE column type in the manifest rows
        # (int partitions must stay int for partition-scan equality)
        pcol = g.column(partition_col).slice(0, 1).combine_chunks()
        part = _py(pcol[0].as_py())
        if part in done:
            return pa.table({"partition": pcol, "file": [""],
                             "rows": pa.array([0], pa.int64())})
        # per-writer unique subdir: never collides with (or deletes) a
        # racing writer's committed fragments; orphans are reclaimed by
        # the next run's vacuum above
        sub = os.path.join("data", f"part-{part}-w{uuid.uuid4().hex[:8]}")
        subdir = os.path.join(path, sub)
        os.makedirs(subdir)
        name = f"frag-{uuid.uuid4().hex}.parquet"
        # Arrow-native: the group's columns (incl. binary / embedding
        # payloads in the ANN index build, this writer's main caller)
        # flow zero-copy to the fragment — no pandas round-trip.
        pq.write_table(g.replace_schema_metadata(None),
                       os.path.join(subdir, name))
        return pa.table({"partition": pcol,
                         "file": [os.path.join(sub, name)],
                         "rows": pa.array([g.num_rows], pa.int64())})

    frag_rows = ds.groupby(partition_col).map_groups(
        _write_group, batch_format="pyarrow").take_all()
    new_frags = [
        {"file": r["file"], "rows": int(r["rows"]), "partition": _py(r["partition"])}
        for r in frag_rows
        if r["file"]
    ]
    # commit_fragments: no-op when nothing new, dedups already-committed
    # partitions (e.g. a racing second writer — whose files we never touch)
    t.commit_fragments(new_frags, metadata)
    return t


def _py(v):
    try:
        return v.item()
    except AttributeError:
        return v
