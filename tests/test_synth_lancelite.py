import numpy as np
import pyarrow as pa

from cc_warc_examples_ray import imagecodec, lancelite, schemas, synth


def test_images_table_deterministic_and_valid():
    t = synth.images_table(60)
    assert t.schema.equals(schemas.IMAGES)
    assert t.equals(synth.images_table(60))
    # per-row invariant: lossless exact, lossy PSNR>=40, dims match
    for i in range(0, 60, 7):
        r = {c: t.column(c)[i].as_py() for c in t.column_names}
        img = imagecodec.decode(r["bytes"], r["fmt"])
        assert img.shape == (r["h"], r["w"], 3)
        assert imagecodec.probe(r["bytes"], r["fmt"]) == (r["w"], r["h"])


def test_frontier_and_robots_deterministic():
    s = synth.frontier_seeds_table(500)
    assert s.schema.equals(schemas.FRONTIER_SEEDS)
    assert s.equals(synth.frontier_seeds_table(500))
    r = synth.robots_table(20)
    assert r.schema.equals(schemas.ROBOTS)
    urls = s.column("seed_url").to_pylist()
    assert any(u.startswith("../") for u in urls)  # relative URLs present
    assert any(" " in u for u in urls)  # embedded whitespace present
    assert any("www." in u for u in urls)


def test_warc_records_mix():
    t = synth.warc_records_table(150)
    assert t.schema.equals(schemas.WARC_RECORDS)
    mimes = set(t.column("mime").to_pylist())
    assert "application/http; msgtype=response" in mimes
    assert "text/plain" in mimes
    assert "application/json" in mimes


def test_lancelite_versioning(tmp_path):
    t = lancelite.LanceLiteTable(str(tmp_path / "tbl"))
    assert not t.exists()
    tab1 = pa.table({"a": [1, 2, 3]})
    v1 = t.write(tab1)
    assert v1 == 1 and t.count_rows() == 3
    v2 = t.write(pa.table({"a": [4]}), mode="append")
    assert v2 == 2 and t.count_rows() == 4
    assert t.to_table(version=1).num_rows == 3  # time travel
    assert t.to_table().column("a").to_pylist() == [1, 2, 3, 4]


def test_lancelite_partition_idempotent(tmp_path):
    t = lancelite.LanceLiteTable(str(tmp_path / "tbl"))
    t.append_partition(pa.table({"a": [1]}), partition=0)
    t.append_partition(pa.table({"a": [2]}), partition=1)
    v = t.latest_version()
    t.append_partition(pa.table({"a": [99]}), partition=0)  # no-op: done
    assert t.latest_version() == v
    assert sorted(t.to_table().column("a").to_pylist()) == [1, 2]
    assert t.completed_partitions() == {0, 1}


def test_write_ray_partitioned_never_deletes_committed(tmp_path, ray_session):
    """A second write_ray_partitioned call (new partitions) must leave the
    first call's committed fragment FILES on disk (per-writer unique
    subdirs — no rmtree of a racer's data), while the startup vacuum
    reclaims orphan part-* dirs whose files never made the manifest."""
    import os

    import ray.data as rd

    path = str(tmp_path / "tbl")
    t1 = lancelite.write_ray_partitioned(
        rd.from_arrow(pa.table({"p": [0, 0, 1], "v": [1, 2, 3]})), path, "p")
    first_files = [os.path.join(path, f["file"])
                   for f in t1.manifest()["fragments"] if f["file"]]
    assert first_files and all(os.path.exists(p) for p in first_files)

    # orphan dir from a "crashed attempt": has a file, not in the manifest,
    # OLD enough to pass the live-writer age guard; plus a FRESH orphan
    # that must survive (could be a live concurrent writer's in-flight dir)
    orphan = os.path.join(path, "data", "part-9-wdeadbeef")
    os.makedirs(orphan)
    gfile = os.path.join(orphan, "frag-garbage.parquet")
    with open(gfile, "w") as f:
        f.write("junk")
    old = 1_000_000_000
    os.utime(orphan, (old, old))
    os.utime(gfile, (old, old))
    fresh = os.path.join(path, "data", "part-8-wlivewrtr")
    os.makedirs(fresh)
    with open(os.path.join(fresh, "frag-inflight.parquet"), "w") as f:
        f.write("inflight")

    t2 = lancelite.write_ray_partitioned(
        rd.from_arrow(pa.table({"p": [1, 2], "v": [30, 4]})), path, "p")
    # committed files from writer 1 still exist and still read back
    assert all(os.path.exists(p) for p in first_files)
    assert not os.path.exists(orphan)  # aged-out crashed attempt reclaimed
    assert os.path.exists(fresh)  # possible live writer: left alone
    got = sorted(t2.to_table().column("v").to_pylist())
    assert got == [1, 2, 3, 4]  # partition 1 kept writer 1's rows
    assert t2.completed_partitions() == {0, 1, 2}


def test_write_partition_files_multi(tmp_path, ray_session):
    """One streaming pass routes rows to per-partition fragment dirs;
    already-committed partitions are excluded; empty requested
    partitions get a committed-marker sentinel."""
    import ray.data as rd

    from cc_warc_examples_ray import lancelite

    t = lancelite.LanceLiteTable(str(tmp_path / "t"))
    pre = pa.table({"epoch": pa.array([1, 1], pa.int64()),
                    "v": pa.array([100, 101], pa.int64())})
    t.append_partition(pre, 1)  # partition 1 already committed

    src = pa.table({
        "epoch": pa.array([0, 0, 2, 1, 0], pa.int64()),
        "v": pa.array([10, 11, 20, 999, 12], pa.int64()),
    })
    ds = rd.from_arrow([src.slice(0, 3), src.slice(3, 2)])
    frags_by = t.write_partition_files_multi(ds, "epoch", [0, 1, 2, 3])
    # committed partition 1 excluded; its rows dropped, not rewritten
    assert set(frags_by) == {0, 2, 3}
    for p in (0, 2):
        t.commit_fragments(frags_by[p])
    t.commit_fragments(frags_by[3])
    assert t.completed_partitions() == {0, 1, 2, 3}
    assert sorted(t.partition_table(0).column("v").to_pylist()) == [10, 11, 12]
    assert t.partition_table(2).column("v").to_pylist() == [20]
    assert t.partition_table(1).column("v").to_pylist() == [100, 101]  # untouched
    assert t.partition_table(3).num_rows == 0  # empty sentinel
    # a second multi-write over everything is a full no-op
    assert t.write_partition_files_multi(ds, "epoch", [0, 1, 2, 3]) == {}


def test_fsspec_http_import_is_stable_under_threads():
    """Regression: Ray's write_parquet path imports
    fsspec.implementations.http on EVERY write and catches only
    ModuleNotFoundError; with aiohttp absent, two writer threads racing
    the always-failing import could surface a plain ImportError
    (half-initialized module) that killed ~1-in-5 streaming runs.
    lancelite installs a sentinel stub at import — the from-import must
    now succeed from any number of threads."""
    import threading

    import cc_warc_examples_ray.lancelite  # noqa: F401  (installs stub)

    errs: list = []

    def imp():
        try:
            from fsspec.implementations.http import HTTPFileSystem  # noqa
        except Exception as exc:  # pragma: no cover
            errs.append(exc)

    ts = [threading.Thread(target=imp) for _ in range(32)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
