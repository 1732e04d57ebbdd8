"""End-to-end crawl golden tests (SURVEY.md §5 b/c/d): crawl order +
URL-seen set vs the single-process oracle, per-row decode validation,
and kill/resume."""

import numpy as np
import pyarrow as pa
import pytest

from cc_warc_examples_ray import lancelite, oracle, synth
from cc_warc_examples_ray.pipelines.crawl import run_crawl

N_SEEDS = 600
N_IMAGES = 400
N_HOSTS = 20


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("store")
    t = lancelite.LanceLiteTable(str(d / "images"))
    t.write(synth.images_table(N_IMAGES))
    return t


@pytest.fixture(scope="module")
def fixtures():
    return synth.frontier_seeds_table(N_SEEDS, n_hosts=N_HOSTS), synth.robots_table(N_HOSTS)


def _order_key(t: pa.Table):
    return list(
        zip(
            t.column("epoch").to_pylist(),
            t.column("fetch_time_ms").to_pylist(),
            t.column("seed_rank").to_pylist(),
        )
    )


def test_crawl_empty_epochs_commit(ray_session, store, fixtures, tmp_path):
    """More epochs than seeds: empty epochs must still commit their
    state/images partitions, otherwise resume_epoch's contiguous scan
    stalls at the gap and every rerun recomputes the whole crawl."""
    _, robots = fixtures
    seeds = synth.frontier_seeds_table(2, n_hosts=3)
    out = str(tmp_path / "tiny")
    run = run_crawl(seeds, robots, store.fragment_paths(), out,
                    num_shards=2, num_epochs=4, store_size=N_IMAGES,
                    concurrency=(1, 2))
    assert run.resume_epoch() == 4  # every epoch committed, incl. empties
    order1 = _order_key(run.order_table())
    # rerun on the completed dir: a no-op resume, identical output
    run2 = run_crawl(seeds, robots, store.fragment_paths(), out,
                     num_shards=2, num_epochs=4, store_size=N_IMAGES,
                     concurrency=(1, 2))
    assert _order_key(run2.order_table()) == order1


def test_crawl_matches_oracle(ray_session, store, fixtures, tmp_path):
    seeds, robots = fixtures
    run = run_crawl(
        seeds, robots, store.fragment_paths(), str(tmp_path / "run"),
        num_shards=3, num_epochs=3, store_size=N_IMAGES, concurrency=(1, 2),
    )
    got = run.order_table()
    want = oracle.crawl_oracle(seeds, robots, num_epochs=3)
    # URL-seen set identical
    assert set(got.column("url_hash").to_pylist()) == set(want.column("url_hash").to_pylist())
    # crawl order identical (sequence of url_hashes in schedule order)
    assert got.column("url_hash").to_pylist() == want.column("url_hash").to_pylist()
    assert got.column("fetch_time_ms").to_pylist() == want.column("fetch_time_ms").to_pylist()
    assert got.column("host_index").to_pylist() == want.column("host_index").to_pylist()
    # politeness: per-host fetch times are spaced by >= crawl_delay
    import collections

    delays = dict(zip(robots.column("host").to_pylist(), robots.column("crawl_delay_ms").to_pylist()))
    per_host = collections.defaultdict(list)
    for h, ft in zip(got.column("host").to_pylist(), got.column("fetch_time_ms").to_pylist()):
        per_host[h].append(ft)
    for h, fts in per_host.items():
        diffs = np.diff(sorted(fts))
        if delays.get(h, 150) > 0 and len(diffs):
            assert (diffs >= delays[h]).all()

    # robots: no disallowed (host, path) was fetched
    dis_hosts = {
        h
        for h, p in zip(
            robots.column("host").to_pylist(),
            robots.column("disallow_prefixes").to_pylist(),
        )
        if p
    }
    assert not any(
        h in dis_hosts and "/private/" in u
        for h, u in zip(got.column("host").to_pylist(), got.column("url").to_pylist())
    )


def test_crawl_decode_validation(ray_session, store, fixtures, tmp_path):
    seeds, robots = fixtures
    run = run_crawl(
        seeds, robots, store.fragment_paths(), str(tmp_path / "run"),
        num_shards=2, num_epochs=2, store_size=N_IMAGES, concurrency=(1, 2),
    )
    imgs = run.images_out.to_table()
    # one fetched+validated row per admitted URL, exactly
    assert imgs.num_rows == run.crawl_order.to_table().num_rows
    # every fetched row decoded and validated against the reference pixels
    assert pa.compute.all(imgs.column("valid")).as_py()
    # lineage counters present and consistent
    lin = run.lineage.to_table()
    counters = {
        (e, c): v
        for e, c, v in zip(
            lin.column("epoch").to_pylist(),
            lin.column("counter").to_pylist(),
            lin.column("value").to_pylist(),
        )
    }
    total_admitted = sum(v for (e, c), v in counters.items() if c == "admitted")
    assert total_admitted == run.crawl_order.to_table().num_rows
    assert sum(v for (e, c), v in counters.items() if c == "seeds_in") == N_SEEDS


def test_crawl_kill_resume(ray_session, store, fixtures, tmp_path):
    seeds, robots = fixtures
    kw = dict(num_shards=2, num_epochs=4, store_size=N_IMAGES, concurrency=(1, 2))
    ref = run_crawl(seeds, robots, store.fragment_paths(), str(tmp_path / "ref"), **kw)

    with pytest.raises(RuntimeError, match="injected failure"):
        run_crawl(
            seeds, robots, store.fragment_paths(), str(tmp_path / "killed"),
            fail_after_epoch=1, **kw,
        )
    resumed = run_crawl(seeds, robots, store.fragment_paths(), str(tmp_path / "killed"), **kw)
    assert resumed.resume_epoch() == 4  # all epochs committed

    a, b = ref.order_table(), resumed.order_table()
    assert a.column("url_hash").to_pylist() == b.column("url_hash").to_pylist()
    assert a.column("fetch_time_ms").to_pylist() == b.column("fetch_time_ms").to_pylist()
    ia = ref.images_out.to_table().sort_by("image_id")
    ib = resumed.images_out.to_table().sort_by("image_id")
    assert ia.column("image_id").to_pylist() == ib.column("image_id").to_pylist()
    assert ia.column("valid").to_pylist() == ib.column("valid").to_pylist()


def test_epoch_loop_failure_drains_committer(ray_session, tmp_path, monkeypatch):
    """If the epoch loop raises (not via fail_after_epoch), the committer
    thread must still get StopIteration: already-submitted epochs commit
    and the process can exit (no blocked non-daemon thread)."""
    import pytest as _pytest

    import cc_warc_examples_ray.pipelines.crawl as cp
    from cc_warc_examples_ray import lancelite, synth

    store = lancelite.LanceLiteTable(str(tmp_path / "imgs"))
    store.write(synth.images_table(60))
    seeds = synth.frontier_seeds_table(300, n_hosts=10)
    robots = synth.robots_table(10)

    calls = {"n": 0}
    real = cp.add_image_ids

    def flaky(tbl, n):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise ValueError("boom in epoch loop")
        return real(tbl, n)

    monkeypatch.setattr(cp, "add_image_ids", flaky)
    out = str(tmp_path / "run")
    with _pytest.raises(ValueError, match="boom"):
        cp.run_crawl(seeds, robots, store.fragment_paths(), out,
                     num_shards=2, num_epochs=3, store_size=60)
    # epoch 0 was in flight when the loop raised; the finally-drain must
    # have committed it (images + state), so a resume starts at epoch 1
    assert cp.CrawlRun(out).resume_epoch() == 1


def test_crawl_one_pass_scan_kill_resume(ray_session, store, fixtures, tmp_path):
    """Scan-mode ONE-PASS fetch (one store scan serves every epoch):
    kill after epoch 1 commits exactly epochs 0-1; the resumed run's
    tables are bit-identical to broadcast mode's; and the per-epoch
    scan path (one_pass=False) agrees too — fetch strategy is an
    execution knob, never semantics."""
    from cc_warc_examples_ray.pipelines.crawl import CrawlRun

    seeds, robots = fixtures
    kw = dict(num_shards=2, num_epochs=4, store_size=N_IMAGES, concurrency=(1, 2))
    ref = run_crawl(seeds, robots, store.fragment_paths(), str(tmp_path / "ref"), **kw)

    with pytest.raises(RuntimeError, match="injected failure"):
        run_crawl(seeds, robots, store.fragment_paths(), str(tmp_path / "op"),
                  force_scan=True, fail_after_epoch=1, **kw)
    assert CrawlRun(str(tmp_path / "op")).resume_epoch() == 2  # epochs 0-1 committed
    resumed = run_crawl(seeds, robots, store.fragment_paths(), str(tmp_path / "op"),
                        force_scan=True, **kw)
    assert resumed.resume_epoch() == 4
    per_epoch = run_crawl(seeds, robots, store.fragment_paths(), str(tmp_path / "pe"),
                          force_scan=True, one_pass=False, **kw)

    ia = ref.images_out.to_table().sort_by("image_id")
    for other in (resumed, per_epoch):
        a, b = ref.order_table(), other.order_table()
        assert a.column("url_hash").to_pylist() == b.column("url_hash").to_pylist()
        assert a.column("fetch_time_ms").to_pylist() == b.column("fetch_time_ms").to_pylist()
        ib = other.images_out.to_table().sort_by("image_id")
        assert ia.column("image_id").to_pylist() == ib.column("image_id").to_pylist()
        assert ia.column("valid").to_pylist() == ib.column("valid").to_pylist()
