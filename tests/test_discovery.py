"""Discovery crawl goldens: two-level frontier growth vs the sequential
oracle, plus level resume."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cc_warc_examples_ray import lancelite, oracle, synth
from cc_warc_examples_ray.pipelines.discovery import run_discovery_crawl

N_PAGES = 150
N_IMAGES = 200


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("disc")
    warc = synth.warc_records_table(N_PAGES)
    pages_path = str(d / "pages.parquet")
    pq.write_table(warc.select(["record_url", "mime", "payload"]), pages_path)
    images = lancelite.LanceLiteTable(str(d / "images"))
    images.write(synth.images_table(N_IMAGES))
    # seeds = the page URLs (with a few duplicates appended)
    urls = warc.column("record_url").to_pylist()
    seed_urls = urls + urls[:10]
    seeds = pa.table(
        {
            "seed_url": pa.array(seed_urls, pa.string()),
            "page_url": pa.array([""] * len(seed_urls), pa.string()),
            "seed_rank": pa.array(np.arange(len(seed_urls), dtype=np.int64)),
        }
    )
    robots = synth.robots_table(20)
    return seeds, robots, warc, pages_path, images


def _key(t):
    return list(zip(t.column("epoch").to_pylist(), t.column("url_hash").to_pylist(),
                    t.column("fetch_time_ms").to_pylist()))


def test_discovery_matches_oracle(ray_session, fixtures, tmp_path):
    seeds, robots, warc, pages_path, images = fixtures
    run = run_discovery_crawl(
        seeds, robots, [pages_path], images.fragment_paths(), str(tmp_path / "run"),
        num_shards=3, store_size=N_IMAGES,
    )
    got = run.order_table()
    want = oracle.discovery_oracle(
        seeds, robots, warc.select(["record_url", "mime", "payload"])
    )
    assert _key(got) == _key(want)
    # both levels present; level-1 (media) admitted something
    levels = set(got.column("epoch").to_pylist())
    assert levels == {0, 1}
    n1 = sum(1 for e in got.column("epoch").to_pylist() if e == 1)
    assert n1 > 0
    # fetched images validated
    imgs = run.images_out.to_table()
    assert imgs.num_rows == n1
    assert imgs.to_pandas()["valid"].all()
    # duplicate page seeds were not admitted twice
    lin = run.lineage.to_table().to_pandas()
    adm0 = int(lin[(lin["epoch"] == 0) & (lin["counter"] == "admitted")]["value"].iloc[0])
    assert adm0 <= N_PAGES  # 10 duplicate seeds rejected


def test_discovery_resume_after_level0(ray_session, fixtures, tmp_path):
    seeds, robots, warc, pages_path, images = fixtures
    full = run_discovery_crawl(
        seeds, robots, [pages_path], images.fragment_paths(), str(tmp_path / "full"),
        num_shards=2, store_size=N_IMAGES,
    )
    # simulate a crash after level 0 by replaying level 0 only: run a
    # fresh output dir, then delete nothing — rerun must no-op level 0
    # and produce identical results
    again = run_discovery_crawl(
        seeds, robots, [pages_path], images.fragment_paths(), str(tmp_path / "full"),
        num_shards=2, store_size=N_IMAGES,
    )
    assert _key(full.order_table()) == _key(again.order_table())


def test_discovery_subepochs_match_whole_level(ray_session, fixtures, tmp_path):
    """Forcing many rank-contiguous sub-epochs per level (the bounded-
    driver-metadata scale path) must emit the identical crawl order and
    images as whole-level processing — admission order is global rank
    order either way, and politeness counters persist across sub-epochs."""
    seeds, robots, warc, pages_path, images = fixtures
    whole = run_discovery_crawl(
        seeds, robots, [pages_path], images.fragment_paths(), str(tmp_path / "w"),
        num_shards=3, store_size=N_IMAGES, urls_per_epoch=None,
    )
    sub = run_discovery_crawl(
        seeds, robots, [pages_path], images.fragment_paths(), str(tmp_path / "s"),
        num_shards=3, store_size=N_IMAGES, urls_per_epoch=48,
    )
    assert _key(whole.order_table()) == _key(sub.order_table())
    # many sub-epoch partitions, but the epoch column is still the level
    assert len(sub.state.completed_partitions()) > 4
    assert set(sub.order_table().column("epoch").to_pylist()) == {0, 1}
    iw = whole.images_out.to_table().to_pandas().sort_values("seed_rank")
    isub = sub.images_out.to_table().to_pandas().sort_values("seed_rank")
    assert iw["image_id"].tolist() == isub["image_id"].tolist()
    # lineage admitted totals agree (summed over sub-epochs)
    lw = whole.lineage.to_table().to_pandas()
    ls = sub.lineage.to_table().to_pandas()
    for c in ("admitted", "pages_fetched", "media_extracted"):
        assert (
            lw[lw["counter"] == c]["value"].sum()
            == ls[ls["counter"] == c]["value"].sum()
        )


def test_discovery_subepoch_kill_resume(ray_session, fixtures, tmp_path):
    """Killing mid-level (after some sub-epochs committed) and resuming
    must produce bit-identical order/images without re-running completed
    sub-epochs (the discovered table persists level-0 extraction)."""
    seeds, robots, warc, pages_path, images = fixtures
    full = run_discovery_crawl(
        seeds, robots, [pages_path], images.fragment_paths(), str(tmp_path / "f"),
        num_shards=2, store_size=N_IMAGES, urls_per_epoch=48,
    )
    # crash after sub-epoch 2 (mid level 0), then resume
    with pytest.raises(RuntimeError, match="injected failure"):
        run_discovery_crawl(
            seeds, robots, [pages_path], images.fragment_paths(), str(tmp_path / "k"),
            num_shards=2, store_size=N_IMAGES, urls_per_epoch=48, fail_after_part=2,
        )
    resumed = run_discovery_crawl(
        seeds, robots, [pages_path], images.fragment_paths(), str(tmp_path / "k"),
        num_shards=2, store_size=N_IMAGES, urls_per_epoch=48,
    )
    assert resumed.resume_epoch() > 3  # partitions 0-2 were NOT recomputed
    assert _key(full.order_table()) == _key(resumed.order_table())
    fi = full.images_out.to_table().to_pandas().sort_values("seed_rank")
    ri = resumed.images_out.to_table().to_pandas().sort_values("seed_rank")
    assert fi["image_id"].tolist() == ri["image_id"].tolist()
    # a second no-op resume changes nothing
    again = run_discovery_crawl(
        seeds, robots, [pages_path], images.fragment_paths(), str(tmp_path / "f"),
        num_shards=2, store_size=N_IMAGES, urls_per_epoch=48,
    )
    assert _key(full.order_table()) == _key(again.order_table())


def test_discovery_no_media_pages(ray_session, tmp_path):
    """Pages with zero extractable media: level 1 is a single empty
    sub-epoch (committed, resumable) and the order table has level 0
    only — the empty-frontier path through canonicalize/admit/fetch."""
    urls = [f"http://edge{i}.example.com/page{i}.html" for i in range(20)]
    pages = pa.table(
        {
            "record_url": pa.array(urls),
            "mime": pa.array(["application/http; msgtype=response"] * 20),
            "payload": pa.array(
                [b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello"] * 20,
                pa.binary(),
            ),
        }
    )
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, pages_path)
    seeds = pa.table(
        {
            "seed_url": pa.array(urls),
            "page_url": pa.array([""] * 20),
            "seed_rank": pa.array(np.arange(20, dtype=np.int64)),
        }
    )
    images = lancelite.LanceLiteTable(str(tmp_path / "img"))
    images.write(synth.images_table(50))
    run = run_discovery_crawl(
        seeds, synth.robots_table(5), [pages_path], images.fragment_paths(),
        str(tmp_path / "run"), num_shards=2, store_size=50, urls_per_epoch=8,
    )
    o = run.order_table()
    assert set(o.column("epoch").to_pylist()) == {0}
    assert o.num_rows == 20
    # 3 level-0 sub-epochs + 1 (empty) level-1 sub-epoch, all committed
    assert sorted(run.state.completed_partitions()) == [0, 1, 2, 3]
    assert run.resume_epoch() == 4


def test_discovery_scan_store_mode_parity(ray_session, fixtures, tmp_path):
    """force_scan_pages streams the page store (scan-store join on
    canonical url) and must reproduce the broadcast mode's tables."""
    seeds, robots, warc, pages_path, images = fixtures
    a = run_discovery_crawl(
        seeds, robots, [pages_path], images.fragment_paths(), str(tmp_path / "bc"),
        num_shards=3, store_size=N_IMAGES,
    )
    b = run_discovery_crawl(
        seeds, robots, [pages_path], images.fragment_paths(), str(tmp_path / "scan"),
        num_shards=3, store_size=N_IMAGES, force_scan_pages=True,
    )
    assert _key(a.order_table()) == _key(b.order_table())
    ia = a.images_out.to_table().to_pandas().sort_values("seed_rank").reset_index(drop=True)
    ib = b.images_out.to_table().to_pandas().sort_values("seed_rank").reset_index(drop=True)
    assert ia["image_id"].tolist() == ib["image_id"].tolist()
    # lineage page counters agree across modes
    la = a.lineage.to_table().to_pandas()
    lb = b.lineage.to_table().to_pandas()
    ka = dict(zip(la["counter"], la["value"]))
    kb = dict(zip(lb["counter"], lb["value"]))
    assert ka["pages_fetched"] == kb["pages_fetched"] > 0
