"""Streaming (heap-emitted) crawl mode: schedule equivalence with the
analytic batch pipeline on identical input."""

import pytest

from cc_warc_examples_ray import lancelite, synth
from cc_warc_examples_ray.pipelines.crawl import run_crawl
from cc_warc_examples_ray.pipelines.streaming import run_streaming_crawl


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("sc")
    store = lancelite.LanceLiteTable(str(d / "images"))
    store.write(synth.images_table(120))
    return synth.frontier_seeds_table(400, n_hosts=15), synth.robots_table(15), store


def _schedule(t):
    df = t.to_pandas().sort_values(["fetch_time_ms", "seed_rank"])
    return list(zip(df["fetch_time_ms"], df["seed_rank"], df["url_hash"], df["host_index"]))


def test_streaming_matches_batch_schedule(ray_session, fixtures, tmp_path):
    seeds, robots, store = fixtures
    batch = run_crawl(
        seeds, robots, store.fragment_paths(), str(tmp_path / "batch"),
        num_shards=3, num_epochs=1, store_size=120,
    )
    stream = run_streaming_crawl(
        seeds, robots, store.fragment_paths(), str(tmp_path / "stream"),
        num_shards=3, store_size=120, batch_urls=64,
    )
    sb = _schedule(batch.crawl_order.to_table())
    ss = _schedule(stream.crawl_order.to_table())
    assert sb == ss  # heap-emitted schedule == analytic schedule

    # per-shard round emissions are nondecreasing in virtual time within
    # each round sequence: round r's minimum t >= 0 and images all valid
    imgs = stream.images_out.to_table()
    assert imgs.num_rows == len(ss)
    assert imgs.to_pandas()["valid"].all()
