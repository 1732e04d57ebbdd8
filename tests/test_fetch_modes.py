"""Parity between the two fetch strategies (broadcast-store vs
scan-store) and fetch-miss semantics."""

import numpy as np
import pyarrow as pa
import pytest

from cc_warc_examples_ray import lancelite, synth
from cc_warc_examples_ray.stages import fetch


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("store")
    t = lancelite.LanceLiteTable(str(d / "images"))
    t.write(synth.images_table(50))
    return t


def _admitted(n=30, miss=2):
    ids = [f"img-{i:010d}" for i in range(n)] + [f"img-{9_000_000 + i:010d}" for i in range(miss)]
    m = n + miss
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "fetch_time_ms": pa.array(np.arange(m, dtype=np.int64)),
            "host_index": pa.array(np.zeros(m, dtype=np.int64)),
            "seed_rank": pa.array(np.arange(m, dtype=np.int64)),
            "url": pa.array([f"http://h/{i}" for i in range(m)]),
            "url_hash": pa.array(np.arange(m, dtype=np.int64)),
            "host": pa.array(["h"] * m),
            "epoch": pa.array(np.zeros(m, dtype=np.int64)),
        }
    )


def test_broadcast_scan_parity(ray_session, store):
    adm = _admitted(miss=0)
    b = fetch.fetch_broadcast_store(store.fragment_paths(), adm).to_pandas()
    s = fetch.fetch_scan_store(store.fragment_paths(), adm).to_pandas()
    b = b.sort_values("seed_rank").reset_index(drop=True)
    s = s.sort_values("seed_rank").reset_index(drop=True)
    assert len(b) == len(s) == adm.num_rows
    assert b["image_id"].tolist() == s["image_id"].tolist()
    assert (b["bytes"] == s["bytes"]).all()
    assert b["caption"].tolist() == s["caption"].tolist()


def test_scan_mode_empty_admitted(ray_session, store):
    """An all-duplicate epoch admits 0 rows: scan mode must emit 0 rows,
    not crash (pa.array([]) is null-typed and pc.is_in raises against a
    string store column)."""
    adm = _admitted(n=0, miss=0)
    out = fetch.fetch_scan_store(store.fragment_paths(), adm).to_pandas()
    assert len(out) == 0
    b = fetch.fetch_broadcast_store(store.fragment_paths(), adm).to_pandas()
    assert len(b) == 0  # mode parity on the empty epoch


def test_broadcast_keeps_fetch_misses(ray_session, store):
    from cc_warc_examples_ray.stages.decode import DecodeValidate

    adm = _admitted(n=10, miss=3)
    fetched = fetch.fetch_broadcast_store(store.fragment_paths(), adm)
    # every admitted URL appears; misses carry null payloads — decode
    # stays in Arrow (a pandas round-trip would degrade nullable int64
    # phash to lossy float64)
    v = fetched.map_batches(
        DecodeValidate(min_dim=100), batch_format="pyarrow"
    ).to_pandas()
    assert len(v) == 13
    miss_mask = v["image_id"].str.startswith("img-0009").values
    assert miss_mask.sum() == 3
    assert (~v.loc[miss_mask, "decode_ok"]).all()
    assert (~v.loc[miss_mask, "valid"]).all()
    assert v.loc[~miss_mask, "valid"].all()


def test_same_content_many_urls(ray_session, store):
    """Several admitted URLs resolving to ONE store row each get their
    own fetched row (the bug class found in round 1)."""
    ids = ["img-0000000003"] * 4
    adm = pa.table(
        {
            "image_id": pa.array(ids),
            "fetch_time_ms": pa.array(np.arange(4, dtype=np.int64)),
            "host_index": pa.array(np.zeros(4, dtype=np.int64)),
            "seed_rank": pa.array(np.arange(4, dtype=np.int64)),
            "url": pa.array([f"http://h/{i}" for i in range(4)]),
            "url_hash": pa.array(np.arange(4, dtype=np.int64)),
            "host": pa.array(["h"] * 4),
            "epoch": pa.array(np.zeros(4, dtype=np.int64)),
        }
    )
    b = fetch.fetch_broadcast_store(store.fragment_paths(), adm).to_pandas()
    s = fetch.fetch_scan_store(store.fragment_paths(), adm).to_pandas()
    assert len(b) == 4 and len(s) == 4
    assert sorted(b["seed_rank"]) == [0, 1, 2, 3]
    assert sorted(s["seed_rank"]) == [0, 1, 2, 3]


def test_scan_mode_keeps_fetch_misses(ray_session, store):
    """Scan mode emits miss rows with null payloads too — fetched-row
    count and lineage counters must not depend on fetch mode."""
    adm = _admitted(n=10, miss=3)
    b = fetch.fetch_broadcast_store(store.fragment_paths(), adm).to_pandas()
    s = fetch.fetch_scan_store(store.fragment_paths(), adm).to_pandas()
    b = b.sort_values("seed_rank").reset_index(drop=True)
    s = s.sort_values("seed_rank").reset_index(drop=True)
    assert len(s) == len(b) == 13
    assert b["image_id"].tolist() == s["image_id"].tolist()
    miss = s["image_id"].str.startswith("img-0009").values
    assert miss.sum() == 3
    assert s.loc[miss, "bytes"].isna().all()
    assert (b["bytes"].isna() == s["bytes"].isna()).all()


def test_scan_reuse_store_parity_and_cache(ray_session, store):
    """reuse_store materializes the store scan once and re-maps the
    cached blocks on later calls — results must be identical to the
    fresh-read path, and the second call must hit the cache."""
    adm = _admitted(n=20, miss=2)
    fresh = fetch.fetch_scan_store(store.fragment_paths(), adm).to_pandas()
    fetch._SCAN_STORE_DS_CACHE.clear()
    r1 = fetch.fetch_scan_store(
        store.fragment_paths(), adm, reuse_store=True
    ).to_pandas()
    assert len(fetch._SCAN_STORE_DS_CACHE) == 1
    cached_ds = next(iter(fetch._SCAN_STORE_DS_CACHE.values()))
    r2 = fetch.fetch_scan_store(
        store.fragment_paths(), adm, reuse_store=True
    ).to_pandas()
    # same object survived — the store parquet was scanned once
    assert next(iter(fetch._SCAN_STORE_DS_CACHE.values())) is cached_ds
    for df in (fresh, r1, r2):
        df.sort_values("seed_rank", inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert r1["image_id"].tolist() == fresh["image_id"].tolist()
    assert r2["image_id"].tolist() == fresh["image_id"].tolist()
    assert (r1["bytes"].isna() == fresh["bytes"].isna()).all()
    assert (r1["bytes"].dropna() == fresh["bytes"].dropna()).all()


def test_scan_block_pruning(ray_session, store):
    """With reuse_store, an epoch touching a narrow id range must map
    over only the store blocks whose [min,max] range intersects it —
    and produce exactly the unpruned result (misses included)."""
    ids = [f"img-{i:010d}" for i in (2, 3, 4)] + ["img-9000000000"]
    m = len(ids)
    adm = pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "fetch_time_ms": pa.array(np.arange(m, dtype=np.int64)),
            "host_index": pa.array(np.zeros(m, dtype=np.int64)),
            "seed_rank": pa.array(np.arange(m, dtype=np.int64)),
            "url": pa.array([f"http://h/{i}" for i in range(m)]),
            "url_hash": pa.array(np.arange(m, dtype=np.int64)),
            "host": pa.array(["h"] * m),
            "epoch": pa.array(np.zeros(m, dtype=np.int64)),
        }
    )
    fetch._SCAN_STORE_DS_CACHE.clear()
    fetch._SCAN_BLOCK_RANGE_CACHE.clear()
    fresh = fetch.fetch_scan_store(
        store.fragment_paths(), adm, num_blocks=8
    ).to_pandas()
    pruned = fetch.fetch_scan_store(
        store.fragment_paths(), adm, num_blocks=8, reuse_store=True
    ).to_pandas()
    st = fetch._SCAN_PRUNE_STATS
    assert st["blocks_total"] >= 4  # the 50-row store really split
    assert 0 < st["blocks_kept"] < st["blocks_total"]
    fresh = fresh.sort_values("seed_rank").reset_index(drop=True)
    pruned = pruned.sort_values("seed_rank").reset_index(drop=True)
    assert pruned["image_id"].tolist() == fresh["image_id"].tolist()
    assert (pruned["bytes"].isna() == fresh["bytes"].isna()).all()
    assert (pruned["bytes"].dropna() == fresh["bytes"].dropna()).all()


def test_crawl_scan_mode_parity(ray_session, store, tmp_path):
    """Multi-epoch crawl in forced scan mode (reuse_store engaged) must
    produce the exact crawl-order table of broadcast mode — fetch mode
    is an execution strategy, never a semantics knob."""
    from cc_warc_examples_ray import synth
    from cc_warc_examples_ray.pipelines.crawl import run_crawl

    seeds = synth.frontier_seeds_table(300, n_hosts=10)
    robots = synth.robots_table(10)
    kw = dict(num_shards=2, num_epochs=3, store_size=50, concurrency=(1, 2))
    rb = run_crawl(seeds, robots, store.fragment_paths(),
                   str(tmp_path / "bcast"), **kw)
    rs = run_crawl(seeds, robots, store.fragment_paths(),
                   str(tmp_path / "scan"), force_scan=True, **kw)
    tb, ts = rb.order_table(), rs.order_table()
    assert tb.column("url_hash").to_pylist() == ts.column("url_hash").to_pylist()
    assert tb.column("fetch_time_ms").to_pylist() == ts.column("fetch_time_ms").to_pylist()
    ib = rb.images_out.to_table().sort_by("image_id")
    is_ = rs.images_out.to_table().sort_by("image_id")
    assert ib.column("image_id").to_pylist() == is_.column("image_id").to_pylist()
    assert ib.column("valid").to_pylist() == is_.column("valid").to_pylist()


def test_add_image_ids_matches_scalar_on_edge_keys():
    """The vectorized id derivation must agree with image_key_from_path
    on every shape: normal keys, >int64 digit runs (no ArrowInvalid),
    regex misses, and mixes (no float64 rounding of matched keys)."""
    store_size = 1000
    paths = [
        "/img/i123.png",                       # normal
        "/img/i99999999999999999999.jpg",      # 20 digits: > int64
        "/img/i1234567890123456789.jpg",       # 19 digits: > 18-char gate
        "/watch",                              # regex miss -> hash
        "/img/p0042.gif",                      # p-prefixed
    ]
    t = pa.table({"path": pa.array(paths, pa.string())})
    got = fetch.add_image_ids(t, store_size).column("image_id").to_pylist()
    want = [f"img-{fetch.image_key_from_path(p, store_size):010d}" for p in paths]
    assert got == want
