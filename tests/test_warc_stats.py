"""Tests for the WARC file source (S1-S3) and statistics reporting (S12)."""

import pyarrow as pa
import pytest
import ray.data as rd

from cc_warc_examples_ray import synth
from cc_warc_examples_ray.ops import stats_report
from cc_warc_examples_ray.pipelines import classics
from cc_warc_examples_ray.sources import warc


def test_warc_roundtrip(tmp_path):
    t = synth.warc_records_table(40)
    data = warc.write_warc(t, compress=False)
    back = warc.parse_warc(data)
    assert back.num_rows == 40
    assert back.column("record_url").to_pylist() == t.column("record_url").to_pylist()
    assert back.column("mime").to_pylist() == t.column("mime").to_pylist()
    assert back.column("payload").to_pylist() == t.column("payload").to_pylist()
    # gzip variant too
    gz = warc.write_warc(t, compress=True)
    assert warc.parse_warc(gz).num_rows == 40


def test_read_warc_files_pipeline(ray_session, tmp_path):
    t = synth.warc_records_table(60)
    half = t.slice(0, 30), t.slice(30, 30)
    for i, part in enumerate(half):
        (tmp_path / f"part-{i}.warc.gz").write_bytes(warc.write_warc(part))
    ds = warc.read_warc_files(str(tmp_path))
    assert ds.count() == 60
    # classic pipeline over real WARC files equals the table path
    via_files = classics.tag_counts(ds).to_pandas().sort_values("tag").reset_index(drop=True)
    via_table = classics.tag_counts(rd.from_arrow(t)).to_pandas().sort_values("tag").reset_index(drop=True)
    assert via_files.equals(via_table)


def test_truncated_warc_lenient():
    t = synth.warc_records_table(5)
    data = warc.write_warc(t, compress=False)
    cut = warc.parse_warc(data[: len(data) - len(data) // 3])
    assert 0 < cut.num_rows < 5  # trailing garbage ends the scan, no raise


def test_statistics_report(ray_session, tmp_path):
    from cc_warc_examples_ray import lancelite
    from cc_warc_examples_ray.pipelines.crawl import run_crawl

    store = lancelite.LanceLiteTable(str(tmp_path / "images"))
    store.write(synth.images_table(60))
    run = run_crawl(
        synth.frontier_seeds_table(200, n_hosts=10), synth.robots_table(10),
        store.fragment_paths(), str(tmp_path / "run"),
        num_shards=2, num_epochs=2, store_size=60,
    )
    rep = stats_report.statistics_report(run)
    assert "admitted" in rep and "epoch 0" in rep and "top hosts" in rep

    freqs = stats_report.host_frequencies(run.crawl_order.read_ray()).to_pandas()
    assert freqs["cnt"].sum() == run.crawl_order.to_table().num_rows
    assert set(freqs["kind"]) <= {"webpage", "image", "video"}


def test_read_warc_files_uri_scheme(ray_session, tmp_path):
    """S4 analog: read_binary_files through a URI scheme string (the
    S3ReaderTest.java path shape) — file:// resolves via the same
    pyarrow/fsspec filesystem dispatch the anonymous-S3 path uses."""
    t = synth.warc_records_table(20)
    p = tmp_path / "remote.warc.gz"
    p.write_bytes(warc.write_warc(t))
    ds = warc.read_warc_files(f"file://{p}")
    assert ds.count() == 20
    urls = sorted(ds.to_pandas()["record_url"])
    assert urls == sorted(t.column("record_url").to_pylist())


def test_resolve_uri_anonymous_s3():
    """anonymous=True on an s3:// URI builds a credential-less
    S3FileSystem and strips the scheme (no network touched)."""
    from pyarrow import fs as pafs

    from cc_warc_examples_ray.sources.warc import _resolve_uri

    fs_, rel = _resolve_uri("s3://bucket/seg/x.warc.gz", anonymous=True)
    assert isinstance(fs_, pafs.S3FileSystem)
    assert rel == "bucket/seg/x.warc.gz"


def test_read_warc_files_rejects_mixed_filesystems(tmp_path):
    """Plain local paths mixed with a non-local URI must be rejected —
    the local path would otherwise be read as a key on the URI
    filesystem (e.g. '/data/x' as S3 key 'data/x')."""
    p = tmp_path / "a.warc.gz"
    p.write_bytes(b"")
    with pytest.raises(ValueError, match="mix plain local"):
        warc.read_warc_files([str(p), "s3://bucket/seg/b.warc.gz"])


def test_read_warc_files_uri_directory(ray_session, tmp_path):
    """A scheme'd DIRECTORY URI (the s3://bucket/prefix shape) expands
    via the filesystem's recursive listing: only .warc[.gz] files, one
    block per file, deterministic order."""
    t = synth.warc_records_table(30)
    d = tmp_path / "seg" / "inner"
    d.mkdir(parents=True)
    (d / "a.warc.gz").write_bytes(warc.write_warc(t.slice(0, 10)))
    (tmp_path / "seg" / "b.warc.gz").write_bytes(warc.write_warc(t.slice(10, 20)))
    (tmp_path / "seg" / "ignore.txt").write_bytes(b"not a warc")
    ds = warc.read_warc_files(f"file://{tmp_path}/seg")
    assert ds.count() == 30
    urls = sorted(ds.to_pandas()["record_url"])
    assert urls == sorted(t.column("record_url").to_pylist())


def test_parse_warc_negative_content_length_terminates():
    """A lying negative Content-Length must not rewind the scan cursor
    (previously an infinite row-appending loop)."""
    blob = (b"WARC/1.0\r\nWARC-Type: resource\r\n"
            b"WARC-Target-URI: http://x/a\r\nContent-Length: -9999\r\n\r\n"
            b"WARC/1.0\r\nWARC-Type: resource\r\n"
            b"WARC-Target-URI: http://x/b\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
    t = warc.parse_warc(blob)
    assert t.num_rows == 2
    assert t.column("record_url").to_pylist() == ["http://x/a", "http://x/b"]
