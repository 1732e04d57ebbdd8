"""WARC/1.0 file source + writer (SURVEY.md §2.1 S1-S3).

The reference treats one gzip WARC file as one non-splittable input
split (`/root/reference/src/org/commoncrawl/examples/mapreduce/WARCFileInputFormat.java:29-32`)
surfaced as a single ArchiveReader iterated record-by-record
(`WARCFileRecordReader.java:49-58`, `TagCounterMap.java:36-61`).

Ray-native shape: ``read_binary_files`` (one block per file) →
``map_batches`` parser that walks the WARC record framing and emits one
row per record in the WARC_RECORDS schema
``(record_url, warc_type, mime, payload)``.  The writer exists so tests
and fixtures can produce real ``.warc.gz`` bytes (public ISO 28500
format; headers + Content-Length framing, records separated by CRLFCRLF).
"""

from __future__ import annotations

import gzip
import io

import pyarrow as pa
import ray.data as rd

from ..schemas import WARC_RECORDS

_CRLF = b"\r\n"


def write_warc(records: pa.Table, compress: bool = True) -> bytes:
    """WARC_RECORDS table → one WARC/1.0 file (optionally gzipped)."""
    buf = io.BytesIO()
    for i in range(records.num_rows):
        url = records.column("record_url")[i].as_py() or ""
        wtype = records.column("warc_type")[i].as_py() or "resource"
        mime = records.column("mime")[i].as_py() or "application/octet-stream"
        payload = records.column("payload")[i].as_py() or b""
        buf.write(b"WARC/1.0" + _CRLF)
        buf.write(f"WARC-Type: {wtype}".encode() + _CRLF)
        buf.write(f"WARC-Target-URI: {url}".encode() + _CRLF)
        buf.write(b"WARC-Record-ID: <urn:uuid:" + f"{i:032d}".encode() + b">" + _CRLF)
        buf.write(f"Content-Type: {mime}".encode() + _CRLF)
        buf.write(f"Content-Length: {len(payload)}".encode() + _CRLF)
        buf.write(_CRLF)
        buf.write(payload)
        buf.write(_CRLF + _CRLF)
    data = buf.getvalue()
    return gzip.compress(data) if compress else data


def parse_warc(blob: bytes) -> pa.Table:
    """One WARC file's bytes → WARC_RECORDS rows.  Tolerates gzip or
    plain input; malformed trailing bytes end the scan (lenient)."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    urls, types, mimes, payloads = [], [], [], []
    pos = 0
    n = len(blob)
    while True:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            break
        hdr_end = blob.find(b"\r\n\r\n", start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in blob[start:hdr_end].split(_CRLF)[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.decode("ascii", "replace").strip().lower()] = v.decode(
                    "utf-8", "replace"
                ).strip()
        try:
            length = max(0, int(headers.get("content-length", "0")))
        except ValueError:
            length = 0
        body_start = hdr_end + 4
        if body_start + length > n:
            break
        urls.append(headers.get("warc-target-uri", ""))
        types.append(headers.get("warc-type", ""))
        mimes.append(headers.get("content-type", ""))
        payloads.append(blob[body_start : body_start + length])
        # the scan cursor must strictly advance (a negative/lying
        # Content-Length would otherwise re-find the same header forever)
        pos = max(body_start + length, start + 5)
    return pa.table(
        {
            "record_url": pa.array(urls, pa.string()),
            "warc_type": pa.array(types, pa.string()),
            "mime": pa.array(mimes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        },
        schema=WARC_RECORDS,
    )


def parse_warc_batch(batch: pa.Table) -> pa.Table:
    tables = [parse_warc(b) for b in batch.column("bytes").to_pylist()]
    tables = [t for t in tables if t.num_rows] or [WARC_RECORDS.empty_table()]
    return pa.concat_tables(tables)


def _resolve_uri(p: str, anonymous: bool):
    """URI → (pyarrow filesystem, scheme-less path).  ``anonymous=True``
    on an s3:// URI mirrors the reference's credential-less client
    (JetS3t ``RestS3Service(null)``, `S3ReaderTest.java:19-27`)."""
    from pyarrow import fs as pafs

    if anonymous and p.startswith(("s3://", "s3a://", "s3n://")):
        return pafs.S3FileSystem(anonymous=True), p.split("://", 1)[1]
    return pafs.FileSystem.from_uri(p)


def read_warc_files(paths: str | list[str], *, anonymous: bool = False) -> rd.Dataset:
    """Directory/file list of ``.warc[.gz]`` → WARC_RECORDS Dataset,
    one read block per file (non-splittable-gzip rule).

    Paths may be plain local paths or URIs (``file://``, ``s3://``, …);
    URI directories are expanded via the filesystem's recursive listing,
    so one ``s3://bucket/prefix`` covers the reference's whole-segment
    reads.  All URI paths in one call must share a filesystem.
    """
    import os

    from pyarrow import fs as pafs

    if isinstance(paths, str):
        paths = [paths]
    # validate mixing BEFORE any filesystem I/O: a plain path would be
    # read as a key on a remote URI filesystem (e.g. '/data/x' becomes
    # S3 key 'data/x'), so only local-scheme URIs may accompany them
    if any("://" not in p for p in paths) and any(
        "://" in p and not p.startswith(("file://", "local://")) for p in paths
    ):
        raise ValueError("cannot mix plain local paths with non-local URIs")
    files: list[str] = []
    filesystem = None
    for p in paths:
        if "://" in p:
            fs_, rel = _resolve_uri(p, anonymous)
            # equals(), not type: two s3 buckets can resolve to different
            # clients (region/credentials) that share a type
            if filesystem is not None and not fs_.equals(filesystem):
                raise ValueError("all URI paths must resolve to one filesystem")
            filesystem = fs_
            info = fs_.get_file_info(rel)
            if info.type == pafs.FileType.Directory:
                sel = pafs.FileSelector(rel, recursive=True)
                files.extend(sorted(
                    f.path for f in fs_.get_file_info(sel)
                    if f.type == pafs.FileType.File
                    and f.path.endswith((".warc", ".warc.gz"))
                ))
            else:
                files.append(rel)
        elif os.path.isdir(p):
            for root, dirs, names in os.walk(p):
                dirs.sort()  # deterministic traversal across filesystems
                files.extend(
                    os.path.join(root, x)
                    for x in sorted(names)
                    if x.endswith((".warc", ".warc.gz"))
                )
        else:
            files.append(p)
    if not files:
        raise FileNotFoundError(f"no WARC files under {paths}")
    ds = rd.read_binary_files(
        files, include_paths=True, filesystem=filesystem,
        override_num_blocks=len(files),
    )
    return ds.map_batches(parse_warc_batch, batch_format="pyarrow")
