"""Fetch stage: resolve admitted frontier URLs against the image content
store (the Lance-style ``images`` table — the driver's input_hint shape).

The reference fetches with a 100-thread HTTP pool
(`/root/reference/src/org/commoncrawl/mklab/analysis/ProcessingService.java:44-49,329-388`).
This sandbox has no network, so "fetch" = lookup in the deterministic
content-store table: a **broadcast semi-join** — the admitted frontier
epoch (small side: ids + schedule metadata, no payloads) is ``ray.put``
once and each store batch filters/merges against it inside
``map_batches``.  The big side (image ``bytes``) streams straight from
parquet and is never shuffled (SURVEY.md §7 "Hard parts": never shuffle
bytes).  For epochs too large to broadcast, use
:func:`cc_warc_examples_ray.ops.joins.hash_join` (bucketed partitioned
join) on ``image_id`` instead — same semantics, all-to-all exchange.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

_KEY_RE = re.compile(r"[ip](\d+)\.[A-Za-z0-9]+$")


def image_key_from_path(path: str, store_size: int) -> int:
    """Map a canonical URL path to its content-store row key.

    The synthetic frontier encodes the key in the last path segment
    (``/img/i123.png`` → 123); unknown shapes hash into the store range
    so every admitted URL resolves to some content (a stand-in for the
    real fetch always returning *something*)."""
    m = _KEY_RE.search(path)
    if m:
        return int(m.group(1)) % store_size
    return hash(path) % store_size


def add_image_ids(tbl: pa.Table, store_size: int) -> pa.Table:
    """Vector-ish derivation of ``image_id`` from the ``path`` column."""
    paths = tbl.column("path").to_pylist()
    ids = [f"img-{image_key_from_path(p, store_size):010d}" for p in paths]
    return tbl.append_column("image_id", pa.array(ids, pa.string()))


class StoreLookupFetcher:
    """``map_batches`` callable over the STORE dataset: keep rows whose
    ``image_id`` is in the broadcast admitted set, attach schedule
    metadata columns.  Stateful (actor pool): the admitted-side index is
    deserialized once per actor in ``__init__``, not per batch — the
    ray.put-once / read-everywhere broadcast pattern."""

    def __init__(self, admitted_ref: "ray.ObjectRef"):
        admitted: pa.Table = ray.get(admitted_ref)
        self._meta = admitted
        ids = admitted.column("image_id").to_pylist()
        self._index = {v: i for i, v in enumerate(ids)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("image_id").to_pylist()
        pos = np.array([self._index.get(v, -1) for v in ids], dtype=np.int64)
        keep = pos >= 0
        if not keep.any():
            return batch.slice(0, 0).append_column(
                "fetch_time_ms", pa.array([], pa.int64())
            ).append_column("host_index", pa.array([], pa.int64())).append_column(
                "seed_rank", pa.array([], pa.int64())
            ).append_column("url", pa.array([], pa.string())).append_column(
                "url_hash", pa.array([], pa.int64())
            ).append_column("host", pa.array([], pa.string())).append_column(
                "epoch", pa.array([], pa.int64())
            )
        out = batch.filter(pa.array(keep))
        sel = pos[keep]
        meta = self._meta.take(pa.array(sel, pa.int64()))
        for col in ("fetch_time_ms", "host_index", "seed_rank", "url", "url_hash", "host", "epoch"):
            out = out.append_column(col, meta.column(col))
        return out


def fetch_from_store(
    store_paths: list[str], admitted: pa.Table, concurrency: int | tuple = (2, 8)
) -> rd.Dataset:
    """Streaming fetch: read the content store (parquet fragments) and
    semi-join it against the admitted epoch.  Returns a Dataset of
    images-table rows + schedule metadata."""
    ref = ray.put(admitted)
    ds = rd.read_parquet(store_paths)
    return ds.map_batches(
        StoreLookupFetcher,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )
