"""LAION/DataComp-style image+caption curation (graft-cell payload: image).

Composes the metadata gates a multimodal training-data pipeline applies
before (expensive) model scoring — minimum dimensions, aspect-ratio
bound, caption length, caption blocklist — with visual exact-dedup
(keep-first per pHash) into one shuffle-light report: every gate is an
Arrow compute kernel inside a single ``map_batches`` pass; the only
exchanges are the keeper aggregate (``relational.grouped_agg`` min —
hash-partitioned, adaptive small-merge) and the keeper join back
(``relational.hash_join`` — adaptive broadcast for dimension-sized
keeper maps, the 100 TB regime).

Reference analog: the admission gates of ``ImageUtils.java:26-28,81-87``
(content/dims) extended with the caption-side gates of public image-text
curation pipelines (LAION-400M/5B filtering: caption length, blocklists,
dedup).  Regexes run in Arrow's RE2 — the same engine as the DuckDB
oracle, so no Python-``re`` divergence is possible.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from . import relational

# ASCII word runs — pinned on both sides of the oracle (RE2 semantics).
_WORD_RUN = r"[A-Za-z0-9_]+"

# gate evaluation order (first failing gate names the reason)
REASONS = ("dims", "aspect", "caption_short", "caption_block", "dup", "kept")


def _gate_batch(tbl: pa.Table, min_dim: int, max_aspect: int,
                min_cap_words: int, block_re: str) -> pa.Table:
    w, h = tbl.column("w"), tbl.column("h")
    cap = tbl.column("caption")
    dims_bad = pc.or_(pc.less(w, min_dim), pc.less(h, min_dim))
    mx = pc.max_element_wise(w, h)
    mn = pc.min_element_wise(w, h)
    aspect_bad = pc.greater(mx, pc.multiply(mn, max_aspect))
    short_bad = pc.less(
        pc.count_substring_regex(cap, _WORD_RUN), min_cap_words)
    block_bad = pc.match_substring_regex(cap, block_re)
    reason = pc.if_else(
        dims_bad, "dims",
        pc.if_else(aspect_bad, "aspect",
                   pc.if_else(short_bad, "caption_short",
                              pc.if_else(block_bad, "caption_block",
                                         "kept"))))
    return pa.table({
        "image_id": tbl.column("image_id"),
        "phash": tbl.column("phash"),
        "reason0": reason,
    })


def curation_report(
    ds: rd.Dataset,
    *,
    min_dim: int = 64,
    max_aspect: int = 3,
    min_cap_words: int = 5,
    blocklist: Sequence[str] = ("market", "lantern"),
) -> rd.Dataset:
    """Per-image curation verdict over an image+caption table with
    columns ``(image_id, w, h, caption, phash)``.

    Returns ``(image_id, reason)`` where ``reason`` is the FIRST failing
    gate in :data:`REASONS` order — ``dims`` (either side < min_dim),
    ``aspect`` (max(w,h) > max_aspect·min(w,h)), ``caption_short``
    (< min_cap_words ASCII word runs), ``caption_block`` (case-
    insensitive whole-word blocklist hit), ``dup`` (passed every gate
    but a lower image_id shares its pHash), or ``kept``.

    Scale shape: payload bytes are never read (metadata columns only);
    the keeper map is #distinct-phash-sized, so the join back runs on
    ``hash_join``'s broadcast path until the dup space itself is huge.
    """
    block_re = r"(?i)\b(" + "|".join(blocklist) + r")\b"
    gated = ds.map_batches(
        lambda t: _gate_batch(t, min_dim, max_aspect, min_cap_words, block_re),
        batch_format="pyarrow",
    ).materialize()  # scanned twice below (keeper aggregate + join)
    keepers = relational.grouped_agg(
        gated.filter(expr="reason0 == 'kept'"),
        keys=["phash"], aggs=[("image_id", "min", "keeper_id")],
    )
    gated_schema = pa.schema([
        ("image_id", pa.string()), ("phash", pa.int64()),
        ("reason0", pa.string()),
    ])
    keeper_schema = pa.schema([
        ("phash", pa.int64()), ("keeper_id", pa.string()),
    ])
    joined = relational.hash_join(
        gated, keepers, key="phash", how="left",
        left_schema=gated_schema, right_schema=keeper_schema,
    )

    def finalize(t: pa.Table) -> pa.Table:
        kept = pc.equal(t.column("reason0"), "kept")
        is_keeper = pc.equal(t.column("image_id"), t.column("keeper_id"))
        reason = pc.if_else(
            kept,
            pc.if_else(pc.fill_null(is_keeper, False), "kept", "dup"),
            t.column("reason0"))
        return pa.table({"image_id": t.column("image_id"), "reason": reason})

    return joined.map_batches(finalize, batch_format="pyarrow")
