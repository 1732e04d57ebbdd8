"""Fixed pyarrow schemas for every logical table (SURVEY.md §1.5).

The reference is schema-on-read (Java POJOs + JSON); this engine pins an
explicit ``pyarrow.Schema`` per table so blocks are validated at stage
boundaries and never silently drift.
"""

from __future__ import annotations

import pyarrow as pa

# The authoritative input/output shape (driver input_hint): Lance-style
# table of image + caption pairs.
IMAGES = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

# Seed frontier (models resources/seeds.txt, read at
# MultithreadedAnalyzer.java:185-202).
FRONTIER_SEEDS = pa.schema(
    [
        ("seed_url", pa.string()),
        ("page_url", pa.string()),
        ("seed_rank", pa.int64()),
    ]
)

# Canonicalized frontier (after the M15-M18 canonicalize stage).
FRONTIER_CANON = pa.schema(
    [
        ("seed_url", pa.string()),
        ("page_url", pa.string()),
        ("seed_rank", pa.int64()),
        ("url", pa.string()),       # resolved absolute URL
        ("surt", pa.string()),      # canonical SURT form
        ("url_hash", pa.int64()),   # xxhash64(surt), int64 view
        ("host", pa.string()),      # canonical host (www.-stripped)
        ("path", pa.string()),      # path component (robots gating)
    ]
)

# Politeness budget per host (robots.txt model).
ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("crawl_delay_ms", pa.int64()),
        ("disallow_prefixes", pa.list_(pa.string())),
    ]
)

# Scheduled frontier: adds the deterministic crawl-order key.
FRONTIER_SCHEDULED = pa.schema(
    list(FRONTIER_CANON)
    + [
        ("fetch_time_ms", pa.int64()),  # host_index * crawl_delay(host)
        ("host_index", pa.int64()),     # position within host queue
    ]
)

# Extracted-media record — CCMedia / CrawledImage shape
# (CCMedia.java:8-29, CrawledImage.java:24-33).
CRAWLED_MEDIA = pa.schema(
    [
        ("src", pa.string()),
        ("alt", pa.string()),
        ("w", pa.string()),          # HTML attribute strings (CCMedia.java:14-17)
        ("h", pa.string()),
        ("page_url", pa.string()),
        ("parent_txt", pa.string()),
        ("dom_sib", pa.int32()),
        ("dom_depth", pa.int32()),
        ("dom_elem", pa.string()),
    ]
)

# WARC-record view (ArchiveRecord header + payload,
# WARCFileRecordReader.java:49-58, TagCounterMap.java:36-61).
WARC_RECORDS = pa.schema(
    [
        ("record_url", pa.string()),
        ("warc_type", pa.string()),   # response | conversion | metadata
        ("mime", pa.string()),
        ("payload", pa.binary()),
    ]
)

# Per-partition lineage / metrics rows (Statistics.java:97-187 counters +
# Hadoop job counters TagCounterMap.java:17-20 → a queryable table).
LINEAGE = pa.schema(
    [
        ("epoch", pa.int64()),
        ("partition", pa.int64()),
        ("stage", pa.string()),
        ("counter", pa.string()),
        ("value", pa.int64()),
    ]
)
