"""The reference's three example MapReduce jobs + media extraction, as
Ray Data pipelines (SURVEY.md §3.1-§3.2).

Each mirrors a Hadoop driver:

- :func:`tag_counts` ← ``WARCTagCounter``
  (`/root/reference/src/org/commoncrawl/examples/mapreduce/WARCTagCounter.java:30-70`)
- :func:`word_counts` ← ``WETWordCount`` (`WETWordCount.java`)
- :func:`server_counts` ← ``WATServerType`` (`WATServerType.java`)
- :func:`media_extract` ← ``LocalMediaExtractor``/``AWSMediaExtractor``
  (`MediaMap.java` + `MediaReduce.java` first-per-key dedup)
- :func:`job_counters` ← Hadoop counters (`TagCounterMap.java:17-20`)

Shape: parse/explode inside ``map_batches`` (stateless, vectorized) →
one grouped count with per-batch partials.  The only shuffle is the
final small groupby — the Hadoop combiner+reduce collapsed into Ray
Data's aggregate.
"""

from __future__ import annotations

import ray.data as rd

from ..ops.relational import first_per_key, grouped_count, grouped_sum
from ..stages import parse


def tag_counts(records: rd.Dataset) -> rd.Dataset:
    """(tag, cnt) — html tag frequency over response records."""
    tags = records.map_batches(parse.extract_tags_batch, batch_format="pyarrow")
    return grouped_count(tags, ["tag"], alias="cnt")


def word_counts(records: rd.Dataset) -> rd.Dataset:
    """(word, cnt) — WET whitespace-token frequency."""
    words = records.map_batches(parse.extract_words_batch, batch_format="pyarrow")
    return grouped_count(words, ["word"], alias="cnt")


def server_counts(records: rd.Dataset) -> rd.Dataset:
    """(server, cnt) — WAT Server-header frequency."""
    servers = records.map_batches(parse.extract_servers_batch, batch_format="pyarrow")
    return grouped_count(servers, ["server"], alias="cnt")


def job_counters(records: rd.Dataset) -> rd.Dataset:
    """(counter, total) — A10 job counters, partial per batch then summed."""
    partials = records.map_batches(parse.warc_counters_batch, batch_format="pyarrow")
    return grouped_sum(partials, ["counter"], "value", alias="total")


def media_extract(records: rd.Dataset, dedup: bool = True) -> rd.Dataset:
    """CRAWLED_MEDIA rows from HTML responses; exact first-per-src dedup
    (MediaReduce semantics — winner = lexicographically-first page_url,
    made deterministic where Hadoop's was arrival-order)."""
    media = records.map_batches(parse.extract_media_batch, batch_format="pyarrow")
    if not dedup:
        return media
    # full-row tiebreak: a page embedding the same src twice yields equal
    # (src, page_url) rows whose winner must not depend on block order
    return first_per_key(
        media, "src", "page_url",
        tiebreak=("dom_depth", "dom_sib", "dom_elem", "alt", "parent_txt", "w", "h"),
    )
