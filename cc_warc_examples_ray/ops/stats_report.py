"""Crawl statistics + lineage reporting (SURVEY.md §2.1 S12, §2.5 A4-A6).

The reference appends heap stats and count-sorted frequency dumps to a
text file per checkpoint
(`/root/reference/src/org/commoncrawl/mklab/analysis/Statistics.java:97-187`),
fed by per-host multisets (`:65-95`).  Here the same tables come from
grouped counts over the crawl-order / media tables, and the printable
report reads the lineage table a crawl run committed per epoch.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.parse import MEDIA_SUFFIX_RE, SITE_PATTERN_RE
from .relational import grouped_count


def classify_url_kind(urls) -> list[str]:
    """webpage | image | video — the multiset namespaces of
    `Statistics.java:65-80` (fed at `URLProcessor.java:64-69`)."""
    video_rx = ("mp4", "avi", "mov", "mpg", "mpeg", "wmv")
    out = []
    for u in urls:
        m = MEDIA_SUFFIX_RE.search(u or "")
        if m:
            out.append("video" if m.group(1).lower() in video_rx else "image")
        elif SITE_PATTERN_RE.search(u or ""):
            out.append("video")
        else:
            out.append("webpage")
    return out


def host_frequencies(order_ds: rd.Dataset) -> rd.Dataset:
    """A4: per-(host, kind) counts over the crawl-order table."""

    def add_kind(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "kind", pa.array(classify_url_kind(tbl.column("url").to_pylist()), pa.string())
        )

    with_kind = order_ds.map_batches(add_kind, batch_format="pyarrow")
    return grouped_count(with_kind, ["host", "kind"], alias="cnt")


def nested_host_histogram(media_ds: rd.Dataset) -> rd.Dataset:
    """A5: page-host → image-host histogram
    (`Statistics.java:82,87-95` DOMAINS_FOR_IMAGES)."""
    from urllib.parse import urlsplit

    def hosts(tbl: pa.Table) -> pa.Table:
        def h(u):
            try:
                x = (urlsplit(u or "").hostname or "").lower()
            except ValueError:
                x = ""
            return x[4:] if x.startswith("www.") else x

        return pa.table(
            {
                "page_host": pa.array([h(u) for u in tbl.column("page_url").to_pylist()]),
                "image_host": pa.array([h(u) for u in tbl.column("src").to_pylist()]),
            }
        )

    return grouped_count(
        media_ds.map_batches(hosts, batch_format="pyarrow"), ["page_host", "image_host"], alias="cnt"
    )


def statistics_report(run) -> str:
    """S12: printable per-epoch statistics from a CrawlRun's lineage +
    shard-free aggregates — count-desc sorted like
    ``Multisets.copyHighestCountFirst`` (`Statistics.java:128-158`)."""
    lin = run.lineage.to_table().to_pandas()
    lines = ["=== crawl statistics ==="]
    total = lin.groupby("counter")["value"].sum().sort_values(ascending=False)
    for counter, v in total.items():
        lines.append(f"{counter:>14s}: {int(v)}")
    lines.append("--- per epoch ---")
    for epoch, g in lin.groupby("epoch"):
        kv = ", ".join(f"{c}={int(v)}" for c, v in zip(g["counter"], g["value"]))
        lines.append(f"epoch {epoch}: {kv}")
    order = run.order_table()
    hosts = (
        pd.Series(order.column("host").to_pylist()).value_counts().head(20)
    )
    lines.append("--- top hosts (admitted URLs) ---")
    for h, c in hosts.items():
        lines.append(f"{h:>24s}: {int(c)}")
    return "\n".join(lines)
