"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

Implementations live in ``cc_warc_examples_ray.entry_queries``; nothing
here (or there) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship crawl pipeline on /root/testdata/sf0.001-derived frontier."""
    from cc_warc_examples_ray.entry_queries import entry_impl

    return entry_impl()


def queries() -> dict[str, Callable[[str], Any]]:
    from cc_warc_examples_ray.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cc_warc_examples_ray.entry_queries import oracles_impl

    return oracles_impl()
