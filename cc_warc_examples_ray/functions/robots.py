"""robots.txt parsing → the ROBOTS table shape (host, crawl_delay_ms,
disallow_prefixes).

The reference hard-codes a single global 150 ms interval
(`/root/reference/src/org/commoncrawl/mklab/analysis/ProcessingService.java:57`)
and never reads robots.txt; the north rule requires per-host budgets
derived from robots crawl-delay.  This parser implements the public
robots.txt conventions (REP draft / de-facto format): ``User-agent``
groups, ``Disallow`` path prefixes, non-standard but widespread
``Crawl-delay`` seconds.  Only groups matching ``agent`` (or ``*``)
apply; comments (#) and blank lines ignored; malformed lines skipped.
"""

from __future__ import annotations

import pyarrow as pa


def parse_robots_txt(text: str, agent: str = "*",
                     default_delay_ms: int = 150) -> tuple[int, list[str]]:
    """→ (crawl_delay_ms, disallow_prefixes) for ``agent``.

    Group selection: the most specific matching User-agent group wins
    (exact name > '*'); within a group, directives accumulate."""
    groups: dict[str, dict] = {}
    current: list[str] = []
    saw_directive = False  # a directive since the last User-agent line
    agent_l = agent.lower()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            # RFC 9309: blank lines are INSIGNIFICANT — rules separated
            # from their User-agent line by blank lines still belong to
            # it (group boundaries come only from UA-after-directives)
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            # RFC 9309: a User-agent line AFTER directives starts a NEW
            # group — only consecutive UA lines share one group.
            if saw_directive:
                current = []
                saw_directive = False
            name = value.lower()
            groups.setdefault(name, {"disallow": [], "delay": None})
            current.append(name)
        elif field in ("disallow", "crawl-delay", "allow"):
            saw_directive = True
            if not current:
                continue
            for name in current:
                g = groups[name]
                if field == "disallow" and value:
                    g["disallow"].append(value)
                elif field == "crawl-delay":
                    try:
                        g["delay"] = int(float(value) * 1000)
                    except ValueError:
                        pass
        else:
            # unknown directive: ignored, but it still ends the UA run
            saw_directive = True
    chosen = None
    if agent_l in groups:
        chosen = groups[agent_l]
    elif "*" in groups:
        chosen = groups["*"]
    if chosen is None:
        return default_delay_ms, []
    delay = chosen["delay"] if chosen["delay"] is not None else default_delay_ms
    return delay, list(dict.fromkeys(chosen["disallow"]))


def robots_table_from_texts(host_to_text: dict[str, str], agent: str = "*",
                            default_delay_ms: int = 150) -> pa.Table:
    """(host → robots.txt body) → ROBOTS table."""
    from ..schemas import ROBOTS

    hosts, delays, dis = [], [], []
    for h, t in host_to_text.items():
        d, pre = parse_robots_txt(t or "", agent=agent, default_delay_ms=default_delay_ms)
        hosts.append(h)
        delays.append(d)
        dis.append(pre)
    return pa.table(
        {"host": hosts, "crawl_delay_ms": pa.array(delays, pa.int64()),
         "disallow_prefixes": pa.array(dis, pa.list_(pa.string()))},
        schema=ROBOTS,
    )
