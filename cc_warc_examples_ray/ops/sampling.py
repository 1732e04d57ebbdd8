"""Sampling + misc set ops (SURVEY.md §2.6 O5, O11, J4).

- :func:`stratified_sample` — class-balanced sampling: cap each class at
  the size of the smallest participating class (the reference's
  "skip small while NUM_SMALL > NUM_BIG" loop,
  `/root/reference/src/org/commoncrawl/mklab/ngrams/ArffController.java:63-72`),
  made deterministic: keep the lowest-``order_col`` rows per class.
- :func:`substring_any_join` — J4: keep rows whose column contains any
  of the (small, broadcast) substrings (`ZipTest.java:157-165`'s
  O(N*M) scan, vectorized as one regex union per batch).
- :func:`substring_containment_dedup` — O11: drop any string contained
  in a longer kept string (`NgamFeatureSelection.java:57-101`) —
  driver-side; the input is a small vocabulary by construction.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def stratified_sample(ds: rd.Dataset, cls_col: str, order_col: str,
                      per_class: int | None = None) -> rd.Dataset:
    """Deterministic class-balanced subsample: per class keep the
    ``per_class`` rows with the smallest ``order_col`` (default:
    the min class size — exact balance)."""
    if per_class is None:
        counts = ds.groupby(cls_col).count().to_pandas()
        per_class = int(counts["count()"].min())
    k = per_class

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col, kind="mergesort").head(k)

    return ds.groupby(cls_col).map_groups(head_k, batch_format="pandas")


def substring_any_join(ds: rd.Dataset, col: str, needles_ref) -> rd.Dataset:
    """Semi-join on substring containment vs a broadcast needle list."""

    class Contains:
        def __init__(self):
            needles = ray.get(needles_ref) if not isinstance(needles_ref, list) else needles_ref
            self.rx = re.compile("|".join(re.escape(n) for n in needles)) if needles else None

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if self.rx is None:
                return tbl.slice(0, 0)
            mask = pc.match_substring_regex(tbl.column(col), self.rx.pattern)
            return tbl.filter(mask)

    return ds.map_batches(Contains, batch_format="pyarrow", concurrency=(1, 4))


def substring_containment_dedup(strings: list[str]) -> list[str]:
    """Drop s if some longer kept string contains it; ties keep the
    lexicographically-first.  O(n²) — vocabulary-scale input only."""
    out: list[str] = []
    for s in sorted(set(strings), key=lambda x: (-len(x), x)):
        if not any(s in kept for kept in out):
            out.append(s)
    return sorted(out)
