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
    # per-key smallest-k: topk_per_key's combiner prunes every class to
    # k rows per batch before the shuffle and ranks in one vectorized
    # Arrow kernel — replaces the former pandas map_groups round-trip
    from .relational import topk_per_key

    return topk_per_key(ds, cls_col, order_col, per_class, descending=False)


def mix_rates_table(rates: dict, default: float, bits: int = 20) -> dict:
    """Compile per-key sampling rates into integer (base_copies,
    fraction_threshold) pairs at ``2**bits`` resolution — computed ONCE
    here so the Ray kernel and a SQL oracle embed the SAME integers and
    no float arithmetic happens at row time."""
    scale = 1 << bits
    def compile_one(r: float) -> tuple[int, int]:
        # fail misconfiguration here, at compile time — a negative rate
        # would otherwise surface as an opaque np.repeat error deep in
        # weighted_mix (and int(r) truncates toward zero for negatives)
        if not (r >= 0.0):  # also rejects NaN
            raise ValueError(f"sampling rate must be >= 0, got {r!r}")
        base = int(r)
        return base, int(round((r - base) * scale))
    out = {k: compile_one(v) for k, v in rates.items()}
    out[None] = compile_one(default)
    return out


def weighted_mix(ds: rd.Dataset, rates: dict, key_col: str = "source",
                 id_col: str = "doc_id", default: float = 1.0, seed: int = 0,
                 bits: int = 20, hash_fn: str = "xxh64") -> rd.Dataset:
    """Deterministic weighted source mixing — the 'data mixing' step of
    an LLM training pipeline (per-source up/down-sampling weights, e.g.
    the sampling ratios of GPT-3 table 2.2 / The Pile; public): each row
    is emitted ``floor(rate)`` times plus one more iff
    ``hash(f"{id}:{seed}") mod 2**bits < round(frac(rate) * 2**bits)``.

    Stateless and shuffle-free: the decision is a pure function of the
    row id, so it reproduces under ANY partitioning, resume, or
    re-execution — no RNG state to checkpoint (contrast
    ``Dataset.random_sample``).  Rows are replicated by ``take`` with a
    repeat index (zero-copy until write); ``copy_idx`` numbers the
    copies so downstream shuffles can keep them distinguishable.
    ``hash_fn="md5"`` switches to DuckDB-replicable
    ``md5_number_lower`` semantics for the SQL oracle."""
    import numpy as np

    from ..hashing import md5_64_many, xxh64_many

    scale = np.uint64(1 << bits)
    table = mix_rates_table(rates, default, bits=bits)

    def fn(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl.append_column("copy_idx", pa.array([], pa.int64()))
        keys = tbl.column(key_col).to_pylist()
        ids = [f"{i}:{seed}" for i in tbl.column(id_col).to_pylist()]
        h = (md5_64_many(ids) if hash_fn == "md5" else xxh64_many(ids)) % scale
        dflt = table[None]
        pairs = [table.get(k, dflt) for k in keys]
        base = np.fromiter((p[0] for p in pairs), np.int64, len(pairs))
        thr = np.fromiter((p[1] for p in pairs), np.uint64, len(pairs))
        n = base + (h < thr)
        idx = np.repeat(np.arange(len(n), dtype=np.int64), n)
        starts = np.cumsum(n) - n
        copy = np.arange(len(idx), dtype=np.int64) - np.repeat(starts, n)
        return tbl.take(pa.array(idx, pa.int64())).append_column(
            "copy_idx", pa.array(copy, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


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
