"""Generic relational operators, Ray-Data-first (SURVEY.md §2.4-§2.6).

Each maps a reference construct to a Dataset primitive:

- per-key counts / sums  ← Hadoop ``LongSumReducer`` jobs
  (`/root/reference/src/org/commoncrawl/examples/mapreduce/WARCTagCounter.java:45,63-67`)
- first-per-key exact dedup ← ``MediaReduce.java:12-19`` / ``MediaCombine.java:9-16``
- top-k ← ``Multisets.copyHighestCountFirst`` dumps (`Statistics.java:128-158`)
- broadcast semi/anti joins ← in-memory seed-host membership sets
  (`URLProcessor.java:63`, `ProcessingService.java:352`)

Shuffle discipline: every groupby here pre-aggregates inside
``map_batches`` first (one partial row per key per batch) so the
all-to-all exchange moves partials, not rows — the combiner pattern the
reference gets from Hadoop (`WordCount.java:46`) made explicit.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _arrow_types(schema) -> dict:
    """``Dataset.schema()`` types can be numpy dtypes (pandas-backed
    blocks); normalize to Arrow types (object dtype → string)."""
    out = {}
    for n, t in zip(schema.names, schema.types):
        if not isinstance(t, pa.DataType):
            try:
                t = pa.from_numpy_dtype(t)
            except (pa.ArrowNotImplementedError, TypeError):
                t = pa.string()
        out[n] = t
    return out


def _null_safe_part_assigner(keys: Sequence[str], num_partitions: int):
    """Like :func:`make_part_assigner` but null-key-safe: null ints hash
    as 0 and null strings as a sentinel (a COLLISION into a shared
    partition, never corruption — grouping inside the partition is exact
    on the real values, matching SQL GROUP BY's null group)."""
    from ..hashing import combine64, xxh64_many

    def add_part(tbl: pa.Table) -> pa.Table:
        acc = None
        for k in keys:
            col = tbl.column(k)
            if pa.types.is_integer(col.type):
                if col.null_count:
                    col = pc.fill_null(col, 0)
                v = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            else:
                s = pc.fill_null(pc.cast(col.combine_chunks(), pa.string()), "\x00")
                v = xxh64_many(s)
            acc = v.astype(np.uint64, copy=True) if acc is None else combine64(acc, v)
        part = (acc % np.uint64(num_partitions)).astype(np.int64)
        return tbl.append_column("_part", pa.array(part)).replace_schema_metadata(None)

    return add_part


def arrow_group_by(tbl: pa.Table, keys: Sequence[str], spec) -> pa.Table:
    """``pa.Table.group_by(keys).aggregate(spec)`` with a workaround for
    a pyarrow 16.1 grouper bug: in MULTI-key grouping where a
    (large_)string/binary key column contains nulls, the row encoder
    splits the null group above ~1k rows (duplicate key rows come back
    — reproduced: 3k rows / 287 true groups → 301-491 reported; single
    key or null-free multi-key is exact).  Encode string-null-ness in a
    companion int8 key, fill the string, group on the augmented keys,
    then restore the nulls.  Output column order is unchanged:
    ``[*keys, *aggs]``."""
    keys = list(keys)
    if len(keys) < 2:
        return tbl.group_by(keys).aggregate(spec)
    fix = []
    for k in keys:
        col = tbl.column(k)
        if (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
                or pa.types.is_binary(col.type)
                or pa.types.is_large_binary(col.type)) and col.null_count:
            flag = pc.cast(pc.is_null(col), pa.int8())
            filler = b"" if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type) else ""
            tbl = tbl.set_column(tbl.column_names.index(k), k, pc.fill_null(col, filler))
            tbl = tbl.append_column(f"__null_{k}", flag)
            fix.append(k)
    if not fix:
        return tbl.group_by(keys).aggregate(spec)
    g = tbl.group_by(keys + [f"__null_{k}" for k in fix]).aggregate(spec)
    for k in fix:
        col = g.column(k)
        isn = pc.equal(g.column(f"__null_{k}"), 1)
        g = g.set_column(g.column_names.index(k), k,
                         pc.if_else(isn, pa.scalar(None, col.type), col))
    return g.drop_columns([f"__null_{k}" for k in fix])


def grouped_agg(ds: rd.Dataset, keys: Sequence[str],
                aggs: Sequence[tuple[str | None, str, str]],
                num_partitions: int = 32,
                small_merge_rows: int = 200_000) -> rd.Dataset:
    """Exact per-key aggregate built for HIGH-cardinality keys (words,
    hashes, pair ids, vertex ids — millions+ of groups): per-batch Arrow
    ``group_by`` partial, hash-partition on the key(s), one Arrow
    ``group_by`` per partition.  Ray's native ``groupby().aggregate()``
    range-sorts the whole dataset and combines per group in Python —
    measured 50 s on 3.3M rows / 1.1M keys where this path takes ~2 s.

    ADAPTIVE MERGE: the partial stage collapses every batch to at most
    #distinct-keys rows, so after materializing the partials their row
    count IS a key-cardinality bound at zero extra cost.  When that
    bound fits ``small_merge_rows`` the final merge is a single Arrow
    ``group_by`` task over coalesced blocks — no partition shuffle at
    all, recovering the ~0.2-0.3 s fixed sort-shuffle cost that tiny-key
    queries (word_count, exact_dedup) were paying; above the bound the
    hash-partitioned merge runs as before (the 100 TB regime).  The
    materialize barrier is free in practice: the big path's sort
    shuffle materializes internally anyway.

    ``aggs``: ``(col, fn, alias)`` with fn in {"sum", "min", "max",
    "count"} (col ignored for count); all three re-associate, so the
    partition merge re-applies them (counts merge by sum).  Empty
    ``aggs`` = grouped DISTINCT.  Output columns: ``[*keys, *aliases]``
    (Ray-aggregate order)."""
    keys = list(keys)
    aliases = [a for _, _, a in aggs]
    out_cols = keys + aliases
    add_part = _null_safe_part_assigner(keys, num_partitions)

    def collapse(tbl: pa.Table, spec) -> pa.Table:
        g = arrow_group_by(tbl, keys, spec or [([], "count_all")])
        g = g.rename_columns(keys + (aliases or ["_c"]))
        if not aggs:
            g = g.drop_columns(["_c"])
        return g.replace_schema_metadata(None)

    pspec = [([], "count_all") if fn == "count" else (c, fn) for c, fn, _ in aggs]
    mspec = [(a, "sum") if fn in ("count", "sum") else (a, fn) for _, fn, a in aggs]

    def partial(tbl: pa.Table) -> pa.Table:
        return collapse(tbl, pspec)

    def merge(gt: pa.Table) -> pa.Table:
        return collapse(gt.drop_columns(["_part"]), mspec).select(out_cols)

    def merge_small(gt: pa.Table) -> pa.Table:
        return collapse(gt, mspec).select(out_cols)

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if parts.count() <= small_merge_rows:
        # batch_size=None: the merge MUST see the single coalesced block
        # as ONE batch (chunked batches would emit duplicate keys)
        return parts.repartition(1).map_batches(
            merge_small, batch_format="pyarrow", batch_size=None)
    return (
        parts
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(merge, batch_format="pyarrow")
    )


def grouped_count(ds: rd.Dataset, keys: Sequence[str], alias: str = "cnt") -> rd.Dataset:
    """groupby(keys).count(), scale-safe for high-cardinality keys."""
    return grouped_agg(ds, keys, [(None, "count", alias)])


def grouped_sum(ds: rd.Dataset, keys: Sequence[str], col: str, alias: str) -> rd.Dataset:
    """groupby(keys).sum(col), scale-safe for high-cardinality keys."""
    return grouped_agg(ds, keys, [(col, "sum", alias)])


def grouped_min(ds: rd.Dataset, key: str | Sequence[str], val: str | Sequence[str],
                num_partitions: int = 32) -> rd.Dataset:
    """groupby(key).min(val(s)); empty ``val`` = grouped DISTINCT.
    Output columns ``[*keys, *vals]``.  See :func:`grouped_agg`."""
    keys = [key] if isinstance(key, str) else list(key)
    vals = [val] if isinstance(val, str) else list(val)
    return grouped_agg(ds, keys, [(v, "min", v) for v in vals], num_partitions)


def grouped_quantiles_disc(ds: rd.Dataset, key: str, col: str,
                           qs: Sequence[float],
                           num_partitions: int = 32) -> rd.Dataset:
    """Discrete quantiles PER KEY (per-domain length percentiles, per-host
    size distribution) — the grouped sibling of :func:`quantiles_disc`:
    one distributed (key, value) histogram via :func:`grouped_agg`
    (shuffle moves one row per distinct (key, value) per batch), then a
    hash-partitioned kernel walks each key's cumulative counts and picks
    rank ``max(1, ceil(q*n))`` (DuckDB ``quantile_disc``).  Null values
    don't rank (SQL aggregate semantics); null KEYS form their own group.
    Output rows: (key, q, value)."""
    import math

    qarr = np.asarray(sorted(qs), dtype=np.float64)

    def vc(tbl: pa.Table) -> pa.Table:
        t = tbl.select([key, col])
        vcol = t.column(col)
        if vcol.null_count:
            t = t.filter(pc.is_valid(vcol))
        g = arrow_group_by(t, [key, col], [([], "count_all")])
        return g.rename_columns([key, col, "_c"]).replace_schema_metadata(None)

    # partition by KEY (not (key, value)) so each key's full histogram
    # lands in one kernel call; per-batch partials above already
    # collapsed duplicate (key, value) rows within a batch
    parts = (
        ds.map_batches(vc, batch_format="pyarrow")
        .map_batches(_null_safe_part_assigner([key], num_partitions),
                     batch_format="pyarrow")
    )

    def kern(gt: pa.Table) -> pa.Table:
        t = gt.drop_columns(["_part"])
        # merge duplicate (key, value) partials from different batches
        t = arrow_group_by(t, [key, col], [("_c", "sum")])
        t = t.rename_columns([key, col, "_c"])
        kv = t.column(key).to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(kv, use_na_sentinel=False)
        vals = t.column(col).to_numpy(zero_copy_only=False)
        cnts = t.column("_c").to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, codes))
        codes, vals, cnts = codes[order], vals[order], cnts[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(codes[1:] != codes[:-1]) + 1, [len(codes)]])
        out_k, out_q, out_v = [], [], []
        for gi in range(len(starts) - 1):
            a, b = starts[gi], starts[gi + 1]
            cum = cnts[a:b].cumsum()
            n = int(cum[-1])
            ranks = np.maximum(1, np.ceil(qarr * n - 1e-9)).astype(np.int64)
            idx = np.searchsorted(cum, ranks)
            out_k.extend([kv[order[a]]] * len(qarr))
            out_q.extend(qarr.tolist())
            out_v.extend(vals[a + idx].tolist())
        return pa.table({
            key: pa.array(out_k, t.schema.field(key).type),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, t.schema.field(col).type),
        })

    return parts.groupby("_part").map_groups(kern, batch_format="pyarrow")


def topk_per_key(ds: rd.Dataset, key: str, order_col: str, k: int,
                 descending: bool = True, tiebreak: str | None = None,
                 num_partitions: int = 32) -> rd.Dataset:
    """Top-``k`` rows PER KEY (the per-group sibling of :func:`topk`,
    e.g. top-k documents per domain in a training-data curation pass):
    a per-batch combiner first prunes every key to its local top-k —
    the shuffle then moves at most k rows per (key, batch) — and one
    hash-partitioned kernel ranks whole key groups.  Deterministic:
    ties on ``order_col`` break by ``tiebreak`` ASC (required when
    ``order_col`` is not unique per key, same contract as
    :func:`first_per_key`).  Fully vectorized — one lexsort + one
    group-boundary scan per batch, no per-key loops."""
    tb = tiebreak

    def prune(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl
        kcol = tbl.column(key)
        if kcol.null_count:  # SQL PARTITION BY: null keys form a group;
            pass             # keep them — lexsort handles them via codes
        kv = kcol.to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(kv, use_na_sentinel=False)
        ov = tbl.column(order_col).to_numpy(zero_copy_only=False)
        sort_keys = [codes, -ov if descending else ov]
        if tb is not None:
            sort_keys.append(tbl.column(tb).to_numpy(zero_copy_only=False))
        order = np.lexsort(tuple(reversed(sort_keys)))
        sc = codes[order]
        starts = np.concatenate([[0], np.flatnonzero(sc[1:] != sc[:-1]) + 1])
        rank = np.arange(len(sc)) - np.repeat(starts, np.diff(
            np.concatenate([starts, [len(sc)]])))
        keep = order[rank < k]
        keep.sort()  # preserve input order within the batch
        return tbl.take(pa.array(keep, pa.int64()))

    add_part = _null_safe_part_assigner([key], num_partitions)

    def rank_partition(gt: pa.Table) -> pa.Table:
        t = gt.drop_columns(["_part"])
        return prune(t)

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(rank_partition, batch_format="pyarrow")
    )


def quantiles_disc(ds: rd.Dataset, col: str, qs: Sequence[float]) -> pd.DataFrame:
    """EXACT discrete quantiles without a global sort: build a
    distributed value histogram (per-batch Arrow value-counts →
    :func:`grouped_agg` merge), collect it, and pick rank
    ``max(1, ceil(q·n))`` per quantile — DuckDB ``quantile_disc``
    semantics (verified empirically: q·n at an exact integer keeps that
    rank; fractional rounds UP).  The shuffle moves one (value, count)
    row per distinct value per batch; the driver holds only the merged
    histogram — exact for integer/fixed-precision columns whose distinct
    count is bounded (cents, sizes, ranks); quantize continuous data
    first.  Returns a pandas frame (q, value)."""
    import math

    def vc(tbl: pa.Table) -> pa.Table:
        t = tbl.select([col])
        kcol = t.column(col)
        if kcol.null_count:  # SQL aggregate semantics: nulls don't rank
            t = t.filter(pc.is_valid(kcol))
        g = t.group_by([col]).aggregate([([], "count_all")])
        return g.rename_columns([col, "_c"]).replace_schema_metadata(None)

    hist = grouped_agg(ds.map_batches(vc, batch_format="pyarrow"),
                       [col], [("_c", "sum", "_c")]).to_pandas()
    if hist.empty:  # empty-dataset to_pandas may drop the columns too
        return pd.DataFrame({"q": pd.Series([], dtype="float64"),
                             "value": pd.Series([], dtype="float64")})
    hist = hist.sort_values(col, kind="mergesort").reset_index(drop=True)
    cum = hist["_c"].to_numpy().cumsum()
    n = int(cum[-1]) if len(cum) else 0
    vals = hist[col].to_numpy()
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        rank = max(1, math.ceil(q * n - 1e-9))
        idx = int(np.searchsorted(cum, rank))
        out_q.append(float(q))
        out_v.append(vals[idx])
    return pd.DataFrame({"q": pd.Series(out_q, dtype="float64"),
                         "value": pd.Series(out_v, dtype=hist[col].dtype if len(hist) else "float64")})


def topk(ds: rd.Dataset, col: str, k: int, descending: bool = True) -> rd.Dataset:
    """sort + limit (O1/O2).  Ray Data's sort is a range-partitioned
    shuffle; for pure top-k over big data prefer per-batch pre-truncation."""

    def prune(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows <= k:
            return tbl
        order = "descending" if descending else "ascending"
        return tbl.sort_by([(col, order)]).slice(0, k)

    return ds.map_batches(prune, batch_format="pyarrow").sort(col, descending=descending).limit(k)


def make_part_assigner(keys: Sequence[str], num_partitions: int):
    """map_batches kernel factory: append ``_part = combined-key-hash %
    num_partitions`` (int columns hashed directly, everything else via a
    string cast + xxh64).  Shared by :func:`partitioned_map` and
    ``dedup.grouped_bucket_pairs`` so the two partitioners can't drift."""
    from ..hashing import combine64, xxh64_many

    def add_part(tbl: pa.Table) -> pa.Table:
        acc = None
        for k in keys:
            col = tbl.column(k)
            if pa.types.is_integer(col.type):
                v = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
            else:
                v = xxh64_many(pc.cast(col.combine_chunks(), pa.string()))
            acc = v.astype(np.uint64, copy=True) if acc is None else combine64(acc, v)
        part = (acc % np.uint64(num_partitions)).astype(np.int64)
        # strip any from_pandas metadata a pandas-block upstream left on
        # the converted batch: metadata-bearing schemas are unhashable
        # and break Ray's schema-dedup early exit in the shuffle
        return tbl.append_column("_part", pa.array(part)).replace_schema_metadata(None)

    return add_part


def partitioned_map(ds: rd.Dataset, keys: Sequence[str], kern,
                    out_schema: pa.Schema | None = None,
                    num_partitions: int = 32) -> rd.Dataset:
    """Key-coherent pandas kernel WITHOUT one Ray group per key: rows are
    hash-partitioned on ``keys`` into ``num_partitions`` groups (every
    row of a key lands in one partition), ``kern(df)`` runs once per
    partition on a pandas frame holding MANY whole key-groups.  This
    replaces fine-grained ``groupby(keys).map_groups`` where the per-key
    work is cheap and the per-group Ray/pandas overhead dominates.
    Blocks are schema-stable Arrow (``out_schema`` defaults to the input
    schema)."""
    if out_schema is None:
        out_schema = pa.schema(list(_arrow_types(ds.schema()).items()))

    add_part = make_part_assigner(keys, num_partitions)

    def wrapped(gt: pa.Table) -> pa.Table:
        g = gt.to_pandas()
        if "_part" in g.columns:
            g = g.drop(columns=["_part"])
        res = kern(g)
        if not len(res):
            return out_schema.empty_table()
        # replace_schema_metadata(None): from_pandas attaches a b'pandas'
        # metadata blob even with an explicit schema; metadata-bearing
        # schemas are unhashable, which defeats Ray's schema-dedup early
        # exit in unify_schemas (warn-per-batch + full unify every time)
        return pa.Table.from_pandas(
            res[[f.name for f in out_schema]], schema=out_schema, preserve_index=False
        ).replace_schema_metadata(None)

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("_part").map_groups(
        wrapped, batch_format="pyarrow"
    )


def partitioned_map_arrow(ds: rd.Dataset, keys: Sequence[str], kern,
                          out_schema: pa.Schema,
                          num_partitions: int = 32) -> rd.Dataset:
    """Arrow-native sibling of :func:`partitioned_map`: ``kern`` gets a
    ``pa.Table`` holding many whole key-groups (the ``_part`` column
    already dropped) and returns a ``pa.Table`` matching ``out_schema``.
    Use this when the kernel is numpy/Arrow math — no pandas round-trip
    of (possibly large string/binary) columns."""
    add_part = make_part_assigner(keys, num_partitions)

    def wrapped(gt: pa.Table) -> pa.Table:
        if "_part" in gt.column_names:
            gt = gt.drop_columns(["_part"])
        res = kern(gt)
        if res.num_rows == 0:
            return out_schema.empty_table()
        return res.select([f.name for f in out_schema]).cast(
            out_schema).replace_schema_metadata(None)

    return ds.map_batches(add_part, batch_format="pyarrow").groupby("_part").map_groups(
        wrapped, batch_format="pyarrow"
    )


def first_per_key(ds: rd.Dataset, key: str, order_col: str,
                  tiebreak: Sequence[str] = ()) -> rd.Dataset:
    """Exact first-per-key dedup (A3/O7): per-batch pre-dedup (combiner),
    hash-partition by ``key``, then ONE vectorized drop_duplicates per
    partition — the spec'd version of `MediaReduce.java:14-18`'s "first
    value wins" without a pandas group per key.

    Determinism: the winner among rows with equal ``(key, order_col)``
    would otherwise depend on Ray's block-assembly order — pass
    ``tiebreak`` columns to pin a total order when ``order_col`` is not
    unique per key."""
    order_cols = [order_col, *tiebreak]

    # pre-dedup inside each batch before the shuffle (combiner).  The
    # winner selection runs in pandas but the kept rows are TAKEN from
    # the original Arrow table: type-exact, and no from_pandas metadata
    # blob (metadata-bearing schemas are unhashable → Ray warns per
    # batch and loses its schema-dedup early exit).
    def partial(tbl: pa.Table) -> pa.Table:
        df = tbl.select([key, *order_cols]).to_pandas()
        keep = df.sort_values(order_cols, kind="mergesort").drop_duplicates(
            key, keep="first"
        ).index.to_numpy()
        return tbl.take(pa.array(np.sort(keep), pa.int64()))

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_cols, kind="mergesort").drop_duplicates(key, keep="first")

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return partitioned_map(
        parts, [key], kern,
        out_schema=pa.schema(list(_arrow_types(ds.schema()).items())),
    )


def threshold_filter(ds: rd.Dataset, keys: Sequence[str], min_count: int, alias: str = "cnt") -> rd.Dataset:
    """Frequency-threshold filter (O6, `LocalFileAnalyzer.java:26-33`)."""
    counts = grouped_count(ds, keys, alias=alias)
    return counts.filter(expr=f"{alias} >= {min_count}")


def _member_keys(keys_ref) -> pa.Array:
    """Broadcast key set → sorted Arrow array, deserialized once per
    worker process (the dedup._bcast_cached pattern — a task pool with a
    per-process cache, never an actor pool: these joins are single-scan
    stages and an actor pool's ~1-2s spin-up per Dataset execution would
    dominate their wall time).  Only the DERIVED Arrow array is cached —
    caching the raw ray.get collection too would pin the key set twice
    per worker."""
    import ray

    from .dedup import _BCAST_CACHE

    key = ("member_keys", keys_ref)
    if key not in _BCAST_CACHE:
        if len(_BCAST_CACHE) > 4:
            _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = pa.array(sorted(set(ray.get(keys_ref))))
    return _BCAST_CACHE[key]


def broadcast_semi_join(ds: rd.Dataset, col: str, keys_ref) -> rd.Dataset:
    """Keep rows whose ``col`` ∈ broadcast key set (J1/J2).  ``keys_ref``
    is a ``ray.put`` handle to a python set / list — shipped once per
    worker process, not per batch."""

    def member(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.is_in(tbl.column(col), value_set=_member_keys(keys_ref)))

    return ds.map_batches(member, batch_format="pyarrow")


def broadcast_anti_join(ds: rd.Dataset, col: str, keys_ref) -> rd.Dataset:
    """Drop rows whose ``col`` ∈ broadcast key set (J3 — the
    `dao.exists` downloaded-check, `ProcessingService.java:352`)."""

    def not_member(tbl: pa.Table) -> pa.Table:
        return tbl.filter(
            pc.invert(pc.is_in(tbl.column(col), value_set=_member_keys(keys_ref)))
        )

    return ds.map_batches(not_member, batch_format="pyarrow")


def union_distinct(a: rd.Dataset, b: rd.Dataset, col: str) -> rd.Dataset:
    """TreeSet-union of two key columns (O10, `LocalFileAnalyzer.java:12-41`)."""
    return a.select_columns([col]).union(b.select_columns([col])).unique(col)


def windowed_aggregate(
    ds: rd.Dataset, key: str, ts_col: str, window: str, value_col: str
) -> rd.Dataset:
    """Tumbling-window aggregate over an event stream: assign each row a
    window start inside ``map_batches`` (no shuffle), then grouped
    partial-sum.  ``window``: pandas offset alias ('1h', '15min').
    Ordering assumption: none — tumbling windows are order-free.

    Arrow-native: the window key is epoch-aligned int64 floor arithmetic
    (identical to ``Series.dt.floor`` for post-1970 timestamps) + a
    pyarrow group_by — no pandas conversion in the hot stage."""
    window_us = int(pd.Timedelta(window).value // 1000)

    def assign(tbl: pa.Table) -> pa.Table:
        ts = tbl.column(ts_col)
        if ts.null_count:  # NaT would int64-wrap into a phantom window;
            tbl = tbl.filter(pc.is_valid(ts))  # pandas dt.floor dropped them
            ts = tbl.column(ts_col)
        ts_i = ts.combine_chunks().to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        ws = (ts_i - ts_i % window_us).astype("datetime64[us]")
        t = pa.table({
            key: tbl.column(key),
            "window_start": pa.array(ws),
            value_col: tbl.column(value_col),
        })
        return t

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    return grouped_agg(
        assigned, [key, "window_start"],
        [(value_col, "sum", "value_sum"), (None, "count", "n_events")],
    )


def session_windows(
    ds: rd.Dataset, key: str, ts_col: str, gap: str, value_col: str
) -> rd.Dataset:
    """Session windows over an event stream: per-key runs sorted by
    timestamp, a new session starts when the gap to the previous event
    exceeds ``gap`` (pandas offset alias).  Keys are hash-partitioned
    (``partitioned_map``) and the gaps-and-islands computation runs
    vectorized across ALL keys of a partition at once — no per-key
    python group."""
    gap_td = pd.Timedelta(gap)

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, value_col], kind="mergesort").reset_index(drop=True)
        new_key = g[key].ne(g[key].shift())
        new = new_key | (g[ts_col].diff() > gap_td)
        # per-key session counter: global cumsum minus the key's base
        glob = new.cumsum()
        base = glob.where(new_key).ffill()
        g = g.assign(session_id=(glob - base + 1).astype("int64"))
        c = np.floor(g[value_col].to_numpy() * 100.0 + 0.5).astype(np.int64)
        g = g.assign(_c=c)
        out = (
            g.groupby([key, "session_id"], sort=True)
            .agg(
                n_events=(ts_col, "size"),
                value_sum_c=("_c", "sum"),
                session_start=(ts_col, "min"),
            )
            .reset_index()
        )
        out["session_start"] = out["session_start"].dt.strftime("%Y-%m-%d %H:%M:%S")
        return out[[key, "session_id", "session_start", "n_events", "value_sum_c"]]

    out_schema = pa.schema(
        [
            (key, _arrow_types(ds.schema())[key]),
            ("session_id", pa.int64()),
            ("session_start", pa.string()),
            ("n_events", pa.int64()),
            ("value_sum_c", pa.int64()),
        ]
    )
    return partitioned_map(ds, [key], sessionize, out_schema=out_schema)


def native_join(left: rd.Dataset, right: rd.Dataset, key: str,
                num_partitions: int = 16, how: str = "inner") -> rd.Dataset:
    """Ray Data's built-in hash-partitioned join (Ray >= 2.46).  Prefer
    this when available; :func:`hash_join` is the portable explicit
    fallback with the same semantics."""
    return left.join(right, join_type=how, num_partitions=num_partitions, on=(key,))


def _union_bucketer(key: str, side: int, all_cols: Sequence[str], types: dict,
                    num_buckets: int, drop_null_keys: bool = False,
                    salt: int = 1):
    """map_batches kernel shared by the three two-sided joins
    (hash_join / asof_join / range_join): pad each side to the typed
    union schema (typed nulls for the absent side so one-sided bucket
    groups keep the full column set), tag ``_bucket`` = key-hash %
    num_buckets and ``_side``.  ``drop_null_keys=True`` filters
    null-key rows up front (SQL inner-join semantics: NULL matches
    nothing) — it also keeps nulls out of the integer fast path, whose
    NaN→uint64 cast is undefined.

    ``salt > 1`` splits every key-bucket into ``salt`` sub-buckets for
    HOT-KEY skew (SURVEY.md §4): LEFT rows spread round-robin across
    the sub-buckets (each left row lands in exactly one), RIGHT rows
    replicate into all of them — so a key whose left occurrences are
    30% of the corpus fans across ``salt`` merge tasks instead of one
    straggler, at the cost of ``salt``× the (small) right side's
    shuffle volume.  Join semantics are unchanged: every left row still
    meets every right row of its key exactly once."""
    from ..hashing import xxh64_many

    def fn(tbl: pa.Table) -> pa.Table:
        kcol = tbl.column(key)
        if drop_null_keys and kcol.null_count:
            tbl = tbl.filter(pc.is_valid(kcol))
            kcol = tbl.column(key)
        if pa.types.is_integer(kcol.type):
            if kcol.null_count:  # non-dropping caller: pin nulls to bucket 0
                kcol = pc.fill_null(kcol, 0)
            kb = (kcol.to_numpy(zero_copy_only=False).astype(np.uint64)) % np.uint64(num_buckets)
        else:
            kb = xxh64_many(pc.cast(kcol.combine_chunks(), pa.string())) % np.uint64(num_buckets)
        for c in all_cols:
            if c not in tbl.column_names:
                tbl = tbl.append_column(c, pa.nulls(tbl.num_rows, types[c]))
        tbl = tbl.select(all_cols)
        if salt > 1:
            if side == 0:
                sub = np.arange(tbl.num_rows, dtype=np.uint64) % np.uint64(salt)
                kb = kb * np.uint64(salt) + sub
            else:
                tbl = pa.concat_tables([tbl] * salt)
                kb = np.concatenate(
                    [kb * np.uint64(salt) + np.uint64(j) for j in range(salt)])
        return tbl.append_column("_bucket", pa.array(kb.astype(np.int64))).append_column(
            "_side", pa.array(np.full(tbl.num_rows, side, dtype=np.int8))
        ).replace_schema_metadata(None)  # unhashable-schema hygiene

    return fn


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    num_buckets: int = 32,
    how: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    broadcast_rows: int = 500_000,
    broadcast_bytes: int = 64 << 20,
    salt: int = 1,
) -> rd.Dataset:
    """Explicit partitioned hash join with an ADAPTIVE broadcast path.

    The right side is materialized first (its consumers all execute it
    anyway); when it fits ``broadcast_rows`` AND ``broadcast_bytes`` it
    is ``ray.put`` once and every LEFT batch joins against it in place
    (one Acero join per batch) — the left side never shuffles at all,
    which is the correct 100 TB regime for dimension-sized right sides
    (dup-hash sets, min-rank maps, lookup tables).  Larger right sides
    fall back to the two-sided bucket shuffle: both sides bucket by
    ``xxhash64(key) % B``, co-group, one Acero merge per bucket.
    Skewed keys on the shuffle path: pass ``salt > 1`` to split every
    key-bucket into ``salt`` sub-buckets (left spreads, right
    replicates — see :func:`_union_bucketer`); results are identical,
    the hot bucket's merge fans across ``salt`` tasks (SURVEY.md §4).
    The broadcast path is skew-immune (no shuffle), so ``salt`` only
    affects the large-right regime.  See also :func:`native_join`.

    ``how``: 'inner' or 'left'.  SQL null-key semantics both ways:
    inner drops null keys on both sides; left drops them on the RIGHT
    only (null-key left rows come back null-padded).  Other join
    types: use :func:`native_join`."""
    if how not in ("inner", "left"):
        raise ValueError(f"hash_join supports how='inner'/'left', got {how!r}"
                         " — use native_join for other types")
    # explicit schemas let callers with statically-known columns skip
    # Ray's schema fetch (a limit-1 execution of the upstream chain,
    # which returns None — and would crash below — on fully-empty
    # grouped inputs)
    lschema = left_schema if left_schema is not None else left.schema()
    rschema = right_schema if right_schema is not None else right.schema()
    lcols = list(lschema.names)
    rcols = [key] + [c for c in rschema.names if c != key and c not in lcols]
    # union schema (typed): every block carries every column (typed nulls
    # for the absent side) so a bucket group that happens to contain only
    # one side's rows still has the full column set after the shuffle.
    types = _arrow_types(rschema)
    types.update(_arrow_types(lschema))
    all_cols = lcols + [c for c in rcols if c not in lcols]

    out_cols = lcols + [c for c in rcols if c != key]
    out_schema = pa.schema([pa.field(c, types[c]) for c in out_cols])
    rcast = pa.schema([pa.field(c, types[c]) for c in rcols])
    jtype = "inner" if how == "inner" else "left outer"

    # ---- adaptive broadcast path -------------------------------------
    rmat = right.materialize()
    if (rmat.count() <= broadcast_rows
            and rmat.size_bytes() <= broadcast_bytes):
        rtab = pa.concat_tables(
            [b.select(rcols).cast(rcast) for b in rmat.iter_batches(
                batch_size=None, batch_format="pyarrow")]
            or [rcast.empty_table()])
        rtab = rtab.filter(pc.is_valid(rtab.column(key)))  # SQL nulls
        rref = ray.put(rtab.combine_chunks())

        def join_batch(lt_batch: pa.Table) -> pa.Table:
            lg = lt_batch.select(lcols)
            if how == "inner" and lg.column(key).null_count:
                lg = lg.filter(pc.is_valid(lg.column(key)))
            j = lg.combine_chunks().join(ray.get(rref), keys=key,
                                         join_type=jtype)
            return (j.select(out_cols).cast(out_schema)
                     .replace_schema_metadata(None))

        return left.map_batches(join_batch, batch_format="pyarrow")

    # ---- two-sided bucket shuffle ------------------------------------
    # inner: null keys match nothing, drop both sides; left: keep
    # null-key LEFT rows (they null-pad) but drop null-key right rows
    # so pandas' NaN==NaN merge can't fabricate a match
    lt = left.map_batches(
        _union_bucketer(key, 0, all_cols, types, num_buckets,
                        drop_null_keys=(how == "inner"), salt=salt),
        batch_format="pyarrow")
    rt = rmat.map_batches(
        _union_bucketer(key, 1, all_cols, types, num_buckets,
                        drop_null_keys=True, salt=salt),
        batch_format="pyarrow")

    # map_groups runs in PYARROW format so Ray's machinery emits empty
    # partitions as empty ARROW blocks (empty blocks bypass map UDFs, so
    # pandas empties would otherwise leak into Arrow datasets and crash
    # later unions/sort samplers); merge emits the FIXED output schema
    # (one-sided groups would otherwise drop the absent side's columns).
    # The per-bucket merge is pure Arrow (Acero hash join) — ~4x faster
    # than the former pandas round-trip and no int64→float64 hazard.
    # Null join keys match nothing in Acero (SQL semantics), so 'left'
    # null-key left rows come back null-padded, same as before.
    def merge(gt: pa.Table) -> pa.Table:
        side = gt.column("_side")
        lg = gt.filter(pc.equal(side, 0)).select(lcols).combine_chunks()
        rg = gt.filter(pc.equal(side, 1)).select(rcols).combine_chunks()
        j = lg.join(rg, keys=key,
                    join_type="inner" if how == "inner" else "left outer")
        return (j.select(out_cols).cast(out_schema)
                 .replace_schema_metadata(None))

    return lt.union(rt).groupby("_bucket").map_groups(merge, batch_format="pyarrow")


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_by: str,
    left_on: str,
    right_by: str,
    right_on: str,
    right_cols: Sequence[str],
    lo,
    hi,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Interval (range) join: emit every (left, right) pair with matching
    key and ``left_on + lo <= right_on < left_on + hi`` (lo inclusive,
    hi exclusive; ``lo``/``hi`` are anything addable to the on-column,
    e.g. ``pd.Timedelta``).  INNER semantics — unmatched left rows drop.

    Shape: both sides hash-bucket by key (the equi-key bounds fan-out;
    this is the Spark-style key-bucketed range join), and each bucket
    matches ALL its keys in one vectorized kernel: right rows sort by
    (key-code, on) and collapse to a composite int64 ``code·(n+1) +
    dense_rank(on)``; each left bound maps onto the same rank scale via
    searchsorted, so two more searchsorted calls yield every left row's
    [lo_idx, hi_idx) right slice — no per-key python loop, no cross
    join.  Correctness of the rank mapping: for bound t, rank(t) =
    #\\{right on-values < t\\}, so a right row r is inside [t+lo, t+hi)
    iff rank(t+lo) <= dense_rank(r) < rank(t+hi) (strictness falls out
    of r itself being counted) — pinned by the brute-force randomized
    test."""
    lschema = left.schema()
    lcols = list(lschema.names)
    rkeep = [right_by, right_on] + [c for c in right_cols if c not in (right_by, right_on)]
    right = right.select_columns(rkeep)
    types = _arrow_types(right.schema())
    types.update(_arrow_types(lschema))
    rextra = [c for c in rkeep if c not in lcols]
    all_cols = lcols + rextra

    # inner semantics: NULL keys match nothing (and must not share the
    # factorize -1 sentinel group in the merge kernel) — drop up front
    lt = left.map_batches(
        _union_bucketer(left_by, 0, all_cols, types, num_buckets, drop_null_keys=True),
        batch_format="pyarrow")
    rt = right.map_batches(
        _union_bucketer(right_by, 1, all_cols, types, num_buckets, drop_null_keys=True),
        batch_format="pyarrow")
    out_cols = lcols + [c for c in rextra if c != right_by]
    out_schema = pa.schema([pa.field(c, types[c]) for c in out_cols])

    def as_i64(arr: np.ndarray) -> np.ndarray:
        # datetimes normalize to ONE unit before the int view: pandas
        # `ts + Timedelta` arithmetic yields ns while Arrow columns come
        # back as us — mixed-scale views would silently match nothing
        if np.issubdtype(arr.dtype, np.datetime64):
            return arr.astype("datetime64[ns]").astype(np.int64)
        return arr.astype(np.int64)

    def merge(gt: pa.Table) -> pa.Table:
        # pure Arrow/numpy (the asof_join kernel's shape): split sides
        # with an Arrow filter (no pandas int64→float64 null hazard),
        # dictionary-encode the concatenated keys for codes, then the
        # composite-rank searchsorted construction; gather via take
        side = gt.column("_side")
        lg = gt.filter(pc.equal(side, 0)).select(lcols).combine_chunks()
        rg = gt.filter(pc.equal(side, 1)).select(rkeep).combine_chunks()
        if lg.num_rows == 0 or rg.num_rows == 0:
            return out_schema.empty_table()

        lk = lg.column(left_by).combine_chunks()
        rk = pc.cast(rg.column(right_by).combine_chunks(), lk.type)
        codes = pc.dictionary_encode(pa.concat_arrays([lk, rk])).indices
        codes = codes.to_numpy(zero_copy_only=False).astype(np.int64)
        lc, rc = codes[: lg.num_rows], codes[lg.num_rows:]
        r_on = as_i64(rg.column(right_on).to_numpy(zero_copy_only=False))
        order = np.lexsort((r_on, rc))
        rc_s, rt_s = rc[order], r_on[order]
        all_sorted = np.sort(rt_s)
        n = len(rt_s)
        comp_r = rc_s * np.int64(n + 1) + np.searchsorted(all_sorted, rt_s, "left")
        l_on = lg.column(left_on).to_pandas()  # Series: datetime + Timedelta
        b_lo = as_i64((l_on + lo).to_numpy())
        b_hi = as_i64((l_on + hi).to_numpy())
        lo_idx = np.searchsorted(
            comp_r, lc * np.int64(n + 1) + np.searchsorted(all_sorted, b_lo, "left"), "left")
        hi_idx = np.searchsorted(
            comp_r, lc * np.int64(n + 1) + np.searchsorted(all_sorted, b_hi, "left"), "left")
        counts = hi_idx - lo_idx
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        li = np.repeat(np.arange(lg.num_rows), counts)
        intra = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        ri = order[np.repeat(lo_idx, counts) + intra]
        out = lg.take(pa.array(li, pa.int64()))
        rsel = rg.take(pa.array(ri, pa.int64()))
        for c in rextra:
            if c != right_by:
                out = out.append_column(c, rsel.column(c))
        return (out.select(out_cols).cast(out_schema)
                .replace_schema_metadata(None))

    return lt.union(rt).groupby("_bucket").map_groups(merge, batch_format="pyarrow")


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_by: str,
    left_on: str,
    right_by: str,
    right_on: str,
    right_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
    num_buckets: int = 32,
) -> rd.Dataset:
    """As-of join: each left row gets the single right row with the
    GREATEST ``right_on`` <= ``left_on`` among rows whose ``right_by``
    matches ``left_by`` (the streaming "latest state as of event time"
    join; left rows with no eligible right row keep typed nulls).

    Shape: both sides hash-bucket by key (one shuffle each), and every
    bucket matches ALL its keys in one vectorized Arrow/numpy kernel —
    the same composite-rank searchsorted construction as
    :func:`range_join` (no pandas round-trip): right rows sort by
    (key-code, on, *tiebreak) and collapse to ``code·(n+1) +
    dense_rank(on)``; each left probe maps t → #{right on <= t} on the
    same rank scale, and ``searchsorted(..., 'left') - 1`` lands on the
    last eligible right row of the probe's key run.  Equal ``right_on``
    ties therefore resolve to the MAX of ``tiebreak`` — pass a unique
    column to pin a deterministic winner, mirroring a SQL
    ``row_number() OVER (ORDER BY right_on DESC, tiebreak DESC)`` pick.
    Null keys / null on-values on either side match nothing (SQL
    semantics); unmatched left rows keep typed nulls."""
    lschema = left.schema()
    lcols = list(lschema.names)
    rkeep = [right_by, right_on] + [c for c in right_cols if c not in (right_by, right_on)]
    right = right.select_columns(rkeep)
    types = _arrow_types(right.schema())
    types.update(_arrow_types(lschema))
    rextra = [c for c in rkeep if c not in lcols]  # right-side output cols
    all_cols = lcols + rextra

    lt = left.map_batches(_union_bucketer(left_by, 0, all_cols, types, num_buckets),
                          batch_format="pyarrow")
    rt = right.map_batches(_union_bucketer(right_by, 1, all_cols, types, num_buckets),
                           batch_format="pyarrow")
    out_cols = lcols + [c for c in rextra if c != right_by]
    out_schema = pa.schema([pa.field(c, types[c]) for c in out_cols])
    rout = [c for c in rextra if c != right_by]

    def as_i64(arr: np.ndarray) -> np.ndarray:
        # datetime columns normalize to ONE unit before the int view
        # (Arrow yields us, pandas arithmetic yields ns)
        if np.issubdtype(arr.dtype, np.datetime64):
            return arr.astype("datetime64[ns]").astype(np.int64)
        return arr.astype(np.int64)

    def merge(gt: pa.Table) -> pa.Table:
        side = gt.column("_side")
        lg = gt.filter(pc.equal(side, 0)).select(lcols).combine_chunks()
        if lg.num_rows == 0:
            return out_schema.empty_table()
        rg = gt.filter(pc.equal(side, 1)).select(rkeep).combine_chunks()
        # null right keys / on-values can never match — drop up front
        rg = rg.filter(pc.and_(pc.is_valid(rg.column(right_by)),
                               pc.is_valid(rg.column(right_on))))

        def pad_unmatched() -> pa.Table:
            out = lg
            for c in rout:
                out = out.append_column(c, pa.nulls(lg.num_rows, types[c]))
            return (out.select(out_cols).cast(out_schema)
                    .replace_schema_metadata(None))

        if rg.num_rows == 0:
            return pad_unmatched()
        lk = lg.column(left_by).combine_chunks()
        rk = pc.cast(rg.column(right_by).combine_chunks(), lk.type)
        codes = pc.dictionary_encode(pa.concat_arrays([lk, rk])).indices
        codes = codes.to_numpy(zero_copy_only=False)
        if codes.dtype.kind == "f":  # null left keys decode to NaN
            lvalid = ~np.isnan(codes[:lg.num_rows])
            codes = np.nan_to_num(codes)
        else:
            lvalid = np.ones(lg.num_rows, bool)
        lc = np.where(lvalid, codes[:lg.num_rows], -1).astype(np.int64)
        rc = codes[lg.num_rows:].astype(np.int64)  # null-free (filtered)

        r_on = as_i64(rg.column(right_on).to_numpy(zero_copy_only=False))
        tb = [rg.column(c).to_numpy(zero_copy_only=False) for c in tiebreak]
        order = np.lexsort((*reversed(tb), r_on, rc))
        rc_s, rt_s = rc[order], r_on[order]
        all_sorted = np.sort(rt_s)
        n = len(rt_s)
        comp_r = rc_s * np.int64(n + 1) + np.searchsorted(all_sorted, rt_s, "left")

        l_on_col = lg.column(left_on)
        if l_on_col.null_count:
            lvalid &= pc.is_valid(l_on_col).combine_chunks().to_numpy(
                zero_copy_only=False)
        l_on = as_i64(pc.fill_null(
            l_on_col, pa.scalar(0, l_on_col.type)
        ).combine_chunks().to_numpy(zero_copy_only=False))
        # rank(t) = #{right on <= t}: a right row r is eligible iff
        # rank_left(r.on) < rank(t)  (see range_join's rank-mapping note)
        r_rank = np.searchsorted(all_sorted, l_on, "right")
        pos = np.searchsorted(comp_r, lc * np.int64(n + 1) + r_rank, "left")
        idx = pos - 1
        safe = np.clip(idx, 0, None)
        matched = lvalid & (idx >= 0) & (rc_s[safe] == lc)
        take = pa.array(order[safe].astype(np.int64), mask=~matched)
        rsel = rg.take(take)
        out = lg
        for c in rout:
            out = out.append_column(c, rsel.column(c))
        return (out.select(out_cols).cast(out_schema)
                .replace_schema_metadata(None))

    return lt.union(rt).groupby("_bucket").map_groups(merge, batch_format="pyarrow")


def prefix_sum(ds: rd.Dataset, order_col: str, val_col: str,
               out_col: str = "running", exclusive: bool = True,
               assume_range_partitioned: bool = False) -> rd.Dataset:
    """Distributed SCAN: running sum of ``val_col`` in ``order_col``
    order — SQL ``SUM(val) OVER (ORDER BY order ROWS BETWEEN UNBOUNDED
    PRECEDING AND {1 PRECEDING | CURRENT ROW})``.  The primitive behind
    token-budget sequence packing / byte-offset assignment in a
    training-data shard writer (no reference analog; the reference's
    single-threaded record loops get running offsets for free —
    `/root/reference/src/org/commoncrawl/examples/WARCReaderTest.java`
    consumes records strictly in arrival order).

    Shape: range-sort (skipped when the caller guarantees the input is
    already range-partitioned on ``order_col``), materialize, then TWO
    passes over the SAME blocks: (1) per-block ``(min(order), sum(val))``
    partials — one tiny row per block — exclusive-scanned on the driver,
    (2) per-block local ``cumsum`` plus the block's global offset looked
    up by its min-order fingerprint.  Nothing but the partials ever
    leaves the workers; no shuffle beyond the sort.

    ``order_col`` values must be unique (duplicate BLOCK MINIMA are
    rejected — with duplicates the running sum is tie-order dependent,
    exactly as the SQL window is); any orderable type works (the
    partials keep the column's native type).  ``val_col`` must be
    integral — a float running sum is summation-order dependent and has
    no exact distributed form.  Output: input columns + ``out_col``
    (int64)."""
    if not assume_range_partitioned:
        ds = ds.sort(order_col)
    ds = ds.materialize()
    order_type = _arrow_types(ds.schema())[order_col]

    def block_stat(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({"_mn": pa.array([], order_type),
                             "_mx": pa.array([], order_type),
                             "_sum": pa.array([], pa.int64())})
        mm = pc.min_max(tbl.column(order_col))
        s = pc.sum(tbl.column(val_col))
        return pa.table({
            "_mn": pa.array([mm["min"].as_py()], order_type),
            "_mx": pa.array([mm["max"].as_py()], order_type),
            "_sum": pa.array([int(s.as_py() or 0)], pa.int64()),
        })

    # batch_size=None: batch == block, so pass 2 sees the SAME units;
    # take_all()'s python values hash identically to pass 2's as_py()
    # keys for every orderable type (numpy/pandas round-trips don't)
    rows = ds.map_batches(block_stat, batch_format="pyarrow",
                          batch_size=None).take_all()
    offsets: dict = {}
    if rows:
        rows.sort(key=lambda r: r["_mn"])
        mns = [r["_mn"] for r in rows]
        if len(set(mns)) != len(mns):
            raise ValueError(
                "prefix_sum: duplicate block-minimum order values — "
                f"{order_col!r} must be unique for a deterministic scan")
        for prev, cur in zip(rows, rows[1:]):
            # blocks must cover DISJOINT order ranges, else the
            # per-block local cumsum is silently wrong — this is the
            # guard that makes assume_range_partitioned safe to offer
            if prev["_mx"] >= cur["_mn"]:
                raise ValueError(
                    "prefix_sum: block order ranges overlap "
                    f"([..., {prev['_mx']!r}] vs [{cur['_mn']!r}, ...]) — "
                    "input is not range-partitioned on "
                    f"{order_col!r}; drop assume_range_partitioned")
        acc = 0
        for r in rows:
            offsets[r["_mn"]] = acc
            acc += int(r["_sum"])

    def scan_block(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return tbl.append_column(out_col, pa.array([], pa.int64()))
        base = offsets[pc.min(tbl.column(order_col)).as_py()]
        # the sort's blocks are range-partitioned but rows inside a
        # block may arrive unsorted from the merge — order locally
        ov = tbl.column(order_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ov, kind="stable")
        vv = tbl.column(val_col).to_numpy(zero_copy_only=False).astype(
            np.int64)[order]
        run = base + vv.cumsum()
        if exclusive:
            run = run - vv
        out = np.empty(len(run), np.int64)
        out[order] = run
        return tbl.append_column(out_col, pa.array(out))

    return ds.map_batches(scan_block, batch_format="pyarrow",
                          batch_size=None)
