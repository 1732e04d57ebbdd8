"""Driver-contract implementations: ``entry()`` / ``queries()`` /
``oracle_sql()`` bodies (see ``__ray_entry__.py``).

Each query pairs a Ray Data pipeline with an ANSI-SQL oracle DuckDB runs
on the same parquet (SURVEY.md §5 e).  Conventions that keep the
driver's order-insensitive value-hash comparison exact:

- float aggregates are integer-ized per row BEFORE summing:
  ``floor(x*100 + 0.5)`` → int64 cents, identically in numpy and SQL
  (fp summation-order drift would otherwise flip rounded digits);
- per-row floats (cosines) are rounded to 5 decimals on both sides;
- timestamps are emitted as formatted strings on both sides;
- every computed column is named identically in the Ray code and the
  SQL (``AS`` aliases).

Queries with no SQL-expressible oracle (crawl flagship, WARC parsing,
MinHash/SimHash, langid...) are checked rows-only by the driver and by
pytest goldens instead.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from . import lancelite, synth
from .ops import (ann, clean, curation, dedup, features, forest, graph,
                  relational, sampling, text)
from .pipelines import classics, crawl as crawl_pipeline

# EXACTLY RE2's \s class ([\t\n\f\r ]) as DuckDB regexes see it — python
# \s (even with re.ASCII) also matches \v, which RE2 does not
_WS_RE = re.compile(r"[ \t\n\f\r]+")


def _strip_meta(tbl: pa.Table) -> pa.Table:
    """Drop the b'pandas' schema-metadata blob that pandas-written parquet
    (incl. the driver's testdata) attaches to every read block: schemas
    with metadata are unhashable, which defeats Ray's schema-dedup early
    exit and warns per unify.  Metadata-only — zero-copy, and fused into
    the first downstream map stage."""
    return tbl.replace_schema_metadata(None)


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    ).map_batches(_strip_meta, batch_format="pyarrow")


def _pq(sf_dir: str, table: str, columns=None) -> pa.Table:
    """Driver-side read for small dimension tables only."""
    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _query_vecs(sf_dir: str, n: int = 3) -> dict:
    """ANN query vectors (vec_id < n) — one pruned driver-side read,
    shared by the brute-force / IVF / LSH ANN queries."""
    t = _pq(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    t = t.filter(pa.compute.less(t.column("vec_id"), n))
    return {
        int(i): v
        for i, v in zip(t.column("vec_id").to_pylist(),
                        t.column("embedding").to_pylist())
    }


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


def _r5(x):
    """Deterministic 5-decimal rounding identical in numpy and DuckDB:
    floor(x*1e5 + 0.5)/1e5 (np.round / SQL round() disagree on .5 ties
    — half-even vs half-away)."""
    return np.floor(np.asarray(x, dtype=np.float64) * 100000.0 + 0.5) / 100000.0


# ---------------------------------------------------------------------------
# SQL-checked queries
# ---------------------------------------------------------------------------

def q_word_count(sf_dir: str) -> pa.Table:
    """A1/M7: word frequency over documents.text (WET word-count shape)."""
    docs = _read(sf_dir, "documents", columns=["text"])

    def explode(tbl: pa.Table) -> pa.Table:
        words: list[str] = []
        for t in tbl.column("text").to_pylist():
            words.extend(w for w in _WS_RE.split(t or "") if w)
        return pa.table({"word": pa.array(words, pa.string())})

    out = relational.grouped_count(
        docs.map_batches(explode, batch_format="pyarrow"), ["word"], alias="cnt"
    )
    return out.to_pandas().sort_values("word").reset_index(drop=True)


SQL_WORD_COUNT = """
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word ORDER BY word
"""


def q_doc_stats(sf_dir: str) -> pa.Table:
    """A4/A5: per-(lang, source) count + char sum."""
    docs = _read(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(tbl: pa.Table) -> pa.Table:
        return (
            tbl.group_by(["lang", "source"])
            .aggregate([([], "count_all"), ("n_chars", "sum")])
            .rename_columns(["lang", "source", "_pc", "_ps"])
        )

    from ray.data.aggregate import Sum

    out = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source"])
        .aggregate(Sum("_pc", alias_name="cnt"), Sum("_ps", alias_name="sum_chars"))
    )
    return out.to_pandas().sort_values(["lang", "source"]).reset_index(drop=True)


SQL_DOC_STATS = """
SELECT lang, source, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang, source ORDER BY lang, source
"""


def q_top_users(sf_dir: str) -> pd.DataFrame:
    """O1/O2 top-k: top 10 users by total event value (integer cents)."""
    ev = _read(sf_dir, "events", columns=["user_id", "value"])

    def partial(tbl: pa.Table) -> pa.Table:
        c = _cents(tbl.column("value").to_numpy())
        t = pa.table({"user_id": tbl.column("user_id"), "c": pa.array(c)})
        return t.group_by(["user_id"]).aggregate([("c", "sum")]).rename_columns(
            ["user_id", "_p"]
        )

    from ray.data.aggregate import Sum

    totals = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("_p", alias_name="total_value_c"))
    ).to_pandas()
    return (
        totals.sort_values(["total_value_c", "user_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


SQL_TOP_USERS = """
SELECT user_id, CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_value_c
FROM events GROUP BY user_id
ORDER BY total_value_c DESC, user_id LIMIT 10
"""


def q_first_doc_per_lang(sf_dir: str) -> pd.DataFrame:
    """A3/O7 first-per-key: lowest doc_id per language."""
    docs = _read(sf_dir, "documents", columns=["lang", "doc_id"])
    out = relational.first_per_key(docs, "lang", "doc_id").to_pandas()
    return out[["lang", "doc_id"]].sort_values("lang").reset_index(drop=True)


SQL_FIRST_DOC_PER_LANG = """
SELECT lang, min(doc_id) AS doc_id FROM documents GROUP BY lang ORDER BY lang
"""


def q_source_threshold(sf_dir: str) -> pd.DataFrame:
    """O6 threshold filter: sources with >= 20 documents."""
    docs = _read(sf_dir, "documents", columns=["source"])
    out = relational.threshold_filter(docs, ["source"], 20, alias="cnt").to_pandas()
    return out.sort_values("source").reset_index(drop=True)


SQL_SOURCE_THRESHOLD = """
SELECT source, count(*) AS cnt FROM documents GROUP BY source
HAVING count(*) >= 20 ORDER BY source
"""


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """A1/A2 wide aggregate (TPC-H Q1 shape) over lineitem, integer cents."""
    li = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(tbl: pa.Table) -> pa.Table:
        qty = tbl.column("l_quantity").to_numpy()
        price = tbl.column("l_extendedprice").to_numpy()
        disc = tbl.column("l_discount").to_numpy()
        t = pa.table(
            {
                "l_returnflag": tbl.column("l_returnflag"),
                "l_linestatus": tbl.column("l_linestatus"),
                "q": pa.array(_cents(qty)),
                "bp": pa.array(_cents(price)),
                "dp": pa.array(_cents(price * (1.0 - disc))),
            }
        )
        return (
            t.group_by(["l_returnflag", "l_linestatus"])
            .aggregate([("q", "sum"), ("bp", "sum"), ("dp", "sum"), ([], "count_all")])
            .rename_columns(["l_returnflag", "l_linestatus", "_q", "_bp", "_dp", "_n"])
        )

    from ray.data.aggregate import Sum

    out = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("_q", alias_name="sum_qty_c"),
            Sum("_bp", alias_name="sum_base_price_c"),
            Sum("_dp", alias_name="sum_disc_price_c"),
            Sum("_n", alias_name="cnt"),
        )
    ).to_pandas()
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
       CAST(sum(CAST(floor(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
       count(*) AS cnt
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_asia_customers(sf_dir: str) -> pd.DataFrame:
    """J1 broadcast semi-join: customers per nation within region ASIA."""
    region = _pq(sf_dir, "region")
    nation = _pq(sf_dir, "nation")
    asia_key = [
        r for r, n in zip(region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist())
        if n == "ASIA"
    ][0]
    nk2name = dict(
        zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist())
    )
    asia_nations = [
        nk for nk, rk in zip(
            nation.column("n_nationkey").to_pylist(), nation.column("n_regionkey").to_pylist()
        ) if rk == asia_key
    ]
    cust = _read(sf_dir, "customer", columns=["c_nationkey"])
    ref = ray.put(asia_nations)
    sub = relational.broadcast_semi_join(cust, "c_nationkey", ref)
    counts = relational.grouped_count(sub, ["c_nationkey"], alias="n_customers").to_pandas()
    counts["n_name"] = counts["c_nationkey"].map(nk2name)
    return counts[["n_name", "n_customers"]].sort_values("n_name").reset_index(drop=True)


SQL_ASIA_CUSTOMERS = """
SELECT n_name, count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name
"""


def q_parts_never_hiqty(sf_dir: str) -> pd.DataFrame:
    """J3 broadcast anti-join: parts never shipped with quantity >= 48."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    hi = li.filter(expr="l_quantity >= 48").unique("l_partkey")
    ref = ray.put(hi)
    part = _read(sf_dir, "part", columns=["p_partkey"])
    out = relational.broadcast_anti_join(part, "p_partkey", ref).to_pandas()
    return out.sort_values("p_partkey").reset_index(drop=True)


SQL_PARTS_NEVER_HIQTY = """
SELECT p_partkey FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 48)
ORDER BY p_partkey
"""


def q_events_asof_orders(sf_dir: str) -> pd.DataFrame:
    """As-of join: every event picks its user's LATEST order at or
    before the event timestamp (equal-orderdate ties → max o_orderkey);
    unmatched events keep sentinel -1 so the compare never crosses a
    nullable-int boundary.  Oracle: LEFT JOIN + row_number window."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    od = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = relational.asof_join(
        ev, od, left_by="user_id", left_on="ts",
        right_by="o_custkey", right_on="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"], tiebreak=["o_orderkey"],
    ).to_pandas()
    out["o_orderkey"] = out["o_orderkey"].fillna(-1).astype("int64")
    out["o_totalprice"] = out["o_totalprice"].fillna(-1.0)
    return out[["event_id", "user_id", "o_orderkey", "o_totalprice"]].sort_values(
        "event_id"
    ).reset_index(drop=True)


SQL_EVENTS_ASOF_ORDERS = """
SELECT event_id, user_id,
       coalesce(o_orderkey, -1) AS o_orderkey,
       coalesce(o_totalprice, -1.0) AS o_totalprice
FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1 ORDER BY event_id
"""


def q_event_bursts(sf_dir: str) -> pd.DataFrame:
    """Range (interval) self-join: pairs of events by the same user
    where the second lands within [0, 5min) of the first — the
    burst-detection join.  Oracle: plain JOIN + BETWEEN."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    right = ev.map_batches(
        lambda t: t.rename_columns(["b_event_id", "b_ts", "r_user"]),
        batch_format="pyarrow",
    )
    out = relational.range_join(
        ev, right, left_by="user_id", left_on="ts",
        right_by="r_user", right_on="b_ts", right_cols=["b_event_id"],
        lo=pd.Timedelta(0), hi=pd.Timedelta("5min"),
    ).to_pandas()
    out = out[out["event_id"] != out["b_event_id"]]
    return out[["event_id", "b_event_id"]].sort_values(
        ["event_id", "b_event_id"]
    ).reset_index(drop=True)


SQL_EVENT_BURSTS = """
SELECT a.event_id, b.event_id AS b_event_id
FROM events a JOIN events b
  ON b.user_id = a.user_id AND b.event_id <> a.event_id
 AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 5 MINUTE
ORDER BY 1, 2
"""


def q_event_windows(sf_dir: str) -> pd.DataFrame:
    """§2.8 streaming analog: tumbling 1-hour windows per event_type."""
    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    HOUR_US = 3_600_000_000

    def assign(tbl: pa.Table) -> pa.Table:
        # keep the window key as a TIMESTAMP through the shuffle — the
        # per-row strftime string build is the batch kernel's hot spot
        # and only the tiny aggregated result needs formatting.  Arrow
        # end-to-end: epoch-aligned int64 floor (== dt.floor('h') for
        # post-1970 ts) + a pyarrow group_by, no pandas conversion.
        if tbl.column("ts").null_count:  # NaT int64-wraps into a phantom window
            tbl = tbl.filter(pa.compute.is_valid(tbl.column("ts")))
        ts_i = tbl.column("ts").combine_chunks().to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        ws = (ts_i - ts_i % HOUR_US).astype("datetime64[us]")
        c = np.floor(tbl.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        t = pa.table({"event_type": tbl.column("event_type"),
                      "window_start": pa.array(ws), "c": pa.array(c)})
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("c", "sum"), ("c", "count")])
        return g.rename_columns(["event_type", "window_start", "_ps", "_pn"])

    from ray.data.aggregate import Sum

    out = (
        ev.map_batches(assign, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("_ps", alias_name="value_sum_c"), Sum("_pn", alias_name="n_events"))
    ).to_pandas()
    out["window_start"] = out["window_start"].dt.strftime("%Y-%m-%d %H:%M:%S")
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


SQL_EVENT_WINDOWS = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_sum_c,
       count(*) AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_event_hopping(sf_dir: str) -> pd.DataFrame:
    """Hopping (sliding) windows: 1-hour windows every 15 minutes — each
    event lands in exactly window/hop = 4 windows.  The explode happens
    inside the batch kernel (np.repeat, no flat_map rows through the
    driver), then the same partial-sum + grouped-Sum shape as the
    tumbling query."""
    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    n_hops = 4  # 1h window / 15min hop

    Q_US = 900_000_000  # 15 min

    def assign(tbl: pa.Table) -> pa.Table:
        if tbl.column("ts").null_count:  # NaT int64-wraps into a phantom window
            tbl = tbl.filter(pa.compute.is_valid(tbl.column("ts")))
        n = tbl.num_rows
        ts_i = tbl.column("ts").combine_chunks().to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        base = ts_i - ts_i % Q_US  # epoch-aligned 15-min floor, int64 µs
        c = np.floor(tbl.column("value").to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        k = np.tile(np.arange(n_hops, dtype=np.int64), n)
        ws = (np.repeat(base, n_hops) - k * Q_US).astype("datetime64[us]")
        et = tbl.column("event_type").take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), n_hops)))
        t = pa.table({"event_type": et, "window_start": pa.array(ws),
                      "c": pa.array(np.repeat(c, n_hops))})
        g = t.group_by(["event_type", "window_start"]).aggregate(
            [("c", "sum"), ("c", "count")])
        return g.rename_columns(["event_type", "window_start", "_ps", "_pn"])

    from ray.data.aggregate import Sum

    out = (
        ev.map_batches(assign, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("_ps", alias_name="value_sum_c"), Sum("_pn", alias_name="n_events"))
    ).to_pandas()
    out["window_start"] = out["window_start"].dt.strftime("%Y-%m-%d %H:%M:%S")
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


# every event belongs to windows starting at bucket(ts) - k*hop for
# k = 0..3: bucket(ts) <= ts < bucket+hop implies ws <= ts < ws + 1h
# for all four, so no containment filter is needed
SQL_EVENT_HOPPING = """
SELECT event_type,
       strftime(time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_sum_c,
       count(*) AS n_events
FROM events CROSS JOIN unnest([0, 1, 2, 3]) AS t(k)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_session_windows(sf_dir: str) -> pd.DataFrame:
    """§2.8 streaming: 30-minute-gap session windows per user."""
    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    out = relational.session_windows(ev, "user_id", "ts", "30min", "value").to_pandas()
    return out.sort_values(["user_id", "session_id"]).reset_index(drop=True)


SQL_SESSION_WINDOWS = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
), sess AS (
  SELECT user_id, ts, value,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, value
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_sum_c
FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def q_union_nationkeys(sf_dir: str) -> pd.DataFrame:
    """O10 set union: distinct nation keys appearing on customers or suppliers."""
    cust = _read(sf_dir, "customer", columns=["c_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow"
    )
    supp = _read(sf_dir, "supplier", columns=["s_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow"
    )
    keys = sorted(cust.union(supp).unique("nationkey"))
    return pd.DataFrame({"nationkey": pd.array(keys, dtype="int32")})


SQL_UNION_NATIONKEYS = """
SELECT c_nationkey AS nationkey FROM customer
UNION SELECT s_nationkey FROM supplier ORDER BY nationkey
"""


def q_exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """O7 exact dedup: lowest doc_id per distinct text."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup.exact_dedup(docs, "text", "doc_id").to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


SQL_EXACT_DEDUP_DOCS = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id
"""


def q_doc_token_counts(sf_dir: str) -> pd.DataFrame:
    """M7 tokenizer: whitespace-token count per document."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(
        lambda t: text.token_counts(t), batch_format="pyarrow"
    ).to_pandas()
    return out[["doc_id", "n_ws_tokens"]].sort_values("doc_id").reset_index(drop=True)


# list_filter drops the empty tokens that leading/trailing whitespace
# produces (trim() only strips SPACES — a doc starting with \t or \n
# would otherwise count a phantom token)
SQL_DOC_TOKEN_COUNTS = """
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n_ws_tokens
FROM documents ORDER BY doc_id
"""


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Similarity search: exact cosine top-5 for query vectors vec_id<3."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ann.brute_force_topk(ds, _query_vecs(sf_dir), k=5)
    out["cosine_r"] = _r5(out["cosine"])
    return out[["query_id", "vec_id", "cosine_r", "rank"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


SQL_ANN_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 3),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS cos
      FROM q CROSS JOIN embeddings e),
r AS (SELECT query_id, vec_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
      FROM s)
SELECT query_id, vec_id, floor(cos * 100000 + 0.5) / 100000 AS cosine_r, rank
FROM r WHERE rank <= 5 ORDER BY query_id, rank
"""


def q_embedding_pairs(sf_dir: str) -> pd.DataFrame:
    """Embedding near-dup pairs: exact cosine >= 0.4 (brute-force verify path)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = dedup.brute_force_pairs(ds, threshold=0.4)
    out["cosine_r"] = _r5(out["cosine"])
    return out[["id_a", "id_b", "cosine_r"]].sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_EMBEDDING_PAIRS = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       floor(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 100000 + 0.5) / 100000 AS cosine_r
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
ORDER BY id_a, id_b
"""


def q_crawl_schedule(sf_dir: str) -> pd.DataFrame:
    """North-rule scheduler semantics, SQL-checkable: a frontier derived
    from documents (one URL per doc, host = doc_id % 20) is scheduled by
    the politeness rule fetch_time = host_index * crawl_delay(host).
    The Ray path uses the same per-host groupby scheduling as the crawl
    pipeline; the oracle expresses it as a SQL window function."""
    from .ops.relational import partitioned_map

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    delays = np.array([0, 150, 500, 1000], dtype=np.int64)

    def schedule(g: pd.DataFrame) -> pd.DataFrame:
        # partition-local, many whole host-groups per call (bounded
        # partition count — no one-pandas-group-per-host at frontier
        # scale), vectorized per-host cumcount
        g = g.sort_values(["host", "seed_rank"], kind="mergesort").reset_index(drop=True)
        g["host_index"] = g.groupby("host", sort=False).cumcount().astype(np.int64)
        g["fetch_time_ms"] = (
            g["host_index"].to_numpy() * delays[g["hostnum"].to_numpy() % 4]
        )
        return g

    def mk(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy()
        hostnum = (ids % 20).astype(np.int64)
        return pa.table(
            {
                "seed_rank": pa.array(ids.astype(np.int64)),
                "hostnum": pa.array(hostnum),
                "host": pa.array([f"host{int(k):04d}.example" for k in hostnum], pa.string()),
            }
        )

    sched_schema = pa.schema(
        [("seed_rank", pa.int64()), ("hostnum", pa.int64()), ("host", pa.string()),
         ("host_index", pa.int64()), ("fetch_time_ms", pa.int64())]
    )
    out = partitioned_map(
        docs.map_batches(mk, batch_format="pyarrow"), ["host"], schedule,
        out_schema=sched_schema,
    ).to_pandas()
    return out[["seed_rank", "host", "host_index", "fetch_time_ms"]].sort_values(
        ["fetch_time_ms", "seed_rank"]
    ).reset_index(drop=True)


SQL_CRAWL_SCHEDULE = """
WITH seeds AS (
  SELECT doc_id AS seed_rank,
         'host' || lpad(CAST(doc_id % 20 AS VARCHAR), 4, '0') || '.example' AS host,
         (doc_id % 20) % 4 AS d
  FROM documents
), ranked AS (
  SELECT seed_rank, host,
         row_number() OVER (PARTITION BY host ORDER BY seed_rank) - 1 AS host_index,
         CASE d WHEN 0 THEN 0 WHEN 1 THEN 150 WHEN 2 THEN 500 ELSE 1000 END AS delay
  FROM seeds
)
SELECT seed_rank, host, host_index, host_index * delay AS fetch_time_ms
FROM ranked ORDER BY fetch_time_ms, seed_rank
"""


def q_orders_by_segment(sf_dir: str) -> pd.DataFrame:
    """Distributed hash join (bucketed, both sides large): orders ⋈
    customer on custkey → order count + cents sum per market segment."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["o_custkey", "c_mktsegment"])

    cust = cust.map_batches(rename, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = relational.hash_join(orders, cust, "o_custkey", num_buckets=16)

    def partial(tbl: pa.Table) -> pa.Table:
        c = np.floor(
            tbl.column("o_totalprice").to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        t = pa.table({"c_mktsegment": tbl.column("c_mktsegment"), "c": pa.array(c)})
        g = t.group_by(["c_mktsegment"]).aggregate([("c", "sum"), ("c", "count")])
        return g.rename_columns(["c_mktsegment", "_ps", "_pn"])

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("_ps", alias_name="total_price_c"), Sum("_pn", alias_name="n_orders"))
    ).to_pandas()
    return out.sort_values("c_mktsegment").reset_index(drop=True)


SQL_ORDERS_BY_SEGMENT = """
SELECT c_mktsegment,
       CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS total_price_c,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_brand_quantity(sf_dir: str) -> pd.DataFrame:
    """Ray Data's native hash join (Dataset.join): lineitem ⋈ part on
    partkey → total quantity per brand (integer cents)."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])

    def prep_li(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t.column("l_partkey"),
                "qty_c": pa.array(_cents(t.column("l_quantity").to_numpy())),
            }
        )

    li = li.map_batches(prep_li, batch_format="pyarrow")
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    joined = relational.native_join(li, part, "p_partkey", num_partitions=8)
    out = relational.grouped_sum(joined, ["p_brand"], "qty_c", alias="sum_qty_c").to_pandas()
    return out.sort_values("p_brand").reset_index(drop=True)


SQL_BRAND_QUANTITY = """
SELECT p_brand,
       CAST(sum(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_c
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""


def q_stratified_docs(sf_dir: str) -> pd.DataFrame:
    """O5 class-balanced sampling: the 10 lowest-doc_id documents per
    language (deterministic winner rule)."""
    from .ops import sampling

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    out = sampling.stratified_sample(docs, "lang", "doc_id", per_class=10).to_pandas()
    return out[["lang", "doc_id"]].sort_values(["lang", "doc_id"]).reset_index(drop=True)


SQL_STRATIFIED_DOCS = """
SELECT lang, doc_id FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY doc_id) <= 10
ORDER BY lang, doc_id
"""


# ---------------------------------------------------------------------------
# Rows-only queries (non-SQL-expressible; pytest goldens cover semantics)
# ---------------------------------------------------------------------------

_STORE_CACHE = "/tmp/ccwarc_store_cache"
_STORE_N = 500


def _store() -> lancelite.LanceLiteTable:
    t = lancelite.LanceLiteTable(_STORE_CACHE)
    if not t.exists():
        t.write(synth.images_table(_STORE_N))
    return t


# Mixed-format store for the image-payload decode queries: png/jpg/bmp/
# gif/jfif rotation (real GIF-LZW + real baseline JFIF decode paths).
# Kept separate from the crawl content store so the fetch/decode hot
# path's per-row budget is unchanged.  Path is round-versioned: the
# store content is an input to write-once /tmp fixtures.
_MIXED_STORE_CACHE = "/tmp/ccwarc_mixed_store_v5"
_MIXED_N = 300


def _mixed_store() -> lancelite.LanceLiteTable:
    t = lancelite.LanceLiteTable(_MIXED_STORE_CACHE)
    if not t.exists():
        t.write(synth.mixed_images_table(_MIXED_N))
    return t


def _decode_batches(ds: rd.Dataset, fn, nblocks: int = 24, **kw) -> rd.Dataset:
    """map_batches for a DECODE stage over the content store:
    repartition the scan to ``nblocks`` and run one task per block
    (``batch_size=None``).  The store fixture is one ~1 MB fragment;
    Ray's read splits it into ~64 five-row blocks and the map stage's
    default batch coalescing re-bundles those into a couple of big
    serial tasks — at 6-30 ms/image of GIF-LZW / JFIF entropy decode
    that serializes the whole stage.  An explicit ~300/24-row block
    shape gives 24 even tasks with per-task overhead ≪ one image's
    decode.  At 100 TB the store has thousands of fragments and the
    read supplies the parallelism; the ~1 MB repartition here is the
    fixture-scale stand-in, not a scale cost."""
    return ds.repartition(nblocks).map_batches(
        fn, batch_format="pyarrow", batch_size=None, **kw)


def _sf_scale(sf_dir: str) -> int:
    return pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows


# deterministic WARC fixture, parquet-ized so DuckDB oracles can read it.
# Fixed size (sf-independent): oracle_sql() returns static SQL strings.
_WARC_FIXTURE = "/tmp/ccwarc_warc_fixture.parquet"
_WARC_N = 1000
_PHASH_FIXTURE = "/tmp/ccwarc_phash_fixture.parquet"


def _fixture_once(path: str, build) -> str:
    """Write-once /tmp parquet fixture shared by a Ray query and its
    (static) oracle SQL: ``build() -> pa.Table`` runs only when the file
    is absent.  Every fixture is a pure function of the global seed /
    on-disk data, so racing writers produce the same content — each
    writes a pid-unique tmp file and ``os.replace``s it atomically."""
    if not os.path.exists(path):
        tmp = f"{path}.{os.getpid()}.tmp"
        pq.write_table(build(), tmp)
        os.replace(tmp, path)
    return path


def _ensure_warc_fixture() -> str:
    """WARC-records fixture (plus a ``payload_text`` column = payload
    decoded utf-8/replace, the form SQL string functions can process)."""
    def build() -> pa.Table:
        t = synth.warc_records_table(_WARC_N)
        txt = [p.decode("utf-8", errors="replace") for p in t.column("payload").to_pylist()]
        return t.append_column("payload_text", pa.array(txt, pa.string()))

    return _fixture_once(_WARC_FIXTURE, build)


def _ensure_phash_fixture() -> str:
    """(image_id, phash) of the content store, for the pHash SQL oracle."""
    return _fixture_once(
        _PHASH_FIXTURE, lambda: _store().to_table().select(["image_id", "phash"]))


_WEIGHTS_FIXTURE = "/tmp/ccwarc_trained_weights.parquet"
# dict-insertion order = the ensemble's fp summation order; the SQL
# oracle embeds the same terms left to right (see _sql_media_classify)
_TRAIN_FEATURES = ("attr_w", "attr_h", "url_w", "url_h", "alt_len", "elem_img",
                   "same_domain", "dom_depth", "dom_sib", "suffix_gif")


def _ensure_weights_fixture() -> str:
    """Persisted classifier coefficients (WekaTrainer.java:23-47 analog):
    one-pass ridge least-squares over the deterministic labeled training
    corpus (synth.media_training_table — offline, sf-independent, like
    the IVF centroid fixture).  Pure function of the global seed; the
    no-Ray trainer path keeps oracle_sql() Ray-free."""
    def build() -> pa.Table:
        from .ops import features

        t = synth.media_training_table(4000)
        w, b = features.train_feature_weights(t, list(_TRAIN_FEATURES))
        return pa.table({
            "feature": pa.array(list(_TRAIN_FEATURES) + ["__bias__"], pa.string()),
            "weight": pa.array([w[c] for c in _TRAIN_FEATURES] + [b], pa.float64()),
        })

    return _fixture_once(_WEIGHTS_FIXTURE, build)


def _trained_weights() -> tuple[dict, float]:
    """Load (weights dict in training order, bias) from the fixture."""
    t = pq.read_table(_ensure_weights_fixture())
    m = dict(zip(t.column("feature").to_pylist(), t.column("weight").to_pylist()))
    return {c: m[c] for c in _TRAIN_FEATURES}, m["__bias__"]


_FRONTIER_FIXTURE = "/tmp/ccwarc_frontier_fixture.parquet"
_FRONTIER_N = 2000
_FRONTIER_HOSTS = 20
_FRONTIER_EPOCHS = 4


def _ensure_frontier_fixture() -> str:
    """Seed-URL fixture for the flagship-crawl oracle: the raw
    (seed_url, page_url, seed_rank) frontier — www./whitespace/:80
    disguises, ../-relative URLs, post-canonicalization duplicates —
    exactly as fed to ``run_crawl``.  Fixed size (sf-independent), pure
    function of the global seed; the SQL oracle re-derives canonical
    URLs, first-seen dedup, the robots gate, per-host politeness times
    and epoch assignment from these raw strings independently."""
    return _fixture_once(
        _FRONTIER_FIXTURE,
        lambda: synth.frontier_seeds_table(_FRONTIER_N, n_hosts=_FRONTIER_HOSTS))


_IVF_FIXTURE = "/tmp/ccwarc_ivf_centroids.parquet"
_IVF_TRAIN_SF = "/root/testdata/sf0.001"  # fixed content at every sf run


def _ensure_ivf_fixture() -> str:
    """IVF coarse centroids (list_id, vec) trained ONCE on the fixed
    sf0.001 embeddings sample — sf-independent, so the static oracle SQL
    can read them while the Ray side indexes any sf's corpus (training
    on a fixed sample corpus is standard IVF practice; the per-query
    probe/assignment/ranking semantics are what the oracle verifies
    independently).  Pure function of on-disk data — race-safe."""
    def build() -> pa.Table:
        cent = ann.kmeans_centroids(_train_embeddings(), n_centroids=16,
                                    iters=10, seed=5)
        return pa.table({
            "list_id": pa.array(np.arange(len(cent), dtype=np.int64)),
            "vec": pa.array([row.tolist() for row in cent],
                            pa.list_(pa.float64())),
        })

    return _fixture_once(_IVF_FIXTURE, build)


def _train_embeddings() -> np.ndarray:
    """The fixed sf0.001 embedding sample every centroid/codebook
    fixture trains on (sf-independent content)."""
    emb = pq.read_table(os.path.join(_IVF_TRAIN_SF, "embeddings.parquet"),
                        columns=["embedding"])
    return np.asarray(emb.column("embedding").to_pylist()[:2000], dtype=np.float64)


_LSH_FIXTURE = "/tmp/ccwarc_lsh_planes.parquet"
_LSH_BITS = 8


def _ensure_lsh_fixture() -> str:
    """Random-hyperplane matrix (bit_id, vec) for the LSH-ANN path —
    pure function of the seed + the (fixed) embedding dim, written once
    so the static oracle SQL can recompute every vector's sign sketch
    independently.  Race-safe tmp+rename like the IVF fixture."""
    def build() -> pa.Table:
        dim = _train_embeddings().shape[1]
        planes = ann.lsh_planes(dim, bits=_LSH_BITS, seed=11)  # [dim, bits]
        return pa.table({
            "bit_id": pa.array(np.arange(_LSH_BITS, dtype=np.int64)),
            "vec": pa.array([planes[:, b].tolist() for b in range(_LSH_BITS)],
                            pa.list_(pa.float64())),
        })

    return _fixture_once(_LSH_FIXTURE, build)


def q_lsh_ann(sf_dir: str) -> pd.DataFrame:
    """Multiprobe hyperplane-LSH ANN (Charikar 2002 sketch, Lv 2007
    multiprobe): corpus sign-sketched against the fixture hyperplanes,
    each query scores only vectors within 1 bit flip of its own bucket.
    The oracle recomputes sketching, probing, scoring and ranking in SQL
    from the same plane fixture."""
    planes_t = pq.read_table(_ensure_lsh_fixture())
    planes = np.asarray(planes_t.column("vec").to_pylist(), dtype=np.float64).T
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assigned = ann.lsh_assign(ds, planes)
    out = ann.lsh_topk(assigned, planes, _query_vecs(sf_dir), k=5, max_hamming=1)
    out["cosine_r"] = _r5(out["cosine"])
    return out[["query_id", "vec_id", "cosine_r", "rank"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


SQL_LSH_ANN = f"""
WITH planes AS (SELECT bit_id, vec FROM read_parquet('{_LSH_FIXTURE}')),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL),
sk AS (
  SELECT e.vec_id,
         sum(CASE WHEN list_inner_product(p.vec, e.v) > 0
                  THEN (1::BIGINT << p.bit_id) ELSE 0 END)::BIGINT AS bucket
  FROM emb e CROSS JOIN planes p GROUP BY e.vec_id
),
q AS (
  SELECT e.vec_id AS query_id, e.v AS qv, s.bucket AS qbucket
  FROM emb e JOIN sk s ON s.vec_id = e.vec_id WHERE e.vec_id < 3
),
cand AS (
  SELECT q.query_id, s.vec_id, list_cosine_similarity(q.qv, e.v) AS cos
  FROM q
  JOIN sk s ON bit_count(xor(s.bucket, q.qbucket)) <= 1
  JOIN emb e ON e.vec_id = s.vec_id
),
r AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
  FROM cand
)
SELECT query_id, vec_id, floor(cos * 100000 + 0.5) / 100000 AS cosine_r, rank
FROM r WHERE rank <= 5 ORDER BY query_id, rank
"""


def q_discovery_crawl(sf_dir: str) -> pd.DataFrame:
    """Two-level discovery crawl (pages → extracted media → image fetch)
    over the fixed WARC fixture as the page store, DuckDB-checked on the
    crawl-order surface: the oracle re-derives level-0 admission +
    schedule, per-page DOM media extraction WITH positions (the
    deterministic discovered-rank assignment), level-1 resolution /
    first-seen dedup, and the cross-level per-host politeness counters.
    ``url_hash`` (xxhash64) and ``image_id`` (xxh64 fallback — the
    discovered media paths miss the fast-path regex) are excluded."""
    import tempfile

    from .pipelines.discovery import run_discovery_crawl

    path = _ensure_warc_fixture()
    warc = pq.read_table(path, columns=["record_url"])
    urls = warc.column("record_url").to_pylist()
    seeds = pa.table(
        {
            "seed_url": pa.array(urls, pa.string()),
            "page_url": pa.array([""] * len(urls), pa.string()),
            "seed_rank": pa.array(np.arange(len(urls), dtype=np.int64)),
        }
    )
    store = _store()
    out = tempfile.mkdtemp(prefix="discq_")
    run = run_discovery_crawl(
        seeds, synth.robots_table(20), [path], store.fragment_paths(), out,
        num_shards=4, store_size=_STORE_N,
    )
    df = run.order_table().to_pandas()
    return df[["epoch", "fetch_time_ms", "seed_rank", "host", "host_index",
               "url"]].reset_index(drop=True)


# Level-0 seeds are the (already-canonical) record urls, whose embedded
# page index IS the seed rank; discovered media resolve root-relative
# srcs against the page host.  Politeness counters persist across the
# two levels, so host_index is a single window over the union.
SQL_DISCOVERY_CRAWL = f"""
WITH rec AS (SELECT * FROM read_parquet('{_WARC_FIXTURE}')),
seeds AS (
  SELECT record_url AS url,
         CAST(regexp_extract(record_url, 'page(\\d+)\\.html', 1) AS BIGINT) AS seed_rank,
         regexp_extract(record_url, '^http://([^/]+)', 1) AS host
  FROM rec
),
resp AS (
  SELECT record_url, payload_text,
         strpos(payload_text, chr(13)||chr(10)||chr(13)||chr(10)) AS p
  FROM rec WHERE mime = 'application/http; msgtype=response'
),
hb AS (
  SELECT record_url,
         CASE WHEN p > 0 THEN substr(payload_text, 1, p - 1) ELSE '' END AS header,
         CASE WHEN p > 0 THEN substr(payload_text, p + 4) ELSE payload_text END AS body
  FROM resp
),
html AS (SELECT record_url, body FROM hb WHERE contains(header, 'Content-Type: text/html')),
frags AS (
  SELECT record_url, unnest(l) AS frag, generate_subscripts(l, 1) AS i
  FROM (SELECT record_url, string_split(substr(body, 42), '<') AS l FROM html)
),
media AS (
  SELECT record_url, i, regexp_extract(frag, 'src="([^"]*)"', 1) AS src
  FROM frags WHERE frag LIKE 'img %'
  UNION ALL
  SELECT record_url, i, regexp_extract(frag, 'href="([^"]*)"', 1)
  FROM frags WHERE frag LIKE 'a %'
    AND regexp_matches(regexp_extract(frag, 'href="([^"]*)"', 1),
        '\\.(jpe?g|png|gif|bmp|tiff?|svg|webp|mp4|avi|mov|mpe?g|wmv)([?#].*)?$', 'i')
),
ordered AS (
  SELECT m.record_url, m.src, s.seed_rank AS parent_rank,
         row_number() OVER (PARTITION BY m.record_url ORDER BY m.i) - 1 AS intra
  FROM media m JOIN seeds s ON s.url = m.record_url
),
disc AS (
  SELECT (SELECT count(*) FROM rec)
           + row_number() OVER (ORDER BY parent_rank, intra) - 1 AS seed_rank,
         CASE WHEN src LIKE 'http://%' THEN src
              ELSE 'http://' || regexp_extract(record_url, '^http://([^/]+)', 1) || src
         END AS url
  FROM ordered
),
lvl1 AS (
  SELECT seed_rank, url, regexp_extract(url, '^http://([^/]+)', 1) AS host
  FROM disc
),
allrows AS (
  SELECT 0 AS epoch, seed_rank, url, host FROM seeds
  UNION ALL
  SELECT 1, seed_rank, url, host FROM lvl1
),
admitted AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY seed_rank) AS rn
    FROM allrows
  ) WHERE rn = 1
),
sched AS (
  SELECT epoch, seed_rank, url, host,
         row_number() OVER (PARTITION BY host ORDER BY seed_rank) - 1 AS host_index,
         CASE CAST(substr(host, 5, 4) AS INT) % 4
           WHEN 0 THEN 0 WHEN 1 THEN 150 WHEN 2 THEN 500 ELSE 1000 END AS delay
  FROM admitted
)
SELECT epoch, CAST(host_index * delay AS BIGINT) AS fetch_time_ms, seed_rank,
       host, host_index, url
FROM sched ORDER BY epoch, fetch_time_ms, seed_rank
"""


def q_crawl_flagship(sf_dir: str) -> pd.DataFrame:
    """The flagship crawl over the fixed frontier fixture, DuckDB-checked
    end-to-end on the crawl-order surface: the REAL pipeline (per-epoch
    canonicalization, pipelined sharded cuckoo admission, robots gate,
    per-host politeness schedule, epoched checkpoint/commit machinery)
    runs over raw disguised seed URLs; the oracle reconstructs canonical
    urls, first-seen dedup, the disallow gate, host_index/fetch_time_ms
    and epoch bounds from the same raw strings with string functions +
    window functions.  ``url_hash`` (xxhash64) is excluded — SQL cannot
    recompute it; every other order column, including the derived
    ``image_id``, is compared."""
    import tempfile

    seeds = pq.read_table(_ensure_frontier_fixture())
    store = _store()
    robots = synth.robots_table(_FRONTIER_HOSTS)
    out = tempfile.mkdtemp(prefix="crawlq_")
    run = crawl_pipeline.run_crawl(
        seeds, robots, store.fragment_paths(), out,
        num_shards=4, num_epochs=_FRONTIER_EPOCHS, store_size=_STORE_N,
        concurrency=(1, 4),
    )
    df = run.order_table().to_pandas()
    return df[["epoch", "fetch_time_ms", "seed_rank", "host", "host_index",
               "url", "image_id"]].reset_index(drop=True)


# Canonicalization of the fixture's disguise classes in SQL: strip all
# whitespace; resolve ../-relatives against the page directory (collapse
# /seg/../ repeatedly — fixture depth <= 2, four passes are ample);
# strip a leading www. and an explicit :80 default port.  Mirrors
# functions/urls.py _canon_one for the URL shapes synth emits.
SQL_CRAWL_FLAGSHIP = f"""
WITH raw AS (
  SELECT seed_rank,
         regexp_replace(seed_url, '\\s+', '', 'g') AS u0,
         regexp_replace(page_url, '\\s+', '', 'g') AS p0
  FROM read_parquet('{_FRONTIER_FIXTURE}')
),
abs AS (
  SELECT seed_rank,
         CASE WHEN u0 NOT LIKE '%://%'
              THEN regexp_replace(p0, '[^/]*$', '') || u0
              ELSE u0 END AS u1
  FROM raw
),
res AS (
  SELECT seed_rank,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           u1, '/[^/.][^/]*/\\.\\./', '/'), '/[^/.][^/]*/\\.\\./', '/'),
           '/[^/.][^/]*/\\.\\./', '/'), '/[^/.][^/]*/\\.\\./', '/') AS u2
  FROM abs
),
canon AS (
  SELECT seed_rank,
         regexp_replace(regexp_replace(u2, '^http://www\\.', 'http://'),
                        '^http://([^/:]+):80/', 'http://\\1/') AS url
  FROM res
),
parts AS (
  SELECT seed_rank, url,
         regexp_extract(url, '^http://([^/]+)', 1) AS host,
         regexp_extract(url, '^http://[^/]+(/.*)$', 1) AS path,
         CAST(substr(regexp_extract(url, '^http://([^/]+)', 1), 5, 4) AS INT) AS hk
  FROM canon
),
gated AS (
  SELECT * FROM parts
  WHERE NOT (hk % 10 = 3 AND path LIKE '/private/%')
),
admitted AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY url ORDER BY seed_rank) AS rn
    FROM gated
  ) WHERE rn = 1
),
sched AS (
  SELECT seed_rank, url, host, path,
         (seed_rank * {_FRONTIER_EPOCHS}) // {_FRONTIER_N} AS epoch,
         row_number() OVER (PARTITION BY host ORDER BY seed_rank) - 1 AS host_index,
         CASE hk % 4 WHEN 0 THEN 0 WHEN 1 THEN 150 WHEN 2 THEN 500 ELSE 1000 END AS delay
  FROM admitted
)
SELECT epoch, CAST(host_index * delay AS BIGINT) AS fetch_time_ms, seed_rank,
       host, host_index, url,
       'img-' || lpad(CAST(CAST(regexp_extract(path, '[ip](\\d+)\\.[A-Za-z0-9]+$', 1) AS BIGINT)
                           % {_STORE_N} AS VARCHAR), 10, '0') AS image_id
FROM sched ORDER BY epoch, fetch_time_ms, seed_rank
"""

# continuous mode shares the flagship's schedule spec verbatim — only
# the batch-specific epoch column drops (ONE oracle source of truth;
# the asserts pin that both rewrites took effect)
SQL_CRAWL_STREAMING = SQL_CRAWL_FLAGSHIP.replace(
    "SELECT epoch, CAST(host_index * delay AS BIGINT) AS fetch_time_ms",
    "SELECT CAST(host_index * delay AS BIGINT) AS fetch_time_ms",
).replace(
    "FROM sched ORDER BY epoch, fetch_time_ms, seed_rank",
    "FROM sched ORDER BY fetch_time_ms, seed_rank",
)
assert "SELECT epoch" not in SQL_CRAWL_STREAMING
assert "ORDER BY fetch_time_ms" in SQL_CRAWL_STREAMING


def q_crawl_streaming(sf_dir: str) -> pd.DataFrame:
    """North-rule CONTINUOUS mode over the same frontier fixture,
    DuckDB-checked: the min-heap priority-queue scheduler
    (`state/frontier_shard.py` enqueue/next_batch_arrays, drained by
    `pipelines/streaming.py` with the round-pipelined committer) must
    emit the SAME admission set and politeness schedule the flagship
    oracle derives analytically — fetch_time_ms, host_index, and the
    derived image_id all compare; only the batch pipeline's epoch
    column is absent (streaming partitions by drain round)."""
    import tempfile

    from .pipelines.streaming import run_streaming_crawl

    seeds = pq.read_table(_ensure_frontier_fixture())
    store = _store()
    robots = synth.robots_table(_FRONTIER_HOSTS)
    out = tempfile.mkdtemp(prefix="crawlsq_")
    run = run_streaming_crawl(
        seeds, robots, store.fragment_paths(), out,
        num_shards=4, store_size=_STORE_N, batch_urls=256,
    )
    df = run.crawl_order.to_table().to_pandas().sort_values(
        ["fetch_time_ms", "seed_rank"])
    return df[["fetch_time_ms", "seed_rank", "host", "host_index",
               "url", "image_id"]].reset_index(drop=True)


def _warc(sf_dir: str) -> rd.Dataset:
    """The WARC-records fixture as a Dataset (binary ``payload`` column —
    the Ray pipelines never touch ``payload_text``, that column exists
    for the SQL oracles)."""
    path = _ensure_warc_fixture()
    return rd.read_parquet(path, columns=["record_url", "warc_type", "mime", "payload"])


def q_warc_tag_counts(sf_dir: str) -> pd.DataFrame:
    return classics.tag_counts(_warc(sf_dir)).to_pandas().sort_values("tag").reset_index(drop=True)


# TagCounterMap.java:27,55-60 semantics: response records whose HTTP
# header declares text/html; tag = first token of a non-closing element.
# RE2 has no lookahead — `<([^\s>/][^\s>]*)[^>]*>` is `<(?!/)([^\s>]+)`
# restated (only the FIRST char is guarded in both).
SQL_WARC_TAG_COUNTS = f"""
WITH rec AS (SELECT * FROM read_parquet('{_WARC_FIXTURE}')),
resp AS (
  SELECT payload_text, strpos(payload_text, chr(13)||chr(10)||chr(13)||chr(10)) AS p
  FROM rec WHERE mime = 'application/http; msgtype=response'
),
hb AS (
  SELECT CASE WHEN p > 0 THEN substr(payload_text, 1, p - 1) ELSE '' END AS header,
         CASE WHEN p > 0 THEN substr(payload_text, p + 4) ELSE payload_text END AS body
  FROM resp
),
tags AS (
  SELECT unnest(regexp_extract_all(body, '<([^\\s>/][^\\s>]*)[^>]*>', 1)) AS tag
  FROM hb WHERE contains(header, 'Content-Type: text/html')
)
SELECT lower(tag) AS tag, count(*) AS cnt FROM tags GROUP BY 1 ORDER BY 1
"""


def q_warc_word_counts(sf_dir: str) -> pd.DataFrame:
    return classics.word_counts(_warc(sf_dir)).to_pandas().sort_values("word").reset_index(drop=True)


SQL_WARC_WORD_COUNTS = f"""
SELECT word, count(*) AS cnt FROM (
  SELECT unnest(string_split_regex(payload_text, '\\s+')) AS word
  FROM read_parquet('{_WARC_FIXTURE}') WHERE mime = 'text/plain'
) WHERE word <> '' GROUP BY 1 ORDER BY 1
"""


def q_warc_server_counts(sf_dir: str) -> pd.DataFrame:
    return classics.server_counts(_warc(sf_dir)).to_pandas().sort_values("server").reset_index(drop=True)


SQL_WARC_SERVER_COUNTS = f"""
SELECT server, count(*) AS cnt FROM (
  SELECT json_extract_string(payload_text,
    '$.Envelope."Payload-Metadata"."HTTP-Response-Metadata".Headers.Server') AS server
  FROM read_parquet('{_WARC_FIXTURE}') WHERE mime = 'application/json'
) WHERE server IS NOT NULL GROUP BY 1 ORDER BY 1
"""


def q_warc_job_counters(sf_dir: str) -> pd.DataFrame:
    return classics.job_counters(_warc(sf_dir)).to_pandas().sort_values("counter").reset_index(drop=True)


SQL_WARC_JOB_COUNTERS = f"""
WITH rec AS (SELECT * FROM read_parquet('{_WARC_FIXTURE}'))
SELECT 'RECORDS_IN' AS counter, count(*)::BIGINT AS total FROM rec
UNION ALL
SELECT 'EMPTY_PAGE_TEXT', count(*)::BIGINT FROM rec
WHERE mime = 'text/plain' AND trim(payload_text) = ''
UNION ALL
SELECT 'NO_SERVER', count(*)::BIGINT FROM rec
WHERE mime = 'application/json' AND json_extract_string(payload_text,
  '$.Envelope."Payload-Metadata"."HTTP-Response-Metadata".Headers.Server') IS NULL
UNION ALL
SELECT 'NON_PLAIN_TEXT', count(*)::BIGINT FROM rec
WHERE mime NOT IN ('text/plain', 'application/json', 'application/http; msgtype=response')
ORDER BY counter
"""


def q_media_extract(sf_dir: str) -> pd.DataFrame:
    out = classics.media_extract(_warc(sf_dir)).to_pandas()
    return out.sort_values("src").reset_index(drop=True)


def q_media_src_index(sf_dir: str) -> pd.DataFrame:
    """The (src, page_url) core of media extraction after first-per-src
    dedup; kept as a separate, simpler oracle alongside the full-visitor
    SQL_MEDIA_EXTRACT below."""
    out = classics.media_extract(_warc(sf_dir)).to_pandas()
    return out[["src", "page_url"]].sort_values("src").reset_index(drop=True)


# The fixture's HTML only produces media via <img src> and <a href=media>
# (synth.py _html_body), so attribute regexes replicate the DOM visitor
# exactly for THIS corpus; first-per-src winner = min page_url
# (MediaReduce.java:12-19 made deterministic).
SQL_MEDIA_SRC_INDEX = f"""
WITH rec AS (SELECT * FROM read_parquet('{_WARC_FIXTURE}')),
resp AS (
  SELECT record_url, payload_text,
         strpos(payload_text, chr(13)||chr(10)||chr(13)||chr(10)) AS p
  FROM rec WHERE mime = 'application/http; msgtype=response'
),
hb AS (
  SELECT record_url,
         CASE WHEN p > 0 THEN substr(payload_text, 1, p - 1) ELSE '' END AS header,
         CASE WHEN p > 0 THEN substr(payload_text, p + 4) ELSE payload_text END AS body
  FROM resp
),
html AS (SELECT record_url, body FROM hb WHERE contains(header, 'Content-Type: text/html')),
srcs AS (
  SELECT unnest(regexp_extract_all(body, '<img src="([^"]*)"', 1)) AS src, record_url FROM html
  UNION ALL
  SELECT s, record_url FROM (
    SELECT unnest(regexp_extract_all(body, '<a href="([^"]*)"', 1)) AS s, record_url FROM html
  ) WHERE regexp_matches(s,
      '\\.(jpe?g|png|gif|bmp|tiff?|svg|webp|mp4|avi|mov|mpe?g|wmv)([?#].*)?$', 'i')
)
SELECT src, min(record_url) AS page_url FROM srcs GROUP BY src ORDER BY src
"""


# Full DOM-visitor oracle (fixture-aware).  The synth corpus
# (synth.py _html_body) emits a FIXED 41-char prefix
# '<html><head><title>t</title></head><body>' and flat body children, so
# the visitor's structural outputs are SQL-computable for THIS corpus:
# dom_depth = 2 (stack is [html, body] at every emit), parent_txt = ''
# (body has no direct text nodes), and dom_sib = 1-based body-child
# index = cumulative count of start-tag fragments ('<'-split fragments
# beginning with a letter; each flat child contributes exactly one).
# Winner per src = min page_url (first_per_key; (src, page_url) is
# unique in the corpus, so the winning row is fully determined).
SQL_MEDIA_EXTRACT = f"""
WITH rec AS (SELECT * FROM read_parquet('{_WARC_FIXTURE}')),
resp AS (
  SELECT record_url, payload_text,
         strpos(payload_text, chr(13)||chr(10)||chr(13)||chr(10)) AS p
  FROM rec WHERE mime = 'application/http; msgtype=response'
),
hb AS (
  SELECT record_url,
         CASE WHEN p > 0 THEN substr(payload_text, 1, p - 1) ELSE '' END AS header,
         CASE WHEN p > 0 THEN substr(payload_text, p + 4) ELSE payload_text END AS body
  FROM resp
),
html AS (SELECT record_url, body FROM hb WHERE contains(header, 'Content-Type: text/html')),
frags AS (
  SELECT record_url, unnest(l) AS frag, generate_subscripts(l, 1) AS i
  FROM (SELECT record_url, string_split(substr(body, 42), '<') AS l FROM html)
),
sib AS (
  SELECT record_url, frag,
    sum(CASE WHEN regexp_matches(frag, '^[a-z]') THEN 1 ELSE 0 END)
      OVER (PARTITION BY record_url ORDER BY i) AS dom_sib
  FROM frags
),
media AS (
  SELECT
    regexp_extract(frag, 'src="([^"]*)"', 1) AS src,
    regexp_extract(frag, 'alt="([^"]*)"', 1) AS alt,
    regexp_extract(frag, 'width="([^"]*)"', 1) AS w,
    '' AS h,
    record_url AS page_url,
    '' AS parent_txt,
    dom_sib::BIGINT AS dom_sib,
    2::BIGINT AS dom_depth,
    'img' AS dom_elem
  FROM sib WHERE frag LIKE 'img %'
  UNION ALL
  SELECT
    regexp_extract(frag, 'href="([^"]*)"', 1), '', '', '',
    record_url, '', dom_sib::BIGINT, 2::BIGINT, 'a'
  FROM sib WHERE frag LIKE 'a %'
    AND regexp_matches(regexp_extract(frag, 'href="([^"]*)"', 1),
        '\\.(jpe?g|png|gif|bmp|tiff?|svg|webp|mp4|avi|mov|mpe?g|wmv)([?#].*)?$', 'i')
)
SELECT src, alt, w, h, page_url, parent_txt, dom_sib, dom_depth, dom_elem
FROM (SELECT *, row_number() OVER (PARTITION BY src ORDER BY page_url) AS rn FROM media)
WHERE rn = 1 ORDER BY src
"""


# word-3-gram shingle set reconstruction, shared by the minhash oracles:
# tokens = \w+ of lower(text); shingles = joined 3-grams (all tokens when
# fewer than 3); Jaccard on the DISTINCT shingle sets (dedup.py
# shingle_hashes semantics).  LSH recall at the 0.8 threshold is
# 1-(1-j^4)^16 (>1-2e-4 at j=0.8); deterministic on this corpus — the
# harness verifies equality at every sf before shipping.
def _sql_jaccard_cte(threshold: float) -> str:
    """Brute-force word-3-gram shingle Jaccard over ALL doc pairs
    (``vpairs`` = every pair with j >= threshold; empty-token docs pair
    at j = 1.0, mirroring _jaccard_rows).  Shared spec for the MinHash
    (recall check at 0.8) and the exact prefix-filter join (0.7)."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS g
  FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 1, 1))) AS i
        FROM toks WHERE len(t) >= 3)
  UNION ALL
  SELECT doc_id, array_to_string(t, ' ') FROM toks WHERE len(t) BETWEEN 1 AND 2
),
dsh AS (SELECT DISTINCT doc_id, g FROM grams),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM dsh a JOIN dsh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT id_a, id_b, i::DOUBLE / (sa.n + sb.n - i) AS j
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
),
vpairs AS (
  SELECT id_a, id_b, j FROM jac WHERE j >= {threshold}
  UNION ALL
  SELECT e1.doc_id, e2.doc_id, 1.0
  FROM (SELECT doc_id FROM toks WHERE len(t) = 0) e1
  JOIN (SELECT doc_id FROM toks WHERE len(t) = 0) e2 ON e1.doc_id < e2.doc_id
)
"""


_SQL_MINHASH_PAIRS_CTE = _sql_jaccard_cte(0.8)


def q_minhash_pairs(sf_dir: str) -> pd.DataFrame:
    """Verified near-dup pairs: LSH candidates → exact shingle-Jaccard
    >= 0.8 (join-based verify, no corpus broadcast).  Docs materialized
    once — the LSH explode and the verify prune both scan them."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    pairs = dedup.minhash_lsh_pairs(docs)
    good = dedup.ngram_jaccard_verify(pairs, docs, threshold=0.8).to_pandas()
    if good.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "jaccard_r": pd.Series(dtype="float64")})
    good["jaccard_r"] = _r5(good["jaccard"])
    return good[["id_a", "id_b", "jaccard_r"]].sort_values(
        ["id_a", "id_b"]
    ).reset_index(drop=True)


SQL_MINHASH_PAIRS = _SQL_MINHASH_PAIRS_CTE + """
SELECT id_a, id_b, floor(j * 100000 + 0.5) / 100000 AS jaccard_r FROM vpairs ORDER BY id_a, id_b
"""


# incremental (continuous-crawl) dedup: the prior-corpus cutoff —
# documents below it are "already crawled", at/above are the new batch
_INC_CUT = 250


def q_incremental_dedup(sf_dir: str) -> pd.DataFrame:
    """Incremental dedup of a NEW crawl batch against the PRIOR corpus
    (the continuous-crawl admission flow: every recrawl round dedups
    its fresh documents against everything already stored).  A new doc
    (doc_id >= cut) is rejected when it is an EXACT duplicate of a
    prior doc (xxh64-of-text equality — the repo's hash-equality
    convention; prior hash set probes via the adaptive hash_join, so
    at 100 TB it hash-partitions instead of broadcasting) or a verified
    NEAR-duplicate (MinHash-LSH banding over prior+new, candidates
    filtered to cross-set, exact shingle-Jaccard >= 0.8 verify — the
    minhash_pairs machinery; a deployment persists the prior band
    buckets one lancelite fragment per band, the ops/ann.py
    persisted-index pattern, and probes only new rows; the one-pass
    banding here is semantically identical).  Output per new doc:
    (doc_id, exact_dup, near_dup, admit)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    cut = _INC_CUT
    i64 = pa.int64()

    def text_hashes(t: pa.Table) -> pa.Table:
        from .hashing import xxh64_many

        h = xxh64_many(t.column("text").to_pylist()).view(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "h": pa.array(h, i64)})

    hashed = docs.map_batches(text_hashes, batch_format="pyarrow").materialize()

    def side(lo: bool):
        def f(t: pa.Table) -> pa.Table:
            m = pc.less(t.column("doc_id"), cut)
            return t.filter(m if lo else pc.invert(m))
        return f

    prior_h = relational.grouped_agg(
        hashed.map_batches(side(True), batch_format="pyarrow")
              .select_columns(["h"]), ["h"], aggs=[])
    new_rows = hashed.map_batches(side(False), batch_format="pyarrow")
    ej = relational.hash_join(
        new_rows, prior_h, "h",
        left_schema=pa.schema([("doc_id", i64), ("h", i64)]),
        right_schema=pa.schema([("h", i64)]),
    ).to_pandas()
    # a fully-empty join loses its pandas column labels
    exact_ids = set(ej["doc_id"]) if "doc_id" in ej.columns else set()

    pairs = dedup.minhash_lsh_pairs(docs)
    cross = pairs.map_batches(
        lambda t: t.filter(pc.and_(pc.less(t.column("id_a"), cut),
                                   pc.greater_equal(t.column("id_b"), cut))),
        batch_format="pyarrow")
    good = dedup.ngram_jaccard_verify(cross, docs, threshold=0.8).to_pandas()
    near_ids = set(good["id_b"]) if len(good) else set()

    new_ids = np.sort(new_rows.to_pandas()["doc_id"].to_numpy())
    ex = np.isin(new_ids, sorted(exact_ids))
    nd = np.isin(new_ids, sorted(near_ids))
    return pd.DataFrame({
        "doc_id": new_ids,
        "exact_dup": ex,
        "near_dup": nd,
        "admit": ~(ex | nd),
    })


SQL_INCREMENTAL_DEDUP = _sql_jaccard_cte(0.8) + f"""
, ex AS (
  SELECT DISTINCT n.doc_id FROM documents n JOIN documents p
    ON p.text = n.text AND p.doc_id < {_INC_CUT} AND n.doc_id >= {_INC_CUT}
),
nd AS (
  SELECT DISTINCT id_b AS doc_id FROM vpairs
  WHERE id_a < {_INC_CUT} AND id_b >= {_INC_CUT}
)
SELECT d.doc_id,
       d.doc_id IN (SELECT doc_id FROM ex) AS exact_dup,
       d.doc_id IN (SELECT doc_id FROM nd) AS near_dup,
       NOT (d.doc_id IN (SELECT doc_id FROM ex)
            OR d.doc_id IN (SELECT doc_id FROM nd)) AS admit
FROM documents d WHERE d.doc_id >= {_INC_CUT} ORDER BY d.doc_id
"""


def q_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact n-gram Jaccard similarity self-join at t=0.7: prefix-filter
    candidate generation (SSJoin/PPJoin lemma — provably no false
    negatives, unlike the probabilistic MinHash banding) + exact shingle
    Jaccard verify.  The brute-force SQL oracle is therefore the exact
    spec of this query, not just a recall check."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    good = dedup.jaccard_join(docs, threshold=0.7).to_pandas()
    if good.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "jaccard_r": pd.Series(dtype="float64")})
    good["jaccard_r"] = _r5(good["jaccard"])
    return good[["id_a", "id_b", "jaccard_r"]].sort_values(
        ["id_a", "id_b"]
    ).reset_index(drop=True)


SQL_JACCARD_PAIRS = _sql_jaccard_cte(0.7) + """
SELECT id_a, id_b, floor(j * 100000 + 0.5) / 100000 AS jaccard_r FROM vpairs ORDER BY id_a, id_b
"""


def q_minhash_neardup(sf_dir: str) -> pd.DataFrame:
    """Near-dup components (doc_id, group_id) over the verified pairs."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    return dedup.minhash_dedup(docs, threshold=0.8).reset_index(drop=True)


SQL_MINHASH_NEARDUP = _SQL_MINHASH_PAIRS_CTE.replace(
    "WITH toks", "WITH RECURSIVE toks", 1
) + """,
sym AS (SELECT id_a AS a, id_b AS b FROM vpairs UNION SELECT id_b, id_a FROM vpairs),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
)
SELECT a AS doc_id, least(a, min(b)) AS group_id
FROM reach GROUP BY a ORDER BY doc_id
"""


def q_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    """md5-token-hash simhash (DuckDB-replicable) → Hamming<=3 pairs."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup.simhash_pairs(docs, max_hamming=3, token_hash="md5").to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_SIMHASH_PAIRS = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok FROM documents
),
th AS (SELECT doc_id, md5_number_lower(tok) AS h FROM toks),
bits AS (
  SELECT doc_id, i, CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END AS v
  FROM th CROSS JOIN range(64) t(i)
),
sums AS (SELECT doc_id, i, sum(v) AS s FROM bits GROUP BY 1, 2),
codes0 AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::UBIGINT << i) ELSE 0::UBIGINT END) AS code
  FROM sums GROUP BY 1
),
sh AS (
  SELECT d.doc_id, coalesce(c.code, 0::UBIGINT)::UBIGINT AS code
  FROM documents d LEFT JOIN codes0 c ON d.doc_id = c.doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.code, b.code))::BIGINT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.code, b.code)) <= 3
ORDER BY id_a, id_b
"""


def q_phash_neardup(sf_dir: str) -> pd.DataFrame:
    store = _store()
    _ensure_phash_fixture()
    ds = store.read_ray(columns=["image_id", "phash"])
    out = dedup.phash_neardup_groups(ds, max_hamming=2).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_PHASH_NEARDUP = f"""
WITH p AS (SELECT image_id, phash FROM read_parquet('{_PHASH_FIXTURE}'))
SELECT a.image_id AS id_a, b.image_id AS id_b,
       bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
FROM p a JOIN p b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 2
ORDER BY id_a, id_b
"""


def q_phash_groups(sf_dir: str) -> pd.DataFrame:
    """Visual near-dup GROUPS: pHash Hamming pairs →
    `ops/dedup.py:pair_components` (size-gated: driver union-find at
    this pair count; distributed min-label propagation above the 2M
    cutoff — that path is pinned against union-find by
    `test_pair_components_matches_union_find` with cutoff=0).
    Oracle: recursive-CTE transitive closure over the same pairs."""
    store = _store()
    _ensure_phash_fixture()
    ds = store.read_ray(columns=["image_id", "phash"])
    # salt>1 by default: the driver's oracle run exercises the salted
    # (fragment-replicate) path — its output is EXACTLY the unsalted
    # pair set, so the recursive-CTE closure oracle needs no change
    pairs = dedup.phash_neardup_groups(
        ds, max_hamming=2, salt=int(os.environ.get("PHASH_SALT", "2"))
    )
    out = dedup.pair_components(pairs).to_pandas()
    out = out.rename(columns={"node": "image_id"})
    return out[["image_id", "group_id"]].sort_values("image_id").reset_index(drop=True)


SQL_PHASH_GROUPS = f"""
WITH RECURSIVE p AS (SELECT image_id, phash FROM read_parquet('{_PHASH_FIXTURE}')),
vpairs AS (
  SELECT a.image_id AS id_a, b.image_id AS id_b
  FROM p a JOIN p b ON a.image_id < b.image_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 2
),
sym AS (SELECT id_a AS a, id_b AS b FROM vpairs UNION SELECT id_b, id_a FROM vpairs),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
)
SELECT a AS image_id, least(a, min(b)) AS group_id
FROM reach GROUP BY a ORDER BY image_id
"""


def q_phash_groups_dist(sf_dir: str) -> pd.DataFrame:
    """Same visual near-dup grouping, but with the DISTRIBUTED
    connected-components regime forced (``finish_cutoff=0`` — the
    large-star/small-star engine that the 100 TB path uses; default
    ``CC_ENGINE=star``, ``labelprop`` selectable).  Shares
    SQL_PHASH_GROUPS: every engine must produce identical min-id
    labels, so the driver's oracle row checks the distributed engine
    end-to-end rather than only in pytest."""
    store = _store()
    _ensure_phash_fixture()
    ds = store.read_ray(columns=["image_id", "phash"])
    pairs = dedup.phash_neardup_groups(
        ds, max_hamming=2, salt=int(os.environ.get("PHASH_SALT", "2"))
    )
    out = dedup.pair_components(pairs, finish_cutoff=0).to_pandas()
    out = out.rename(columns={"node": "image_id"})
    return out[["image_id", "group_id"]].sort_values("image_id").reset_index(drop=True)


_IMGHASH_FIXTURE = "/tmp/ccwarc_imghash_fixture_v5.parquet"


def _ensure_imghash_fixture() -> str:
    """Generator-side (no-Ray, no-store) recomputation of every MIXED
    store image's dHash/aHash: round-trip the reference pixels through
    the codec locally and hash.  The Ray query must reproduce these from
    the store's actual encoded bytes, so the oracle row checks the
    distributed decode + hash end-to-end (unlike the phash fixture,
    which both sides read as a stored column).  Round 5: runs over the
    png/jpg/bmp/gif/JFIF mixed store — a real baseline-JPEG Huffman+IDCT
    decode (jfif.py) is on both sides of the check."""
    def build() -> pa.Table:
        from . import imagecodec

        ids, dh, ah = [], [], []
        for k in range(_MIXED_N):
            fmt = synth.FMTS_MIXED[k % len(synth.FMTS_MIXED)]
            img = imagecodec.decode(
                imagecodec.encode(synth.expected_pixels(k), fmt), fmt)
            ids.append(f"img-{k:010d}")
            dh.append(np.uint64(imagecodec.dhash64(img)).view(np.int64))
            ah.append(np.uint64(imagecodec.ahash64(img)).view(np.int64))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "dhash": pa.array(dh, pa.int64()),
            "ahash": pa.array(ah, pa.int64()),
        })
    return _fixture_once(_IMGHASH_FIXTURE, build)


def _image_hash_batch(tbl: pa.Table) -> pa.Table:
    """Decode each payload and compute dHash/aHash (gradient- and
    mean-threshold visual hashes complementing the DCT pHash).  Decode
    of an opaque binary payload is inherently per-row; the codecs and
    hash kernels are numpy-vectorized internally."""
    from . import imagecodec

    blobs = tbl.column("bytes").to_pylist()
    fmts = tbl.column("fmt").to_pylist()
    dh = np.empty(len(blobs), np.uint64)
    ah = np.empty(len(blobs), np.uint64)
    for i, (b, f) in enumerate(zip(blobs, fmts)):
        img = imagecodec.decode(b, f)
        dh[i] = imagecodec.dhash64(img)
        ah[i] = imagecodec.ahash64(img)
    return pa.table({
        "image_id": tbl.column("image_id"),
        "dhash": pa.array(dh.view(np.int64)),
        "ahash": pa.array(ah.view(np.int64)),
    })


def q_image_hashes(sf_dir: str) -> pd.DataFrame:
    """Distributed decode → dHash64/aHash64 over the content store's
    encoded payloads (`map_batches`, bytes never shuffled — only the two
    int64 hash columns leave the workers).  The oracle fixture is an
    independent local recomputation from the synthetic reference pixels
    (reference decode-validate analog, `ImageUtils.java:89-132`)."""
    store = _mixed_store()
    _ensure_imghash_fixture()
    ds = store.read_ray(columns=["image_id", "bytes", "fmt"])
    out = _decode_batches(ds, _image_hash_batch).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


SQL_IMAGE_HASHES = f"""
SELECT image_id, dhash, ahash FROM read_parquet('{_IMGHASH_FIXTURE}')
ORDER BY image_id
"""


_PHASH_TOPK_K = 5
_PHASH_TOPK_NQ = 8


def q_phash_topk(sf_dir: str) -> pd.DataFrame:
    """Query-by-image visual search: brute-force Hamming top-k over the
    store's pHash column (the image-payload sibling of ann_topk's
    brute-force cosine; reference near-dup lookup analog,
    `IndexingManage.java:68-80`).  The NQ query hashes are tiny and
    broadcast via closure capture; each batch XOR-popcounts ALL its
    rows against ALL queries (table-lookup popcount, no per-row
    Python), then `topk_per_key` keeps the k nearest per query with a
    per-batch combiner — at most k rows per (query, batch) ever
    shuffle, the correct 10^10-frontier regime."""
    from . import imagecodec

    store = _store()
    fx = _ensure_phash_fixture()
    qt = pq.read_table(fx, columns=["image_id", "phash"])
    order = pc.sort_indices(qt.column("image_id"))
    qt = qt.take(order).slice(0, _PHASH_TOPK_NQ)
    qids = qt.column("image_id").to_pylist()
    qhashes = qt.column("phash").to_numpy().view(np.uint64)

    def expand(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("image_id")
        ph = tbl.column("phash").to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(ph)
        parts = []
        for qi, qh in zip(qids, qhashes):
            parts.append(pa.table({
                "query_id": pa.array([qi] * n, pa.string()),
                "image_id": ids,
                "hamming": pa.array(imagecodec.hamming64(ph, qh)),
            }))
        t = pa.concat_tables(parts)
        return t.filter(pc.invert(pc.equal(t.column("query_id"),
                                           t.column("image_id"))))

    out = relational.topk_per_key(
        store.read_ray(columns=["image_id", "phash"])
        .map_batches(expand, batch_format="pyarrow"),
        key="query_id", order_col="hamming", k=_PHASH_TOPK_K,
        descending=False, tiebreak="image_id",
    ).to_pandas()
    return (out[["query_id", "image_id", "hamming"]]
            .sort_values(["query_id", "hamming", "image_id"])
            .reset_index(drop=True))


SQL_PHASH_TOPK = """
WITH p AS (SELECT image_id, phash FROM read_parquet('{PF}')),
q AS (SELECT image_id AS query_id, phash AS qhash FROM p
      QUALIFY row_number() OVER (ORDER BY image_id) <= {NQ})
SELECT query_id, p.image_id, bit_count(xor(p.phash, q.qhash))::BIGINT AS hamming
FROM q CROSS JOIN p
WHERE p.image_id <> q.query_id
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY hamming, p.image_id) <= {K}
ORDER BY query_id, hamming, p.image_id
""".replace("{PF}", _PHASH_FIXTURE).replace(
    "{NQ}", str(_PHASH_TOPK_NQ)).replace("{K}", str(_PHASH_TOPK_K))


_AUGMENT_FIXTURE = "/tmp/ccwarc_augment_fixture_v5.parquet"
_AUG_FANOUT = ("hflip", "rot90")


def _ensure_augment_fixture() -> str:
    """No-Ray recomputation of the augmentation fan-out: start from the
    store's decoded pixels (= decode(encode(reference)) — one codec
    round-trip, matching the bytes the Ray side actually reads), apply
    each op, re-encode + re-decode in the same format (the augmented
    variant a training pipeline would persist), and hash.  The Ray query
    must reproduce ids, output dims, and dHash from the distributed
    decode → augment → encode → decode chain."""
    def build() -> pa.Table:
        from . import imagecodec
        from .stages.multimodal import augment_pixels

        ids, ws, hs, dh = [], [], [], []
        for k in range(_MIXED_N):
            fmt = synth.FMTS_MIXED[k % len(synth.FMTS_MIXED)]
            img = imagecodec.decode(
                imagecodec.encode(synth.expected_pixels(k), fmt), fmt)
            for op in _AUG_FANOUT:
                aug = augment_pixels(img, op)
                rt = imagecodec.decode(
                    imagecodec.encode(np.ascontiguousarray(aug), fmt), fmt)
                ids.append(f"img-{k:010d}#{op}")
                hs.append(np.int32(aug.shape[0]))
                ws.append(np.int32(aug.shape[1]))
                dh.append(np.uint64(imagecodec.dhash64(rt)).view(np.int64))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "dhash": pa.array(dh, pa.int64()),
        })
    return _fixture_once(_AUGMENT_FIXTURE, build)


def _augmented_dhash_batch(tbl: pa.Table) -> pa.Table:
    """Decode the (re-encoded) augmented payload and dHash it —
    validates the persisted variant, not just the in-memory pixels.
    ImageAugmenter's failure contract emits bytes=None (w/h null) for
    rows whose decode/augment failed; drop those here instead of
    letting one bad row crash the whole query."""
    from . import imagecodec

    tbl = tbl.filter(pc.is_valid(tbl.column("bytes")))
    blobs = tbl.column("bytes").to_pylist()
    fmts = tbl.column("fmt").to_pylist()
    dh = np.empty(len(blobs), np.uint64)
    for i, (b, f) in enumerate(zip(blobs, fmts)):
        dh[i] = imagecodec.dhash64(imagecodec.decode(b, f))
    return pa.table({
        "image_id": tbl.column("image_id"),
        "w": tbl.column("w"),
        "h": tbl.column("h"),
        "dhash": pa.array(dh.view(np.int64)),
    })


def q_image_augment(sf_dir: str) -> pd.DataFrame:
    """Training-data augmentation fan-out (reference decode/transform
    analog, `ImageUtils.java:89-132` + `ImageVectorization.java:156`):
    each store image → {hflip, rot90} variants via the ImageAugmenter
    actor-pool stage (decode → permute → re-encode inside the task;
    payload bytes never shuffled), then a validate pass re-decodes the
    augmented bytes and emits only (id, dims, dhash).  Oracle: the
    independent local recomputation in `_ensure_augment_fixture`."""
    from .stages.multimodal import ImageAugmenter

    store = _mixed_store()
    _ensure_augment_fixture()
    ds = store.read_ray(columns=["image_id", "bytes", "fmt", "w", "h"])
    # task pool, not an actor pool: ImageAugmenter's per-worker state is
    # just the op name (no model/index), so tasks scale elastically with
    # the scan's blocks instead of paying 2×4 actor spin-ups (the
    # actor-pool form stays the right call for stages with real state —
    # see ImageFeatureExtractor)
    variants = [
        _decode_batches(ds, ImageAugmenter(op=op))
        for op in _AUG_FANOUT
    ]
    # the union is already 2×24 decode-sized blocks — map per block,
    # no second repartition
    out = (
        variants[0].union(*variants[1:])
        .map_batches(_augmented_dhash_batch, batch_format="pyarrow",
                     batch_size=None)
        .to_pandas()
    )
    return out.sort_values("image_id").reset_index(drop=True)


SQL_IMAGE_AUGMENT = f"""
SELECT image_id, w, h, dhash FROM read_parquet('{_AUGMENT_FIXTURE}')
ORDER BY image_id
"""


_CURATION_FIXTURE = "/tmp/ccwarc_curation_fixture.parquet"
_CURATION_FIXTURE_MIXED = "/tmp/ccwarc_curation_fixture_mixed_v5.parquet"


def q_media_prep(sf_dir: str) -> pd.DataFrame:
    """Composed image-curation pipeline (the image analog of text_prep):
    metadata gates FIRST (curation_report — cheap Arrow kernels over
    columns, no payload reads), THEN decode+dHash only for the kept
    rows (the expensive stage runs on the gated subset — the
    gate-before-decode ordering that matters at 100 TB), then
    keep-first exact visual dedup on the recomputed dHash.  Kept ids
    are `ray.put`-broadcast into the payload scan (dimension-sized
    here; swap in the partitioned `hash_join` semi for a huge keep
    set).  Output: the surviving (image_id, fmt, dhash) rows.  Runs
    over the png/jpg/bmp/gif/JFIF mixed store (round 5) — the kept
    subset's decode stage exercises every registered codec."""
    store = _mixed_store()
    _ensure_curation_fixture_mixed()
    _ensure_imghash_fixture()
    meta = store.read_ray(columns=["image_id", "w", "h", "caption", "phash"])
    kept = curation.curation_report(meta).filter(expr="reason == 'kept'")
    kept_ids = [r["image_id"] for r in kept.take_all()]
    payload = store.read_ray(columns=["image_id", "bytes", "fmt"])
    gated = relational.broadcast_semi_join(
        payload, "image_id", ray.put(kept_ids))

    def hash_with_fmt(t: pa.Table) -> pa.Table:
        h = _image_hash_batch(t)
        return h.append_column("fmt", t.column("fmt")).select(
            ["image_id", "fmt", "dhash"])

    hashed = _decode_batches(gated, hash_with_fmt).materialize()
    keepers = relational.grouped_agg(
        hashed, keys=["dhash"], aggs=[("image_id", "min", "keeper_id")])
    joined = relational.hash_join(
        hashed, keepers, "dhash",
        left_schema=pa.schema([("image_id", pa.string()),
                               ("fmt", pa.string()), ("dhash", pa.int64())]),
        right_schema=pa.schema([("dhash", pa.int64()),
                                ("keeper_id", pa.string())]))
    def survivors(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("image_id"),
                                 t.column("keeper_id"))).select(
            ["image_id", "fmt", "dhash"])

    out = joined.map_batches(survivors, batch_format="pyarrow").to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


# chained-CTE oracle over the two image fixtures: the curation CASE
# gates + min-keeper phash dedup (SQL_IMAGE_CURATION's shape), then the
# dHash keep-first over the independently recomputed imghash fixture;
# fmt is re-derived from the image_id key (img-<key> -> FMTS[key % 3])
SQL_MEDIA_PREP = f"""
WITH s AS (
  SELECT image_id, w, h, caption, phash
  FROM read_parquet('{{CF}}')
),
g AS (
  SELECT image_id, phash,
    CASE
      WHEN w < 64 OR h < 64 THEN 'dims'
      WHEN greatest(w, h) > 3 * least(w, h) THEN 'aspect'
      WHEN length(regexp_extract_all(caption, '[A-Za-z0-9_]+')) < 5
        THEN 'caption_short'
      WHEN regexp_matches(caption, '(?i)\\b(market|lantern)\\b')
        THEN 'caption_block'
      ELSE 'kept'
    END AS reason0
  FROM s
),
k AS (
  SELECT phash, min(image_id) AS keeper FROM g
  WHERE reason0 = 'kept' GROUP BY 1
),
kept AS (
  SELECT g.image_id FROM g JOIN k USING (phash)
  WHERE g.reason0 = 'kept' AND g.image_id = k.keeper
),
hashed AS (
  SELECT i.image_id, i.dhash,
    CASE CAST(substr(i.image_id, 5) AS BIGINT) % 5
      WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' WHEN 2 THEN 'bmp'
      WHEN 3 THEN 'gif' ELSE 'jfif' END AS fmt
  FROM read_parquet('{{HF}}') i JOIN kept USING (image_id)
),
dd AS (SELECT dhash, min(image_id) AS keeper FROM hashed GROUP BY 1)
SELECT h.image_id, h.fmt, h.dhash
FROM hashed h JOIN dd ON h.dhash = dd.dhash AND h.image_id = dd.keeper
ORDER BY h.image_id
""".replace("{CF}", _CURATION_FIXTURE_MIXED).replace("{HF}", _IMGHASH_FIXTURE)


_FOREST_EVAL_FIXTURE = "/tmp/ccwarc_forest_eval_fixture.parquet"
_FOREST_FEATURES = ("attr_w", "attr_h", "url_w", "url_h", "alt_len",
                    "elem_img", "same_domain", "dom_depth", "dom_sib",
                    "suffix_gif")
_FOREST_PARAMS = dict(n_trees=2, max_depth=5, min_leaf=20, id_col="rowid")


def _forest_train_table() -> pa.Table:
    t = synth.media_training_table(4000)
    return t.append_column(
        "rowid", pa.array(np.arange(t.num_rows), pa.int64()))


def _ensure_forest_eval_fixture() -> str:
    """Held-out eval rows (different seed than the training corpus) the
    trained forest is applied to on both sides of the oracle."""
    def build() -> pa.Table:
        t = synth.media_training_table(1500, seed=synth.GLOBAL_SEED + 10)
        return t.append_column(
            "rowid", pa.array(np.arange(t.num_rows), pa.int64()))
    return _fixture_once(_FOREST_EVAL_FIXTURE, build)


def _sql_forest_classify() -> str:
    """Oracle: the forest trained LOCALLY (no-Ray `ops/forest.train_forest`
    on the pyarrow path) embedded as nested CASE expressions — the Ray
    query trains the SAME forest DISTRIBUTED, and integer-exact
    histograms + integer cross-product split scoring make the two
    bit-identical (`test_local_vs_distributed_bit_identical`), so the
    predictions must match.  RandomForest×2 parity for
    `WekaTrainer.java:23-47` via a deterministic hash-bagged CART pair
    (declared substitution for Weka's seeded bootstrap)."""
    _ensure_forest_eval_fixture()
    f = forest.train_forest(_forest_train_table(), list(_FOREST_FEATURES),
                            **_FOREST_PARAMS)
    cases = [forest.tree_case_sql(tr, sub) for tr, sub in f]
    avg = "(" + " + ".join(cases) + f") / {len(cases)}"
    return f"""
WITH e AS (SELECT * FROM read_parquet('{_FOREST_EVAL_FIXTURE}')),
p AS (SELECT rowid, {avg} AS praw FROM e)
SELECT rowid, round(praw, 5) AS p_forest,
       CASE WHEN praw >= 0.5 THEN 1 ELSE 0 END AS pred
FROM p ORDER BY rowid
"""


def q_forest_classify(sf_dir: str) -> pd.DataFrame:
    """Distributed-histogram CART forest (`ops/forest.py`): train 2
    hash-bagged trees level-wise over the training corpus (one
    streaming pass per depth level; only bounded (node, feat, value)
    histogram rows reach the driver), then apply them to the held-out
    eval fixture as a vectorized map_batches."""
    _ensure_forest_eval_fixture()
    ds = rd.from_arrow(_forest_train_table()).repartition(8)
    f = forest.train_forest(ds, list(_FOREST_FEATURES), **_FOREST_PARAMS)

    def apply(tbl: pa.Table) -> pa.Table:
        p = forest.forest_proba(tbl, f)
        return pa.table({
            "rowid": tbl.column("rowid"),
            "p_forest": pa.array(np.round(p, 5)),
            "pred": pa.array((p >= 0.5).astype(np.int64)),
        })

    out = rd.read_parquet(_FOREST_EVAL_FIXTURE).map_batches(
        apply, batch_format="pyarrow").to_pandas()
    return out.sort_values("rowid").reset_index(drop=True)


def q_dhash_neardup(sf_dir: str) -> pd.DataFrame:
    """Near-dup pairs under the RECOMPUTED dHash: distributed decode →
    dhash64 per payload, then the salted pigeonhole-block Hamming join
    (`dedup.phash_neardup_groups` with ``phash_col='dhash'`` — the
    machinery is hash-family-agnostic).  Unlike phash_neardup (both
    sides read the stored column), the Ray side here derives the hash
    from the encoded bytes, so the oracle row checks decode → hash →
    skew-salted self-join end-to-end.

    Note: the synthetic store's images are monotone gradients + noise,
    so gradient-sign dHash collides heavily (thousands of hamming-0
    pairs at 300 images) — which makes this query a deliberate stress of
    the salted bucket path under extreme hash skew; natural images
    spread far wider.  Round 5: runs over the mixed store, so the hash
    derivation includes real GIF-LZW and baseline-JFIF decodes."""
    store = _mixed_store()
    _ensure_imghash_fixture()
    ds = store.read_ray(columns=["image_id", "bytes", "fmt"])
    hashed = _decode_batches(ds, _image_hash_batch) \
        .map_batches(lambda t: t.select(["image_id", "dhash"]),
                     batch_format="pyarrow")
    out = dedup.phash_neardup_groups(
        hashed, max_hamming=2, phash_col="dhash",
        salt=int(os.environ.get("PHASH_SALT", "2"))).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_DHASH_NEARDUP = f"""
WITH p AS (SELECT image_id, dhash FROM read_parquet('{_IMGHASH_FIXTURE}'))
SELECT a.image_id AS id_a, b.image_id AS id_b,
       bit_count(xor(a.dhash, b.dhash))::BIGINT AS hamming
FROM p a JOIN p b ON a.image_id < b.image_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 2
ORDER BY id_a, id_b
"""


def _ensure_curation_fixture() -> str:
    """(image_id, w, h, caption, phash) of the content store — the
    metadata columns the curation gates read, for the SQL oracle."""
    return _fixture_once(
        _CURATION_FIXTURE,
        lambda: _store().to_table().select(
            ["image_id", "w", "h", "caption", "phash"]))


def _ensure_curation_fixture_mixed() -> str:
    """Same metadata fixture over the MIXED store (media_prep's input)."""
    return _fixture_once(
        _CURATION_FIXTURE_MIXED,
        lambda: _mixed_store().to_table().select(
            ["image_id", "w", "h", "caption", "phash"]))


def q_image_curation(sf_dir: str) -> pd.DataFrame:
    """LAION-style image+caption curation report
    (`ops/curation.py:curation_report`): dims / aspect / caption-length /
    caption-blocklist gates as Arrow RE2 kernels in one map_batches pass,
    then keep-first-per-pHash dedup (grouped_agg min + broadcast-path
    hash_join).  Payload bytes are never read."""
    store = _store()
    _ensure_curation_fixture()
    ds = store.read_ray(columns=["image_id", "w", "h", "caption", "phash"])
    out = curation.curation_report(ds).to_pandas()
    return out.sort_values("image_id").reset_index(drop=True)


# mirrors ops/curation.py gate order and defaults: min_dim=64,
# max_aspect=3, min_cap_words=5, blocklist=(market|lantern); both sides
# run RE2 on the same ASCII word-run class
SQL_IMAGE_CURATION = f"""
WITH s AS (
  SELECT image_id, w, h, caption, phash
  FROM read_parquet('{_CURATION_FIXTURE}')
),
g AS (
  SELECT image_id, phash,
    CASE
      WHEN w < 64 OR h < 64 THEN 'dims'
      WHEN greatest(w, h) > 3 * least(w, h) THEN 'aspect'
      WHEN length(regexp_extract_all(caption, '[A-Za-z0-9_]+')) < 5
        THEN 'caption_short'
      WHEN regexp_matches(caption, '(?i)\\b(market|lantern)\\b')
        THEN 'caption_block'
      ELSE 'kept'
    END AS reason0
  FROM s
),
k AS (
  SELECT phash, min(image_id) AS keeper FROM g
  WHERE reason0 = 'kept' GROUP BY 1
)
SELECT g.image_id,
  CASE WHEN g.reason0 <> 'kept' THEN g.reason0
       WHEN g.image_id = k.keeper THEN 'kept'
       ELSE 'dup' END AS reason
FROM g LEFT JOIN k USING (phash)
ORDER BY image_id
"""


def q_langid(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = docs.map_batches(text.LangIdentifier(), batch_format="pyarrow").map_batches(
        lambda t: t.drop_columns(["text"]), batch_format="pyarrow"
    ).to_pandas()  # text never leaves the workers
    out["lang_conf"] = _r5(out["lang_conf"])
    return out[["doc_id", "lang", "lang_pred", "lang_conf"]].sort_values("doc_id").reset_index(drop=True)


def _sql_stopword_values() -> str:
    """The LANG_PROFILES stopword lists as a SQL VALUES literal."""
    rows = [
        f"('{lang}', '{w}')"
        for lang in sorted(text.LANG_PROFILES)
        for w in sorted(text.LANG_PROFILES[lang])
    ]
    return ", ".join(rows)


# Mirrors ops/text.py LangIdentifier: score(lang) = stopword hits /
# token count (single exact-int division both sides); winner = max by
# (score, lang) i.e. ORDER BY score DESC, lang DESC; 'und' at <= 0.02.
SQL_LANGID = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok FROM documents
),
tot AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
profiles(plang, w) AS (VALUES {{values}}),
hits AS (
  SELECT t.doc_id, p.plang, count(*) AS h
  FROM toks t JOIN profiles p ON t.tok = p.w GROUP BY 1, 2
),
scores AS (
  SELECT tot.doc_id, l.plang, coalesce(hits.h, 0)::DOUBLE / tot.n AS score
  FROM tot CROSS JOIN (SELECT DISTINCT plang FROM profiles) l
  LEFT JOIN hits ON hits.doc_id = tot.doc_id AND hits.plang = l.plang
),
best AS (
  SELECT doc_id, plang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang DESC) AS rn
  FROM scores
)
SELECT d.doc_id, d.lang,
       CASE WHEN b.score > 0.02 THEN b.plang ELSE 'und' END AS lang_pred,
       floor(coalesce(b.score, 0.0) * 100000 + 0.5) / 100000 AS lang_conf
FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
ORDER BY d.doc_id
""".replace("{values}", _sql_stopword_values())


def q_quality_scores(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(
        lambda t: text.quality_scores(t).drop_columns(["text"]),
        batch_format="pyarrow",
    ).to_pandas()  # text never leaves the workers
    for c in ("mean_word_len", "punct_ratio", "digit_ratio", "stopword_ratio", "upper_ratio", "quality"):
        out[c] = _r5(out[c])
    return out.sort_values("doc_id").reset_index(drop=True)


# Mirrors ops/text.py quality_scores byte-class ratios (corpus is ASCII,
# so char counts == utf-8 byte counts); every ratio is one exact-int
# division; quality is the identical 4-term double expression.
SQL_QUALITY_SCORES = f"""
WITH base AS (
  SELECT doc_id, text, length(text) AS nc,
    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS alpha_cnt,
    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digit_cnt,
    length(text) - length(regexp_replace(text, '[ ' || chr(9) || chr(10) || chr(13) || ']', '', 'g')) AS space_cnt,
    length(regexp_replace(text, '[\\x00-\\x7f]', '', 'g')) AS nonascii_cnt,
    length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS upper_cnt
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok FROM documents
),
wstats AS (
  SELECT doc_id, count(*) AS nw, sum(length(tok))::BIGINT AS wlen,
         sum(CASE WHEN tok IN ({{en_stop}}) THEN 1 ELSE 0 END)::BIGINT AS stop_hits
  FROM toks GROUP BY 1
),
r AS (
  SELECT b.doc_id, b.nc AS n_chars_text,
    CASE WHEN w.nw > 0 THEN w.wlen::DOUBLE / w.nw ELSE 0.0 END AS mean_word_len,
    -- ASCII punctuation only: non-ASCII codepoints count toward length
    -- but no ratio class (matches ops/text.py quality_scores)
    CASE WHEN b.nc > 0 THEN (b.nc - b.alpha_cnt - b.digit_cnt - b.space_cnt - b.nonascii_cnt)::DOUBLE / b.nc ELSE 0.0 END AS punct_ratio,
    CASE WHEN b.nc > 0 THEN b.digit_cnt::DOUBLE / b.nc ELSE 0.0 END AS digit_ratio,
    CASE WHEN w.nw > 0 THEN w.stop_hits::DOUBLE / w.nw ELSE 0.0 END AS stopword_ratio,
    CASE WHEN b.nc > 0 THEN b.upper_cnt::DOUBLE / greatest(b.alpha_cnt, 1) ELSE 0.0 END AS upper_ratio
  FROM base b LEFT JOIN wstats w ON w.doc_id = b.doc_id
)
SELECT doc_id, n_chars_text,
  floor(mean_word_len * 100000 + 0.5) / 100000 AS mean_word_len,
  floor(punct_ratio * 100000 + 0.5) / 100000 AS punct_ratio,
  floor(digit_ratio * 100000 + 0.5) / 100000 AS digit_ratio,
  floor(stopword_ratio * 100000 + 0.5) / 100000 AS stopword_ratio,
  floor(upper_ratio * 100000 + 0.5) / 100000 AS upper_ratio,
  floor((
    (CASE WHEN n_chars_text >= 50 THEN 1.0 ELSE 0.0 END) * 0.25
    + least(mean_word_len / 8.0, 1.0) * 0.25
    + least(stopword_ratio * 4.0, 1.0) * 0.25
    + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.25) * 100000 + 0.5) / 100000 AS quality
FROM r ORDER BY doc_id
""".replace("{en_stop}", ", ".join(f"'{w}'" for w in sorted(text.LANG_PROFILES["en"])))


def q_repetition_scores(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(
        lambda t: text.repetition_scores(t).drop_columns(["text"]),
        batch_format="pyarrow",
    ).to_pandas()  # text never leaves the workers
    for c in ("dup_line_frac", "dup_line_char_frac", "top_bigram_char_frac"):
        out[c] = _r5(out[c])
    return out.sort_values("doc_id").reset_index(drop=True)


# Mirrors ops/text.py repetition_scores: non-empty-line duplicate
# fractions (exact integer counts, one double division each) and the
# most-frequent word bigram's character coverage (ties: smallest bigram,
# both sides codepoint-ascending on ASCII \w+ words).
# SCOPE: DuckDB \w is RE2's ASCII class while the Ray kernel tokenizes
# with Python's Unicode \w — parity holds because the synthetic corpus
# is ASCII; non-ASCII text would tokenize differently on the two sides
# (same caveat as the RE2-\s note at the top of this module).
SQL_REPETITION_SCORES = """
WITH nel AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents
),
ne AS (SELECT doc_id, line FROM nel WHERE length(line) > 0),
lstats AS (
  SELECT doc_id, count(*) AS n_lines, count(DISTINCT line) AS n_distinct,
         sum(length(line))::BIGINT AS chars_all
  FROM ne GROUP BY 1
),
dstats AS (
  SELECT doc_id, sum(length(line))::BIGINT AS chars_first
  FROM (SELECT DISTINCT doc_id, line FROM ne) GROUP BY 1
),
toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '\\w+')) AS tok,
         generate_subscripts(regexp_extract_all(lower(text), '\\w+'), 1) AS i
  FROM documents
),
wchars AS (
  SELECT doc_id, count(*) AS nw, sum(length(tok))::BIGINT AS total_chars
  FROM toks GROUP BY 1
),
bigrams AS (
  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS bg
  FROM toks
),
btop AS (
  SELECT doc_id, bg, count(*) AS c,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY count(*) DESC, bg ASC) AS rn
  FROM bigrams WHERE bg IS NOT NULL GROUP BY doc_id, bg
)
SELECT d.doc_id,
  floor(coalesce((l.n_lines - l.n_distinct)::DOUBLE / l.n_lines, 0.0)
        * 100000 + 0.5) / 100000 AS dup_line_frac,
  floor(coalesce((l.chars_all - ds.chars_first)::DOUBLE / nullif(l.chars_all, 0), 0.0)
        * 100000 + 0.5) / 100000 AS dup_line_char_frac,
  floor(CASE WHEN w.nw >= 2 AND w.total_chars > 0
             THEN b.c * (length(b.bg) - 1)::DOUBLE / w.total_chars
             ELSE 0.0 END * 100000 + 0.5) / 100000 AS top_bigram_char_frac
FROM documents d
LEFT JOIN lstats l ON l.doc_id = d.doc_id
LEFT JOIN dstats ds ON ds.doc_id = d.doc_id
LEFT JOIN wchars w ON w.doc_id = d.doc_id
LEFT JOIN btop b ON b.doc_id = d.doc_id AND b.rn = 1
ORDER BY d.doc_id
"""


_MIX_RATES = {"src0": 2.5, "src1": 1.0, "src2": 0.5, "src3": 0.25}
_MIX_DEFAULT = 0.125


def q_mix_sources(sf_dir: str) -> pd.DataFrame:
    """Deterministic weighted source mixing (up/down-sampling by
    per-source rate): hash-Bernoulli per row + copy replication —
    reproducible under any partitioning, no RNG state.  md5 variant so
    the oracle recomputes the identical keep/copy decisions."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    out = sampling.weighted_mix(
        docs, _MIX_RATES, default=_MIX_DEFAULT, seed=7, hash_fn="md5"
    ).to_pandas()
    return out.sort_values(["doc_id", "copy_idx"]).reset_index(drop=True)


def _sql_mix_sources() -> str:
    """Oracle sharing weighted_mix's COMPILED integer (base, threshold)
    pairs — no float arithmetic on either side at row time."""
    t = sampling.mix_rates_table(_MIX_RATES, _MIX_DEFAULT)
    db, dt = t.pop(None)
    values = ", ".join(f"('{k}', {b}, {thr})" for k, (b, thr) in sorted(t.items()))
    return f"""
WITH w(wsource, base, thr) AS (SELECT * FROM (VALUES {values})),
d AS (
  SELECT doc_id, documents.source AS source,
         coalesce(w.base, {db}) AS base,
         coalesce(w.thr, {dt}) AS thr,
         md5_number_lower(doc_id::VARCHAR || ':7') % 1048576 AS h
  FROM documents LEFT JOIN w ON w.wsource = documents.source
),
c AS (
  SELECT doc_id, source,
         base + CASE WHEN h < thr THEN 1 ELSE 0 END AS n
  FROM d
)
SELECT doc_id, source, unnest(range(n)) AS copy_idx
FROM c WHERE n > 0 ORDER BY doc_id, copy_idx
"""


SQL_MIX_SOURCES = _sql_mix_sources()


def q_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (n-gram overlap): the 'benchmark' side
    is a deterministic 10% slice of the corpus (doc_id % 20 < 2) so the
    oracle can re-derive it; n=3 keeps overlap non-degenerate on the
    synthetic vocabulary.  Index built distributed (per-batch distinct
    hash partials), broadcast once, probed per batch."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_slice(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 20 < 2))

    bench = docs.map_batches(bench_slice, batch_format="pyarrow")
    out = text.decontaminate(docs, bench, n=3).map_batches(
        lambda t: t.drop_columns(["text"]), batch_format="pyarrow"
    ).to_pandas()  # text never leaves the workers
    return out.sort_values("doc_id").reset_index(drop=True)


# Mirrors ops/text.py decontaminate at n=3: per-doc DISTINCT word
# 3-grams (lowercased \w+ words, space-joined), membership against the
# union of the benchmark slice's grams (string equality here; the Ray
# side probes xxh64 hashes — collision-free at fixture scale).
# SCOPE: \w is Unicode in the Python tokenizer but ASCII in DuckDB/RE2
# — parity is guaranteed on the ASCII synthetic corpus only.
SQL_DECONTAMINATE = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS g
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        FROM toks WHERE len(t) >= 3)
),
dg AS (SELECT DISTINCT doc_id, g FROM grams),
bench AS (SELECT DISTINCT g FROM dg WHERE doc_id % 20 < 2),
stats AS (
  SELECT dg.doc_id, count(*) AS n_ngrams, count(b.g) AS n_hits
  FROM dg LEFT JOIN bench b ON b.g = dg.g GROUP BY 1
)
SELECT d.doc_id,
       coalesce(s.n_ngrams, 0) AS n_ngrams,
       coalesce(s.n_hits, 0) AS n_hits,
       coalesce(s.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN stats s ON s.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# CCNet perplexity-bucket thresholds on the ROUNDED mean log10 P —
# fixed cut points (the analog of CCNet's precomputed per-language
# thresholds; picked from the fixed 500-doc documents-table
# distribution: quartiles ≈ -1.486 / -1.470)
_LM_HEAD = -1.47
_LM_TAIL = -1.486


def q_lm_perplexity(sf_dir: str) -> pd.DataFrame:
    """CCNet-style LM quality bucketing (Wenzek et al. 2020): score
    every document by mean log10 P(w_i|w_{i-1}) under a corpus-trained
    add-0.5 bigram model (`ops/text.py:bigram_lm_scores` — explode to
    hash rows → two grouped_counts → two bucketed joins → per-doc
    grouped sum; text never shuffles), then bucket head/middle/tail on
    fixed thresholds over the floor-rounded score, the deterministic
    stand-in for CCNet's per-language perplexity cut points."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = text.bigram_lm_scores(docs).to_pandas()
    out["ppl_bucket"] = np.where(
        out["avg_logprob"] >= _LM_HEAD, "head",
        np.where(out["avg_logprob"] < _LM_TAIL, "tail", "middle"))
    return out.sort_values("doc_id").reset_index(drop=True)


# Oracle recomputes the bigram LM from exact word strings (the Ray side
# counts by xxh64 — the decontaminate hash-equality convention); both
# sides floor-round the mean to 5 decimals before the bucket compare so
# sum-association ulps can't flip a bucket on one side only.  The \w+
# tokenizer parity note on SQL_REPETITION_SCORES applies (ASCII corpus).
SQL_LM_PERPLEXITY = f"""
WITH toks AS (
  SELECT doc_id, w, pos FROM (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS w,
           generate_subscripts(regexp_extract_all(lower(text), '[0-9a-z_]+'), 1) AS pos
    FROM documents)
),
uni AS (SELECT w, count(*)::BIGINT AS cu FROM toks GROUP BY 1),
v AS (SELECT count(*)::DOUBLE AS vv FROM uni),
bi AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
bic AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM bi GROUP BY 1, 2),
occ AS (
  SELECT bi.doc_id,
         log10((bic.cb + 0.5) / (uni.cu + 0.5 * v.vv)) AS lp
  FROM bi JOIN bic USING (w1, w2) JOIN uni ON uni.w = bi.w1 CROSS JOIN v),
s AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(lp) AS lps
      FROM occ GROUP BY 1),
r AS (SELECT doc_id, n_bigrams,
             floor((lps / n_bigrams) * 100000 + 0.5) / 100000 AS avg_logprob
      FROM s)
SELECT doc_id, n_bigrams, avg_logprob,
       CASE WHEN avg_logprob >= {_LM_HEAD} THEN 'head'
            WHEN avg_logprob < {_LM_TAIL} THEN 'tail'
            ELSE 'middle' END AS ppl_bucket
FROM r ORDER BY doc_id
"""


def q_text_prep(sf_dir: str) -> pd.DataFrame:
    """End-to-end training-data prep as ONE streaming pipeline —
    language ID → quality gate (en AND raw quality >= 0.5; margin to
    the gate is >= 0.028 on the corpus, far above float noise) → exact
    dedup (min-doc_id keeper per distinct text) → token counts.  Every
    stage is an individually oracle-checked query (langid /
    quality_scores / exact_dedup_docs / doc_token_counts); this entry
    pins their COMPOSITION against one chained SQL oracle.  The
    keeper-id rejoin broadcasts the survivor manifest (at corpus scale
    swap in hash_join — ids only, never text)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    enriched = (
        docs.map_batches(text.LangIdentifier(), batch_format="pyarrow")
        .map_batches(lambda t: text.quality_scores(t), batch_format="pyarrow")
        .map_batches(lambda t: text.token_counts(t), batch_format="pyarrow")
    )
    gated = enriched.filter(
        expr="lang_pred == 'en' and quality >= 0.5"
    ).materialize()
    keep = dedup.exact_dedup(gated, "text", "doc_id")
    ids = ray.put(keep.select_columns(["doc_id"]).to_pandas()["doc_id"].tolist())
    out = relational.broadcast_semi_join(gated, "doc_id", ids).to_pandas()
    out["quality_r"] = _r5(out["quality"])
    return out[["doc_id", "lang_pred", "quality_r", "n_ws_tokens"]].sort_values(
        "doc_id"
    ).reset_index(drop=True)


SQL_TEXT_PREP = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS tok FROM documents
),
tot AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY 1),
profiles(plang, w) AS (VALUES {{values}}),
hits AS (
  SELECT t.doc_id, p.plang, count(*) AS h
  FROM toks t JOIN profiles p ON t.tok = p.w GROUP BY 1, 2
),
scores AS (
  SELECT tot.doc_id, l.plang, coalesce(hits.h, 0)::DOUBLE / tot.n AS score
  FROM tot CROSS JOIN (SELECT DISTINCT plang FROM profiles) l
  LEFT JOIN hits ON hits.doc_id = tot.doc_id AND hits.plang = l.plang
),
best AS (
  SELECT doc_id, plang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang DESC) AS rn
  FROM scores
),
lp AS (
  SELECT d.doc_id, d.text,
         CASE WHEN b.score > 0.02 THEN b.plang ELSE 'und' END AS lang_pred
  FROM documents d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
),
base AS (
  SELECT doc_id, length(text) AS nc,
    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS alpha_cnt,
    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digit_cnt,
    length(text) - length(regexp_replace(text, '[ ' || chr(9) || chr(10) || chr(13) || ']', '', 'g')) AS space_cnt,
    length(regexp_replace(text, '[\\x00-\\x7f]', '', 'g')) AS nonascii_cnt
  FROM documents
),
wstats AS (
  SELECT doc_id, count(*) AS nw, sum(length(tok))::BIGINT AS wlen,
         sum(CASE WHEN tok IN ({{en_stop}}) THEN 1 ELSE 0 END)::BIGINT AS stop_hits
  FROM toks GROUP BY 1
),
q AS (
  SELECT b.doc_id,
    ((CASE WHEN b.nc >= 50 THEN 1.0 ELSE 0.0 END) * 0.25
     + least((CASE WHEN w.nw > 0 THEN w.wlen::DOUBLE / w.nw ELSE 0.0 END) / 8.0, 1.0) * 0.25
     + least((CASE WHEN w.nw > 0 THEN w.stop_hits::DOUBLE / w.nw ELSE 0.0 END) * 4.0, 1.0) * 0.25
     + (1.0 - least((CASE WHEN b.nc > 0 THEN (b.nc - b.alpha_cnt - b.digit_cnt - b.space_cnt - b.nonascii_cnt)::DOUBLE / b.nc ELSE 0.0 END) * 4.0, 1.0)) * 0.25
    ) AS qraw
  FROM base b LEFT JOIN wstats w ON w.doc_id = b.doc_id
),
tokc AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n_ws_tokens
  FROM documents
),
gated AS (
  SELECT lp.doc_id, lp.text, lp.lang_pred, q.qraw
  FROM lp JOIN q ON q.doc_id = lp.doc_id
  WHERE lp.lang_pred = 'en' AND q.qraw >= 0.5
),
keep AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY text)
SELECT g.doc_id, g.lang_pred,
       floor(g.qraw * 100000 + 0.5) / 100000 AS quality_r,
       tokc.n_ws_tokens
FROM gated g
JOIN keep ON keep.doc_id = g.doc_id
JOIN tokc ON tokc.doc_id = g.doc_id
ORDER BY g.doc_id
""".replace("{values}", _sql_stopword_values()).replace(
    "{en_stop}", ", ".join(f"'{w}'" for w in sorted(text.LANG_PROFILES["en"]))
)


def q_fingerprint(sf_dir: str) -> pd.DataFrame:
    """md5-hash variant of the winnowing fingerprint (DuckDB-replicable:
    md5_number_lower on both sides)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(
        lambda t: text.fingerprint(t, hash_fn="md5").drop_columns(["text"]),
        batch_format="pyarrow",
    ).to_pandas()  # text never leaves the workers
    return out[["doc_id", "text_hash", "min_fingerprint"]].sort_values("doc_id").reset_index(drop=True)


# uint64 → signed two's complement (the Ray side stores int64 views)
_SQL_U2S = "(({v})::HUGEINT - CASE WHEN ({v}) >= 9223372036854775808::UBIGINT THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)::BIGINT"

SQL_FINGERPRINT = f"""
WITH toks AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '\\w+') AS t FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(list_slice(t, i, i + 3), ' ') AS g
  FROM (SELECT doc_id, t, unnest(range(1, greatest(len(t) - 3, 1) + 1)) AS i
        FROM toks WHERE len(t) > 0)
),
mins AS (SELECT doc_id, min(md5_number_lower(g)) AS mf FROM grams GROUP BY 1)
SELECT k.doc_id,
  {_SQL_U2S.format(v="md5_number_lower(k.text)")} AS text_hash,
  CASE WHEN m.mf IS NULL THEN 0
       ELSE {_SQL_U2S.format(v="m.mf")} END AS min_fingerprint
FROM toks k LEFT JOIN mins m ON m.doc_id = k.doc_id
ORDER BY k.doc_id
"""


def q_ngram_scores(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["text", "lang"])
    out = text.ngram_class_scores(docs, "text", "lang", pos_label="en", min_count=5).to_pandas()
    return out.sort_values(["score", "ngram"], ascending=[False, True]).head(500).reset_index(drop=True)


# char 3-5-grams of the cleaned text (\\W+ → single space, trimmed,
# lowered — ops/text.py char_ngrams), counted per class, pruned at 5,
# scored pos-neg (NgamFeatureSelection.java:156-163), top 500.
SQL_NGRAM_SCORES = """
WITH cleaned AS (
  SELECT trim(regexp_replace(lower(text), '\\W+', ' ', 'g')) AS s, lang FROM documents
),
grams AS (
  SELECT substr(s, i::INT, n::INT) AS ngram, lang
  FROM (SELECT s, lang, n, unnest(range(1, greatest(length(s) - n + 2, 1))) AS i
        FROM cleaned CROSS JOIN range(3, 6) t(n)
        WHERE length(s) >= n)
),
counts AS (
  SELECT ngram,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS pos_cnt,
         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS neg_cnt
  FROM grams GROUP BY 1
)
SELECT ngram, (pos_cnt - neg_cnt)::BIGINT AS score
FROM counts WHERE pos_cnt + neg_cnt >= 5
ORDER BY score DESC, ngram LIMIT 500
"""


def q_media_classify(sf_dir: str) -> pd.DataFrame:
    """M9→M23→M26/M27→T3 end-to-end: extract media, build feature +
    ngram-presence vectors, run the agreement/margin ensemble."""
    from .ops import features

    media = classics.media_extract(_warc(sf_dir))
    feats = media.map_batches(features.media_features_batch, batch_format="pyarrow")
    # vocabulary from document ngram class scores (A7/A8 path)
    docs = _read(sf_dir, "documents", columns=["text", "lang"])
    scores = text.ngram_class_scores(docs, "text", "lang", pos_label="en", min_count=5)
    vocab = features.build_ngram_vocab(scores, top_n=500)
    vref = ray.put(vocab)
    # TRAINED feature-side coefficients (persisted fixture; see
    # _ensure_weights_fixture) — the reference's offline-trained model
    # loaded once per actor (S14)
    w, b = _trained_weights()
    out = feats.map_batches(
        features.PresenceAndEnsemble, fn_constructor_args=(vref,),
        fn_constructor_kwargs=dict(feature_weights=w, bias=b - 0.5),
        batch_format="pyarrow", concurrency=(1, 4),
    ).to_pandas()
    out["p_feat"] = _r5(out["p_feat"])
    out["p_ngram"] = _r5(out["p_ngram"])
    return out[["src", "ngram_hits", "p_feat", "p_ngram", "is_big"]].sort_values(
        "src"
    ).reset_index(drop=True)


# End-to-end classify oracle: the DOM-visitor media CTE (proven by
# SQL_MEDIA_EXTRACT), the ngram-vocabulary CTE (proven by
# SQL_NGRAM_SCORES), then url_ngrams presence counting, the linear
# feature scorer, and the agreement-else-biased-margin ensemble rule —
# all recomputed independently in SQL.  Probabilities compare after the
# deterministic floor(x*1e5+0.5) rounding; thresholds/margins use the
# unrounded values exactly as the pipeline does.
SQL_MEDIA_CLASSIFY = f"""
WITH rec AS (SELECT * FROM read_parquet('{_WARC_FIXTURE}')),
resp AS (
  SELECT record_url, payload_text,
         strpos(payload_text, chr(13)||chr(10)||chr(13)||chr(10)) AS p
  FROM rec WHERE mime = 'application/http; msgtype=response'
),
hb AS (
  SELECT record_url,
         CASE WHEN p > 0 THEN substr(payload_text, 1, p - 1) ELSE '' END AS header,
         CASE WHEN p > 0 THEN substr(payload_text, p + 4) ELSE payload_text END AS body
  FROM resp
),
html AS (SELECT record_url, body FROM hb WHERE contains(header, 'Content-Type: text/html')),
frags AS (
  SELECT record_url, unnest(l) AS frag, generate_subscripts(l, 1) AS i
  FROM (SELECT record_url, string_split(substr(body, 42), '<') AS l FROM html)
),
sib AS (
  SELECT record_url, frag,
    sum(CASE WHEN regexp_matches(frag, '^[a-z]') THEN 1 ELSE 0 END)
      OVER (PARTITION BY record_url ORDER BY i) AS dom_sib
  FROM frags
),
media0 AS (
  SELECT
    regexp_extract(frag, 'src="([^"]*)"', 1) AS src,
    regexp_extract(frag, 'alt="([^"]*)"', 1) AS alt,
    regexp_extract(frag, 'width="([^"]*)"', 1) AS w,
    record_url AS page_url,
    dom_sib::BIGINT AS dom_sib, 2::BIGINT AS dom_depth, 'img' AS dom_elem
  FROM sib WHERE frag LIKE 'img %'
  UNION ALL
  SELECT
    regexp_extract(frag, 'href="([^"]*)"', 1), '', '',
    record_url, dom_sib::BIGINT, 2::BIGINT, 'a'
  FROM sib WHERE frag LIKE 'a %'
    AND regexp_matches(regexp_extract(frag, 'href="([^"]*)"', 1),
        '\\.(jpe?g|png|gif|bmp|tiff?|svg|webp|mp4|avi|mov|mpe?g|wmv)([?#].*)?$', 'i')
),
med AS (
  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY src ORDER BY page_url) AS rn
                 FROM media0) WHERE rn = 1
),
cleaned AS (
  SELECT trim(regexp_replace(lower(text), '\\W+', ' ', 'g')) AS s, lang FROM documents
),
dgrams AS (
  SELECT substr(s, i::INT, n::INT) AS ngram, lang
  FROM (SELECT s, lang, n, unnest(range(1, greatest(length(s) - n + 2, 1))) AS i
        FROM cleaned CROSS JOIN range(3, 6) t(n)
        WHERE length(s) >= n)
),
vocab AS (
  SELECT ngram FROM (
    SELECT ngram,
           sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS pos_cnt,
           sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS neg_cnt
    FROM dgrams GROUP BY 1
  ) WHERE pos_cnt + neg_cnt >= 5
  ORDER BY (pos_cnt - neg_cnt) DESC, ngram LIMIT 500
),
ksz AS (SELECT DISTINCT length(ngram) AS k FROM vocab),
uclean AS (
  SELECT src,
         regexp_replace(regexp_replace(lower(src), '^[a-z]+://', ''),
                        '\\.[a-z0-9]{{1,4}}$', '') AS u2
  FROM med
),
uparts AS (
  SELECT src, unnest(regexp_extract_all(u2, '[0-9a-z_]+')) AS part FROM uclean
),
ugrams AS (
  SELECT DISTINCT src, substr(part, i::INT, k::INT) AS gram
  FROM (SELECT src, part, k, unnest(range(1, greatest(length(part) - k + 2, 1))) AS i
        FROM uparts CROSS JOIN ksz WHERE length(part) >= k)
),
hits AS (
  SELECT g.src, count(*)::BIGINT AS ngram_hits
  FROM ugrams g JOIN vocab v ON v.ngram = g.gram GROUP BY 1
),
feat AS (
  SELECT m.src, coalesce(h.ngram_hits, 0)::BIGINT AS ngram_hits,
    CASE WHEN regexp_replace(m.w, '\\D', '', 'g') = '' THEN 0.0
         ELSE CAST(regexp_replace(m.w, '\\D', '', 'g') AS DOUBLE) END AS attr_w,
    CASE
      WHEN regexp_matches(m.src, '\\d{{2,4}}[xX]\\d{{2,4}}')
        THEN CAST(regexp_extract(m.src, '(\\d{{2,4}})[xX](\\d{{2,4}})', 1) AS DOUBLE)
      WHEN regexp_matches(m.src, '[wW]_\\d{{2,4}}')
        THEN CAST(regexp_extract(m.src, '[wW]_(\\d{{2,4}})', 1) AS DOUBLE)
      WHEN regexp_matches(m.src, '\\d{{2,4}}px')
        THEN CAST(regexp_extract(m.src, '(\\d{{2,4}})px', 1) AS DOUBLE)
      WHEN regexp_matches(m.src, '[?&]w(idth)?=\\d{{2,4}}')
        THEN CAST(regexp_extract(m.src, '[?&]w(?:idth)?=(\\d{{2,4}})', 1) AS DOUBLE)
      WHEN regexp_matches(m.src, '_\\d{{2,4}}\\.')
        THEN CAST(regexp_extract(m.src, '_(\\d{{2,4}})\\.', 1) AS DOUBLE)
      ELSE 0.0 END AS url_w,
    CASE
      WHEN regexp_matches(m.src, '\\d{{2,4}}[xX]\\d{{2,4}}')
        THEN CAST(regexp_extract(m.src, '(\\d{{2,4}})[xX](\\d{{2,4}})', 2) AS DOUBLE)
      WHEN regexp_matches(m.src, '[wW]_\\d{{2,4}}')
        THEN CAST(regexp_extract(m.src, '[wW]_(\\d{{2,4}})', 1) AS DOUBLE)
      WHEN regexp_matches(m.src, '\\d{{2,4}}px')
        THEN CAST(regexp_extract(m.src, '(\\d{{2,4}})px', 1) AS DOUBLE)
      WHEN regexp_matches(m.src, '[?&]w(idth)?=\\d{{2,4}}')
        THEN CAST(regexp_extract(m.src, '[?&]w(?:idth)?=(\\d{{2,4}})', 1) AS DOUBLE)
      WHEN regexp_matches(m.src, '_\\d{{2,4}}\\.')
        THEN CAST(regexp_extract(m.src, '_(\\d{{2,4}})\\.', 1) AS DOUBLE)
      ELSE 0.0 END AS url_h,
    CASE WHEN regexp_extract(regexp_replace(lower(m.src), '^https?://(www\\.)?', ''),
                             '^([^/]+)', 1) <> ''
          AND m.src LIKE 'http%'
          AND regexp_extract(regexp_replace(lower(m.src), '^https?://(www\\.)?', ''),
                             '^([^/]+)', 1)
            = regexp_extract(regexp_replace(lower(m.page_url), '^https?://(www\\.)?', ''),
                             '^([^/]+)', 1)
         THEN 1.0 ELSE 0.0 END AS same_domain,
    CAST(length(m.alt) AS DOUBLE) AS alt_len,
    CASE WHEN m.dom_elem = 'img' THEN 1.0 ELSE 0.0 END AS elem_img,
    CASE WHEN lower(regexp_extract(regexp_replace(
             regexp_extract('/' || m.src, '([^/]*)$', 1), '[?#].*$', ''),
             '\\.([^.]*)$', 1)) = 'gif' THEN 1.0 ELSE 0.0 END AS suffix_gif,
    CAST(m.dom_depth AS DOUBLE) AS dom_depth,
    CAST(m.dom_sib AS DOUBLE) AS dom_sib
  FROM med m LEFT JOIN hits h ON h.src = m.src
),
scored AS (
  -- term order mirrors EnsembleClassifier's weight-dict iteration
  -- exactly (z += w*x left to right), keeping fp summation identical;
  -- the TRAINED weights are substituted as repr() literals by
  -- _sql_media_classify (shortest-round-trip decimals parse back to
  -- the identical double in DuckDB)
  SELECT src, ngram_hits,
    1.0 / (1.0 + exp(-(__FEATURE_SCORE__))) AS pf,
    1.0 / (1.0 + exp(-(0.08 * ngram_hits - 0.5))) AS pn
  FROM feat
)
SELECT src, ngram_hits,
       floor(pf * 100000 + 0.5) / 100000 AS p_feat,
       floor(pn * 100000 + 0.5) / 100000 AS p_ngram,
       CASE WHEN (pf >= 0.5) = (pn >= 0.5) THEN pf >= 0.5
            WHEN abs(pn - 0.5) + 0.05 >= abs(pf - 0.5) THEN pn >= 0.5
            ELSE pf >= 0.5 END AS is_big
FROM scored ORDER BY src
"""


def _sql_media_classify() -> str:
    """SQL_MEDIA_CLASSIFY with the TRAINED coefficients substituted as
    literals, in the exact python summation order.  ``attr_h`` is always
    0 in the fixture's media rows (the visitor extracts width only), so
    its term is ``w * 0.0`` — bitwise what the python kernel adds."""
    w, b = _trained_weights()
    terms = []
    for c in _TRAIN_FEATURES:
        col = "0.0" if c == "attr_h" else c
        terms.append(f"({w[c]!r}) * {col}")
    expr = " + ".join(terms) + f" + ({b - 0.5!r})"
    return SQL_MEDIA_CLASSIFY.replace("__FEATURE_SCORE__", expr)


# RF×2 on the media pipeline: second forest's hash-bag seed.  Two
# independently-bagged forests stand in for the reference's pair of
# Weka RandomForests (`ProcessingService.java:209-222` arbitrates two
# RF outputs by agreement-else-margin with a +0.05 second-model bias;
# hash-bagged CART is the repo's declared Weka substitution, see
# _sql_forest_classify).
_FOREST_B_SEED = 9100


def q_media_forest(sf_dir: str) -> pd.DataFrame:
    """media_classify on TRAINED FORESTS (RF×2, `ProcessingService.java:
    209-222`): feature rows from the M9→M23 media pipeline are scored by
    two hash-bag-distinct distributed-histogram CART forests
    (`ops/forest.py`, trained level-wise over a Ray Dataset — only
    bounded (node,feat,value) histogram rows reach the driver), then
    arbitrated by the reference's agreement-else-margin rule with the
    +0.05 second-model bias.  The trained trees ship to the scoring
    tasks once via closure capture (a few hundred bytes — S14's
    load-once-per-worker contract); scoring is a vectorized
    `forest_proba` per batch.  The oracle re-trains both forests
    locally (bit-identical to the distributed trainer by
    `test_local_vs_distributed_bit_identical`) and embeds them as
    nested CASE expressions over the independently recomputed feature
    CTE."""
    media = classics.media_extract(_warc(sf_dir))
    feats = media.map_batches(features.media_features_batch, batch_format="pyarrow")
    ds = rd.from_arrow(_forest_train_table()).repartition(8)
    # BOTH forests' trees train in one joint schedule: max_depth passes
    # over the corpus total, not trees × depth (train_trees_joint)
    pk = {k: v for k, v in _FOREST_PARAMS.items()
          if k in ("n_trees", "id_col")}
    specs = (forest.forest_specs(list(_FOREST_FEATURES), **pk)
             + forest.forest_specs(list(_FOREST_FEATURES),
                                   bag_seed=_FOREST_B_SEED, **pk))
    trees = forest.train_trees_joint(
        ds, specs, max_depth=_FOREST_PARAMS["max_depth"],
        min_leaf=_FOREST_PARAMS["min_leaf"])
    nt = _FOREST_PARAMS["n_trees"]
    fa = [(tr, sub) for tr, (sub, _) in zip(trees[:nt], specs[:nt])]
    fb = [(tr, sub) for tr, (sub, _) in zip(trees[nt:], specs[nt:])]

    def apply(tbl: pa.Table) -> pa.Table:
        p_a = forest.forest_proba(tbl, fa)
        p_b = forest.forest_proba(tbl, fb)
        big_a, big_b = p_a >= 0.5, p_b >= 0.5
        m_a = np.abs(p_a - 0.5)
        m_b = np.abs(p_b - 0.5) + 0.05
        is_big = np.where(big_a == big_b, big_a,
                          np.where(m_b >= m_a, big_b, big_a))
        return pa.table({
            "src": tbl.column("src"),
            "p_rf_a": pa.array(_r5(p_a)),
            "p_rf_b": pa.array(_r5(p_b)),
            "is_big": pa.array(is_big),
        })

    out = feats.map_batches(apply, batch_format="pyarrow").to_pandas()
    return out.sort_values("src").reset_index(drop=True)


# Tail swapped into SQL_MEDIA_CLASSIFY's template by _sql_media_forest:
# the linear+ngram `scored` CTE becomes the two embedded forest
# averages; thresholds/margins compare the unrounded doubles exactly as
# the numpy kernel does, outputs round by the shared floor(x*1e5+0.5)
# rule.
_SQL_FOREST_TAIL = """scored AS (
  SELECT src, __PA__ AS prf_a, __PB__ AS prf_b FROM feat
)
SELECT src,
       floor(prf_a * 100000 + 0.5) / 100000 AS p_rf_a,
       floor(prf_b * 100000 + 0.5) / 100000 AS p_rf_b,
       CASE WHEN (prf_a >= 0.5) = (prf_b >= 0.5) THEN prf_a >= 0.5
            WHEN abs(prf_b - 0.5) + 0.05 >= abs(prf_a - 0.5) THEN prf_b >= 0.5
            ELSE prf_a >= 0.5 END AS is_big
FROM scored ORDER BY src
"""


def _sql_media_forest() -> str:
    """SQL_MEDIA_CLASSIFY's media/feature CTE prefix (proven by the
    media_classify driver row) + both locally-trained forests embedded
    as CASE averages.  ``attr_h`` is always 0 in the fixture's media
    rows (the visitor extracts width only), so trees referencing it
    read the literal ``(0.0)`` — bitwise what `_feature_matrix` sees."""
    t = _forest_train_table()
    fa = forest.train_forest(t, list(_FOREST_FEATURES), **_FOREST_PARAMS)
    fb = forest.train_forest(t, list(_FOREST_FEATURES),
                             **{**_FOREST_PARAMS, "bag_seed": _FOREST_B_SEED})

    def avg(f) -> str:
        cases = [
            forest.tree_case_sql(
                tr, ["(0.0)" if c == "attr_h" else c for c in sub])
            for tr, sub in f
        ]
        return "(" + " + ".join(cases) + f") / {len(cases)}"

    head, _tail = SQL_MEDIA_CLASSIFY.split("scored AS (", 1)
    return head + _SQL_FOREST_TAIL.replace("__PA__", avg(fa)).replace(
        "__PB__", avg(fb))


def q_crawl_admission(sf_dir: str) -> pd.DataFrame:
    """North-rule admission + politeness semantics with a SQL oracle:
    a frontier derived from documents (www./default-port/whitespace
    disguises + canonical duplicates) flows through the REAL pipeline —
    ``canonicalize_batch`` (RFC 3986 + SURT) → sharded cuckoo first-seen
    admit (pipelined protocol) → per-host politeness schedule.  The
    oracle reconstructs canonical urls analytically and replicates
    first-seen + schedule with window functions."""
    from .functions.urls import canonicalize_batch
    from .hashing import xxh64_many
    from .pipelines.crawl import _robots_maps
    from .state.frontier_shard import FrontierPool

    docs = _pq(sf_dir, "documents", columns=["doc_id"])
    d = docs.column("doc_id").to_numpy().astype(np.int64)
    seed_urls = []
    for k in d.tolist():
        t = k - 1 if (k % 11 == 5 and k > 0) else k
        host = f"host{t % 20:04d}.example"
        path = f"/img/i{t}.png"
        if k % 11 == 5 and k > 0:
            u = f"http://{host}:80{path}"  # duplicate, disguised via default port
        elif k % 7 == 1:
            u = f"http://www.{host}{path}"
        elif k % 7 == 2:
            u = f"http://{host}:80{path}"
        elif k % 7 == 3:
            u = f"http://{host}{path[:4]} {path[4:]}"  # embedded whitespace
        else:
            u = f"http://{host}{path}"
        seed_urls.append(u)
    seeds = pa.table(
        {
            "seed_url": pa.array(seed_urls, pa.string()),
            "page_url": pa.array([""] * len(d), pa.string()),
            "seed_rank": pa.array(d),
        }
    )
    ct = canonicalize_batch(seeds).sort_by([("seed_rank", "ascending")])
    robots = synth.robots_table(20)
    delays, _dis = _robots_maps(robots)
    pool = FrontierPool(4, capacity_per_shard=1 << max(16, (int(2.5 * len(d)) - 1).bit_length()))
    try:
        pool.set_robots(delays, {h: int(xxh64_many([h])[0]) for h in delays})
        uh = ct.column("url_hash").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        hh = xxh64_many(ct.column("host"))
        admit, ft, hi = pool.admit_and_schedule_pipelined(uh, hh)
        out = ct.filter(pa.array(admit))
        out = out.append_column("fetch_time_ms", pa.array(ft[admit], pa.int64()))
        out = out.append_column("host_index", pa.array(hi[admit], pa.int64()))
    finally:
        pool.shutdown()
    df = out.to_pandas()[["seed_rank", "url", "host", "host_index", "fetch_time_ms"]]
    return df.sort_values(["fetch_time_ms", "seed_rank"]).reset_index(drop=True)


SQL_CRAWL_ADMISSION = """
WITH seeds AS (
  SELECT doc_id AS seed_rank,
         CASE WHEN doc_id % 11 = 5 AND doc_id > 0 THEN doc_id - 1 ELSE doc_id END AS t
  FROM documents
),
urls AS (
  SELECT seed_rank,
         'http://host' || lpad(CAST(t % 20 AS VARCHAR), 4, '0') || '.example/img/i'
           || CAST(t AS VARCHAR) || '.png' AS url,
         'host' || lpad(CAST(t % 20 AS VARCHAR), 4, '0') || '.example' AS host,
         (t % 20) % 4 AS dk
  FROM seeds
),
admitted AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY seed_rank) AS rn FROM urls
),
sched AS (
  SELECT seed_rank, url, host,
         row_number() OVER (PARTITION BY host ORDER BY seed_rank) - 1 AS host_index,
         CASE dk WHEN 0 THEN 0 WHEN 1 THEN 150 WHEN 2 THEN 500 ELSE 1000 END AS delay
  FROM admitted WHERE rn = 1
)
SELECT seed_rank, url, host, host_index, CAST(host_index * delay AS BIGINT) AS fetch_time_ms
FROM sched ORDER BY fetch_time_ms, seed_rank
"""


_VALIDATE_FIXTURE = "/tmp/ccwarc_validate_fixture.parquet"


def _validate_project(t: pa.Table) -> pa.Table:
    return pa.table({
        "image_id": t.column("image_id"),
        "fmt": t.column("fmt"),
        "decode_ok": t.column("decode_ok"),
        "dims_ok": t.column("dims_ok"),
        "psnr_r": pa.array(_r5(np.minimum(
            t.column("psnr_db").to_numpy(zero_copy_only=False), 99.0))),
        "valid": t.column("valid"),
    })


def _ensure_validate_fixture() -> str:
    """Serial no-Ray recomputation of the decode-validate row results
    over the mixed store — the oracle side of q_image_validate (the
    image_hashes fixture convention: proves the DISTRIBUTED map equals
    the serial sweep row-for-row; shared-codec risk is broken by the
    pinned literal hash/PSNR tests)."""
    from .stages.decode import DecodeValidate

    return _fixture_once(
        _VALIDATE_FIXTURE,
        lambda: _validate_project(DecodeValidate()(_mixed_store().to_table())))


def q_image_validate(sf_dir: str) -> pd.DataFrame:
    """The north rule's per-row fetch invariant as a standalone query:
    decode every mixed-store payload and validate it against the
    reference pixels — EXACT pixel equality for lossless formats,
    PSNR ≥ 40 dB for lossy (DCT jpg / baseline JFIF), plus dimension
    and caption equality — via the same `stages/decode.DecodeValidate`
    stage the crawl pipeline runs, fanned per `_decode_batches`.
    PSNR is clamped to the 99 dB lossless sentinel and floor-rounded
    so both sides compare identical doubles."""
    store = _mixed_store()
    _ensure_validate_fixture()
    from .stages.decode import DecodeValidate

    out = (_decode_batches(store.read_ray(), DecodeValidate())
           .map_batches(_validate_project, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("image_id").reset_index(drop=True)


SQL_IMAGE_VALIDATE = f"""
SELECT image_id, fmt, decode_ok, dims_ok, psnr_r, valid
FROM read_parquet('{_VALIDATE_FIXTURE}') ORDER BY image_id
"""


_PCA_K = 2


def q_pca_embeddings(sf_dir: str) -> pd.DataFrame:
    """Distributed PCA over the embedding column: fit on the FIXED
    sf0.001 embeddings (the offline-model convention of the IVF
    centroid fixture — an sf-independent projection applied at any
    scale) via one streaming pass of integer-exact moment partials
    (`ops/ann.py:pca_train` — one tiny (count, Σq, ΣqqT) row per block
    reaches the driver, d×d eigh on the driver), then project the
    queried sf's embeddings batch-wise.  The oracle refits locally —
    bit-identical by integer-moment exactness — and embeds the
    component vectors as SQL literals with the same left-to-right
    projection fold."""
    train = rd.read_parquet(
        os.path.join(_IVF_TRAIN_SF, "embeddings.parquet"),
        columns=["embedding"]).repartition(8)
    comps = ann.pca_train(train, n_components=_PCA_K)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ds.map_batches(
        lambda t: ann.pca_project_batch(t, comps),
        batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def _sql_pca_embeddings() -> str:
    """Top-``_PCA_K`` components refit by the no-Ray path, embedded as
    shortest-round-trip literals; projection is the explicit 64-term
    sum so DuckDB's evaluation order equals the numpy fold."""
    t = pq.read_table(os.path.join(_IVF_TRAIN_SF, "embeddings.parquet"),
                      columns=["embedding"])
    comps = ann.pca_train_local(t, n_components=_PCA_K)
    sels = ["vec_id"]
    for r in range(comps.shape[0]):
        expr = " + ".join(
            f"(embedding[{j + 1}]::DOUBLE) * ({comps[r, j]!r})"
            for j in range(comps.shape[1]))
        sels.append(f"floor(({expr}) * 100000 + 0.5) / 100000 AS pc{r + 1}")
    return ("SELECT " + ",\n       ".join(sels)
            + " FROM embeddings ORDER BY vec_id")


def q_ivf_ann(sf_dir: str) -> pd.DataFrame:
    """IVF ANN with a DuckDB oracle: centroids come from the
    sf-independent fixture (see :func:`_ensure_ivf_fixture`); the oracle
    independently recomputes assignment (nearest centroid), per-query
    nprobe probe lists, in-list cosine scoring, and ranking."""
    cent_t = pq.read_table(_ensure_ivf_fixture())
    cent = np.asarray(cent_t.column("vec").to_pylist(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assigned = ann.ivf_assign(ds, cent)
    out = ann.ivf_topk(assigned, cent, _query_vecs(sf_dir), k=5, nprobe=4)
    out["cosine_r"] = _r5(out["cosine"])
    return out[["query_id", "vec_id", "cosine_r", "rank"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


def q_top_docs_per_lang(sf_dir: str) -> pd.DataFrame:
    """Top-3 documents per language by n_chars (tie → doc_id ASC) via
    relational.topk_per_key — per-batch top-k combiner, then one
    hash-partitioned rank kernel; shuffle moves ≤ k rows per (key,
    batch)."""
    docs = _read(sf_dir, "documents", columns=["lang", "doc_id", "n_chars"])
    out = relational.topk_per_key(
        docs, key="lang", order_col="n_chars", k=3, descending=True,
        tiebreak="doc_id",
    ).to_pandas()
    return out[["lang", "doc_id", "n_chars"]].sort_values(
        ["lang", "n_chars", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)


SQL_TOP_DOCS_PER_LANG = """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
         ) AS rn
  FROM documents
) WHERE rn <= 3
ORDER BY lang, n_chars DESC, doc_id
"""


_KMEANS_FIXTURE = "/tmp/ccwarc_kmeans_centroids.parquet"


def _ensure_kmeans_fixture() -> str:
    """L2 (non-spherical) k-means centroids (cluster_id, vec) trained
    ONCE on the fixed sf0.001 embeddings — the init point both sides of
    the kmeans_refine oracle share.  Race-safe pure function."""
    def build() -> pa.Table:
        cent = ann.kmeans_l2(_train_embeddings(), n_centroids=8, iters=5, seed=13)
        return pa.table({
            "cluster_id": pa.array(np.arange(len(cent), dtype=np.int64)),
            "vec": pa.array([row.tolist() for row in cent], pa.list_(pa.float64())),
        })

    return _fixture_once(_KMEANS_FIXTURE, build)


def q_kmeans_refine(sf_dir: str) -> pd.DataFrame:
    """One distributed Lloyd refinement step over the whole embeddings
    table (ann.kmeans_lloyd): squared-L2 assignment to the fixture
    centroids, exact per-cluster mean update via per-batch (cluster,
    count, sum) partials — the oracle re-derives assignment and means in
    SQL.  Long-form output (cluster_id, dim, n_members, c_r)."""
    cent = np.asarray(
        pq.read_table(_ensure_kmeans_fixture()).column("vec").to_pylist(),
        dtype=np.float64)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    new, counts = ann.kmeans_lloyd(ds, cent, iters=1, return_counts=True)
    rows = []
    for c in np.flatnonzero(counts > 0):
        for d in range(new.shape[1]):
            rows.append((int(c), d + 1, int(counts[c]), new[c, d]))
    out = pd.DataFrame(rows, columns=["cluster_id", "dim", "n_members", "c_r"])
    out["c_r"] = _r5(out["c_r"])
    return out.sort_values(["cluster_id", "dim"]).reset_index(drop=True)


SQL_KMEANS_REFINE = f"""
WITH cent AS (SELECT cluster_id, vec FROM read_parquet('{_KMEANS_FIXTURE}')),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL),
assign AS (
  SELECT vec_id, cluster_id, v FROM (
    SELECT e.vec_id, c.cluster_id, e.v,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_distance(e.v, c.vec) ASC, c.cluster_id
           ) AS rn
    FROM emb e CROSS JOIN cent c
  ) WHERE rn = 1
),
un AS (SELECT cluster_id, generate_subscripts(v, 1) AS dim, unnest(v) AS x
       FROM assign)
SELECT cluster_id, dim::BIGINT AS dim, count(*)::BIGINT AS n_members,
       floor(avg(x) * 100000 + 0.5) / 100000 AS c_r
FROM un GROUP BY cluster_id, dim
ORDER BY cluster_id, dim
"""


def q_semdedup(sf_dir: str) -> pd.DataFrame:
    """SemDedup keep/drop decisions over the embeddings table: spherical
    assignment to the IVF fixture centroids, within-cluster keep-first
    pruning at cosine >= 0.35 (dedup.semdedup_keep)."""
    cent_t = pq.read_table(_ensure_ivf_fixture())
    cent = np.asarray(cent_t.column("vec").to_pylist(), dtype=np.float64)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = dedup.semdedup_keep(ds, cent, threshold=0.35).to_pandas()
    return out[["vec_id", "cluster", "kept"]].sort_values("vec_id").reset_index(drop=True)


SQL_SEMDEDUP = f"""
WITH cent AS (SELECT list_id, vec FROM read_parquet('{_IVF_FIXTURE}')),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE embedding IS NOT NULL),
assign AS (
  SELECT vec_id, list_id AS cluster, v FROM (
    SELECT e.vec_id, c.list_id, e.v,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.vec) DESC, c.list_id
           ) AS rn
    FROM emb e CROSS JOIN cent c
  ) WHERE rn = 1
)
SELECT a.vec_id, a.cluster,
       NOT EXISTS (
         SELECT 1 FROM assign b
         WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id
           AND list_cosine_similarity(a.v, b.v) >= 0.35
       ) AS kept
FROM assign a ORDER BY a.vec_id
"""


def q_lang_char_quantiles(sf_dir: str) -> pd.DataFrame:
    """Per-language n_chars quantiles via the grouped discrete-quantile
    operator (one (key,value)-histogram shuffle, per-key rank pick)."""
    docs = _read(sf_dir, "documents", columns=["lang", "n_chars"])
    out = relational.grouped_quantiles_disc(
        docs, key="lang", col="n_chars", qs=[0.25, 0.5, 0.9]
    ).to_pandas()
    out = out.rename(columns={"value": "n_chars_q"})
    return out.sort_values(["lang", "q"]).reset_index(drop=True)


SQL_LANG_CHAR_QUANTILES = """
SELECT lang,
       unnest([0.25, 0.5, 0.9]) AS q,
       unnest(quantile_disc(n_chars, [0.25, 0.5, 0.9])) AS n_chars_q
FROM documents GROUP BY lang
ORDER BY lang, q
"""


def q_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """EXACT discrete quantiles of o_totalprice (integer cents) via a
    distributed value histogram — no global sort; the shuffle moves one
    (value, count) row per distinct value per batch (DuckDB
    quantile_disc semantics: rank = max(1, ceil(q*n)))."""
    orders = _read(sf_dir, "orders", columns=["o_totalprice"])

    def cents(tbl: pa.Table) -> pa.Table:
        return pa.table({
            "c": pa.array(_cents(tbl.column("o_totalprice").to_numpy(
                zero_copy_only=False)))
        })

    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    out = relational.quantiles_disc(
        orders.map_batches(cents, batch_format="pyarrow"), "c", qs)
    out = out.rename(columns={"value": "totalprice_c"})
    out["totalprice_c"] = out["totalprice_c"].astype("int64")
    return out.reset_index(drop=True)


SQL_PRICE_QUANTILES = """
WITH t AS (
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c FROM orders
),
agg AS (
  SELECT quantile_disc(c, [0.25, 0.5, 0.75, 0.9, 0.99]) AS l FROM t
)
SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
       unnest(l) AS totalprice_c
FROM agg
"""


_PQ_FIXTURE = "/tmp/ccwarc_pq_codebook.parquet"
_PQ_M, _PQ_K, _PQ_DSUB = 8, 16, 8  # 64-d -> 8 subspaces x 16 centroids


def _ensure_pq_fixture() -> str:
    """PQ codebook (sub_id, cent_id, vec) trained ONCE on the fixed
    sf0.001 embeddings — sf-independent, mirroring the reference's
    offline-trained codebook files (`IndexingManage.java:74-76`).  The
    oracle SQL reads the same parquet and independently re-derives
    per-subspace assignment + ADC ranking."""
    def build() -> pa.Table:
        cb = ann.pq_train_codebook(_train_embeddings(), m=_PQ_M, k=_PQ_K,
                                   iters=10, seed=7)
        rows_sub, rows_cent, rows_vec = [], [], []
        for j in range(cb.shape[0]):
            for c in range(cb.shape[1]):
                rows_sub.append(j)
                rows_cent.append(c)
                rows_vec.append(cb[j, c].tolist())
        return pa.table({
            "sub_id": pa.array(rows_sub, pa.int64()),
            "cent_id": pa.array(rows_cent, pa.int64()),
            "vec": pa.array(rows_vec, pa.list_(pa.float64())),
        })

    return _fixture_once(_PQ_FIXTURE, build)


def _pq_codebook() -> np.ndarray:
    t = pq.read_table(_ensure_pq_fixture())
    cb = np.zeros((_PQ_M, _PQ_K, _PQ_DSUB), dtype=np.float64)
    subs = t.column("sub_id").to_numpy()
    cents = t.column("cent_id").to_numpy()
    for i, v in enumerate(t.column("vec").to_pylist()):
        cb[subs[i], cents[i]] = v
    return cb


def q_pq_ann(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ADC top-k with a DuckDB oracle: the fixture
    codebook is shared; the oracle independently re-encodes every vector
    (per-subspace nearest centroid) and re-ranks by the same
    qq - 2qc + cc ADC sum.  The Ray path scans only the m-byte codes —
    the reference's IVFPQ memory layout (`IndexingManage.java:70-84`)."""
    cb = _pq_codebook()
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    codes = ann.pq_encode(ds, cb)
    out = ann.pq_adc_topk(codes, cb, _query_vecs(sf_dir), k=5)
    out["adc_r"] = _r5(out["adc"])
    return out[["query_id", "vec_id", "adc_r", "rank"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


SQL_PQ_ANN = f"""
WITH cb AS (SELECT sub_id, cent_id, vec FROM read_parquet('{_PQ_FIXTURE}')),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
subs AS (SELECT DISTINCT sub_id FROM cb),
esub AS (
  SELECT e.vec_id, s.sub_id,
         e.v[s.sub_id * {_PQ_DSUB} + 1 : s.sub_id * {_PQ_DSUB} + {_PQ_DSUB}] AS sv
  FROM emb e CROSS JOIN subs s
),
code AS (
  SELECT vec_id, sub_id, cvec FROM (
    SELECT es.vec_id, es.sub_id, cb.vec AS cvec,
           row_number() OVER (
             PARTITION BY es.vec_id, es.sub_id
             ORDER BY list_distance(es.sv, cb.vec) ASC, cb.cent_id
           ) AS rn
    FROM esub es JOIN cb ON cb.sub_id = es.sub_id
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v FROM emb WHERE vec_id < 3),
qsub AS (
  SELECT q.query_id, s.sub_id,
         q.v[s.sub_id * {_PQ_DSUB} + 1 : s.sub_id * {_PQ_DSUB} + {_PQ_DSUB}] AS sv
  FROM q CROSS JOIN subs s
),
adc AS (
  SELECT qs.query_id, c.vec_id,
         SUM(list_inner_product(qs.sv, qs.sv)
             - 2 * list_inner_product(qs.sv, c.cvec)
             + list_inner_product(c.cvec, c.cvec)) AS d
  FROM qsub qs JOIN code c ON c.sub_id = qs.sub_id
  GROUP BY qs.query_id, c.vec_id
),
ranked AS (
  SELECT query_id, vec_id, d,
         row_number() OVER (PARTITION BY query_id ORDER BY d ASC, vec_id) AS rank
  FROM adc
)
SELECT query_id, vec_id, floor(d * 100000 + 0.5) / 100000 AS adc_r, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


SQL_IVF_ANN = f"""
WITH cent AS (SELECT list_id, vec FROM read_parquet('{_IVF_FIXTURE}')),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
assign AS (
  SELECT vec_id, list_id FROM (
    SELECT e.vec_id, c.list_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.vec) DESC, c.list_id
           ) AS rn
    FROM emb e CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 3),
probe AS (
  SELECT query_id, list_id FROM (
    SELECT q.query_id, c.list_id,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, c.vec) DESC, c.list_id
           ) AS rn
    FROM q CROSS JOIN cent c
  ) WHERE rn <= 4
),
scored AS (
  SELECT q.query_id, a.vec_id, list_cosine_similarity(q.qv, e.v) AS cos
  FROM q
  JOIN probe p ON p.query_id = q.query_id
  JOIN assign a ON a.list_id = p.list_id
  JOIN emb e ON e.vec_id = a.vec_id
),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cos DESC, vec_id
         ) AS rank
  FROM scored
)
SELECT query_id, vec_id, floor(cos * 100000 + 0.5) / 100000 AS cosine_r, rank
FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# PII / line-level cleaning (fixture-backed: the sf documents table has
# no digits/@/newlines, so cleaning oracles over it would verify
# identity transforms — the enriched corpus gives every gate real work)
# ---------------------------------------------------------------------------

_RICHTEXT_FIXTURE = "/tmp/ccwarc_richtext_fixture.parquet"
_RICHTEXT_N = 2000


def _ensure_richtext_fixture() -> str:
    """Enriched ASCII text corpus (emails/phones/IPs, cross-doc
    boilerplate duplicates, short / unpunctuated / blocklisted lines) —
    pure function of the global seed, shared verbatim by the Ray
    queries and the DuckDB oracles."""
    return _fixture_once(
        _RICHTEXT_FIXTURE, lambda: synth.rich_documents_table(_RICHTEXT_N))


def _richtext_ds() -> rd.Dataset:
    # 8 blocks so the explode/grouped_min/hash_join stages actually
    # exercise their multi-block shuffle paths at fixture scale
    return rd.read_parquet(_ensure_richtext_fixture()).map_batches(
        _strip_meta, batch_format="pyarrow").repartition(8)


def q_pii_scrub(sf_dir: str) -> pd.DataFrame:
    """C4-style PII redaction (email → phone → IPv4, sequential
    stages).  The verification columns (length + md5 of the redacted
    text) are computed INSIDE map_batches so the corpus text never
    ships to the driver; md5 is verification-only — the operator's real
    output is the ``text_clean`` column."""
    import hashlib

    def kern(t: pa.Table) -> pa.Table:
        s = clean.pii_scrub(t)
        cleaned = s.column("text_clean")
        md5s = [hashlib.md5(x.encode()).hexdigest()
                for x in cleaned.to_pylist()]
        return pa.table({
            "doc_id": s.column("doc_id"),
            "n_emails": s.column("n_emails"),
            "n_phones": s.column("n_phones"),
            "n_ipv4": s.column("n_ipv4"),
            "n_chars_clean": pa.compute.utf8_length(cleaned).cast(pa.int64()),
            "clean_md5": pa.array(md5s, pa.string()),
        })

    out = _richtext_ds().map_batches(kern, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# Mirrors ops/clean.py pii_scrub: both engines run RE2, each stage
# counts on the PREVIOUS stage's redacted text (same sequential order).
SQL_PII_SCRUB = """
WITH d AS (SELECT * FROM read_parquet('{RT}')),
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{EMAIL}'))::BIGINT AS n_emails,
         regexp_replace(text, '{EMAIL}', '<EMAIL>', 'g') AS t1
  FROM d
),
s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{PHONE}'))::BIGINT AS n_phones,
         regexp_replace(t1, '{PHONE}', '<PHONE>', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, n_emails, n_phones,
         len(regexp_extract_all(t2, '{IP}'))::BIGINT AS n_ipv4,
         regexp_replace(t2, '{IP}', '<IP>', 'g') AS t3
  FROM s2
)
SELECT doc_id, n_emails, n_phones, n_ipv4,
       length(t3)::BIGINT AS n_chars_clean, md5(t3) AS clean_md5
FROM s3 ORDER BY doc_id
""".replace("{RT}", _RICHTEXT_FIXTURE).replace("{EMAIL}", clean.EMAIL_RE) \
   .replace("{PHONE}", clean.PHONE_RE).replace("{IP}", clean.IPV4_RE)


def q_line_filter(sf_dir: str) -> pd.DataFrame:
    """C4 per-line quality gates over the enriched corpus — one row per
    line with its word count and keep decision."""
    out = _richtext_ds().map_batches(
        lambda t: clean.line_filter(t), batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "line_idx"]).reset_index(drop=True)


SQL_LINE_FILTER = """
WITH d AS (SELECT * FROM read_parquet('{RT}')),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS line_idx
  FROM d
)
SELECT doc_id, line_idx::BIGINT AS line_idx,
       len(regexp_extract_all(line, '{W}'))::BIGINT AS n_words,
       (len(regexp_extract_all(line, '{W}')) >= {MINW}
        AND regexp_matches(line, '{TERM}')
        AND NOT regexp_matches(line, '{BL}')) AS kept
FROM lines ORDER BY doc_id, line_idx
""".replace("{RT}", _RICHTEXT_FIXTURE).replace("{W}", clean.WORD_RE) \
   .replace("{MINW}", str(clean.LINE_MIN_WORDS)) \
   .replace("{TERM}", clean.TERMINAL_RE).replace("{BL}", clean.BLOCKLIST_RE)


def q_line_dedup(sf_dir: str) -> pd.DataFrame:
    """RefinedWeb-style exact cross-document line dedup: every verbatim
    duplicate line keeps only its first global (doc_id, line_idx)
    occurrence.  Distributed explode → grouped_min → hash_join (line
    text never shuffles, only fixed-width hash/rank rows)."""
    out = clean.line_dedup(_richtext_ds()).to_pandas()
    return out.sort_values(["doc_id", "line_idx"]).reset_index(drop=True)


def q_clean_docs(sf_dir: str) -> pd.DataFrame:
    """The COMPOSED C4 cleaning pipeline as one per-document batch
    kernel: PII scrub → per-line gates on the redacted text → Arrow
    binary_join reassembly of surviving lines → drop docs with < 3 kept
    lines.  No shuffle — embarrassingly parallel map_batches; md5 of
    the reassembled text is the verification column."""
    import hashlib

    def kern(t: pa.Table) -> pa.Table:
        c = clean.clean_docs(t)
        md5s = [hashlib.md5(x.encode()).hexdigest()
                for x in c.column("text_clean").to_pylist()]
        return pa.table({
            "doc_id": c.column("doc_id"),
            "n_lines_kept": c.column("n_lines_kept"),
            "clean_md5": pa.array(md5s, pa.string()),
        })

    out = _richtext_ds().map_batches(kern, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_CLEAN_DOCS = """
WITH d AS (SELECT * FROM read_parquet('{RT}')),
s3 AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(text,
           '{EMAIL}', '<EMAIL>', 'g'),
           '{PHONE}', '<PHONE>', 'g'),
           '{IP}', '<IP>', 'g') AS t3
  FROM d
),
lines AS (
  SELECT doc_id,
         unnest(string_split(t3, chr(10))) AS line,
         generate_subscripts(string_split(t3, chr(10)), 1) AS line_idx
  FROM s3
),
kept AS (
  SELECT doc_id, line_idx, line FROM lines
  WHERE len(regexp_extract_all(line, '{W}')) >= {MINW}
    AND regexp_matches(line, '{TERM}')
    AND NOT regexp_matches(line, '{BL}')
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines_kept,
         string_agg(line, chr(10) ORDER BY line_idx) AS txt
  FROM kept GROUP BY 1
)
SELECT doc_id, n_lines_kept, md5(txt) AS clean_md5
FROM agg WHERE n_lines_kept >= 3 ORDER BY doc_id
""".replace("{RT}", _RICHTEXT_FIXTURE).replace("{EMAIL}", clean.EMAIL_RE) \
   .replace("{PHONE}", clean.PHONE_RE).replace("{IP}", clean.IPV4_RE) \
   .replace("{W}", clean.WORD_RE).replace("{MINW}", str(clean.LINE_MIN_WORDS)) \
   .replace("{TERM}", clean.TERMINAL_RE).replace("{BL}", clean.BLOCKLIST_RE)


def q_dup_spans(sf_dir: str) -> pd.DataFrame:
    """Exact-substring duplicate-span coverage (Lee et al. 2021 at
    word-4-gram granularity): per doc, the tokens covered by the union
    of corpus-duplicated gram spans.  Distributed explode →
    grouped_count → hash_join back → per-doc interval-union kernel;
    text never leaves the explode stage."""
    out = dedup.dup_span_stats(_richtext_ds(), n=4).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# Gram equality is exact strings here vs xxh64 hashes on the Ray side
# (decontaminate's documented convention); interval-union coverage is
# re-derived as DISTINCT covered positions.
SQL_DUP_SPANS = """
WITH d AS (SELECT * FROM read_parquet('{RT}')),
toks AS (SELECT doc_id, regexp_extract_all(lower(text), '{W}') AS t FROM d),
g AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(list_slice(t, i, i + 3), ' ') AS gram
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 4)
),
cnt AS (SELECT gram, count(*) AS c FROM g GROUP BY 1),
dup AS (SELECT g.doc_id, g.pos FROM g JOIN cnt ON cnt.gram = g.gram
        WHERE cnt.c >= 2),
cov AS (SELECT DISTINCT doc_id, pos + u.u AS p
        FROM dup, unnest(range(4)) AS u(u)),
covn AS (SELECT doc_id, count(*)::BIGINT AS covered_tokens FROM cov GROUP BY 1),
dupn AS (SELECT doc_id, count(*)::BIGINT AS n_dup_grams FROM dup GROUP BY 1),
stats AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '{W}'))::BIGINT AS n_tokens
  FROM d
)
SELECT s.doc_id, s.n_tokens,
       greatest(s.n_tokens - 3, 0)::BIGINT AS n_grams,
       coalesce(dn.n_dup_grams, 0)::BIGINT AS n_dup_grams,
       coalesce(cn.covered_tokens, 0)::BIGINT AS covered_tokens
FROM stats s
LEFT JOIN dupn dn USING (doc_id) LEFT JOIN covn cn USING (doc_id)
ORDER BY s.doc_id
""".replace("{RT}", _RICHTEXT_FIXTURE).replace("{W}", clean.WORD_RE)


def q_remove_dup_spans(sf_dir: str) -> pd.DataFrame:
    """The exact-substring dedup TRANSFORM (Lee et al. 2021):
    `ops/dedup.py:remove_dup_spans` drops every token covered by a
    corpus-duplicated 4-gram span and rebuilds the document.  md5 of
    the rebuilt text is computed inside map_batches (text never ships
    to the driver); the oracle re-derives the kept token stream with
    exact-string gram equality."""
    import hashlib

    def digest(t: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(x.encode()).hexdigest()
                for x in t.column("clean_text").to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": t.column("n_tokens"),
            "kept_tokens": t.column("kept_tokens"),
            "clean_md5": pa.array(md5s, pa.string()),
        })

    out = (dedup.remove_dup_spans(_richtext_ds(), n=4)
           .map_batches(digest, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


# Same CTE front half as SQL_DUP_SPANS (exact-string gram equality vs
# xxh64 on the Ray side — the documented convention); the back half
# rebuilds the kept token stream and md5s it.
SQL_REMOVE_DUP_SPANS = """
WITH d AS (SELECT * FROM read_parquet('{RT}')),
toks AS (SELECT doc_id, regexp_extract_all(lower(text), '{W}') AS t FROM d),
tok AS (
  SELECT doc_id, unnest(t) AS w,
         generate_subscripts(t, 1) - 1 AS pos
  FROM toks
),
g AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(list_slice(t, i, i + 3), ' ') AS gram
  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 4)
),
cnt AS (SELECT gram, count(*) AS c FROM g GROUP BY 1),
dup AS (SELECT g.doc_id, g.pos FROM g JOIN cnt ON cnt.gram = g.gram
        WHERE cnt.c >= 2),
cov AS (SELECT DISTINCT doc_id, pos + u.u AS p
        FROM dup, unnest(range(4)) AS u(u)),
kept AS (
  SELECT tk.doc_id, tk.w, tk.pos
  FROM tok tk LEFT JOIN cov c ON tk.doc_id = c.doc_id AND tk.pos = c.p
  WHERE c.p IS NULL
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS kept_tokens,
         string_agg(w, ' ' ORDER BY pos) AS ct
  FROM kept GROUP BY 1
),
stats AS (SELECT doc_id, len(t)::BIGINT AS n_tokens FROM toks)
SELECT s.doc_id, s.n_tokens,
       coalesce(a.kept_tokens, 0)::BIGINT AS kept_tokens,
       md5(coalesce(a.ct, '')) AS clean_md5
FROM stats s LEFT JOIN agg a USING (doc_id)
ORDER BY s.doc_id
""".replace("{RT}", _RICHTEXT_FIXTURE).replace("{W}", clean.WORD_RE)


# Exact-string first-occurrence rule; the Ray side keys on xxh64(line)
# (collision convention documented in ops/clean.py — exact equality at
# fixture scale).
SQL_LINE_DEDUP = """
WITH d AS (SELECT * FROM read_parquet('{RT}')),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) - 1 AS line_idx
  FROM d
),
ne AS (SELECT * FROM lines WHERE length(line) > 0),
r AS (
  SELECT doc_id, line_idx,
         row_number() OVER (PARTITION BY line
                            ORDER BY doc_id, line_idx) AS rn
  FROM ne
)
SELECT doc_id, line_idx::BIGINT AS line_idx, rn = 1 AS kept
FROM r ORDER BY doc_id, line_idx
""".replace("{RT}", _RICHTEXT_FIXTURE)


# ---------------------------------------------------------------------------
# Iterative graph operators (round 4): PageRank + multi-source BFS over
# the bipartite customer<->supplier link graph derived from
# orders x lineitem.  Node ids: customer c -> 2c, supplier s -> 2s+1.
# The edge list is symmetric (both directions of every distinct
# (cust, supp) pair), so every node has outdegree >= 1 and no dangling
# mass leaks.  See ops/graph.py for the per-iteration shuffle shape.
# ---------------------------------------------------------------------------

_SQL_BIPARTITE_EDGES = """
e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)
"""


def _bipartite_edges(sf_dir: str) -> rd.Dataset:
    """Distinct symmetric (src, dst) edges of the customer<->supplier
    graph, as a Dataset.  orders is the join's broadcast side."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]),
        batch_format="pyarrow")
    j = relational.hash_join(li, orders, key="l_orderkey")

    def both_dirs(t: pa.Table) -> pa.Table:
        c = (t.column("o_custkey").to_numpy() * 2).astype(np.int64)
        s = (t.column("l_suppkey").to_numpy() * 2 + 1).astype(np.int64)
        return pa.table({
            "src": np.concatenate([c, s]),
            "dst": np.concatenate([s, c]),
        })

    return relational.grouped_min(
        j.map_batches(both_dirs, batch_format="pyarrow"), ["src", "dst"], [])


_PR_ITERS = 5


def q_pagerank(sf_dir: str) -> pd.DataFrame:
    """Power-iteration PageRank (5 sweeps, d=0.85) over the bipartite
    customer<->supplier graph.  Output pr_scaled = rank * n_nodes,
    floor-rounded to 6 decimals on both sides — fp summation order
    differs between engines (~1e-15 relative), the rounding makes the
    value-hash exact."""
    out = graph.pagerank(_bipartite_edges(sf_dir), iters=_PR_ITERS).to_pandas()
    n = float(len(out))
    out["pr_scaled"] = np.floor(out["pr"].to_numpy() * n * 1e6 + 0.5) / 1e6
    return out[["node", "pr_scaled"]].sort_values("node").reset_index(drop=True)


def _pagerank_sql_rounds(k: int) -> str:
    parts = ["r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"]
    for i in range(1, k + 1):
        parts.append(f"""i{i} AS (
  SELECT e.dst AS node, sum(r{i-1}.pr / deg.outdeg) AS s
  FROM e JOIN r{i-1} ON r{i-1}.node = e.src JOIN deg ON deg.src = e.src
  GROUP BY 1),
r{i} AS (
  SELECT nodes.node, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(i{i}.s, 0) AS pr
  FROM nodes LEFT JOIN i{i} USING (node))""")
    return ",\n".join(parts)


SQL_PAGERANK = f"""
WITH {_SQL_BIPARTITE_EDGES.strip()},
nodes AS (SELECT DISTINCT src AS node FROM e),
nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY 1),
{_pagerank_sql_rounds(_PR_ITERS)}
SELECT node, floor(pr * (SELECT n FROM nn) * 1e6 + 0.5) / 1e6 AS pr_scaled
FROM r{_PR_ITERS} ORDER BY node
"""


def q_graph_bfs(sf_dir: str) -> pd.DataFrame:
    """Multi-source BFS hop distance (<= 3 hops) from the suppliers of
    nation 0 over the bipartite graph — the crawl-depth-from-seeds
    audit as a standalone iterative operator.  Integer-exact."""
    supp = _pq(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp = supp.filter(pa.compute.equal(supp.column("s_nationkey"), 0))
    seeds = rd.from_arrow(pa.table({
        "node": pa.compute.add(
            pa.compute.multiply(supp.column("s_suppkey"), 2), 1).combine_chunks()
    }))
    out = graph.bfs_hops(_bipartite_edges(sf_dir), seeds, max_hops=3).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


SQL_GRAPH_BFS = f"""
WITH RECURSIVE {_SQL_BIPARTITE_EDGES.strip()},
seeds AS (SELECT s_suppkey * 2 + 1 AS node FROM supplier WHERE s_nationkey = 0),
walk(node, hops) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.hops < 3
)
SELECT node, CAST(min(hops) AS BIGINT) AS hops FROM walk GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# TF-IDF top terms per document (round 4) — the two-level corpus
# statistic (per-doc tf x corpus-wide df) every ranking/quality pipeline
# needs; exercises explode -> high-cardinality grouped_agg -> adaptive
# term join -> per-key top-k in one query.
# ---------------------------------------------------------------------------

def q_tfidf_terms(sf_dir: str) -> pd.DataFrame:
    """Top-3 TF-IDF terms per document (score DESC, term ASC).

    Tokens: RE2 [0-9A-Za-z_]+ runs of lower(text) via Arrow's
    split_pattern_regex — the same engine as the oracle.  idf =
    ln(n_docs/df) in float64; the ranking score is floor-rounded to 6
    decimals BEFORE the top-k on both sides, so exact rational ties
    (tf1*ln(N/df1) == tf2*ln(N/df2)) collapse to the term tie-break
    instead of depending on libm's last ulp."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"]).materialize()
    n_docs = float(docs.count())

    def explode(t: pa.Table) -> pa.Table:
        toks = pa.compute.split_pattern_regex(
            pa.compute.utf8_lower(t.column("text")), r"[^0-9A-Za-z_]+")
        flat = pa.compute.list_flatten(toks)
        ids = pa.compute.take(t.column("doc_id"),
                              pa.compute.list_parent_indices(toks))
        keep = pa.compute.not_equal(flat, "")
        return pa.table({"doc_id": ids, "term": flat}).filter(keep)

    tf = relational.grouped_count(
        docs.map_batches(explode, batch_format="pyarrow"),
        ["doc_id", "term"], alias="tf").materialize()
    df = relational.grouped_count(tf, ["term"], alias="_df")

    def score(t: pa.Table) -> pa.Table:
        tfv = t.column("tf").to_numpy().astype(np.float64)
        dfv = t.column("_df").to_numpy().astype(np.float64)
        s = np.floor(tfv * np.log(n_docs / dfv) * 1e6 + 0.5) / 1e6
        return pa.table({"doc_id": t.column("doc_id"), "term": t.column("term"),
                         "tf": t.column("tf"), "score": s})

    scored = relational.hash_join(tf, df, key="term").map_batches(
        score, batch_format="pyarrow")

    # Arrow-native per-key top-3 (partitioned_map's kernel contract is
    # pandas; the string sort + run-length rank stays cheaper in Arrow)
    def top3(gt: pa.Table) -> pa.Table:
        t = gt.drop_columns(["_part"]).sort_by(
            [("doc_id", "ascending"), ("score", "descending"),
             ("term", "ascending")])
        d = t.column("doc_id").to_numpy()
        starts = np.r_[0, np.flatnonzero(d[1:] != d[:-1]) + 1]
        sizes = np.diff(np.r_[starts, len(d)])
        rank = np.arange(len(d)) - np.repeat(starts, sizes)
        return t.filter(pa.array(rank < 3)).replace_schema_metadata(None)

    out = (scored
           .map_batches(relational.make_part_assigner(["doc_id"], 32),
                        batch_format="pyarrow")
           .groupby("_part")
           .map_groups(top3, batch_format="pyarrow")
           .to_pandas())
    return (out[["doc_id", "term", "tf", "score"]]
            .sort_values(["doc_id", "term"]).reset_index(drop=True))


SQL_TFIDF_TERMS = """
WITH d AS (SELECT doc_id, lower(text) AS t FROM documents),
toks AS (SELECT doc_id, unnest(regexp_extract_all(t, '[0-9A-Za-z_]+')) AS term
         FROM d),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*)::DOUBLE AS n FROM d),
sc AS (SELECT tf.doc_id, tf.term, tf.tf,
              floor(tf.tf * ln((SELECT n FROM nd) / df.df) * 1e6 + 0.5) / 1e6
                AS score
       FROM tf JOIN df USING (term)),
r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term ASC) AS rn
      FROM sc)
SELECT doc_id, term, tf, score FROM r WHERE rn <= 3 ORDER BY doc_id, term
"""


def q_triangle_stats(sf_dir: str) -> pd.DataFrame:
    """Per-node triangle counts (degree-oriented node-iterator,
    ``ops/graph.node_triangles``) over the parts co-occurrence graph:
    an undirected edge joins two parts that appear in the same order,
    both with quantity > 30 (the predicate thins the otherwise
    near-complete co-occurrence graph so the query isn't wedge-bound;
    the operator's density behavior is covered by tests/test_graph.py).
    Triangles = cliques of mutually co-ordered parts — the basket-
    analysis shape of the crawl engine's near-dup group statistics."""
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_quantity"]).map_batches(
        lambda t: t.filter(pa.compute.greater(t.column("l_quantity"), 30))
                   .select(["l_orderkey", "l_partkey"]),
        batch_format="pyarrow")
    li2 = li.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "_p2"]),
        batch_format="pyarrow")
    j = relational.hash_join(li, li2, key="l_orderkey")

    def mk(t: pa.Table) -> pa.Table:
        keep = pa.compute.less(t.column("l_partkey"), t.column("_p2"))
        out = t.filter(keep)
        return pa.table({"src": out.column("l_partkey"),
                         "dst": out.column("_p2")})

    edges = j.map_batches(mk, batch_format="pyarrow")
    out = graph.node_triangles(edges).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


SQL_TRIANGLE_STATS = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity > 30),
e AS (
  SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
  FROM li l1 JOIN li l2
    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
SELECT node, count(*)::BIGINT AS tri_cnt FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
GROUP BY 1 ORDER BY 1
"""


def q_inverted_index(sf_dir: str) -> pd.DataFrame:
    """Whitespace-token inverted index over documents: per-term document
    frequency + md5 of the ascending comma-joined posting list
    (``ops/text.inverted_index``; the digest keeps the result O(vocab)
    while still pinning every posting list bit-exactly)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = text.inverted_index(docs).to_pandas()
    return out.sort_values("term").reset_index(drop=True)


SQL_INVERTED_INDEX = """
WITH tok AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term
    FROM documents)
  WHERE term <> '')
SELECT term, count(*)::BIGINT AS df,
       md5(string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)) AS postings_md5
FROM tok GROUP BY 1 ORDER BY 1
"""


_PACK_BUDGET = 2048


def q_token_packing(sf_dir: str) -> pd.DataFrame:
    """Token-budget sequence packing for a training-shard writer: each
    document occupies ``[start_off, start_off + n_ws_tokens)`` in the
    doc_id-ordered global token stream; ``seq_id`` is the fixed-size
    (2048-token) training sequence its first token lands in.  The global
    offsets come from :func:`relational.prefix_sum` — a distributed scan
    (per-block partials, driver exclusive-scan over one row per block,
    per-block local cumsum); only (min, sum) pairs leave the workers."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    toks = docs.map_batches(
        lambda t: text.token_counts(t).select(["doc_id", "n_ws_tokens"]),
        batch_format="pyarrow")
    # documents.parquet is written sorted by doc_id and read tasks cover
    # contiguous row ranges, so blocks are already range-partitioned —
    # the scan's only shuffle (the sort) can be skipped
    packed = relational.prefix_sum(toks, "doc_id", "n_ws_tokens",
                                   out_col="start_off",
                                   assume_range_partitioned=True)

    def pack(t: pa.Table) -> pa.Table:
        off = t.column("start_off").to_numpy(zero_copy_only=False)
        n = t.column("n_ws_tokens").to_numpy(zero_copy_only=False)
        seq = off // _PACK_BUDGET
        last = np.where(n > 0, (off + n - 1) // _PACK_BUDGET, seq)
        nseq = np.where(n > 0, last - seq + 1, 0)
        return (t.append_column("seq_id", pa.array(seq, pa.int64()))
                 .append_column("n_seqs", pa.array(nseq, pa.int64())))

    out = packed.map_batches(pack, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_TOKEN_PACKING = f"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))::BIGINT AS n_ws_tokens
  FROM documents),
o AS (
  SELECT doc_id, n_ws_tokens,
         CAST(coalesce(SUM(n_ws_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
  FROM toks)
SELECT doc_id, n_ws_tokens, start_off,
       CAST(start_off // {_PACK_BUDGET} AS BIGINT) AS seq_id,
       CAST(CASE WHEN n_ws_tokens = 0 THEN 0
            ELSE (start_off + n_ws_tokens - 1) // {_PACK_BUDGET}
                 - start_off // {_PACK_BUDGET} + 1 END AS BIGINT) AS n_seqs
FROM o ORDER BY doc_id
"""


def q_quality_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet-style per-language quality bucketing (Wenzek et al. 2020):
    tercile thresholds per language via the grouped discrete-quantile
    operator (one (key, value)-histogram shuffle), broadcast to a
    threshold map, bucket assignment + counts fully distributed.
    Buckets compare the SAME 5-decimal-rounded doubles on both sides, so
    threshold ties are exact; only count/min/max aggregate (never a
    float sum — summation order differs between engines)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def score(t: pa.Table) -> pa.Table:
        s = text.quality_scores(t)
        return pa.table({
            "lang": t.column("lang"),
            "quality_r": pa.array(_r5(s.column("quality").to_numpy())),
        })

    scored = docs.map_batches(score, batch_format="pyarrow").materialize()
    th = relational.grouped_quantiles_disc(
        scored, key="lang", col="quality_r", qs=[0.33, 0.66]).to_pandas()
    tmap: dict[str, tuple[float, float]] = {}
    for lang, grp in th.groupby("lang"):
        g = grp.sort_values("q")
        tmap[lang] = (float(g["value"].iloc[0]), float(g["value"].iloc[1]))

    def bucket(t: pa.Table) -> pa.Table:
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(langs)
        t1 = np.array([tmap[l][0] for l in uniq])[codes]
        t2 = np.array([tmap[l][1] for l in uniq])[codes]
        qv = t.column("quality_r").to_numpy()
        b = np.where(qv <= t1, "tail", np.where(qv <= t2, "middle", "head"))
        return t.append_column("bucket", pa.array(b, pa.string()))

    out = relational.grouped_agg(
        scored.map_batches(bucket, batch_format="pyarrow"),
        ["lang", "bucket"],
        [(None, "count", "n_docs"), ("quality_r", "min", "q_min"),
         ("quality_r", "max", "q_max")],
    ).to_pandas()
    return out.sort_values(["lang", "bucket"]).reset_index(drop=True)


SQL_QUALITY_BUCKETS = """
WITH q AS (SELECT doc_id, quality FROM ({quality_sql})),
j AS (SELECT d.lang, q.quality AS quality_r
      FROM q JOIN documents d USING (doc_id)),
th AS (SELECT lang, quantile_disc(quality_r, 0.33) AS t1,
              quantile_disc(quality_r, 0.66) AS t2
       FROM j GROUP BY lang)
SELECT j.lang,
       CASE WHEN quality_r <= t1 THEN 'tail'
            WHEN quality_r <= t2 THEN 'middle'
            ELSE 'head' END AS bucket,
       count(*)::BIGINT AS n_docs,
       min(quality_r) AS q_min, max(quality_r) AS q_max
FROM j JOIN th USING (lang)
GROUP BY 1, 2 ORDER BY 1, 2
""".replace("{quality_sql}", SQL_QUALITY_SCORES)


def _enrich_docs(t: pa.Table) -> pa.Table:
    """Deterministically inject PII into the sf documents table (which
    carries no digits/@) so cleaning oracles verify NON-identity
    transforms at EVERY scale factor — the sf-scaled sibling of the
    fixed-size richtext fixture.  Byte-identical to the SQL enrichment
    CTE in ``SQL_PII_SCRUB_SF``."""
    k = t.column("doc_id")
    knp = k.to_numpy(zero_copy_only=False)
    kstr = pc.cast(k, pa.string())

    def istr(arr) -> pa.Array:
        return pc.cast(pa.array(arr.astype(np.int64)), pa.string())

    def pad(arr, width) -> pa.Array:
        return pc.utf8_lpad(istr(arr), width=width, padding="0")

    j = pc.binary_join_element_wise
    email = pc.if_else(
        pa.array(knp % 3 == 0),
        j("\nContact: user", kstr, "@mail", istr(knp % 7), ".example", ""),
        "")
    phone = pc.if_else(
        pa.array(knp % 4 == 1),
        j("\nCall ", istr(100 + knp % 900), "-", pad(knp % 1000, 3), "-",
          pad(knp % 10000, 4), " now.", ""),
        "")
    ip = pc.if_else(
        pa.array(knp % 5 == 2),
        j("\nServer 10.", istr(knp % 256), ".0.", istr(knp % 254 + 1),
          " logged.", ""),
        "")
    text2 = j(pc.fill_null(t.column("text"), ""), email, phone, ip, "")
    return pa.table({"doc_id": k, "text": text2})


_SQL_ENRICH_DOCS = """
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'Contact: user' || doc_id::VARCHAR
            || '@mail' || (doc_id % 7)::VARCHAR || '.example' ELSE '' END
    || CASE WHEN doc_id % 4 = 1 THEN chr(10) || 'Call ' || (100 + doc_id % 900)::VARCHAR
            || '-' || lpad((doc_id % 1000)::VARCHAR, 3, '0')
            || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' now.' ELSE '' END
    || CASE WHEN doc_id % 5 = 2 THEN chr(10) || 'Server 10.' || (doc_id % 256)::VARCHAR
            || '.0.' || (doc_id % 254 + 1)::VARCHAR || ' logged.' ELSE '' END AS text
  FROM documents
"""


def q_pii_scrub_sf(sf_dir: str) -> pd.DataFrame:
    """sf-SCALED PII redaction: the same email → phone → IPv4 stages as
    ``pii_scrub`` but over the full documents table with deterministic
    inline enrichment (:func:`_enrich_docs`), so the cleaning family has
    a bench-able operator whose input grows with the scale factor."""
    import hashlib

    def kern(t: pa.Table) -> pa.Table:
        s = clean.pii_scrub(_enrich_docs(t))
        cleaned = s.column("text_clean")
        md5s = [hashlib.md5(x.encode()).hexdigest()
                for x in cleaned.to_pylist()]
        return pa.table({
            "doc_id": s.column("doc_id"),
            "n_emails": s.column("n_emails"),
            "n_phones": s.column("n_phones"),
            "n_ipv4": s.column("n_ipv4"),
            "n_chars_clean": pc.utf8_length(cleaned).cast(pa.int64()),
            "clean_md5": pa.array(md5s, pa.string()),
        })

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(kern, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_PII_SCRUB_SF = """
WITH d AS ({ENRICH}),
s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{EMAIL}'))::BIGINT AS n_emails,
         regexp_replace(text, '{EMAIL}', '<EMAIL>', 'g') AS t1
  FROM d
),
s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{PHONE}'))::BIGINT AS n_phones,
         regexp_replace(t1, '{PHONE}', '<PHONE>', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, n_emails, n_phones,
         len(regexp_extract_all(t2, '{IP}'))::BIGINT AS n_ipv4,
         regexp_replace(t2, '{IP}', '<IP>', 'g') AS t3
  FROM s2
)
SELECT doc_id, n_emails, n_phones, n_ipv4,
       length(t3)::BIGINT AS n_chars_clean, md5(t3) AS clean_md5
FROM s3 ORDER BY doc_id
""".replace("{ENRICH}", _SQL_ENRICH_DOCS).replace("{EMAIL}", clean.EMAIL_RE) \
   .replace("{PHONE}", clean.PHONE_RE).replace("{IP}", clean.IPV4_RE)


_URL_BLOCKLIST = ("badcasino.example", "tracker.adsite.example")


def q_url_filter(sf_dir: str) -> pd.DataFrame:
    """RefinedWeb-style URL curation (Penedo et al. 2023 §3.1) over a
    deterministic URL corpus derived from doc_id (blocklisted hosts,
    spam keywords, deep paths, over-long URLs, tracking params — the sf
    tables carry no URL column, so the corpus is synthesized identically
    on both sides, like crawl_admission's seed frontier).  All gates are
    Arrow RE2 / hash kernels (:func:`clean.url_quality_gates`)."""
    docs = _read(sf_dir, "documents", columns=["doc_id"])
    hosts13 = pa.array(
        list(_URL_BLOCKLIST) + [f"site{i:02d}.example" for i in range(2, 13)],
        pa.string())
    dirs9 = pa.array(["/dir" * d for d in range(9)], pa.string())

    def synth_urls(t: pa.Table) -> pa.Table:
        k = t.column("doc_id").to_numpy(zero_copy_only=False)
        host = hosts13.take(pa.array(k % 13))
        dirs = dirs9.take(pa.array(k % 9))
        kstr = pc.cast(t.column("doc_id"), pa.string())
        tag = pc.if_else(pa.array(k % 17 == 3), "-pokernight", "")
        qsfx = pc.if_else(
            pa.array(k % 6 == 0),
            pc.binary_join_element_wise("?utm_source=feed&id=", kstr, ""),
            "")
        url = pc.binary_join_element_wise(
            "http://", host, dirs, "/p", kstr, tag, ".html", qsfx, "")
        return pa.table({"doc_id": t.column("doc_id"), "url": url})

    out = docs.map_batches(synth_urls, batch_format="pyarrow").map_batches(
        lambda t: clean.url_quality_gates(t, blocklist=_URL_BLOCKLIST),
        batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_URL_FILTER = """
WITH u AS (
  SELECT doc_id,
    'http://' ||
    CASE WHEN doc_id % 13 = 0 THEN 'badcasino.example'
         WHEN doc_id % 13 = 1 THEN 'tracker.adsite.example'
         ELSE 'site' || lpad((doc_id % 13)::VARCHAR, 2, '0') || '.example' END ||
    repeat('/dir', (doc_id % 9)::INT) || '/p' || doc_id::VARCHAR ||
    CASE WHEN doc_id % 17 = 3 THEN '-pokernight' ELSE '' END || '.html' ||
    CASE WHEN doc_id % 6 = 0 THEN '?utm_source=feed&id=' || doc_id::VARCHAR
         ELSE '' END AS url
  FROM documents),
p AS (
  SELECT doc_id, url,
    lower(regexp_replace(regexp_replace(url, '^[a-z][a-z0-9+.-]*://', ''),
                         '[/?#].*$', '')) AS host,
    regexp_replace(regexp_replace(url, '^[a-z][a-z0-9+.-]*://[^/?#]*', ''),
                   '[?#].*$', '') AS path,
    length(url)::BIGINT AS url_len
  FROM u),
f AS (
  SELECT doc_id, url, host,
    (length(path) - length(replace(path, '/', '')))::BIGINT AS n_segments,
    url_len,
    CASE WHEN host IN ('badcasino.example', 'tracker.adsite.example')
         THEN 1 ELSE 0 END::INTEGER AS bad_domain,
    CASE WHEN regexp_matches(url, '(?i)casino|poker|viagra|lottery')
         THEN 1 ELSE 0 END::INTEGER AS bad_word,
    CASE WHEN (length(path) - length(replace(path, '/', ''))) > 6
         THEN 1 ELSE 0 END::INTEGER AS too_deep,
    CASE WHEN length(url) > 60 THEN 1 ELSE 0 END::INTEGER AS too_long,
    CASE WHEN regexp_matches(url, '[?&](utm_[a-z]+|sessionid|sid)=')
         THEN 1 ELSE 0 END::INTEGER AS has_tracking
  FROM p)
SELECT *, CASE WHEN bad_domain = 0 AND bad_word = 0 AND too_deep = 0
               AND too_long = 0 AND has_tracking = 0
          THEN 1 ELSE 0 END::INTEGER AS keep
FROM f ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

# Dict order matters: the external driver checks the FIRST 50 entries
# against the DuckDB oracles at sf0.01.  Rounds 1-4 earned green driver
# rows for the older families (see CORRECTNESS_r0{1..4}.json); round 5
# fronts the families that have not yet had a driver row (all were
# oracle-backed + pytest-green in round 4), then fills the remaining
# slots with the flagship crawl / WARC / dedup representatives.  Every
# query stays verified every round by tools/check_oracle.py + pytest.
QUERIES = {
    # --- previously driver-unchecked (rounds 4): classify / clean /
    # graph / image / scan families ---
    "forest_classify": q_forest_classify,
    "media_classify": q_media_classify,
    "media_forest": q_media_forest,
    "pagerank": q_pagerank,
    "graph_bfs": q_graph_bfs,
    "triangle_stats": q_triangle_stats,
    "clean_docs": q_clean_docs,
    "remove_dup_spans": q_remove_dup_spans,
    "dup_spans": q_dup_spans,
    "line_dedup": q_line_dedup,
    "line_filter": q_line_filter,
    "pii_scrub": q_pii_scrub,
    "token_packing": q_token_packing,
    "quality_buckets": q_quality_buckets,
    "url_filter": q_url_filter,
    "tfidf_terms": q_tfidf_terms,
    "inverted_index": q_inverted_index,
    "image_hashes": q_image_hashes,
    "image_augment": q_image_augment,
    "phash_topk": q_phash_topk,
    "image_curation": q_image_curation,
    "dhash_neardup": q_dhash_neardup,
    "media_prep": q_media_prep,
    "lsh_ann": q_lsh_ann,
    "pq_ann": q_pq_ann,
    "price_quantiles": q_price_quantiles,
    "top_docs_per_lang": q_top_docs_per_lang,
    "lang_char_quantiles": q_lang_char_quantiles,
    # --- driver-green representatives (rounds 1-4): flagship crawl,
    # WARC jobs, dedup/ANN, text-prep ---
    "crawl_flagship": q_crawl_flagship,
    "crawl_streaming": q_crawl_streaming,
    "discovery_crawl": q_discovery_crawl,
    "crawl_admission": q_crawl_admission,
    "crawl_schedule": q_crawl_schedule,
    "warc_tag_counts": q_warc_tag_counts,
    "warc_word_counts": q_warc_word_counts,
    "warc_server_counts": q_warc_server_counts,
    "warc_job_counters": q_warc_job_counters,
    "media_src_index": q_media_src_index,
    "media_extract": q_media_extract,
    "minhash_pairs": q_minhash_pairs,
    "jaccard_pairs": q_jaccard_pairs,
    "lm_perplexity": q_lm_perplexity,
    "incremental_dedup": q_incremental_dedup,
    "pca_embeddings": q_pca_embeddings,
    "phash_neardup": q_phash_neardup,
    "phash_groups_dist": q_phash_groups_dist,
    "semdedup": q_semdedup,
    "ivf_ann": q_ivf_ann,
    "events_asof_orders": q_events_asof_orders,
    "image_validate": q_image_validate,
    # --- driver cap (50) reached above; the rest keep their historical
    # green rows (CORRECTNESS_r01-r04) + pytest/check_oracle coverage ---
    "word_count": q_word_count,
    "doc_stats": q_doc_stats,
    "pii_scrub_sf": q_pii_scrub_sf,
    "simhash_pairs": q_simhash_pairs,
    "kmeans_refine": q_kmeans_refine,
    "minhash_neardup": q_minhash_neardup,
    "top_users": q_top_users,
    "first_doc_per_lang": q_first_doc_per_lang,
    "source_threshold": q_source_threshold,
    "pricing_summary": q_pricing_summary,
    "asia_customers": q_asia_customers,
    "parts_never_hiqty": q_parts_never_hiqty,
    "event_windows": q_event_windows,
    "event_bursts": q_event_bursts,
    "event_hopping": q_event_hopping,
    "session_windows": q_session_windows,
    "union_nationkeys": q_union_nationkeys,
    "exact_dedup_docs": q_exact_dedup_docs,
    "doc_token_counts": q_doc_token_counts,
    "ann_topk": q_ann_topk,
    "embedding_pairs": q_embedding_pairs,
    "orders_by_segment": q_orders_by_segment,
    "brand_quantity": q_brand_quantity,
    "stratified_docs": q_stratified_docs,
    "phash_groups": q_phash_groups,
    "langid": q_langid,
    "quality_scores": q_quality_scores,
    "repetition_scores": q_repetition_scores,
    "decontaminate": q_decontaminate,
    "mix_sources": q_mix_sources,
    "fingerprint": q_fingerprint,
    "ngram_scores": q_ngram_scores,
    "text_prep": q_text_prep,
}

ORACLES = {
    "word_count": SQL_WORD_COUNT,
    "doc_stats": SQL_DOC_STATS,
    "top_users": SQL_TOP_USERS,
    "first_doc_per_lang": SQL_FIRST_DOC_PER_LANG,
    "source_threshold": SQL_SOURCE_THRESHOLD,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "asia_customers": SQL_ASIA_CUSTOMERS,
    "parts_never_hiqty": SQL_PARTS_NEVER_HIQTY,
    "event_windows": SQL_EVENT_WINDOWS,
    "events_asof_orders": SQL_EVENTS_ASOF_ORDERS,
    "event_bursts": SQL_EVENT_BURSTS,
    "event_hopping": SQL_EVENT_HOPPING,
    "session_windows": SQL_SESSION_WINDOWS,
    "union_nationkeys": SQL_UNION_NATIONKEYS,
    "exact_dedup_docs": SQL_EXACT_DEDUP_DOCS,
    "doc_token_counts": SQL_DOC_TOKEN_COUNTS,
    "ann_topk": SQL_ANN_TOPK,
    "embedding_pairs": SQL_EMBEDDING_PAIRS,
    "crawl_schedule": SQL_CRAWL_SCHEDULE,
    "orders_by_segment": SQL_ORDERS_BY_SEGMENT,
    "brand_quantity": SQL_BRAND_QUANTITY,
    "stratified_docs": SQL_STRATIFIED_DOCS,
    "crawl_admission": SQL_CRAWL_ADMISSION,
    "warc_tag_counts": SQL_WARC_TAG_COUNTS,
    "warc_word_counts": SQL_WARC_WORD_COUNTS,
    "warc_server_counts": SQL_WARC_SERVER_COUNTS,
    "warc_job_counters": SQL_WARC_JOB_COUNTERS,
    "media_src_index": SQL_MEDIA_SRC_INDEX,
    "media_extract": SQL_MEDIA_EXTRACT,
    "minhash_pairs": SQL_MINHASH_PAIRS,
    "incremental_dedup": SQL_INCREMENTAL_DEDUP,
    "jaccard_pairs": SQL_JACCARD_PAIRS,
    "minhash_neardup": SQL_MINHASH_NEARDUP,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "phash_neardup": SQL_PHASH_NEARDUP,
    "phash_groups": SQL_PHASH_GROUPS,
    "phash_groups_dist": SQL_PHASH_GROUPS,
    "langid": SQL_LANGID,
    "quality_scores": SQL_QUALITY_SCORES,
    "repetition_scores": SQL_REPETITION_SCORES,
    "decontaminate": SQL_DECONTAMINATE,
    "mix_sources": SQL_MIX_SOURCES,
    "fingerprint": SQL_FINGERPRINT,
    "ngram_scores": SQL_NGRAM_SCORES,
    "text_prep": SQL_TEXT_PREP,
    "lm_perplexity": SQL_LM_PERPLEXITY,
    "ivf_ann": SQL_IVF_ANN,
    "kmeans_refine": SQL_KMEANS_REFINE,
    "semdedup": SQL_SEMDEDUP,
    "pq_ann": SQL_PQ_ANN,
    "price_quantiles": SQL_PRICE_QUANTILES,
    "top_docs_per_lang": SQL_TOP_DOCS_PER_LANG,
    "lang_char_quantiles": SQL_LANG_CHAR_QUANTILES,
    "lsh_ann": SQL_LSH_ANN,
    "crawl_flagship": SQL_CRAWL_FLAGSHIP,
    "crawl_streaming": SQL_CRAWL_STREAMING,
    "discovery_crawl": SQL_DISCOVERY_CRAWL,
    "media_classify": SQL_MEDIA_CLASSIFY,
    "pii_scrub": SQL_PII_SCRUB,
    "line_filter": SQL_LINE_FILTER,
    "line_dedup": SQL_LINE_DEDUP,
    "clean_docs": SQL_CLEAN_DOCS,
    "dup_spans": SQL_DUP_SPANS,
    "pagerank": SQL_PAGERANK,
    "graph_bfs": SQL_GRAPH_BFS,
    "tfidf_terms": SQL_TFIDF_TERMS,
    "triangle_stats": SQL_TRIANGLE_STATS,
    "inverted_index": SQL_INVERTED_INDEX,
    "token_packing": SQL_TOKEN_PACKING,
    "quality_buckets": SQL_QUALITY_BUCKETS,
    "url_filter": SQL_URL_FILTER,
    "pii_scrub_sf": SQL_PII_SCRUB_SF,
    "image_hashes": SQL_IMAGE_HASHES,
    "image_validate": SQL_IMAGE_VALIDATE,
    "image_augment": SQL_IMAGE_AUGMENT,
    "phash_topk": SQL_PHASH_TOPK,
    "image_curation": SQL_IMAGE_CURATION,
    "dhash_neardup": SQL_DHASH_NEARDUP,
    "media_prep": SQL_MEDIA_PREP,
    "remove_dup_spans": SQL_REMOVE_DUP_SPANS,
    # forest_classify is added at call time (embeds the trained trees)
}


def oracles_impl() -> dict[str, str]:
    """The ORACLES registry; materializes the /tmp fixtures the
    fixture-backed SQL strings read (warc records, phash table) so the
    oracle side never depends on queries() having run first."""
    _ensure_warc_fixture()
    _ensure_phash_fixture()
    _ensure_ivf_fixture()
    _ensure_kmeans_fixture()
    _ensure_lsh_fixture()
    _ensure_frontier_fixture()
    _ensure_weights_fixture()
    _ensure_richtext_fixture()
    _ensure_imghash_fixture()
    _ensure_curation_fixture()
    _ensure_curation_fixture_mixed()
    _ensure_augment_fixture()
    _ensure_pq_fixture()
    _ensure_validate_fixture()
    d = dict(ORACLES)
    # trained-coefficient SQL is built at call time (reads the fixture)
    d["media_classify"] = _sql_media_classify()
    d["forest_classify"] = _sql_forest_classify()
    d["media_forest"] = _sql_media_forest()
    d["pca_embeddings"] = _sql_pca_embeddings()
    return d


def entry_impl() -> rd.Dataset:
    """Flagship crawl over sf0.001-derived frontier (driver smoke check)."""
    import tempfile

    sf_dir = "/root/testdata/sf0.001"
    n = _sf_scale(sf_dir)
    store = _store()
    seeds = synth.frontier_seeds_table(n, n_hosts=20)
    robots = synth.robots_table(20)
    out = tempfile.mkdtemp(prefix="crawl_entry_")
    run = crawl_pipeline.run_crawl(
        seeds, robots, store.fragment_paths(), out,
        num_shards=2, num_epochs=2, store_size=_STORE_N, concurrency=(1, 4),
    )
    return run.images_out.read_ray()
