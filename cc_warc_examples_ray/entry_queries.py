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
import pyarrow.parquet as pq
import ray
import ray.data as rd

from . import lancelite, synth
from .ops import ann, dedup, relational, text
from .pipelines import classics, crawl as crawl_pipeline

_WS_RE = re.compile(r"\s+", re.ASCII)  # matches RE2's \s class in DuckDB


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _pq(sf_dir: str, table: str, columns=None) -> pa.Table:
    """Driver-side read for small dimension tables only."""
    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


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


def q_event_windows(sf_dir: str) -> pd.DataFrame:
    """§2.8 streaming analog: tumbling 1-hour windows per event_type."""
    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["window_start"] = df["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
        df["c"] = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        g = df.groupby(["event_type", "window_start"], sort=False)["c"].agg(["sum", "count"]).reset_index()
        return g.rename(columns={"sum": "_ps", "count": "_pn"})

    from ray.data.aggregate import Sum

    out = (
        ev.map_batches(assign, batch_format="pandas")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("_ps", alias_name="value_sum_c"), Sum("_pn", alias_name="n_events"))
    ).to_pandas()
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


SQL_EVENT_WINDOWS = """
SELECT event_type,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS value_sum_c,
       count(*) AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
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


SQL_DOC_TOKEN_COUNTS = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_ws_tokens
FROM documents ORDER BY doc_id
"""


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Similarity search: exact cosine top-5 for query vectors vec_id<3."""
    emb_small = _pq(sf_dir, "embeddings").filter(
        pa.compute.less(_pq(sf_dir, "embeddings").column("vec_id"), 3)
    )
    queries = {
        int(i): v
        for i, v in zip(emb_small.column("vec_id").to_pylist(), emb_small.column("embedding").to_pylist())
    }
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ann.brute_force_topk(ds, queries, k=5)
    out["cosine_r"] = out["cosine"].round(5)
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
SELECT query_id, vec_id, round(cos, 5) AS cosine_r, rank
FROM r WHERE rank <= 5 ORDER BY query_id, rank
"""


def q_embedding_pairs(sf_dir: str) -> pd.DataFrame:
    """Embedding near-dup pairs: exact cosine >= 0.4 (brute-force verify path)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = dedup.brute_force_pairs(ds, threshold=0.4)
    out["cosine_r"] = out["cosine"].round(5)
    return out[["id_a", "id_b", "cosine_r"]].sort_values(["id_a", "id_b"]).reset_index(drop=True)


SQL_EMBEDDING_PAIRS = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 5) AS cosine_r
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
    docs = _read(sf_dir, "documents", columns=["doc_id"])
    delays = (0, 150, 500, 1000)

    def schedule(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("seed_rank", kind="mergesort").reset_index(drop=True)
        g["host_index"] = np.arange(len(g), dtype=np.int64)
        g["fetch_time_ms"] = g["host_index"] * int(delays[int(g["hostnum"].iloc[0]) % 4])
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

    out = (
        docs.map_batches(mk, batch_format="pyarrow")
        .groupby("host")
        .map_groups(schedule, batch_format="pandas")
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

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["c"] = np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        g = df.groupby("c_mktsegment", sort=False)["c"].agg(["sum", "count"]).reset_index()
        return g.rename(columns={"sum": "_ps", "count": "_pn"})

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pandas")
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


def _sf_scale(sf_dir: str) -> int:
    return pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows


_PAGES_CACHE = "/tmp/ccwarc_pages_cache.parquet"


def q_discovery_crawl(sf_dir: str) -> pa.Table:
    """Two-level discovery crawl (pages → extracted media → image fetch):
    rows-only check; oracle equivalence is a pytest golden."""
    import tempfile

    from .pipelines.discovery import run_discovery_crawl

    n = _sf_scale(sf_dir)
    warc = synth.warc_records_table(n)
    pages = warc.select(["record_url", "mime", "payload"])
    pq.write_table(pages, _PAGES_CACHE)
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
        seeds, synth.robots_table(20), [_PAGES_CACHE], store.fragment_paths(), out,
        num_shards=4, store_size=_STORE_N,
    )
    return run.order_table()


def q_crawl_flagship(sf_dir: str) -> pa.Table:
    """The flagship crawl at sf-proportional frontier size (rows-only
    check; exact semantics vs oracle are pytest goldens)."""
    import tempfile

    n = _sf_scale(sf_dir)
    store = _store()
    seeds = synth.frontier_seeds_table(n, n_hosts=20)
    robots = synth.robots_table(20)
    out = tempfile.mkdtemp(prefix="crawlq_")
    run = crawl_pipeline.run_crawl(
        seeds, robots, store.fragment_paths(), out,
        num_shards=4, num_epochs=2, store_size=_STORE_N, concurrency=(1, 4),
    )
    return run.order_table()


def _warc(sf_dir: str) -> rd.Dataset:
    n = 2 * _sf_scale(sf_dir)
    return rd.from_arrow(synth.warc_records_table(n))


def q_warc_tag_counts(sf_dir: str) -> pd.DataFrame:
    return classics.tag_counts(_warc(sf_dir)).to_pandas().sort_values("tag").reset_index(drop=True)


def q_warc_word_counts(sf_dir: str) -> pd.DataFrame:
    return classics.word_counts(_warc(sf_dir)).to_pandas().sort_values("word").reset_index(drop=True)


def q_warc_server_counts(sf_dir: str) -> pd.DataFrame:
    return classics.server_counts(_warc(sf_dir)).to_pandas().sort_values("server").reset_index(drop=True)


def q_warc_job_counters(sf_dir: str) -> pd.DataFrame:
    return classics.job_counters(_warc(sf_dir)).to_pandas().sort_values("counter").reset_index(drop=True)


def q_media_extract(sf_dir: str) -> pd.DataFrame:
    out = classics.media_extract(_warc(sf_dir)).to_pandas()
    return out.sort_values("src").reset_index(drop=True)


def q_minhash_neardup(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dedup.minhash_dedup(docs, threshold=0.8).reset_index(drop=True)


def q_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = dedup.simhash_pairs(docs, max_hamming=3).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_phash_neardup(sf_dir: str) -> pd.DataFrame:
    store = _store()
    ds = store.read_ray(columns=["image_id", "phash"])
    out = dedup.phash_neardup_groups(ds, max_hamming=2).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_langid(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = docs.map_batches(text.LangIdentifier, batch_format="pyarrow",
                           concurrency=(1, 4)).to_pandas()
    out["lang_conf"] = out["lang_conf"].round(5)
    return out[["doc_id", "lang", "lang_pred", "lang_conf"]].sort_values("doc_id").reset_index(drop=True)


def q_quality_scores(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(lambda t: text.quality_scores(t), batch_format="pyarrow").to_pandas()
    for c in ("mean_word_len", "punct_ratio", "digit_ratio", "stopword_ratio", "upper_ratio", "quality"):
        out[c] = out[c].round(5)
    return out.drop(columns=["text"]).sort_values("doc_id").reset_index(drop=True)


def q_fingerprint(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = docs.map_batches(lambda t: text.fingerprint(t), batch_format="pyarrow").to_pandas()
    return out[["doc_id", "text_hash", "min_fingerprint"]].sort_values("doc_id").reset_index(drop=True)


def q_ngram_scores(sf_dir: str) -> pd.DataFrame:
    docs = _read(sf_dir, "documents", columns=["text", "lang"])
    out = text.ngram_class_scores(docs, "text", "lang", pos_label="en", min_count=5).to_pandas()
    return out.sort_values(["score", "ngram"], ascending=[False, True]).head(500).reset_index(drop=True)


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
    withng = feats.map_batches(
        features.NgramPresence, fn_constructor_args=(vref,),
        batch_format="pyarrow", concurrency=(1, 4),
    )
    out = withng.map_batches(
        features.EnsembleClassifier, batch_format="pyarrow", concurrency=(1, 4)
    ).to_pandas()
    out["p_feat"] = out["p_feat"].round(5)
    out["p_ngram"] = out["p_ngram"].round(5)
    return out[["src", "ngram_hits", "p_feat", "p_ngram", "is_big"]].sort_values(
        "src"
    ).reset_index(drop=True)


def q_ivf_ann(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent = ann.train_centroids(ds, n_centroids=16, sample=2000)
    assigned = ann.ivf_assign(ds, cent)
    emb_small = _pq(sf_dir, "embeddings").filter(
        pa.compute.less(_pq(sf_dir, "embeddings").column("vec_id"), 3)
    )
    queries = {
        int(i): v
        for i, v in zip(emb_small.column("vec_id").to_pylist(), emb_small.column("embedding").to_pylist())
    }
    out = ann.ivf_topk(assigned, cent, queries, k=5, nprobe=4)
    out["cosine_r"] = out["cosine"].round(5)
    return out[["query_id", "vec_id", "cosine_r", "rank"]].sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "word_count": q_word_count,
    "doc_stats": q_doc_stats,
    "top_users": q_top_users,
    "first_doc_per_lang": q_first_doc_per_lang,
    "source_threshold": q_source_threshold,
    "pricing_summary": q_pricing_summary,
    "asia_customers": q_asia_customers,
    "parts_never_hiqty": q_parts_never_hiqty,
    "event_windows": q_event_windows,
    "session_windows": q_session_windows,
    "union_nationkeys": q_union_nationkeys,
    "exact_dedup_docs": q_exact_dedup_docs,
    "doc_token_counts": q_doc_token_counts,
    "ann_topk": q_ann_topk,
    "embedding_pairs": q_embedding_pairs,
    "crawl_schedule": q_crawl_schedule,
    "orders_by_segment": q_orders_by_segment,
    "brand_quantity": q_brand_quantity,
    "stratified_docs": q_stratified_docs,
    # rows-only
    "crawl_flagship": q_crawl_flagship,
    "discovery_crawl": q_discovery_crawl,
    "warc_tag_counts": q_warc_tag_counts,
    "warc_word_counts": q_warc_word_counts,
    "warc_server_counts": q_warc_server_counts,
    "warc_job_counters": q_warc_job_counters,
    "media_extract": q_media_extract,
    "minhash_neardup": q_minhash_neardup,
    "simhash_pairs": q_simhash_pairs,
    "phash_neardup": q_phash_neardup,
    "langid": q_langid,
    "quality_scores": q_quality_scores,
    "fingerprint": q_fingerprint,
    "ngram_scores": q_ngram_scores,
    "ivf_ann": q_ivf_ann,
    "media_classify": q_media_classify,
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
}


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
