"""Driver-contract guard: a representative subset of queries() compared
against their oracle_sql() via DuckDB at sf0.001 (the full sweep is
tools/check_oracle.py at sf0.01)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
SUBSET = [
    "word_count", "doc_stats", "top_users", "first_doc_per_lang",
    "pricing_summary", "asia_customers", "event_windows",
    "exact_dedup_docs", "ann_topk", "crawl_schedule",
    # round-2 oracle families
    "crawl_admission", "simhash_pairs", "langid", "quality_scores",
    "warc_job_counters", "phash_neardup", "media_extract",
    # round-4 image-payload families
    "image_augment", "phash_topk",
    # round-5 RF×2 forest ensemble + CCNet LM bucketing + PCA + the
    # north-rule per-row decode invariant
    "media_forest", "lm_perplexity", "pca_embeddings", "image_validate",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, con, name):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e
    from tools.check_oracle import compare, to_pandas

    got = to_pandas(e.queries()[name](SF))
    want = con.sql(e.oracle_sql()[name]).df()
    errs = compare(name, got, want)
    assert not errs, errs


def test_every_oracle_has_a_query():
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    # the SQL-checked majority: the driver's correctness gate rests on it
    assert len(oracles) >= 35


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    ds = e.entry()
    assert ds.count() > 0
    names = [f.name for f in ds.schema().base_schema]
    assert {"image_id", "caption", "phash", "valid"} <= set(names)
