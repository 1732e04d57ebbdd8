"""cc_warc_examples_ray — a Ray-Data-native crawl/data-processing engine.

A from-scratch re-expression of the query and data-processing
capabilities of kandreadou/cc-warc-examples (a Hadoop MapReduce +
threaded-downloader web-scale image-collection pipeline) as idiomatic
Ray Data: ``ray.data.Dataset`` pipelines of zero-copy Arrow batches,
actor pools for stateful stages (URL-seen cuckoo-filter shards, per-host
politeness schedulers, classifier ensembles), and explicit
partitioning/salting for the wide shuffles.

Layout
------
- ``schemas``    fixed pyarrow schemas for every logical table
- ``hashing``    vectorized xxhash64 (public spec, numpy)
- ``imagecodec`` pure-python PNG/BMP/lossy codec, pHash, PSNR
- ``synth``      deterministic synthetic fixture generators (FIXTURES.md)
- ``lancelite``  Lance-style versioned parquet table (manifest + fragments)
- ``sources``    readers (warc-record tables, seeds, gzip jsonl)
- ``functions``  stateless vectorized kernels (urls, html, text, features)
- ``stages``     map_batches stages (decode, classify, dedup, neardup, ann)
- ``state``      stateful actors (cuckoo shards, politeness scheduler)
- ``pipelines``  end-to-end pipelines (crawl flagship, counts, media)

No module calls ``ray.init()``/``ray.shutdown()`` — sessions are owned
by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
