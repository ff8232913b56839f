"""PySpark-native crawl-frontier + web-archive analytics engine.

A brand-new engine (not a port) with the query/data-processing
capabilities of the reference ``arquivo/image-search-indexing``
(Java/Hadoop MapReduce image indexer), re-expressed Spark-first:

- ``functions/``  — scalar kernels (URL canonicalization/SURT, hashing,
  tokenization, timestamps, text quality/lang-id) as built-in
  ``pyspark.sql.functions`` compositions or vectorized pandas UDFs.
- ``operators/``  — relational operators (champion tie-break aggs,
  as-of joins, dedup families, similarity search, top-k per group).
- ``sources/``    — table readers/writers incl. the Iceberg-style
  checkpoint catalog (partitioned parquet + JSON manifests).
- ``frontier/``   — the URL-frontier engine: span extraction, seen-set
  (partitioned Bloom + cuckoo overlay), politeness scheduler,
  round driver with resumable checkpoints.
- ``plans/``      — end-to-end query pipelines (the reference's two
  MapReduce jobs re-expressed as DataFrame plans).
- ``streaming/``  — Structured Streaming variants of the ingest path.

Reference citations in docstrings use ``file:line`` within
``/root/reference/`` (read-only snapshot).
"""

__version__ = "0.1.0"
