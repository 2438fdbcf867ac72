"""find_that_charity_spark — a PySpark-native full-text retrieval engine.

From-scratch re-implementation of the query/data-processing capabilities of
freerange/find-that-charity (which delegates indexing + BM25 ranking to
Elasticsearch/Lucene), re-hosted on PySpark per the contract in
``BASELINE.json`` (north_rule/north_star) and the blueprint in ``SURVEY.md``.

Layout
------
- ``functions/``  pure + vectorized scalar functions: analyzer (B1), BM25
  math (B2), posting-list codec (B6), text-analysis functions.
- ``sources/``    corpus reader abstraction (Iceberg in prod, Parquet in
  sandbox) and the deterministic FIXTURES synthesizer.
- ``operators/``  dataflow operators: index build (C1-C12), query pipeline
  (D1-D7), relational BM25 oracle path, dedup, similarity search,
  multimodal plumbing.
- ``plans/``      checkpoint/manifest + resume logic (C13-C14).
- ``streaming/``  optional incremental index refresh (E15).

NOTE on provenance: the reference checkout at /root/reference was empty at
survey time (SURVEY.md §0); all semantics here derive from BASELINE.json and
public specs (Okapi BM25, Lucene postings format, OpenRefine Recon API).
"""

__version__ = "0.1.0"
