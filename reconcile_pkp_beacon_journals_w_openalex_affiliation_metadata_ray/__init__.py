"""Ray-Data-native record-linkage engine.

A from-scratch reimplementation of the capabilities of
``cometadata/reconcile-pkp-beacon-journals-w-openalex-affiliation-metadata``
as a blocking + pairwise-scoring + transitive-clustering pipeline over
Parquet tables of web pages, built on ``ray.data.Dataset`` streaming
execution (``map_batches`` over zero-copy Arrow batches, actor pools for
stateful stages, groupby shuffles with explicit hot-key salting).

Layout:
- ``functions/``  pure, Ray-free scalar/vector kernels (normalization,
  similarity, URL/DOI keys, from-scratch HTML extraction, MinHash).
- ``sources/``    readers + deterministic fixture synthesis (the ``pages``
  input table per BASELINE.json input_hint).
- ``stages/``     the linkage pipeline stages: extract, block, score,
  cluster, stats.
- ``ops/``        generic reusable Ray Data operators: relational
  (joins/aggregates/top-k), dedup (exact/MinHash-LSH/SimHash/embedding),
  text analysis, similarity search, multimodal plumbing.
- ``pipelines/``  end-to-end flows wiring the stages together.
- ``state/``      per-partition lineage manifests + resume.

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by the caller (tests' conftest fixture, bench.py, or the driver).
"""

__version__ = "0.1.0"
