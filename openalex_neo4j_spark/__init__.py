"""PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of jexp/openalex-neo4j's capabilities
(fetch -> transform -> Cypher MERGE import; hybrid vector+fulltext
search) as idiomatic Spark DataFrame stages over a Common-Crawl-style
web-page table ``(url, warc_ts, html, text, lang)``.

Package map
-----------
- :mod:`openalex_neo4j_spark.textnorm` — pure shared scalar functions
  (HTML->text extraction, ID normalization, camel-case labels,
  abstract reconstruction). Single source of truth for the
  byte-identical-per-url invariant.
- :mod:`openalex_neo4j_spark.corpus` — deterministic synthetic
  web-page corpus generator (seeded; alias/duplicate and skew rows).
- :mod:`openalex_neo4j_spark.oracle` — plain-Python reference
  extractor producing the ground-truth triple set (the P/R oracle,
  playing the role of ``models.from_openalex`` + ``importer`` in the
  reference).
- :mod:`openalex_neo4j_spark.extract` — vectorized Arrow UDF stages
  (HTML->text, mention detection).
- :mod:`openalex_neo4j_spark.linking` — MinHash/LSH-blocked candidate
  generation, broadcast alias dictionary, TF-IDF cosine scoring.
- :mod:`openalex_neo4j_spark.operators` — reusable DataFrame
  operators (dedup family, edge derivation, connected components,
  salted aggregation, similarity search, text analysis, multimodal).
- :mod:`openalex_neo4j_spark.pipeline` — the end-to-end KG build.
- :mod:`openalex_neo4j_spark.materialize` — parquet/Iceberg-style
  warehouse writer with per-partition lineage + resume.
- :mod:`openalex_neo4j_spark.search` — vector top-k, TF-IDF fulltext,
  RRF fusion, result hydration (reference ``search.py`` parity).
"""

__version__ = "0.1.0"
