"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship hybrid-retrieval query (the reference's
``search`` surface re-expressed: two ranked legs fused with RRF —
search.py:43-84) over /root/testdata/sf0.001.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 plus the training-data operator family; oracles are
DuckDB SQL over the same parquet views. The KG-pipeline queries
(kg_triples, kg_hybrid_search, kg_citation_rank) are scored against
plain-Python-oracle outputs materialized as parquet (kg_oracle.py) —
every contract row carries a real DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: RRF hybrid fusion over documents (vector-leg analog
    ranked by content stats; fulltext leg by token diversity), then
    hydrated with document metadata — the reference's hybrid search
    shape (W1-W5) on the sf0.001 tables."""
    from openalex_neo4j_spark.driver_contract import q_rrf_fusion
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    fused = q_rrf_fusion(spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (
        fused.join(docs.select("doc_id", "lang", "source", "n_chars"),
                   "doc_id", "left")
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(20)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from openalex_neo4j_spark.driver_contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from openalex_neo4j_spark.driver_contract import ORACLE_SQL
    from openalex_neo4j_spark.kg_oracle import kg_oracle_sql

    out = dict(ORACLE_SQL)
    # kg_* oracles: plain-Python-oracle outputs materialized as parquet
    # (deterministic; written on first call), read by DuckDB directly
    out.update(kg_oracle_sql())
    return out
