"""Scalar function library — the engine's UDF/expression surface.

Pure-Python scalar functions (shared with the oracle, guaranteeing the
byte-identical contract) live in :mod:`openalex_neo4j_spark.textnorm`
and :mod:`openalex_neo4j_spark.ids`; Column-expression builders live in
the modules that own their operators. This package re-exports the full
surface in one namespace:

>>> from openalex_neo4j_spark import functions as KF
>>> KF.camel_case_label("journal-article")
'JournalArticle'
"""

from openalex_neo4j_spark.ids import (  # noqa: F401
    author_id,
    funder_id,
    institution_id,
    publisher_id,
    source_id,
    topic_id,
    work_id,
)
from openalex_neo4j_spark.pipeline import camel_label_expr  # noqa: F401
from openalex_neo4j_spark.search import (  # noqa: F401
    cosine_expr,
    hash_embed_udf,
    make_embed_udf,
    query_embedding,
)
from openalex_neo4j_spark.textnorm import (  # noqa: F401
    camel_case_label,
    extract_id,
    extract_text,
    minhash_signature,
    normalize_title,
    reconstruct_abstract,
    shingles,
    simhash,
    strip_accents,
    tokenize,
)
