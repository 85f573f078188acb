from __future__ import annotations

import pytest

from openalex_neo4j_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def small_world():
    from openalex_neo4j_spark.corpus import build_world

    return build_world(n_works=120, seed=42)


@pytest.fixture(scope="session")
def small_graph(spark, small_world):
    from openalex_neo4j_spark.corpus import pages_dataframe
    from openalex_neo4j_spark.pipeline import build_graph

    pages = pages_dataframe(spark, small_world)
    return build_graph(pages)
