"""Physical-plan contract tests: pushdown, pruning, broadcast, and
Python-stage placement — the 100TB-readiness properties, pinned."""

import pytest
from pyspark.sql import functions as F

from openalex_neo4j_spark.driver_contract import (
    q_customers_with_orders,
    q_filter_orders,
    q_point_lookup,
    q_region_customer_counts,
    q_token_explode,
    q_top_orders,
)
from openalex_neo4j_spark.plans import (
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    pruned_scan_columns,
    python_eval_count,
)

SF = "/root/testdata/sf0.01"


def test_filter_reaches_parquet_scan(spark):
    df = q_filter_orders(spark, SF)
    assert has_pushed_filters(
        df, "IsNotNull(o_orderstatus)", "EqualTo(o_orderstatus,F)")


def test_point_lookup_pushdown(spark):
    assert has_pushed_filters(q_point_lookup(spark, SF),
                              "EqualTo(c_custkey,42)")


def test_projection_prunes_scan(spark):
    cols = pruned_scan_columns(q_filter_orders(spark, SF))
    # orders has 6 columns; the query needs 3 projected + 2 filter cols
    assert cols and all("o_orderpriority" not in c for c in cols)


def test_small_dims_broadcast(spark):
    assert has_broadcast_join(q_region_customer_counts(spark, SF))
    assert has_broadcast_join(q_customers_with_orders(spark, SF))


def test_no_python_in_relational_paths(spark):
    for q in (q_token_explode, q_filter_orders, q_top_orders,
              q_region_customer_counts):
        assert python_eval_count(q(spark, SF)) == 0


def test_topk_compiles_to_take_ordered(spark):
    s = explain_str(q_top_orders(spark, SF), "simple")
    assert "TakeOrderedAndProject" in s


def test_kg_scan_prunes_html_from_non_extract_paths(spark, tmp_path):
    """The binary column must only be read by the extraction stage."""
    from openalex_neo4j_spark.corpus import build_world, write_pages_parquet
    from openalex_neo4j_spark.extract import mentions_from_pages

    world = build_world(30, seed=7)
    path = str(tmp_path / "pages")
    write_pages_parquet(world, path, num_files=2)
    pages = spark.read.parquet(path)

    m = mentions_from_pages(pages)
    scans = pruned_scan_columns(m)
    assert scans and all(set(c) <= {"url", "html"} for c in scans)
    # exactly one intentional python stage (the mention parser)
    assert python_eval_count(m) == 1

    # a downstream consumer that doesn't need html must not scan it
    langs = pages.groupBy("lang").count()
    scans = pruned_scan_columns(langs)
    assert scans and all("html" not in c for c in scans)
