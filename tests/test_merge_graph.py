"""Cumulative (MERGE) imports: materialize.merge_graph — the
reference's re-import-without-clear semantics (Neo4j MERGE upserts:
nodes last-wins, relationship MERGE set-union; importer.py:87-93
re-run against a live store)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openalex_neo4j_spark.corpus import build_world, pages_dataframe
from openalex_neo4j_spark.materialize import merge_graph, write_graph
from openalex_neo4j_spark.pipeline import build_graph


@pytest.fixture(scope="module")
def split_worlds(spark):
    world = build_world(80, seed=7)
    pages = pages_dataframe(spark, world, num_partitions=8)
    # deterministic halves by url hash; both halves can cite works
    # from the other half (CITES endpoints resolve per import)
    h = F.abs(F.xxhash64("url")) % 2
    return pages.filter(h == 0), pages.filter(h == 1), pages


def test_merge_import_is_cumulative_and_refreshes_counts(
        spark, split_worlds, tmp_path_factory):
    p_a, p_b, _ = split_worlds
    root = str(tmp_path_factory.mktemp("kg_merge"))

    g_a = build_graph(p_a)
    counts_a = write_graph(g_a, root)
    g_b = build_graph(p_b)
    counts_m = merge_graph(g_b, root)

    # cumulative: merged Work ids are a superset of both halves' ids
    ids_a = {r["id"] for r in g_a.nodes["Work"].select("id").collect()}
    ids_b = {r["id"] for r in g_b.nodes["Work"].select("id").collect()}
    work = spark.read.parquet(f"{root}/nodes_work")
    ids_m = {r["id"] for r in work.select("id").collect()}
    assert ids_m == ids_a | ids_b
    assert counts_m["Work"] == len(ids_m)
    assert counts_m["Work"] >= counts_a["Work"]
    # unique-id constraint survives the merge (D1)
    assert work.count() == work.select("id").distinct().count()

    # edges: set-union on (subj, pred, obj), no duplicates
    edges = spark.read.parquet(f"{root}/edges").select("subj", "pred", "obj")
    e_a = {tuple(r) for r in
           g_a.edges.select("subj", "pred", "obj").collect()}
    e_b = {tuple(r) for r in
           g_b.edges.select("subj", "pred", "obj").collect()}
    e_m = [tuple(r) for r in edges.collect()]
    assert len(e_m) == len(set(e_m))
    # every import's edge survives EXCEPT CITES rows whose endpoint
    # existence was evaluated per import: a merged edge set keeps them
    # all; the union may also not cover cross-half CITES that neither
    # import could resolve alone (endpoint in the other half) — those
    # are absent from both sides, so equality on the union holds
    assert set(e_m) == e_a | e_b

    # derived counts refreshed over the MERGED edges: every
    # (work, cited_by_count) triple equals the merged CITES in-degree
    cites_in = {r["obj"]: r["n"] for r in
                edges.filter(F.col("pred") == "CITES")
                .groupBy("obj").agg(F.count("*").alias("n")).collect()}
    got = {r["id"]: r["cited_by_count"] for r in
           work.select("id", "cited_by_count").collect()}
    for wid, n in cites_in.items():
        assert got[wid] == n, f"stale cited_by_count for {wid}"
    # and works cited by NO one are 0, not stale
    assert all(n == 0 for wid, n in got.items() if wid not in cites_in)

    # triples were REBUILT from merged state: the cited_by_count
    # property triples agree with the refreshed node table
    triples = spark.read.parquet(f"{root}/triples")
    t_counts = {r["subj"]: int(r["obj"]) for r in
                triples.filter(F.col("pred") == "cited_by_count")
                .collect() if r["subj"] in got}  # authors emit it too
    assert t_counts == got


def test_merge_import_is_idempotent(spark, split_worlds,
                                    tmp_path_factory):
    p_a, p_b, _ = split_worlds
    root = str(tmp_path_factory.mktemp("kg_merge_idem"))
    write_graph(build_graph(p_a), root)
    g_b = build_graph(p_b)
    first = merge_graph(g_b, root)
    again = merge_graph(g_b, root)
    assert again == first  # re-importing the same batch changes nothing


def test_merge_last_wins_on_node_props(spark, split_worlds,
                                       tmp_path_factory):
    _, _, pages = split_worlds
    root = str(tmp_path_factory.mktemp("kg_merge_lastwins"))
    write_graph(build_graph(pages), root)
    before = spark.read.parquet(f"{root}/nodes_work")
    n_before = before.count()
    assert before.filter(F.col("abstract").isNotNull()).count() > 0
    # re-import the same corpus with abstracts dropped (P10): the
    # re-imported rows must overwrite stored props last-wins, like
    # MERGE ... SET n += item (neo4j_client.py:246-252)
    merge_graph(build_graph(pages, skip_abstracts=True), root)
    after = spark.read.parquet(f"{root}/nodes_work")
    assert after.filter(F.col("abstract").isNotNull()).count() == 0
    assert after.count() == n_before
