"""End-to-end triple-diff against the plain-Python oracle (P/R gate).

Analog of the reference's integration suite
(tests/integration/test_full_import.py): build the graph from the
synthetic corpus and score the emitted (subj, pred, obj) set.
North rule: P/R >= 0.95; on the clean fixture we require ~1.0.
"""

import pytest
from pyspark.sql import functions as F

from openalex_neo4j_spark.oracle import oracle_triples, precision_recall
from openalex_neo4j_spark.schemas import EDGE_TYPES


@pytest.fixture(scope="module")
def triple_sets(small_world, small_graph):
    pred = {
        (r.subj, r.pred, r.obj) for r in small_graph.triples.collect()
    }
    truth = oracle_triples(small_world)
    return pred, truth


def test_precision_recall(triple_sets):
    pred, truth = triple_sets
    p, r = precision_recall(pred, truth)
    assert p >= 0.95, f"precision {p:.4f} below north-rule threshold"
    assert r >= 0.95, f"recall {r:.4f} below north-rule threshold"


def test_all_edge_types_present(triple_sets):
    pred, _ = triple_sets
    preds = {p for _, p, _ in pred}
    for et in EDGE_TYPES:
        assert et in preds, f"missing edge type {et}"


def test_alias_pages_link_to_canonical(small_world, triple_sets):
    """Alias-only CITES refs appear under the canonical work id —
    proves linking is load-bearing for recall."""
    pred, _ = triple_sets
    from openalex_neo4j_spark import ids

    checked = 0
    for w in small_world.works.values():
        if not w.has_canonical or not w.alias_extra_refs:
            continue
        wid = ids.work_id(w.doi)
        for extra in w.alias_extra_refs.values():
            for ref in extra:
                ref_w = small_world.works[ref]
                if ref_w.has_canonical:
                    assert (wid, "CITES", ids.work_id(ref_w.doi)) in pred
                    checked += 1
    assert checked > 0, "fixture produced no alias-only refs"


def test_orphan_only_works_get_title_ids(small_world, triple_sets):
    """Works with no DOI page are canonicalized via CC to title: ids."""
    pred, truth = triple_sets
    orphan_ids = {t[0] for t in truth if t[0].startswith("title:")}
    assert orphan_ids, "fixture has no orphan-only works"
    pred_orphans = {t[0] for t in pred if t[0].startswith("title:")}
    assert orphan_ids <= pred_orphans


def test_node_id_uniqueness(small_graph):
    """Uniqueness is pipeline-guaranteed (reference enforces it via
    Neo4j constraints — neo4j_client.py:101-119; we assert it)."""
    for label, df in small_graph.nodes.items():
        total = df.count()
        distinct = df.select("id").distinct().count()
        assert total == distinct, f"{label} ids not unique"


def test_edges_reference_existing_nodes(small_graph):
    """Closed-world endpoint check (importer.py:242 etc.)."""
    all_ids = None
    for df in small_graph.nodes.values():
        ids_df = df.select("id")
        all_ids = ids_df if all_ids is None else all_ids.union(ids_df)
    dangling = (
        small_graph.edges.join(
            all_ids.withColumnRenamed("id", "subj"), "subj", "left_anti"
        ).count()
        + small_graph.edges.join(
            all_ids.withColumnRenamed("id", "obj"), "obj", "left_anti"
        ).count()
    )
    assert dangling == 0


def test_affiliation_cross_product_quirk(small_world, triple_sets):
    """Reference over-generates author x institution per work
    (importer.py:253-273, acknowledged quirk) — verify we reproduce it."""
    pred, _ = triple_sets
    from openalex_neo4j_spark import ids

    w = next(
        w for w in small_world.works.values()
        if len(w.author_ids) >= 2 and len(w.institution_ids) >= 2
    )
    for a in w.author_ids:
        aid = ids.author_id(small_world.authors[a].orcid)
        for i in w.institution_ids:
            iid = ids.institution_id(small_world.institutions[i].ror)
            assert (aid, "AFFILIATED_WITH", iid) in pred


def test_work_winner_is_deterministic_first_wins(small_world, small_graph):
    """Title property comes from the DOI-bearing page (deterministic
    first-wins analog of importer.py:100-104)."""
    from openalex_neo4j_spark import ids

    works = {r["id"]: r for r in small_graph.nodes["Work"].collect()}
    for w in small_world.works.values():
        if w.has_canonical:
            assert works[ids.work_id(w.doi)]["title"] == w.title


def test_triples_unique_under_id_collisions(spark):
    """build_triples emits NO global dedup (at web scale that was the
    widest shuffle in the pipeline) — legal only because every node
    table dedups on its COMPUTED id. Pin the invariant with raw values
    that collide post-normalization: topic spellings sharing a slug,
    orcids differing by padding, ror spellings sharing a tail."""
    from openalex_neo4j_spark.pipeline import build_graph_from_linked
    from openalex_neo4j_spark.schemas import MENTION_SCHEMA

    rows = [
        ("u1", "T One", "t one", "10.1/a", 2020, "journal-article", None,
         [{"display_name": "Ada", "orcid": "0000-0001"}],
         [{"display_name": "MIT", "ror": "https://ror.org/02abc", "country_code": "US"}],
         "Venue", "1234-5678", "Pub One",
         ["Deep  Learning", "deep learning"], ["NSF", "nsf"], []),
        ("u2", "T Two", "t two", "10.1/b", 2021, "journal-article", None,
         [{"display_name": "Ada Again", "orcid": " 0000-0001 "}],
         [{"display_name": "MIT2", "ror": "ror.org/02abc", "country_code": "US"}],
         "Venue", " 1234-5678 ", "pub  one",
         ["DEEP LEARNING"], [], ["10.1/a"]),
    ]
    mentions = spark.createDataFrame(rows, MENTION_SCHEMA)
    linked = mentions.withColumn(
        "work_key", F.concat(F.lit("doi:"), F.lower(F.trim("doi"))))
    g = build_graph_from_linked(linked)

    triples = [(r.subj, r.pred, r.obj) for r in g.triples.collect()]
    assert len(triples) == len(set(triples)), "duplicate triples emitted"
    for label, df in g.nodes.items():
        assert df.count() == df.select("id").distinct().count(), label
    # the colliding spellings collapsed to single nodes
    topics = {r.id for r in g.nodes["Topic"].collect()}
    assert topics == {"topic:deep-learning"}
    assert g.nodes["Author"].count() == 1
    assert g.nodes["Institution"].count() == 1
    assert g.nodes["Publisher"].count() == 1
