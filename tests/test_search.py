"""Search-surface tests — ports the reference's RRF properties
(tests/test_search.py:12-70) plus vector/fulltext leg checks."""

import pytest
from pyspark.sql import functions as F

from openalex_neo4j_spark.search import (
    EMBED_DIM,
    _hash_embed_one,
    build_fulltext_index,
    fulltext_topk,
    hybrid_search,
    rrf_fuse,
    vector_topk,
)


def _leg(spark, scores: dict[str, float]):
    return spark.createDataFrame(
        [(k, float(v)) for k, v in scores.items()], ["id", "score"]
    )


class TestRRF:
    # fixtures ported from reference tests/test_search.py:12-70
    def test_union_of_keyspaces(self, spark):
        v = _leg(spark, {"A": 0.9, "B": 0.8, "C": 0.7})
        f = _leg(spark, {"B": 5.0, "C": 4.0, "D": 3.0})
        fused = rrf_fuse(v, f).collect()
        assert {r["id"] for r in fused} == {"A", "B", "C", "D"}
        top2 = [r["id"] for r in fused[:2]]
        assert set(top2) == {"B", "C"}

    def test_weight_extremes_vector_only(self, spark):
        v = _leg(spark, {"A": 0.9, "B": 0.8})
        f = _leg(spark, {"B": 5.0, "C": 4.0})
        fused = rrf_fuse(v, f, vector_weight=1.0, fulltext_weight=0.0).collect()
        assert fused[0]["id"] == "A"
        ids = {r["id"]: r["score"] for r in fused}
        assert ids["C"] == 0.0

    def test_weight_extremes_fulltext_only(self, spark):
        v = _leg(spark, {"A": 0.9, "B": 0.8})
        f = _leg(spark, {"B": 5.0, "C": 4.0})
        fused = rrf_fuse(v, f, vector_weight=0.0, fulltext_weight=1.0).collect()
        assert fused[0]["id"] == "B"

    def test_empty_inputs(self, spark):
        empty = spark.createDataFrame([], "id string, score double")
        assert rrf_fuse(empty, empty).count() == 0

    def test_rrf_formula(self, spark):
        # score(d) = 1/(60+rank_v) + 1/(60+rank_f) — search.py:193-198
        v = _leg(spark, {"A": 1.0})
        f = _leg(spark, {"A": 1.0})
        got = rrf_fuse(v, f).collect()[0]["score"]
        assert abs(got - 2.0 / 61.0) < 1e-12


class TestEmbedding:
    def test_dim_contract(self):
        # 384-dim contract: reference neo4j_client.py:199-203
        assert len(_hash_embed_one("hello world")) == EMBED_DIM

    def test_unit_norm_and_deterministic(self):
        a = _hash_embed_one("graph neural network")
        b = _hash_embed_one("graph neural network")
        assert a == b
        assert abs(sum(x * x for x in a) - 1.0) < 1e-6

    def test_empty_text(self):
        assert sum(abs(x) for x in _hash_embed_one(None)) == 0.0


class TestVectorLeg:
    def test_exact_topk_selfmatch(self, spark):
        rows = [
            ("a", [1.0, 0.0, 0.0]),
            ("b", [0.9, 0.1, 0.0]),
            ("c", [0.0, 1.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, ["id", "embedding"])
        got = vector_topk(df, [1.0, 0.0, 0.0], 2).collect()
        assert [r["id"] for r in got] == ["a", "b"]
        assert abs(got[0]["score"] - 1.0) < 1e-9


class TestFulltextLeg:
    def test_tfidf_ranking(self, spark):
        docs = spark.createDataFrame(
            [
                ("d1", "spark shuffle join spark spark"),
                ("d2", "spark filter"),
                ("d3", "pandas numpy"),
            ],
            ["id", "text"],
        )
        idx = build_fulltext_index(docs)
        got = fulltext_topk(idx, "spark", 10).collect()
        assert [r["id"] for r in got][:2] == ["d1", "d2"]
        assert {r["id"] for r in got} == {"d1", "d2"}

    def test_empty_query(self, spark):
        docs = spark.createDataFrame([("d1", "x")], ["id", "text"])
        idx = build_fulltext_index(docs)
        assert fulltext_topk(idx, "", 5).count() == 0


class TestMaterializedEmbeddings:
    def test_import_time_embeddings_and_reuse(self, spark, small_world):
        """M4 parity (importer.py:79-81): embeddings generated at
        import time live on the Work node table (384-dim contract) and
        hybrid_search reuses them instead of re-encoding."""
        from openalex_neo4j_spark.corpus import pages_dataframe
        from openalex_neo4j_spark.pipeline import build_graph

        g = build_graph(pages_dataframe(spark, small_world),
                        generate_embeddings=True)
        row = g.nodes["Work"].select("embedding").first()
        assert row["embedding"] is not None and len(row["embedding"]) == EMBED_DIM
        w = next(w for w in small_world.works.values() if w.has_canonical)
        res = hybrid_search(w.title + " " + w.abstract[:100],
                            g.nodes, g.edges, limit=3,
                            allow_adhoc_index=True)
        assert res.count() > 0


class TestHybridSearch:
    def test_end_to_end(self, spark, small_world, small_graph):
        # query = title + abstract prefix of a known work: must surface
        # it among the fused top-5 (titles are word-salad from a small
        # vocabulary, so exact top-1 is not guaranteed by design)
        w = next(w for w in small_world.works.values() if w.has_canonical)
        res = hybrid_search(w.title + " " + w.abstract[:120],
                            small_graph.nodes, small_graph.edges, limit=5,
                            allow_adhoc_index=True)
        rows = res.collect()
        assert 0 < len(rows) <= 5
        from openalex_neo4j_spark import ids
        ids_returned = [r["id"] for r in rows]
        assert ids.work_id(w.doi) in ids_returned
        hit = rows[ids_returned.index(ids.work_id(w.doi))]
        assert hit["title"] == w.title
        # hydration brings author names
        assert hit["authors"], "hydration returned no authors"
        # re-sorted by fused score (W5)
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


class TestModelSwitch:
    """M1 parity (reference embeddings.py:12-33): the embedding UDF is
    config-switchable between the deterministic hash featurizer
    (model_name=None) and a real sentence-transformers model loaded
    once per Python worker."""

    def test_default_is_hash_featurizer(self):
        from openalex_neo4j_spark.search import hash_embed_udf, make_embed_udf
        assert make_embed_udf(None) is hash_embed_udf

    def test_model_path_builds_distinct_udf(self):
        # constructing the UDF must not import/load the model (lazy,
        # per-worker — reference embeddings.py:9,21-27)
        from openalex_neo4j_spark.search import hash_embed_udf, make_embed_udf
        udf = make_embed_udf("all-MiniLM-L6-v2")
        assert udf is not hash_embed_udf

    def test_real_model_encode(self, spark):
        # skipped in this container (no sentence-transformers); the
        # code path is exercised wherever the package exists
        pytest.importorskip("sentence_transformers")
        from openalex_neo4j_spark.search import embed_text_column
        df = spark.createDataFrame(
            [("a", "graph neural networks"), ("b", "   "), ("c", None)],
            ["id", "text"])
        out = {r["id"]: r["emb"] for r in embed_text_column(
            df, "text", "emb", model_name="all-MiniLM-L6-v2").collect()}
        assert len(out["a"]) == EMBED_DIM      # 384-dim contract both ways
        assert out["b"] is None and out["c"] is None  # empty -> null


class TestLuceneLite:
    """M6 depth: +term / -term / "phrase" operators over the inverted
    index (Neo4j fulltext accepts Lucene syntax; the reference CLI only
    sends plain text — cli.py:309-315 — which stays the default path)."""

    def _index(self, spark):
        docs = spark.createDataFrame(
            [("d1", "graph neural networks for citation analysis"),
             ("d2", "neural machine translation"),
             ("d3", "graph databases and query planning"),
             ("d4", "citation graph mining with neural models")],
            ["id", "text"])
        return build_fulltext_index(docs)

    def test_parse(self):
        from openalex_neo4j_spark.search import parse_lucene_lite
        q = parse_lucene_lite('+graph -translation "citation analysis" neural')
        assert q["must"] == ["graph"]
        assert q["must_not"] == ["translation"]
        assert q["phrases"] == [["citation", "analysis"]]
        assert q["should"] == ["neural"]

    def test_required_term(self, spark):
        from openalex_neo4j_spark.search import fulltext_topk
        ids = {r["id"] for r in
               fulltext_topk(self._index(spark), "+graph neural", 10,
                             lucene=True).collect()}
        assert ids == {"d1", "d3", "d4"}  # d2 has 'neural' but no 'graph'

    def test_excluded_term(self, spark):
        from openalex_neo4j_spark.search import fulltext_topk
        ids = {r["id"] for r in
               fulltext_topk(self._index(spark), "neural -translation", 10,
                             lucene=True).collect()}
        assert ids == {"d1", "d4"}

    def test_phrase_words_required(self, spark):
        from openalex_neo4j_spark.search import fulltext_topk
        ids = {r["id"] for r in
               fulltext_topk(self._index(spark), '"citation graph"', 10,
                             lucene=True).collect()}
        assert ids == {"d1", "d4"}  # both words must match

    def test_default_path_unchanged(self, spark):
        # plain-text path ignores operators-as-text (reference parity)
        from openalex_neo4j_spark.search import fulltext_topk
        idx = self._index(spark)
        a = fulltext_topk(idx, "graph neural", 10).collect()
        assert {r["id"] for r in a} == {"d1", "d2", "d3", "d4"}


def test_hybrid_search_requires_index(spark, small_world, small_graph):
    """Omitting the persisted index without the explicit opt-in must
    raise (round-2 verdict item 7: the silent ad-hoc rebuild was a
    per-query full-corpus-scan footgun)."""
    import pytest as _pytest

    w = next(w for w in small_world.works.values() if w.has_canonical)
    with _pytest.raises(ValueError, match="persisted fulltext index"):
        from openalex_neo4j_spark.search import hybrid_search as hs
        hs(w.title, small_graph.nodes, small_graph.edges, limit=3)


class TestLuceneLiteExtended:
    """Round-3 extensions: boosts (term^2.5), field prefixes
    (title:term), fuzzy (term~ / term~1)."""

    def test_parse_boost_field_fuzzy(self):
        from openalex_neo4j_spark.search import parse_lucene_lite
        q = parse_lucene_lite('title:graph^2.5 neural~1 abstract:mining '
                              '+linking^3 fuzzed~ -noise')
        assert q["should"] == ["graph", "mining"]
        assert q["must"] == ["linking"]
        assert q["must_not"] == ["noise"]
        assert q["boosts"] == {"graph": 2.5, "linking": 3.0}
        assert q["fuzzy"] == [("fuzzed", 2), ("neural", 1)]

    def test_parse_fuzzy_on_must_not_stays_exact(self):
        from openalex_neo4j_spark.search import parse_lucene_lite
        q = parse_lucene_lite("-bad~2 +req~1")
        # MUST/MUST_NOT keep exact semantics in the lite scope
        assert q["must_not"] == ["bad"]
        assert q["must"] == ["req"]
        assert q["fuzzy"] == []

    def _index(self, spark):
        from openalex_neo4j_spark.search import build_fulltext_index
        docs = spark.createDataFrame(
            [("d1", "graph neural citation analysis"),
             ("d2", "neural machine translation"),
             ("d3", "graph databases and query planning"),
             ("d4", "citation graph mining with neural models")],
            ["id", "text"])
        return build_fulltext_index(docs)

    def test_boost_reorders(self, spark):
        from openalex_neo4j_spark.search import fulltext_topk
        idx = self._index(spark)
        plain = fulltext_topk(idx, "translation graph", 10,
                              lucene=True).collect()
        boosted = fulltext_topk(idx, "translation^10 graph", 10,
                                lucene=True).collect()
        assert boosted[0]["id"] == "d2"          # translation doc wins
        assert {r["id"] for r in boosted} == {r["id"] for r in plain}

    def test_fuzzy_matches_vocab_within_distance(self, spark):
        from openalex_neo4j_spark.search import fulltext_topk
        idx = self._index(spark)
        # 'grap~1' reaches 'graph' (distance 1), not 'planning'
        ids = {r["id"] for r in
               fulltext_topk(idx, "grap~1", 10, lucene=True).collect()}
        assert ids == {"d1", "d3", "d4"}
        # distance 0 fuzzy matches nothing (no exact 'grap' token)
        assert fulltext_topk(idx, "grap~0", 10, lucene=True).count() == 0

    def test_field_prefix_stripped(self, spark):
        from openalex_neo4j_spark.search import fulltext_topk
        idx = self._index(spark)
        a = {r["id"] for r in
             fulltext_topk(idx, "title:graph", 10, lucene=True).collect()}
        b = {r["id"] for r in
             fulltext_topk(idx, "graph", 10, lucene=True).collect()}
        assert a == b == {"d1", "d3", "d4"}


class TestLuceneRangesAndGroups:
    """Round-4 extensions: term ranges ([a TO b] / {a TO b}, * open)
    and grouping (+(a b) at-least-one, -(a b) exclude-any, (a b)^n
    per-member boost) — the last parse_lucene_lite gaps."""

    def test_parse_ranges(self):
        from openalex_neo4j_spark.search import parse_lucene_lite
        q = parse_lucene_lite('[aa TO bb]^2 title:{c TO d} [e TO *]')
        assert q["ranges"] == [("aa", "bb", True, True, 2.0),
                               ("c", "d", False, False, 1.0),
                               ("e", None, True, True, 1.0)]
        assert q["should"] == []

    def test_parse_groups(self):
        from openalex_neo4j_spark.search import parse_lucene_lite
        q = parse_lucene_lite('+(alpha beta) -(gamma delta) (eps zeta)^4')
        assert q["must_any"] == [["alpha", "beta"]]
        assert sorted(q["must_not"]) == ["delta", "gamma"]
        assert set(q["should"]) >= {"alpha", "beta", "eps", "zeta"}
        assert q["boosts"] == {"eps": 4.0, "zeta": 4.0}

    def test_group_members_strip_field_and_sign_prefixes(self):
        # '+(title:graph)' must bucket the vocabulary token 'graph',
        # not the literal 'title:graph' (which can never match and
        # would silently zero out the whole query); same for a +/-
        # prefix inside the group body
        from openalex_neo4j_spark.search import parse_lucene_lite
        q = parse_lucene_lite("+(title:graph +neural)")
        assert q["must_any"] == [["graph", "neural"]]
        q = parse_lucene_lite("-(title:x abstract:y)")
        assert sorted(q["must_not"]) == ["x", "y"]

    def test_boost_merge_is_order_independent(self):
        from openalex_neo4j_spark.search import parse_lucene_lite
        a = parse_lucene_lite("(a)^5 a^2")
        b = parse_lucene_lite("a^2 (a)^5")
        assert a["boosts"] == b["boosts"] == {"a": 5.0}

    def _index(self, spark):
        from openalex_neo4j_spark.search import build_fulltext_index
        docs = spark.createDataFrame(
            [("d1", "graph neural citation analysis"),
             ("d2", "neural machine translation"),
             ("d3", "graph databases and query planning"),
             ("d4", "citation graph mining with neural models")],
            ["id", "text"])
        return build_fulltext_index(docs)

    def test_range_matches_vocab_between_bounds(self, spark):
        from openalex_neo4j_spark.search import fulltext_topk
        idx = self._index(spark)
        # [ci TO da] covers 'citation' but not 'databases' ('da' < it)
        ids = {r["id"] for r in
               fulltext_topk(idx, "[ci TO da]", 10, lucene=True).collect()}
        assert ids == {"d1", "d4"}
        # exclusive upper bound drops the boundary token itself
        ids = {r["id"] for r in
               fulltext_topk(idx, "[citation TO graph}", 10,
                             lucene=True).collect()}
        assert ids == {"d1", "d3", "d4"}
        # open upper bound reaches the end of the vocabulary
        # ('translation' in d2, 'with' in d4)
        ids = {r["id"] for r in
               fulltext_topk(idx, "[translation TO *]", 10,
                             lucene=True).collect()}
        assert ids == {"d2", "d4"}

    def test_group_requires_one_member(self, spark):
        from openalex_neo4j_spark.search import fulltext_topk
        idx = self._index(spark)
        # +(translation mining): d2 (translation), d4 (mining) only —
        # graph alone (d1, d3) scores but fails the group predicate
        ids = {r["id"] for r in
               fulltext_topk(idx, "+(translation mining) graph", 10,
                             lucene=True).collect()}
        assert ids == {"d2", "d4"}
        # two groups: both must hit
        ids = {r["id"] for r in
               fulltext_topk(idx, "+(graph neural) +(mining planning)", 10,
                             lucene=True).collect()}
        assert ids == {"d3", "d4"}

    def test_group_with_field_prefix_still_matches(self, spark):
        # regression: '+(title:graph)' used to keep the field prefix
        # on the member token and silently return zero hits
        from openalex_neo4j_spark.search import fulltext_topk
        idx = self._index(spark)
        ids = {r["id"] for r in
               fulltext_topk(idx, "+(title:graph) neural", 10,
                             lucene=True).collect()}
        assert ids == {"d1", "d3", "d4"}
        ids = {r["id"] for r in
               fulltext_topk(idx, "neural -(title:translation)", 10,
                             lucene=True).collect()}
        assert ids == {"d1", "d4"}

    def test_excluded_group(self, spark):
        from openalex_neo4j_spark.search import fulltext_topk
        idx = self._index(spark)
        ids = {r["id"] for r in
               fulltext_topk(idx, "neural -(translation mining)", 10,
                             lucene=True).collect()}
        assert ids == {"d1"}

    def test_range_boost_applies(self, spark):
        from openalex_neo4j_spark.search import fulltext_topk
        idx = self._index(spark)
        plain = {r["id"]: r["score"] for r in
                 fulltext_topk(idx, "[translation TO translation]", 10,
                               lucene=True).collect()}
        boosted = {r["id"]: r["score"] for r in
                   fulltext_topk(idx, "[translation TO translation]^5", 10,
                                 lucene=True).collect()}
        assert set(plain) == set(boosted) == {"d2"}
        assert abs(boosted["d2"] - 5 * plain["d2"]) < 1e-9

    def test_parse_multiple_ranges_with_open_bounds(self):
        """Two ranges where one has an open (None) bound must not
        crash the deterministic sort of the parse output (a plain
        tuple sort compares None against str and raises TypeError)."""
        from openalex_neo4j_spark.search import parse_lucene_lite
        q = parse_lucene_lite('[* TO m] [n TO z] [a TO *]')
        assert (None, "m", True, True, 1.0) in q["ranges"]
        assert ("a", None, True, True, 1.0) in q["ranges"]
        assert len(q["ranges"]) == 3
