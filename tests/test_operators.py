"""Operator-suite tests: dedup family, similarity, text analysis,
skew handling, multimodal plumbing."""

import math

import pytest
from pyspark.sql import functions as F

from openalex_neo4j_spark.operators.dedup import (
    exact_dedup,
    first_wins_dedup,
    minhash_candidates,
    minhash_bands,
    minhash_dedup,
    minhash_signatures,
    shingle_jaccard,
    simhash_signatures,
)
from openalex_neo4j_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_topk,
    lsh_ann,
    pairwise_cosine,
)
from openalex_neo4j_spark.operators.skew import (  # noqa: E402
    salted_count,
    salted_join,
)
from openalex_neo4j_spark.operators.text import (  # noqa: E402
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),          # near dup of 0
        (3, "der hund ist nicht ein fisch und das ist gut"),
        (4, "completely different tokens entirely unrelated words"),
        (5, "le chat est un animal et la maison est grande"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestExactDedup:
    def test_groups(self, docs):
        got = {r["doc_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
        assert got[0] == 2          # 0 and 1 collapse, min id kept
        assert 1 not in got
        assert got[2] == 1


class TestFirstWins:
    def test_deterministic_winner(self, spark):
        df = spark.createDataFrame(
            [("k", "b", 2), ("k", "a", 1), ("j", "z", 9)],
            ["key", "val", "ord"],
        )
        got = {r["key"]: r["val"]
               for r in first_wins_dedup(df, ["key"], ["ord"]).collect()}
        assert got == {"k": "a", "j": "z"}


class TestMinHash:
    def test_identical_docs_share_signature(self, docs):
        sigs = minhash_signatures(docs).filter(F.col("id").isin(0, 1))
        per_doc = (
            sigs.groupBy("seed")
            .agg(F.countDistinct("minh").alias("n"))
            .collect()
        )
        assert all(r["n"] == 1 for r in per_doc)

    def test_candidates_include_near_dup(self, docs):
        cand = minhash_candidates(minhash_bands(minhash_signatures(docs)))
        pairs = {(r["a"], r["b"]) for r in cand.collect()}
        assert (0, 1) in pairs
        assert (0, 2) in pairs or (1, 2) in pairs

    def test_jaccard_exact_values(self, spark, docs):
        pairs = spark.createDataFrame([(0, 1), (0, 4)], ["a", "b"])
        got = {(r["a"], r["b"]): r["jaccard"]
               for r in shingle_jaccard(docs, pairs).collect()}
        assert got[(0, 1)] == 1.0
        assert got[(0, 4)] == 0.0

    def test_cluster_rep(self, docs):
        got = {r["doc_id"]: r["cluster_rep"]
               for r in minhash_dedup(docs, threshold=0.5).collect()}
        assert got[0] == got[1] == "0"
        assert got[4] == "4"

    def test_hot_bucket_cap_bounds_candidates(self, spark):
        """A band bucket shared by 1k docs must NOT yield ~500k
        candidate pairs: the df cap drops it before the self-join
        (round-3 verdict finding 4). Docs sharing a cold bucket still
        pair up."""
        rows = [(i, 0, "HOT") for i in range(1000)]
        rows += [(2000, 1, "cold"), (2001, 1, "cold")]
        bands = spark.createDataFrame(rows, ["id", "band", "band_key"])
        pairs = {(r["a"], r["b"])
                 for r in minhash_candidates(bands).collect()}
        assert pairs == {(2000, 2001)}
        # cap disabled -> quadratic candidates come back
        n_uncapped = minhash_candidates(
            bands.filter(F.col("id") < 10), max_bucket_df=None).count()
        assert n_uncapped == 45


class TestSimHash:
    def test_identical_equal_similar_close(self, docs):
        got = {r["id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
        assert got[0] == got[1]
        d_near = bin(int(got[0]) ^ int(got[2])).count("1")
        d_far = bin(int(got[0]) ^ int(got[4])).count("1")
        assert d_near <= d_far


class TestSimilarity:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [-1.0, 0.0, 0.0, 0.0]),
            (4, [0.0, 0.0, 1.0, 0.0]),
        ]
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    def test_bruteforce(self, vecs):
        got = [r["vec_id"] for r in cosine_topk(vecs, [1.0, 0.0, 0.0, 0.0], 2).collect()]
        assert got == [0, 1]

    def test_lsh_bucket_filters_but_finds(self, vecs):
        anchors = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
        got = [r["vec_id"] for r in
               lsh_ann(vecs, [1.0, 0.05, 0.0, 0.0], 2, anchors).collect()]
        assert got[0] in (0, 1)
        assert 3 not in got  # opposite bucket excluded

    def test_ivf(self, vecs):
        cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                 [0.0, 0.0, 1.0, 0.0]]
        # query == vec 1 exactly (cosine 1.0), vec 0 second
        got = [r["vec_id"] for r in
               ivf_topk(vecs, [0.9, 0.1, 0.0, 0.0], 2, cents, nprobe=1).collect()]
        assert got == [1, 0]

    def test_pairwise_threshold(self, vecs):
        got = {(r["a"], r["b"]) for r in pairwise_cosine(vecs, 0.95).collect()}
        assert (0, 1) in got
        assert (0, 2) not in got

    def test_pairwise_unblocked_guard(self, spark, monkeypatch):
        # O(N^2) refusal above the guard unless explicitly overridden
        import openalex_neo4j_spark.operators.similarity as sim
        monkeypatch.setattr(sim, "PAIRWISE_MAX_UNBLOCKED_ROWS", 3)
        vecs = spark.createDataFrame(
            [(i, [1.0, 0.0]) for i in range(5)], ["vec_id", "embedding"])
        with pytest.raises(ValueError, match="O\\(N\\^2\\)"):
            sim.pairwise_cosine(vecs, 0.9)
        # explicit override still works
        n = sim.pairwise_cosine(vecs, 0.9, allow_full_cross=True).count()
        assert n == 10  # all 5*4/2 identical-vector pairs


class TestText:
    def test_token_count(self, docs):
        got = {r["doc_id"]: (r["n_tokens"], r["n_subwords"])
               for r in token_count(docs).collect()}
        assert got[0][0] == 9
        assert got[0][1] >= 9

    def test_lang_id(self, docs):
        got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
        assert got[0] == "en"
        assert got[3] == "de"
        assert got[5] == "fr"
        assert got[4] == "und"

    def test_quality_bounds(self, docs):
        for r in quality_score(docs).collect():
            assert 0.0 <= r["quality"] <= 1.0

    def test_fingerprint_order_insensitive(self, spark):
        df = spark.createDataFrame(
            [(0, "b a c"), (1, "c b a"), (2, "a b d")], ["doc_id", "text"]
        )
        got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
        assert got[0] == got[1] != got[2]


class TestSkew:
    def test_salted_count_matches_plain(self, spark):
        rows = [("hot", i) for i in range(500)] + [("cold", i) for i in range(3)]
        df = spark.createDataFrame(rows, ["k", "v"])
        got = {r["k"]: r["cnt"] for r in salted_count(df, ["k"]).collect()}
        assert got == {"hot": 500, "cold": 3}

    def test_salt_from_named_columns_skips_wide_payload(self, spark):
        """The salt expression hashes only the caller-named column set;
        a wide payload column stays out of the hash and results are
        identical either way."""
        from pyspark.sql import functions as F
        from openalex_neo4j_spark.operators.skew import _salt_expr

        rows = [("hot", i, "X" * 10_000) for i in range(200)] + [
            ("cold", i, "Y" * 10_000) for i in range(3)]
        df = spark.createDataFrame(rows, ["k", "v", "payload"])
        got = {r["k"]: r["cnt"]
               for r in salted_count(df, ["k"], salt_cols=["v"]).collect()}
        assert got == {"hot": 200, "cold": 3}
        # the named-subset salt expression references v only
        expr = str(_salt_expr(df, ["k"], ["v"], 16))
        assert "payload" not in expr and "v" in expr
        # default (no salt_cols) still excludes the constant group keys
        expr_default = str(_salt_expr(df, ["k"], None, 16))
        assert "'k" not in expr_default.replace("pmod", "")
        # and the salt actually spreads the hot key across partials
        spread = (
            df.withColumn("_salt", _salt_expr(df, ["k"], ["v"], 16))
            .filter(F.col("k") == "hot").select("_salt").distinct().count()
        )
        assert spread > 1

    def test_salted_join_matches_plain(self, spark):
        big = spark.createDataFrame(
            [("a", i) for i in range(100)] + [("b", i) for i in range(5)],
            ["k", "v"],
        )
        small = spark.createDataFrame([("a", "x"), ("b", "y")], ["k", "name"])
        got = salted_join(big, small, "k")
        assert got.count() == big.join(small, "k").count()


class TestMultimodal:
    def test_metadata_and_fake_decode(self, spark):
        from openalex_neo4j_spark.operators.multimodal import (
            decode_image_batches,
            media_metadata,
        )
        rows = [
            (0, "image", bytearray(b"\xff\xd8\xff" + b"x" * 100), "image/jpeg"),
            (1, "image", bytearray(b"\x89PNG" + b"y" * 50), "image/png"),
        ]
        df = spark.createDataFrame(
            rows, "media_id long, kind string, payload binary, mime string"
        )
        meta = {r["media_id"]: r for r in media_metadata(df).collect()}
        assert meta[0]["sniffed_mime"] == "image/jpeg"
        assert meta[1]["sniffed_mime"] == "image/png"
        assert meta[0]["byte_len"] == 103

        feats = {r["media_id"]: r for r in
                 decode_image_batches(df, fake=True).collect()}
        assert feats[0]["width"] >= 64 and feats[0]["channels"] in (1, 2, 3)

        with pytest.raises(NotImplementedError):
            decode_image_batches(df, fake=False)


def test_parse_image_header_roundtrip_and_edges():
    """Stdlib header parser (round-2 verdict item 6): synth->parse
    round-trips for all three formats; truncated/garbage bytes yield
    (None, None, None) instead of raising."""
    from openalex_neo4j_spark.operators.multimodal import (
        parse_image_header, synthesize_image_payload)

    for fmt in ("png", "jpeg", "gif"):
        for w, h in [(1, 1), (16, 512), (640, 480), (65535, 2)]:
            b = synthesize_image_payload(fmt, w, h)
            assert parse_image_header(b) == (fmt, w, h)

    assert parse_image_header(None) == (None, None, None)
    assert parse_image_header(b"") == (None, None, None)
    assert parse_image_header(b"not an image at all") == (None, None, None)
    # truncated PNG (signature only)
    assert parse_image_header(b"\x89PNG\r\n\x1a\n") == (None, None, None)
    # truncated JPEG (SOI only)
    assert parse_image_header(b"\xff\xd8") == (None, None, None)
    # JPEG whose SOF is progressive (C2) still parses
    b = bytearray(synthesize_image_payload("jpeg", 100, 200))
    i = b.index(b"\xff\xc0")
    b[i + 1] = 0xC2
    assert parse_image_header(bytes(b)) == ("jpeg", 100, 200)


def test_image_header_features_distributed(spark):
    from pyspark.sql import types as T

    from openalex_neo4j_spark.operators.multimodal import (
        image_header_features, synthesize_image_payload)

    rows = [(i, synthesize_image_payload(["png", "jpeg", "gif"][i % 3],
                                         10 + i, 20 + i))
            for i in range(30)] + [(99, None)]
    df = spark.createDataFrame(rows, schema=T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])).repartition(4)
    got = {r["media_id"]: (r["fmt"], r["width"], r["height"])
           for r in image_header_features(df).collect()}
    assert got[0] == ("png", 10, 20)
    assert got[1] == ("jpeg", 11, 21)
    assert got[2] == ("gif", 12, 22)
    assert got[99] == (None, None, None)
    assert len(got) == 31


def _py_simhash64_bands(text: str) -> tuple[int, int, int, int]:
    """Independent plain-Python reimplementation for the test oracle."""
    import hashlib
    sums = [0] * 64
    for tok in text.split(" "):
        if not tok:
            continue
        hx = hashlib.md5(tok.encode()).hexdigest()[:16]
        for b in range(64):
            nib = int(hx[b // 4], 16)
            bit = (nib >> (b % 4)) & 1
            sums[b] += 1 if bit else -1
    bands = []
    for k in range(4):
        v = 0
        for j in range(16):
            if sums[16 * k + j] > 0:
                v |= 1 << j
        bands.append(v)
    return tuple(bands)


def test_simhash64_signatures_match_python(spark):
    from openalex_neo4j_spark.operators.dedup import simhash64_signatures

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "entity linking at web scale with minhash"),
        (3, "a b a b a"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
           for r in simhash64_signatures(df).collect()}
    for i, t in docs:
        if t.strip():
            assert got[i] == _py_simhash64_bands(t), f"doc {i}"
    assert 4 not in got  # empty text -> no tokens -> no signature row


def test_simhash64_near_duplicates_hamming(spark):
    from openalex_neo4j_spark.operators.dedup import (
        simhash64_near_duplicates)

    # 120-token doc; replacing token 1 with 'gamma' flips exactly 1
    # signature bit (precomputed with the plain-Python reimpl above —
    # SimHash bit flips depend on per-bit sums crossing zero, so the
    # near-dup fixture is chosen, not assumed)
    words = [f"w{i:03d}" for i in range(120)]
    base = " ".join(words)
    near = " ".join([words[0], "gamma"] + words[2:])
    far = "completely different subject matter entirely unrelated text"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)], ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash64_near_duplicates(df, max_hamming=3).collect()}
    # identical docs: hamming 0
    assert pairs.get((1, 4)) == 0
    # near-identical: exactly the precomputed 1-bit flip
    assert pairs.get((1, 2)) == 1
    assert pairs.get((2, 4)) == 1
    # unrelated doc never pairs with the near-dup cluster
    assert not any(3 in p for p in pairs)
