"""Unit tests for the pure scalar functions (reference-parity goldens).

Mirrors the reference's unit strategy: golden input->output literals
(tests/test_models.py, tests/test_neo4j_utils.py in the reference).
"""

from openalex_neo4j_spark.textnorm import (
    camel_case_label,
    extract_id,
    extract_text,
    minhash_signature,
    normalize_title,
    reconstruct_abstract,
    shingles,
    simhash,
    tokenize,
)


class TestExtractId:
    # parity: reference models.py:7-20 + tests/test_models.py
    def test_url(self):
        assert extract_id("https://openalex.org/W123") == "W123"

    def test_bare(self):
        assert extract_id("W123") == "W123"

    def test_trailing_slash(self):
        assert extract_id("https://ror.org/04abc/") == "04abc"

    def test_none_and_empty(self):
        assert extract_id(None) is None
        assert extract_id("") is None
        assert extract_id("   ") is None


class TestCamelCase:
    # parity: reference neo4j_client.py:11-31, tests/test_neo4j_utils.py:11-37
    def test_basic(self):
        assert camel_case_label("journal-article") == "JournalArticle"

    def test_uppercase_input_is_lowered(self):
        assert camel_case_label("JOURNAL-ARTICLE") == "JournalArticle"

    def test_single(self):
        assert camel_case_label("dataset") == "Dataset"

    def test_none(self):
        assert camel_case_label(None) is None
        assert camel_case_label("  ") is None


class TestReconstructAbstract:
    # golden from reference tests/test_models.py:132-144
    def test_golden(self):
        inv = {"This": [0], "is": [1], "a": [2], "test": [3]}
        assert reconstruct_abstract(inv) == "This is a test"

    def test_repeated_word(self):
        inv = {"the": [0, 2], "cat": [1], "mat": [3]}
        assert reconstruct_abstract(inv) == "the cat the mat"

    def test_empty(self):
        assert reconstruct_abstract({}) is None
        assert reconstruct_abstract(None) is None


class TestExtractText:
    def test_strips_tags_and_scripts(self):
        html = b"<html><head><script>x()</script></head><body><p>Hello <b>world</b></p></body></html>"
        assert extract_text(html) == "Hello world"

    def test_entities_and_whitespace(self):
        assert extract_text("<p>a &amp; b\n\n  c</p>") == "a & b c"

    def test_none(self):
        assert extract_text(None) == ""

    def test_deterministic_bytes_vs_str(self):
        html = "<p>café</p>"
        assert extract_text(html) == extract_text(html.encode("utf-8"))


class TestNormalizeTokenize:
    def test_normalize(self):
        assert normalize_title("  Grn  MODELés!  ") == "grn modeles"

    def test_tokenize(self):
        assert tokenize("A  b-c") == ["a", "b", "c"]

    def test_shingles_short(self):
        assert shingles("one two") == ["one two"]

    def test_shingles_k3(self):
        assert shingles("a b c d") == ["a b c", "b c d"]


class TestHashing:
    def test_minhash_deterministic(self):
        s1 = minhash_signature(["a b c", "b c d"])
        s2 = minhash_signature(["a b c", "b c d"])
        assert s1 == s2 and len(s1) == 16

    def test_minhash_similar_sets_share_values(self):
        a = minhash_signature([f"sh{i}" for i in range(20)])
        b = minhash_signature([f"sh{i}" for i in range(19)])
        assert sum(x == y for x, y in zip(a, b)) >= 8

    def test_simhash_close_for_similar(self):
        t1 = tokenize("deep graph neural network inference model")
        t2 = tokenize("deep graph neural network inference")
        d = bin(simhash(t1) ^ simhash(t2)).count("1")
        assert d <= 15
