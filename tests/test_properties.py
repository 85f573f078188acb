"""Property-based tests (hypothesis) for the pure scalar layer —
these run without Spark and pin the invariants the distributed
pipeline depends on."""

from hypothesis import given, settings, strategies as st

from openalex_neo4j_spark.ids import work_id
from openalex_neo4j_spark.oracle import precision_recall
from openalex_neo4j_spark.textnorm import (
    camel_case_label,
    extract_text,
    normalize_title,
    reconstruct_abstract,
    shingles,
    simhash,
    tokenize,
)

words = st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=8)
texts = st.lists(words, min_size=0, max_size=30).map(" ".join)


@given(texts)
def test_normalize_idempotent(t):
    assert normalize_title(normalize_title(t)) == normalize_title(t)


@given(texts)
def test_tokenize_roundtrip(t):
    toks = tokenize(t)
    assert " ".join(toks) == normalize_title(t)


@given(st.lists(words, min_size=1, max_size=20, unique=True))
def test_reconstruct_abstract_inverse(ws):
    """Building an inverted index from a token list and reconstructing
    must give back the exact text (byte-identical contract, P7)."""
    text = " ".join(ws)
    inv = {}
    for i, w in enumerate(ws):
        inv.setdefault(w, []).append(i)
    assert reconstruct_abstract(inv) == text


@given(texts)
def test_shingles_subset_of_text(t):
    for sh in shingles(t):
        for w in sh.split(" "):
            assert w in tokenize(t) or w == ""


@given(st.lists(words, min_size=1, max_size=15))
def test_simhash_deterministic_and_bounded(toks):
    h = simhash(toks)
    assert h == simhash(list(toks))
    assert 0 <= h < 2 ** 60


@given(st.text(min_size=0, max_size=50))
def test_extract_text_never_raises_and_has_no_tags(s):
    out = extract_text("<p>" + s.replace("<", "") + "</p>")
    assert "<" not in out and ">" not in out or s  # no tags survive


@given(words)
def test_camel_case_single_part(w):
    assert camel_case_label(w) == w.capitalize()


@given(st.sets(st.tuples(words, words, words), max_size=20),
       st.sets(st.tuples(words, words, words), max_size=20))
@settings(max_examples=50)
def test_precision_recall_bounds(pred, truth):
    p, r = precision_recall(pred, truth)
    assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0
    if pred == truth and pred:
        assert p == r == 1.0


@given(st.text(min_size=1, max_size=30).filter(lambda s: s.strip()))
def test_work_id_lowercase_stable(doi):
    wid = work_id(doi)
    assert wid == work_id(doi.upper()).replace(
        "doi:" + doi.upper().strip().lower(), wid)
    assert wid.startswith("doi:")
