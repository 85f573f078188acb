"""Byte-identical extraction invariant + mention-detection unit tests."""

from pyspark.sql import functions as F

from openalex_neo4j_spark.corpus import build_world, pages_dataframe
from openalex_neo4j_spark.extract import mentions_from_pages, pages_with_text
from openalex_neo4j_spark.mention_parse import parse_mention
from openalex_neo4j_spark.textnorm import extract_text


def test_extracted_text_byte_identical_per_url(spark, small_world):
    """North-rule invariant: the Arrow UDF's output equals the plain-
    Python extractor's output, exactly, for every url."""
    pages = pages_dataframe(spark, small_world)
    got = {
        r["url"]: r["text"]
        for r in pages_with_text(pages).select("url", "text").collect()
    }
    expected = {p.url: extract_text(p.html) for p in small_world.pages}
    assert got == expected


def test_degenerate_pages_yield_no_mentions(spark, small_world):
    pages = pages_dataframe(spark, small_world)
    m = mentions_from_pages(pages)
    urls = {r["url"] for r in m.select("url").collect()}
    noise = {p.url for p in small_world.pages if p.work_id is None}
    assert noise and not (urls & noise)
    scholarly = {p.url for p in small_world.pages if p.work_id is not None}
    assert urls == scholarly


def test_parse_mention_lenient():
    # missing title -> no mention (analog of missing-id ValueError the
    # caller skips — reference models.py:46-48, openalex_client.py:48-55)
    assert parse_mention("u", b"<html><body>hi</body></html>") is None
    # minimal mention: title only, everything else None/empty
    m = parse_mention(
        "u", b'<meta name="citation_title" content="A Title">'
    )
    assert m["title"] == "A Title"
    assert m["doi"] is None
    assert m["authors"] == [] and m["referenced_dois"] == []


def test_parse_mention_author_orcid_zip():
    html = (
        b'<meta name="citation_title" content="T">'
        b'<meta name="citation_author" content="Jane Doe">'
        b'<meta name="citation_author" content="Bob Roe">'
        b'<meta name="citation_author_orcid" content="0000-0001-0000-0001">'
    )
    m = parse_mention("u", html)
    assert m["authors"][0] == {
        "display_name": "Jane Doe", "orcid": "0000-0001-0000-0001"
    }
    assert m["authors"][1] == {"display_name": "Bob Roe", "orcid": None}


def test_parse_meta_real_web_variance():
    """Attribute order, quote style, extra attributes, whitespace —
    the shapes real crawl HTML actually has."""
    from openalex_neo4j_spark.mention_parse import parse_meta

    html = (
        b"<meta content=\"Reversed Order\" name=\"citation_title\">"
        b"<meta name='citation_author' content='Single Quotes'/>"
        b'<meta data-x="1" name="CITATION_DOI" class="m" content="10.1/x" >'
        b'<meta\n  name="citation_year"\n  content="2001"\n/>'
        b'<meta name="description" content="not citation">'
    )
    got = parse_meta(html)
    assert got["citation_title"] == ["Reversed Order"]
    assert got["citation_author"] == ["Single Quotes"]
    assert got["citation_doi"] == ["10.1/x"]
    assert got["citation_year"] == ["2001"]
    assert "description" not in got


def test_html_column_pruned_from_mentions(spark, small_world):
    """The binary column must not survive past the mention stage."""
    pages = pages_dataframe(spark, small_world)
    m = mentions_from_pages(pages)
    assert "html" not in m.columns
