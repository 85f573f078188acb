"""Pure per-page scholarly-mention parser (analog of ``from_openalex``).

Parses the ``citation_*`` meta tags of a paper landing page into one
structured mention record — the analog of the reference's lenient
JSON extractors (models.py:43-140): every field is optional, malformed
rows yield ``None`` fields, and a page with no title mention yields no
record at all (analog of the missing-id ValueError the caller skips —
models.py:46-48, openalex_client.py:48-55).

This module is pure Python so the vectorized Spark UDF
(:mod:`openalex_neo4j_spark.extract`) and unit tests share one
implementation.
"""

from __future__ import annotations

import re

from openalex_neo4j_spark.textnorm import normalize_title

# Tolerant of real-web variance: attribute order (name/content in
# either order), single or double quotes, extra attributes, arbitrary
# intra-tag whitespace, self-closing slash.
_META_TAG_RE = re.compile(r"<meta\b([^>]*)>", re.IGNORECASE)
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*("([^"]*)"|'([^']*)')""",
)

_INT_RE = re.compile(r"^\d+$")
_ABSTRACT_RE = re.compile(r'<p class="abstract">(.*?)</p>', re.DOTALL)


def parse_meta(html: bytes | str | None) -> dict[str, list[str]]:
    """All citation_* meta tags as ``{name: [values...]}`` (order kept)."""
    if html is None:
        return {}
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    out: dict[str, list[str]] = {}
    for attrs_blob in _META_TAG_RE.findall(html):
        name = None
        content = None
        for attr, _q, dq, sq in _ATTR_RE.findall(attrs_blob):
            val = dq if dq or _q.startswith('"') else sq
            a = attr.lower()
            if a == "name":
                name = val.lower()
            elif a == "content":
                content = val
        if name and name.startswith("citation_") and content is not None:
            out.setdefault(name, []).append(content)
    return out


def parse_mention(url: str, html: bytes | str | None) -> dict | None:
    """One mention record per page, or None when no title is present."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    meta = parse_meta(html)
    titles = meta.get("citation_title")
    if not titles or not titles[0].strip():
        return None
    title = titles[0]
    abstract_m = _ABSTRACT_RE.search(html) if html else None
    year = None
    ys = meta.get("citation_year")
    if ys and _INT_RE.match(ys[0].strip()):
        year = int(ys[0].strip())

    names = meta.get("citation_author", [])
    orcids = meta.get("citation_author_orcid", [])
    authors = [
        {
            "display_name": names[i] if i < len(names) else None,
            "orcid": orcids[i] if i < len(orcids) else None,
        }
        for i in range(max(len(names), len(orcids)))
    ]
    inst_names = meta.get("citation_institution", [])
    rors = meta.get("citation_institution_ror", [])
    countries = meta.get("citation_institution_country", [])
    institutions = [
        {
            "display_name": inst_names[i] if i < len(inst_names) else None,
            "ror": rors[i] if i < len(rors) else None,
            "country_code": countries[i] if i < len(countries) else None,
        }
        for i in range(max(len(inst_names), len(rors), len(countries)))
    ]

    def first(key: str) -> str | None:
        vals = meta.get(key)
        return vals[0] if vals else None

    return {
        "url": url,
        "title": title,
        "norm_title": normalize_title(title),
        "doi": first("citation_doi"),
        "publication_year": year,
        "type": first("citation_type"),
        "abstract": abstract_m.group(1) if abstract_m else None,
        "authors": authors,
        "institutions": institutions,
        "venue": first("citation_journal_title"),
        "issn": first("citation_issn"),
        "publisher": first("citation_publisher"),
        "topics": meta.get("citation_topic", []),
        "funders": meta.get("citation_funder", []),
        "referenced_dois": meta.get("citation_reference", []),
    }
