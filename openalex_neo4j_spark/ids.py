"""Canonical entity-ID scheme, shared by the oracle and the Spark pipeline.

The reference keys every entity by its OpenAlex ID (``W123``/``A45``…,
normalized by ``extract_openalex_id`` — models.py:7-20). Web pages have
no OpenAlex IDs, so the canonical key is the strongest persistent
identifier each entity type carries:

=============  =======================================
Work           ``doi:<doi lowercased>``
Author         ``orcid:<orcid>``
Institution    ``ror:<trailing path segment of ROR url>``
Source         ``issn:<issn_l>``
Topic          ``topic:<name slug>``
Funder         ``funder:<name slug>``
Publisher      ``publisher:<name slug>``
=============  =======================================

All helpers are None-safe (return None when the identifier is absent),
mirroring the reference's lenient parsing (models.py:46-60).
"""

from __future__ import annotations

import re

from openalex_neo4j_spark.textnorm import extract_id

_WS = re.compile(r"\s+")


def _slug(name: str | None) -> str | None:
    if not name or not name.strip():
        return None
    return _WS.sub("-", name.strip().lower())


def work_id(doi: str | None) -> str | None:
    if not doi or not doi.strip():
        return None
    return "doi:" + doi.strip().lower()


def author_id(orcid: str | None) -> str | None:
    if not orcid or not orcid.strip():
        return None
    return "orcid:" + orcid.strip()


def institution_id(ror: str | None) -> str | None:
    tail = extract_id(ror)
    return ("ror:" + tail) if tail else None


def source_id(issn: str | None) -> str | None:
    if not issn or not issn.strip():
        return None
    return "issn:" + issn.strip()


def topic_id(name: str | None) -> str | None:
    s = _slug(name)
    return ("topic:" + s) if s else None


def funder_id(name: str | None) -> str | None:
    s = _slug(name)
    return ("funder:" + s) if s else None


def publisher_id(name: str | None) -> str | None:
    s = _slug(name)
    return ("publisher:" + s) if s else None
