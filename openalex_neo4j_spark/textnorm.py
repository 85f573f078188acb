"""Pure scalar text functions shared by the oracle and the Spark UDFs.

These are the single source of truth for every per-row transform with
a byte-identical contract. The plain-Python reference extractor
(:mod:`openalex_neo4j_spark.oracle`) and the vectorized Arrow UDFs
(:mod:`openalex_neo4j_spark.extract`) both call exactly these
functions, which is how the "byte-identical extracted text per url"
invariant is guaranteed and tested.

Reference parity notes (jexp/openalex-neo4j):
- ``extract_openalex_id``   -> :func:`extract_id`        (models.py:7-20)
- ``to_camel_case_label``   -> :func:`camel_case_label`  (neo4j_client.py:11-31)
- abstract inverted-index reconstruction -> :func:`reconstruct_abstract`
  (models.py:114-122; golden in tests/test_models.py:132-144)
"""

from __future__ import annotations

import hashlib
import re
import unicodedata

# ---------------------------------------------------------------------------
# HTML -> text extraction (deterministic, regex-based; no external libs)
# ---------------------------------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}


def extract_text(html: bytes | str | None) -> str:
    """Deterministic HTML -> visible-text extraction.

    Contract: byte-identical output per url between the plain-Python
    oracle and the Arrow UDF (north-rule invariant). Steps, in order:
    utf-8 decode (replace errors), drop script/style blocks, drop
    comments, strip tags, decode a fixed entity table, collapse all
    whitespace runs to single spaces, strip.
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE_RE.sub(" ", html)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES.items():
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


# ---------------------------------------------------------------------------
# ID normalization  (reference: models.py:7-20)
# ---------------------------------------------------------------------------

def extract_id(value: str | None) -> str | None:
    """URL -> trailing path segment; bare IDs pass through; None-safe.

    Mirrors ``extract_openalex_id`` (models.py:7-20):
    ``'https://openalex.org/W123' -> 'W123'``; ``'W123' -> 'W123'``.
    """
    if value is None:
        return None
    value = value.strip()
    if not value:
        return None
    if "/" in value:
        tail = value.rstrip("/").rsplit("/", 1)[-1]
        return tail or None
    return value


# ---------------------------------------------------------------------------
# CamelCase label derivation  (reference: neo4j_client.py:11-31)
# ---------------------------------------------------------------------------

def camel_case_label(value: str | None) -> str | None:
    """``'journal-article' -> 'JournalArticle'``.

    Splits on ``-`` and ``str.capitalize()``s each part — which also
    lowercases the remainder (``'JOURNAL-ARTICLE' -> 'JournalArticle'``,
    per reference tests/test_neo4j_utils.py:34-37).
    """
    if value is None or not value.strip():
        return None
    return "".join(part.capitalize() for part in value.strip().split("-"))


# ---------------------------------------------------------------------------
# Abstract reconstruction from inverted index  (reference: models.py:114-122)
# ---------------------------------------------------------------------------

def reconstruct_abstract(inverted_index: dict[str, list[int]] | None) -> str | None:
    """``{word: [positions]} -> ordered text`` joined with single spaces.

    Golden (reference tests/test_models.py:132-144):
    ``{"This": [0], "is": [1], "a": [2], "test": [3]} -> "This is a test"``.
    Missing positions become empty slots which vanish on join, matching
    the reference's list-of-len-max+1 then ``' '.join`` behavior only
    when the index is dense; we replicate the exact allocate-and-place
    algorithm including sparse-index behavior (empty-string slots).
    """
    if not inverted_index:
        return None
    max_pos = -1
    for positions in inverted_index.values():
        for p in positions:
            if p > max_pos:
                max_pos = p
    if max_pos < 0:
        return None
    slots = [""] * (max_pos + 1)
    for word, positions in inverted_index.items():
        for p in positions:
            slots[p] = word
    return " ".join(slots)


# ---------------------------------------------------------------------------
# Name / title normalization used by entity linking
# ---------------------------------------------------------------------------

def strip_accents(s: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c)
    )


_NON_ALNUM_RE = re.compile(r"[^a-z0-9 ]+")


def normalize_title(title: str | None) -> str:
    """Canonical form used for alias matching: lowercase, accent-strip,
    drop punctuation, collapse whitespace."""
    if not title:
        return ""
    s = strip_accents(title).lower()
    s = _NON_ALNUM_RE.sub(" ", s)
    return _WS_RE.sub(" ", s).strip()


def tokenize(text: str | None) -> list[str]:
    """Whitespace tokenization over the normalized form."""
    n = normalize_title(text)
    return n.split(" ") if n else []


def shingles(text: str | None, k: int = 3) -> list[str]:
    """Word k-shingles of the normalized text (distinct, sorted)."""
    toks = tokenize(text)
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return sorted({" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)})


# ---------------------------------------------------------------------------
# Stable hashing (shared by MinHash in oracle/tests and SQL expressions)
# ---------------------------------------------------------------------------

def md5_int(s: str, bits: int = 60) -> int:
    """First ``bits`` bits of md5(s) as a non-negative int.

    md5 is computed identically by Python hashlib, Spark ``F.md5`` and
    DuckDB ``md5()``, so this is the cross-engine-stable hash used for
    MinHash signatures and fingerprints.
    """
    h = hashlib.md5(s.encode("utf-8")).hexdigest()
    return int(h[: bits // 4], 16)


def minhash_signature(items: list[str], num_hashes: int = 16) -> list[int]:
    """MinHash over md5("{seed}|{item}") — deterministic, engine-stable."""
    if not items:
        return [0] * num_hashes
    return [
        min(md5_int(f"{seed}|{it}") for it in items) for seed in range(num_hashes)
    ]


def simhash(tokens: list[str], bits: int = 60) -> int:
    """Classic SimHash over md5-hashed tokens (Charikar 2002)."""
    if not tokens:
        return 0
    acc = [0] * bits
    for t in tokens:
        h = md5_int(t, bits)
        for b in range(bits):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(bits):
        if acc[b] > 0:
            out |= 1 << b
    return out
