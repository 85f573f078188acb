"""DuckDB-readable oracle tables for the kg_* contract queries.

Round 1 left kg_triples / kg_citation_rank / kg_hybrid_search as
rows-only checks ("no_oracle"). This module materializes their
expected outputs as parquet from the plain-Python oracle path
(oracle.py + mention_parse.py — the same independent single-process
code the P/R gate trusts), so each kg_* query carries a real
``SELECT … FROM read_parquet(...)`` DuckDB oracle.

Determinism notes (the value-hash gate canonicalizes floats at 9 dp):

- **triples** are strings — set equality with the pipeline holds
  exactly at fixture scale (P = R = 1.0, tests/test_pipeline.py).
- **citation_rank** sums float contributions whose addition order
  differs between Spark partial aggregation and this loop, so both
  sides round half-even to 6 dp (``F.bround`` == Python ``round``)
  *before* the order-by/limit cut.
- **hybrid search**: the vector leg replicates Spark's fold order
  bit-for-bit (float32 embeddings, ``acc + a*b`` left fold, float32
  ``x*x`` inside the norm fold — see ``cosine_expr``), so scores are
  identical doubles; the fulltext leg's per-doc TF-IDF sum is
  order-dependent, so both sides bround(6) before ranking. The fused
  RRF score is an exact two-term rational — bit-identical everywhere.
"""

from __future__ import annotations

import math
import os
import re
import uuid

import numpy as np

from openalex_neo4j_spark.mention_parse import parse_mention
from openalex_neo4j_spark.oracle import oracle_triples
from openalex_neo4j_spark.search import EMBED_DIM, OVERFETCH, RRF_K, _hash_embed_one

# bump when pipeline/oracle semantics change: the /tmp materializations
# are content-keyed only by world size + this version
KG_CACHE_VERSION = "r2a"
ORACLE_ROOT = f"/tmp/spark_graft_kg_oracle_{KG_CACHE_VERSION}"

# world sizes pinned by the kg_* contract queries (driver_contract.py)
TRIPLES_WORKS = 150
RANK_WORKS = 120
HYBRID_WORKS = 100
SEED = 42


# ---------------------------------------------------------------------------
# plain-Python analogs of the three kg_* queries
# ---------------------------------------------------------------------------

def citation_rank_py(edges: list[tuple[str, str]], damping: float = 0.85,
                     iterations: int = 5) -> dict[str, float]:
    """Mirror of operators/graphalgo.citation_rank over (subj, obj)
    CITES pairs: r <- (1-d) + d * sum(r_u / out_u)."""
    nodes = sorted({s for s, _ in edges} | {o for _, o in edges})
    out_deg: dict[str, int] = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    ranks = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        in_mass = {n: 0.0 for n in nodes}
        for s, o in edges:
            in_mass[o] += ranks[s] * (1.0 / out_deg[s])
        ranks = {n: (1.0 - damping) + damping * in_mass[n] for n in nodes}
    return ranks


def work_table_py(world) -> list[dict]:
    """The Work node table the pipeline builds, derived from ground
    truth: mentions parsed per page (shared parse_mention), clustered
    by the true work, winner row = (has-doi first, norm_title, title,
    url) — the exact work_nodes window order (pipeline.py:66-71)."""
    from openalex_neo4j_spark.oracle import work_node_id

    by_work: dict[str, list[dict]] = {}
    for p in world.pages:
        if p.work_id is None:
            continue
        m = parse_mention(p.url, p.html)
        if m is None:
            continue
        by_work.setdefault(p.work_id, []).append(m)
    rows = []
    for wid, mentions in by_work.items():
        mentions.sort(key=lambda m: (m["doi"] is None, m["norm_title"],
                                     m["title"], m["url"]))
        win = mentions[0]
        rows.append({
            "id": work_node_id(world.works[wid]),
            "title": win["title"],
            "abstract": win["abstract"],
            "publication_year": win["publication_year"],
            "doi": win["doi"],
        })
    return sorted(rows, key=lambda r: r["id"])


def _embed_f32(text: str | None) -> np.ndarray:
    return np.array(_hash_embed_one(text), dtype=np.float32)


def _cosine_spark_order(vec_f32: np.ndarray, q: list[float]) -> float:
    """Bit-exact mirror of search.cosine_expr: dot = left fold of
    double(a_f32)*b; nv = sqrt(left fold of float32(a*a) widened);
    nq computed python-side (it IS python-side in the Spark plan)."""
    dot = 0.0
    for a, b in zip(vec_f32, q):
        dot = dot + float(a) * b
    nv = 0.0
    for a in vec_f32:
        nv = nv + float(np.float32(a) * np.float32(a))
    nv = math.sqrt(nv)
    nq = float(math.sqrt(sum(x * x for x in q))) or 1.0
    return dot / (nv * nq)


_TOK_RE = re.compile(r"[^\w\s]", re.ASCII)
_WS_RE = re.compile(r"\s+", re.ASCII)


def _tokens(text: str) -> list[str]:
    """search._doc_tokens tokenization (ASCII \\w to match Java regex)."""
    return [t for t in _WS_RE.split(_TOK_RE.sub(" ", text.lower())) if t]


def hybrid_oracle_py(world, query: str, limit: int = 5,
                     round_dp: int = 6) -> list[tuple[str, float, str]]:
    """Expected (id, score, title) of search.hybrid_search with
    score_round=round_dp over the materialized graph of ``world``."""
    works = work_table_py(world)

    # vector leg (exact replication of cosine_expr op order)
    qvec = _hash_embed_one(query)
    scored_v = []
    for w in works:
        if w["abstract"] is not None:
            text = f"{w['title']}. {w['abstract'][:1000]}"
        else:
            text = w["title"]
        s = _cosine_spark_order(_embed_f32(text), qvec)
        scored_v.append((w["id"], round(s, round_dp)))
    scored_v.sort(key=lambda t: (-t[1], t[0]))
    vec_leg = scored_v[: limit * OVERFETCH]

    # fulltext leg (TF-IDF over title + abstract; bround-ed sums)
    n_docs = len(works)
    tf: dict[str, dict[str, int]] = {}
    dfreq: dict[str, int] = {}
    for w in works:
        ft_text = " ".join(x for x in (w["title"], w["abstract"] or "") if x)
        counts: dict[str, int] = {}
        for t in _tokens(ft_text):
            counts[t] = counts.get(t, 0) + 1
        tf[w["id"]] = counts
        for t in counts:
            dfreq[t] = dfreq.get(t, 0) + 1
    terms = sorted({t for t in query.lower().replace(",", " ").split() if t})
    scored_f = []
    for w in works:
        s = 0.0
        hit = False
        for t in terms:
            c = tf[w["id"]].get(t)
            if c:
                hit = True
                s += c * (math.log((n_docs + 1) / (dfreq[t] + 1)) + 1.0)
        if hit:
            scored_f.append((w["id"], round(s, round_dp)))
    scored_f.sort(key=lambda t: (-t[1], t[0]))
    ft_leg = scored_f[: limit * OVERFETCH]

    # RRF fusion (search.rrf_fuse): rank 1.. per leg, missing -> 0 term
    rank_v = {d: i + 1 for i, (d, _) in enumerate(vec_leg)}
    rank_f = {d: i + 1 for i, (d, _) in enumerate(ft_leg)}
    fused = []
    for d in set(rank_v) | set(rank_f):
        s = 0.0
        if d in rank_v:
            s += 1.0 / (RRF_K + rank_v[d])
        if d in rank_f:
            s += 1.0 / (RRF_K + rank_f[d])
        fused.append((d, s))
    fused.sort(key=lambda t: (-t[1], t[0]))
    title_of = {w["id"]: w["title"] for w in works}
    return [(d, s, title_of.get(d)) for d, s in fused[:limit]]


# ---------------------------------------------------------------------------
# parquet materialization (idempotent, atomic rename)
# ---------------------------------------------------------------------------

def _write_parquet(path: str, cols: dict[str, list]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(pa.table(cols), tmp)
    os.replace(tmp, path)


def ensure_kg_oracle_tables(root: str = ORACLE_ROOT) -> dict[str, str]:
    """Materialize the three oracle tables (once; deterministic
    content) and return {query_name: parquet_path}."""
    from openalex_neo4j_spark.corpus import build_world

    os.makedirs(root, exist_ok=True)
    paths = {
        "kg_triples": f"{root}/triples_w{TRIPLES_WORKS}.parquet",
        "kg_citation_rank": f"{root}/citation_rank_w{RANK_WORKS}.parquet",
        "kg_hybrid_search": f"{root}/hybrid_w{HYBRID_WORKS}.parquet",
    }
    if not os.path.exists(paths["kg_triples"]):
        triples = sorted(oracle_triples(build_world(TRIPLES_WORKS, seed=SEED)))
        _write_parquet(paths["kg_triples"], {
            "subj": [t[0] for t in triples],
            "pred": [t[1] for t in triples],
            "obj": [t[2] for t in triples],
        })
    if not os.path.exists(paths["kg_citation_rank"]):
        world = build_world(RANK_WORKS, seed=SEED)
        cites = sorted((s, o) for s, p, o in oracle_triples(world)
                       if p == "CITES")
        ranks = citation_rank_py(cites, iterations=5)
        top = sorted(((rid, round(r, 6)) for rid, r in ranks.items()),
                     key=lambda t: (-t[1], t[0]))[:20]
        _write_parquet(paths["kg_citation_rank"], {
            "id": [t[0] for t in top],
            "rank": [t[1] for t in top],
        })
    if not os.path.exists(paths["kg_hybrid_search"]):
        world = build_world(HYBRID_WORKS, seed=SEED)
        w = next(w for w in world.works.values() if w.has_canonical)
        rows = hybrid_oracle_py(world, w.title, limit=5)
        _write_parquet(paths["kg_hybrid_search"], {
            "id": [r[0] for r in rows],
            "score": [r[1] for r in rows],
            "title": [r[2] for r in rows],
        })
    return paths


def kg_oracle_sql() -> dict[str, str]:
    """DuckDB oracle statements for the kg_* queries (materializing
    the tables as a side effect so the SQL is always runnable)."""
    paths = ensure_kg_oracle_tables()
    return {
        "kg_triples": (
            f"SELECT subj, pred, obj FROM read_parquet('{paths['kg_triples']}')"
        ),
        "kg_citation_rank": (
            f"SELECT id, \"rank\" FROM "
            f"read_parquet('{paths['kg_citation_rank']}')"
        ),
        "kg_hybrid_search": (
            f"SELECT id, score, title FROM "
            f"read_parquet('{paths['kg_hybrid_search']}')"
        ),
        # derived-count surface: recompute top-cited from the oracle
        # triple table itself (cited_by_count prop rows on Work nodes)
        "kg_top_cited": f"""
SELECT t.subj AS id, CAST(t.obj AS BIGINT) AS cited_by_count
FROM read_parquet('{paths['kg_triples']}') t
WHERE t.pred = 'cited_by_count'
  AND t.subj IN (SELECT subj FROM read_parquet('{paths['kg_triples']}')
                 WHERE pred = 'label' AND obj = 'Work')
ORDER BY cited_by_count DESC, id
LIMIT 20
""",
        # README.md:342-346 — 2-hop collaborator pairs over AUTHORED
        "kg_collaborators": f"""
WITH authored AS (
  SELECT subj AS author, obj AS work
  FROM read_parquet('{paths['kg_triples']}') WHERE pred = 'AUTHORED')
SELECT a.author AS a1, b.author AS a2,
       COUNT(DISTINCT a.work) AS shared_works
FROM authored a JOIN authored b
  ON a.work = b.work AND a.author < b.author
GROUP BY 1, 2
ORDER BY shared_works DESC, a1, a2
LIMIT 20
""",
        # README.md:349-352 — 3-hop institution -> authors -> works
        "kg_institution_works": f"""
WITH aff AS (
  SELECT subj AS author, obj AS inst
  FROM read_parquet('{paths['kg_triples']}') WHERE pred = 'AFFILIATED_WITH'),
authored AS (
  SELECT subj AS author, obj AS work
  FROM read_parquet('{paths['kg_triples']}') WHERE pred = 'AUTHORED')
SELECT inst, COUNT(DISTINCT work) AS n_works
FROM aff JOIN authored USING (author)
GROUP BY inst
ORDER BY n_works DESC, inst
""",
        # README.md:336-339, 355-357 — co-citation pairs over CITES
        "kg_cocited_pairs": f"""
WITH cites AS (
  SELECT subj AS citing, obj AS cited
  FROM read_parquet('{paths['kg_triples']}') WHERE pred = 'CITES')
SELECT a.cited AS w1, b.cited AS w2,
       COUNT(DISTINCT a.citing) AS cocitations
FROM cites a JOIN cites b
  ON a.citing = b.citing AND a.cited < b.cited
GROUP BY 1, 2
ORDER BY cocitations DESC, w1, w2
LIMIT 20
""",
    }
