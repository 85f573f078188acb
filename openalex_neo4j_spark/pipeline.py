"""End-to-end KG construction: pages -> mentions -> linked clusters ->
node tables -> edge tables -> (subj, pred, obj) triples.

Stage graph (re-expression of the reference's 7-step import,
importer.py:36-98 — see SURVEY.md §3.1):

  pages ──extract──> mentions ──link──> linked mentions (work_key)
        ├─ work/author/institution/source/topic/funder/publisher nodes
        │    (deterministic first-wins winners — A1 importer.py:100-104)
        ├─ 7 edge types via explode + distinct (+ CITES endpoint
        │    existence semi-join — F2 importer.py:242,293)
        └─ triples = edges ∪ exploded node-property triples

Scale notes:
- the binary ``html`` column dies at the mention stage (column
  pruning);
- every dedup is an aggregate keyed on the entity id (map-side
  partial agg), not a row window, except the Work winner pick which
  needs ordered first-wins semantics;
- CITES existence check is a left-semi join against the Work node
  table, broadcast when small, shuffle-hash otherwise (AQE decides);
- edge output is partitioned by ``pred`` downstream (materialize).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from openalex_neo4j_spark.extract import mentions_from_pages
from openalex_neo4j_spark.linking import link_mentions
from openalex_neo4j_spark.session import ckpt, stage_parquet


def camel_label_expr(col):
    """SQL camel-case: 'journal-article' -> 'JournalArticle'
    (neo4j_client.py:11-31). Exact str.capitalize() semantics per part:
    first char upcased, rest lowercased — NOT initcap, which would
    upcase every space-separated word inside a part."""
    return F.concat_ws(
        "",
        F.transform(
            F.split(F.lower(F.trim(col)), "-"),
            lambda p: F.concat(F.upper(p.substr(F.lit(1), F.lit(1))),
                               p.substr(F.lit(2), F.length(p))),
        ),
    )


def _slug_expr(col):
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", "-")


@dataclass
class GraphTables:
    nodes: dict[str, DataFrame]
    edges: DataFrame
    triples: DataFrame
    mentions: DataFrame


def work_nodes(linked: DataFrame) -> DataFrame:
    """One row per Work cluster; properties from the deterministic
    winner mention: DOI-bearing mention first (first-wins analog,
    importer.py:100-104), else min(norm_title, title, url).

    Shaped as ``groupBy(work_key).agg(min(struct(ord..., props...)))``
    rather than a row_number window: struct comparison is
    field-by-field with nulls-first ascending — exactly the window's
    ``ORDER BY ... ASC NULLS FIRST`` — but the aggregate gets map-side
    partial combining (only one candidate row per work per map
    partition enters the exchange, vs every mention row for a window)
    and needs no per-partition sort. Verified bit-identical to the
    window form on a 199k-page shard and on null-heavy fixtures;
    ~35% faster at 1 and 4 cores."""
    win = F.struct(
        F.col("doi").isNull().cast("int").alias("o1"),  # canonical first
        F.col("norm_title").alias("o2"),
        F.col("title").alias("o3"),
        F.col("url").alias("o4"),
        F.col("publication_year").alias("publication_year"),
        F.col("type").alias("type"),
        F.col("doi").alias("doi"),
        F.col("abstract").alias("abstract"),
    )
    return (
        linked.groupBy("work_key").agg(F.min(win).alias("w"))
        .select(
            F.col("work_key").alias("id"),
            F.col("w.o3").alias("title"),
            F.col("w.o2").alias("norm_title"),
            F.col("w.publication_year").alias("publication_year"),
            F.col("w.type").alias("type"),
            camel_label_expr(F.col("w.type")).alias("type_label"),
            F.col("w.doi").alias("doi"),
            F.col("w.abstract").alias("abstract"),
        )
    )


def author_nodes(linked: DataFrame) -> DataFrame:
    # group by the COMPUTED id, not the raw orcid: two raw values that
    # normalize to one id (' X'/'X') must yield ONE node row — the
    # unique-id constraint (D1) every node table guarantees, and the
    # invariant that lets build_triples skip a global dedup.
    a = linked.select(F.explode("authors").alias("a")).select(
        F.trim(F.col("a.orcid")).alias("orcid"),
        F.col("a.display_name").alias("display_name"),
    ).filter(F.col("orcid").isNotNull() & (F.col("orcid") != ""))
    return a.groupBy(
        F.concat(F.lit("orcid:"), F.col("orcid")).alias("id")
    ).agg(
        F.min("display_name").alias("display_name"),
        F.min("orcid").alias("orcid"),
    )


def institution_nodes(linked: DataFrame) -> DataFrame:
    i = linked.select(F.explode("institutions").alias("i")).select(
        F.col("i.ror").alias("ror"),
        F.col("i.display_name").alias("display_name"),
        F.col("i.country_code").alias("country_code"),
    ).filter(F.col("ror").isNotNull() & (F.trim("ror") != ""))
    # id-keyed dedup (D1): distinct ror spellings sharing a ror tail
    # ('https://ror.org/x' vs 'ror.org/x') collapse to one node
    return i.groupBy(
        F.concat(
            F.lit("ror:"), F.element_at(F.split(F.trim("ror"), "/"), -1)
        ).alias("id")
    ).agg(
        F.min("display_name").alias("display_name"),
        F.min("country_code").alias("country_code"),
        F.min("ror").alias("ror"),
    )


def source_nodes(linked: DataFrame) -> DataFrame:
    s = linked.filter(
        F.col("issn").isNotNull() & (F.trim("issn") != "")
    ).select(F.trim("issn").alias("issn"), F.col("venue"))
    return s.groupBy("issn").agg(F.min("venue").alias("display_name")).select(
        F.concat(F.lit("issn:"), F.col("issn")).alias("id"),
        "display_name", "issn",
    )


def _named_nodes(linked: DataFrame, array_col: str, prefix: str) -> DataFrame:
    n = linked.select(F.explode(array_col).alias("name")).filter(
        F.col("name").isNotNull() & (F.trim("name") != "")
    )
    # dedup on the slug ID, not the display string: 'Deep  Learning'
    # and 'deep learning' share a slug and must be ONE node (D1)
    return n.groupBy(
        F.concat(F.lit(prefix + ":"),
                 _slug_expr(F.trim("name"))).alias("id")
    ).agg(F.min(F.trim("name")).alias("display_name"))


def publisher_nodes(linked: DataFrame) -> DataFrame:
    p = linked.filter(
        F.col("publisher").isNotNull() & (F.trim("publisher") != "")
    ).select(F.trim("publisher").alias("display_name"))
    return p.groupBy(
        F.concat(F.lit("publisher:"), _slug_expr("display_name")).alias("id")
    ).agg(F.min("display_name").alias("display_name"))


def build_edges(linked: DataFrame, works: DataFrame) -> DataFrame:
    """All 7 edge types (SURVEY §1.1 — code directions, not README's):
    explode (J3 importer.py:238-247), cross-product quirk
    (J4 :253-273), pair dedup (A3 :266-271), CITES endpoint existence
    semi-join (F2 :293).

    Shuffle-byte discipline (the assembly dedup is the widest shuffle
    in the phase): edge types are pred-disjoint, so the A3 pair dedup
    runs PER BRANCH on (subj, obj) only, with the constant ``pred``
    attached above the exchange — the dedup shuffle moves two strings
    per row, not three (the 10-15-byte pred string times every edge
    was pure contention tax at 4N cores), and the 7 small exchanges
    AQE-coalesce independently. The union of per-branch dedups equals
    the old global dropDuplicates(subj, pred, obj) exactly, because no
    (subj, obj) pair can appear under two preds in one branch."""
    author_key = F.concat(F.lit("orcid:"), F.trim(F.col("a.orcid")))
    inst_key = F.concat(
        F.lit("ror:"), F.element_at(F.split(F.trim(F.col("i.ror")), "/"), -1)
    )
    issn_key = F.concat(F.lit("issn:"), F.trim(F.col("issn")))

    def tag(branch: DataFrame, pred: str) -> DataFrame:
        # pair dedup below, constant pred above the exchange
        return branch.dropDuplicates(["subj", "obj"]).select(
            "subj", F.lit(pred).alias("pred"), "obj")

    authored = tag(
        linked.select("work_key", F.explode("authors").alias("a"))
        .filter(F.col("a.orcid").isNotNull() & (F.trim(F.col("a.orcid")) != ""))
        .select(author_key.alias("subj"), F.col("work_key").alias("obj")),
        "AUTHORED",
    )
    affiliated = tag(
        linked.select("work_key", F.explode("authors").alias("a"), "institutions")
        .filter(F.col("a.orcid").isNotNull() & (F.trim(F.col("a.orcid")) != ""))
        .select(author_key.alias("subj"), F.explode("institutions").alias("i"))
        .filter(F.col("i.ror").isNotNull() & (F.trim(F.col("i.ror")) != ""))
        .select("subj", inst_key.alias("obj")),
        "AFFILIATED_WITH",
    )
    published_in = tag(
        linked.filter(F.col("issn").isNotNull() & (F.trim("issn") != ""))
        .select(F.col("work_key").alias("subj"), issn_key.alias("obj")),
        "PUBLISHED_IN",
    )
    cites_raw = (
        linked.select("work_key", F.explode("referenced_dois").alias("ref"))
        .filter(F.col("ref").isNotNull() & (F.trim("ref") != ""))
        .select(
            F.col("work_key").alias("subj"),
            F.concat(F.lit("doi:"), F.lower(F.trim("ref"))).alias("obj"),
        )
        .filter(F.col("subj") != F.col("obj"))
    )
    # closed-world endpoint existence (importer.py:293): cited work
    # must exist as a node
    cites = tag(
        cites_raw.join(works.select(F.col("id").alias("obj")),
                       "obj", "left_semi"),
        "CITES",
    )
    has_topic = tag(
        linked.select("work_key", F.explode("topics").alias("t"))
        .filter(F.col("t").isNotNull() & (F.trim("t") != ""))
        .select(F.col("work_key").alias("subj"),
                F.concat(F.lit("topic:"), _slug_expr(F.trim("t"))).alias("obj")),
        "HAS_TOPIC",
    )
    funded_by = tag(
        linked.select("work_key", F.explode("funders").alias("f"))
        .filter(F.col("f").isNotNull() & (F.trim("f") != ""))
        .select(F.col("work_key").alias("subj"),
                F.concat(F.lit("funder:"), _slug_expr(F.trim("f"))).alias("obj")),
        "FUNDED_BY",
    )
    published_by = tag(
        linked.filter(
            F.col("issn").isNotNull() & (F.trim("issn") != "")
            & F.col("publisher").isNotNull() & (F.trim("publisher") != "")
        )
        .select(issn_key.alias("subj"),
                F.concat(F.lit("publisher:"),
                         _slug_expr(F.trim("publisher"))).alias("obj")),
        "PUBLISHED_BY",
    )
    return (
        authored.unionByName(affiliated).unionByName(published_in)
        .unionByName(cites).unionByName(has_topic).unionByName(funded_by)
        .unionByName(published_by)
    )


def enrich_node_counts(nodes: dict[str, DataFrame], edges: DataFrame,
                       linked: DataFrame | None = None
                       ) -> dict[str, DataFrame]:
    """Derived count properties (round-1 verdict item 5; reference
    dataclasses persist them — models.py:168-175, 203-211, 241-250,
    317-323, and the README's most-cited queries want them,
    README.md:288-340):

    - Work.cited_by_count    = CITES in-degree
    - Author.works_count     = AUTHORED out-degree
    - Author.cited_by_count  = sum of authored works' cited_by_count
    - Institution.works_count = distinct works mentioning the
      institution (from linked mentions — the AFFILIATED_WITH edge
      carries authors, not works)
    - Source.works_count     = PUBLISHED_IN in-degree
    - Publisher.works_count  = distinct works across its sources

    Each is one groupBy over an edge slice (map-side partial agg,
    fixed-width keys) followed by a left join back to the (much
    smaller) node table — broadcast-friendly at any scale.

    ``linked=None`` (the cumulative-import refresh path,
    materialize.merge_graph): every count above is re-derivable from
    the merged EDGE tables except Institution.works_count, which
    counts distinct works per institution from the linked mentions —
    a corpus-history fact the warehouse does not retain. With no
    ``linked``, the Institution table passes through unchanged (the
    caller keeps its last-wins merged value; documented boundary)."""
    cites_in = (
        edges.filter(F.col("pred") == "CITES")
        .groupBy(F.col("obj").alias("id"))
        .agg(F.count("*").alias("_cited"))
    )
    work = nodes["Work"].join(cites_in, "id", "left").withColumn(
        "cited_by_count", F.coalesce(F.col("_cited"), F.lit(0))
    ).drop("_cited")
    # Checkpoint the enriched Work HERE, before a_cited captures it:
    # the Author citation rollup below joins against this plan, and a
    # checkpoint applied by the caller after the fact cannot rewrite
    # the plan a_cited already embedded — the CITES in-degree
    # aggregation would re-run once per downstream consumer (event-log
    # evidence: the edge scan appeared 5x when the enriched tables
    # fanned out unmaterialized).
    work = ckpt(work)

    authored = edges.filter(F.col("pred") == "AUTHORED").select(
        F.col("subj").alias("author_id"), F.col("obj").alias("work_id"))
    a_works = authored.groupBy(F.col("author_id").alias("id")).agg(
        F.count("*").alias("works_count"))
    a_cited = (
        authored.join(
            work.select(F.col("id").alias("work_id"), "cited_by_count"),
            "work_id", "left")
        .groupBy(F.col("author_id").alias("id"))
        .agg(F.sum(F.coalesce(F.col("cited_by_count"), F.lit(0)))
             .alias("cited_by_count"))
    )
    author = (
        nodes["Author"].join(a_works, "id", "left").join(a_cited, "id", "left")
        .withColumn("works_count", F.coalesce("works_count", F.lit(0)))
        .withColumn("cited_by_count",
                    F.coalesce("cited_by_count", F.lit(0)))
    )

    if linked is not None:
        inst_key = F.concat(
            F.lit("ror:"),
            F.element_at(F.split(F.trim(F.col("i.ror")), "/"), -1))
        inst_works = (
            linked.select("work_key", F.explode("institutions").alias("i"))
            .filter(F.col("i.ror").isNotNull() & (F.trim(F.col("i.ror")) != ""))
            .select("work_key", inst_key.alias("id"))
            .distinct()
            .groupBy("id").agg(F.count("*").alias("works_count"))
        )
        institution = nodes["Institution"].join(
            inst_works, "id", "left").withColumn(
            "works_count", F.coalesce("works_count", F.lit(0)))
    else:
        institution = nodes["Institution"]

    pub_in = edges.filter(F.col("pred") == "PUBLISHED_IN").select(
        F.col("subj").alias("work_id"), F.col("obj").alias("source_id"))
    s_works = pub_in.groupBy(F.col("source_id").alias("id")).agg(
        F.count("*").alias("works_count"))
    source = nodes["Source"].join(s_works, "id", "left").withColumn(
        "works_count", F.coalesce("works_count", F.lit(0)))

    pub_by = edges.filter(F.col("pred") == "PUBLISHED_BY").select(
        F.col("subj").alias("source_id"), F.col("obj").alias("publisher_id"))
    p_works = (
        pub_in.join(pub_by, "source_id")
        .select("work_id", "publisher_id").distinct()
        .groupBy(F.col("publisher_id").alias("id"))
        .agg(F.count("*").alias("works_count"))
    )
    publisher = nodes["Publisher"].join(p_works, "id", "left").withColumn(
        "works_count", F.coalesce("works_count", F.lit(0)))

    out = dict(nodes)
    out.update({"Work": work, "Author": author, "Institution": institution,
                "Source": source, "Publisher": publisher})
    return out


def _prop_triples(df: DataFrame, props: list[str],
                  label: str) -> DataFrame:
    """(subj, pred, obj) rows for the label triple + every non-null
    property, in ONE scan of the node table: explode of a literal
    (pred, obj) struct array. A filter-branch-per-property union would
    make Spark re-execute the node-table subtree (window dedup, count
    joins) once per property — O(props) recomputes of the build DAG.

    Built as batched SQL strings: the per-property struct Columns cost
    ~0.4s of py4j round trips per build across the 7 labels (round-6
    construction audit) — pure driver time the bench counts. Label and
    property names are code-controlled identifiers (prop_map below),
    never user input."""
    items = [f"struct('label' AS pred, '{label}' AS obj)"] + [
        f"struct('{p}' AS pred, CAST(`{p}` AS STRING) AS obj)"
        for p in props
    ]
    return (
        df.selectExpr("id AS subj",
                      f"explode(array({', '.join(items)})) AS kv")
        .selectExpr("subj", "kv.pred AS pred", "kv.obj AS obj")
        .filter("obj IS NOT NULL")
    )


def build_triples(nodes: dict[str, DataFrame], edges: DataFrame) -> DataFrame:
    """triples = edges ∪ node-property triples ∪ (id, label, <Type>);
    one scan per node table (see _prop_triples)."""
    prop_map = {
        "Work": ["title", "publication_year", "type", "type_label",
                 "cited_by_count"],
        "Author": ["display_name", "works_count", "cited_by_count"],
        "Institution": ["display_name", "country_code", "works_count"],
        "Source": ["display_name", "works_count"],
        "Topic": ["display_name"],
        "Funder": ["display_name"],
        "Publisher": ["display_name", "works_count"],
    }
    parts = [edges]
    for label, df in nodes.items():
        # derived-count props appear only on enriched node tables
        parts.append(_prop_triples(
            df, [p for p in prop_map[label] if p in df.columns], label))
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    # The union is duplicate-free BY CONSTRUCTION, so no global
    # dropDuplicates — at web scale that dedup was the single widest
    # shuffle in the pipeline (every triple's (subj,pred,obj) strings
    # re-hashed and moved once more). Invariant: (a) edges are
    # pair-deduped in build_edges; (b) every node table is unique on
    # its computed id (each is a groupBy/window on that id), so
    # _prop_triples emits each (id, pred) at most once; (c) node-id
    # namespaces are prefix-disjoint (doi:/title:/orcid:/ror:/issn:/
    # topic:/funder:/publisher:) and property preds (label, title,
    # display_name, ...) are disjoint from the 7 uppercase edge types
    # — so no triple can appear in two union branches.
    return out


def build_graph(pages: DataFrame, skip_abstracts: bool = False,
                generate_embeddings: bool = False,
                embedding_model: str | None = None) -> GraphTables:
    # mentions: row-block checkpoint — only 2 consumers (a 3-column
    # aggregation + the final full-row join), and a parquet encode of
    # the text-heavy mention rows costs more JVM CPU + row-group GC
    # than both consumers save (measured: extract stage 46s -> 105s
    # when staged). The LINKED table is the opposite case: it fans out
    # to 7 node builders + edges, each needing a different column
    # slice, so it goes through stage_parquet below and every consumer
    # column-prunes its scan (a single assembly stage read 6.8GB of
    # row blocks for plans that needed ~1GB of columns).
    mentions = ckpt(mentions_from_pages(pages), eager=False)
    linked = link_mentions(mentions)
    if skip_abstracts:
        # P10 (importer.py:73-77): drop abstracts behind a config flag
        linked = linked.withColumn("abstract", F.lit(None).cast("string"))
    return build_graph_from_linked(stage_parquet(linked, "linked"),
                                   generate_embeddings=generate_embeddings,
                                   embedding_model=embedding_model)


def build_graph_from_linked(linked: DataFrame,
                            generate_embeddings: bool = False,
                            embedding_model: str | None = None) -> GraphTables:
    nodes = {
        "Work": work_nodes(linked),
        "Author": author_nodes(linked),
        "Institution": institution_nodes(linked),
        "Source": source_nodes(linked),
        "Topic": _named_nodes(linked, "topics", "topic"),
        "Funder": _named_nodes(linked, "funders", "funder"),
        "Publisher": publisher_nodes(linked),
    }
    if generate_embeddings:
        # optional embedding step (M4, importer.py:79-81, 350-374):
        # the driver-side loop becomes a vectorized column application;
        # materialized once on the node table, reused by search
        from openalex_neo4j_spark.search import (embed_text_column,
                                                 work_embedding_text)
        # embedding_model=None -> deterministic hash featurizer;
        # 'all-MiniLM-L6-v2' -> real sentence-transformers per worker
        # (M1 parity, reference embeddings.py:26)
        nodes["Work"] = embed_text_column(
            work_embedding_text(nodes["Work"]), "_embed_text",
            model_name=embedding_model,
        ).drop("_embed_text")
    # materialization barriers: edges and the enriched node tables are
    # each consumed by several downstream plans (count enrichment,
    # property triples, writes, search). Without the checkpoint, each
    # consumer re-executes the full upstream DAG — including the
    # work_nodes window dedup over all mentions — once per use (the
    # column-pruned subtrees differ per consumer, so Catalyst's
    # ReuseExchange cannot dedupe them). Node/edge tables are tiny
    # relative to the mention corpus, so the barrier cost is O(output).
    #
    # Work is checkpointed FIRST: the CITES endpoint semi-join, its own
    # count enrichment, and the Author citation rollup all reference it
    # — unmaterialized, the mention-table window dedup would execute
    # 3-4x. The 7 enriched checkpoints are mutually independent, so
    # they are submitted concurrently (a sequential loop serializes 7
    # driver-blocking actions of fixed scheduler latency each — pure
    # Amdahl in the N-vs-4N scaling bench; the scheduler interleaves
    # the concurrent jobs across whatever cores exist).
    nodes["Work"] = ckpt(nodes["Work"], eager=False)
    # edges: COLUMNAR stage partitioned by pred, not row-block ckpt —
    # the table is re-read by 5+ consumers (four enrichment slices,
    # the triples union, writes), each needing one pred slice and 1-2
    # of the 3 columns. Row blocks forced every consumer through full
    # rows of the whole table; the pred-partitioned parquet gives
    # partition pruning + column pruning + dictionary compression of
    # the heavily repeated id strings. Branches carry constant preds,
    # so each writer task lands in exactly one partition dir — the
    # partitioned write adds no shuffle.
    edges = stage_parquet(build_edges(linked, nodes["Work"]), "edges",
                          partition_by=["pred"]).select(
        "subj", "pred", "obj")
    # enrich_node_counts checkpoints the enriched Work table eagerly
    # BEFORE the Author rollup references it — a checkpoint applied by
    # this caller after the fact cannot rewrite the plan the rollup
    # already captured, so the CITES in-degree aggregation would
    # re-run once per downstream consumer (event-log evidence: the
    # edge scan appeared 5x when the enriched tables fanned out
    # unmaterialized). The remaining six enriched tables are mutually
    # independent: lazy ckpt (truncates the plan immediately, submits
    # no job), materialized concurrently by the triples job's union
    # branches.
    nodes = enrich_node_counts(nodes, edges, linked)
    for label in nodes:
        if label != "Work":
            nodes[label] = ckpt(nodes[label], eager=False)
    triples = build_triples(nodes, edges)
    return GraphTables(nodes=nodes, edges=edges, triples=triples,
                       mentions=linked)
