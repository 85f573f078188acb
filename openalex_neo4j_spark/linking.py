"""Entity linking: MinHash/LSH-blocked candidates + broadcast alias
dictionary + TF-IDF cosine scoring + connected-components clustering.

Replaces the reference's identity mechanism — there, every entity
arrives with a global OpenAlex id and dedup is a dict insert
(importer.py:100-104) / Neo4j ``MERGE`` (neo4j_client.py:246-252).
Web-page mentions have no global id: DOI-bearing mentions are
authoritative ("canonical"), DOI-less mentions ("orphans") must be
linked by title similarity.

Pipeline (all DataFrame ops, one pandas-free path):

1. **Exact grouping** via a virtual title node: every mention gets an
   edge ``(url) -- (T:<norm_title>)``. Mentions sharing a normalized
   title join into one component without any pairwise blowup.
2. **Broadcast alias dictionary**: the (norm_title -> work_key) map of
   canonical mentions, broadcast; orphans that hit it exactly skip the
   expensive fuzzy stage (left_anti on the dict output).
3. **MinHash/LSH blocking** for the remaining orphans: word-3-shingles
   of the normalized title -> 16 md5-based min-hashes -> 8 bands of 2
   -> band-bucket self-join produces candidate pairs (orphan x any).
4. **TF-IDF cosine** over title tokens scores each candidate pair;
   pairs with cosine >= threshold and equal publication year (when
   both present) become fuzzy match edges.
5. **Connected components** (hash-to-min) over exact + fuzzy edges;
   each component becomes one Work cluster. Cluster id = min DOI key
   if the component contains a canonical mention, else
   ``title:<min norm_title>`` (the deterministic mint the oracle
   reproduces).

Scale notes: stages 3-4 only see orphans that failed the exact path
(a small fraction of mentions); the band join is hash-partitioned on
the band key; md5 is engine-stable (same values in SQL, Python,
DuckDB) making signatures reproducible across resume runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from openalex_neo4j_spark.operators.cc import connected_components

NUM_HASHES = 16
BAND_SIZE = 2
COSINE_THRESHOLD = 0.60


def _with_work_key(mentions: DataFrame) -> DataFrame:
    """Canonical key for DOI-bearing mentions: ``doi:<lowercased doi>``
    (id scheme in ids.py; analog of extract_openalex_id models.py:7-20)."""
    return mentions.withColumn(
        "work_key",
        F.when(
            F.col("doi").isNotNull() & (F.trim(F.col("doi")) != ""),
            F.concat(F.lit("doi:"), F.lower(F.trim(F.col("doi")))),
        ),
    )


def _title_tokens(df: DataFrame, id_col: str) -> DataFrame:
    """(id, tok, tf) token frequencies of the normalized title."""
    toks = df.select(
        F.col(id_col).alias("mid"),
        F.explode(F.split(F.col("norm_title"), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    return toks.groupBy("mid", "tok").agg(F.count("*").alias("tf"))


def _shingles_expr(col: str = "norm_title", k: int = 3):
    """Distinct word-k-shingles of a normalized title, pure SQL."""
    arr = F.split(F.col(col), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(arr) - (k - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(arr, i, k)),
        )
    )


def _minhash_bands(df: DataFrame, id_col: str = "mid") -> DataFrame:
    """(mid, band, band_key): md5-based MinHash signature banded for LSH."""
    sh = df.select(F.col(id_col).alias("mid"),
                   F.explode(_shingles_expr()).alias("shingle"))
    seeded = sh.select(
        "mid",
        "shingle",
        F.explode(F.sequence(F.lit(0), F.lit(NUM_HASHES - 1))).alias("seed"),
    ).withColumn(
        "h",
        F.conv(
            F.substring(F.md5(F.concat_ws("|", F.col("seed"), F.col("shingle"))), 1, 15),
            16, 10,
        ).cast("long"),
    )
    sig = seeded.groupBy("mid", "seed").agg(F.min("h").alias("minh"))
    return (
        sig.withColumn("band", (F.col("seed") / BAND_SIZE).cast("int"))
        .groupBy("mid", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seed", "minh"))),
                    lambda s: s["minh"].cast("string"),
                ),
                "-",
            ).alias("band_key")
        )
    )


def _tfidf_weights(all_titles: DataFrame) -> DataFrame:
    """(mid, tok, w, norm): L2-normalizable TF-IDF weights over title
    tokens; DF computed over the full mention set."""
    tf = _title_tokens(all_titles, "mid")
    n_docs = all_titles.count()
    df_tok = tf.groupBy("tok").agg(F.countDistinct("mid").alias("df"))
    w = (
        tf.join(df_tok, "tok")
        .withColumn(
            "w",
            F.col("tf")
            * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + F.lit(1.0)),
        )
        .select("mid", "tok", "w")
    )
    norms = w.groupBy("mid").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    return w.join(norms, "mid")


def link_mentions(mentions: DataFrame) -> DataFrame:
    """Assign every mention a cluster id.

    Input: the MENTION_SCHEMA DataFrame (url unique).
    Output: mentions + ``work_key`` (canonical cluster id, never null).
    """
    m = _with_work_key(mentions).localCheckpoint()

    canon = m.filter(F.col("work_key").isNotNull())
    orphans = m.filter(F.col("work_key").isNull())

    # (1) exact grouping via virtual title nodes — no pairwise blowup
    exact_edges = m.select(
        F.col("url").alias("src"),
        F.concat(F.lit("T:"), F.col("norm_title")).alias("dst"),
    )

    # (2) broadcast alias dictionary: orphans with an exact canonical
    # title hit are already linked by (1); exclude them from fuzzy.
    alias_dict = (
        canon.groupBy("norm_title").agg(F.min("work_key").alias("dict_key"))
    )
    fuzzy_orphans = orphans.join(
        F.broadcast(alias_dict), "norm_title", "left_anti"
    )

    # (3) LSH candidate pairs: fuzzy orphans vs all mentions
    fuzzy_cnt = fuzzy_orphans.count()
    if fuzzy_cnt > 0:
        orphan_bands = _minhash_bands(
            fuzzy_orphans.select(F.col("url").alias("mid"), "norm_title"), "mid"
        )
        all_bands = _minhash_bands(
            m.select(F.col("url").alias("mid"), "norm_title"), "mid"
        )
        cand = (
            orphan_bands.alias("o")
            .join(
                all_bands.alias("c"),
                (F.col("o.band") == F.col("c.band"))
                & (F.col("o.band_key") == F.col("c.band_key"))
                & (F.col("o.mid") != F.col("c.mid")),
            )
            .select(
                F.least(F.col("o.mid"), F.col("c.mid")).alias("ma"),
                F.greatest(F.col("o.mid"), F.col("c.mid")).alias("mb"),
            )
            .distinct()
        )
        # never fuse two canonical mentions: DOI identity is authoritative
        canon_ids = canon.select(F.col("url").alias("cid"))
        both_canon = cand.join(
            canon_ids.withColumnRenamed("cid", "ma"), "ma", "left_semi"
        ).join(canon_ids.withColumnRenamed("cid", "mb"), "mb", "left_semi")
        cand = cand.join(both_canon, ["ma", "mb"], "left_anti")

        # (4) TF-IDF cosine scoring
        weights = _tfidf_weights(m.select(F.col("url").alias("mid"), "norm_title"))
        wa = weights.select(
            F.col("mid").alias("ma"), "tok",
            F.col("w").alias("wa"), F.col("nrm").alias("na"),
        )
        wb = weights.select(
            F.col("mid").alias("mb"), "tok",
            F.col("w").alias("wb"), F.col("nrm").alias("nb"),
        )
        scored = (
            cand.join(wa, "ma")
            .join(wb, ["mb", "tok"])
            .groupBy("ma", "mb")
            .agg(
                (F.sum(F.col("wa") * F.col("wb"))
                 / (F.first("na") * F.first("nb"))).alias("cosine")
            )
        )
        years = m.select(F.col("url").alias("mid"), F.col("publication_year"))
        fuzzy_edges = (
            scored.filter(F.col("cosine") >= COSINE_THRESHOLD)
            .join(years.withColumnRenamed("mid", "ma")
                       .withColumnRenamed("publication_year", "ya"), "ma")
            .join(years.withColumnRenamed("mid", "mb")
                       .withColumnRenamed("publication_year", "yb"), "mb")
            .filter(
                F.col("ya").isNull() | F.col("yb").isNull()
                | (F.col("ya") == F.col("yb"))
            )
            .select(F.col("ma").alias("src"), F.col("mb").alias("dst"))
        )
        match_edges = exact_edges.unionByName(fuzzy_edges)
    else:
        match_edges = exact_edges

    # (5) connected components -> cluster ids
    comp = connected_components(match_edges)
    mention_comp = comp.filter(~F.col("node").startswith("T:")).select(
        F.col("node").alias("url"), "component"
    )

    linked = m.join(mention_comp, "url", "left")
    # cluster id: min canonical DOI key in the component, else minted title id
    cluster_key = (
        linked.groupBy("component")
        .agg(
            F.min("work_key").alias("doi_key"),
            F.min("norm_title").alias("min_norm"),
        )
        .withColumn(
            "cluster_id",
            F.coalesce(F.col("doi_key"), F.concat(F.lit("title:"), F.col("min_norm"))),
        )
        .select("component", "cluster_id")
    )
    out = (
        linked.join(cluster_key, "component", "left")
        .withColumn(
            "work_key",
            F.coalesce(
                F.col("work_key"),
                F.col("cluster_id"),
                F.concat(F.lit("title:"), F.col("norm_title")),
            ),
        )
        .drop("component", "cluster_id")
    )
    return out
