"""Iterative graph algorithms over the edge tables.

The reference's graph analytics happen in Neo4j/Cypher after import
(README.md:288-367); here the graph IS DataFrames, so iterative
algorithms are DataFrame loops with lineage control — the pattern CC
(operators/cc.py) already uses, generalized to weighted propagation.

:func:`citation_rank` — PageRank-style importance over CITES edges:
    r_{t+1}(v) = (1-d) + d * sum over citing works u of r_t(u)/out(u)
One shuffle per iteration (join on the edge key + sum-aggregate);
``session.iter_ckpt`` truncates lineage each round
(reliable ``checkpoint()`` when a checkpoint dir is configured;
``localCheckpoint`` in the single-JVM sandbox). Non-SQL-expressible
(iterative fixpoint) — exposed as a rows-only contract query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from openalex_neo4j_spark.session import iter_ckpt


def citation_rank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    pred: str = "CITES",
) -> DataFrame:
    """(id, rank) for every node in the ``pred`` subgraph.

    Ranks flow along citation direction: a work cited by many
    highly-ranked works ranks high (subj cites obj => rank mass moves
    subj -> obj).
    """
    cites = edges.filter(F.col("pred") == pred).select("subj", "obj")
    nodes = (
        cites.select(F.col("subj").alias("id"))
        .union(cites.select(F.col("obj").alias("id")))
        .distinct()
    )
    nodes = iter_ckpt(nodes)
    out_deg = cites.groupBy("subj").agg(F.count("*").alias("out_deg"))
    weighted = cites.join(out_deg, "subj").select(
        "subj", "obj", (F.lit(1.0) / F.col("out_deg")).alias("share")
    )
    weighted = iter_ckpt(weighted)

    ranks = iter_ckpt(nodes.withColumn("rank", F.lit(1.0)))
    for _ in range(iterations):
        contrib = (
            weighted.join(ranks.withColumnRenamed("id", "subj"), "subj")
            .groupBy(F.col("obj").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("share")).alias("in_mass"))
        )
        ranks = (
            nodes.join(contrib, "id", "left")
            .select(
                "id",
                (F.lit(1.0 - damping)
                 + F.lit(damping) * F.coalesce("in_mass", F.lit(0.0))
                 ).alias("rank"),
            )
        )
        ranks = iter_ckpt(ranks)
    return ranks
