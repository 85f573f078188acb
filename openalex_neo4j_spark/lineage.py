"""Per-partition lineage + resumable stage execution (north rule).

Every stage writes lineage rows ``(stage, partition_id, input_rows,
output_rows, wall_ms, status, run_id)`` to ``<root>/lineage`` as it
commits output, so a killed run resumes without recomputing completed
partitions:

- the **extract** stage processes the input in ``num_buckets`` stable
  hash buckets (``pmod(hash(url), num_buckets)``), committing
  ``chunk_size`` buckets at a time via dynamic partition overwrite +
  a lineage append. Kill the run between chunk commits and the next
  run only processes the missing buckets.
- **link** / **materialize** are global stages (entity linking is a
  corpus-wide fixpoint) and resume at stage granularity: when their
  output and ``status=done`` lineage row exist, they're read back
  instead of recomputed.

This is the analog of the reference's idempotent ``MERGE`` re-import
(neo4j_client.py:246-252, tests/integration/test_neo4j_integration.py:
134-151) — re-running converges to the same graph — plus the explicit
bookkeeping the reference never needed because it ran single-process.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from openalex_neo4j_spark.schemas import LINEAGE_SCHEMA


def _lineage_path(root: str) -> str:
    return f"{root}/lineage"


def read_lineage(spark: SparkSession, root: str) -> DataFrame:
    try:
        return spark.read.parquet(_lineage_path(root))
    except Exception:
        return spark.createDataFrame([], LINEAGE_SCHEMA)


def append_lineage(spark: SparkSession, root: str, rows: list[tuple]) -> None:
    spark.createDataFrame(rows, LINEAGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(_lineage_path(root))


def completed_partitions(spark: SparkSession, root: str, stage: str) -> set[int]:
    lin = read_lineage(spark, root)
    return {
        r["partition_id"]
        for r in lin.filter(
            (F.col("stage") == stage) & (F.col("status") == "done")
        ).select("partition_id").collect()
    }


def stage_done(spark: SparkSession, root: str, stage: str) -> bool:
    return -1 in completed_partitions(spark, root, stage)


def _is_bare_file_scan(df: DataFrame) -> bool:
    """True iff ``df``'s analyzed plan is a single leaf relation (a
    plain ``spark.read.parquet(...)`` with no filter/project/join on
    top). The file-granular resume path re-reads ``df.inputFiles()``
    directly, which silently DISCARDS any transformation sitting above
    the scan — so it is only sound for a bare scan. ``inputFiles()``
    being non-empty is NOT sufficient: a filtered/joined frame still
    reports its underlying files."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        return plan.children().isEmpty()
    except Exception:
        return False


def _extract_scheme(files: list[str], num_buckets: int) -> dict:
    """Fingerprint of the bucketing scheme: which algorithm assigns
    pages to buckets, over exactly which file set. Bucket b holds
    different pages under different schemes/file sets, so lineage rows
    are only meaningful relative to this fingerprint."""
    if files:
        md5 = hashlib.md5("\n".join(sorted(files)).encode()).hexdigest()
        return {"scheme": "files", "files_md5": md5,
                "num_buckets": num_buckets}
    return {"scheme": "hash", "files_md5": None,
            "num_buckets": num_buckets}


def _check_extract_scheme(root: str, scheme: dict,
                          have_done_partitions: bool) -> None:
    """Refuse to resume when the recorded scheme doesn't match: a
    prior run's completed bucket ids reinterpreted under a different
    bucketing silently drops some pages and duplicates others."""
    os.makedirs(root, exist_ok=True)
    meta_path = os.path.join(root, "extract_scheme.json")
    if have_done_partitions:
        prev = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                prev = json.load(f)
        if prev != scheme:
            raise ValueError(
                "resumable_extract: recorded bucketing scheme "
                f"{prev} does not match current {scheme}; resuming "
                "would misassign pages to completed buckets. Remedy: "
                "restart from scratch by pointing at a fresh root, or "
                f"delete the lineage root (`rm -rf {root}`) to discard "
                "the partial run, or re-run with the original input "
                "frame/bucket count to resume it."
            )
    else:
        with open(meta_path, "w") as f:
            json.dump(scheme, f)


def bucket_files(files: list[str], num_buckets: int) -> dict[int, list[str]]:
    """Stable file->bucket assignment: sorted file list, round-robin.

    Deterministic across runs for an immutable input directory (the
    resume contract assumes the input does not change between the
    killed run and the resume — standard for batch ETL over an
    Iceberg/parquet snapshot)."""
    out: dict[int, list[str]] = {b: [] for b in range(num_buckets)}
    for i, f in enumerate(sorted(files)):
        out[i % num_buckets].append(f)
    return out


def resumable_extract(
    spark: SparkSession,
    pages: DataFrame,
    root: str,
    run_id: str | None = None,
    num_buckets: int = 32,
    chunk_size: int = 8,
    max_chunks: int | None = None,
) -> DataFrame:
    """Extract mentions bucket-by-bucket with per-partition lineage.

    **File-granular chunking**: when ``pages`` is backed by files
    (``pages.inputFiles()`` non-empty), buckets are assignments of
    whole input files (``bucket_files``) and each chunk's job reads
    ONLY its own files — a resume with k of n chunks done re-reads
    k/n-th of nothing, not the whole corpus. The previous
    ``pmod(hash(url), n).isin(chunk)`` filter was a computed predicate
    no row-group statistic can prune, so every chunk commit re-scanned
    every page row (url+html) and discarded ~(1 - chunk/n) of them —
    at 100 TB that multiplies the most expensive scan in the system by
    the number of chunks. For non-file-backed inputs (in-memory test
    frames) the hash-bucket filter remains as fallback.

    ``max_chunks`` limits how many chunk commits this call performs
    (used by tests to simulate a killed run). Returns the mentions
    table as currently materialized (possibly partial).
    """
    from openalex_neo4j_spark.extract import mentions_from_pages

    run_id = run_id or uuid.uuid4().hex[:12]
    out = f"{root}/mentions"
    done = completed_partitions(spark, root, "extract")
    todo = [b for b in range(num_buckets) if b not in done]

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # file-granular path ONLY for a bare file scan — a transformed
    # frame (filter/project/join above the scan) must fall back to the
    # hash-bucket filter, else the transformations are silently lost
    files = sorted(pages.inputFiles()) if _is_bare_file_scan(pages) else []
    _check_extract_scheme(root, _extract_scheme(files, num_buckets),
                          bool(done))
    by_bucket = bucket_files(files, num_buckets) if files else None
    schema = pages.schema

    chunks = [todo[i:i + chunk_size] for i in range(0, len(todo), chunk_size)]
    if max_chunks is not None:
        chunks = chunks[:max_chunks]
    for chunk in chunks:
        t0 = time.time()
        # exactly ONE pass over the html-bearing pages scan per chunk:
        # the extraction write. Bookkeeping counts come from the (much
        # narrower) mentions output read back with partition pruning;
        # input_rows stays null — counting it would re-scan pages.
        if by_bucket is not None:
            parts = []
            for b in chunk:
                if not by_bucket[b]:
                    continue
                # per-bucket scan over exactly that bucket's files;
                # the bucket id is a literal, not a computed column
                bdf = spark.read.schema(schema).parquet(*by_bucket[b])
                parts.append(
                    mentions_from_pages(bdf)
                    .withColumn("bucket", F.lit(b)))
            if parts:
                mentions = parts[0]
                for p in parts[1:]:
                    mentions = mentions.unionByName(p)
                mentions.write.mode("overwrite").partitionBy(
                    "bucket").parquet(out)
        else:
            bucket_col = F.pmod(F.hash(F.col("url")), F.lit(num_buckets))
            part = pages.filter(bucket_col.isin(chunk))
            mentions = mentions_from_pages(part).withColumn(
                "bucket", F.pmod(F.hash(F.col("url")), F.lit(num_buckets))
            )
            mentions.write.mode("overwrite").partitionBy("bucket").parquet(out)
        try:
            out_rows = spark.read.parquet(out).filter(
                F.col("bucket").isin(chunk)).count()
        except Exception:
            out_rows = 0  # chunk of entirely empty buckets, nothing written yet
        wall = int((time.time() - t0) * 1000)
        per_bucket_wall = wall // max(len(chunk), 1)
        append_lineage(spark, root, [
            ("extract", b, None, out_rows, per_bucket_wall, "done", run_id)
            for b in chunk
        ])
    try:
        return spark.read.parquet(out).drop("bucket")
    except Exception:
        from openalex_neo4j_spark.schemas import MENTION_SCHEMA
        return spark.createDataFrame([], MENTION_SCHEMA)


def resumable_stage(
    spark: SparkSession,
    root: str,
    stage: str,
    out_name: str,
    compute,  # () -> DataFrame
    run_id: str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Global (stage-granular) resumable step: skip when already done."""
    out = f"{root}/{out_name}"
    if stage_done(spark, root, stage):
        return spark.read.parquet(out)
    t0 = time.time()
    df = compute()
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(out)
    result = spark.read.parquet(out)
    n = result.count()
    append_lineage(spark, root, [
        (stage, -1, None, n, int((time.time() - t0) * 1000), "done", run_id)
    ])
    return result


def build_graph_resumable(
    spark: SparkSession,
    pages: DataFrame,
    root: str,
    num_buckets: int = 32,
    chunk_size: int = 8,
) -> dict[str, DataFrame]:
    """Full resumable pipeline; returns the materialized tables."""
    from openalex_neo4j_spark.linking import link_mentions
    from openalex_neo4j_spark.pipeline import (GraphTables, _named_nodes,
                                               author_nodes, build_edges,
                                               build_triples,
                                               enrich_node_counts,
                                               institution_nodes,
                                               publisher_nodes, source_nodes,
                                               work_nodes)

    run_id = uuid.uuid4().hex[:12]
    mentions = resumable_extract(spark, pages, root, run_id,
                                 num_buckets, chunk_size)
    linked = resumable_stage(
        spark, root, "link", "linked",
        lambda: link_mentions(mentions), run_id,
    )
    nodes = {
        "Work": work_nodes(linked), "Author": author_nodes(linked),
        "Institution": institution_nodes(linked),
        "Source": source_nodes(linked),
        "Topic": _named_nodes(linked, "topics", "topic"),
        "Funder": _named_nodes(linked, "funders", "funder"),
        "Publisher": publisher_nodes(linked),
    }
    # edges first (they only need the raw Work ids), then the node
    # tables enriched with edge-derived counts (works_count /
    # cited_by_count), then triples over the stored tables
    edges = resumable_stage(
        spark, root, "edges", "edges",
        lambda: build_edges(linked, nodes["Work"]), run_id,
        partition_by=["pred"],
    )
    nodes = enrich_node_counts(nodes, edges, linked)
    out: dict[str, DataFrame] = {}
    for label, df in nodes.items():
        out[f"nodes_{label.lower()}"] = resumable_stage(
            spark, root, f"nodes_{label.lower()}",
            f"nodes_{label.lower()}", lambda df=df: df, run_id,
        )
    node_map = {label: out[f"nodes_{label.lower()}"] for label in nodes}
    triples = resumable_stage(
        spark, root, "triples", "triples",
        lambda: build_triples(node_map, edges), run_id,
        partition_by=["pred"],
    )
    out["edges"] = edges
    out["triples"] = triples
    out["lineage"] = read_lineage(spark, root)
    return out
