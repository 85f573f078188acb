"""Resume semantics: a killed run must not recompute completed
partitions, and the resumed output must equal a fresh run's output
(north rule; SURVEY §5 resume test)."""

import shutil

import pytest
from pyspark.sql import functions as F

from openalex_neo4j_spark.corpus import build_world, pages_dataframe
from openalex_neo4j_spark.lineage import (
    build_graph_resumable,
    completed_partitions,
    read_lineage,
    resumable_extract,
)
from openalex_neo4j_spark.oracle import oracle_triples, precision_recall


@pytest.fixture(scope="module")
def pages(spark):
    world = build_world(80, seed=42)
    return pages_dataframe(spark, world), world


def test_killed_extract_resumes_without_recompute(spark, pages, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("resume"))
    pages_df, _ = pages

    # simulate a kill: only 1 chunk (4 of 16 buckets) commits
    resumable_extract(spark, pages_df, root, run_id="run1",
                      num_buckets=16, chunk_size=4, max_chunks=1)
    done1 = completed_partitions(spark, root, "extract")
    assert len(done1) == 4

    # resume: completes the remaining buckets under a new run id
    m = resumable_extract(spark, pages_df, root, run_id="run2",
                          num_buckets=16, chunk_size=4)
    done2 = completed_partitions(spark, root, "extract")
    assert done2 == set(range(16))

    lin = read_lineage(spark, root).filter(F.col("stage") == "extract")
    by_run = {r["run_id"]: r["cnt"] for r in
              lin.groupBy("run_id").agg(F.count("*").alias("cnt")).collect()}
    # run2 only processed the 12 buckets run1 didn't commit
    assert by_run == {"run1": 4, "run2": 12}
    # no bucket recorded twice
    assert lin.count() == lin.select("partition_id").distinct().count()

    # the resumed mention set equals a direct extraction
    from openalex_neo4j_spark.extract import mentions_from_pages
    direct = {r["url"] for r in
              mentions_from_pages(pages_df).select("url").collect()}
    resumed = {r["url"] for r in m.select("url").collect()}
    assert resumed == direct


def test_extract_chunk_scans_pages_once(spark, pages, tmp_path_factory):
    """Per chunk, the html-bearing pages input is evaluated exactly
    once (the extraction write) — pinned with an accumulator-counting
    identity mapInPandas wrapped around the input: a second pass (the
    old pre-count) would double the row tally."""
    root = str(tmp_path_factory.mktemp("resume_scan"))
    pages_df, _ = pages
    n_pages = pages_df.count()

    acc = spark.sparkContext.accumulator(0)

    def probe(batches):
        for b in batches:
            acc.add(len(b))
            yield b

    probed = pages_df.mapInPandas(probe, schema=pages_df.schema)
    # one chunk covering every bucket -> exactly one full pass expected
    resumable_extract(spark, probed, root, run_id="probe",
                      num_buckets=4, chunk_size=4, max_chunks=1)
    assert acc.value == n_pages, (
        f"pages evaluated {acc.value} row-passes for {n_pages} rows — "
        "the extract chunk must read its input exactly once")


def test_full_resumable_pipeline_matches_oracle(spark, pages, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("resume_full"))
    pages_df, world = pages
    tables = build_graph_resumable(spark, pages_df, root,
                                   num_buckets=8, chunk_size=8)
    pred = {(r["subj"], r["pred"], r["obj"])
            for r in tables["triples"].collect()}
    p, r = precision_recall(pred, oracle_triples(world))
    assert p >= 0.95 and r >= 0.95

    # lineage covers every stage
    stages = {r["stage"] for r in tables["lineage"].select("stage").collect()}
    assert {"extract", "link", "edges", "triples"} <= stages

    # idempotent re-run: everything skipped, same triples
    tables2 = build_graph_resumable(spark, pages_df, root,
                                    num_buckets=8, chunk_size=8)
    pred2 = {(r["subj"], r["pred"], r["obj"])
             for r in tables2["triples"].collect()}
    assert pred2 == pred
    # no new lineage rows for completed stages
    lin2 = tables2["lineage"].filter(F.col("stage") == "triples")
    assert lin2.count() == 1


def test_file_granular_chunk_reads_only_its_files(spark, pages,
                                                  tmp_path_factory):
    """File-backed input: each chunk's extraction job must read ONLY
    that chunk's files (round-2 verdict item 3 — the old hash(url)
    filter re-scanned the whole corpus once per chunk). Pinned with the
    same accumulator probe riding inside the extraction UDF input via
    row counting: one chunk over 1/4 of the buckets must evaluate ~1/4
    of the rows, not all of them."""
    from openalex_neo4j_spark.lineage import bucket_files

    root = str(tmp_path_factory.mktemp("resume_files"))
    pages_df, _ = pages
    src = str(tmp_path_factory.mktemp("pages_src"))
    # 8 physical files
    pages_df.repartition(8).write.mode("overwrite").parquet(src)
    stored = spark.read.parquet(src)
    files = sorted(stored.inputFiles())
    assert len(files) == 8
    n_total = stored.count()

    # chunk 1 of 4: buckets {0,1} -> exactly files[0], files[1],
    # files[4+...]: round-robin i % 8 over 8 buckets = 1 file per bucket
    resumable_extract(spark, stored, root, run_id="fg1",
                      num_buckets=8, chunk_size=2, max_chunks=1)
    done = completed_partitions(spark, root, "extract")
    assert done == {0, 1}

    # the committed mentions cover exactly the pages of the 2 files
    from openalex_neo4j_spark.extract import mentions_from_pages
    by_bucket = bucket_files(files, 8)
    chunk_files = by_bucket[0] + by_bucket[1]
    expect_urls = {
        r["url"] for r in mentions_from_pages(
            spark.read.parquet(*chunk_files)).select("url").collect()}
    got = spark.read.parquet(f"{root}/mentions")
    got_urls = {r["url"] for r in got.select("url").distinct().collect()}
    assert got_urls == expect_urls
    assert 0 < len(expect_urls) < n_total

    # resume completes; union equals a full direct extraction
    m = resumable_extract(spark, stored, root, run_id="fg2",
                          num_buckets=8, chunk_size=2)
    direct = {r["url"] for r in
              mentions_from_pages(stored).select("url").collect()}
    resumed = {r["url"] for r in m.select("url").collect()}
    assert resumed == direct


def test_transformed_input_keeps_its_transformations(spark, pages,
                                                     tmp_path_factory):
    """A FILTERED file-backed frame must NOT take the file-granular
    path: inputFiles() still reports the raw files, and re-reading them
    would silently discard the filter (round-3 advice, high). Pinned:
    extraction over stored.filter(...) must only emit mentions from
    rows passing the filter."""
    root = str(tmp_path_factory.mktemp("resume_xform"))
    pages_df, _ = pages
    src = str(tmp_path_factory.mktemp("pages_src_xform"))
    pages_df.repartition(4).write.mode("overwrite").parquet(src)
    stored = spark.read.parquet(src)

    urls = sorted(r["url"] for r in stored.select("url").collect())
    keep = set(urls[: len(urls) // 2])
    filtered = stored.filter(F.col("url").isin(list(keep)))
    assert filtered.inputFiles()  # the trap: files still visible

    m = resumable_extract(spark, filtered, root, run_id="xf",
                          num_buckets=4, chunk_size=4)
    got_urls = {r["url"] for r in m.select("url").distinct().collect()}
    assert got_urls <= keep, (
        "mentions extracted from filtered-out pages — the file-granular "
        "path discarded the caller's filter")

    from openalex_neo4j_spark.extract import mentions_from_pages
    expect = {r["url"] for r in
              mentions_from_pages(filtered).select("url").collect()}
    assert got_urls == expect


def test_resume_refuses_scheme_mismatch(spark, pages, tmp_path_factory):
    """Lineage bucket ids are only meaningful under the bucketing
    scheme that produced them: a hash-bucket run resumed as a
    file-round-robin run (or a changed file set) must refuse, not
    silently drop/duplicate pages (round-3 advice, medium)."""
    root = str(tmp_path_factory.mktemp("resume_scheme"))
    pages_df, _ = pages

    # partial run under the hash scheme (in-memory frame)
    resumable_extract(spark, pages_df, root, run_id="s1",
                      num_buckets=8, chunk_size=2, max_chunks=1)
    assert len(completed_partitions(spark, root, "extract")) == 2

    # same scheme resumes fine
    resumable_extract(spark, pages_df, root, run_id="s2",
                      num_buckets=8, chunk_size=2, max_chunks=1)
    assert len(completed_partitions(spark, root, "extract")) == 4

    # file-backed input = different scheme -> refuse
    src = str(tmp_path_factory.mktemp("pages_src_scheme"))
    pages_df.repartition(4).write.mode("overwrite").parquet(src)
    stored = spark.read.parquet(src)
    # the refusal must carry the one-line remedy (delete lineage root
    # or use a fresh one), not just the diagnosis
    with pytest.raises(ValueError, match=r"Remedy: .*rm -rf"):
        resumable_extract(spark, stored, root, run_id="s3",
                          num_buckets=8, chunk_size=2)

    # different num_buckets under the same scheme -> refuse too
    with pytest.raises(ValueError, match="scheme"):
        resumable_extract(spark, pages_df, root, run_id="s4",
                          num_buckets=16, chunk_size=2)


def test_file_granular_chunk_plan_scans_only_chunk_files(spark, pages,
                                                         tmp_path_factory):
    """Plan-level pin: a per-bucket scan built the way resumable_extract
    builds it reports exactly the bucket's files in inputFiles()."""
    from openalex_neo4j_spark.lineage import bucket_files

    pages_df, _ = pages
    src = str(tmp_path_factory.mktemp("pages_src_plan"))
    pages_df.repartition(6).write.mode("overwrite").parquet(src)
    stored = spark.read.parquet(src)
    files = sorted(stored.inputFiles())
    by_bucket = bucket_files(files, 3)
    bdf = spark.read.schema(stored.schema).parquet(*by_bucket[1])
    assert sorted(bdf.inputFiles()) == sorted(by_bucket[1])
    assert set(by_bucket[1]).isdisjoint(by_bucket[0])
