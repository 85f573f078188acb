#!/usr/bin/env python
"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], printing ONE JSON line.

Headline suite = the heavy driver-contract queries + the full KG
pipeline (pages -> extract -> link -> canonicalize -> triples). The KG
pages corpus is generated deterministically (seed 42), cached as
parquet (untimed), and timed from the parquet read — the production
shape.

Extra JSON fields beyond the contract: kg_triples, kg_triples_per_sec
(the BASELINE.json primary metric).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q_group_cross_product",
    "q_cosupplier_pairs",
    "q_token_explode",
    "q_minhash_sigs",
    "q_simhash",
    "q_ngram_jaccard",
    "q_embedding_topk",
    "q_rrf_fusion",
    "q_events_hourly",
    "q_user_event_seq",
]


def kg_scale_for(sf_dir: str) -> tuple[int, int]:
    """(n_works, filler_words) matched to the testdata ladder."""
    if "sf0.1" in sf_dir:
        return 20000, 400
    if "sf0.01" in sf_dir:
        return 2000, 400
    return 200, 0


def ensure_pages_parquet(spark, n_works: int, filler: int, seed: int = 42,
                         num_partitions: int = 32) -> str:
    path = f"/tmp/spark_graft_pages_w{n_works}_f{filler}_s{seed}"
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from openalex_neo4j_spark.corpus import build_world, write_pages_parquet

        world = build_world(n_works, seed=seed, filler_words=filler)
        write_pages_parquet(world, path)
    return path


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from openalex_neo4j_spark.driver_contract import QUERIES
    from openalex_neo4j_spark.pipeline import build_graph
    from openalex_neo4j_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        dt = time.time() - t0
        queries[name] = round(dt, 3)
        total += dt

    # KG pipeline: timed from parquet read (corpus gen/cache untimed)
    n_works, filler = kg_scale_for(sf_dir)
    pages_path = ensure_pages_parquet(spark, n_works, filler,
                                      num_partitions=cpus)
    t0 = time.time()
    pages = spark.read.parquet(pages_path)
    g = build_graph(pages)
    kg_triples = g.triples.count()
    kg_dt = time.time() - t0
    queries["kg_build"] = round(kg_dt, 3)
    total += kg_dt

    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else 0.001)
    print(json.dumps({
        "metric": "headline suite wall (relational+training ops + KG build)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "kg_pages": n_works,
        "kg_triples": kg_triples,
        "kg_triples_per_sec": round(kg_triples / kg_dt, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
