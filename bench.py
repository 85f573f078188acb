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

    # min-of-N interleaved passes (round-3 verdict item 3): this host
    # is an overcommitted hypervisor where a single storm reads as a
    # 60% "regression" on unchanged code; interleaving whole suite
    # passes and taking per-query minima bounds that noise the same way
    # scripts/scaling_bench.py does. Spread (max/min per query) is
    # reported so a stormy run is visible instead of silently absorbed.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    n_works, filler = kg_scale_for(sf_dir)
    pages_path = ensure_pages_parquet(spark, n_works, filler,
                                      num_partitions=cpus)

    samples: dict[str, list[float]] = {}
    kg_triples = 0
    for _ in range(repeats):
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.setdefault(name, []).append(time.time() - t0)
        # KG pipeline: timed from parquet read (corpus gen untimed)
        t0 = time.time()
        pages = spark.read.parquet(pages_path)
        g = build_graph(pages)
        kg_triples = g.triples.count()
        samples.setdefault("kg_build", []).append(time.time() - t0)

    queries = {n: round(min(ts), 3) for n, ts in samples.items()}
    # spread over passes >= 2: pass 1 carries JIT/codegen/page-cache
    # warmup, which would drown the host-storm signal spread exists to
    # expose. The min still considers every pass.
    spread = {
        n: round(max(ts[1:] or ts) / min(ts[1:] or ts), 2)
        for n, ts in samples.items()
    }
    total = sum(queries.values())
    kg_dt = queries["kg_build"]

    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else 0.001)
    print(json.dumps({
        "metric": "headline suite wall (relational+training ops + KG build)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "spread_max_over_min": spread,
        "repeats": repeats,
        "sf": sf,
        "cpus": cpus,
        "kg_pages": n_works,
        "kg_triples": kg_triples,
        "kg_triples_per_sec": round(kg_triples / kg_dt, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
