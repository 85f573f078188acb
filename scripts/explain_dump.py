#!/usr/bin/env python
"""Dump .explain('formatted') for named driver-contract queries to
plans/<tag>/<query>_<suffix>.txt (guide §1: capture the plan shape —
Exchange count, join strategy, PushedFilters — before and after each
optimization).

Usage: python scripts/explain_dump.py <tag> <suffix> [query ...]
  e.g. python scripts/explain_dump.py r06 before q_minhash_sigs
No queries -> the bench HEADLINE set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from openalex_neo4j_spark.driver_contract import QUERIES
    from openalex_neo4j_spark.plans import explain_str
    from openalex_neo4j_spark.session import get_spark

    spark = get_spark(app_name="explain_dump", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = explain_str(df, "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange -> {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
