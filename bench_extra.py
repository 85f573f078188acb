#!/usr/bin/env python
"""Extra benchmarks for the optimization round (bench.py is FROZEN for
measurement, so auxiliary timing lives here — guide §1.4).

Modes:
  python bench_extra.py noop  [query ...]   # noop-sink isolation: every
                                            # column of every row computed
  python bench_extra.py count [query ...]   # same action bench.py times
  python bench_extra.py calib               # pure-compute calibration
                                            # control (host-noise probe)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_REPEATS (default 3).
Prints one JSON line per run.
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


def calibration(spark) -> float:
    """Fixed pure-compute workload (no I/O, no data dependence): the
    ratio of this number across sessions separates host storms from
    code regressions (round-5 verdict 'What's wrong' #2)."""
    from pyspark.sql import functions as F

    t0 = time.time()
    df = spark.range(0, 20_000_000, 1, 32).select(
        F.sum(F.pmod(F.xxhash64(F.md5((F.col("id") % 1000003).cast("string"))),
                     F.lit(1_000_000_000))).alias("s"))
    df.collect()
    return time.time() - t0


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "noop"
    names = sys.argv[2:] or HEADLINE

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    from openalex_neo4j_spark.driver_contract import QUERIES
    from openalex_neo4j_spark.session import get_spark

    spark = get_spark(app_name=f"bench_extra_{mode}",
                      master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "calib":
        ts = [calibration(spark) for _ in range(max(repeats, 3))]
        print(json.dumps({"metric": "calibration", "unit": "sec",
                          "samples": [round(t, 3) for t in ts],
                          "min": round(min(ts), 3), "cpus": cpus}))
        return 0

    samples: dict[str, list[float]] = {}
    for _ in range(repeats):
        for name in names:
            df = QUERIES[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(f"{mode}:{name}")
            t0 = time.time()
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.setdefault(name, []).append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    calib = calibration(spark)
    out = {n: round(min(ts), 3) for n, ts in samples.items()}
    print(json.dumps({"metric": f"{mode}-sink per-query min of {repeats}",
                      "unit": "sec", "queries": out,
                      "value": round(sum(out.values()), 3),
                      "calibration": round(calib, 3),
                      "sf_dir": sf_dir, "cpus": cpus}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
