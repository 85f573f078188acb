"""Snapshot-format scale ladder: merge cost must track groups
REWRITTEN (overlap), not table size.

Builds a clustered SnapshotTable with ``--groups`` range-clustered
data groups (one commit), then times merges whose update key spans
touch ~1, ~N/64, and ~N/8 groups. If merge were O(table), the three
walls would be flat at the full-rewrite cost; O(overlap) shows wall
growing with groups-rewritten and the 1-group merge staying near the
commit floor.

Usage: python scripts/snapshot_scale_bench.py [--groups 1024]
       [--rows-per-group 2000]
Prints one JSON line per merge + a summary line; results are recorded
in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=1024)
    ap.add_argument("--rows-per-group", type=int, default=2000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from openalex_neo4j_spark.session import get_spark
    from openalex_neo4j_spark.table_format import SnapshotTable

    spark = get_spark(master="local[8]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="snap_scale_")
    n = args.groups * args.rows_per_group
    t = SnapshotTable(spark, root, key="k")
    df = spark.range(0, n).select(
        F.format_string("k%010d", F.col("id")).alias("k"),
        F.col("id").alias("val"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    t0 = time.time()
    t.overwrite_clustered(df, args.groups)
    load_s = time.time() - t0
    m = t._load_manifest(t.current_version())
    print(json.dumps({"op": "bulk_load", "groups": len(m["groups"]),
                      "rows": n, "sec": round(load_s, 2)}))

    # merge spans: ~1 group, ~groups/64, ~groups/8 (contiguous keys ->
    # contiguous range-clustered groups)
    for span_groups in (1, max(1, args.groups // 64),
                        max(1, args.groups // 8)):
        n_upd = span_groups * args.rows_per_group // 2
        upd = spark.range(0, n_upd).select(
            F.format_string("k%010d", F.col("id") * 2).alias("k"),
            (-F.col("id")).alias("val"),
            F.lit("updated").alias("payload"),
        )
        prev = {g["path"] for g in
                t._load_manifest(t.current_version())["groups"]}
        t0 = time.time()
        t.merge(upd)
        wall = time.time() - t0
        now = t._load_manifest(t.current_version())["groups"]
        carried = len([g for g in now if g["path"] in prev])
        # touched groups are read + rewritten (coalesced into one new
        # group); carried ones move by reference only
        touched = len(prev) - carried
        print(json.dumps({
            "op": "merge", "upd_rows": n_upd,
            "target_span_groups": span_groups,
            "groups_touched": touched, "groups_carried": carried,
            "sec": round(wall, 2),
        }))

    total_rows = t.read().count()
    print(json.dumps({"op": "final_read", "rows": total_rows,
                      "versions": t.current_version()}))
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
