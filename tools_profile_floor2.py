#!/usr/bin/env python
"""Drill into the execute+arrow phase of the replan floor.

Compares, for the same warmed query:
  df.count()            JVM job + one scalar over Py4J (no Arrow socket)
  df.toArrow()          JVM job + Arrow batches over the serve-socket
  jdf.collectToPython() the raw socket machinery toArrow uses
  empty-relation toArrow (LocalTableScan, no real job)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import ensure_views
from universql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "30"))


def med_ms(fn, reps=REPS):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return {"median_ms": round(1000 * statistics.median(ts), 2), "best_ms": round(1000 * min(ts), 2)}


def main() -> None:
    spark = get_spark("floor_profile2", sf_dir=SF_DIR)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_views(spark, SF_DIR)
    spark.table("events").count()

    out = {}
    one = spark.sql("SELECT 1 AS x")
    cnt = spark.sql("SELECT COUNT(*) AS c FROM events")
    for _ in range(3):
        one.toArrow(); cnt.toArrow(); one.count(); cnt.count()

    out["select1_count_action"] = med_ms(lambda: one.count())
    out["select1_toArrow"] = med_ms(lambda: one.toArrow())
    out["select1_collect"] = med_ms(lambda: one.collect())
    out["cnt_events_count_action"] = med_ms(lambda: cnt.count())
    out["cnt_events_toArrow"] = med_ms(lambda: cnt.toArrow())
    # prepared-tier equivalent (plan built once, re-execute):
    out["cnt_events_collect"] = med_ms(lambda: cnt.collect())

    # how many tasks does the events scan schedule?
    n_parts = spark.table("events").rdd.getNumPartitions()
    out["events_scan_partitions"] = n_parts
    out["shuffle_partitions"] = spark.conf.get("spark.sql.shuffle.partitions")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
