#!/usr/bin/env python
"""Count jobs + job wall time inside one fresh tpch_q5 replan, then A/B:
dims as cached parquet views (today) vs dims as driver-local LocalRelations
(broadcast builds become driver-local collects — no job)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import ensure_views, load_all
from universql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "15"))
DIMS = ["region", "nation", "supplier", "customer", "part"]


def bench_spec(spark, spec, reps):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        spec.spark(spark, SF_DIR).toArrow()
        ts.append(time.perf_counter() - t0)
    return {"median_ms": round(1000 * statistics.median(ts), 1), "best_ms": round(1000 * min(ts), 1)}


def main() -> None:
    spark = get_spark("floor_profile4", sf_dir=SF_DIR)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_views(spark, SF_DIR)
    for t in spark.catalog.listTables():
        if t.isTemporary:
            spark.table(t.name).count()
    registry = load_all()
    q5 = registry["tpch_q5"]
    q18 = registry["tpch_q18_big_orders"]
    q3 = registry["tpch_q3"]
    for _ in range(4):
        q5.spark(spark, SF_DIR).toArrow(); q18.spark(spark, SF_DIR).toArrow(); q3.spark(spark, SF_DIR).toArrow()

    out = {}
    # job census for one fresh q5
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    q5.spark(spark, SF_DIR).toArrow()
    wall = time.perf_counter() - t0
    after = set(st.getJobIdsForGroup(None) or [])
    new_jobs = sorted(after - before)
    out["q5_fresh_wall_ms"] = round(1000 * wall, 1)
    out["q5_fresh_job_count"] = len(new_jobs)

    out["baseline_cached_dims"] = {
        "tpch_q5": bench_spec(spark, q5, REPS),
        "tpch_q3": bench_spec(spark, q3, REPS),
        "tpch_q18": bench_spec(spark, q18, REPS),
    }

    # --- variant: dims as LocalRelations ---
    import pyarrow  # noqa
    for name in DIMS:
        tbl = spark.table(name).toArrow()
        ldf = spark.createDataFrame(tbl)
        ldf.createOrReplaceTempView(name)
    # warm
    for _ in range(4):
        q5.spark(spark, SF_DIR).toArrow(); q18.spark(spark, SF_DIR).toArrow(); q3.spark(spark, SF_DIR).toArrow()
    before = set(st.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    q5.spark(spark, SF_DIR).toArrow()
    wall = time.perf_counter() - t0
    after = set(st.getJobIdsForGroup(None) or [])
    out["q5_local_wall_ms"] = round(1000 * wall, 1)
    out["q5_local_job_count"] = len(sorted(after - before))
    out["local_relation_dims"] = {
        "tpch_q5": bench_spec(spark, q5, REPS),
        "tpch_q3": bench_spec(spark, q3, REPS),
        "tpch_q18": bench_spec(spark, q18, REPS),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
