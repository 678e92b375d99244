#!/usr/bin/env python
"""Isolate the fresh-vs-prepared toArrow gap step by step."""

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
SQL = "SELECT COUNT(*) AS c FROM events"


def stats(ts):
    return {"median_ms": round(1000 * statistics.median(ts), 2), "best_ms": round(1000 * min(ts), 2)}


def main() -> None:
    spark = get_spark("floor_profile3", sf_dir=SF_DIR)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_views(spark, SF_DIR)
    spark.table("events").count()
    for _ in range(3):
        spark.sql(SQL).toArrow()

    out = {}

    # A: fresh df, phases measured separately
    sql_t, plan_t, schema_t, arrow_t = [], [], [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df = spark.sql(SQL)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        _ = df.schema
        t3 = time.perf_counter()
        df.toArrow()
        t4 = time.perf_counter()
        sql_t.append(t1 - t0); plan_t.append(t2 - t1)
        schema_t.append(t3 - t2); arrow_t.append(t4 - t3)
    out["fresh_sql"] = stats(sql_t)
    out["fresh_forcePlan"] = stats(plan_t)
    out["fresh_schema"] = stats(schema_t)
    out["fresh_toArrow_after_schema"] = stats(arrow_t)

    # B: fresh df, no pre-forcing at all — single toArrow number
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        spark.sql(SQL).toArrow()
        ts.append(time.perf_counter() - t0)
    out["fresh_end_to_end"] = stats(ts)

    # C: prepared df re-collect
    df = spark.sql(SQL)
    df.toArrow()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.toArrow()
        ts.append(time.perf_counter() - t0)
    out["prepared_toArrow"] = stats(ts)

    # D: JVM-side only — collectAsArrowToPython + drain, fresh each time
    from pyspark.sql.pandas.serializers import ArrowCollectSerializer
    from pyspark.rdd import _load_from_socket
    ts = []
    for _ in range(REPS):
        df = spark.sql(SQL)
        t0 = time.perf_counter()
        port, secret, _srv = df._jdf.collectAsArrowToPython()
        list(_load_from_socket((port, secret), ArrowCollectSerializer()))
        ts.append(time.perf_counter() - t0)
    out["fresh_jvm_collect_and_drain"] = stats(ts)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
