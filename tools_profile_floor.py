#!/usr/bin/env python
"""Profile the per-query replan floor (VERDICT r9 'Next round' #2).

Decomposes one replan of a bench query into:
  parse+analyze   spark.sql(sql)               (Py4J + parser + analyzer)
  optimize+plan   df._jdf.queryExecution().executedPlan()  (optimizer + planner)
  execute+arrow   df.toArrow()                 (schedule + run + Arrow edge)

and separately times a driver-only no-op (`SELECT 1`) to isolate the
irreducible Py4J + scheduling constant. Run alone on a quiet box.
"""

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
REPS = int(os.environ.get("REPS", "30"))


def _phase_times(spark, sql: str, reps: int) -> dict[str, float]:
    parse, plan, execu = [], [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        df = spark.sql(sql)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        df.toArrow()
        t3 = time.perf_counter()
        parse.append(t1 - t0)
        plan.append(t2 - t1)
        execu.append(t3 - t2)
    return {
        "parse_analyze_ms": round(1000 * statistics.median(parse), 2),
        "optimize_plan_ms": round(1000 * statistics.median(plan), 2),
        "execute_arrow_ms": round(1000 * statistics.median(execu), 2),
        "total_ms": round(1000 * (statistics.median(parse) + statistics.median(plan) + statistics.median(execu)), 2),
        "best_total_ms": round(1000 * min(p + q + r for p, q, r in zip(parse, plan, execu)), 2),
    }


def main() -> None:
    spark = get_spark("floor_profile", sf_dir=SF_DIR)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_views(spark, SF_DIR)
    for t in spark.catalog.listTables():
        if t.isTemporary:
            spark.table(t.name).count()

    registry = load_all()
    q00 = "WITH hits AS (SELECT event_id, ts, user_id, event_type, value, props, CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS INT) AS k, CAST(user_id % 10 AS INT) AS r, CAST(user_id % 5 AS INT) AS s, CAST(user_id % 2 AS INT) AS b, CAST(ts AS DATE) AS d FROM events) SELECT COUNT(*) AS c FROM hits"

    cases = {
        "select_1": "SELECT 1 AS x",
        "select_1_from_range": "SELECT COUNT(*) AS c FROM range(1000)",
        "cb_q00": q00,
        "count_events_direct": "SELECT COUNT(*) AS c FROM events",
    }
    # warm everything twice
    for sql in cases.values():
        for _ in range(3):
            spark.sql(sql).toArrow()

    out = {}
    for name, sql in cases.items():
        out[name] = _phase_times(spark, sql, REPS)

    # an actual registry replan, the exact bench call path
    spec = registry["cb_q00"]
    for _ in range(3):
        spec.spark(spark, SF_DIR).toArrow()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        spec.spark(spark, SF_DIR).toArrow()
        ts.append(time.perf_counter() - t0)
    out["registry_cb_q00_replan"] = {
        "median_ms": round(1000 * statistics.median(ts), 2),
        "best_ms": round(1000 * min(ts), 2),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
