#!/usr/bin/env python
"""Decompose cb_q29's fresh-plan overhead (replan ~0.28 best vs prepared
~0.03 — a ~0.25 s per-fresh-plan cost, 10x the cb_q00 floor).

Phases per fresh plan:
  A parse+analyze   spark.sql via the spec builder
  B opt+plan        queryExecution().executedPlan()
  C codegen+RDD     executedPlan().execute() — triggers whole-stage source
                    GENERATION (+ Janino cache lookup) and RDD DAG setup,
                    no job
  D job+collect     toArrow()

Hypothesis: for the 30-decimal-sum aggregate, C (source generation of a
very wide aggregate) dominates the fresh-plan overhead that PROFILE_FLOOR
measured at only ~25 ms for the 1-row cb_q00.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import ensure_views, load_all
from universql_spark.session import get_spark


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("profile_q29", sf_dir=sf_dir)
    ensure_views(spark, sf_dir)
    reg = load_all()
    names = sys.argv[1:] or ["cb_q29", "cb_q00", "tpch_q1", "tpch_q5"]
    for _ in range(3):
        for n in names:
            reg[n].spark(spark, sf_dir).toArrow()
    t0 = time.perf_counter()
    x = 0
    for i in range(5_000_000):
        x += i * i
    print(f"spin={time.perf_counter()-t0:.3f}")
    for n in names:
        rows = []
        for _ in range(9):
            t0 = time.perf_counter()
            df = reg[n].spark(spark, sf_dir)
            t1 = time.perf_counter()
            qe = df._jdf.queryExecution()
            plan = qe.executedPlan()
            t2 = time.perf_counter()
            plan.execute()
            t3 = time.perf_counter()
            df.toArrow()
            t4 = time.perf_counter()
            rows.append((t1 - t0, t2 - t1, t3 - t2, t4 - t3))
        med = lambda i: sorted(r[i] for r in rows)[len(rows) // 2] * 1e3  # noqa: E731
        print(
            f"{n:12s} parse+analyze={med(0):6.1f}  opt+plan={med(1):6.1f}  "
            f"codegen+rdd={med(2):6.1f}  job+collect={med(3):6.1f}  (ms, median of 9)"
        )


if __name__ == "__main__":
    main()
