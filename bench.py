#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology: one pre-warmed SparkSession (JVM + codegen warm), one untimed
warm-up execution of a trivial query, then each bench query timed end-to-end
(plan + execute + collect count). At sf0.1 the binding constraint is Spark's
fixed per-query overhead (BASELINE.md), so session reuse and low shuffle
partition counts are the honest knobs — the query plans themselves are the
same ones that run at 100 TB.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import load_all
from universql_spark.session import DEFAULT_SF_DIR, get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    registry = load_all()
    bench_specs = {n: s for n, s in sorted(registry.items()) if s.bench}

    spark = get_spark("universql_spark_bench")
    # warm-up: JVM + codegen, view registration, first-touch of every table
    # (footer reads + OS page cache) — hot-run methodology like the
    # reference's ClickBench runs (best-of-3 per query, BASELINE.md)
    from universql_spark.queries import ensure_views

    ensure_views(spark, sf_dir)
    for t in spark.catalog.listTables():
        if t.isTemporary:
            spark.table(t.name).count()

    # Three timing tiers per query, so the comparison against BASELINE.md is
    # explicit about what each number includes:
    #   queries (primary)  — best-of-N FULL executions: fresh DataFrame each
    #     run (fresh plan + codegen + every stage re-executed). Matches what
    #     DuckDB pays on a repeated query; session/tables warm.
    #   prepared_queries   — re-collect of the SAME DataFrame: plan amortized
    #     AND Spark silently reuses shuffle map outputs (stages skip), i.e.
    #     prepared-statement + materialized-exchange replay. Lower bound.
    #   cold_queries       — the first full run (includes ~0.2-1.2s per-plan
    #     analysis+codegen that the primary tier's best-of-N also pays but
    #     amortizes less visibly).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    prepared: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, spec in bench_specs.items():
        best = float("inf")
        for r in range(runs):
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.collect()
            dur = time.perf_counter() - t0
            if r == 0:
                cold[name] = round(dur, 4)
            best = min(best, dur)
        timings[name] = round(best, 4)
        t0 = time.perf_counter()
        df.collect()
        prepared[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "prepared_total": round(sum(prepared.values()), 4),
                "prepared_queries": prepared,
                "cold_total": round(sum(cold.values()), 4),
                "cold_queries": cold,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
