#!/usr/bin/env python
"""A/B (r11): lineitem<->orders join strategy on the co-bucketed layout.

HEAD broadcasts the date-filtered orders side into lineitem (static-mode
size estimate under the 64 MB threshold). Every FRESH plan then pays a
broadcast COLLECT job — a 32-task scan of the bucketed orders table
(~23k surviving rows at sf0.1, measured 60-80 ms of the q5 replan's
exec1; broadcast metrics probe, OPTIMIZATION_r11.md). But lineitem and
orders are co-bucketed AND sorted on orderkey (session.BUCKETED_TABLES),
so a MERGE hint turns that join into a ZERO-exchange, zero-extra-sort
sort-merge join executed inside the main scan stage — no driver-side
collect job at all. Guide section 3.1 (pick the strategy deliberately)
+ 2.4 (bucketed tables persist the partitioning so repeated joins skip
the shuffle).

DuckDB parses the hint as a plain comment, so the shared spec/oracle text
stays identical on both engines.

Usage: python tools_ab_smj_orders.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import ensure_views, load_all
from universql_spark.queries.tpch import _Q3_SQL, _Q5_SQL
from universql_spark.session import DEFAULT_SF_DIR, get_spark

Q5_SMJ = _Q5_SQL.replace("/*+ BROADCAST(nation, region) */",
                         "/*+ BROADCAST(nation, region), MERGE(orders) */")
Q3_SMJ = _Q3_SQL.replace("SELECT l_orderkey", "SELECT /*+ MERGE(orders) */ l_orderkey")


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    load_all()
    spark = get_spark("ab_smj", sf_dir=sf_dir)
    ensure_views(spark, sf_dir)

    pairs = [("q5", _Q5_SQL, Q5_SMJ), ("q3", _Q3_SQL, Q3_SMJ)]
    for name, a, b in pairs:
        ra = sorted(map(tuple, spark.sql(a).collect()))
        rb = sorted(map(tuple, spark.sql(b).collect()))
        print(f"{name}: rows={len(ra)} equal={ra == rb}")
        assert ra == rb
        pb = spark.sql(b)._jdf.queryExecution().executedPlan().toString()
        print(f"{name} SMJ plan: SortMergeJoin={'SortMergeJoin' in pb} "
              f"Sorts={pb.count('Sort ') + pb.count('Sort(')} "
              f"BroadcastExchanges={pb.count('BroadcastExchange')}")

    for _ in range(2):
        for _n, a, b in pairs:
            spark.sql(a).toArrow(); spark.sql(b).toArrow()
    for name, a, b in pairs:
        ta, tb = [], []
        for _ in range(runs):
            t0 = time.perf_counter(); spark.sql(a).toArrow(); ta.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); spark.sql(b).toArrow(); tb.append(time.perf_counter() - t0)
        fmt = lambda xs: " ".join(f"{x*1000:.0f}" for x in xs)  # noqa: E731
        print(f"{name} A bcast-orders: {fmt(ta)} best={min(ta)*1000:.0f} median={sorted(ta)[len(ta)//2]*1000:.0f}")
        print(f"{name} B merge-orders: {fmt(tb)} best={min(tb)*1000:.0f} median={sorted(tb)[len(tb)//2]*1000:.0f}")


if __name__ == "__main__":
    main()
