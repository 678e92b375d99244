#!/usr/bin/env python
"""r9 exec-side probe (VERDICT r8 'Next round' #2): where do the residual
milliseconds of the join-heavy TPC-H replans live?

Measures, interleaved best-of-N after a global warm:
  1. tpch_q5 / q3 / q18 as shipped (baseline)
  2. q5 with AQE off (how much of the wall is AQE stage re-planning?)
  3. q5 with the two fixed dims PRE-JOINED into one broadcast relation
     (one fewer broadcast-build job)
  4. q1 exact-sum convention decomposition re-measure post-resident-layout:
     COUNT-only vs DOUBLE sums vs DECIMAL(28,6) sums (r3 measured
     0.13 / 0.26 / 1.06 s pre-layout)
  5. q5 with DOUBLE sums (probe-only; breaks the hash convention)

Run alone on a quiet box. Prints one line per variant.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import load_all
from universql_spark.queries.clickbench import dsum
from universql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROBE_RUNS", "5"))
WARM = 2

REVENUE = "l_extendedprice * (1 - l_discount)"

Q5_BASE = f"""SELECT /*+ BROADCAST(nation, region) */ n_name, {dsum(REVENUE)} AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name ORDER BY revenue DESC, n_name"""

# one broadcast build instead of two for the fixed dims
Q5_DIMJOIN = f"""WITH nr AS (SELECT n_nationkey, n_name FROM nation JOIN region
  ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
SELECT /*+ BROADCAST(nr) */ n_name, {dsum(REVENUE)} AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nr ON s_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name ORDER BY revenue DESC, n_name"""

Q5_DOUBLE = """SELECT /*+ BROADCAST(nation, region) */ n_name,
  SUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name ORDER BY revenue DESC, n_name"""

Q1_COUNT = """SELECT l_returnflag, l_linestatus, COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""

Q1_DOUBLE = """SELECT l_returnflag, l_linestatus,
  SUM(l_quantity) AS a, SUM(l_extendedprice) AS b,
  SUM(l_extendedprice * (1 - l_discount)) AS c,
  SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS d,
  AVG(l_quantity) AS e, AVG(l_extendedprice) AS f, AVG(l_discount) AS g,
  COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""


def time_sql(spark, sql: str, runs: int = N, warm: int = WARM) -> list[float]:
    for _ in range(warm):
        spark.sql(sql).toArrow()
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.sql(sql).toArrow()
        out.append(time.perf_counter() - t0)
    return out


def time_spec(spark, fn, runs: int = N, warm: int = WARM) -> list[float]:
    for _ in range(warm):
        fn(spark, SF_DIR).toArrow()
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).toArrow()
        out.append(time.perf_counter() - t0)
    return out


def jobs_of(spark, sql: str) -> tuple[int, int, int]:
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup(None) or [])
    spark.sql(sql).toArrow()
    after = set(st.getJobIdsForGroup(None) or [])
    new = after - before
    stages = 0
    for j in new:
        info = st.getJobInfo(j)
        if info:
            stages += len(info.stageIds)
    return len(new), stages, 0


def main() -> None:
    spark = get_spark("probe_exec")
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    # register fixture tables through the resident layout
    reg["tpch_q5"].spark(spark, SF_DIR).toArrow()

    res = {}
    variants = [
        ("q5_base", Q5_BASE),
        ("q5_dimjoin", Q5_DIMJOIN),
        ("q5_double", Q5_DOUBLE),
        ("q1_count", Q1_COUNT),
        ("q1_double", Q1_DOUBLE),
    ]
    # global warm of everything first (C2 ramp), then interleaved timing
    for name, sql in variants:
        time_sql(spark, sql, runs=1, warm=WARM)
    t = time_spec(spark, reg["tpch_q1"].spark, runs=1, warm=WARM)
    samples: dict[str, list[float]] = {n: [] for n, _ in variants}
    samples["q1_decimal"] = []
    samples["q3_base"] = []
    samples["q18_base"] = []
    for _ in range(N):
        for name, sql in variants:
            t0 = time.perf_counter()
            spark.sql(sql).toArrow()
            samples[name].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        reg["tpch_q1"].spark(spark, SF_DIR).toArrow()
        samples["q1_decimal"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        reg["tpch_q3"].spark(spark, SF_DIR).toArrow()
        samples["q3_base"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        reg["tpch_q18_big_orders"].spark(spark, SF_DIR).toArrow()
        samples["q18_base"].append(time.perf_counter() - t0)

    # AQE off probe for q5 (same session; runtime conf)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    samples["q5_noaqe"] = time_sql(spark, Q5_BASE)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    for name, xs in samples.items():
        print(
            f"{name}: min={min(xs)*1000:.0f}ms med={statistics.median(xs)*1000:.0f}ms"
            f" n={len(xs)}"
        )
    j5 = jobs_of(spark, Q5_BASE)
    jd = jobs_of(spark, Q5_DIMJOIN)
    print(f"jobs q5_base={j5[0]} stages={j5[1]} | q5_dimjoin={jd[0]} stages={jd[1]}")
    print("loadavg:", os.getloadavg())


if __name__ == "__main__":
    main()
