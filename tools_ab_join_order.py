#!/usr/bin/env python
"""Interleaved A/B: customer-first join order (build side = 600k-row
lineitem) vs lineitem-first order (build sides = filtered orders /
customer). Inner joins commute, so values are identical; the lever is the
size of the single-threaded driver-side broadcast hash-relation build.
Methodology: same session, ABBA order alternation per round, creation
wall + noop-sink total per rep.

The A side is the pre-a1fb02a customer-first SQL text INLINED below
(ADVICE r10: commit a1fb02a rewrote _Q3_SQL/_Q5_SQL in tpch.py to the
lineitem-first form, so importing them as the baseline would compare the
optimized query against itself); the B side imports the shipped
constants, so the tool keeps measuring HEAD against the historical
baseline."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from universql_spark.session import get_spark
from universql_spark.queries import load_all
from universql_spark.queries.tpch import _Q3_SQL, _Q5_SQL, dsum, REVENUE

# pre-a1fb02a baselines: customer-first FROM order (left-deep planning made
# the 600k-row lineitem the broadcast build side)
Q3_A = f"""SELECT l_orderkey, {dsum(REVENUE)} AS revenue, CAST(o_orderdate AS DATE) AS odate
FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, l_orderkey LIMIT 10"""

Q5_A = f"""SELECT /*+ BROADCAST(nation, region) */ n_name, {dsum(REVENUE)} AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name ORDER BY revenue DESC, n_name"""

sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
spark = get_spark("ab_reorder", sf_dir=sf_dir)
spark.sparkContext.setLogLevel("ERROR")
load_all()
from universql_spark.queries import ensure_views
ensure_views(spark, sf_dir)

CASES = {"q3": (Q3_A, _Q3_SQL), "q5": (Q5_A, _Q5_SQL)}

# value check first
for name, (a, b) in CASES.items():
    ra = [tuple(r) for r in spark.sql(a).collect()]
    rb = [tuple(r) for r in spark.sql(b).collect()]
    assert ra == rb, f"{name} VALUES DIFFER"
    print(name, "values identical,", len(ra), "rows")

def rep(sql):
    t0 = time.perf_counter()
    df = spark.sql(sql)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    return t1 - t0, t2 - t0

# warm both
for a, b in CASES.values():
    rep(a); rep(b)

N = 9
res = {k: {"A": [], "B": []} for k in CASES}
for i in range(N):
    order = ["A", "B"] if i % 2 == 0 else ["B", "A"]
    for name, (a, b) in CASES.items():
        for side in order:
            sql = a if side == "A" else b
            res[name][side].append(rep(sql))

import statistics
for name in CASES:
    for side in ("A", "B"):
        cre = [round(c*1000) for c, _ in res[name][side]]
        tot = [round(t*1000) for _, t in res[name][side]]
        print(f"{name} {side}: total med {statistics.median(tot)} ms {sorted(tot)}  creation med {statistics.median(cre)}")
