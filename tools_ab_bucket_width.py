#!/usr/bin/env python
"""A/B (r11): fact-table bucket width at a given SF, interleaved subprocesses.

Bucket count == task count for every bucketed-scan stage (the orderkey SMJs,
the doc_id/user_id aggregations and windows). The r10 documents A/B showed 8
beats 32 for sub-MB sources; this tool measures the OTHER bucketed tables
under the r11 zero-sort SMJ plans: width A = current policy, width B =
narrow (BUCKET_WIDE_DEFAULT forced huge -> every table 8 buckets).

Each arm runs in its own subprocess (layout binds at registration); arms are
interleaved A,B,A,B,... so machine epochs hit both. Queries timed replan-
style (fresh DataFrame + toArrow, best-of-3 after a warm pass).

Usage: python tools_ab_bucket_width.py [rounds]   (SPARK_GRAFT_SF_DIR as usual)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q18_big_orders", "tpch_q5",
    "dedup_exact", "join_asof", "stream_tumbling_counts",
    "text_tfidf_topk", "dedup_minhash_lsh", "cb_q42", "cb_q07",
]

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(here)r)
import universql_spark.session as S
if os.environ.get("AB_NARROW"):
    S.BUCKET_WIDE_DEFAULT = 1 << 60   # every bucketed table -> 8 buckets
from universql_spark.queries import ensure_views, load_all
reg = load_all()
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = S.get_spark("ab_bucket_width", sf_dir=sf)
ensure_views(spark, sf)
names = %(queries)r
for n in names:
    reg[n].spark(spark, sf).toArrow()
out = {}
for n in names:
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        reg[n].spark(spark, sf).toArrow()
        ts.append(time.perf_counter() - t0)
    out[n] = round(min(ts), 4)
print("RESULT " + json.dumps(out))
"""


def run_arm(narrow: bool) -> dict[str, float]:
    env = dict(os.environ)
    if narrow:
        env["AB_NARROW"] = "1"
    # each arm gets its own resident dir suffix? No: variants coexist —
    # idents embed the bucket count, and _prune_stale_variants only prunes
    # same-prefix DIFFERENT idents... it WOULD prune the other arm's
    # variant. Park each arm in its own resident dir to keep both layouts.
    env["SPARK_GRAFT_RESIDENT_DIR"] = (
        "/tmp/uqs_ab_bucket_narrow" if narrow else "/tmp/uqs_ab_bucket_wide"
    )
    code = CHILD % {"here": HERE, "queries": QUERIES}
    p = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=1200,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"arm failed: {p.stdout[-500:]} {p.stderr[-2000:]}")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    best: dict[str, dict[str, float]] = {"wide": {}, "narrow": {}}
    for r in range(rounds):
        for arm, narrow in (("wide", False), ("narrow", True)):
            res = run_arm(narrow)
            for n, v in res.items():
                best[arm][n] = min(best[arm].get(n, float("inf")), v)
            print(f"round {r} {arm}: total={sum(res.values()):.2f}")
    print(f"{'query':26s} {'wide(cur)':>10s} {'narrow(8)':>10s}")
    for n in QUERIES:
        print(f"{n:26s} {best['wide'][n]*1000:9.0f} {best['narrow'][n]*1000:9.0f}")
    print(f"{'TOTAL':26s} {sum(best['wide'].values()):9.2f} {sum(best['narrow'].values()):9.2f}")


if __name__ == "__main__":
    main()
