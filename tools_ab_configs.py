#!/usr/bin/env python
"""Interleaved same-session A/B of runtime-settable configs over the bench suite.

Usage: python tools_ab_configs.py KEY VALUE_A VALUE_B [passes]

Alternates the config per full suite pass (A,B,A,B,...), reports per-variant
per-query best and suite Σbest. Same-session interleaving per the repo's bench
methodology (sequential cross-process runs are load-biased on this box).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import ensure_views, load_all
from universql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    key, va, vb = sys.argv[1], sys.argv[2], sys.argv[3]
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    spark = get_spark("ab_configs", sf_dir=SF_DIR)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_views(spark, SF_DIR)
    for t in spark.catalog.listTables():
        if t.isTemporary:
            spark.table(t.name).count()
    registry = load_all()
    specs = {n: s for n, s in sorted(registry.items()) if s.bench}

    # cold + warm passes under each variant so codegen/C2 are warm for both
    for val in (va, vb, va, vb):
        spark.conf.set(key, val)
        for s in specs.values():
            s.spark(spark, SF_DIR).toArrow()

    best: dict[str, dict[str, float]] = {va: {}, vb: {}}
    for i in range(passes * 2):
        val = va if i % 2 == 0 else vb
        spark.conf.set(key, val)
        for n, s in specs.items():
            t0 = time.perf_counter()
            s.spark(spark, SF_DIR).toArrow()
            dt = time.perf_counter() - t0
            if dt < best[val].get(n, float("inf")):
                best[val][n] = dt
    out = {
        "key": key,
        "sum_best": {v: round(sum(d.values()), 3) for v, d in best.items()},
        "per_query": {
            n: {va: round(best[va][n], 4), vb: round(best[vb][n], 4)} for n in specs
        },
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
