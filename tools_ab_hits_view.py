#!/usr/bin/env python
"""Interleaved A/B: cb bench specs as WITH-CTE text vs a pre-analyzed `hits`
temp view.

The hypothesis (PROFILE_FLOOR.md): each cb replan re-parses/re-analyzes the
~500-char shared HITS CTE (~8 ms of the per-query floor). A temp view built
from a DataFrame stores the ANALYZED plan in the session catalog, so view
references skip that work. Values are identical by construction — a CTE is
inlined during analysis, so both forms optimize to the same physical plan.

Usage: python tools_ab_hits_view.py [rounds=7]
Prints per-query medians for both arms, interleaved in one session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import clickbench, ensure_views, load_all
from universql_spark.session import get_spark

WITH_PREFIX = "WITH " + clickbench.HITS + " "


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("ab_hits_view", sf_dir=sf_dir)
    ensure_views(spark, sf_dir)
    for t in spark.catalog.listTables():
        if t.isTemporary:
            spark.table(t.name).count()

    reg = load_all()
    cb_bench = sorted(n for n, s in reg.items() if s.bench and n.startswith("cb_"))
    # spec.sql is now the bare body over the registered `hits` view (the
    # shipped form); the CTE arm reconstructs the pre-r10 WITH form.
    pairs: dict[str, tuple[str, str]] = {}
    for n in cb_bench:
        body = reg[n].sql
        assert body is not None and not body.startswith("WITH "), n
        pairs[n] = (WITH_PREFIX + body, body)

    # warm both arms
    for cte, view in pairs.values():
        spark.sql(cte).toArrow()
        spark.sql(view).toArrow()

    res: dict[str, dict[str, list[float]]] = {n: {"cte": [], "view": []} for n in cb_bench}
    for _ in range(rounds):
        for n, (cte, view) in pairs.items():
            t0 = time.perf_counter(); spark.sql(cte).toArrow(); res[n]["cte"].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); spark.sql(view).toArrow(); res[n]["view"].append(time.perf_counter() - t0)

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        return s[len(s) // 2]

    out = {}
    tot_c = tot_v = 0.0
    for n in cb_bench:
        mc, mv = med(res[n]["cte"]), med(res[n]["view"])
        tot_c += mc
        tot_v += mv
        out[n] = {"cte_med_ms": round(mc * 1e3, 1), "view_med_ms": round(mv * 1e3, 1),
                  "delta_ms": round((mv - mc) * 1e3, 1)}
    print(json.dumps({"per_query": out, "sum_cte_s": round(tot_c, 3),
                      "sum_view_s": round(tot_v, 3), "rounds": rounds,
                      "load": [round(x, 2) for x in os.getloadavg()]}, indent=1))


if __name__ == "__main__":
    main()
