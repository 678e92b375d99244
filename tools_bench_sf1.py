#!/usr/bin/env python
"""Assemble the work-bound sf1 bench fixture directory (VERDICT r10 item 4).

At sf0.1 the replan suite is creation/scheduling-bound (8-vs-32-core ratios
~= 1), so the scaling block carries no per-query parallelism information.
This tool builds ONE directory with every bench table at ~10x the driver
scale so bench.py can run work-bound, same harness, same contract:

- TPC-H tables: dbgen(sf=1) cast to fixture parity (tools_scaling.ensure_sf1
  — the CORRECTNESS_SF1 fixture, value-gated there)
- documents / embeddings: the 50k-doc / 20k-vector deterministic corpus
  (tools_scaling_llm.ensure_fixture — same generator the LLM scaling tables
  and CORRECTNESS_SF1 use)
- events: the 1M-row events fixture (tools_scaling_llm.ensure_events)

Tables are symlinked, not copied. Usage:

    python tools_bench_sf1.py            # assemble + print the dir
    SPARK_GRAFT_SF_DIR=$(python tools_bench_sf1.py) python bench.py
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

BENCH_SF1 = os.path.join(HERE, "data", "bench_sf1")


def ensure_bench_sf1() -> str:
    import tools_scaling
    import tools_scaling_llm

    tools_scaling.ensure_sf1()
    tools_scaling_llm.ensure_fixture()
    tools_scaling_llm.ensure_events()
    os.makedirs(BENCH_SF1, exist_ok=True)
    from universql_spark.session import TESTDATA_TABLES

    src_for = {}
    for t in TESTDATA_TABLES:
        if t in ("documents", "embeddings", "events"):
            src_for[t] = os.path.join(tools_scaling_llm.SF1, f"{t}.parquet")
        else:
            src_for[t] = os.path.join(tools_scaling.SF1, f"{t}.parquet")
    for t, src in src_for.items():
        dst = os.path.join(BENCH_SF1, f"{t}.parquet")
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(src, dst)
    return BENCH_SF1


if __name__ == "__main__":
    print(ensure_bench_sf1())
