#!/usr/bin/env python
"""r10 session-6 probe: where does ann_ivf_topk's replan variance live?

OPTIMIZATION_r10.md "Not yet optimized" #4: ann_ivf_topk replans read
0.29-0.56 s across epochs while its plan is stable. Hypotheses:
  (a) DataFrame creation jitter (driver-side Py4J / analysis),
  (b) broadcast-build scheduling jitter (the probe-set broadcast),
  (c) executor-side task scheduling noise.

Protocol: bench-style warm (cold + 2 passes), then N replans each split
into creation wall (spec.spark) and exec wall (toArrow), with per-replan
job/stage counts from the status tracker; ann_cosine_topk interleaved as
the control (same corpus, same probe broadcast, no IVF index scan).
Run alone on a quiet box. Prints one summary line per phase.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import load_all
from universql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROBE_RUNS", "20"))


def main() -> None:
    spark = get_spark("probe_ann_variance", sf_dir=SF_DIR)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    specs = {n: reg[n] for n in ("ann_ivf_topk", "ann_cosine_topk")}

    # bench-equivalent warm: one cold + two steady passes per spec
    for s in specs.values():
        for _ in range(3):
            s.spark(spark, SF_DIR).toArrow()

    st = spark.sparkContext.statusTracker()
    rows: dict[str, list[tuple[float, float, int, int]]] = {n: [] for n in specs}
    for _ in range(N):
        for name, spec in specs.items():
            before = set(st.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            df = spec.spark(spark, SF_DIR)
            t1 = time.perf_counter()
            df.toArrow()
            t2 = time.perf_counter()
            new = set(st.getJobIdsForGroup(None) or []) - before
            stages = sum(
                len(st.getJobInfo(j).stageIds) for j in new if st.getJobInfo(j)
            )
            rows[name].append((t1 - t0, t2 - t1, len(new), stages))

    for name, xs in rows.items():
        cre = [r[0] for r in xs]
        exe = [r[1] for r in xs]
        tot = [r[0] + r[1] for r in xs]
        print(
            f"{name}: total min={min(tot)*1000:.0f} med={statistics.median(tot)*1000:.0f} "
            f"max={max(tot)*1000:.0f}ms | creation med={statistics.median(cre)*1000:.0f} "
            f"max={max(cre)*1000:.0f} | exec med={statistics.median(exe)*1000:.0f} "
            f"max={max(exe)*1000:.0f} | jobs={sorted({r[2] for r in xs})} "
            f"stages={sorted({r[3] for r in xs})}"
        )
        # the tail replans, worst-3 by total, with their phase split
        worst = sorted(xs, key=lambda r: -(r[0] + r[1]))[:3]
        for c, e, j, s in worst:
            print(f"  worst: creation={c*1000:.0f}ms exec={e*1000:.0f}ms jobs={j} stages={s}")
    print("loadavg:", os.getloadavg())


if __name__ == "__main__":
    main()
