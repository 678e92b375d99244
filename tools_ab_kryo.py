#!/usr/bin/env python
"""Cross-process A/B of a STATIC Spark conf (default: Kryo serializer) over
the heavy bench subset — the one lever class tools_ab_configs.py cannot
touch (static confs are fixed at JVM launch).

Methodology: static confs force one JVM per variant sample, and this box
has multi-minute machine epochs, so a naive A...A B...B sequence is
epoch-biased. The parent therefore runs CHILD PROCESSES in a
counterbalanced ABBA BAAB order and reports per-adjacent-pair deltas as
well as per-variant medians; each child mirrors bench.py's replan
methodology (cold pass + 2 warm passes + best-of-3 fresh-DataFrame runs)
and records a spin calibration so degraded-epoch children are visible.

Usage:
  python tools_ab_kryo.py              # 8 children, Kryo vs default
  python tools_ab_kryo.py KEY VALUE    # A/B any static conf vs default
Child mode (internal): tools_ab_kryo.py --child [--conf KEY=VALUE]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SUBSET = [
    "tpch_q5", "tpch_q3", "tpch_q18_big_orders", "tpch_q1",
    "dedup_minhash_lsh", "text_tfidf_topk", "ann_ivf_topk",
    "ann_cosine_topk", "cb_q29",
]


def _spin() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(5_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 4)


def child() -> None:
    from universql_spark.queries import ensure_views, load_all
    from universql_spark.session import get_spark

    spark = get_spark("ab_static_conf", sf_dir=SF_DIR)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_views(spark, SF_DIR)
    for t in spark.catalog.listTables():
        if t.isTemporary:
            spark.table(t.name).count()
    registry = load_all()
    specs = {n: registry[n] for n in SUBSET}
    spin_in = _spin()
    for _ in range(3):  # cold + 2 warm passes (bench.py protocol)
        for s in specs.values():
            s.spark(spark, SF_DIR).toArrow()
    best: dict[str, float] = {}
    for n, s in specs.items():
        ss = []
        for _ in range(3):
            t0 = time.perf_counter()
            s.spark(spark, SF_DIR).toArrow()
            ss.append(time.perf_counter() - t0)
        best[n] = round(min(ss), 4)
    print(json.dumps({
        "serializer": spark.conf.get("spark.serializer", "default(java)"),
        "best": best,
        "sum": round(sum(best.values()), 4),
        "spin_in": spin_in,
        "spin_out": _spin(),
    }))


def main() -> None:
    if "--child" in sys.argv:
        child()
        return
    key = sys.argv[1] if len(sys.argv) > 2 else "spark.serializer"
    val = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "org.apache.spark.serializer.KryoSerializer"
    )
    order = ["A", "B", "B", "A", "B", "A", "A", "B"]  # counterbalanced
    results: list[dict] = []
    for i, variant in enumerate(order):
        env = dict(os.environ)
        if variant == "B":
            env["PYSPARK_SUBMIT_ARGS"] = f"--conf {key}={val} pyspark-shell"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, capture_output=True, text=True, timeout=900,
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        rec = json.loads(line)
        rec["variant"] = variant
        results.append(rec)
        print(f"[{i + 1}/{len(order)}] {variant} sum={rec.get('sum')} "
              f"spin={rec.get('spin_in')}/{rec.get('spin_out')}",
              file=sys.stderr)
    sums = {v: sorted(r["sum"] for r in results if r["variant"] == v)
            for v in "AB"}
    med = {v: s[len(s) // 2] for v, s in sums.items()}
    pairs = [
        round(results[i + 1]["sum"] - results[i]["sum"], 4)
        if results[i]["variant"] == "A"
        else round(results[i]["sum"] - results[i + 1]["sum"], 4)
        for i in range(0, len(results), 2)
    ]  # each pair: (B - A), adjacent in time
    print(json.dumps({
        "key": key, "value_B": val, "order": order,
        "sums": sums, "median": med,
        "adjacent_pair_B_minus_A": pairs,
        "per_query_median": {
            n: {v: sorted(r["best"][n] for r in results if r["variant"] == v)[
                len([r for r in results if r["variant"] == v]) // 2]
                for v in "AB"}
            for n in SUBSET
        },
        "children": results,
    }))


if __name__ == "__main__":
    main()
