#!/usr/bin/env python
"""Py4J round-trip census: count gateway commands per bench-spec DataFrame
CREATION (no execution), after a full warm pass.

The count is DETERMINISTIC per code version — unlike wall time it is valid
evidence even in a degraded machine epoch, which is what makes it the
instrument for the r10 sessions' driver-latency work (each py4j
send_command is one socket round trip; a JVM call is ~3 commands, and
py4j converts list arguments element-by-element per call, which is the
pattern this census exposes).

Usage: python tools_census_py4j.py   (sf dir via SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import py4j.clientserver as cs
import py4j.java_gateway as jg

COUNT = {"n": 0}


def _patch() -> list[str]:
    patched = []
    for mod, name in (
        (jg, "GatewayClient"),
        (jg, "GatewayConnection"),
        (cs, "ClientServerConnection"),
        (cs, "JavaClient"),
    ):
        c = getattr(mod, name, None)
        if c is not None and hasattr(c, "send_command"):
            orig = c.send_command

            def make(orig):
                def send_command(self, *a, **k):
                    COUNT["n"] += 1
                    return orig(self, *a, **k)

                return send_command

            c.send_command = make(orig)
            patched.append(name)
    return patched


def main() -> None:
    patched = _patch()
    from universql_spark.queries import load_all
    from universql_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("census_py4j", sf_dir=sf_dir)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    bench = {n: s for n, s in sorted(reg.items()) if s.bench}
    print("patched:", patched)

    # one full warm pass (creation+exec) so every memo/index cache is hot —
    # the census measures the steady-state replan creation path
    for s in bench.values():
        s.spark(spark, sf_dir).toArrow()

    rows = []
    for name, spec in bench.items():
        # Flush pending proxy finalizers BEFORE counting: every collected
        # JavaObject proxy sends one synchronous `memory del` command
        # (py4j GatewayClient.garbage_collect_object), so a Python GC cycle
        # firing mid-creation lands 400-550 spurious round trips on
        # whichever spec it interrupts (observed moving between cb_q27 and
        # text_tfidf_topk across runs). gc.collect() + one drain creation
        # makes the per-spec counts reproducible.
        gc.collect()
        spec.spark(spark, sf_dir)  # drain DELs triggered by the collect
        # r11: ALSO freeze the collector during the counted creation — the
        # drain pass allocates, so the threshold-triggered automatic gc
        # could still fire mid-count (observed: one spec per run reading
        # ~500 spurious `memory del` round trips, r10 saw it on cb_q27/
        # text_tfidf_topk, r11 on cb_q18)
        gc.disable()
        try:
            COUNT["n"] = 0
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir)
            w = time.perf_counter() - t0
        finally:
            gc.enable()
        rows.append((COUNT["n"], round(w * 1000, 1), name))
    rows.sort(reverse=True)
    for n, w, q in rows:
        print(f"{n:5d} rt  {w:7.1f} ms  {q}")
    print(
        f"TOTAL rt={sum(r[0] for r in rows)}"
        f"  creation_wall={sum(r[1] for r in rows):.0f} ms"
    )


if __name__ == "__main__":
    main()
