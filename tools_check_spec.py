#!/usr/bin/env python
"""Check one or more named specs against their oracles at sf0.01.

Usage: python tools_check_spec.py name [name ...]

Same differential check as tools_correctness_local.py (row count + column
set + order-insensitive canonical values vs DuckDB / numpy oracle), scoped
to the named specs for fast iteration while developing a new spec.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tests.compare import PY_ORACLES, duck_connection, normalize_rows
from universql_spark.queries import load_all
from universql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    names = sys.argv[1:]
    spark = get_spark("check_spec")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(SF_DIR)
    registry = load_all()
    rc = 0
    for name in names:
        spec = registry.get(name)
        if spec is None:
            print(f"{name}: NOT REGISTERED")
            rc = 1
            continue
        s_tbl = spec.spark(spark, SF_DIR).toArrow()
        s_cols = s_tbl.column_names
        s_rows = [tuple(d[c] for c in s_cols) for d in s_tbl.to_pylist()]
        if spec.oracle is None and name in PY_ORACLES:
            d_cols, d_rows = PY_ORACLES[name](SF_DIR)
        elif spec.oracle is None:
            print(f"{name}: rows-only ({len(s_rows)} rows)")
            continue
        else:
            d_tbl = con.execute(spec.oracle).arrow()
            d_cols = d_tbl.column_names
            d_rows = [tuple(d[c] for c in d_cols) for d in d_tbl.to_pylist()]
        ok_rows = len(s_rows) == len(d_rows)
        ok_schema = sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in d_cols)
        ns, nd = normalize_rows(s_cols, s_rows), normalize_rows(d_cols, d_rows)
        ok_hash = ns == nd
        status = "ok" if (ok_rows and ok_schema and ok_hash) else "FAIL"
        print(f"{name}: {status} rows={len(s_rows)}/{len(d_rows)} schema={ok_schema} hash={ok_hash}")
        if not ok_hash:
            rc = 1
            # show first few differing canonical rows for debugging
            sset, dset = set(ns), set(nd)
            for r in list(sset - dset)[:3]:
                print("  spark-only:", r)
            for r in list(dset - sset)[:3]:
                print("  oracle-only:", r)
        elif not (ok_rows and ok_schema):
            rc = 1
            print("  spark cols:", s_cols, " oracle cols:", d_cols)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
