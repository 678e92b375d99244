#!/usr/bin/env python
"""Full-registry correctness gate -> CORRECTNESS_LOCAL.json.

The driver's per-round CORRECTNESS gate caps at the first 50 oracled specs;
this tool runs the SAME differential check (row count + column set +
order-insensitive canonical values vs the DuckDB oracle, tests/compare.py)
over EVERY registered spec at sf0.01 and writes an auditable artifact, so
the specs past the driver's cap are still value-checked every round
(VERDICT r1 'Next round' #10).

Usage: python tools_correctness_local.py  [writes CORRECTNESS_LOCAL.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tests.compare import (
    PY_ORACLES,
    arrow_ipc_probe,
    duck_connection,
    normalize_rows,
)
from universql_spark.queries import load_all
from universql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = get_spark("correctness_local")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(SF_DIR)
    registry = load_all()
    out: dict[str, dict] = {}
    t_start = time.time()
    for name, spec in registry.items():  # insertion order == driver order
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            s_tbl = spec.spark(spark, SF_DIR).toArrow()
            s_cols = s_tbl.column_names
            s_rows = [tuple(d[c] for c in s_cols) for d in s_tbl.to_pylist()]
            rec["spark_rows"] = len(s_rows)
            if spec.oracle is None and name in PY_ORACLES:
                # numpy oracle (tests/compare.py): independent re-derivation
                # of a deterministic non-SQL operator — same hash check,
                # evidence tier "oracled (python)" instead of rows-only
                d_cols, d_rows = PY_ORACLES[name](SF_DIR)
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(c.lower() for c in s_cols) == sorted(
                    c.lower() for c in d_cols
                )
                rec["hash_match"] = normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows)
                rec["note"] = "python (numpy) oracle"
            elif spec.oracle is None:
                rec["rows_match"] = len(s_rows) >= 0  # rows-only spec
                rec["note"] = "rows-only (no SQL-expressible oracle)"
            else:
                d_tbl = con.execute(spec.oracle).arrow()
                d_cols = d_tbl.column_names
                d_rows = [tuple(d[c] for c in d_cols) for d in d_tbl.to_pylist()]
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(c.lower() for c in s_cols) == sorted(
                    c.lower() for c in d_cols
                )
                rec["hash_match"] = normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows)
                # Informational byte-level probe (VERDICT r5 #1/#2): canonical
                # Arrow IPC equality is the strictest local mirror of ANY
                # driver hash recipe; 'type:' notes are benign width diffs.
                ipc_eq, ipc_note = arrow_ipc_probe(s_tbl, d_tbl)
                rec["ipc_equal"] = ipc_eq
                if ipc_note:
                    rec["ipc_note"] = ipc_note
        except Exception as e:  # noqa: BLE001 - the artifact records failures
            rec["err"] = f"{type(e).__name__}: {str(e)[:300]}"
            traceback.print_exc(limit=2, file=sys.stderr)
        out[name] = rec
        status = "ERR " if rec["err"] else ("ok  " if rec.get("hash_match") or rec.get("note") else "FAIL")
        print(f"{status}{name}", file=sys.stderr, flush=True)

    oracled = [r for r in out.values() if r.get("oracle_rows") is not None]
    summary = {
        "specs_total": len(out),
        "specs_oracled": len(oracled),
        "oracled_all_match": sum(
            1 for r in oracled if r["rows_match"] and r["schema_match"] and r["hash_match"]
        ),
        "rows_only": sum(1 for r in out.values() if r.get("note")),
        "ipc_equal": sum(1 for r in out.values() if r.get("ipc_equal")),
        "ipc_type_width_only": sum(
            1 for r in out.values() if r.get("ipc_note", "").startswith("type:")
        ),
        "errors": sum(1 for r in out.values() if r["err"]),
        "sf_dir": SF_DIR,
        "wall_sec": round(time.time() - t_start, 1),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "CORRECTNESS_LOCAL.json"), "w") as f:
        json.dump({"summary": summary, "specs": out}, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
