#!/usr/bin/env python
"""Verbatim TPC-H gate (VERDICT r8 'Next round' #3).

The registry's tpch_* specs run on the driver fixtures, whose star schema
carries no partsupp and a column subset — six queries (q2/q9/q11/q16/q17/
q20) are adapted there. This gate removes the adaptation entirely: it
generates FULL-schema dbgen fixtures (all 8 tables including partsupp with
ps_supplycost/ps_comment, every column, native decimal/date types), takes
the 22 OFFICIAL query texts from DuckDB's tpch extension, runs each
through `Engine.execute()` (the full dialect ring), and compares against
DuckDB executing the IDENTICAL text on the IDENTICAL parquet files.

Values compare numerically tolerant (rel 1e-9): the engines legitimately
return different numeric types for the same verbatim text (Spark
avg(decimal(12,2)) -> decimal(16,6); DuckDB -> double), so exact repr
equality would flag type conventions, not wrong answers. Row counts,
column names and non-numeric cells stay exact.

Usage:
  python tools_tpch_verbatim.py            # sf 0.01 -> TPCH_VERBATIM.json
  python tools_tpch_verbatim.py --sf 1     # 10x gate, same artifact
"""

from __future__ import annotations

import datetime as dt
import decimal
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HERE = os.path.dirname(os.path.abspath(__file__))
TABLES = ["region", "nation", "customer", "supplier", "part", "partsupp", "orders", "lineitem"]


def ensure_fixture(sf: float) -> str:
    tag = str(sf).replace(".", "")
    d = os.path.join(HERE, "data", f"tpch_verbatim_sf{tag}")
    if os.path.exists(os.path.join(d, "lineitem.parquet")):
        return d
    import duckdb

    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    con.execute("LOAD tpch")
    print(f"dbgen(sf={sf})...", flush=True)
    con.execute(f"CALL dbgen(sf={sf})")
    for t in TABLES:
        con.execute(f"COPY (SELECT * FROM {t}) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
    return d


def _num(v):
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    return None


def _cell_eq(a, b) -> bool:
    na, nb = _num(a), _num(b)
    if na is not None and nb is not None:
        if math.isnan(na) or math.isnan(nb):
            return math.isnan(na) == math.isnan(nb)
        # when one engine answers in a FIXED-SCALE decimal (Spark's
        # avg(decimal(12,2)) -> decimal(16,6), rounded at 6 places) and the
        # other in double, agreement can only be to one ULP of the declared
        # scale — allow that quantum, not more
        abs_tol = 1e-9
        for v in (a, b):
            if isinstance(v, decimal.Decimal):
                q = 10.0 ** v.as_tuple().exponent
                abs_tol = max(abs_tol, q)
        return math.isclose(na, nb, rel_tol=1e-9, abs_tol=abs_tol)
    if isinstance(a, dt.datetime) and isinstance(b, dt.datetime):
        if a.tzinfo is not None:
            a = a.astimezone(dt.timezone.utc).replace(tzinfo=None)
        if b.tzinfo is not None:
            b = b.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return a == b
    if isinstance(a, dt.datetime) and isinstance(b, dt.date):
        return a.date() == b and a.time() == dt.time()
    if isinstance(b, dt.datetime) and isinstance(a, dt.date):
        return b.date() == a and b.time() == dt.time()
    return a == b


def _sort_key(row):
    out = []
    for v in row:
        n = _num(v)
        if n is not None:
            out.append(("n", round(n, 6)))
        elif v is None:
            out.append(("z", ""))
        else:
            out.append(("s", str(v)))
    return out


def rows_of(tbl) -> list[tuple]:
    cols = tbl.column_names
    order = sorted(range(len(cols)), key=lambda i: cols[i].lower())
    return sorted(
        (tuple(r[cols[i]] for i in order) for r in tbl.to_pylist()), key=_sort_key
    )


def compare(a, b) -> tuple[bool, str | None]:
    if a.num_rows != b.num_rows:
        return False, f"rows {a.num_rows} != {b.num_rows}"
    if sorted(c.lower() for c in a.column_names) != sorted(
        c.lower() for c in b.column_names
    ):
        return False, f"columns {a.column_names} != {b.column_names}"
    ra, rb = rows_of(a), rows_of(b)
    for i, (x, y) in enumerate(zip(ra, rb)):
        for j, (u, v) in enumerate(zip(x, y)):
            if not _cell_eq(u, v):
                return False, f"row {i} col {j}: {u!r} != {v!r}"
    return True, None


def main() -> int:
    sf = 0.01
    if "--sf" in sys.argv:
        sf = float(sys.argv[sys.argv.index("--sf") + 1])
    d = ensure_fixture(sf)

    import duckdb

    from universql_spark.engine import Engine
    from universql_spark.session import get_spark

    spark = get_spark("tpch_verbatim", sf_dir=d)
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        spark.read.parquet(f"{d}/{t}.parquet").createOrReplaceTempView(t)
    eng = Engine(spark=spark)

    con = duckdb.connect()
    con.execute("LOAD tpch")
    queries = dict(con.execute("SELECT query_nr, query FROM tpch_queries()").fetchall())
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")

    out: dict[str, dict] = {}
    n_ok = 0
    for n in range(1, 23):
        sql = queries[n].rstrip().rstrip(";")
        t0 = time.perf_counter()
        try:
            a = eng.execute(sql)
            dk = con.execute(sql).arrow()
            match, why = compare(a, dk)
            out[f"q{n:02d}"] = {
                "match": match,
                "rows": a.num_rows,
                "why": why,
                "sec": round(time.perf_counter() - t0, 3),
            }
            n_ok += int(match)
            print(f"q{n:02d}: {'MATCH' if match else 'MISMATCH: ' + str(why)} rows={a.num_rows}")
        except Exception as e:  # noqa: BLE001 - gate records, never aborts
            out[f"q{n:02d}"] = {"match": False, "err": str(e)[:300]}
            print(f"q{n:02d}: ERROR {str(e)[:200]}")
    artifact = {
        "sf": sf,
        "matched": n_ok,
        "total": 22,
        "queries": out,
        "note": "verbatim DuckDB tpch_queries() text through Engine.execute() on full-schema dbgen parquet (incl. partsupp); numeric cells compared rel_tol=1e-9",
    }
    path = os.path.join(HERE, "TPCH_VERBATIM.json")
    prior: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
    prior[f"sf{sf}"] = artifact
    with open(path, "w") as f:
        json.dump(prior, f, indent=1)
    print(f"{n_ok}/22 matched at sf={sf} -> {path}")
    return 0 if n_ok == 22 else 1


if __name__ == "__main__":
    raise SystemExit(main())
