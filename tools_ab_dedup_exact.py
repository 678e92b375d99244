#!/usr/bin/env python
"""Interleaved A/B of dedup_exact: bucketed `documents` (r9 layout) vs the
plain resident layout (r8), same session (VERDICT r9 'Next round' #3)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import ensure_views
from universql_spark.session import _resident_path, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "12"))
SQL = (
    "SELECT md5(lower(trim(text))) AS content_hash, MIN(doc_id) AS keep_id, "
    "COUNT(*) AS n_copies FROM {tbl} GROUP BY md5(lower(trim(text)))"
)


def main() -> None:
    spark = get_spark("ab_dedup_exact", sf_dir=SF_DIR)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_views(spark, SF_DIR)  # `documents` -> bucketed catalog table (r9)
    plain = _resident_path(spark, SF_DIR, "documents") or f"{SF_DIR}/documents.parquet"
    spark.read.parquet(plain).createOrReplaceTempView("documents_plain")
    spark.table("documents").count()
    spark.table("documents_plain").count()

    variants = {"bucketed_r9": "documents", "plain_r8": "documents_plain"}
    # warm both
    for tbl in variants.values():
        for _ in range(3):
            spark.sql(SQL.format(tbl=tbl)).toArrow()

    times: dict[str, list[float]] = {k: [] for k in variants}
    for i in range(REPS * 2):
        k = list(variants)[i % 2]
        t0 = time.perf_counter()
        spark.sql(SQL.format(tbl=variants[k])).toArrow()
        times[k].append(time.perf_counter() - t0)
    out = {
        k: {
            "median_ms": round(1000 * statistics.median(v), 1),
            "best_ms": round(1000 * min(v), 1),
            "all_ms": [round(1000 * x, 1) for x in v],
        }
        for k, v in times.items()
    }
    out["plain_path"] = plain
    out["load_avg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
