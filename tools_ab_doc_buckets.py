#!/usr/bin/env python
"""Interleaved A/B: documents bucketed 8-wide vs 32-wide at sf0.1, across
every bench spec that touches documents (VERDICT r9 'Next round' #3)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import ensure_views, load_all
from universql_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "8"))
SPECS = ["dedup_exact", "text_tokens", "text_tfidf_topk", "dedup_minhash_lsh"]


def main() -> None:
    spark = get_spark("ab_doc_buckets", sf_dir=SF_DIR)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_views(spark, SF_DIR)
    registry = load_all()
    specs = {n: registry[n] for n in SPECS}
    spark.table("documents").count()

    # current 32-wide bucketed catalog table backing `documents`
    cat32 = next(
        t.name for t in spark.catalog.listTables() if t.name.startswith("uq_bkt_documents_32")
    )
    # materialize an 8-bucket variant beside it
    src = f"{SF_DIR}/documents.parquet"
    st = os.stat(src)
    dest8 = f"/tmp/uq_ab_doc_b8_{st.st_size}_{st.st_mtime_ns}"
    cat8 = f"uq_ab_doc8_{st.st_size}_{st.st_mtime_ns}"
    if not os.path.exists(os.path.join(dest8, "_SUCCESS")):
        (
            spark.read.parquet(src)
            .repartition(8, "doc_id")
            .write.mode("overwrite")
            .option("path", dest8)
            .bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .saveAsTable(cat8 + "_w")
        )
        import shutil

        shutil.move(f"/tmp/universql_spark_warehouse/{cat8.lower()}_w", dest8) if os.path.exists(
            f"/tmp/universql_spark_warehouse/{cat8.lower()}_w"
        ) else None
    if not spark.catalog.tableExists(cat8):
        schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in spark.read.parquet(src).schema.fields
        )
        loc = dest8 if os.path.exists(os.path.join(dest8, "_SUCCESS")) else None
        if loc is None:
            # saveAsTable left it in the warehouse under cat8_w — reuse that
            cat8 = cat8 + "_w"
        else:
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS {cat8} ({schema}) USING parquet "
                f"CLUSTERED BY (doc_id) SORTED BY (doc_id) INTO 8 BUCKETS LOCATION '{loc}'"
            )

    variants = {"b32": cat32, "b8": cat8}
    for v in variants.values():
        spark.table(v).count()

    def set_docs(cat: str) -> None:
        spark.table(cat).createOrReplaceTempView("documents")

    # warm both variants across all specs
    for v in variants.values():
        set_docs(v)
        for s in specs.values():
            for _ in range(2):
                s.spark(spark, SF_DIR).toArrow()

    times: dict[str, dict[str, list[float]]] = {k: {n: [] for n in specs} for k in variants}
    keys = list(variants)
    for i in range(REPS * 2):
        k = keys[i % 2]
        set_docs(variants[k])
        for n, s in specs.items():
            t0 = time.perf_counter()
            s.spark(spark, SF_DIR).toArrow()
            times[k][n].append(time.perf_counter() - t0)
    set_docs(cat32)  # restore

    out = {}
    for k in variants:
        out[k] = {
            n: {
                "median_ms": round(1000 * statistics.median(v), 1),
                "best_ms": round(1000 * min(v), 1),
            }
            for n, v in times[k].items()
        }
        out[k]["sum_best_ms"] = round(sum(min(v) for v in times[k].values()) * 1000, 1)
    out["load_avg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
