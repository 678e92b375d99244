#!/usr/bin/env python
"""Correctness at 10x the driver-gate scale -> CORRECTNESS_SF1.json.

The driver gate and the full local gate both compare Spark vs DuckDB at
sf0.01; the scaling tables measure PERFORMANCE at sf1. This tool closes the
remaining gap — evidence that the VALUES also hold at scale: every TPC-H
spec (the suite with a real 10x fixture, tools_scaling.ensure_sf1's
dbgen(sf=1) cast to fixture parity) runs through the same differential
check as the local gate (row count + column set + order-insensitive
canonical values) against DuckDB executing the identical oracle SQL on the
same sf1 parquet.

Determinism conventions (DECIMAL-exact sums, deterministic LIMIT
tiebreaks, no raw timestamps) are what make this pass at ANY scale — a
convention that only held at toy scale would surface here.

Usage: python tools_correctness_sf1.py   [writes CORRECTNESS_SF1.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tests.compare import duck_connection, normalize_rows
from tools_scaling import SF1, ensure_sf1
from universql_spark.queries import load_all
from universql_spark.session import get_spark

#: LLM-pipeline specs gated on the 10x corpus (tools_scaling_llm fixture,
#: 50k docs / 20k vectors): SQL-oracled AND oracle-linear (hash-groupBy /
#: window / bounded-probe shapes — never the O(n^2) pair oracles, which
#: time out by design at this scale).
LLM_SPECS = [
    "dedup_exact",
    "text_tokens",
    "text_langid",
    "text_quality",
    "text_fingerprint",
    "text_char_entropy",
    "text_quality_mask",
    "text_gopher_rules",
    "text_vocab_topk",
    "corpus_seqlen_histogram",
    "embed_quantize_int8",
    "ann_hamming_topk",
    "ann_hamming_rerank_topk",
    "dedup_crossdoc_ngrams",
    "embed_matryoshka_recall",
    "corpus_pack_sequences",
    "dedup_substring_spans",
    "dedup_line_removal",
    "text_bm25_topk",
    # r8 continuation: MaxSim late-interaction on the 20k-vector fixture
    "ann_maxsim_topk",
]

#: r8 continuation: the new event-analytics / streaming-twin specs at 1M
#: events — all linear oracles, bounded outputs. stream_cms_cells is
#: excluded by design: its golden-value oracle is scale-pinned to the
#: sf0.001/sf0.01 gate fixtures (any other scale yields an honest
#: mismatch, never a silent pass).
EVENTS_SPECS = [
    "events_funnel_steps",
    "events_decay_features",
    "stream_static_enrich",
    "stream_user_profiles",
    "win_ordered_collect",
    "stream_view_click_outer",
    "stream_attrib_windowed",
    "graph_triangle_count",
]

#: ClickBench bench-tier specs gated on the 10x events table (1M rows —
#: tools_scaling_llm.ensure_events): bounded outputs (grouped aggregates,
#: LIMIT top-k), linear oracles.
CB_SPECS = [
    "cb_q00", "cb_q02", "cb_q04", "cb_q07", "cb_q09", "cb_q12", "cb_q15",
    "cb_q18", "cb_q20", "cb_q27", "cb_q29", "cb_q32", "cb_q36", "cb_q42",
]

#: DML specs gated at 10x (VERDICT r6 #7 — the one §2.2 family whose
#: driver/local evidence stopped at sf0.01): the partition- and
#: file-granular COW paths plus the Iceberg snapshot/merge ring run their
#: full Engine scripts against the 1M-row events fixture; the two
#: TPC-H-table-based specs (schema evolution on nation, Iceberg identity
#: partitioning on orders) run on the dbgen sf1 fixture.
DML_SPECS_EVENTS = [
    "dml_merge_partitioned", "dml_delete_partitioned", "dml_update_partitioned",
    "dml_plain_file_granular", "dml_insert_multi", "dml_stream_changes",
    "dml_iceberg_clone", "dml_iceberg_upsert_cdc", "dml_iceberg_snapshot_history",
    "dml_iceberg_merge_timetravel", "dml_iceberg_merge_on_read",
]
DML_SPECS_TPCH = ["dml_schema_evolution", "dml_iceberg_partitioned", "join_fuzzy_blocked"]


def _one(spec, name: str, spark, sf_dir: str, con, out: dict) -> None:
    rec: dict = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
        "sf_dir": sf_dir,
    }
    try:
        s_tbl = spec.spark(spark, sf_dir).toArrow()
        s_cols = s_tbl.column_names
        s_rows = [tuple(d[c] for c in s_cols) for d in s_tbl.to_pylist()]
        rec["spark_rows"] = len(s_rows)
        d_tbl = con.execute(spec.oracle).fetch_arrow_table()
        d_cols = d_tbl.column_names
        d_rows = [tuple(d[c] for c in d_cols) for d in d_tbl.to_pylist()]
        rec["oracle_rows"] = len(d_rows)
        rec["rows_match"] = len(s_rows) == len(d_rows)
        rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
        rec["hash_match"] = normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows)
    except Exception as e:  # noqa: BLE001 - the artifact records failures
        rec["err"] = f"{type(e).__name__}: {str(e)[:300]}"
        traceback.print_exc(limit=2, file=sys.stderr)
    out[name] = rec
    print(("ok  " if rec["hash_match"] else "BAD ") + name, rec["spark_rows"], flush=True)


def main() -> None:
    ensure_sf1()
    import tools_scaling_llm

    tools_scaling_llm.ensure_fixture()
    tools_scaling_llm.ensure_events()
    registry = load_all()
    sections = [
        (SF1, sorted(n for n in registry if n.startswith("tpch_q")) + DML_SPECS_TPCH),
        (
            tools_scaling_llm.SF1,
            [n for n in LLM_SPECS if registry[n].oracle]
            + CB_SPECS
            + EVENTS_SPECS
            + DML_SPECS_EVENTS,
        ),
    ]
    spark = get_spark("correctness_sf1", sf_dir=SF1)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict] = {}
    t0 = time.time()
    for sf_dir, names in sections:
        con = duck_connection(sf_dir)
        for name in names:
            _one(registry[name], name, spark, sf_dir, con, out)
    summary = {
        "specs_total": len(out),
        "all_match": sum(
            1 for r in out.values() if r["rows_match"] and r["schema_match"] and r["hash_match"]
        ),
        # fixture-tuned literals (NATION_7 etc.) don't exist in dbgen data,
        # so a few specs return 0 rows at sf1 — matching, but vacuously.
        # Disclosed so the artifact reads honestly.
        "nonempty_match": sum(
            1
            for r in out.values()
            if r["hash_match"] and (r["spark_rows"] or 0) > 0
        ),
        "empty_at_sf1": sorted(
            n for n, r in out.items() if r["hash_match"] and not r["spark_rows"]
        ),
        "errors": sum(1 for r in out.values() if r["err"]),
        "fixtures": sorted({r["sf_dir"] for r in out.values()}),
        "wall_sec": round(time.time() - t0, 1),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "CORRECTNESS_SF1.json"), "w") as f:
        json.dump({"summary": summary, "specs": out}, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
