#!/usr/bin/env python
"""One more decade on the headline families (VERDICT r6 #5) -> DECADE.json.

The r6 gate proved values hold at 10x the driver scale (CORRECTNESS_SF1);
this tool pushes the headline families one further decade — where skew and
shuffle width actually bite — and hash-compares against DuckDB wherever
DuckDB stays tractable:

- TPC-H q1/q3/q5/q18 on dbgen(sf=10) (60M-row lineitem, 100x the sf0.1
  bench fixture, 1000x the driver gate): full value-hash vs DuckDB running
  the identical oracle SQL on the same parquet.
- dedup_exact / text_tfidf_topk on a 500k-doc corpus (10x the r6 LLM scale
  gate): value-hash vs DuckDB (both oracles are linear).
- dedup_minhash_lsh on the same 500k docs: WALL-CURVED only — its oracle is
  the O(n^2) brute-force pair join (>560 s at 5k docs, r6 BENCH_NOTES), so
  no engine can oracle it at this scale; recorded evidence is the Spark
  wall-clock curve 50k -> 500k plus the pair count.

Fixture generation is deterministic (dbgen; seeded corpus generator), so
re-runs are byte-stable. dbgen(sf=10) runs chunked (children=8) on a
disk-backed DuckDB database to bound memory; the scratch db is removed
after the parquet COPY.

Usage: python tools_scaling_decade.py   [writes DECADE.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tests.compare import duck_connection, normalize_rows
from universql_spark.queries import load_all
from universql_spark.session import get_spark

HERE = os.path.dirname(os.path.abspath(__file__))
SF01 = "/root/testdata/sf0.1"
SF10 = os.path.join(HERE, "data", "tpch_sf10")
DOCS500K = os.path.join(HERE, "data", "llm_500k")
TPCH_TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
AUX_TABLES = ["events", "documents", "embeddings"]

TPCH_QUERIES = ["tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q18_big_orders"]
DOC_QUERIES_ORACLED = ["dedup_exact", "text_tfidf_topk", "text_tokens"]
CB_QUERIES = [
    "cb_q00", "cb_q02", "cb_q04", "cb_q07", "cb_q09", "cb_q12", "cb_q15",
    "cb_q18", "cb_q20", "cb_q27", "cb_q29", "cb_q32", "cb_q36", "cb_q42",
]

N_DOCS = 500_000
N_EVENTS, N_USERS = 10_000_000, 150_000
EVENTS10M = os.path.join(HERE, "data", "events_10m")

#: r9 (VERDICT r8 #5): one more decade on the events axis — 100M rows
#: (1000x the driver's sf0.1 fixture), users scaled 10x with the rows so
#: per-user density stays constant. Run for the 5 CHEAPEST decade-green cb
#: specs (second point on the amortization curve at a scale where DuckDB's
#: oracle still terminates in minutes).
N_EVENTS_100M, N_USERS_100M = 100_000_000, 1_500_000
EVENTS100M = os.path.join(HERE, "data", "events_100m")
CB_CENTURY = ["cb_q12", "cb_q36", "cb_q42", "cb_q15", "cb_q20"]
#: r10 (VERDICT r9 #6): second points on the event-analytics amortization
#: curves — the funnel / decay-feature / windowed-collect family at 100M
#: events (they had 10M rows only). All three stay hash-comparable:
#: funnel returns 5 scalars, decay 1.5M per-user rows, windowed collect a
#: 20-row JSON-serialized head.
EVENTS_CENTURY = ["events_funnel_steps", "events_decay_features", "win_ordered_collect"]

#: r8 (VERDICT r7 #5): the ANN/embedding family's decade — 200k vectors
#: (100x the driver gate's 2k, 10x the llm-sf1 20k). IVF + two-stage
#: Hamming-rerank hash-compare vs DuckDB running the exact oracles;
#: embed_pca_project hash-compares vs the independent numpy oracle.
EMB200K = os.path.join(HERE, "data", "emb_200k")
N_VECS_DECADE = 200_000
ANN_QUERIES_ORACLED = [
    "ann_ivf_topk",
    "ann_hamming_rerank_topk",
    "ann_maxsim_topk",
    "ann_cosine_topk",
]
ANN_QUERIES_NUMPY = ["embed_pca_project"]
#: r8 continuation: the new event-analytics / streaming-twin / windowed
#: collect specs at 10M events (67 events/user x 150k users)
EVENTS_DECADE_NEW = [
    "join_asof",
    "events_funnel_steps",
    "events_decay_features",
    "stream_static_enrich",
    "win_ordered_collect",
    "stream_view_click_outer",
    "stream_attrib_windowed",
    # graph_triangle_count stops at the sf1 gate BY DESIGN: co-occurrence
    # graphs DENSIFY with event rate (at 10M events a 10-min window holds
    # ~460 co-purchasers -> hundreds of millions of edges and a wedge-join
    # blowup on ANY engine). The scale recipe is to shrink the window with
    # rate (edges ~ rate^2 x window); the spec doc records it.
]
#: blocking fuzzy join on the dbgen sf10 customer table (1.5M rows)
TPCH_DECADE_EXTRA = ["join_fuzzy_blocked"]
#: r8 (VERDICT r7 #5): one partitioned-DML decade row — the full Engine
#: MERGE script against the 10M-row events fixture.
DML_DECADE = ["dml_merge_partitioned"]


def ensure_emb200k() -> None:
    """200k-vector fixture, same generative process as the driver/llm-sf1
    embeddings (10 unit-norm cluster centers, 0.35 sigma, unit-normalized
    float32 x 64 dims), fresh seed — deterministic, byte-stable re-runs."""
    if os.path.exists(os.path.join(EMB200K, "embeddings.parquet")):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(EMB200K, exist_ok=True)
    nrng = np.random.default_rng(777)
    centers = nrng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = nrng.integers(0, 10, N_VECS_DECADE)
    X = centers[labels] + 0.35 * nrng.standard_normal((N_VECS_DECADE, 64))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS_DECADE), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32).tolist() for row in X],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([int(x) for x in labels], pa.int32()),
            }
        ),
        f"{EMB200K}/embeddings.parquet",
        row_group_size=8192,
    )
    for t in TPCH_TABLES + ["events", "documents"]:
        dst = f"{EMB200K}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)
    print(f"wrote 200k-vector fixture -> {EMB200K}", flush=True)


#: r9: one more decade on the similarity axis — 2M vectors (100x the
#: driver's sf0.1 fixture). Brute force pays the full corpus per probe;
#: IVF's pruning advantage should WIDEN with corpus size — this row
#: measures that claim instead of asserting it.
N_VECS_2M = 2_000_000
EMB2M = os.path.join(HERE, "data", "emb_2m")
ANN_CENTURY = ["ann_cosine_topk", "ann_ivf_topk"]


def ensure_emb2m() -> None:
    """2M-vector fixture, same generative process as emb_200k (10 unit-norm
    cluster centers, 0.35 sigma, unit-normalized float32 x 64), fresh seed,
    written in 200k-row chunks to bound resident memory."""
    if os.path.exists(os.path.join(EMB2M, "embeddings.parquet")):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(EMB2M, exist_ok=True)
    nrng = np.random.default_rng(778)
    centers = nrng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    writer = None
    chunk = 200_000
    for start in range(0, N_VECS_2M, chunk):
        n = min(chunk, N_VECS_2M - start)
        labels = nrng.integers(0, 10, n)
        X = centers[labels] + 0.35 * nrng.standard_normal((n, 64))
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        t = pa.table(
            {
                "vec_id": pa.array(range(start, start + n), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32).tolist() for row in X],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([int(x) for x in labels], pa.int32()),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(f"{EMB2M}/embeddings.parquet", t.schema)
        writer.write_table(t, row_group_size=8192)
    writer.close()
    for t in TPCH_TABLES + ["events", "documents"]:
        dst = f"{EMB2M}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)
    print(f"wrote 2M-vector fixture -> {EMB2M}", flush=True)


def _gen_events(dest: str, n_events: int, n_users: int, seed: int) -> None:
    """Chunked synthetic events writer (same schema/domains/props format as
    the sf fixtures, 1M-row chunks so resident memory stays bounded)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(dest, exist_ok=True)
    rng = np.random.default_rng(seed)
    base_us = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span_us = 30 * 24 * 3600 * 1_000_000
    etypes = np.array(["click", "view", "purchase", "signup", "scroll"])
    writer = None
    chunk = 1_000_000
    for start in range(0, n_events, chunk):
        n = min(chunk, n_events - start)
        ts = base_us + rng.integers(0, span_us, n)
        t = pa.table(
            {
                "event_id": pa.array(range(start, start + n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
                "event_type": pa.array(etypes[rng.integers(0, 5, n)]),
                "value": pa.array(rng.uniform(0, 1000, n).round(4), pa.float64()),
                "props": pa.array(['{"k": %d}' % k for k in rng.integers(0, 100, n)]),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(f"{dest}/events.parquet", t.schema)
        writer.write_table(t, row_group_size=1_048_576)
        if (start // chunk) % 10 == 0:
            print(f"  events chunk {start + n}/{n_events}", flush=True)
    writer.close()
    for t in TPCH_TABLES + ["documents", "embeddings"]:
        dst = f"{dest}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)


def ensure_events100m() -> None:
    if not os.path.exists(os.path.join(EVENTS100M, "events.parquet")):
        _gen_events(EVENTS100M, N_EVENTS_100M, N_USERS_100M, 4242421)


def ensure_events10m() -> None:
    """10M-row events fixture (10x the CORRECTNESS_SF1 events decade),
    mirroring tools_scaling_llm.ensure_events' shape — same schema/domains/
    props format, seed 424242 — written in 1M-row chunks so generation
    stays under a few hundred MB of resident memory."""
    if os.path.exists(os.path.join(EVENTS10M, "events.parquet")):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(EVENTS10M, exist_ok=True)
    rng = np.random.default_rng(424242)
    base_us = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span_us = 30 * 24 * 3600 * 1_000_000
    etypes = np.array(["click", "view", "purchase", "signup", "scroll"])
    writer = None
    chunk = 1_000_000
    for start in range(0, N_EVENTS, chunk):
        n = min(chunk, N_EVENTS - start)
        ts = base_us + rng.integers(0, span_us, n)
        t = pa.table(
            {
                "event_id": pa.array(range(start, start + n), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(rng.integers(0, N_USERS, n), pa.int64()),
                "event_type": pa.array(etypes[rng.integers(0, 5, n)]),
                "value": pa.array(rng.uniform(0, 1000, n).round(4), pa.float64()),
                "props": pa.array(
                    ['{"k": %d}' % k for k in rng.integers(0, 100, n)]
                ),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(
                f"{EVENTS10M}/events.parquet", t.schema
            )
        writer.write_table(t, row_group_size=1_048_576)
        print(f"  events chunk {start + n}/{N_EVENTS}", flush=True)
    writer.close()
    for t in TPCH_TABLES + ["documents", "embeddings"]:
        dst = f"{EVENTS10M}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)


def ensure_sf10() -> None:
    if os.path.exists(os.path.join(SF10, "lineitem.parquet")):
        return
    import duckdb

    os.makedirs(SF10, exist_ok=True)
    scratch = os.path.join(SF10, "_dbgen_scratch.duckdb")
    con = duckdb.connect(scratch)  # disk-backed: dbgen spills, not OOMs
    con.execute("LOAD tpch")
    children = 8
    for step in range(children):
        print(f"dbgen(sf=10) chunk {step + 1}/{children}...", flush=True)
        con.execute(f"CALL dbgen(sf=10, children={children}, step={step})")
    # same fixture-parity value mapping as tools_scaling.ensure_sf1
    overrides = {
        "n_name": "'NATION_' || CAST(n_nationkey AS VARCHAR)",
        "p_type": "split_part(p_type, ' ', 1)",
        # fixture p_name is an 8x8 adjective-noun vocabulary ('small ring');
        # key-derived remap keeps q20's LIKE 'small%' ~1/8-selective at
        # every scale (dbgen's color-list names never match it — the r7
        # sf1 gate's tpch_q20_supply row was empty for exactly this reason)
        "p_name": "list_value('small','hot','red','blue','large','old','cold','new')[(p_partkey % 8) + 1] || ' ' || list_value('widget','plate','gear','bolt','rod','ring','gizmo','anvil')[((p_partkey // 8) % 8) + 1]",
    }
    for t in TPCH_TABLES:
        cols = con.execute(f"DESCRIBE SELECT * FROM '{SF01}/{t}.parquet'").fetchall()
        sel = ", ".join(
            f"CAST({overrides.get(c, c)} AS {typ}) AS {c}" for c, typ, *_ in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM {t}) TO '{SF10}/{t}.parquet' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 1048576)"
        )
        print(f"  wrote {t}", flush=True)
    con.close()
    os.remove(scratch)
    for t in AUX_TABLES:
        dst = f"{SF10}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SF01}/{t}.parquet", dst)


def _gen_docs(dest: str, n_docs: int, seed: int) -> None:
    """Deterministic corpus generator — the tools_scaling_llm 50k process
    (identical vocab/length/duplication-rate mix) at any size/seed so the
    minhash wall-curve compares like with like across axes."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools_scaling_llm import LANGS, VOCAB

    os.makedirs(dest, exist_ok=True)
    rng = random.Random(seed)
    texts: list[str] = []
    ids, langs, srcs, lens = [], [], [], []
    for i in range(n_docs):
        r = rng.random()
        if i > 100 and r < 0.002:
            text = texts[rng.randrange(len(texts))]
        elif i > 100 and r < 0.007:
            words = texts[rng.randrange(len(texts))].split()
            for _ in range(rng.randint(1, 2)):
                words[rng.randrange(len(words))] = rng.choice(VOCAB)
            text = " ".join(words)
        else:
            n = rng.randint(10, 100)
            text = " ".join(rng.choice(VOCAB) for _ in range(n))
        texts.append(text)
        ids.append(i)
        langs.append(rng.choice(LANGS))
        srcs.append(f"src{rng.randrange(20)}")
        lens.append(len(text))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": texts,
                "lang": langs,
                "source": srcs,
                "n_chars": pa.array(lens, pa.int64()),
            }
        ),
        f"{dest}/documents.parquet",
        row_group_size=65536,
    )
    for t in TPCH_TABLES + ["events", "embeddings"]:
        dst = f"{dest}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)


def ensure_docs500k() -> None:
    if not os.path.exists(os.path.join(DOCS500K, "documents.parquet")):
        _gen_docs(DOCS500K, N_DOCS, 4343)


#: r10 (VERDICT r9 #6): second point on the minhash amortization curve —
#: 2M docs (4x the 500k axis, 40x the llm-sf1 gate). Wall-curve only:
#: the exact oracle is the O(n^2) brute-force pair join no engine can run
#: at this size (>560 s at 5k docs already, r6 BENCH_NOTES).
N_DOCS_2M = 2_000_000
DOCS2M = os.path.join(HERE, "data", "llm_2m")


def ensure_docs2m() -> None:
    if not os.path.exists(os.path.join(DOCS2M, "documents.parquet")):
        _gen_docs(DOCS2M, N_DOCS_2M, 9191)


def _hash_one(spec, name, spark, sf_dir, con, out):
    rec = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": None, "oracle_rows": None,
        "spark_sec": None, "duck_sec": None, "err": None, "sf_dir": sf_dir,
    }
    try:
        t0 = time.perf_counter()
        s_tbl = spec.spark(spark, sf_dir).toArrow()
        rec["spark_sec"] = round(time.perf_counter() - t0, 2)
        s_cols = s_tbl.column_names
        s_rows = [tuple(d[c] for c in s_cols) for d in s_tbl.to_pylist()]
        rec["spark_rows"] = len(s_rows)
        t0 = time.perf_counter()
        d_tbl = con.execute(spec.oracle).fetch_arrow_table()
        rec["duck_sec"] = round(time.perf_counter() - t0, 2)
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
    print(("ok  " if rec["hash_match"] else "BAD ") + name,
          rec["spark_rows"], f"spark {rec['spark_sec']}s duck {rec['duck_sec']}s",
          flush=True)


def _hash_one_numpy(spec, name, spark, sf_dir, py_fn, out):
    """Spark result vs the independent numpy oracle (tests/compare.py
    PY_ORACLES) — the same comparison the local gate runs, at decade scale."""
    rec = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": None, "oracle_rows": None,
        "spark_sec": None, "numpy_sec": None, "err": None, "sf_dir": sf_dir,
        "oracle": "numpy",
    }
    try:
        t0 = time.perf_counter()
        s_tbl = spec.spark(spark, sf_dir).toArrow()
        rec["spark_sec"] = round(time.perf_counter() - t0, 2)
        s_cols = s_tbl.column_names
        s_rows = [tuple(d[c] for c in s_cols) for d in s_tbl.to_pylist()]
        rec["spark_rows"] = len(s_rows)
        t0 = time.perf_counter()
        d_cols, d_rows = py_fn(sf_dir)
        rec["numpy_sec"] = round(time.perf_counter() - t0, 2)
        rec["oracle_rows"] = len(d_rows)
        rec["rows_match"] = len(s_rows) == len(d_rows)
        rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
        rec["hash_match"] = normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows)
    except Exception as e:  # noqa: BLE001
        rec["err"] = f"{type(e).__name__}: {str(e)[:300]}"
        traceback.print_exc(limit=2, file=sys.stderr)
    out[name] = rec
    print(("ok  " if rec["hash_match"] else "BAD ") + name,
          rec["spark_rows"], f"spark {rec['spark_sec']}s numpy {rec['numpy_sec']}s",
          flush=True)


#: DuckDB twin of tests/test_clickbench_verbatim.HITS2_VIEW — the same
#: column synthesis over events, spelled in DuckDB's dialect
#: (json_extract_string for get_json_object; everything else is ANSI).
DUCK_HITS2_VIEW = """CREATE OR REPLACE VIEW hits2 AS
SELECT
  event_id AS WatchID,
  user_id AS UserID,
  CAST(user_id % 10 AS INT) AS CounterID,
  CAST(json_extract_string(props, '$.k') AS INT) AS ClientIP,
  CAST(user_id % 10 AS INT) AS RegionID,
  CAST(json_extract_string(props, '$.k') AS INT) AS AdvEngineID,
  CAST(user_id % 5 AS INT) AS SearchEngineID,
  event_type AS SearchPhrase,
  CAST(user_id % 3 AS INT) AS MobilePhone,
  event_type AS MobilePhoneModel,
  props AS URL,
  props AS Title,
  props AS Referer,
  ts AS EventTime,
  CAST(ts AS DATE) AS EventDate,
  value AS ResolutionWidth,
  CAST(user_id % 2 AS INT) AS IsRefresh,
  event_id % 1000 AS URLHash,
  event_id % 1000 AS RefererHash,
  CAST(user_id % 7 - 1 AS INT) AS TraficSourceID,
  CAST(user_id % 2 AS INT) AS IsLink,
  CAST(user_id % 2 AS INT) AS IsDownload,
  CAST(user_id % 3 AS INT) AS DontCountHits,
  CAST(json_extract_string(props, '$.k') AS INT) AS WindowClientWidth,
  CAST(user_id % 10 AS INT) AS WindowClientHeight
FROM events"""


def _naive(rows):
    """Cross-engine TYPE-class normalization for verbatim text (which can't
    be rewritten to the determinism conventions): tz-aware -> naive
    timestamps (convention #2), and integral Decimals -> int (DuckDB's
    SUM(INT) widens to HUGEINT and arrives as Decimal; Spark's stays
    BIGINT — same value, different arrow type)."""
    import datetime
    import decimal

    def fix(v):
        if isinstance(v, datetime.datetime) and v.tzinfo is not None:
            return v.replace(tzinfo=None)
        if isinstance(v, decimal.Decimal):
            return int(v) if v == v.to_integral_value() else float(v)
        return v

    return [tuple(fix(v) for v in r) for r in rows]


def run_verbatim_decade(spark, out: dict) -> None:
    """The reference's OWN benchmark corpus, untouched text, through the
    dialect path (Engine.execute) against the 10M-row events fixture —
    hash-compared against DuckDB running the identical verbatim text over
    its own hits2 view (VERDICT r7 #6). Top-k queries whose ORDER BY lacks
    a full tiebreak can legitimately pick different boundary-tie rows per
    engine; those rows record hash_match=false with a boundary_tie
    diagnosis (row counts equal + the sorted ORDER-BY-metric multiset
    equal), exactly the ambiguity the adapted cb_q* specs remove with
    deterministic tiebreaks."""
    import duckdb

    from tests.test_clickbench_verbatim import HITS2_VIEW, SQL_PATH
    from universql_spark.engine import Engine
    from universql_spark.queries import ensure_views

    ensure_views(spark, EVENTS10M)
    eng = Engine(spark=spark, sf_dir=EVENTS10M)
    eng.execute(HITS2_VIEW)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{EVENTS10M}/events.parquet'"
    )
    con.execute(DUCK_HITS2_VIEW)
    with open(SQL_PATH) as f:
        queries = [
            line.strip().rstrip(";")
            for line in f
            if line.strip().upper().startswith("SELECT")
        ]
    verb: dict[str, dict] = {}
    for i, q in enumerate(queries):
        name = f"verbatim_q{i:02d}"
        rec = {"hash_match": None, "rows_match": None, "spark_rows": None,
               "oracle_rows": None, "spark_sec": None, "duck_sec": None,
               "boundary_tie": False, "fp_ulp": False,
               "unordered_limit": False, "err": None}
        try:
            t0 = time.perf_counter()
            s_tbl = eng.execute(q)
            rec["spark_sec"] = round(time.perf_counter() - t0, 2)
            s_cols = s_tbl.column_names
            s_rows = _naive([tuple(d[c] for c in s_cols) for d in s_tbl.to_pylist()])
            rec["spark_rows"] = len(s_rows)
            t0 = time.perf_counter()
            d_tbl = con.execute(q).fetch_arrow_table()
            rec["duck_sec"] = round(time.perf_counter() - t0, 2)
            d_cols = d_tbl.column_names
            d_rows = _naive([tuple(d[c] for c in d_cols) for d in d_tbl.to_pylist()])
            rec["oracle_rows"] = len(d_rows)
            rec["rows_match"] = len(s_rows) == len(d_rows)
            # column names differ (unaliased aggregates render per-engine);
            # verbatim compare is positional on sorted row tuples
            rec["hash_match"] = sorted(map(repr, s_rows)) == sorted(map(repr, d_rows))
            qup = q.upper()
            if not rec["hash_match"] and rec["rows_match"]:
                # expected-divergence diagnoses for verbatim text (the
                # adapted cb_q* specs remove each with a convention):
                # (a) raw SUM(double): FP addition is not associative —
                #     Spark sums in partition order, DuckDB in its own;
                #     equal to within ULPs (determinism convention #1)
                if " LIMIT " not in qup or " ORDER BY " in qup:
                    import math

                    def _close(a, b):
                        if isinstance(a, float) and isinstance(b, float):
                            return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
                        return repr(a) == repr(b)

                    sa = sorted(s_rows, key=repr)
                    sb = sorted(d_rows, key=repr)
                    rec["fp_ulp"] = all(
                        len(ra) == len(rb) and all(map(_close, ra, rb))
                        for ra, rb in zip(sa, sb)
                    )
                # (b) LIMIT with no ORDER BY: each engine returns an
                #     arbitrary row subset — underdetermined by the SQL
                elif " ORDER BY " not in qup:
                    rec["unordered_limit"] = True
            if not rec["hash_match"] and rec["rows_match"] and not rec["fp_ulp"] \
                    and not rec["unordered_limit"] and " LIMIT " in qup:
                # boundary-tie diagnosis: same multiset of numeric values
                # per column position EXCEPT the free (untied) key columns —
                # approximated as: every column's sorted multiset matches
                # for all columns that are not strings/ids, and the rows
                # that differ are confined to the tail. Record the per-
                # column multiset comparison; the adapted cb_q* specs carry
                # the deterministic value evidence.
                ncols = len(s_rows[0]) if s_rows else 0
                col_eq = [
                    sorted(map(repr, (r[c] for r in s_rows)))
                    == sorted(map(repr, (r[c] for r in d_rows)))
                    for c in range(ncols)
                ]
                rec["boundary_tie"] = any(col_eq)
                rec["cols_multiset_equal"] = col_eq
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {str(e)[:200]}"
        verb[name] = rec
        status = "ok  " if rec["hash_match"] else ("tie " if rec["boundary_tie"] else "BAD ")
        print(f"{status}{name} rows={rec['spark_rows']} "
              f"spark {rec['spark_sec']}s duck {rec['duck_sec']}s", flush=True)
    out["verbatim_10m"] = {
        "total": len(queries),
        "hash_match": sum(1 for r in verb.values() if r["hash_match"]),
        "boundary_tie": sum(1 for r in verb.values() if r["boundary_tie"]),
        "fp_ulp": sum(1 for r in verb.values() if r["fp_ulp"]),
        "unordered_limit": sum(1 for r in verb.values() if r["unordered_limit"]),
        "unexplained": sum(
            1 for r in verb.values()
            if not (r["hash_match"] or r["boundary_tie"] or r["fp_ulp"]
                    or r["unordered_limit"] or r["err"])
        ),
        "errors": sum(1 for r in verb.values() if r["err"]),
        "queries": verb,
    }


def run_stream_decade(spark, out: dict) -> None:
    """Structured Streaming at 10M rows (r8): the tumbling-window pipeline
    (streaming/windows.py — watermark + window(), the operators a real
    stream runs) drains the 10M-event fixture as a file stream
    (availableNow trigger, memory sink) and must hash-match BOTH its batch
    twin (stream_tumbling_counts) and DuckDB computing the same windows —
    the stream==batch equivalence the pytest suite pins at sf0.001,
    re-proven three orders of magnitude up."""
    import duckdb

    from universql_spark.queries import ensure_views, load_all
    from universql_spark.streaming import windows as SW

    registry = load_all()
    ensure_views(spark, EVENTS10M)
    rec = {"stream_rows": None, "batch_rows": None, "oracle_rows": None,
           "stream_eq_batch": None, "hash_match": None,
           "stream_sec": None, "err": None, "sf_dir": EVENTS10M}
    try:
        agg = SW.tumbling_counts(SW.events_stream(spark, EVENTS10M))
        t0 = time.perf_counter()
        SW.run_to_memory(agg, "decade_stream_tc")
        rec["stream_sec"] = round(time.perf_counter() - t0, 2)
        s_tbl = spark.table("decade_stream_tc").toArrow()
        s_cols = list(s_tbl.column_names)
        s_rows = [tuple(d[c] for c in s_cols) for d in s_tbl.to_pylist()]
        rec["stream_rows"] = len(s_rows)
        spec = registry["stream_tumbling_counts"]
        b_tbl = spec.spark(spark, EVENTS10M).toArrow()
        b_cols = list(b_tbl.column_names)
        b_rows = [tuple(d[c] for c in b_cols) for d in b_tbl.to_pylist()]
        rec["batch_rows"] = len(b_rows)
        rec["stream_eq_batch"] = normalize_rows(s_cols, s_rows) == normalize_rows(b_cols, b_rows)
        con = duck_connection(EVENTS10M)
        d_tbl = con.execute(spec.oracle).fetch_arrow_table()
        d_cols = list(d_tbl.column_names)
        d_rows = [tuple(d[c] for c in d_cols) for d in d_tbl.to_pylist()]
        rec["oracle_rows"] = len(d_rows)
        rec["hash_match"] = (
            rec["stream_eq_batch"]
            and normalize_rows(s_cols, s_rows) == normalize_rows(d_cols, d_rows)
        )
    except Exception as e:  # noqa: BLE001
        rec["err"] = f"{type(e).__name__}: {str(e)[:300]}"
        traceback.print_exc(limit=2, file=sys.stderr)
    out["stream_tumbling_10m"] = rec
    print(("ok  " if rec["hash_match"] else "BAD ") + "stream_tumbling_10m",
          rec["stream_rows"], f"stream {rec['stream_sec']}s", flush=True)


def main() -> None:
    ensure_sf10()
    ensure_docs500k()
    registry = load_all()
    out: dict[str, dict] = {}
    t_start = time.time()

    spark = get_spark("scaling_decade", sf_dir=SF10)
    spark.sparkContext.setLogLevel("ERROR")

    def _warm(sf_dir: str, tables: list[str], con=None) -> None:
        """Hot-run methodology (same as bench.py): the first registration
        pays any ONE-TIME resident/bucketed ingest, and a count per table
        warms parquet footers + OS page cache on BOTH engines — storage
        and cache costs must not land in the first spec's spark_sec
        (r9: the 100M-events generation evicted the sf10 fixture from the
        page cache and inflated both engines' rows 3-9x)."""
        from universql_spark.queries import ensure_views  # noqa: PLC0415

        ensure_views(spark, sf_dir)
        for t in tables:
            spark.table(t).count()
            if con is not None:
                con.execute(f"SELECT COUNT(*) FROM {t}").fetchone()

    con = duck_connection(SF10)
    _warm(SF10, TPCH_TABLES, con)
    for name in TPCH_QUERIES + TPCH_DECADE_EXTRA:
        _hash_one(registry[name], name, spark, SF10, con, out)
    con = duck_connection(DOCS500K)
    _warm(DOCS500K, ["documents"], con)
    for name in DOC_QUERIES_ORACLED:
        _hash_one(registry[name], name, spark, DOCS500K, con, out)
    ensure_events10m()
    con = duck_connection(EVENTS10M)
    _warm(EVENTS10M, ["events"], con)
    for name in CB_QUERIES:
        _hash_one(registry[name], name, spark, EVENTS10M, con, out)
    for name in EVENTS_DECADE_NEW:
        _hash_one(registry[name], name, spark, EVENTS10M, con, out)
    # r8: ANN/embedding decade (VERDICT r7 #5)
    ensure_emb200k()
    con = duck_connection(EMB200K)
    for name in ANN_QUERIES_ORACLED:
        _hash_one(registry[name], name, spark, EMB200K, con, out)
    from tests.compare import PY_ORACLES

    for name in ANN_QUERIES_NUMPY:
        _hash_one_numpy(registry[name], name, spark, EMB200K, PY_ORACLES[name], out)
    # r9: similarity century — 2M vectors for brute-force vs IVF
    ensure_emb2m()
    con = duck_connection(EMB2M)
    _warm(EMB2M, ["embeddings"], con)
    ann_century: dict[str, dict] = {}
    for name in ANN_CENTURY:
        _hash_one(registry[name], name, spark, EMB2M, con, ann_century)
    for name, rec in ann_century.items():
        out[f"{name}_2m"] = rec
    # r8: partitioned DML at 10M events (VERDICT r7 #5)
    con = duck_connection(EVENTS10M)
    for name in DML_DECADE:
        _hash_one(registry[name], name, spark, EVENTS10M, con, out)
    # r9 (VERDICT r8 #5): the century axis — 100M events for the 5 cheapest
    # decade-green cb specs, recorded under <name>_100m keys
    ensure_events100m()
    con = duck_connection(EVENTS100M)
    _warm(EVENTS100M, ["events"], con)
    century: dict[str, dict] = {}
    for name in CB_CENTURY + EVENTS_CENTURY:
        _hash_one(registry[name], name, spark, EVENTS100M, con, century)
    for name, rec in century.items():
        out[f"{name}_100m"] = rec
    # r8: the verbatim ClickBench corpus at 10M events (VERDICT r7 #6)
    run_verbatim_decade(spark, out)
    # r8: Structured Streaming at 10M events (stream == batch == DuckDB)
    run_stream_decade(spark, out)

    # minhash wall-curve: oracle is O(n^2) — wall + pair count only
    from tools_scaling_llm import SF1 as LLM50K, ensure_fixture

    ensure_fixture()
    mh = registry["dedup_minhash_lsh"]
    ensure_docs2m()
    curve = {}
    for label, d in [("50k", LLM50K), ("500k", DOCS500K), ("2m", DOCS2M)]:
        t0 = time.perf_counter()
        n = mh.spark(spark, d).count()
        curve[label] = {"wall_sec": round(time.perf_counter() - t0, 2), "pairs": n}
        print(f"minhash {label}: {curve[label]}", flush=True)
    out["dedup_minhash_lsh_curve"] = curve

    hash_spec_names = (
        TPCH_QUERIES + TPCH_DECADE_EXTRA + DOC_QUERIES_ORACLED + CB_QUERIES
        + EVENTS_DECADE_NEW + ANN_QUERIES_ORACLED + ANN_QUERIES_NUMPY + DML_DECADE
        + [f"{n}_100m" for n in CB_CENTURY + EVENTS_CENTURY]
        + [f"{n}_2m" for n in ANN_CENTURY]
    )
    summary = {
        "hash_specs": len(hash_spec_names),
        # count ONLY the named hash specs — out also holds the verbatim /
        # stream / curve dicts whose truthy sub-keys must not be counted
        "all_match": sum(
            1 for n in hash_spec_names if out.get(n, {}).get("hash_match")
        ),
        "errors": sum(1 for r in out.values() if r.get("err")),
        "verbatim_hash_match": out.get("verbatim_10m", {}).get("hash_match"),
        "verbatim_boundary_tie": out.get("verbatim_10m", {}).get("boundary_tie"),
        "verbatim_fp_ulp": out.get("verbatim_10m", {}).get("fp_ulp"),
        "verbatim_unordered_limit": out.get("verbatim_10m", {}).get("unordered_limit"),
        "verbatim_unexplained": out.get("verbatim_10m", {}).get("unexplained"),
        "verbatim_errors": out.get("verbatim_10m", {}).get("errors"),
        "stream_10m_match": out.get("stream_tumbling_10m", {}).get("hash_match"),
        "wall_sec": round(time.time() - t_start, 1),
    }
    with open(os.path.join(HERE, "DECADE.json"), "w") as f:
        json.dump({"summary": summary, "specs": out}, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
