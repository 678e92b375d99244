#!/usr/bin/env python
"""Scaling-curve evidence for the LLM-pipeline operators (VERDICT r5 #6).

The dedup/ANN 100 TB story rested on plan shape (hash-keyed equi-joins, no
payload on the wide shuffle); this tool adds the measurement: replan wall
time at sf0.1 vs a locally-generated 10x corpus (50k documents / 20k
embeddings) for the five headline LLM operators. The generator mirrors the
driver fixtures' shape — same 31-word vocabulary, language/source mix,
~50-word docs, a comparable near-dup/exact-dup injection rate, unit-norm
64-dim embeddings around 10 cluster centers — seed 42, deterministic. The
10x fixture is for SCALING measurement only; correctness gates run solely on
the driver fixtures.

Usage: python tools_scaling_llm.py   # prints the BENCH_NOTES markdown table
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "llm_sf1")
QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "text_tfidf_topk",
    "dedup_crossdoc_ngrams",
    "dedup_line_removal",
    "text_cms_heavy_hitters",
    "dedup_bloom_decontaminate",
    "text_pmi_collocations",
    "corpus_source_kl",
    "ann_hamming_topk",
    "dedup_ngram_containment",
    "ann_hamming_rerank_topk",
]
N_DOCS, N_VECS = 50_000, 20_000

VOCAB = (
    "batch part spark line column order small sort fast value scan hash slow "
    "group agg filter query big key window row table stream merge data a "
    "join scale plan page read"
).split()
LANGS = ["en"] * 41 + ["zh"] * 15 + ["es"] * 15 + ["fr"] * 15 + ["de"] * 14


def ensure_fixture() -> None:
    if os.path.exists(os.path.join(SF1, "documents.parquet")):
        return
    import random

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(SF1, exist_ok=True)
    rng = random.Random(42)
    texts: list[str] = []
    rows = []
    for i in range(N_DOCS):
        r = rng.random()
        if i > 100 and r < 0.002:  # exact duplicate of an earlier doc
            text = texts[rng.randrange(len(texts))]
        elif i > 100 and r < 0.007:  # near-duplicate: 1-2 word substitutions
            words = texts[rng.randrange(len(texts))].split()
            for _ in range(rng.randint(1, 2)):
                words[rng.randrange(len(words))] = rng.choice(VOCAB)
            text = " ".join(words)
        else:
            n = rng.randint(10, 100)
            text = " ".join(rng.choice(VOCAB) for _ in range(n))
        texts.append(text)
        rows.append(
            (i, text, rng.choice(LANGS), f"src{rng.randrange(20)}", len(text))
        )
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "source": [r[3] for r in rows],
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        f"{SF1}/documents.parquet",
    )
    nrng = np.random.default_rng(42)
    centers = nrng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = nrng.integers(0, 10, N_VECS)
    X = centers[labels] + 0.35 * nrng.standard_normal((N_VECS, 64))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(N_VECS), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32).tolist() for row in X],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([int(x) for x in labels], pa.int32()),
            }
        ),
        f"{SF1}/embeddings.parquet",
    )
    # the LLM specs only touch documents/embeddings, but register_testdata
    # loads every table — link the rest from sf0.1
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        dst = f"{SF1}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SF01}/{t}.parquet", dst)
    print(f"wrote 10x fixture -> {SF1}", flush=True)


#: 10x events (1M rows, 15k users) mirroring the driver fixture's shape —
#: same schema (timestamp[us]), value ranges, event-type domain, '{"k": N}'
#: props — so the ClickBench specs gate at 10x scale too (seed 4242,
#: deterministic). Replaces the sf0.1 symlink on first call.
N_EVENTS, N_USERS = 1_000_000, 15_000


def ensure_events() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = f"{SF1}/events.parquet"
    if os.path.exists(dst) and not os.path.islink(dst):
        return
    rng = np.random.default_rng(4242)
    base_us = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = base_us + rng.integers(0, span_us, N_EVENTS)
    types = np.array(["view", "click", "purchase", "signup", "error"])
    tidx = rng.choice(5, N_EVENTS, p=[0.45, 0.35, 0.1, 0.05, 0.05])
    k = rng.integers(0, 100, N_EVENTS)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
            "event_type": pa.array(types[tidx], pa.string()),
            "value": pa.array(np.round(rng.uniform(0, 560, N_EVENTS), 2), pa.float64()),
            "props": pa.array([f'{{"k": {v}}}' for v in k], pa.string()),
        }
    )
    if os.path.islink(dst):
        os.remove(dst)
    pq.write_table(tbl, dst)
    print(f"wrote 10x events -> {dst}", flush=True)


def main() -> None:
    ensure_fixture()
    from universql_spark.queries import ensure_views, load_all
    from universql_spark.session import get_spark

    registry = load_all()
    spark = get_spark("universql_spark_scaling_llm", sf_dir=SF1)
    results: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    for label, sf_dir in [("sf0.1", SF01), ("10x", SF1)]:
        ensure_views(spark, sf_dir)
        for t in ["documents", "embeddings"]:
            spark.table(t).count()  # warm footers + page cache
        for q in QUERIES:
            spec = registry[q]
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                spec.spark(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            results[q][label] = round(best, 3)
            print(f"{label} {q}: {best:.3f}s", flush=True)
    print("\n| operator | sf0.1 (s) | 10x corpus (s) | growth (10x data) |")
    print("|---|---|---|---|")
    for q in QUERIES:
        a, b = results[q]["sf0.1"], results[q]["10x"]
        print(f"| {q} | {a:.3f} | {b:.3f} | {b / a:.2f}x |")


if __name__ == "__main__":
    main()
