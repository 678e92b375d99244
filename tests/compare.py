"""Differential-compare harness: Spark result vs DuckDB oracle.

Mirrors the driver's check (row count + columns + order-insensitive values)
so problems surface locally at sf0.001 before the sf0.01 gate runs.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
from typing import Any

import duckdb

from universql_spark.session import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v: Any) -> Any:
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if isinstance(v, dt.date):
        return ("d", v.isoformat())
    if isinstance(v, bytes):
        return ("b", v.hex())
    if isinstance(v, list):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    return v


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i].lower())
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    tbl = df.toArrow()
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows


def duck_result(con: duckdb.DuckDBPyConnection, sql: str) -> tuple[list[str], list[tuple]]:
    tbl = con.execute(sql).arrow()
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows


def canon_arrow(tbl):
    """Canonicalize an Arrow table for byte-level comparison: combine chunks,
    sort columns by name, sort rows by every column. take() rebuilds the
    buffers with pyarrow conventions, erasing engine-specific physical
    artifacts (DuckDB materializes all-valid validity bitmaps and sets
    padding bits to 1; Spark omits the bitmap and pads with 0)."""
    import pyarrow.compute as pc

    tbl = tbl.combine_chunks().select(sorted(tbl.column_names))
    if tbl.num_rows > 1:
        idx = pc.sort_indices(tbl, sort_keys=[(c, "ascending") for c in tbl.column_names])
        tbl = tbl.take(idx)
    else:
        tbl = tbl.take(list(range(tbl.num_rows)))
    return tbl


def arrow_ipc_probe(spark_tbl, duck_tbl) -> tuple[bool, str | None]:
    """(equal, note): byte-level equality of the two results after
    canonicalization — the strictest cross-engine check expressible locally;
    any deterministic hash over a canonicalized Arrow result matches when
    this is True. A False with note='type:' is usually a benign width
    difference (e.g. Spark year() -> int32 vs DuckDB -> int64) that
    value-level hashes tolerate; it is recorded, not failed, by the local
    gate."""
    import io

    import pyarrow as pa

    try:
        s, d = canon_arrow(spark_tbl), canon_arrow(duck_tbl)
        if s.schema != d.schema:
            diffs = [
                f"{f1.name}:{f1.type}!={f2.type}"
                for f1, f2 in zip(s.schema, d.schema)
                if f1.type != f2.type
            ]
            return False, "type:" + ",".join(diffs[:4]) if diffs else "type:field-order/meta"

        def ser(t):
            sink = io.BytesIO()
            with pa.ipc.new_stream(sink, t.schema) as w:
                w.write_table(t)
            return sink.getvalue()

        eq = ser(s) == ser(d)
        return eq, None if eq else "bytes"
    except Exception as e:  # noqa: BLE001 - informational probe only
        return False, f"probe-error:{type(e).__name__}"


def assert_match(name: str, spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> None:
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duck_result(con, oracle)
    assert sorted(c.lower() for c in s_cols) == sorted(c.lower() for c in d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")


# ---------------------------------------------------------------------------
# python (numpy) oracles — for deterministic operators whose training loops
# are not SQL-expressible (VERDICT r3 'Next round' #7). Each is a FULLY
# INDEPENDENT numpy re-derivation (no universql_spark.operators imports) of
# the documented algorithm + conventions, so a hash match is a genuine
# differential check, not the operator reading its own output.
# ---------------------------------------------------------------------------


def _load_embeddings(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").sort_by("vec_id")
    ids = np.array(t["vec_id"].to_pylist())
    X = np.array(t["embedding"].to_pylist(), dtype=float)
    return ids, X


def _np_lloyd(X, k: int, iters: int):
    """Lloyd's with the repo's documented conventions: init = k lowest-id
    vectors, ties -> lowest centroid index (np.argmin), empty clusters keep
    their previous centroid, returns the LAST PRE-UPDATE assignment."""
    import numpy as np

    C = X[:k].copy()
    a = None
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        for c in range(k):
            if (a == c).any():
                C[c] = X[a == c].mean(0)
    return a, C


def py_oracle_dedup_semantic(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """SemDeDup aggregate view: k=4/iters=3/threshold=0.45 over embeddings;
    within-cluster cosine pairs (id_a < id_b, cos rounded to 4dp before the
    threshold), dropped = distinct id_b, survivors = rest."""
    import numpy as np

    ids, X = _load_embeddings(sf_dir)
    a, _C = _np_lloyd(X, k=4, iters=3)
    nrm = np.sqrt((X * X).sum(1))
    out = []
    for c in sorted(set(a.tolist())):
        idx = np.where(a == c)[0]
        sub, sid, snrm = X[idx], ids[idx], nrm[idx]
        cos = (sub @ sub.T) / np.outer(snrm, snrm)
        n_pairs = 0
        dropped = set()
        for i in range(len(idx)):
            for j in range(i + 1, len(idx)):
                lo, hi = (i, j) if sid[i] < sid[j] else (j, i)
                if round(float(cos[lo, hi]), 4) >= 0.45:
                    n_pairs += 1
                    dropped.add(int(sid[hi]))
        out.append((int(c), int(len(idx) - len(dropped)), n_pairs, len(dropped)))
    return ["cluster", "n_survivors", "n_pairs", "n_dropped"], out


def py_oracle_ann_pq_topk(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """PQ+ADC with exact re-rank, independently in numpy: m=8 subspaces,
    k_codes=16, 10 Lloyd iters per subspace on the lowest-4096-id sample,
    ADC shortlist of rerank*k=50 per query (cos rounded 4dp, ties -> lower
    n_id), exact rerank to top 5. Queries: vec_id < 10, self excluded."""
    import numpy as np

    ids, X = _load_embeddings(sf_dir)
    m, k_codes, iters, k, rerank = 8, 16, 10, 5, 10
    dim = X.shape[1]
    sub = dim // m
    S = X[:4096]
    books = []
    for j in range(m):
        Sj = S[:, j * sub:(j + 1) * sub]
        C = Sj[:k_codes].copy()
        for _ in range(iters):
            d2 = ((Sj[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            asg = d2.argmin(1)
            for c in range(k_codes):
                if (asg == c).any():
                    C[c] = Sj[asg == c].mean(0)
        books.append(C)
    # encode every vector: per-subspace argmin code (ties -> lowest code)
    codes = np.stack([
        (((X[:, j * sub:(j + 1) * sub][:, None, :] - books[j][None, :, :]) ** 2)
         .sum(-1).argmin(1))
        for j in range(m)
    ], axis=1)  # (n, m)
    nrm = np.sqrt((X * X).sum(1))
    qn2 = np.stack([ (books[j] ** 2).sum(1) for j in range(m) ])  # (m, k_codes)
    q_idx = np.where(ids < 10)[0]
    out = []
    for qi in q_idx:
        q = X[qi]
        T = np.stack([
            books[j] @ q[j * sub:(j + 1) * sub] for j in range(m)
        ])  # (m, k_codes)
        approx = T[np.arange(m)[None, :], codes].sum(1)
        n_nrm_q = np.sqrt(qn2[np.arange(m)[None, :], codes].sum(1))
        with np.errstate(divide="ignore", invalid="ignore"):
            adc = np.round(approx / (nrm[qi] * n_nrm_q), 4)
        mask = ids != ids[qi]
        cand = sorted(
            ((float(adc[i]), int(ids[i])) for i in np.where(mask)[0]),
            key=lambda t: (-t[0], t[1]),
        )[: k * rerank]
        exact = sorted(
            ((round(float(X[np.where(ids == nid)[0][0]] @ q
                          / (nrm[np.where(ids == nid)[0][0]] * nrm[qi])), 4), nid)
             for _s, nid in cand),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for rank, (cos, nid) in enumerate(exact, 1):
            out.append((int(ids[qi]), nid, cos, rank))
    return ["q_id", "n_id", "cos", "rank"], out


#: name -> callable(sf_dir) -> (cols, rows); consulted by the LOCAL gate for
#: specs whose DuckDB oracle is None. (The driver gate runs SQL oracles
#: only — these upgrade the local evidence tier from rows-only to oracled.)


def py_oracle_embed_kmeans(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """k-means(8, 4 iters) assignments, independently in numpy with the
    repo's documented conventions (init = 8 lowest-id vectors, argmin ties
    to lowest index, empty clusters keep their centroid, LAST PRE-UPDATE
    assignment + its min-distance, rounded to 4dp)."""
    import numpy as np

    ids, X = _load_embeddings(sf_dir)
    k, iters = 8, 4
    C = X[:k].copy()
    a = d2min = None
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        d2min = d2.min(1)
        for c in range(k):
            if (a == c).any():
                C[c] = X[a == c].mean(0)
    rows = [
        (int(ids[i]), int(a[i]), round(float(d2min[i]), 4)) for i in range(len(ids))
    ]
    return ["id", "cluster", "dist2"], rows


def py_oracle_embed_pca_project(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """PCA(k=8) projection, independently in numpy: mean-centered covariance
    (biased), eigh, descending eigenvalues, deterministic component signs
    (first nonzero coordinate positive), projections rounded to 6dp — the
    same derivation the exact-equality pytest twin pins at sf0.001."""
    import numpy as np

    ids, X = _load_embeddings(sf_dir)
    mean = X.mean(0)
    w, vecs = np.linalg.eigh(np.cov((X - mean).T, bias=True))
    comps = vecs[:, ::-1][:, :8].T.copy()
    for row in comps:
        nz = row[np.abs(row) > 1e-12]
        if len(nz) and nz[0] < 0:
            row *= -1
    proj = np.round((X - mean) @ comps.T, 6)
    rows = [(int(ids[i]), [float(x) for x in proj[i]]) for i in range(len(ids))]
    return ["vec_id", "proj"], rows



def py_oracle_embed_cluster_profile(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Per-cluster count + exact 4dp-rounded dist2 sum, independently in
    numpy (same Lloyd conventions as py_oracle_embed_kmeans)."""
    import numpy as np

    cols, rows = py_oracle_embed_kmeans(sf_dir)
    agg: dict[int, list] = {}
    for _id, c, d2 in rows:
        a = agg.setdefault(c, [0, 0])
        a[0] += 1
        a[1] += round(d2 * 10000)  # exact integer accumulation of 4dp values
    out = [
        (int(c), int(n), round(t / 10000.0, 4)) for c, (n, t) in sorted(agg.items())
    ]
    return ["cluster", "n_members", "total_dist2"], out


PY_ORACLES = {
    "dedup_semantic": py_oracle_dedup_semantic,
    "ann_pq_topk": py_oracle_ann_pq_topk,
    "embed_kmeans": py_oracle_embed_kmeans,
    "embed_pca_project": py_oracle_embed_pca_project,
    "embed_cluster_profile": py_oracle_embed_cluster_profile,
}
