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
        # IEEE -0.0 == 0.0 but repr() distinguishes them; engines disagree
        # on the sign of a rounded-to-zero result (numpy round(-1e-9, 6)
        # -> -0.0, Spark round -> 0.0 — 4 cells of 1.6M at the PCA decade)
        return ("f", repr(v + 0.0 if v == 0.0 else v))
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
    rows = [
        (int(ids[i]), int(d), float(proj[i][d]))
        for i in range(len(ids))
        for d in range(proj.shape[1])
    ]
    return ["vec_id", "dim", "x"], rows



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


# ---------------------------------------------------------------------------
# Portable XXH64 (public algorithm, Collet) matching Spark's xxhash64()
# expression — seed 42, per-argument chaining, 8-byte path for long/array
# elements, 4-byte path for int literals, raw UTF-8 bytes for strings.
# Lets the four Spark-hash-dependent specs (dedup_simhash, ann_lsh_buckets,
# ann_lsh_pairs, dedup_incremental_index) graduate from rows-only to
# independently re-derived python oracles (VERDICT r5 'Next round' #3).
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
)


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int) -> int:
    """Reference XXH64 over raw bytes (unsigned result)."""
    import struct

    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + _P1 + _P2) & _M64, (seed + _P2) & _M64
        v3, v4 = seed & _M64, (seed - _P1) & _M64
        while i + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl64((v1 + l1 * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl64((v2 + l2 * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl64((v3 + l3 * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl64((v4 + l4 * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl64((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl64(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M64
        h = (_rotl64(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _xx_long(value: int, seed: int) -> int:
    """Spark hash step for a LongType value (unsigned chain state in/out)."""
    import struct

    return xxh64(struct.pack("<q", value), seed & _M64)


def _xx_int(value: int, seed: int) -> int:
    """Spark hash step for an IntegerType value (4-byte path)."""
    import struct

    return xxh64(struct.pack("<i", value), seed & _M64)


def _xx_str(value: str, seed: int) -> int:
    return xxh64(value.encode("utf-8"), seed & _M64)


def spark_xxhash64_str(s: str) -> int:
    """== F.xxhash64(string_col) (signed)."""
    return _signed64(_xx_str(s, 42))


def spark_xxhash64_int_int(a: int, b: int) -> int:
    """== F.xxhash64(F.lit(a), F.lit(b)) with int32 literals (signed)."""
    return _signed64(_xx_int(b, _xx_int(a, 42)))


def spark_xxhash64_int_long(i: int, l: int) -> int:
    """== SQL xxhash64(<int literal i>, <long l>) (signed)."""
    return _signed64(_xx_long(l, _xx_int(i, 42)))


def _xx_long_vec(values, seed: int):
    """Vectorized _xx_long over a uint64 numpy array (numpy's uint64
    arithmetic wraps mod 2^64, which is exactly the XXH64 arithmetic)."""
    import numpy as np

    p1, p2, p3 = np.uint64(_P1), np.uint64(_P2), np.uint64(_P3)
    p4, p5 = np.uint64(_P4), np.uint64(_P5)

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    with np.errstate(over="ignore"):
        v = values.astype(np.uint64)
        h = np.uint64((seed + _P5 + 8) & _M64)
        k = rotl(v * p2, 31) * p1
        h = h ^ k
        h = rotl(h, 27) * p1 + p4
        h ^= h >> np.uint64(33)
        h *= p2
        h ^= h >> np.uint64(29)
        h *= p3
        h ^= h >> np.uint64(32)
    return h


def spark_xxhash64_longs(values: list[int]) -> int:
    """== F.xxhash64(array<long> col): elements chained in order (signed)."""
    h = 42
    for v in values:
        h = _xx_long(v, h)
    return _signed64(h)


def _spark_round(x: float, n: int) -> float:
    """Spark ROUND on double: BigDecimal.valueOf (shortest repr) HALF_UP."""
    import decimal

    return float(decimal.Decimal(repr(x)).quantize(
        decimal.Decimal(1).scaleb(-n), rounding=decimal.ROUND_HALF_UP
    ))


def _py_tokens(text: str) -> list[str]:
    """Mirror operators.dedup.tokens: split(lower(trim(text)), ' +')."""
    import re

    return re.split(" +", text.strip().lower())


def _py_shingles(toks: list[str], n: int = 3) -> list[str]:
    """Mirror shingle_rows: positional n-grams; short docs yield the whole
    text as one shingle."""
    if len(toks) < n:
        return [" ".join(toks)]
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def _load_documents(sf_dir: str) -> list[tuple[int, str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).sort_by("doc_id")
    return list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def py_oracle_fn_minhash_verbatim(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Snowflake-verbatim MINHASH/MINHASH_COMBINE/APPROXIMATE_SIMILARITY
    re-derived with the portable XXH64: per-lang 16-perm sketches
    (min over xxhash64(i, xxhash64(text))), elementwise-min combine, and
    the positionwise min==max Jaccard estimator."""
    import json

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    sketches: dict[str, list[int]] = {}
    for lang, text in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
        h0 = spark_xxhash64_str(text)
        sk = sketches.setdefault(lang, [2**63 - 1] * 16)
        for i in range(16):
            h = spark_xxhash64_int_long(i, h0)
            if h < sk[i]:
                sk[i] = h
    groups = list(sketches.values())
    combined = [min(s[i] for s in groups) for i in range(16)]
    eq = sum(
        1 for i in range(16) if min(s[i] for s in groups) == max(s[i] for s in groups)
    )
    return ["combined", "sim", "n_groups"], [
        (json.dumps(combined, separators=(",", ":")), round(eq / 16.0, 4), len(groups))
    ]


def py_oracle_dedup_simhash(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """simhash_pairs(max_hamming=3) re-derived: per-bit majority vote over
    non-distinct token hashes; brute-force hamming pairs (the 4x16-bit
    pigeonhole blocking is exact for hamming<=3, so blocked == brute)."""
    sigs: dict[int, int] = {}
    for doc_id, text in _load_documents(sf_dir):
        votes = [0] * 64
        for t in _py_tokens(text):
            h = spark_xxhash64_str(t)
            for j in range(64):
                votes[j] += 1 if (h >> j) & 1 else -1
        sig = 0
        for j in range(64):
            if votes[j] > 0:
                sig |= 1 << j
        sigs[doc_id] = _signed64(sig & _M64)
    ids = sorted(sigs)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin((sigs[a] ^ sigs[b]) & _M64).count("1")
            if ham <= 3:
                out.append((a, b, ham))
    return ["id_a", "id_b", "hamming"], out


def _lsh_plane(h: int, dim: int) -> list[float]:
    """similarity._hyperplane: coef(h, d) = xxhash64(int h, int d) % 10000
    / 10000.0 — Spark % keeps the dividend's sign (Java remainder)."""
    out = []
    for d in range(dim):
        s = spark_xxhash64_int_int(h, d)
        r = abs(s) % 10000
        out.append((r if s >= 0 else -r) / 10000.0)
    return out


def _seq_dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y  # sequential fold, matching F.aggregate order
    return acc


def _lsh_bucket(vec: list[float], dim: int, bits: int, plane_offset: int) -> int:
    bucket = 0
    for h in range(bits):
        if _seq_dot(vec, _lsh_plane(plane_offset + h, dim)) > 0:
            bucket |= 1 << h
    return bucket


def py_oracle_ann_lsh_buckets(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """lsh_bucket_profile(dim=64, bits=8) re-derived."""
    from collections import Counter

    _ids, X = _load_embeddings(sf_dir)
    counts = Counter(_lsh_bucket([float(x) for x in row], 64, 8, 0) for row in X)
    return ["bucket", "n_vectors"], [(b, n) for b, n in sorted(counts.items())]


def py_oracle_ann_lsh_pairs(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """lsh_bucketed_pairs(threshold=0.45, dim=64, bits=4, tables=8)
    re-derived: same-bucket candidates in any of 8 tables, exact cosine
    verify (sequential-fold dot/norm, Spark HALF_UP 4dp round)."""
    import math
    from collections import defaultdict

    ids, X = _load_embeddings(sf_dir)
    vecs = [[float(x) for x in row] for row in X]
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, v in enumerate(vecs):
        for t in range(8):
            buckets[(t, _lsh_bucket(v, 64, 4, t * 4))].append(i)
    cands = set()
    for members in buckets.values():
        members = sorted(members, key=lambda i: ids[i])
        for ai in range(len(members)):
            for bi in range(ai + 1, len(members)):
                cands.add((members[ai], members[bi]))
    nrm = [math.sqrt(_seq_dot(v, v)) for v in vecs]
    out = []
    for ia, ib in cands:
        cos = _spark_round(_seq_dot(vecs[ia], vecs[ib]) / (nrm[ia] * nrm[ib]), 4)
        if cos >= 0.45:
            out.append((int(ids[ia]), int(ids[ib]), cos))
    out.sort()
    return ["id_a", "id_b", "cos"], out


def py_oracle_dedup_incremental_index(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """dedup_incremental_index re-derived: corpus = even doc_ids, batch =
    odd; sig[i] = min over shingle rows of xxhash64(i, xxhash64(s)); 16
    bands of 4 hashed via the array<long> chain; candidates = new x new
    (id_a < id_b) + new x corpus (batch id first); exact Jaccard on
    distinct hashed shingle sets, HALF_UP 4dp, >= 0.8."""
    import numpy as np

    sigs: dict[int, list[int]] = {}
    shh: dict[int, set[int]] = {}
    perm_seeds = [_xx_int(i, 42) for i in range(64)]
    for doc_id, text in _load_documents(sf_dir):
        hs = [_signed64(_xx_str(s, 42)) for s in _py_shingles(_py_tokens(text))]
        shh[doc_id] = set(hs)
        hu = np.array(hs, dtype=np.int64).astype(np.uint64)
        sigs[doc_id] = [
            int(_xx_long_vec(hu, seed).astype(np.int64).min()) for seed in perm_seeds
        ]
    batch = sorted(i for i in sigs if i % 2 == 1)
    corpus = sorted(i for i in sigs if i % 2 == 0)
    def bands(doc):
        return [
            (b, spark_xxhash64_longs(sigs[doc][b * 4:(b + 1) * 4])) for b in range(16)
        ]
    band_index: dict[tuple[int, int], list[int]] = {}
    for doc in batch + corpus:
        for key in bands(doc):
            band_index.setdefault(key, []).append(doc)
    cands = set()
    for docs in band_index.values():
        new = [d for d in docs if d % 2 == 1]
        old = [d for d in docs if d % 2 == 0]
        for i, a in enumerate(new):
            for b in new[i + 1:]:
                cands.add((min(a, b), max(a, b)))
            for b in old:
                cands.add((a, b))
    out = []
    for a, b in cands:
        inter = len(shh[a] & shh[b])
        union = len(shh[a] | shh[b])
        jac = _spark_round(inter / union, 4)
        if jac >= 0.8:
            out.append((a, b, jac))
    out.sort()
    return ["id_a", "id_b", "jac"], out


def py_oracle_text_bpe_merges(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Reference BPE (Sennrich et al.) in pure python: word histogram over
    lowercased whitespace tokens, char symbols + '</w>', 8 rounds of
    (overlap-counted adjacent pair counts, argmax with (left, right)
    lexicographic tiebreak, greedy leftmost non-overlapping merge)."""
    from collections import Counter

    hist: Counter = Counter()
    for _doc_id, text in _load_documents(sf_dir):
        for w in _py_tokens(text):
            if w:
                hist[w] += 1
    syms = {w: [*w, "</w>"] for w in hist}
    out = []
    for rank in range(1, 9):
        pairs: Counter = Counter()
        for w, f in hist.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, cnt))
        for w in syms:
            s = syms[w]
            merged, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(s[i])
                    i += 1
            syms[w] = merged
    return ["rank", "left", "right", "freq"], out


def py_oracle_text_compression_ratio(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """compression_ratio re-derived: zlib level 6 over utf-8 bytes, ratio
    rounded 4dp (pandas .round == numpy half-even on these magnitudes ==
    python round ties-to-even), joined with lang."""
    import pyarrow.parquet as pq
    import zlib

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).sort_by("doc_id")
    out = []
    for doc_id, text, lang in zip(
        t["doc_id"].to_pylist(), t["text"].to_pylist(), t["lang"].to_pylist()
    ):
        raw = (text or "").encode("utf-8")
        n = len(raw)
        comp = len(zlib.compress(raw, 6))
        out.append((doc_id, lang, n, round(comp / max(n, 1), 4)))
    return ["id", "lang", "n_bytes", "ratio"], out


def py_oracle_multimodal_audio_chunks(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """multimodal_audio_chunks re-derived from the synthesis contract:
    8 kHz square wave of +/-(id%2000+1), utf8len(text)%4000+100 frames,
    0.25 s windows -> per-media chunk count, duration, peak."""
    import math

    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).sort_by("doc_id")
    win, rate = 2000, 8000  # 0.25 s at 8 kHz
    out = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        n = len((text or "").encode("utf-8")) % 4000 + 100
        amp = doc_id % 2000 + 1
        out.append(
            (
                doc_id,
                math.ceil(n / win),
                _spark_round(n / rate, 4),
                _spark_round(float(amp), 2),
            )
        )
    return ["media_id", "n_chunks", "duration", "peak"], out


def py_oracle_text_quality_classifier(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """text_quality_classifier re-derived: logistic regression over hashed
    presence features (bucket = pmod(xxhash64(tok), 128)), 4 full-batch GD
    epochs at lr=0.3 with the engine's DECIMAL(28,12) exactness contract —
    per-posting contributions/errors quantized half-up to 12 dp before the
    (exact, order-free) sums, weights rounded to 12 dp per update. Label:
    text contains 'spark'. Output: top-200 by (score desc, id)."""
    import decimal
    import math
    import re

    import pyarrow.parquet as pq

    dim, epochs, lr = 128, 4, 0.3
    q12 = decimal.Decimal(1).scaleb(-12)

    def dec12(x: float) -> decimal.Decimal:
        return decimal.Decimal(repr(x)).quantize(q12, rounding=decimal.ROUND_HALF_UP)

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).sort_by("doc_id")
    rows = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    feats = {
        doc_id: sorted(
            {_signed64(_xx_str(tok, 42)) % dim
             for tok in re.split("[^a-z]+", (text or "").lower()) if tok}
        )
        for doc_id, text in rows
    }
    labels = {doc_id: 1.0 if "spark" in (text or "") else 0.0 for doc_id, text in rows}
    n_docs = len(rows)
    weights = [0.0] * dim
    bias = 0.0
    for _ in range(epochs):
        errs = {}
        for doc_id, buckets in feats.items():
            margin = float(sum(dec12(weights[b]) for b in buckets)) + bias
            p = 1.0 / (1.0 + math.exp(-margin))
            errs[doc_id] = p - labels[doc_id]
        grad = [decimal.Decimal(0)] * dim
        for doc_id, buckets in feats.items():
            e = dec12(errs[doc_id])
            for b in buckets:
                grad[b] += e
        bias_grad = float(sum(dec12(e) for e in errs.values()))
        weights = [
            round(w - lr * float(g) / n_docs, 12) for w, g in zip(weights, grad)
        ]
        bias = round(bias - lr * bias_grad / n_docs, 12)
    out = []
    for doc_id, buckets in feats.items():
        margin = float(sum(dec12(weights[b]) for b in buckets)) + bias
        score = _spark_round(1.0 / (1.0 + math.exp(-margin)), 6)
        out.append((doc_id, bool(labels[doc_id]), score))
    out.sort(key=lambda r: (-r[2], r[0]))
    out = [(i, y, s) for i, y, s in out[:200]]
    return ["id", "y", "score"], out


def py_oracle_text_cms_heavy_hitters(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Count-min sketch (w=32, d=4) re-derived in pure python with the
    portable XXH64: cell = (r, spark_pmod(xxhash64(r, token), 32)); probe
    estimate = min over rows. Exact counts from the same token stream."""
    from collections import Counter

    w, d_rows = 32, 4

    def col(r: int, tok: str) -> int:
        return _signed64(_xx_str(tok, _xx_int(r, 42))) % w

    exact: Counter = Counter()
    sketch: Counter = Counter()
    probes: set[str] = set()
    for doc_id, text in _load_documents(sf_dir):
        toks = [t for t in _py_tokens(text) if t]
        for t in toks:
            exact[t] += 1
            for r in range(d_rows):
                sketch[(r, col(r, t))] += 1
        if doc_id < 10:
            probes.update(toks)
    rows = []
    for t in sorted(probes):
        est = min(sketch[(r, col(r, t))] for r in range(d_rows))
        rows.append((t, exact[t], est, est - exact[t]))
    return ["token", "exact_cnt", "cms_est", "overcount"], rows



def py_oracle_stream_cms_cells(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Windowed count-min sketch cells re-derived in pure python with the
    portable XXH64: for each first-day event, d=4 cells
    (r, spark_pmod(xxhash64(r, user_id), 32)) increment inside the event's
    10-minute tumbling window — the batch twin of
    streaming/windows.windowed_cms_cells."""
    import datetime as _dt
    import os as _os
    from collections import Counter

    import pyarrow.parquet as _pq

    w, d_rows = 32, 4
    t = _pq.read_table(
        _os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    cnt: Counter = Counter()
    cutoff = _dt.datetime(2024, 1, 2)
    for ts, uid in zip(t["ts"].to_pylist(), t["user_id"].to_pylist()):
        if ts >= cutoff:
            continue
        epoch = int(ts.replace(tzinfo=_dt.timezone.utc).timestamp())
        win = _dt.datetime.fromtimestamp(epoch // 600 * 600, _dt.timezone.utc)
        ws = win.strftime("%Y-%m-%d %H:%M:%S")
        for r in range(d_rows):
            c = spark_xxhash64_int_long(r, uid) % w
            cnt[(ws, r, c)] += 1
    rows = [(ws, r, c, n) for (ws, r, c), n in sorted(cnt.items())]
    return ["win_start", "r", "c", "cnt"], rows


def py_oracle_dedup_lsh_tuning_curve(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """LSH S-curve re-derived: exact 3-gram Jaccard over all sample pairs
    (integer bucket (10*inter)//union), candidate set from portable-XXH64
    minhash signatures banded 16x4 — same derivation as the incremental
    index oracle."""
    from collections import defaultdict

    import numpy as np

    shs: dict[int, set[str]] = {}
    sigs: dict[int, list[int]] = {}
    perm_seeds = [_xx_int(i, 42) for i in range(64)]
    for doc_id, text in _load_documents(sf_dir):
        sg = _py_shingles(_py_tokens(text))
        shs[doc_id] = set(sg)
        hu = np.array(
            [_signed64(_xx_str(s, 42)) for s in shs[doc_id]], dtype=np.int64
        ).astype(np.uint64)
        sigs[doc_id] = [
            int(_xx_long_vec(hu, seed).astype(np.int64).min()) for seed in perm_seeds
        ]
    band_index: dict[tuple[int, int], list[int]] = {}
    for doc_id in sigs:
        for b in range(16):
            key = (b, spark_xxhash64_longs(sigs[doc_id][b * 4:(b + 1) * 4]))
            band_index.setdefault(key, []).append(doc_id)
    cands: set[tuple[int, int]] = set()
    for docs in band_index.values():
        for i, a in enumerate(docs):
            for b in docs[i + 1:]:
                cands.add((min(a, b), max(a, b)))
    agg: dict[int, list[int]] = defaultdict(lambda: [0, 0])
    ids = sorted(shs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            ia, ib = ids[x], ids[y]
            inter = len(shs[ia] & shs[ib])
            uni = len(shs[ia] | shs[ib])
            bkt = (inter * 10) // uni
            agg[bkt][0] += 1
            if (ia, ib) in cands:
                agg[bkt][1] += 1
    rows = [
        (k, agg[k][0], agg[k][1], _spark_round(agg[k][1] / agg[k][0], 4))
        for k in sorted(agg)
    ]
    return ["bucket", "n_pairs", "n_candidates", "hit_rate"], rows


def py_oracle_dedup_bloom_decontaminate(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Bloom decontamination re-derived with the portable XXH64: 2^16-bit
    filter over the eval set's (doc_id % 17 == 0) shingles; h = xxhash64(
    shingle), k=4 positions DERIVED FROM h (pos_j = pmod(xxhash64(j, h),
    2^16), the engine's double-hashing scheme); a probe shingle is flagged
    iff all 4 bits are set. Exact overlap and per-doc dedup both key on h
    — the engine's exact key — so even a 64-bit hash collision cannot
    diverge the two sides."""
    m_bits, k = 1 << 16, 4

    def positions(h: int) -> list[int]:
        return [_signed64(_xx_long(h, _xx_int(j, 42))) % m_bits for j in range(k)]

    ev_h: set[int] = set()
    probe: dict[int, set[int]] = {}
    for doc_id, text in _load_documents(sf_dir):
        hs = {_signed64(_xx_str(s, 42)) for s in _py_shingles(_py_tokens(text))}
        if doc_id % 17 == 0:
            ev_h.update(hs)
        else:
            probe[doc_id] = hs
    bloom: set[int] = set()
    for h in ev_h:
        bloom.update(positions(h))
    rows = []
    for doc_id in sorted(probe):
        n_bloom = sum(1 for h in probe[doc_id] if all(p in bloom for p in positions(h)))
        n_exact = len(probe[doc_id] & ev_h)
        rows.append((doc_id, len(probe[doc_id]), n_bloom, n_exact))
    return ["id", "n_shingles", "n_bloom_hits", "n_exact_hits"], rows


def py_oracle_embed_kcenter_sample(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Farthest-point k-center replayed with the same left-to-right
    (x-y)^2 double folds as Spark's F.aggregate (NOT numpy sums — order
    changes the FP result), so every greedy selection matches the operator
    bit-for-bit. Ties argmax to the lowest id."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).sort_by("vec_id")
    ids = t["vec_id"].to_pylist()
    vecs = [[float(x) for x in v] for v in t["embedding"].to_pylist()]

    def d2(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    k = 8
    picked = [(1, ids[0], 0.0)]
    centers = [vecs[0]]
    for rank in range(2, k + 1):
        best_id, best_d, best_v = None, -1.0, None
        for i, v in zip(ids, vecs):
            dmin = min(d2(v, c) for c in centers)
            if dmin > best_d or (dmin == best_d and i < best_id):
                best_id, best_d, best_v = i, dmin, v
        picked.append((rank, best_id, best_d))
        centers.append(best_v)
    rows = [(r, i, _spark_round(d, 4)) for r, i, d in picked]
    return ["sel_rank", "vec_id", "min_dist2"], rows


def py_oracle_agg_linear_count_distinct(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Linear-counting sketch re-derived with the portable XXH64: one bit
    per l_partkey at pmod(xxhash64(key), 2^16) per l_returnflag group;
    n_set_bits integer-exact, estimate = round(-m ln(1 - n/m))."""
    import math

    import pyarrow.parquet as pq

    m_bits = 1 << 16
    t = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_partkey"])
    bits: dict[str, set[int]] = {}
    exact: dict[str, set[int]] = {}
    for flag, key in zip(t["l_returnflag"].to_pylist(), t["l_partkey"].to_pylist()):
        bits.setdefault(flag, set()).add(_signed64(_xx_long(key, 42)) % m_bits)
        exact.setdefault(flag, set()).add(key)
    rows = []
    for flag in sorted(bits):
        n = len(bits[flag])
        est = int(
            decimal.Decimal(repr(-m_bits * math.log(1.0 - n / m_bits))).quantize(
                decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
            )
        )
        rows.append((flag, n, est, len(exact[flag])))
    return ["flag", "n_set_bits", "lc_estimate", "exact_distinct"], rows


def py_oracle_embed_hard_negatives(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Hard-negative mining replayed in pure python with the SAME
    left-to-right double folds as Spark's F.aggregate (dot and norm), so
    every cosine is bit-identical before the 4dp HALF_UP round; top-2 per
    probe (vec_id < 25) among different-label vectors, ties to lowest id."""
    import math

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").sort_by("vec_id")
    ids = t["vec_id"].to_pylist()
    labels = t["label"].to_pylist()
    vecs = [[float(x) for x in v] for v in t["embedding"].to_pylist()]

    def dot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def nrm(a: list[float]) -> float:
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return math.sqrt(acc)

    norms = [nrm(v) for v in vecs]
    rows: list[tuple] = []
    for qi in range(len(ids)):
        if ids[qi] >= 25:
            continue
        cands: list[tuple] = []
        for ni in range(len(ids)):
            if ids[ni] == ids[qi] or labels[ni] == labels[qi]:
                continue
            c = _spark_round(dot(vecs[qi], vecs[ni]) / (norms[qi] * norms[ni]), 4)
            cands.append((-c, ids[ni]))
        cands.sort()
        for rank, (negc, nid) in enumerate(cands[:2], 1):
            rows.append((ids[qi], nid, -negc, rank))
    return ["q_id", "n_id", "cos", "rank"], rows


def py_oracle_graph_pagerank_similarity(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """Replays the whole pipeline: tokens -> distinct 2-gram shingles ->
    stop-gram pruning (df <= 50) -> integer-exact Jaccard >= 0.3 edges over
    the pruned space -> 10 PageRank iterations with the SAME numeric
    discipline as the operator (per-contribution double division, HALF_UP
    quantize to 18 decimals, exact Decimal sums, scalar double teleport)."""
    import decimal

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).sort_by(
        "doc_id"
    )
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    sh: dict[int, set] = {}
    df_count: dict[str, int] = {}
    for i, txt in zip(ids, texts):
        w = _py_tokens(txt)
        grams = {f"{w[j]} {w[j+1]}" for j in range(len(w) - 1)}
        sh[i] = grams
        for g in grams:
            df_count[g] = df_count.get(g, 0) + 1
    rare = {g for g, c in df_count.items() if c <= 50}
    shr = {i: g & rare for i, g in sh.items()}
    edges: dict[int, list] = {i: [] for i in ids}
    id_list = sorted(ids)
    for ai in range(len(id_list)):
        a = id_list[ai]
        for bi in range(ai + 1, len(id_list)):
            b = id_list[bi]
            inter = len(shr[a] & shr[b])
            if inter == 0:
                continue
            union = len(shr[a]) + len(shr[b]) - inter
            if inter * 10 >= union * 3:
                edges[a].append(b)
                edges[b].append(a)
    n = len(ids)
    d = 0.85
    q18 = decimal.Decimal(1).scaleb(-18)
    r = {i: 1.0 / n for i in ids}
    for _ in range(10):
        s: dict[int, decimal.Decimal] = {i: decimal.Decimal(0) for i in ids}
        for u in ids:
            deg = len(edges[u])
            if not deg:
                continue
            c = decimal.Decimal(r[u] / deg).quantize(
                q18, rounding=decimal.ROUND_HALF_UP
            )
            for v in edges[u]:
                s[v] += c
        r = {i: (1.0 - d) / n + d * float(s[i]) for i in ids}
    rows = [(i, _spark_round(r[i], 8)) for i in sorted(ids)]
    return ["id", "rank"], rows


def py_oracle_ann_ivf_recall(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """recall@5 of the PRUNED IVF path (n_cells=8, n_probe=2) vs exact
    cosine, independently in numpy/python with the operator's documented
    conventions: coarse quantizer = 3-iter Lloyd on the lowest-4096-id
    sample (init = 8 lowest-id vectors, argmin lowest-index ties, empty
    cells keep their centroid — ivf_train_sample is itself driver-side
    numpy, so training replication is exact by construction); corpus
    assignment and probe-cell distances accumulate (x-y)^2 LEFT-TO-RIGHT
    (the _dist2_sql convention), probe cells sort by (dist2, cell);
    scoring = round(sequential-dot cosine, 4) with n_id tiebreak."""
    import numpy as np

    ids, X = _load_embeddings(sf_dir)
    n_cells, n_probe, k, iters = 8, 2, 5, 3
    Xt = X[:4096]
    C = Xt[:n_cells].copy()
    for _ in range(iters):
        d2 = ((Xt[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        for c in range(n_cells):
            if (a == c).any():
                C[c] = Xt[a == c].mean(0)

    def seq_d2(v, c) -> float:
        acc = 0.0
        for x, y in zip(v, c):
            acc += (x - y) * (x - y)
        return acc

    assign = []
    for i in range(len(ids)):
        ds = [seq_d2(X[i], C[c]) for c in range(n_cells)]
        best = min(range(n_cells), key=lambda c: (ds[c], c))
        assign.append(best)
    norms = [math.sqrt(_seq_fsum_sq(X[i])) for i in range(len(ids))]

    rows = []
    for qi in range(len(ids)):
        if ids[qi] >= 10:
            continue
        ds = [(seq_d2(X[qi], C[c]), c) for c in range(n_cells)]
        probe_cells = {c for _, c in sorted(ds)[:n_probe]}

        def topk(cand_idx):
            scored = []
            for j in cand_idx:
                acc = 0.0
                for x, y in zip(X[qi], X[j]):
                    acc += x * y
                cos = _spark_round(acc / (norms[qi] * norms[j]), 4)
                scored.append((-cos, int(ids[j])))
            scored.sort()
            return {nid for _, nid in scored[:k]}

        all_others = [j for j in range(len(ids)) if j != qi]
        exact = topk(all_others)
        approx = topk([j for j in all_others if assign[j] in probe_cells])
        rows.append((int(ids[qi]), round(len(exact & approx) / k, 4)))
    rows.sort()
    return ["q_id", "recall_at_k"], rows


def _seq_fsum_sq(v) -> float:
    acc = 0.0
    for x in v:
        acc += x * x
    return acc


def py_oracle_ann_pq_recall(sf_dir: str) -> tuple[list[str], list[tuple]]:
    """recall@5 of the CODES-ONLY ADC path (no exact re-rank) vs exact
    cosine — the number that quantifies what 32x PQ compression costs
    before refinement. Same derivation as py_oracle_ann_pq_topk (codebooks,
    encode, ADC cosine round-4 with n_id ties) with the shortlist cut at
    k and compared against the exact top-k over the full corpus."""
    import numpy as np

    ids, X = _load_embeddings(sf_dir)
    m, k_codes, iters, k = 8, 16, 10, 5
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
    codes = np.stack([
        (((X[:, j * sub:(j + 1) * sub][:, None, :] - books[j][None, :, :]) ** 2)
         .sum(-1).argmin(1))
        for j in range(m)
    ], axis=1)
    nrm = np.sqrt((X * X).sum(1))
    qn2 = np.stack([(books[j] ** 2).sum(1) for j in range(m)])
    out = []
    for qi in np.where(ids < 10)[0]:
        q = X[qi]
        T = np.stack([books[j] @ q[j * sub:(j + 1) * sub] for j in range(m)])
        approx = T[np.arange(m)[None, :], codes].sum(1)
        n_nrm_q = np.sqrt(qn2[np.arange(m)[None, :], codes].sum(1))
        with np.errstate(divide="ignore", invalid="ignore"):
            adc = np.round(approx / (nrm[qi] * n_nrm_q), 4)
        others = np.where(ids != ids[qi])[0]
        adc_top = {
            nid
            for _s, nid in sorted(
                ((float(adc[i]), int(ids[i])) for i in others),
                key=lambda t: (-t[0], t[1]),
            )[:k]
        }
        exact_top = {
            nid
            for _s, nid in sorted(
                ((round(float(X[i] @ q / (nrm[i] * nrm[qi])), 4), int(ids[i]))
                 for i in others),
                key=lambda t: (-t[0], t[1]),
            )[:k]
        }
        out.append((int(ids[qi]), round(len(adc_top & exact_top) / k, 4)))
    out.sort()
    return ["q_id", "recall_at_k"], out


PY_ORACLES = {
    "ann_ivf_recall": py_oracle_ann_ivf_recall,
    "ann_pq_recall": py_oracle_ann_pq_recall,
    "dedup_semantic": py_oracle_dedup_semantic,
    "ann_pq_topk": py_oracle_ann_pq_topk,
    "embed_kmeans": py_oracle_embed_kmeans,
    "embed_pca_project": py_oracle_embed_pca_project,
    "embed_cluster_profile": py_oracle_embed_cluster_profile,
    "dedup_simhash": py_oracle_dedup_simhash,
    "fn_minhash_verbatim": py_oracle_fn_minhash_verbatim,
    "ann_lsh_buckets": py_oracle_ann_lsh_buckets,
    "ann_lsh_pairs": py_oracle_ann_lsh_pairs,
    "dedup_incremental_index": py_oracle_dedup_incremental_index,
    "text_bpe_merges": py_oracle_text_bpe_merges,
    "text_compression_ratio": py_oracle_text_compression_ratio,
    "multimodal_audio_chunks": py_oracle_multimodal_audio_chunks,
    "text_quality_classifier": py_oracle_text_quality_classifier,
    "text_cms_heavy_hitters": py_oracle_text_cms_heavy_hitters,
    "stream_cms_cells": py_oracle_stream_cms_cells,
    "dedup_lsh_tuning_curve": py_oracle_dedup_lsh_tuning_curve,
    "dedup_bloom_decontaminate": py_oracle_dedup_bloom_decontaminate,
    "embed_kcenter_sample": py_oracle_embed_kcenter_sample,
    "agg_linear_count_distinct": py_oracle_agg_linear_count_distinct,
    "embed_hard_negatives": py_oracle_embed_hard_negatives,
    "graph_pagerank_similarity": py_oracle_graph_pagerank_similarity,
}
