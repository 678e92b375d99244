"""Similarity search over embedding columns (array<float>).

Two paths, per SURVEY.md §7.1 M5 / the BASELINE extension list:

- brute-force cosine top-k: broadcast the (small) query set, one streaming
  pass over the corpus, per-query top-k via window. Exact; scales linearly in
  corpus size with NO corpus shuffle (the only exchange is the final window
  over q_id, whose input is already cut to candidate rows).
- random-hyperplane LSH buckets: deterministic hyperplanes derived from
  xxhash64, corpus bucketed once (reusable, like an index); queries probe
  only their bucket -> candidate set shrinks by ~2^bits. This is the 100 TB
  path: the expensive exact scoring runs on a small co-partitioned subset.

Cosine math uses zip_with/aggregate over doubles — strict left-to-right fold,
which is what lets a sequential-loop oracle reproduce values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


# SQL-string twins of dot/norm/_as_double: one F.expr parse instead of the
# lambda-Column construction's dozens of Py4J round-trips (the DataFrame
# build of the brute-force spec measured ~300 ms, dominated by HOF lambda
# plumbing; same expression tree after parsing, so values and plans are
# identical).
def _dot_sql(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"


def _norm_sql(a: str) -> str:
    return f"sqrt(aggregate({a}, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"


def _as_double_sql(vec_col: str) -> str:
    return f"transform({vec_col}, x -> CAST(x AS DOUBLE))"


def _with_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    """(id, vec, norm) with the vector pre-cast to double and the norm
    computed ONCE per vector — the pairwise stage then does one dot product
    per pair instead of re-deriving both norms (3x fewer flops, and the same
    precompute shape as the DuckDB oracle's CTE, keeping values identical)."""
    v = _as_double_sql(vec_col)
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.expr(v).alias(f"{prefix}_vec"),
        F.expr(_norm_sql(v)).alias(f"{prefix}_nrm"),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: "DataFrame | str",
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sort: bool = True,
    corpus_view: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries MUST be broadcast-sized (it is the probe set, not the corpus).
    Ranking key is round(cos, 4) with id tiebreak — deliberately coarse so
    float noise can't flip the top-k boundary between engines.

    Scoring + top-k run as ONE spark.sql over the two inputs (registered as
    temp views), the same r6 move ivf_topk ships: the equivalent DataFrame
    chain (2x _with_norm select -> join -> select -> window -> filter) is
    SIX eagerly-analyzed Dataset creations, each re-analyzing the growing
    HOF expression tree (~25-40 ms/pass of driver latency measured at r10
    session 3 — creation was ~40% of this spec's replan wall). Expression
    text is identical to the chain's, so plan and values are unchanged
    (plans/r10/ann_cosine_topk_{before,after}.txt byte-match modulo ids).
    """
    spark = corpus.sparkSession
    # corpus_view: name of an ALREADY-REGISTERED view equal to `corpus`
    # (e.g. the session's stable "embeddings" view) — skips one
    # createOrReplaceTempView per plan creation. The SQL resolves the name
    # to the same relation, so plan and values are unchanged.
    if corpus_view is None:
        corpus_view = "__bft_corpus"
        corpus.createOrReplaceTempView(corpus_view)
    # queries may be passed as SQL SOURCE TEXT (a subquery or view name,
    # r11): a DataFrame probe set costs its own eagerly-analyzed creation
    # plus a createOrReplaceTempView per call (~10 ms / ~12 Py4J round
    # trips); text inlines into the one spark.sql below and parses in the
    # same JVM call. Same relation, same plan.
    if isinstance(queries, str):
        queries_src = f"({queries})"
    else:
        queries.createOrReplaceTempView("__bft_queries")
        queries_src = "__bft_queries"
    vs = _as_double_sql(f"`{vec_col}`")
    out = spark.sql(f"""
WITH q AS (SELECT `{id_col}` AS q_id, {vs} AS q_vec, {_norm_sql(vs)} AS q_nrm
           FROM {queries_src}),
     c AS (SELECT `{id_col}` AS n_id, {vs} AS n_vec, {_norm_sql(vs)} AS n_nrm
           FROM {corpus_view}),
     s AS (
  SELECT /*+ BROADCAST(q) */ q.q_id, c.n_id,
         round({_dot_sql("q.q_vec", "c.n_vec")} / (q.q_nrm * c.n_nrm), 4) AS cos
  FROM c JOIN q ON q.q_id <> c.n_id
)
SELECT q_id, n_id, cos, rank FROM (
  SELECT q_id, n_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM s
) WHERE rank <= {int(k)}""")
    # rank makes row identity deterministic without a global sort; sort=False
    # skips the final range exchange + sampling job (pure fixed cost)
    return out.orderBy("q_id", "rank") if sort else out


def near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= threshold).

    Brute-force O(n^2) — correctness baseline; at scale run it per LSH bucket
    (lsh_bucketed_pairs) instead.
    """
    a = _with_norm(corpus, id_col, vec_col, "a")
    b = _with_norm(corpus, id_col, vec_col, "b")
    cos = F.expr(_dot_sql("a_vec", "b_vec")) / (F.col("a_nrm") * F.col("b_nrm"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select(F.col("a_id").alias("id_a"), F.col("b_id").alias("id_b"), F.round(cos, 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .orderBy("id_a", "id_b")
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-vectorized twin of brute_force_topk: mapInPandas + one numpy
    matmul per batch against the broadcast query matrix.

    This is the shape the brief prescribes for Python-side math — Arrow
    batches in, a single C-speed GEMM per batch, Arrow out; never per-row
    Python. Ranking matches the built-in version exactly (same round-4 +
    id tiebreak), which the tests assert. Per-batch top-k keeps the shuffle
    to k rows per (batch, query) before the final exact window.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, q_mat))

    out_schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("n_id", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qm = bq.value
        for batch in batches:
            if not len(batch):
                continue
            c_ids = batch[id_col].to_numpy(dtype=np.int64)
            c_mat = np.array(list(batch[vec_col]), dtype=np.float64)
            c_mat /= np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = np.round(c_mat @ qm.T, 4)  # (batch, n_queries)
            frames = []
            for qi, qid in enumerate(ids):
                col = sims[:, qi]
                mask = c_ids != qid
                order = np.lexsort((c_ids[mask], -col[mask]))[:k]
                frames.append(
                    pd.DataFrame({"q_id": qid, "n_id": c_ids[mask][order], "cos": col[mask][order]})
                )
            yield pd.concat(frames, ignore_index=True)

    partial = corpus.select(id_col, vec_col).mapInPandas(kernel, schema=out_schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------------------
# binary (sign) quantization + Hamming search
# ---------------------------------------------------------------------------


def _sign_words_sql(vec_col: str, dim: int, word_bits: int = 32) -> list[str]:
    """SQL expressions packing the sign bits of `vec_col` into 32-bit words.

    MSB-first fold ``acc * 2 + (x >= 0)`` over each 32-element slice — the
    word value stays < 2^32 so BIGINT arithmetic never overflows under
    Spark's ANSI mode (a 64-bit single-word pack would fault on the top
    bit) and the identical left fold is expressible in DuckDB's
    list_reduce, which is what makes the operator SQL-oracle-able.
    """
    n_words = (dim + word_bits - 1) // word_bits
    return [
        f"aggregate(slice({vec_col}, {w * word_bits + 1}, {word_bits}), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc * 2 + IF(x >= 0, 1L, 0L)) AS w{w}"
        for w in range(n_words)
    ]


def binary_sign_signatures(
    corpus: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix: str = "",
) -> DataFrame:
    """(id, w0..wN) — binary sign quantization: bit j of the signature is
    1 iff vec[j] >= 0, packed into 32-bit words held in BIGINT columns.

    This is the index-build step: 8 bytes of signature per 32 dims (16x
    smaller than float32 vectors), computed in one narrow projection —
    zero shuffle, and at 100 TB the signature relation is what gets
    written/scanned while full vectors stay in cold storage for rerank.
    """
    words = _sign_words_sql(vec_col, dim)
    out = corpus.selectExpr(id_col, *words)
    if prefix:
        n_words = (dim + 31) // 32
        out = out.select(
            F.col(id_col).alias(f"{prefix}_id"),
            *[F.col(f"w{w}").alias(f"{prefix}_w{w}") for w in range(n_words)],
        )
    return out


def hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sort: bool = True,
) -> DataFrame:
    """Exact top-k by Hamming distance over binary sign signatures.

    The scan side is pure codegen bit math — ``bit_count(q_w ^ n_w)`` summed
    over the packed words — against an 8-byte-per-32-dims signature
    relation; the broadcast probe set and per-query window top-k mirror
    brute_force_topk. Ranking key (hamming, n_id) is integer-exact, so the
    SQL oracle reproduces the row set bit-for-bit (no float rounding in
    the ranking at all). At scale this is the cheap first-pass retriever:
    Hamming shortlist from signatures, exact-cosine rerank of shortlist
    rows only (the rerank shape ships in pq_topk).
    """
    n_words = (dim + 31) // 32
    q = binary_sign_signatures(queries, dim, id_col, vec_col, prefix="q")
    c = binary_sign_signatures(corpus, dim, id_col, vec_col, prefix="n")
    ham = F.expr(
        " + ".join(f"bit_count(q_w{w} ^ n_w{w})" for w in range(n_words))
    ).cast("int")
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).select(
        "q_id", "n_id", ham.alias("hamming")
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("hamming"), F.asc("n_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
    return out.orderBy("q_id", "rank") if sort else out


def hamming_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sort: bool = True,
) -> DataFrame:
    """Two-stage retrieval: binary-Hamming shortlist -> exact cosine rerank.

    The production ANN composition (Faiss's IVF+refine / binary-index
    convention): stage 1 scans 8-byte signatures and keeps `shortlist` >> k
    candidates per query on integer Hamming ranking (deterministic, id
    tiebreak); stage 2 computes the exact cosine ONLY for shortlist rows —
    at 100 TB the float vectors are fetched for shortlist*|Q| rows instead
    of the whole corpus. Both stages are deterministic, so a SQL oracle
    reproduces the final (q_id, n_id, cos, rank) rows exactly; recall vs
    full brute force is a fixture property asserted in tests.
    """
    short = hamming_topk(
        corpus, queries, k=shortlist, dim=dim, id_col=id_col, vec_col=vec_col, sort=False
    ).select("q_id", "n_id")
    q = _with_norm(queries, id_col, vec_col, "q")
    c = _with_norm(corpus, id_col, vec_col, "n")
    cos = F.expr(_dot_sql("q_vec", "n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))
    scored = (
        short.join(c, "n_id")
        .join(F.broadcast(q), "q_id")
        .select("q_id", "n_id", F.round(cos, 4).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
    return out.orderBy("q_id", "rank") if sort else out


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------


def _hyperplane(h: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane h as array<double>.

    Coefficient (h, d) = xxhash64(h, d) scaled to [-1, 1] — reproducible
    across sessions/partitions with zero data movement (no random state).
    """
    return F.array(
        *[(F.xxhash64(F.lit(h), F.lit(d)) % 10000 / F.lit(10000.0)) for d in range(dim)]
    )


def lsh_bucket(vec: Column, dim: int, bits: int = 12, plane_offset: int = 0) -> Column:
    """Sign-of-projection bucket id (int) from `bits` hyperplanes; the
    offset selects a disjoint hyperplane family per hash table."""
    v = _as_double(vec)
    bucket = F.lit(0).cast("long")
    for h in range(bits):
        sign_bit = F.when(
            dot(v, _hyperplane(plane_offset + h, dim)) > 0, F.shiftleft(F.lit(1).cast("long"), h)
        ).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(sign_bit)
    return bucket


def lsh_bucket_profile(corpus: DataFrame, dim: int = 64, bits: int = 8, vec_col: str = "embedding") -> DataFrame:
    """Bucket the corpus; return (bucket, n_vectors) — the 'index build' step."""
    return (
        corpus.select(lsh_bucket(F.col(vec_col), dim, bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("bucket")
    )


def lsh_bucketed_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    bits: int = 8,
    tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs restricted to same-bucket candidates, multi-table.

    Each of `tables` independent hash tables buckets every vector with its
    own `bits` hyperplanes; candidates join on (table, bucket) —
    co-partitioned equi-join, linear in bucket sizes instead of quadratic in
    the corpus. Per-table collision prob for angle θ is (1-θ/π)^bits; recall
    over T tables is 1-(1-p)^T — at cos≈0.5 (θ≈60°), bits=4/tables=8 gives
    ~0.8 recall where a single 8-bit table gives ~0.03. Exact verification
    removes all false positives, so precision stays 1.

    Shuffle plan (VERDICT r1 'What's wrong' #2): the (table x id) self-join
    carries ONLY (tbl, bucket, id) — no vectors. Candidate (id_a, id_b)
    pairs are de-duplicated across tables FIRST, then each side's vector is
    joined back exactly once for the exact-cosine verify. Shuffle volume is
    2 x corpus vector bytes instead of 2 x tables x corpus vector bytes
    (~8x less at tables=8), and the dedup happens on narrow int pairs.
    """
    v = _as_double(F.col(vec_col))
    table_buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col(vec_col), dim, bits, plane_offset=t * bits).alias("bucket"),
            )
            for t in range(tables)
        ]
    )
    # narrow bucket index: (id, tbl, bucket) — vectors stay out of the join
    bucketed = corpus.select(
        F.col(id_col).alias("id"), F.explode(table_buckets).alias("tb")
    ).select("id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    l = bucketed.select(F.col("id").alias("id_a"), "tbl", "bucket")
    r = bucketed.select(F.col("id").alias("id_b"), "tbl", "bucket")
    candidates = (
        l.join(r, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # join each side's vector back once, then exact-verify
    vs = _as_double_sql(vec_col)
    vecs = corpus.select(
        F.col(id_col).alias("id"), F.expr(vs).alias("v"), F.expr(_norm_sql(vs)).alias("nrm")
    )
    scored = (
        candidates.join(
            vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")),
            "id_a",
        )
        .join(
            vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")),
            "id_b",
        )
    )
    cos = F.expr(_dot_sql("va", "vb")) / (F.col("na") * F.col("nb"))
    return (
        scored.select("id_a", "id_b", F.round(cos, 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path next to LSH
# ---------------------------------------------------------------------------


#: probe-side projection Columns, keyed on (session, quantizer values,
#: n_probe, id_col, vec_col). The quantizer is fixed once trained (FAISS
#: keeps it resident the same way), so the whole probe projection —
#: centroid-distance struct array, slice/sort, the explode lambda — is
#: reusable across query batches verbatim; Columns are plain expression
#: trees, valid for any DataFrame of the same session. r10: the cache
#: holds the full 4-column list, not just the cell array — each HOF
#: lambda costs ~25-50 ms of Py4J plumbing to construct, and rebuilding
#: the non-cached parts per query batch was ~60% of ivf creation wall.
_PROBE_EXPR_CACHE: dict[tuple, list] = {}


def _probe_clusters(
    queries: DataFrame, centroids: list[list[float]], n_probe: int, id_col: str, vec_col: str
) -> DataFrame:
    """(q_id, q_vec, q_nrm, cluster) — each query exploded to its n_probe
    NEAREST coarse cells (array_sort over (dist2, cell) structs; ties break
    on cell id, so probing is deterministic).

    The centroid matrix enters the plan as ONE nested-array Literal node
    (F.lit of the python matrix) probed with a transform-with-index lambda,
    not as n_cells inlined per-dimension literal expressions: the inline
    form is n_cells x dim Literal NODES, and its analysis alone cost
    ~0.2-0.3 s per query batch at 8x64 (r6 bench audit) — and would grow
    linearly into the thousands-of-cells regime a 100 TB corpus needs.
    dist2 arithmetic ((x-y)^2 summed left-to-right) is unchanged, so cell
    assignments are bit-identical to the inline form; both forms evaluate
    through the same interpreted HOF path. The built projection is
    additionally memoized per quantizer (_PROBE_EXPR_CACHE)."""
    from universql_spark.session import session_uid  # noqa: PLC0415

    # session_uid, not id(session): object-id reuse after a session
    # teardown could serve a stale JVM column seq (VERDICT r10 item 7)
    ckey = (
        session_uid(queries.sparkSession),
        tuple(tuple(c) for c in centroids),
        n_probe,
        id_col,
        vec_col,
    )
    cols = _PROBE_EXPR_CACHE.get(ckey)
    if cols is None:
        vd = F.expr(_as_double_sql(vec_col))
        import json  # noqa: PLC0415

        # the centroid matrix enters as ONE string literal parsed by
        # from_json (r7): the analyzer sees a single node instead of
        # n_cells x dim Literal nodes (measured 2x faster analysis at 8x64,
        # growing with cell count), and constant folding evaluates the
        # parse once at optimization time. json.dumps emits shortest
        # round-trip doubles and Jackson's parse is correctly rounded, so
        # the folded array is bit-identical to the nested-literal form.
        cmat = F.from_json(
            F.lit(json.dumps([[float(x) for x in c] for c in centroids])),
            "array<array<double>>",
        )

        def _d2(c):
            return F.aggregate(
                F.zip_with(vd, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )

        cells = F.transform(
            cmat, lambda c, i: F.struct(_d2(c).alias("d"), i.alias("c"))
        )
        nearest = F.slice(F.array_sort(cells), 1, n_probe)
        cols = [
            F.col(id_col).alias("q_id"),
            F.expr(_as_double_sql(vec_col)).alias("q_vec"),
            F.expr(_norm_sql(_as_double_sql(vec_col))).alias("q_nrm"),
            F.explode(F.transform(nearest, lambda s: s["c"])).alias("cluster"),
        ]
        # store the JVM column seq, not the Python list: py4j re-converts a
        # list argument element-by-element on every select call (~36 round
        # trips for this 4-column projection), while a cached immutable seq
        # is one call — identical expression trees, identical plan
        try:
            from pyspark.sql.classic.column import _to_seq  # noqa: PLC0415

            cols = (
                "jseq",
                _to_seq(queries.sparkSession.sparkContext, [c._jc for c in cols]),
            )
        except Exception:
            pass
        _PROBE_EXPR_CACHE.clear()  # one live quantizer, like the index cache
        _PROBE_EXPR_CACHE[ckey] = cols
    if isinstance(cols, tuple) and cols[0] == "jseq":
        return type(queries)(queries._jdf.select(cols[1]), queries.sparkSession)
    return queries.select(cols)


#: trained coarse quantizers, keyed on (corpus plan semantic hash, params).
#: An IVF index is trained ONCE and persisted alongside the inverted lists
#: (the FAISS convention); retraining per query batch would be wrong at any
#: scale. The semantic hash keys on the analyzed corpus plan, so a different
#: table / filter / SF trains its own quantizer; training is deterministic
#: (lowest-id sample, Lloyd from fixed init), so a cache hit is
#: value-identical to a retrain.
_IVF_TRAIN_CACHE: dict[tuple, list[list[float]]] = {}

#: parquet-materialized inverted-list assignments, keyed the same way
#: (VERDICT r5 #4): FAISS's add() writes vectors into their cells ONCE;
#: production IVF persists the assignment partitioned BY cell and every
#: query batch reads it. Re-assigning the corpus per batch is the same
#: class of mistake as re-training per batch. The cached value is the
#: READ-BACK relation (r6: parquet file, not .persist() — a scan node's
#: plan is a leaf, so downstream query-batch DataFrames stop
#: re-canonicalizing the centroid-literal assignment tree). Bounded to one
#: live entry (the previous file is removed on key change), and the
#: assignment is deterministic given the memoized centroids, so a rebuild
#: is value-identical to the file.
_IVF_INDEX_CACHE: dict[tuple, "DataFrame"] = {}

#: scratch directory holding the one live parquet-materialized index
#: (removed when the quantizer key changes, and at interpreter exit so
#: repeated processes don't accumulate dirs under /tmp)
_IVF_INDEX_PATH: str | None = None

#: ikey currently registered as the __ivf_index temp view (None = never);
#: lets query batches skip re-registering the unchanged cached index
_IVF_VIEW_KEY: tuple | None = None

#: (ikey, queries semanticHash, queries data version, n_probe) currently
#: registered as the __ivf_probes temp view (r11): for a repeated query
#: batch over the same quantizer the probes PROJECTION is semantically
#: identical call to call, yet each call re-ran the jseq select (eager
#: analysis of the centroid-literal HOF tree, ~23 ms) plus a view
#: re-registration (~6 ms). Key the registration like the index view and
#: both vanish from the steady-state creation path; the data-version
#: component invalidates on an in-place rewrite exactly like the index.
_IVF_PROBES_VIEW_KEY: tuple | None = None


def _cleanup_index_dir() -> None:
    import shutil  # noqa: PLC0415

    if _IVF_INDEX_PATH:
        shutil.rmtree(_IVF_INDEX_PATH, ignore_errors=True)


import atexit  # noqa: E402

atexit.register(_cleanup_index_dir)


def _corpus_fingerprint(corpus: DataFrame) -> tuple | None:
    """(session id, semantic plan hash, data version) of a corpus — the
    shared cache-key prefix for the quantizer/index caches. Computed ONCE
    per ivf_topk call and passed down (each component is a Py4J round
    trip + a file-index listing; ivf_topk used to derive it twice). The
    session id scopes cached DataFrames to the session that built them —
    a cached index DataFrame is not usable from a different session."""
    from universql_spark.operators.dedup import _data_version  # noqa: PLC0415
    from universql_spark.session import session_uid  # noqa: PLC0415

    try:
        # _data_version: an in-place corpus rewrite keeps a catalog table's
        # plan hash — stale centroids would silently skew every probe
        # (same ADVICE-r7 fix as the MinHash signature index).
        # session_uid, not id(session): VERDICT r10 item 7.
        return (session_uid(corpus.sparkSession), corpus.semanticHash(), _data_version(corpus))
    except Exception:
        return None


def ivf_train_sample(
    corpus: DataFrame,
    n_cells: int,
    iters: int,
    n_train: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fingerprint: tuple | None = None,
) -> list[list[float]]:
    """Coarse-quantizer training on a bounded deterministic sample (lowest
    n_train ids), numpy Lloyd's on the driver — the FAISS train()
    convention, same as pq_train: cell quality needs a few thousand
    representative vectors, not the corpus, so the collect is
    O(n_train x d) at ANY corpus size and the loop is n_cells x iters
    numpy ops instead of 2 x iters Spark jobs. Same conventions as
    cluster.train_centroids (init = n_cells lowest-id vectors, argmin ties
    to the lowest index, empty cells keep their centroid)."""
    import numpy as np  # noqa: PLC0415

    if fingerprint is None:
        fingerprint = _corpus_fingerprint(corpus)
    key = (
        fingerprint + (n_cells, iters, n_train, id_col, vec_col)
        if fingerprint is not None
        else None
    )
    if key is not None and key in _IVF_TRAIN_CACHE:
        return _IVF_TRAIN_CACHE[key]
    tbl = corpus.orderBy(id_col).limit(n_train).select(vec_col).toArrow()
    X = np.array(tbl.column(0).to_pylist(), dtype=float)
    C = X[:n_cells].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d2.argmin(1)
        for c in range(n_cells):
            if (a == c).any():
                C[c] = X[a == c].mean(0)
    out = C.tolist()
    if key is not None:
        _IVF_TRAIN_CACHE[key] = out
    return out


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    n_probe: int = 2,
    k: int = 5,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sort: bool = True,
) -> DataFrame:
    """IVF ANN: k-means cells are the inverted lists; queries probe only
    their n_probe nearest cells and score exactly within them.

    Scale shape (the reason IVF exists at 100 TB):
    - index build = coarse-quantizer training on a bounded sample
      (ivf_train_sample — driver cost O(n_train x d), corpus-size
      independent) + ONE narrow assignment pass over the corpus — no
      shuffle; in production the assignment is written once
      (partitioned/clustered BY cell) and reused across query batches,
      like any index.
    - query = broadcast the (tiny) probe list, equi-join on the cell id:
      the exact scoring touches ~n_probe/n_cells of the corpus instead of
      all of it, and the join is the only exchange.
    - n_probe == n_cells degenerates to exact brute force (every cell is
      searched) — which is what lets the ann_ivf_topk spec share the exact
      oracle while the pruned path is covered by a recall test.

    Same scoring/tiebreak conventions as brute_force_topk (round-4 cosine,
    id tiebreaks), so full-probe results are value-identical to it.
    """
    from universql_spark.operators.cluster import _assign  # noqa: PLC0415

    fingerprint = _corpus_fingerprint(corpus)
    centroids = ivf_train_sample(
        corpus, n_cells, iters, id_col=id_col, vec_col=vec_col,
        fingerprint=fingerprint,
    )
    ikey = (
        fingerprint + (n_cells, iters, id_col, vec_col)
        if fingerprint is not None
        else None
    )
    index = _IVF_INDEX_CACHE.get(ikey) if ikey is not None else None
    if index is None:
        vs = _as_double_sql(vec_col)
        index = _assign(corpus, centroids, vec_col).select(
            F.col(id_col).alias("n_id"), F.expr(vs).alias("n_vec"),
            F.expr(_norm_sql(vs)).alias("n_nrm"), "cluster"
        )
        if ikey is not None:
            # Materialize the inverted lists to parquet and hand consumers
            # the READ-BACK relation (the FAISS add() convention: vectors
            # are written into their cells once; query batches read the
            # index). Next to exec reuse this buys plan economy: the scan
            # node replaces the assignment tree (n_cells x dim centroid
            # literals) that every downstream DataFrame creation would
            # otherwise re-canonicalize (~0.15 s/query batch measured).
            # Assignment is deterministic given the memoized centroids, so
            # the file equals a recompute value-for-value.
            import shutil  # noqa: PLC0415
            import tempfile  # noqa: PLC0415

            global _IVF_INDEX_PATH
            spark = corpus.sparkSession
            if _IVF_INDEX_PATH:
                shutil.rmtree(_IVF_INDEX_PATH, ignore_errors=True)
            _IVF_INDEX_PATH = tempfile.mkdtemp(prefix="universql_ivf_index_")
            index.write.mode("overwrite").parquet(_IVF_INDEX_PATH)
            index = spark.read.parquet(_IVF_INDEX_PATH)
            _IVF_INDEX_CACHE.clear()
            _IVF_INDEX_CACHE[ikey] = index
    # scoring + top-k as ONE spark.sql over the two relations: the
    # equivalent DataFrame chain (join -> filter -> select -> window ->
    # filter) is 5 plan creations, each re-canonicalizing both subtrees
    # (~0.15 s/query batch of pure driver latency — r6 bench audit); the
    # BROADCAST hint is the same planner directive as F.broadcast.
    spark = corpus.sparkSession
    # the cached index is the SAME DataFrame object across query batches;
    # re-registering it under the same name every batch is a pure catalog
    # round trip — register only when the live index (or session) changes
    global _IVF_VIEW_KEY, _IVF_PROBES_VIEW_KEY
    if ikey is None or _IVF_VIEW_KEY != ikey:
        index.createOrReplaceTempView("__ivf_index")
        _IVF_VIEW_KEY = ikey
    # same move for the probes view (see _IVF_PROBES_VIEW_KEY): rebuild the
    # probe projection only when the quantizer, the query-batch SEMANTICS,
    # or the underlying data version changes
    try:
        from universql_spark.operators.dedup import _data_version  # noqa: PLC0415

        pkey = (
            (ikey, queries.semanticHash(), _data_version(queries), n_probe)
            if ikey is not None
            else None
        )
    except Exception:
        pkey = None
    if pkey is None or _IVF_PROBES_VIEW_KEY != pkey:
        probes = _probe_clusters(queries, centroids, n_probe, id_col, vec_col)
        probes.createOrReplaceTempView("__ivf_probes")
        _IVF_PROBES_VIEW_KEY = pkey
    out = spark.sql(f"""
WITH s AS (
  SELECT /*+ BROADCAST(p) */ p.q_id, i.n_id,
         round({_dot_sql("p.q_vec", "i.n_vec")} / (p.q_nrm * i.n_nrm), 4) AS cos
  FROM __ivf_index i JOIN __ivf_probes p
    ON i.cluster = p.cluster AND p.q_id <> i.n_id
)
SELECT q_id, n_id, cos, rank FROM (
  SELECT q_id, n_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM s
) WHERE rank <= {int(k)}""")
    return out.orderBy("q_id", "rank") if sort else out


# ---------------------------------------------------------------------------
# Product quantization (PQ + ADC) — the compressed-domain scale path
# ---------------------------------------------------------------------------


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 10,
    n_train: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train per-subspace codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split the d-dim vector into
    m sub-vectors and k-means each subspace independently.

    Training runs DRIVER-SIDE on a bounded deterministic sample (lowest
    n_train ids) — the FAISS train() convention: codebook quality needs a
    few thousand representative vectors, not the corpus, so the collect is
    O(n_train * d) regardless of corpus size, and the m Lloyd loops are
    numpy instead of m*iters Spark jobs. The DISTRIBUTED parts are encode
    and search. Index economics at 100 TB: codebooks are m*k_codes*(d/m)
    floats (KBs, broadcast as literals); encoded vectors are m small codes
    — m bytes at k<=256 — instead of 4d bytes, a 32x storage/scan
    compression at (m=8, d=64, float32)."""
    import numpy as np  # noqa: PLC0415

    tbl = corpus.orderBy(id_col).limit(n_train).select(vec_col).toArrow()
    X = np.array(tbl.column(0).to_pylist(), dtype=float)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * sub:(j + 1) * sub]
        C = S[:k_codes].copy()  # deterministic init, like train_centroids
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            for c in range(k_codes):
                if (a == c).any():
                    C[c] = S[a == c].mean(0)
        books.append(C.tolist())
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (n_id, codes array<int>): per subspace, the argmin-distance code.
    One narrow pass, all codegen (the same when-chain argmin as the k-means
    assigner) — the write side of the PQ index."""
    from universql_spark.operators.cluster import _dist2  # noqa: PLC0415

    sub = len(codebooks[0][0])
    v = _as_double(F.col(vec_col))
    code_cols = []
    for j, book in enumerate(codebooks):
        sv = F.slice(v, j * sub + 1, sub)
        # linear-size argmin (see cluster._assign: when-chains go 2^k)
        darr = F.array(*[_dist2(sv, c) for c in book])
        code_cols.append((F.array_position(darr, F.array_min(darr)) - 1).cast("int"))
    return corpus.select(
        F.col(id_col).alias("n_id"), F.array(*code_cols).alias("codes")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    k: int = 5,
    iters: int = 10,
    rerank: int | None = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC (asymmetric distance) top-k over PQ codes: each query precomputes
    its m x k_codes table of sub-dot-products IN the projection (queries are
    few — the table column costs nq rows), then every corpus vector is
    scored by m array lookups over its codes — no full-width vector is read
    or shuffled at query time. Cosine uses the quantized norm
    sqrt(sum_j |c_{j,code_j}|^2) from codebook-derived literal tables.

    `rerank` (the IVFADC+R refinement, Jégou et al. §V): the ADC pass keeps
    a shortlist of rerank*k candidates per query from CODES ONLY, then the
    full vectors are joined back for exact scoring of just the shortlist —
    at 100 TB the wide vectors are fetched for k*rerank*|q| rows, never
    scanned. rerank=None returns raw ADC scores.

    Approximation contract: ADC scores are exact dot products against each
    vector's QUANTIZED reconstruction — when quantization is lossless
    (sub-vectors drawn from <= k_codes distinct values) the output equals
    brute_force_topk exactly (pinned by test); on real data the recall test
    bounds the quality.
    """
    books = pq_train(corpus, m=m, k_codes=k_codes, iters=iters, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)
    sub = len(books[0][0])
    qv = _as_double(F.col(vec_col))
    # per-query ADC table T[j][c] = <q_subj, books[j][c]>
    tbl = F.array(*[
        F.array(*[
            sum(
                (F.element_at(qv, j * sub + i + 1) * F.lit(float(books[j][c][i]))
                 for i in range(sub)),
                start=F.lit(0.0),
            )
            for c in range(len(books[j]))
        ])
        for j in range(m)
    ])
    qt = queries.select(
        F.col(id_col).alias("q_id"), tbl.alias("T"), norm(qv).alias("q_nrm")
    )
    # quantized squared norms per (subspace, code) as literal tables
    n2_lits = [
        F.array(*[F.lit(float(sum(x * x for x in c))) for c in book]) for book in books
    ]
    code_j = [F.element_at(F.col("codes"), j + 1) + 1 for j in range(m)]
    approx_dot = sum(
        (F.element_at(F.element_at(F.col("T"), j + 1), code_j[j]) for j in range(m)),
        start=F.lit(0.0),
    )
    n_nrm = F.sqrt(sum((F.element_at(n2_lits[j], code_j[j]) for j in range(m)), start=F.lit(0.0)))
    scored = (
        codes.join(F.broadcast(qt))
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", F.round(approx_dot / (F.col("q_nrm") * n_nrm), 4).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .orderBy("q_id", "rank")
        )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k * rerank)
        .select("q_id", "n_id")
    )
    # exact refinement: fetch full vectors ONLY for the shortlist rows
    nvec = _with_norm(corpus, id_col, vec_col, "n")
    qvec = _with_norm(queries, id_col, vec_col, "q")
    exact = (
        shortlist.join(nvec, "n_id")
        .join(F.broadcast(qvec), "q_id")
        .select(
            "q_id", "n_id",
            F.round(
                F.expr(_dot_sql("q_vec", "n_vec")) / (F.col("q_nrm") * F.col("n_nrm")), 4
            ).alias("cos"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("q_id", "rank")
    )


def semdedup(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    cluster-then-compare. K-means clusters the embeddings (Lloyd's on the
    DataFrame API, cluster.train_centroids — driver holds k x dim only),
    then cosine near-dup pairs are computed WITHIN clusters: the candidate
    join carries the cluster id as its equi-key, so comparisons are
    O(sum_c n_c^2), not O(n^2), and the shuffle partitions by cluster.
    Survivor rule (deterministic): a document is dropped iff it has a
    near-duplicate with a LOWER id in its cluster — sort-by-id greedy, the
    common SemDeDup implementation choice (no iterative CC needed).

    At 100 TB: k scales with corpus size (n/k docs per cluster keeps the
    per-cluster quadratic bounded); the pairwise stage reuses the
    cluster-id shuffle; nothing driver-side grows past k x dim.

    -> (pairs(cluster, id_a, id_b, cos), survivors(id, cluster))
    """
    from universql_spark.operators.cluster import train_centroids

    _, _, assigned = train_centroids(corpus, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    base = assigned.select(F.col(id_col).alias("id"), "cluster", F.col(vec_col).alias("vec"))
    nrm = base.withColumn(
        "nrm", F.sqrt(F.aggregate(
            F.transform("vec", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda a, x: a + x))
    )
    a = nrm.select(F.col("id").alias("id_a"), "cluster",
                   F.col("vec").alias("a_vec"), F.col("nrm").alias("a_nrm"))
    b = nrm.select(F.col("id").alias("id_b"), F.col("cluster").alias("cluster_b"),
                   F.col("vec").alias("b_vec"), F.col("nrm").alias("b_nrm"))
    cos = F.expr(_dot_sql("a_vec", "b_vec")) / (F.col("a_nrm") * F.col("b_nrm"))
    pairs = (
        a.join(b, (F.col("cluster") == F.col("cluster_b")) & (F.col("id_a") < F.col("id_b")))
        .select("cluster", "id_a", "id_b", F.round(cos, 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
    dropped = pairs.select(F.col("id_b").alias("id")).distinct()
    survivors = base.select("id", "cluster").join(dropped, "id", "left_anti")
    return pairs.orderBy("cluster", "id_a", "id_b"), survivors.orderBy("id")


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    sort: bool = True,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query, the
    top-k most-cosine-similar corpus vectors with a DIFFERENT label.

    Same scale shape as brute_force_topk (queries MUST be the bounded,
    broadcast-sized probe set; corpus scanned once; per-query window
    top-k) — the label-mismatch predicate rides the broadcast join, so no
    extra pass or shuffle. Ranking key is round(cos, 4) with id tiebreak,
    the deliberately coarse convention that keeps float noise from
    flipping the top-k boundary between engines."""
    qv, cv = _as_double_sql(vec_col), _as_double_sql(vec_col)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.expr(qv).alias("q_vec"),
        F.expr(_norm_sql(qv)).alias("q_nrm"),
        F.col(label_col).alias("q_lbl"),
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.expr(cv).alias("n_vec"),
        F.expr(_norm_sql(cv)).alias("n_nrm"),
        F.col(label_col).alias("n_lbl"),
    )
    cos = F.expr(_dot_sql("q_vec", "n_vec")) / (F.col("q_nrm") * F.col("n_nrm"))
    scored = c.join(
        F.broadcast(q),
        (F.col("q_id") != F.col("n_id")) & (F.col("q_lbl") != F.col("n_lbl")),
    ).select("q_id", "n_id", F.round(cos, 4).alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    out = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return out.orderBy("q_id", "rank") if sort else out


def _subvector_rows(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_sub: int,
    dim: int,
    prefix: str,
) -> DataFrame:
    """(id, sub_no, sub_vec, sub_nrm): each vector split into n_sub
    contiguous slices (the deterministic multi-vector synthesis — in a real
    late-interaction corpus each doc arrives with its own token vectors;
    the slicing stands in for that with no RNG so oracles can reproduce
    it). Slice + norm are codegen expressions; one output row per
    (vector, slice)."""
    w = dim // n_sub
    v = _as_double_sql(vec_col)
    subs = F.array(
        *[
            F.struct(
                F.lit(i).alias("sub_no"),
                F.expr(f"slice({v}, {i * w + 1}, {w})").alias("sub"),
            )
            for i in range(n_sub)
        ]
    )
    ex = df.select(F.col(id_col).alias(f"{prefix}_id"), F.explode(subs).alias("s"))
    return ex.select(
        f"{prefix}_id",
        F.col("s.sub_no").alias(f"{prefix}_sub"),
        F.col("s.sub").alias(f"{prefix}_vec"),
        F.expr(_norm_sql("s.sub")).alias(f"{prefix}_nrm"),
    )


def maxsim_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int = 64,
    n_sub: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sort: bool = True,
) -> DataFrame:
    """ColBERT-style MaxSim late-interaction retrieval.

    Each document and query is a BAG of sub-vectors (here: n_sub contiguous
    slices of the embedding — deterministic, oracle-reproducible).
    score(q, d) = sum over q's sub-vectors of the max cosine against any of
    d's sub-vectors; per-query top-k by score.

    Plan shape: the whole MaxSim score computes in ONE row-local
    expression per (doc, query) pair — n_sub^2 slice dots, per-query-sub
    GREATEST, fixed-order sum — so the operator is a single corpus scan +
    broadcast join (the query side is the small, broadcast one) + per-query
    window, with NO aggregation shuffle at all. Work is bounded by
    |queries| x |corpus|, never corpus x corpus. At 100 TB the composition
    is IVF/Hamming candidate pruning first, MaxSim re-rank on the
    survivors (same operator, smaller corpus side).

    Ranking key is round(maxsim, 4) with id tiebreak (the repo-wide
    convention that keeps float noise off the top-k boundary)."""
    w_len = dim // n_sub
    v = _as_double_sql(vec_col)

    def side(df: DataFrame, p: str) -> DataFrame:
        cols = [F.col(id_col).alias(f"{p}_id")]
        for i in range(n_sub):
            sub = f"slice({v}, {i * w_len + 1}, {w_len})"
            cols.append(F.expr(sub).alias(f"{p}_s{i}"))
            cols.append(F.expr(_norm_sql(sub)).alias(f"{p}_n{i}"))
        return df.select(*cols)

    c = side(corpus, "d")
    q = side(queries, "q")
    per_qsub = [
        "greatest("
        + ", ".join(
            f"{_dot_sql(f'q_s{i}', f'd_s{j}')} / (q_n{i} * d_n{j})"
            for j in range(n_sub)
        )
        + ")"
        for i in range(n_sub)
    ]
    score = F.round(F.expr(" + ".join(f"({t})" for t in per_qsub)), 4)
    scored = c.join(F.broadcast(q), F.col("q_id") != F.col("d_id")).select(
        "q_id", "d_id", score.alias("maxsim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("maxsim"), F.asc("d_id"))
    out = scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(F.col("rank") <= k)
    return out.orderBy("q_id", "rank") if sort else out
