"""Embedding clustering: Lloyd's k-means as a DataFrame-iteration pipeline.

The canonical training-data curation op Spark lacks cheaply without MLlib
(not everything ships the mllib jar in slim deployments; this stays on the
DataFrame API). Structure per iteration:

    centroids (k x dim doubles, driver-side — legitimately tiny) are inlined
    as literals -> one pass assigns argmin-distance cluster per row (narrow)
    -> one groupBy(cluster) recomputes means (single shuffle of k x dim
    partials)

The ONLY driver-side data ever collected is the k x dim centroid matrix —
the corpus itself never leaves executors, so the loop scales to any corpus
size; iteration count is the wall-clock knob. Deterministic: init = the k
lowest-id vectors, ties impossible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dist2(vec_col, centroid: list[float]):
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diff = F.zip_with(vec_col, c, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def _sql_double(x: float) -> str:
    """Python float -> Spark SQL double literal (repr keeps full precision;
    the D suffix accepts scientific notation)."""
    r = repr(float(x))
    return f"{r}D" if ("e" in r or "." in r) else f"{r}.0D"


def _dist2_sql(vec_sql: str, centroid: list[float]) -> str:
    arr = "array(" + ",".join(_sql_double(x) for x in centroid) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {arr}, (a, b) -> (a - b) * (a - b)), "
        f"0D, (acc, x) -> acc + x)"
    )


def _assign(corpus: DataFrame, centroids: list[list[float]], vec_col: str) -> DataFrame:
    """argmin-distance centroid per row. LINEAR expression size: the naive
    when-chain (best = when(d < best, ...).otherwise(best)) embeds the
    running best TWICE per step — a 2^k expression tree that stalls Catalyst
    outright at k=16 (hit by the PQ codebooks). array_min + array_position
    keep it O(k); array_position takes the FIRST match, so distance ties
    break to the lowest centroid index, deterministically.

    Built as ONE SQL string per column (F.expr), not k x dim nested Column
    calls: the Column route costs hundreds of Py4J round-trips per
    centroid matrix (~1.3 s of pure driver latency for 8 x 64 — measured in
    the r4 bench audit); a string parse is a single call with identical
    semantics and evaluation order."""
    v = f"transform({vec_col}, x -> CAST(x AS DOUBLE))"
    darr = "array(" + ",".join(_dist2_sql(v, c) for c in centroids) + ")"
    # materialize the distance array in ONE projection and derive
    # cluster/dist2 from the column: darr is ~10 KB of literals per 8x64
    # centroid matrix, and embedding it three times tripled the parse /
    # analysis latency (r5 bench audit; Catalyst prunes the temp column)
    return (
        corpus.withColumn("_d2arr", F.expr(darr))
        .withColumn(
            "cluster",
            F.expr("CAST(array_position(_d2arr, array_min(_d2arr)) - 1 AS INT)"),
        )
        .withColumn("dist2", F.expr("array_min(_d2arr)"))
        .drop("_d2arr")
    )


def train_centroids(
    corpus: DataFrame,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[float], DataFrame]:
    """Lloyd iterations -> (final centroids, inertia history, last
    pre-update assignment). Deterministic init (k lowest-id vectors); empty
    clusters keep their previous centroid (standard fallback). Also the
    coarse-quantizer trainer for the IVF ANN index (similarity.ivf_topk)."""
    dim = len(corpus.select(vec_col).first()[0])
    init = corpus.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in init]
    inertia_hist: list[float] = []
    assigned = None
    for _ in range(iters):
        assigned = _assign(corpus, centroids, vec_col)
        sums = assigned.groupBy("cluster").agg(
            *[F.sum(F.col(vec_col)[d].cast("double")).alias(f"s{d}") for d in range(dim)],
            F.count("*").alias("n"),
            F.sum("dist2").alias("inertia"),
        )
        rows = {r["cluster"]: r for r in sums.collect()}
        inertia_hist.append(sum(r["inertia"] for r in rows.values()))
        centroids = [
            [rows[ci][f"s{d}"] / rows[ci]["n"] for d in range(dim)] if ci in rows else centroids[ci]
            for ci in range(k)
        ]
    return centroids, inertia_hist, assigned


def kmeans(
    corpus: DataFrame,
    k: int = 10,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[float]]:
    """-> (assignments DataFrame(id, cluster, dist2), inertia history)."""
    _centroids, inertia_hist, assigned = train_centroids(corpus, k, iters, id_col, vec_col)
    out = assigned.select(F.col(id_col).alias("id"), "cluster", F.round("dist2", 4).alias("dist2"))
    return out.orderBy("id"), inertia_hist


def pca_project(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, "object"]:
    """Distributed PCA for embedding compression (the dimension-reduction
    step a pipeline runs before ANN indexing / clustering at scale).

    Two passes, driver work bounded by d^2 (never the row count):

    1. moment accumulation: posexplode each vector once into (i, x_i) and
       the upper-triangle pair stream (i, j, x_i * x_j) via a JVM-side
       nested transform — groupBy position gives the d sums and d(d+1)/2
       cross-moments with partial aggregation; only d + d^2/2 rows reach
       the driver.
    2. numpy eigendecomposition of the d x d covariance (driver, O(d^3) on
       tiny d), then a broadcast projection matrix applied per row with
       built-in aggregate/transform expressions (whole-stage codegen).

    -> (DataFrame[id, proj array<double>[k]], components ndarray [k, d])
    Component SIGNS are fixed (first nonzero coordinate positive) so the
    output is deterministic across runs and partitionings.
    """
    import numpy as np

    d = len(df.select(vec_col).first()[0])
    v = F.col(vec_col)
    # pass 1: first and second moments
    sums = (
        df.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    n = sums[0].n
    mean = np.zeros(d)
    for r in sums:
        mean[r.i] = r.s / n
    pairs = (
        df.select(
            F.explode(
                F.expr(
                    f"flatten(transform({vec_col}, (xi, i) -> "
                    f"transform(slice({vec_col}, i + 1, size({vec_col}) - i), (xj, j) -> "
                    f"struct(i AS i, i + j AS j, CAST(xi AS DOUBLE) * xj AS p))))"
                )
            ).alias("e")
        )
        .select("e.i", "e.j", "e.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("sp"))
        .collect()
    )
    cov = np.zeros((d, d))
    for r in pairs:
        cov[r.i, r.j] = cov[r.j, r.i] = r.sp / n - mean[r.i] * mean[r.j]
    w, vecs = np.linalg.eigh(cov)
    comps = vecs[:, ::-1][:, :k].T  # [k, d], descending eigenvalue order
    for row in comps:  # deterministic signs
        nz = row[np.abs(row) > 1e-12]
        if len(nz) and nz[0] < 0:
            row *= -1

    # pass 2: project — centered dot products, all JVM-side
    mean_arr = F.array(*[F.lit(float(m)) for m in mean])
    centered = F.zip_with(v.cast("array<double>"), mean_arr, lambda a, b: a - b)
    proj_cols = []
    for ci in range(k):
        c_arr = F.array(*[F.lit(float(x)) for x in comps[ci]])
        dot = F.aggregate(
            F.zip_with(centered, c_arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        proj_cols.append(F.round(dot, 6))
    out = df.select(F.col(id_col), F.array(*proj_cols).alias("proj"))
    return out, comps


def kcenter_sample(
    corpus: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Farthest-point (Gonzalez 1985 k-center) diversity sample: k vectors
    that greedily maximize the minimum pairwise distance — the standard
    "coverage" sampler for picking maximally-diverse training examples or
    seeding annotation batches.

    Scale shape: k-1 NARROW passes, each computing every row's min dist2
    to the selected set (the set enters the plan as ONE nested-array
    literal, like similarity._probe_clusters) and reducing to a single
    argmax row via orderBy+limit(1) — Spark plans that as
    TakeOrderedAndProject (per-partition top-1, driver merge), never a
    global sort shuffle. Driver state is k x dim floats. Deterministic:
    seed = lowest id, distance ties argmax to the lowest id, double
    arithmetic is the same left-to-right (x-y)^2 fold everywhere, so a
    python oracle reproduces selections bit-for-bit.
    """
    vd = F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
    first = (
        corpus.orderBy(id_col).limit(1).select(F.col(id_col).alias("id"), vd.alias("v")).collect()[0]
    )
    picked: list[tuple] = [(1, first["id"], 0.0)]
    centers = [[float(x) for x in first["v"]]]
    for rank in range(2, k + 1):
        d2min = F.array_min(
            F.transform(
                F.lit(centers),
                lambda c: F.aggregate(
                    F.zip_with(vd, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
        )
        far = (
            corpus.select(F.col(id_col).alias("id"), vd.alias("v"), d2min.alias("d2"))
            .orderBy(F.desc("d2"), F.asc("id"))
            .limit(1)
            .collect()[0]
        )
        picked.append((rank, far["id"], far["d2"]))
        centers.append([float(x) for x in far["v"]])
    spark = corpus.sparkSession
    out = spark.createDataFrame(
        [(r, i, float(d)) for r, i, d in picked],
        schema="sel_rank INT, vec_id BIGINT, min_dist2 DOUBLE",
    )
    return out.select("sel_rank", "vec_id", F.round("min_dist2", 4).alias("min_dist2"))
