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


def _assign(corpus: DataFrame, centroids: list[list[float]], vec_col: str) -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    best_c, best_d = F.lit(0), _dist2(v, centroids[0])
    for ci in range(1, len(centroids)):
        d = _dist2(v, centroids[ci])
        cond = d < best_d
        best_c = F.when(cond, F.lit(ci)).otherwise(best_c)
        best_d = F.when(cond, d).otherwise(best_d)
    return corpus.withColumn("cluster", best_c).withColumn("dist2", best_d)


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
