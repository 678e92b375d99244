"""Connected components over a pair graph — dedup GROUPS, not just pairs.

Near-dup detection yields PAIRS (a~b, b~c); a training-data pipeline needs
GROUPS ({a,b,c} -> keep one). Component id = min doc_id reachable, computed
by iterative min-label propagation:

    labels(id) = id
    repeat: label(id) = min(label(id), min over neighbors' labels)

Each iteration is one equi-join + one groupBy — all shuffles keyed by node
id, no driver-side graph. Convergence needs <= graph-diameter iterations
(dup clusters are tiny cliques, so 2-3); the loop checks an actual
convergence count and localCheckpoints every iteration to truncate lineage —
without that, iterative DataFrame loops compile ever-growing plans (the
classic Spark-iteration trap; at cluster scale use checkpoint() to
reliable storage instead).

DuckDB oracle: WITH RECURSIVE transitive closure + min per node — exact same
semantics, viable because the oracle runs at toy scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame, edges: DataFrame, id_col: str = "id", src: str = "id_a", dst: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """nodes(id), edges(src,dst) -> (id, component=min reachable id)."""
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("lbl")).localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.a == labels.id)
            .groupBy("b")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.b, "left")
            .select("id", F.least("lbl", F.coalesce("nlbl", F.col("lbl"))).alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("lbl").alias("component"))
