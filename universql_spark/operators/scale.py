"""Scale-pattern operators: salted aggregation for skewed keys, bucketed
co-located joins. These are the knobs the brief calls out ("skewed keys ->
salting, bucketing for co-located joins") packaged as reusable helpers whose
outputs are provably identical to the naive formulation (the salted agg has
a plain GROUP BY oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key: str,
    value_expr: Column,
    alias: str,
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase SUM for skew-heavy group keys.

    Phase 1 groups by (key, salt) so one hot key spreads over salt_buckets
    reducers; phase 2 combines the partial sums per key. SUM/COUNT/MIN/MAX
    decompose exactly, so the result is identical to a direct groupBy — at
    the cost of a second (tiny: |keys| x salt_buckets rows) shuffle. Spark's
    partial aggregation already handles *moderate* skew map-side; explicit
    salting is for the pathological case where even the merged partials for
    one key overload a single reducer (billions of rows per key at 100 TB).

    salt derives from a value column (or spark_partition_id) — NOT rand(),
    which would break retry determinism.
    """
    salt = (
        F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_buckets))
        if salt_source
        else F.spark_partition_id() % salt_buckets
    )
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.sum(value_expr).alias("__partial"), F.count("*").alias("__n"))
    )
    return phase1.groupBy(key).agg(
        F.sum("__partial").alias(alias), F.sum("__n").alias(f"{alias}_count")
    )


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, num_buckets: int = 8
) -> None:
    """Persist as a bucketed+sorted managed table: subsequent equi-joins on
    bucket_col between tables bucketed the same way need NO exchange (the
    scan is already hash-distributed) — the batch analogue of co-partitioned
    state, and the single biggest shuffle-eliminator for repeated big joins.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # clear an orphaned location (e.g. a previously interrupted write) —
    # saveAsTable refuses to create a managed table over leftover files
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(f"{wh.path}/{table.lower()}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, force_sortmerge: bool = False
) -> DataFrame:
    """Join two same-bucketed tables on the bucket column (no exchange).

    force_sortmerge pins the shuffle-free SortMergeJoin even when the tables
    are broadcast-sized (the planner otherwise broadcasts and disables the
    bucketed scan — right call on small inputs, wrong at 100 TB where the
    bucketed path is the point).
    """
    left = spark.table(left_table)
    if force_sortmerge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on)


def write_partitioned(df: DataFrame, table: str, partition_col: str) -> None:
    """Persist hive-style partitioned: queries filtering on partition_col
    prune whole directories at planning time (PartitionFilters in the scan) —
    the table layout that makes date-ranged queries at 100 TB read only the
    days they touch."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(f"{wh.path}/{table.lower()}", ignore_errors=True)
    df.write.mode("overwrite").partitionBy(partition_col).saveAsTable(table)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 32,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pack documents into training sequences of <= ``budget`` tokens
    (streaming next-fit packing): within a shard, documents are taken in
    id order and a document starts a new sequence when the running total
    before it crosses a budget boundary. The standard pretraining
    sequence-packing step, made deterministic and distributed.

    Scale shape: sharding bounds the window's partition size — each shard's
    cumulative sum is an independent window over (shard) with one shuffle,
    so parallelism = n_shards regardless of corpus size (pick n_shards ~
    cluster cores; the real pipelines pack per input shard exactly like
    this). No collect, no global sort.

    -> (shard, seq_id, n_docs, n_tokens) one row per packed sequence.
    """
    from pyspark.sql.window import Window

    shard = (F.col(id_col) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.select(shard, F.col(id_col), F.col(token_col).alias("tok"))
    cum = F.sum("tok").over(w)
    seq = F.floor((cum - F.col("tok")) / F.lit(budget)).alias("seq_id")
    return (
        staged.select("shard", seq, "tok")
        .groupBy("shard", "seq_id")
        .agg(F.count("*").alias("n_docs"), F.sum("tok").alias("n_tokens"))
    )


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Z-order (Morton) key over 2-4 numeric columns as a pure codegen
    expression: each column is min/max-normalized to a `bits`-bit integer
    rank, then the ranks' bits are interleaved. Rows close in Z-value are
    close in EVERY dimension, so range-partitioning by the key yields files
    whose per-column min/max bounds are tight RECTANGLES — manifest/footer
    pruning then skips files for predicates on ANY of the columns, where
    linear CLUSTER BY only serves its leading column. This is Delta/Iceberg
    OPTIMIZE ZORDER semantics re-expressed with shift/and/or built-ins.

    The min/max pass is one metadata-sized agg (k values to the driver) —
    same collect scale as the partition-spec lookups. At 100 TB run it on a
    sample or reuse table-level stats; the mapping only needs to be
    monotone, not exact.
    """
    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder_key supports 2-4 columns")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    stats = df.agg(*aggs).collect()[0]
    nmax = (1 << bits) - 1
    ranks = []
    for c in cols:
        lo, hi = float(stats[f"min_{c}"]), float(stats[f"max_{c}"])
        span = (hi - lo) or 1.0
        ranks.append(
            F.least(
                F.lit(nmax),
                ((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * nmax).cast("bigint"),
            )
        )
    n = len(cols)
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, r in enumerate(ranks):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(r, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return z


def zorder_files(df: DataFrame, cols: list[str], n_files: int, bits: int = 16) -> DataFrame:
    """Range-partition by the Z-key into n_files write tasks, sorted within
    each, then drop the key — the layout step of OPTIMIZE ZORDER. Feed the
    result straight to a parquet/Iceberg write (one file per partition).
    A single column needs no bit interleaving: LINEAR clustering on it
    (plain range sort) gives strictly disjoint per-file bounds, which is
    the optimum a Z-curve only approximates in 2+ dimensions."""
    if len(cols) == 1:
        return df.repartitionByRange(n_files, cols[0]).sortWithinPartitions(cols[0])
    keyed = df.withColumn("__z", zorder_key(df, cols, bits))
    return (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
