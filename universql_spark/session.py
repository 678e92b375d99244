"""SparkSession factory + testdata registration.

Scale stance: these configs are written for local[32] testing but the knobs
are the ones that matter on a 1000-executor cluster too — AQE owns runtime
re-planning (partition coalescing, skew-join splitting), shuffle partitions
default to the core count locally and would be sized to ~2-3x total cores on
a real cluster, and Arrow is enabled for every Python<->JVM crossing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver materializes under /root/testdata/sf*/ (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "universql_spark", cpus: int | None = None) -> SparkSession:
    """One tuned session per process.

    - AQE on: runtime partition coalescing + skew-join handling — this is the
      knob that makes the same plan work at sf0.001 and at 100 TB.
    - shuffle.partitions = core count locally; on a cluster this would be
      2-3x total executor cores (AQE coalesces the excess).
    - nanosAsLong: the events fixture stores TIMESTAMP(NANOS) which Spark's
      parquet reader refuses by default; we read the raw int64 and convert in
      the view layer (register_testdata) with `timestamp_micros(ts div 1000)`,
      matching DuckDB's ns->us truncation.
    """
    n = cpus or default_cpus()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # coalesce to target SIZE, not parallelism: tiny post-shuffle stages
        # collapse to few tasks locally; at cluster scale 64 MB partitions
        # are the shuffle sweet spot and skew still splits via skewJoin
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4m")
        # local mode has no data locality to wait for; on a cluster the
        # default 3s wait trades latency for locality — here it's pure stall
        .config("spark.locality.wait", "0s")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.sql.warehouse.dir", "/tmp/universql_spark_warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with engine-canonical column types.

    Conversions (kept HERE, once, so every query sees clean types):
    - events.ts: int64 nanos (via nanosAsLong) -> TimestampType at µs
      precision using integer division — `div` not `/` because float division
      of ~1.7e18 ns loses precision past 2^53.
    - any TIMESTAMP_NTZ column -> TimestampType (LTZ): fixture parquet that
      stores plain timestamp[us] without a timezone is inferred as NTZ by
      Spark 4; with the session pinned to UTC the cast is value-identical,
      and it keeps the whole engine on one timestamp type (functions like
      unix_micros are LTZ-only).
    """
    if name == "events":
        # The caller may hand us a vanilla SparkSession (the driver does);
        # nanosAsLong is a runtime-settable SQLConf, so set it here rather
        # than relying on get_spark()'s builder config.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def register_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view named after the table.

    Temp views keep the scan lazy: Catalyst still sees the parquet relation,
    so filter/column pushdown reaches the file scan (verify with
    ``df.explain("formatted")`` -> PushedFilters / ReadSchema).
    """
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
