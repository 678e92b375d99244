"""Streaming windowed aggregation over the events fixture.

Pipelines (all readStream -> transform -> writeStream, testable against a
parquet directory source — the same API reads a Kafka topic in production):

- tumbling_counts: 10-min tumbling window x event_type, 1h watermark
- sliding_value_sum: 10-min window sliding every 5, decimal-exact value sums
- session_counts: session_window(ts, '30 minutes') per user

Late data: the watermark bounds state — at 100 TB-scale ingest this is the
knob that keeps windowed state finite; without it every window lives forever.
The batch twins (queries/llmops.py stream_tumbling_counts and the
win_sessionize spec) pin the semantics against the DuckDB oracle; the
streaming tests assert stream output == batch output on the same fixture,
which is exactly Structured Streaming's incremental-view contract.
"""

from __future__ import annotations

import pathlib
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from universql_spark.session import load_table


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream with the events schema (ts already normalized to
    TimestampType by the same conversion the batch view layer applies).

    Spark's file stream source wants a DIRECTORY (new files appear -> new
    micro-batches); the fixture is a single file, so it is exposed through a
    symlink directory — in production this path is the landing dir or a Kafka
    topic, same downstream pipeline.
    """
    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = pathlib.Path(tempfile.gettempdir()) / f"universql_stream_{abs(hash(sf_dir)) % 10**8}"
    src.mkdir(exist_ok=True)
    link = src / "events.parquet"
    if not link.exists():
        link.symlink_to(f"{sf_dir}/events.parquet")
    stream = spark.readStream.schema(raw_schema).parquet(str(src))
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        # Same normalization load_table applies to the batch view: watermarks
        # and window() require event time on TIMESTAMP (LTZ), and the session
        # runs in UTC so the cast is value-preserving.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream.select(*batch.columns)


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("c"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"), "event_type", "c")
    )


def sliding_value_sum(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.expr("CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS STRING) AS DOUBLE)").alias("total"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"), "total")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, key: str = "props", watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: first event per key value within the watermark
    horizon. dropDuplicates on a streaming frame keeps per-key state; the
    watermark bounds it (keys older than the horizon are evicted) — the
    streaming twin of dedup_exact, and the state-size story that matters at
    ingest scale: state = one row per distinct key in the horizon, not per
    event."""
    return events.withWatermark("ts", watermark).dropDuplicates([key])


def stream_dedup_within_watermark(
    events: DataFrame, key: str = "props", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dedup with EVENT-TIME state eviction:
    dropDuplicatesWithinWatermark keeps a key's state only for the watermark
    interval after its event time, then expires it — unlike dropDuplicates,
    whose per-key state grows with DISTINCT KEYS EVER SEEN. For an unbounded
    ingest stream (every doc id unique), plain dropDuplicates state is O(all
    time) and eventually OOMs the state store; within-watermark state is
    O(keys per horizon) — the only shape that survives at pipeline scale.
    Contract difference: re-occurrences separated by MORE than the horizon
    are re-emitted (the batch twin is therefore dedup within a time window,
    not global distinct)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark([key])


def view_click_attribution(
    events: DataFrame, horizon: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """STREAM-STREAM inner join: attribute each click to the same user's
    preceding view within `horizon` — the canonical ad-attribution shape.
    Both sides carry watermarks and the join condition bounds event time on
    BOTH ends, so Spark can size the state store and evict expired rows
    (without the time bound, stream-stream state grows forever — the
    knob that matters at ingest scale)."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", watermark)
    )
    joined = clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {horizon}")),
    )
    return joined.select(
        F.col("c_user").alias("user_id"), "click_id", "view_id",
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
    )


def run_append_to_memory(stream_df: DataFrame, name: str) -> None:
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def run_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drain the (file-bounded) stream into an in-memory sink, waiting for
    completion — test/demo harness; production uses a real sink + trigger."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def view_click_attribution_outer(
    events: DataFrame, horizon: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """STREAM-STREAM LEFT OUTER join: every click emits — attributed to the
    preceding view within `horizon` when one exists, null-padded otherwise.
    The null-padded rows are the semantically hard part: Spark can only
    declare 'no view will ever arrive' once the WATERMARK passes the join
    window's upper bound, so unmatched clicks sit in the state store until
    eviction and emit in a LATER micro-batch. Both sides' watermarks + the
    two-sided time bound keep that state finite (same eviction contract as
    the inner form above)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    joined = clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {horizon}")),
        "leftOuter",
    )
    return joined.select(
        F.col("c_user").alias("user_id"), "click_id", "view_id",
        F.date_format("c_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
    )


def windowed_cms_cells(
    events: DataFrame, w: int = 32, d: int = 4, watermark: str = "1 hour"
) -> DataFrame:
    """Per-window count-min sketch cells over the user_id stream — the
    mergeable-sketch path for streaming heavy hitters (the streaming twin
    of queries/llmops.text_cms_heavy_hitters).

    Why this shape at scale: exact per-window user counts hold state
    proportional to the distinct-user cardinality per window (unbounded on
    a web stream); the sketch holds <= w*d cells per window NO MATTER the
    cardinality, the cells are non-negative counts that merge across
    micro-batches by addition (exactly what a streaming agg's state update
    does), and the watermark evicts whole windows. A probe's estimate is
    min over the d rows of its cells — never an undercount. Downstream,
    per-window sketches merge across windows/shards by cell-wise addition.
    """
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    F.pmod(F.xxhash64(F.lit(r), F.col("user_id")), F.lit(w)).alias("c"),
                )
                for r in range(d)
            ]
        )
    ).alias("rc")
    return (
        events.withWatermark("ts", watermark)
        .select("ts", cells)
        .select("ts", "rc.r", "rc.c")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "r", "c")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "r",
            "c",
            "cnt",
        )
    )


def user_tier_dim(events_batch: DataFrame) -> DataFrame:
    """Static enrichment dimension: per-user lifetime-value quartile tier.
    In production this is a dimension table (users, price books, model
    registries) refreshed out of band; here it derives deterministically
    from the batch fixture so stream==batch is checkable."""
    per_user = events_batch.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(28,6)")).alias("ltv")
    )
    return per_user.select(
        "user_id",
        F.ntile(4).over(W.orderBy(F.col("ltv").asc(), F.col("user_id").asc())).alias("tier"),
    )


def static_enriched_counts(
    events: DataFrame, dim: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """STREAM-STATIC inner join + windowed aggregation: each micro-batch
    joins against the static dimension (broadcast by the planner — the dim
    is bounded), then tumbling counts per (window, tier). Stream-static
    joins are stateless on the stream side — no watermark needed for the
    join itself, only for the windowed agg's state eviction. At 100 TB
    ingest the dim stays a broadcast; the only stateful operator is the
    window agg, bounded by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .join(dim, "user_id")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "tier")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("v"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "tier",
            "c",
            F.col("v").cast("double").alias("v"),
        )
    )


def attribution_windowed_counts(
    events: DataFrame, horizon: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """CHAINED stateful operators in one streaming query: the stream-stream
    attribution join feeds a tumbling windowed aggregation downstream —
    Spark runs both stateful operators in a single query (3.4+ multiple
    stateful operators), each with its own state store; the join's
    two-sided event-time bound and the window's watermark evict
    independently. The 100 TB shape for funnel dashboards: no intermediate
    sink/re-read between the join and the rollup."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", watermark)
    )
    joined = clicks.join(
        views,
        (F.col("c_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("v_ts") >= F.col("c_ts") - F.expr(f"INTERVAL {horizon}")),
    )
    return (
        joined.groupBy(F.window("c_ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n_attrib"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_attrib",
        )
    )
