"""Streaming == batch on the same bounded input (Structured Streaming's
incremental-view contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from universql_spark.session import load_table
from universql_spark.streaming import windows


def _batch_tumbling(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("c"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"), "event_type", "c")
    )


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = windows.tumbling_counts(windows.events_stream(spark, sf_dir))
    windows.run_to_memory(stream, "t_tumbling")
    got = {tuple(r) for r in spark.table("t_tumbling").collect()}
    want = {tuple(r) for r in _batch_tumbling(spark, sf_dir).collect()}
    assert got == want and len(want) > 0


def test_stream_session_window_runs(spark, sf_dir):
    stream = windows.session_counts(windows.events_stream(spark, sf_dir))
    windows.run_to_memory(stream, "t_sessions")
    out = spark.table("t_sessions")
    assert out.count() > 0
    # session semantics sanity: no user has more sessions than events
    ev = load_table(spark, sf_dir, "events").groupBy("user_id").count()
    sess = out.groupBy("user_id").agg(F.count("*").alias("n_sess"), F.sum("n_events").alias("tot"))
    joined = sess.join(ev, "user_id")
    bad = joined.filter((F.col("n_sess") > F.col("count")) | (F.col("tot") != F.col("count"))).count()
    assert bad == 0


def test_stream_sliding_runs(spark, sf_dir):
    stream = windows.sliding_value_sum(windows.events_stream(spark, sf_dir))
    windows.run_to_memory(stream, "t_sliding")
    assert spark.table("t_sliding").count() > 0


def test_stateful_user_profiles(spark, sf_dir):
    from universql_spark.streaming import stateful

    stream = stateful.user_profiles(windows.events_stream(spark, sf_dir))
    stateful.run_update_to_memory(stream, "t_profiles")
    # bounded input + update mode: keep the LAST emission per user
    out = (
        spark.table("t_profiles")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("value_sum").alias("value_sum"))
    )
    ev = load_table(spark, sf_dir, "events")
    want = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), F.sum("value").alias("value_sum")
    )
    joined = out.alias("got").join(want.alias("w"), "user_id")
    bad = joined.filter(
        (F.col("got.n_events") != F.col("w.n_events"))
        | (F.abs(F.col("got.value_sum") - F.col("w.value_sum")) > 1e-6)
    ).count()
    assert bad == 0
    assert out.count() == want.count()


def test_stream_dedup_matches_batch_distincts(spark, sf_dir):
    stream = windows.stream_dedup(windows.events_stream(spark, sf_dir), key="props")
    windows.run_append_to_memory(stream, "t_dedup")
    got = spark.table("t_dedup")
    ev = load_table(spark, sf_dir, "events")
    n_distinct = ev.select("props").distinct().count()
    assert got.count() == n_distinct
    assert got.select("props").distinct().count() == n_distinct


def test_stream_dedup_within_watermark(spark, sf_dir):
    """dropDuplicatesWithinWatermark: same distinct output as global dedup
    when every duplicate pair sits within the horizon (true for the fixture
    processed as one micro-batch), with state bounded by event time instead
    of by keys-ever-seen."""
    stream = windows.stream_dedup_within_watermark(
        windows.events_stream(spark, sf_dir), key="props", watermark="100 days"
    )
    windows.run_append_to_memory(stream, "t_dedup_wm")
    got = spark.table("t_dedup_wm")
    ev = load_table(spark, sf_dir, "events")
    n_distinct = ev.select("props").distinct().count()
    assert got.count() == n_distinct
    assert got.select("props").distinct().count() == n_distinct


def test_stream_ingest_to_iceberg(spark, sf_dir, tmp_path):
    """File stream -> foreachBatch -> Iceberg append commits: every
    micro-batch becomes one `append` snapshot; final contents equal the
    batch read; replaying a committed batch id is a no-op (idempotence)."""
    from universql_spark.iceberg_format import IcebergTable
    from universql_spark.streaming import ingest, windows

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    t = IcebergTable.create(str(tmp_path / "ice_stream"), ev.limit(0))
    stream = windows.events_stream(spark, sf_dir).select("event_id", "user_id", "event_type")
    ingest.stream_to_iceberg(stream, t, str(tmp_path / "ckpt"))

    assert t.read(spark).count() == ev.count()
    snaps = t.snapshots()
    assert all(s["operation"] == "append" for s in snaps)
    last = ingest._last_batch_id(t)
    assert last is not None
    # replay protection: re-delivering a committed batch id is a no-op
    n_snaps, before = len(snaps), t.read(spark).count()
    assert ingest.commit_batch(t, ev.limit(5), last) is False
    assert t.read(spark).count() == before
    assert len(t.snapshots()) == n_snaps
    # a NEW batch id does commit
    assert ingest.commit_batch(t, ev.limit(5), last + 1) is True
    assert t.read(spark).count() == before + 5


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """Stream-stream inner join (view->click attribution, both sides
    watermarked + time-bounded) produces exactly the batch join's rows —
    Structured Streaming's incremental-view contract for joins."""
    stream = windows.view_click_attribution(windows.events_stream(spark, sf_dir))
    windows.run_append_to_memory(stream, "t_attrib")
    got = {tuple(r) for r in spark.table("t_attrib").collect()}
    want = {tuple(r) for r in windows.view_click_attribution(
        load_table(spark, sf_dir, "events")
    ).collect()}
    assert got == want and len(want) > 0


def test_stream_upsert_to_iceberg_cdc(spark, sf_dir, tmp_path):
    """Changelog stream -> per-batch equality upserts: the table converges
    to one row per key (the latest), replaying a committed batch is a
    no-op, and nothing is ever rewritten (upsert appends + eq-deletes)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from universql_spark.iceberg_format import IcebergTable
    from universql_spark.streaming import ingest

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", "ts"
    )
    # seed: one stale row per user
    seed = ev.groupBy("user_id").agg(
        F.min("event_type").alias("event_type"),
        F.lit(-1.0).alias("value"), F.min("ts").alias("ts"),
    )
    t = IcebergTable.create(str(tmp_path / "cdc_sink"), seed)
    # changelog = latest event per user
    latest = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("value"))
            ),
        )
        .filter("rn = 1").drop("rn")
    )
    src_dir = tmp_path / "cdc_src"
    latest.coalesce(2).write.parquet(str(src_dir))
    stream = spark.readStream.schema(latest.schema).parquet(str(src_dir))
    ingest.stream_upsert_to_iceberg(
        stream, t, str(tmp_path / "ckpt"), ["user_id"]
    )
    got = t.read(spark)
    want = latest
    assert got.count() == seed.count()  # one row per user, no dups
    assert got.filter("value = -1.0").count() == 0  # every seed row replaced
    j = got.alias("g").join(want.alias("w"), "user_id")
    bad = j.filter("g.value <> w.value").count()
    assert bad == 0
    # replaying the same batch id is a no-op (no new snapshot)
    n_snaps = len(t.snapshots())
    batch_df = latest.limit(5)
    assert ingest.commit_upsert_batch(t, batch_df, 0, ["user_id"]) is False
    assert len(t.snapshots()) == n_snaps


def test_stream_stream_left_outer_emits_nulls_on_watermark(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream join: matched rows emit immediately;
    NULL-padded rows for unmatched clicks emit only after the watermark
    passes the join window — verified by feeding the corpus in one batch
    and a far-future sentinel in a second batch, which pushes the final
    watermark past every click's horizon. The stream result must then
    equal the batch left join exactly."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", "value", "props"
    )
    src = tmp_path / "stream_src"
    src.mkdir()
    ev.coalesce(1).write.parquet(str(src / "batch1"))
    max_ts = ev.agg(F.max("ts")).first()[0]
    # the sentinel must survive BOTH event_type filters (one view + one
    # click row): a filtered-out event never reaches the watermark node,
    # so it would not advance either side's watermark
    sentinel = spark.createDataFrame(
        [(-1, -1, "view", max_ts, 0.0, "{}"), (-2, -1, "click", max_ts, 0.0, "{}")],
        "event_id bigint, user_id bigint, event_type string, ts timestamp, value double, props string",
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAYS"))
    sentinel.coalesce(1).write.parquet(str(src / "batch2"))
    # flatten into one dir with controlled modification times (the file
    # source batches by mtime order under maxFilesPerTrigger=1)
    flat = tmp_path / "flat"
    flat.mkdir()
    n = 0
    for sub in ("batch1", "batch2"):
        for f in sorted((src / sub).glob("*.parquet")):
            dest = flat / f"{sub}_{f.name}"
            dest.write_bytes(f.read_bytes())
            os.utime(dest, (1_700_000_000 + n, 1_700_000_000 + n))
            n += 1
    schema = spark.read.parquet(str(flat)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(flat))
    )
    out = windows.view_click_attribution_outer(stream)
    windows.run_append_to_memory(out, "t_attrib_outer")
    # the sentinel click itself stays in state forever (nothing advances
    # the watermark past it) — exclude it from both sides
    got = {
        tuple(r) for r in spark.table("t_attrib_outer").collect() if r.click_id >= 0
    }
    want = {
        tuple(r)
        for r in windows.view_click_attribution_outer(ev).collect()
    }
    assert got == want, (len(got), len(want))
    nulls = {r for r in got if r[2] is None}
    assert nulls, "left outer join must emit null-padded unmatched clicks"


def test_streaming_quality_gate_equals_batch(spark, sf_dir, tmp_path):
    """A trained quality gate applies to a STREAM as a stateless projection
    (classifier.score_expr is a pure expression — no shuffle, so append
    mode needs no watermark): the streamed survivors equal the batch
    filter exactly."""
    from pyspark.sql import functions as F

    from universql_spark.operators import classifier

    docs = load_table(spark, sf_dir, "documents")
    w, b, _ = classifier.train_quality_classifier(
        docs, F.col("text").contains("spark"), dim=64, epochs=2, lr=0.3
    )
    gate = classifier.score_expr(w, b) >= 0.5
    src = tmp_path / "docsrc"
    src.mkdir()
    docs.coalesce(2).write.parquet(str(src / "d"))
    schema = spark.read.parquet(str(src / "d")).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(src / "d"))
        .filter(gate)
        .select("doc_id")
    )
    windows.run_append_to_memory(stream, "t_quality_gate")
    got = {r.doc_id for r in spark.table("t_quality_gate").collect()}
    want = {r.doc_id for r in docs.filter(gate).select("doc_id").collect()}
    assert got == want and got


def test_stream_windowed_cms_equals_batch_and_bounds(spark, sf_dir):
    """Streaming per-window CMS cells == the batch recompute, and the
    sketch estimate (min over rows) is a one-sided bound on every user's
    exact per-window count."""
    from universql_spark.session import load_table

    stream = windows.windowed_cms_cells(windows.events_stream(spark, sf_dir))
    windows.run_to_memory(stream, "t_cms")
    got = {tuple(r) for r in spark.table("t_cms").collect()}

    ev = load_table(spark, sf_dir, "events")
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    F.pmod(F.xxhash64(F.lit(r), F.col("user_id")), F.lit(32)).alias("c"),
                )
                for r in range(4)
            ]
        )
    ).alias("rc")
    batch = (
        ev.select("ts", cells)
        .select("ts", "rc.r", "rc.c")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "r", "c")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "r", "c", "cnt",
        )
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 0

    # one-sided error: estimate >= exact for every (window, user)
    sketch = {(ws, r, c): cnt for ws, r, c, cnt in got}
    exact = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "user_id", "n",
        )
        .collect()
    )
    probes = exact[:200]
    from tests.compare import _signed64, _xx_int, _xx_long

    for row in probes:
        est = min(
            sketch.get(
                (row["win_start"], r, _signed64(_xx_long(row["user_id"], _xx_int(r, 42))) % 32),
                0,
            )
            for r in range(4)
        )
        assert est >= row["n"], (row["win_start"], row["user_id"])


def test_stream_static_enrichment_equals_batch(spark, sf_dir):
    """STREAM-STATIC join: per-micro-batch join against a bounded dimension
    (user LTV-quartile tier), then tumbling counts per (window, tier) —
    output must equal the same plan run in batch."""
    ev_batch = load_table(spark, sf_dir, "events")
    dim = windows.user_tier_dim(ev_batch)
    stream = windows.static_enriched_counts(windows.events_stream(spark, sf_dir), dim)
    windows.run_to_memory(stream, "t_enriched")
    got = {tuple(r) for r in spark.table("t_enriched").collect()}
    want = {
        tuple(r)
        for r in ev_batch.join(dim, "user_id")
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
        .collect()
    }
    assert got == want and len(want) > 0
    # every tier 1..4 is populated (the dim actually joined)
    tiers = {t for (_, t, _, _) in got}
    assert tiers == {1, 2, 3, 4}


def test_chained_stateful_join_then_window_equals_batch(spark, sf_dir):
    """MULTIPLE stateful operators in one streaming query (Spark 3.4+):
    stream-stream attribution join chained directly into a tumbling
    windowed aggregation — no intermediate sink. Output must equal the
    same plan in batch."""
    stream = windows.attribution_windowed_counts(windows.events_stream(spark, sf_dir))
    windows.run_append_to_memory(stream, "t_attrib_win")
    got = {tuple(r) for r in spark.table("t_attrib_win").collect()}
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    want = {
        tuple(r)
        for r in clicks.join(
            views,
            (F.col("c_user") == F.col("v_user"))
            & (F.col("v_ts") <= F.col("c_ts"))
            & (F.col("v_ts") >= F.col("c_ts") - F.expr("INTERVAL 10 minutes")),
        )
        .groupBy(F.window("c_ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n_attrib"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_attrib",
        )
        .collect()
    }
    assert got == want and len(want) > 0


def test_stream_dedup_composite_key_matches_spec_keys(spark, sf_dir):
    """r9: the stream_dedup_keys registry spec's key set == the streaming
    dropDuplicates output on the same composite key. The spec pins the
    deterministic batch representative (first by (ts, event_id)); the
    stream keeps its first ARRIVAL — so the pinned equivalence is the
    distinct key set and its cardinality, exactly one row per key on
    both sides."""
    from universql_spark.queries import ensure_views, load_all

    stream = windows.events_stream(spark, sf_dir).withWatermark(
        "ts", "1 hour"
    ).dropDuplicates(["user_id", "event_type"])
    windows.run_append_to_memory(stream, "t_dedup_ck")
    got = spark.table("t_dedup_ck")
    ensure_views(spark, sf_dir)
    spec_rows = load_all()["stream_dedup_keys"].spark(spark, sf_dir)
    skeys = {(r["user_id"], r["event_type"]) for r in spec_rows.collect()}
    gkeys = {(r["user_id"], r["event_type"]) for r in got.collect()}
    assert skeys == gkeys
    assert got.count() == len(skeys)
