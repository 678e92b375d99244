"""Streaming ingestion into Iceberg tables: foreachBatch micro-batch
commits.

The production pattern for continuous table ingestion (Kafka/file landing
dir -> Iceberg): each micro-batch appends immutable data files and commits
ONE new snapshot, so readers always see a consistent point-in-time view
mid-ingest and the snapshot log doubles as the ingestion ledger. The
reference's tables are Iceberg-backed the same way (warehouse/duckdb.py
CTAS->Iceberg); streaming writes are the missing half it delegates to
warehouses, re-derived here on Structured Streaming.

Delivery semantics: the checkpoint gives at-least-once across restarts (a
crash between the append-commit and the checkpoint write can replay one
batch). Iceberg's own engines close that gap by recording the batch id in
the snapshot summary and skipping already-committed ids — layered here the
same way via `operation=append` snapshots tagged per batch in
`last_batch_id`, checked before each commit.

Scale note: one snapshot per micro-batch means manifests grow with batch
count — that is what `IcebergTable.compact()` + `expire_snapshots()` are
for (run them on a maintenance schedule, exactly like iceberg-spark's
rewrite_data_files / expire_snapshots procedures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from universql_spark.iceberg_format import IcebergTable


def commit_batch(table: IcebergTable, batch_df: DataFrame, batch_id: int) -> bool:
    """Append one micro-batch as one snapshot, unless `batch_id` was
    already committed (replay after restart) -> whether a commit happened."""
    last = _last_batch_id(table)
    if last is not None and batch_id <= last:
        return False
    if batch_df.isEmpty():
        return False
    table.append(batch_df)
    _record_batch_id(table, batch_id)
    return True


def stream_to_iceberg(
    stream_df: DataFrame, table: IcebergTable, checkpoint: str
) -> None:
    """Drain a (bounded) stream into `table`, one snapshot per micro-batch,
    skipping batch ids already committed (restart idempotence)."""
    q = (
        stream_df.writeStream.foreachBatch(
            lambda batch_df, batch_id: commit_batch(table, batch_df, batch_id)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _last_batch_id(table: IcebergTable) -> int | None:
    _v, meta = table._read_metadata()
    b = meta.get("properties", {}).get("universql-spark.last-batch-id")
    return int(b) if b is not None else None


def _record_batch_id(table: IcebergTable, batch_id: int) -> None:
    """Stamp the committed batch id into table properties of the CURRENT
    metadata version (the append above already wrote a new version; this
    rides on it rather than committing another)."""
    import json

    v, meta = table._read_metadata()
    meta.setdefault("properties", {})["universql-spark.last-batch-id"] = str(batch_id)
    with open(table._version_path(v), "w") as f:
        json.dump(meta, f, indent=1)
    table._version_cache.pop(v, None)


def commit_upsert_batch(
    table: IcebergTable, batch_df: DataFrame, batch_id: int, key_cols: list[str]
) -> bool:
    """CDC micro-batch: one `upsert` snapshot (equality delete on the
    batch's keys + append of the batch rows, iceberg_format.upsert) per
    batch id, replay-protected like commit_batch. This is the Flink/Kafka
    changelog-sink commit shape: latest-write-wins per key at ingest rate,
    no scan, no file rewritten."""
    last = _last_batch_id(table)
    if last is not None and batch_id <= last:
        return False
    if batch_df.isEmpty():
        return False
    table.upsert(batch_df.sparkSession, batch_df, key_cols)
    _record_batch_id(table, batch_id)
    return True


def stream_upsert_to_iceberg(
    stream_df: DataFrame, table: IcebergTable, checkpoint: str, key_cols: list[str]
) -> None:
    """Drain a (bounded) changelog stream as per-batch upserts: the table
    converges to latest-row-per-key regardless of restarts/replays."""
    q = (
        stream_df.writeStream.foreachBatch(
            lambda batch_df, batch_id: commit_upsert_batch(
                table, batch_df, batch_id, key_cols
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
