"""DELETE / UPDATE / MERGE on parquet-backed managed tables.

The reference's README support matrix declares MERGE/DELETE (SURVEY.md §2.2;
its own tests for them are all @skip — transform.py:6-25). With an Iceberg
catalog these are native Spark SQL (`MERGE INTO` / `DELETE FROM` on v2
tables); this container has no Iceberg runtime jar, so managed parquet
tables get the copy-on-write equivalent — at the same granularity Iceberg's
copy-on-write operates at: the files that actually hold affected rows.

Two paths, chosen by the table's layout:

**Partitioned tables (CTAS ... PARTITION BY/CLUSTER BY)** — partition-
granular copy-on-write, the Iceberg/Hive-native mechanism
(`/root/reference/universql/warehouse/duckdb.py:274-334` CTAS->Iceberg is
the reference's analogue):
    1. compute the AFFECTED partition set (distinct partition values of
       matched rows — a narrow aggregate, metadata-scale)
    2. rebuild only those partitions' rows (semi-join against the affected
       set, so the scan prunes to those partitions)
    3. stage via localCheckpoint (breaks lineage -> no read-overwrite
       conflict; only affected-partition data is materialized)
    4. dynamic partition overwrite (`partitionOverwriteMode=dynamic`)
       replaces exactly the partitions present in the staged frame;
       partitions whose rows all vanished are dropped by ALTER TABLE
       (a metadata op on a driver-collected, manifest-sized value list)
    5. MERGE inserts never rewrite anything — they APPEND new files into
       their partitions.
A 1-row MERGE/DELETE/UPDATE therefore rewrites one partition, not the
table (tests/test_engine.py::test_partitioned_merge_rewrites_one_partition
pins this by file mtimes). UPDATE/MERGE falls back to the full path if an
assignment writes a partition column (the row would migrate partitions).

**Unpartitioned tables** — whole-table shadow-swap:
    read table -> compute surviving/updated rows -> write to a shadow table
    -> atomic-ish swap (DROP + RENAME)
the same cost profile as copy-on-write on an unpartitioned Iceberg table.

Supported grammar (documented subset, QueryError beyond it):
  DELETE FROM t WHERE <cond>
  UPDATE t SET c1 = e1[, c2 = e2 ...] [WHERE <cond>]
  MERGE INTO t [AS] ta USING { s | (<subquery>) } [AS] sa ON <cond>
    { WHEN MATCHED [AND <cond>] THEN { UPDATE SET c = e, ... | DELETE } }*
    { WHEN NOT MATCHED [AND <cond>] THEN INSERT (cols) VALUES (exprs) | INSERT * }*
with SQL-standard first-true-clause-wins dispatch across multiple WHEN
clauses of either kind.
"""

from __future__ import annotations

import re

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from universql_spark.dialect import _match_paren, _split_top_args
from universql_spark.names import bare_name, resolve_name


class NondeterministicMergeError(ValueError):
    """Snowflake's ERROR_ON_NONDETERMINISTIC_MERGE=TRUE behavior."""

_DELETE_RE = re.compile(r"^\s*DELETE\s+FROM\s+([\w.\"]+)(?:\s+WHERE\s+(.*))?$", re.I | re.S)
_UPDATE_RE = re.compile(r"^\s*UPDATE\s+([\w.\"]+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?$", re.I | re.S)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+([\w.\"]+)(?:\s+AS)?(?:\s+(\w+))?\s+USING\s+([\w.\"]+)(?:\s+AS)?(?:\s+(\w+))?"
    r"\s+ON\s+(.*?)(\s+WHEN\s+.*)$",
    re.I | re.S,
)
#: one WHEN clause: [NOT] MATCHED [AND <cond>] THEN <action>, scanned in
#: statement order — first-true-clause-wins semantics (SQL standard / the
#: reference's Snowflake dialect)
_WHEN_CLAUSE_RE = re.compile(
    r"WHEN\s+(NOT\s+)?MATCHED\s*(?:\s+AND\s+(.*?))?\s*THEN\s+"
    r"(UPDATE\s+SET\s+.*?|DELETE|INSERT\s*(?:\([^)]*\)\s*VALUES\s*\([^)]*\)|\*))"
    r"(?=\s+WHEN\s+|\s*$)",
    re.I | re.S,
)
_INSERT_ACTION_RE = re.compile(r"INSERT\s*(?:\(([^)]*)\)\s*VALUES\s*\(([^)]*)\)|\*)", re.I | re.S)
_USING_PAREN_RE = re.compile(r"\bUSING\s*\(", re.I)


def _lift_subquery_source(spark: SparkSession, stmt: str) -> str:
    """`MERGE INTO t USING (SELECT ...) s ON ...` -> materialize the
    inline source as a temp view so the named-source grammar applies. The
    subquery arrives already dialect-transpiled (the engine rewrites the
    whole statement before dispatch), so spark.sql can plan it directly."""
    m = _USING_PAREN_RE.search(stmt)
    if not m:
        return stmt
    open_idx = m.end() - 1
    close = _match_paren(stmt, open_idx)
    inner = stmt[open_idx + 1 : close].strip()
    view = f"__merge_src_{abs(hash(inner)) % 10**8}"
    spark.sql(inner).createOrReplaceTempView(view)
    return f"{stmt[:m.start()]}USING {view} {stmt[close + 1:]}"


def _split_assignments(s: str) -> list[tuple[str, str]]:
    """'a = x, b = f(y, z)' -> [(a, x), (b, f(y, z))] — comma split at depth 0."""
    parts, depth, buf = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    out = []
    for p in parts:
        col, expr = p.split("=", 1)
        out.append((col.strip().strip('"'), expr.strip()))
    return out


def _replace_table(spark: SparkSession, table: str, new_df: DataFrame) -> None:
    """Shadow-write + swap: never reads and overwrites the same files."""
    from . import warehouse_guard  # noqa: PLC0415

    warehouse_guard.register_process(spark)
    shadow = f"{table}__dml_shadow"
    try:
        new_df.write.mode("overwrite").saveAsTable(shadow)
    except Exception as e:
        # crash recovery: a process killed mid-swap leaves the shadow's
        # LOCATION on disk with no catalog entry — Spark then refuses the
        # managed write with LOCATION_ALREADY_EXISTS. Reclaim ONLY the
        # error-reported location (correct for qualified db.tbl names,
        # whose dir is not {warehouse}/{name}) — never the blind
        # {warehouse}/{shadow} pre-rmtree ADVICE r7 flagged, which could
        # hit a concurrent process's unrelated live table.
        lm = re.search(r"location 'file:([^']+)'", str(e))
        if (
            "LOCATION_ALREADY_EXISTS" not in str(e)
            or not lm
            # owned=True: the shadow name derives from a table THIS
            # process's catalog owns, and the swap holds replace semantics
            # over it — an on-disk leftover at that exact location is a
            # crash orphan (or another process's IN-FLIGHT shadow of the
            # same-named table, i.e. an already-unsafe concurrent DML on
            # one table; reclaiming fails its statement, never its data)
            or not warehouse_guard.reclaim_orphan(spark, lm.group(1), owned=True)
        ):
            raise
        new_df.write.mode("overwrite").saveAsTable(shadow)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {shadow} RENAME TO {table}")


def _partition_cols(spark: SparkSession, table: str) -> list[str]:
    try:
        return [c.name for c in spark.catalog.listColumns(table) if c.isPartition]
    except Exception:
        return []


class _dynamic_overwrite:
    """Scoped `partitionOverwriteMode=dynamic`: INSERT OVERWRITE replaces
    only the partitions present in the written frame."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", self.prev)


def _overwrite_partitions(
    spark: SparkSession,
    table: str,
    pcols: list[str],
    affected: DataFrame,
    new_rows: DataFrame,
) -> None:
    """Partition-granular copy-on-write: replace the `affected` partitions of
    `table` with `new_rows` (which must contain rows ONLY from those
    partitions). Partitions in `affected` that have no rows in `new_rows`
    (fully deleted) are dropped via metadata ops."""
    tcols = spark.table(table).columns
    # localCheckpoint materializes the staged rows (executor memory/disk) and
    # cuts lineage to the table's files — otherwise Spark refuses to
    # overwrite a path it is reading. Only affected partitions are staged.
    staged = new_rows.select(*tcols).localCheckpoint(eager=True)
    with _dynamic_overwrite(spark):
        staged.write.insertInto(table, overwrite=True)
    # affected partitions that kept zero rows were not overwritten by the
    # dynamic write — drop them explicitly (metadata-only, manifest-sized)
    dead = affected.exceptAll(staged.select(*pcols).distinct()).collect()
    for row in dead:
        spec = ", ".join(f"{c} = '{row[c]}'" for c in pcols)
        spark.sql(f"ALTER TABLE {table} DROP IF EXISTS PARTITION ({spec})")


def execute_delete(spark: SparkSession, stmt: str, resolve=resolve_name) -> pa.Table:
    m = _DELETE_RE.match(stmt)
    table = resolve(m.group(1))
    cond = m.group(2)
    df = spark.table(table)
    pcols = _partition_cols(spark, table) if cond else []
    if pcols:
        match = F.expr(cond)
        n_del = df.filter(match).count()
        if n_del:
            affected = df.filter(match).select(*pcols).distinct()
            sub = df.join(F.broadcast(affected), pcols, "left_semi")
            _overwrite_partitions(spark, table, pcols, affected, sub.filter(~match))
        return pa.table({"rows_deleted": [n_del]})
    before = df.count()
    kept = df.filter(~F.expr(cond)) if cond else df.limit(0)
    _replace_table(spark, table, kept)
    after = spark.table(table).count()
    return pa.table({"rows_deleted": [before - after]})


def _apply_assignments(df: DataFrame, assign_map: dict[str, str], match) -> DataFrame:
    """All assignment expressions evaluate against the ORIGINAL row in one
    select — SQL UPDATE is simultaneous (SET a = b, b = a swaps)."""
    return df.select(
        *[
            F.when(match, F.expr(assign_map[c])).otherwise(F.col(c)).alias(c) if c in assign_map else F.col(c)
            for c in df.columns
        ]
    )


def execute_update(spark: SparkSession, stmt: str, resolve=resolve_name) -> pa.Table:
    m = _UPDATE_RE.match(stmt)
    table = resolve(m.group(1))
    assignments, cond = _split_assignments(m.group(2)), m.group(3)
    df = spark.table(table)
    match = F.expr(cond) if cond else F.lit(True)
    n = df.filter(match).count()
    assign_map = dict(assignments)
    pcols = _partition_cols(spark, table)
    # partition-granular path: rewrite only partitions holding matched rows.
    # Requires a WHERE (else every partition is affected anyway) and that no
    # assignment writes a partition column (the row would change partitions).
    if pcols and cond and not (set(assign_map) & set(pcols)):
        if n:
            affected = df.filter(match).select(*pcols).distinct()
            sub = df.join(F.broadcast(affected), pcols, "left_semi")
            _overwrite_partitions(spark, table, pcols, affected, _apply_assignments(sub, assign_map, match))
        return pa.table({"rows_updated": [n]})
    _replace_table(spark, table, _apply_assignments(df, assign_map, match))
    return pa.table({"rows_updated": [n]})


def _parse_when_clauses(clauses: str) -> tuple[list, list]:
    """Ordered clause lists: matched -> (cond|None, assigns|None-for-DELETE),
    not-matched -> (cond|None, col->expr map | None for INSERT *)."""
    matched_clauses: list[tuple[str | None, dict[str, str] | None]] = []
    insert_clauses: list[tuple[str | None, dict[str, str] | None]] = []
    for cm in _WHEN_CLAUSE_RE.finditer(clauses):
        is_not, extra_cond, action = bool(cm.group(1)), cm.group(2), cm.group(3).strip()
        if is_not:
            im = _INSERT_ACTION_RE.match(action)
            if not im:
                raise ValueError(f"unsupported MERGE insert action: {action[:80]}")
            val_map = None
            if im.group(1):
                cols = [c.strip().strip('"') for c in im.group(1).split(",")]
                vals = [v.strip() for v in _split_top_args(im.group(2))]
                val_map = dict(zip(cols, vals))
            insert_clauses.append((extra_cond, val_map))
        elif action.upper() == "DELETE":
            matched_clauses.append((extra_cond, None))
        else:
            matched_clauses.append((extra_cond, dict(_split_assignments(action[action.upper().index("SET") + 3 :]))))
    return matched_clauses, insert_clauses


def _check_deterministic(target: DataFrame, source: DataFrame, cond) -> None:
    """Snowflake default ERROR_ON_NONDETERMINISTIC_MERGE=TRUE: a target row
    matched by >1 source row is an error, not a silent duplicate (the inner
    join would otherwise emit it once per source row)."""
    rid = target.withColumn("__t_rid", F.monotonically_increasing_id())
    dup = (
        rid.join(source, cond, "inner")
        .groupBy("__t_rid")
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise NondeterministicMergeError(
            "MERGE: a target row matches more than one source row "
            "(ERROR_ON_NONDETERMINISTIC_MERGE)"
        )


def _matched_result_df(
    tgt: DataFrame, source: DataFrame, cond, t_alias: str, tcols: list[str], matched_clauses: list
) -> DataFrame:
    """Matched rows after clause application: first-true clause wins —
    UPDATE rewrites the row, DELETE drops it, no-true-clause keeps it."""
    joined = tgt.join(source, cond, "inner")
    conds = [F.expr(c) if c else F.lit(True) for c, _a in matched_clauses]
    keep = F.lit(True)
    for c, (_cond, a) in zip(conds, matched_clauses):
        if a is None:  # DELETE clause: drop when it is the first true one
            prior = F.lit(False)
            for c2, (_c2, _a2) in zip(conds, matched_clauses):
                if c2 is c:
                    break
                prior = prior | F.coalesce(c2, F.lit(False))
            keep = keep & ~(F.coalesce(c, F.lit(False)) & ~prior)
    out_cols = []
    for col in tcols:
        expr = F.col(f"{t_alias}.{col}")
        # build CASE from last clause backwards so first-true wins
        for c, (_cond, a) in reversed(list(zip(conds, matched_clauses))):
            if a and col in a:
                expr = F.when(F.coalesce(c, F.lit(False)), F.expr(a[col])).otherwise(expr)
            elif a is None:
                pass  # deletes handled by `keep`
        out_cols.append(expr.alias(col))
    return joined.filter(keep).select(*out_cols)


def _inserts_df(
    target: DataFrame, source: DataFrame, cond, tcols: list[str], insert_clauses: list
) -> DataFrame:
    """Unmatched source rows routed to the first not-matched clause whose
    AND-condition holds."""
    unmatched_src = source.join(target, cond, "left_anti")
    pieces = []
    prior = F.lit(False)
    for extra_cond, val_map in insert_clauses:
        c = F.expr(extra_cond) if extra_cond else F.lit(True)
        sel = unmatched_src.filter(~prior & F.coalesce(c, F.lit(False)))
        if val_map is not None:
            sel = sel.select(
                *[
                    F.expr(val_map[col]).alias(col) if col in val_map else F.lit(None).alias(col)
                    for col in tcols
                ]
            )
        else:
            sel = sel.select(*tcols)  # INSERT *
        pieces.append(sel)
        prior = prior | F.coalesce(c, F.lit(False))
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


def execute_merge(spark: SparkSession, stmt: str, resolve=resolve_name) -> pa.Table:
    stmt = _lift_subquery_source(spark, stmt)
    m = _MERGE_RE.match(stmt)
    if not m:
        raise ValueError(f"unsupported MERGE syntax: {stmt[:120]}")
    t_name = resolve(m.group(1))
    t_alias = m.group(2) or bare_name(t_name)
    s_name = resolve(m.group(3))
    s_alias = m.group(4) or bare_name(s_name)
    on_cond, clauses = m.group(5), m.group(6)

    target = spark.table(t_name).alias(t_alias)
    source = spark.table(s_name).alias(s_alias)
    cond = F.expr(on_cond)
    tcols = spark.table(t_name).columns

    matched_clauses, insert_clauses = _parse_when_clauses(clauses)
    all_assigned = set().union(*[set(a) for _c, a in matched_clauses if a], set())

    if matched_clauses:
        _check_deterministic(target, source, cond)

    def _matched_result(tgt: DataFrame) -> DataFrame:
        return _matched_result_df(tgt, source, cond, t_alias, tcols, matched_clauses)

    def _inserts() -> DataFrame:
        return _inserts_df(target, source, cond, tcols, insert_clauses)

    pcols = _partition_cols(spark, t_name)
    if pcols and not (all_assigned & set(pcols)):
        # partition-granular: rewrite only partitions holding MATCHED rows;
        # inserts append new files without touching any existing partition
        if matched_clauses:
            affected = (
                target.join(source, cond, "left_semi").select(*pcols).distinct()
            )
            sub = target.join(F.broadcast(affected), pcols, "left_semi").alias(t_alias)
            untouched = sub.join(source, cond, "left_anti").select(*tcols)
            new_rows = untouched.unionByName(_matched_result(sub))
            if affected.limit(1).count():
                _overwrite_partitions(spark, t_name, pcols, affected, new_rows)
        n_inserted = 0
        if insert_clauses:
            ins = _inserts().localCheckpoint(eager=True)
            n_inserted = ins.count()
            if n_inserted:
                ins.select(*tcols).write.insertInto(t_name, overwrite=False)
        return pa.table(
            {"rows_affected": [spark.table(t_name).count()], "rows_inserted": [n_inserted]}
        )

    if matched_clauses:
        matched = _matched_result(target)
    else:
        matched = target.join(source, cond, "left_semi").select(*tcols)

    untouched = target.join(source, cond, "left_anti").select(*tcols)

    pieces = [untouched, matched]
    n_inserted = 0
    if insert_clauses:
        inserts = _inserts()
        n_inserted = inserts.count()
        pieces.append(inserts)

    new_df = pieces[0]
    for p in pieces[1:]:
        new_df = new_df.unionByName(p)
    _replace_table(spark, t_name, new_df)
    return pa.table({"rows_affected": [spark.table(t_name).count()], "rows_inserted": [n_inserted]})


# ---------------------------------------------------------------------------
# snapshot-table (tableformat.py) DML: file-granular copy-on-write
# ---------------------------------------------------------------------------


def execute_delete_snap(spark: SparkSession, stmt: str, snap) -> pa.Table:
    m = _DELETE_RE.match(stmt)
    cond = m.group(2)
    match = F.expr(cond) if cond else F.lit(True)
    # cond_str lets IcebergTable prune candidate files from manifest bounds
    n, n_files = snap.delete_where(spark, match, cond_str=cond)
    return pa.table({"rows_deleted": [n], "files_rewritten": [n_files]})


def execute_update_snap(spark: SparkSession, stmt: str, snap) -> pa.Table:
    m = _UPDATE_RE.match(stmt)
    assign_map = dict(_split_assignments(m.group(2)))
    cond = m.group(3)
    match = F.expr(cond) if cond else F.lit(True)
    n, n_files = snap.update_where(spark, match, assign_map, cond_str=cond)
    return pa.table({"rows_updated": [n], "files_rewritten": [n_files]})


def execute_merge_snap(spark: SparkSession, stmt: str, snap, read_table) -> pa.Table:
    """MERGE into a snapshot table: only data files holding matched target
    rows are rewritten (input_file_name targeting); inserts append files."""
    stmt = _lift_subquery_source(spark, stmt)
    m = _MERGE_RE.match(stmt)
    if not m:
        raise ValueError(f"unsupported MERGE syntax: {stmt[:120]}")
    t_alias = m.group(2) or bare_name(m.group(1))
    s_alias = m.group(4) or bare_name(m.group(3))
    on_cond, clauses = m.group(5), m.group(6)

    source = read_table(m.group(3)).alias(s_alias)
    cond = F.expr(on_cond)
    target = snap.read(spark).alias(t_alias)
    tcols = target.columns

    matched_clauses, insert_clauses = _parse_when_clauses(clauses)
    if matched_clauses:
        _check_deterministic(target, source, cond)

    inserts = None
    if insert_clauses:
        inserts = _inserts_df(target, source, cond, tcols, insert_clauses)

    if matched_clauses:
        n_ins, n_files = snap.merge_apply(
            spark,
            source,
            cond,
            t_alias,
            lambda sub: _matched_result_df(sub, source, cond, t_alias, tcols, matched_clauses),
            inserts,
        )
    else:
        n_ins = inserts.count() if inserts is not None else 0
        n_files = 0
        if n_ins:
            snap.append(inserts)
    return pa.table(
        {
            "rows_affected": [snap.read(spark).count()],
            "rows_inserted": [n_ins],
            "files_rewritten": [n_files],
        }
    )
