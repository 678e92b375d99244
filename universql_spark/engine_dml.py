"""DELETE / UPDATE / MERGE on parquet-backed managed tables.

The reference's README support matrix declares MERGE/DELETE (SURVEY.md §2.2;
its own tests for them are all @skip — transform.py:6-25). With an Iceberg
catalog these are native Spark SQL (`MERGE INTO` / `DELETE FROM` on v2
tables); this container has no Iceberg runtime jar, so managed parquet
tables get the copy-on-write equivalent, which is exactly what
Iceberg/Delta do under the hood anyway:

    read table -> compute surviving/updated rows -> write to a shadow table
    -> atomic-ish swap (DROP + RENAME)

The shadow-table swap avoids Spark's you-cannot-overwrite-what-you-read
error without ever collecting data to the driver. At scale these rewrites
are full-table-scan + full-table-write — the same cost profile as
copy-on-write Iceberg without file pruning; fine for the declared surface.

Supported grammar (documented subset, QueryError beyond it):
  DELETE FROM t WHERE <cond>
  UPDATE t SET c1 = e1[, c2 = e2 ...] [WHERE <cond>]
  MERGE INTO t [AS] ta USING s [AS] sa ON <cond>
    [WHEN MATCHED THEN UPDATE SET c = e, ...]
    [WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs) | INSERT *]
"""

from __future__ import annotations

import re

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
_WHEN_MATCHED_RE = re.compile(r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.*?)(?=\s+WHEN\s+|$)", re.I | re.S)
_WHEN_MATCHED_DEL_RE = re.compile(r"WHEN\s+MATCHED\s+THEN\s+DELETE", re.I)
_WHEN_NOT_MATCHED_RE = re.compile(
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*(?:\(([^)]*)\)\s*VALUES\s*\(([^)]*)\)|\*)", re.I | re.S
)


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
    shadow = f"{table}__dml_shadow"
    new_df.write.mode("overwrite").saveAsTable(shadow)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {shadow} RENAME TO {table}")


def execute_delete(spark: SparkSession, stmt: str, resolve=resolve_name) -> pa.Table:
    m = _DELETE_RE.match(stmt)
    table = resolve(m.group(1))
    cond = m.group(2)
    df = spark.table(table)
    before = df.count()
    kept = df.filter(~F.expr(cond)) if cond else df.limit(0)
    _replace_table(spark, table, kept)
    after = spark.table(table).count()
    return pa.table({"rows_deleted": [before - after]})


def execute_update(spark: SparkSession, stmt: str, resolve=resolve_name) -> pa.Table:
    m = _UPDATE_RE.match(stmt)
    table = resolve(m.group(1))
    assignments, cond = _split_assignments(m.group(2)), m.group(3)
    df = spark.table(table)
    match = F.expr(cond) if cond else F.lit(True)
    n = df.filter(match).count()
    # all assignment expressions evaluate against the ORIGINAL row in one
    # select — SQL UPDATE is simultaneous (SET a = b, b = a swaps)
    assign_map = dict(assignments)
    out = df.select(
        *[
            F.when(match, F.expr(assign_map[c])).otherwise(F.col(c)).alias(c) if c in assign_map else F.col(c)
            for c in df.columns
        ]
    )
    _replace_table(spark, table, out)
    return pa.table({"rows_updated": [n]})


def execute_merge(spark: SparkSession, stmt: str, resolve=resolve_name) -> pa.Table:
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

    mu = _WHEN_MATCHED_RE.search(clauses)
    md = _WHEN_MATCHED_DEL_RE.search(clauses) if not mu else None
    nm = _WHEN_NOT_MATCHED_RE.search(clauses)

    # matched target rows, with updates applied (or dropped for DELETE)
    if mu:
        # Snowflake default ERROR_ON_NONDETERMINISTIC_MERGE=TRUE: a target
        # row matched by >1 source row is an error, not a silent duplicate
        # (the inner join below would otherwise emit it once per source row)
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
        joined = target.join(source, cond, "inner")
        assigns = dict(_split_assignments(mu.group(1)))
        matched = joined.select(
            *[
                F.expr(assigns[c]).alias(c) if c in assigns else F.col(f"{t_alias}.{c}").alias(c)
                for c in tcols
            ]
        )
    elif md:
        matched = None  # matched rows are deleted
    else:
        matched = target.join(source, cond, "left_semi").select(*tcols)

    untouched = target.join(source, cond, "left_anti").select(*tcols)

    pieces = [untouched] + ([matched] if matched is not None else [])
    n_inserted = 0
    if nm:
        unmatched_src = source.join(target, cond, "left_anti")
        if nm.group(1):
            cols = [c.strip().strip('"') for c in nm.group(1).split(",")]
            vals = [v.strip() for v in nm.group(2).split(",")]
            val_map = dict(zip(cols, vals))
            inserts = unmatched_src.select(
                *[
                    F.expr(val_map[c]).alias(c) if c in val_map else F.lit(None).alias(c)
                    for c in tcols
                ]
            )
        else:  # INSERT *
            inserts = unmatched_src.select(*tcols)
        n_inserted = inserts.count()
        pieces.append(inserts)

    new_df = pieces[0]
    for p in pieces[1:]:
        new_df = new_df.unionByName(p)
    _replace_table(spark, t_name, new_df)
    return pa.table({"rows_affected": [spark.table(t_name).count()], "rows_inserted": [n_inserted]})
