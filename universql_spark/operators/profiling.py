"""Dataset profiling + constraint validation — the data-quality layer of a
training pipeline (column profiles feed curation decisions; constraint
checks gate ingestion).

Both operators are single-pass: every per-column statistic folds into ONE
aggregation over the table (no per-column scans), then pivots to rows.
At 100 TB that is one scan + one tiny shuffle regardless of column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: nulls, distincts, min/max (as strings — uniform
    schema across column types)."""
    columns = columns or df.columns
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.countDistinct(F.col(c)).alias(f"{c}__d"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    wide = df.agg(F.count(F.lit(1)).alias("__rows"), *aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__d, {c}__mn, {c}__mx" for c in columns
    )
    return wide.selectExpr(
        "__rows",
        f"stack({len(columns)}, {stack_args}) AS (column_name, n_nonnull, n_distinct, min_s, max_s)",
    ).select(
        "column_name",
        F.col("__rows").alias("n_rows"),
        "n_nonnull",
        "n_distinct",
        "min_s",
        "max_s",
    )


def check_constraints(spark, checks: list[tuple[str, str]]) -> DataFrame:
    """checks = [(name, SQL boolean-aggregate expression over registered
    views)]; -> (check_name, passed). Each expression must be a scalar SQL
    query returning one boolean — ref-integrity, uniqueness, ranges."""
    parts = [
        f"SELECT '{name}' AS check_name, ({sql}) AS passed" for name, sql in checks
    ]
    return spark.sql(" UNION ALL ".join(parts))
