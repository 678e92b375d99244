"""Driver contract for the spark-graft builder (PySpark target).

entry()    — flagship query smoke check at sf0.001.
queries()  — every implemented operator from SURVEY.md §2 (+ the
             training-data extensions), as (spark, sf_dir) -> DataFrame.
oracle_sql() — matching DuckDB SQL per query (omitted for the ops whose
             values depend on Spark-internal hashing; those get the weaker
             rows-only check, flagged in their QuerySpec docstring).

Implementation lives in universql_spark/ (see SURVEY.md §7 build plan).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q3-style shipping-priority join-agg at sf0.001."""
    from universql_spark.queries import load_all

    registry = load_all()
    return registry["tpch_q3"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from universql_spark.queries import load_all

    return {name: spec.spark for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    from universql_spark.queries import load_all

    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
