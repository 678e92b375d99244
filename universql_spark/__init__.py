"""universql_spark — a PySpark-native analytics engine with the query surface
of buremba/universql (reference read-only at /root/reference).

The reference is a Snowflake-protocol proxy that executes SQL on DuckDB over
Iceberg tables (see SURVEY.md). This package re-derives that *query surface*
as an idiomatic Spark engine:

- one engine (Spark SQL / DataFrame / Catalyst), no dual-engine routing
- declarative plans only — Catalyst handles pushdown/pruning/join selection
- Arrow at the edges (``Engine.execute() -> pyarrow.Table``)
- large-scale training-data operators (dedup / similarity / text analysis)
  built as shuffle-aware DataFrame pipelines, Pandas UDFs only where built-in
  functions can't express the semantics

Layout:
    session.py    tuned SparkSession + testdata view registration
    engine.py     Snowflake-ish SQL acceptance -> Spark SQL -> Arrow results
    dialect.py    lightweight Snowflake->Spark SQL text transforms
    queries/      operator inventory (SURVEY.md §2.7/§2.8) as (spark, oracle) pairs
    operators/    dedup, similarity search, text analysis, multimodal plumbing
    streaming/    Structured Streaming demos over the events fixture
"""

__version__ = "0.1.0"
