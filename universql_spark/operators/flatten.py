"""Recursive VARIANT flatten — Snowflake `FLATTEN(RECURSIVE => TRUE)`.

The reference inherits Snowflake's FLATTEN table function, whose RECURSIVE
mode expands nested arrays/objects at every depth (one output row per
element per level, with KEY/PATH/INDEX/VALUE columns). Spark's explode only
goes one level, and no composition of built-ins walks arbitrary JSON depth
— this is exactly the "custom operator Spark lacks" case, implemented as a
Python UDTF (Spark's lateral-correlated table function): the engine
rewrites `, LATERAL FLATTEN(INPUT => e, RECURSIVE => TRUE) f` into
`, LATERAL flatten_recursive(e) f` (dialect.rewrite_flatten).

VALUE is emitted as COMPACT JSON text — the engine's VARIANT convention
(PARSE_JSON stores JSON strings; colon-path access reads them with
get_json_object), and byte-identical to DuckDB's json_extract rendering so
the spec `adv_flatten_recursive` can be value-hash-checked cross-engine.

Scale: the UDTF runs one Python worker per partition with Arrow transfer;
rows fan out inside the worker with no shuffle (the lateral join is
row-local). A 100 TB corpus flattens embarrassingly parallel — output
skew only where single documents are pathologically deep.
"""

from __future__ import annotations

import json
from typing import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_SCHEMA = "key string, path string, idx bigint, value string"


def _walk(v, path: str) -> Iterator[tuple]:
    """Depth-first (document order): each child element, then its subtree —
    Snowflake's RECURSIVE emission order. Yields (key, path, idx, value)."""
    if isinstance(v, dict):
        for k, x in v.items():
            p = f"{path}.{k}" if path else k
            yield (k, p, None, x)
            yield from _walk(x, p)
    elif isinstance(v, list):
        for i, x in enumerate(v):
            p = f"{path}[{i}]"
            yield (None, p, i, x)
            yield from _walk(x, p)


def _rows(doc) -> Iterator[tuple]:
    if doc is None:
        return
    if isinstance(doc, str):
        doc = json.loads(doc)  # VARIANT-as-JSON-text, the engine convention
    elif hasattr(doc, "asDict"):
        doc = doc.asDict(recursive=True)  # a Spark struct passed directly
    for key, p, idx, val in _walk(doc, ""):
        yield key, p, idx, json.dumps(val, separators=(",", ":"))


@udtf(returnType=_SCHEMA)
class FlattenRecursive:
    """INNER semantics: a NULL/empty document contributes no rows."""

    def eval(self, doc: str | None):  # noqa: D102
        yield from _rows(doc)


@udtf(returnType=_SCHEMA)
class FlattenRecursiveOuter:
    """OUTER => TRUE semantics: a document that produces nothing still
    contributes one all-NULL row (the input row survives the lateral)."""

    def eval(self, doc: str | None):  # noqa: D102
        n = 0
        for row in _rows(doc):
            n += 1
            yield row
        if n == 0:
            yield None, None, None, None


def register_udtfs(spark: SparkSession) -> None:
    """Idempotent session registration (re-registering replaces)."""
    spark.udtf.register("flatten_recursive", FlattenRecursive)
    spark.udtf.register("flatten_recursive_outer", FlattenRecursiveOuter)
