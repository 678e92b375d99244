"""Differential correctness: every registered query vs its DuckDB oracle at
sf0.001 (the driver repeats this at sf0.01). Oracle-less specs get the
rows-only check, same as the driver."""

from __future__ import annotations

import pytest

from tests.compare import assert_match, duck_connection
from universql_spark.queries import load_all

REGISTRY = load_all()
_con_cache: dict[str, object] = {}


def _con(sf_dir: str):
    if sf_dir not in _con_cache:
        _con_cache[sf_dir] = duck_connection(sf_dir)
    return _con_cache[sf_dir]


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    if spec.oracle is None:
        assert len(df.columns) > 0
        assert df.count() >= 0
    else:
        assert_match(name, df, _con(sf_dir), spec.oracle)


def test_python_oracles_match(spark, sf_dir):
    """dedup_semantic and ann_pq_topk vs their independent numpy oracles
    (tests/compare.py PY_ORACLES) — upgrades both from rows-only to oracled
    evidence in the local gate (VERDICT r3 'Next round' #7)."""
    from tests.compare import PY_ORACLES, normalize_rows, spark_result
    from universql_spark.queries import load_all

    reg = load_all()
    for name, fn in PY_ORACLES.items():
        s_cols, s_rows = spark_result(reg[name].spark(spark, sf_dir))
        o_cols, o_rows = fn(sf_dir)
        assert len(s_rows) == len(o_rows), name
        assert normalize_rows(s_cols, s_rows) == normalize_rows(o_cols, o_rows), name


def test_portable_xxh64_matches_spark(spark):
    """The pure-python XXH64 (tests/compare.py) must reproduce Spark's
    xxhash64() bit-for-bit across every encoding the oracles rely on:
    string bytes, int32 literals, chained int+long, and array<long>."""
    from tests.compare import (
        spark_xxhash64_int_int,
        spark_xxhash64_int_long,
        spark_xxhash64_longs,
        spark_xxhash64_str,
    )

    row = spark.sql(
        "SELECT xxhash64('tok') a, xxhash64('') b, xxhash64('αβγ') c, "
        "xxhash64(3, 7) d, xxhash64(5, CAST(-17 AS BIGINT)) e, "
        "xxhash64(array(CAST(1 AS BIGINT), CAST(-2 AS BIGINT), "
        "CAST(9007199254740993 AS BIGINT), CAST(0 AS BIGINT))) f"
    ).collect()[0]
    assert row.a == spark_xxhash64_str("tok")
    assert row.b == spark_xxhash64_str("")
    assert row.c == spark_xxhash64_str("αβγ")
    assert row.d == spark_xxhash64_int_int(3, 7)
    assert row.e == spark_xxhash64_int_long(5, -17)
    assert row.f == spark_xxhash64_longs([1, -2, 9007199254740993, 0])


def test_hits_view_equals_inline_cte(spark, sf_dir):
    """The pre-analyzed `hits` temp view (r10: register_testdata stores the
    analyzed derivation once so cb replans skip re-parse/re-analyze) is
    value- and schema-identical to inlining the same text as a CTE — the
    form the DuckDB oracles still use. Guards the one assumption the r10
    optimization leans on: view substitution == CTE inlining."""
    from universql_spark.queries import clickbench, ensure_views
    from universql_spark.session import HITS_SELECT

    ensure_views(spark, sf_dir)
    body = "SELECT k, r, s, b, COUNT(*) AS c, MIN(d) AS d0 FROM {src} GROUP BY k, r, s, b"
    via_view = spark.sql(body.format(src="hits"))
    via_cte = spark.sql(f"WITH {clickbench.HITS} {body.format(src='hits')}")
    assert via_view.schema == via_cte.schema
    assert sorted(map(tuple, via_view.collect())) == sorted(map(tuple, via_cte.collect()))
    # the registered view text IS the CTE body (one definition, two dialect forms)
    assert HITS_SELECT in clickbench.HITS
