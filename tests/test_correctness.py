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
