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
