"""Run the reference's benchmark corpus VERBATIM through the engine.

tests/clickbench_verbatim.sql is the public ClickBench query set exactly as
the reference ships/runs it (resources/dwh-benchmark/clickbench.sql:118-160,
one query per line, Snowflake dialect — including the `REGEXP_REPLACE(...,
'\\2')` backref, `GROUP BY 1` ordinals, and LIMIT/OFFSET). A user of the
reference must be able to paste their queries into this engine unchanged:
hits2 is synthesized as a view over the events fixture with the ClickBench
column names, and every query must execute through Engine.execute().

(Result VALUES are oracle-checked by the adapted cb_q00..q42 specs; this
test pins untouched-text executability.)
"""

from __future__ import annotations

import os

import pytest

from universql_spark.engine import Engine

SQL_PATH = os.path.join(os.path.dirname(__file__), "clickbench_verbatim.sql")

HITS2_VIEW = """CREATE OR REPLACE TEMP VIEW hits2 AS
SELECT
  event_id AS WatchID,
  user_id AS UserID,
  CAST(user_id % 10 AS INT) AS CounterID,
  CAST(get_json_object(props, '$.k') AS INT) AS ClientIP,
  CAST(user_id % 10 AS INT) AS RegionID,
  CAST(get_json_object(props, '$.k') AS INT) AS AdvEngineID,
  CAST(user_id % 5 AS INT) AS SearchEngineID,
  event_type AS SearchPhrase,
  CAST(user_id % 3 AS INT) AS MobilePhone,
  event_type AS MobilePhoneModel,
  props AS URL,
  props AS Title,
  props AS Referer,
  ts AS EventTime,
  CAST(ts AS DATE) AS EventDate,
  value AS ResolutionWidth,
  CAST(user_id % 2 AS INT) AS IsRefresh,
  event_id % 1000 AS URLHash,
  event_id % 1000 AS RefererHash,
  CAST(user_id % 7 - 1 AS INT) AS TraficSourceID,
  CAST(user_id % 2 AS INT) AS IsLink,
  CAST(user_id % 2 AS INT) AS IsDownload,
  CAST(user_id % 3 AS INT) AS DontCountHits,
  CAST(get_json_object(props, '$.k') AS INT) AS WindowClientWidth,
  CAST(user_id % 10 AS INT) AS WindowClientHeight
FROM events"""


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    eng = Engine(spark=spark, sf_dir=sf_dir)
    eng.execute(HITS2_VIEW)
    return eng


def _queries() -> list[str]:
    with open(SQL_PATH) as f:
        return [line.strip().rstrip(";") for line in f if line.strip().upper().startswith("SELECT")]


QUERIES = _queries()


def test_corpus_size():
    assert len(QUERIES) == 43


@pytest.mark.parametrize("idx", range(len(QUERIES)))
def test_verbatim_query_executes(engine, idx):
    out = engine.execute(QUERIES[idx])
    assert out.num_rows >= 0
