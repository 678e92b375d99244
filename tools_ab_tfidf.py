#!/usr/bin/env python
"""A/B: text_tfidf_topk single-tokenize variant (r11, VERDICT r10 item 3).

The HEAD plan tokenizes `documents` TWICE: the bucketed scan makes the tf
aggregation exchange-free, so nothing sits between tf and its two consumers
(the scored join's left side and the dfq document-frequency aggregation)
that Spark's ReuseExchange could deduplicate — the whole
scan->explode->aggregate subtree is physically duplicated (plans/r10/
text_tfidf_topk_final.txt nodes 1-5 vs 6-11).

Variant B appends DISTRIBUTE BY doc_id to the tf CTE: both inlined copies
now end in an identical Exchange(hashpartitioning(doc_id)), ReuseExchange
collapses them, and tokenization runs ONCE. The exchange carries only the
lightweight (doc_id, term, tf) proxy rows — guide section 8's "decide with
small rows" shape — and hash(doc_id) still satisfies the downstream window,
so no further exchange is added.

Interleaved replan runs (A,B,A,B,...) after a warm pass, best-of-N each,
plus a result-equality check (sorted rows compared exactly).

Usage: python tools_ab_tfidf.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universql_spark.queries import ensure_views, load_all
from universql_spark.session import DEFAULT_SF_DIR, get_spark

SQL_A = """
WITH tok AS (
  SELECT doc_id, explode(split(lower(trim(text)), ' +')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), dfq AS (
  SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY term
), nd AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT /*+ BROADCAST(nd) */ doc_id, tf.term,
         round(tf * (ln((n_docs + 1.0) / (dfreq + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN nd
)
SELECT doc_id, term, score FROM (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored)
WHERE rn <= 3"""

SQL_B = """
WITH tok AS (
  SELECT doc_id, explode(split(lower(trim(text)), ' +')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
  DISTRIBUTE BY doc_id
), dfq AS (
  SELECT term, COUNT(*) AS dfreq FROM tf GROUP BY term
), nd AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT /*+ BROADCAST(nd) */ doc_id, tf.term,
         round(tf * (ln((n_docs + 1.0) / (dfreq + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN nd
)
SELECT doc_id, term, score FROM (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored)
WHERE rn <= 3"""


#: C: like B, but dfq counts COUNT(tf) (same value — tf is never null) so
#: column pruning gives BOTH inlined tf copies the identical
#: (doc_id, term, tf) output through the exchange -> ReuseExchange can fire.
SQL_C = SQL_B.replace("COUNT(*) AS dfreq", "COUNT(tf) AS dfreq")

#: D: no dfq join at all — dfreq as a window count over term on tf.
SQL_D = """
WITH tok AS (
  SELECT doc_id, explode(split(lower(trim(text)), ' +')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), nd AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT /*+ BROADCAST(nd) */ doc_id, term,
         round(tf * (ln((n_docs + 1.0) / (COUNT(*) OVER (PARTITION BY term) + 1.0)) + 1.0), 6) AS score
  FROM tf CROSS JOIN nd
)
SELECT doc_id, term, score FROM (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored)
WHERE rn <= 3"""

#: E: explicit REPARTITION(16, doc_id) — 16 != the 8-bucket layout so the
#: exchange is NOT elided — plus WHERE tf > 0 in dfq (always true: tf is a
#: COUNT(*) >= 1) so column pruning keeps (doc_id, term, tf) flowing through
#: BOTH inlined copies of the exchange -> canonically equal -> ReuseExchange.
SQL_E = """
WITH tok AS (
  SELECT doc_id, explode(split(lower(trim(text)), ' +')) AS term FROM documents
), tf AS (
  SELECT /*+ REPARTITION(16, doc_id) */ doc_id, term, COUNT(*) AS tf
  FROM tok GROUP BY doc_id, term
), dfq AS (
  SELECT term, COUNT(*) AS dfreq FROM tf WHERE tf > 0 GROUP BY term
), nd AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT /*+ BROADCAST(nd) */ doc_id, tf.term,
         round(tf * (ln((n_docs + 1.0) / (dfreq + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN nd
)
SELECT doc_id, term, score FROM (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored)
WHERE rn <= 3"""

#: F: accept the second tokenize but make it cheaper — dfq explodes
#: array_distinct(tokens) per doc (distinct terms per doc == "docs containing
#: term" semantics), skipping the full-token (doc_id, term) dedup aggregate.
SQL_F = """
WITH tok AS (
  SELECT doc_id, explode(split(lower(trim(text)), ' +')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
), dfq AS (
  SELECT term, COUNT(*) AS dfreq FROM (
    SELECT explode(array_distinct(split(lower(trim(text)), ' +'))) AS term
    FROM documents) GROUP BY term
), nd AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT /*+ BROADCAST(nd) */ doc_id, tf.term,
         round(tf * (ln((n_docs + 1.0) / (dfreq + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN nd
)
SELECT doc_id, term, score FROM (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored)
WHERE rn <= 3"""

VARIANTS = [
    ("A HEAD 2x-tokenize ", SQL_A),
    ("B distribute-by    ", SQL_B),
    ("C count(tf)+distrib", SQL_C),
    ("D window dfreq     ", SQL_D),
    ("E repart16+reuse   ", SQL_E),
    ("F distinct dfq     ", SQL_F),
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    load_all()
    spark = get_spark("ab_tfidf", sf_dir=sf_dir)
    ensure_views(spark, sf_dir)
    spark.table("documents").count()

    # equality check first (sorted full results)
    ra = sorted(map(tuple, spark.sql(SQL_A).collect()))
    for tag, q in VARIANTS[1:]:
        rx = sorted(map(tuple, spark.sql(q).collect()))
        print(f"rows A={len(ra)} {tag.strip()}={len(rx)} equal={ra == rx}")
        assert ra == rx, f"variant {tag} changes results"

    # count tokenize passes in the physical plans
    for tag, q in VARIANTS:
        plan = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
        print(f"{tag}: Generate nodes={plan.count('Generate')} "
              f"ReusedExchange={'ReusedExchange' in plan} "
              f"Exchanges={plan.count('Exchange') - plan.count('ReusedExchange')}")

    # warm all
    for _ in range(2):
        for _tag, q in VARIANTS:
            spark.sql(q).toArrow()

    times: dict[str, list[float]] = {tag: [] for tag, _ in VARIANTS}
    for _ in range(runs):
        for tag, q in VARIANTS:
            t0 = time.perf_counter()
            spark.sql(q).toArrow()
            times[tag].append(time.perf_counter() - t0)
    fmt = lambda xs: " ".join(f"{x*1000:.0f}" for x in xs)  # noqa: E731
    for tag, _ in VARIANTS:
        ts = times[tag]
        print(f"{tag} ms: {fmt(ts)}  best={min(ts)*1000:.0f} median={sorted(ts)[len(ts)//2]*1000:.0f}")


if __name__ == "__main__":
    main()
