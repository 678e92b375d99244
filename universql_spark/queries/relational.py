"""Relational surface beyond ClickBench: windows, set ops, grouping sets,
semi/anti joins, subqueries, JSON/VARIANT functions, the cast/type gallery.

SURVEY.md §2.8 lists what the reference's tests/README declare (UNION ALL,
CTE joins, PARSE_JSON/OBJECT_CONSTRUCT/ARRAY_CONSTRUCT, the ALL_COLUMNS cast
matrix from tests/integration/utils.py:35-84); §2.8's closing note covers the
operators DuckDB gives the reference implicitly (windows, grouping sets,
semi/anti). All are first-class in Spark SQL — these specs pin their
semantics against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from universql_spark.queries import register, register_sql
from universql_spark.queries.clickbench import davg, dsum

# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

register_sql(
    "win_rank_topn_per_group",
    """SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
  FROM orders) t WHERE rn <= 3 ORDER BY c_custkey, rn""",
    category="window",
    doc="top-N per group via ROW_NUMBER — one shuffle on the partition key",
)

register_sql(
    "win_rank_dense",
    """SELECT o_orderpriority, o_orderkey,
       CAST(RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk,
       CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderstatus) AS BIGINT) AS drk
FROM orders ORDER BY o_orderpriority, rk LIMIT 50""",
    category="window",
    doc="RANK + DENSE_RANK in one window pass",
)

register_sql(
    "win_running_sum",
    """SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE) AS running
FROM events ORDER BY user_id, event_id""",
    category="window",
    doc="running sum per user (decimal-exact so engines agree bit-for-bit)",
)

register_sql(
    "win_lag_lead",
    """SELECT event_id, user_id,
       LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id,
       LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_id
FROM events ORDER BY user_id, event_id LIMIT 200""",
    category="window",
    doc="LAG/LEAD navigation",
)

register_sql(
    "win_moving_avg",
    """SELECT event_id, user_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(28,6)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE)
       / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mavg
FROM events ORDER BY user_id, event_id LIMIT 200""",
    category="window",
    doc="sliding-frame moving average (ROWS BETWEEN)",
)

register_sql(
    "win_ntile_cume",
    """SELECT o_orderkey, CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile,
       CAST(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS DOUBLE) AS pr
FROM orders ORDER BY o_orderkey LIMIT 200""",
    category="window",
    doc="NTILE + PERCENT_RANK global window",
)

# Sessionization in batch SQL: gap > 1800s starts a new session. The epoch
# extraction differs by dialect (unix_micros vs epoch_us), hence two texts.
_SESS = """WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN {epoch}(ts) - {epoch}(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 1800000000 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
s AS (
  SELECT user_id, event_id,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
  FROM g)
SELECT user_id, sess_id, COUNT(*) AS n_events FROM s
GROUP BY user_id, sess_id ORDER BY user_id, sess_id"""

register_sql(
    "win_sessionize",
    _SESS.format(epoch="unix_micros"),
    oracle=_SESS.format(epoch="epoch_us"),
    category="window",
    doc="batch sessionization: LAG gap -> cumulative session ids (30 min gap)",
)

_FUZZY_JOIN = """WITH probes AS (
  SELECT c_custkey AS p_id,
         substr(c_name, 1, 11) || 'x' || substr(c_name, 13) AS p_name
  FROM customer WHERE c_custkey % 7 = 0),
cands AS (
  SELECT p.p_id, c.c_custkey, {lev} AS dist
  FROM probes p JOIN customer c
    ON right(p.p_name, 4) = right(c.c_name, 4)
  WHERE {lev} BETWEEN 0 AND 2),
ranked AS (
  SELECT p_id, c_custkey AS matched_id, dist,
         row_number() OVER (PARTITION BY p_id ORDER BY dist, c_custkey) AS rn
  FROM cands)
SELECT p_id, matched_id, CAST(dist AS BIGINT) AS dist
FROM ranked WHERE rn = 1 ORDER BY p_id"""

register_sql(
    "join_fuzzy_blocked",
    # Spark's 3-arg bounded levenshtein early-exits past the threshold
    # (returns -1, excluded by BETWEEN) — exact distance for every kept
    # row, so values match the oracle's unbounded form
    _FUZZY_JOIN.format(lev="levenshtein(p.p_name, c.c_name, 2)"),
    oracle=_FUZZY_JOIN.format(lev="levenshtein(p.p_name, c.c_name)"),
    category="join",
    doc="entity-resolution fuzzy join: deterministic typo'd probe names "
    "matched back via BLOCKING (equi-join on a stable key slice — here "
    "the suffix the typo never touches) then edit-distance verify "
    "(levenshtein <= 2, shared definition) and best-match-per-probe "
    "window. The scale story is the blocking equi-join: candidate pairs "
    "are per-block, never probe x corpus; at 100 TB the block key is a "
    "phonetic/q-gram signature with the same plan shape",
)

_TRIANGLES = """WITH w AS (
  SELECT DISTINCT CAST(FLOOR(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS DOUBLE) / 600000000.0) AS BIGINT) AS win,
         user_id
  FROM events WHERE event_type = 'purchase'),
e AS (
  SELECT DISTINCT a.user_id AS u, b.user_id AS v
  FROM w a JOIN w b ON a.win = b.win AND a.user_id < b.user_id),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
SELECT COUNT(*) AS n_triangles,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT COUNT(DISTINCT u) + COUNT(DISTINCT v) FROM e) AS deg_nodes
FROM tri"""

register_sql(
    "graph_triangle_count",
    _TRIANGLES.format(epoch="unix_micros"),
    oracle=_TRIANGLES.replace(
        "unix_micros(CAST(ts AS TIMESTAMP))", "epoch_us(ts)"
    ),
    category="graph",
    doc="triangle counting over the purchase co-occurrence graph "
    "(users sharing a 10-min window), ORIENTED by id (every edge stored "
    "u < v once) — the classic formulation that bounds the wedge join by "
    "per-node out-degree instead of total degree, so hub nodes cannot "
    "blow the intermediate up; two equi-joins, no cartesian. The "
    "dedup-graph QA companion to connected components. Scale note: "
    "co-occurrence graphs densify with event RATE (edges ~ rate^2 x "
    "window), so the window must shrink as rate grows — at 10x this "
    "fixture's rate the 10-min window is already wedge-join-hostile on "
    "any engine (measured; the sf1 gate row is the honest scale ceiling "
    "for this window width)",
)

_ORDERED_COLLECT = """SELECT DISTINCT user_id,
       to_json(array_agg(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) AS seq,
       CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
FROM events WHERE user_id < 20 ORDER BY user_id"""

register_sql(
    "win_ordered_collect",
    _ORDERED_COLLECT,
    category="window",
    doc="per-user ordered event-type sequences via a full-frame windowed "
    "array_agg (the session-modeling collect a behavior pipeline feeds to "
    "a sequence model); deterministic order on the unique (ts, event_id) "
    "key; one shuffle on user_id, no per-group collect to the driver. "
    "The sequence is serialized through to_json at the result edge per "
    "convention #6 (reference universql/protocol/utils.py:231-240 applies "
    "the same ARRAY->JSON rule) — a raw list column crashes the driver's "
    "pandas canonicalizer (the r9 gate's one red row). Spark and DuckDB "
    "to_json(array<string>) agree byte-for-byte on identifier-like "
    "strings. The engine-side twin (ARRAY_AGG WITHIN GROUP ... OVER) is "
    "pinned in test_windowed_within_group",
)

# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube
# ---------------------------------------------------------------------------

register_sql(
    "agg_rollup",
    f"""SELECT l_returnflag, l_linestatus, {dsum("l_quantity")} AS sum_qty, COUNT(*) AS c
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    category="grouping",
    doc="ROLLUP with explicit NULLS FIRST (Spark/DuckDB default null order differs)",
)

register_sql(
    "agg_cube",
    f"""SELECT l_returnflag, l_linestatus, {dsum("l_quantity")} AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    category="grouping",
    doc="CUBE over two keys",
)

register_sql(
    "agg_grouping_sets",
    f"""SELECT l_returnflag, l_linestatus, {dsum("l_extendedprice")} AS sum_price
FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    category="grouping",
    doc="explicit GROUPING SETS",
)

register_sql(
    "agg_stats",
    f"""SELECT l_returnflag,
       CAST(ROUND(STDDEV_SAMP(l_quantity), 6) AS DOUBLE) AS sd,
       CAST(ROUND(VAR_SAMP(l_quantity), 6) AS DOUBLE) AS vr,
       MIN(l_quantity) AS mn, MAX(l_quantity) AS mx,
       {davg("l_quantity")} AS av
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    category="agg",
    doc="statistical aggregates (rounded: stddev is FP-order sensitive)",
)

# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

register_sql(
    "set_union_all",
    """SELECT n_name AS name FROM nation UNION ALL SELECT r_name AS name FROM region
ORDER BY name""",
    category="setop",
    doc="UNION ALL (reference test tests/integration/extract.py:52-55)",
)

register_sql(
    "set_union_distinct",
    """SELECT n_regionkey AS k FROM nation UNION SELECT r_regionkey AS k FROM region ORDER BY k""",
    category="setop",
    doc="UNION with dedup",
)

register_sql(
    "set_intersect",
    """SELECT o_custkey AS k FROM orders INTERSECT SELECT c_custkey AS k FROM customer ORDER BY k""",
    category="setop",
    doc="INTERSECT (distinct semantics both engines)",
)

register_sql(
    "set_except",
    """SELECT CAST(p_size AS INT) AS k FROM part EXCEPT SELECT CAST(l_linenumber AS INT) AS k FROM lineitem ORDER BY k""",
    category="setop",
    doc="EXCEPT with a guaranteed-nonempty difference (sizes beyond line numbers)",
)

# ---------------------------------------------------------------------------
# Join variants
# ---------------------------------------------------------------------------

register_sql(
    "join_semi",
    """SELECT COUNT(*) AS c FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    category="join",
    doc="LEFT SEMI via EXISTS",
)

register_sql(
    "join_anti",
    """SELECT COUNT(*) AS c FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    category="join",
    doc="LEFT ANTI via NOT EXISTS",
)

register_sql(
    "join_left_outer",
    """SELECT c_custkey, COALESCE(cnt, 0) AS n_orders FROM customer
LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) o
ON c_custkey = o_custkey ORDER BY c_custkey""",
    category="join",
    doc="LEFT OUTER join against pre-aggregated side",
)

register_sql(
    "join_full_outer",
    """SELECT COALESCE(a.k, b.k) AS k, a.ca, b.cb FROM
(SELECT c_nationkey AS k, COUNT(*) AS ca FROM customer GROUP BY c_nationkey) a
FULL OUTER JOIN
(SELECT s_nationkey AS k, COUNT(*) AS cb FROM supplier GROUP BY s_nationkey) b
ON a.k = b.k ORDER BY k""",
    category="join",
    doc="FULL OUTER join of two aggregates",
)

register_sql(
    "join_cross_small",
    """SELECT r1.r_name AS a, r2.r_name AS b FROM region r1 CROSS JOIN region r2
ORDER BY a, b""",
    category="join",
    doc="CROSS JOIN (bounded dims only)",
)

register_sql(
    "join_cte_chain",
    """WITH big_cust AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey HAVING COUNT(*) > 2
)
SELECT c.c_mktsegment, COUNT(*) AS c, CAST(CAST(SUM(CAST(b.n AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS total
FROM big_cust b JOIN customer c ON b.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",
    category="join",
    doc="CTE + join + agg (reference demo corpus tests/sql_optimizer.py:22-34)",
)

# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------

register_sql(
    "subq_scalar",
    f"""SELECT COUNT(*) AS c FROM orders
WHERE o_totalprice > (SELECT {davg("o_totalprice")} FROM orders)""",
    category="subquery",
    doc="scalar subquery threshold (decimal-exact avg so the cut is identical)",
)

register_sql(
    "subq_in",
    """SELECT COUNT(*) AS c FROM lineitem
WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 5000)""",
    category="subquery",
    doc="IN subquery -> semi join",
)

register_sql(
    "subq_correlated",
    """SELECT o_orderkey, o_totalprice FROM orders o
WHERE o_totalprice > 1.5 * (SELECT CAST(CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(28,6))) AS STRING) AS DOUBLE)
                                   / COUNT(*)
                            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
ORDER BY o_orderkey""",
    category="subquery",
    doc="correlated scalar subquery (decorrelates to an aggregate join)",
)

# ---------------------------------------------------------------------------
# JSON / VARIANT-ish surface (props column carries JSON, SURVEY §1.4)
# ---------------------------------------------------------------------------

register_sql(
    "json_extract",
    """SELECT CAST(get_json_object(props, '$.k') AS INT) AS k, COUNT(*) AS c
FROM events GROUP BY CAST(get_json_object(props, '$.k') AS INT) ORDER BY k""",
    oracle="""SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, COUNT(*) AS c
FROM events GROUP BY CAST(json_extract_string(props, '$.k') AS INT) ORDER BY k""",
    category="json",
    doc="JSON path extraction as group key (PARSE_JSON/VARIANT analogue)",
)

register_sql(
    "json_object_construct",
    """SELECT to_json(named_struct('id', o_orderkey, 'price', CAST(o_totalprice AS DOUBLE))) AS j
FROM orders ORDER BY o_orderkey LIMIT 20""",
    oracle="""SELECT to_json(struct_pack(id := o_orderkey, price := CAST(o_totalprice AS DOUBLE))) AS j
FROM orders ORDER BY o_orderkey LIMIT 20""",
    category="json",
    doc="OBJECT_CONSTRUCT analogue: struct -> JSON text",
)

register_sql(
    "array_construct_ops",
    """SELECT o_orderkey,
       CAST(size(array(o_orderkey, o_custkey)) AS BIGINT) AS alen,
       array(o_orderkey, o_custkey)[0] AS first_el
FROM orders ORDER BY o_orderkey LIMIT 20""",
    oracle="""SELECT o_orderkey,
       len([o_orderkey, o_custkey]) AS alen,
       [o_orderkey, o_custkey][1] AS first_el
FROM orders ORDER BY o_orderkey LIMIT 20""",
    category="json",
    doc="ARRAY_CONSTRUCT analogue + length + index (0- vs 1-based dialect)",
)

# ---------------------------------------------------------------------------
# Type / cast gallery (reference ALL_COLUMNS_QUERY, tests/integration/utils.py:35-84)
# ---------------------------------------------------------------------------

# Two result-edge conventions pinned by the r5 driver-gate failure (VERDICT r5
# 'What's wrong' #1): in oracled specs, (a) no raw DECIMAL output columns —
# a values-level re-inference of the Spark result types a decimal by its
# VALUES (decimal128(3,2) for 1.50) while DuckDB's Arrow carries the declared
# (12,2), so bit-identical values still hash-mismatch; cast decimals to
# STRING (scale-preserving) or DOUBLE at the result edge. (b) no entirely-NULL
# output columns — an all-null column re-infers as Arrow `null` type vs the
# oracle's utf8. types_cast_gallery was the only spec with either feature;
# it now emits the decimal through a scale-preserving string and carries the
# NULL cast in a partially-null two-row column. tools_correctness_local
# enforces both conventions registry-wide.
register_sql(
    "types_cast_gallery",
    """SELECT rid, CAST(1 AS BIGINT) AS i64, CAST(1 AS INT) AS i32,
       CAST(1 AS SMALLINT) AS i16, CAST(1 AS TINYINT) AS i8,
       CAST('1.5' AS DOUBLE) AS f64,
       CAST(CAST(1.5 AS DECIMAL(12,2)) AS STRING) AS dec_s,
       CAST('text' AS STRING) AS s, CAST(1 = 1 AS BOOLEAN) AS b,
       CAST('2024-01-02' AS DATE) AS dt,
       CASE WHEN rid = 0 THEN CAST(NULL AS STRING) ELSE 'filled' END AS nul
FROM (SELECT 0 AS rid UNION ALL SELECT 1) ORDER BY rid""",
    oracle="""SELECT rid, CAST(1 AS BIGINT) AS i64, CAST(1 AS INT) AS i32,
       CAST(1 AS SMALLINT) AS i16, CAST(1 AS TINYINT) AS i8,
       CAST('1.5' AS DOUBLE) AS f64,
       CAST(CAST(1.5 AS DECIMAL(12,2)) AS VARCHAR) AS dec_s,
       CAST('text' AS VARCHAR) AS s, CAST(1 = 1 AS BOOLEAN) AS b,
       CAST('2024-01-02' AS DATE) AS dt,
       CASE WHEN rid = 0 THEN CAST(NULL AS VARCHAR) ELSE 'filled' END AS nul
FROM (SELECT 0 AS rid UNION ALL SELECT 1) ORDER BY rid""",
    category="types",
    doc="cast matrix incl. NULL cast (decimal emitted scale-preserving as text)",
)

register_sql(
    "select_literal",
    "SELECT 1 AS test",
    category="types",
    doc="SELECT literal, no FROM (tests/integration/utils.py:31-33)",
)

register_sql(
    "func_string_gallery",
    """SELECT o_orderkey,
       upper(o_orderstatus) AS up, lower(o_orderpriority) AS lo,
       substr(o_orderpriority, 1, 1) AS sub,
       CAST(length(o_orderpriority) AS BIGINT) AS ln,
       trim(concat(' ', o_orderstatus, ' ')) AS tr,
       replace(o_orderpriority, '-', '_') AS rep,
       coalesce(NULL, o_orderstatus) AS co,
       nullif(o_orderstatus, 'O') AS ni,
       CAST(position('-' IN o_orderpriority) AS BIGINT) AS pos,
       reverse(o_orderstatus) AS rev,
       lpad(o_orderstatus, 3, 'x') AS lp,
       rpad(o_orderstatus, 3, 'y') AS rp
FROM orders ORDER BY o_orderkey LIMIT 50""",
    category="functions",
    doc="scalar string-function gallery",
)

register_sql(
    "func_math_gallery",
    """SELECT l_orderkey, l_linenumber,
       abs(-l_quantity) AS ab, round(l_extendedprice, 1) AS rnd,
       CAST(floor(l_discount * 100) AS BIGINT) AS fl, CAST(ceil(l_tax * 100) AS BIGINT) AS ce,
       CAST(l_orderkey % 7 AS BIGINT) AS md,
       greatest(l_quantity, 10.0) AS gr, least(l_quantity, 10.0) AS le,
       CAST(ROUND(sqrt(l_quantity), 6) AS DOUBLE) AS sq,
       CAST(ROUND(ln(l_quantity + 1), 6) AS DOUBLE) AS lg,
       power(2, 3) AS pw, CAST(sign(l_discount - 0.05) AS INT) AS sg
FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 50""",
    category="functions",
    doc="scalar math-function gallery (transcendentals rounded)",
)

register_sql(
    "func_datetime_gallery",
    """SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m, CAST(day(o_orderdate) AS BIGINT) AS d,
       CAST(hour(o_orderdate) AS BIGINT) AS h, CAST(minute(o_orderdate) AS BIGINT) AS mi,
       CAST(o_orderdate + INTERVAL 3 DAY AS DATE) AS plus3,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart
FROM orders ORDER BY o_orderkey LIMIT 50""",
    category="functions",
    doc="datetime function gallery (year/month/day/interval/date_trunc)",
)

register_sql(
    "case_insensitive_idents",
    """SELECT O_ORDERPRIORITY AS P, COUNT(*) AS C FROM Orders GROUP BY o_orderpriority
ORDER BY p""",
    oracle="""SELECT O_ORDERPRIORITY AS P, COUNT(*) AS C FROM Orders GROUP BY o_orderpriority
ORDER BY p""",
    category="identifiers",
    doc="case-insensitive identifier resolution (reference object_identifiers matrix)",
)

register_sql(
    "distinct_rows",
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus""",
    category="setop",
    doc="row-level DISTINCT",
)

register_sql(
    "multi_distinct_agg",
    """SELECT COUNT(DISTINCT l_suppkey) AS ds, COUNT(DISTINCT l_partkey) AS dp,
       COUNT(DISTINCT l_returnflag) AS dr FROM lineitem""",
    category="agg",
    doc="multiple DISTINCT aggregates in one query (expand + partial agg)",
)

register_sql(
    "win_range_frame",
    """SELECT o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
            OVER (ORDER BY o_orderkey RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS STRING) AS DOUBLE) AS rsum
FROM orders ORDER BY o_orderkey LIMIT 100""",
    category="window",
    doc="RANGE frame (value-based) window, vs the ROWS frames elsewhere",
)

# The fixtures are NULL-free, so NULL semantics are exercised by *introducing*
# NULLs with NULLIF/CASE and checking aggregation/grouping/ordering behavior
# matches the oracle (SURVEY §7.3 lists NULL-ordering drift as an expected trap).
register_sql(
    "null_agg_semantics",
    """SELECT COUNT(*) AS n_rows, COUNT(NULLIF(l_returnflag, 'N')) AS n_nonnull,
       CAST(CAST(SUM(CAST(NULLIF(l_quantity, 1.0) AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sum_skip_nulls,
       COUNT(DISTINCT NULLIF(l_returnflag, 'N')) AS d_nonnull
FROM lineitem""",
    category="nulls",
    doc="aggregates skip NULLs; COUNT(*) vs COUNT(col) distinction",
)

register_sql(
    "null_group_keys",
    """SELECT NULLIF(l_returnflag, 'N') AS rf, COUNT(*) AS c
FROM lineitem GROUP BY NULLIF(l_returnflag, 'N')
ORDER BY rf NULLS FIRST""",
    category="nulls",
    doc="NULL forms its own group; explicit NULLS FIRST (engine defaults differ)",
)

register_sql(
    "null_join_semantics",
    """SELECT COUNT(*) AS c FROM
(SELECT NULLIF(c_nationkey, 0) AS k FROM customer) a
JOIN (SELECT NULLIF(s_nationkey, 0) AS k FROM supplier) b ON a.k = b.k""",
    category="nulls",
    doc="NULL never equi-joins with NULL",
)

register_sql(
    "order_by_ordinal",
    """SELECT o_orderpriority AS p, COUNT(*) AS c FROM orders
GROUP BY 1 ORDER BY 2 DESC, 1""",
    category="identifiers",
    doc="GROUP BY / ORDER BY ordinals (reference ClickBench Q35 uses GROUP BY 1)",
)

register_sql(
    "unpivot_stack",
    """SELECT l_orderkey, l_linenumber, metric, val FROM (
  SELECT l_orderkey, l_linenumber,
         stack(2, 'qty', l_quantity, 'price', l_extendedprice) AS (metric, val)
  FROM lineitem) t ORDER BY l_orderkey, l_linenumber, metric LIMIT 100""",
    oracle="""SELECT l_orderkey, l_linenumber, metric, val FROM (
  SELECT l_orderkey, l_linenumber, 'qty' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'price' AS metric, l_extendedprice AS val FROM lineitem
) t ORDER BY l_orderkey, l_linenumber, metric LIMIT 100""",
    category="grouping",
    doc="UNPIVOT via stack() vs UNION ALL oracle",
)

register_sql(
    "agg_rollup_grouping_fn",
    f"""SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf, CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       {dsum("l_quantity")} AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    category="grouping",
    doc="GROUPING() flags disambiguate subtotal rows from genuine NULL keys",
)

register_sql(
    "subq_min_cost_supplier",
    """SELECT s.s_suppkey, s.s_name, s.s_acctbal FROM supplier s
WHERE s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                     WHERE s2.s_nationkey = s.s_nationkey)
ORDER BY s.s_suppkey""",
    category="subquery",
    doc="TPC-H q2-style correlated equality on an aggregate (min per group)",
)

register_sql(
    "win_first_last_value",
    """SELECT o_orderkey,
       first_value(o_orderkey) OVER w AS first_in_prio,
       last_value(o_orderkey) OVER w AS last_so_far
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey LIMIT 200""",
    category="window",
    doc="FIRST_VALUE/LAST_VALUE with a named WINDOW clause",
)

register_sql(
    "win_nth_value",
    """SELECT o_orderkey,
       nth_value(o_orderkey, 3) OVER w AS third_in_prio,
       nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_overall
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY o_orderkey LIMIT 200""",
    category="window",
    doc="NTH_VALUE over running and full frames (NULL before the nth row "
        "arrives in the running frame)",
)

register_sql(
    "func_split_part",
    """SELECT o_orderkey, split_part(o_orderpriority, '-', 1) AS prio_num,
       split_part(o_orderpriority, '-', 2) AS prio_name
FROM orders ORDER BY o_orderkey LIMIT 50""",
    category="functions",
    doc="split_part (same 1-based semantics both engines)",
)

register_sql(
    "agg_bool",
    """SELECT l_returnflag,
       bool_and(l_quantity > 0) AS all_pos,
       bool_or(l_discount > 0.09) AS any_high_disc
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    category="agg",
    doc="BOOL_AND/BOOL_OR aggregates",
)

register_sql(
    "agg_min_max_by",
    """SELECT l_returnflag,
       max_by(l_orderkey, l_extendedprice + l_orderkey * 1e-9) AS key_of_max_price,
       min_by(l_orderkey, l_extendedprice + l_orderkey * 1e-9) AS key_of_min_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    category="agg",
    doc="MAX_BY/MIN_BY (ordering key made unique so arg-max is well-defined)",
)

register_sql(
    "join_self_pairs",
    """SELECT a.o_custkey AS k, COUNT(*) AS n_pairs
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
GROUP BY a.o_custkey ORDER BY n_pairs DESC, k LIMIT 20""",
    category="join",
    doc="self-join pair counting per key",
)

register_sql(
    "agg_listagg_ordered",
    """SELECT n_regionkey,
       listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    oracle="""SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS names
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    category="agg",
    doc="LISTAGG WITHIN GROUP (ordered string agg; DuckDB spells it string_agg)",
)

register_sql(
    "fn_scalar_gallery",
    """SELECT n_nationkey AS k,
       nullif(n_nationkey % 5, 0) AS nz,
       coalesce(nullif(n_nationkey % 5, 0), 0) AS zn,
       power(n_nationkey, 2) AS sq,
       regexp_extract(n_name, '[A-Z]+', 0) AS first_caps,
       try_cast(n_name AS DOUBLE) AS not_a_number
FROM nation ORDER BY k""",
    oracle="""SELECT n_nationkey AS k,
       nullif(n_nationkey % 5, 0) AS nz,
       coalesce(nullif(n_nationkey % 5, 0), 0) AS zn,
       power(n_nationkey, 2) AS sq,
       regexp_extract(n_name, '[A-Z]+', 0) AS first_caps,
       try_cast(n_name AS DOUBLE) AS not_a_number
FROM nation ORDER BY k""",
    category="scalar",
    doc="scalar gallery backing the NULLIFZERO/ZEROIFNULL/SQUARE/TRY_TO_NUMBER/REGEXP_SUBSTR dialect rewrites",
)

register_sql(
    "agg_group_by_all",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS c,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ALL ORDER BY l_returnflag, l_linestatus""",
    category="agg",
    doc="GROUP BY ALL (infer grouping keys from non-aggregate select items)",
)

register_sql(
    "agg_pivot_sql",
    """SELECT * FROM (
  SELECT l_returnflag AS rf, l_linestatus AS ls, CAST(l_quantity AS DECIMAL(28,6)) AS q
  FROM lineitem
) PIVOT (CAST(SUM(q) AS DOUBLE) FOR ls IN ('O' AS o, 'F' AS f))
ORDER BY rf""",
    oracle="""SELECT l_returnflag AS rf,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS DOUBLE) AS o,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS DOUBLE) AS f
FROM lineitem GROUP BY l_returnflag ORDER BY rf""",
    category="agg",
    doc="SQL PIVOT clause (oracle: equivalent conditional aggregation)",
)

register_sql(
    "win_ignore_nulls_locf",
    """SELECT event_id,
       last_value(CASE WHEN event_type = 'view' THEN NULL ELSE value END) IGNORE NULLS
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
       lag(CASE WHEN event_type = 'view' THEN NULL ELSE value END) IGNORE NULLS
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_nn
FROM events ORDER BY event_id""",
    oracle="""SELECT event_id,
       last_value(CASE WHEN event_type = 'view' THEN NULL ELSE value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
       lag(CASE WHEN event_type = 'view' THEN NULL ELSE value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_nn
FROM events ORDER BY event_id""",
    category="window",
    doc="IGNORE NULLS last_value/lag: last-observation-carried-forward gap fill "
        "(the sensor/ticker pattern; one shuffle on user_id, no self-join)",
)


_DIALECT_EXT_ORACLE = """SELECT n_nationkey AS k,
       CASE WHEN (n_nationkey % 3) = 1 THEN 'one'
            WHEN (n_nationkey % 3) = 2 THEN 'two' ELSE 'other' END AS dcode,
       CASE WHEN (n_regionkey) = 0 THEN 0
            ELSE CAST(n_nationkey AS DOUBLE) / n_regionkey END AS safe_div,
       CASE WHEN n_regionkey % 2 = 0 THEN NULL ELSE 'odd' END AS nv,
       try_cast('12.345' AS DECIMAL(10,2)) AS exact_num,
       'it''s raw' AS dq
FROM nation ORDER BY k"""


@register(
    "fn_dialect_ext",
    _DIALECT_EXT_ORACLE,
    category="scalar",
    doc="round-3 dialect ring: DECODE, DIV0, NVL2, 3-arg TRY_TO_NUMBER, "
        "$$-quoted strings — Snowflake text through Engine.execute",
)
def fn_dialect_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake-dialect scalar surface the reference accepts via
    sqlglot+fakesnow (warehouse/duckdb.py:15): DECODE with null-safe match,
    DIV0, NVL2, TRY_TO_NUMBER(expr, p, s), $$-quoted string literals. Runs
    VERBATIM Snowflake text through the engine's dialect layer; the oracle
    states the same semantics in ANSI SQL."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT n_nationkey AS k,
       DECODE(n_nationkey % 3, 1, 'one', 2, 'two', 'other') AS dcode,
       DIV0(n_nationkey, n_regionkey) AS safe_div,
       NVL2(NULLIF(n_regionkey % 2, 0), 'odd', NULL) AS nv,
       TRY_TO_NUMBER('12.345', 10, 2) AS exact_num,
       $$it's raw$$ AS dq
FROM nation ORDER BY k"""
    )


_ARRAY_EXT_ORACLE = """SELECT n_nationkey AS k,
       len(list_distinct([n_nationkey % 3, n_regionkey, n_nationkey % 3])) AS n_uniq,
       list_contains([n_regionkey, 99], n_nationkey % 5) AS has_el,
       CAST(CASE WHEN list_position([10, 20, 30], (n_nationkey % 3) * 10 + 10) IS NULL
            THEN NULL ELSE list_position([10, 20, 30], (n_nationkey % 3) * 10 + 10) - 1
       END AS BIGINT) AS pos0,
       array_to_string([n_nationkey, n_regionkey], '-') AS joined,
       [n_nationkey, n_regionkey, 7][2] AS sliced_first,
       len([n_nationkey]) + len(list_filter([n_regionkey, NULL], x -> x IS NOT NULL)) AS compacted
FROM nation ORDER BY k"""


@register(
    "fn_array_gallery",
    _ARRAY_EXT_ORACLE,
    category="scalar",
    doc="Snowflake array surface: ARRAY_DISTINCT/CONTAINS/POSITION/SLICE/"
        "TO_STRING/COMPACT with the (value, array) arg order and 0-based "
        "position semantics rewritten for Spark",
)
def fn_array_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake array functions VERBATIM through the engine's dialect layer.
    Divergences handled: ARRAY_CONTAINS/ARRAY_POSITION take (value, array)
    in Snowflake vs (array, value) in Spark; ARRAY_POSITION is 0-based
    NULL-if-absent vs 1-based 0-if-absent; ARRAY_SLICE is 0-based
    end-exclusive vs 1-based length-counted. Oracle states the same values
    with DuckDB list functions."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT n_nationkey AS k,
       CAST(ARRAY_SIZE(ARRAY_DISTINCT(ARRAY_CONSTRUCT(n_nationkey % 3, n_regionkey, n_nationkey % 3))) AS BIGINT) AS n_uniq,
       ARRAY_CONTAINS(n_nationkey % 5, ARRAY_CONSTRUCT(n_regionkey, 99)) AS has_el,
       ARRAY_POSITION((n_nationkey % 3) * 10 + 10, ARRAY_CONSTRUCT(10, 20, 30)) AS pos0,
       ARRAY_TO_STRING(ARRAY_CONSTRUCT(n_nationkey, n_regionkey), '-') AS joined,
       ARRAY_SLICE(ARRAY_CONSTRUCT(n_nationkey, n_regionkey, 7), 1, 2)[0] AS sliced_first,
       CAST(ARRAY_SIZE(ARRAY_CAT(ARRAY_CONSTRUCT(n_nationkey), ARRAY_COMPACT(ARRAY_CONSTRUCT(n_regionkey, NULL)))) AS BIGINT) AS compacted
FROM nation ORDER BY k"""
    )


_DT_EXT_ORACLE = """SELECT o_orderkey AS k,
       date_part('quarter', o_orderdate) AS qtr,
       strftime(o_orderdate, '%a') AS dname,
       strftime(o_orderdate, '%b') AS mname,
       CAST(isodow(o_orderdate) AS BIGINT) AS dow_iso,
       last_day(o_orderdate) AS month_end,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m
FROM orders ORDER BY o_orderkey LIMIT 50"""


@register(
    "fn_datetime_ext",
    _DT_EXT_ORACLE,
    category="scalar",
    doc="DATE_PART with bare part keyword, DAYNAME/MONTHNAME abbreviations, "
        "DAYOFWEEKISO 1=Monday, LAST_DAY, ADD_MONTHS",
)
def fn_datetime_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake datetime surface through the dialect layer: DATE_PART
    accepts a bare part keyword (quoted for Spark), DAYNAME/MONTHNAME emit
    3-letter abbreviations, DAYOFWEEKISO is 1=Monday..7 (Spark weekday()+1).
    """
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT o_orderkey AS k,
       CAST(DATE_PART(quarter, o_orderdate) AS BIGINT) AS qtr,
       DAYNAME(o_orderdate) AS dname,
       MONTHNAME(o_orderdate) AS mname,
       CAST(DAYOFWEEKISO(o_orderdate) AS BIGINT) AS dow_iso,
       LAST_DAY(o_orderdate) AS month_end,
       ADD_MONTHS(o_orderdate, 3) AS plus3m
FROM orders ORDER BY o_orderkey LIMIT 50"""
    )


_RTR_ORACLE = """SELECT l_returnflag AS rf, l_linestatus AS ls,
       round(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS STRING) AS DOUBLE) /
             SUM(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS STRING) AS DOUBLE)) OVER (PARTITION BY l_returnflag), 6) AS share,
       round(CAST(median(l_quantity) AS DOUBLE), 4) AS med,
       mode() WITHIN GROUP (ORDER BY l_linenumber) AS md
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY rf, ls"""


@register(
    "win_ratio_to_report",
    _RTR_ORACLE,
    category="window",
    doc="RATIO_TO_REPORT over grouped sums + MEDIAN + MODE",
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT(x) OVER (spec) (rewritten to x / SUM(x) OVER, no
    Spark twin) with MEDIAN/MODE — Snowflake text through the engine.
    MODE ties: both engines pick the smallest value (DuckDB mode() WITHIN
    GROUP ordered, Spark mode deterministic via min-tiebreak shape)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT l_returnflag AS rf, l_linestatus AS ls,
       ROUND(RATIO_TO_REPORT(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS STRING) AS DOUBLE))
             OVER (PARTITION BY l_returnflag), 6) AS share,
       ROUND(CAST(MEDIAN(l_quantity) AS DOUBLE), 4) AS med,
       MODE(l_linenumber) AS md
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY rf, ls"""
    )


_AGG_ARR_OBJ_ORACLE = """SELECT n_regionkey AS rk,
       array_to_string(array_agg(n_name ORDER BY n_name), ',') AS names_asc,
       array_to_string(array_agg(n_name ORDER BY n_nationkey DESC), ',') AS by_key_desc
FROM nation GROUP BY n_regionkey ORDER BY rk"""


@register(
    "agg_array_object_agg",
    _AGG_ARR_OBJ_ORACLE,
    category="agg",
    doc="ARRAY_AGG WITHIN GROUP (same-key and cross-key ordering) + "
        "OBJECT_AGG -> JSON, keyed extraction for deterministic compare",
)
def agg_array_object_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake ordered ARRAY_AGG: WITHIN GROUP has no Spark twin —
    same-key ordering becomes sort_array, cross-key ordering packs
    (key, value) structs, sorts, projects the value back. (OBJECT_AGG is
    covered by test_object_agg_sorted_keys — its JSON output is engine-
    deterministic only after our sorted-entry rewrite.)"""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT n_regionkey AS rk,
       ARRAY_TO_STRING(ARRAY_AGG(n_name) WITHIN GROUP (ORDER BY n_name), ',') AS names_asc,
       ARRAY_TO_STRING(ARRAY_AGG(n_name) WITHIN GROUP (ORDER BY n_nationkey DESC), ',') AS by_key_desc
FROM nation GROUP BY n_regionkey ORDER BY rk"""
    )


# ---------------------------------------------------------------------------
# round-3 function ring: aggregates, stats, strings, time slicing, window
# events — Snowflake text VERBATIM through the dialect layer, every value
# pinned against the DuckDB oracle
# ---------------------------------------------------------------------------

_AGG_EXT_ORACLE = """SELECT l_linestatus AS ls,
       bool_and(l_quantity > 0) AS all_pos,
       bool_or(l_discount > 0.09) AS any_hi_disc,
       (count_if(l_linenumber = 1) % 2) = 1 AS parity_first,
       bit_and(l_linenumber) AS band,
       bit_or(l_linenumber) AS bor,
       bit_xor(l_linenumber) AS bxor,
       CAST(count_if(l_returnflag = 'R') AS BIGINT) AS n_ret,
       min_by(l_quantity, l_orderkey * 10000000 + l_linenumber * 1000000 + CAST(l_quantity * 100 AS BIGINT)) AS q_first,
       max_by(l_quantity, l_orderkey * 10000000 + l_linenumber * 1000000 + CAST(l_quantity * 100 AS BIGINT)) AS q_last
FROM lineitem GROUP BY l_linestatus ORDER BY ls"""


@register(
    "fn_agg_ext",
    _AGG_EXT_ORACLE,
    category="agg",
    doc="BOOLAND/BOOLOR/BOOLXOR_AGG, BITAND/BITOR/BITXOR_AGG, COUNT_IF, "
        "MIN_BY/MAX_BY — Snowflake aggregate surface through the dialect",
)
def fn_agg_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake boolean/bitwise aggregate surface. BOOLXOR_AGG is the
    parity of the true-count (XOR is associative/commutative, so any
    partitioning order gives the same answer); MIN_BY/MAX_BY keys embed the
    VALUE itself (the fixture has duplicate (orderkey, linenumber) pairs),
    so tied keys always carry equal values and the answer is deterministic."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT l_linestatus AS ls,
       BOOLAND_AGG(l_quantity > 0) AS all_pos,
       BOOLOR_AGG(l_discount > 0.09) AS any_hi_disc,
       BOOLXOR_AGG(l_linenumber = 1) AS parity_first,
       BITAND_AGG(l_linenumber) AS band,
       BITOR_AGG(l_linenumber) AS bor,
       BITXOR_AGG(l_linenumber) AS bxor,
       COUNT_IF(l_returnflag = 'R') AS n_ret,
       MIN_BY(l_quantity, l_orderkey * 10000000 + l_linenumber * 1000000 + CAST(l_quantity * 100 AS BIGINT)) AS q_first,
       MAX_BY(l_quantity, l_orderkey * 10000000 + l_linenumber * 1000000 + CAST(l_quantity * 100 AS BIGINT)) AS q_last
FROM lineitem GROUP BY l_linestatus ORDER BY ls"""
    )


_STATS_EXT_ORACLE = """SELECT l_returnflag AS rf,
       round(skewness(CAST(l_quantity AS DOUBLE)), 4) + 0.0 AS sk,
       round(kurtosis(CAST(l_quantity AS DOUBLE)), 4) + 0.0 AS ku,
       round(corr(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)), 4) + 0.0 AS c,
       round(covar_pop(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)), 4) + 0.0 AS cvp,
       round(covar_samp(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)), 4) + 0.0 AS cvs,
       round(regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 2) + 0.0 AS slope,
       round(regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 2) + 0.0 AS icept,
       round(regr_r2(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 4) + 0.0 AS r2,
       CAST(regr_count(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY rf"""


@register(
    "fn_stats_ext",
    _STATS_EXT_ORACLE,
    category="agg",
    doc="SKEW/KURTOSIS (sample-corrected from Spark's population moments), "
        "CORR, COVAR_POP/SAMP, REGR_SLOPE/INTERCEPT/R2/COUNT",
)
def fn_stats_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface. Snowflake's SKEW/KURTOSIS (like
    DuckDB's) are SAMPLE-corrected G1/G2 while Spark's skewness/kurtosis are
    population g1/g2 — the dialect rewrites via G1 = g1*sqrt(n(n-1))/(n-2),
    G2 = ((n+1)g2+6)(n-1)/((n-2)(n-3)). Values rounded: these are
    well-conditioned second/third/fourth moments over ~thousands of rows, so
    4 (2 for the ~1e3-magnitude slope/intercept) decimals are stable under
    any partitioning order."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT l_returnflag AS rf,
       ROUND(SKEW(CAST(l_quantity AS DOUBLE)), 4) + 0.0 AS sk,
       ROUND(KURTOSIS(CAST(l_quantity AS DOUBLE)), 4) + 0.0 AS ku,
       ROUND(CORR(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)), 4) + 0.0 AS c,
       ROUND(COVAR_POP(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)), 4) + 0.0 AS cvp,
       ROUND(COVAR_SAMP(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)), 4) + 0.0 AS cvs,
       ROUND(REGR_SLOPE(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 2) + 0.0 AS slope,
       ROUND(REGR_INTERCEPT(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 2) + 0.0 AS icept,
       ROUND(REGR_R2(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)), 4) + 0.0 AS r2,
       REGR_COUNT(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY rf"""
    )


# second_word splits p_name (two words in the test corpus; p_type is
# single-word, which made this column entirely NULL — see the result-edge
# convention note at types_cast_gallery); the out-of-range GET NULL semantic
# moves into a COALESCE marker so the column is partially, never fully, null.
_STRING_EXT_ORACLE = """SELECT p_partkey AS k,
       string_split(p_name, ' ')[2] AS second_word,
       coalesce(string_split(p_name, ' ')[3], '<none>') AS third_word,
       regexp_full_match(p_name, '.*ros.*') AS has_ros,
       len(regexp_extract_all(p_name, 'o')) AS n_o,
       strpos(p_name, regexp_extract(p_name, '[aeiou]', 0)) AS first_vowel,
       regexp_extract_all(p_name, '[aeiou]')[1] AS v1,
       substr(p_name, 1, 0) || 'XX' || substr(p_name, 4) AS ins,
       decode(from_base64(to_base64(p_brand::BLOB))) AS b64rt,
       hex(p_brand) AS hx
FROM part ORDER BY k LIMIT 60"""


@register(
    "fn_string_ext",
    _STRING_EXT_ORACLE,
    category="scalar",
    doc="SPLIT (literal delimiter), full-match REGEXP_LIKE, REGEXP_COUNT/"
        "INSTR/SUBSTR_ALL, INSERT->overlay, BASE64/HEX encode-decode",
)
def fn_string_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-surface divergences: Snowflake SPLIT takes a LITERAL delimiter
    (Spark split takes a regex), REGEXP_LIKE is a FULL match (Spark's is
    partial), REGEXP_SUBSTR_ALL needs the explicit group-0 index in Spark,
    INSERT is Spark overlay with reordered args. Array indexing is 0-based
    in both Snowflake and Spark; the DuckDB oracle is 1-based."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT p_partkey AS k,
       GET(SPLIT(p_name, ' '), 1) AS second_word,
       COALESCE(GET(SPLIT(p_name, ' '), 2), '<none>') AS third_word,
       REGEXP_LIKE(p_name, '.*ros.*') AS has_ros,
       CAST(REGEXP_COUNT(p_name, 'o') AS BIGINT) AS n_o,
       CAST(REGEXP_INSTR(p_name, '[aeiou]') AS BIGINT) AS first_vowel,
       GET(REGEXP_SUBSTR_ALL(p_name, '[aeiou]'), 0) AS v1,
       INSERT(p_name, 1, 3, 'XX') AS ins,
       BASE64_DECODE_STRING(BASE64_ENCODE(p_brand)) AS b64rt,
       HEX_ENCODE(p_brand) AS hx
FROM part ORDER BY k LIMIT 60"""
    )


_TIME_SLICE_ORACLE = """SELECT o_orderkey AS k,
       strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d %H:%M') AS tc,
       strftime(time_bucket(INTERVAL '15 days', CAST(o_orderdate AS TIMESTAMP), TIMESTAMP '1970-01-01'), '%Y-%m-%d') AS slice15d,
       strftime(time_bucket(INTERVAL '2 months', CAST(o_orderdate AS TIMESTAMP), TIMESTAMP '1970-01-01'), '%Y-%m-%d') AS slice2m,
       strftime(time_bucket(INTERVAL '3 months', CAST(o_orderdate AS TIMESTAMP), TIMESTAMP '1970-01-01') + INTERVAL 3 MONTH, '%Y-%m-%d') AS sliceq_end,
       (o_orderdate - INTERVAL (((isodow(o_orderdate) - 5 + 6) % 7) + 1) DAY)::DATE AS prev_fri,
       (o_orderdate + INTERVAL (((5 - isodow(o_orderdate) + 6) % 7) + 1) DAY)::DATE AS next_fri
FROM orders ORDER BY o_orderkey LIMIT 50"""


@register(
    "fn_time_slice",
    _TIME_SLICE_ORACLE,
    category="scalar",
    doc="TIME_SLICE (epoch-aligned sec..week, month-arithmetic month/quarter/"
        "year, START/END), TO_CHAR datetime formats, PREVIOUS_DAY/NEXT_DAY",
)
def fn_time_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake time bucketing: TIME_SLICE aligns slices to the epoch
    (DuckDB time_bucket with an explicit 1970-01-01 origin states the same
    buckets); MONTH/QUARTER/YEAR slices count months since 1970-01. The
    'END' kind returns the exclusive upper bound. PREVIOUS_DAY =
    next_day(d - 8, dow): the unique dow inside (d-8, d-1] is the
    strictly-previous occurrence."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT o_orderkey AS k,
       TO_CHAR(CAST(o_orderdate AS TIMESTAMP), 'YYYY-MM-DD HH24:MI') AS tc,
       TO_CHAR(TIME_SLICE(CAST(o_orderdate AS TIMESTAMP), 15, 'DAY'), 'YYYY-MM-DD') AS slice15d,
       TO_CHAR(TIME_SLICE(CAST(o_orderdate AS TIMESTAMP), 2, 'MONTH'), 'YYYY-MM-DD') AS slice2m,
       TO_CHAR(TIME_SLICE(CAST(o_orderdate AS TIMESTAMP), 1, 'QUARTER', 'END'), 'YYYY-MM-DD') AS sliceq_end,
       PREVIOUS_DAY(o_orderdate, 'FRI') AS prev_fri,
       NEXT_DAY(o_orderdate, 'FRI') AS next_fri
FROM orders ORDER BY o_orderkey LIMIT 50"""
    )


_COND_TRUE_ORACLE = """SELECT event_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS clicks_so_far
FROM events ORDER BY event_id LIMIT 500"""


@register(
    "win_cond_true_event",
    _COND_TRUE_ORACLE,
    category="window",
    doc="CONDITIONAL_TRUE_EVENT -> running SUM with an explicit ROWS frame",
)
def win_cond_true_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake CONDITIONAL_TRUE_EVENT(expr) OVER (w): running count of
    rows where expr held, inclusive. The rewrite forces a ROWS frame —
    Spark's default ordered frame is RANGE, which would merge ORDER BY ties
    into one event number."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT event_id,
       CONDITIONAL_TRUE_EVENT(event_type = 'click')
         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS clicks_so_far
FROM events ORDER BY event_id LIMIT 500"""
    )


_CHANGE_EVENT_ORACLE = """SELECT event_id,
       CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS change_event
FROM (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NOT NULL
                   AND event_type IS DISTINCT FROM lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS chg
  FROM events) t
ORDER BY event_id LIMIT 500"""


@register(
    "win_change_event",
    _CHANGE_EVENT_ORACLE,
    category="window",
    doc="CONDITIONAL_CHANGE_EVENT as a two-step window (lag diff -> running "
        "sum) — not single-expression-rewritable (nested window functions)",
)
def win_change_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONDITIONAL_CHANGE_EVENT(expr) OVER (w): event number that increments
    whenever expr changes value from the previous row in the window. Needs a
    LAG inside a running SUM — nested window functions are illegal in one
    expression in every engine, so this is a DataFrame-level operator: one
    shuffle on user_id, both windows reuse the same sort."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(prev.isNotNull() & ~F.col("event_type").eqNullSafe(prev), 1).otherwise(0)
    stepped = ev.select("user_id", "ts", "event_id", chg.alias("chg"))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        stepped.select("event_id", F.sum("chg").over(run).alias("change_event"))
        .orderBy("event_id")
        .limit(500)
    )


_STAR_MOD_ORACLE = """SELECT * EXCLUDE (o_orderpriority, o_orderstatus, o_custkey, o_orderdate),
       CAST(o_orderdate AS DATE) AS o_orderdate,
       o_orderstatus AS status,
       o_custkey % 100 AS o_custkey
FROM orders ORDER BY o_orderkey LIMIT 100"""


@register(
    "fn_star_modifiers",
    _STAR_MOD_ORACLE,
    category="scalar",
    doc="SELECT * EXCLUDE/RENAME/REPLACE -> Spark * EXCEPT + trailing aliases",
)
def fn_star_modifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake star modifiers: EXCLUDE maps to Spark 4's native
    * EXCEPT; RENAME/REPLACE become EXCEPT plus trailing aliased columns
    (position divergence documented in dialect.rewrite_star_modifiers —
    irrelevant here, the compare sorts columns by name). The oracle uses
    DuckDB's own EXCLUDE."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT * EXCLUDE (o_orderpriority)
       RENAME (o_orderstatus AS status)
       REPLACE (o_custkey % 100 AS o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate)
FROM orders ORDER BY o_orderkey LIMIT 100"""
    )


_PIVOT_DYN_ORACLE = """SELECT rf,
       CAST(SUM(CASE WHEN ls = 'F' THEN q END) AS DOUBLE) AS "F",
       CAST(SUM(CASE WHEN ls = 'O' THEN q END) AS DOUBLE) AS "O"
FROM (SELECT l_returnflag AS rf, l_linestatus AS ls, l_quantity AS q FROM lineitem) t
GROUP BY rf ORDER BY rf"""


@register(
    "agg_pivot_dynamic",
    _PIVOT_DYN_ORACLE,
    category="grouping",
    doc="dynamic PIVOT: FOR col IN (ANY) resolved via SELECT DISTINCT "
        "(k-scale driver collect, exactly what DataFrame.pivot() does)",
)
def agg_pivot_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dynamic pivot — `IN (ANY ORDER BY ls)`: the engine resolves
    the value list with a DISTINCT subquery (pivot-column cardinality rows
    to the driver, same as Spark's own .pivot() without explicit values)
    and substitutes sorted literals, then Spark's native PIVOT runs."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT * FROM (SELECT l_returnflag AS rf, l_linestatus AS ls, l_quantity AS q FROM lineitem)
PIVOT (CAST(SUM(q) AS DOUBLE) FOR ls IN (ANY ORDER BY ls)) ORDER BY rf"""
    )


_PARSE_URL_ORACLE = """SELECT o_orderkey AS k,
       regexp_extract(u, '^([a-z]+)://', 1) AS scheme,
       regexp_extract(u, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(u, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(u, '\\?([^#]*)', 1) AS query
FROM (SELECT o_orderkey,
             'https://shop' || (o_custkey % 5) || '.example.com/orders/' || o_orderkey
             || '?p=' || (o_custkey % 9) AS u
      FROM orders) t
ORDER BY k LIMIT 100"""


@register(
    "fn_parse_url",
    _PARSE_URL_ORACLE,
    category="scalar",
    doc="PARSE_URL -> VARIANT object (scheme/host/path/query/fragment "
        "subset) with colon-path extraction",
)
def fn_parse_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake PARSE_URL returns a VARIANT object; the dialect builds the
    JSON from Spark's per-part parse_url (JVM-side), so colon paths and
    GET_PATH work on the result like any VARIANT."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT o_orderkey AS k,
       PARSE_URL(u):scheme::STRING AS scheme,
       PARSE_URL(u):host::STRING AS host,
       PARSE_URL(u):path::STRING AS path,
       PARSE_URL(u):query::STRING AS query
FROM (SELECT o_orderkey,
             'https://shop' || (o_custkey % 5) || '.example.com/orders/' || o_orderkey
             || '?p=' || (o_custkey % 9) AS u
      FROM orders) t
ORDER BY k LIMIT 100"""
    )


_DOMAIN_STATS_ORACLE = """WITH u AS (
  SELECT 's' || (user_id % 7) || '.domain' || (user_id % 5) || '.org' AS host,
         value
  FROM events),
d AS (
  SELECT array_to_string(h[greatest(len(h) - 1, 1):], '.') AS domain, value
  FROM (SELECT string_split(host, '.') AS h, value FROM u) t)
SELECT domain, CAST(count(*) AS BIGINT) AS n_pages,
       round(CAST(CAST(sum(CAST(value AS DECIMAL(28,6))) AS STRING) AS DOUBLE), 4) AS total_value
FROM d GROUP BY domain ORDER BY domain"""


@register(
    "corpus_domain_stats",
    _DOMAIN_STATS_ORACLE,
    category="text",
    doc="registered-domain rollup (last two host labels) — the CCNet/"
        "RefinedWeb URL-filtering aggregation, pure codegen",
)
def corpus_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level corpus statistics: host -> registered domain (last two
    labels) -> per-domain page counts and value sums. The web-corpus
    filtering step (blocklists, per-domain quotas) runs on exactly this
    rollup; one partial-aggregated shuffle on the domain."""
    from pyspark.sql import functions as F

    ev = spark.table("events")
    host = F.concat(
        F.lit("s"), (F.col("user_id") % 7).cast("string"),
        F.lit(".domain"), (F.col("user_id") % 5).cast("string"),
        F.lit(".org"),
    )
    labels = F.split(host, r"\.")
    domain = F.array_join(F.slice(labels, -2, 2), ".")
    return (
        ev.select(domain.alias("domain"), F.col("value"))
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_pages"),
            F.round(F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 4).alias("total_value"),
        )
        .orderBy("domain")
    )


@register(
    "fn_hll_mergeable",
    None,
    category="scalar",
    doc="Snowflake HLL_ACCUMULATE/HLL_COMBINE/HLL_ESTIMATE -> Spark "
        "DataSketches trio; rows-only (sketch internals aren't "
        "SQL-expressible); merged-equals-direct pinned by test",
)
def fn_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches, the distributed distinct-count pattern: each
    group builds a sketch (HLL_ACCUMULATE), sketches union LOSSLESSLY
    (HLL_COMBINE — register-wise max, so merged == one global sketch
    exactly), and the estimate reads out at the end. At 100 TB this is how
    COUNT(DISTINCT) decomposes: per-partition sketches shuffle KBs instead
    of the key universe. Verbatim Snowflake names through the engine."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT HLL_ESTIMATE(HLL_COMBINE(sk)) AS merged_est,
       (SELECT HLL_ESTIMATE(HLL_ACCUMULATE(o_custkey)) FROM orders) AS direct_est,
       (SELECT HLL(o_custkey) FROM orders) AS hllpp_est
FROM (SELECT o_orderpriority, HLL_ACCUMULATE(o_custkey) AS sk
      FROM orders GROUP BY o_orderpriority)"""
    )


# ---------------------------------------------------------------------------
# continuation ring 2: TOP/GROUP BY ALL/MEDIAN/MODE/WIDTH_BUCKET, higher-order
# lambdas + array mutation, datetime construction from parts
# ---------------------------------------------------------------------------

_SYNTAX_EXT_ORACLE = """SELECT o_orderpriority AS prio,
       count(*) AS c,
       median(o_totalprice) AS med_price,
       mode(CASE WHEN o_orderstatus = 'P' THEN 'pending' ELSE 'settled' END) AS common_status,
       CAST(CASE WHEN max(o_totalprice) < 0 THEN 0
                 WHEN max(o_totalprice) >= 600000 THEN 13
                 ELSE FLOOR(max(o_totalprice) / 50000) + 1 END AS BIGINT) AS bucket_of_max
FROM orders
GROUP BY ALL
ORDER BY prio
LIMIT 4"""


@register(
    "fn_syntax_ext",
    _SYNTAX_EXT_ORACLE,
    category="scalar",
    doc="SELECT TOP n, GROUP BY ALL, MEDIAN, MODE, WIDTH_BUCKET — verbatim "
        "Snowflake through the dialect layer",
)
def fn_syntax_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake query-syntax ring a real client hits next: `SELECT TOP n`
    (rewritten to LIMIT at the SELECT's own block edge), `GROUP BY ALL`
    (native in Spark 4 and DuckDB), MEDIAN/MODE aggregates, WIDTH_BUCKET
    histogramming (oracle states the bucket arithmetic explicitly — DuckDB
    1.0 has no width_bucket). MODE input is constructed so one value
    strictly dominates per group (tie order is engine-defined in both)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT TOP 4 o_orderpriority AS prio,
       count(*) AS c,
       MEDIAN(o_totalprice) AS med_price,
       MODE(IFF(o_orderstatus = 'P', 'pending', 'settled')) AS common_status,
       WIDTH_BUCKET(MAX(o_totalprice), 0, 600000, 12) AS bucket_of_max
FROM orders
GROUP BY ALL
ORDER BY prio"""
    )


# Registry convention #5 (arrays rule, VERDICT r3 #1): oracled specs never
# emit raw array/map/struct OUTPUT columns — the driver's canonicalizer
# (pandas sort_values) cannot hash lists. Serialize with to_json on BOTH
# sides; Spark's to_json(array<bigint>) and DuckDB's to_json(list) agree
# byte-for-byte on numeric lists ("[1,2]").
_HOF_ORACLE = """SELECT n_nationkey AS k,
       to_json(list_filter([n_nationkey, n_regionkey, n_nationkey + 10], x -> x % 2 = 0)) AS evens,
       to_json(list_transform([n_nationkey, n_regionkey], x -> x * x)) AS squares,
       list_reduce(list_prepend(100, [n_nationkey, n_regionkey]), (a, x) -> a + x) AS total,
       to_json(list_sort([n_regionkey, n_nationkey % 7, 3])) AS sorted_arr,
       to_json(array_append([n_nationkey], n_regionkey)) AS appended,
       to_json(array_prepend(n_regionkey, [n_nationkey])) AS prepended,
       to_json(list_filter([n_nationkey, 2, n_nationkey], x -> x != 2)) AS removed,
       to_json(list_concat(([n_nationkey, n_regionkey, 7])[1:1],
                   ([n_nationkey, n_regionkey, 7])[3:3])) AS removed_at1
FROM nation ORDER BY k"""


@register(
    "fn_higher_order",
    _HOF_ORACLE,
    category="scalar",
    doc="higher-order lambdas FILTER/TRANSFORM/REDUCE + ARRAY_SORT and the "
        "ARRAY_APPEND/PREPEND/REMOVE/REMOVE_AT mutation surface",
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake higher-order functions (FILTER/TRANSFORM/REDUCE with `x ->`
    lambdas — Spark-native, whole-stage-codegen'd, no UDFs) plus the array
    mutation surface: ARRAY_APPEND/ARRAY_PREPEND (same arg order as Spark;
    DuckDB's array_prepend takes (elem, arr) — handled in the oracle text),
    ARRAY_REMOVE, and ARRAY_REMOVE_AT (0-based; slice-concat rewrite,
    dialect._rewrite_scalar_emulations_r3b)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT n_nationkey AS k,
       TO_JSON(FILTER(ARRAY_CONSTRUCT(n_nationkey, n_regionkey, n_nationkey + 10), x -> x % 2 = 0)) AS evens,
       TO_JSON(TRANSFORM(ARRAY_CONSTRUCT(n_nationkey, n_regionkey), x -> x * x)) AS squares,
       REDUCE(ARRAY_CONSTRUCT(n_nationkey, n_regionkey), 100, (a, x) -> a + x) AS total,
       TO_JSON(ARRAY_SORT(ARRAY_CONSTRUCT(n_regionkey, n_nationkey % 7, 3))) AS sorted_arr,
       TO_JSON(ARRAY_APPEND(ARRAY_CONSTRUCT(n_nationkey), n_regionkey)) AS appended,
       TO_JSON(ARRAY_PREPEND(ARRAY_CONSTRUCT(n_nationkey), n_regionkey)) AS prepended,
       TO_JSON(ARRAY_REMOVE(ARRAY_CONSTRUCT(n_nationkey, 2, n_nationkey), 2)) AS removed,
       TO_JSON(ARRAY_REMOVE_AT(ARRAY_CONSTRUCT(n_nationkey, n_regionkey, 7), 1)) AS removed_at1
FROM nation ORDER BY k"""
    )


_DT_PARTS_ORACLE = """SELECT e.event_id AS k,
       make_date(2020 + e.event_id % 5, 1 + e.event_id % 12, 1 + e.event_id % 28) AS d,
       strftime(make_timestamp(2024, 3, 15, e.event_id % 24, 30,
                               (e.event_id % 60) + 0.5), '%Y-%m-%d %H:%M:%S.%f') AS ts7,
       strftime(e.ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M') AS later,
       date_diff('minute', e.ts, e.ts + INTERVAL 1 DAY) AS mins,
       strftime(timezone('America/New_York', timezone('UTC', e.ts)),
                '%Y-%m-%d %H:%M') AS nyc
FROM events e ORDER BY k LIMIT 100"""


@register(
    "fn_datetime_parts",
    _DT_PARTS_ORACLE,
    category="scalar",
    doc="DATE_FROM_PARTS / 7-arg TIMESTAMP_FROM_PARTS (ns folded into "
        "fractional seconds) / TIMEADD / TIMESTAMPDIFF / CONVERT_TIMEZONE",
)
def fn_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime construction + zone conversion: DATE_FROM_PARTS ->
    make_date, TIMESTAMP_FROM_PARTS 7-arg nanosecond form -> make_timestamp
    with fractional-second folding, TIMEADD (DATEADD alias), TIMESTAMPDIFF,
    and 3-arg CONVERT_TIMEZONE (wall-clock NTZ conversion — native in Spark
    4; DuckDB oracle composes two timezone() hops). Outputs are formatted
    strings per convention #2 (no raw timestamps on the wire)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT e.event_id AS k,
       DATE_FROM_PARTS(2020 + e.event_id % 5, 1 + e.event_id % 12, 1 + e.event_id % 28) AS d,
       TO_VARCHAR(TIMESTAMP_FROM_PARTS(2024, 3, 15, e.event_id % 24, 30,
                                       e.event_id % 60, 500000000),
                  'YYYY-MM-DD HH24:MI:SS.FF6') AS ts7,
       TO_VARCHAR(TIMEADD(minute, 90, e.ts), 'YYYY-MM-DD HH24:MI') AS later,
       TIMESTAMPDIFF(minute, e.ts, TIMEADD(day, 1, e.ts)) AS mins,
       TO_VARCHAR(CONVERT_TIMEZONE('UTC', 'America/New_York', e.ts),
                  'YYYY-MM-DD HH24:MI') AS nyc
FROM events e ORDER BY k LIMIT 100"""
    )


_OBJ_OPS_ORACLE = """SELECT event_id,
       CAST(json_merge_patch(props, json_object('etype', event_type)) AS VARCHAR) AS with_type,
       CAST(json_merge_patch(props, json_object('k', event_id)) AS VARCHAR) AS k_updated,
       CAST(json_merge_patch(json_merge_patch(props, '{"tmp":1}'),
                             '{"tmp":null,"k":null}') AS VARCHAR) AS emptied,
       CAST(json_object('k', props->'k') AS VARCHAR) AS only_k
FROM events ORDER BY event_id LIMIT 100"""


@register(
    "fn_object_ops",
    _OBJ_OPS_ORACLE,
    category="variant",
    doc="OBJECT_INSERT (insert/upsert/duplicate-key error) / OBJECT_DELETE "
        "/ OBJECT_PICK over VARIANT objects — map<string,variant> "
        "round-trip, all JVM-side",
)
def fn_object_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-object manipulation surface: parse once to
    map<string,variant>, filter/concat, serialize back (no Python, no
    string surgery — Jackson + codegen'd map ops). Insertion-order key
    output; 3-arg OBJECT_INSERT raises on duplicate keys like Snowflake
    (dialect._rewrite_scalar_emulations_r3b)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT event_id,
       OBJECT_INSERT(props, 'etype', event_type) AS with_type,
       OBJECT_INSERT(props, 'k', event_id, TRUE) AS k_updated,
       OBJECT_DELETE(OBJECT_INSERT(props, 'tmp', 1), 'tmp', 'k') AS emptied,
       OBJECT_PICK(OBJECT_INSERT(props, 'u', user_id), 'k') AS only_k
FROM events ORDER BY event_id LIMIT 100"""
    )


_BITS_ORACLE = """SELECT n_nationkey AS k,
       (n_nationkey = n_regionkey) OR (n_nationkey IS NULL AND n_regionkey IS NULL) AS eqn,
       CAST(n_nationkey * 4 AS BIGINT) AS shl,
       CAST(n_nationkey // 2 AS BIGINT) AS shr,
       CAST(n_nationkey & 5 AS BIGINT) AS band,
       CAST(n_nationkey | 8 AS BIGINT) AS bor,
       CAST(xor(n_nationkey, 3) AS BIGINT) AS bxor,
       CAST((n_nationkey // 4) & 1 AS BIGINT) AS bit2
FROM nation ORDER BY k"""


@register(
    "fn_bitwise_ext",
    _BITS_ORACLE,
    category="scalar",
    doc="EQUAL_NULL + scalar BITSHIFTLEFT/RIGHT, BITAND/BITOR/BITXOR, "
        "GETBIT — verbatim Snowflake through the dialect layer",
)
def fn_bitwise_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar bitwise surface (Spark's BIT* names are aggregates, so the
    scalar forms rewrite to operators) + EQUAL_NULL null-safe equality
    (-> Spark's <=>). Oracle states the same values with DuckDB arithmetic
    (shifts as *4 and //2 on the small key domain)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT n_nationkey AS k,
       EQUAL_NULL(n_nationkey, n_regionkey) AS eqn,
       CAST(BITSHIFTLEFT(n_nationkey, 2) AS BIGINT) AS shl,
       CAST(BITSHIFTRIGHT(n_nationkey, 1) AS BIGINT) AS shr,
       CAST(BITAND(n_nationkey, 5) AS BIGINT) AS band,
       CAST(BITOR(n_nationkey, 8) AS BIGINT) AS bor,
       CAST(BITXOR(n_nationkey, 3) AS BIGINT) AS bxor,
       CAST(GETBIT(n_nationkey, 2) AS BIGINT) AS bit2
FROM nation ORDER BY k"""
    )


_FUZZY_ORACLE = """SELECT n_nationkey AS k,
       CAST(floor(jaro_winkler_similarity(lower(n_name), 'nation_1') * 100) AS INT) AS jw,
       CAST(floor(jaro_winkler_similarity(lower(n_name || 'xxxxxx'),
                                          lower(substr(n_name, 1, 3) || 'zzzzzzzzz')) * 100) AS INT) AS jw_low,
       CAST(levenshtein(n_name, 'NATION_1') AS INT) AS ed,
       list_filter(string_split_regex(n_name, '[_]'), x -> x != '')[2] AS tok2,
       format('{:,}', CAST(floor(round(n_nationkey * 1234.5, 2)) AS BIGINT))
         || '.' || lpad(CAST(CAST(round((round(n_nationkey * 1234.5, 2) % 1) * 100) AS BIGINT) AS VARCHAR), 2, '0') AS amt,
       '$' || format('{:,}', CAST(floor(round(n_nationkey * 1234.5, 2)) AS BIGINT))
         || '.' || lpad(CAST(CAST(round((round(n_nationkey * 1234.5, 2) % 1) * 100) AS BIGINT) AS VARCHAR), 2, '0') AS usd,
       lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded,
       (n_nationkey <> 0) AND (n_regionkey <> 0) AS b_and,
       (n_nationkey <> 0) OR (n_regionkey <> 0) AS b_or,
       (n_nationkey <> 0) <> (n_regionkey <> 0) AS b_xor,
       NOT (n_regionkey <> 0) AS b_not
FROM nation ORDER BY k"""


@register(
    "fn_fuzzy_scalar_ext",
    _FUZZY_ORACLE,
    category="scalar",
    doc="r4 probe-driven surface: JAROWINKLER_SIMILARITY (Arrow pandas "
        "UDF), EDITDISTANCE, STRTOK, TO_CHAR numeric formats, "
        "BOOLAND/BOOLOR/BOOLXOR/BOOLNOT",
)
def fn_fuzzy_scalar_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-matching + token/format scalar surface, verbatim Snowflake
    through the dialect layer. JAROWINKLER_SIMILARITY is the one
    deliberate pandas-UDF case (no JVM builtin; Arrow-batched, never
    row-at-a-time); DuckDB's native jaro_winkler_similarity supplies the
    oracle (floor(x*100) matches Snowflake's 0-100 integer convention).
    TO_CHAR's numeric formats rewrite to format_number/lpad
    (dialect._rewrite_scalar_emulations_r4)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT n_nationkey AS k,
       JAROWINKLER_SIMILARITY(n_name, 'NATION_1') AS jw,
       JAROWINKLER_SIMILARITY(n_name || 'xxxxxx', SUBSTR(n_name, 1, 3) || 'zzzzzzzzz') AS jw_low,
       EDITDISTANCE(n_name, 'NATION_1') AS ed,
       STRTOK(n_name, '_', 2) AS tok2,
       TO_CHAR(n_nationkey * 1234.5, '999,999.99') AS amt,
       TO_CHAR(n_nationkey * 1234.5, '$999,999.99') AS usd,
       TO_CHAR(n_nationkey, '0000') AS padded,
       BOOLAND(n_nationkey, n_regionkey) AS b_and,
       BOOLOR(n_nationkey, n_regionkey) AS b_or,
       BOOLXOR(n_nationkey, n_regionkey) AS b_xor,
       BOOLNOT(n_regionkey) AS b_not
FROM nation ORDER BY k"""
    )


_SKETCH_ORACLE = """SELECT CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n_seq,
       CAST(1.0 AS DOUBLE) AS sim_same,
       CAST((SELECT COUNT(*) FROM nation) AS BIGINT) AS n_ci,
       CAST(4 AS INT) AS diff_self"""


@register(
    "fn_sketch_seq_collate",
    _SKETCH_ORACLE,
    category="scalar",
    doc="r5 probe-driven surface: MINHASH/APPROXIMATE_JACCARD_INDEX sketch "
        "aggregates, SEQ8, COLLATE 'en-ci', DIFFERENCE — gated on their "
        "hash-invariant contracts",
)
def fn_sketch_seq_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch/sequence/collation surface, verbatim Snowflake through the
    dialect layer (dialect._rewrite_scalar_emulations_r5). The MINHASH hash
    family is engine-local (Snowflake's is proprietary), so the oracle
    states the hash-INVARIANT contracts: identical corpora estimate
    similarity exactly 1.0, SEQ8 is unique per row, case-insensitive
    collation equates the case-folded names, DIFFERENCE(x, x) = 4. The
    estimator's accuracy on partial overlap is bounded in
    tests/test_engine.py::test_minhash_estimator_accuracy."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT
  (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) FROM (SELECT SEQ8() AS s FROM nation)) AS n_seq,
  (SELECT ROUND(APPROXIMATE_JACCARD_INDEX(mh), 4) FROM (
     SELECT MINHASH(16, n_name) AS mh FROM nation
     UNION ALL SELECT MINHASH(16, n_name) FROM nation)) AS sim_same,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM nation
   WHERE n_name = lower(n_name) COLLATE 'en-ci') AS n_ci,
  (SELECT CAST(DIFFERENCE(n_name, n_name) AS INT) FROM nation WHERE n_nationkey = 0) AS diff_self"""
    )


_DTPARTS_ORACLE = """WITH d AS (
  SELECT n_nationkey AS k,
         CAST(DATE '2024-01-01' + ((n_nationkey - 1) * INTERVAL 1 MONTH) AS DATE) AS dfp
  FROM nation)
SELECT k, dfp,
       CAST(date_trunc('quarter', dfp) + INTERVAL 3 MONTH - INTERVAL 1 DAY AS DATE) AS ld_q,
       CAST(isoyear(dfp) AS INT) AS isoy,
       CAST(week(dfp) AS INT) AS wk,
       CAST(dfp + INTERVAL 3 MONTH AS DATE) AS plus_q
FROM d ORDER BY k"""


@register(
    "fn_datetime_parts_ext",
    _DTPARTS_ORACLE,
    category="scalar",
    doc="r5 probe-driven datetime surface: DATE_FROM_PARTS out-of-range "
        "normalization, 2-arg LAST_DAY, YEAROFWEEKISO/WEEKISO, quoted "
        "DATEADD units",
)
def fn_datetime_parts_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime-part surface, verbatim Snowflake through the dialect layer
    (dialect._rewrite_scalar_emulations_r5). DATE_FROM_PARTS(2024, k, 1)
    exercises months 0..24 — Snowflake rolls out-of-range parts across
    years (month 0 = previous December), which the anchor-plus-offset
    rewrite reproduces where ANSI make_date would fault. The oracle states
    the same dates with DuckDB interval arithmetic and isoyear/week."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT n_nationkey AS k,
       DATE_FROM_PARTS(2024, n_nationkey, 1) AS dfp,
       LAST_DAY(DATE_FROM_PARTS(2024, n_nationkey, 1), 'quarter') AS ld_q,
       YEAROFWEEKISO(DATE_FROM_PARTS(2024, n_nationkey, 1)) AS isoy,
       WEEKISO(DATE_FROM_PARTS(2024, n_nationkey, 1)) AS wk,
       CAST(DATEADD('quarter', 1, DATE_FROM_PARTS(2024, n_nationkey, 1)) AS DATE) AS plus_q
FROM nation ORDER BY k"""
    )


_REGEXP_EXT_ORACLE = r"""SELECT n_nationkey AS k,
       regexp_replace(n_name, '^((?:[^AEIOU]*[AEIOU]){1}[^AEIOU]*)[AEIOU]', '\1#') AS rr2,
       list_extract(regexp_extract_all(n_name, '[A-Z0-9]+'), 2) AS rs2,
       regexp_extract(n_name, '([A-Z]+)_([0-9]+)', 2) AS rsg
FROM nation ORDER BY k"""


@register(
    "fn_regexp_occurrence_ext",
    _REGEXP_EXT_ORACLE,
    category="scalar",
    doc="r5 probe-driven regexp surface: REGEXP_REPLACE with occurrence "
        "selection, REGEXP_SUBSTR with position/occurrence/params/group",
)
def fn_regexp_occurrence_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occurrence-aware regexp surface, verbatim Snowflake through the
    dialect layer (dialect._rewrite_scalar_emulations_r5): the Nth-match
    REGEXP_REPLACE rebuilds the string from split() segments +
    regexp_extract_all matches (pure JVM builtins); REGEXP_SUBSTR's
    long-form args map onto regexp_extract_all + try_element_at. The
    DuckDB oracle derives the same values independently (vowel-skipping
    regex with a backreference; list_extract over extract_all)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT n_nationkey AS k,
       REGEXP_REPLACE(n_name, '[AEIOU]', '#', 1, 2) AS rr2,
       REGEXP_SUBSTR(n_name, '[A-Z0-9]+', 1, 2) AS rs2,
       REGEXP_SUBSTR(n_name, '([A-Z]+)_([0-9]+)', 1, 1, 'e', 2) AS rsg
FROM nation ORDER BY k"""
    )


# Decimals ride to the result edge as scale-preserving text (see the
# types_cast_gallery result-edge convention note above).
_CONVERT_ORACLE = """SELECT n_nationkey AS k,
       CAST(CAST(CAST(n_nationkey * 1.5 AS VARCHAR) AS DECIMAL(10,2)) AS VARCHAR) AS tn,
       to_json(n_name) AS tv,
       CAST(CAST('1234.56' AS DECIMAL(38,2)) AS VARCHAR) AS tn2,
       '13:45:30' AS tt
FROM nation ORDER BY k"""


@register(
    "fn_conversion_ext",
    _CONVERT_ORACLE,
    category="scalar",
    doc="r5 probe-driven conversion surface: TO_NUMBER precision/scale and "
        "format forms, TO_VARIANT JSON-text encoding, TO_TIME",
)
def fn_conversion_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion long forms, verbatim Snowflake through the dialect layer
    (dialect._rewrite_scalar_emulations_r5): TO_NUMBER(x, p, s) casts,
    TO_NUMBER(x, 'fmt') strips the grouping characters the format
    licenses, TO_VARIANT JSON-encodes any value (matching DuckDB's
    to_json), TO_TIME yields the canonical HH:mm:ss string."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT n_nationkey AS k,
       CAST(TO_NUMBER(CAST(n_nationkey * 1.5 AS STRING), 10, 2) AS STRING) AS tn,
       TO_VARIANT(n_name) AS tv,
       CAST(TO_NUMBER('1,234.56', '999,999.99') AS STRING) AS tn2,
       TO_TIME('13:45:30') AS tt
FROM nation ORDER BY k"""
    )


register_sql(
    "agg_percentile_within_group",
    """SELECT l_returnflag,
       round(CAST(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE), 4) AS p50_cont,
       round(CAST(PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE), 4) AS p25_cont,
       CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE) AS p50_disc,
       CAST(MEDIAN(l_quantity) AS DOUBLE) AS med,
       round(CAST(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE), 4) AS p90_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    category="aggregate",
    doc="ordered-set aggregates: PERCENTILE_CONT (interpolated) / "
        "PERCENTILE_DISC (order statistic) WITHIN GROUP + MEDIAN — "
        "identical ANSI syntax on both engines; interpolation over sorted "
        "order statistics is order-insensitive, so doubles compare exactly",
)

register_sql(
    "agg_grouping_id",
    """SELECT l_returnflag, l_linestatus,
       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    category="grouping",
    doc="GROUPING_ID bitmask (companion to the per-column GROUPING flags "
        "of agg_rollup_grouping_fn): same bit order in Spark and DuckDB",
)

register_sql(
    "fn_pattern_quantified",
    """SELECT n_name,
       n_name LIKE ANY ('NATION_1%', 'NATION_2%') AS like_any,
       n_name ILIKE ANY ('nation_1%', 'nation_22') AS ilike_any,
       n_name LIKE ALL ('NATION%', '%2%') AS like_all
FROM nation ORDER BY n_name""",
    oracle="""SELECT n_name,
       (n_name LIKE 'NATION_1%' OR n_name LIKE 'NATION_2%') AS like_any,
       (n_name ILIKE 'nation_1%' OR n_name ILIKE 'nation_22') AS ilike_any,
       (n_name LIKE 'NATION%' AND n_name LIKE '%2%') AS like_all
FROM nation ORDER BY n_name""",
    category="function",
    doc="quantified pattern predicates LIKE ANY / ILIKE ANY / LIKE ALL "
        "(Snowflake + Spark native syntax; DuckDB oracle expands to OR/AND)",
)


register_sql(
    "agg_regr_family",
    """SELECT l_returnflag AS flag,
       CAST(ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS DOUBLE) AS slope,
       CAST(ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 6) AS DOUBLE) AS icept,
       CAST(ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS DOUBLE) AS r2,
       CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n,
       CAST(ROUND(REGR_AVGX(l_extendedprice, l_quantity), 6) AS DOUBLE) AS ax,
       CAST(ROUND(REGR_AVGY(l_extendedprice, l_quantity), 6) AS DOUBLE) AS ay,
       CAST(ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS DOUBLE) AS cv
FROM lineitem GROUP BY l_returnflag ORDER BY flag""",
    category="agg",
    doc="linear-regression aggregate family (REGR_SLOPE/INTERCEPT/R2/COUNT/"
        "AVGX/AVGY + COVAR_SAMP) — Snowflake surface, native in Spark and "
        "DuckDB; rounded like agg_stats (moment sums are FP-order "
        "sensitive), one partial-agg pass",
)


_REGEXP_INSTR_ORACLE = """SELECT doc_id,
       CAST(len(regexp_extract_all(substr(text, 5), '[aeiou]+')) AS INT) AS cnt5,
       CAST(CASE WHEN len(regexp_extract_all(text, '[aeiou]+')) < 3 THEN 0 ELSE
         length(str_split_regex(text, '[aeiou]+')[1])
       + length(regexp_extract_all(text, '[aeiou]+')[1])
       + length(str_split_regex(text, '[aeiou]+')[2])
       + length(regexp_extract_all(text, '[aeiou]+')[2])
       + length(str_split_regex(text, '[aeiou]+')[3]) + 1 END AS INT) AS in3,
       CAST(CASE WHEN len(regexp_extract_all(text, '[aeiou]+')) < 3 THEN 0 ELSE
         length(str_split_regex(text, '[aeiou]+')[1])
       + length(regexp_extract_all(text, '[aeiou]+')[1])
       + length(str_split_regex(text, '[aeiou]+')[2])
       + length(regexp_extract_all(text, '[aeiou]+')[2])
       + length(str_split_regex(text, '[aeiou]+')[3]) + 1
       + length(regexp_extract_all(text, '[aeiou]+')[3]) END AS INT) AS in3e,
       CAST(CASE WHEN len(regexp_extract_all(text, 'zq7xx')) < 1 THEN 0 ELSE 1 END AS INT) AS in_none,
       text AS rt
FROM documents ORDER BY doc_id"""


@register(
    "fn_regexp_instr_count",
    _REGEXP_INSTR_ORACLE,
    category="scalar",
    doc="REGEXP_COUNT with position, REGEXP_INSTR with position/occurrence/"
        "option (0=start, 1=end), TRY_BASE64_DECODE_STRING round-trip — "
        "r6 dialect additions over real corpus text",
)
def fn_regexp_instr_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position/occurrence regexp location surface, verbatim Snowflake
    through the dialect layer: REGEXP_INSTR's 3rd arg is the search
    POSITION (Spark's native 3-arg form means group index, so long forms
    rewrite to the split()/extract_all position arithmetic — the same
    decomposition as occurrence-N REGEXP_REPLACE); REGEXP_COUNT gains its
    position arg via substr. TRY_BASE64_DECODE_STRING(BASE64_ENCODE(text))
    round-trips the corpus through try_to_binary. The DuckDB oracle
    derives the same positions independently from str_split_regex /
    regexp_extract_all prefix sums."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT doc_id,
       CAST(REGEXP_COUNT(text, '[aeiou]+', 5) AS INT) AS cnt5,
       CAST(REGEXP_INSTR(text, '[aeiou]+', 1, 3) AS INT) AS in3,
       CAST(REGEXP_INSTR(text, '[aeiou]+', 1, 3, 1) AS INT) AS in3e,
       CAST(REGEXP_INSTR(text, 'zq7xx', 1, 1) AS INT) AS in_none,
       TRY_BASE64_DECODE_STRING(BASE64_ENCODE(text)) AS rt
FROM documents ORDER BY doc_id"""
    )


_NUMDT_EXT_ORACLE = """SELECT n_nationkey AS k,
       CAST(CASE WHEN n_nationkey >= 25 THEN 6 ELSE CAST(floor(n_nationkey / 5.0) AS INT) + 1 END AS INT) AS wb,
       CAST(n_nationkey AS DOUBLE) AS mb
FROM nation ORDER BY k"""


@register(
    "fn_width_bucket_months",
    _NUMDT_EXT_ORACLE,
    category="scalar",
    doc="WIDTH_BUCKET (native passthrough) and MONTHS_BETWEEN over a "
        "varying date lattice — Snowflake surface verified against "
        "independent DuckDB bucket arithmetic",
)
def fn_width_bucket_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WIDTH_BUCKET(v, 0, 25, 5) (Spark-native; the oracle restates the
    bucket function as explicit floor arithmetic incl. the v >= max ->
    n+1 overflow bucket) and MONTHS_BETWEEN over same-day-of-month pairs
    (exact integers by definition — no 31-day-fraction FP edge)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT n_nationkey AS k,
       CAST(WIDTH_BUCKET(n_nationkey, 0, 25, 5) AS INT) AS wb,
       CAST(MONTHS_BETWEEN(DATEADD(month, n_nationkey, '2024-01-15'::date), '2024-01-15'::date) AS DOUBLE) AS mb
FROM nation ORDER BY k"""
    )


_BITMAP_DISTINCT_ORACLE = """SELECT o_orderpriority AS pri,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd,
       (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders) AS nd_total
FROM orders GROUP BY pri ORDER BY pri"""


@register(
    "agg_bitmap_distinct",
    _BITMAP_DISTINCT_ORACLE,
    category="agg",
    doc="BITMAP_BUCKET_NUMBER / BITMAP_BIT_POSITION / BITMAP_CONSTRUCT_AGG / "
        "BITMAP_OR_AGG / BITMAP_COUNT — Snowflake's precomputed "
        "count-distinct rollup pattern; the oracle is the EXACT "
        "COUNT(DISTINCT) the bitmap algebra must reproduce",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake's bitmap count-distinct family end-to-end (the documented
    rollup-table pattern): the value domain splits into 32768-value buckets
    (BITMAP_BUCKET_NUMBER/BIT_POSITION), one mergeable bitmap aggregates
    per (group, bucket) (BITMAP_CONSTRUCT_AGG), rollups merge bitmaps by
    OR (BITMAP_OR_AGG), and SUM(BITMAP_COUNT) over buckets is the exact
    distinct count. 100 TB shape: partial aggregation collapses each task
    to <= one bounded array per (group, bucket) — the facts are scanned
    once, every re-aggregation after that unions position sets instead of
    re-scanning. Our bitmap value is the sorted position-set array<int>
    (bounded at 32768 entries/bucket); Snowflake's is an opaque binary —
    same algebra, deterministic cross-engine. Reference parity:
    universql routes these to Snowflake/DuckDB natives (no local impl)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    # The production pattern is a MATERIALIZED rollup table (build bitmaps
    # once, query them many times). Spark inlines CTEs/temp views, which
    # would re-scan orders for every downstream reference — persist the
    # bitmap relation (bounded: |groups| x |buckets| rows) so the fact
    # table is scanned exactly once, the same convention as the minhash
    # signature index in operators/dedup.py.
    b = eng.execute_df(
        """SELECT o_orderpriority AS pri, BITMAP_BUCKET_NUMBER(o_custkey) AS bkt,
       BITMAP_CONSTRUCT_AGG(BITMAP_BIT_POSITION(o_custkey)) AS bmp
FROM orders GROUP BY pri, bkt"""
    ).persist()
    b.createOrReplaceTempView("bitmap_rollup")
    return eng.execute_df(
        """WITH m AS (SELECT bkt, BITMAP_OR_AGG(bmp) AS bmp FROM bitmap_rollup GROUP BY bkt)
SELECT pri, CAST(SUM(BITMAP_COUNT(bmp)) AS BIGINT) AS nd,
       (SELECT CAST(SUM(BITMAP_COUNT(bmp)) AS BIGINT) FROM m) AS nd_total
FROM bitmap_rollup GROUP BY pri ORDER BY pri"""
    )


_PARSE_IP_MISC_ORACLE = """WITH ips AS (SELECT n_nationkey AS k,
  '10.' || CAST(n_nationkey AS VARCHAR) || '.' || CAST((n_nationkey * 7) % 256 AS VARCHAR)
   || '.' || CAST((n_nationkey * 13) % 256 AS VARCHAR) || '/' || CAST(8 + (n_nationkey % 17) AS VARCHAR) AS ip
  FROM nation),
p AS (SELECT k, ip,
  CAST(string_split(string_split(ip, '/')[1], '.')[1] AS BIGINT) * 16777216
  + CAST(string_split(string_split(ip, '/')[1], '.')[2] AS BIGINT) * 65536
  + CAST(string_split(string_split(ip, '/')[1], '.')[3] AS BIGINT) * 256
  + CAST(string_split(string_split(ip, '/')[1], '.')[4] AS BIGINT) AS ipv4,
  string_split(ip, '/')[1] AS host,
  CAST(string_split(ip, '/')[2] AS INT) AS pfx
  FROM ips)
SELECT k, ip, ipv4, host, pfx,
  CAST((ipv4 >> (32 - pfx)) << (32 - pfx) AS BIGINT) AS r0,
  CAST(((ipv4 >> (32 - pfx)) << (32 - pfx)) + (CAST(1 AS BIGINT) << (32 - pfx)) - 1 AS BIGINT) AS r1,
  substr('abcdefg', 1, 2) || 'XY' || substr('abcdefg', 5) AS ins,
  CAST(length(rtrim('  pad  ')) AS INT) AS rtl,
  CAST(factorial(CAST(k % 11 AS INT)) AS BIGINT) AS fact,
  CAST(ROUND(2*6371*asin(sqrt(power(sin(radians(34.0500 - 40.7127)/2), 2)
    + cos(radians(40.7127))*cos(radians(34.0500))*power(sin(radians(-118.2500 - -74.0059)/2), 2))), 4) AS DOUBLE) AS hav
FROM p ORDER BY k"""


@register(
    "fn_parse_ip_misc",
    _PARSE_IP_MISC_ORACLE,
    category="scalar",
    doc="PARSE_IP (IPv4/CIDR -> VARIANT: ipv4 int, host, prefix, exact "
        "range bounds via 64-bit shifts), INSERT-as-string-function, "
        "RTRIMMED_LENGTH, FACTORIAL, HAVERSINE — oracle restates the "
        "octet/shift arithmetic independently in DuckDB",
)
def fn_parse_ip_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-r6 scalar surface, verbatim Snowflake through the dialect
    layer. PARSE_IP returns the VARIANT object (JSON text) and the spec
    extracts ipv4/host/prefix/range fields by colon path — the oracle
    re-derives each from string_split octets and >> << shifts (exact at
    32 bits in BIGINT). INSERT exercises the THEN-guarded rewrite (the
    same pass must NOT touch MERGE column lists — pinned in
    test_engine). HAVERSINE uses the R=6371 great-circle formula on both
    engines; rounded to 4dp."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """WITH ips AS (SELECT n_nationkey AS k,
  '10.' || CAST(n_nationkey AS VARCHAR) || '.' || CAST((n_nationkey * 7) % 256 AS VARCHAR)
   || '.' || CAST((n_nationkey * 13) % 256 AS VARCHAR) || '/' || CAST(8 + (n_nationkey % 17) AS VARCHAR) AS ip
  FROM nation)
SELECT k, ip,
  CAST(PARSE_IP(ip, 'INET'):ipv4 AS BIGINT) AS ipv4,
  CAST(PARSE_IP(ip, 'INET'):host AS VARCHAR) AS host,
  CAST(PARSE_IP(ip, 'INET'):netmask_prefix_length AS INT) AS pfx,
  CAST(PARSE_IP(ip, 'INET'):ipv4_range_start AS BIGINT) AS r0,
  CAST(PARSE_IP(ip, 'INET'):ipv4_range_end AS BIGINT) AS r1,
  INSERT('abcdefg', 3, 2, 'XY') AS ins,
  CAST(RTRIMMED_LENGTH('  pad  ') AS INT) AS rtl,
  CAST(FACTORIAL(CAST(k % 11 AS INT)) AS BIGINT) AS fact,
  CAST(ROUND(HAVERSINE(40.7127, -74.0059, 34.0500, -118.2500), 4) AS DOUBLE) AS hav
FROM ips ORDER BY k"""
    )
