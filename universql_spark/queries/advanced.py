"""Advanced operator specs: as-of join, range join, pivot, ordered string
agg, exact percentiles, correlation — plus approximate aggregates (rows-only:
sketch implementations differ by engine by construction)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from universql_spark.operators import temporal
from universql_spark.queries.golden_oracles import GOLDEN
from universql_spark.queries import register, register_sql
from universql_spark.queries.clickbench import dsum

# ---------------------------------------------------------------------------
# as-of join — Spark: union+window operator; oracle: DuckDB native ASOF JOIN
# ---------------------------------------------------------------------------

_ASOF_ORACLE = """WITH p AS (
  SELECT user_id, ts, event_id AS p_event_id, value AS p_value
  FROM events WHERE event_type = 'purchase'
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type IN ('click', 'view'))
SELECT l.event_id, p.p_event_id, p.p_value
FROM l ASOF LEFT JOIN p ON l.user_id = p.user_id AND l.ts >= p.ts
ORDER BY l.event_id"""


@register("join_asof", _ASOF_ORACLE, bench=True, category="temporal")
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click/view, the user's most recent purchase at or before it.
    Both sides are subsets of ONE table, so this uses the colocated
    formulation (temporal.asof_join_colocated): one scan + ONE window
    exchange on user_id — the event_id tiebreak makes the running last()
    resolve equal-(user, ts) purchases to the max event_id, so the oracle's
    QUALIFY dedup costs no extra window. (The two-DataFrame asof_join
    remains for genuinely distinct inputs.) Oracle: DuckDB native ASOF
    LEFT JOIN. No final ORDER BY — the gate compares order-insensitively
    and a global sort is a pure extra exchange at any scale. Built via the
    SQL-rendered twin (asof_join_colocated_sql): identical plan, one
    spark.sql call instead of ~0.4 s of DataFrame-API plumbing per replan
    (plan-pinned by tests/test_plans.py::test_asof_single_shuffle...)."""
    return temporal.asof_join_colocated_sql(
        spark,
        "events",
        right_pred="event_type = 'purchase'",
        left_pred="event_type IN ('click', 'view')",
        key="user_id",
        ts="ts",
        payload={"p_event_id": "event_id", "p_value": "value"},
        tiebreak=["event_id"],
        carry=["event_id", "value"],
        select=["event_id", "p_event_id", "p_value"],
    )


register_sql(
    "join_range_interval",
    """SELECT s.event_id AS signup_id, p.event_id AS purchase_id
FROM events s JOIN events p
  ON s.user_id = p.user_id AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 30 MINUTE
WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
ORDER BY signup_id, purchase_id""",
    category="temporal",
    doc="interval/range join: purchases within 30 min after a signup",
)

# ---------------------------------------------------------------------------
# pivot / unpivot-ish
# ---------------------------------------------------------------------------


@register(
    "agg_pivot",
    f"""SELECT l_returnflag,
       {dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END")} AS qty_o,
       {dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END")} AS qty_f
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    category="grouping",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT on l_linestatus (DataFrame .pivot with explicit values — explicit
    values keep the plan single-pass, no distinct-scan to discover columns);
    oracle is the equivalent conditional aggregation."""
    li = spark.table("lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.expr("CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS STRING) AS DOUBLE)"))
        .select(
            "l_returnflag",
            F.coalesce(F.col("O"), F.lit(0.0)).alias("qty_o"),
            F.coalesce(F.col("F"), F.lit(0.0)).alias("qty_f"),
        )
        .orderBy("l_returnflag")
    )
    return out


register_sql(
    "agg_string_ordered",
    """SELECT n_regionkey,
       array_join(array_sort(collect_list(n_name)), ',') AS names
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    oracle="""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    category="agg",
    doc="LISTAGG/STRING_AGG with deterministic ordering",
)

register_sql(
    "agg_percentiles",
    """SELECT l_returnflag,
       CAST(percentile(l_quantity, 0.5) AS DOUBLE) AS p50,
       CAST(percentile(l_quantity, 0.9) AS DOUBLE) AS p90
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    oracle="""SELECT l_returnflag,
       CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS p50,
       CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS p90
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    category="agg",
    doc="exact interpolated percentiles (both engines: linear interpolation)",
)

register_sql(
    "agg_corr",
    """SELECT l_returnflag,
       CAST(ROUND(corr(l_quantity, l_extendedprice), 6) AS DOUBLE) AS c,
       CAST(ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS DOUBLE) AS cv
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    category="agg",
    doc="correlation/covariance (rounded: co-moment accumulation is FP-order sensitive)",
)


@register(
    "agg_salted_sum",
    """SELECT event_type, CAST(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS STRING) AS DOUBLE) AS total,
       COUNT(*) AS total_count
FROM events GROUP BY event_type ORDER BY event_type""",
    category="agg",
)
def agg_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase salted SUM (operators/scale.py) — the oracle is
    the plain GROUP BY, proving the decomposition is exact."""
    from universql_spark.operators import scale

    out = scale.salted_sum(
        spark.table("events"),
        "event_type",
        F.expr("CAST(value AS DECIMAL(28,6))"),
        "total",
        salt_source="event_id",
    )
    return out.select(
        "event_type", F.col("total").cast("double").alias("total"), "total_count"
    ).orderBy("event_type")


@register("embed_kmeans", GOLDEN["embed_kmeans"], category="similarity")
def embed_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means(8, 4 iters) cluster assignments over the embeddings — an
    iterative algorithm (not SQL-derivable; the driver oracle is a
    golden-value pin of the independent numpy Lloyd re-derivation,
    tools_golden_oracles.py provenance chain; tests assert monotone
    inertia + full coverage)."""
    from universql_spark.operators import cluster

    out, _ = cluster.kmeans(spark.table("embeddings"), k=8, iters=4)
    return out


@register("agg_approx_distinct", None, category="agg")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — rows-only check by construction
    (sketches differ across engines); tests bound the relative error."""
    return spark.table("lineitem").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@register("agg_approx_quantile", None, category="agg")
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx sketch — rows-only (engine-specific sketch)."""
    return spark.table("orders").agg(
        F.percentile_approx("o_totalprice", 0.5, 1000).alias("p50_approx")
    )


@register("sample_reservoir", None, category="sampling")
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded TABLESAMPLE (the reference ships a disabled reservoir-sample
    rewrite, plugins/snow.py:843-856). Sampling is engine-specific ->
    rows-only; the test bounds the fraction."""
    return spark.table("lineitem").sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# semi-structured (VARIANT-as-JSON-text) access — Snowflake colon paths
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """SELECT event_type AS etype,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS c
FROM events GROUP BY event_type ORDER BY etype"""


@register("adv_variant_colon_path", _VARIANT_ORACLE, category="variant")
def adv_variant_colon_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake `props:k::bigint` colon-path access through the dialect
    layer (dialect._rewrite_colon_paths -> get_json_object; VARIANT is JSON
    text per the reference's own mapping, duckdb.py:443-444). The JSON
    extraction runs JVM-side (Jackson), aggregated in one partial-agg pass —
    no Python in the path."""
    from universql_spark.dialect import snowflake_to_spark

    return spark.sql(
        snowflake_to_spark(
            "SELECT event_type AS etype, SUM(props:k::bigint) AS sum_k, COUNT(*) AS c "
            "FROM events GROUP BY event_type ORDER BY etype"
        )
    )


_CONST_LIT_ORACLE = """SELECT n_nationkey AS k,
       to_json({'key': n_regionkey, 'tags': [n_nationkey, n_nationkey + 1]}) AS obj,
       to_json([n_regionkey, 2, 3]) AS arr,
       CAST([n_nationkey, 9, 10][2] AS BIGINT) AS el
FROM nation ORDER BY k"""


@register("adv_const_literals", _CONST_LIT_ORACLE, category="variant")
def adv_const_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake array/object CONSTANT syntax ([..], {'k': v}) over table
    columns through the dialect's char-scan rewrite (r7,
    dialect._rewrite_const_literals), value-checked against DuckDB parsing
    the IDENTICAL constants natively. GET is 0-based vs DuckDB's 1-based
    subscript; JSON text of int arrays/objects is byte-identical."""
    from universql_spark.dialect import snowflake_to_spark

    return spark.sql(
        snowflake_to_spark(
            "SELECT n_nationkey AS k, "
            "TO_JSON({'key': n_regionkey, 'tags': [n_nationkey, n_nationkey + 1]}) AS obj, "
            "TO_JSON([n_regionkey, 2, 3]) AS arr, "
            "CAST(GET([n_nationkey, 9, 10], 1) AS BIGINT) AS el "
            "FROM nation ORDER BY k"
        )
    )


_FLATTEN_REC_ORACLE = """WITH RECURSIVE src AS (
  SELECT n_nationkey AS id,
         '{"name": "' || n_name || '", "tags": [' || n_nationkey || ', {"r": ' || n_regionkey || '}]}' AS doc
  FROM nation
),
walk(id, key, path, idx, value) AS (
    SELECT s.id, c.kv.key, c.kv.path, c.kv.idx, c.kv.value
    FROM src s, LATERAL (
      SELECT unnest(list_transform(json_keys(s.doc::JSON), k ->
        struct_pack(key := k, path := k, idx := NULL::BIGINT,
                    value := CAST(json_extract(s.doc::JSON, '$."' || k || '"') AS VARCHAR)))) AS kv
    ) c
  UNION ALL
    SELECT w.id, c.kv.key, c.kv.path, c.kv.idx, c.kv.value
    FROM walk w, LATERAL (
      SELECT unnest(
        CASE WHEN json_type(w.value::JSON) = 'OBJECT' THEN
          list_transform(json_keys(w.value::JSON), k ->
            struct_pack(key := k, path := w.path || '.' || k, idx := NULL::BIGINT,
                        value := CAST(json_extract(w.value::JSON, '$."' || k || '"') AS VARCHAR)))
        WHEN json_type(w.value::JSON) = 'ARRAY' THEN
          list_transform(range(CAST(json_array_length(w.value::JSON) AS BIGINT)), i ->
            struct_pack(key := NULL::VARCHAR, path := w.path || '[' || i || ']', idx := i,
                        value := CAST(json_extract(w.value::JSON, '$[' || i || ']') AS VARCHAR)))
        ELSE [] END) AS kv
    ) c
)
SELECT id, key, path, idx, value FROM walk"""


@register("adv_flatten_recursive", _FLATTEN_REC_ORACLE, category="variant")
def adv_flatten_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake FLATTEN(RECURSIVE => TRUE): every element at every depth of
    a nested VARIANT document, as (key, path, idx, value) rows.

    Spark side: the flatten_recursive Python UDTF (operators/flatten.py) in
    a lateral correlation — the same plan shape the dialect layer emits for
    `, LATERAL FLATTEN(INPUT => doc, RECURSIVE => TRUE) f`. The oracle is a
    DuckDB recursive CTE walking the identical document with
    json_keys/json_extract; VALUE compares byte-identical because both
    sides emit compact JSON text.

    The documents are constructed from nation columns (fixture VARIANTs are
    flat, so the nesting — object > array > object — is synthesized
    deterministically on both engines).
    """
    from universql_spark.operators.flatten import register_udtfs

    register_udtfs(spark)
    src = spark.table("nation").select(
        F.col("n_nationkey").alias("id"),
        F.concat(
            F.lit('{"name": "'), F.col("n_name"),
            F.lit('", "tags": ['), F.col("n_nationkey").cast("string"),
            F.lit(', {"r": '), F.col("n_regionkey").cast("string"), F.lit("}]}"),
        ).alias("doc"),
    )
    src.createOrReplaceTempView("_flatten_rec_src")
    return spark.sql(
        "SELECT id, f.key AS key, f.path AS path, f.idx AS idx, f.value AS value "
        "FROM _flatten_rec_src, LATERAL flatten_recursive(doc) f"
    )


_TREE_SQL = """SELECT n_nationkey AS id,
       CASE WHEN n_nationkey = 0 THEN NULL
            ELSE CAST(floor((n_nationkey - 1) / 5) AS BIGINT) END AS parent_id,
       n_name AS name FROM nation"""

_DUCK_CONNECT_BY = f"""WITH RECURSIVE tree AS ({_TREE_SQL}),
walk AS (
  SELECT id, parent_id, name, 1 AS level FROM tree WHERE parent_id IS NULL
  UNION ALL
  SELECT t.id, t.parent_id, t.name, w.level + 1
  FROM tree t JOIN walk w ON t.parent_id = w.id)
SELECT id, parent_id, name, level FROM walk ORDER BY level, id"""


@register("adv_connect_by", _DUCK_CONNECT_BY, category="advanced")
def adv_connect_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake CONNECT BY hierarchy walk (START WITH / PRIOR / LEVEL)
    rewritten to an ANSI recursive CTE (dialect.rewrite_connect_by; Spark
    4.1 WITH RECURSIVE executes it). Tree synthesized from nation: 25
    nodes, branching 5, depth 3."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(f"CREATE OR REPLACE TEMP VIEW cb_tree AS {_TREE_SQL}")
    return eng.execute_df(
        "SELECT id, parent_id, name, LEVEL AS level FROM cb_tree "
        "START WITH parent_id IS NULL CONNECT BY parent_id = PRIOR id "
        "ORDER BY level, id"
    )


_DUCK_REC_CTE = """WITH RECURSIVE fib(n, a, b) AS (
  SELECT 1, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL
  SELECT n + 1, b, a + b FROM fib WHERE n < 20)
SELECT n, a AS fib_n FROM fib ORDER BY n"""


@register("adv_recursive_cte", _DUCK_REC_CTE, category="advanced")
def adv_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI WITH RECURSIVE passes through VERBATIM on both engines (Spark
    4.1 native recursive CTE execution — no dialect rewrite involved)."""
    return spark.sql(_DUCK_REC_CTE)


_DUCK_MATCH_RECOGNIZE = """WITH s AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN value < lag(value) OVER w THEN 'D'
              WHEN value > lag(value) OVER w THEN 'U'
              ELSE 'O' END AS sym
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sl AS (
  SELECT *, CASE WHEN sym IS DISTINCT FROM lag(sym)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 THEN 1 ELSE 0 END AS chg
  FROM s),
r AS (
  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS run_id
  FROM sl),
runs AS (
  SELECT user_id, run_id, any_value(sym) AS sym, CAST(count(*) AS BIGINT) AS n,
         min(event_id) AS first_eid, max(event_id) AS last_eid
  FROM r GROUP BY user_id, run_id),
m AS (
  SELECT d.user_id, d.first_eid AS start_eid, u.last_eid AS end_eid,
         d.n + u.n AS n_rows
  FROM runs d JOIN runs u
    ON u.user_id = d.user_id AND u.run_id = d.run_id + 1
  WHERE d.sym = 'D' AND u.sym = 'U')
SELECT user_id, CAST(row_number() OVER (PARTITION BY user_id ORDER BY start_eid) AS BIGINT) AS mn,
       start_eid, end_eid, CAST(n_rows AS BIGINT) AS n_rows
FROM m ORDER BY user_id, mn"""


@register("adv_match_recognize", _DUCK_MATCH_RECOGNIZE, category="advanced")
def adv_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE (operators/match_recognize.py): V-shape detection
    PATTERN (DOWN+ UP+) over per-user value series. DEFINE predicates and
    PREV() lags evaluate JVM-side; the per-partition leftmost-greedy regex
    walk runs in applyInPandas over symbol-set-encoded characters. The
    DuckDB oracle states the same matches via run-length grouping: a
    leftmost-greedy DOWN+ UP+ match is exactly a maximal strictly-falling
    run immediately followed by a strictly-rising run."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT user_id, mn, start_eid, end_eid, n_rows
FROM events MATCH_RECOGNIZE (
  PARTITION BY user_id ORDER BY ts, event_id
  MEASURES MATCH_NUMBER() AS mn, FIRST(event_id) AS start_eid,
           LAST(event_id) AS end_eid, COUNT(*) AS n_rows
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (DOWN+ UP+)
  DEFINE DOWN AS value < PREV(value), UP AS value > PREV(value)
) ORDER BY user_id, mn"""
    )


@register("join_asof_sql", _ASOF_ORACLE, category="temporal")
def join_asof_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of join as join_asof, but through Snowflake's SQL
    surface: `ASOF JOIN ... MATCH_CONDITION (l.ts >= r.ts) ON l.k = r.k`
    (engine._resolve_asof_join -> operators/temporal.asof_join, one
    key-shuffle union+window plan). Verbatim text a Snowflake client would
    send; the oracle is DuckDB's native ASOF LEFT JOIN."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        """SELECT l.event_id, p_event_id, p_value FROM (
  SELECT event_id, user_id, ts FROM events WHERE event_type IN ('click', 'view')
) l ASOF JOIN (
  SELECT user_id, ts AS pts, event_id AS p_event_id, value AS p_value
  FROM events WHERE event_type = 'purchase'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
) p MATCH_CONDITION (l.ts >= p.pts) ON l.user_id = p.user_id
ORDER BY l.event_id"""
    )


_TF_ORACLE = """
SELECT r.r_name AS region_name, n.n_name AS nation_name
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
WHERE r.r_regionkey = 2
ORDER BY nation_name
"""


@register("adv_table_function", _TF_ORACLE, category="advanced")
def adv_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDTF (CREATE FUNCTION ... RETURNS TABLE) inlined at the call
    site as a macro: the planner optimizes the EXPANDED query, so the
    region filter pushes into the nation scan through the function
    boundary."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    eng.execute(
        "CREATE OR REPLACE FUNCTION nations_in(rk INT) RETURNS TABLE (region_name STRING, nation_name STRING) AS "
        "'SELECT r.r_name AS region_name, n.n_name AS nation_name "
        "FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey WHERE r.r_regionkey = rk'"
    )
    return eng.execute_df(
        "SELECT region_name, nation_name FROM TABLE(nations_in(2)) ORDER BY nation_name"
    )


@register("embed_cluster_profile", GOLDEN["embed_cluster_profile"], category="similarity")
def embed_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster profile over the k-means(8, 4 iters) assignments:
    member count + exact total within-cluster distance (dist2 rounded to
    4dp summed through DECIMAL — order-free, so the independent numpy
    oracle in tests/compare.py PY_ORACLES hash-matches). The
    cluster-cardinality/compactness report a clustering job emits."""
    from universql_spark.operators import cluster

    out, _ = cluster.kmeans(spark.table("embeddings"), k=8, iters=4)
    return (
        out.groupBy("cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.round(
                F.sum(F.col("dist2").cast("decimal(20,4)")).cast("double"), 4
            ).alias("total_dist2"),
        )
        .orderBy("cluster")
    )


_MULTISET_DUCK = """WITH t AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS a
  FROM documents WHERE doc_id < 50),
s AS (SELECT doc_id, a, a[1:3] AS b FROM t)
SELECT doc_id,
  array_to_string(list_filter(a, (x, i) ->
    len(list_filter(a[1:i], y -> y IS NOT DISTINCT FROM x))
      > len(list_filter(b, y -> y IS NOT DISTINCT FROM x))), '|') AS exc,
  array_to_string(list_filter(a, (x, i) ->
    len(list_filter(a[1:i], y -> y IS NOT DISTINCT FROM x))
      <= len(list_filter(b, y -> y IS NOT DISTINCT FROM x))), '|') AS inter
FROM s ORDER BY doc_id"""


@register("fn_array_multiset", _MULTISET_DUCK, category="fn")
def fn_array_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake's ARRAY_EXCEPT / ARRAY_INTERSECTION are MULTISET ops
    (r8 probe sweep): each occurrence in the second array cancels ONE
    occurrence in the first, order preserved, no dedup — Spark's builtins
    are set-based, so the dialect emulates via positional running-count
    lambdas (dialect._multiset_rw). The oracle replays the same
    positional-count definition with DuckDB's indexed list lambdas over
    the documents token arrays (real duplicate tokens at every scale)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        "SELECT doc_id, "
        "ARRAY_TO_STRING(ARRAY_EXCEPT(SPLIT(lower(trim(text)), ' '), "
        "  ARRAY_SLICE(SPLIT(lower(trim(text)), ' '), 0, 3)), '|') AS exc, "
        "ARRAY_TO_STRING(ARRAY_INTERSECTION(SPLIT(lower(trim(text)), ' '), "
        "  ARRAY_SLICE(SPLIT(lower(trim(text)), ' '), 0, 3)), '|') AS inter "
        "FROM documents WHERE doc_id < 50 ORDER BY doc_id"
    )


_STRING_EDGES_DUCK = """SELECT o_orderkey,
  split_part(o_orderpriority, '-', 1) AS sp_zero,
  array_to_string(list_transform(string_split(lower(o_orderpriority), ''),
    (c, i) -> CASE WHEN i = 1 OR contains(' -', array_extract(
                     string_split(lower(o_orderpriority), ''), i - 1))
              THEN upper(c) ELSE c END), '') AS ic_punct,
  CAST(NULL AS VARCHAR) AS cw_null,
  o_orderpriority || '|' || o_orderstatus AS cw_ok,
  (o_orderkey % 2 = 0) AS tb_onoff,
  CASE WHEN o_orderstatus = 'F' THEN false ELSE NULL END AS ttb_status
FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey"""


@register("fn_string_edges", _STRING_EDGES_DUCK, category="fn")
def fn_string_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 probe sweep #4 closures, value-checked over table data through the
    full dialect ring: SPLIT_PART part 0 is treated as 1 (Spark raises
    INVALID_INDEX_OF_ZERO); 1-arg INITCAP's default delimiter set includes
    punctuation ('1-URGENT' -> '1-Urgent'; Spark's builtin splits on
    whitespace only); CONCAT_WS is NULL-poisoning (any NULL argument nulls
    the whole result — Spark's skips NULLs); TO_BOOLEAN/TRY_TO_BOOLEAN
    accept 'on'/'off' and map 'F' -> false / non-boolean text -> NULL. The
    oracle replays each documented semantic explicitly in DuckDB (which
    shares Spark's divergent behaviors, so a pass proves the rewrite, not
    engine agreement)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        "SELECT o_orderkey, "
        "SPLIT_PART(o_orderpriority, '-', 0) AS sp_zero, "
        "INITCAP(o_orderpriority) AS ic_punct, "
        "CONCAT_WS('|', o_orderpriority, NULLIF(o_orderstatus, o_orderstatus)) AS cw_null, "
        "CONCAT_WS('|', o_orderpriority, o_orderstatus) AS cw_ok, "
        "TO_BOOLEAN(IFF(o_orderkey % 2 = 0, 'on', 'off')) AS tb_onoff, "
        "TRY_TO_BOOLEAN(o_orderstatus) AS ttb_status "
        "FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey"
    )


_DATEDIFF_DUCK = """SELECT event_id,
  date_diff('month', TIMESTAMP '2024-01-15 12:00:00', ts) AS dd_month,
  date_diff('week', TIMESTAMP '2024-01-15 12:00:00', ts) AS dd_week,
  date_diff('day', TIMESTAMP '2024-01-15 12:00:00', ts) AS dd_day,
  date_diff('hour', TIMESTAMP '2024-01-15 12:00:00', ts) AS dd_hour,
  date_diff('minute', TIMESTAMP '2024-01-15 12:00:00', ts) AS dd_min,
  CAST(dayofweek(ts) AS INT) AS dow
FROM events WHERE event_id < 300 ORDER BY event_id"""


@register("fn_datediff_boundaries", _DATEDIFF_DUCK, category="fn")
def fn_datediff_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 probe sweep #6 closure, value-checked over table data: Snowflake
    DATEDIFF counts unit-BOUNDARY CROSSINGS — DATEDIFF(month, Jan 31,
    Feb 1) = 1 — where Spark's timestampdiff counts elapsed complete
    units; the dialect expands to truncate-to-unit-then-count expressions.
    DAYOFWEEK is 0=Sunday..6=Saturday (WEEK_START=0 default). The oracle
    is DuckDB's NATIVE date_diff/dayofweek, which share Snowflake's
    definitions — a genuine cross-engine check of the expansion, positive
    and negative spans both exercised (the anchor sits mid-fixture)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        "SELECT event_id, "
        "DATEDIFF('month', TIMESTAMP '2024-01-15 12:00:00', ts) AS dd_month, "
        "DATEDIFF('week', TIMESTAMP '2024-01-15 12:00:00', ts) AS dd_week, "
        "DATEDIFF('day', TIMESTAMP '2024-01-15 12:00:00', ts) AS dd_day, "
        "DATEDIFF('hour', TIMESTAMP '2024-01-15 12:00:00', ts) AS dd_hour, "
        "DATEDIFF('minute', TIMESTAMP '2024-01-15 12:00:00', ts) AS dd_min, "
        "CAST(DAYOFWEEK(ts) AS INT) AS dow "
        "FROM events WHERE event_id < 300 ORDER BY event_id"
    )


_NULL_ORDER_DUCK = """SELECT o_orderkey, st
FROM (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st FROM orders)
ORDER BY st DESC NULLS FIRST, o_orderkey NULLS LAST LIMIT 50"""


@register("adv_null_ordering", _NULL_ORDER_DUCK, category="advanced")
def adv_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 probe sweep #7 closure over table data: Snowflake's default NULL
    ordering (ASC -> NULLS LAST, DESC -> NULLS FIRST) is the opposite of
    Spark's on both counts — without the dialect's ORDER BY normalization
    this LIMIT-50 slice returns status rows instead of the NULL block.
    The oracle spells Snowflake's defaults explicitly in DuckDB (whose own
    default is NULLS LAST in both directions, so an explicit clause is a
    genuine statement of the contract, not engine agreement)."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        "SELECT o_orderkey, st "
        "FROM (SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS st FROM orders) "
        "ORDER BY st DESC, o_orderkey LIMIT 50"
    )


_QUANTIFIED_DUCK = """SELECT n_nationkey,
  n_regionkey = ANY (SELECT r_regionkey FROM region WHERE r_regionkey < 2) AS any_eq,
  n_nationkey > ALL (SELECT r_regionkey FROM region) AS all_gt,
  n_nationkey < ANY (SELECT r_regionkey FROM region) AS any_lt,
  n_nationkey > ALL (SELECT r_regionkey FROM region WHERE r_regionkey > 99) AS all_empty,
  n_nationkey <> ALL (SELECT r_regionkey FROM region) AS ne_all
FROM nation ORDER BY n_nationkey"""


@register("adv_quantified_cmp", _QUANTIFIED_DUCK, category="advanced")
def adv_quantified_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r8 probe sweep #9: quantified subquery comparisons (= ANY, > ALL,
    < ANY, <> ALL, empty-set ALL) — Spark's parser lacks them, so the
    dialect rewrites to IN/NOT IN (exact) and guarded MIN/MAX scalar
    subqueries. The oracle is DuckDB executing the IDENTICAL quantified
    text natively — a genuine cross-engine check including the
    ALL-over-empty-set = TRUE edge."""
    from universql_spark.engine import Engine

    eng = Engine(spark=spark)
    return eng.execute_df(
        "SELECT n_nationkey, "
        "n_regionkey = ANY (SELECT r_regionkey FROM region WHERE r_regionkey < 2) AS any_eq, "
        "n_nationkey > ALL (SELECT r_regionkey FROM region) AS all_gt, "
        "n_nationkey < ANY (SELECT r_regionkey FROM region) AS any_lt, "
        "n_nationkey > ALL (SELECT r_regionkey FROM region WHERE r_regionkey > 99) AS all_empty, "
        "n_nationkey <> ALL (SELECT r_regionkey FROM region) AS ne_all "
        "FROM nation ORDER BY n_nationkey"
    )
