"""Property-based + randomized differential tests for the pure-Python and
graph layers (hypothesis is available in this container).

- split_statements: no statement content is ever lost or invented, for
  generated scripts mixing quoted ';', line/block comments, and blanks.
- avro_io: write->read roundtrip over random records and all three codecs
  (the Iceberg manifest chain depends on this byte-level fidelity).
- connected_components: differential vs a pure-Python union-find on random
  graphs — chains, stars, cliques, and noise edges (the large-star/
  small-star contraction must agree with the ground truth labeling).
"""

from __future__ import annotations

import random

import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from universql_spark.dialect import split_statements  # noqa: E402

# -- split_statements ---------------------------------------------------------

_stmt_body = st.text(
    alphabet=st.sampled_from(list("abcXYZ09_ ()*,=<>.\n\t")), min_size=1, max_size=30
).map(lambda s: "SELECT " + s.strip() if s.strip() else "SELECT 1")
_quoted = st.text(
    alphabet=st.sampled_from(list("ab;—'x ")), max_size=10
).map(lambda s: "SELECT '" + s.replace("'", "''") + "' AS v")
_commented = _stmt_body.map(lambda s: s + " -- trailing; comment")
_statement = st.one_of(_stmt_body, _quoted)


@given(st.lists(_statement, min_size=1, max_size=6))
@settings(max_examples=120, deadline=None)
def test_split_statements_preserves_each_statement(stmts):
    script = ";\n".join(stmts) + ";"
    out = split_statements(script)
    # every non-empty input statement survives in order, whitespace-trimmed;
    # quoted ';' never splits — the quoted payload stays intact
    expected = [s.strip() for s in stmts if s.strip()]
    assert len(out) == len(expected)
    for got, want in zip(out, expected):
        assert got == want


@given(st.lists(_commented, min_size=1, max_size=5))
@settings(max_examples=60, deadline=None)
def test_split_statements_comment_semicolons_never_split(stmts):
    """';' inside a '--' comment is not a separator; with separators on
    fresh lines the statement COUNT is preserved (comment text itself may be
    normalized away by the splitter)."""
    script = "\n;\n".join(stmts) + "\n;"
    out = split_statements(script)
    assert len(out) == len(stmts)
    for got, want in zip(out, stmts):
        assert got.startswith(want.split(" -- ")[0].strip())


@given(st.text(alphabet=st.sampled_from(list("ab';- \n/*")), max_size=40))
@settings(max_examples=150, deadline=None)
def test_split_statements_never_crashes(script):
    out = split_statements(script)
    assert isinstance(out, list)


# -- avro roundtrip -----------------------------------------------------------

_record = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(2**62), max_value=2**62),
        "name": st.text(max_size=24),
        "score": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "ok": st.booleans(),
    }
)

_AVRO_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
    ],
}


@given(st.lists(_record, min_size=0, max_size=40), st.sampled_from(["null", "deflate", "snappy"]))
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_avro_roundtrip_random_records(tmp_path_factory, records, codec):
    from universql_spark.avro_io import write_avro
    from universql_spark.iceberg_format import _read_avro_records

    path = str(tmp_path_factory.mktemp("avro") / f"p_{codec}.avro")
    write_avro(path, _AVRO_SCHEMA, records, codec=codec)
    assert _read_avro_records(path) == records


# -- connected components vs union-find ---------------------------------------

def _union_find_labels(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member id
    comp: dict[int, int] = {}
    for i in range(n):
        r = find(i)
        comp[i] = min(comp.get(r, i), i) if False else r
    # roots are already minimal under min-merge union; normalize anyway
    label: dict[int, int] = {}
    for i in range(n):
        r = find(i)
        label.setdefault(r, i)
    return {i: label[find(i)] for i in range(n)}


def test_components_random_graphs_match_union_find(spark):
    """5 seeded random graphs (chain + star + clique + noise edges): the
    distributed star-contraction labeling equals exact union-find."""
    from universql_spark.operators import components

    rng = random.Random(42)
    for trial in range(5):
        n = rng.randint(20, 60)
        edges: list[tuple[int, int]] = []
        # chain segment
        lo = rng.randrange(0, n // 2)
        hi = min(n - 1, lo + rng.randint(3, 10))
        edges += [(i, i + 1) for i in range(lo, hi)]
        # star
        hub = rng.randrange(n)
        edges += [(hub, rng.randrange(n)) for _ in range(rng.randint(2, 8))]
        # clique
        kq = rng.sample(range(n), k=min(n, rng.randint(3, 6)))
        edges += [(a, b) for i, a in enumerate(kq) for b in kq[i + 1 :]]
        # noise
        edges += [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(0, 10))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        want = _union_find_labels(n, edges)
        nodes = spark.range(n).toDF("id")
        edf = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: r["component"]
            for r in components.connected_components(nodes, edf).collect()
        }
        assert got == want, f"trial {trial}: n={n}, edges={edges}"


# -- SELECT TOP rewrite -------------------------------------------------------

_ident = st.text(alphabet=st.sampled_from(list("abcxyz")), min_size=1, max_size=6)


@st.composite
def _top_query(draw, depth=0):
    """Random SELECTs with TOP at arbitrary nesting + literals that contain
    'SELECT TOP n' text (which must never trigger the rewrite)."""
    n = draw(st.integers(1, 99))
    col = draw(_ident)
    has_top = draw(st.booleans())
    lit = draw(st.booleans())
    inner = ""
    if depth < 2 and draw(st.booleans()):
        sub = draw(_top_query(depth=depth + 1))
        inner = f", ({sub}) q{depth}"
    sel = f"SELECT {'TOP ' + str(n) + ' ' if has_top else ''}{col}"
    if lit:
        sel += ", 'SELECT TOP 7 trap' AS s"
    return f"{sel} FROM t{inner} ORDER BY {col}"


@given(_top_query())
@settings(max_examples=120, deadline=None)
def test_top_rewrite_structure_preserved(q):
    from universql_spark.dialect import _STRING_RE, _rewrite_top

    out = _rewrite_top(q)
    # balanced parens preserved
    assert out.count("(") == out.count(")")
    # every literal survives byte-for-byte (incl. the 'SELECT TOP 7 trap')
    assert sorted(_STRING_RE.findall(q)) == sorted(_STRING_RE.findall(out))
    # no TOP remains outside literals; each removed TOP n became a LIMIT n
    masked = _STRING_RE.sub("''", q)
    out_masked = _STRING_RE.sub("''", out)
    import re as _re

    tops = _re.findall(r"\bTOP\s+(\d+)", masked)
    assert not _re.search(r"\bTOP\s+\d+", out_masked)
    assert sorted(tops) == sorted(_re.findall(r"\bLIMIT\s+(\d+)", out_masked))


# -- differential expression fuzz: Spark vs DuckDB ---------------------------
# Random expression trees over an ANSI-common scalar subset, evaluated on
# the 25-row nation fixture by BOTH engines and compared with the gate's
# canonicalizer. The grammar is deliberately restricted to constructs with
# identical cross-engine semantics (no '/', no SUBSTR start 0, bounded
# magnitudes so Spark 4's default ANSI mode cannot overflow) — the point is
# fuzzing the COMPOSITION space, where canonicalization and null-handling
# bugs hide.

_int_leaf = st.one_of(
    st.just("k"),
    st.integers(min_value=-9, max_value=9).map(str),
)
_str_leaf = st.one_of(
    st.just("s"),
    st.sampled_from(["'ab'", "'XY z'", "''"]),
)


def _int_node(children):
    a = children
    return st.one_of(
        st.tuples(a, a).map(lambda t: f"({t[0]} + {t[1]})"),
        st.tuples(a, a).map(lambda t: f"({t[0]} - {t[1]})"),
        st.tuples(a, a).map(lambda t: f"(({t[0]} * {t[1]}) % 1000)"),
        st.tuples(a, a).map(lambda t: f"COALESCE({t[0]}, {t[1]})"),
        st.tuples(a, a).map(lambda t: f"LEAST({t[0]}, {t[1]})"),
        st.tuples(a, a).map(lambda t: f"GREATEST({t[0]}, {t[1]})"),
        a.map(lambda x: f"ABS({x})"),
        # CAST: Spark sign(int) -> DOUBLE, DuckDB -> INTEGER (first real
        # divergence this fuzzer caught — a TYPE class, values equal)
        a.map(lambda x: f"CAST(SIGN({x}) AS INT)"),
        # bounded: Spark factorial is NULL past 20, DuckDB errors on
        # negatives — pmod keeps the domain shared
        a.map(lambda x: f"CAST(FACTORIAL(CAST(ABS({x}) % 8 AS INT)) AS BIGINT)"),  # DuckDB: factorial(INTEGER) only, returns HUGEINT -> arrow decimal
        st.tuples(a, a, a).map(
            lambda t: f"(CASE WHEN ({t[0]} % 2) = 0 THEN {t[1]} ELSE {t[2]} END)"
        ),
    )


def _str_node(children):
    a = children
    return st.one_of(
        a.map(lambda x: f"UPPER({x})"),
        a.map(lambda x: f"LOWER({x})"),
        a.map(lambda x: f"TRIM({x})"),
        st.tuples(a, a).map(lambda t: f"({t[0]} || {t[1]})"),
        st.tuples(a, st.integers(1, 3), st.integers(1, 4)).map(
            lambda t: f"SUBSTR({t[0]}, {t[1]}, {t[2]})"
        ),
        a.map(lambda x: f"REVERSE({x})"),
        a.map(lambda x: f"REPLACE({x}, 'a', 'z')"),
        a.map(lambda x: f"TRANSLATE({x}, 'ab', 'xy')"),
        st.tuples(a, st.integers(1, 6)).map(lambda t: f"LPAD({t[0]}, {t[1]}, '.')"),
        st.tuples(a, st.integers(1, 2)).map(
            lambda t: f"SPLIT_PART({t[0]}, 'a', {t[1]})"
        ),
    )


_int_expr = st.recursive(_int_leaf, _int_node, max_leaves=6)
_str_expr = st.recursive(_str_leaf, _str_node, max_leaves=5)

# date lane: the shared Spark/DuckDB date surface. CAST around date_trunc —
# Spark returns TIMESTAMP, DuckDB DATE (a type class, values equal).
_date_leaf = st.one_of(
    st.just("DATE '2024-01-15'"),
    st.just("date_add(DATE '2020-02-29', (ABS(k) * 37) % 1000)"),
)


def _date_node(children):
    d = children
    return st.one_of(
        st.tuples(d, st.integers(-40, 40)).map(lambda t: f"date_add({t[0]}, {t[1]})"),
        d.map(lambda x: f"CAST(date_trunc('month', {x}) AS DATE)"),
        d.map(lambda x: f"CAST(date_trunc('year', {x}) AS DATE)"),
        d.map(lambda x: f"last_day({x})"),
        st.tuples(d, d).map(lambda t: f"greatest({t[0]}, {t[1]})"),
        st.tuples(d, d).map(lambda t: f"least({t[0]}, {t[1]})"),
    )


_date_expr = st.recursive(_date_leaf, _date_node, max_leaves=5)


@pytest.fixture(scope="module")
def _duck(sf_dir):
    from tests.compare import duck_connection

    return duck_connection(sf_dir)


# window lane: the shared Spark/DuckDB window-function surface over
# (k = n_nationkey UNIQUE, g = n_regionkey GROUPS). Determinism rules:
# rank-family functions may order by a TIED key (their value depends only on
# key values); everything sequence-dependent (row_number/lag/lead/ntile,
# framed aggregates) orders by the unique k. Framed SUM/COUNT are CAST to
# BIGINT (DuckDB window SUM(int) -> HUGEINT, Spark -> LONG — width class).
_win_rank = st.tuples(
    st.sampled_from(["RANK()", "DENSE_RANK()", "PERCENT_RANK()", "CUME_DIST()"]),
    st.integers(2, 6),
).map(lambda t: f"{t[0]} OVER (PARTITION BY g ORDER BY (k % {t[1]}))")

_win_seq = st.one_of(
    st.just("ROW_NUMBER() OVER (PARTITION BY g ORDER BY k)"),
    st.tuples(st.sampled_from(["LAG", "LEAD"]), st.integers(1, 3), st.integers(-5, 5)).map(
        lambda t: f"{t[0]}(k, {t[1]}, {t[2]}) OVER (PARTITION BY g ORDER BY k)"
    ),
    st.integers(2, 5).map(lambda n: f"NTILE({n}) OVER (PARTITION BY g ORDER BY k)"),
    st.sampled_from(["FIRST_VALUE", "LAST_VALUE"]).map(
        lambda f: f"{f}(k) OVER (PARTITION BY g ORDER BY k "
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)"
    ),
)

_win_frame = st.tuples(
    st.sampled_from(["SUM", "MIN", "MAX", "COUNT"]),
    st.integers(0, 3),
    st.integers(0, 3),
    st.sampled_from(["ROWS", "RANGE"]),
).map(
    lambda t: f"CAST({t[0]}(k) OVER (PARTITION BY g ORDER BY k "
    f"{t[3]} BETWEEN {t[1]} PRECEDING AND {t[2]} FOLLOWING) AS BIGINT)"
)


# aggregate lane: random GROUP BY aggregates over the ANSI-common subset.
# Exact-arithmetic only (SUM/COUNT over ints stay integral; AVG is emitted
# as an exact decimal sum divided once — the registry convention) and the
# group key is always projected so the row sets align.
_agg_num = st.one_of(
    st.sampled_from(["SUM", "MIN", "MAX", "COUNT"]).map(lambda f: f + "(x)"),
    st.just("COUNT(*)"),
    st.just("COUNT(DISTINCT x)"),
    st.just("COUNT(CASE WHEN x % 2 = 0 THEN 1 END)"),
    st.just("SUM(CASE WHEN x > 10 THEN x ELSE -x END)"),
)
# string aggregates ride uncast (ASCII-upper fixture values, so binary vs
# locale collation cannot reorder them)
_agg_str = st.sampled_from(["MIN(s)", "MAX(s)", "MIN(UPPER(s))", "MAX(SUBSTR(s, 2))"])
_agg_key = st.sampled_from(["k % 2", "k % 3", "k % 5", "(k * 7) % 4"])
_agg_having = st.one_of(
    st.just(""),
    st.integers(0, 3).map(lambda n: f" HAVING COUNT(*) > {n}"),
)


@given(f1=_agg_num, f2=_agg_str, g=_agg_key, hv=_agg_having)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_aggregate_fuzz_spark_matches_duckdb(spark, sf_dir, _duck, f1, f2, g, hv):
    from tests.compare import normalize_rows
    from universql_spark.queries import ensure_views

    ensure_views(spark, sf_dir)
    q = (
        f"SELECT {g} AS grp, CAST({f1} AS BIGINT) AS a1, {f2} AS a2 "
        "FROM (SELECT n_nationkey AS k, n_nationkey AS x, n_name AS s FROM nation) "
        f"GROUP BY {g}{hv} ORDER BY grp"
    )
    s_tbl = spark.sql(q).toArrow()
    s_rows = [tuple(d[c] for c in s_tbl.column_names) for d in s_tbl.to_pylist()]
    d_tbl = _duck.execute(q).arrow()
    d_rows = [tuple(d[c] for c in d_tbl.column_names) for d in d_tbl.to_pylist()]
    assert normalize_rows(list(s_tbl.column_names), s_rows) == normalize_rows(
        list(d_tbl.column_names), d_rows
    ), q


# join lane: random join types x conditions x post-filters over the nation
# self-join. The comparison is order-insensitive (normalize_rows), so no
# ORDER BY is needed — which sidesteps the engines' different NULL-ordering
# defaults on outer-join output.
_join_type = st.sampled_from(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
_join_cond = st.sampled_from(
    [
        "a.g = b.g2",
        "a.g = b.g2 AND a.k % 2 = b.k2 % 2",
        "a.k % 7 = b.k2 % 7",
        "a.k = b.k2 + 1",
    ]
)
_join_filter = st.sampled_from(
    ["", " WHERE a.k > 3", " WHERE COALESCE(b.k2, -1) % 2 = 0", " WHERE a.k IS NOT NULL AND a.k < 20"]
)


@given(jt=_join_type, cond=_join_cond, flt=_join_filter)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_join_fuzz_spark_matches_duckdb(spark, sf_dir, _duck, jt, cond, flt):
    from tests.compare import normalize_rows
    from universql_spark.queries import ensure_views

    ensure_views(spark, sf_dir)
    q = (
        "SELECT a.k AS ak, b.k2 AS bk, a.g AS ag "
        "FROM (SELECT n_nationkey AS k, n_regionkey AS g FROM nation) a "
        f"{jt} (SELECT n_nationkey AS k2, n_regionkey AS g2 FROM nation) b "
        f"ON {cond}{flt}"
    )
    s_tbl = spark.sql(q).toArrow()
    s_rows = [tuple(d[c] for c in s_tbl.column_names) for d in s_tbl.to_pylist()]
    d_tbl = _duck.execute(q).arrow()
    d_rows = [tuple(d[c] for c in d_tbl.column_names) for d in d_tbl.to_pylist()]
    assert normalize_rows(list(s_tbl.column_names), s_rows) == normalize_rows(
        list(d_tbl.column_names), d_rows
    ), q


@given(w1=_win_rank, w2=_win_seq, w3=_win_frame)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_window_fuzz_spark_matches_duckdb(spark, sf_dir, _duck, w1, w2, w3):
    from tests.compare import normalize_rows
    from universql_spark.queries import ensure_views

    ensure_views(spark, sf_dir)
    q = (
        f"SELECT k, {w1} AS w1, {w2} AS w2, {w3} AS w3 "
        "FROM (SELECT n_nationkey AS k, n_regionkey AS g FROM nation) "
        "ORDER BY k"
    )
    s_tbl = spark.sql(q).toArrow()
    s_rows = [tuple(d[c] for c in s_tbl.column_names) for d in s_tbl.to_pylist()]
    d_tbl = _duck.execute(q).arrow()
    d_rows = [tuple(d[c] for c in d_tbl.column_names) for d in d_tbl.to_pylist()]
    assert normalize_rows(list(s_tbl.column_names), s_rows) == normalize_rows(
        list(d_tbl.column_names), d_rows
    ), q


@given(ie=_int_expr, se=_str_expr, de=_date_expr)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_expression_fuzz_spark_matches_duckdb(spark, sf_dir, _duck, ie, se, de):
    from tests.compare import normalize_rows
    from universql_spark.queries import ensure_views

    ensure_views(spark, sf_dir)
    q = (
        f"SELECT n_nationkey AS k2, {ie} AS e1, LENGTH({se}) AS e2, {se} AS e3, {de} AS e4 "
        "FROM (SELECT n_nationkey AS k, n_name AS s, n_nationkey FROM nation) "
        "ORDER BY k2"
    )
    s_tbl = spark.sql(q).toArrow()
    s_rows = [tuple(d[c] for c in s_tbl.column_names) for d in s_tbl.to_pylist()]
    d_tbl = _duck.execute(q).arrow()
    d_rows = [tuple(d[c] for c in d_tbl.column_names) for d in d_tbl.to_pylist()]
    assert normalize_rows(list(s_tbl.column_names), s_rows) == normalize_rows(
        list(d_tbl.column_names), d_rows
    ), q


# ---------------------------------------------------------------------------
# 8th differential lane (r7): array/object CONSTANT syntax. DuckDB parses
# [1,2] / {'a': 1} natively; the Spark side goes through the dialect's
# _rewrite_const_literals char scan — random nested constants must produce
# identical structured values on both engines. Arrays stay homogeneous
# (Spark arrays are typed — the documented standing limit); object keys are
# unique by construction.
# ---------------------------------------------------------------------------

_cl_int = st.integers(-5, 99)
_cl_str = st.text(alphabet="abxy", min_size=0, max_size=4)
_cl_arr = st.lists(_cl_int, min_size=1, max_size=4)
_cl_obj = st.recursive(
    st.dictionaries(
        st.sampled_from(list("abcd")),
        st.one_of(_cl_int, _cl_str, _cl_arr),
        min_size=1,
        max_size=3,
    ),
    lambda kids: st.dictionaries(
        st.sampled_from(list("pqrs")),
        st.one_of(_cl_int, _cl_arr, kids),
        min_size=1,
        max_size=3,
    ),
    max_leaves=4,
)


def _const_sql(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, list):
        return "[" + ", ".join(_const_sql(x) for x in v) + "]"
    return "{" + ", ".join(f"'{k}': {_const_sql(x)}" for k, x in v.items()) + "}"


@given(obj=_cl_obj, arr=_cl_arr, n=_cl_int)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_const_literal_fuzz_spark_matches_duckdb(spark, _duck, obj, arr, n):
    from universql_spark.dialect import snowflake_to_spark

    q = f"SELECT {_const_sql(obj)} AS o, {_const_sql(arr)} AS a, {n} AS k"
    s = spark.sql(snowflake_to_spark(q)).toArrow().to_pylist()
    d = _duck.execute(q).arrow().to_pylist()
    assert s == d, q


# ---------------------------------------------------------------------------
# 9th differential lane (r8, VERDICT r7 #8): FLATTEN + colon paths — the
# dialect ring's most rewrite-heavy corner (LATERAL -> LATERAL VIEW, VARIANT
# from_json coercion, SEQ/THIS/PATH post-resolution, colon-path
# get_json_object chains) had no dedicated lane. Random JSON documents run
# through the FULL ENGINE (dialect + execute) and must agree with DuckDB's
# native JSON functions on (index, value, path), OBJECT-mode (key, value),
# and colon-path extraction. Value domain notes: strings avoid quotes and
# backslashes (escape-rendering differences are a separate, pinned surface);
# nested objects are single-key so compact re-serialization order can't
# diverge; no floats (format divergence, covered by the cast gallery).
# ---------------------------------------------------------------------------

_j_scalar = st.one_of(
    st.integers(-99, 999),
    st.text(alphabet="abxy z", min_size=0, max_size=5),
    st.booleans(),
)
_j_elem = st.one_of(
    _j_scalar,
    st.lists(st.integers(-9, 99), min_size=1, max_size=3),
    st.dictionaries(st.sampled_from(list("mn")), st.integers(0, 9), min_size=1, max_size=1),
)
_j_arr = st.lists(_j_elem, min_size=0, max_size=5)
_j_obj = st.dictionaries(st.sampled_from(list("abcd")), _j_scalar, min_size=1, max_size=3)


@pytest.fixture(scope="module")
def _flatten_engine(spark, sf_dir):
    from universql_spark.engine import Engine

    return Engine(spark=spark, sf_dir=sf_dir)


@given(arr=_j_arr, obj=_j_obj)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_flatten_colon_fuzz_spark_matches_duckdb(_flatten_engine, _duck, arr, obj):
    import json

    j_arr = json.dumps(arr, separators=(",", ":"))
    j_obj = json.dumps(obj, separators=(",", ":"))
    qa = lambda s: s.replace("'", "''")  # noqa: E731

    # 1) array FLATTEN: (index, value-as-text, path)
    s = _flatten_engine.execute(
        f"SELECT f.index AS i, f.value AS v, f.path AS p "
        f"FROM TABLE(FLATTEN(INPUT => PARSE_JSON('{qa(j_arr)}'))) f ORDER BY i"
    ).to_pylist()
    d = _duck.execute(
        f"SELECT CAST(x AS INT) AS i, json_extract_string('{qa(j_arr)}', '$[' || x || ']') AS v, "
        f"'[' || x || ']' AS p "
        f"FROM range(CAST(json_array_length('{qa(j_arr)}') AS BIGINT)) t(x) ORDER BY i"
    ).arrow().to_pylist()
    assert s == d, j_arr

    # 2) OBJECT-mode FLATTEN: (key, value-as-text), keys are unique
    s = _flatten_engine.execute(
        f"SELECT f.key AS k2, f.value AS v FROM TABLE(FLATTEN("
        f"INPUT => PARSE_JSON('{qa(j_obj)}'), MODE => 'OBJECT')) f ORDER BY k2"
    ).to_pylist()
    d = _duck.execute(
        f"SELECT k2, json_extract_string('{qa(j_obj)}', '$.' || k2) AS v "
        f"FROM unnest(json_keys('{qa(j_obj)}')) t(k2) ORDER BY k2"
    ).arrow().to_pylist()
    assert s == d, j_obj

    # 3) colon paths: present key + guaranteed-missing key -> NULL
    key = next(iter(obj))
    s = _flatten_engine.execute(
        f"SELECT PARSE_JSON('{qa(j_obj)}'):{key} AS va, "
        f"PARSE_JSON('{qa(j_obj)}'):zz AS vm"
    ).to_pylist()
    d = _duck.execute(
        f"SELECT json_extract_string('{qa(j_obj)}', '$.{key}') AS va, "
        f"json_extract_string('{qa(j_obj)}', '$.zz') AS vm"
    ).arrow().to_pylist()
    assert s == d, j_obj


# ---------------------------------------------------------------------------
# Approximate specs: deterministic-bound property tests (VERDICT r6 #6).
# The driver gate records these four rows-only forever (sketch internals /
# sampling are engine-specific), so the VALUE evidence lives here: error
# envelopes vs exact answers, determinism, and merge/subset invariants.
# ---------------------------------------------------------------------------


def test_approx_distinct_error_envelope_and_determinism(spark, sf_dir):
    """approx_count_distinct (HLL++, default rsd=0.05): the estimate lands
    within 3x the configured relative standard deviation of the exact
    count, and the sketch is deterministic (same input -> same estimate)."""
    from universql_spark.queries import load_all

    reg = load_all()
    r1 = reg["agg_approx_distinct"].spark(spark, sf_dir).collect()[0]
    r2 = reg["agg_approx_distinct"].spark(spark, sf_dir).collect()[0]
    assert r1.exact_parts > 0
    assert abs(r1.approx_parts - r1.exact_parts) / r1.exact_parts <= 0.15
    assert r1.approx_parts == r2.approx_parts  # HLL++ is deterministic


def test_approx_quantile_rank_envelope_and_determinism(spark, sf_dir):
    """percentile_approx(0.5, accuracy=1000): the returned value must be an
    actual data value whose RANK is within n/accuracy of the true median
    rank (the GK-sketch guarantee), and repeated runs are identical."""
    from universql_spark.queries import load_all

    reg = load_all()
    v1 = reg["agg_approx_quantile"].spark(spark, sf_dir).collect()[0].p50_approx
    v2 = reg["agg_approx_quantile"].spark(spark, sf_dir).collect()[0].p50_approx
    assert v1 == v2  # deterministic sketch
    vals = sorted(
        r.o_totalprice for r in spark.table("orders").select("o_totalprice").collect()
    )
    n = len(vals)
    eps = max(2, n // 1000 + 1)  # rank slack: n/accuracy, floor for tiny n
    lo, hi = vals[max(0, n // 2 - eps)], vals[min(n - 1, n // 2 + eps)]
    assert lo <= v1 <= hi, (v1, lo, hi)


def test_reservoir_sample_fraction_seed_and_subset(spark, sf_dir):
    """Seeded Bernoulli sample: (a) same seed -> identical row SET, (b) a
    different seed -> a (almost surely) different set, (c) every sampled
    row exists in the source, (d) the sampled fraction is within 5 binomial
    sigmas of the requested 0.1."""
    from universql_spark.queries import load_all

    reg = load_all()
    s1 = {tuple(r) for r in reg["sample_reservoir"].spark(spark, sf_dir).collect()}
    s2 = {tuple(r) for r in reg["sample_reservoir"].spark(spark, sf_dir).collect()}
    assert s1 == s2  # seed-deterministic
    li = spark.table("lineitem")
    total = li.count()
    src = {tuple(r) for r in li.select("l_orderkey", "l_linenumber").collect()}
    assert s1 <= src  # sample is a subset of the source
    import math

    sigma = math.sqrt(0.1 * 0.9 / total)
    assert abs(len(s1) / total - 0.1) <= 5 * sigma, (len(s1), total)
    s3 = {
        tuple(r)
        for r in li.sample(fraction=0.1, seed=7)
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    assert s3 != s1  # different seed, different draw


# ---------------------------------------------------------------------------
# 10th differential lane (r8): DATEDIFF boundary semantics + DAYOFWEEK.
# DuckDB's native datediff/dayofweek share Snowflake's definitions
# (boundary crossings; 0=Sunday) — the same quoted-unit text runs verbatim
# on both engines, the Spark side through the full dialect (which expands
# timestampdiff to truncate-then-count, probe sweep #6).
# ---------------------------------------------------------------------------

_DD_UNITS = ["year", "quarter", "month", "week", "day",
             "hour", "minute", "second", "millisecond"]
_DD_TS = st.sampled_from([
    "TIMESTAMP '2024-01-15 12:34:56.789'",
    "TIMESTAMP '2023-12-31 23:59:59'",
    "TIMESTAMP '2024-02-29 00:00:00'",
    "TIMESTAMP '2020-07-04 01:02:03.25'",
    "TIMESTAMP '2024-01-01 00:00:00'",
])
_DD_DATE = st.one_of(
    st.just("DATE '2024-01-15'"),
    st.just("date_add(DATE '2020-02-29', (ABS(k) * 37) % 1000)"),
    st.just("date_add(DATE '2024-01-15', k - 12)"),
)


@given(
    unit=st.sampled_from(_DD_UNITS),
    is_ts=st.booleans(),
    pick=st.integers(0, 4),
    data=st.data(),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_datediff_fuzz_spark_matches_duckdb(spark, sf_dir, _duck, unit, is_ts, pick, data):
    from tests.compare import normalize_rows
    from universql_spark.dialect import snowflake_to_spark
    from universql_spark.queries import ensure_views

    ensure_views(spark, sf_dir)
    strat = _DD_TS if is_ts else _DD_DATE
    a, b = data.draw(strat), data.draw(strat)
    q = (
        f"SELECT k, DATEDIFF('{unit}', {a}, {b}) AS dd, "
        f"DAYOFWEEK({b}) AS dow "
        "FROM (SELECT n_nationkey AS k FROM nation) ORDER BY k"
    )
    s_tbl = spark.sql(snowflake_to_spark(q)).toArrow()
    s_rows = [tuple(d[c] for c in s_tbl.column_names) for d in s_tbl.to_pylist()]
    d_tbl = _duck.execute(q).arrow()
    d_rows = [tuple(d[c] for c in d_tbl.column_names) for d in d_tbl.to_pylist()]
    assert normalize_rows(list(s_tbl.column_names), s_rows) == normalize_rows(
        list(d_tbl.column_names), d_rows
    ), q


# ---------------------------------------------------------------------------
# 11th differential lane (r8 continuation): ordered collects — ARRAY_AGG /
# LISTAGG WITHIN GROUP in aggregate and WINDOWED positions, through the
# full dialect (the _rewrite_array_agg_within_group /
# _rewrite_windowed_distinct_listagg paths) vs DuckDB's native ordered
# aggregates (array_agg(x ORDER BY ...) / string_agg / full-frame window
# collects). Ties are broken by the unique key k so collect order is
# deterministic on both engines.
# ---------------------------------------------------------------------------

_OC_EXPR = st.sampled_from(["k", "k % 5", "(k * 7) % 11", "g * 10 + k % 3"])
_OC_DESC = st.booleans()


@given(x=_OC_EXPR, desc=_OC_DESC, desc2=_OC_DESC, windowed=st.booleans(), listagg=st.booleans())
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ordered_collect_fuzz_spark_matches_duckdb(
    spark, sf_dir, _duck, x, desc, desc2, windowed, listagg
):
    from tests.compare import normalize_rows
    from universql_spark.dialect import snowflake_to_spark
    from universql_spark.queries import ensure_views

    ensure_views(spark, sf_dir)
    d = " DESC" if desc else ""
    d2 = " DESC" if desc2 else ""  # independent per-key directions
    src = "(SELECT n_nationkey AS k, n_regionkey AS g FROM nation)"
    if windowed:
        # windowed collect: WITHIN GROUP order moves into a full-frame spec
        sf = (
            f"SELECT DISTINCT g, ARRAY_AGG({x}) WITHIN GROUP (ORDER BY {x}{d}, k{d2}) "
            f"OVER (PARTITION BY g) AS a FROM {src} ORDER BY g"
        )
        du = (
            f"SELECT DISTINCT g, array_agg({x}) OVER (PARTITION BY g ORDER BY {x}{d}, k{d2} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS a "
            f"FROM {src} ORDER BY g"
        )
    elif listagg:
        sf = (
            f"SELECT g, LISTAGG(CAST({x} AS STRING), ',') WITHIN GROUP (ORDER BY {x}{d}, k{d2}) AS a "
            f"FROM {src} GROUP BY g ORDER BY g"
        )
        du = (
            f"SELECT g, string_agg(CAST({x} AS VARCHAR), ',' ORDER BY {x}{d}, k{d2}) AS a "
            f"FROM {src} GROUP BY g ORDER BY g"
        )
    else:
        sf = (
            f"SELECT g, ARRAY_AGG({x}) WITHIN GROUP (ORDER BY {x}{d}, k{d2}) AS a "
            f"FROM {src} GROUP BY g ORDER BY g"
        )
        du = (
            f"SELECT g, array_agg({x} ORDER BY {x}{d}, k{d2}) AS a "
            f"FROM {src} GROUP BY g ORDER BY g"
        )
    s_tbl = spark.sql(snowflake_to_spark(sf)).toArrow()
    s_rows = [tuple(r[c] for c in s_tbl.column_names) for r in s_tbl.to_pylist()]
    d_tbl = _duck.execute(du).arrow()
    d_rows = [tuple(r[c] for c in d_tbl.column_names) for r in d_tbl.to_pylist()]
    assert normalize_rows(list(s_tbl.column_names), s_rows) == normalize_rows(
        list(d_tbl.column_names), d_rows
    ), (sf, du)


# ---------------------------------------------------------------------------
# 12th differential lane (r9, VERDICT r8 #7): the TIME surface — new in r8
# with zero dedicated fuzz coverage. Spark has no released TIME type; the
# dialect maps it to the canonical 'HH:mm:ss' string (::TIME casts,
# TO_TIME/TRY_TO_TIME with and without formats, TIMEADD/DATEADD wrap-around
# past midnight, comparisons). DuckDB HAS a native TIME whose arithmetic
# wraps exactly like Snowflake's — CAST(... AS VARCHAR) of a whole-second
# TIME prints the identical 'HH:MM:SS' text, giving a natural oracle.
# ---------------------------------------------------------------------------

_T_UNITS = ["hour", "minute", "second"]


@given(
    h=st.integers(0, 23),
    m=st.integers(0, 59),
    s=st.integers(0, 59),
    unit=st.sampled_from(_T_UNITS),
    delta=st.integers(-100000, 100000),
    h2=st.integers(0, 23),
    m2=st.integers(0, 59),
)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_time_surface_fuzz_spark_matches_duckdb(
    spark, sf_dir, _duck, h, m, s, unit, delta, h2, m2
):
    from tests.compare import normalize_rows
    from universql_spark.dialect import snowflake_to_spark
    from universql_spark.queries import ensure_views

    ensure_views(spark, sf_dir)
    t = f"{h:02d}:{m:02d}:{s:02d}"
    t2 = f"{h2:02d}:{m2:02d}:00"
    dotted = f"{h:02d}.{m:02d}.{s:02d}"
    sf = (
        f"SELECT k, '{t}'::TIME AS a, CAST('{t}' AS TIME) AS b, "
        f"TRY_CAST('garbage' AS TIME) AS g, "
        f"TO_TIME('{dotted}', 'HH24.MI.SS') AS f, "
        f"TIMEADD('{unit}', {delta} + k, '{t}'::TIME) AS ta, "
        f"DATEADD('{unit}', -(({delta} + k) % 1440), '{t2}'::TIME) AS da, "
        f"'{t}'::TIME < '{t2}'::TIME AS lt "
        "FROM (SELECT n_nationkey AS k FROM nation) ORDER BY k"
    )
    du = (
        f"SELECT k, CAST(TIME '{t}' AS VARCHAR) AS a, CAST(TIME '{t}' AS VARCHAR) AS b, "
        f"CAST(TRY_CAST('garbage' AS TIME) AS VARCHAR) AS g, "
        f"CAST(CAST(strptime('{dotted}', '%H.%M.%S') AS TIME) AS VARCHAR) AS f, "
        f"CAST(TIME '{t}' + to_{unit}s(CAST({delta} + k AS BIGINT)) AS VARCHAR) AS ta, "
        f"CAST(TIME '{t2}' - to_{unit}s(CAST(({delta} + k) % 1440 AS BIGINT)) AS VARCHAR) AS da, "
        f"TIME '{t}' < TIME '{t2}' AS lt "
        "FROM (SELECT n_nationkey AS k FROM nation) ORDER BY k"
    )
    s_tbl = spark.sql(snowflake_to_spark(sf)).toArrow()
    s_rows = [tuple(r[c] for c in s_tbl.column_names) for r in s_tbl.to_pylist()]
    d_tbl = _duck.execute(du).arrow()
    d_rows = [tuple(r[c] for c in d_tbl.column_names) for r in d_tbl.to_pylist()]
    assert normalize_rows(list(s_tbl.column_names), s_rows) == normalize_rows(
        list(d_tbl.column_names), d_rows
    ), (sf, du)


# ---------------------------------------------------------------------------
# 13th differential lane (r10, VERDICT r9 #7): window FRAMES x QUALIFY.
# The window family keeps producing real bugs (lane 11 caught one in r8;
# r9's one red driver row was a window spec), and QUALIFY always rides on a
# window — but no lane exercised the two TOGETHER: a framed window in the
# projection plus a (possibly different) window inside the QUALIFY
# condition, through the full dialect (rewrite_qualify projects each OVER
# in the condition as a __qN helper and filters outside). DuckDB has
# native QUALIFY with Snowflake's semantics, so the oracle runs the
# almost-identical text verbatim. Determinism: every sequence-dependent
# window orders by the UNIQUE k; framed SUM/COUNT cast to BIGINT (DuckDB
# window SUM(int) -> HUGEINT width class).
# ---------------------------------------------------------------------------

_QF_FRAME = st.tuples(
    st.sampled_from(["SUM", "MIN", "MAX", "COUNT", "FIRST_VALUE", "LAST_VALUE"]),
    st.sampled_from(["UNBOUNDED PRECEDING", "2 PRECEDING", "CURRENT ROW"]),
    st.sampled_from(["CURRENT ROW", "1 FOLLOWING", "UNBOUNDED FOLLOWING"]),
    st.sampled_from(["ROWS", "RANGE"]),
    st.booleans(),  # partitioned or global window
)


def _qf_expr(t) -> str:
    fn, lo, hi, mode, part = t
    if (lo, hi) == ("CURRENT ROW", "CURRENT ROW") and mode == "RANGE":
        mode = "ROWS"  # same semantics on a unique key; avoid degenerate RANGE
    if lo == "CURRENT ROW" and hi == "CURRENT ROW":
        frame = f"{mode} BETWEEN CURRENT ROW AND CURRENT ROW"
    else:
        frame = f"{mode} BETWEEN {lo} AND {hi}"
    p = "PARTITION BY g " if part else ""
    body = f"{fn}(k) OVER ({p}ORDER BY k {frame})"
    if fn in ("SUM", "COUNT"):
        body = f"CAST({body} AS BIGINT)"
    return body


_QF_QUALIFY = st.one_of(
    # rank-on-a-window head: the canonical top-n-per-group
    st.tuples(st.integers(1, 4), st.booleans()).map(
        lambda t: f"ROW_NUMBER() OVER (PARTITION BY g ORDER BY k{' DESC' if t[1] else ''}) <= {t[0]}"
    ),
    # framed aggregate compared to a constant inside QUALIFY itself
    st.tuples(_QF_FRAME, st.integers(0, 40)).map(
        lambda t: f"{_qf_expr(t[0])} > {t[1]}"
    ),
    # alias-reference form: filter on the projected window's alias
    st.integers(0, 40).map(lambda n: f"w > {n}"),
    # boolean structure: AND/OR of two window predicates
    st.tuples(st.integers(1, 3), st.integers(10, 30)).map(
        lambda t: f"ROW_NUMBER() OVER (PARTITION BY g ORDER BY k) <= {t[0]} "
        f"OR CAST(SUM(k) OVER (PARTITION BY g ORDER BY k "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) > {t[1]}"
    ),
)


@given(w=_QF_FRAME, q=_QF_QUALIFY)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_window_frame_qualify_fuzz_spark_matches_duckdb(spark, sf_dir, _duck, w, q):
    from tests.compare import normalize_rows
    from universql_spark.dialect import snowflake_to_spark
    from universql_spark.queries import ensure_views

    ensure_views(spark, sf_dir)
    src = "(SELECT n_nationkey AS k, n_regionkey AS g FROM nation)"
    sql = (
        f"SELECT k, g, {_qf_expr(w)} AS w FROM {src} QUALIFY {q} ORDER BY k"
    )
    s_tbl = spark.sql(snowflake_to_spark(sql)).toArrow()
    s_rows = [tuple(r[c] for c in s_tbl.column_names) for r in s_tbl.to_pylist()]
    d_tbl = _duck.execute(sql).arrow()
    d_rows = [tuple(r[c] for c in d_tbl.column_names) for r in d_tbl.to_pylist()]
    assert normalize_rows(list(s_tbl.column_names), s_rows) == normalize_rows(
        list(d_tbl.column_names), d_rows
    ), sql
