"""TPC-H-style analytical queries over the fixture star schema, DataFrame-API
first. These cover the join/agg surface the reference delegates to DuckDB
(SURVEY.md §2.7-2.8) in the shape Spark executes best:

- dimension tables (region/nation/supplier/customer) are broadcast — no
  shuffle of the fact table for the join, which is THE decision that matters
  at 100 TB (lineitem shuffles only for its own aggregation keys);
- aggregations are partial (map-side combine) by construction of groupBy.agg;
- double sums follow the DECIMAL convention from queries/__init__ so the
  DuckDB oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from universql_spark.queries import register
from universql_spark.queries.clickbench import davg, dsum


def _dsum(colexpr: str, alias: str) -> F.Column:
    return F.expr(dsum(colexpr)).alias(alias)


def _davg(colexpr: str, alias: str) -> F.Column:
    return F.expr(davg(colexpr)).alias(alias)


REVENUE = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_q1",
    f"""SELECT l_returnflag, l_linestatus,
       {dsum('l_quantity')} AS sum_qty,
       {dsum('l_extendedprice')} AS sum_base_price,
       {dsum(REVENUE)} AS sum_disc_price,
       {dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg('l_quantity')} AS avg_qty,
       {davg('l_extendedprice')} AS avg_price,
       {davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    bench=True,
    category="tpch",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: full-scan groupBy with 8 aggregates.

    Single shuffle on the (low-cardinality) grouping keys; partial aggregation
    collapses each map partition to ~6 rows before the exchange, so the plan
    is scan-bound at any scale.
    """
    li = spark.table("lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity", "sum_qty"),
            _dsum("l_extendedprice", "sum_base_price"),
            _dsum(REVENUE, "sum_disc_price"),
            _dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"),
            _davg("l_quantity", "avg_qty"),
            _davg("l_extendedprice", "avg_price"),
            _davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "tpch_q3",
    f"""SELECT l_orderkey, {dsum(REVENUE)} AS revenue, CAST(o_orderdate AS DATE) AS odate
FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    bench=True,
    category="tpch",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: 3-way join.

    customer (a dim, filtered on segment) broadcasts into orders; the
    orders<->lineitem join is fact-to-fact and stays a shuffle join on
    l_orderkey — no hint, so AQE may still broadcast it at small SF while the
    same plan survives 100 TB.
    """
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = spark.table("customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = spark.table("orders").filter(F.col("o_orderdate") < cutoff)
    li = spark.table("lineitem").filter(F.col("l_shipdate") > cutoff)
    joined = li.join(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
        li.l_orderkey == orders.o_orderkey,
    )
    return (
        joined.groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("odate"))
        .agg(_dsum(REVENUE, "revenue"))
        .select("l_orderkey", "revenue", "odate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q4_semi",
    """SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    category="tpch",
)
def tpch_q4_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority checking via LEFT SEMI join (EXISTS).

    Semi join never duplicates or carries lineitem payload columns — the
    probe side streams, only the existence bit survives.
    """
    orders = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = spark.table("lineitem").filter(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q5",
    f"""SELECT n_name, {dsum(REVENUE)} AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name ORDER BY revenue DESC, n_name""",
    bench=True,
    category="tpch",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-table star join.

    region->nation->supplier collapse into one broadcast dim; customer is
    broadcast too (bounded dim). The only shuffle join is lineitem<->orders
    (fact-to-fact on l_orderkey) — the correct physical shape at 100 TB.
    """
    cutlo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cuthi = F.lit("1997-01-01 00:00:00").cast("timestamp")
    region = spark.table("region").filter(F.col("r_name") == "ASIA")
    nation = spark.table("nation").join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    supplier = spark.table("supplier").join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    customer = spark.table("customer")
    orders = spark.table("orders").filter((F.col("o_orderdate") >= cutlo) & (F.col("o_orderdate") < cuthi))
    li = spark.table("lineitem")
    joined = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(customer),
            (orders.o_custkey == customer.c_custkey) & (customer.c_nationkey == supplier.s_nationkey),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(_dsum(REVENUE, "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "tpch_q6",
    f"""SELECT {dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""",
    bench=True,
    category="tpch",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change: pure scan + filter + scalar agg.

    All four predicates push into the parquet scan (PushedFilters); the
    aggregate is a single partial->final pair with no grouping key.
    """
    li = spark.table("lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(_dsum("l_extendedprice * l_discount", "revenue"))


@register(
    "tpch_q10_returns",
    f"""SELECT c_custkey, c_name, {dsum(REVENUE)} AS revenue, n_name
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00' AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name ORDER BY revenue DESC, c_custkey LIMIT 20""",
    category="tpch",
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting: fact->dim joins + top-k on aggregate."""
    orders = spark.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = spark.table("lineitem").filter(F.col("l_returnflag") == "R")
    cust = spark.table("customer")
    nation = spark.table("nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(_dsum(REVENUE, "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q18_big_orders",
    f"""SELECT c_custkey, o_orderkey, {dsum('l_quantity')} AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, o_orderkey HAVING SUM(l_quantity) > 150
ORDER BY total_qty DESC, o_orderkey LIMIT 100""",
    bench=True,
    category="tpch",
)
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: agg -> HAVING -> top-k."""
    li = spark.table("lineitem")
    orders = spark.table("orders")
    cust = spark.table("customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(_dsum("l_quantity", "total_qty"), F.sum("l_quantity").alias("_raw"))
        .filter(F.col("_raw") > 150)
        .drop("_raw")
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(100)
    )


register_q7 = register(
    "tpch_q7_volume",
    f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year, {dsum(REVENUE)} AS revenue
FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year""",
    category="tpch",
)


def tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations: disjunctive nation-pair filter
    applied post-join on two broadcast nation dims."""
    cutlo = F.lit("1996-01-01 00:00:00").cast("timestamp")
    cuthi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    li = spark.table("lineitem").filter((F.col("l_shipdate") >= cutlo) & (F.col("l_shipdate") < cuthi))
    sup = spark.table("supplier")
    orders = spark.table("orders")
    cust = spark.table("customer")
    n1 = spark.table("nation").select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = spark.table("nation").select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_dsum(REVENUE, "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


register_q7(tpch_q7_volume)

register_q14 = register(
    "tpch_q14_promo",
    f"""SELECT CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE)
     / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) * 100.0 AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'""",
    category="tpch",
)


def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue ratio: conditional aggregate over a broadcast dim
    join; the ratio of two exact decimal sums is one deterministic double op."""
    li = spark.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01 00:00:00").cast("timestamp"))
    )
    part = spark.table("part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    num = F.expr(
        "CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) "
        "ELSE 0 END AS DECIMAL(28,6))) AS DOUBLE)"
    )
    den = F.expr("CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)")
    return joined.agg((num / den * F.lit(100.0)).alias("promo_revenue"))


register_q14(tpch_q14_promo)

register_q19 = register(
    "tpch_q19_disjunct",
    f"""SELECT {dsum(REVENUE)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""",
    category="tpch",
)


def tpch_q19_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue with disjunctive cross-table predicates — the
    filter can only apply post-join, but each disjunct's single-table parts
    still push into the scans."""
    li = spark.table("lineitem")
    part = spark.table("part")
    joined = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return joined.filter(cond).agg(_dsum(REVENUE, "revenue"))


register_q19(tpch_q19_disjunct)
