"""Flagship TPC-H-derived queries, adapted to the reduced fixture
schema (FIXTURES.md: no partsupp; lineitem lacks commit/receipt
dates; orders lacks shippriority — Q3 groups on o_orderpriority
instead). These double as the bench suite and the driver's
``entry()`` smoke query.

Scale notes (100 TB posture): Q1/Q6 are scan+partial-agg —
shuffle-light by construction (map-side combine, 2-3 groups). Q3/Q5/
Q10 join the lineitem fact to dims: region/nation are broadcast
always; customer/orders/supplier stay shuffle-hash/sort-merge on the
key and benefit from AQE. No query collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exact import SQL_REVENUE, davg, dcol, dsum, dsum_expr, revenue_dec, sql_davg, sql_dsum, sql_dsum_expr
from ..io import table
from ..registry import query

_Q1_CUTOFF = "2000-09-02"


@query(
    "tpch_q1",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum_expr(SQL_REVENUE)} AS sum_disc_price,
       {sql_dsum_expr(SQL_REVENUE + ' * (1 + CAST(l_tax AS DECIMAL(18,2)))')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
    category="plans",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: scan -> pushed filter -> hash agg.

    2-key x 8-agg grouped aggregation; Catalyst emits partial
    (map-side) + final hash aggregate, so the shuffle moves only
    ~6 group rows per task regardless of input size.

    r14: the r13 spread_table repartition was REMOVED — the driver
    measured it a loss (1.78 s @32 vs r12's 1.37 s, 8c/32c ratio
    0.67) and it broke the one-Exchange plan contract: repartitioning
    600 K wide rows costs more than the single-task exact-DECIMAL
    partial agg it parallelizes.
    """
    l = table(spark, sf_dir, "lineitem")
    ep, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        l.where(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(ep).alias("sum_base_price"),
            dsum_expr(revenue_dec()).alias("sum_disc_price"),
            dsum_expr(revenue_dec() * (1 + dcol(tax))).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(ep).alias("avg_price"),
            davg(disc).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    oracle=f"""
SELECT l_orderkey,
       {sql_dsum_expr(SQL_REVENUE)} AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""",
    category="plans",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (o_orderpriority stands in for the
    absent o_shippriority). Deterministic top-10 via full tie-break
    (revenue desc, o_orderdate, l_orderkey)."""
    c, o, l = (table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-03-15").cast("timestamp")
    # r13 (guide §3.1): the dims-first chain let Catalyst broadcast
    # the FILTERED LINEITEM into the final join (BuildRight of the
    # fact table, plans/r13/tpch_q3_before.txt (13) — impossible at
    # 100 TB where even the filtered fact side is huge).  Fact-first
    # with SHUFFLE_HASH on the customer⋈orders side: one orderkey
    # shuffle, order-side build.  1.06 s -> 0.55 s isolated.
    co = (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .hint("shuffle_hash")
    )
    return (
        l.where(F.col("l_shipdate") > cutoff)
        .join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum_expr(revenue_dec()).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle=f"""
SELECT n_name,
       {sql_dsum_expr(SQL_REVENUE)} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
    category="plans",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier revenue: 6-table star join.

    region/nation are broadcast (bounded at 5/25 rows at every scale
    factor); the fact-side joins shuffle on their keys and AQE picks
    broadcast for customer/supplier when the filtered side is small.
    """
    r, n, c, o, l, s = (
        table(spark, sf_dir, t)
        for t in ("region", "nation", "customer", "orders", "lineitem", "supplier")
    )
    # r13 (guide §3.1): the dims-first chain let Catalyst broadcast
    # LINEITEM into join (23) of plans/r13/tpch_q5_before.txt (a
    # fact-table HashedRelation; impossible at 100 TB).  Fact-first:
    # region/nation/customer fold into the filtered orders
    # (broadcast dims), lineitem joins the slim order table with
    # SHUFFLE_HASH on the one fundamental orderkey shuffle, and the
    # bounded supplier table broadcasts last.  1.27 s -> 0.55 s
    # isolated.
    dims = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "n_nationkey", "n_name")
    )
    o2 = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "n_nationkey", "n_name")
        .hint("shuffle_hash")
    )
    return (
        l.join(o2, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("n_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            dsum_expr(revenue_dec()).alias("revenue")
        )
    )


@query(
    "tpch_q6",
    oracle=f"""
SELECT {sql_dsum_expr('CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    category="plans",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change: pure scan + pushed
    predicates + global agg. All four predicates are sargable and
    reach the parquet reader (PushedFilters)."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum_expr(dcol(F.col("l_extendedprice")) * dcol(F.col("l_discount"))).alias("revenue"))
    )


@query(
    "tpch_q10",
    oracle=f"""
SELECT c_custkey, c_name,
       {sql_dsum_expr(SQL_REVENUE)} AS revenue,
       c_acctbal, n_name, c_mktsegment
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-10-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    category="plans",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 customers by lost
    revenue in a quarter. nation broadcast; deterministic order via
    (revenue desc, c_custkey)."""
    c, o, l, n = (
        table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem", "nation")
    )
    # r13 (guide §3.1): Catalyst broadcast the filtered LINEITEM into
    # join (13) of plans/r13/tpch_q10_before.txt; fact-first with
    # SHUFFLE_HASH on the customer⋈orders side keeps the fact table
    # the stream side of the one orderkey shuffle.  0.85 s -> 0.44 s
    # isolated.
    co = (
        c.join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .hint("shuffle_hash")
    )
    return (
        l.where(F.col("l_returnflag") == "R")
        .join(co, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            dsum_expr(revenue_dec()).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q14",
    oracle=f"""
SELECT 100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                              THEN {SQL_REVENUE} ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / {sql_dsum_expr(SQL_REVENUE)} AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
""",
    category="plans",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect (adapted: p_type has no 'PROMO%'
    prefix family in the fixtures, so the predicate is equality).
    part broadcasts under AQE after the month filter shrinks
    lineitem; both revenue sums are exact decimal."""
    l, p = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    rev = revenue_dec()
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q18",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       {sql_dsum('o_totalprice')} AS totalprice,
       {sql_dsum('l_quantity')} AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""",
    category="plans",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: semi-join against an
    aggregated subquery (orders whose total quantity exceeds 250),
    then re-aggregate with customer context. The HAVING subquery is
    a left-semi join on orderkey — the aggregate runs once, shuffles
    once."""
    c, o, l = (table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem"))
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .where(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            big.withColumnRenamed("l_orderkey", "big_orderkey"),
            F.col("o_orderkey") == F.col("big_orderkey"),
            "left_semi",
        )
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("o_totalprice")).alias("totalprice"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )
