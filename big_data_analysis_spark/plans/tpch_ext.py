"""Extended TPC-H-derived flagship queries (Q4/Q7/Q8/Q13/Q15/Q17/
Q19/Q22), adapted to the reduced fixture schema exactly like
plans/tpch.py (FIXTURES.md: no partsupp; lineitem lacks commit/
receipt dates and shipmode; customer lacks phone; part lacks
container/mfgr — each adaptation is noted per query). Q2/Q9/Q11/Q12/
Q16/Q20/Q21 — the rows needing partsupp or receipt/commit dates —
live in plans/tpch_bridge.py (r6), adapted over the lineitem
part-supplier bridge; the 22-query suite is complete.

Scale notes: every query keeps the engine's exact-decimal aggregate
convention (exact.py) so results are layout/order independent;
bounded dims (nation/region) broadcast; correlated EXISTS/IN
subqueries are expressed as semi/anti joins (one shuffle each, no
per-row subquery execution); scalar subqueries (Q15 max, Q17 per-part
avg, Q22 global avg) become window/broadcast aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..exact import SQL_REVENUE, dsum, dsum_expr, revenue_dec, sql_dsum, sql_dsum_expr
from ..io import table
from ..registry import query


@query(
    "tpch_q4",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate <  TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    category="plans",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking (adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" = a lineitem shipped more
    than 90 days after the order date). The correlated EXISTS is a
    left-semi join on orderkey with the lateness predicate in the
    join condition — one shuffle, no per-order subquery."""
    o, l = table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    quarter = o.where(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
    return (
        quarter.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q7",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, {sql_dsum_expr('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l_shipdate) AS l_year,
         {SQL_REVENUE} AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    category="plans",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations (fixture nation
    names NATION_12/NATION_10), revenue per (supp_nation, cust_nation,
    year). Both nation joins broadcast; EXTRACT(YEAR) stays in the
    shuffle key, not a post-agg recompute."""
    s, l, o, c, n = (
        table(spark, sf_dir, t)
        for t in ("supplier", "lineitem", "orders", "customer", "nation")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10")
    ) | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_12"))
    return (
        s.join(
            l.where(
                (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            revenue_dec().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum_expr(F.col("volume")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8",
    oracle=f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / {sql_dsum_expr('volume')} AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         {SQL_REVENUE} AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
    category="plans",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_2's share of ECONOMY-
    part revenue sold into ASIA per order year. Share = exact-decimal
    conditional sum / exact-decimal total, divided as doubles — a
    single identical rounding in both engines."""
    p, l, s, o, c, n, r = (
        table(spark, sf_dir, t)
        for t in ("part", "lineitem", "supplier", "orders", "customer", "nation", "region")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    vol = F.col("volume")
    return (
        p.where(F.col("p_type") == "ECONOMY")
        .join(l, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            revenue_dec().alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q13",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    category="plans",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution (adapted: orders
    has no comment column, so the excluded class is the 1-URGENT
    priority instead of 'special requests'). Two aggregations: per
    customer, then histogram over counts — both map-side combinable."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q15",
    oracle=f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no, {sql_dsum_expr(SQL_REVENUE)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
""",
    category="plans",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier (the CREATE VIEW formulation becomes a
    CTE): per-supplier quarterly revenue, keep the max. The scalar
    MAX subquery is a one-row ``agg(max)`` broadcast-cross-joined back
    onto the rollup — suppliers scale with SF (10k/sf), so an
    empty-partition Window over the rollup would funnel millions of
    rows through one task at the 100 TB target; the agg+broadcast
    shape keeps the max reduction map-side-partial and fully parallel.
    Revenue is exact decimal, so the equality against MAX is
    bit-deterministic."""
    l, s = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "supplier")
    rev = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum_expr(revenue_dec()).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    top = rev.crossJoin(F.broadcast(mx)).where(
        F.col("total_revenue") == F.col("mx")
    )
    return (
        s.join(F.broadcast(top), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q17",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey
  )
""",
    category="plans",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue (adapted: no
    p_container, brand filter only). The correlated per-part AVG
    subquery is one aggregation over lineitem joined back on partkey
    — two scans total, no per-row subquery. l_quantity is integral
    (exact double sums), so 0.2*avg is bit-identical cross-engine."""
    l, p = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    per_part = l.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        l.join(
            F.broadcast(p.where(F.col("p_brand") == "Brand#1")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(per_part, F.col("ap_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly")
        )
    )


@query(
    "tpch_q19",
    oracle=f"""
SELECT {sql_dsum_expr(SQL_REVENUE)} AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
""",
    category="plans",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue, disjunctive brand/size/quantity
    classes (adapted: no p_container/shipmode legs). The OR-of-ANDs
    stays a single join predicate — Catalyst extracts the common
    p_partkey equi-key and pushes the residual disjunction as a
    post-join filter."""
    l, p = table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cls = (
        ((F.col("p_brand") == "Brand#1") & sz.between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & sz.between(1, 25) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 35) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .where(cls)
        .agg(dsum_expr(revenue_dec()).alias("revenue"))
    )


@query(
    "tpch_q22",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
  FROM customer
  WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
)
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
  AND c_acctbal > avg_bal.v
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY cntrycode
""",
    category="plans",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity (adapted: no c_phone, so
    the country code is c_nationkey directly). Wealthy-but-inactive
    customers: above-average balance (scalar subquery -> broadcast
    1-row cross join, exact-decimal avg) with no RECENT orders
    (adapted: every fixture customer has at least one order ever, so
    the NOT EXISTS is scoped to orders since 2000; left-anti join on
    custkey)."""
    c, o = table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    codes = [1, 2, 3, 4, 5, 6, 7]
    eligible = c.where(F.col("c_nationkey").isin(codes))
    avg_bal = eligible.where(F.col("c_acctbal") > 0.0).agg(
        (dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("v")
    )
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("v"))
        .join(
            o.where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
