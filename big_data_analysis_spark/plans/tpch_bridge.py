"""The remaining TPC-H-derived queries (Q2/Q9/Q11/Q12/Q16/Q20/Q21),
adapted over the LINEITEM BRIDGE — completing the 22-query suite on
the reduced fixture schema.

These seven queries canonically need `partsupp` (Q2/Q9/Q11/Q16/Q20)
or `l_commitdate`/`l_receiptdate`/`l_shipmode` (Q12/Q21), none of
which exist in the fixtures (FIXTURES.md).  The adaptations keep each
query's SHAPE — the plan structure the benchmark exercises — while
swapping the missing inputs for deterministic stand-ins:

- part-supplier catalog := the observed DISTINCT (l_partkey,
  l_suppkey) pairs in lineitem, with supply cost := MIN observed
  l_extendedprice (Q2) or the flat proxy 0.6 * p_retailprice
  (Q9/Q11 — kept exact by computing 10x-scaled decimal amounts and
  dividing once at the end, so both engines sum identical integers);
- lateness := l_shipdate more than N days after o_orderdate (Q12:
  60 days -> SLOW/FAST service classes standing in for shipmode;
  Q21: 90 days, matching tpch_q4's adaptation);
- the Q16 "customer complaints" supplier exclusion := suppliers with
  negative s_acctbal;
- Q20's "excess availability" := suppliers whose 1997 shipments of
  the target parts exceed the uniform one-year share (1/7th) of
  their all-time shipments of them.

Scale notes: identical posture to plans/tpch.py — exact-decimal
aggregates (exact.py) everywhere, bounded dims (part 2k rows,
supplier 100, nation 25) broadcast, correlated subqueries expressed
as semi/anti joins or broadcast scalar aggregates, the fact table
shuffles once per aggregation grain.  No driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..exact import SQL_REVENUE, dcol, revenue_dec
from ..io import table
from ..registry import query


@query(
    "tpch_q2",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS c
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
       CAST(c AS DOUBLE) AS supply_cost
FROM cost
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_type = 'SMALL' AND p_size BETWEEN 10 AND 20 AND n_regionkey = 3
QUALIFY c = MIN(c) OVER (PARTITION BY p_partkey)
""",
    category="plans",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (adapted: the part-supplier
    catalog is the distinct (l_partkey, l_suppkey) pairs observed in
    lineitem; supply cost is the MIN observed extended price, exact
    decimal so the min-equality join-back cannot be perturbed by
    float noise). For each SMALL part in the size band, the
    EUROPE-region supplier(s) achieving the minimum cost — the
    correlated MIN subquery decorrelated into a per-part window min.

    Plan: lineitem aggregates once on (partkey, suppkey); part/
    supplier/nation broadcast; the window partitions on partkey
    (high-cardinality, no global sort)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_type") == "SMALL") & F.col("p_size").between(10, 20)
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 3)
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dcol(F.col("l_extendedprice"))).alias("c")
    )
    joined = (
        cost.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        joined.withColumn("mc", F.min("c").over(w))
        .where(F.col("c") == F.col("mc"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("c").cast("double").alias("supply_cost"),
        )
    )


@query(
    "tpch_q9",
    oracle=f"""
SELECT nation, o_year, CAST(SUM(amount_x10) AS DOUBLE) / 10 AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         ({SQL_REVENUE}) * 10
           - CAST(p_retailprice AS DECIMAL(18,2)) * 6
             * CAST(l_quantity AS DECIMAL(18,2)) AS amount_x10
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
""",
    category="plans",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit (adapted: no ps_supplycost, so
    cost is the flat proxy 0.6 * p_retailprice). Profit per supplier
    nation per order year over 'red' parts. Exactness: amounts are
    computed 10x-scaled so revenue*10 and retail*6*qty are BOTH
    integral decimals — the sum is bit-identical across engines and
    divided back once as a double.

    Plan: part filter broadcast-joins and prunes the fact early;
    supplier/nation broadcast; orders joins on orderkey (the one big
    shuffle); 2-key hash agg with map-side partials."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount_x10 = revenue_dec() * 10 - dcol(F.col("p_retailprice")) * 6 * dcol(
        F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount_x10.alias("amount_x10"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("amount_x10").cast("double") / 10).alias("sum_profit"))
    )


@query(
    "tpch_q11",
    oracle="""
WITH v AS (
  SELECT l_partkey AS ps_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))
             * CAST(p_retailprice AS DECIMAL(18,2)) * 6) AS val
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_regionkey = 3
  GROUP BY l_partkey
),
t AS (SELECT SUM(val) AS tot FROM v)
SELECT ps_partkey, CAST(val AS DOUBLE) / 10 AS value
FROM v, t
WHERE val * 1000 > tot
""",
    category="plans",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock identification (adapted: stock value
    of a part := shipped quantity x the 0.6*p_retailprice cost proxy,
    restricted to EUROPE-region suppliers; the original's
    ps_availqty x ps_supplycost over one nation). Parts whose value
    exceeds 0.1% of the total — the HAVING-vs-global-scalar shape.
    The threshold compare (val*1000 > tot) happens in exact decimal,
    so the cut is bit-deterministic on both engines.

    Plan: one fact aggregation on partkey; the global total is a
    1-row broadcast cross join (no second fact scan of a re-agg —
    the per-part rollup re-aggregates)."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 3)
    v = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum(
                dcol(F.col("l_quantity")) * dcol(F.col("p_retailprice")) * 6
            ).alias("val")
        )
    )
    tot = v.agg(F.sum("val").alias("tot"))
    return (
        v.crossJoin(F.broadcast(tot))
        .where(F.col("val") * 1000 > F.col("tot"))
        .select(
            "ps_partkey", (F.col("val").cast("double") / 10).alias("value")
        )
    )


@query(
    "tpch_q12",
    oracle="""
SELECT delay_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM (
  SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
              THEN 'SLOW' ELSE 'FAST' END AS delay_class,
         o_orderpriority
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY delay_class
ORDER BY delay_class
""",
    category="plans",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode service levels (adapted: no
    l_shipmode/l_commitdate/l_receiptdate, so the grouping mode is a
    derived SLOW/FAST service class — shipped more vs. at most 60
    days after ordering — and lateness is implicit in the class).
    Per class, how many line items belong to high- vs low-priority
    orders — the classic conditional-sum pivot.

    Plan: one orderkey join (the fact shuffle), then a 1-key hash
    agg of two conditional sums; the ship-year filter pushes to the
    lineitem scan."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    year = l.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    delay_class = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
        "SLOW",
    ).otherwise("FAST")
    return (
        year.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(delay_class.alias("delay_class"), high.alias("high"))
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(F.col("high"), 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(F.col("high"), 0).otherwise(1)).alias(
                "low_line_count"
            ),
        )
        .orderBy("delay_class")
    )


@query(
    "tpch_q16",
    oracle="""
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
    category="plans",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship (adapted: the
    part-supplier catalog is lineitem's observed pairs; the
    "customer complaints" exclusion list is suppliers with negative
    account balance). Distinct supplier count per surviving (brand,
    type, size) combination.

    Plan: part filter broadcasts and prunes the fact; the exclusion
    NOT IN is a broadcast anti-join (its subquery is bounded: 100
    suppliers); distinct count aggregates once on 3 bounded keys."""
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20",
    oracle="""
WITH target AS (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'),
shipped AS (
  SELECT l_suppkey,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate <  TIMESTAMP '1998-01-01'
                  THEN CAST(l_quantity AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS q97,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qall
  FROM lineitem JOIN target ON p_partkey = l_partkey
  GROUP BY l_suppkey
)
SELECT s_name, s_acctbal
FROM shipped
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE n_regionkey = 3 AND q97 * 7 > qall
ORDER BY s_name
""",
    category="plans",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion (adapted: no ps_availqty,
    so "excess availability" is a shipment-concentration test —
    EUROPE-region suppliers whose 1997 shipments of 'blue' parts
    exceed their uniform one-year share (1/7th of the fixture's
    7-year date span) of all-time shipments of them; the
    exact-decimal quantity sums make the cut bit-deterministic). The original's
    nested IN chain survives as: target-part semi filter -> per-
    supplier conditional rollup -> supplier/nation joins.

    Plan: the part list broadcasts (a semi filter on the fact scan);
    one supplier-grain aggregation; supplier/nation broadcast."""
    l = table(spark, sf_dir, "lineitem")
    target = table(spark, sf_dir, "part").where(F.col("p_name").like("blue%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 3)
    in97 = (
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    qty = dcol(F.col("l_quantity"))
    zero = F.lit(0).cast("decimal(18,2)")
    shipped = (
        l.join(
            F.broadcast(target),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in97, qty).otherwise(zero)).alias("q97"),
            F.sum(qty).alias("qall"),
        )
    )
    return (
        shipped.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .where(F.col("q97") * 7 > F.col("qall"))
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q21",
    oracle="""
WITH l2 AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
),
per AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
  FROM l2 GROUP BY l_orderkey
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per
JOIN supplier ON s_suppkey = late_supp
JOIN nation   ON n_nationkey = s_nationkey
WHERE n_supp > 1 AND n_late = 1 AND n_regionkey = 3
GROUP BY s_name
""",
    category="plans",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting (adapted:
    lateness is l_shipdate > o_orderdate + 90 days, the same rule as
    tpch_q4, since commit/receipt dates don't exist). For finalized
    orders with at least two suppliers where EXACTLY ONE supplier was
    late, count blamed orders per EUROPE-region supplier. The
    original's EXISTS/NOT-EXISTS self-join pair collapses into one
    per-order rollup: distinct-supplier count, distinct-late count,
    and the blamed supplier (MAX over a single-element set, so no
    nondeterminism) — one pass over the fact instead of three.

    Plan: orderkey join (fact shuffle #1), per-order rollup (#2 on
    orderkey — co-partitioned with the join output so AQE can avoid
    re-exchange), then a bounded supplier-grain count; supplier/
    nation broadcast."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 3)
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
        1,
    ).otherwise(0)
    l2 = l.join(o, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "l_orderkey", "l_suppkey", late.alias("late")
    )
    per = l2.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    return (
        per.where((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("late_supp"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
