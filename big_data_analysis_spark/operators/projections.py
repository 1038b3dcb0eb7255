"""Projections, derived columns and predicate filters (SURVEY.md §2.2).

All predicates here are sargable and reach the parquet scan
(PushedFilters in .explain) — column pruning + predicate pushdown are
the whole performance story for this family at 100 TB: a scan that
reads 3 of 11 lineitem columns moves ~27% of the bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exact import revenue_dec
from ..io import table
from ..registry import query


@query(
    "project_select",
    oracle="""
SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment
FROM customer
""",
    category="projections",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column subset + rename; scan reads only 3 of 5 columns."""
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "project_expr",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       l_quantity * 2 AS double_qty
FROM lineitem
""",
    category="projections",
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived arithmetic columns (exact-decimal revenue per row)."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        revenue_dec().cast("double").alias("revenue"),
        (F.col("l_quantity") * 2).alias("double_qty"),
    )


@query(
    "filter_pred",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
FROM lineitem
WHERE (l_returnflag = 'A' AND l_quantity > 30) OR NOT (l_linestatus = 'F')
""",
    category="projections",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR/NOT predicate."""
    l = table(spark, sf_dir, "lineitem")
    return l.where(
        ((F.col("l_returnflag") == "A") & (F.col("l_quantity") > 30))
        | ~(F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity")


@query(
    "filter_in",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
""",
    category="projections",
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list membership (compiles to pushed In filter)."""
    return (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "filter_between",
    oracle="""
SELECT l_orderkey, l_linenumber, l_shipdate
FROM lineitem
WHERE l_shipdate BETWEEN TIMESTAMP '1997-06-01' AND TIMESTAMP '1997-08-31'
""",
    category="projections",
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate on the date-valued timestamp column."""
    return (
        table(spark, sf_dir, "lineitem")
        .where(
            F.col("l_shipdate").between(
                F.lit("1997-06-01").cast("timestamp"),
                F.lit("1997-08-31").cast("timestamp"),
            )
        )
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@query(
    "filter_null",
    oracle="""
SELECT c.c_custkey,
       NULLIF(c.c_mktsegment, 'BUILDING') AS seg_or_null,
       o.o_orderkey
FROM customer c
LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
  ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey IS NULL AND NULLIF(c.c_mktsegment, 'BUILDING') IS NOT NULL
""",
    category="projections",
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: the fixtures carry no NULLs (FIXTURES.md), so
    nulls are manufactured via an outer join miss + NULLIF, then
    filtered with IS NULL / IS NOT NULL."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            "c_custkey",
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
            "o_orderkey",
        )
        .where(F.col("o_orderkey").isNull() & F.col("seg_or_null").isNotNull())
    )


@query(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_brand
FROM part
WHERE p_name LIKE '%widget' AND regexp_matches(p_brand, '^Brand#[0-9]$')
""",
    category="projections",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE suffix pattern + anchored regexp (POSIX-simple so Java
    and RE2-style engines agree)."""
    return (
        table(spark, sf_dir, "part")
        .where(
            F.col("p_name").like("%widget")
            & F.col("p_brand").rlike("^Brand#[0-9]$")
        )
        .select("p_partkey", "p_name", "p_brand")
    )
