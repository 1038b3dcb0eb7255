"""Set operations (SURVEY.md §2.7): UNION [ALL] / INTERSECT / EXCEPT.

unionByName is used over positional union — schema-by-name is the
only safe contract when inputs evolve independently at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query


@query(
    "set_union_all",
    oracle="""
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '2-HIGH'
""",
    category="setops",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — no shuffle, just concatenated partitions."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    b = o.where(F.col("o_orderpriority") == "2-HIGH").select(
        "o_orderkey", "o_orderpriority"
    )
    return a.unionByName(b)


@query(
    "set_union",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT o_custkey FROM orders WHERE o_totalprice > 200000
""",
    category="setops",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union = bag union + distinct (one shuffle on the row)."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_totalprice") > 200000).select("o_custkey")
    return a.unionByName(b).distinct()


@query(
    "set_intersect",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    category="setops",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having both an F and an O order (set semantics)."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
""",
    category="setops",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (EXCEPT ALL keeps multiplicity)."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.exceptAll(b)


@query(
    "set_intersect_all",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_totalprice > 100000
""",
    category="setops",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (INTERSECT ALL): each row kept min(m, n)
    times — the multiplicity-aware sibling of set_intersect, one
    shuffle on the full row like every set op."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.intersectAll(b)


@query(
    "set_except_distinct",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 300000
""",
    category="setops",
)
def set_except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT DISTINCT): presence-based removal,
    completing the §2.7 variant matrix (union/union all/intersect/
    intersect all/except/except all)."""
    o = table(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.where(F.col("o_totalprice") > 300000).select("o_custkey")
    return a.subtract(b)


@query(
    "set_union_missing_cols",
    oracle="""
SELECT o_orderkey AS id, o_totalprice AS amount, o_orderpriority AS priority,
       NULL AS balance
FROM orders WHERE o_orderkey % 7 = 0
UNION ALL BY NAME
SELECT c_custkey AS id, NULL AS amount, NULL AS priority,
       c_acctbal AS balance
FROM customer WHERE c_custkey % 5 = 0
""",
    category="setops",
)
def set_union_missing_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union: ``unionByName(allowMissingColumns=
    True)`` aligns two frames with DIFFERENT column sets, surfacing
    each side's missing columns as NULL — how a long-lived pipeline
    appends a v2 frame to a v1 archive without rewriting history.
    DuckDB twin: UNION ALL BY NAME. Positional UNION would silently
    misalign; by-name is the only union that survives schema
    evolution."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    c = table(spark, sf_dir, "customer").where(F.col("c_custkey") % 5 == 0)
    left = o.select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderpriority").alias("priority"),
    )
    right = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("balance"),
    )
    return left.unionByName(right, allowMissingColumns=True)
