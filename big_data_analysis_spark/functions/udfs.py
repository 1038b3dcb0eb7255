"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

Hierarchy, fastest first: built-ins (JVM codegen — everything outside
this module) > Arrow-batched pandas UDFs (~10-100x faster than row
UDFs) > row-at-a-time Python UDFs (present for API completeness only,
never in a hot path).

Oracle-parity note: every numeric kernel below sticks to integer-
exact arithmetic (integral doubles < 2^53, moment formulas from exact
sums) so Python/NumPy results hash-match the DuckDB oracle — NumPy
pairwise summation over arbitrary doubles would not.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import register_views, table
from ..registry import query


@query(
    "udf_python",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_band
FROM orders
""",
    category="udf",
)
def udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the discouraged slow path: one
    Python call per row, no codegen, no Arrow batching)."""

    @F.udf(T.StringType())
    def band(price: float) -> str:
        if price >= 300000:
            return "high"
        if price >= 100000:
            return "mid"
        return "low"

    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", band("o_totalprice").alias("price_band"))


@query(
    "udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
""",
    category="udf",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches, NumPy kernel) —
    identical IEEE element-wise arithmetic to the SQL expression, so
    the results are bit-exact."""

    @F.pandas_udf(T.DoubleType())
    def revenue(ep: pd.Series, disc: pd.Series) -> pd.Series:
        return ep * (1 - disc)

    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        revenue("l_extendedprice", "l_discount").alias("revenue"),
    )


@query(
    "udf_pandas_agg",
    oracle="""
SELECT l_returnflag,
       SUM(l_quantity) AS total_qty,
       AVG(l_quantity) AS avg_qty
FROM lineitem
GROUP BY l_returnflag
""",
    category="udf",
)
def udf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Series -> scalar inside
    groupBy.agg). Quantity is integral-valued, so the NumPy sum is
    exact in any order and hash-matches SUM()."""

    @F.pandas_udf(T.DoubleType())
    def qty_sum(q: pd.Series) -> float:
        return float(q.sum())

    @F.pandas_udf(T.DoubleType())
    def qty_avg(q: pd.Series) -> float:
        # integral sum / exact count — same double division as AVG()
        return float(q.sum()) / len(q)

    # pandas aggregate UDFs cannot mix with JVM aggregates in one
    # agg() — both aggregates are pandas-side here
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        qty_sum("l_quantity").alias("total_qty"),
        qty_avg("l_quantity").alias("avg_qty"),
    )


@query(
    "udf_grouped_map",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS ss
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       (l.l_quantity - m.s / m.n)
         / SQRT((m.ss - m.s * m.s / m.n) / (m.n - 1)) AS qty_z
FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
""",
    category="udf",
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group DataFrame transform via applyInPandas: z-normalize
    quantity within each returnflag group. The kernel derives
    mean/std from exact integer power sums with the same double
    expression as the oracle — NumPy's pairwise-summed .std() would
    differ in the last ulps."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("qty_z", T.DoubleType()),
        ]
    )

    def znorm(pdf: pd.DataFrame) -> pd.DataFrame:
        q = pdf["l_quantity"].to_numpy()
        qi = q.astype(np.int64)
        n = float(len(qi))
        s = float(qi.sum())
        ss = float((qi * qi).sum())
        mean = s / n
        std = np.sqrt((ss - s * s / n) / (n - 1))
        return pd.DataFrame(
            {
                "l_orderkey": pdf["l_orderkey"],
                "l_linenumber": pdf["l_linenumber"],
                "l_returnflag": pdf["l_returnflag"],
                "qty_z": (q - mean) / std,
            }
        )

    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    return l.groupBy("l_returnflag").applyInPandas(znorm, schema)


@query(
    "udf_map_in_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       l_quantity * 2 AS qty_doubled
FROM lineitem
WHERE l_quantity > 45
""",
    category="udf",
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition batch iterator (mapInPandas) — the custom-
    operator escape hatch: arbitrary Python over Arrow batches with
    streaming (batch-at-a-time) memory behavior."""
    schema = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("qty_doubled", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[pdf["l_quantity"] > 45].copy()
            out["qty_doubled"] = out["l_quantity"] * 2
            yield out[["l_orderkey", "l_linenumber", "l_quantity", "qty_doubled"]]

    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return l.mapInPandas(kernel, schema)


@query(
    "udtf_python",
    oracle="""
SELECT doc_id, pos, tok
FROM (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
)
WHERE doc_id < 20
""",
    category="udf",
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one document row in ->
    N (pos, token) rows out, lateral-joined to the source."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, tok: string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" "), start=1):
                yield i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.tok
        FROM docs_for_udtf d, LATERAL tokenize_udtf(d.text) t
        """
    )


@query(
    "udf_sql_registered",
    oracle="""
SELECT o_orderkey,
       length(o_orderpriority) + CAST(o_orderkey % 7 AS INT) AS mixed_key
FROM orders
""",
    category="udf",
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDF registered into the SQL catalog and called from a
    SQL string (spark.udf.register)."""

    def mixed_key(priority: str, orderkey: int) -> int:
        return len(priority) + orderkey % 7

    spark.udf.register("mixed_key_udf", mixed_key, T.IntegerType())
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        "SELECT o_orderkey, mixed_key_udf(o_orderpriority, o_orderkey) AS mixed_key "
        "FROM orders"
    )
