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


@query(
    "udf_cogrouped_map",
    oracle="""
WITH o AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_mktsegment,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(o.spend, 0.0) AS spend
FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey
WHERE c.c_custkey % 10 = 0
""",
    category="udf",
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED pandas transform (`groupBy(...).cogroup(...)
    .applyInPandas`): both tables shuffle ONCE on the key and each
    key's two pandas frames meet in a single Python kernel — the
    escape hatch for per-key merge logic no join expresses (as-of
    matching, interval alignment, custom reconciliation). Kernel
    here: left-enrich customers with exact-decimal order totals,
    zero-filled for orderless customers — deliberately re-expressible
    as a LEFT JOIN so the whole cogroup path is oracle-checked.
    At scale this is exactly one co-partitioned shuffle per side,
    Arrow both ways, no driver involvement."""
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", "c_mktsegment")
    )
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["c_custkey", "c_mktsegment", "n_orders", "spend"]
            )
        # exact money: cents as int64, one final double conversion
        cents = (
            (right["o_totalprice"] * 100).round().astype("int64").sum()
            if not right.empty
            else 0
        )
        out = left.copy()
        out["n_orders"] = len(right)
        out["spend"] = float(cents) / 100.0
        return out

    return (
        c.groupby("c_custkey")
        .cogroup(o.groupby("o_custkey"))
        .applyInPandas(
            merge, "c_custkey long, c_mktsegment string, n_orders long, spend double"
        )
    )


@query(
    "udf_arrow_optimized",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS net_cents
FROM lineitem
WHERE l_orderkey % 40 = 0
""",
    category="udf",
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED scalar Python UDF (Spark 4 `useArrow=True`):
    same row-wise authoring model as a classic UDF but executed over
    Arrow batches — the migration path that removes pickle
    serialization without rewriting kernels as pandas. Integer-cents
    arithmetic keeps it bit-exact vs the SQL twin."""

    @F.udf(returnType=T.LongType(), useArrow=True)
    def net_cents(price: float, discount: float) -> int:
        import math

        # HALF-AWAY rounding to match SQL round(): Python's round()
        # is banker's and diverges on genuine .5 ties (price and
        # discount both 2-decimal -> the scaled product has real
        # half-cent ties). Values are positive, so floor(x+0.5) is
        # exactly SQL semantics on the identical IEEE double.
        return math.floor(price * (1 - discount) * 100 + 0.5)

    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 40 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_cents(F.col("l_extendedprice"), F.col("l_discount")).alias("net_cents"),
    )


@query(
    "udf_pandas_iter",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem
""",
    category="udfs",
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (SCALAR_ITER): the variant for
    expensive per-executor initialization — the generator body runs
    once per task, amortizing setup (model load, dictionary build)
    across every Arrow batch instead of paying it per batch. Same
    IEEE element-wise arithmetic as udf_pandas_scalar, so bit-exact
    vs the SQL twin; the difference is purely the execution contract
    (Iterator[Series-tuple] -> Iterator[Series])."""
    from pyspark.sql.functions import PandasUDFType

    # functionType passed explicitly: this module opts into
    # `from __future__ import annotations`, which stringifies type
    # hints so pandas_udf cannot infer SCALAR_ITER from them.
    @F.pandas_udf(T.DoubleType(), PandasUDFType.SCALAR_ITER)
    def revenue_iter(it):
        one = 1.0  # stand-in for per-task init amortized across batches
        for ep, disc in it:
            yield ep * (one - disc)

    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        revenue_iter("l_extendedprice", "l_discount").alias("revenue"),
    )


@query(
    "udf_apply_in_arrow",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS total_cents
FROM orders
GROUP BY o_orderpriority
""",
    category="udfs",
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map over RAW ARROW tables (``applyInArrow``, Spark 4)
    — the zero-pandas fast path of the UDF tier: each group arrives
    as a pyarrow.Table, aggregates compute inside Arrow's columnar
    kernels, and no pandas conversion (with its dtype coercions)
    ever happens. The integer-cents sum keeps the result exact, so
    the Arrow path is graded bit-for-bit against the SQL twin like
    every other UDF row. At 100 TB this halves the Python-side
    serialization cost vs applyInPandas for numeric kernels."""
    import pyarrow as pa
    import pyarrow.compute as pc

    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )

    def agg(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": [t.column("o_orderpriority")[0].as_py()],
                "n": [t.num_rows],
                "total_cents": [pc.sum(t.column("cents")).as_py()],
            }
        )

    return o.groupBy("o_orderpriority").applyInArrow(
        agg, "o_orderpriority string, n bigint, total_cents bigint"
    )


@query(
    "udtf_table_arg",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events
GROUP BY event_type
""",
    category="udf",
)
def udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE argument (Spark 4):
    ``my_udtf(TABLE(t) PARTITION BY key)`` streams each partition's
    rows through ONE stateful UDTF instance (eval per row, terminate
    at partition end) — the SQL-native custom-aggregation surface,
    the table-function analogue of applyInPandas. Exact integer
    cents arithmetic; oracle is the plain grouped aggregate.

    At 100 TB: PARTITION BY is a hash shuffle on the key, then each
    partition is a single-pass Python stream — state is one
    accumulator per key, never the partition's rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="event_type: string, n: bigint, total_cents: bigint")
    class TypeSummary:
        def __init__(self):
            self.etype = None
            self.n = 0
            self.cents = 0

        def eval(self, row):
            self.etype = row["event_type"]
            self.n += 1
            self.cents += int(round(row["value"] * 100))

        def terminate(self):
            if self.etype is not None:
                yield self.etype, self.n, self.cents

    spark.udtf.register("type_summary_udtf", TypeSummary)
    table(spark, sf_dir, "events").select("event_type", "value").createOrReplaceTempView(
        "events_for_udtf"
    )
    return spark.sql(
        """
        SELECT * FROM type_summary_udtf(
          TABLE(events_for_udtf) PARTITION BY event_type
        )
        """
    )


@query(
    "udtf_arrow",
    oracle="""
SELECT doc_id, token,
       CAST(COUNT(*) AS BIGINT) AS tf
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE doc_id < 30
)
GROUP BY doc_id, token
""",
    category="udf",
)
def udtf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-optimized Python UDTF (``@udtf(useArrow=True)``) — rows
    cross the JVM/Python boundary as Arrow batches instead of pickled
    rows, the UDTF analogue of the Arrow-optimized scalar UDF
    (udf_arrow_optimized). Emits per-document term frequencies; the
    lateral join fans each doc into its distinct tokens entirely
    inside the UDTF (one Python pass per row, counts via dict), so
    the engine-side plan is scan -> Arrow UDTF -> done."""
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, tf: bigint", useArrow=True)
    class TermFreq:
        def eval(self, text: str):
            for tok, n in sorted(Counter(text.split(" ")).items()):
                yield tok, n

    spark.udtf.register("term_freq_audtf", TermFreq)
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    d.createOrReplaceTempView("docs_for_audtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.tf
        FROM docs_for_audtf d, LATERAL term_freq_audtf(d.text) t
        """
    )


@query(
    "udtf_analyze",
    oracle="""
SELECT doc_id,
       COALESCE(string_split(text, ' ')[1], '') AS part_1,
       COALESCE(string_split(text, ' ')[2], '') AS part_2,
       COALESCE(string_split(text, ' ')[3], '') AS part_3,
       CAST(len(string_split(text, ' ')) AS INT) AS n_total
FROM documents
WHERE doc_id < 25
""",
    category="udf",
)
def udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4): the static ``analyze()``
    hook computes the OUTPUT SCHEMA at plan time from a constant
    argument — here ``LeadingParts(text, 3)`` derives columns
    part_1..part_3 (+ n_total) from the literal 3, the API shape
    dynamic ETL frameworks use to avoid hand-maintained schemas.
    The schema is resolved once at analysis; execution is the
    ordinary Arrow-batched lateral join, so the scale posture is
    identical to a fixed-schema UDTF (one Python stage, no
    shuffle)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class LeadingParts:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(1, n.value + 1):
                schema = schema.add(f"part_{i}", StringType())
            return AnalyzeResult(schema.add("n_total", IntegerType()))

        def eval(self, text: str, n: int):
            toks = text.split(" ")
            yield tuple(
                (toks[i] if i < len(toks) else "") for i in range(n)
            ) + (len(toks),)

    spark.udtf.register("leading_parts", udtf(LeadingParts))
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 25)
    d.createOrReplaceTempView("docs_for_analyze_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.part_1, t.part_2, t.part_3, t.n_total
        FROM docs_for_analyze_udtf d, LATERAL leading_parts(d.text, 3) t
        """
    )
