"""Aggregation operators (SURVEY.md §2.4).

Every oracle-checked aggregate follows the exact-decimal convention
(exact.py): partial/final hash aggregation stays entirely JVM-side
and the shuffle carries one row per group per task (map-side combine)
— the property that makes these plans scale-invariant.

Statistical moments (stddev/var/corr/covar) are computed from exact
decimal power sums and combined in IEEE double with the SAME
expression shape as the oracle, which makes even those bit-exact
across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exact import davg, dsum, sql_davg, sql_dsum
from .. import api
from ..io import register_views, table
from ..registry import query


@query(
    "agg_global",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       {sql_dsum('l_extendedprice')} AS sum_price,
       {sql_davg('l_quantity')} AS avg_qty,
       MIN(l_shipdate) AS min_ship,
       MAX(l_shipdate) AS max_ship,
       MIN(l_discount) AS min_disc,
       MAX(l_discount) AS max_disc
FROM lineitem
""",
    category="aggregations",
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-key) aggregate: single-row result, partial aggs
    combined on one reducer."""
    l = table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        davg(F.col("l_quantity")).alias("avg_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_discount").alias("max_disc"),
    )


@query(
    "agg_groupby",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS sum_price,
       {sql_davg('o_totalprice')} AS avg_price,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_orderpriority, o_orderstatus
""",
    category="aggregations",
)
def agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-key grouped aggregation (hash agg, map-side combine)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("sum_price"),
        davg(F.col("o_totalprice")).alias("avg_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@query(
    "agg_having",
    oracle=f"""
SELECT o_custkey, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS sum_price
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) > 12
""",
    category="aggregations",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING = filter above the agg node)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .where(F.col("n_orders") > 12)
    )


@query(
    "agg_distinct",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem
GROUP BY l_returnflag
""",
    category="aggregations",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (expand + two-phase agg under the hood;
    for 100 TB cardinality estimation use agg_approx_distinct)."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@query("agg_approx_distinct", oracle=None, category="aggregations")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the scale path for distinct
    counts (constant memory per group vs the exact expand). Sketches
    differ across engines -> rows-only check; a unit test asserts
    <5% relative error vs exact."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@query(
    "agg_sum_distinct",
    oracle="""
SELECT l_linestatus, SUM(DISTINCT l_quantity) AS sum_distinct_qty
FROM lineitem
GROUP BY l_linestatus
""",
    category="aggregations",
)
def agg_sum_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(DISTINCT) over the integral-valued quantity column
    (integer-valued doubles sum exactly in any order)."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.sum_distinct(F.col("l_quantity")).alias("sum_distinct_qty")
    )


@query(
    "agg_grouping_sets",
    oracle="""
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       GROUPING(o_orderpriority) AS g_pri, GROUPING(o_orderstatus) AS g_st
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
""",
    category="aggregations",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with GROUPING() disambiguation of NULL group
    cells — expressed in SQL so the Spark text parallels the oracle."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       GROUPING(o_orderpriority) AS g_pri, GROUPING(o_orderstatus) AS g_st
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    category="aggregations",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (flag, flag+status, grand total)."""
    l = table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


@query(
    "agg_cube",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    category="aggregations",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations of the two keys."""
    l = table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


def _sq(col: str) -> Column:
    """Exact decimal square of a raw 2-decimal column."""
    d = F.col(col).cast("decimal(15,2)")
    return d * d


def _sql_sq(col: str) -> str:
    return f"(CAST({col} AS DECIMAL(15,2)) * CAST({col} AS DECIMAL(15,2)))"


@query(
    "agg_stats",
    oracle=f"""
WITH m AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS s,
         CAST(SUM({_sql_sq('c_acctbal')}) AS DOUBLE) AS ss
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       (ss - s * s / n) / (n - 1) AS var_acctbal,
       SQRT((ss - s * s / n) / (n - 1)) AS stddev_acctbal,
       s / n AS mean_acctbal
FROM m
""",
    category="aggregations",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev/mean from exact decimal power sums.

    Streaming-variance implementations (Welford merges) are
    order-dependent across engines; exact power sums + one final
    double expression (same shape both sides) are bit-reproducible
    AND cheaper at scale: the shuffle carries 3 numbers per group.

    Bit-parity envelope: the decimal->double conversion is a single
    rounding only while the sum's significand stays under 2^53 —
    holds here through sf0.1 with ~1e9 headroom; for sums beyond
    that, switch to integer power sums over scaled values as
    agg_corr does (its price-based decimal sums crossed 2^53 already
    at sf0.1).
    """
    c = table(spark, sf_dir, "customer")
    m = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(15,2)")).cast("double").alias("s"),
        F.sum(_sq("c_acctbal")).cast("double").alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    return m.select(
        "c_mktsegment",
        ((ss - s * s / n) / (n - 1)).alias("var_acctbal"),
        F.sqrt((ss - s * s / n) / (n - 1)).alias("stddev_acctbal"),
        (s / n).alias("mean_acctbal"),
    )


@query(
    "agg_corr",
    oracle="""
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(round(l_discount * 100) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) AS syy,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT) * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) AS sxy
  FROM lineitem
)
SELECT (n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS corr_qty_disc,
       (n * sxy - sx * sy) / (n * (n - 1)) AS covar_samp_qty_disc
FROM m
""",
    category="aggregations",
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance between quantity and
    discount (in cents) from exact INTEGER power sums.

    Integer (not decimal) sums on purpose: at sf0.1 the price-based
    decimal power sums exceed the 2^53 double significand, and
    DuckDB's two-rounding decimal->double conversion flips the last
    ulp (caught by a full-scale sweep). qty <= 50 and disc_cents <=
    10 keep every power sum int64-exact up to ~1e12 rows, so the
    double conversions are exact and the final formula (identical
    expression both sides) is bit-reproducible at any scale factor.
    """
    l = table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity")).cast("bigint")
    y = F.round(F.col("l_discount") * 100).cast("bigint")
    m = l.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_disc"),
        ((n * sxy - sx * sy) / (n * (n - 1))).alias("covar_samp_qty_disc"),
    )


@query(
    "agg_percentile",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty
FROM lineitem
GROUP BY l_returnflag
""",
    category="aggregations",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles over the integral-valued
    quantity column (integral data keeps cross-engine interpolation
    arithmetic exact)."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile(F.col("l_quantity"), F.lit(0.5)).alias("p50_qty"),
        F.percentile(F.col("l_quantity"), F.lit(0.9)).alias("p90_qty"),
    )


@query("agg_percentile_approx", oracle=None, category="aggregations")
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile (t-digest style) — the 100 TB path for
    quantiles; sketch differs from DuckDB's -> rows-only check, unit
    test asserts closeness to exact."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile_approx(F.col("l_quantity"), F.lit(0.5), F.lit(10000)).alias(
            "p50_approx"
        )
    )


@query(
    "agg_collect",
    oracle="""
SELECT o_orderpriority,
       array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
    category="aggregations",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group collected set, sorted for determinism (unsorted
    collect_list is order-nondeterministic under parallelism) and
    joined to one string — the driver's comparator hashes scalar
    cells only, so graded outputs never expose raw array columns."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_listagg",
    oracle="""
SELECT o_orderpriority,
       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
         AS order_ids,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
WHERE o_orderkey % 97 = 0
GROUP BY o_orderpriority
""",
    category="aggregations",
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ordered string aggregation — LISTAGG ... WITHIN GROUP
    (ORDER BY ...), new as a first-class aggregate in Spark 4 (the
    report-building "roster per group" idiom; DuckDB twin is
    string_agg with ORDER BY). The WITHIN GROUP ordering is what
    makes the concatenated string deterministic under parallelism —
    ties on the sort key concatenate identical substrings, so the
    result is still unique. Ordinary partial/final aggregation,
    group state = the accumulated string."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 97 == 0)
    return o.groupBy("o_orderpriority").agg(
        F.expr(
            "listagg(cast(o_orderkey as string), ',') "
            "WITHIN GROUP (ORDER BY o_orderkey)"
        ).alias("order_ids"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_ohlc",
    oracle="""
SELECT event_type,
       time_bucket(INTERVAL 6 HOUR, ts) AS bucket_start,
       arg_min(value, ts) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, ts) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2
""",
    category="aggregations",
)
def agg_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars (open-high-low-close) — the time-series candlestick
    rollup: per (event_type, 6h bucket), the first value by time,
    the extremes, the last value by time, and the event count. Every
    measure is a SELECTION aggregate (min_by/max_by/min/max), not a
    sum — no accumulation-order sensitivity, so doubles pass through
    bit-exact with no quantization needed. events.ts is globally
    unique, making the by-time argmin/argmax well-defined. One
    partial+final hash aggregation, shuffle on (type, bucket)."""
    ev = table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / 21600).cast("long") * 21600
    ).cast("timestamp")
    return (
        ev.select("event_type", bucket.alias("bucket_start"), "ts", "value")
        .groupBy("event_type", "bucket_start")
        .agg(
            F.min_by("value", "ts").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ts").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
GROUP BY o_orderpriority
""",
    category="aggregations",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps (Spark bitmap_*
    aggregate family) — the warehouse-scale alternative to
    COUNT(DISTINCT): ids map to (bucket, bit position), each
    (group, bucket) builds a fixed 4KB bitmap, and the group's
    distinct count is the sum of bitmap popcounts. Unlike
    COUNT(DISTINCT) (whose partial state is the value set itself)
    bitmap partials are constant-size and mergeable, so rollups can
    be computed incrementally per partition/day and combined later
    without re-scanning — exactness of a distinct count with the
    mergeability of a sketch. Oracle: plain COUNT(DISTINCT), which
    the bitmap pipeline must equal exactly."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderpriority",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("o_orderpriority", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).alias("n_customers")
        )
    )


@query(
    "agg_bitmap_rollup",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
GROUP BY o_orderstatus
""",
    category="aggregations",
)
def agg_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct-count ROLLUP via bitmap merging — the
    mergeability claim of agg_bitmap_distinct exercised, not just
    stated: per-(status, month, bucket) bitmaps are built first (the
    "daily partial" a warehouse materializes incrementally), then
    OR-merged across months with bitmap_or_agg and popcounted. The
    final count must equal a flat COUNT(DISTINCT) over the raw rows
    — which is exactly what the oracle computes. At scale the first
    level aggregates each new time slice alone; the second level
    touches only (groups x slices x buckets) constant-size bitmaps,
    never the raw data."""
    o = table(spark, sf_dir, "orders")
    monthly = (
        o.select(
            "o_orderstatus",
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            F.expr("bitmap_bucket_number(o_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("o_orderstatus", "month", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return (
        monthly.groupBy("o_orderstatus", "bkt")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm_all"))
        .groupBy("o_orderstatus")
        .agg(F.sum(F.expr("bitmap_count(bm_all)")).alias("n_customers"))
    )


@query(
    "agg_filtered",
    oracle=f"""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted
FROM lineitem
GROUP BY l_returnflag
""",
    category="aggregations",
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER clause ≡ sum(when(...)))."""
    l = table(spark, sf_dir, "lineitem")
    dq = F.col("l_quantity").cast("decimal(18,2)")
    return l.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_linestatus") == "F", dq)).cast("double").alias("qty_f"),
        F.sum(F.when(F.col("l_linestatus") == "O", dq)).cast("double").alias("qty_o"),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_discounted"),
    )


@query(
    "agg_pivot",
    oracle=f"""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O
FROM lineitem
GROUP BY l_returnflag
""",
    category="aggregations",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide crosstab: pivot on the (known, bounded) linestatus domain.
    Passing explicit pivot values skips the extra distinct-scan job."""
    l = table(spark, sf_dir, "lineitem")
    p = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum(F.col("l_quantity")))
    )
    return p.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    )


@query(
    "agg_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, measure, val
FROM (
  SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
  FROM lineitem WHERE l_orderkey < 100
) UNPIVOT (val FOR measure IN (l_quantity, l_discount, l_tax))
""",
    category="aggregations",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-from-wide unpivot of three measure columns."""
    l = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    return l.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "val",
    )


@query(
    "agg_top_groups",
    oracle=f"""
SELECT o_custkey, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS sum_price
FROM orders
GROUP BY o_custkey
ORDER BY sum_price DESC, o_custkey
LIMIT 5
""",
    category="aggregations",
)
def agg_top_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups ranked by aggregate, deterministic tie-break, top-5
    (TakeOrderedAndProject — no full result sort)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .orderBy(F.desc("sum_price"), "o_custkey")
        .limit(5)
    )


@query(
    "agg_weighted_avg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS wavg_price
FROM lineitem
GROUP BY l_returnflag
""",
    category="aggregations",
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price: sum(w*x)/sum(w) with exact
    decimal numerator/denominator."""
    l = table(spark, sf_dir, "lineitem")
    dp = F.col("l_extendedprice").cast("decimal(18,2)")
    dq = F.col("l_quantity").cast("decimal(18,2)")
    return l.groupBy("l_returnflag").agg(
        (F.sum(dp * dq).cast("double") / F.sum(dq).cast("double")).alias("wavg_price")
    )


@query("agg_hll_sketch", oracle=None, category="aggregations")
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HyperLogLog SKETCHES as first-class values (Apache
    DataSketches via hll_sketch_agg / hll_union_agg /
    hll_sketch_estimate): per-(flag,status) sketches are built in one
    pass, then MERGED up to per-flag estimates without rescanning —
    the re-aggregatable rollup pattern a 100 TB pipeline uses to keep
    daily sketches and union them into monthly distincts. Sketch
    bytes are engine-specific -> rows-only; unit test asserts <5%
    error vs exact."""
    l = table(spark, sf_dir, "lineitem")
    per_pair = l.groupBy("l_returnflag", "l_linestatus").agg(
        F.hll_sketch_agg("l_orderkey", F.lit(14)).alias("sk"),
        F.count_distinct("l_orderkey").alias("exact_pair"),
    )
    return (
        per_pair.groupBy("l_returnflag")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias(
                "merged_estimate"
            ),
            # exact distinct per flag for the calibration test: the
            # pair-level exacts cannot be summed (orderkeys span
            # statuses), so recompute from the sketchless column
        )
        .join(
            l.groupBy("l_returnflag").agg(
                F.count_distinct("l_orderkey").alias("exact_flag")
            ),
            "l_returnflag",
        )
    )


@query(
    "agg_time_rollup",
    oracle="""
SELECT date_trunc('day', ts) AS bucket_day,
       date_trunc('hour', ts) AS bucket_hour,
       GROUPING(date_trunc('hour', ts)) AS g_hour,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                        (date_trunc('day', ts)))
""",
    category="aggregations",
)
def agg_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: hourly AND
    daily aggregates of the event stream in ONE grouping-sets pass
    (continuous-aggregate pattern — the scan runs once, Expand feeds
    both granularities, partial aggregation combines map-side).
    GROUPING() distinguishes the day-total rows from hour rows."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
SELECT date_trunc('day', ts) AS bucket_day,
       date_trunc('hour', ts) AS bucket_hour,
       GROUPING(date_trunc('hour', ts)) AS g_hour,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                        (date_trunc('day', ts)))
"""
    )


@query(
    "agg_mode",
    oracle="""
WITH counted AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY o_orderstatus, o_orderpriority
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count
FROM counted
QUALIFY row_number() OVER (PARTITION BY o_orderstatus
                           ORDER BY n DESC, o_orderpriority) = 1
""",
    category="aggregations",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE (most frequent value) with a DETERMINISTIC
    tie-break (highest count, then lexicographically smallest value)
    — native mode() in either engine leaves ties unspecified, so the
    engine computes count + argmin-over-(-n, value): two hash
    aggregations, no window over raw rows. The second aggregation
    sees one row per (group, value) — already tiny at any scale."""
    o = table(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    best = F.min_by(
        F.struct(
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        ),
        F.struct((-F.col("n")).alias("neg_n"), F.col("o_orderpriority")),
    )
    return counted.groupBy("o_orderstatus").agg(
        best.getField("mode_priority").alias("mode_priority"),
        best.getField("mode_count").alias("mode_count"),
    )


@query(
    "agg_histogram",
    oracle="""
SELECT CAST(floor(o_totalprice / 25000.0) AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(o_totalprice) AS lo,
       MAX(o_totalprice) AS hi
FROM orders
GROUP BY bucket
""",
    category="aggregations",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (25k-wide buckets) — the profiling
    primitive behind every data-quality dashboard. Bucketing is pure
    arithmetic on the scan (codegen), then one partial+final count
    aggregation on a small bounded key — at 100 TB the shuffle
    carries at most tasks x buckets rows. Bucket ids are
    integer-exact in both engines: the same IEEE double divide +
    floor on the same inputs (width_bucket exists only on the Spark
    side, so the portable arithmetic IS the operator)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.floor(F.col("o_totalprice") / 25000.0).cast("int").alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@query(
    "agg_gap_fill",
    oracle="""
WITH bounds AS (
  SELECT time_bucket(INTERVAL 6 HOUR, MIN(ts)) AS t0,
         time_bucket(INTERVAL 6 HOUR, MAX(ts)) AS t1
  FROM events
),
spine AS (
  SELECT event_type, bucket_start
  FROM (SELECT DISTINCT event_type FROM events)
  CROSS JOIN (
    SELECT unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS bucket_start
    FROM bounds
  )
),
actual AS (
  SELECT event_type, time_bucket(INTERVAL 6 HOUR, ts) AS bucket_start,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT s.event_type, s.bucket_start, COALESCE(a.n, 0) AS n,
       a.n IS NULL AS gap_filled
FROM spine s LEFT JOIN actual a
  ON a.event_type = s.event_type AND a.bucket_start = s.bucket_start
""",
    category="aggregations",
)
def agg_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled time rollup: 6-hour bucket counts per event_type
    with EMPTY buckets materialized as zero rows — the time-series
    "gapfill" every monitoring/continuous-aggregate surface needs
    (a missing bucket and a zero bucket are different facts).

    Shape: the dense (type x bucket) spine is generated from the
    global min/max — a two-row bound aggregate, then sequence() +
    explode on the driver-free side — and the actual rollup LEFT
    joins into it. The spine is tiny (types x buckets, time-bounded)
    and broadcasts; the fact table is touched exactly once. At
    100 TB the rollup is the usual partial+final count; the spine
    stays a few thousand rows no matter the data volume.

    Oracle-alignment constraint: Spark buckets from the Unix epoch
    while DuckDB's time_bucket origin is 2000-01-01 (946684800 s).
    Cross-engine exactness therefore requires the bucket width to
    divide 946684800 — true for 6 h (21600 s), false for e.g. 7 h.
    Changing the width means either keeping this divisibility or
    passing an explicit epoch origin to time_bucket in the oracle."""
    ev = table(spark, sf_dir, "events")
    bucket = F.timestamp_seconds(
        (F.unix_timestamp("ts") / 21600).cast("long") * 21600
    )
    bounds = ev.agg(
        F.min(bucket.cast("timestamp")).alias("t0"),
        F.max(bucket.cast("timestamp")).alias("t1"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            bounds.select(
                F.explode(
                    F.sequence("t0", "t1", F.expr("INTERVAL 6 HOURS"))
                ).alias("bucket_start")
            )
        )
    )
    actual = (
        ev.select("event_type", bucket.alias("bucket_start"))
        .groupBy("event_type", "bucket_start")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        F.broadcast(spine)
        .join(actual, ["event_type", "bucket_start"], "left")
        .select(
            "event_type",
            "bucket_start",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.col("n").isNull().alias("gap_filled"),
        )
    )


@query(
    "agg_boolean",
    oracle="""
SELECT o_orderstatus,
       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_totalprice > 400000) AS any_huge,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority LIKE '1-%') AS BIGINT)
         AS n_urgent
FROM orders
GROUP BY o_orderstatus
""",
    category="aggregations",
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: count_if, universal/existential
    quantifiers (bool_and/bool_or a.k.a. every/some), and FILTER'd
    count — the predicates-as-aggregates surface dashboards lean on.
    All JVM-side, partial+final aggregation on a 3-value key."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_huge"),
        F.count(F.when(F.col("o_orderpriority").like("1-%"), 1)).alias("n_urgent"),
    )


@query(
    "agg_session_window_native",
    oracle="""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
s AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM g
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s
GROUP BY user_id, session_id
""",
    category="aggregations",
)
def agg_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows via Spark's FIRST-CLASS session_window
    aggregation — the engine-level answer to sessionization, vs
    win_sessionize's hand-rolled lag+cumsum (which is exactly what
    the oracle recomputes). session_window merges events whose gaps
    are <= 30 min — boundary probed: two events EXACTLY 30 min apart
    merge into one session, so the oracle's strictly-greater
    new-session predicate agrees at the boundary, not just on the
    microsecond-timestamp fixture. The emitted window end is
    last-event + gap, which the oracle mirrors as MAX(ts) + INTERVAL. One shuffle on
    (user_id); the session assignment itself is a per-partition sort
    + merge, no iteration. Timestamps pass through unchanged, so the
    result is hash-exact cross-engine."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "agg_equidepth_histogram",
    oracle="""
WITH t AS (
  SELECT o_totalprice,
         ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
  FROM orders
)
SELECT bin, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n
FROM t
GROUP BY bin
""",
    category="aggregations",
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-frequency) histogram — the optimizer-
    statistics companion to agg_histogram's equi-WIDTH bins: ntile
    splits the sorted order-price domain into 8 buckets of equal row
    count whose [lo, hi] bounds trace the quantiles. Tie-break on
    o_orderkey makes the assignment a total order, hence
    deterministic under parallelism. Values pass through unchanged.

    Scale note (r6): the bucket assignment runs through the
    ``ntile_distributed`` kernel (operators/windows.py — range
    repartition + per-partition row_number + broadcast offsets,
    bit-equal to ntile by its driver grade and hypothesis twin), so
    the EXACT equi-depth histogram is itself 100 TB-shaped: no
    single-partition sort anywhere. The approximate alternative for
    when even one extra pass is too much remains
    agg_percentile_approx."""
    from .windows import ntile_distributed

    o = table(spark, sf_dir, "orders")
    t = ntile_distributed(
        o.select("o_totalprice", "o_orderkey"),
        8,
        ["o_totalprice", "o_orderkey"],
        "bin",
    )
    return t.groupBy("bin").agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )


@query("agg_ewma", oracle=None, category="aggregations")
def agg_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 0.25) of event
    values per user, ordered by (ts, event_id) — the classic
    time-series smoother: ewma_i = alpha*x_i + (1-alpha)*ewma_{i-1}.
    Expressed non-recursively so it stays one window pass:
    ewma_i = sum_j w^(i-j) * contrib_j / 1 normalized form — here via
    the prefix-sum identity s_i = sum_j x_j / w^j, ewma_i =
    alpha * w^i * s_i + (1-w^i) ... numerically the direct identity
    used is ewma_i = alpha * sum_{j<=i} (1-alpha)^(i-j) x_j +
    (1-alpha)^i x_0-correction with adjust=False pandas semantics:
    first value passes through.

    Implementation detail: the rescaled prefix sum x_j*(1-alpha)^-j
    overflows for long series, so the window is applied to the LAST
    64 rows only (the weight (0.75)^64 ~ 1e-8 makes the truncation
    error negligible, and the rescale stays within double range).
    Rows-only: float powers/sums are order- and shape-sensitive
    across engines; tests/test_quality.py checks 1e-6 relative
    agreement with pandas ewm(alpha=0.25, adjust=False) on the
    truncated horizon."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return api.ewma(
        ev, "user_id", ["ts", "event_id"], "value", alpha=0.25, horizon=64
    ).select("event_id", "user_id", F.col("value").alias("x"), "ewma")


@query(
    "agg_autocorr",
    oracle="""
WITH c AS (
  SELECT user_id, ts, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
  FROM events
),
pairs AS (
  SELECT user_id, x,
         lead(x) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
  FROM c
),
m AS (
  SELECT user_id,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x*x) AS DOUBLE) AS sxx, CAST(SUM(y*y) AS DOUBLE) AS syy,
         CAST(SUM(x*y) AS DOUBLE) AS sxy,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs WHERE y IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_pairs,
       (n*sxy - sx*sy)
         / NULLIF(sqrt(n*sxx - sx*sx) * sqrt(n*syy - sy*sy), 0)
         AS autocorr_lag1
FROM m
""",
    category="aggregations",
)
def agg_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value series — the
    time-series diagnostic for burstiness/mean-reversion. Built as
    lead-paired (x_t, x_{t+1}) then Pearson r from exact INTEGER
    power sums in cents (the agg_corr recipe): every sum is
    int64-exact (cents^2 * pairs-per-user stays far under 2^53), the
    double conversions are single correct roundings, and the final
    formula has the identical expression shape in both engines, so
    r is bit-reproducible. NULLIF guards constant series. Two
    shuffles: the lead window and the per-user rollup — both on
    user_id, so Catalyst reuses one Exchange."""
    ev = table(spark, sf_dir, "events")
    x = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id", x.alias("x"), F.lead(x).over(w).alias("y")
    ).where(F.col("y").isNotNull())
    m = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    denom = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return m.select(
        "user_id",
        "n_pairs",
        ((n * sxy - sx * sy) / F.nullif(denom, F.lit(0.0))).alias(
            "autocorr_lag1"
        ),
    )


@query(
    "agg_benford",
    oracle="""
WITH d AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders
),
tot AS (SELECT COUNT(*) AS n FROM d)
SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS DOUBLE) / CAST(tot.n AS DOUBLE) AS share
FROM d CROSS JOIN tot
GROUP BY digit, tot.n
""",
    category="aggregations",
)
def agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-significant-digit distribution of order totals — the
    Benford's-law forensic profile auditors run for fabricated-data
    screening. Digit extracted through the integer-string path (no
    log10, so no libm), share = exact count ratio with one double
    division. One bounded-key (9 digits) aggregation + a 1-row
    broadcast total."""
    o = table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    d = o.select(digit.alias("digit"))
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        d.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_orders",
            (F.col("n_orders").cast("double") / F.col("n").cast("double")).alias(
                "share"
            ),
        )
    )


@query(
    "agg_gini",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS x
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i FROM spend
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(i * x) AS BIGINT) AS six
  FROM ranked
)
SELECT n AS n_customers,
       CAST(sx AS DOUBLE) AS total_spend,
       (2.0 * CAST(six AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) AS gini
FROM m
""",
    category="aggregations",
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the standard inequality /
    concentration metric, from the rank formula
    G = (2*Sum(i*x_i) - (n+1)*Sum(x)) / (n*Sum(x)) over ascending-
    sorted spend. Spend is rounded to whole currency units (both
    engines round double half-ties AWAY FROM ZERO — verified on the
    fixture's 1516 live .50 values, not assumed) so every
    power sum stays int64-exact with the double conversions single
    correct roundings (Sum(i*x_i) ~ n^2/2 * avg_spend must stay
    under 2^53 — holds to ~100k customers here; beyond that switch
    the accumulators to DECIMAL(38,0) and accept the documented
    one-ulp decimal->double risk, or bin spends). The global rank
    runs through the global_rank_distributed kernel (r6) — the
    per-customer rollup grows with the customer base, so the old
    single-partition row_number was the scale limiter; now nothing
    sorts on one task."""
    from .windows import global_rank_distributed

    o = table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice")).cast("long")).alias("x")
    )
    ranked = global_rank_distributed(
        spend, ["x", "o_custkey"], "i"
    ).select("x", "i")
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    n, sx, six = (
        F.col("n").cast("double"),
        F.col("sx").cast("double"),
        F.col("six").cast("double"),
    )
    return m.select(
        F.col("n").alias("n_customers"),
        sx.alias("total_spend"),
        ((2.0 * six - (n + 1.0) * sx) / (n * sx)).alias("gini"),
    )


@query(
    "agg_hhi",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(SUM(cnt) AS BIGINT) AS n_events,
       CAST(SUM(cnt * cnt) AS DOUBLE)
         / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)) AS hhi
FROM c
GROUP BY user_id
""",
    category="aggregations",
)
def agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of each user's activity mix
    (1/k = perfectly even over k event types, 1.0 = single-type):
    HHI = Sum(cnt_i^2) / total^2, kept as ONE integer numerator and
    one squared integer denominator so it is exact-rational — the
    entropy alternative that needs no logarithm and therefore stays
    oracle-exact. Two stacked aggregations, both shuffling on
    user_id."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    return c.groupBy("user_id").agg(
        F.sum("cnt").alias("n_events"),
        (
            F.sum(F.col("cnt") * F.col("cnt")).cast("double")
            / (F.sum("cnt").cast("double") * F.sum("cnt").cast("double"))
        ).alias("hhi"),
    )


@query(
    "agg_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
),
tot AS (
  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM c GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n,
       CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
FROM c JOIN tot t ON t.from_type = c.from_type
""",
    category="aggregations",
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: counts
    of consecutive (from_type -> to_type) event pairs within each
    user's time-ordered stream, with the maximum-likelihood
    transition probability as an exact count ratio (one double
    division — bit-identical cross-engine). The estimator behind
    next-action prediction and behavioral anomaly scoring.

    Shape: one lead window (shuffle on user_id), one bounded-key
    (5x5) count rollup, and the per-from totals joined back — tiny
    matrix state regardless of corpus size."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    c = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = c.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return c.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("n_from").cast("double")).alias("p"),
    )


# Chi-square cells: event types x deterministic A/B arm (same Knuth
# hash as pipeline_ab_test). All ten observed counts are pivoted into
# ONE row of exact integers so the chi-square combination runs in a
# single expression with FIXED evaluation order — no float summation
# across rows, hence bit-exact cross-engine.
_CHI_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "agg_chi_square",
    oracle=f"""
WITH t AS (
  SELECT event_type,
         CASE WHEN ((user_id & 2147483647) * 2654435761) % 4294967296 < 2147483648
              THEN 'A' ELSE 'B' END AS arm
  FROM events
),
p AS (
  SELECT
    {", ".join(f"CAST(COUNT(CASE WHEN event_type = '{et}' AND arm = '{arm}' THEN 1 END) AS DOUBLE) AS o_{et}_{arm}"
               for et in _CHI_TYPES for arm in ("A", "B"))},
    CAST(COUNT(*) AS DOUBLE) AS n
  FROM t
),
q AS (
  SELECT p.*,
         {" + ".join(f"o_{e2}_A" for e2 in _CHI_TYPES)} AS colA,
         {" + ".join(f"o_{e2}_B" for e2 in _CHI_TYPES)} AS colB
  FROM p
)
SELECT n_events, chi2, dof, sqrt(chi2 / n_events) AS cramers_v
FROM (
SELECT CAST(n AS BIGINT) AS n_events,
       {" + ".join(
         f"(o_{et}_A * n - (o_{et}_A + o_{et}_B) * colA) * (o_{et}_A * n - (o_{et}_A + o_{et}_B) * colA)"
         f" / ((o_{et}_A + o_{et}_B) * colA * n)"
         f" + (o_{et}_B * n - (o_{et}_A + o_{et}_B) * colB) * (o_{et}_B * n - (o_{et}_A + o_{et}_B) * colB)"
         f" / ((o_{et}_A + o_{et}_B) * colB * n)"
         for et in _CHI_TYPES)} AS chi2,
       CAST(4 AS BIGINT) AS dof
FROM q
)
""",
    category="aggregations",
)
def agg_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event type vs deterministic
    A/B arm (the experiment sanity check: activity mix should be
    independent of a hash-based assignment). chi2 = sum over cells of
    (observed*n - row*col)^2 / (row*col*n) — the standard statistic
    rearranged so every input is an EXACT integer count cast once to
    double, and the whole 10-cell combination evaluates inside one
    expression whose operand order is fixed by construction in both
    engines: no float aggregation across rows anywhere, so the
    statistic is bit-reproducible. One bounded-cell conditional
    aggregation (single shuffle-free partial+final over 10 counters)."""
    ev = table(spark, sf_dir, "events")
    arm = F.when(
        (F.col("user_id").bitwiseAND(2147483647) * 2654435761) % 4294967296 < 2147483648, "A"
    ).otherwise("B")
    t = ev.select(F.col("event_type"), arm.alias("arm"))
    aggs = [
        F.count(
            F.when((F.col("event_type") == et) & (F.col("arm") == a), 1)
        ).cast("double").alias(f"o_{et}_{a}")
        for et in _CHI_TYPES
        for a in ("A", "B")
    ] + [F.count(F.lit(1)).cast("double").alias("n")]
    p = t.agg(*aggs)
    n = F.col("n")
    colA = sum((F.col(f"o_{e}_A") for e in _CHI_TYPES[1:]), F.col(f"o_{_CHI_TYPES[0]}_A"))
    colB = sum((F.col(f"o_{e}_B") for e in _CHI_TYPES[1:]), F.col(f"o_{_CHI_TYPES[0]}_B"))
    # accumulate FLAT (A-term then B-term per type, left-associated)
    # to mirror the oracle's "+"-joined chain exactly — float addition
    # is not associative, so grouping (tA + tB) per type first would
    # drift by an ulp
    chi2 = None
    for et in _CHI_TYPES:
        oa, ob = F.col(f"o_{et}_A"), F.col(f"o_{et}_B")
        row = oa + ob
        da = oa * n - row * colA
        db = ob * n - row * colB
        for term in (da * da / (row * colA * n), db * db / (row * colB * n)):
            chi2 = term if chi2 is None else chi2 + term
    out = p.select(
        n.cast("long").alias("n_events"),
        chi2.alias("chi2"),
        F.lit(4).cast("long").alias("dof"),
    )
    # Cramer's V effect size: min(r-1, c-1) == 1 for the 5x2 table,
    # so V = sqrt(chi2 / n) — same single sqrt in both engines.
    return out.withColumn(
        "cramers_v", F.sqrt(F.col("chi2") / F.col("n_events"))
    )


@query(
    "agg_mad_outliers",
    oracle="""
WITH c AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
med AS (
  SELECT event_type, median(cents) AS med FROM c GROUP BY event_type
),
dev AS (
  SELECT c.event_type, c.cents, m.med,
         ABS(CAST(c.cents AS DOUBLE) - m.med) AS adev
  FROM c JOIN med m ON m.event_type = c.event_type
),
mad AS (
  SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
)
SELECT d.event_type,
       CAST(d.med / 100.0 AS DOUBLE) AS median_value,
       CAST(m.mad / 100.0 AS DOUBLE) AS mad_value,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(CASE WHEN d.adev > 3 * m.mad THEN 1 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m ON m.event_type = d.event_type
GROUP BY d.event_type, d.med, m.mad
""",
    category="aggregations",
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation — the
    z-score alternative that one fat-tailed spike cannot poison:
    per event type, median value, MAD, and the count of events whose
    absolute deviation exceeds 3*MAD. Both medians run over exact
    integer cents (even-count interpolation halves are exact doubles
    in both engines), deviations are exact differences, and the
    3*MAD threshold compares exactly — so the whole robust pipeline
    is oracle-exact with no tolerance anywhere.

    Shape: two grouped medians (the exact small-group tier — the
    100 TB swap-in is approx_percentile, as with
    agg_equidepth_histogram) with broadcast joins back; one shuffle
    of the fact per median level."""
    ev = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    c = ev.select("event_type", cents.alias("cents"))
    med = c.groupBy("event_type").agg(F.median("cents").alias("med"))
    dev = c.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("cents").cast("double") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1)).alias(
                "n_outliers"
            ),
        )
        .select(
            "event_type",
            (F.col("med") / 100.0).alias("median_value"),
            (F.col("mad") / 100.0).alias("mad_value"),
            "n_events",
            "n_outliers",
        )
    )


@query(
    "agg_linear_regression",
    oracle="""
WITH t AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 1000000 - 1704067200 AS BIGINT) AS x,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM events
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM t GROUP BY event_type
)
SELECT event_type, n_events,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_cents_per_sec,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n / 100.0
         AS intercept_value,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM m
""",
    category="aggregations",
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time — the "is this
    metric drifting" regression every dashboard fits: slope,
    intercept and R^2 from the closed-form normal equations over
    int64-exact power sums (x = whole seconds since 2024-01-01 so
    x*x and x*y sums stay far under 2^53 on the one-month fixture;
    the epoch re-basing is the documented requirement at longer
    ranges), with the identical expression shape in both engines —
    bit-reproducible like agg_corr/agg_autocorr. One aggregation,
    map-side combined."""
    ev = table(spark, sf_dir, "events")
    # integer floor-division on BOTH sides: a double divide + cast
    # truncates in Spark but rounds in DuckDB — off-by-one-second
    # x values shift every sum
    x = (F.unix_micros(F.col("ts")) - F.lit(1_704_067_200_000_000)) / F.lit(1_000_000)
    x = F.floor(x).cast("long")
    y = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.count(F.lit(1)).alias("n_events"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "event_type",
        "n_events",
        slope.alias("slope_cents_per_sec"),
        ((sy - slope * sx) / n / 100.0).alias("intercept_value"),
        (
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    )


@query(
    "agg_ks_test",
    oracle="""
WITH t AS (
  SELECT CASE WHEN ((user_id & 2147483647) * 2654435761) % 4294967296 < 2147483648
              THEN 'A' ELSE 'B' END AS arm,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
per_v AS (
  SELECT cents,
         CAST(COUNT(CASE WHEN arm = 'A' THEN 1 END) AS BIGINT) AS na,
         CAST(COUNT(CASE WHEN arm = 'B' THEN 1 END) AS BIGINT) AS nb
  FROM t GROUP BY cents
),
cum AS (
  SELECT cents,
         CAST(SUM(na) OVER w AS BIGINT) AS ca,
         CAST(SUM(nb) OVER w AS BIGINT) AS cb,
         CAST((SELECT SUM(na) FROM per_v) AS BIGINT) AS tot_a,
         CAST((SELECT SUM(nb) FROM per_v) AS BIGINT) AS tot_b
  FROM per_v
  WINDOW w AS (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT tot_a AS n_a, tot_b AS n_b,
       CAST(MAX(ABS(ca * tot_b - cb * tot_a)) AS BIGINT) AS d_numerator,
       CAST(MAX(ABS(ca * tot_b - cb * tot_a)) AS DOUBLE)
         / (CAST(tot_a AS DOUBLE) * CAST(tot_b AS DOUBLE)) AS ks_d
FROM cum
GROUP BY tot_a, tot_b
""",
    category="aggregations",
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the purchase-
    value distributions of the two hash arms — computed EXACTLY:
    D = max_v |F_A(v) - F_B(v)| is evaluated as the integer
    cross-multiplication max |cumA*N_B - cumB*N_A| over the distinct
    value grid, with ONE double division at the end. The supremum of
    a difference of step functions needs no epsilon and no float
    compare — the classically "continuous" test is exact rational
    arithmetic on a discrete sample, so the oracle matches
    bit-for-bit. Shape: per-value counts (one shuffle), a global
    ordered running sum over the distinct-value grid (small), one
    max. The unpartitioned window is safe because the grid is
    VALUE-DOMAIN bounded (cents of a price-like measure), not
    data-proportional — enforced by
    tests/test_quality.py::test_value_grid_windows_stay_domain_bounded;
    a high-cardinality measure must route through
    operators/windows.py global_rank_distributed instead."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    arm = F.when(
        (F.col("user_id").bitwiseAND(2147483647) * 2654435761) % 4294967296 < 2147483648, "A"
    ).otherwise("B")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    t = ev.select(arm.alias("arm"), cents.alias("cents"))
    per_v = t.groupBy("cents").agg(
        F.count(F.when(F.col("arm") == "A", 1)).alias("na"),
        F.count(F.when(F.col("arm") == "B", 1)).alias("nb"),
    )
    w = Window.orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tots = per_v.agg(
        F.sum("na").alias("tot_a"), F.sum("nb").alias("tot_b")
    )
    cum = per_v.select(
        F.sum("na").over(w).alias("ca"), F.sum("nb").over(w).alias("cb")
    ).crossJoin(F.broadcast(tots))
    return (
        cum.groupBy("tot_a", "tot_b")
        .agg(
            F.max(
                F.abs(F.col("ca") * F.col("tot_b") - F.col("cb") * F.col("tot_a"))
            ).alias("d_numerator")
        )
        .select(
            F.col("tot_a").alias("n_a"),
            F.col("tot_b").alias("n_b"),
            "d_numerator",
            (
                F.col("d_numerator").cast("double")
                / (F.col("tot_a").cast("double") * F.col("tot_b").cast("double"))
            ).alias("ks_d"),
        )
    )


@query(
    "agg_mann_whitney",
    oracle="""
WITH t AS (
  SELECT CASE WHEN ((user_id & 2147483647) * 2654435761) % 4294967296 < 2147483648
              THEN 'A' ELSE 'B' END AS arm,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
per_v AS (
  SELECT cents,
         CAST(COUNT(CASE WHEN arm = 'A' THEN 1 END) AS BIGINT) AS na,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM t GROUP BY cents
),
rk AS (
  -- midrank of a tie group, doubled to stay integer:
  -- 2*rank = 2*(#values strictly below) + (#tied + 1)
  SELECT na, nt,
         2 * (CAST(COALESCE(SUM(nt) OVER (ORDER BY cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
           + nt + 1 AS rank2
  FROM per_v
),
m AS (
  SELECT CAST(SUM(na * rank2) AS BIGINT) AS r2a,
         CAST(SUM(na) AS BIGINT) AS n_a,
         CAST(SUM(nt - na) AS BIGINT) AS n_b
  FROM rk
)
SELECT n_a, n_b,
       CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2_a,
       CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0 AS u_a,
       CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0
         / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS auc
FROM m
""",
    category="aggregations",
)
def agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the two hash arms' purchase values —
    exact, like agg_ks_test: tie midranks are kept INTEGER by
    doubling (2*rank = 2*below + tied + 1), so U_A = R_A - n_A(n_A+1)/2
    is carried as the integer 2U until two final divisions. Also
    emits U/(n_A*n_B), which IS the AUC / probability-of-superiority
    estimate P(X_A > X_B) + P(tie)/2 — the effect size readers
    actually want from a rank test. Same shape as the KS kernel:
    per-value counts, one ordered pass over the distinct-value grid,
    one rollup — grid boundedness enforced by the same guard test
    (test_value_grid_windows_stay_domain_bounded)."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    arm_a = (F.col("user_id").bitwiseAND(2147483647) * 2654435761) % 4294967296 < 2147483648
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    t = ev.select(arm_a.alias("is_a"), cents.alias("cents"))
    per_v = t.groupBy("cents").agg(
        F.count(F.when(F.col("is_a"), 1)).alias("na"),
        F.count(F.lit(1)).alias("nt"),
    )
    w_prev = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    rk = per_v.select(
        "na",
        "nt",
        (
            2 * F.coalesce(F.sum("nt").over(w_prev), F.lit(0))
            + F.col("nt")
            + 1
        ).alias("rank2"),
    )
    m = rk.agg(
        F.sum(F.col("na") * F.col("rank2")).alias("r2a"),
        F.sum("na").alias("n_a"),
        F.sum(F.col("nt") - F.col("na")).alias("n_b"),
    )
    u2 = F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1)
    return m.select(
        "n_a",
        "n_b",
        u2.alias("u2_a"),
        (u2.cast("double") / 2.0).alias("u_a"),
        (
            u2.cast("double")
            / 2.0
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("auc"),
    )


# Deterministic bootstrap parameters: B replicates, avalanche-hash
# resampling so both engines draw the IDENTICAL resample indices.
# The mixer is two multiply-xorshift rounds in 32-bit space (Mueller's
# 32-bit finalizer, constant 0x45d9f3b) — a plain LCG/Weyl progression
# here makes per-replicate draw counts near-uniform instead of
# multinomial, which under-disperses replicate means and voids the
# CI's bootstrap coverage.  All intermediates stay below 2^58, so the
# arithmetic is exact signed-int64 in both engines (no ANSI overflow).
_BOOT_B = 200
_BOOT_MIX = 0x45D9F3B
_BOOT_MOD = 1 << 32


@query(
    "agg_bootstrap_ci",
    oracle=f"""
WITH v AS (
  SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         row_number() OVER (ORDER BY event_id) - 1 AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM events WHERE event_type = 'purchase'
),
d0 AS (
  SELECT b.b, v0.n, ((b.b * v0.n + s.i) % {_BOOT_MOD}) AS h0
  FROM (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) b
  CROSS JOIN (SELECT MAX(n) AS n FROM v) v0
  CROSS JOIN (SELECT i FROM v) s
),
d1 AS (
  SELECT b, n, ((xor(h0 >> 16, h0) * {_BOOT_MIX}) % {_BOOT_MOD}) AS h1 FROM d0
),
d2 AS (
  SELECT b, n, ((xor(h1 >> 16, h1) * {_BOOT_MIX}) % {_BOOT_MOD}) AS h2 FROM d1
),
draws AS (
  SELECT b, (xor(h2 >> 16, h2) % n) AS j FROM d2
),
reps AS (
  SELECT d.b,
         CAST(SUM(v.cents) AS DOUBLE) / COUNT(*) / 100.0 AS mean_rep
  FROM draws d JOIN v ON v.i = d.j
  GROUP BY d.b
),
ranked AS (
  SELECT mean_rep, row_number() OVER (ORDER BY mean_rep, b) AS r FROM reps
)
SELECT
  (SELECT CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 FROM v) AS sample_mean,
  (SELECT mean_rep FROM ranked WHERE r = {int(_BOOT_B * 0.025)}) AS ci_lo,
  (SELECT mean_rep FROM ranked WHERE r = {int(_BOOT_B * 0.975)}) AS ci_hi,
  CAST({_BOOT_B} AS BIGINT) AS n_replicates
""",
    category="aggregations",
)
def agg_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap 95% confidence interval for the mean purchase value
    — with a DETERMINISTIC resampler: replicate b's i-th draw is
    mix32(b*n + i) % n where mix32 is a two-round multiply-xorshift
    avalanche finalizer, pure integer arithmetic both engines
    reproduce exactly, replacing RNG state with a hash (the same
    trick as pipeline_train_split — resampling becomes a pure
    function, so the CI is auditable and the oracle matches
    bit-for-bit).  The avalanche matters statistically, not just
    cryptographically: an LCG/Weyl progression visits indices in an
    arithmetic sweep, giving each replicate near-uniform draw counts
    (variance ~0 instead of the multinomial's ~1) and replicate means
    that under-disperse by 2-10x on skewed data; the mixed hash makes
    per-replicate draw counts empirically multinomial
    (test_bootstrap_draw_counts_multinomial). Replicate means are exact-decimal sums with one
    division; the CI bounds are DISCRETE order statistics of the
    200 replicate means (rank 5 and 195 — no quantile interpolation,
    hence no float-combination divergence).

    Shape: one global index assignment over the filtered sample
    (via the global_rank_distributed kernel since r6 — range
    repartition + broadcast offsets, no single-task window), a
    B x n draw table joined back on index (the resample fan-out —
    at 100 TB you bootstrap per-partition block sums, the classic
    'bag of little bootstraps' refinement), per-replicate rollup,
    and a rank over B rows."""
    from .windows import global_rank_distributed

    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    v = global_rank_distributed(
        ev.select(cents.alias("cents"), "event_id"), ["event_id"], "rk"
    ).select(
        "cents", (F.col("rk") - 1).alias("i")
    ).crossJoin(
        F.broadcast(
            ev.agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
    ).persist()
    h0 = (F.col("b") * F.col("n") + F.col("i")) % _BOOT_MOD
    h1 = (F.shiftright(h0, 16).bitwiseXOR(h0) * _BOOT_MIX) % _BOOT_MOD
    h2 = (F.shiftright(h1, 16).bitwiseXOR(h1) * _BOOT_MIX) % _BOOT_MOD
    mixed = F.shiftright(h2, 16).bitwiseXOR(h2)
    draws = v.select("i", "n").select(
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        "i",
        "n",
    ).select(
        "b",
        (mixed % F.col("n")).alias("j"),
    )
    reps = (
        draws.join(v.select(F.col("i").alias("j"), "cents"), "j")
        .groupBy("b")
        .agg(
            (F.sum("cents").cast("double") / F.count(F.lit(1)) / 100.0).alias(
                "mean_rep"
            )
        )
    )
    ranked = reps.select(
        "mean_rep",
        F.row_number().over(Window.orderBy("mean_rep", "b")).alias("r"),
    )
    sample_mean = v.agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1)) / 100.0).alias(
            "sample_mean"
        )
    )
    lo = ranked.where(F.col("r") == int(_BOOT_B * 0.025)).select(
        F.col("mean_rep").alias("ci_lo")
    )
    hi = ranked.where(F.col("r") == int(_BOOT_B * 0.975)).select(
        F.col("mean_rep").alias("ci_hi")
    )
    out = (
        sample_mean.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "sample_mean",
            "ci_lo",
            "ci_hi",
            F.lit(_BOOT_B).cast("long").alias("n_replicates"),
        )
    )
    result = out.localCheckpoint(eager=True)
    v.unpersist()
    return result


@query(
    "agg_spearman",
    oracle="""
WITH t AS (
  SELECT c.c_custkey,
         CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
),
rx AS (
  SELECT bal,
         2 * (CAST(COALESCE(SUM(cnt) OVER (ORDER BY bal
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
           + cnt + 1 AS rank2
  FROM (SELECT bal, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY bal)
),
ry AS (
  SELECT n_orders,
         2 * (CAST(COALESCE(SUM(cnt) OVER (ORDER BY n_orders
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
           + cnt + 1 AS rank2
  FROM (SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY n_orders)
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(rx.rank2) AS BIGINT) AS sx,
         CAST(SUM(ry.rank2) AS BIGINT) AS sy,
         CAST(SUM(rx.rank2 * ry.rank2) AS BIGINT) AS sxy,
         CAST(SUM(rx.rank2 * rx.rank2) AS BIGINT) AS sxx,
         CAST(SUM(ry.rank2 * ry.rank2) AS BIGINT) AS syy
  FROM t JOIN rx ON rx.bal = t.bal JOIN ry ON ry.n_orders = t.n_orders
)
SELECT n,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS spearman_rho
FROM s
""",
    category="aggregations",
)
def agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's account balance
    and their order count — Pearson over TIE-AWARE MIDRANKS kept
    integer by doubling (the agg_mann_whitney trick): every sum in
    the correlation is then exact int64 (n*2rank^2 <= 2^58 at any
    tested SF) and the statistic needs exactly two IEEE sqrts and one
    division at the end — bit-reproducible, no rank() window over a
    nondeterministic tie order anywhere.

    Shape: one join+agg to build (bal, n_orders) per customer, two
    per-VALUE rank grids (running sums over distinct values, tiny),
    two equi-joins back, one global rollup. The bal grid is capped at
    1.1M rows by the fixed acctbal domain [-999.99, 9999.99] and the
    n_orders grid by the per-customer order-count range — both
    enforced by test_value_grid_windows_stay_domain_bounded."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    t = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey", "c_acctbal")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .select(
            (F.col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("bal"),
            "n_orders",
        )
    )

    def rank2_grid(df: DataFrame, col: str) -> DataFrame:
        per_v = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        w_prev = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return per_v.select(
            col,
            (
                2 * F.coalesce(F.sum("cnt").over(w_prev), F.lit(0))
                + F.col("cnt")
                + 1
            ).alias("rank2"),
        )

    rx = rank2_grid(t, "bal").withColumnRenamed("rank2", "r2x")
    ry = rank2_grid(t, "n_orders").withColumnRenamed("rank2", "r2y")
    s = (
        t.join(rx, "bal")
        .join(ry, "n_orders")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("r2x").alias("sx"),
            F.sum("r2y").alias("sy"),
            F.sum(F.col("r2x") * F.col("r2y")).alias("sxy"),
            F.sum(F.col("r2x") * F.col("r2x")).alias("sxx"),
            F.sum(F.col("r2y") * F.col("r2y")).alias("syy"),
        )
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        "n",
        cov.alias("cov_num"),
        (cov.cast("double") / (F.sqrt(vx) * F.sqrt(vy))).alias("spearman_rho"),
    )


@query(
    "agg_welch_t",
    oracle="""
WITH t AS (
  SELECT CASE WHEN ((user_id & 2147483647) * 2654435761) % 4294967296 < 2147483648
              THEN 'A' ELSE 'B' END AS arm,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
m AS (
  SELECT
    CAST(COUNT(CASE WHEN arm = 'A' THEN 1 END) AS BIGINT) AS na,
    CAST(COUNT(CASE WHEN arm = 'B' THEN 1 END) AS BIGINT) AS nb,
    CAST(SUM(CASE WHEN arm = 'A' THEN cents ELSE 0 END) AS BIGINT) AS sa,
    CAST(SUM(CASE WHEN arm = 'B' THEN cents ELSE 0 END) AS BIGINT) AS sb,
    CAST(SUM(CASE WHEN arm = 'A' THEN cents * cents ELSE 0 END) AS BIGINT) AS qa,
    CAST(SUM(CASE WHEN arm = 'B' THEN cents * cents ELSE 0 END) AS BIGINT) AS qb
  FROM t
),
d AS (
  SELECT na, nb,
         CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0 AS mean_a,
         CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0 AS mean_b,
         (CAST(qa * na - sa * sa AS DOUBLE)
            / (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)))
           / CAST(na AS DOUBLE) / 10000.0 AS sea,
         (CAST(qb * nb - sb * sb AS DOUBLE)
            / (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)))
           / CAST(nb AS DOUBLE) / 10000.0 AS seb
  FROM m
)
SELECT na AS n_a, nb AS n_b, mean_a, mean_b,
       (mean_a - mean_b) / sqrt(sea + seb) AS t_stat,
       ((sea + seb) * (sea + seb))
         / (sea * sea / CAST(na - 1 AS DOUBLE)
            + seb * seb / CAST(nb - 1 AS DOUBLE)) AS welch_df
FROM d
""",
    category="aggregations",
)
def agg_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t between the hash arms' purchase
    values — the workhorse A/B significance test. Moments are exact
    int64 (count / sum / sum-of-squares of 2-decimal cents; qa*na <=
    2^60 at the tested SFs), and the statistic plus the
    Welch-Satterthwaite df are derived with an IDENTICAL fixed
    sequence of IEEE double ops in both engines (each division,
    multiply and sqrt correctly rounded -> bit-equal). Shape: ONE
    conditional-aggregate pass, no shuffle beyond the 1-row rollup."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    arm_a = (F.col("user_id").bitwiseAND(2147483647) * 2654435761) % 4294967296 < 2147483648
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    t = ev.select(arm_a.alias("is_a"), cents.alias("cents"))
    m = t.agg(
        F.count(F.when(F.col("is_a"), 1)).alias("na"),
        F.count(F.when(~F.col("is_a"), 1)).alias("nb"),
        F.sum(F.when(F.col("is_a"), F.col("cents")).otherwise(0)).alias("sa"),
        F.sum(F.when(~F.col("is_a"), F.col("cents")).otherwise(0)).alias("sb"),
        F.sum(
            F.when(F.col("is_a"), F.col("cents") * F.col("cents")).otherwise(0)
        ).alias("qa"),
        F.sum(
            F.when(~F.col("is_a"), F.col("cents") * F.col("cents")).otherwise(0)
        ).alias("qb"),
    )
    na, nb = F.col("na"), F.col("nb")
    mean_a = F.col("sa").cast("double") / na.cast("double") / 100.0
    mean_b = F.col("sb").cast("double") / nb.cast("double") / 100.0
    sea = (
        (F.col("qa") * na - F.col("sa") * F.col("sa")).cast("double")
        / (na.cast("double") * (na - 1).cast("double"))
    ) / na.cast("double") / 10000.0
    seb = (
        (F.col("qb") * nb - F.col("sb") * F.col("sb")).cast("double")
        / (nb.cast("double") * (nb - 1).cast("double"))
    ) / nb.cast("double") / 10000.0
    d = m.select(
        na.alias("n_a"),
        nb.alias("n_b"),
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        sea.alias("sea"),
        seb.alias("seb"),
    )
    se2 = F.col("sea") + F.col("seb")
    return d.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        ((F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2)).alias("t_stat"),
        (
            (se2 * se2)
            / (
                F.col("sea") * F.col("sea") / (F.col("n_a") - 1).cast("double")
                + F.col("seb") * F.col("seb") / (F.col("n_b") - 1).cast("double")
            )
        ).alias("welch_df"),
    )


@query(
    "agg_time_weighted_avg",
    oracle="""
WITH s AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         CAST(epoch_us(ts) AS BIGINT) AS us,
         lead(CAST(epoch_us(ts) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_us
  FROM events WHERE event_type = 'purchase'
),
agg AS (
  SELECT user_id,
         CAST(SUM(CAST(cents AS DECIMAL(38,0)) * (next_us - us)) AS DECIMAL(38,0))
           AS num,
         CAST(SUM(next_us - us) AS BIGINT) AS den,
         CAST(COUNT(*) AS BIGINT) AS n_samples
  FROM s WHERE next_us IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, CAST(num AS DOUBLE) AS twa_num, den AS span_us,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 100.0 AS time_weighted_avg,
       n_samples
FROM agg WHERE den > 0
""",
    category="aggregations",
)
def agg_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-weighted average purchase value per user over irregular
    samples (the TimescaleDB time_weight idiom): each observation is
    weighted by how long it was the CURRENT value (LOCF hold until
    the next sample; the open-ended last sample carries no weight).
    Plain AVG over-weights bursts — for billing/telemetry the
    time-weighted mean is the correct statistic.

    Exactness & scale: the numerator is SUM(cents x hold-micros) in
    DECIMAL(38,0) — int64 would overflow once per-user spans exceed
    ~(2^63 / max_cents) microseconds (~3 years at $1000 values), the
    denominator is the exact total covered span, and the single
    double division happens once per user. DECIMAL stays internal:
    the final twa_num is cast to DOUBLE on both twins because the
    driver comparator hashes Spark decimal.Decimal objects unequal
    to DuckDB's float64 rendering of DECIMAL(38,0). One shuffle on user_id
    (window + agg share it), users with <2 samples drop (zero
    covered span)."""
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
        F.unix_micros("ts").alias("us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).where(F.col("next_us").isNotNull())
    agg = s.groupBy("user_id").agg(
        F.sum(
            F.col("cents").cast("decimal(38,0)")
            * (F.col("next_us") - F.col("us"))
        )
        .cast("decimal(38,0)")
        .alias("twa_num"),
        F.sum(F.col("next_us") - F.col("us")).alias("span_us"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    return agg.where(F.col("span_us") > 0).select(
        "user_id",
        F.col("twa_num").cast("double").alias("twa_num"),
        "span_us",
        (
            F.col("twa_num").cast("double") / F.col("span_us").cast("double") / 100.0
        ).alias("time_weighted_avg"),
        "n_samples",
    )


@query(
    "agg_rolling_dau",
    oracle="""
WITH days AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events
),
du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
  FROM events
)
SELECT d.day,
       CAST(COUNT(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS BIGINT)
         AS dau,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau_7d
FROM days d
JOIN du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
GROUP BY d.day
""",
    category="aggregations",
)
def agg_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day distinct users (WAU) per day — the
    engagement metric COUNT(DISTINCT) OVER a RANGE frame cannot
    express in Spark (distinct window aggregates are unsupported):
    instead the (day, user) distinct pairs join to the bounded
    day spine over the 7-day band, and one grouped distinct-count
    does the rest. The spine is tiny (one row per day) so the band
    join fans each (day,user) pair out at most 7x — at any corpus
    scale the cost is 7x the DISTINCT pair table, never n^2. DuckDB
    twin computes the same via the identical band join."""
    ev = table(spark, sf_dir, "events")
    from .. import api

    return (
        api.rolling_distinct(ev, "ts", "user_id", window_days=7)
        .withColumnRenamed("n_current", "dau")
        .withColumnRenamed("n_7d", "wau_7d")
    )


@query(
    "agg_grouping_id",
    oracle="""
SELECT COALESCE(o_orderpriority, '<all>') AS priority,
       COALESCE(o_orderstatus, '<all>') AS status,
       GROUPING(o_orderpriority) AS g_priority,
       GROUPING(o_orderstatus) AS g_status,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
    category="aggregations",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns over a rollup — the ANSI way to
    tell a real NULL group from a subtotal row (agg_rollup
    disambiguates by COALESCE alone, which would conflate them if
    the key column were nullable). grouping()=1 marks the dimension
    as rolled away on that row."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").alias("g_priority"),
            F.grouping("o_orderstatus").alias("g_status"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("priority"),
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("status"),
            "g_priority",
            "g_status",
            "n",
        )
    )


@query("agg_hll_mergeable", oracle=None, category="aggregations")
def agg_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count SKETCHES (Apache DataSketches HLL via
    Spark's first-class hll_* aggregates) — the constant-state
    distributed alternative to COUNT(DISTINCT) that production
    rollups actually persist: per-month partial sketches are built
    independently, OR-merged with hll_union_agg, and the merged
    estimate must equal the flat single-pass estimate EXACTLY (HLL
    union is lossless over sketch registers — the property that makes
    per-partition/per-day partials composable at 100 TB without ever
    reshuffling raw ids; the exact-integer twin is agg_bitmap_rollup).

    Rows-only (DuckDB cannot reproduce DataSketches registers); the
    mergeability equality and the |est-exact|/exact < 5% calibration
    are asserted in tests/test_quality.py. Emits one row of
    deterministic scalars."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("m")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk"),
        F.countDistinct("o_custkey").alias("n_month"),
    )
    merged = monthly.agg(
        F.round(F.hll_sketch_estimate(F.hll_union_agg("sk")), 6).alias("est_merged"),
        F.count(F.lit(1)).alias("n_partials"),
        F.sum("n_month").alias("sum_monthly_distinct"),
    )
    flat = o.agg(
        F.round(F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")), 6).alias(
            "est_flat"
        ),
        F.countDistinct("o_custkey").alias("n_exact"),
    )
    return merged.crossJoin(F.broadcast(flat)).select(
        "est_merged", "est_flat", "n_exact", "n_partials", "sum_monthly_distinct"
    )


@query(
    "agg_session_window_dynamic",
    oracle="""
WITH g AS (
  SELECT user_id, ts,
         ts + CASE event_type WHEN 'click' THEN INTERVAL 30 MINUTE
                              WHEN 'purchase' THEN INTERVAL 60 MINUTE
                              ELSE INTERVAL 15 MINUTE END AS e
  FROM events
),
m AS (
  SELECT user_id, ts, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY ts
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS max_prev
  FROM g
),
f AS (
  SELECT user_id, ts, e,
         CASE WHEN max_prev IS NULL OR ts >= max_prev THEN 1 ELSE 0 END AS is_new
  FROM m
),
s AS (
  SELECT user_id, ts, e,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM f
)
SELECT user_id, MIN(ts) AS session_start, MAX(e) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s
GROUP BY user_id, sid
""",
    category="aggregations",
)
def agg_session_window_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows — Spark's session_window with a
    per-event gap expression (clicks keep a session alive 30 min,
    purchases 60, everything else 15): the engagement-dependent
    sessionization real funnels use, where a conversion event extends
    the session longer than a passive view. Windows [ts, ts+gap)
    merge on overlap; the oracle re-derives the merge independently
    via the running-max-end formulation (new session iff ts >= max of
    all previous ends — tie-order-insensitive, unlike the naive
    lag-based split, which is only correct for constant gaps).

    Same scale shape as the fixed-gap native query: one shuffle on
    user_id, per-key ordered merge inside the session-window
    aggregation."""
    e = table(spark, sf_dir, "events")
    gap = (
        F.when(F.col("event_type") == "click", F.lit("30 minutes"))
        .when(F.col("event_type") == "purchase", F.lit("60 minutes"))
        .otherwise(F.lit("15 minutes"))
    )
    return (
        e.groupBy("user_id", F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query("agg_approx_top_k", oracle=None, category="aggregations")
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy hitters — the bounded-state sketch for "top
    values of a high-cardinality column" (frequent-items / Misra-
    Gries family): constant memory per partition, mergeable partials,
    one pass. Emits the top-3 event types with estimated counts,
    exploded to scalar rows. Rows-only (sketch); the exactness
    property under the maxItemsTracked bound — estimates EQUAL the
    true counts when the tracked-item budget exceeds the distinct
    count — is asserted in tests/test_quality.py."""
    e = table(spark, sf_dir, "events")
    e.select("event_type").createOrReplaceTempView("events_for_topk")
    return spark.sql(
        """
        SELECT t.item AS event_type, CAST(t.count AS BIGINT) AS est_n
        FROM (
          SELECT explode(approx_top_k(event_type, 3)) AS t
          FROM events_for_topk
        )
        """
    )


@query(
    "agg_diversity_simpson",
    oracle="""
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_i
  FROM documents GROUP BY source, lang
),
s AS (
  SELECT source,
         CAST(SUM(n_i) AS BIGINT) AS n,
         CAST(SUM(n_i * n_i) AS BIGINT) AS sum_sq,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM c GROUP BY source
)
SELECT source, n, n_langs, sum_sq,
       1.0 - CAST(sum_sq AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
         AS simpson_diversity
FROM s
""",
    category="aggregations",
)
def agg_diversity_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini–Simpson diversity index per corpus source — 1 − Σp_i²,
    the no-logarithm diversity metric (companion of agg_hhi, which is
    Σp_i² itself over activity): the probability two random docs from
    a source differ in language, the mix-health check of a corpus
    recipe. All mass terms exact integers; floats enter only in the
    final fixed-order divide/subtract, so both engines agree
    bit-for-bit. Two bounded hash-aggs (domain: sources × langs)."""
    d = table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_i"))
    s = c.groupBy("source").agg(
        F.sum("n_i").alias("n"),
        F.sum(F.col("n_i") * F.col("n_i")).alias("sum_sq"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    return s.select(
        "source",
        "n",
        "n_langs",
        "sum_sq",
        (
            F.lit(1.0)
            - F.col("sum_sq").cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("simpson_diversity"),
    )


@query(
    "agg_decayed_value",
    oracle="""
WITH d AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') AS age
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents * (CAST(1 AS BIGINT) << (31 - LEAST(31, GREATEST(1, age)))))
            AS BIGINT) AS decayed_num,
       CAST(SUM(cents * (CAST(1 AS BIGINT) << (31 - LEAST(31, GREATEST(1, age)))))
            AS DOUBLE) / 214748364800.0 AS decayed_score
FROM d
GROUP BY user_id
""",
    category="aggregations",
)
def agg_decayed_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAYED engagement score — the recency-weighted feature a
    feature store maintains per user (halving per day of age):
    score = Σ value·2^(−age_days). Computed as EXACT dyadic
    rationals: each term is cents·2^(31−age) in int64 (value ≤
    2^15 cents, exponent ≤ 30, row term ≤ 2^45 — a billion-row user
    still fits int64), summed exactly, with ONE double division by
    the common denominator 2^31·100 at the end. The weight 2^e is an
    exactly-representable power of two (DuckDB shifts; Spark's
    pow(2, e) is exact for integer e ≤ 30 and is cast straight back
    to int64), so there is no float-summation order dependence —
    bit-identical across engines and partitionings.

    One hash-agg on user_id; the decay weight is map-side
    arithmetic."""
    e = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    age = F.datediff(F.lit("2024-02-01").cast("date"), F.col("ts").cast("date"))
    expo = 31 - F.least(F.lit(31), F.greatest(F.lit(1), age))
    term = cents * F.expr("CAST(1 AS BIGINT)") * F.pow(F.lit(2.0), expo).cast("long")
    d = e.select("user_id", term.alias("term"))
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("term").alias("decayed_num"),
        (F.sum("term").cast("double") / F.lit(214748364800.0)).alias(
            "decayed_score"
        ),
    )


@query(
    "agg_pareto_deciles",
    oracle="""
WITH d AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p,
         ntile(10) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS decile
  FROM orders
),
s AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(p) AS DECIMAL(28,2)) AS rev
  FROM d GROUP BY decile
),
t AS (SELECT CAST(SUM(p) AS DECIMAL(28,2)) AS total FROM d)
SELECT decile, n_orders,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(rev AS DOUBLE) / CAST(total AS DOUBLE) AS share,
       CAST(SUM(CAST(rev AS DOUBLE)) OVER (ORDER BY decile) AS DOUBLE)
         / CAST(total AS DOUBLE) AS cum_share
FROM s, t
""",
    category="aggregations",
)
def agg_pareto_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REVENUE CONCENTRATION (Pareto) curve — deciles of orders by
    value with each decile's exact-decimal revenue, share, and
    cumulative share (the 80/20 readout next to agg_gini/agg_hhi,
    which compress the same curve to one number). Decile assignment
    is a total order (price desc, orderkey tie-break); revenue sums
    are exact DECIMAL before the one cast-to-double per output
    column; the cumulative share sums 10 doubles in a fixed order.

    Decile assignment runs through the ``ntile_distributed`` kernel
    (r6 — range repartition + broadcast offsets, bit-equal to ntile
    by driver grade + hypothesis twin), so no single-task sort; the
    10-row rollup afterwards is trivially bounded."""
    from .windows import ntile_distributed

    o = table(spark, sf_dir, "orders")
    d = ntile_distributed(
        o.select("o_totalprice", "o_orderkey"),
        10,
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        "decile",
    ).select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"), "decile"
    )
    s = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("p").cast("decimal(28,2)").alias("rev"),
    )
    t = d.agg(F.sum("p").cast("decimal(28,2)").alias("total"))
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "decile",
            "n_orders",
            F.col("rev").cast("double").alias("revenue"),
            (F.col("rev").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
            (
                F.sum(F.col("rev").cast("double")).over(wc)
                / F.col("total").cast("double")
            ).alias("cum_share"),
        )
    )


@query(
    "agg_new_vs_returning",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
f AS (
  SELECT user_id, day,
         MIN(day) OVER (PARTITION BY user_id) AS first_day
  FROM d
)
SELECT day,
       CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN day > first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning,
       CAST(COUNT(*) AS BIGINT) AS n_active
FROM f
GROUP BY day
""",
    category="aggregations",
)
def agg_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily NEW vs RETURNING active users — the growth-accounting
    split every product dashboard leads with: a user's first-seen
    day classifies each of their active days. One distinct over
    (user, day), a per-user MIN window on the same partitioning, and
    a bounded per-day rollup — no self-join against history (the
    naive formulation), no second scan. Day stays TIMESTAMP per the
    DATE canonicalization rule.

    At 100 TB the (user, day) distinct is the only corpus-scale
    stage; the window rides its partitioning."""
    e = table(spark, sf_dir, "events")
    d = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    f = d.withColumn(
        "first_day", F.min("day").over(Window.partitionBy("user_id"))
    )
    return f.groupBy("day").agg(
        F.sum((F.col("day") == F.col("first_day")).cast("int")).cast("long").alias(
            "n_new"
        ),
        F.sum((F.col("day") > F.col("first_day")).cast("int")).cast("long").alias(
            "n_returning"
        ),
        F.count(F.lit(1)).alias("n_active"),
    )


@query("agg_kll_quantile_sketch", oracle=None, category="aggregations")
def agg_kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketches (Apache DataSketches KLL via Spark
    4's first-class kll_* aggregates) — the constant-state
    distributed alternative to exact percentile that production
    rollups persist: per-month partial sketches of order totals are
    built independently, merged with kll_merge_agg_double, and
    queried for the quartiles + p90; the flat single-pass sketch is
    computed alongside. Merged and flat estimates differ (KLL
    compaction depends on how the stream was split into partials)
    but BOTH must sit within the sketch's normalized rank-error
    bound of the exact percentile — asserted in
    tests/test_quality.py.

    This is the at-scale sibling of agg_percentile (exact, needs the
    full value multiset per group) and agg_percentile_approx
    (Spark's t-digest-style built-in): per-day/per-partition KLL
    partials compose at 100 TB without ever reshuffling raw values.
    Rows-only (DuckDB has no DataSketches KLL)."""
    o = table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(F.kll_sketch_agg_double("o_totalprice").alias("sk"))
    qs = [0.25, 0.5, 0.75, 0.9]
    merged = monthly.agg(
        *[
            F.expr(
                f"kll_sketch_get_quantile_double(kll_merge_agg_double(sk), {q})"
            ).alias(f"m{int(q * 100)}")
            for q in qs
        ]
    )
    flat = o.agg(
        *[
            F.expr(
                "kll_sketch_get_quantile_double("
                f"kll_sketch_agg_double(o_totalprice), {q})"
            ).alias(f"f{int(q * 100)}")
            for q in qs
        ],
        F.expr(
            "percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.9))"
        ).alias("exact"),
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(q).alias("q"),
                F.col(f"m{int(q * 100)}").alias("est_merged"),
                F.col(f"f{int(q * 100)}").alias("est_flat"),
                F.element_at("exact", i + 1).alias("exact_pct"),
            )
            for i, q in enumerate(qs)
        ]
    )
    return (
        merged.crossJoin(F.broadcast(flat))
        .select(F.explode(pairs).alias("r"))
        .select("r.q", "r.est_merged", "r.est_flat", "r.exact_pct")
    )


@query("agg_theta_sketch_setops", oracle=None, category="aggregations")
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (Apache DataSketches via Spark 4's theta_*
    functions) — distinct-count sketches that, unlike HLL, support
    full SET ALGEBRA: estimate |buyers ∪ clickers|,
    |buyers ∩ clickers| and |buyers \\ clickers| from two
    independently-built sketches, next to the exact distinct counts
    computed from the raw events. The audience-overlap question
    ("how many purchasers never click?") is THE production use of
    sketch intersection — with HLL it requires re-scanning raw ids,
    with theta it's a driver-free sketch-to-sketch operation that
    composes over per-partition partials (theta_union_agg) at
    100 TB. Calibration (estimates within 5% of exact at fixture
    cardinalities) is asserted in tests/test_quality.py.
    Rows-only (DuckDB has no DataSketches theta)."""
    e = table(spark, sf_dir, "events")
    buyers = e.where(F.col("event_type") == "purchase").agg(
        F.expr("theta_sketch_agg(user_id)").alias("s"),
        F.countDistinct("user_id").alias("n"),
    )
    clickers = e.where(F.col("event_type") == "click").agg(
        F.expr("theta_sketch_agg(user_id)").alias("s"),
        F.countDistinct("user_id").alias("n"),
    )
    exact = e.where(F.col("event_type").isin("purchase", "click")).agg(
        F.countDistinct("user_id").alias("n_union"),
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("n_buy"),
        F.countDistinct(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("n_click"),
    )
    b, c = buyers.alias("b"), clickers.alias("c")
    return (
        b.crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(exact))
        .select(
            F.round(
                F.expr("theta_sketch_estimate(theta_union(b.s, c.s))"), 6
            ).alias("est_union"),
            F.round(
                F.expr("theta_sketch_estimate(theta_intersection(b.s, c.s))"),
                6,
            ).alias("est_intersect"),
            F.round(
                F.expr("theta_sketch_estimate(theta_difference(b.s, c.s))"), 6
            ).alias("est_buyers_only"),
            F.col("n_union").alias("exact_union"),
            (F.col("n_buy") + F.col("n_click") - F.col("n_union")).alias(
                "exact_intersect"
            ),
            (F.col("n_union") - F.col("n_click")).alias("exact_buyers_only"),
        )
    )


_CMS_PROBE_KEYS = [1, 2, 3, 4, 5]


@query("agg_count_min_sketch", oracle=None, category="aggregations")
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch — mergeable FREQUENCY estimation (how many
    orders did customer k place?) in constant state per partial,
    completing the sketch family (HLL/theta: distinct; KLL:
    quantiles; CMS: per-key counts). Monthly partial sketches of
    o_custkey are built with count_min_sketch(eps=0.001, conf=0.99,
    seed=42), MERGED driver-side through the JVM sketch library's
    mergeInPlace (bounded staging: one ~8 KB sketch per month), and
    probed for five customer keys next to the flat single-pass
    sketch and the exact counts. CMS guarantees est >= exact and
    est <= exact + eps*N w.p. conf — both asserted in
    tests/test_quality.py. Rows-only (no DuckDB CMS).

    Classic-session only: the driver-side merge reaches the JVM
    sketch library through ``spark.sparkContext._jvm``, a private
    gateway that does not exist under Spark Connect (there the merge
    would need a connect-side plugin or an ``F.expr`` merge if Spark
    ever exposes one). An empty orders table degrades cleanly: the
    flat sketch aggregate still yields one (empty) sketch row, and
    the monthly merge seeds from a fresh empty JVM sketch with the
    identical (eps, conf, seed) triple rather than staying None."""
    o = table(spark, sf_dir, "orders")
    cms = "count_min_sketch(o_custkey, 0.001d, 0.99d, 42)"
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("m")
    ).agg(F.expr(cms).alias("sk"))
    flat_sk = bytes(o.agg(F.expr(cms).alias("sk")).collect()[0]["sk"])
    jvm = spark.sparkContext._jvm
    CMS = jvm.org.apache.spark.util.sketch.CountMinSketch

    def read(b: bytes):
        return CMS.readFrom(jvm.java.io.ByteArrayInputStream(b))

    # Seed with an empty same-parameter sketch: an empty orders table
    # produces zero monthly rows, and a None seed would blow up at
    # estimateCount below.
    merged = CMS.create(0.001, 0.99, 42)
    for r in monthly.collect():
        merged = merged.mergeInPlace(read(bytes(r["sk"])))
    flat = read(flat_sk)
    est = {
        int(k): (int(merged.estimateCount(k)), int(flat.estimateCount(k)))
        for k in _CMS_PROBE_KEYS
    }
    exact = {
        r["o_custkey"]: r["n"]
        for r in o.where(F.col("o_custkey").isin(_CMS_PROBE_KEYS))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = [
        (k, est[k][0], est[k][1], int(exact.get(k, 0)))
        for k in _CMS_PROBE_KEYS
    ]
    return spark.createDataFrame(
        rows, "custkey long, est_merged long, est_flat long, exact long"
    )


_TRANSPOSE_TYPES = ["click", "error", "purchase", "signup", "view"]
_TP_CELL = (
    "CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)"
)


@query(
    "agg_transpose",
    oracle=f"""
WITH r AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         {_TP_CELL} AS sum_cents
  FROM events GROUP BY event_type
)
SELECT 'n_events' AS key,
  (SELECT n_events FROM r WHERE event_type = 'click') AS click,
  (SELECT n_events FROM r WHERE event_type = 'error') AS error,
  (SELECT n_events FROM r WHERE event_type = 'purchase') AS purchase,
  (SELECT n_events FROM r WHERE event_type = 'signup') AS signup,
  (SELECT n_events FROM r WHERE event_type = 'view') AS view
UNION ALL
SELECT 'sum_cents',
  (SELECT sum_cents FROM r WHERE event_type = 'click'),
  (SELECT sum_cents FROM r WHERE event_type = 'error'),
  (SELECT sum_cents FROM r WHERE event_type = 'purchase'),
  (SELECT sum_cents FROM r WHERE event_type = 'signup'),
  (SELECT sum_cents FROM r WHERE event_type = 'view')
""",
    category="aggregations",
)
def agg_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose()`` — the Spark 4.0 relational transpose
    (SPARK-47081): the per-event-type metric rollup flips so metrics
    become rows and event types become columns — the
    report/crosstab-final-mile shape analysts otherwise hand-roll
    with k pivot expressions.  Metric cells are exact int64 (count,
    decimal-cents sum) so the transposed frame hash-compares.

    Semantics pinned here: the FIRST column supplies the new header
    (values must be distinct; Spark errors otherwise), the remaining
    columns must share a least-common type (all BIGINT here), and
    the original column names arrive in a ``key`` column.  The final
    select pins the fixture's five event types IN ORDER, so a
    fixture drift fails loudly instead of silently reshaping.

    Scale: transpose is header-driven — the input here is the
    BOUNDED rollup (5 rows), never the fact table; the data-
    proportional work is the ordinary partial/final hash aggregate
    that produced it (one shuffle).  Transposing a data-proportional
    frame would put the row count in the SCHEMA, which is the
    documented anti-pattern this query avoids."""
    e = table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    roll = (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_cents"),
        )
        .orderBy("event_type")
    )
    return roll.transpose().select("key", *_TRANSPOSE_TYPES)


@query(
    "agg_holt_linear",
    oracle="""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
ord AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
  FROM daily
),
n AS (SELECT event_type, MAX(rn) AS n_days FROM ord GROUP BY event_type),
rec AS (
  SELECT o1.event_type, 2 AS t, o1.v AS l, o1.v - o0.v AS b
  FROM ord o1 JOIN ord o0 ON o1.event_type = o0.event_type
  WHERE o1.rn = 2 AND o0.rn = 1
  UNION ALL
  SELECT r.event_type, r.t + 1,
         0.5 * o.v + 0.5 * (r.l + r.b),
         0.5 * ((0.5 * o.v + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
  FROM rec r JOIN ord o ON o.event_type = r.event_type AND o.rn = r.t + 1
)
SELECT rec.event_type, CAST(n.n_days AS BIGINT) AS n_days,
       rec.l AS level, rec.b AS trend, rec.l + rec.b AS forecast_next
FROM rec JOIN n ON rec.event_type = n.event_type
WHERE rec.t = n.n_days AND n.n_days >= 2
""",
    category="aggregations",
)
def agg_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + linear trend,
    alpha = beta = 0.5) over each event type's daily revenue series,
    with the one-step-ahead forecast — the classic ops-forecasting
    primitive (capacity planning, anomaly baselines) missing between
    agg_ewma's single smoother and pipeline_traffic_anomaly's
    trailing baseline. Initialization l = x2, b = x2 - x1;
    recursion l_t = a*x_t + (1-a)*(l+b), b_t = g*(l_t - l) + (1-g)*b.

    The recursion is inherently sequential, so it runs as an ARRAY
    FOLD (F.aggregate) over each type's sorted 30-day series — state
    per group is bounded by CALENDAR DAYS, not data volume: at
    100 TB the shape is the same two partial/final hash aggregations
    (type×day rollup, then per-type fold), no window over raw
    events, no Python. The 0.5 coefficients are exact binary
    fractions and the fold order is totally specified, so every
    intermediate is the same IEEE double in both engines — the
    DuckDB twin replays the recursion as a recursive CTE and the
    grade is hash-exact (verified at all three SFs)."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(dsum(F.col("value")).alias("v"))
    series = (
        daily.groupBy("event_type")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("d", "v"))),
                lambda s: s.getField("v"),
            ).alias("xs"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .where(F.col("n_days") >= 2)
    )
    xs = F.col("xs")
    init = F.struct(
        xs[1].alias("l"), (xs[1] - xs[0]).alias("b")
    )
    def step(acc, x):
        l_new = 0.5 * x + 0.5 * (acc.getField("l") + acc.getField("b"))
        return F.struct(
            l_new.alias("l"),
            (0.5 * (l_new - acc.getField("l")) + 0.5 * acc.getField("b")).alias("b"),
        )
    fin = F.aggregate(
        F.slice(xs, F.lit(3), F.greatest(F.size(xs) - 2, F.lit(0))),
        init,
        step,
    )
    return series.select(
        "event_type",
        "n_days",
        fin.getField("l").alias("level"),
        fin.getField("b").alias("trend"),
        (fin.getField("l") + fin.getField("b")).alias("forecast_next"),
    )
