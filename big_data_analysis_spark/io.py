"""Table loading helpers over the driver-generated parquet fixtures.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table
under ``{sf_dir}/{name}.parquet``.

Scans go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning for free; callers must select narrow and
filter early (verified via .explain in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import harden_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Bounded dimension tables: safe to broadcast at ANY scale factor
# (region=5, nation=25 rows always; supplier/part grow slowly).
BROADCAST_SAFE = ("region", "nation")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    harden_session(spark)
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to TimestampType (UTC session) whatever
    the fixture's physical layout is — the driver has shipped both:

    - TIMESTAMP(NANOS): Spark 4 refuses to read it natively, so it
      arrives as a long (nanosAsLong) and is truncated to micros
      with INTEGER division (ns epochs ~1.7e18 exceed the 53-bit
      double mantissa; a float divide would corrupt timestamps).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
      TIMESTAMP_NTZ; the cast to TimestampType is micro-exact under
      the pinned UTC session timezone.

    Both match DuckDB's reading of the same file."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F

    if dict(df.dtypes)["ts"] == "bigint":  # raw nanos
        ts = F.timestamp_micros(F.expr("ts DIV 1000"))
    else:  # timestamp or timestamp_ntz, already micros
        ts = F.col("ts").cast("timestamp")
    return df.withColumn("ts", ts)


def _planned_scan_splits(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Byte-range splits Spark will plan for the table's scan —
    ceil(file bytes / maxPartitionBytes), the same arithmetic
    FilePartition uses (openCost is irrelevant for one file).  Local
    paths only; anything un-stat-able reports "plenty" so spread_table
    never repartitions a layout it cannot see."""
    import os

    try:
        size = os.path.getsize(f"{sf_dir.rstrip('/')}/{name}.parquet")
    except OSError:
        return 1 << 30
    mpb = int(spark.conf.get("spark.sql.files.maxPartitionBytes", str(128 << 20)))
    return max(1, -(-size // mpb))


def spread_table(spark: SparkSession, sf_dir: str, name: str, *keys: str) -> DataFrame:
    """Unsplittable-input mitigation (optimization guide §2.5: "one
    huge unsplittable file ... otherwise repartition immediately after
    the read").

    The fixture tables are single-file, SINGLE-ROW-GROUP parquet, so
    no matter the core count every scan plans exactly one row-bearing
    task — all per-row compute between the scan and the first Exchange
    runs sequentially.  When (and only when) the planned scan
    parallelism is below the session's defaultParallelism, hash-
    repartition on the (unique, high-cardinality) row key so
    downstream map work uses the whole cluster (guide §2.5
    synthetic-key note: a skewless key, never rand()).  On a
    production layout — many files / row groups, planned splits >=
    cores — the guard makes this a provable no-op, so NO extra
    Exchange exists at 100 TB; the repartition only ever fires on
    degenerate layouts where a sequential stage is the alternative.
    Deterministic: hash partitioning by a stable key commutes with
    every aggregation / equi-join / key-partitioned window placed on
    top (callers are restricted to those shapes, each re-verified
    against its oracle)."""
    df = table(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if _planned_scan_splits(spark, sf_dir, name) >= target:
        return df
    from pyspark.sql import functions as F

    return df.repartition(target, *[F.col(k) for k in keys])


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so SQL-expressed queries can run textually
    parallel to their DuckDB oracle twin."""
    for n in names or TABLES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
