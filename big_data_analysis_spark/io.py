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


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so SQL-expressed queries can run textually
    parallel to their DuckDB oracle twin."""
    for n in names or TABLES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
