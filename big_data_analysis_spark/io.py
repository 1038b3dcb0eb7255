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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so SQL-expressed queries can run textually
    parallel to their DuckDB oracle twin."""
    for n in names or TABLES:
        table(spark, sf_dir, n).createOrReplaceTempView(n)
