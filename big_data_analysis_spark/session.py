"""SparkSession construction and per-session hardening.

Local grading env is ``local[32]`` (single JVM, 32 threads, shuffles
through local disk). On a real cluster the same builder applies —
only master/memory change; the session-level SQL conf below is what
the engine's operators assume (UTC, AQE, Arrow).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SCRATCH_DIRS: list[str] = []


def scratch_dir(prefix: str = "bda_") -> str:
    """mkdtemp that is removed at interpreter exit.

    Query functions stage sink output / stream replay files in temp
    dirs; without cleanup, repeated parity or bench runs accumulate
    unbounded temp data. Every ephemeral dir in the package goes
    through here.
    """
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d


@atexit.register
def _cleanup_scratch() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)

# Conf the engine REQUIRES for correctness (timezone pinning, Arrow
# for pandas-UDF paths) or assumes for performance (AQE). All of
# these are runtime-settable, so harden_session() can also apply them
# to an externally supplied session (e.g. the grading driver's).
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # dims (region/nation/supplier/part at small sf) stay broadcastable
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # stream_watermark_census (and every drain_to_memory watermark
    # grade) relies on the trailing no-data micro-batch to advance the
    # watermark and FINALIZE closed windows before
    # processAllAvailable() returns; true is the Spark default but an
    # environment override would silently emit zero rows — pin it.
    "spark.sql.streaming.noDataMicroBatches.enabled": "true",
    # Every oracle pair was developed and graded under ANSI SQL mode
    # (the Spark 4.x default): cast overflow errors instead of
    # wrapping, integral / stays integral, array index is 1-checked.
    # An environment override to false would silently change
    # cast/overflow/division semantics out from under the DuckDB
    # comparison (DuckDB is ANSI-strict), so pin it like
    # noDataMicroBatches above.
    "spark.sql.ansi.enabled": "true",
}


def harden_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's required runtime SQL conf to any session.

    Called at the top of every registered query so results are
    correct (UTC timestamps vs the DuckDB oracle) even when the
    caller built the session without our builder.
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf may be static in some deployments; best effort
    return spark


def get_spark(app_name: str = "big_data_analysis_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle partitions ~ cores: at 100 TB on a 1000-executor
        # cluster this would be raised to ~2-4x total cores; AQE
        # coalesces small post-shuffle partitions either way.
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return harden_session(spark)
