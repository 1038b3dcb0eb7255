"""Streaming semantics tests (SURVEY.md §5.5): watermark eviction,
late-data drop, stateful final-state equivalence — the behaviors the
batch oracle can't grade."""

from pyspark.sql import functions as F

from big_data_analysis_spark.registry import load_all

REG = load_all()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir)


def _events_batch(spark, sf_dir):
    from big_data_analysis_spark.io import table

    return table(spark, sf_dir, "events")


def test_watermark_emits_only_closed_windows(spark, sf_dir):
    emitted = run("stream_watermark", spark, sf_dir).collect()
    ev = _events_batch(spark, sf_dir)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    all_windows = (
        ev.groupBy(F.window("ts", "6 hours"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
        )
        .collect()
    )
    import datetime

    wm = max_ts - datetime.timedelta(hours=1)
    closed = {(r.window_start, r.n) for r in all_windows if r.window_end <= wm}
    got = {(r.window_start, r.n) for r in emitted}
    assert got == closed, f"append-mode emitted {len(got)} vs closed {len(closed)}"


def test_late_drop_drops_rows(spark, sf_dir):
    emitted = run("stream_late_drop", spark, sf_dir)
    n_emitted = emitted.agg(F.sum("n")).collect()[0][0]
    n_total = _events_batch(spark, sf_dir).count()
    assert n_emitted < n_total, "out-of-order replay should drop late rows"
    assert n_emitted > 0


def test_stateful_final_state_matches_batch(spark, sf_dir):
    rows = run("stream_stateful", spark, sf_dir).collect()
    # memory sink holds one row per (user, emission); last emission
    # per user == final state. With maxFilesPerTrigger=1 and one
    # staged file there is exactly one emission per user.
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.max_value)
    batch = {
        r.user_id: (r.n, r.mx)
        for r in _events_batch(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, (n, mx) in batch.items():
        got_n, got_mx = final[uid]
        assert got_n == n and abs(got_mx - mx) < 1e-12


def test_stream_batch_window_equivalence(spark, sf_dir):
    """Tumbling-window streaming result == the same algebra run in
    batch (the core incrementalization guarantee)."""
    streamed = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in run("stream_tumbling", spark, sf_dir).collect()
    }
    batch = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in _events_batch(spark, sf_dir)
        .groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n", "sum_value"
        )
        .collect()
    }
    assert streamed == batch


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill a checkpointed stream after its first micro-batch and
    restart it from the same checkpoint: the sink must end with every
    event exactly once (no loss from the first run, no duplicates
    from the restart) — the core exactly-once guarantee of the
    foreachBatch/file-sink pattern."""
    import time

    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from big_data_analysis_spark.io import table

    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ev = table(spark, sf_dir, "events")  # ts normalized TimestampType
    us = F.unix_micros(F.col("ts"))
    half = ev.select(F.percentile(us, F.lit(0.5)).alias("c")).collect()[0]["c"]
    ev.where(us <= half).coalesce(1).write.parquet(f"{src_dir}/f0")
    time.sleep(1.1)
    ev.where(us > half).coalesce(1).write.parquet(f"{src_dir}/f1")
    replay_schema = T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.TimestampType())
            for f in ev.schema.fields
        ]
    )

    def start():
        s = (
            spark.readStream.schema(replay_schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src_dir)
            .select("event_id", "event_type")
        )
        return (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    # run 1: stop after the first committed batch
    q = start()
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if q.lastProgress and q.lastProgress["batchId"] >= 0:
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)

    # run 2: resume from the checkpoint, drain everything
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    got = spark.read.parquet(out)
    n_total = ev.count()
    assert got.count() == n_total, "restart lost or duplicated rows"
    assert got.select("event_id").distinct().count() == n_total


def test_rate_source_dense_unique(spark, sf_dir):
    from big_data_analysis_spark.registry import REGISTRY

    rows = REGISTRY["stream_rate_source"].fn(spark, sf_dir).collect()
    total = sum(r.n for r in rows)
    lo = min(r.min_value for r in rows)
    hi = max(r.max_value for r in rows)
    # dense & unique: count == span of generated values
    assert total == hi - lo + 1 and total > 0
