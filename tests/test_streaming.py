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


def test_watermark_census_matches_rule(spark, sf_dir):
    """The hash-exact census twin: same plan as stream_watermark, so
    its emitted set must obey the same closed-window rule (oracle
    definition replayed against an independent batch recomputation)."""
    got = run("stream_watermark_census", spark, sf_dir)
    assert got.columns == ["window_start", "window_end", "n"]
    import datetime

    ev = _events_batch(spark, sf_dir)
    wm = ev.agg(F.max("ts")).collect()[0][0] - datetime.timedelta(hours=1)
    rows = got.collect()
    assert rows, "census should emit at least one closed window"
    assert all(r.window_end <= wm for r in rows)
    n_closed = ev.where(
        F.window("ts", "6 hours").end <= F.lit(wm)
    ).count()
    assert sum(r.n for r in rows) == n_closed


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


def test_stateful_event_time_timeout_closes_and_resets(spark, tmp_path):
    """Adversarial replay for stateful timeout semantics: a user's
    state must CLOSE (emit + remove) once the watermark passes its
    timeout timestamp, and the user's reappearance afterwards must
    start a FRESH session (count restarts at 1, not accumulated) —
    the failure mode of a sessionizer that never removes state.
    Watermark movement is data-driven, so the batch sequence is
    deterministic: b1 seeds user 100, b2/b3 advance the watermark
    past 100's timeout, b4 replays user 100."""
    import os
    import time
    import uuid

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )

    def write_batch(idx, rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        df = spark.createDataFrame(pdf, schema)
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/.tmp{idx}")
        import glob as g
        import shutil

        part = g.glob(f"{src}/.tmp{idx}/part-*.parquet")[0]
        dst = f"{src}/b{idx}.parquet"
        shutil.move(part, dst)
        shutil.rmtree(f"{src}/.tmp{idx}")
        os.utime(dst, (time.time() + idx, time.time() + idx))

    base = "2024-01-01 00:"
    write_batch(0, [(100, base + "00:00"), (100, base + "00:05")])
    write_batch(1, [(200, base + "10:00")])  # watermark -> 09:55
    write_batch(2, [(300, base + "20:00")])  # 100 times out this batch
    write_batch(3, [(100, base + "30:00")])  # fresh session for 100

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
        .withWatermark("ts", "5 seconds")
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("status", T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "status": ["closed"]}
            )
            return
        n = state.get[0] if state.exists else 0
        last_ms = None
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                ms = int(pdf["ts"].max().value // 1_000_000)
                last_ms = ms if last_ms is None else max(last_ms, ms)
        state.update((n,))
        # session closes 60s after the last event (event time)
        state.setTimeoutTimestamp(last_ms + 60_000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "status": ["open"]}
        )

    result = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(f"SELECT * FROM {name}").collect()

    closed_100 = [r for r in rows if r.user_id == 100 and r.status == "closed"]
    opens_100 = [r for r in rows if r.user_id == 100 and r.status == "open"]
    # exactly one closed session carrying the pre-timeout count
    assert [r.n_events for r in closed_100] == [2]
    # the replayed appearance starts a FRESH session: its open
    # emission counts 1 (state was removed), never 3 (accumulated)
    assert opens_100[-1].n_events == 1
    assert {r.n_events for r in opens_100} == {2, 1}
    # the watermark-driver users each opened their own session
    assert {r.user_id for r in rows if r.status == "open"} >= {100, 200, 300}


def test_foreachbatch_restart_recovery_exactly_once(spark, sf_dir, tmp_path):
    """Exactly-once under crash/restart (the claim in
    stream_sink_foreachbatch's name, proven): a foreachBatch writer
    crashes AFTER a partial write of batch 2; restarting from the
    same checkpoint replays batch 2 under the SAME batch id, the
    overwrite-by-batch-id sink replaces the partial output, and the
    final target holds every event exactly once — no dups, no loss."""
    import pytest

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "event_type")
    )
    total = ev.count()
    src = str(tmp_path / "src")
    ev.repartition(5).write.parquet(src)  # 5 files -> 5 micro-batches
    schema = spark.read.parquet(src).schema
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    state = {"crashed": False}

    def write_batch(bdf, bid):
        if bid == 2 and not state["crashed"]:
            state["crashed"] = True
            # simulate dying mid-write: half the batch lands, then crash
            bdf.limit(7).write.mode("overwrite").parquet(f"{out}/batch_id={bid}")
            raise RuntimeError("injected crash after partial write")
        bdf.write.mode("overwrite").parquet(f"{out}/batch_id={bid}")

    def start():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(write_batch)
            .start()
        )

    q = start()
    with pytest.raises(Exception, match="injected crash"):
        q.processAllAvailable()
    q.stop()
    assert state["crashed"]
    # the failure window is real: batch 2's dir exists but is partial
    partial = spark.read.parquet(f"{out}/batch_id=2").count()
    assert 0 < partial < total

    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = spark.read.option("recursiveFileLookup", "true").parquet(out)
    assert got.count() == total  # no loss, no dups
    assert got.select("event_id").distinct().count() == total
    want_ids = {r.event_id for r in ev.select("event_id").collect()}
    got_ids = {r.event_id for r in got.select("event_id").collect()}
    assert got_ids == want_ids


def test_python_stream_source_checkpoint_restart(spark, tmp_path):
    """The custom SimpleDataSourceStreamReader must replay correctly
    across a checkpointed restart: stop the query after the first
    micro-batches, restart from the same checkpoint (Spark re-reads
    committed ranges via readBetweenOffsets and continues from the
    last offset), and the final aggregate equals the closed form —
    no loss, no double-count."""
    from big_data_analysis_spark.streaming.stream_ops import _rangefeed_datasource

    try:
        spark.dataSource.register(_rangefeed_datasource())
    except Exception:
        pass
    ckpt = str(tmp_path / "ckpt")
    name = "rangefeed_restart_sink"

    def start():
        s = spark.readStream.format("rangefeed").load()
        agg = s.groupBy("tag").agg(
            F.count(F.lit(1)).alias("n"), F.sum("val").alias("sum_val")
        )
        return (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    # let at least one micro-batch commit, then stop mid-feed
    import time

    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if any(p.get("batchId", -1) >= 1 for p in [q.lastProgress or {}]):
            break
        time.sleep(0.5)
    q.stop()

    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {r.tag: (r.n, r.sum_val) for r in spark.table(name).collect()}
    want = {}
    for i in range(1000):
        t = f"p{i % 5}"
        n, s_ = want.get(t, (0, 0))
        want[t] = (n + 1, s_ + (i * i) % 997)
    assert got == want


def test_streaming_progress_reports_state_metrics(spark, sf_dir):
    """The StreamingQueryProgress telemetry must reflect the state
    store's true contents: after draining the tumbling aggregation,
    the reported stateOperators rows-total equals the number of live
    aggregation states ((window, event_type) groups), and input-rows
    across progress updates equals the source row count — the
    monitoring contract an operator alert is built on."""
    from big_data_analysis_spark.streaming.stream_ops import read_event_stream

    s = read_event_stream(spark, sf_dir)
    agg = s.groupBy(F.window("ts", "6 hours"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("progress_probe_sink")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        progresses = [p for p in q.recentProgress if p]
        total_in = sum(p["numInputRows"] for p in progresses)
        state_rows = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()
    ev = _events_batch(spark, sf_dir)
    assert total_in == ev.count()
    expected_groups = (
        ev.groupBy(F.window("ts", "6 hours"), "event_type").count().count()
    )
    assert state_rows == expected_groups


def test_tws_probe_matches_environment():
    """The transformWithStateInPandas capability probe must agree
    with reality: True iff the protobuf-backed protocol stubs
    import. In this container google.protobuf is absent, so the
    probe documents the blocker instead of letting the worker
    explode mid-query; on a protobuf-equipped cluster the probe
    flips and the new-API path runs unchanged."""
    from big_data_analysis_spark.streaming.stream_ops import (
        tws_protocol_available,
    )

    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        expected = True
    except ImportError:
        expected = False
    assert tws_protocol_available() is expected


def test_tws_processor_state_transitions_match_batch():
    """RunningMaxProcessor's state transitions, driven through a fake
    handle (no state server), must reproduce the batch aggregate for
    any batch split — the processor logic itself is deterministic
    even where the wire protocol can't run."""
    import pandas as pd

    from big_data_analysis_spark.streaming.stream_ops import (
        RunningMaxProcessor,
    )

    class FakeValueState:
        def __init__(self):
            self.v = None

        def get(self):
            return self.v

        def update(self, new):
            self.v = tuple(new)

    class FakeHandle:
        def __init__(self):
            self.cells = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.cells.setdefault(name, FakeValueState())

    values = [3.5, -1.0, 7.25, 7.25, 0.0, 2.5]
    for split in (1, 2, 3, 6):
        proc = RunningMaxProcessor()
        proc.init(FakeHandle())
        out = None
        for i in range(0, len(values), split):
            chunk = pd.DataFrame({"value": values[i : i + split]})
            out = list(
                proc.handleInputRows((42,), iter([chunk]), None)
            )[-1]
        proc.close()
        assert int(out["n_events"].iloc[0]) == len(values)
        assert float(out["max_value"].iloc[0]) == max(values)
        assert int(out["user_id"].iloc[0]) == 42


def test_transform_with_state_final_matches_batch(spark, sf_dir):
    """End-to-end: the registered query (new API where the protocol
    exists, documented v1 fallback here) must land on the batch
    aggregate — same guarantee as stream_stateful."""
    rows = run("stream_transform_with_state", spark, sf_dir).collect()
    # the output must self-report which API executed, and it must
    # agree with the capability probe (grades stay attributable).
    from big_data_analysis_spark.streaming.stream_ops import (
        tws_protocol_available,
    )

    want_api = (
        "transformWithStateInPandas"
        if tws_protocol_available()
        else "applyInPandasWithState"
    )
    assert {r.api_used for r in rows} == {want_api}
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


def test_foreach_row_sink_matches_batch(spark, sf_dir):
    """The ForeachWriter-spooled per-type counts must equal the batch
    aggregate — every row processed exactly once across executors,
    partitions and epochs."""
    got = {
        r.event_type: r.n
        for r in run("stream_foreach_row_sink", spark, sf_dir).collect()
    }
    want = {
        r.event_type: r.n
        for r in _events_batch(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_join_stream_outer_matched_plus_watermark_gated_nulls(spark, sf_dir):
    """stream_join_stream_outer semantics, both halves pinned:
    (1) rows with a purchase equal the batch INNER interval join
    exactly; (2) the NULL-emitted set equals the batch anti-join
    minus the watermark tail — a click emits NULL only once the
    GLOBAL watermark (MIN of the two sides' max event time, each
    less the 1-hour delay — the multipleWatermarkPolicy=min default)
    passes click_ts + 30min; later unmatched clicks are withheld
    because a match could still arrive. This delayed emission is
    exactly what makes the op rows-only: a batch LEFT JOIN
    over-produces on the stream tail."""
    import datetime

    rows = run("stream_join_stream_outer", spark, sf_dir).collect()
    got_matched = {
        (r.user_id, r.click_id, r.purchase_id, r.lag_us)
        for r in rows
        if r.purchase_id is not None
    }
    got_nulls = {(r.user_id, r.click_id) for r in rows if r.purchase_id is None}

    ev = _events_batch(spark, sf_dir)
    c = ev.where("event_type='click'").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    p = ev.where("event_type='purchase'").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    j = c.join(
        p,
        (F.col("pu") == F.col("user_id"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
        "left",
    )
    want_matched = {
        (r.user_id, r.click_id, r.purchase_id,
         int((r.pts - r.cts) / datetime.timedelta(microseconds=1)))
        for r in j.where("purchase_id IS NOT NULL").collect()
    }
    assert got_matched == want_matched

    delay = datetime.timedelta(hours=1)
    side_max = ev.groupBy("event_type").agg(F.max("ts").alias("m")).collect()
    maxes = {r.event_type: r.m for r in side_max}
    global_wm = min(maxes["click"], maxes["purchase"]) - delay
    want_nulls = {
        (r.user_id, r.click_id)
        for r in j.where("purchase_id IS NULL").collect()
        if r.cts + datetime.timedelta(minutes=30) < global_wm
    }
    assert got_nulls == want_nulls
    # the withheld tail is real: some unmatched click must sit inside
    # the watermark horizon on this fixture (else the test is vacuous)
    assert j.where("purchase_id IS NULL").count() > len(want_nulls)


def test_checkpoint_recovery_exactly_once_phases(spark, sf_dir, tmp_path):
    """The file-sink recovery dance, phase by phase: run 1 commits
    exactly the first two parts, the restart commits exactly the
    delta, a third restart with no new input commits NOTHING (same
    committed-batch set), and the final sink content equals the
    batch answer row-for-row — no loss, no double-count."""
    import glob
    import shutil

    from big_data_analysis_spark.streaming.stream_ops import _recovery_cycle

    ev = _events_batch(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.col("value").cast("double")
    )
    feed, src = str(tmp_path / "feed"), str(tmp_path / "src")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    import os

    os.makedirs(src)
    for part in range(4):
        ev.where(F.pmod("event_id", F.lit(4)) == part).coalesce(1).write.parquet(
            f"{feed}/p{part}"
        )

    def drop(part):
        for i, f in enumerate(sorted(glob.glob(f"{feed}/p{part}/part-*.parquet"))):
            shutil.copy(f, f"{src}/in_p{part}_{i}.parquet")

    n_half = ev.where(F.pmod("event_id", F.lit(4)) < 2).count()
    n_all = ev.count()

    drop(0), drop(1)
    _recovery_cycle(spark, src, ckpt, out)
    assert spark.read.parquet(out).count() == n_half

    drop(2), drop(3)
    _recovery_cycle(spark, src, ckpt, out)
    assert spark.read.parquet(out).count() == n_all
    committed_after_2 = sorted(glob.glob(f"{out}/_spark_metadata/*"))

    _recovery_cycle(spark, src, ckpt, out)  # no new input -> no-op
    assert sorted(glob.glob(f"{out}/_spark_metadata/*")) == committed_after_2
    assert spark.read.parquet(out).count() == n_all

    # Row-for-row equality with the batch source (exactly-once).
    sink = spark.read.parquet(out).select(
        "event_id", "user_id", "event_type", "value"
    )
    assert sink.exceptAll(ev).count() == 0
    assert ev.exceptAll(sink).count() == 0


def test_checkpoint_recovery_query_matches_batch(spark, sf_dir):
    """The registered query's single summary row equals the batch
    aggregate over the full events table — decimal-exact sum."""
    row = run("stream_checkpoint_recovery", spark, sf_dir).collect()[0]
    b = (
        _events_batch(spark, sf_dir)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("event_id").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .collect()[0]
    )
    assert tuple(row) == tuple(b)


def test_sink_python_datasource_commit_protocol(spark, sf_dir, tmp_path):
    """The DataSourceWriter sink: committed totals equal the batch
    aggregate exactly-once (manifest-gated read), one committed
    spool per input partition, and abort() removes an attempt's
    spool so failed/speculative attempts stay invisible."""
    import os

    from big_data_analysis_spark.io import table
    from big_data_analysis_spark.sources.scans import _docspool_datasource

    out = run("sink_python_datasource", spark, sf_dir)
    got = {r.lang: (r.n_docs, r.sum_chars) for r in out.collect()}
    want = {
        r.lang: (r.n_docs, r.sum_chars)
        for r in table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .collect()
    }
    assert got == want

    # one committed file per input partition
    spark.dataSource.register(_docspool_datasource())
    spool = tmp_path / "spool"
    os.makedirs(spool)
    (
        table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .repartition(3, "doc_id")
        .write.format("docspool")
        .option("path", str(spool))
        .mode("append")
        .save()
    )
    manifest = (spool / "_MANIFEST").read_text().splitlines()
    assert len(manifest) == 3
    assert sum(int(line.split(",")[1]) for line in manifest) == sum(
        n for n, _ in want.values()
    )

    ds = _docspool_datasource()
    w = ds({"path": str(tmp_path)}).writer(None, False)
    # abort removes the attempt spool
    p = tmp_path / "task_9_deadbeef.csv"
    p.write_text("1,en,10\n")
    msg = type("M", (), {"path": str(p), "n": 1})()
    w.abort([msg, None])
    assert not p.exists()


def test_state_store_read_matches_batch(spark, sf_dir):
    """The checkpoint state read back as a table must hold exactly
    the batch per-type counts (the stream ran to completion), and
    the metadata row must identify the aggregation operator's store
    with full partition fan-out."""
    rows = run("stream_state_store_read", spark, sf_dir).collect()
    want = {
        r.event_type: r.n
        for r in _events_batch(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.event_type: r.n for r in rows} == want
    for r in rows:
        assert r.operatorName == "stateStoreSave"
        assert r.numPartitions == 32
        assert r.maxBatchId >= 0
