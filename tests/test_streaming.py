"""Structured Streaming tests: file source → memory sink, batch/stream
agreement, stateful sessionization, foreachBatch upsert sink."""

from __future__ import annotations

import pyspark.sql.functions as F

from lakehouse_architecture_transaction_spark.catalog import load_table
from lakehouse_architecture_transaction_spark.lakehouse.table import LakeTable
from lakehouse_architecture_transaction_spark.streaming.pipeline import (
    hourly_stream_agg,
    read_event_stream,
    run_stream_to_memory,
    sessionize_stateful,
    stream_upsert_into,
)


def _stage_events(spark, sf_dir, tmp_path, n_files=4):
    """Write the events fixture as micros-timestamp parquet files the
    file-source stream can tail."""
    src = str(tmp_path / "landing")
    load_table(spark, sf_dir, "events").repartition(n_files).write.parquet(src)
    return src


def test_stream_hourly_matches_batch(spark, sf_dir, tmp_path):
    src = _stage_events(spark, sf_dir, tmp_path)
    events = read_event_stream(spark, src)
    q = run_stream_to_memory(hourly_stream_agg(events), "hourly_out", output_mode="complete")
    try:
        got = {
            (r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in spark.sql("SELECT * FROM hourly_out").collect()
        }
        batch = (
            load_table(spark, sf_dir, "events")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.expr("CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))").alias("v"))
        )
        want = {(r["w"]["start"], r["event_type"]): (r["n"], r["v"]) for r in batch.collect()}
        assert got == want
    finally:
        q.stop()


def test_stateful_sessionization_closes_sessions(spark, sf_dir, tmp_path):
    src = _stage_events(spark, sf_dir, tmp_path)
    events = read_event_stream(spark, src)
    q = run_stream_to_memory(sessionize_stateful(events), "sessions_out")
    try:
        closed = spark.sql("SELECT * FROM sessions_out").collect()
        # Sessions close only when a later event exceeds the gap; the
        # fixture spans a month of events, so closures must occur.
        assert len(closed) > 0
        for r in closed:
            assert r["session_end"] >= r["session_start"]
            assert r["n_events"] >= 1
    finally:
        q.stop()


def test_stateful_sessionization_idle_timeout_flush(spark, tmp_path):
    # A lone event's session must close WITHOUT a successor event:
    # the idle-timeout variant arms a processing-time timer per key,
    # and the timed-out group flushes its open session.
    import time

    src = tmp_path / "lone_landing"
    src.mkdir()
    lone = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}")],
        "event_id bigint, ts string, user_id bigint, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    lone.coalesce(1).write.parquet(str(src / "b0"))

    from lakehouse_architecture_transaction_spark.streaming.pipeline import read_event_stream

    stream = read_event_stream(spark, str(src / "*"))
    q = (
        sessionize_stateful(stream, idle_timeout_ms=1000)
        .writeStream.format("memory")
        .queryName("idle_sessions_out")
        .outputMode("append")
        .start()
    )
    try:
        # processAllAvailable is unusable here: pending processing-time
        # timers keep scheduling batches, so it never drains (the
        # round-1 finding). That same property is what flushes idle
        # keys with NO successor event — so poll the sink instead.
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM idle_sessions_out WHERE user_id = 7").collect()
            if rows:
                break
            time.sleep(0.5)
        assert len(rows) == 1, "lone event's session never flushed by idle timeout"
        assert rows[0]["n_events"] == 1
        assert rows[0]["session_start"] == rows[0]["session_end"]
    finally:
        q.stop()


def test_stateful_sessionization_custom_gap_splits_on_data_path(spark, tmp_path):
    # ADVICE r9: event_time_gap_s must govern the DATA-PATH split too,
    # not just the timer. With gap=600 a 1320 s intra-user gap must
    # close the first session inline (pre-fix the split threshold was
    # hardwired to _GAP_SECONDS=1800, so a 600 s caller got mixed
    # semantics: 600 s timer flushes but only >1800 s splits — this
    # batch emitted NOTHING on the data path).
    src = tmp_path / "customgap_landing"
    src.mkdir()
    schema = "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
    b0 = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),
            (2, "2024-01-01 10:08:00", 7, "click", 1.0, "{}"),  # 480s <= 600: merge
            (3, "2024-01-01 10:30:00", 7, "click", 1.0, "{}"),  # 1320s > 600: split
        ],
        schema,
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    b0.coalesce(1).write.parquet(str(src / "b0"))

    from lakehouse_architecture_transaction_spark.streaming.pipeline import read_event_stream

    stream = read_event_stream(spark, str(src / "*"))
    q = (
        sessionize_stateful(stream, event_time_gap_s=600, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("customgap_sessions_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM customgap_sessions_out WHERE user_id = 7").collect()
        assert len(rows) == 1, "data path did not split at the caller's 600s gap"
        assert rows[0]["n_events"] == 2
    finally:
        q.stop()


def test_stateful_sessionization_event_time_flush(spark, tmp_path):
    # Watermark-driven closure: user 7's lone session must flush when
    # OTHER users' (much later) events advance the watermark past
    # session_end + gap — no wall clock, so processAllAvailable drains.
    src = tmp_path / "et_landing"
    src.mkdir()
    schema = "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
    b0 = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}")], schema
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    b0.coalesce(1).write.parquet(str(src / "b0"))

    from lakehouse_architecture_transaction_spark.streaming.pipeline import (
        read_event_stream,
        sessionize_stateful,
    )

    stream = read_event_stream(spark, str(src / "*"))
    q = (
        sessionize_stateful(stream, event_time_gap_s=600, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("et_sessions_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM et_sessions_out WHERE user_id = 7").count() == 0
        # user 8 events far in the future: watermark -> 11:50, well past
        # user 7's 10:00 end + 600s timer
        b1 = spark.createDataFrame(
            [(2, "2024-01-01 12:00:00", 8, "click", 1.0, "{}")], schema
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        b1.coalesce(1).write.parquet(str(src / "b1"))
        q.processAllAvailable()
        # one more batch so the new watermark is APPLIED to timers
        b2 = spark.createDataFrame(
            [(3, "2024-01-01 12:30:00", 8, "click", 1.0, "{}")], schema
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        b2.coalesce(1).write.parquet(str(src / "b2"))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM et_sessions_out WHERE user_id = 7").collect()
        assert len(rows) == 1
        assert rows[0]["n_events"] == 1
    finally:
        q.stop()


def test_stateful_sessionization_absorbs_cross_batch_disorder(spark, tmp_path):
    # A late-but-in-watermark event landing INSIDE the open session's
    # span must be absorbed (start=min, end=max), not regress the gap
    # anchor: before the min/max merge, user 7's late 10:10 arrival
    # pulled `end` back from 10:20, so the 10:45 event (gap 1500s from
    # the true end) split the session where batch semantics merge.
    src = tmp_path / "disorder_landing"
    src.mkdir()
    schema = "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"

    def _drop(name, rows):
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp_ntz")
        ).coalesce(1).write.parquet(str(src / name))

    from lakehouse_architecture_transaction_spark.streaming.pipeline import (
        read_event_stream,
        sessionize_stateful,
    )

    _drop("b0", [(1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}"),
                 (2, "2024-01-01 10:20:00", 7, "click", 1.0, "{}"),
                 (3, "2024-01-01 11:00:00", 9, "click", 1.0, "{}")])
    stream = read_event_stream(spark, str(src / "*"))
    q = (
        sessionize_stateful(stream, event_time_gap_s=1800, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("disorder_sessions_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 1: in-span late event for 7 (10:10), span-extending
        # follow-up (10:45), and an EARLIER-than-start late event for 9
        _drop("b1", [(4, "2024-01-01 10:10:00", 7, "click", 1.0, "{}"),
                     (5, "2024-01-01 10:45:00", 7, "click", 1.0, "{}"),
                     (6, "2024-01-01 10:50:00", 9, "click", 1.0, "{}")])
        q.processAllAvailable()
        # batch 2: far-future events close both sessions on the data path
        _drop("b2", [(7, "2024-01-01 14:00:00", 7, "click", 1.0, "{}"),
                     (8, "2024-01-01 14:00:00", 9, "click", 1.0, "{}")])
        q.processAllAvailable()
        out = {r["user_id"]: r for r in spark.sql(
            "SELECT * FROM disorder_sessions_out"
        ).collect()}
        assert out[7]["n_events"] == 4, "disorder split the open session"
        assert str(out[7]["session_start"]).startswith("2024-01-01 10:00")
        assert str(out[7]["session_end"]).startswith("2024-01-01 10:45")
        assert out[9]["n_events"] == 2
        assert str(out[9]["session_start"]).startswith("2024-01-01 10:50")
        assert str(out[9]["session_end"]).startswith("2024-01-01 11:00")
    finally:
        q.stop()
        spark.catalog.dropTempView("disorder_sessions_out")


def test_native_session_window_stream_matches_batch(spark, sf_dir, tmp_path):
    # Native session_window streaming sessionization: closed sessions
    # (watermark-passed) must agree with the batch session_window
    # aggregation on the same data.
    from lakehouse_architecture_transaction_spark.streaming.pipeline import sessionize_native

    src = _stage_events(spark, sf_dir, tmp_path)
    events = read_event_stream(spark, src)
    q = run_stream_to_memory(sessionize_native(events), "native_sessions_out")
    try:
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql("SELECT * FROM native_sessions_out").collect()
        }
        batch = (
            load_table(spark, sf_dir, "events")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy("user_id", F.session_window(F.col("ts"), "30 minutes").alias("w"))
            .agg(F.min("ts").alias("s"), F.max("ts").alias("e"), F.count("*").alias("n"))
        )
        want = {(r["user_id"], r["s"], r["e"], r["n"]) for r in batch.collect()}
        # append mode emits only watermark-closed sessions: a subset,
        # and every emitted session must match a batch session exactly
        assert got, "no sessions closed"
        assert got <= want
        # the overwhelming majority of a month of sessions close
        assert len(got) >= len(want) * 0.9
    finally:
        q.stop()


def test_stream_upsert_into_laketable(spark, sf_dir, tmp_path):
    src = _stage_events(spark, sf_dir, tmp_path)
    table = LakeTable(spark, str(tmp_path / "events_table"), keys=["event_id"])
    stream = read_event_stream(spark, src)
    q = stream_upsert_into(stream, table, checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch_count = load_table(spark, sf_dir, "events").count()
    assert table.read().count() == batch_count
    # key-based merge is idempotent: same event_ids -> same count
    assert table.read().select("event_id").distinct().count() == batch_count


def _stage_time_ordered_slices(spark, ev, tmp_path, k=6, dup_rows=0):
    """Stage the events frame as ``k`` event-time slices, one file per
    slice, file names AND mtimes ascending with the slices — so a
    maxFilesPerTrigger=1 file stream replays them in event-time order
    and the watermark genuinely advances between micro-batches. With
    ``dup_rows`` > 0, that many in-slice re-deliveries are appended to
    each slice (for dedup-state tests)."""
    import glob as globmod
    import os
    import shutil

    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / k
    src = str(tmp_path / "landing")
    os.makedirs(src)
    stage = str(tmp_path / "stage")
    for i in range(k):
        s, e = lo + i * span, lo + (i + 1) * span
        cond = (F.col("ts") >= F.lit(s)) & (
            (F.col("ts") <= F.lit(hi)) if i == k - 1 else (F.col("ts") < F.lit(e))
        )
        sl = ev.filter(cond)
        if dup_rows:
            sl = sl.unionByName(sl.limit(dup_rows))
        sl.coalesce(1).write.mode("overwrite").parquet(stage)
        dst = f"{src}/slice_{i:02d}.parquet"
        shutil.copyfile(globmod.glob(stage + "/part-*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    return src


def _one_file_per_batch_stream(spark, src):
    from lakehouse_architecture_transaction_spark.streaming.pipeline import EVENT_SCHEMA

    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def _state_rows_per_batch(q) -> list:
    return [
        op["numRowsTotal"] for p in q.recentProgress for op in (p["stateOperators"] or [])
    ]


def test_stream_dedup_state_bounded_by_watermark(spark, sf_dir, tmp_path):
    """The production-mode claim the scale notes lean on, MEASURED
    from the engine's own progress metrics rather than asserted: a
    short dedup horizon keeps the state store far below corpus size
    (watermark eviction works batch-over-batch), while a horizon
    longer than the data's span retains exactly one state row per
    distinct key. Stages the events fixture as six time-ordered
    slices (one file per micro-batch via maxFilesPerTrigger=1, file
    mtimes ascending so the source replays them in event-time order
    and the watermark advances between batches), with 50 in-slice
    re-deliveries per slice so the dedup does real work throughout."""
    from lakehouse_architecture_transaction_spark.streaming.pipeline import dedup_stream

    ev = load_table(spark, sf_dir, "events")
    n_total = ev.count()
    src = _stage_time_ordered_slices(spark, ev, tmp_path, k=6, dup_rows=50)

    def run(within: str, name: str) -> tuple[int, int, int]:
        raw = _one_file_per_batch_stream(spark, src)
        q = (
            dedup_stream(raw, keys=["event_id"], within=within)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state_rows = _state_rows_per_batch(q)
        out = spark.sql(
            f"SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM {name}"
        ).collect()[0]
        spark.catalog.dropTempView(name)
        return max(state_rows), out["n"], out["d"]

    # Short horizon: the fixture spans ~a month, so a 2-hour horizon
    # must evict each slice's keys as soon as the next slice advances
    # the watermark — peak state is ~one slice (1/6 of the corpus, plus
    # one batch of eviction lag), never the whole key set. The output
    # is still complete and exactly deduped: slices arrive in event-
    # time order, so nothing is late, and every re-delivery lands in
    # the same batch as its original (key still in state).
    peak_short, n_short, d_short = run("2 hours", "dedup_state_short")
    assert n_short == d_short == n_total
    assert peak_short < 0.5 * n_total, (
        f"short-horizon dedup state peaked at {peak_short} rows of "
        f"{n_total} total — watermark eviction is not bounding state"
    )

    # Long horizon (the bounded-run harness mode): nothing evicts, so
    # the final state holds exactly one row per distinct key — the
    # worst case the SCALE.md streaming caveat describes.
    peak_long, n_long, d_long = run("3650 days", "dedup_state_long")
    assert n_long == d_long == n_total
    assert peak_long == n_total
    assert peak_short < peak_long


def test_session_window_state_bounded_and_emissions_account_exactly(spark, sf_dir, tmp_path):
    """S8 production mode (append + short watermark) with the state
    store MEASURED: replaying the month-long fixture as six
    time-ordered slices under a 2-hour horizon, (1) every emitted
    session matches the batch gaps-and-islands twin field-for-field,
    (2) emitted + still-in-state sessions account for EXACTLY the
    batch session count — nothing lost, nothing duplicated, the
    unemitted tail is precisely the sessions the final watermark
    hasn't passed — and (3) peak state rows stay far below the total
    session count (measured ~19%: eviction tracks the frontier).
    This is the append-mode half of the complete-mode bounded runs
    the registered events_stream_sessions query checks."""
    from pyspark.sql import Window

    from lakehouse_architecture_transaction_spark.streaming.pipeline import sessionize_native

    ev = load_table(spark, sf_dir, "events")
    src = _stage_time_ordered_slices(spark, ev, tmp_path, k=6)
    q = (
        sessionize_native(_one_file_per_batch_stream(spark, src))
        .writeStream.format("memory")
        .queryName("sess_state_acct")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = _state_rows_per_batch(q)
    emitted = spark.table("sess_state_acct").collect()
    spark.catalog.dropTempView("sess_state_acct")

    # batch twin: 30-minute-gap gaps-and-islands, same ts cast as the
    # stream so reprs compare exactly
    ev2 = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # equivalence precondition (r8 advice): session_window is
    # half-open — a gap of EXACTLY 30 minutes starts a new session,
    # while this twin's strict `>` keeps it open. The two agree only
    # because the fixture has no exact-1800s inter-event gap; pin
    # that, so a regenerated fixture fails HERE with the reason, not
    # in the set comparison below.
    exact_boundary_gaps = (
        ev2.withColumn("prev", F.lag("ts").over(w))
        .filter(F.col("ts") - F.col("prev") == F.expr("INTERVAL 30 MINUTES"))
        .count()
    )
    assert exact_boundary_gaps == 0, (
        f"{exact_boundary_gaps} exact-1800s gap(s) in the fixture: session_window "
        "(half-open) and the strict-> batch twin disagree at this boundary"
    )
    batch = (
        ev2.withColumn(
            "new_s",
            F.coalesce(
                (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")).cast("int"),
                F.lit(0),
            ),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    key = lambda r: (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])  # noqa: E731
    batch_set = {key(r) for r in batch}
    emitted_set = {key(r) for r in emitted}
    assert len(batch_set) == len(batch)
    assert len(emitted_set) == len(emitted)  # no duplicate emissions
    assert emitted_set <= batch_set  # every emission is a true session
    # exact accounting: emitted + still-open == all sessions
    assert len(emitted_set) + state_rows[-1] == len(batch_set)
    # Threshold provenance (r8 advice): the 0.8 emitted and 0.5
    # peak-state fractions are properties of the REPLAY GEOMETRY, not
    # magic — sessions close throughout a replay whose span dwarfs the
    # 2-h lateness horizon (only the final slice's tail can still be
    # open, and state tracks the frontier). Pin the precondition so a
    # rescaled fixture fails on the geometry, not the derived numbers.
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span_s = (hi - lo).total_seconds()
    assert span_s >= 24 * 7200, (
        f"fixture span {span_s:.0f}s is no longer >> the 2-h horizon — "
        "re-derive the emitted/peak-state fractions below"
    )
    # a month-long replay under a 2-hour horizon closes nearly all
    assert len(emitted_set) >= 0.8 * len(batch_set)
    assert max(state_rows) < 0.5 * len(batch_set), (
        f"session state peaked at {max(state_rows)} of {len(batch_set)} "
        "sessions — watermark eviction is not tracking the frontier"
    )


def test_stateful_sessionizer_state_is_live_keys_and_accounts_exactly(spark, sf_dir, tmp_path):
    """The HOUSE state function (applyInPandasWithState sessionizer
    with event-time timers) measured the same way as the native
    operators — this pins OUR state.remove()/setTimeoutTimestamp
    logic, not engine behavior: per-batch state rows never exceed the
    distinct-user count (one state row per user with an OPEN session,
    never per session — 946 sessions ride 15 state rows), every
    emitted session matches the batch gaps-and-islands twin
    field-for-field, and emitted + still-open state rows equal the
    batch session count exactly. A leaked state.remove() would
    surface as final-state > open sessions; a mis-armed timer as a
    coverage gap."""
    from pyspark.sql import Window

    from lakehouse_architecture_transaction_spark.streaming.pipeline import sessionize_stateful

    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    src = _stage_time_ordered_slices(spark, ev, tmp_path, k=6)
    q = (
        sessionize_stateful(
            _one_file_per_batch_stream(spark, src), event_time_gap_s=1800, watermark="2 hours"
        )
        .writeStream.format("memory")
        .queryName("sessfn_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = _state_rows_per_batch(q)
    emitted = spark.table("sessfn_state").collect()
    spark.catalog.dropTempView("sessfn_state")

    ev2 = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    batch = (
        ev2.withColumn(
            "new_s",
            F.coalesce(
                (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES")).cast("int"),
                F.lit(0),
            ),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    key = lambda r: (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])  # noqa: E731
    batch_set = {key(r) for r in batch}
    emitted_set = {key(r) for r in emitted}
    assert len(emitted_set) == len(emitted)
    assert emitted_set <= batch_set
    assert len(emitted_set) + state_rows[-1] == len(batch_set)
    # Threshold provenance (r8 advice): 0.8 and the final-flush drop
    # below depend on the replay span dwarfing the 2-h horizon (most
    # sessions' timers fire mid-replay; only the last slice's open
    # tail survives to the end). Pin the geometry precondition so a
    # rescaled fixture fails with the reason.
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert (hi - lo).total_seconds() >= 24 * 7200, (
        "fixture span is no longer >> the 2-h horizon — re-derive the "
        "emitted fraction / final-state assertions below"
    )
    assert len(emitted_set) >= 0.8 * len(batch_set)
    # one state row per user with an open session — never per session
    assert max(state_rows) <= n_users
    # the final flush leaves only still-open users, not every user
    assert state_rows[-1] < max(state_rows)


def test_stream_stream_join_state_bounded_by_watermark(spark, sf_dir, tmp_path):
    """The third stateful family (stream-stream interval join) with
    its state store measured in PRODUCTION mode — the 2-hour default
    lateness horizon, not the bounded-run no-eviction horizon:
    replaying six time-ordered slices, every batch click→purchase
    pair is emitted exactly once (the time-ordered replay means
    nothing arrives late), while peak join state stays a small
    fraction of the click+purchase row count — the engine holds only
    rows a future match could still reach, evicting as the watermark
    passes the interval bound."""
    from lakehouse_architecture_transaction_spark.streaming.pipeline import click_purchase_join

    ev = load_table(spark, sf_dir, "events")
    src = _stage_time_ordered_slices(spark, ev, tmp_path, k=6)
    q = (
        click_purchase_join(_one_file_per_batch_stream(spark, src))
        .writeStream.format("memory")
        .queryName("cpj_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = _state_rows_per_batch(q)
    emitted = spark.table("cpj_state").collect()
    spark.catalog.dropTempView("cpj_state")

    ev2 = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = ev2.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    purchases = ev2.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    batch_pairs = {
        (r["cid"], r["pid"])
        for r in clicks.join(
            purchases,
            (F.col("u") == F.col("pu"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 3600 SECONDS")),
        ).collect()
    }
    emitted_pairs = {(r["click_id"], r["purchase_id"]) for r in emitted}
    n_sides = ev2.filter(F.col("event_type").isin("click", "purchase")).count()
    assert len(emitted_pairs) == len(emitted)  # no duplicate emissions
    assert emitted_pairs <= batch_pairs  # every emission is a true pair
    # time-ordered replay: only pairs inside the final 2h horizon may
    # be held back, and the month-long fixture leaves ~none there
    assert len(emitted_pairs) >= 0.8 * len(batch_pairs)
    assert max(state_rows) < 0.5 * n_sides, (
        f"join state peaked at {max(state_rows)} of {n_sides} "
        "click/purchase rows — interval eviction is not bounding state"
    )


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    from lakehouse_architecture_transaction_spark.streaming.pipeline import dedup_stream

    # Stage each file TWICE: every event is re-delivered once.
    src = str(tmp_path / "landing")
    ev = load_table(spark, sf_dir, "events")
    ev.unionByName(ev).repartition(4).write.parquet(src)
    stream = read_event_stream(spark, src)
    q = run_stream_to_memory(dedup_stream(stream), "dedup_out")
    try:
        got = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM dedup_out").collect()[0]
        # no event_id may appear twice, and (since re-deliveries land
        # inside the watermark horizon) every event survives exactly once
        assert got["n"] == got["d"] == ev.count()
    finally:
        q.stop()


def test_stream_stream_click_purchase_join(spark, sf_dir, tmp_path):
    from lakehouse_architecture_transaction_spark.streaming.pipeline import click_purchase_join

    src = _stage_events(spark, sf_dir, tmp_path)
    stream = read_event_stream(spark, src)
    q = run_stream_to_memory(click_purchase_join(stream), "cpj_out")
    try:
        rows = spark.sql("SELECT * FROM cpj_out").collect()
        # batch twin computed directly
        ev = load_table(spark, sf_dir, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("u"), F.col("ts").alias("cts"), F.col("event_id").alias("cid")
        )
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("pu"), F.col("ts").alias("pts"), F.col("event_id").alias("pid")
        )
        batch = clicks.join(
            purchases,
            (F.col("u") == F.col("pu"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 3600 SECONDS")),
        ).count()
        # the stream may hold back pairs whose watermark hasn't passed,
        # but everything it emits must be a true pair, and with a
        # month-long fixture nearly all windows close.
        assert 0 < len(rows) <= batch
        emitted = {(r["click_id"], r["purchase_id"]) for r in rows}
        assert len(emitted) == len(rows)  # no duplicate emissions
    finally:
        q.stop()


def test_stream_upsert_versioned_cdc(spark, sf_dir, tmp_path):
    # Streaming upserts into a VERSIONED LakeTable: each micro-batch is
    # a commit, and diff() reads the change feed between versions —
    # streaming ingestion + lakehouse CDC working together.
    import shutil
    import glob as globmod

    def _drop(df, stage_dir, dest, tag):
        # file-source streams list only the root: flatten part files in
        df.coalesce(1).write.mode("overwrite").parquet(stage_dir)
        part = globmod.glob(stage_dir + "/part-*.parquet")[0]
        shutil.copy(part, f"{dest}/{tag}.parquet")

    src = tmp_path / "cdc_src"
    src.mkdir()
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    _drop(events.filter(F.col("event_id") % 2 == 0).limit(50), str(tmp_path / "st0"), str(src), "b0")
    table = LakeTable(spark, str(tmp_path / "cdc_events"), keys=["event_id"], versioned=True)
    stream = (
        spark.readStream.schema("event_id long, user_id long, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = stream_upsert_into(stream, table, checkpoint_dir=str(tmp_path / "cdc_ckpt"))
    try:
        q.processAllAvailable()
        v_mid = table.latest_version()
        _drop(events.filter(F.col("event_id") % 2 == 1).limit(30), str(tmp_path / "st1"), str(src), "b1")
        q.processAllAvailable()
    finally:
        q.stop()
    assert table.latest_version() > v_mid
    feed = table.diff(v_mid)
    types = {r["_change_type"] for r in feed.collect()}
    assert types == {"insert"}  # disjoint ids: second batch is pure inserts
    assert feed.count() == 30


def test_stream_trending_topk_matches_batch(spark, sf_dir, tmp_path):
    # Sliding-window streaming counts, drained and ranked, must equal
    # the same computation done in one batch pass.
    from lakehouse_architecture_transaction_spark.streaming.pipeline import (
        sliding_stream_counts,
        top_k_per_window,
    )

    src = _stage_events(spark, sf_dir, tmp_path)
    stream = read_event_stream(spark, src)
    q = run_stream_to_memory(
        sliding_stream_counts(stream), "trending_counts", output_mode="complete"
    )
    try:
        got = top_k_per_window(spark.table("trending_counts"), k=3).collect()
    finally:
        q.stop()
    batch = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    want = top_k_per_window(batch, k=3).collect()
    key = lambda r: (r["window_start"], r["rank"])
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(got) > 0


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    from lakehouse_architecture_transaction_spark.streaming.pipeline import enrich_stream_static

    src = _stage_events(spark, sf_dir, tmp_path)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue"),
         ("signup", "growth"), ("error", "ops")],
        "event_type string, category string",
    )
    stream = read_event_stream(spark, src)
    enriched = enrich_stream_static(stream, dim, on="event_type")
    q = run_stream_to_memory(
        enriched.groupBy("category").agg(F.count("*").alias("n")),
        "enriched_counts",
        output_mode="complete",
    )
    try:
        got = {r["category"]: r["n"] for r in spark.table("enriched_counts").collect()}
    finally:
        q.stop()
    batch = {
        r["category"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .join(dim, on="event_type", how="left")
        .groupBy("category")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == batch and len(got) >= 4


def test_sessionization_on_rocksdb_state_store(spark, sf_dir, tmp_path):
    # The state store a large deployment runs on: RocksDB provider
    # (state spills to local disk instead of growing the JVM heap).
    # Same drained session set as the default HDFS-backed provider.
    key = "spark.sql.streaming.stateStore.providerClass"
    prior = spark.conf.get(key, None)
    spark.conf.set(
        key, "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try:
        src = _stage_events(spark, sf_dir, tmp_path)
        events = read_event_stream(spark, src)
        q = run_stream_to_memory(sessionize_stateful(events), "rocks_sessions_out")
        try:
            got = {
                tuple(r) for r in spark.sql("SELECT * FROM rocks_sessions_out").collect()
            }
            assert len(got) > 0
        finally:
            q.stop()
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
    # parity with the default provider on the same input
    q2 = run_stream_to_memory(sessionize_stateful(read_event_stream(spark, src)), "hdfs_sessions_out")
    try:
        want = {tuple(r) for r in spark.sql("SELECT * FROM hdfs_sessions_out").collect()}
    finally:
        q2.stop()
    assert got == want

def test_native_session_window_watermark_lateness(spark, tmp_path):
    # S8 late-data contract, pinned on BOTH state-store providers: an
    # event later than the watermark must be dropped (never resurrect
    # or duplicate an already-closed session), while an out-of-order
    # event still above the watermark must land normally. Merge-on-
    # overlap state eviction is exercised by closing sessions across
    # four watermark advances.
    import datetime as dt

    from lakehouse_architecture_transaction_spark.streaming.pipeline import (
        read_event_stream,
        sessionize_native,
    )

    schema = "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    results = {}
    for provider in ("default", "rocksdb"):
        prior = spark.conf.get(key, None)
        if provider == "rocksdb":
            spark.conf.set(key, rocks)
        try:
            src = tmp_path / f"late_{provider}"
            src.mkdir()

            def put(name, rows, _src=src):
                spark.createDataFrame(rows, schema).withColumn(
                    "ts", F.col("ts").cast("timestamp_ntz")
                ).coalesce(1).write.parquet(str(_src / name))

            put("b0", [(1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}")])
            stream = read_event_stream(spark, str(src / "*"))
            q = (
                sessionize_native(stream, gap="30 minutes", watermark="1 hour")
                .writeStream.format("memory")
                .queryName(f"late_sessions_{provider}")
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
                # watermark -> 12:00; user 1's 10:00 session is closeable
                put("b1", [(2, "2024-01-01 13:00:00", 2, "click", 1.0, "{}")])
                q.processAllAvailable()
                # same batch: 12:30 is ABOVE the 12:00 watermark (accepted),
                # 11:00 is BELOW it (late -> dropped, must not re-open user 1)
                put(
                    "b2",
                    [
                        (3, "2024-01-01 12:30:00", 3, "click", 1.0, "{}"),
                        (4, "2024-01-01 11:00:00", 1, "click", 1.0, "{}"),
                    ],
                )
                q.processAllAvailable()
                put("b3", [(5, "2024-01-01 20:00:00", 2, "click", 1.0, "{}")])
                q.processAllAvailable()
                put("b4", [(6, "2024-01-02 09:00:00", 9, "click", 1.0, "{}")])
                q.processAllAvailable()
                results[provider] = {
                    (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
                    for r in spark.sql(f"SELECT * FROM late_sessions_{provider}").collect()
                }
            finally:
                q.stop()
        finally:
            if prior is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prior)

    t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    want = {
        (1, t("2024-01-01 10:00:00"), t("2024-01-01 10:00:00"), 1),
        (2, t("2024-01-01 13:00:00"), t("2024-01-01 13:00:00"), 1),
        (2, t("2024-01-01 20:00:00"), t("2024-01-01 20:00:00"), 1),
        (3, t("2024-01-01 12:30:00"), t("2024-01-01 12:30:00"), 1),
    }
    assert results["default"] == want, results["default"]
    assert results["rocksdb"] == want, results["rocksdb"]


def test_stateful_sessionization_survives_straggler_beyond_watermark(spark, tmp_path):
    # Availability pin for the watermark clamp (ADVICE r4): an event
    # arriving AFTER the watermark has advanced past its session's
    # (end + gap) must not kill the query — pre-clamp, a timeout
    # timestamp <= watermark raised inside applyInPandasWithState and
    # failed the whole stream. The straggler either gets dropped as
    # late data or its session flushes on the next watermark advance;
    # both are acceptable — query death is not.
    src = tmp_path / "straggler_landing"
    src.mkdir()
    schema = "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"

    def drop(batch_id, rows):
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp_ntz")
        )
        df.coalesce(1).write.parquet(str(src / f"b{batch_id}"))

    drop(0, [(1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}")])
    stream = read_event_stream(spark, str(src / "*"))
    q = (
        sessionize_stateful(stream, event_time_gap_s=600, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("straggler_sessions_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark far past 10:00 + gap
        drop(1, [(2, "2024-01-01 12:00:00", 8, "click", 1.0, "{}")])
        q.processAllAvailable()
        # straggler at 10:05 — hours behind the 11:50 watermark; its
        # session end + gap is far below the watermark, the clamp case
        drop(2, [(3, "2024-01-01 10:05:00", 9, "click", 1.0, "{}")])
        q.processAllAvailable()
        # keep advancing so any clamped timer actually fires
        drop(3, [(4, "2024-01-01 13:00:00", 8, "click", 1.0, "{}")])
        q.processAllAvailable()
        assert q.exception() is None, f"stream died on straggler: {q.exception()}"
        # the on-time user's session must have flushed regardless
        assert (
            spark.sql("SELECT * FROM straggler_sessions_out WHERE user_id = 7").count() == 1
        )
    finally:
        q.stop()


def test_streams_survive_zero_file_source(spark, tmp_path):
    # A glob matching no files yet (fresh landing zone) must start,
    # drain, and emit nothing — not throw. Both the stateless window
    # agg and the stateful sessionizer.
    from lakehouse_architecture_transaction_spark.streaming.pipeline import hourly_stream_agg

    src = tmp_path / "empty_landing"
    src.mkdir()
    stream = read_event_stream(spark, str(src / "*"))
    q = (
        hourly_stream_agg(stream)
        .writeStream.format("memory")
        .queryName("zero_file_agg")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        assert q.exception() is None
        assert spark.sql("SELECT * FROM zero_file_agg").count() == 0
    finally:
        q.stop()

    stream2 = read_event_stream(spark, str(src / "*"))
    q2 = (
        sessionize_stateful(stream2, idle_timeout_ms=1000)
        .writeStream.format("memory")
        .queryName("zero_file_sessions")
        .outputMode("append")
        .start()
    )
    try:
        q2.processAllAvailable()
        assert q2.exception() is None
        assert spark.sql("SELECT * FROM zero_file_sessions").count() == 0
    finally:
        q2.stop()


def test_stream_upsert_epoch_replay_is_idempotent(spark, sf_dir, tmp_path):
    # The foreachBatch sink's exactly-once-EFFECTIVE claim: Spark can
    # re-run a micro-batch epoch after a failure, so applying the SAME
    # batch twice must leave the table exactly as one application —
    # and on a versioned table the replay commit's diff must be empty.
    from lakehouse_architecture_transaction_spark.catalog import load_table
    from lakehouse_architecture_transaction_spark.lakehouse.table import LakeTable

    batch = load_table(spark, sf_dir, "orders").limit(200)
    t = LakeTable(spark, str(tmp_path / "replay"), keys=["o_orderkey"], versioned=True)
    t.upsert(batch)
    v_first = t.latest_version()
    once = sorted(tuple(r) for r in t.read().collect())
    t.upsert(batch)  # epoch replay
    assert sorted(tuple(r) for r in t.read().collect()) == once
    assert t.diff(v_first, t.latest_version()).count() == 0


def test_stateful_sessionization_event_time_non_utc_session(spark, tmp_path):
    """r8 advice: the event-time timer math must hold on a NON-UTC
    driver. Arrow hands the state function session-tz-rendered naive
    timestamps; the engine therefore computes a true-epoch ts_us
    column (unix_micros) and the state function keys ALL gap and
    timer arithmetic on it — the timer timestamp is end_us//1000 +
    gap, no timezone re-anchoring at all (the r9 rework; the earlier
    tz_localize re-anchor this replaced is gone). Under
    America/New_York (UTC-5) the original naive-.timestamp()-as-UTC
    read shifted every timer 5 h EARLY, so a watermark nudge between
    two in-gap events of the same user flushed the open session
    prematurely (two rows where one session exists); an over-shift
    the other way would leave the session unflushed at the end.
    Exactly one merged session discriminates all three."""
    prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        src = tmp_path / "et_tz_landing"
        src.mkdir()
        schema = (
            "event_id bigint, ts string, user_id bigint, event_type string, "
            "value double, props string"
        )

        def _drop(name: str, rows):
            df = spark.createDataFrame(rows, schema).withColumn(
                "ts", F.col("ts").cast("timestamp_ntz")
            )
            df.coalesce(1).write.parquet(str(src / name))

        from lakehouse_architecture_transaction_spark.streaming.pipeline import (
            read_event_stream,
            sessionize_stateful,
        )

        _drop("b0", [(1, "2024-01-01 10:00:00", 7, "click", 1.0, "{}")])
        stream = read_event_stream(spark, str(src / "*"))
        q = (
            sessionize_stateful(stream, event_time_gap_s=600, watermark="10 minutes")
            .writeStream.format("memory")
            .queryName("et_tz_sessions")
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
            # wm -> 09:57; a 5h-early timer (10:10 UTC-read epoch) is
            # already due, the correct one (10:10 session-tz epoch) is not
            _drop("b1", [(2, "2024-01-01 10:07:00", 8, "click", 1.0, "{}")])
            q.processAllAvailable()
            # u8-only batch: a due timer would fire HERE and split u7's
            # session before its 10:05 event arrives
            _drop("b2", [(3, "2024-01-01 10:09:00", 8, "click", 1.0, "{}")])
            q.processAllAvailable()
            _drop("b3", [(4, "2024-01-01 10:05:00", 7, "click", 1.0, "{}")])
            q.processAllAvailable()
            # advance wm far past end + gap, then one more batch so the
            # new watermark is APPLIED to timers
            _drop("b4", [(5, "2024-01-01 13:00:00", 8, "click", 1.0, "{}")])
            q.processAllAvailable()
            _drop("b5", [(6, "2024-01-01 13:30:00", 8, "click", 1.0, "{}")])
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT * FROM et_tz_sessions WHERE user_id = 7"
            ).collect()
            assert len(rows) == 1, (
                f"expected ONE merged session for user 7, got {len(rows)} — "
                "early rows mean timers fired shifted-early; zero means the "
                "timer never became due (shifted-late)"
            )
            assert rows[0]["n_events"] == 2
            # boundary check in EPOCH space (collect() renders in the
            # OS tz, which differs from the session tz here by design):
            # 2024-01-01 10:00/10:05 America/New_York == epoch
            # 1704121200/1704121500
            epochs = spark.sql(
                "SELECT unix_seconds(session_start) s, unix_seconds(session_end) e "
                "FROM et_tz_sessions WHERE user_id = 7"
            ).collect()[0]
            assert (epochs["s"], epochs["e"]) == (1704121200, 1704121500)
        finally:
            q.stop()
            spark.catalog.dropTempView("et_tz_sessions")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_gate_state_partitions_restores_width_on_success_and_error(spark):
    # The bounded-replay width pin mutates SESSION conf around
    # start(); a leaked width would silently narrow every subsequent
    # batch shuffle in the same session (r11). Must restore on both
    # the clean path and an exception inside the context.
    import pytest as _pytest

    from lakehouse_architecture_transaction_spark.streaming.pipeline import (
        GATE_STATE_PARTITIONS,
        gate_state_partitions,
    )

    fixture_width = spark.conf.get("spark.sql.shuffle.partitions")
    # pin a session width that provably differs from the gate width
    # (the test session itself may run at 8)
    sentinel = str(GATE_STATE_PARTITIONS + 5)
    spark.conf.set("spark.sql.shuffle.partitions", sentinel)
    try:
        with gate_state_partitions(spark):
            assert (
                spark.conf.get("spark.sql.shuffle.partitions")
                == str(GATE_STATE_PARTITIONS)
            )
        assert spark.conf.get("spark.sql.shuffle.partitions") == sentinel
        with _pytest.raises(RuntimeError):
            with gate_state_partitions(spark):
                raise RuntimeError("replay blew up")
        assert spark.conf.get("spark.sql.shuffle.partitions") == sentinel
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", fixture_width)


def test_click_purchase_join_refuses_nonpositive_window(spark, sf_dir):
    # within_seconds=0 would make bucket_us=0: under non-ANSI Spark the
    # division yields NULL buckets and the bucket-equality condition
    # silently emits zero rows where exact-timestamp matches were
    # intended — the guard must refuse loudly instead (ADVICE r11).
    import pytest

    from lakehouse_architecture_transaction_spark.streaming.pipeline import click_purchase_join

    ev = load_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="within_seconds"):
        click_purchase_join(ev, within_seconds=0)
    with pytest.raises(ValueError, match="within_seconds"):
        click_purchase_join(ev, within_seconds=-5)
