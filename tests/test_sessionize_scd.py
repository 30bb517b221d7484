"""Stateful streaming sessionization + incremental SCD2 apply."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from glamira_batch_processing_spark.operators.windows import (
    scd2_apply,
    scd2_from_history,
)
from glamira_batch_processing_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stateful,
)


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """Run the applyInPandasWithState sessionizer as a real stream over
    two files and compare final session aggregates with the batch
    window formulation."""
    src = str(tmp_path / "sess_src")
    schema = "user_id long, event_id long, ts_us long"
    GAP = 30 * 60 * 1_000_000
    base = 1_700_000_000_000_000
    batch = [
        (1, 1, base),
        (1, 2, base + 10_000_000),          # same session
        (1, 3, base + GAP + 20_000_000),    # new session
        (2, 4, base),
    ]
    spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    sessions = sessionize_stateful(stream.groupBy("user_id"))
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.start_us, r.last_us)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got[(1, 1)] == (2, base, base + 10_000_000)
    assert got[(1, 2)] == (1, base + GAP + 20_000_000, base + GAP + 20_000_000)
    assert got[(2, 1)] == (1, base, base)

    # batch twin agrees on session structure
    bdf = spark.createDataFrame(batch, schema).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )
    b = sessionize_batch(bdf)
    bs = {
        (r.user_id, r.session_seq): r.n
        for r in b.groupBy("user_id", "session_seq").agg(F.count("*").alias("n")).collect()
    }
    assert bs == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_scd2_apply_equals_full_rebuild(spark):
    hist_events = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 10, "x"), (3, 10, "q")],
        "k long, ts long, v string",
    )
    history = scd2_from_history(hist_events, "k", F.col("ts"), F.col("v"))
    new_batch = spark.createDataFrame(
        [(1, 30, "c"), (4, 5, "new")], "k long, ts long, v string"
    )
    applied = scd2_apply(history, new_batch, "k", F.col("ts"), F.col("v"))
    full = scd2_from_history(
        hist_events.unionByName(new_batch), "k", F.col("ts"), F.col("v")
    )
    norm = lambda df: sorted(map(tuple, df.select("k", "ts", "v", "valid_from", "valid_to", "is_current").collect()))  # noqa: E731
    assert norm(applied) == norm(full)
    # untouched keys (2, 3) were not recomputed but are present & current
    cur = {r.k for r in applied.filter("is_current").collect()}
    assert cur == {1, 2, 3, 4}


def test_stateful_funnel_matches_batch(spark, tmp_path):
    """Run the applyInPandasWithState funnel as a real stream over two
    micro-batch files (state persists between them) and compare each
    user's stage_reached with the batch running-max formulation on the
    union. stage_reached == sum of the batch stage flags because the
    flags are a monotone prefix."""
    from glamira_batch_processing_spark.operators.behavior import (
        funnel_user_flags,
    )
    from glamira_batch_processing_spark.streaming.funnel import funnel_stateful

    src = str(tmp_path / "funnel_src")
    schema = "user_id long, event_id long, ts_us long, event_type string"
    base = 1_700_000_000_000_000
    batch1 = [
        (1, 1, base + 1, "view"),
        (1, 2, base + 2, "click"),
        (2, 3, base + 1, "click"),      # click before any view: no
        (3, 4, base + 1, "view"),
        (4, 5, base + 2, "purchase"),   # purchase first: no
    ]
    batch2 = [
        (1, 6, base + 9, "purchase"),   # completes user 1 across batches
        (2, 7, base + 9, "view"),       # view arrives after the click
        (2, 8, base + 10, "purchase"),  # no qualified click -> stays 1
        (3, 9, base + 9, "click"),
        (4, 10, base + 9, "view"),
    ]
    for b in (batch1, batch2):
        spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = funnel_stateful(stream.groupBy("user_id"), ["view", "click", "purchase"])
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "funnel_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode: keep the LAST emitted row per user
    prog = {}
    for r in spark.sql(
        "SELECT * FROM funnel_progress"
    ).collect():  # rows arrive in batch order
        prog[r.user_id] = r.stage_reached
    # user 4's purchase precedes its view (never qualifies); the later
    # view alone leaves it at stage 1
    assert prog == {1: 3, 2: 1, 3: 2, 4: 1}

    union = spark.createDataFrame(batch1 + batch2, schema).withColumn(
        "ts", F.timestamp_micros(F.col("ts_us"))
    )
    flags = funnel_user_flags(union, ["view", "click", "purchase"])
    batch_reached = {
        r.user_id: r.stage_0 + r.stage_1 + r.stage_2 for r in flags.collect()
    }
    assert batch_reached == prog


def test_stateful_final_sessionize_emits_once_on_close(spark, tmp_path):
    """The timeout-finalizing sessionizer (append semantics): each
    session emits exactly once — in-batch gap closure, cross-batch
    data-path closure, and EVENT-TIME TIMEOUT closure of an idle
    session once the watermark passes last_ts + gap."""
    import os

    from glamira_batch_processing_spark.streaming.sessionize import (
        sessionize_stateful_final,
    )

    src = tmp_path / "final_src"
    GAP = 30 * 60 * 1_000_000
    MIN = 60 * 1_000_000
    base = 1_700_000_000_000_000
    # file 0: user 1 has a gap-closed session (e1,e2) + an open one
    # (e3 at +100min); user 9 has one event (its session will close
    # via the DATA path when its +3h event arrives in file 1).
    batches = [
        [(1, base), (1, base + 10_000_000), (1, base + 100 * MIN), (9, base)],
        # file 1: user 9 jumps +3h — closes u9 session 1, advances the
        # watermark so u1's idle open session times out in batch 2.
        [(9, base + 180 * MIN)],
        # file 2: more u9 traffic; its only job is to run batch 2 where
        # u1's timeout (base+130min) < watermark (base+150min) fires.
        [(9, base + 181 * MIN)],
        # file 3: user 1 RETURNS after its session 2 was closed by
        # timeout — the counter must survive the close, so this opens
        # session_seq=3 (not a duplicate seq=1).
        [(1, base + 200 * MIN)],
        # file 4: u9 jumps +400min — data-path-closes u9's session 2
        # and advances the watermark past u1's new timeout (230min).
        [(9, base + 400 * MIN)],
        # file 5: one more batch so u1's session-3 timeout fires.
        [(9, base + 401 * MIN)],
    ]
    for i, rows in enumerate(batches):
        d = src / f"b{i}"
        spark.createDataFrame(rows, "user_id long, ts_us long").selectExpr(
            "user_id", "ts_us", "timestamp_micros(ts_us) AS ts"
        ).coalesce(1).write.parquet(str(d))
        for p in d.glob("*.parquet"):
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema("user_id long, ts_us long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
        .withWatermark("ts", "30 minutes")
    )
    sessions = sessionize_stateful_final(stream.groupBy("user_id"))
    q = (
        sessions.writeStream.format("memory")
        .queryName("final_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_final"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_seq): (r.start_us, r.last_us, r.n_events)
        for r in spark.sql("SELECT * FROM final_sessions").collect()
    }
    assert got == {
        (1, 1): (base, base + 10_000_000, 2),          # in-batch gap close
        (9, 1): (base, base, 1),                        # data-path close
        (1, 2): (base + 100 * MIN, base + 100 * MIN, 1),  # TIMEOUT close
        # returning after a timeout close continues the counter: a
        # state.remove() on timeout would restart this at (1, 1) and
        # break the one-immutable-row-per-(user, seq) contract.
        (1, 3): (base + 200 * MIN, base + 200 * MIN, 1),
        (9, 2): (base + 180 * MIN, base + 181 * MIN, 2),  # data-path close
    }
