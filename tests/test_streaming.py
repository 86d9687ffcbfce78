"""Structured Streaming integration: file source -> windowed agg -> memory
sink; streaming SQL; checkpoint/AvailableNow (drain analog — SURVEY.md
§2.8). Uses the memory sink + processAllAvailable for synchronous tests."""

import datetime as dt
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from samza_spark.operators import MessageStream, Windows
from samza_spark.sources import FileSource, MemorySink


@pytest.fixture(scope="module")
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="ss_stream_")
    rows = [
        ("a", dt.datetime(2024, 1, 1, 10, m, s), float(m))
        for m in range(0, 30, 5)
        for s in (0, 30)
    ]
    spark.createDataFrame(rows, "k string, t timestamp, v double").write.mode(
        "overwrite"
    ).parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_to_completion(query):
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(30)


def test_stream_tumbling_window_counts(spark, stream_dir):
    src = FileSource(stream_dir, schema="k string, t timestamp, v double")
    stream = src.read_stream(spark)
    assert stream.is_streaming
    spec = Windows.keyed_tumbling_window("k", "t", "10 minutes").with_watermark(
        "1 minute"
    )
    out = stream.window(spec, n=F.count(F.lit(1)), s=F.sum("v"))
    # complete mode: emits every window (append would hold back the last
    # window until the watermark passes it — no more data arrives here)
    sink = MemorySink("win_out", output_mode="complete")
    q = out.send_to(sink)
    _run_to_completion(q)
    rows = sink.collect(spark)
    got = sorted((r.window.start.minute, r.n, r.s) for r in rows)
    assert got == [(0, 4, 10.0), (10, 4, 50.0), (20, 4, 90.0)]


def test_stream_filter_map_passthrough(spark, stream_dir):
    src = FileSource(stream_dir, schema="k string, t timestamp, v double")
    out = (
        src.read_stream(spark)
        .filter("v >= 10")
        .map("k", doubled=F.col("v") * 2)
    )
    sink = MemorySink("filter_out")
    q = out.send_to(sink)
    _run_to_completion(q)
    rows = sink.collect(spark)
    assert len(rows) == 8 and all(r.doubled >= 20 for r in rows)


def test_streaming_sql_over_temp_view(spark, stream_dir):
    """Layer-3 parity: spark.sql over a streaming temp view."""
    from samza_spark.sql import SqlApplication

    src = FileSource(stream_dir, schema="k string, t timestamp, v double")
    app = SqlApplication(spark)
    app.add_stream("sensor", src.read_stream(spark))
    sink = MemorySink("sql_stream_out")
    app.add_sink("sql_stream_out", sink)
    [q] = app.run("INSERT INTO sql_stream_out SELECT k, v FROM sensor WHERE v > 20")
    _run_to_completion(q)
    assert all(r.v > 20 for r in sink.collect(spark))


def test_foreach_batch_sink(spark, stream_dir):
    """MessageStream.sink -> foreachBatch (SinkOperatorImpl analog)."""
    src = FileSource(stream_dir, schema="k string, t timestamp, v double")
    seen = []
    q = src.read_stream(spark).sink(lambda df, epoch: seen.append(df.count()))
    _run_to_completion(q)
    assert sum(seen) == 12


def test_stream_stream_ttl_join(spark):
    """Streaming stream-stream equi-join with TTL: watermarks added on both
    sides bound state (Samza PartialJoinOperatorImpl's per-side TTL'd
    buffers); only pairs inside the +/- ttl window match."""
    d = tempfile.mkdtemp(prefix="ss_join_")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    clicks = [
        ("u1", "c1", base),
        ("u1", "c2", base + dt.timedelta(minutes=20)),
        ("u2", "c3", base),
    ]
    buys = [
        ("u1", "p1", base + dt.timedelta(minutes=2)),   # matches c1 only
        ("u2", "p2", base + dt.timedelta(minutes=50)),  # outside ttl of c3
    ]
    spark.createDataFrame(clicks, "user_id string, click_id string, cts timestamp") \
        .write.parquet(f"{d}/clicks")
    spark.createDataFrame(buys, "user_id string, buy_id string, bts timestamp") \
        .write.parquet(f"{d}/buys")
    try:
        cs = FileSource(f"{d}/clicks", schema="user_id string, click_id string, cts timestamp")
        bs = FileSource(f"{d}/buys", schema="user_id string, buy_id string, bts timestamp")
        joined = cs.read_stream(spark).join(
            bs.read_stream(spark),
            on="user_id",
            ttl="5 minutes",
            left_ts="cts",
            right_ts="bts",
        )
        sink = MemorySink("ttl_join_out", output_mode="append")
        q = joined.map("user_id", "click_id", "buy_id").send_to(sink)
        _run_to_completion(q)
        rows = {tuple(r) for r in sink.collect(spark)}
        assert rows == {("u1", "c1", "p1")}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_checkpoint_recovery_no_reprocessing(spark, tmp_path):
    """Checkpoint/restart (Samza checkpoint topic + OffsetManager analog,
    SURVEY.md §2.8): a restarted query resumes from committed offsets —
    already-processed files are not re-emitted; AvailableNow drains and
    terminates (DrainStates analog)."""
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    seen = []

    def run_once():
        stream = (
            spark.readStream.schema("id int, v string").parquet(f"{src_dir}/*")
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda b, e: seen.extend(tuple(r) for r in b.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string").write.parquet(
        str(src_dir / "f1")
    )
    run_once()
    assert sorted(seen) == [(1, "a"), (2, "b")]
    spark.createDataFrame([(3, "c")], "id int, v string").write.parquet(
        str(src_dir / "f2")
    )
    run_once()  # restart from checkpoint: only f2 is new
    assert sorted(seen) == [(1, "a"), (2, "b"), (3, "c")]


def test_streaming_stream_table_join(spark, tmp_path):
    """Stream-table lookup join on a streaming source: static side
    broadcast per micro-batch (StreamTableJoinOperatorImpl analog)."""
    from samza_spark.tables.local import InMemoryTable

    d = tmp_path / "stj"
    d.mkdir()
    spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id int, v int").write.parquet(
        str(d / "b1")
    )
    dim = InMemoryTable.from_rows(
        spark, [(1, "one"), (2, "two")], "id int, name string", ["id"]
    )
    src = FileSource(f"{d}/*", schema="id int, v int")
    joined = src.read_stream(spark).join_table(dim, on="id", how="inner")
    sink = MemorySink("stj_out", output_mode="append")
    q = joined.send_to(sink)
    _run_to_completion(q)
    rows = {tuple(r) for r in sink.collect(spark)}
    assert rows == {(1, 10, "one"), (2, 20, "two")}


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data handling (a strict superset of Samza, which has none —
    WindowOperatorImpl.java:278): rows older than watermark are dropped
    from windowed aggregation state."""
    d = tmp_path / "late"
    d.mkdir()
    on_time = [("a", dt.datetime(2024, 1, 1, 10, 0, i)) for i in range(3)]
    ahead = [("a", dt.datetime(2024, 1, 1, 12, 0, 0))]  # advances watermark
    mid = [("a", dt.datetime(2024, 1, 1, 12, 5, 0))]  # commits the advance
    late = [("a", dt.datetime(2024, 1, 1, 9, 0, 0))]  # behind watermark
    # the row filter uses the watermark committed at the END of the prior
    # batch, so the late row must arrive two batches after the advancing
    # event to be provably late
    spark.createDataFrame(on_time + ahead, "k string, t timestamp").coalesce(
        1
    ).write.parquet(str(d / "b1"))
    time.sleep(1.1)
    spark.createDataFrame(mid, "k string, t timestamp").coalesce(1).write.parquet(
        str(d / "b2")
    )
    time.sleep(1.1)
    spark.createDataFrame(late, "k string, t timestamp").coalesce(1).write.parquet(
        str(d / "b3")
    )
    stream = (
        spark.readStream.schema("k string, t timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/*")
        .withWatermark("t", "10 minutes")
        .groupBy("k", F.window("t", "1 hour"))
        .count()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    rows = {
        (r.k, r.window.start.hour, r["count"])
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    # append mode emits only watermark-closed windows: the 10:00 window (3
    # rows); the late 09:00 row was dropped, never creating its window
    assert (("a", 10, 3)) in rows
    assert not any(h == 9 for (_, h, _) in rows)


def test_idempotent_foreach_batch_skips_replayed_epoch(spark, tmp_path):
    """Effectively-once sink: a replayed epoch_id is skipped (Samza is
    at-least-once; the marker protocol upgrades any sink to exactly-once
    across completed batches)."""
    from samza_spark.streaming.idempotent import idempotent_foreach_batch

    hits = []
    fn = idempotent_foreach_batch(
        lambda df, epoch: hits.append(epoch), str(tmp_path / "markers")
    )
    df = spark.range(1)
    fn(df, 0)
    fn(df, 1)
    fn(df, 0)  # replay after "recovery"
    assert hits == [0, 1]


def test_kafka_wire_contract_via_memory_source(spark):
    """Kafka-shape contract without a broker: 6-column wire schema rows
    (KafkaSystemConsumer.java:44-65) run through the __key__ mapping
    (SamzaSqlRelMessage.java:39), an engine op, and back out as producer
    (key, value) records — the semantics the config-only KafkaSource/
    KafkaSink carry."""
    import json

    from samza_spark.sources import (
        KAFKA_WIRE_DDL,
        MemorySource,
        from_kafka_records,
        to_kafka_records,
    )

    rows = [
        (
            str(k).encode(),
            json.dumps({"user": f"u{k}", "amount": k * 10}).encode(),
            "payments",
            k % 2,
            i,
            dt.datetime(2024, 1, 1, 10, 0, i),
            0,
        )
        for i, k in enumerate([1, 2, 1, 3])
    ]
    wire = MemorySource(rows, KAFKA_WIRE_DDL).read(spark).df
    msgs = from_kafka_records(wire, "user string, amount bigint")
    # __key__ first (KEY_NAME convention), payload columns, consumer metadata
    assert msgs.columns == [
        "__key__", "user", "amount", "topic", "partition", "offset", "timestamp"
    ]
    got = {(r["__key__"], r["user"], r["amount"], r["offset"]) for r in msgs.collect()}
    assert got == {
        ("1", "u1", 10, 0), ("2", "u2", 20, 1), ("1", "u1", 10, 2), ("3", "u3", 30, 3)
    }
    out = msgs.filter("amount >= 20").select("__key__", "user", "amount")
    prod = to_kafka_records(out, key_col="__key__")
    assert prod.columns == ["key", "value"]
    sent = {(r["key"], json.loads(r["value"])["user"], json.loads(r["value"])["amount"])
            for r in prod.collect()}
    assert sent == {("2", "u2", 20), ("3", "u3", 30)}
    # keyless records: value-only producer rows (null-key round-robin topic)
    assert to_kafka_records(out).columns == ["value"]


def test_banded_range_join_stream_stream(spark, tmp_path):
    # bonus property of banding: the band equality key is exactly the
    # equi-condition Spark's stream-stream join wants — a raw
    # no-equi-key time-range join would be rejected/unbounded, the
    # banded form joins with watermark-bounded state
    import datetime as dt
    from samza_spark.operators.rangejoin import banded_range_join

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    (tmp_path / "l").mkdir(), (tmp_path / "r").mkdir()
    spark.createDataFrame([(1, t0)], "lid long, lts timestamp").write.parquet(
        str(tmp_path / "l" / "f1")
    )
    spark.createDataFrame(
        [(10, t0 + dt.timedelta(seconds=30)), (11, t0 + dt.timedelta(seconds=200))],
        "rid long, rts timestamp",
    ).write.parquet(str(tmp_path / "r" / "f1"))
    ls = (
        spark.readStream.schema("lid long, lts timestamp")
        .parquet(f"{tmp_path}/l/*")
        .withWatermark("lts", "10 minutes")
    )
    rs = (
        spark.readStream.schema("rid long, rts timestamp")
        .parquet(f"{tmp_path}/r/*")
        .withWatermark("rts", "10 minutes")
    )
    out = banded_range_join(ls, rs, "lts", "rts", upper="INTERVAL 90 SECONDS")
    q = (
        out.writeStream.format("memory")
        .queryName("srj_test_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r.lid, r.rid) for r in spark.sql("SELECT * FROM srj_test_out").collect()}
    assert rows == {(1, 10)}  # 11 is outside the 90s window


def test_stream_stream_left_outer_ttl_join(spark):
    """LEFT OUTER streaming TTL join — the superset Samza's DSL join
    (inner-only, PartialJoinOperatorImpl) cannot express: unmatched left
    rows emit null-padded once the watermark passes their join window.
    Null emission requires the watermark to ADVANCE past expiry, so both
    sides carry late sentinel rows in a second file processed in a later
    micro-batch."""
    d = tempfile.mkdtemp(prefix="ss_loj_")
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    late = base + dt.timedelta(hours=3)
    try:
        clicks1 = [("u1", "c1", base), ("u2", "c2", base)]
        clicks2 = [("w", "cw", late)]  # watermark pusher
        buys1 = [("u1", "p1", base + dt.timedelta(minutes=2))]
        buys2 = [("w2", "pw", late)]  # watermark pusher (no match)
        spark.createDataFrame(
            clicks1, "user_id string, click_id string, cts timestamp"
        ).coalesce(1).write.parquet(f"{d}/clicks")
        spark.createDataFrame(
            buys1, "user_id string, buy_id string, bts timestamp"
        ).coalesce(1).write.parquet(f"{d}/buys")
        cs = FileSource(
            f"{d}/clicks", schema="user_id string, click_id string, cts timestamp"
        )
        bs = FileSource(
            f"{d}/buys", schema="user_id string, buy_id string, bts timestamp"
        )
        cs.max_files_per_trigger = 1
        bs.max_files_per_trigger = 1
        joined = cs.read_stream(spark).join(
            bs.read_stream(spark),
            on="user_id",
            how="left_outer",
            ttl="5 minutes",
            left_ts="cts",
            right_ts="bts",
        )
        sink = MemorySink("loj_out", output_mode="append")
        q = joined.map("user_id", "click_id", "buy_id").send_to(sink)
        q.processAllAvailable()
        # append the watermark pushers as a SECOND file each; the next
        # micro-batches advance the watermark past base+ttl, releasing the
        # unmatched left row as null-padded
        spark.createDataFrame(
            clicks2, "user_id string, click_id string, cts timestamp"
        ).coalesce(1).write.mode("append").parquet(f"{d}/clicks")
        spark.createDataFrame(
            buys2, "user_id string, buy_id string, bts timestamp"
        ).coalesce(1).write.mode("append").parquet(f"{d}/buys")
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
        rows = {tuple(r) for r in sink.collect(spark)}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert ("u1", "c1", "p1") in rows          # matched pair
    assert ("u2", "c2", None) in rows          # released null-padded


def test_emitter_joiner_checker_restart(spark, tmp_path):
    """The reference's long-running correctness job
    (samza-test/src/main/config/join/{emitter,joiner,checker}.samza):
    an emitter feeds two sides of a stateful equi-join, the joiner is
    killed mid-stream and restarted from its checkpoint, and the checker
    asserts every key was joined EXACTLY once — no loss, no duplication,
    across the restart boundary."""
    left_dir = str(tmp_path / "left")
    right_dir = str(tmp_path / "right")
    ckpt = str(tmp_path / "ckpt")
    out = {}

    def emit(phase, ids):
        ids = list(ids)
        for chunk in (ids[: len(ids) // 2], ids[len(ids) // 2 :]):
            spark.createDataFrame(
                [(i, f"l{i}", phase) for i in chunk], "id long, lv string, phase int"
            ).coalesce(1).write.mode("append").parquet(left_dir)
            spark.createDataFrame(
                [(i, f"r{i}", phase) for i in chunk], "id long, rv string, phase int"
            ).coalesce(1).write.mode("append").parquet(right_dir)

    def checker_sink(batch, _epoch):
        for r in batch.collect():
            out.setdefault(r["id"], []).append(r["lv"] + "|" + r["rv"])

    def start_joiner():
        l = spark.readStream.schema("id long, lv string, phase int").parquet(left_dir)
        r = spark.readStream.schema("id long, rv string, phase int").parquet(right_dir)
        joined = l.join(r.drop("phase"), on="id", how="inner").select("id", "lv", "rv")
        return (
            joined.writeStream.foreachBatch(checker_sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    emit(1, range(0, 20))
    q = start_joiner()
    q.awaitTermination()
    emit(2, range(20, 40))  # the "kill" happened between phases
    q = start_joiner()
    q.awaitTermination()

    # checker: every id exactly once with the matched payload
    assert sorted(out) == list(range(40))
    assert all(len(v) == 1 and v[0] == f"l{k}|r{k}" for k, v in out.items())


def test_progress_summary_metrics(spark, tmp_path):
    """SamzaContainerMetrics parity surface: rows, batch timings, state
    size, and watermark from the query's own progress telemetry."""
    import datetime as dt

    from samza_spark.streaming.metrics import progress_summary

    src = str(tmp_path / "m_src")
    rows = [("k", dt.datetime(2024, 1, 1, 10, 0, i), float(i)) for i in range(20)]
    spark.createDataFrame(rows, "k string, t timestamp, v double").write.parquet(src)
    q = (
        spark.readStream.schema("k string, t timestamp, v double")
        .parquet(src)
        .withWatermark("t", "10 seconds")
        .groupBy("k", F.window("t", "1 minute"))
        .count()
        .writeStream.format("noop")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    m = progress_summary(q)
    assert m["batches"] >= 1
    assert m["input_rows"] == 20
    assert m["state_rows"] >= 1
    assert m["rows_per_sec"] > 0 and m["max_batch_ms"] > 0
    assert m["watermark"] is not None
    assert m["dropped_late_rows"] == 0


def test_streaming_ohlc_bars_match_batch(spark, tmp_path):
    """OHLC downsampling runs under Structured Streaming via the
    combinable min_by/max_by form (pipeline.events.ohlc_bars_agg) —
    per-pane open/high/low/close from a watermarked windowed groupBy
    equals the batch window-function form exactly."""
    import datetime as dt

    from samza_spark.pipeline import events as pevents

    src = str(tmp_path / "ohlc_src")
    rows = []
    for i in range(48):
        rows.append(
            (
                i,
                dt.datetime(2024, 1, 1 + i // 24, i % 24),
                "t" + str(i % 2),
                float((i * 37) % 101),
            )
        )
    batch_df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    batch_df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .parquet(src)
        .withWatermark("ts", "1 hour")
    )
    agged = (
        stream.groupBy(F.window("ts", "1 day"), F.col("event_type"))
        .agg(
            F.min_by("value", F.struct("ts", "event_id")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.struct("ts", "event_id")).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    q = (
        agged.writeStream.format("memory")
        .queryName("ohlc_stream")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["event_type"], r["window"].start): (
            r["open"], r["high"], r["low"], r["close"], r["n"],
        )
        for r in spark.sql("SELECT * FROM ohlc_stream").collect()
    }
    want = {
        (r["event_type"], r["bucket"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"],
        )
        for r in pevents.ohlc_bars(batch_df, bucket="day").collect()
    }
    assert got == want
    # and the combinable form equals the window-function form in batch
    agg_form = {
        (r["event_type"], r["bucket"]): (
            r["open"], r["high"], r["low"], r["close"], r["n"],
        )
        for r in pevents.ohlc_bars_agg(batch_df, bucket="day").collect()
    }
    assert agg_form == want


def test_streaming_running_balance_matches_batch(spark, tmp_path):
    """Clamped running balance incrementally across TWO micro-batches
    (streaming.running_agg.running_balance_stream): per-key state carries
    the fold; the final per-key (balance, clamps) equals the batch
    array-fold operator on the full history."""
    import datetime as dt

    from samza_spark.pipeline import events as pevents
    from samza_spark.streaming.running_agg import running_balance_stream

    rows = []
    eid = 0
    for u in (1, 2, 3):
        for i in range(10):
            eid += 1
            # deltas swing negative to force clamps
            rows.append(
                (eid, dt.datetime(2024, 1, 1, 0, i), u, (i % 5) * 3 - 6)
            )
    schema = "event_id long, ts timestamp, user_id long, d long"
    full = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "bal_src")
    # two files = two micro-batches, split mid-history (ts order preserved)
    spark.createDataFrame(rows[:15], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    out = running_balance_stream(stream, "user_id", "d")
    q = (
        out.writeStream.format("memory")
        .queryName("bal_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "bal_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows[15:], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    # final state per key = the emission with the highest n_events (memory
    # sink row order across batches is not defined)
    got = {}
    for r in spark.sql("SELECT * FROM bal_stream").collect():
        cur = got.get(r["key"])
        if cur is None or r["n_events"] > cur[2]:
            got[r["key"]] = (r["final_balance"], r["n_clamps"], r["n_events"])
    want = {
        str(r["user_id"]): (r["final_balance"], r["n_clamps"], r["n_events"])
        for r in pevents.running_balance(full, "d").collect()
    }
    # keys emitted in both batches keep the LAST row as final
    finals = {k: got[k] for k in want}
    assert finals == want
