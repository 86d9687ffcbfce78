"""Python streaming DataSource (sources.log_datasource): the
SystemConsumer/SSP/offset contract over a partitioned append-only log."""

import json
import time

import pytest

from samza_spark.sources.log_datasource import (
    SamzaLogDataSource,
    append_records,
    read_manifest,
)


@pytest.fixture()
def log_dir(tmp_path):
    d = str(tmp_path / "log")
    append_records(d, 0, [("k0", "a", 1000), ("k1", "b", 2000)])
    append_records(d, 1, [("k2", "c", 1500)])
    append_records(d, 2, [(None, "d", 1700), ("k3", "e", 1800), ("k4", "f", 1900)])
    return d


def _register(spark):
    spark.dataSource.register(SamzaLogDataSource)


def test_manifest_tracks_high_water_marks(log_dir):
    assert read_manifest(log_dir) == {0: 2, 1: 1, 2: 3}
    append_records(log_dir, 1, [("k9", "z", 9000)])
    assert read_manifest(log_dir)[1] == 2


def test_batch_read_all_partitions(spark, log_dir):
    _register(spark)
    df = spark.read.format("samza_log").option("path", log_dir).load()
    rows = sorted((r["partition"], r["offset"], r["value"]) for r in df.collect())
    assert rows == [
        (0, 0, "a"),
        (0, 1, "b"),
        (1, 0, "c"),
        (2, 0, "d"),
        (2, 1, "e"),
        (2, 2, "f"),
    ]
    # null key round-trips
    assert df.filter("key IS NULL").count() == 1


def _drain(q, sink_df, want, timeout=60):
    t0 = time.time()
    while time.time() - t0 < timeout:
        q.processAllAvailable()
        if sink_df.count() >= want:
            return
        time.sleep(0.2)
    raise AssertionError(f"sink never reached {want} rows")


def test_stream_reads_then_picks_up_appends(spark, log_dir, tmp_path):
    _register(spark)
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("samza_log").option("path", log_dir).load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("log_sink1")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        sink = spark.sql("SELECT * FROM log_sink1")
        _drain(q, sink, 6)
        # exactly-once: no duplicates of the initial six
        assert sink.count() == 6
        append_records(log_dir, 0, [("k5", "g", 3000)])
        append_records(log_dir, 3, [("k6", "h", 3100)])  # NEW partition
        _drain(q, sink, 8)
        got = {(r["partition"], r["offset"], r["value"]) for r in sink.collect()}
        assert (0, 2, "g") in got and (3, 0, "h") in got
        assert len(got) == 8
    finally:
        q.stop()


def test_stream_restart_resumes_from_checkpoint(spark, log_dir, tmp_path):
    # memory sink can't recover a checkpoint — use the file sink, whose
    # recovery path is exactly the OffsetManager contract under test
    _register(spark)
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out2")

    def start():
        return (
            spark.readStream.format("samza_log")
            .option("path", log_dir)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def sunk():
        try:
            return {
                (r["partition"], r["offset"], r["value"])
                for r in spark.read.parquet(out).collect()
            }
        except Exception:
            return set()

    q = start()
    try:
        t0 = time.time()
        while len(sunk()) < 6 and time.time() - t0 < 60:
            q.processAllAvailable()
            time.sleep(0.2)
        assert len(sunk()) == 6
    finally:
        q.stop()
    append_records(log_dir, 1, [("k7", "post-restart", 4000)])
    q = start()
    try:
        t0 = time.time()
        while len(sunk()) < 7 and time.time() - t0 < 60:
            q.processAllAvailable()
            time.sleep(0.2)
        got = sunk()
        # ONLY the new record replays — the checkpoint is the OffsetManager
        assert len(got) == 7
        assert (1, 1, "post-restart") in got
    finally:
        q.stop()


def test_startpoint_upcoming_skips_history(spark, log_dir, tmp_path):
    _register(spark)
    q = (
        spark.readStream.format("samza_log")
        .option("path", log_dir)
        .option("startpoint", "upcoming")
        .load()
        .writeStream.format("memory")
        .queryName("log_sink3")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    try:
        sink = spark.sql("SELECT * FROM log_sink3")
        q.processAllAvailable()
        assert sink.count() == 0  # history skipped
        append_records(log_dir, 2, [("k8", "fresh", 5000)])
        _drain(q, sink, 1)
        assert [r["value"] for r in sink.collect()] == ["fresh"]
    finally:
        q.stop()


def test_startpoint_specific_offsets(spark, log_dir, tmp_path):
    _register(spark)
    offs = json.dumps({"0": 1, "2": 2})
    q = (
        spark.readStream.format("samza_log")
        .option("path", log_dir)
        .option("startpoint", "specific")
        .option("startpointOffsets", offs)
        .load()
        .writeStream.format("memory")
        .queryName("log_sink4")
        .option("checkpointLocation", str(tmp_path / "ckpt4"))
        .start()
    )
    try:
        sink = spark.sql("SELECT * FROM log_sink4")
        _drain(q, sink, 3)
        got = sorted((r["partition"], r["offset"], r["value"]) for r in sink.collect())
        # partition 0 from ordinal 1, partition 2 from ordinal 2;
        # partition 1 is unnamed -> oldest (the new-partition default)
        assert got == [(0, 1, "b"), (1, 0, "c"), (2, 2, "f")]
    finally:
        q.stop()


def test_max_records_per_trigger_paces_batches(spark, log_dir, tmp_path):
    _register(spark)
    q = (
        spark.readStream.format("samza_log")
        .option("path", log_dir)
        .option("maxRecordsPerTrigger", "1")
        .load()
        .writeStream.format("memory")
        .queryName("log_sink5")
        .option("checkpointLocation", str(tmp_path / "ckpt5"))
        .start()
    )
    try:
        sink = spark.sql("SELECT * FROM log_sink5")
        _drain(q, sink, 6)
        assert sink.count() == 6  # paced but complete, no duplicates
    finally:
        q.stop()


def test_ts_index_tracks_blocks(log_dir):
    from samza_spark.sources.log_datasource import read_ts_index

    idx = read_ts_index(log_dir)
    # fixture: three appends -> one block each
    assert idx[0] == [[0, 2000]] and idx[1] == [[0, 1500]]
    assert idx[2] == [[0, 1900]]
    append_records(log_dir, 0, [("k9", "z", 9000)])
    assert read_ts_index(log_dir)[0] == [[0, 2000], [2, 9000]]


def test_startpoint_timestamp_resolves_per_partition(spark, log_dir, tmp_path):
    """StartpointTimestamp/offsetsForTimes: earliest offset with
    timestamp >= target per partition; partitions with nothing at/after
    the target start upcoming."""
    _register(spark)
    # fixture ts: p0=[1000,2000], p1=[1500], p2=[1700,1800,1900]
    q = (
        spark.readStream.format("samza_log")
        .option("path", log_dir)
        .option("startpoint", "timestamp")
        .option("startpointTimestampMs", "1800")
        .load()
        .writeStream.format("memory")
        .queryName("log_sink_ts")
        .option("checkpointLocation", str(tmp_path / "ckpt_ts"))
        .start()
    )
    try:
        sink = spark.sql("SELECT * FROM log_sink_ts")
        _drain(q, sink, 3)
        got = sorted((r["partition"], r["offset"], r["value"]) for r in sink.collect())
        # p0: offset 1 (ts 2000) is the first >= 1800; p1: 1500 < 1800 ->
        # upcoming, none; p2: offsets 1 (1800) and 2 (1900)
        assert got == [(0, 1, "b"), (2, 1, "e"), (2, 2, "f")]
    finally:
        q.stop()
