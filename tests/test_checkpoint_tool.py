"""Checkpoint inspection/rewind tool — the CheckpointTool analog
(reference: samza-core/.../checkpoint/CheckpointTool.scala: print the
latest offset of every SSP; overwrite checkpoints to force replay)."""

import time

from samza_spark.sources.log_datasource import SamzaLogDataSource, append_records
from samza_spark.streaming.checkpoint_tool import (
    inspect,
    list_batches,
    main,
    read_offsets,
    rewind_to,
    set_offsets,
)


def _run_collect(spark, log, ckpt, seen, n, timeout=60):
    """Drive the stream through a NON-transactional foreachBatch collector
    (``seen``: batch_id -> row count). A transactional sink (parquet's
    _spark_metadata log) would absorb a rewind replay idempotently — the
    collector sees every delivery, which is what this tool's tests need."""

    def collect(df, batch_id):
        seen.append((batch_id, df.count()))

    q = (
        spark.readStream.format("samza_log")
        .option("path", log)
        .load()
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        end = time.time() + timeout
        while time.time() < end:
            if not q.status["isDataAvailable"] and sum(c for _, c in seen) >= n:
                return
            time.sleep(0.3)
        raise AssertionError(f"collector stuck at {seen} < {n}")
    finally:
        q.stop()


def test_inspect_and_rewind_replays_exact_batch(spark, tmp_path):
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    spark.dataSource.register(SamzaLogDataSource)
    seen = []

    # two run/append phases -> at least two planned batches in the log
    append_records(log, 0, [("k0", "a", 1), ("k1", "b", 2)])
    append_records(log, 1, [("k2", "c", 3), ("k3", "d", 4)])
    _run_collect(spark, log, ckpt, seen, 4)
    append_records(log, 0, [("k4", "e", 5), ("k5", "f", 6)])
    _run_collect(spark, log, ckpt, seen, 6)
    assert sum(c for _, c in seen) == 6

    info = inspect(ckpt)
    # SSP view of the latest planned batch == the manifest high water
    got = {(r["partition"], r["offset"]) for r in info["ssp"]}
    assert got == {("0", 4), ("1", 2)}
    assert info["committed"] == info["latest"]["batch_id"]
    assert not info["in_flight"]

    batches = list_batches(ckpt)["offsets"]
    assert len(batches) >= 2
    # the last batch that moved offsets is the restart batch (2 rows)
    target = batches[-1]
    before = read_offsets(ckpt, target - 1)["sources"][0]
    after = read_offsets(ckpt, target)["sources"][0]
    replay_rows = sum(after[p] - before.get(p, 0) for p in after)
    assert replay_rows == 2

    res = rewind_to(ckpt, target)
    assert f"commits/{target}" in res["deleted"]
    assert inspect(ckpt)["in_flight"]  # planned but no longer committed

    # restart: batch `target` re-executes from its recorded pre-offsets
    # and re-delivers its exact rows under the SAME batch id —
    # deterministic replay is the replayable-log contract
    _run_collect(spark, log, ckpt, seen, 6 + replay_rows)
    replayed = [(b, c) for b, c in seen if b == target]
    assert len(replayed) == 2 and all(c == replay_rows for _, c in replayed)
    assert inspect(ckpt)["committed"] == target


def test_transactional_sink_absorbs_rewind_exactly_once(spark, tmp_path):
    """End-to-end exactly-once: replay a batch into a parquet stream sink
    and its _spark_metadata transaction log dedupes the re-delivery."""
    log = str(tmp_path / "logx")
    ckpt = str(tmp_path / "ckptx")
    out = str(tmp_path / "outx")
    spark.dataSource.register(SamzaLogDataSource)

    def run(n, timeout=60):
        q = (
            spark.readStream.format("samza_log")
            .option("path", log)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            end = time.time() + timeout
            while time.time() < end:
                try:
                    c = spark.read.parquet(out).count()
                except Exception:
                    c = 0
                if not q.status["isDataAvailable"] and c >= n:
                    return
                time.sleep(0.3)
            raise AssertionError("sink did not reach expected count")
        finally:
            q.stop()

    append_records(log, 0, [("a", "x", 1), ("b", "y", 2)])
    run(2)
    target = max(list_batches(ckpt)["offsets"])
    rewind_to(ckpt, target)
    run(2)
    assert spark.read.parquet(out).count() == 2  # replayed, not duplicated


def test_set_offsets_shrinks_a_planned_batch(spark, tmp_path):
    log = str(tmp_path / "log2")
    ckpt = str(tmp_path / "ckpt2")
    spark.dataSource.register(SamzaLogDataSource)
    seen = []
    append_records(log, 0, [("a", "x", 1), ("b", "y", 2), ("c", "z", 3)])
    _run_collect(spark, log, ckpt, seen, 3)

    target = max(list_batches(ckpt)["offsets"])
    assert read_offsets(ckpt, target)["sources"][0] == {"0": 3}
    set_offsets(ckpt, target, 0, {"0": 2})
    assert read_offsets(ckpt, target)["sources"][0] == {"0": 2}
    # batch is un-committed so the restart re-plans it against the edit
    assert max(list_batches(ckpt)["commits"], default=-1) < target


def test_cli_prints_inspection_json(spark, tmp_path, capsys):
    log = str(tmp_path / "log3")
    ckpt = str(tmp_path / "ckpt3")
    spark.dataSource.register(SamzaLogDataSource)
    seen = []
    append_records(log, 0, [("a", "x", 1)])
    _run_collect(spark, log, ckpt, seen, 1)

    import json

    assert main(["--checkpoint", ckpt]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["ssp"] == [{"source": 0, "partition": "0", "offset": 1}]
