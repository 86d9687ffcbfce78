"""Live-fire end-to-end: the round-6 platform pieces composed in ONE
scripted flow (VERDICT r6 next #6 — the integration seams were the only
untested surface): replayable-log DataSource with a TIMESTAMP startpoint
-> SQL-shell MERGE INTO a state view -> EXPLAIN with scale advice ->
MetricsSnapshot distilled from the live query's progress telemetry.

Reference parity for the chain: consumer startpoint
(samza-api/.../startpoint/StartpointTimestamp.java), CDC upsert into a
table, sql-shell EXPLAIN, MetricsSnapshotReporter
(samza-core/.../metrics/reporter/MetricsSnapshotReporter.java)."""

from samza_spark.sources.log_datasource import (
    SamzaLogDataSource,
    append_records,
)
from samza_spark.sql.shell import ShellSession
from samza_spark.streaming.metrics import metrics_snapshot


def test_log_timestamp_merge_explain_metrics(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    # wave 1 (ts < 2000) is history the startpoint must skip; wave 2 is live
    append_records(log_dir, 0, [("u1", "stale-a", 1000), ("u2", "stale-b", 1500)])
    append_records(log_dir, 1, [("u3", "stale-c", 1800)])
    append_records(log_dir, 0, [("u1", "fresh-a", 2000), ("u4", "fresh-d", 2200)])
    append_records(log_dir, 1, [("u3", "fresh-c", 2500)])

    spark.dataSource.register(SamzaLogDataSource)
    q = (
        spark.readStream.format("samza_log")
        .option("path", log_dir)
        .option("startpoint", "timestamp")
        .option("startpointTimestampMs", "2000")
        .load()
        .writeStream.format("memory")
        .queryName("e2e_updates")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # 1) the timestamp startpoint consumed exactly the post-target records
    updates = spark.sql("SELECT key, value, timestamp_ms FROM e2e_updates")
    assert sorted(r["value"] for r in updates.collect()) == [
        "fresh-a",
        "fresh-c",
        "fresh-d",
    ]
    updates.createOrReplaceTempView("e2e_updates_v")

    # 2) shell-driven CDC MERGE of the consumed wave into a state view
    spark.createDataFrame(
        [("u1", "old-a", 100), ("u2", "old-b", 100), ("u9", "old-z", 100)],
        "key string, value string, timestamp_ms long",
    ).createOrReplaceTempView("e2e_state")
    shell = ShellSession(spark)
    r = shell.execute(
        "MERGE INTO e2e_state AS t USING e2e_updates_v AS s ON t.key = s.key "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    assert "merged into 'e2e_state'" in r.text
    state = {row["key"]: row["value"] for row in spark.table("e2e_state").collect()}
    assert state == {
        "u1": "fresh-a",  # matched -> replaced by the fresh source row
        "u2": "old-b",  # untouched (no fresh update)
        "u3": "fresh-c",  # inserted
        "u4": "fresh-d",  # inserted
        "u9": "old-z",  # untouched
    }

    # 3) EXPLAIN over the merged view surfaces the scale advisor verdict
    ex = shell.execute(
        "EXPLAIN SELECT key, count(*) AS n FROM e2e_state GROUP BY key"
    )
    assert "scale advisor" in ex.text

    # 4) MetricsSnapshot off the live query: the container-metrics group
    # reports the consumed-envelope count in the reference's wire layout
    snap = metrics_snapshot(q, job_name="e2e-cli", time_ms=123)
    grp = snap["metrics"]["org.apache.samza.container.SamzaContainerMetrics"]
    assert grp["process-envelopes"] == 3
    assert snap["header"]["job-name"] == "e2e-cli"
    assert snap["header"]["time"] == 123


def test_shell_explain_flags_hazard_then_merge_delete(spark, tmp_path):
    """The same seams, adversarial pass: EXPLAIN must FLAG a known hazard
    shape (global single-partition window), and MERGE's DELETE clause
    must drop matched rows by a source predicate."""
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id int, v string"
    ).createOrReplaceTempView("e2e_haz")
    shell = ShellSession(spark)
    ex = shell.execute(
        "EXPLAIN SELECT id, v, row_number() OVER (ORDER BY id) AS rn FROM e2e_haz"
    )
    assert "scale advisor:" in ex.text and "[" in ex.text  # at least one finding

    spark.createDataFrame(
        [("k1", "keep", 1), ("k2", "drop-me", 1)],
        "key string, value string, ver int",
    ).createOrReplaceTempView("e2e_tgt")
    spark.createDataFrame(
        [("k2", "tombstone", 2), ("k3", "new", 2)],
        "key string, value string, ver int",
    ).createOrReplaceTempView("e2e_src")
    shell.execute(
        "MERGE INTO e2e_tgt USING e2e_src ON key = key "
        "WHEN MATCHED AND value = 'tombstone' THEN DELETE "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {row["key"]: row["value"] for row in spark.table("e2e_tgt").collect()}
    assert got == {"k1": "keep", "k3": "new"}
