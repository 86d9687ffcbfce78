"""Streaming weighted sample (streaming/sampling.py): bounded-state
reservoir whose merged result must EQUAL the batch priority sample."""

import tempfile

from pyspark.sql import functions as F

from samza_spark.pipeline.sampling import weighted_sample_exact_k
from samza_spark.streaming.sampling import merged_sample, streaming_weighted_sample
from samza_spark.streaming.stateful import await_condition


def test_stream_equals_batch_sample(spark):
    df = spark.createDataFrame(
        [(i, 1 + (i * 7) % 50) for i in range(400)], "doc_id long, w long"
    )
    want = {
        str(r["doc_id"])
        for r in weighted_sample_exact_k(df, 20, weight_col="w").collect()
    }
    with tempfile.TemporaryDirectory() as d:
        df.repartition(5).write.parquet(f"{d}/in")
        src = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/in")
        )
        q = (
            streaming_weighted_sample(src, 20, weight_col="w", n_groups=4)
            .writeStream.format("memory")
            .queryName("ws_panes")
            .outputMode("append")
            .start()
        )
        # done when every group's latest pane reflects all 400 rows: the
        # merged sample then equals the batch answer
        def _ok():
            sink = spark.sql("SELECT * FROM ws_panes")
            if not sink.count():
                return False
            got = {
                r["id"] for r in merged_sample(sink, 20).collect()
            }
            return got == want

        assert await_condition(q, _ok)
        q.stop()
        sink = spark.sql("SELECT * FROM ws_panes")
        merged = merged_sample(sink, 20).collect()
    got_ids = {r["id"] for r in merged}
    assert got_ids == want
    assert len(merged) == 20
    # state boundedness: no pane ever exceeds k rows per group
    per_pane = (
        sink.groupBy("grp", "pane_seq").count().agg(F.max("count")).first()[0]
    )
    assert per_pane <= 20


def test_stream_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -5), (4, 3)], "doc_id long, w long"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/in")
        src = spark.readStream.schema(df.schema).parquet(f"{d}/in")
        q = (
            streaming_weighted_sample(src, 10, weight_col="w", n_groups=2)
            .writeStream.format("memory")
            .queryName("ws_np")
            .outputMode("append")
            .start()
        )
        assert await_condition(
            q, lambda: spark.sql("SELECT count(*) FROM ws_np").first()[0] >= 2
        )
        q.stop()
        ids = {
            r["id"]
            for r in merged_sample(spark.sql("SELECT * FROM ws_np"), 10).collect()
        }
    assert ids == {"1", "4"}
