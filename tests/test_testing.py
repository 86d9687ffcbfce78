"""TestRunner framework parity (samza-test TestRunner/StreamAssert —
the reference's integration-test harness re-expressed for Spark)."""

import pytest
from pyspark.sql import functions as F

from samza_spark.testing import StreamAssert, TestRunner


def test_repartition_count_app(spark):
    """The StreamApplicationIntegrationTest shape: pageviews keyed by
    member, counted per member (repartitionBy + count)."""

    def app(streams, sinks):
        pv = streams["pageviews"]
        counts = pv.partition_by("member").df.groupBy("member").agg(
            F.count(F.lit(1)).alias("n")
        )
        return {"counts": counts}

    rows = [("alice", "/home"), ("bob", "/x"), ("alice", "/y"), ("alice", "/z")]
    runner = (
        TestRunner.of(app)
        .add_input_stream("pageviews", rows, "member string, page string")
        .add_output_stream("counts")
        .run(spark)
    )
    StreamAssert.contains_in_any_order(
        runner.consume_stream("counts"), [("alice", 3), ("bob", 1)]
    )


def test_filter_map_app_and_ordered_assert(spark):
    def app(streams, sinks):
        s = streams["nums"]
        out = s.filter(F.col("v") % 2 == 0).map(doubled=F.col("v") * 2)
        return {"evens": out}

    runner = (
        TestRunner.of(app)
        .add_input_stream("nums", [(i,) for i in range(6)], "v int")
        .add_output_stream("evens")
        .run(spark)
    )
    got = runner.consume_stream("evens")
    StreamAssert.contains_in_any_order(got, [(0,), (4,), (8,)])
    StreamAssert.contains(sorted(got), [(0,), (8,)])  # in-order subsequence
    with pytest.raises(AssertionError):
        StreamAssert.contains_in_any_order(got, [(0,), (4,)])


def test_two_runners_are_isolated(spark):
    """The inMemoryScope discipline: two runners with the SAME output
    stream name must not read each other's sinks."""

    def mk_app(tag):
        def app(streams, sinks):
            return {"out": streams["inp"].map("v", tag=F.lit(tag)).df}

        return app

    r1 = (
        TestRunner.of(mk_app("a"))
        .add_input_stream("inp", [(1,)], "v int")
        .add_output_stream("out")
        .run(spark)
    )
    r2 = (
        TestRunner.of(mk_app("b"))
        .add_input_stream("inp", [(2,)], "v int")
        .add_output_stream("out")
        .run(spark)
    )
    StreamAssert.contains_in_any_order(r1.consume_stream("out"), [(1, "a")])
    StreamAssert.contains_in_any_order(r2.consume_stream("out"), [(2, "b")])


def test_app_can_drive_sinks_directly(spark):
    """Apps may write sinks themselves and return None (the StreamTask
    style); unknown returned outputs raise."""

    def app(streams, sinks):
        sinks["out"].write(streams["inp"].df)

    runner = (
        TestRunner.of(app)
        .add_input_stream("inp", [(7,)], "v int")
        .add_output_stream("out")
        .run(spark)
    )
    assert [tuple(r) for r in runner.consume_stream("out")] == [(7,)]

    def bad_app(streams, sinks):
        return {"nope": streams["inp"].df}

    with pytest.raises(KeyError, match="nope"):
        TestRunner.of(bad_app).add_input_stream(
            "inp", [(1,)], "v int"
        ).add_output_stream("out").run(spark)

    with pytest.raises(RuntimeError, match="run"):
        TestRunner.of(app).consume_stream("out")
