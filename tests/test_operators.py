"""High-level DSL operator semantics (SURVEY.md §2.1-2.2), golden-output
style on in-memory data (TestRunner analog — samza-test/.../framework/
TestRunner.java)."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from samza_spark.operators import MessageStream, Windows
from samza_spark.sources import MemorySource
from samza_spark.tables.local import InMemoryTable


def ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture()
def pageviews(spark):
    rows = [
        ("home", 1),
        ("job", 2),
        ("inbox", 2),
        ("blank", 3),
        ("job", 4),
    ]
    return MemorySource(rows, "pageKey string, profileId int").read(spark)


def test_map_filter(pageviews):
    out = (
        pageviews.filter("pageKey <> 'blank'")
        .map("profileId", key_u=F.upper("pageKey"))
        .df.collect()
    )
    assert len(out) == 4
    assert {r.key_u for r in out} == {"HOME", "JOB", "INBOX"}


def test_flat_map(spark):
    s = MemorySource([(1, "a b"), (2, "c")], "id int, txt string").read(spark)
    out = s.flat_map(F.split("txt", " "), alias="tok", keep=["id"]).df.collect()
    assert sorted((r.id, r.tok) for r in out) == [(1, "a"), (1, "b"), (2, "c")]


def test_merge_union_all(spark):
    a = MemorySource([(1,)], "id int").read(spark)
    b = MemorySource([(1,), (2,)], "id int").read(spark)
    assert a.merge(b).df.count() == 3  # bag semantics, duplicates kept


def test_partition_by(spark):
    s = MemorySource([(i % 3, i) for i in range(30)], "k int, v int").read(spark)
    out = s.partition_by("k", num_partitions=3)
    assert out.df.rdd.getNumPartitions() == 3
    # all rows of one key land in one partition (co-partitioning contract)
    parts = out.df.select("k", F.spark_partition_id().alias("p")).distinct().collect()
    per_key = {}
    for r in parts:
        per_key.setdefault(r.k, set()).add(r.p)
    assert all(len(ps) == 1 for ps in per_key.values())


def test_stream_table_join_inner_and_left(spark, pageviews):
    profiles = InMemoryTable.from_rows(
        spark,
        [(1, "Ann"), (2, "Bob")],
        "id int, name string",
        ["id"],
    )
    inner = pageviews.join_table(profiles, on=F.expr("profileId = id")).df
    assert inner.count() == 3  # profileId 3,4 miss
    left = pageviews.join_table(profiles, on=F.expr("profileId = id"), how="left").df
    assert left.count() == 5
    assert left.filter("name IS NULL").count() == 2


def test_stream_stream_ttl_join_batch(spark):
    left = MemorySource(
        [(1, "l1", ts(0)), (1, "l2", ts(20))], "k int, lv string, lts timestamp"
    ).read(spark)
    right = MemorySource(
        [(1, "r1", ts(4)), (1, "r2", ts(40))], "k int, rv string, rts timestamp"
    ).read(spark)
    out = left.join(right, on=["k"], ttl="5 minutes", left_ts="lts", right_ts="rts").df
    got = sorted((r.lv, r.rv) for r in out.collect())
    assert got == [("l1", "r1")]  # l2<->r2 is 20 min apart: outside TTL


def test_keyed_tumbling_window(spark):
    rows = [(("a"), ts(0)), ("a", ts(5)), ("a", ts(12)), ("b", ts(1))]
    s = MemorySource(rows, "k string, t timestamp").read(spark)
    spec = Windows.keyed_tumbling_window("k", "t", "10 minutes")
    out = s.window(spec, n=F.count(F.lit(1))).df.collect()
    got = sorted((r.k, r.window.start.minute, r.n) for r in out)
    assert got == [("a", 0, 2), ("a", 10, 1), ("b", 0, 1)]


def test_keyed_session_window(spark):
    rows = [("u", ts(0)), ("u", ts(2)), ("u", ts(30)), ("v", ts(0))]
    s = MemorySource(rows, "k string, t timestamp").read(spark)
    spec = Windows.keyed_session_window("k", "t", "10 minutes")
    out = s.window(spec, n=F.count(F.lit(1))).df.collect()
    got = sorted((r.k, r.n) for r in out)
    assert got == [("u", 1), ("u", 2), ("v", 1)]


def test_broadcast_hint_applies(spark, pageviews):
    big = MemorySource([(i,) for i in range(100)], "profileId int").read(spark)
    joined = big.join_table(pageviews.broadcast(), on=["profileId"]).df
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "simple"
    ) if hasattr(joined, "_sc") else ""
    # fallback: physical plan string via explain capture
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain()
    assert "BroadcastHashJoin" in buf.getvalue()


def test_flat_map_async(spark):
    """flatMapAsync (MessageStream.java:95): 1:n expansion through an
    Arrow-batched callable that may run its own async client per batch."""
    import pandas as pd

    src = MessageStream(spark.createDataFrame([(1, 2), (2, 3)], "id int, n int"))

    def expand(batches):
        for pdf in batches:
            out = pdf.loc[pdf.index.repeat(pdf["n"])]
            yield out[["id"]].assign(copy=out.groupby(level=0).cumcount())

    rows = sorted(
        tuple(r) for r in src.flat_map_async(expand, "id int, copy long").df.collect()
    )
    assert rows == [(1, 0), (1, 1), (2, 0), (2, 1), (2, 2)]


def test_low_level_stream_task(spark, tmp_path):
    """Layer-1 Task API (StreamTask/WindowableTask analog): per-batch
    process callback with collector output, windowed callback on interval,
    coordinator-driven shutdown."""
    from samza_spark.operators.task import StreamTaskRunner
    from samza_spark.sources import FileSource, MemorySink

    d = tmp_path / "task_in"
    d.mkdir()
    spark.createDataFrame([(1, 5), (2, 7)], "id int, v int").write.parquet(
        str(d / "b1")
    )
    state = {"total": 0}

    def process(batch, collector, coordinator):
        for r in batch.collect():
            state["total"] += r.v
            collector.send((r.id, r.v * 10))

    def window(collector, coordinator):
        collector.send((0, state["total"]))

    runner = StreamTaskRunner(
        process,
        window=window,
        window_interval_s=0.0,  # fire after every batch
        output_sink=MemorySink("task_out"),
        output_schema="id int, out int",
    )
    src = FileSource(f"{d}/*", schema="id int, v int")
    q = runner.run(src.read_stream(spark))
    q.processAllAvailable()
    q.stop()
    rows = {tuple(r) for r in spark.sql("SELECT * FROM task_out").collect()}
    assert rows == {(1, 50), (2, 70), (0, 12)}


def test_salted_agg_matches_plain(spark):
    from samza_spark.operators.skew import salted_agg, skew_safe_count_distinct

    rows = [(("hot" if i % 3 else f"k{i}"), i % 7, float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, u int, v double")
    salted = {
        tuple(r)
        for r in salted_agg(
            df,
            ["k"],
            {"n": ("count", None), "total": ("sum", "v"), "avg_v": ("avg", "v"),
             "mx": ("max", "v")},
            salt=8,
        ).collect()
    }
    plain = {
        tuple(r)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("total"),
            F.avg("v").alias("avg_v"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert salted == plain

    cd = {
        tuple(r)
        for r in skew_safe_count_distinct(df, ["k"], "u").collect()
    }
    plain_cd = {
        tuple(r)
        for r in df.groupBy("k").agg(F.countDistinct("u").alias("n_distinct")).collect()
    }
    assert cd == plain_cd


def test_banded_range_join_matches_theta(spark):
    import datetime as dt
    from samza_spark.operators.rangejoin import banded_range_join
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    lrows = [(i, base + dt.timedelta(seconds=37 * i)) for i in range(60)]
    rrows = [(1000 + i, base + dt.timedelta(seconds=11 * i)) for i in range(200)]
    left = spark.createDataFrame(lrows, "lid long, lts timestamp")
    right = spark.createDataFrame(rrows, "rid long, rts timestamp")
    banded = banded_range_join(
        left, right, "lts", "rts",
        lower="INTERVAL 0 SECONDS", upper="INTERVAL 90 SECONDS",
    )
    theta = left.join(
        right,
        (right["rts"] >= left["lts"])
        & (right["rts"] <= left["lts"] + F.expr("INTERVAL 90 SECONDS")),
    )
    key = lambda d: {(r.lid, r.rid) for r in d.select("lid", "rid").collect()}
    assert key(banded) == key(theta)
    assert banded.count() > 0
    # plan is a real hash/sort-merge join on the band key, not a nested loop
    plan = banded._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_banded_range_join_band_boundaries(spark):
    import datetime as dt
    from samza_spark.operators.rangejoin import banded_range_join

    base = dt.datetime(2024, 1, 1)
    # right rows exactly AT window edges and band edges
    left = spark.createDataFrame([(1, base)], "lid long, lts timestamp")
    right = spark.createDataFrame(
        [
            (10, base),                              # at lower edge -> in
            (11, base + dt.timedelta(seconds=90)),   # at upper edge -> in
            (12, base + dt.timedelta(seconds=91)),   # past upper -> out
            (13, base - dt.timedelta(seconds=1)),    # before lower -> out
        ],
        "rid long, rts timestamp",
    )
    got = {
        r.rid
        for r in banded_range_join(
            left, right, "lts", "rts",
            lower="INTERVAL 0 SECONDS", upper="INTERVAL 90 SECONDS",
        ).collect()
    }
    assert got == {10, 11}


def test_global_rank_matches_single_partition_window(spark):
    from samza_spark.operators.rank import global_rank
    from pyspark.sql import Window, functions as F

    df = spark.createDataFrame(
        [(i, float((i * 37) % 100)) for i in range(500)], "id long, score double"
    )
    out = global_rank(df, [F.desc("score"), F.asc("id")], num_partitions=7)
    expect = df.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("score"), F.asc("id"))).cast("long"),
    )
    assert {(r.id, r.rank) for r in out.collect()} == {
        (r.id, r.rank) for r in expect.collect()
    }
    # ranks are a permutation of 1..n
    ranks = sorted(r.rank for r in out.collect())
    assert ranks == list(range(1, 501))
    # the scalable plan's window is partitioned (by __pid), never global
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Window" in plan
    import re
    for m in re.finditer(r"partitionBy=\[(.*?)\]", plan):
        assert m.group(1).strip() != ""  # no empty partition spec anywhere


def test_with_percentile_buckets(spark):
    from samza_spark.operators.rank import with_percentile
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, float(i)) for i in range(200)], "id long, v double")
    out = with_percentile(df, [F.desc("v"), F.asc("id")], buckets=10, num_partitions=5)
    rows = {r.id: r for r in out.collect()}
    # highest value -> bucket 1; lowest -> bucket 10; 20 ids per decile
    assert rows[199].percentile == 1 and rows[0].percentile == 10
    from collections import Counter
    sizes = Counter(r.percentile for r in rows.values())
    assert all(sizes[b] == 20 for b in range(1, 11))
