"""Weighted incremental join-view maintenance (pipeline.matview):
the bilinear delta rule with inserts, deletes, multiplicities > 1,
and the full-cancellation edge case."""

from pyspark.sql import functions as F

from samza_spark.pipeline import matview as mv


def _v(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_insert_delete_and_multiplicity(spark):
    a_old = mv.with_weight(_v(spark, [(1, "a1"), (2, "a2")], "k int, av string"))
    b_old = mv.with_weight(_v(spark, [(1, "b1"), (2, "b2"), (3, "b3")], "k int, bv string"))
    # delta: new a-row for k=3, DELETE b-row k=2, duplicate a-row k=1
    delta_a = mv.with_weight(_v(spark, [(3, "a3"), (1, "a1")], "k int, av string"))
    delta_b = mv.with_weight(_v(spark, [(2, "b2")], "k int, bv string"), -1)

    v_old = mv.weighted_join(a_old, b_old, on="k")
    dv = mv.join_view_delta(a_old, delta_a, b_old, delta_b, on="k")
    v_new = mv.apply_delta(v_old, dv)

    got = {(r["k"], r["av"], r["bv"]): r["__w"] for r in v_new.collect()}
    # from scratch: a_new = {a1 x2 (k=1), a2 (k=2), a3 (k=3)};
    # b_new = {b1 (k=1), b3 (k=3)}
    assert got == {(1, "a1", "b1"): 2, (3, "a3", "b3"): 1}


def test_delete_then_reinsert_cancels_to_scratch(spark):
    a_old = mv.with_weight(_v(spark, [(1, "x")], "k int, av string"))
    b_old = mv.with_weight(_v(spark, [(1, "y")], "k int, bv string"))
    # b delta deletes (1, y) and inserts (1, z) in one batch
    delta_b = mv.with_weight(_v(spark, [(1, "y")], "k int, bv string"), -1).unionByName(
        mv.with_weight(_v(spark, [(1, "z")], "k int, bv string"))
    )
    delta_a = mv.with_weight(
        spark.createDataFrame([], "k int, av string")
    )
    v_new = mv.apply_delta(
        mv.weighted_join(a_old, b_old, on="k"),
        mv.join_view_delta(a_old, delta_a, b_old, delta_b, on="k"),
    )
    got = [(r["k"], r["av"], r["bv"], r["__w"]) for r in v_new.collect()]
    assert got == [(1, "x", "z", 1)]


def test_compact_drops_zero_weight(spark):
    df = mv.with_weight(_v(spark, [(1, "a")], "k int, v string")).unionByName(
        mv.with_weight(_v(spark, [(1, "a")], "k int, v string"), -1)
    )
    assert mv.compact(df).count() == 0


def test_delta_plan_broadcasts_delta_side(spark):
    a_old = mv.with_weight(spark.range(1000).select(F.col("id").alias("k"), F.lit("a").alias("av")))
    delta_a = mv.with_weight(_v(spark, [(5, "new")], "k long, av string"))
    b_old = mv.with_weight(spark.range(1000).select(F.col("id").alias("k"), F.lit("b").alias("bv")))
    delta_b = mv.with_weight(_v(spark, [(7, "del")], "k long, bv string"), -1)
    dv = mv.join_view_delta(a_old, delta_a, b_old, delta_b, on="k")
    plan = dv._sc._jvm.PythonSQLUtils.explainString(
        dv._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan  # delta-side joins never shuffle the base


def test_streaming_join_view_across_restart(spark, tmp_path):
    """Two CDC waves through the same checkpoint: inserts then a delete +
    more inserts; compacted read == from-scratch join of survivors."""
    from samza_spark.pipeline.matview import read_join_view, streaming_join_view

    src = tmp_path / "cdc"
    src.mkdir()
    dim = _v(spark, [(1, "d1"), (2, "d2"), (3, "d3")], "k int, dv string")
    view = str(tmp_path / "view")

    _v(spark, [("i", 1, "a"), ("i", 2, "b")], "op string, k int, av string").write.parquet(
        str(src / "w1")
    )
    q = streaming_join_view(
        spark.readStream.schema("op string, k int, av string").parquet(f"{src}/*"),
        dim,
        on="k",
        view_path=view,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got1 = {(r["k"], r["av"], r["dv"]) for r in read_join_view(spark, view).collect()}
    assert got1 == {(1, "a", "d1"), (2, "b", "d2")}

    # wave 2 (restart: new query, same checkpoint): delete (1, a), insert (3, c)
    _v(spark, [("d", 1, "a"), ("i", 3, "c")], "op string, k int, av string").write.parquet(
        str(src / "w2")
    )
    q2 = streaming_join_view(
        spark.readStream.schema("op string, k int, av string").parquet(f"{src}/*"),
        dim,
        on="k",
        view_path=view,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination()
    got2 = {
        (r["k"], r["av"], r["dv"], r["__w"])
        for r in read_join_view(spark, view).collect()
    }
    assert got2 == {(2, "b", "d2", 1), (3, "c", "d3", 1)}
