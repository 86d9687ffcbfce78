"""Streaming data-contract gate (pipeline.quality.streaming_quality_gate):
row-wise split with attributable quarantine, per-trigger report trail."""

from samza_spark.pipeline.quality import streaming_quality_gate


RULES = [
    {"name": "id_present", "kind": "completeness", "col": "id", "min_ppm": 1_000_000},
    {"name": "v_in_range", "kind": "in_range", "col": "v", "lo": 0, "hi": 100, "min_ppm": 900_000},
    {"name": "tag_known", "kind": "in_set", "col": "tag", "values": ["a", "b"], "min_ppm": 900_000},
]


def test_gate_routes_and_attributes(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    spark.createDataFrame(
        [(1, 50, "a"), (2, 500, "a"), (None, 10, "b"), (4, -3, "zzz")],
        "id int, v int, tag string",
    ).write.parquet(str(src / "w1"))
    good, quar, rep = (str(tmp_path / d) for d in ("good", "quar", "rep"))
    q = streaming_quality_gate(
        spark.readStream.schema("id int, v int, tag string").parquet(f"{src}/*"),
        RULES,
        good,
        quar,
        report_path=rep,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    assert [r["id"] for r in spark.read.parquet(good).collect()] == [1]
    bad = {r["v"]: r["__violated"] for r in spark.read.parquet(quar).collect()}
    assert bad[500] == "v_in_range"
    assert bad[10] == "id_present"
    assert bad[-3] == "v_in_range,tag_known"
    report = {r["rule"]: r for r in spark.read.parquet(rep).collect()}
    assert report["id_present"]["metric_ppm"] == 750_000
    assert not report["id_present"]["passed"]


def test_gate_rejects_corpus_level_rule(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="uniqueness"):
        streaming_quality_gate(
            spark.readStream.schema("id int").parquet(str(tmp_path)),
            [{"name": "u", "kind": "uniqueness", "col": "id", "min_ppm": 1}],
            "x",
            "y",
        )
