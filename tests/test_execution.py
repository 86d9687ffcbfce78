"""ExecutionPlan / plan.json generation (reference:
samza-core/.../execution/JobGraphJsonGenerator.java:49-260,
JobPlanner.java:141-154)."""

import json

from pyspark.sql import functions as F

from samza_spark.config import JobConfig
from samza_spark.execution import execution_plan, operator_graph, write_plan_json
from samza_spark.run_app import run_job


def test_operator_graph_maps_catalyst_nodes_to_opcodes(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = (
        orders.filter(F.col("o_totalprice") > 100)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .select("c_mktsegment", "n")
    )
    g = operator_graph(df, app_name="myapp", app_id="7")
    codes = {op["opCode"] for op in g["operators"].values()}
    assert {"FILTER", "JOIN", "WINDOW", "MAP"} <= codes
    # two parquet relations -> two input streams, each wired downstream
    assert len(g["inputStreams"]) == 2
    assert all(s["nextOperatorIds"] for s in g["inputStreams"])
    # opId format {app}-{id}-{opcode}-{n} (StreamApplicationDescriptorImpl:170)
    assert all(op_id.startswith("myapp-7-") for op_id in g["operators"])
    # every nextOperatorId refers to a real operator (graph is closed)
    ids = set(g["operators"])
    for op in g["operators"].values():
        assert set(op["nextOperatorIds"]) <= ids


def test_operator_graph_links_child_to_consumer(spark):
    df = (
        spark.range(10)
        .filter("id % 2 = 0")
        .select((F.col("id") * 2).alias("x"))
    )
    g = operator_graph(df)
    by_code = {op["opCode"]: op for op in g["operators"].values()}
    # Catalyst tree: Project(root) <- Filter <- Range. Samza orientation:
    # filter's nextOperatorIds -> the map; the map is terminal.
    assert by_code["FILTER"]["nextOperatorIds"] == [by_code["MAP"]["opId"]]
    assert by_code["MAP"]["nextOperatorIds"] == []
    assert g["inputStreams"][0]["nextOperatorIds"] == [by_code["FILTER"]["opId"]]


def _props(tmp_path, staging, extra=""):
    p = tmp_path / "job.properties"
    p.write_text(
        "job.name=planjob\n"
        "app.name=planapp\n"
        "task.inputs=files.src\n"
        "task.outputs=files.out\n"
        "systems.files.samza.factory=org.apache.samza.system.hdfs.HdfsSystemFactory\n"
        f"systems.files.stagingDirectory={staging}\n" + extra
    )
    return JobConfig.from_file(str(p))


def test_execution_plan_streams_tables_partitions(spark, tmp_path):
    staging = str(tmp_path / "stage")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, k string").coalesce(
        2
    ).write.parquet(f"{staging}/src")
    cfg = _props(
        tmp_path,
        staging,
        "streams.out.samza.partitions=8\n"
        "stores.mystore.factory=org.apache.samza.storage.kv.RocksDbKeyValueStorageEngineFactory\n"
        "stores.mystore.changelog=files.mystore-changelog\n",
    )
    plan = execution_plan(cfg)
    assert plan["applicationName"] == "planapp"
    assert plan["jobs"][0]["jobName"] == "planjob"
    src = plan["sourceStreams"]["src"]["streamSpec"]
    assert src["systemName"] == "files"
    assert src["physicalName"] == f"{staging}/src"
    assert src["partitionCount"] >= 1  # probed from the parquet dir
    assert plan["sourceStreams"]["src"]["targetJobs"] == ["planjob"]
    assert plan["sinkStreams"]["out"]["streamSpec"]["partitionCount"] == 8
    assert plan["sinkStreams"]["out"]["sourceJobs"] == ["planjob"]
    assert plan["tables"]["mystore"]["providerFactory"].endswith(
        "RocksDbKeyValueStorageEngineFactory"
    )


def test_execution_plan_partition_by_becomes_intermediate_stream(spark, tmp_path):
    staging = str(tmp_path / "stage2")
    spark.createDataFrame([(1, "a")], "id long, k string").write.parquet(
        f"{staging}/src"
    )
    cfg = _props(tmp_path, staging)
    df = spark.read.parquet(f"{staging}/src").repartition("k").groupBy("k").count()
    plan = execution_plan(cfg, df)
    assert len(plan["intermediateStreams"]) == 1
    (edge,) = plan["intermediateStreams"].values()
    assert edge["sourceJobs"] == edge["targetJobs"] == ["planjob"]
    ops = plan["jobs"][0]["operatorGraph"]["operators"]
    assert any(op["opCode"] == "PARTITION_BY" for op in ops.values())


def test_run_job_writes_plan_json(spark, tmp_path):
    staging = str(tmp_path / "stage3")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, k string, v long"
    ).write.parquet(f"{staging}/src")
    plan_dir = str(tmp_path / "plans")
    props = tmp_path / "app.properties"
    props.write_text(
        "job.name=appjob\n"
        "app.class=tests.test_run_app:word_stats_app\n"
        "task.inputs=files.src\n"
        "task.outputs=files.counted\n"
        "systems.files.samza.factory=org.apache.samza.system.hdfs.HdfsSystemFactory\n"
        f"systems.files.stagingDirectory={staging}\n"
        f"job.plan.dir={plan_dir}\n"
    )
    result = run_job(JobConfig.from_file(str(props)), spark)
    assert result["plan"].endswith("plan.json")
    plan = json.loads(open(result["plan"]).read())
    # the app returned a DataFrame -> operator graph filled in
    ops = plan["jobs"][0]["operatorGraph"]["operators"]
    assert any(op["opCode"] == "WINDOW" for op in ops.values())  # the groupBy
    assert plan["sourceStreams"]["src"]["streamSpec"]["systemName"] == "files"
    assert [s["streamId"] for s in plan["jobs"][0]["operatorGraph"]["outputStreams"]] == [
        "counted"
    ]


def test_write_plan_json_atomic(tmp_path):
    d = str(tmp_path / "p")
    path = write_plan_json({"jobs": []}, d)
    assert json.loads(open(path).read()) == {"jobs": []}


def test_column_lineage_projection_and_agg(spark, sf_dir):
    from samza_spark.execution import column_lineage

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    df = (
        orders.filter("o_totalprice > 0")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"), F.count("*").alias("n"))
        .select("o_custkey", (F.col("spend") / F.col("n")).alias("avg_spend"))
    )
    lin = column_lineage(df)
    cols = lin["columns"]
    assert cols["o_custkey"] == ["in1.o_custkey"]
    assert cols["avg_spend"] == ["in1.o_totalprice"]
    assert "orders" in lin["relations"]["in1"] or "parquet" in lin["relations"]["in1"].lower()


def test_column_lineage_join_attributes_both_sides(spark, sf_dir):
    from samza_spark.execution import column_lineage

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    df = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        (F.col("o_totalprice") + F.col("c_acctbal")).alias("mix"),
    )
    lin = column_lineage(df)["columns"]
    assert len(lin["mix"]) == 2 and len({r.split(".")[0] for r in lin["mix"]}) == 2
    assert lin["c_mktsegment"][0].endswith(".c_mktsegment")


def test_column_lineage_union_folds_branches(spark):
    from samza_spark.execution import column_lineage

    a = spark.createDataFrame([(1,)], "x long").select(F.col("x").alias("v"))
    b = spark.createDataFrame([(2,)], "y long").select(F.col("y").alias("v"))
    lin = column_lineage(a.unionByName(b))["columns"]
    assert sorted(r.split(".")[1] for r in lin["v"]) == ["x", "y"]


def test_column_lineage_explode(spark):
    from samza_spark.execution import column_lineage

    df = spark.createDataFrame([(1, [1, 2])], "id long, xs array<long>").select(
        "id", F.explode("xs").alias("x")
    )
    lin = column_lineage(df)["columns"]
    assert lin["x"] == ["in1.xs"]
    assert lin["id"] == ["in1.id"]
