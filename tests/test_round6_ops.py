"""Round-6 operators: preference pairs, curriculum order, signal fusion,
dialogue turns, embargo split, streaming funnel."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_preference_pairs_picks_best_and_worst(spark):
    from samza_spark.pipeline.preference import preference_pairs

    rows = [
        # group (s1, en): clear quality spread
        (1, "Great prose, with many words and structure. " * 5, "en", "s1", 200),
        (2, "!!!!;;;;....", "en", "s1", 12),
        (3, "middling text here okay", "en", "s1", 23),
        # group (s2, en): single doc -> dropped
        (4, "lonely", "en", "s2", 6),
        # group (s3, de): two identical-quality docs -> zero margin, dropped
        (5, "same text", "de", "s3", 9),
        (6, "same text", "de", "s3", 9),
    ]
    out = preference_pairs(_docs(spark, rows), ("source", "lang")).collect()
    got = {(r["source"], r["lang"]): r for r in out}
    assert set(got) == {("s1", "en")}
    r = got[("s1", "en")]
    assert r["chosen_id"] == 1 and r["rejected_id"] == 2
    assert r["margin_micro"] > 0 and r["n_docs"] == 3


def test_preference_pairs_deterministic_tiebreak(spark):
    from samza_spark.pipeline.preference import preference_pairs

    # two best-quality ties (ids 7, 3) and two worst ties (ids 9, 5):
    # chosen -> smaller id of the best, rejected -> smaller id of the worst
    rows = [
        (7, "Good sentence with words.", "en", "s", 25),
        (3, "Good sentence with words.", "en", "s", 25),
        (9, "!!!!", "en", "s", 4),
        (5, "!!!!", "en", "s", 4),
    ]
    r = preference_pairs(_docs(spark, rows), ("source", "lang")).collect()[0]
    assert r["chosen_id"] == 3 and r["rejected_id"] == 5


def test_curriculum_order_stages_and_determinism(spark):
    from samza_spark.pipeline.preference import curriculum_order

    rows = [
        (i, ("word " * (i + 1)).strip() + ".", "en", "s", 6 * (i + 1))
        for i in range(20)
    ]
    out = curriculum_order(_docs(spark, rows), n_stages=4)
    got = out.collect()
    assert len(got) == 20
    stages = sorted((r["global_rank"], r["stage"]) for r in got)
    # 20 docs / 4 stages -> ranks 1-5 stage 1, ..., 16-20 stage 4
    for rank, stage in stages:
        assert stage == (rank - 1) * 4 // 20 + 1
    # order_key is a pure content hash: stable across runs
    again = {r["doc_id"]: r["order_key"] for r in curriculum_order(
        _docs(spark, rows), n_stages=4).collect()}
    assert {r["doc_id"]: r["order_key"] for r in got} == again


def test_signal_fusion_manual_check(spark):
    from samza_spark.pipeline.preference import signal_fusion

    rows = [
        (1, "Quality text with several words here.", "en", "s", 100),
        (2, "ok", "en", "s", 500),
        (3, "mid text here", "en", "s", 50),
    ]
    out = {r["doc_id"]: r for r in signal_fusion(_docs(spark, rows), top=3).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        want = sum(
            10**12 // (60 + r[c])
            for c in ("quality_rank", "length_rank", "token_rank")
        )
        assert r["fused_score"] == want
    assert out[2]["length_rank"] == 1  # n_chars 500 is the longest


def test_dialogue_turns_structure(spark):
    from samza_spark.pipeline.events import dialogue_turns

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1, one session: user/assistant strict alternation (4 turns)
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "error", 0.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "click", 0.0, "{}"),
        (4, t0 + dt.timedelta(minutes=3), 1, "purchase", 0.0, "{}"),
        # user 2: two consecutive user events collapse into ONE turn
        (5, t0, 2, "view", 0.0, "{}"),
        (6, t0 + dt.timedelta(minutes=1), 2, "click", 0.0, "{}"),
        (7, t0 + dt.timedelta(minutes=2), 2, "error", 0.0, "{}"),
        # user 2, NEW session after the 30-min gap, assistant-first
        (8, t0 + dt.timedelta(hours=2), 2, "signup", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["user_id"], r["session_id"]): r for r in dialogue_turns(df).collect()
    }
    s1 = got[(1, 1)]
    assert s1["n_events"] == 4 and s1["n_turns"] == 4
    assert s1["strict_alternation"] and s1["starts_user"]
    assert s1["first_role"] == "user" and s1["last_role"] == "assistant"
    s2 = got[(2, 1)]
    assert s2["n_events"] == 3 and s2["n_turns"] == 2  # view+click = one turn
    assert not s2["strict_alternation"] and s2["starts_user"]
    s3 = got[(2, 2)]
    assert s3["n_turns"] == 1 and not s3["starts_user"]
    assert s3["first_role"] == "assistant"


def test_embargo_split_boundaries_and_purge(spark):
    from samza_spark.pipeline.sampling import embargo_split

    t = dt.datetime(2024, 2, 14, 0, 0, 0)
    rows = [
        (1, t, 10, "view", 0.0, "{}"),                          # train
        (2, t + dt.timedelta(days=1), 11, "view", 0.0, "{}"),   # == train_end
        (3, t + dt.timedelta(days=2), 12, "view", 0.0, "{}"),   # embargo
        (4, t + dt.timedelta(days=10), 13, "view", 0.0, "{}"),  # test
        (5, t, 12, "click", 0.0, "{}"),                         # train but user 12 embargoed -> purged
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = embargo_split(
        df, "2024-02-15 00:00:00", embargo="3 days", group_col="user_id"
    )
    got = {r["event_id"]: r["split"] for r in out.collect()}
    assert got == {1: "train", 2: "train", 3: "embargo", 4: "test", 5: "purged"}
    # without a group_col there is no purging
    got2 = {
        r["event_id"]: r["split"]
        for r in embargo_split(df, "2024-02-15 00:00:00", embargo="3 days").collect()
    }
    assert got2[5] == "train"


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """funnel_stream across TWO micro-batches == the batch min-forward
    funnel on the full history (the StreamTask+store shape)."""
    from samza_spark.pipeline import events as pevents
    from samza_spark.streaming.running_agg import funnel_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0

    def ev(u, minute, et):
        nonlocal eid
        eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=minute), u, et))

    ev(1, 0, "view"); ev(1, 1, "click"); ev(1, 2, "purchase")   # full funnel
    ev(2, 0, "click"); ev(2, 1, "view"); ev(2, 2, "click")      # reaches 2
    ev(3, 0, "view")                                             # reaches 1
    ev(4, 0, "purchase"); ev(4, 1, "error")                     # reaches 0
    # user 5 crosses the batch boundary: view in batch 1, click+purchase in 2
    ev(5, 5, "view")
    split = len(rows)
    ev(5, 50, "click"); ev(5, 51, "purchase")

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    src = str(tmp_path / "fun_src")
    spark.createDataFrame(rows[:split], schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    steps = ["view", "click", "purchase"]
    q = (
        funnel_stream(stream, steps)
        .writeStream.format("memory")
        .queryName("fun_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "fun_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows[split:], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {}
    for r in spark.sql("SELECT * FROM fun_stream").collect():
        cur = got.get(r["key"])
        if cur is None or r["step_reached"] >= cur:
            got[r["key"]] = r["step_reached"]
    full = spark.createDataFrame(rows, schema)
    want = {
        str(r["user_id"]): r["step_reached"]
        for r in pevents.funnel(full, steps).collect()
    }
    # batch funnel only emits users with at least one step event; user 4's
    # purchase-without-view still yields a row (step_reached 0)
    for k, v in want.items():
        assert got.get(k, 0) == v
    assert got["5"] == 3  # the cross-batch progression


def test_round6_plans(spark):
    """Plan shape: preference_pairs is one hash aggregate (no window, no
    cartesian product); signal_fusion has no BatchEvalPython."""
    from samza_spark.pipeline.preference import preference_pairs, signal_fusion

    rows = [
        (i, f"text {'word ' * (i % 7)}", "en", f"s{i % 3}", 10 + i)
        for i in range(50)
    ]
    docs = _docs(spark, rows)
    pp = preference_pairs(docs, ("source", "lang"))
    plan = pp._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "Window" not in plan
    assert "BatchEvalPython" not in plan
    sf = signal_fusion(docs, top=10)
    plan2 = sf._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2 and "CartesianProduct" not in plan2
    # ranks come from the range-exchange global_rank: the only
    # SinglePartition exchange allowed is the final top-k collect
    assert "Exchange SinglePartition" not in plan2.split("TakeOrderedAndProject")[-1]
    assert "Window" not in plan2 or "windowspecdefinition()" not in plan2


def test_assemble_sequences_invariants(spark):
    from samza_spark.pipeline.packing import assemble_sequences, packing_stats

    df = spark.createDataFrame(
        [(i, 10 + (i % 7) * 5) for i in range(40)], "doc_id long, n_tok long"
    )
    seqs = assemble_sequences(df, "n_tok", budget=60, n_shards=2).collect()
    assert sum(r["n_docs"] for r in seqs) == 40
    for r in seqs:
        assert r["doc_ids"] == sorted(r["doc_ids"])  # packing order
        # offsets are the exclusive prefix sums of lengths
        want = [0]
        for c in r["seg_lengths"][:-1]:
            want.append(want[-1] + c)
        assert r["seg_offsets"] == want
        assert r["total_cost"] == sum(r["seg_lengths"])
        assert r["pad_waste"] == max(60 - r["total_cost"], 0)
        # boundary-crossing: at most the LAST doc overshoots
        assert r["total_cost"] - r["seg_lengths"][-1] < 60
    stats = packing_stats(df, "n_tok", budget=60, n_shards=2).collect()[0]
    assert stats["payload"] == sum(r["total_cost"] for r in seqs)
    assert stats["utilization_ppm"] == stats["payload"] * 10**6 // (
        stats["payload"] + stats["padding"]
    )


def test_dialogue_sessions_stream_matches_batch(spark, tmp_path):
    """Closed-session transcripts from the native session-window stream ==
    batch dialogue_turns per (user, session-in-time-order). Sessions only
    emit once the watermark passes their close, so a far-future flush
    event drives the final emission."""
    from samza_spark.pipeline.events import dialogue_turns
    from samza_spark.streaming.sessions import dialogue_sessions_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0

    def ev(u, minute, et):
        nonlocal eid
        eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=minute), u, et, 0.0, "{}"))

    ev(1, 0, "view"); ev(1, 1, "error"); ev(1, 2, "click")   # session 1
    ev(1, 120, "signup")                                     # session 2
    ev(2, 0, "view"); ev(2, 5, "click")                      # one session
    flush_user = 99
    ev(flush_user, 100000, "view")  # watermark driver, its own session stays open

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        dialogue_sessions_stream(stream, watermark="1 minute")
        .writeStream.format("memory")
        .queryName("dlg_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # one more empty-ish batch lets the advanced watermark close sessions
        spark.createDataFrame(rows[-1:], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    got_rows = [
        r
        for r in spark.sql("SELECT * FROM dlg_sessions").collect()
        if r["user_id"] != flush_user
    ]
    # order sessions per user by start time -> ordinal session ids
    got = {}
    for r in sorted(got_rows, key=lambda r: (r["user_id"], r["session_start"])):
        sid = sum(1 for k in got if k[0] == r["user_id"]) + 1
        got[(r["user_id"], sid)] = (
            r["n_events"], r["n_turns"], r["first_role"], r["last_role"],
            r["starts_user"], r["strict_alternation"],
        )
    batch = spark.createDataFrame(
        [r for r in rows if r[2] != flush_user], schema
    )
    want = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["n_turns"], r["first_role"], r["last_role"],
            r["starts_user"], r["strict_alternation"],
        )
        for r in dialogue_turns(batch).collect()
    }
    assert got == want and len(got) == 3


def test_balanced_shards_beats_hash_on_skew(spark):
    """Serpentine placement bounds shard-cost spread even under a skewed
    cost distribution where hash sharding is lopsided."""
    from samza_spark.pipeline.sampling import balanced_shards, shard_balance_report

    rows = [(i, 10 if i < 90 else 5000) for i in range(100)]  # 10 giants
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    n = 4
    rep = shard_balance_report(df, "n_chars", n_shards=n).collect()
    totals = [r["total_cost"] for r in rep]
    assert len(totals) == n and sum(r["n_docs"] for r in rep) == 100
    # serpentine: every shard gets giants spread from both ends; spread
    # stays within one giant's cost of even
    assert max(totals) - min(totals) <= 5000
    assert sum(r["share_ppm"] for r in rep) <= 10**6
    # assignment is deterministic
    a = {(r["doc_id"], r["shard"]) for r in balanced_shards(df, "n_chars", n).collect()}
    b = {(r["doc_id"], r["shard"]) for r in balanced_shards(df, "n_chars", n).collect()}
    assert a == b


def test_sft_transcripts_shape(spark):
    import json as _json

    from samza_spark.pipeline.events import sft_transcripts

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 0.0, "{}"),   # same role -> merged
        (3, t0 + dt.timedelta(minutes=2), 1, "error", 0.0, "{}"),
        (4, t0 + dt.timedelta(minutes=3), 1, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = sft_transcripts(df).collect()[0]
    msgs = _json.loads(r["messages_json"])
    assert msgs == [
        {"role": "user", "content": "view click"},
        {"role": "assistant", "content": "error"},
        {"role": "user", "content": "view"},
    ]
    assert r["n_turns"] == 3


def test_repetition_loops_flags_degenerate_output(spark):
    from samza_spark.pipeline.text import repetition_loops

    rows = [
        (1, "the same four words " * 8),          # loop: gram repeats 8x
        (2, "a perfectly normal sentence with unique words throughout here"),
        (3, "too short"),                          # < n words -> zero grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_loops(df, n=4, min_repeats=5).collect()}
    assert got[1]["looping"] and got[1]["max_repeat"] >= 5
    assert got[1]["top_gram"] is not None
    assert not got[2]["looping"] and got[2]["max_repeat"] == 1
    assert not got[3]["looping"] and got[3]["n_grams"] == 0


@pytest.mark.parametrize(
    "name,max_single_partition",
    [
        ("preference_pairs", 0),
        ("curriculum_order", 0),
        ("dialogue_turns", 0),
        ("embargo_split", 0),
        ("packed_sequences", 0),
        ("sft_export", 0),
        # final orderBy over the n_shards-row report is the one allowed
        ("balanced_shards", 1),
        ("repetition_loops", 0),
        ("hll_distinct", 0),
        ("signal_fusion", 1),  # top-k collect after TakeOrdered
    ],
)
def test_round6_query_plans_scale_safe(spark, name, max_single_partition):
    """No CartesianProduct / row-at-a-time Python anywhere; at most the
    documented post-aggregate SinglePartition exchange."""
    from samza_spark.queries import QUERIES

    df = QUERIES[name](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange SinglePartition") <= max_single_partition
