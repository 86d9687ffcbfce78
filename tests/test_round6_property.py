"""Randomized equivalence tests for round-6 operators: Spark vs
straight-line pure-Python references on seeded random inputs (the
round5c_property pattern — seeded ``random``, not hypothesis, because
every case pays a Spark job)."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from pyspark.sql import functions as F


def _quality_micro_py(text: str) -> int:
    length = max(len(text), 1)
    alpha = sum(1 for c in text if c.isascii() and c.isalpha())
    punct = sum(1 for c in text if c in ".!?,;:")
    words = len(text.split())
    return (
        (400000 * alpha) // length
        + min(4000 * words, 400000)
        + (200000 - min((2000000 * punct) // length, 200000))
    )


_WORDS = ["alpha", "beta", "Gamma", "x", "...", "!!", "word,", "tail."]


def _rand_text(rng: random.Random) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(rng.randrange(0, 12)))


@pytest.mark.parametrize("seed", [2, 13, 77])
def test_quality_micro_matches_python(spark, seed):
    from samza_spark.pipeline.text import quality_micro

    rng = random.Random(seed)
    rows = [(i, _rand_text(rng)) for i in range(60)] + [(999, ""), (998, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["qm"]
        for r in df.select("doc_id", quality_micro("text").alias("qm")).collect()
    }
    for i, t in rows:
        assert got[i] == _quality_micro_py(t), (i, t)


@pytest.mark.parametrize("seed", [5, 21])
def test_preference_pairs_matches_reference(spark, seed):
    from samza_spark.pipeline.preference import preference_pairs

    rng = random.Random(seed)
    rows = [
        (i, _rand_text(rng), "en", f"s{rng.randrange(4)}", 10)
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        (r["source"], r["lang"]): (r["chosen_id"], r["rejected_id"], r["margin_micro"])
        for r in preference_pairs(df, ("source", "lang")).collect()
    }
    # pure-python replay
    groups: dict = {}
    for i, t, lang, src, _ in rows:
        groups.setdefault((src, lang), []).append((i, _quality_micro_py(t)))
    want = {}
    for g, docs in groups.items():
        if len(docs) < 2:
            continue
        best = max(docs, key=lambda d: (d[1], -d[0]))
        worst = min(docs, key=lambda d: (d[1], d[0]))
        if best[1] - worst[1] > 0:
            want[g] = (best[0], worst[0], best[1] - worst[1])
    assert got == want


@pytest.mark.parametrize("seed", [9, 33])
def test_dialogue_turns_matches_reference(spark, seed):
    from samza_spark.pipeline.events import dialogue_turns

    rng = random.Random(seed)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for eid in range(80):
        u = rng.randrange(5)
        # jumps > 30 min sometimes -> session breaks
        minute = rng.randrange(0, 600)
        et = rng.choice(["view", "click", "error", "purchase", "signup"])
        rows.append((eid, t0 + dt.timedelta(minutes=minute), u, et, 0.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["n_turns"], r["first_role"], r["last_role"],
        )
        for r in dialogue_turns(df).collect()
    }
    # python replay: sessionize (30-min gap, (ts, event_id) order), roles,
    # collapse runs
    per_user: dict = {}
    for eid, ts, u, et, _, _ in rows:
        per_user.setdefault(u, []).append((ts, eid, et))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        sid, prev_ts = 0, None
        sessions: dict = {}
        for ts, eid, et in evs:
            if prev_ts is None or (ts - prev_ts) > dt.timedelta(minutes=30):
                sid += 1
            prev_ts = ts
            role = "user" if et in ("view", "click") else "assistant"
            sessions.setdefault(sid, []).append(role)
        for sid, roles in sessions.items():
            turns = 1 + sum(
                1 for a, b in zip(roles, roles[1:]) if a != b
            )
            want[(u, sid)] = (len(roles), turns, roles[0], roles[-1])
    assert got == want


@pytest.mark.parametrize("seed", [4, 19])
def test_packing_matches_reference(spark, seed):
    from samza_spark.pipeline.packing import assemble_sequences

    rng = random.Random(seed)
    rows = [(i, rng.randrange(5, 50)) for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    budget, shards = 80, 4
    got = {
        (r["shard"], r["bin"]): (r["doc_ids"], r["seg_offsets"], r["total_cost"])
        for r in assemble_sequences(
            df, "n_tok", budget=budget, n_shards=shards
        ).collect()
    }
    # python replay with the same md5 shard hash
    import hashlib

    def shard_of(i):
        return int(hashlib.md5(f"pack0|{i}".encode()).hexdigest()[:8], 16) % shards

    per_shard: dict = {}
    for i, c in sorted(rows):
        per_shard.setdefault(shard_of(i), []).append((i, c))
    want = {}
    for sh, docs in per_shard.items():
        run = 0
        for i, c in docs:
            b = run // budget
            run += c
            key = (sh, b)
            ids, offs, tot = want.get(key, ([], [], 0))
            want[key] = (ids + [i], offs + [tot], tot + c)
    assert got == want
