"""Randomized equivalence tests for round-6 session-4 operators: Spark
vs straight-line pure-Python references on seeded random inputs (the
round5c_property pattern — seeded ``random``, not hypothesis, because
every case pays a Spark job)."""

from __future__ import annotations

import random

import pytest


@pytest.mark.parametrize("seed", [3, 41])
def test_interval_merge_matches_python_sweep(spark, seed):
    from samza_spark.pipeline.events import interval_merge

    rng = random.Random(seed)
    rows = []
    for k in range(4):
        for _ in range(rng.randrange(5, 25)):
            s = rng.randrange(0, 500)
            rows.append((k, s, s + rng.randrange(0, 80)))
    df = spark.createDataFrame(rows, "key long, start_us long, end_us long")
    got = {
        (r["key"], r["start_us"], r["end_us"], r["n_merged"])
        for r in interval_merge(df).collect()
    }

    expect = set()
    for k in {r[0] for r in rows}:
        ivs = sorted((s, e) for kk, s, e in rows if kk == k)
        cur_s, cur_e, n = ivs[0][0], ivs[0][1], 1
        for s, e in ivs[1:]:
            if s > cur_e:
                expect.add((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e, n = max(cur_e, e), n + 1
        expect.add((k, cur_s, cur_e, n))
    assert got == expect


@pytest.mark.parametrize("seed", [7, 29])
def test_symspell_matches_bruteforce_random_vocab(spark, seed):
    from samza_spark.pipeline.linkage import symspell_pairs

    rng = random.Random(seed)
    alphabet = "abc"
    words = list(
        {
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 6)))
            for _ in range(60)
        }
    )
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {(r["w1"], r["w2"]) for r in symspell_pairs(df).collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    sw = sorted(words)
    expect = {
        (a, b)
        for i, a in enumerate(sw)
        for b in sw[i + 1:]
        if lev(a, b) <= 1
    }
    assert got == expect


@pytest.mark.parametrize("seed", [11, 53])
def test_compaction_plan_conserves_and_caps(spark, seed):
    from samza_spark.pipeline.versioning import compaction_plan

    rng = random.Random(seed)
    rows = [
        (f"s{g}", f, rng.randrange(1, 300))
        for g in range(3)
        for f in range(rng.randrange(3, 30))
    ]
    df = spark.createDataFrame(rows, "source string, file_id long, bytes long")
    target = 500
    out = compaction_plan(df, target_bytes=target).collect()
    # conservation: every file lands in exactly one bin
    assert sum(r["n_files"] for r in out) == len(rows)
    assert sum(r["total_bytes"] for r in out) == sum(r[2] for r in rows)
    # first-byte rule: each bin's START offset is inside [bin*target,
    # (bin+1)*target); a bin overflows by at most one file's tail, and
    # bins within a source cover contiguous file ranges
    by_src = {}
    for r in sorted(out, key=lambda r: (r["source"], r["bin"])):
        by_src.setdefault(r["source"], []).append(r)
    for src, bins in by_src.items():
        for prev, nxt in zip(bins, bins[1:]):
            assert prev["last_file"] < nxt["first_file"]


@pytest.mark.parametrize("seed", [5, 17])
def test_kaplan_meier_matches_python(spark, seed):
    import datetime as dt

    from samza_spark.pipeline.events import kaplan_meier

    rng = random.Random(seed)
    rows = []
    for u in range(30):
        for _ in range(rng.randrange(1, 6)):
            rows.append(
                (u, dt.datetime(2024, 1, 1) + dt.timedelta(hours=rng.randrange(0, 500)))
            )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    gap, binsz = 24 * 3_600_000_000, 3_600_000_000
    got = {
        r["t_bin"]: (r["n_risk"], r["d_events"], r["c_censored"])
        for r in kaplan_meier(df, churn_gap_us=gap, bin_us=binsz).collect()
    }

    us = lambda t: int(t.timestamp() * 1_000_000)
    per_user = {}
    for u, t in rows:
        lo, hi = per_user.get(u, (t, t))
        per_user[u] = (min(lo, t), max(hi, t))
    obs = max(us(hi) for _, hi in per_user.values())
    labs = []
    for lo, hi in per_user.values():
        if us(hi) < obs - gap:
            labs.append(((us(hi) - us(lo)) // binsz, 1))
        else:
            labs.append(((obs - us(lo)) // binsz, 0))
    expect = {}
    for t, ev in labs:
        d, c = expect.get(t, (0, 0))
        expect[t] = (d + ev, c + (1 - ev))
    n_seen, exp_full = 0, {}
    for t in sorted(expect):
        d, c = expect[t]
        exp_full[t] = (len(per_user) - n_seen, d, c)
        n_seen += d + c
    assert got == exp_full
