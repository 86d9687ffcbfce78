"""Randomized equivalence tests for this session's foundational
operators: each Spark implementation is replayed against a straight-line
pure-Python reference on seeded random inputs — exploring shapes (ties,
clamps, empty contexts, singleton groups) the example tests fix by hand.

One shared SparkSession (conftest); inputs are seeded ``random`` draws,
NOT hypothesis, because each case pays a Spark job — a handful of seeds
per property is the right cost point.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from samza_spark.pipeline import events as pevents
from samza_spark.pipeline import stats as pstats


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_skyline_matches_bruteforce_random(spark, seed):
    rng = random.Random(seed)
    pts = [(i, rng.randrange(12), rng.randrange(12)) for i in range(80)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {r["id"] for r in pstats.skyline_2d(df, "x", "y", "id").collect()}
    want = {
        i
        for i, x, y in pts
        if not any(
            x2 >= x and y2 >= y and (x2 > x or y2 > y) for _, x2, y2 in pts
        )
    }
    assert got == want


@pytest.mark.parametrize("seed", [3, 11])
def test_weighted_median_matches_reference(spark, seed):
    rng = random.Random(seed)
    rows = [
        (g, i, rng.randrange(-50, 50), rng.randrange(1, 9))
        for g in "abc"
        for i in range(rng.randrange(1, 30))
    ]
    df = spark.createDataFrame(rows, "g string, i long, v long, wt long")
    got = {
        r["g"]: r["wmedian"]
        for r in pstats.weighted_median(df, "g", "v", "wt", "i").collect()
    }
    by_g = {}
    for g, i, v, wt in rows:
        by_g.setdefault(g, []).append((v, i, wt))
    for g, vals in by_g.items():
        vals.sort()
        tot = sum(w for _, _, w in vals)
        acc = 0
        for v, _, w in vals:
            acc += w
            if 2 * acc >= tot:
                assert got[g] == v
                break


@pytest.mark.parametrize("seed", [5, 19])
def test_running_balance_matches_reference(spark, seed):
    import datetime as dt

    rng = random.Random(seed)
    rows = []
    eid = 0
    for u in range(4):
        for i in range(rng.randrange(3, 25)):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, 1, i // 60, i % 60), u,
                 rng.randrange(-20, 15))
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, d long"
    )
    got = {
        r["user_id"]: (r["final_balance"], r["n_clamps"])
        for r in pevents.running_balance(df, "d").collect()
    }
    by_u = {}
    for eid, ts, u, d in rows:
        by_u.setdefault(u, []).append((ts, eid, d))
    for u, evs in by_u.items():
        evs.sort()
        bal, clamps = 0, 0
        for _, _, d in evs:
            nxt = bal + d
            if nxt < 0:
                clamps += 1
                bal = 0
            else:
                bal = nxt
        assert got[u] == (bal, clamps)


@pytest.mark.parametrize("seed", [2, 13])
def test_rolling_active_users_matches_reference(spark, seed):
    import datetime as dt

    rng = random.Random(seed)
    rows = []
    eid = 0
    for u in range(8):
        for _ in range(rng.randrange(1, 12)):
            eid += 1
            rows.append((eid, dt.datetime(2024, 2, 1 + rng.randrange(14)), u))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    n = 4
    got = {
        r["window_end_s"]: r["active_users"]
        for r in pevents.rolling_active_users(df, window_days=n).collect()
    }
    days = {
        (u, int(ts.replace(tzinfo=dt.timezone.utc).timestamp()) // 86400 * 86400)
        for _, ts, u in rows
    }
    hi = max(d for _, d in days)
    want = {}
    for w in sorted({d for _, d in days} | {d + k * 86400 for _, d in days for k in range(n)}):
        if w > hi:
            continue
        users = {u for u, d in days if 0 <= (w - d) // 86400 < n and w >= d}
        if users:
            want[w] = len(users)
    assert got == want


@pytest.mark.parametrize("seed", [4, 23])
def test_interval_audit_matches_reference(spark, seed):
    import datetime as dt

    rng = random.Random(seed)
    rows = []
    eid = 0
    for u in range(3):
        t = 0
        for _ in range(rng.randrange(2, 12)):
            eid += 1
            start = t + rng.randrange(-5, 30)
            end = start + rng.randrange(1, 40)
            rows.append(
                (
                    u,
                    dt.datetime(2024, 3, 1) + dt.timedelta(seconds=start),
                    dt.datetime(2024, 3, 1) + dt.timedelta(seconds=end),
                    eid,
                )
            )
            t = end
    df = spark.createDataFrame(
        rows, "user_id long, valid_from timestamp, valid_to timestamp, event_id long"
    )
    got = sorted(
        (r["user_id"], r["kind"], r["discrepancy_us"])
        for r in pevents.interval_audit(df, tiebreak_col="event_id").collect()
    )
    want = []
    by_u = {}
    for u, vf, vt, eid in rows:
        by_u.setdefault(u, []).append((vf, vt, eid))
    for u, ivs in by_u.items():
        ivs.sort()
        for (vf, vt, _), (nf, _, _) in zip(ivs, ivs[1:]):
            delta = int((nf - vt).total_seconds() * 1e6)
            if delta < 0:
                want.append((u, "overlap", abs(delta)))
            elif delta > 0:
                want.append((u, "gap", delta))
    assert got == sorted(want)
