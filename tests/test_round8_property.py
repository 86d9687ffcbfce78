"""Randomized equivalence tests for round-8 operators: Spark vs
straight-line pure-Python references on seeded random inputs (the
round5c/6 property pattern — seeded ``random``, one Spark job per
operator, many cases packed into that one job)."""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import Row, functions as F

SEED = 2024_08


def _md5_int(s: str, width: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:width], 16)


# -- isotonic vs PAV pooling reference ----------------------------------------


def _pav(pairs, scale=1_000_000):
    pools = []
    for n, k in pairs:
        pools.append([n, k, 1])
        while (
            len(pools) > 1
            and pools[-2][1] * pools[-1][0] > pools[-1][1] * pools[-2][0]
        ):
            n2, k2, c2 = pools.pop()
            pools[-1][0] += n2
            pools[-1][1] += k2
            pools[-1][2] += c2
    out = []
    for n, k, c in pools:
        out += [k * scale // n] * c
    return out


def test_isotonic_matches_pav_random(spark):
    from samza_spark.pipeline.stats import isotonic_calibration

    rng = random.Random(SEED)
    for case in range(5):
        bins = [
            (rng.randint(1, 30), 0) for _ in range(rng.randint(2, 12))
        ]
        bins = [(n, rng.randint(0, n)) for n, _ in bins]
        df = spark.createDataFrame(
            [Row(bin=i, n=n, k=k) for i, (n, k) in enumerate(bins)]
        )
        got = [
            r.iso_micro
            for r in sorted(
                isotonic_calibration(df).collect(), key=lambda r: r.bin
            )
        ]
        assert got == _pav(bins), (case, bins)
        assert got == sorted(got)


# -- feature hashing vs python reference --------------------------------------


def test_feature_hashing_matches_python(spark):
    from samza_spark.pipeline.text import feature_hashing

    rng = random.Random(SEED + 1)
    vocab = ["cat", "dog", "fish", "a1", "b2", "zz9"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(40)
    ]
    out = feature_hashing(
        spark.createDataFrame(docs, "doc_id long, text string"),
        n_buckets=16,
        salt="pz",
    ).collect()
    got = {(r.doc_id, r.bucket): r.weight for r in out}
    exp: dict = {}
    for i, text in docs:
        for tok in [t for t in text.lower().split() if t]:
            h = hashlib.md5(f"pz|{tok}".encode()).hexdigest()
            b = int(h[:8], 16) % 16
            s = 1 if int(h[8], 16) % 2 == 0 else -1
            exp[(i, b)] = exp.get((i, b), 0) + s
    assert got == {k: v for k, v in exp.items()}


# -- target encoding vs python reference --------------------------------------


def test_target_encoding_matches_python(spark):
    from samza_spark.pipeline.stats import oof_target_encoding

    rng = random.Random(SEED + 2)
    rows = [
        (i, rng.choice("abc"), rng.randint(0, 1)) for i in range(60)
    ]
    out = oof_target_encoding(
        spark.createDataFrame(rows, "id long, cat string, t long"),
        category_col="cat",
        target_col="t",
        id_col="id",
        n_folds=4,
        salt="pe",
    ).collect()

    def fold(i):
        return _md5_int(f"pe|{i}", 8) % 4

    g_by_f: dict = {}
    c_by_f: dict = {}
    for i, c, t in rows:
        f = fold(i)
        c_by_f.setdefault((c, f), [0, 0])
        c_by_f[(c, f)][0] += t
        c_by_f[(c, f)][1] += 1
        g_by_f.setdefault(f, [0, 0])
        g_by_f[f][0] += t
        g_by_f[f][1] += 1
    c_tot = {}
    for (c, f), (s, n) in c_by_f.items():
        c_tot.setdefault(c, [0, 0])
        c_tot[c][0] += s
        c_tot[c][1] += n
    g_tot = [sum(v[0] for v in g_by_f.values()), sum(v[1] for v in g_by_f.values())]
    for r in out:
        f = fold(r.id)
        cs, cn = c_tot[r.cat]
        fs, fn = c_by_f[(r.cat, f)]
        if cn - fn > 0:
            assert r.enc == (cs - fs) * 1_000_000 // (cn - fn), r
        else:
            assert (
                r.enc
                == (g_tot[0] - fs) * 1_000_000 // (g_tot[1] - fn)
            ), r


# -- decision stump vs brute force ---------------------------------------------


def test_decision_stump_matches_bruteforce(spark):
    from samza_spark.pipeline.stats import decision_stump

    rng = random.Random(SEED + 3)
    rows = [(rng.randint(0, 15), rng.randint(0, 1)) for _ in range(120)]
    out = decision_stump(
        spark.createDataFrame(rows, "x long, y long"), "x", "y"
    ).collect()
    xs = sorted({x for x, _ in rows})
    n_tot = len(rows)
    exp = {}
    for t in xs:
        nl = sum(1 for x, _ in rows if x <= t)
        if nl == n_tot:
            continue
        kl = sum(y for x, y in rows if x <= t)
        nr, kr = n_tot - nl, sum(y for _, y in rows) - kl
        exp[t] = (
            2 * kl * (nl - kl) * 1_000_000 // nl
            + 2 * kr * (nr - kr) * 1_000_000 // nr
        )
    got = {r.t: r.split_score_micro for r in out}
    assert got == exp
    best = min(out, key=lambda r: (r.split_score_micro, r.t))
    assert best.rank == 1


# -- IPS vs python reference ----------------------------------------------------


def test_ips_matches_python(spark):
    from samza_spark.pipeline.stats import ips_estimate

    rng = random.Random(SEED + 4)
    rows = [
        (rng.randint(0, 3), rng.choice("pq"), rng.randint(0, 1_000) * 1000)
        for _ in range(150)
    ]
    out = ips_estimate(
        spark.createDataFrame(rows, "ctx long, a string, r long"),
        "ctx",
        "a",
        "r",
        clip_ppm=5_000_000,
    ).collect()
    n_ctx: dict = {}
    n_ctx_a: dict = {}
    for c, a, _ in rows:
        n_ctx[c] = n_ctx.get(c, 0) + 1
        n_ctx_a[(c, a)] = n_ctx_a.get((c, a), 0) + 1
    k = len({a for _, a, _ in rows})
    agg: dict = {}
    for c, a, r in rows:
        mu = n_ctx_a[(c, a)] * 1_000_000 // n_ctx[c]
        w = min((1_000_000 // k) * 1_000_000 // mu, 5_000_000)
        st = agg.setdefault(a, [0, 0, 0])
        st[0] += 1
        st[1] += w
        st[2] += r * w // 1_000_000
    n_total = len(rows)
    for row in out:
        n, sw, wr = agg[row.a]
        assert (row.n, row.sum_w_ppm, row.wr_micro) == (n, sw, wr)
        assert row.v_ips_micro == wr // n_total
        assert row.v_snips_micro == (wr * 1_000_000 // sw if sw else 0)


# -- xi correlation vs python reference -----------------------------------------


def test_xi_matches_python(spark):
    from samza_spark.pipeline.stats import xi_correlation

    rng = random.Random(SEED + 5)
    rows = [(i, rng.randint(0, 10**6), rng.randint(0, 10**6)) for i in range(300)]
    r = xi_correlation(
        spark.createDataFrame(rows, "id long, x long, y long"),
        "x",
        "y",
        tiebreak_col="id",
    ).collect()[0]
    order_x = sorted(rows, key=lambda t: (t[1], t[0]))
    rank_y = {
        t[0]: i + 1
        for i, t in enumerate(sorted(rows, key=lambda t: (t[2], t[0])))
    }
    ry = [rank_y[t[0]] for t in order_x]
    s = sum(abs(b - a) for a, b in zip(ry, ry[1:]))
    n = len(rows)
    assert (r.n, r.jump_sum) == (n, s)
    assert r.xi_micro == ((n * n - 1) - 3 * s) * 1_000_000 // (n * n - 1)


# -- watermark plan vs python reference ------------------------------------------


def test_watermark_plan_matches_python(spark):
    import datetime as dt

    from samza_spark.pipeline.events import watermark_plan

    rng = random.Random(SEED + 6)
    base = dt.datetime(2024, 6, 1)
    rows = [
        Row(
            k=rng.choice("uv"),
            event_id=i,
            ts=base + dt.timedelta(seconds=rng.randint(0, 5000)),
        )
        for i in range(200)
    ]
    delays = (0, 100_000_000, 1_000_000_000)
    out = {
        (r.key, r.delay_us): r.n_late
        for r in watermark_plan(
            spark.createDataFrame(rows),
            key_col="k",
            candidate_delays_us=delays,
        ).collect()
    }
    by_key: dict = {}
    for r in sorted(rows, key=lambda r: r.event_id):
        by_key.setdefault(r.k, []).append(int(r.ts.timestamp() * 1_000_000))
    for key, seq in by_key.items():
        hi = -(10**18)
        lates = []
        for ts in seq:
            hi = max(hi, ts)
            lates.append(hi - ts)
        for d in delays:
            assert out[(key, d)] == sum(1 for v in lates if v > d)


# -- attribution credit conservation ----------------------------------------------


def test_position_attribution_credit_sums_to_unit(spark, sf_dir):
    from samza_spark.queries import q_position_attribution

    out = q_position_attribution(spark, sf_dir)
    sums = (
        out.groupBy("key", "conv_id")
        .agg(F.sum("credit_ppm").alias("s"))
        .select("s")
        .distinct()
        .collect()
    )
    assert [r.s for r in sums] == [1_000_000]


# -- borda vs python reference ------------------------------------------------------


def test_borda_matches_python(spark):
    from samza_spark.pipeline.preference import borda_count

    rng = random.Random(SEED + 7)
    rows = []
    for voter in range(12):
        cands = rng.sample("abcde", rng.randint(2, 5))
        for c in cands:
            rows.append((voter, c, rng.randint(0, 50)))
    out = {
        r.candidate: r
        for r in borda_count(
            spark.createDataFrame(rows, "voter long, cand string, s long"),
            "voter",
            "cand",
            "s",
        ).collect()
    }
    k = len({c for _, c, _ in rows})
    pts: dict = {}
    votes: dict = {}
    ranks: dict = {}
    by_voter: dict = {}
    for v, c, s in rows:
        by_voter.setdefault(v, []).append((c, s))
    for v, cs in by_voter.items():
        for rank, (c, _) in enumerate(
            sorted(cs, key=lambda t: (-t[1], t[0])), start=1
        ):
            pts[c] = pts.get(c, 0) + (k - rank)
            votes[c] = votes.get(c, 0) + 1
            ranks[c] = ranks.get(c, 0) + rank
    for c in pts:
        assert out[c].borda_points == pts[c]
        assert out[c].n_votes == votes[c]
        assert out[c].mean_rank_micro == ranks[c] * 1_000_000 // votes[c]


# -- range partition plan vs python reference -----------------------------------------


def test_range_partition_plan_matches_python(spark):
    from samza_spark.pipeline.sampling import range_partition_plan

    rng = random.Random(SEED + 8)
    vals = [rng.randint(0, 40) for _ in range(500)]
    nb = 6
    out = {
        r.bucket: r
        for r in range_partition_plan(
            spark.createDataFrame([(v,) for v in vals], "v long"), "v", nb
        ).collect()
    }
    s = sorted(vals)
    n = len(s)
    his = {}
    for i, v in enumerate(s, start=1):
        b = (i * nb - 1) // n + 1
        his[b] = v  # max per bucket as we sweep ascending
    prev = None
    for b in range(1, nb + 1):
        hi = his[b]
        lo = prev
        cnt = sum(
            1 for v in vals if v <= hi and (lo is None or v > lo)
        )
        assert out[b].hi == hi
        assert out[b].n_rows == cnt, (b, hi, lo)
        prev = hi
    assert sum(r.n_rows for r in out.values()) == n
