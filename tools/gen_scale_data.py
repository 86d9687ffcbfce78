"""Generate scale-up copies of the four tables the flagship scaling ops
read (documents, events, embeddings, customer) at arbitrary sf, under
``scaledata/sf{X}/`` INSIDE the repo — /root/testdata is read-only and
stops at sf0.1, but the 100x claim needs a measured slope (VERDICT r9
next #5).

The generator reproduces the measured distributional signature of the
driver's sf0.01/sf0.1 tables so pair densities and skew scale the way
the real corpus would (measured 2026-08-16 against /root/testdata):

* documents: n = 50_000*sf. text = 10..100 uniform tokens from the same
  30-word vocabulary; lang {en .41, de/es/fr/zh ~.1475}; source uniform
  over src0..src19; with p=0.05 a doc is a NEAR-DUP — a copy of a random
  earlier doc with " dup" appended (measured: 250/5000 docs end in
  " dup", 243 match an original exactly sans marker).
* events: n = 1_000_000*sf over a fixed 30-day window, ts sorted
  (event_id = rank), user_id uniform over 15_000*sf users, event_type
  uniform over 5, value ~ Exp(mean 50) rounded to cents (measured mean
  49.9, max 560 at 100k ~ 50*ln(n)), props = '{"k": 0..99}'.
* embeddings: n = 20_000*sf unit-normalized iid N(0,1) 64-dim vectors
  (measured within-label cos == cross-label cos == 0 +- 1/sqrt(64): the
  labels are independent of the vectors), label uniform 0..9.
* customer: n = 150_000*sf, TPC-H-ish (acctbal uniform -999.99..9999.99,
  nationkey 0..24, 5 market segments) — dbscan derives its coordinates
  from c_custkey hashes, so cardinality is the only thing that matters.

Deterministic: one numpy PCG64 stream seeded per (table, sf).

``--vocab zipf:N`` (VERDICT r10 next #6) swaps the driver-matching
30-word vocabulary for an N-word Zipfian one (rank-frequency ∝
1/rank^1.07, the classic natural-text exponent): the 30-word corpus is
faithful to the driver tables but makes most doc pairs GENUINELY
near-duplicate at sf≥0.5 (uncapped PPJoin goes Θ(n²) and one prefix
bucket holds ~40% of docs — a property of the generator, not the
algorithm), so the realistic-vocabulary mode is what the 100× scaling
evidence should be read on. Output lands in ``scaledata/sf{X}-zipfN/``
so both corpora can coexist; only documents changes — the other tables
are vocabulary-free.

Usage: python tools/gen_scale_data.py 0.5 1.0
       python tools/gen_scale_data.py --vocab zipf:50000 0.5 1.0
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small "
    "join filter big group hash customer sort order slow line part "
    "fast the row agg key query a scan batch"
).split()
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
EPOCH_2024_01_01_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in us
WINDOW_US = 30 * 86_400_000_000


def _seed(table: str, sf: float) -> np.random.Generator:
    # hashlib, not hash(): builtin str hashing is salted per process
    # (PYTHONHASHSEED), which would silently break reproducibility
    import hashlib

    h = hashlib.sha256(f"{table}|{sf:.6f}".encode()).digest()
    return np.random.default_rng(int.from_bytes(h[:8], "big"))


def gen_documents(sf: float, out: str, zipf_vocab: int | None = None) -> int:
    n = int(50_000 * sf)
    rng = _seed(
        "documents" if zipf_vocab is None else f"documents-zipf{zipf_vocab}",
        sf,
    )
    lens = rng.integers(10, 101, size=n)
    texts: list[str] = []
    dup_flags = rng.random(n) < 0.05
    if zipf_vocab is None:
        # the driver-matching 30-word mode, per-doc draws UNCHANGED so
        # the default corpus stays byte-reproducible round-over-round
        vocab = np.array(VOCAB)
        for i in range(n):
            if dup_flags[i] and texts:
                texts.append(
                    texts[int(rng.integers(0, len(texts)))] + " dup"
                )
            else:
                texts.append(
                    " ".join(vocab[rng.integers(0, len(vocab), lens[i])])
                )
    else:
        vocab = np.array([f"w{i:06d}" for i in range(zipf_vocab)])
        probs = 1.0 / np.arange(1, zipf_vocab + 1) ** 1.07
        probs /= probs.sum()
        # one bulk draw for every token slot (rng.choice with a 50k-entry
        # p vector is ~100x faster batched than per-document; dup docs
        # skip their slots, which only advances the stream)
        draws = rng.choice(len(vocab), size=int(lens.sum()), p=probs)
        pos = 0
        for i in range(n):
            take = int(lens[i])
            if dup_flags[i] and texts:
                texts.append(
                    texts[int(rng.integers(0, len(texts)))] + " dup"
                )
            else:
                texts.append(" ".join(vocab[draws[pos : pos + take]]))
            pos += take
    langs = np.array(LANGS)[rng.choice(len(LANGS), size=n, p=LANG_P)]
    sources = np.array([f"src{i}" for i in range(20)])[
        rng.integers(0, 20, size=n)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(langs),
            "source": pa.array(sources),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    pq.write_table(tbl, out)
    return n


def gen_events(sf: float, out: str) -> int:
    n = int(1_000_000 * sf)
    rng = _seed("events", sf)
    ts_us = np.sort(
        rng.integers(0, WINDOW_US, size=n) + EPOCH_2024_01_01_US
    ).astype("datetime64[us]")
    types = np.array(["click", "view", "purchase", "signup", "error"])[
        rng.integers(0, 5, size=n)
    ]
    value = np.round(rng.exponential(50.0, size=n), 2)
    props = np.array([f'{{"k": {k}}}' for k in range(100)])[
        rng.integers(0, 100, size=n)
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts_us),
            "user_id": pa.array(
                rng.integers(0, max(int(15_000 * sf), 1), size=n).astype(
                    np.int64
                )
            ),
            "event_type": pa.array(types),
            "value": pa.array(value),
            "props": pa.array(props),
        }
    )
    pq.write_table(tbl, out)
    return n


def gen_embeddings(sf: float, out: str) -> int:
    n = int(20_000 * sf)
    rng = _seed("embeddings", sf)
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=n).astype(np.int32)
            ),
        }
    )
    pq.write_table(tbl, out)
    return n


def gen_customer(sf: float, out: str) -> int:
    n = int(150_000 * sf)
    rng = _seed("customer", sf)
    tbl = pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
            "c_nationkey": pa.array(
                rng.integers(0, 25, size=n).astype(np.int32)
            ),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, size=n), 2)
            ),
            "c_mktsegment": pa.array(
                np.array(SEGMENTS)[rng.integers(0, 5, size=n)]
            ),
        }
    )
    pq.write_table(tbl, out)
    return n


def main() -> int:
    args = sys.argv[1:]
    zipf_vocab: int | None = None
    if "--vocab" in args:
        i = args.index("--vocab")
        spec = args[i + 1]
        args = args[:i] + args[i + 2 :]
        if not spec.startswith("zipf:"):
            print(f"ERROR unknown vocab mode {spec!r} (want zipf:N)",
                  file=sys.stderr)
            return 2
        zipf_vocab = int(spec.split(":", 1)[1])
    sfs = [float(a) for a in args] or [0.5, 1.0]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for sf in sfs:
        suffix = "" if zipf_vocab is None else f"-zipf{zipf_vocab}"
        d = os.path.join(repo, "scaledata", f"sf{sf:g}{suffix}")
        os.makedirs(d, exist_ok=True)
        counts = {
            "documents": gen_documents(
                sf, os.path.join(d, "documents.parquet"), zipf_vocab
            ),
            "events": gen_events(sf, os.path.join(d, "events.parquet")),
            "embeddings": gen_embeddings(
                sf, os.path.join(d, "embeddings.parquet")
            ),
            "customer": gen_customer(sf, os.path.join(d, "customer.parquet")),
        }
        print(json.dumps({"sf": sf, "dir": d, "vocab": zipf_vocab,
                          "rows": counts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
