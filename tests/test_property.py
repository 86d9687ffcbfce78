"""Property-based tests (hypothesis) over the pure-Python layers: the
Avro binary/OCF codec, SimHash block partitioning, and UDF overload
dispatch. No SparkSession needed — these run in milliseconds and explore
input space the example-based tests can't."""

from __future__ import annotations

import datetime as dt
import io

from hypothesis import given, settings, strategies as st

from samza_spark.formats.avro_py import (
    _read_long,
    _write_long,
    read_ocf,
    write_ocf,
)
from samza_spark.functions.registry import UdfSignature
from samza_spark.pipeline.dedup import simhash_blocks

INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(INT64)
def test_zigzag_varint_round_trip(n):
    out = io.BytesIO()
    _write_long(out, n)
    assert _read_long(io.BytesIO(out.getvalue())) == n


RICH_SCHEMA = {
    "type": "record",
    "name": "P",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": ["null", "long"]}},
        {"name": "when", "type": {"type": "long", "logicalType": "timestamp-micros"}},
        {"name": "day", "type": {"type": "int", "logicalType": "date"}},
    ],
}

# doubles: avro encodes raw IEEE bits, so NaN round-trips too — compare via repr
_rows = st.lists(
    st.fixed_dictionaries(
        {
            "i": INT64,
            "s": st.one_of(st.none(), st.text(max_size=40)),
            "d": st.floats(allow_nan=False),
            "b": st.booleans(),
            "raw": st.binary(max_size=32),
            "xs": st.lists(INT64, max_size=8),
            "m": st.dictionaries(st.text(max_size=8), st.one_of(st.none(), INT64), max_size=4),
            "when": st.datetimes(
                min_value=dt.datetime(1900, 1, 1),
                max_value=dt.datetime(2200, 1, 1),
            ).map(lambda d: d.replace(tzinfo=dt.timezone.utc)),
            "day": st.dates(min_value=dt.date(1800, 1, 1), max_value=dt.date(2400, 1, 1)),
        }
    ),
    max_size=20,
)


@settings(max_examples=60, deadline=None)
@given(_rows, st.sampled_from(["null", "deflate"]), st.integers(min_value=1, max_value=7))
def test_ocf_round_trip_random_rows(rows, codec, block_rows):
    buf = io.BytesIO()
    write_ocf(buf, RICH_SCHEMA, rows, codec=codec, block_rows=block_rows)
    got = list(read_ocf(buf.getvalue()))
    assert len(got) == len(rows)
    for g, r in zip(got, rows):
        assert g["i"] == r["i"]
        assert g["s"] == r["s"]
        assert repr(g["d"]) == repr(float(r["d"]))
        assert g["b"] == r["b"]
        assert g["raw"] == r["raw"]
        assert g["xs"] == r["xs"]
        assert g["m"] == r["m"]
        # datetimes round-trip as UTC instants at micro precision
        assert g["when"] == r["when"]
        assert g["day"] == r["day"]


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=128), st.integers(min_value=0, max_value=16))
def test_simhash_blocks_always_disjoint_cover(bits, max_hamming):
    if max_hamming + 1 > bits:
        import pytest

        with pytest.raises(ValueError):
            simhash_blocks(bits, max_hamming)
        return
    blocks = simhash_blocks(bits, max_hamming)
    assert len(blocks) == max_hamming + 1
    covered = sorted(i for off, w in blocks for i in range(off, off + w))
    assert covered == list(range(bits))  # disjoint AND complete


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.integers(min_value=-(2**31), max_value=2**31 - 1),
            st.floats(allow_nan=False),
            st.text(max_size=10),
            st.booleans(),
        ),
        max_size=5,
    )
)
def test_udf_any_signature_matches_same_arity(args):
    sig = UdfSignature(fn=lambda *a: a, params=tuple("any" for _ in args))
    assert sig.matches(tuple(args))
    assert not sig.matches(tuple(args) + (1,))


def test_udf_typed_signature_null_matches_every_tag():
    for tag in ("int", "double", "string", "bool", "binary", "array", "map"):
        assert UdfSignature(fn=lambda x: x, params=(tag,)).matches((None,))


@given(st.integers(min_value=0, max_value=5), st.integers(min_value=0, max_value=8))
def test_udf_vararg_signature_arity(fixed, extra):
    sig = UdfSignature(fn=lambda *a: a, params=tuple("any" for _ in range(fixed)), varargs=True)
    assert sig.matches(tuple(range(fixed + extra)))
    if fixed:
        assert not sig.matches(tuple(range(fixed - 1)))


# ---------------------------------------------------------------------------
# BPE double-separator merge encoding (pipeline.bpe)
# ---------------------------------------------------------------------------

from samza_spark.pipeline.bpe import SEP


def _greedy_merge(syms, l, r):
    """Reference greedy left-to-right non-overlapping BPE merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


_SYM = st.text(alphabet="abc", min_size=1, max_size=3)


@given(
    syms=st.lists(_SYM, min_size=1, max_size=10),
    l=_SYM,
    r=_SYM,
)
def test_double_sep_replace_equals_greedy_merge(syms, l, r):
    # the exact string transformation Spark's replace() and DuckDB's
    # replace() both perform (str.replace shares their left-to-right
    # non-overlapping semantics)
    rep = SEP * 2 + (SEP * 2).join(syms) + SEP * 2
    merged = rep.replace(SEP + l + SEP + SEP + r + SEP, SEP + l + r + SEP)
    back = [s for s in merged.split(SEP * 2) if s]
    assert back == _greedy_merge(syms, l, r)


@given(
    syms=st.lists(_SYM, min_size=1, max_size=8),
    merges=st.lists(st.tuples(_SYM, _SYM), min_size=1, max_size=5),
)
def test_double_sep_merge_chain_equals_greedy_chain(syms, merges):
    rep = SEP * 2 + (SEP * 2).join(syms) + SEP * 2
    expect = list(syms)
    for l, r in merges:
        rep = rep.replace(SEP + l + SEP + SEP + r + SEP, SEP + l + r + SEP)
        expect = _greedy_merge(expect, l, r)
    assert [s for s in rep.split(SEP * 2) if s] == expect
    # concatenation is invariant under merging
    assert "".join(expect) == "".join(syms)


# ---------------------------------------------------------------------------
# prefix-filter theorem (pipeline/linkage.py relies on it for lossless
# candidate generation)
# ---------------------------------------------------------------------------

_ELEMS = st.lists(
    st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=12),
    min_size=2,
    max_size=10,
)


@given(_ELEMS, st.sampled_from([0.3, 0.5, 0.6, 0.8, 0.9]))
def test_prefix_filter_theorem(records, t):
    """Any pair with Jaccard >= t must share an element within BOTH
    records' (df ASC, elem ASC)-ordered prefixes of length
    |x| - ceil(t*|x|) + 1 — the property linkage.similarity_join's
    candidate join depends on for exact recall."""
    import math

    df = {}
    for r in records:
        for e in r:
            df[e] = df.get(e, 0) + 1
    prefixes = []
    for r in records:
        ordered = sorted(r, key=lambda e: (df[e], e))
        p = len(r) - math.ceil(t * len(r)) + 1
        prefixes.append(set(ordered[:p]))
    for i in range(len(records)):
        for j in range(i + 1, len(records)):
            a, b = records[i], records[j]
            jac = len(a & b) / len(a | b)
            if jac >= t:
                assert prefixes[i] & prefixes[j], (
                    f"pair ({i},{j}) J={jac} missed by prefix filter"
                )


# ---------------------------------------------------------------------------
# round-5 pure-Python invariants (no SparkSession)
# ---------------------------------------------------------------------------


def _morton_py(a, b, bits=16):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def _demorton_py(z, bits=16):
    a = b = 0
    for i in range(bits):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


@given(
    st.integers(min_value=0, max_value=65535),
    st.integers(min_value=0, max_value=65535),
)
def test_morton_interleave_is_bijective(a, b):
    z = _morton_py(a, b)
    assert 0 <= z < 1 << 32
    assert _demorton_py(z) == (a, b)


@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 100)), min_size=1, max_size=60
    )
)
def test_merge_upsert_last_wins_model(changes):
    """Pure-Python model of merge_upsert's last-wins rule: applying ops
    sequentially == the windowed last-per-key resolution."""
    seq_changes = [
        (k, v, "D" if v % 7 == 0 else "U", i) for i, (k, v) in enumerate(changes)
    ]
    state = {}
    for k, v, op, _i in seq_changes:
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    last = {}
    for k, v, op, i in seq_changes:
        if k not in last or i > last[k][2]:
            last[k] = (v, op, i)
    windowed = {k: v for k, (v, op, _i) in last.items() if op != "D"}
    assert windowed == state


@given(st.lists(st.integers(-(10**6), 10**6), min_size=1, max_size=50))
def test_doubled_median_trick_is_exact(xs):
    """med_x2/mad_x4 integers from group_robust_stats' middle-rank rule
    equal 2*median and 4*MAD for any int list."""
    import statistics

    s = sorted(xs)
    n = len(s)
    lo, hi = s[(n + 1) // 2 - 1], s[(n + 2) // 2 - 1]
    med_x2 = lo + hi
    assert med_x2 == int(2 * statistics.median(xs))
    devs = sorted(abs(2 * x - med_x2) for x in xs)
    dlo, dhi = devs[(n + 1) // 2 - 1], devs[(n + 2) // 2 - 1]
    assert dlo + dhi == int(4 * statistics.median([abs(x - statistics.median(xs)) for x in xs]))
