"""Registry-wide oracle output-typing lint (VERDICT r7 next #1 and #5).

Seven rounds of driver-red mystery rows were all one bug class: DuckDB
``sum(BIGINT)`` returns HUGEINT, which ``fetchdf()`` (a pandas/Arrow
driver harness) materializes as float64 while ``fetchall()`` (the local
gate) yields exact Python ints — a hash divergence with rows+schema
green. This test binds every registered oracle (no execution, so the
full 300+ registry lints in seconds) and forbids that class forever,
plus flags un-audited transcendental DOUBLE outputs (the other measured
cross-library 1-ulp hash risk, NOTES.md r7 mutual_information).
"""

from __future__ import annotations

import duckdb
import pytest

from tools.gen_oracle_types import (
    FORBIDDEN_TYPES,
    TABLES,
    TRANSCENDENTAL_WAIVERS,
    classify,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_rows():
    from samza_spark.queries import ORACLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    rows = classify(con, ORACLES)
    con.close()
    return rows


def test_no_hugeint_output_columns(oracle_rows):
    """No oracle may emit HUGEINT/UHUGEINT: fetchdf() turns INT128 into
    float64 and the driver hash diverges with rows+schema green."""
    bad = [
        (name, col, typ)
        for name, col, typ, _cls in oracle_rows
        if typ in FORBIDDEN_TYPES
    ]
    assert not bad, (
        f"HUGEINT output columns ship a latent driver hash-red: {bad}; "
        f"wrap in CAST(... AS BIGINT)"
    )


def test_no_unclassified_output_types(oracle_rows):
    """Every output column must land in a known stability class —
    catches future DuckDB type drift (new sum() result types, etc.)."""
    other = [r for r in oracle_rows if r[3].startswith("OTHER")]
    assert not other, f"unclassified oracle output types: {other}"


def test_transcendental_doubles_are_audited(oracle_rows):
    """A DOUBLE produced by ln/exp/pow carries measured 1-ulp JVM-vs-libm
    hash risk. Each such oracle must be on the audited waiver list (or be
    rewritten to integer-ppm units)."""
    unaudited = sorted(
        {
            name
            for name, _col, _typ, cls in oracle_rows
            if cls == "transcendental" and name not in TRANSCENDENTAL_WAIVERS
        }
    )
    assert not unaudited, (
        f"transcendental DOUBLE outputs without an audit waiver: {unaudited}; "
        f"quantize to integer units or add to TRANSCENDENTAL_WAIVERS with "
        f"a stability note"
    )


def test_waiver_list_is_not_stale(oracle_rows):
    """Waivers must correspond to oracles that still exist and still emit
    transcendental DOUBLEs — keeps the audit list honest."""
    live = {name for name, _c, _t, cls in oracle_rows if cls == "transcendental"}
    stale = sorted(TRANSCENDENTAL_WAIVERS - live)
    assert not stale, f"stale transcendental waivers: {stale}"
