"""Remote-table Python DataSource: key-equality pushdown to point lookups
(SamzaSqlFilterRemoteJoinRule analog via Catalyst + Spark 4.1 pushFilters)."""

import pytest

from samza_spark.sources.remote_datasource import (
    DictService,
    LookupOnlyService,
    load_remote_table,
)

SCHEMA = "id int, name string"


@pytest.fixture()
def svc():
    return DictService({i: {"name": f"n{i}"} for i in range(100)}, key="id")


def test_equality_pushdown_point_lookup(spark, svc):
    df = load_remote_table(spark, LookupOnlyService(svc), "id", SCHEMA)
    # scan() raises on this service: succeeding proves the filter reached
    # the source as a get()
    assert [tuple(r) for r in df.filter(df.id == 7).collect()] == [(7, "n7")]


def test_in_pushdown_with_residual_filter(spark, svc):
    df = load_remote_table(spark, LookupOnlyService(svc), "id", SCHEMA)
    rows = df.filter((df.id.isin(3, 5)) & (df.name != "n3")).collect()
    assert [tuple(r) for r in rows] == [(5, "n5")]


def test_full_scan_when_scannable(spark, svc):
    assert load_remote_table(spark, svc, "id", SCHEMA).count() == 100


def test_lookup_only_blocks_full_scan(spark, svc):
    df = load_remote_table(spark, LookupOnlyService(svc), "id", SCHEMA)
    with pytest.raises(Exception, match="lookup-only"):
        df.count()


def test_non_key_filter_not_pushed(spark, svc):
    df = load_remote_table(spark, svc, "id", SCHEMA)
    rows = df.filter(df.name == "n42").collect()
    assert [tuple(r) for r in rows] == [(42, "n42")]
