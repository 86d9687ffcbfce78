"""URL canonicalization (pipeline.text.url_normalize): the crawl-dedup
key — every variant of the same page must normalize identically."""

from pyspark.sql import functions as F

from samza_spark.pipeline.text import url_normalize


def _norm(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r["n"] for r in df.select(url_normalize("u").alias("n")).collect()]


def test_variants_collapse_to_one_key(spark):
    variants = [
        "HTTP://WWW.Example.COM/a/b/?utm_source=x&id=2&utm_campaign=y",
        "http://example.com:80/a/b?id=2",
        "http://example.com/a/b/?id=2&gclid=zzz",
        "http://www.example.com/a/b?id=2#section-3",
    ]
    got = set(_norm(spark, variants))
    assert got == {"http://example.com/a/b?id=2"}


def test_param_order_sorted_and_tracking_stripped(spark):
    [n] = _norm(spark, ["https://s.example/p?b=2&a=1&fbclid=abc&ref=tw"])
    assert n == "https://s.example/p?a=1&b=2"


def test_root_path_and_empty_query(spark):
    assert _norm(
        spark,
        ["https://Example.com", "https://example.com/", "https://example.com/?utm_term=q"],
    ) == ["https://example.com/"] * 3


def test_non_default_port_and_case_preserving_path(spark):
    [n] = _norm(spark, ["http://Example.com:8080/A/B?x=1"])
    # non-default port survives in the host piece parse_url returns;
    # path case is content-significant and preserved
    assert n.endswith("/A/B?x=1")
    assert "8080" in n


def test_dedup_key_usage(spark):
    df = spark.createDataFrame(
        [
            (1, "http://www.a.example/x?utm_source=1"),
            (2, "HTTP://a.example/x"),
            (3, "http://a.example/y"),
        ],
        "id long, url string",
    )
    groups = (
        df.groupBy(url_normalize("url").alias("canon"))
        .count()
        .orderBy("canon")
        .collect()
    )
    assert [(r["canon"], r["count"]) for r in groups] == [
        ("http://a.example/x", 2),
        ("http://a.example/y", 1),
    ]
