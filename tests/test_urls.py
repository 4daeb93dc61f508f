"""URL canonicalization edge cases (functions/urls.py): one SQL
expression, verified here on hand-written URLs through the Spark
renderer (the DuckDB renderer is verified by the oracle gate)."""

import pandas as pd

from geoio_jl_spark.functions import urls as U
from pyspark.sql import functions as F


def _canon(spark, url_list):
    df = spark.createDataFrame(pd.DataFrame({"url": url_list}))
    out = df.select(
        F.expr(U.canonical_url_sql("url", "spark")).alias("c"),
        F.expr(U.host_sql("url", "spark")).alias("h"))
    out = out.withColumn("d", F.expr(U.domain_sql("h", "spark")))
    return [(r["c"], r["h"], r["d"]) for r in out.collect()]


def test_canonicalization_rules(spark):
    got = _canon(spark, [
        "HTTPS://WWW.Site1.COM:443/Path2/?utm_source=x&id=2#frag",
        "https://www.site1.com/Path2?id=2",
        "http://sub.news.co.uk:80/a/b?utm_campaign=y",
        "https://plain.org/x",
    ])
    # case, port, www, trailing slash, utm and fragment all normalize:
    # the first two URLs collapse to the same canonical form
    assert got[0] == ("https://site1.com/Path2?id=2", "site1.com",
                      "site1.com")
    assert got[1][0] == got[0][0]
    # path case is preserved (URL paths are case-sensitive)
    assert "/Path2" in got[0][0]
    # .co.uk keeps three labels for the registered domain
    assert got[2] == ("http://sub.news.co.uk/a/b", "sub.news.co.uk",
                      "news.co.uk")
    assert got[3] == ("https://plain.org/x", "plain.org", "plain.org")


def test_non_default_port_kept(spark):
    """:443 is only a default for https, :80 only for http — crossed
    combinations are real ports and must survive canonicalization."""
    got = _canon(spark, ["http://a.com:443/x", "https://a.com:80/x",
                         "http://a.com:80/x", "https://a.com:443/x"])
    assert got[0] == ("http://a.com:443/x", "a.com:443", "a.com:443")
    assert got[1][0] == "https://a.com:80/x"
    assert got[2][0] == "http://a.com/x"
    assert got[3][0] == "https://a.com/x"


def test_only_utm_params_dropped_entirely(spark):
    got = _canon(spark, ["https://a.com/p?utm_source=x&utm_medium=y"])
    assert got[0][0] == "https://a.com/p"  # no dangling '?'


def test_root_path_and_no_query(spark):
    got = _canon(spark, ["https://a.com/", "https://a.com"])
    assert got[0][0] == "https://a.com" == got[1][0]


def test_canonicalization_idempotent_over_combinatorial_sweep(spark):
    """canon(canon(u)) == canon(u) over the full cross product of the
    messiness dimensions (case × www × port × trailing slash × utm mix ×
    fragment) — the property that makes canonical forms a join key."""
    schemes = ["https://", "HTTPS://", "http://"]
    hosts = ["www.Ex.com", "ex.com", "SUB.ex.CO.UK"]
    ports = ["", ":443", ":80"]
    paths = ["/a/b", "/a/b/", ""]
    queries = ["", "?id=1", "?utm_source=x&id=1", "?utm_a=1&utm_b=2"]
    frags = ["", "#top"]
    urls = [s + h + po + pa + q + f
            for s in schemes for h in hosts for po in ports
            for pa in paths for q in queries for f in frags]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    once = df.select(
        F.expr(U.canonical_url_sql("url", "spark")).alias("url"))
    twice = once.select(
        F.expr(U.canonical_url_sql("url", "spark")).alias("c2"))
    a = [r["url"] for r in once.collect()]
    b = [r["c2"] for r in twice.collect()]
    assert a == b
    # and the canonical form is scheme://host[:port][/path][?q] shaped
    import re
    for c in a:
        assert re.match(
            r"^https?://[a-z0-9.\-]+(:\d+)?(/[^?#]*)?(\?.+)?$", c), c
        assert "utm_" not in c and "#" not in c
        # default ports stripped only for their own scheme — a
        # non-default port (http + :443, https + :80) is data, kept
        if c.startswith("https://"):
            assert ":443" not in c, c
        if c.startswith("http://"):
            assert ":80" not in c, c
