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


def test_only_utm_params_dropped_entirely(spark):
    got = _canon(spark, ["https://a.com/p?utm_source=x&utm_medium=y"])
    assert got[0][0] == "https://a.com/p"  # no dangling '?'


def test_root_path_and_no_query(spark):
    got = _canon(spark, ["https://a.com/", "https://a.com"])
    assert got[0][0] == "https://a.com" == got[1][0]
