"""canonicalize_urls: per-rule pins + idempotence (the DuckDB mirror is
hash-checked by the url_canonical_groups contract query)."""

from pyspark.sql import functions as F

from posextract_spark.operators.weblinks import canonicalize_urls

CASES = [
    # (raw, expected canonical or None)
    ("https://Host.TEST/Page/1", "https://host.test/Page/1"),  # host lower, path case kept
    ("  http://host.test:80/a/ ", "http://host.test/a"),  # trim, :80, trailing /
    ("https://host.test:443/a?utm_source=x&b=2&a=1#frag", "https://host.test/a?a=1&b=2"),
    ("https://host.test:8443/deep/5?ref=synth#frag", "https://host.test:8443/deep/5"),
    ("http://host.test", "http://host.test/"),  # empty path -> /
    ("https://host.test/?fbclid=abc", "https://host.test/"),
    ("HTTPS://UPPER.test/KeepCase/Path?Z=1&a=2", "https://upper.test/KeepCase/Path?Z=1&a=2"),
    ("http://host.test/a//", "http://host.test/a"),  # ALL trailing slashes stripped
    ("https://host.test/p?b=&a=1&&gclid=g", "https://host.test/p?a=1&b="),
    ("https://h.test/x?utm_campaign&c=3", "https://h.test/x?c=3"),  # valueless utm_*
    ("http://h.test:443/x", "http://h.test:443/x"),  # :443 NOT default for http
    ("mailto:someone@host.test", None),
    ("/relative/9", None),
    ("javascript:void(0)", None),
    ("//host.test/protocol-relative", None),
    ("ftp://host.test/file", None),
]


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "url_id long, url string"
    )
    return {r.url_id: r.canonical_url for r in canonicalize_urls(df).collect()}


def test_each_rule(spark):
    got = _canon(spark, [c[0] for c in CASES])
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: got {got[i]!r}, want {want!r}"


def test_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) for every valid case."""
    first = [v for v in _canon(spark, [c[0] for c in CASES]).values() if v is not None]
    second = _canon(spark, first)
    assert list(second.values()) == first


def test_no_udf_in_plan(spark):
    df = spark.createDataFrame([(0, "https://a.test/x")], "url_id long, url string")
    plan = canonicalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
