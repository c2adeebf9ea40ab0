"""Cross-engine fuzz for URL canonicalization.

The driver oracle checks url_normalize on five synthesized URL shapes;
the residual risk is regex-DIALECT divergence (Spark compiles Java
regex, the DuckDB mirror compiles RE2) on shapes neither the goldens nor
the corpus produce. This generates a few hundred adversarial URLs from
seeded component choices — %-escapes, userinfo-ish '@', doubled
'?'/'#', empty hosts, weird ports, tracking-param edge spellings,
mixed-case schemes, trailing dots — and asserts the full
(host, port, url_norm) triple agrees byte-for-byte between the Spark
Column pipeline and the DuckDB SQL mirror on every one.
"""

import random

import duckdb

SCHEMES = ["http", "HTTP", "https", "hTTpS", "ftp", "a+b-c.d"]
HOSTS = [
    "example.com", "WWW.Example.COM", "www.x", "sub.DOMAIN.org.",
    "xn--bcher-kva.example", "127.0.0.1", "a_b.example", "",
]
PORTS = ["", ":80", ":443", ":8080", ":0080", ":65535", ":007"]
PATHS = [
    "", "/", "//", "/a/b", "/a//b///c/", "/Path/UPPER/", "/a%20b/c",
    "/trailing/", "/.", "/..", "/a.b.c", "/%2F/x",
]
QUERIES = [
    "", "?", "?a=1", "?b=2&a=1", "?utm_source=x", "?utm_=1&z=9",
    "?gclid=abc&keep=1", "?fbclid", "?a=1&a=0", "?=v", "?a==b&&c=d",
    "?utm_campaign=c&utm_term", "?x=%26&y=%3D", "?gclidX=1",
]
FRAGS = ["", "#", "#frag", "#sec?a=1", "#a#b", "#?utm_source=x"]


def _gen(rng, n):
    out = []
    for _ in range(n):
        u = (
            rng.choice(SCHEMES) + "://" + rng.choice(HOSTS) + rng.choice(PORTS)
            + rng.choice(PATHS) + rng.choice(QUERIES) + rng.choice(FRAGS)
        )
        out.append(u)
    # a few deliberately malformed shapes (no scheme, scheme only, bare ?)
    out += ["example.com/a", "https://", "://x", "http:///p", "?a=1", ""]
    return out


def test_url_normalize_cross_engine_fuzz(spark):
    from posextract_spark.operators.urls import URL_NORMALIZE_EXPR_SQL, url_normalize

    urls = _gen(random.Random(42), 300)
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    got = {
        r.doc_id: (r.host, r.port, r.url_norm)
        for r in url_normalize(df).select("doc_id", "host", "port", "url_norm").collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW urls_in AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{u}')" for i, u in enumerate(urls))
        + ") AS t(doc_id, url)"
    )
    mismatches = []
    for doc_id, _u, host, port, norm in con.execute(URL_NORMALIZE_EXPR_SQL).fetchall():
        if got[doc_id] != (host, port, norm):
            mismatches.append((urls[doc_id], got[doc_id], (host, port, norm)))
    assert not mismatches, f"{len(mismatches)} cross-engine divergences, first 5: {mismatches[:5]}"


# --- mask_pii dialect fuzz ---------------------------------------------------

_PII_BITS = [
    "a.b+tag@ex.co", "x@y.z", "x@y", "a..b@ex.com", "@ex.com", "a@.com",
    "first.last@sub.domain.example.org", "a@b.c2", "A@B.CO,", "(a@b.cc)",
    "http://ex.test", "https://ex.test/a?b=1&c=2#f", "https://1.2.3.4/x",
    "HTTPS://up.example", "http://", "httpx://no",
    "1.2.3.4", "10.0.255.7", "999.999.999.999", "1.2.3.4.5", "1.2.3",
    "a1.2.3.4", "1.2.3.4b", " 255.255.255.255.", "v1.2.3.4",
    "plain words here", "commas, dots. and; stuff:", "",
]


def test_mask_pii_cross_engine_fuzz(spark):
    """Same dialect check for the redaction stage: Java regex (Spark) vs
    RE2 (DuckDB) must agree on every span — counts AND the masked text —
    over adversarial email/URL/IP shapes, including \\b word-boundary
    edges (letters vs dots adjacent to IPs) and IPs inside URLs (order
    sensitivity: the URL pattern must consume them first)."""
    from posextract_spark.operators.textops import PII_PATTERNS

    rng = random.Random(7)
    texts = [
        " ".join(rng.choice(_PII_BITS) for _ in range(rng.randrange(1, 8)))
        for _ in range(250)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from posextract_spark.operators.textops import mask_pii

    got = {
        r.doc_id: (r.n_email, r.n_url, r.n_ip, r.masked_text)
        for r in mask_pii(df).select("doc_id", "n_email", "n_url", "n_ip", "masked_text").collect()
    }

    con = duckdb.connect()
    rows = ", ".join("(%d, '%s')" % (i, t.replace("'", "''")) for i, t in enumerate(texts))
    con.execute(f"CREATE VIEW pii_in AS SELECT * FROM (VALUES {rows}) AS t(doc_id, text)")
    (_, e_pat, _), (_, u_pat, _), (_, i_pat, _) = PII_PATTERNS
    sql = rf"""
    SELECT doc_id,
      CAST(len(regexp_extract_all(text, '{e_pat}')) AS INTEGER),
      CAST(len(regexp_extract_all(text, '{u_pat}')) AS INTEGER),
      CAST(len(regexp_extract_all(text, '{i_pat}')) AS INTEGER),
      regexp_replace(regexp_replace(regexp_replace(text,
        '{e_pat}', '<EMAIL>', 'g'), '{u_pat}', '<URL>', 'g'), '{i_pat}', '<IP>', 'g')
    FROM pii_in
    """
    mismatches = []
    for doc_id, ne, nu, ni, masked in con.execute(sql).fetchall():
        if got[doc_id] != (ne, nu, ni, masked):
            mismatches.append((texts[doc_id], got[doc_id], (ne, nu, ni, masked)))
    assert not mismatches, f"{len(mismatches)} divergences, first 3: {mismatches[:3]}"
