"""Synthetic Common-Crawl-style corpus WITH outlinks (anchor tags), for the
web-link-graph operators (operators/weblinks.py).

Separate from sources/pages.py on purpose: the pages corpus pins the
byte-identical HTML->text contract (north_rule) and its goldens must not
move; this corpus instead pins the html->outlink extraction contract. Same
(url, warc_ts, html, text, lang) schema as the input_hint, deterministic
(seed + row index), generated distributed via mapInPandas.

The anchor mix deliberately exercises the filter semantics: absolute
http/https targets (kept), uppercase host (lowercased), explicit port /
query / fragment (host extraction stops at :/?#), plus relative, mailto:,
javascript:, fragment-only and protocol-relative targets (all dropped by
the ^https?:// keep-filter — case-sensitive, matching Spark rlike).

``replay_host_edges`` recomputes the expected (src_host, dst_host, weight)
aggregate driver-side with Python ``re`` over the same generated HTML — the
generator-replay oracle pattern (oracles.py) that gives the driver gate a
hard hash signal on the whole extract->aggregate path.
"""

from __future__ import annotations

import random
import re
from collections import Counter
from datetime import timedelta
from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from posextract_spark.sources.pages import _EPOCH, PAGES_SCHEMA

HOSTS = [f"host{j}.test" for j in range(12)]

#: href value patterns; {h} = target host, {i} = page index, {j} = anchor no.
_LINK_MAKERS = [
    "https://{h}/page/{i}-{j}",
    "http://{h}/p/{j}",
    "https://{h}:8443/deep/{i}?ref=synth#frag",
    "https://{H}/CASE/{j}",  # uppercase host -> lowercased by extraction
    "/relative/{j}",  # dropped
    "mailto:crawl@{h}",  # dropped
    "javascript:void(0)",  # dropped
    "#section-{j}",  # dropped
    "//{h}/protocol-relative",  # dropped (no scheme)
]


#: anchor-text templates; {name} = first label of the target host (the
#: "entity" a link points at), mixing exact forms, variants that
#: normalize together, and junk navigation anchors. Chosen by arithmetic
#: index — NEVER by rng — so adding/altering texts cannot shift the rng
#: stream the href replay oracles (replay_links et al.) depend on.
_ANCHOR_TEXTS = [
    "{name}",
    "{name} Inc",
    "The {name} Company",
    "{NAME}",
    "click here",
    "read more",
    "{name} homepage",
]


def _anchor_text(i: int, j: int, h: str) -> str:
    name = h.split(".")[0]
    # 5 and 3 are both coprime to len==7, so the template genuinely
    # varies with BOTH page index and anchor position (i*7 would be dead)
    tmpl = _ANCHOR_TEXTS[(i * 5 + 3 * j) % len(_ANCHOR_TEXTS)]
    return tmpl.format(name=name, NAME=name.upper())


def gen_linked_page(i: int, seed: int = 42) -> dict:
    rng = random.Random(f"{seed}:links:{i}")
    src_host = HOSTS[i % len(HOSTS)]
    anchors: List[str] = []
    for j in range(rng.randint(2, 7)):
        maker = rng.choice(_LINK_MAKERS)
        h = rng.choice(HOSTS)
        href = maker.format(h=h, H=h.upper(), i=i, j=j)
        anchors.append(f'<a href="{href}">{_anchor_text(i, j, h)}</a>')
    html = (
        f"<html><head><title>Linked page {i}</title></head><body>"
        f"<p>outlink stub page {i} on {src_host}.</p>"
        + "".join(anchors)
        + "</body></html>"
    )
    return {
        "url": f"https://{src_host}/p/{i}",
        "warc_ts": _EPOCH + timedelta(seconds=i),
        "html": html.encode("utf-8"),
        "text": f"outlink stub page {i} on {src_host}.",
        "lang": "en",
    }


def linked_pages(
    spark: SparkSession, n: int, seed: int = 42, n_partitions: int = 8
) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([gen_linked_page(int(i), seed) for i in pdf["id"]])

    return spark.range(n).repartition(n_partitions).mapInPandas(gen, PAGES_SCHEMA)


# --- driver-side replay (oracle) ---------------------------------------------

_HREF_RE = re.compile(r'href="([^"]*)"')
_ABS_RE = re.compile(r"^https?://")
_HOST_RE = re.compile(r"^https?://([^/:?#]+)")


def replay_links(n: int, seed: int = 42) -> List[Tuple[str, str]]:
    """Expected (src_host, dst_host) rows — one per KEPT anchor occurrence,
    mirroring operators/weblinks.extract_links semantics exactly."""
    out: List[Tuple[str, str]] = []
    for i in range(n):
        page = gen_linked_page(i, seed)
        src_host = _HOST_RE.match(page["url"]).group(1).lower()
        for target in _HREF_RE.findall(page["html"].decode("utf-8")):
            if not _ABS_RE.match(target):
                continue
            m = _HOST_RE.match(target)
            if not m:
                continue
            out.append((src_host, m.group(1).lower()))
    return out


def replay_host_edges(n: int, seed: int = 42) -> List[Tuple[str, str, int]]:
    """Expected host_graph aggregate: (src_host, dst_host, weight) sorted."""
    weights = Counter(replay_links(n, seed))
    return [(s, d, w) for (s, d), w in sorted(weights.items())]


_ANCHOR_ELEM_RE = re.compile(r'<a href="[^"]*"[^>]*>[^<]*</a>')
_ANCHOR_TEXT_RE = re.compile(r">([^<]*)</a>")


def replay_anchor_alias(
    n: int, seed: int = 42, min_count: int = 1, min_share_e6: int = 0
) -> List[Tuple[str, str, int, int]]:
    """Expected (dst_host, surface_norm, n_anchors, share_e6) rows sorted —
    Python-re mirror of operators/weblinks.extract_anchors +
    anchor_alias_candidates over the generated corpus."""
    counts: Counter = Counter()
    totals: Counter = Counter()
    for i in range(n):
        page = gen_linked_page(i, seed)
        for elem in _ANCHOR_ELEM_RE.findall(page["html"].decode("utf-8")):
            target = _HREF_RE.search(elem).group(1)
            if not _ABS_RE.match(target):
                continue
            m = _HOST_RE.match(target)
            if not m:
                continue
            dst_host = m.group(1).lower()
            surface = _ANCHOR_TEXT_RE.search(elem).group(1).strip().lower()
            if not surface:
                continue
            counts[(dst_host, surface)] += 1
            totals[dst_host] += 1
    out = []
    for (host, surface), c in counts.items():
        share = 1_000_000 * c // totals[host]
        if c >= min_count and share >= min_share_e6:
            out.append((host, surface, c, share))
    return sorted(out)


def replay_link_from_anchors(
    n_dict: int,
    n_probe: int,
    seed_dict: int = 42,
    seed_probe: int = 7,
    min_count: int = 2,
    min_share_e6: int = 60_000,
    alias_min_share_e6: int = 100_000,
) -> List[Tuple[str, int, int]]:
    """Expected (canonical, n_mentions, n_linked) rows sorted — replay of
    __spark_entry__.q_kg_link_from_anchors: the alias dictionary is mined
    from the (n_dict, seed_dict) crawl (replay_anchor_alias +
    alias_df_from_anchors' max-share/min-host winner rule), then the
    (n_probe, seed_probe) crawl's kept anchor surfaces are linked against
    it (trim+lower normalization, canonical falls back to the surface)."""
    cands = replay_anchor_alias(n_dict, seed_dict, min_count, min_share_e6)
    best: dict = {}
    for host, surface, c, share in cands:
        if share < alias_min_share_e6:
            continue
        key = (-share, host)
        cur = best.get(surface)
        if cur is None or key < cur:
            best[surface] = key
    alias = {s: k[1] for s, k in best.items()}
    agg: dict = {}
    for i in range(n_probe):
        page = gen_linked_page(i, seed_probe)
        for elem in _ANCHOR_ELEM_RE.findall(page["html"].decode("utf-8")):
            target = _HREF_RE.search(elem).group(1)
            if not _ABS_RE.match(target):
                continue
            if not _HOST_RE.match(target):
                continue
            surface_norm = _ANCHOR_TEXT_RE.search(elem).group(1).strip().lower()
            linked = surface_norm in alias
            canonical = alias.get(surface_norm, surface_norm)
            tot, lk = agg.get(canonical, (0, 0))
            agg[canonical] = (tot + 1, lk + (1 if linked else 0))
    return sorted((c, t, l) for c, (t, l) in agg.items())


def replay_kept_targets(n: int, seed: int = 42) -> List[str]:
    """Raw href targets extract_links KEEPS (absolute http(s) only), in
    page order with duplicates — the input replay for the
    URL-canonicalization oracle (oracles.url_canonical_groups_sql)."""
    out: List[str] = []
    for i in range(n):
        page = gen_linked_page(i, seed)
        for target in _HREF_RE.findall(page["html"].decode("utf-8")):
            if _ABS_RE.match(target):
                out.append(target)
    return out
