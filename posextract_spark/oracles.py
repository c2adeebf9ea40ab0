"""Closed-form DuckDB oracles for operators whose inputs are deterministic
generators rather than the driver's parquet views.

The media corpus (sources/media.py) derives every payload from
``np.random.default_rng([seed, media_id])``, so the expected feature rows
are computable driver-side by replaying the *generator RNG only* — the
arrays are re-drawn here and features computed straight from them with
numpy, deliberately bypassing the SIMG/SAUD/SVID codecs in
operators/multimodal.py. The distributed path must therefore get
encode -> Arrow -> decode -> feature math exactly right to hash-match.

The expected rows are rendered as a DuckDB ``VALUES`` table with explicit
casts so schema comparison is exact (BIGINT/INT parity with the Spark
schemas).
"""

from __future__ import annotations

import hashlib
import struct
from typing import List, Sequence, Tuple

import numpy as np

_KINDS = ("image", "audio", "video")


def _values_sql(
    rows: Sequence[Tuple], columns: Sequence[Tuple[str, str]]
) -> str:
    """SELECT over a VALUES table with per-column casts.

    columns: [(name, duckdb_type), ...]; row cells are ints or strings.
    """

    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):  # before int: bool IS an int subclass
            return "TRUE" if v else "FALSE"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(int(v))

    names = ", ".join(name for name, _ in columns)
    casts = ", ".join(f"CAST({name} AS {typ}) AS {name}" for name, typ in columns)
    if not rows:
        # empty expectation must be a valid zero-row table, not a VALUES
        # parse error: emit one dummy row filtered out
        dummy = ", ".join("0" for _ in columns)
        return f"SELECT {casts} FROM (VALUES ({dummy})) AS t({names}) WHERE 1 = 0"
    body = ", ".join("(" + ", ".join(cell(v) for v in row) + ")" for row in rows)
    return f"SELECT {casts} FROM (VALUES {body}) AS t({names})"


def _replay_image(rng: np.random.Generator) -> np.ndarray:
    w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def _replay_audio(rng: np.random.Generator):
    rate = int(rng.choice([8000, 16000]))
    n = int(rng.integers(100, 1000))
    return rate, rng.integers(-32768, 32767, size=n, dtype=np.int16)


def _replay_video_nframes(rng: np.random.Generator) -> int:
    rng.integers(8, 32), rng.integers(8, 32)  # w, h draws precede n_frames
    return int(rng.integers(4, 16))


def media_image_features_sql(n: int = 120, seed: int = 42, n_bins: int = 4) -> str:
    rows: List[Tuple] = []
    for i in range(0, n, 1):
        if _KINDS[i % 3] != "image":
            continue
        px = _replay_image(np.random.default_rng([seed, i]))
        hist = np.histogram(px, bins=n_bins, range=(0, 256))[0]
        rows.append(
            (
                i,
                px.shape[1],
                px.shape[0],
                int(np.floor(px.mean() * 10000)),
                int(np.floor(px.std() * 10000)),
                *[int(x) for x in hist],
            )
        )
    cols = [
        ("media_id", "BIGINT"),
        ("width", "INT"),
        ("height", "INT"),
        ("mean_e4", "BIGINT"),
        ("std_e4", "BIGINT"),
    ] + [(f"hist_{b}", "BIGINT") for b in range(n_bins)]
    return _values_sql(rows, cols)


def media_audio_features_sql(n: int = 120, seed: int = 42) -> str:
    rows: List[Tuple] = []
    for i in range(n):
        if _KINDS[i % 3] != "audio":
            continue
        rate, samples = _replay_audio(np.random.default_rng([seed, i]))
        x = samples.astype(np.float64)
        rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
        zc = int(np.sum(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0
        rows.append((i, rate, len(samples), int(np.floor(rms * 10000)), zc))
    cols = [
        ("media_id", "BIGINT"),
        ("sample_rate", "INT"),
        ("n_samples", "BIGINT"),
        ("rms_e4", "BIGINT"),
        ("zero_crossings", "BIGINT"),
    ]
    return _values_sql(rows, cols)


def media_resize_sql(n: int = 120, seed: int = 42, factor: int = 2) -> str:
    """Expected (media_id, width, height, payload_md5) after an integer-factor
    box downscale. The SIMG framing (magic + <HH dims + raw bytes) is
    replicated inline so the md5 pins the full payload bytes, not just dims."""
    rows: List[Tuple] = []
    for i in range(n):
        if _KINDS[i % 3] != "image":
            continue
        px = _replay_image(np.random.default_rng([seed, i]))
        h, w = px.shape
        h2, w2 = (h // factor) * factor, (w // factor) * factor
        small = (
            px[:h2, :w2]
            .reshape(h2 // factor, factor, w2 // factor, factor)
            .mean(axis=(1, 3))
        )
        small = np.floor(small).astype(np.uint8)
        payload = (
            b"SIMG"
            + struct.pack("<HH", small.shape[1], small.shape[0])
            + small.tobytes()
        )
        rows.append(
            (i, small.shape[1], small.shape[0], hashlib.md5(payload).hexdigest())
        )
    cols = [
        ("media_id", "BIGINT"),
        ("width", "INT"),
        ("height", "INT"),
        ("payload_md5", "VARCHAR"),
    ]
    return _values_sql(rows, cols)


# --- kg_pages_pipeline -------------------------------------------------------
#
# The pages corpus draws every sentence from 8 fixed templates
# (sources/pages.py _gen_sentences), so the full html -> text -> sentences ->
# kernel -> linking -> edge-aggregation pipeline has a closed-form expected
# output: replay the generator RNG to recover each page's sentences, map each
# sentence to its triples via the per-template table below (pure regex, no
# kernel import — tests/test_kg_pipeline.py pins this table against the
# actual kernel so it cannot drift), then apply the alias dictionary and the
# portable hash in plain Python. Kernel *semantics* are independently gated
# by the reference differential (tools/differential.py, P=R=1.0); this
# oracle hard-verifies the distributed plumbing around it.

import re as _re

# (pattern, slot -> triples). Quirks this table intentionally encodes:
# - negated "did not acquire" emits the positive verb text (negation lives
#   in the neg fields, not the predicate);
# - conjunction expansion fans "acquired n1, and n2, and n3" to 3 triples;
# - "bought X and sold Y" keeps only the first clause's triple;
# - the relative-clause template emits its triple TWICE (two rules fire);
# - "A said B acquired C" adds the quirky (A, said, C) triple;
# - the quoted variant extracts only inside the quotes (split_quotes drops
#   the carrier clause).
TEMPLATE_TRIPLE_RULES = [
    (
        _re.compile(r"^(\S+) did not acquire (\S+)\.$"),
        lambda m: [(m[1], "acquire", m[2])],
    ),
    (
        _re.compile(r"^(\S+) acquired (\S+), and (\S+), and (\S+)\.$"),
        lambda m: [(m[1], "acquired", m[2]), (m[1], "acquired", m[3]), (m[1], "acquired", m[4])],
    ),
    (
        _re.compile(r"^(\S+) bought (\S+) and sold (\S+)\.$"),
        lambda m: [(m[1], "bought", m[2])],
    ),
    (
        _re.compile(r"^The tycoon who owned (\S+) retired\.$"),
        lambda m: [("tycoon", "owned", m[1]), ("tycoon", "owned", m[1])],
    ),
    (
        _re.compile(r"^(\S+) wanted to acquire (\S+)\.$"),
        lambda m: [(m[1], "acquire", m[2])],
    ),
    (
        _re.compile(r'^(\S+) said "(\S+) acquired (\S+)" yesterday\.$'),
        lambda m: [(m[2], "acquired", m[3])],
    ),
    (
        _re.compile(r"^(\S+) said (\S+) acquired (\S+)\.$"),
        lambda m: [(m[2], "acquired", m[3]), (m[1], "said", m[3])],
    ),
    (
        _re.compile(r"^(.+) gave up the (\S+)\.$"),
        lambda m: [(m[1], "gave up", m[2])],
    ),
]


def triples_for_sentence(sentence: str):
    for pattern, emit in TEMPLATE_TRIPLE_RULES:
        m = pattern.match(sentence)
        if m:
            return emit(m)
    return []  # decoy/boilerplate sentences extract nothing


def _portable_hash64_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def kg_pages_edges_sql(n: int = 200, seed: int = 42) -> str:
    """Expected (src, predicate, dst, weight) edges for
    __spark_entry__.q_kg_pages_pipeline over generate_pages(n, seed)."""
    import random
    from collections import Counter

    from posextract_spark.sources.pages import ENTITY_ALIASES, _gen_sentences

    alias = {
        surface.lower(): canonical
        for canonical, surfaces in ENTITY_ALIASES.items()
        for surface in surfaces
    }

    def entity_id(surface: str) -> int:
        norm = surface.strip().lower()
        return _portable_hash64_py(alias.get(norm, norm))

    weights: Counter = Counter()
    for i in range(n):
        rng = random.Random(f"{seed}:{i}")
        if rng.random() >= 0.85:
            continue  # non-en page, dropped by the lang filter
        for sentence in _gen_sentences(rng):
            for subj, verb, obj in triples_for_sentence(sentence):
                weights[(entity_id(subj), verb, entity_id(obj))] += 1

    rows = [(src, pred, dst, w) for (src, pred, dst), w in sorted(weights.items())]
    cols = [
        ("src", "BIGINT"),
        ("predicate", "VARCHAR"),
        ("dst", "BIGINT"),
        ("weight", "BIGINT"),
    ]
    return _values_sql(rows, cols)


def kg_pages_nodes_canonical_sql(n: int = 200, seed: int = 42) -> str:
    """Expected (canonical, entity_id, surfaces, n_mentions) for
    __spark_entry__.q_kg_nodes_canonical: full generator replay + a plain-
    Python mirror of the scored-linking / co-reference-CC canonicalization
    (operators/canonicalize.py resolve_canonical_cc). Mirrored semantics,
    each pinned by the distributed implementation's own unit tests:
    - normalize = lower(trim); bigrams = DISTINCT char 2-grams, empty for
      len < 2 (linking.char_bigrams);
    - candidate block = alias rows sharing the 2-char normalized prefix;
      score = 1e6 for verbatim hits else floor(bigram-Jaccard * 1e6)
      (IEEE double, same fp path both engines); best candidate = max by
      (score, canonical) exactly like Spark's max(struct(score, cand));
    - link edge surface->'canon:'+canonical when score >= 300000; coref
      edge between distinct surfaces with prefix-blocked Jaccard >= 500000;
    - union-find closure; cluster canonical = min anchor canonical, else
      min member surface; edge-less surfaces stay themselves;
    - node rows group raw mention surfaces by cluster canonical with the
      build_nodes slice-8 sorted surface_forms cap."""
    import math
    import random
    from collections import Counter, defaultdict

    from posextract_spark.sources.pages import (
        ENTITY_ALIASES,
        TYPO_SENTENCES,
        _gen_sentences,
    )

    alias_rows = [
        (surface.lower(), canonical)
        for canonical, surfaces in ENTITY_ALIASES.items()
        for surface in surfaces
    ]

    def bigrams(s: str) -> frozenset:
        return frozenset(s[i : i + 2] for i in range(len(s) - 1)) if len(s) >= 2 else frozenset()

    def jacc_e6(a: frozenset, b: frozenset) -> int:
        union = len(a | b)
        return int(math.floor(len(a & b) / union * 1000000.0)) if union else 0

    # 1. replay the corpus -> raw mention surfaces
    mention_counts: Counter = Counter()
    sentences: list = []
    for i in range(n):
        rng = random.Random(f"{seed}:{i}")
        if rng.random() >= 0.85:
            continue
        sentences.extend(_gen_sentences(rng))
    sentences.extend(TYPO_SENTENCES)
    for sentence in sentences:
        for subj, _verb, obj in triples_for_sentence(sentence):
            mention_counts[subj] += 1
            mention_counts[obj] += 1

    surfaces_raw = defaultdict(set)  # surface_norm -> raw surfaces seen
    for raw in mention_counts:
        surfaces_raw[raw.strip().lower()].add(raw)
    vocab = sorted(surfaces_raw)

    # 2. scorer mirror: best candidate per distinct normalized surface
    best: dict = {}
    for s in vocab:
        cands = [
            (1000000 if s == asurf else jacc_e6(bigrams(s), bigrams(asurf)), canon)
            for asurf, canon in alias_rows
            if asurf[:2] == s[:2]
        ]
        best[s] = max(cands) if cands else (0, None)

    # 3. link + coref edges over hashed nodes, then union-find
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    h = _portable_hash64_py
    for s in vocab:
        score, canon = best[s]
        if score >= 300000:
            union(h(s), h("canon:" + canon))
    for i, s1 in enumerate(vocab):
        for s2 in vocab[i + 1 :]:
            if s1[:2] == s2[:2] and jacc_e6(bigrams(s1), bigrams(s2)) >= 500000:
                union(h(s1), h(s2))
    # snapshot BEFORE the rep loops: find() inserts queried nodes into
    # ``parent``, so membership after those loops would claim every
    # surface was touched by an edge
    touched = set(parent)

    # 4. cluster representative: min anchor canonical, else min surface
    anchor_rep: dict = {}
    for s in vocab:
        score, canon = best[s]
        if score >= 300000:
            root = find(h("canon:" + canon))
            if root not in anchor_rep or canon < anchor_rep[root]:
                anchor_rep[root] = canon
    surf_rep: dict = {}
    for s in vocab:
        if h(s) not in touched:
            continue
        root = find(h(s))
        if root not in surf_rep or s < surf_rep[root]:
            surf_rep[root] = s

    def canonical_of(s: str) -> str:
        node = h(s)
        if node not in touched:
            return s  # never touched by any edge: own singleton canonical
        root = find(node)
        return anchor_rep.get(root, surf_rep[root])

    # 5. aggregate nodes by cluster canonical
    n_mentions: Counter = Counter()
    node_surfaces = defaultdict(set)
    for raw, cnt in mention_counts.items():
        canon = canonical_of(raw.strip().lower())
        n_mentions[canon] += cnt
        node_surfaces[canon].update({raw})

    rows = [
        (
            canon,
            h(canon),
            "|".join(sorted(node_surfaces[canon])[:8]),
            n_mentions[canon],
        )
        for canon in sorted(n_mentions)
    ]
    cols = [
        ("canonical", "VARCHAR"),
        ("entity_id", "BIGINT"),
        ("surfaces", "VARCHAR"),
        ("n_mentions", "BIGINT"),
    ]
    return _values_sql(rows, cols)



def media_frame_sample_sql(n: int = 120, seed: int = 42, every_k: int = 2) -> str:
    """Expected sampled-frame count per video: ceil(n_frames / every_k)."""
    rows: List[Tuple] = []
    for i in range(n):
        if _KINDS[i % 3] != "video":
            continue
        n_frames = _replay_video_nframes(np.random.default_rng([seed, i]))
        rows.append((i, (n_frames + every_k - 1) // every_k))
    cols = [("media_id", "BIGINT"), ("n_frames_sampled", "BIGINT")]
    return _values_sql(rows, cols)


# --- web link graph ----------------------------------------------------------


def host_link_graph_sql(n: int = 300, seed: int = 42) -> str:
    """Expected (src_host, dst_host, weight) for
    __spark_entry__.q_host_link_graph: generator replay of the linked-pages
    corpus + Python-re mirror of the extraction semantics
    (sources/weblinks.replay_host_edges)."""
    from posextract_spark.sources.weblinks import replay_host_edges

    cols = [("src_host", "VARCHAR"), ("dst_host", "VARCHAR"), ("weight", "BIGINT")]
    return _values_sql(replay_host_edges(n, seed), cols)


def host_pagerank_sql(n: int = 300, seed: int = 42, n_iters: int = 3) -> str:
    """Expected (node, rank_e12) for __spark_entry__.q_host_pagerank: the
    replayed host edge list rendered as a VALUES CTE, then the SAME unrolled
    integer PageRank mirror the kg_pagerank oracle uses
    (operators/graph_analytics.pagerank_sql) — extraction and iteration are
    both under the hash."""
    from posextract_spark.operators.graph_analytics import pagerank_sql
    from posextract_spark.sources.weblinks import replay_host_edges

    edges = sorted({(s, d) for s, d, _ in replay_host_edges(n, seed)})
    values = ", ".join(f"('{s}', '{d}')" for s, d in edges)
    return (
        f"WITH host_e(src, dst) AS (VALUES {values})"
        + pagerank_sql("host_e", n_iters=n_iters)
    )


def host_pagerank_weighted_sql(n: int = 300, seed: int = 42, n_iters: int = 3) -> str:
    """Expected (node, rank_e12) for __spark_entry__.q_host_pagerank_weighted:
    the replayed WEIGHTED host edges as a VALUES CTE + the unrolled
    weight-proportional mirror (graph_analytics.pagerank_weighted_sql) —
    extraction, weight aggregation, and iteration all under the hash."""
    from posextract_spark.operators.graph_analytics import pagerank_weighted_sql
    from posextract_spark.sources.weblinks import replay_host_edges

    values = ", ".join(
        f"('{s}', '{d}', {w})" for s, d, w in replay_host_edges(n, seed)
    )
    return (
        f"WITH host_e(src, dst, weight) AS (VALUES {values})"
        + pagerank_weighted_sql("host_e", n_iters=n_iters)
    )


def anchor_alias_sql(
    n: int = 300, seed: int = 42, min_count: int = 2, min_share_e6: int = 60_000
) -> str:
    """Expected (dst_host, surface_norm, n_anchors, share_e6) for
    __spark_entry__.q_anchor_alias_mining: generator replay of the
    linked-pages corpus + Python-re mirror of anchor-element extraction,
    normalization, and the integer share arithmetic
    (sources/weblinks.replay_anchor_alias)."""
    from posextract_spark.sources.weblinks import replay_anchor_alias

    cols = [
        ("dst_host", "VARCHAR"),
        ("surface_norm", "VARCHAR"),
        ("n_anchors", "BIGINT"),
        ("share_e6", "BIGINT"),
    ]
    return _values_sql(replay_anchor_alias(n, seed, min_count, min_share_e6), cols)


def link_from_anchors_sql(
    n_dict: int = 300,
    n_probe: int = 120,
    seed_dict: int = 42,
    seed_probe: int = 7,
    min_count: int = 2,
    min_share_e6: int = 60_000,
) -> str:
    """Expected (canonical, n_mentions, n_linked) for
    __spark_entry__.q_kg_link_from_anchors: generator replay of the mined
    alias dictionary applied to a second crawl's anchor surfaces
    (sources/weblinks.replay_link_from_anchors)."""
    from posextract_spark.sources.weblinks import replay_link_from_anchors

    cols = [
        ("canonical", "VARCHAR"),
        ("n_mentions", "BIGINT"),
        ("n_linked", "BIGINT"),
    ]
    return _values_sql(
        replay_link_from_anchors(
            n_dict, n_probe, seed_dict, seed_probe, min_count, min_share_e6
        ),
        cols,
    )


def _recrawl_values_sql(n: int, seed: int) -> str:
    """Replayed recrawl corpus as a (url, ts, fp, lang) SELECT body —
    the shared input relation of the three temporal mirrors."""
    from posextract_spark.sources.pages import replay_recrawl_captures

    cols = [
        ("url", "VARCHAR"),
        ("ts", "VARCHAR"),
        ("fp", "VARCHAR"),
        ("lang", "VARCHAR"),
    ]
    return _values_sql(replay_recrawl_captures(n, seed), cols)


def web_latest_capture_sql(n: int = 160, seed: int = 42) -> str:
    """Expected (url, ts_str, text_md5, lang, n_captures) for
    __spark_entry__.q_web_latest_capture: generator replay of the
    recrawl corpus (input only) + an independent DuckDB formulation of
    newest-capture selection (operators/temporal.latest_capture_sql)."""
    from posextract_spark.operators.temporal import latest_capture_sql

    return latest_capture_sql(_recrawl_values_sql(n, seed))


def web_crawl_churn_sql(n: int = 160, seed: int = 42) -> str:
    """Expected per-url churn profile for q_web_crawl_churn
    (operators/temporal.crawl_churn_sql)."""
    from posextract_spark.operators.temporal import crawl_churn_sql

    return crawl_churn_sql(_recrawl_values_sql(n, seed))


def web_snapshot_diff_sql(
    n: int, seed: int, old_window: tuple, new_window: tuple
) -> str:
    """Expected (url, status, old_fp, new_fp) for q_web_snapshot_diff
    (operators/temporal.snapshot_diff_sql)."""
    from posextract_spark.operators.temporal import snapshot_diff_sql

    return snapshot_diff_sql(_recrawl_values_sql(n, seed), old_window, new_window)


def kg_recrawl_edges_sql(
    n: int = 120, seed: int = 42, ts_new: str = "2024-02-01 00:00:00"
) -> str:
    """Expected (src, predicate, dst, weight) for
    __spark_entry__.q_kg_recrawl_incremental: a FROM-SCRATCH build over
    the as-of-``ts_new`` snapshot of the recrawl corpus (latest capture
    per url, en only, triples_for_sentence, exact alias linking). The
    Spark side builds the same edges INCREMENTALLY (re-extracting only
    dirty urls and retracting changed urls' old triples), so the hash
    match proves incremental == scratch."""
    import random  # noqa: F401  (parity with kg_pages_edges_sql imports)
    from collections import Counter
    from datetime import datetime, timezone

    from posextract_spark.sources.pages import ENTITY_ALIASES, recrawl_captures

    alias = {
        surface.lower(): canonical
        for canonical, surfaces in ENTITY_ALIASES.items()
        for surface in surfaces
    }

    def entity_id(surface: str) -> int:
        norm = surface.strip().lower()
        return _portable_hash64_py(alias.get(norm, norm))

    cutoff = datetime.fromisoformat(ts_new).replace(tzinfo=timezone.utc)
    weights: Counter = Counter()
    for i in range(n):
        caps = [r for r in recrawl_captures(i, seed) if r["warc_ts"] <= cutoff]
        if not caps:
            continue
        latest = max(caps, key=lambda r: r["warc_ts"])
        if latest["lang"] != "en":
            continue
        for sentence in latest["_sentences"]:
            for subj, verb, obj in triples_for_sentence(sentence):
                weights[(entity_id(subj), verb, entity_id(obj))] += 1

    rows = [(src, pred, dst, w) for (src, pred, dst), w in sorted(weights.items())]
    cols = [
        ("src", "BIGINT"),
        ("predicate", "VARCHAR"),
        ("dst", "BIGINT"),
        ("weight", "BIGINT"),
    ]
    return _values_sql(rows, cols)


def kg_fact_history_sql(
    n: int = 120,
    seed: int = 42,
    cutoffs: tuple = (
        "2024-01-10 00:00:00",
        "2024-01-20 00:00:00",
        "2024-02-01 00:00:00",
    ),
) -> str:
    """Expected (src, predicate, epoch, dst, support, prev_dst, changed)
    for __spark_entry__.q_kg_fact_history: per cutoff, replay the as-of
    snapshot of the recrawl corpus (latest capture per url, en only —
    same replay as kg_recrawl_edges_sql), count raw triple assertions,
    then apply the fact_history rule (majority winner per fact per epoch,
    min-dst ties, prev = winner at the latest earlier epoch observed,
    changed on first appearance or flip) in pure Python."""
    from collections import Counter, defaultdict
    from datetime import datetime, timezone

    from posextract_spark.sources.pages import recrawl_captures

    winners: dict = {}
    for cut in cutoffs:
        cutoff = datetime.fromisoformat(cut).replace(tzinfo=timezone.utc)
        cnt: Counter = Counter()
        for i in range(n):
            caps = [r for r in recrawl_captures(i, seed) if r["warc_ts"] <= cutoff]
            if not caps:
                continue
            latest = max(caps, key=lambda r: r["warc_ts"])
            if latest["lang"] != "en":
                continue
            for sentence in latest["_sentences"]:
                for subj, verb, obj in triples_for_sentence(sentence):
                    cnt[(subj, verb, obj)] += 1
        groups: dict = defaultdict(dict)
        for (s, p, d), c in cnt.items():
            groups[(s, p)][d] = c
        for (s, p), dsts in groups.items():
            d, c = min(dsts.items(), key=lambda kv: (-kv[1], kv[0]))
            winners[(s, p, cut)] = (d, c)

    rows = []
    for (s, p, e), (d, c) in winners.items():
        earlier = [
            e2 for (s2, p2, e2) in winners if s2 == s and p2 == p and e2 < e
        ]
        prev = winners[(s, p, max(earlier))][0] if earlier else None
        rows.append((s, p, e, d, c, prev, prev is None or prev != d))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    cols = [
        ("src", "VARCHAR"),
        ("predicate", "VARCHAR"),
        ("epoch", "VARCHAR"),
        ("dst", "VARCHAR"),
        ("support", "BIGINT"),
        ("prev_dst", "VARCHAR"),
        ("changed", "BOOLEAN"),
    ]
    return _values_sql(rows, cols)


def url_canonical_groups_sql(n: int = 300, seed: int = 42) -> str:
    """Expected (canonical_url, n_links, n_raw_forms) for
    __spark_entry__.q_url_canonical_groups: the generator's kept raw
    targets as a VALUES CTE, then the SAME canonicalization logic in
    DuckDB (operators/weblinks.canonicalize_urls_sql) — the string-op
    mirror is under the hash, not just the replayed aggregate."""
    from posextract_spark.operators.weblinks import canonicalize_urls_sql
    from posextract_spark.sources.weblinks import replay_kept_targets

    targets = replay_kept_targets(n, seed)
    values = ", ".join(f"({i}, '{t}')" for i, t in enumerate(targets))
    return (
        f"WITH rawt(url_id, url) AS (VALUES {values}),\n"
        f"ct AS ({canonicalize_urls_sql('rawt')})\n"
        "SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_links,\n"
        "       CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms\n"
        "FROM ct GROUP BY canonical_url"
    )
