"""Training-data export operators (operators/mldata.py): semantics + the
scale plan shapes (split is scan-side, packing shuffles once on bucket,
decontamination broadcast-joins the eval side)."""

import hashlib

from pyspark.sql import functions as F

from posextract_spark.operators.mldata import decontaminate, hash_split, pack_sequences


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _h100(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100


def test_hash_split_deterministic_and_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: r.split for r in hash_split(docs).select("doc_id", "split").collect()}
    # python mirror of the md5 threshold — cross-checks hash AND bucketing
    for doc_id, split in got.items():
        h = _h100(doc_id)
        want = "train" if h < 90 else ("val" if h < 95 else "test")
        assert split == want, (doc_id, h, split, want)
    # partition-invariance: same assignment under a different partitioning
    reparted = {
        r.doc_id: r.split
        for r in hash_split(docs.repartition(13)).select("doc_id", "split").collect()
    }
    assert got == reparted


def test_hash_split_scan_side_no_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(hash_split(docs).select("doc_id", "split"))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_hash_split_rejects_bad_percents(spark):
    import pytest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    with pytest.raises(ValueError):
        hash_split(docs, train_pct=96, val_pct=5)


def test_pack_sequences_invariants(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = pack_sequences(docs, budget=100, n_buckets=4).collect()
    assert len(out) == docs.count()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rows in by_bucket.items():
        rows.sort(key=lambda r: r.doc_id)
        # bin_offset is the exclusive running sum of n_tokens in id order
        cum = 0
        for r in rows:
            assert r.bin_offset == cum, (bucket, r.doc_id)
            assert r.seq_bin == cum // 100
            cum += r.n_tokens
    # every doc appears exactly once regardless of bucket count
    assert sum(len(v) for v in by_bucket.values()) == len(out)


def test_pack_sequences_single_bucket_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(pack_sequences(docs))
    # exactly one Exchange: the hash shuffle onto buckets. The per-bucket
    # Window is the deliberate, bounded sequential core of packing —
    # n_buckets (not corpus size) caps what one task sorts.
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(bucket" in plan


def test_decontaminate_eval_docs_flag_themselves(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    out = {r.doc_id: r.n_contaminated for r in decontaminate(docs, ev).collect()}
    # every eval doc with >= 5 words contains 100% of its own shingles
    from posextract_spark.operators.dedup import SHINGLE_N

    for r in ev.select("doc_id", "text").collect():
        words = [w for w in r.text.split(" ") if w]
        n_shingles = len({" ".join(words[i : i + SHINGLE_N]) for i in range(len(words) - SHINGLE_N + 1)}) if len(words) >= SHINGLE_N else 0
        if n_shingles:
            assert out.get(r.doc_id, 0) >= n_shingles, r.doc_id


def test_decontaminate_broadcasts_eval_side(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    plan = _plan(decontaminate(docs, ev))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_decontaminate_disjoint_corpora_empty(spark):
    a = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id bigint, text string"
    )
    b = spark.createDataFrame(
        [(2, "one two three four five six")], "doc_id bigint, text string"
    )
    assert decontaminate(a, b).count() == 0


def test_pack_sequence_spans_partition_each_doc_and_fill_bins(spark):
    """Spans must (a) partition every document's tokens exactly (per-doc
    sum of slice lengths == n_tokens, slices contiguous from 0), and
    (b) fill every non-final bin of a bucket to exactly ``budget`` tokens
    — the straddle carry-over leaves no holes and no overlaps."""
    from collections import defaultdict

    from posextract_spark.operators.mldata import pack_sequence_spans, pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = 512
    spans = pack_sequence_spans(docs, budget=budget).collect()
    packed = {r.doc_id: r for r in pack_sequences(docs, budget=budget).collect()}

    per_doc = defaultdict(list)
    per_bin = defaultdict(int)
    for r in spans:
        assert 0 <= r.tok_start < r.tok_end, r
        assert 0 <= r.seq_offset < budget, r
        per_doc[r.doc_id].append(r)
        per_bin[(r.bucket, r.seq_bin)] += r.tok_end - r.tok_start
    for doc_id, rows in per_doc.items():
        rows.sort(key=lambda r: r.seq_bin)
        assert rows[0].tok_start == 0
        for a, b in zip(rows, rows[1:]):
            assert a.tok_end == b.tok_start  # contiguous, no overlap
            assert b.seq_bin == a.seq_bin + 1
            assert b.seq_offset == 0  # carried-over slice starts the bin
        assert rows[-1].tok_end == packed[doc_id].n_tokens
        assert rows[0].seq_bin == packed[doc_id].seq_bin  # starts in its bin
    # every doc with tokens has spans; zero-token docs have none
    assert set(per_doc) == {d for d, r in packed.items() if r.n_tokens > 0}
    # all bins except each bucket's last are exactly full
    last_bin = defaultdict(int)
    for bucket, seq_bin in per_bin:
        last_bin[bucket] = max(last_bin[bucket], seq_bin)
    for (bucket, seq_bin), filled in per_bin.items():
        if seq_bin < last_bin[bucket]:
            assert filled == budget, (bucket, seq_bin, filled)


def test_pack_sequence_spans_straddle_exact(spark):
    """Closed-form straddle: one bucket, budget 4, docs of 3/3/6 tokens in
    id order -> offsets 0,3,6; doc 2 straddles bins 0-1, doc 3 bins 1-3."""
    from posextract_spark.operators.mldata import pack_sequence_spans

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f"), (3, "g h i j k l")],
        "doc_id bigint, text string",
    )
    out = {
        (r.doc_id, r.seq_bin): (r.tok_start, r.tok_end, r.seq_offset)
        for r in pack_sequence_spans(docs, budget=4, n_buckets=1).collect()
    }
    assert out == {
        (1, 0): (0, 3, 0),
        (2, 0): (0, 1, 3),
        (2, 1): (1, 3, 0),
        (3, 1): (0, 2, 2),
        (3, 2): (2, 6, 0),
    }


def test_pack_sequence_spans_single_shuffle(spark):
    """The export adds NO shuffle beyond the assignment's per-bucket
    window: exactly one Exchange in the plan."""
    from posextract_spark.operators.mldata import pack_sequence_spans

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(pack_sequence_spans(docs))
    assert plan.count("Exchange") == 1


def test_decontaminate_shuffle_fallback_above_broadcast_limit(spark):
    """eval_broadcast_limit=0 drops the FORCED broadcast hint, leaving the
    join strategy to the optimizer — with autoBroadcastJoinThreshold
    disabled the plan must show a shuffle join (the behavior that saves a
    too-big eval set), while the default path still forces the broadcast.
    Results identical either way. (Without the threshold override, AQE
    rightly re-broadcasts the genuinely tiny test eval side — the guard
    removes the FORCE, it doesn't forbid broadcasts.)"""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    via_broadcast = {
        r.doc_id: r.n_contaminated for r in decontaminate(docs, ev).collect()
    }
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fallback = decontaminate(docs, ev, eval_broadcast_limit=0)
        plan = _plan(fallback)
        assert "BroadcastHashJoin" not in plan
        via_shuffle = {r.doc_id: r.n_contaminated for r in fallback.collect()}
        # the default (hinted) path broadcasts even with the threshold off
        assert "BroadcastHashJoin" in _plan(decontaminate(docs, ev))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert via_broadcast == via_shuffle


def test_shuffle_shards_is_a_partition_invariant_permutation(spark):
    """(shard, pos) must be a bijection onto the corpus: pos dense from 0
    per shard, assignment identical under a different input partitioning
    (no rand / no monotonically_increasing_id), and a different seed gives
    a different order."""
    from collections import defaultdict

    from posextract_spark.operators.mldata import shuffle_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = shuffle_shards(docs, n_shards=8, seed=0).collect()
    assert len(rows) == docs.count()
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard  # dense from 0
    reparted = shuffle_shards(docs.repartition(13), n_shards=8, seed=0).collect()
    assert {(r.doc_id, r.shard, r.pos) for r in rows} == {
        (r.doc_id, r.shard, r.pos) for r in reparted
    }
    other_seed = shuffle_shards(docs, n_shards=8, seed=1).collect()
    assert {(r.doc_id, r.shard, r.pos) for r in rows} != {
        (r.doc_id, r.shard, r.pos) for r in other_seed
    }


def test_sample_mixture_exact_rates_and_stability(spark):
    """Python md5 mirror per source + partition invariance + scan-side
    plan; a rate of 0 keeps nothing, 1e6 keeps everything."""
    from posextract_spark.operators.mldata import sample_mixture

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rates = {"src0": 1_000_000, "src1": 500_000, "src2": 0}
    out = sample_mixture(docs.select("doc_id", "source"), rates, default_rate_e6=250_000)
    plan = _plan(out)
    assert "Exchange" not in plan and "Join" not in plan
    got = {r.doc_id for r in out.collect()}
    expected = set()
    for r in docs.select("doc_id", "source").collect():
        rate = rates.get(r.source, 250_000)
        h = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16) % 1_000_000
        if h < rate:
            expected.add(r.doc_id)
    assert got == expected
    src0 = {r.doc_id for r in docs.filter(F.col("source") == "src0").collect()}
    assert src0 <= got  # rate 1e6 keeps all
    src2 = {r.doc_id for r in docs.filter(F.col("source") == "src2").collect()}
    assert not (src2 & got)  # rate 0 keeps none
    reparted = {
        r.doc_id
        for r in sample_mixture(
            docs.select("doc_id", "source").repartition(17), rates, default_rate_e6=250_000
        ).collect()
    }
    assert got == reparted


# --- KG negative sampling -----------------------------------------------------


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _ph64(s: str) -> int:
    return int(_md5_hex(s)[:15], 16)


def brute_negatives(rows, k, n_buckets, seed):
    """Pure-Python mirror of kg_negative_samples over (src, pred, dst) rows."""
    trip = sorted(set(rows))
    vocab = sorted({s for s, _, _ in trip} | {d for _, _, d in trip})
    buckets = {}
    for e in vocab:
        buckets.setdefault(_ph64(e) % n_buckets, []).append(e)
    known = set(trip)
    out = []
    for s, p, d in trip:
        for i in range(k):
            b = _ph64(f"{seed}|{s}|{p}|{d}|{i}") % n_buckets
            cand = buckets.get(b)
            if not cand:
                continue
            e = min(cand, key=lambda c: (_md5_hex(f"{seed}|{s}|{p}|{d}|{i}|{c}"), c))
            if (s, p, e) not in known:
                out.append((s, p, d, i, e))
    return sorted(out)


def _neg_rows(sdf):
    return sorted(
        (r["src"], r["predicate"], r["dst"], r["neg_idx"], r["neg_dst"])
        for r in sdf.collect()
    )


def test_negative_samples_semantics(spark):
    from posextract_spark.operators.mldata import kg_negative_samples

    rows = [("a", "p", "b"), ("a", "p", "c"), ("b", "q", "a"), ("c", "p", "a")]
    df = spark.createDataFrame(rows, ["src", "predicate", "dst"])
    got = _neg_rows(kg_negative_samples(df, n_negatives=3, n_buckets=2, seed=11))
    want = brute_negatives(rows, 3, 2, 11)
    assert got == want
    # every emitted negative is NOT a known positive (filtered setting)
    known = set(rows)
    assert all((s, p, nd) not in known for s, p, d, i, nd in got)
    # with 4 entities in 2 buckets and 12 slots, something must be emitted
    assert len(got) > 0
    # and the filter genuinely fired somewhere in this fixture: raw picks
    # minus emitted = collisions with known positives or empty buckets
    raw_slots = 4 * 3
    assert len(got) < raw_slots


def test_negative_samples_rejects_bad_params(spark):
    from posextract_spark.operators.mldata import kg_negative_samples

    df = spark.createDataFrame([("a", "p", "b")], ["src", "predicate", "dst"])
    import pytest

    with pytest.raises(ValueError):
        kg_negative_samples(df, n_negatives=0)
    with pytest.raises(ValueError):
        kg_negative_samples(df, n_buckets=0)


def test_negative_samples_random_parity(spark):
    import random

    import duckdb
    import pandas as pd

    from posextract_spark.operators.mldata import (
        kg_negative_samples,
        kg_negative_samples_sql,
    )

    for seed in (21, 22, 23):
        rng = random.Random(seed)
        ents = [f"e{i}" for i in range(rng.randint(3, 9))]
        preds = [f"p{i}" for i in range(rng.randint(1, 3))]
        rows = [
            (rng.choice(ents), rng.choice(preds), rng.choice(ents))
            for _ in range(rng.randint(3, 40))
        ]
        k = rng.randint(1, 3)
        nb = rng.choice([1, 2, 4])
        pdf = pd.DataFrame(rows, columns=["src", "predicate", "dst"])
        sdf = spark.createDataFrame(pdf)
        got = kg_negative_samples(sdf, n_negatives=k, n_buckets=nb, seed=seed)
        assert _neg_rows(got) == brute_negatives(rows, k, nb, seed)
        con = duckdb.connect()
        con.register("trip", pdf)
        want = con.execute(
            "WITH trip_base AS (SELECT * FROM trip)"
            + kg_negative_samples_sql("trip_base", n_negatives=k, n_buckets=nb, seed=seed)
        ).df()
        con.close()
        gpd = got.toPandas().reindex(sorted(want.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        gpd = gpd.sort_values(list(gpd.columns)).reset_index(drop=True)
        want = want.sort_values(list(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(gpd, want, check_dtype=True)


# --- BPE pair counts --------------------------------------------------------------


def brute_bpe(rows_text, min_count=1, lowercase=True):
    from collections import Counter

    wc = Counter()
    for t in rows_text:
        for w in (t.lower() if lowercase else t).split(" "):
            if w:
                wc[w] += 1
    pc = Counter()
    for w, n in wc.items():
        for i in range(len(w) - 1):
            pc[w[i:i + 2]] += n
    return sorted((p, n) for p, n in pc.items() if n >= min_count)


def test_bpe_pair_counts_semantics(spark):
    from posextract_spark.operators.mldata import bpe_pair_counts

    texts = ["aba ab", "ABA x", "abab"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = sorted(tuple(r) for r in bpe_pair_counts(df).collect())
    assert got == brute_bpe(texts)
    by = dict(got)
    # 'aba' occurs twice (case-folded) -> ab 2 + ba 2; 'ab' adds ab 1;
    # 'abab' adds ab 2 + ba 1. Single-char 'x' contributes nothing.
    assert by["ab"] == 5 and by["ba"] == 3
    assert "x" not in by and len(by) == 2


def test_bpe_pair_counts_duckdb_parity(spark):
    import random

    import duckdb
    import pandas as pd

    from posextract_spark.operators.mldata import bpe_pair_counts, bpe_pair_counts_sql

    rng = random.Random(9)
    texts = [
        " ".join(
            "".join(rng.choice("abcde") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(1, 8))
        )
        for _ in range(30)
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = sorted(
        tuple(r)
        for r in bpe_pair_counts(spark.createDataFrame(pdf), min_count=3).collect()
    )
    assert got == brute_bpe(texts, min_count=3)
    con = duckdb.connect()
    con.register("docs", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute(
            "WITH d AS (SELECT 1)" + bpe_pair_counts_sql("docs", min_count=3)
        ).fetchall()
    )
    con.close()
    assert got == want


# --- BPE encode (apply step) ---------------------------------------------------


def brute_bpe_encode(word, merges):
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_reference_and_oracle(spark):
    import duckdb
    import pandas as pd
    from collections import Counter

    from posextract_spark.operators.mldata import (
        bpe_encode_token_counts,
        bpe_encode_token_counts_sql,
    )

    docs = [(1, "the there aaaa banana"), (2, "the then aaa er ere Mixed")]
    # stacked merges ("e","r") then ("er","e"); ("a","a") exercises the
    # consecutive-pair boundary ("aaaa" must give [aa, aa], not [aa, a, a])
    merges = [("t", "h"), ("th", "e"), ("a", "a"), ("e", "r"), ("er", "e"), ("a", "n")]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    got = {
        r["token"]: r["n"]
        for r in bpe_encode_token_counts(spark.createDataFrame(pdf), merges).collect()
    }
    ref = Counter()
    for _, t in docs:
        for w in t.lower().split(" "):
            if w:
                ref.update(brute_bpe_encode(w, merges))
    assert got == dict(ref)
    assert got["aa"] == 3  # aaaa -> 2, aaa -> [aa, a] -> 1

    con = duckdb.connect()
    con.register("documents", pdf)
    want = dict(
        con.execute(
            "WITH _d AS (SELECT 1)" + bpe_encode_token_counts_sql(merges)
        ).fetchall()
    )
    con.close()
    assert got == want


# --- bpe_train ---------------------------------------------------------------

def _brute_bpe_train(word_counts, n_merges):
    """Reference sequential BPE trainer: max-count pair, (a, b) lexicographic
    tie-break, leftmost-first non-overlapping merge application."""
    from collections import Counter

    enc = {w: list(w) for w in word_counts}
    merges = []
    for t in range(n_merges):
        pc = Counter()
        for w, syms in enc.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += word_counts[w]
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((t, a, b, n))
        for w, syms in enc.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            enc[w] = out
    return merges


def test_bpe_train_matches_reference_trainer(spark):
    from collections import Counter

    import pandas as pd

    from posextract_spark.operators.mldata import bpe_train

    docs = [
        (1, "low low low lower lower newest newest newest newest widest"),
        (2, "newest lowest low wide wider new"),
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    wc = Counter(w for _, t in docs for w in t.split(" ") if w)
    want = _brute_bpe_train(wc, 10)
    got = [
        (r["rank"], r["a"], r["b"], r["n"])
        for r in bpe_train(spark.createDataFrame(pdf), n_merges=10)
        .orderBy("rank")
        .collect()
    ]
    assert got == want
    # later merges consume earlier merges' symbols
    produced = {a + b for _, a, b, _ in got}
    assert any(a in produced or b in produced for _, a, b, _ in got[1:])


def test_bpe_train_early_stop_and_chained_merges(spark):
    import pandas as pd

    from posextract_spark.operators.mldata import bpe_train

    # "abab" x3: merge 0 fuses (a,b) -> ab twice per word (leftmost scan),
    # merge 1 fuses (ab,ab) -> abab; then NOTHING remains -> early stop
    pdf = pd.DataFrame([(1, "abab abab abab")], columns=["doc_id", "text"])
    got = [
        (r["rank"], r["a"], r["b"], r["n"])
        for r in bpe_train(spark.createDataFrame(pdf), n_merges=5)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(0, "a", "b", 6), (1, "ab", "ab", 3)]


def test_bpe_train_duckdb_parity(spark):
    import random

    import duckdb
    import pandas as pd

    from posextract_spark.operators.mldata import bpe_train, bpe_train_sql

    rng = random.Random(13)
    vocab = ["alpha", "alphabet", "bet", "beta", "gamma", "gam", "ma", "aa"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 15))))
        for i in range(80)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = (
        bpe_train(spark.createDataFrame(pdf), n_merges=8)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute("WITH " + bpe_train_sql(8))
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
        .astype(got.dtypes.to_dict())
    )
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    assert len(got) == 8


def test_bpe_trained_vocab_composition_parity(spark):
    """Train->apply composition: encoding with bpe_train's learned merges
    must equal the oracle chain's final-level encoding (the trained
    tokenizer applied to its own training corpus)."""
    import random

    import duckdb
    import pandas as pd

    from posextract_spark.operators.mldata import (
        bpe_encode_token_counts,
        bpe_train,
        bpe_trained_vocab_sql,
    )

    rng = random.Random(29)
    vocab = ["lower", "low", "newer", "new", "er", "we", "wee"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(70)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)
    merges = [
        (r["a"], r["b"])
        for r in bpe_train(docs, n_merges=6).orderBy("rank").collect()
    ]
    got = (
        bpe_encode_token_counts(docs, merges)
        .toPandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = (
        con.execute("WITH " + bpe_trained_vocab_sql(6))
        .df()
        .sort_values("token")
        .reset_index(drop=True)
        .astype(got.dtypes.to_dict())
    )
    con.close()
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # the trained tokenizer compresses: fewer total tokens than characters
    base = sum(len(w) for _, t in rows for w in t.split() if w)
    assert (got["n"] * got["token"].str.len()).sum() == base  # lossless
    assert got["n"].sum() < base  # and actually merged something


def test_pack_bpe_spans_budget_by_real_tokenizer(spark):
    """BPE-budgeted packing (VERDICT r6 item 4): per-doc n_tokens must
    equal the merge chain's actual per-word token counts re-aggregated
    (Python replay), full bins sum to exactly budget, and the counts
    differ from the whitespace proxy (the composition matters)."""
    from collections import defaultdict

    from posextract_spark.operators.mldata import (
        bpe_doc_token_counts,
        pack_bpe_sequence_spans,
    )

    merges = [("e", "r"), ("t", "h"), ("th", "e"), ("a", "n")]
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = 64

    def bpe_len(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    counts = {
        r.doc_id: r.n_tokens
        for r in bpe_doc_token_counts(docs, merges).collect()
    }
    ws_differs = 0
    for row in docs.select("doc_id", "text").collect():
        words = [w for w in row.text.lower().split(" ") if w]
        if not words:
            assert row.doc_id not in counts
            continue
        expect = sum(bpe_len(w) for w in words)
        assert counts[row.doc_id] == expect, row.doc_id
        if expect != len(words):
            ws_differs += 1
    assert ws_differs > 0  # BPE counts are not the whitespace proxy

    spans = pack_bpe_sequence_spans(docs, merges, budget=budget).collect()
    per_bin = defaultdict(int)
    per_doc = defaultdict(int)
    for r in spans:
        per_bin[(r.bucket, r.seq_bin)] += r.tok_end - r.tok_start
        per_doc[r.doc_id] += r.tok_end - r.tok_start
    assert per_doc == {d: n for d, n in counts.items() if n > 0}
    last_bin = defaultdict(int)
    for bucket, seq_bin in per_bin:
        last_bin[bucket] = max(last_bin[bucket], seq_bin)
    for (bucket, seq_bin), filled in per_bin.items():
        if seq_bin < last_bin[bucket]:
            assert filled == budget, (bucket, seq_bin, filled)


def test_curation_funnel_monotone_and_consistent(spark):
    from pyspark.sql import functions as F

    from posextract_spark.operators.mldata import curation_funnel_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 29 == 0)
    rows = sorted(
        curation_funnel_report(docs, ev).collect(), key=lambda r: r.stage_idx
    )
    assert [r.stage for r in rows] == [
        "raw", "quality_kept", "dedup_survivors", "decontaminated",
    ]
    counts = [r.n_docs for r in rows]
    assert counts[0] == docs.count()
    # a funnel only narrows
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts


def test_curriculum_order_buckets_monotone_in_score(spark):
    from posextract_spark.operators.mldata import curriculum_order

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {r.doc_id: r.bucket for r in curriculum_order(docs, "n_chars").collect()}
    scores = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    # bucket is monotone non-decreasing in score
    by_score = sorted(scores, key=lambda d: (scores[d], d))
    buckets = [out[d] for d in by_score]
    assert buckets == sorted(buckets)
    assert min(buckets) == 0
    assert max(buckets) <= 9


def test_mixture_plan_honors_shares_and_capacity(spark):
    from pyspark.sql import functions as F

    from posextract_spark.operators.mldata import mixture_plan

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j", "big"),     # 10 tokens
            (2, "a b c d e f g h i j", "big"),     # 20 total
            (3, "a b", "small"),                   # 2 tokens
        ],
        "doc_id bigint, text string, source string",
    )
    plan = {r.source: r for r in mixture_plan(
        docs, {"big": 500000, "small": 500000}
    ).collect()}
    # capacity limited by 'small': 2 * 1e6 // 5e5 = 4 total tokens
    assert plan["small"].planned_tokens == 2
    assert plan["small"].rate_ppm == 1000000  # fully consumed
    assert plan["big"].planned_tokens == 2
    assert plan["big"].rate_ppm == 100000  # 2 of 20
    # a source absent from the target gets rate 0, visibly
    plan2 = {r.source: r for r in mixture_plan(docs, {"big": 1000000}).collect()}
    assert plan2["small"].target_ppm == 0 and plan2["small"].rate_ppm == 0
    assert plan2["big"].rate_ppm == 1000000


def test_lsh_params_for_band_shape_targets():
    from posextract_spark.operators.dedup import lsh_params_for

    assert lsh_params_for(500000) == (2, 4)   # r=2: s* = 0.5
    assert lsh_params_for(900000) == (8, 1)   # steepest available
    assert lsh_params_for(100000) == (1, 8)   # catch-everything
    import pytest

    with pytest.raises(ValueError):
        lsh_params_for(0)
