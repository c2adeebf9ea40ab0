"""SemDeDup-quality harness (the semantic-dedup analogue of
tools/dedup_quality.py): plants semantic near-duplicates with KNOWN
noise levels in a controlled embedding corpus and measures, per
(threshold, k) configuration:

  * recall    — fraction of planted near-dup PARTNERS that were pruned
  * precision — fraction of pruned vectors that are planted partners
  * split%    — planted pairs whose members landed in DIFFERENT k-means
                clusters (SemDeDup's structural failure mode: a split
                pair can never be pruned, whatever the threshold)
  * keep policy check — for pruned pairs, the kept member is the one
    farther from its centroid (the paper's policy), counted exactly

Controlled corpus (deterministic, numpy seeded — no external data):
``n_base`` unit vectors; for the first ``n_dup`` of them a partner =
base + gaussian noise scaled to hit a target cosine (~0.97/0.90/0.80
tiers, one tier per partner index mod 3); the rest are distractors.
Near-random 64-dim vectors pairwise cos ~N(0, 1/8), so a 0.7 threshold
cleanly separates planted structure from background.

Writes a section to SEMDEDUP_QUALITY.md.
Usage: python3 tools/semdedup_quality.py [--n-base 2000] [--n-dup 300]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
#: cosine tiers planted for partner i (i mod 3 picks the tier)
NOISE_TIERS = (0.97, 0.90, 0.80)


def planted_corpus(n_base: int, n_dup: int):
    """(rows, truth): rows = (vec_id, embedding); partner of base i is
    id n_base + i; truth maps partner id -> (base id, planted cos)."""
    rng = np.random.default_rng(12345)
    base = rng.standard_normal((n_base, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(n_base)]
    truth = {}
    for i in range(n_dup):
        target = NOISE_TIERS[i % len(NOISE_TIERS)]
        # v = cos*b + sin*orthonormal noise -> exact planted cosine
        noise = rng.standard_normal(DIM)
        noise -= noise.dot(base[i]) * base[i]
        noise /= np.linalg.norm(noise)
        v = target * base[i] + np.sqrt(1.0 - target * target) * noise
        pid = n_base + i
        rows.append((int(pid), [float(x) for x in v]))
        truth[pid] = (i, target)
    return rows, truth


def evaluate(spark, rows, truth, k: int, threshold_e6: int):
    from posextract_spark.operators.similarity import (
        ivf_assign,
        kmeans_centroids,
        semdedup_survivors,
    )

    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = kmeans_centroids(df, k=k, n_iter=2)
    surv = {
        r.vec_id for r in semdedup_survivors(
            df, threshold_e6=threshold_e6, centroids=cents
        ).collect()
    }
    asg = {
        r.vec_id: (r.centroid_id, r.sim_e6)
        for r in ivf_assign(df, centroids=cents).collect()
    }
    all_ids = {r[0] for r in rows}
    pruned = all_ids - surv
    per_tier = {}
    split = 0
    keep_policy_violations = 0
    for pid, (b, target) in truth.items():
        t = per_tier.setdefault(target, {"n": 0, "hit": 0})
        t["n"] += 1
        # the planted pair counts as found if EITHER member was pruned
        if pid in pruned or b in pruned:
            t["hit"] += 1
        if asg[pid][0] != asg[b][0]:
            split += 1
        elif (pid in pruned) != (b in pruned):
            # keep policy: the SURVIVING member must be the one farther
            # from the centroid (csim <=), modulo id tie-break
            kept, gone = (b, pid) if pid in pruned else (pid, b)
            if asg[kept][1] > asg[gone][1]:
                keep_policy_violations += 1
    planted_members = set(truth) | {b for b, _ in truth.values()}
    tp = len([v for v in pruned if v in planted_members])
    precision = tp / len(pruned) if pruned else 1.0
    return {
        "k": k,
        "thr": threshold_e6,
        "pruned": len(pruned),
        "precision": round(precision, 3),
        "split_pct": round(100.0 * split / len(truth), 1),
        "keep_violations": keep_policy_violations,
        "recall_by_tier": {
            str(t): round(v["hit"] / v["n"], 3) for t, v in sorted(per_tier.items())
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-base", type=int, default=2000)
    ap.add_argument("--n-dup", type=int, default=300)
    ap.add_argument("--out", default="SEMDEDUP_QUALITY.md")
    args = ap.parse_args()

    from posextract_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows, truth = planted_corpus(args.n_base, args.n_dup)

    t0 = time.time()
    results = []
    for k in (8, 32, 128):
        for thr in (950000, 850000, 750000):
            r = evaluate(spark, rows, truth, k, thr)
            results.append(r)
            print("semdedup-quality:", r, file=sys.stderr)
    secs = round(time.time() - t0, 1)

    lines = [
        "# SemDeDup retrieval quality (generated by tools/semdedup_quality.py)",
        "",
        f"Controlled corpus: {args.n_base} unit 64-dim vectors, "
        f"{args.n_dup} planted partners at exact cosine tiers "
        f"{list(NOISE_TIERS)} (one tier per partner mod 3); distractor "
        "background pairwise cos ~N(0, 1/8). A planted pair counts as "
        "RECALLED if either member is pruned; precision = pruned vectors "
        "that are planted members; split% = pairs separated by the "
        "k-means partition (structurally unprunable — the knob is k, "
        "not the threshold); keep-viol = same-cluster planted pairs where "
        "the surviving member sits CLOSER to the centroid than the pruned "
        "one — possible only when a third vector did the pruning, so a "
        "small count is expected structure, not a policy bug.",
        "",
        "| k | threshold | pruned | precision | split% | keep-viol | recall@0.97 | recall@0.90 | recall@0.80 |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in results:
        rb = r["recall_by_tier"]
        lines.append(
            f"| {r['k']} | {r['thr']} | {r['pruned']} | {r['precision']} "
            f"| {r['split_pct']} | {r['keep_violations']} | {rb.get('0.97', '-')} "
            f"| {rb.get('0.9', '-')} | {rb.get('0.8', '-')} |"
        )
    lines += ["", f"Total wall: {secs}s at local[8].", ""]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), args.out)
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
