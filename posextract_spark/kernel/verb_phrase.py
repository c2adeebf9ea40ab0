"""Verb-phrase pattern matching.

The reference registers 7 one-edge DependencyMatcher patterns across 4 named
pattern groups (reference: src/posextract/verb_phrase.py:164-299). Every
pattern is a single (anchor —dep→ child) edge with POS constraints, so a
direct scan over the token array replaces spaCy's matcher: for each pattern
group in registration order, iterate anchors in token order and their
children in order. Match tuple order is (anchor, dependent), matching the
RIGHT_ID declaration order the reference passes to the VerbPhrase
constructors (reference: src/posextract/traversal.py:114-117).
"""

from __future__ import annotations

from typing import List

from posextract_spark.kernel.model import (
    ADVCLVerbPhrase,
    CCompVerbPhrase,
    ConjVerbPhrase,
    Sentence,
    VerbPhrase,
    XCompVerbPhrase,
)

# (phrase class, anchor POS, child dep, child POS) — one row per sub-pattern,
# in the reference's registration order (verb_phrase.py:165-299).
_PATTERNS = [
    (ADVCLVerbPhrase, "AUX", "advcl", "VERB"),
    (ADVCLVerbPhrase, "VERB", "advcl", "VERB"),
    (ConjVerbPhrase, "VERB", "conj", "AUX"),
    (ConjVerbPhrase, "AUX", "conj", "VERB"),
    (CCompVerbPhrase, "VERB", "ccomp", "VERB"),
    (CCompVerbPhrase, "VERB", "ccomp", "AUX"),
    (XCompVerbPhrase, "VERB", "xcomp", "AUX"),
]


# (anchor POS, child dep, child POS) -> pattern index; the 7 rows are
# distinct triples, so one dict lookup classifies an edge.
_PATTERN_INDEX = {
    (anchor_pos, child_dep, child_pos): k
    for k, (_, anchor_pos, child_dep, child_pos) in enumerate(_PATTERNS)
}
_VP_CHILD_DEPS = frozenset({"advcl", "conj", "ccomp", "xcomp"})


def find_verb_phrases(sent: Sentence) -> List[VerbPhrase]:
    """Single pass over tokens-as-dependents (O(n) instead of 7 full
    anchor scans): each (head, child) edge is classified by one dict
    lookup. Output order is the reference's registration order exactly —
    pattern-major, then (anchor index, child index) — reproduced by
    per-pattern buckets sorted on (anchor.i, child.i); the original
    nested loop yields anchors in token order and children in index
    order, which is the same key."""
    buckets: List[List] = [[] for _ in _PATTERNS]
    tokens = sent.tokens
    any_hit = False
    for child in tokens:
        dep = child.dep
        if dep not in _VP_CHILD_DEPS:
            continue
        head = tokens[child.head_i]
        if head is child:
            continue
        k = _PATTERN_INDEX.get((head.pos, dep, child.pos))
        if k is not None:
            buckets[k].append((head, child))
            any_hit = True
    if not any_hit:
        return []
    phrases: List[VerbPhrase] = []
    for k, bucket in enumerate(buckets):
        if not bucket:
            continue
        bucket.sort(key=lambda pair: (pair[0].i, pair[1].i))
        cls = _PATTERNS[k][0]
        phrases.extend(cls(head, child) for head, child in bucket)
    return phrases
