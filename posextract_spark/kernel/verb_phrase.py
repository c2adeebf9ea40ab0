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


def find_verb_phrases(sent: Sentence) -> List[VerbPhrase]:
    phrases: List[VerbPhrase] = []
    for cls, anchor_pos, child_dep, child_pos in _PATTERNS:
        for tok in sent:
            if tok.pos != anchor_pos:
                continue
            for child in tok.children:
                if child.dep == child_dep and child.pos == child_pos:
                    phrases.append(cls(tok, child))
    return phrases
