"""Tree traversal: subject/object search and the verb visitor.

Re-expression of reference: src/posextract/traversal.py:30-205 with one
deliberate change: the reference de-duplicates candidate lists via
``list(set(...))`` (traversal.py:50-51), whose order is CPython-hash
dependent; we dedupe order-stably and sort by token index so output is
deterministic across runs and parallelism levels. P/R comparison is
unaffected (the triple *set* is identical; only which duplicate survives
first-wins dedup could differ, and those duplicates agree on (s, v, o)).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

from posextract_spark.kernel.classifiers import (
    is_object,
    is_poa,
    is_root,
    is_verb,
    should_consider_verb_phrase,
)
from posextract_spark.kernel.model import Sentence, Token, TokenLike, VerbPhrase
from posextract_spark.kernel.negation import (
    get_object_neg,
    get_poa_neg,
    get_subject_neg,
    get_verb_neg,
)
from posextract_spark.kernel.rules import RULE_FUNCS
from posextract_spark.kernel.triple import TripleExtraction
from posextract_spark.kernel.verb_phrase import find_verb_phrases

SubjectCand = Tuple[Optional[Token], Token]  # (negdet, subject)
ObjectCand = Tuple[Optional[Token], Optional[Token], Optional[Token], Token]


def subject_search(token: Token, verb_phrase: bool = False) -> List[SubjectCand]:
    """Worklist DFS over children AND parents (reference: traversal.py:161-205).

    Prunes: never descend into VERB-pos children (185-186); for verb
    phrases also skip AUX children (187-188); never ascend from a
    conj/advcl candidate into a VERB/AUX parent (195-198).
    """
    found: List[SubjectCand] = []
    visited = set()
    considering = [token]
    sent = token._sent
    children_of = sent._children
    tokens = sent.tokens

    while considering:
        candidate = considering.pop()
        ci = candidate.i
        if ci in visited:
            continue
        visited.add(ci)

        if candidate.dep in ("nsubj", "nsubjpass"):
            found.append((get_subject_neg(candidate), candidate))

        for child in children_of[ci]:
            if child.i in visited:
                continue
            if child.pos == "VERB":
                continue
            if verb_phrase and child.pos == "AUX":
                continue
            considering.append(child)

        parent = tokens[candidate.head_i]
        if parent.i not in visited:
            if (parent.pos == "VERB" or parent.pos == "AUX") and candidate.dep in ("conj", "advcl"):
                continue
            considering.append(parent)

    return found


def object_search(token: Token) -> List[ObjectCand]:
    """Worklist DFS over children only (reference: traversal.py:131-158).
    Prunes VERB/AUX-pos children (153-155)."""
    found: List[ObjectCand] = []
    visited = set()
    considering = [token]
    children_of = token._sent._children

    while considering:
        candidate = considering.pop()
        ci = candidate.i
        if ci in visited:
            continue
        visited.add(ci)

        if is_object(candidate):
            obj_negdet = get_object_neg(candidate)
            head = candidate.head
            poa = head if is_poa(head) else None
            poa_neg = get_poa_neg(poa) if poa is not None else None
            found.append((poa_neg, poa, obj_negdet, candidate))

        for child in children_of[ci]:
            if child.i in visited:
                continue
            if child.pos == "VERB" or child.pos == "AUX":
                continue
            considering.append(child)

    return found


def _dedup_sorted_subjects(subjects: List[SubjectCand]) -> List[SubjectCand]:
    seen = set()
    out = []
    for cand in subjects:
        key = (cand[0].i if cand[0] is not None else -1, cand[1].i)
        if key not in seen:
            seen.add(key)
            out.append(cand)
    out.sort(key=lambda c: c[1].i)
    return out


def _dedup_sorted_objects(objects: List[ObjectCand]) -> List[ObjectCand]:
    seen = set()
    out = []
    for cand in objects:
        key = tuple(x.i if x is not None else -1 for x in cand)
        if key not in seen:
            seen.add(key)
            out.append(cand)
    out.sort(key=lambda c: (c[3].i, c[1].i if c[1] is not None else -1))
    return out


def visit_verb(
    verb: TokenLike,
    parent_subjects: List[SubjectCand],
    parent_objects: List[ObjectCand],
) -> Iterator[TripleExtraction]:
    """reference: traversal.py:30-84 — cross product subjects x objects,
    rules 1-12 first-match-wins, then recurse into children."""
    if isinstance(verb, VerbPhrase):
        subjects = subject_search(verb.subject_search_root, verb_phrase=True)
        objects = object_search(verb.object_search_root) + parent_objects
    else:
        subjects = subject_search(verb)
        objects = object_search(verb) + parent_objects

    subjects = _dedup_sorted_subjects(subjects)
    objects = _dedup_sorted_objects(objects)

    neg_adverb, neg_adverb_part = get_verb_neg(verb)

    for subject_negdet, subject in subjects:
        for poa_neg, poa, obj_negdet, obj in objects:
            for rule in RULE_FUNCS:
                if rule(verb, subject, obj, poa):
                    yield TripleExtraction(
                        subject_negdet=subject_negdet,
                        subject=subject,
                        neg_adverb=neg_adverb,
                        neg_adverb_part=neg_adverb_part,
                        verb=verb,
                        poa_neg=poa_neg,
                        poa=poa,
                        object_negdet=obj_negdet,
                        object=obj,
                        rule=" <%s>" % rule.__name__,
                        verb_phrase=isinstance(verb, VerbPhrase),
                    )
                    break

    yield from visit_token(verb, parent_subjects=subjects)


def visit_token(token: TokenLike, parent_subjects: List[SubjectCand]) -> Iterator[TripleExtraction]:
    """reference: traversal.py:87-93 — child verbs restart with empty
    inherited context."""
    for child in token.children:
        if is_verb(child):
            yield from visit_verb(child, parent_subjects=[], parent_objects=[])
        else:
            yield from visit_token(child, [])


def graph_tokens(sent: Sentence) -> List[TripleExtraction]:
    """reference: traversal.py:96-128 — ROOT-rooted recursion, then gated
    verb-phrase visits."""
    root_verb = None
    for token in sent:
        if is_root(token):
            root_verb = token
            break
    if root_verb is None:
        return []

    extractions = list(visit_verb(root_verb, [], []))

    for vp in find_verb_phrases(sent):
        if not should_consider_verb_phrase(vp):
            continue
        extractions.extend(visit_verb(vp, [], []))

    return extractions
