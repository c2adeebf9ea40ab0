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

from typing import List, Optional, Tuple

from posextract_spark.kernel.classifiers import (
    is_root,
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


_OBJ_DEP_TAGS = frozenset({"dobj", "pobj", "acomp"})
_POA_DEPS = frozenset({"prep", "agent", "det", "nmod"})
_VERB_DEP_TAGS = frozenset(
    {"ccomp", "relcl", "xcomp", "acl", "advcl", "pcomp", "csubj", "csubjpass", "conj"}
)


def object_search(token: Token) -> List[ObjectCand]:
    """Worklist DFS over children only (reference: traversal.py:131-158).
    Prunes VERB/AUX-pos children (153-155). The object test is
    classifiers.is_object inlined — this is the kernel's hottest loop."""
    found: List[ObjectCand] = []
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

        dep = candidate.dep
        pos = candidate.pos
        if (
            dep in _OBJ_DEP_TAGS
            or (pos == "NOUN" and (dep == "amod" or dep == "attr"))
            or (pos == "PROPN" and dep == "attr")
            or (pos == "ADV" and dep == "advmod")
            or (pos == "PRON" and dep == "dative")
        ):
            obj_negdet = get_object_neg(candidate)
            head = tokens[candidate.head_i]
            poa = head if head.dep in _POA_DEPS else None
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


# rule tag strings precomputed once (not per emitted triple)
_RULES = tuple((f, " <%s>" % f.__name__) for f in RULE_FUNCS)


def visit_verb(
    verb: TokenLike,
    parent_subjects: List[SubjectCand],
    parent_objects: List[ObjectCand],
    out: Optional[List[TripleExtraction]] = None,
) -> List[TripleExtraction]:
    """reference: traversal.py:30-84 — cross product subjects x objects,
    rules 1-12 first-match-wins, then recurse into children.

    Appends to (and returns) ``out`` in the reference's emission order.
    Accumulator-passing instead of nested generators: `yield from` chains
    pay per-item frame delegation down the whole recursion stack (profiled
    at ~14x call amplification on web-text trees)."""
    if out is None:
        out = []
    is_vp = isinstance(verb, VerbPhrase)
    if is_vp:
        subjects = subject_search(verb.subject_search_root, verb_phrase=True)
        objects = object_search(verb.object_search_root) + parent_objects
    else:
        subjects = subject_search(verb)
        objects = object_search(verb) + parent_objects

    subjects = _dedup_sorted_subjects(subjects)
    objects = _dedup_sorted_objects(objects)

    neg_adverb, neg_adverb_part = get_verb_neg(verb)
    append = out.append

    for subject_negdet, subject in subjects:
        for poa_neg, poa, obj_negdet, obj in objects:
            for rule, tag in _RULES:
                if rule(verb, subject, obj, poa):
                    append(
                        TripleExtraction(
                            subject_negdet=subject_negdet,
                            subject=subject,
                            neg_adverb=neg_adverb,
                            neg_adverb_part=neg_adverb_part,
                            verb=verb,
                            poa_neg=poa_neg,
                            poa=poa,
                            object_negdet=obj_negdet,
                            object=obj,
                            rule=tag,
                            verb_phrase=is_vp,
                        )
                    )
                    break

    visit_token(verb, subjects, out)
    return out


def visit_token(
    token: TokenLike,
    parent_subjects: List[SubjectCand],
    out: Optional[List[TripleExtraction]] = None,
) -> List[TripleExtraction]:
    """reference: traversal.py:87-93 — child verbs restart with empty
    inherited context."""
    if out is None:
        out = []
    # classifiers.is_verb inlined (kept in sync with util.py:73-80 parity;
    # pinned by the differential) — this runs once per token in the tree.
    for child in token.children:
        dep = child.dep
        if dep == "ROOT" or (
            dep in _VERB_DEP_TAGS and not (dep == "conj" and child.pos == "PROPN")
        ):
            visit_verb(child, [], [], out)
        else:
            visit_token(child, [], out)
    return out


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

    extractions: List[TripleExtraction] = []
    visit_verb(root_verb, [], [], extractions)

    for vp in find_verb_phrases(sent):
        if not should_consider_verb_phrase(vp):
            continue
        visit_verb(vp, [], [], extractions)

    return extractions
