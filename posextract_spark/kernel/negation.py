"""Negation extractors (reference: src/posextract/util.py:110-174)."""

from __future__ import annotations

from typing import Optional, Tuple

from posextract_spark.kernel.model import Token, TokenLike, VerbPhrase, CCompVerbPhrase

_NEG_DETS = ("no", "not", "never")


def get_verb_neg(token: TokenLike) -> Tuple[Optional[Token], Optional[Token]]:
    """reference: util.py:110-142.

    Returns (neg_adverb, neg_adverb_part).

    Faithfulness note on the 'failed to X' branch (util.py:125-131): the
    reference assigns ``children = token.children`` — a *generator* for
    spaCy tokens — and exhausts it in the preceding for-loop, so
    ``next(children)`` always raises StopIteration and the branch always
    returns (None, None). It also shadows the ccomp/xcomp parent-negation
    inheritance branch for such verbs. We reproduce that observable
    behavior exactly.
    """
    if isinstance(token, CCompVerbPhrase):
        children = token.first.children
        verb_parent = token.first.head
    elif isinstance(token, VerbPhrase):
        children = token.second.children
        verb_parent = token.second.head
    else:
        children = token.children
        verb_parent = token.head

    for child in children:
        if child.dep == "neg":
            return child, None

    if verb_parent.pos == "VERB" and verb_parent.text.lower() == "failed" and token.dep == "xcomp":
        # Dead branch in the reference (exhausted generator) — preserved.
        return None, None
    elif verb_parent.pos == "VERB" and (token.dep == "ccomp" or token.dep == "xcomp"):
        for child in verb_parent.children:
            if child.dep == "neg":
                return child, None

    return None, None


def get_subject_neg(token: Token) -> Optional[Token]:
    """reference: util.py:145-152."""
    for child in token.children:
        if child.dep == "det" and child.text.lower() in _NEG_DETS:
            return child
        if child.dep == "neg":
            return child
    return None


def get_poa_neg(token: Token) -> Optional[Token]:
    """reference: util.py:155-160."""
    for child in token.children:
        if child.dep == "neg":
            return child
    return None


def get_object_neg(token: Token) -> Optional[Token]:
    """reference: util.py:163-174."""
    for child in token.children:
        if child.dep == "det" and child.text.lower() in _NEG_DETS:
            return child
        if child.dep == "neg":
            return child
    if token.head.pos == "PART" and token.head.text.lower() == "not":
        return token.head
    return None
