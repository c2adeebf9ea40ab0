"""Pure-python shim of the spaCy (and lark) surfaces the reference imports.

Purpose: load the *actual reference source* from /root/reference (patched
only for its documented indentation defect, SURVEY.md §0.1.1) and run its
extraction on the same token trees our kernel consumes — a differential
P/R harness without spaCy in the sandbox (tools/differential.py).

Faithful details that matter:
- symbols are plain strings, so ``token.dep == nsubj`` works with our
  string-labeled tokens;
- ``Token.children`` returns a FRESH GENERATOR per property access, and the
  reference's ``children = token.children`` then exhausts it — preserving
  the dead 'failed to' branch semantics (reference: util.py:121-131);
- ``DependencyMatcher`` implements generic one-edge '>' patterns, which is
  the only REL_OP the reference registers (verb_phrase.py:164-299).

This shim exists ONLY for the differential harness; the engine itself never
imports it.
"""

from __future__ import annotations

import sys
import types
from typing import List

SYMBOLS = [
    # deps
    "nsubj", "nsubjpass", "dobj", "pobj", "acomp", "amod", "advmod", "attr",
    "dative", "prep", "agent", "det", "nmod", "neg", "aux", "conj", "cc",
    "ccomp", "xcomp", "pcomp", "advcl", "relcl", "acl", "csubj", "csubjpass",
    "compound", "prt", "punct", "mark", "dep",
    # pos
    "VERB", "AUX", "NOUN", "PROPN", "PRON", "ADJ", "ADV", "ADP", "PART",
    "DET", "SCONJ", "CCONJ", "PUNCT", "NUM", "SYM", "X", "INTJ", "SPACE",
]


class ShimToken:
    __slots__ = ("i", "text", "lemma_", "pos", "dep", "_head_i", "_doc")

    def __init__(self, i, text, lemma, pos, dep, head_i, doc):
        self.i = i
        self.text = text
        self.lemma_ = lemma
        self.pos = pos
        self.dep = dep
        self._head_i = head_i
        self._doc = doc

    @property
    def pos_(self):
        return self.pos

    @property
    def dep_(self):
        return self.dep

    @property
    def head(self):
        return self._doc[self._head_i]

    @property
    def children(self):
        # fresh generator per access, like spaCy
        return (t for t in self._doc._children[self.i])

    @property
    def conjuncts(self):
        root = self
        while root.dep == "conj" and root._head_i != root.i:
            root = root.head
        chain, stack, seen = [], [root], {root.i}
        while stack:
            tok = stack.pop()
            chain.append(tok)
            for child in self._doc._children[tok.i]:
                if child.dep == "conj" and child.i not in seen:
                    seen.add(child.i)
                    stack.append(child)
        return tuple(t for t in chain if t.i != self.i)

    def __repr__(self):
        return self.text

    def __str__(self):
        return self.text


class ShimDoc:
    def __init__(self, rows: List[dict]):
        self._tokens = [
            ShimToken(r["i"], r["text"], r["lemma"], r["pos"], r["dep"], r["head"], self)
            for r in rows
        ]
        self._children = [[] for _ in self._tokens]
        for t in self._tokens:
            if t._head_i != t.i:
                self._children[t._head_i].append(t)

    def __iter__(self):
        return iter(self._tokens)

    def __getitem__(self, i):
        return self._tokens[i]

    def __len__(self):
        return len(self._tokens)


class ShimVocabEntry:
    def __init__(self, text):
        self.text = text


class ShimVocab:
    def __init__(self):
        self._by_id = {}

    def intern(self, name: str) -> int:
        mid = hash(name) & 0x7FFFFFFF
        self._by_id[mid] = ShimVocabEntry(name)
        return mid

    def __getitem__(self, mid):
        return self._by_id[mid]


class DependencyMatcher:
    """Generic evaluator for the one-edge '>' patterns the reference adds."""

    def __init__(self, vocab: ShimVocab):
        self.vocab = vocab
        self._patterns = []  # (match_id, [subpatterns])

    def add(self, name, patterns):
        mid = self.vocab.intern(name)
        self._patterns.append((mid, patterns))

    @staticmethod
    def _attrs_match(token, attrs):
        for k, v in attrs.items():
            if k == "POS" and token.pos != v:
                return False
            if k == "DEP" and token.dep != v:
                return False
        return True

    def __call__(self, doc):
        matches = []
        for mid, subpatterns in self._patterns:
            for sp in subpatterns:
                anchor_spec, child_spec = sp[0], sp[1]
                assert child_spec["REL_OP"] == ">"
                for tok in doc:
                    if not self._attrs_match(tok, anchor_spec["RIGHT_ATTRS"]):
                        continue
                    for child in doc._children[tok.i]:
                        if self._attrs_match(child, child_spec["RIGHT_ATTRS"]):
                            matches.append((mid, [tok.i, child.i]))
        return matches


class ShimNLP:
    def __init__(self):
        self.vocab = ShimVocab()

    def add_pipe(self, name):  # pragma: no cover - options not exercised
        pass

    def remove_pipe(self, name):  # pragma: no cover
        pass

    def __call__(self, text):
        raise NotImplementedError("shim cannot parse; feed ShimDoc to extract_one")


_NLP_SINGLETON = ShimNLP()


def install() -> None:
    """Install fake spacy/lark modules into sys.modules (idempotent)."""
    if "spacy" in sys.modules and getattr(sys.modules["spacy"], "__shim__", False):
        return

    spacy = types.ModuleType("spacy")
    spacy.__shim__ = True
    spacy.load = lambda *a, **k: _NLP_SINGLETON

    symbols = types.ModuleType("spacy.symbols")
    for name in SYMBOLS:
        setattr(symbols, name, name)
    symbols.__all__ = list(SYMBOLS)

    tokens_mod = types.ModuleType("spacy.tokens")
    tokens_mod.Token = ShimToken
    tokens_mod.Doc = ShimDoc
    tokens_mod.__all__ = ["Token", "Doc"]

    matcher_mod = types.ModuleType("spacy.matcher")
    matcher_mod.DependencyMatcher = DependencyMatcher
    matcher_mod.__all__ = ["DependencyMatcher"]

    spacy.symbols = symbols
    spacy.tokens = tokens_mod
    spacy.matcher = matcher_mod

    lark = types.ModuleType("lark")

    class _Lark:
        def __init__(self, *a, **k):
            pass

        def parse(self, *a, **k):  # pragma: no cover
            raise NotImplementedError("lark shim: posrule parsing not supported")

    class _Transformer:
        def transform(self, *a, **k):  # pragma: no cover
            raise NotImplementedError

    lark.Lark = _Lark
    lark.Token = ShimVocabEntry  # only isinstance()-checked in transformer paths
    visitors = types.ModuleType("lark.visitors")
    visitors.Transformer = _Transformer
    lark.visitors = visitors

    sys.modules["spacy"] = spacy
    sys.modules["spacy.symbols"] = symbols
    sys.modules["spacy.tokens"] = tokens_mod
    sys.modules["spacy.matcher"] = matcher_mod
    sys.modules["lark"] = lark
    sys.modules["lark.visitors"] = visitors
