"""Token / Sentence / VerbPhrase data model.

The kernel consumes a columnar token-array encoding:

    tokens: list of (i, text, lemma, pos, dep, head)

with spaCy-convention coarse POS labels (NOUN, PROPN, PRON, VERB, AUX,
ADJ, ADV, ADP, PART, DET, SCONJ, ...) and en_core_web_sm dependency labels
(nsubj, nsubjpass, dobj, pobj, acomp, amod, advmod, attr, dative, prep,
agent, det, nmod, neg, aux, conj, cc, ccomp, xcomp, pcomp, advcl, relcl,
acl, csubj, csubjpass, compound, prt, punct, ROOT). ``head`` is a token
index; the root has ``head == i`` and ``dep == 'ROOT'``.

``Token`` mirrors the attribute surface the reference's rule engine reads
off spaCy tokens (``i``, ``text``, ``lemma_``, ``pos``, ``dep``, ``head``,
``children``, ``conjuncts`` — e.g. reference: src/posextract/traversal.py and
rules.py use exactly these). We use plain strings where spaCy uses interned
symbol ids; comparisons are string equality.

``VerbPhrase`` duck-types Token for synthetic two-token verbs, mirroring
reference: src/posextract/verb_phrase.py:8-161 (property delegation, the
membership-based ``__eq__`` at verb_phrase.py:59-63, and the ``__hash__``
at verb_phrase.py:13-14).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Union


class Token:
    __slots__ = ("i", "text", "lemma_", "pos", "dep", "head_i", "_sent")

    def __init__(self, i: int, text: str, lemma: str, pos: str, dep: str, head_i: int):
        self.i = i
        self.text = text
        self.lemma_ = lemma
        self.pos = pos
        self.dep = dep
        self.head_i = head_i
        self._sent: Optional["Sentence"] = None

    # spaCy-parity aliases (the reference reads both .dep/.pos symbols and
    # .dep_/.pos_ strings; ours are the same object).
    @property
    def dep_(self) -> str:
        return self.dep

    @property
    def pos_(self) -> str:
        return self.pos

    @property
    def head(self) -> "Token":
        return self._sent.tokens[self.head_i]

    @property
    def children(self) -> List["Token"]:
        """Children in token-index order (spaCy yields them in order)."""
        return self._sent._children[self.i]

    @property
    def conjuncts(self) -> List["Token"]:
        """All other tokens in this token's coordination chain.

        spaCy's Token.conjuncts: ascend conj edges to the chain head, then
        collect every token reachable from it through conj edges, excluding
        self. Used by rule10 (reference: src/posextract/rules.py:212-215).
        """
        root = self
        while root.dep == "conj":
            nxt = root.head
            if nxt is root:
                break
            root = nxt
        chain: List[Token] = []
        stack = [root]
        seen = {root.i}
        while stack:
            tok = stack.pop()
            chain.append(tok)
            for child in tok.children:
                if child.dep == "conj" and child.i not in seen:
                    seen.add(child.i)
                    stack.append(child)
        return [t for t in chain if t.i != self.i]

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Token({self.i}:{self.text}/{self.pos}/{self.dep}->{self.head_i})"

    def __str__(self) -> str:
        return self.text


# shared children/kid_idx value for childless tokens (immutable on purpose:
# iteration, len, indexing and reversed() all behave like an empty list)
_EMPTY = ()


class Sentence:
    """One parsed sentence: a token array wired into a tree.

    ``_soa`` is a lazily-built struct-of-arrays view (per-token bitmask
    flags + int child/head index arrays) used by the traversal hot path —
    see kernel.traversal._soa_of. Built once per sentence, it replaces
    repeated string comparisons across the ~N-verbs-per-sentence searches
    with single int ops."""

    __slots__ = ("tokens", "_children", "_kid_idx", "_soa")

    def __init__(self, tokens: Sequence[Token]):
        self.tokens: List[Token] = list(tokens)
        self._soa = None
        self._children: List[List[Token]] = [[] for _ in self.tokens]
        self._kid_idx: List[List[int]] = [[] for _ in self.tokens]
        # tokens are iterated in index order, so each child list is already
        # sorted by token index (spaCy convention) — no sort needed.
        for tok in self.tokens:
            tok._sent = self
            hi = tok.head_i
            if hi != tok.i:
                self._children[hi].append(tok)
                self._kid_idx[hi].append(tok.i)

    @classmethod
    def from_arrays(
        cls,
        words: Sequence[str],
        lemmas: Sequence[str],
        pos: Sequence[str],
        dep: Sequence[str],
        head: Sequence[int],
    ) -> "Sentence":
        """Fused construction from parallel arrays: one pass creates the
        tokens AND wires children (providers already hold these arrays;
        the Token-listcomp + re-iteration in __init__ was ~10% of
        single-core extraction)."""
        sent = cls.__new__(cls)
        n = len(words)
        tokens: List[Token] = [None] * n  # type: ignore[list-item]
        # Childless tokens (the majority) share ONE immutable empty tuple
        # instead of each allocating two empty lists — profiled at a third
        # of parse-side construction. Nothing mutates children after
        # construction (the build appends are on per-head private lists).
        children: List = [None] * n
        kid_idx: List = [None] * n
        for i in range(n):
            hi = head[i]
            tok = Token(i, words[i], lemmas[i], pos[i], dep[i], hi)
            tok._sent = sent
            tokens[i] = tok
            if hi != i:
                c = children[hi]
                if c is None:
                    children[hi] = [tok]
                    kid_idx[hi] = [i]
                else:
                    c.append(tok)
                    kid_idx[hi].append(i)
        for i in range(n):
            if children[i] is None:
                children[i] = _EMPTY
                kid_idx[i] = _EMPTY
        sent.tokens = tokens
        sent._children = children
        sent._kid_idx = kid_idx
        sent._soa = None
        return sent

    @classmethod
    def from_rows(cls, rows: Sequence) -> "Sentence":
        """Build from an iterable of (i, text, lemma, pos, dep, head) rows
        (tuples, dicts, or pyarrow/pandas struct rows)."""
        toks = []
        for r in rows:
            if isinstance(r, dict):
                toks.append(Token(int(r["i"]), r["text"], r["lemma"], r["pos"], r["dep"], int(r["head"])))
            else:
                toks.append(Token(int(r[0]), r[1], r[2], r[3], r[4], int(r[5])))
        return cls(toks)

    def children_of(self, i: int) -> List[Token]:
        return self._children[i]

    def __iter__(self) -> Iterator[Token]:
        return iter(self.tokens)

    def __getitem__(self, i: int) -> Token:
        return self.tokens[i]

    def __len__(self) -> int:
        return len(self.tokens)


class VerbPhrase:
    """Synthetic two-token verb (reference: src/posextract/verb_phrase.py:8-64).

    Duck-types Token: ``dep``/``dep_`` delegate to ``first``; ``pos`` is
    always VERB; equality against a Token is *membership* (true when the
    token is either half) — load-bearing in rules like
    ``verb_token == object_token.head`` (reference: verb_phrase.py:59-63).
    """

    kind = "base"

    def __init__(self, first: Token, second: Token):
        self.first = first
        self.second = second

    @property
    def dep(self) -> str:
        return self.first.dep

    dep_ = dep

    @property
    def pos(self) -> str:
        return "VERB"

    @property
    def children(self) -> List[Token]:
        return list(self.first.children) + list(self.second.children)

    @property
    def subject_search_root(self) -> Token:
        return self.first

    @property
    def object_search_root(self) -> Token:
        return self.second

    @property
    def head(self) -> Token:
        return self.first.head

    def __contains__(self, item) -> bool:
        return item is self.first or item is self.second

    def __eq__(self, other) -> bool:
        if isinstance(other, VerbPhrase):
            return self.first is other.first and self.second is other.second
        return other is self.first or other is self.second

    def __ne__(self, other) -> bool:
        return not self.__eq__(other)

    def __hash__(self) -> int:
        return hash((id(self.first), id(self.second)))

    @property
    def text(self) -> str:
        raise NotImplementedError

    @property
    def lemma_(self) -> str:
        raise NotImplementedError

    def __str__(self) -> str:
        return self.text


class ADVCLVerbPhrase(VerbPhrase):
    """reference: verb_phrase.py:66-85 — text/lemma come from ``second``."""

    kind = "advcl"

    @property
    def text(self) -> str:
        return self.second.text

    @property
    def lemma_(self) -> str:
        return self.second.lemma_


class ConjVerbPhrase(VerbPhrase):
    """reference: verb_phrase.py:88-107."""

    kind = "conj"

    @property
    def text(self) -> str:
        return self.second.text

    @property
    def lemma_(self) -> str:
        return self.second.lemma_


class CCompVerbPhrase(VerbPhrase):
    """reference: verb_phrase.py:110-129 — text/lemma come from ``first``;
    negation search also uses ``first`` (see negation.get_verb_neg)."""

    kind = "ccomp"

    @property
    def text(self) -> str:
        return self.first.text

    @property
    def lemma_(self) -> str:
        return self.first.lemma_


class XCompVerbPhrase(CCompVerbPhrase):
    """reference: verb_phrase.py:132-153 — joins first+second with the
    second verb's leading PART/aux child ('to') in between. Only the FIRST
    child is inspected (reference uses next(token.children))."""

    kind = "xcomp"

    def _part(self) -> str:
        kids = self.second.children
        if kids:
            child = kids[0]
            if child.pos == "PART" and child.dep == "aux":
                return f" {child.text} "
        return " "

    @property
    def text(self) -> str:
        return f"{self.first.text}{self._part()}{self.second.text}"

    @property
    def lemma_(self) -> str:
        return f"{self.first.lemma_}{self._part()}{self.second.lemma_}"


TokenLike = Union[Token, VerbPhrase]
