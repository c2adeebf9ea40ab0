"""Recursive-descent parser for the posrule grammar.

Grammar (reference: src/posextract/posrule/grammar.py:1-39):

    start      : statement+
    statement  : (MATCH | IGNORE) rule ';'
    rule       : '(' rule ')' (op rule)*
               | equality (op rule)*
    equality   : (SUBJECT | VERB | PREDICATE) '=' literal
    literal    : 'RE<' '"' chars '"' '>' | '"' chars '"'
    op         : AND | OR

Operator chains are right-associative with NO AND/OR precedence, matching
the reference transformer's ``Expression(op, tree[0], tree[2])`` over the
right-recursive grammar (reference: posrule/parser.py:125-142, including
the parenthesized-rule re-association hack whose effect is the same right
fold). Comments ``// ...`` and whitespace are ignored.

DIVERGENCES (pinned by tests/test_posrule_paren_goldens.py): exactly one,
intentional. A parenthesized group NOT followed by an operator —
``MATCH (A);`` or a trailing ``X AND (B)`` — crashes the reference: its
re-association hack calls ``self.rule(tree[3:])`` on an empty slice and
the first isinstance check dereferences ``tree[0]`` (IndexError, surfaced
as lark VisitError; hand-derived, reference parser.py:130-142 — lark is
unavailable in-sandbox to execute it). We accept such files with the only
sensible semantics (redundant grouping). Every input the reference
survives parses to an identical expression tree here, including the
right-fold of ``( group ) op rest`` and the no-precedence chains.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Optional, Union

VARS = ("SUBJECT", "VERB", "PREDICATE")
OPS = ("AND", "OR")


@dataclass
class Equality:
    var: str  # SUBJECT | VERB | PREDICATE
    value: str
    is_regex: bool = False


@dataclass
class Expr:
    op: str  # AND | OR | IGNORE
    left: Union["Expr", Equality]
    right: Optional[Union["Expr", Equality]] = None


Node = Union[Expr, Equality]


class _Lexer:
    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def _skip_ws(self) -> None:
        while self.pos < len(self.text):
            c = self.text[self.pos]
            if c in " \t\r\n":
                self.pos += 1
            elif self.text.startswith("//", self.pos):
                nl = self.text.find("\n", self.pos)
                self.pos = len(self.text) if nl < 0 else nl + 1
            else:
                return

    def peek_word(self) -> Optional[str]:
        self._skip_ws()
        m = re.match(r"[A-Z]+", self.text[self.pos:])
        return m.group(0) if m else None

    def eat_word(self, word: str) -> None:
        self._skip_ws()
        if not self.text.startswith(word, self.pos):
            raise SyntaxError(f"expected {word!r} at {self.pos}: {self.text[self.pos:self.pos+20]!r}")
        self.pos += len(word)

    def peek_char(self) -> Optional[str]:
        self._skip_ws()
        return self.text[self.pos] if self.pos < len(self.text) else None

    def eat_char(self, c: str) -> None:
        self._skip_ws()
        if self.pos >= len(self.text) or self.text[self.pos] != c:
            raise SyntaxError(f"expected {c!r} at {self.pos}")
        self.pos += 1

    def eat_string(self) -> str:
        """Quoted string with backslash escapes (grammar.py:17-20).

        A backslash UNESCAPES only the string-level metacharacters (`\\"` ->
        `"`, `\\\\` -> `\\`); any other `\\x` is preserved verbatim so regex
        literals keep their character classes (``RE<"\\d+\\.\\w">`` must reach
        the matchers as ``\\d+\\.\\w``, not the corrupted ``d+.w``). The
        reference defines no working semantics to match: its Transformer has
        no escape_sequence handler, so lark hands ``''.join`` a Tree and any
        escape crashes with TypeError (grammar.py:19, parser.py:104-108)."""
        self.eat_char('"')
        out = []
        while self.pos < len(self.text):
            c = self.text[self.pos]
            if c == '"':
                self.pos += 1
                return "".join(out)
            if c == "\\" and self.pos + 1 < len(self.text):
                nxt = self.text[self.pos + 1]
                out.append(nxt if nxt in ('"', "\\") else "\\" + nxt)
                self.pos += 2
            else:
                out.append(c)
                self.pos += 1
        raise SyntaxError("unterminated string literal")

    def at_end(self) -> bool:
        self._skip_ws()
        return self.pos >= len(self.text)


def _parse_literal(lx: _Lexer) -> Equality:
    for var in VARS:
        if lx.peek_word() == var:
            lx.eat_word(var)
            break
    else:
        raise SyntaxError(f"expected rule variable at {lx.pos}")
    lx.eat_char("=")
    lx._skip_ws()
    if lx.text.startswith("RE<", lx.pos):
        lx.pos += 3
        value = lx.eat_string()
        lx.eat_char(">")
        return Equality(var, value, is_regex=True)
    value = lx.eat_string()
    return Equality(var, value, is_regex=False)


def _parse_rule(lx: _Lexer) -> Node:
    if lx.peek_char() == "(":
        lx.eat_char("(")
        left: Node = _parse_rule(lx)
        lx.eat_char(")")
    else:
        left = _parse_literal(lx)

    word = lx.peek_word()
    if word in OPS:
        lx.eat_word(word)
        right = _parse_rule(lx)  # right-associative fold
        return Expr(word, left, right)
    return left


def parse_posrule_text(text: str) -> Node:
    """Parse a .posrule document and condense its statements
    (reference: posrule/parser.py:145-178)."""
    lx = _Lexer(text)
    matches: List[Node] = []
    ignores: List[Node] = []
    parsed_any = False
    while not lx.at_end():
        word = lx.peek_word()
        if word == "MATCH":
            lx.eat_word("MATCH")
            matches.append(_parse_rule(lx))
        elif word == "IGNORE":
            lx.eat_word("IGNORE")
            ignores.append(Expr("IGNORE", _parse_rule(lx)))
        else:
            raise SyntaxError(f"expected MATCH or IGNORE at {lx.pos}")
        lx.eat_char(";")
        parsed_any = True
    if not parsed_any:
        raise ValueError("empty posrule document")

    return _condense(matches, ignores)


def _condense(matches: List[Node], ignores: List[Node]) -> Node:
    """(m1 OR m2 OR ...) AND ig1 AND ig2 ... (reference: parser.py:153-178)."""
    root: Optional[Node] = None
    if matches:
        root = matches[0]
        for m in matches[1:]:
            root = Expr("OR", root, m)
    if ignores:
        if root is None:
            root = ignores[0]
            rest = ignores[1:]
        else:
            rest = ignores
        for ig in rest:
            root = Expr("AND", root, ig)
    return root


def parse_posrule_file(path: str) -> Node:
    with open(path, "r") as f:
        return parse_posrule_text(f.read())
