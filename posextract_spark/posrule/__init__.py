"""posrule filter DSL: parser + compilers.

The reference parses ``.posrule`` files with a 39-line Lark grammar
(reference: src/posextract/posrule/grammar.py) and evaluates the expression
tree per-triple in Python (parser.py:27-84). We parse with a hand-written
recursive-descent parser (lark is not a dependency) and compile to:

- a Catalyst ``Column`` predicate (evaluated JVM-side after the triple
  explode — the optimizer can push it; the reference's python post-filter
  at grammatical_triples.py:222-229 cannot be optimized),
- a python predicate over kernel TripleExtraction (for in-kernel parity),
- an ANSI-SQL string (for DuckDB oracle checks).

Semantics parity notes:
- ``PREDICATE`` refers to the *object* (reference: parser.py:37-38);
- regex literals use ``re.match`` semantics — anchored at the start only
  (parser.py:42-43) — compiled to ``rlike('^(?:...)')``;
- filters evaluate raw Token.text (pre-compound assembly), hence the
  ``*_token_text`` columns in the triples schema;
- multiple statements condense to (m1 OR m2 OR ...) AND ig1 AND ig2 ...
  (parser.py:153-178); multiple files OR at the top level
  (grammatical_triples.py:222-229).
"""

from posextract_spark.posrule.parser import parse_posrule_text, parse_posrule_file  # noqa: F401
from posextract_spark.posrule.compile import (  # noqa: F401
    to_column,
    to_python_predicate,
    to_sql,
    files_filter_column,
)
