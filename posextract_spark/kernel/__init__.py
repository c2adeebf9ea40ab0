"""Pure-Python extraction kernel (zero Spark imports).

Operates on the neutral token-array encoding (one sentence = one list of
tokens; ``head`` is a token index, ROOT points at itself). The Spark layer
invokes these functions from Arrow-batched pandas UDFs; the pytest suite
invokes them directly on fixture parses.

Semantics are a faithful re-expression of the reference's rule engine
(reference: src/posextract/{traversal,rules,util,triple_extraction,
grammatical_triples,verb_phrase}.py), including its load-bearing quirks —
see each module's docstrings for file:line citations.
"""

from posextract_spark.kernel.model import Sentence, Token, VerbPhrase  # noqa: F401
from posextract_spark.kernel.extract import extract_triples_one  # noqa: F401
from posextract_spark.kernel.quotes import split_quotes  # noqa: F401
