"""Extraction options.

Mirrors the reference option struct (reference: src/posextract/util.py:55-62)
field-for-field, with identical defaults, so a user of the reference can map
their CLI flags (reference: src/posextract/grammatical_triples.py:285-299)
one-to-one.
"""

from __future__ import annotations

from typing import NamedTuple


class TripleExtractorOptions(NamedTuple):
    compound_subject: bool = True
    compound_object: bool = True
    combine_adj: bool = False
    add_auxiliary: bool = False
    prep_phrase: bool = False
    lemmatize: bool = False
    use_noun_chunks: bool = False
