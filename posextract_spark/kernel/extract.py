"""Per-sentence extraction driver (reference: src/posextract/grammatical_triples.py:195-238)."""

from __future__ import annotations

from typing import Callable, List, Optional

from posextract_spark.kernel.model import Sentence
from posextract_spark.kernel.postprocess import (
    add_auxiliary_verb,
    attach_prep_phrase,
    combine_adjectives,
    dedup_triples,
    expand_transitively,
    resolve_coreferences,
)
from posextract_spark.kernel.traversal import graph_tokens
from posextract_spark.kernel.triple import TripleExtraction
from posextract_spark.options import TripleExtractorOptions


def extract_triples_one(
    sent: Sentence,
    options: Optional[TripleExtractorOptions] = None,
    filters: Optional[List[Callable[[TripleExtraction], bool]]] = None,
    flatten: bool = True,
):
    """Extract triples from one parsed sentence.

    Stage order is the reference's exactly (grammatical_triples.py:201-236):
    traverse -> dedup -> transitive conj/acomp expansion -> optional
    combine-adj -> dedup -> per-triple coref/aux/prep-phrase -> filters ->
    flatten.

    ``filters`` are python-callable predicates over the *unflattened*
    TripleExtraction (reference: grammatical_triples.py:222-229 evaluates
    posrules against Token.text). The Spark pipeline normally skips kernel
    filters and applies the Catalyst-compiled equivalent after explode —
    same semantics, optimizer-visible (see posextract_spark.posrule).
    """
    if options is None:
        options = TripleExtractorOptions()

    extractions = graph_tokens(sent)
    if not extractions:
        return []
    extractions = dedup_triples(extractions)
    extractions = expand_transitively(extractions)

    if options.combine_adj:
        extractions = combine_adjectives(extractions)

    extractions = dedup_triples(extractions)

    for triple in extractions:
        resolve_coreferences(triple)
        if options.add_auxiliary:
            add_auxiliary_verb(triple)
        if options.prep_phrase:
            attach_prep_phrase(triple)

    if filters:
        extractions = [t for t in extractions if any(f(t) for f in filters)]

    if flatten:
        return [
            t.flatten(
                lemmatize=options.lemmatize,
                compound_subject=options.compound_subject,
                compound_object=options.compound_object,
            )
            for t in extractions
        ]
    return extractions
