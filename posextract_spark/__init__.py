"""posextract_spark — a PySpark-native knowledge-graph construction engine.

Re-expresses the query semantics of the reference library
(stephbuon/posextract, at /root/reference) as a distributed Spark
DataFrame pipeline:

  pages (url, warc_ts, html, text, lang)
    -> html->text extraction        (operators.html_text)
    -> quote segmentation           (kernel.quotes via operators.triples)
    -> dependency parse             (parse.* providers, batched in pandas UDFs)
    -> triple extraction kernel     (kernel.*, rules 1-12 of the reference)
    -> posrule filtering            (posrule.* compiled to Catalyst Columns)
    -> entity linking               (operators.linking, broadcast join)
    -> canonicalization             (operators.canonicalize, connected components)
    -> graph materialize            (operators.graph, nodes/edges tables)

plus training-data-pipeline operators (dedup, similarity search, text
quality) under operators/.

Everything row-level NLP lives inside Arrow-batched pandas UDFs; all
relational work (filters, joins, aggregation, dedup) is native Spark SQL
so Catalyst can optimize it.
"""

__version__ = "0.1.0"

from posextract_spark.options import TripleExtractorOptions  # noqa: F401
