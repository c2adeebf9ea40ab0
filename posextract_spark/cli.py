"""CLI parity with the reference's __main__ surfaces.

Mirrors the reference flag set (reference: src/posextract/grammatical_triples.py:275-312)
so a user can move a CLI invocation across unchanged:

    python -m posextract_spark.cli triples \
        --input-file in.csv --data-column text --id-column id \
        --file-delimiter comma --output out_dir \
        [--post-combine-adj --lemma --add-auxiliary --prep-phrase
         --no-compound-subject --no-compound-object --use-noun-chunks
         --input-filters rules.posrule]

Differences by design (SURVEY.md §3.2): one distributed job instead of a
row-at-a-time loop with per-row CSV appends; output is a partitioned CSV
directory written atomically. ``sentence_id`` carries the id column like
the reference (grammatical_triples.py:366-367). adj_noun / subj_verb
subcommands mirror adj_noun_pairs.py:124-139 / subj_verb_pairs.py:117-132.
"""

from __future__ import annotations

import argparse
import os
import sys

DELIMITERS = {"comma": ",", "pipe": "|", "tab": "\t"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="posextract-spark")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--input", type=str, help="an input string")
        sp.add_argument("--input-file", type=str, help="input csv file path")
        sp.add_argument("--output", type=str, required=True)
        sp.add_argument("--data-column", type=str, default=None)
        sp.add_argument("--id-column", type=str, default=None)
        sp.add_argument(
            "--file-delimiter", default="comma", choices=["comma", "pipe", "tab"]
        )
        sp.add_argument("--lemma", action="store_true")
        sp.add_argument("--verbose", action="store_true")
        sp.add_argument("--parser", default="auto", help="parse provider (auto/spacy/svo/template)")
        sp.add_argument("--master", default=None)

    t = sub.add_parser("triples")
    common(t)
    t.add_argument("--input-filters", type=str, help=".posrule file or directory")
    t.add_argument("--post-combine-adj", action="store_true")
    t.add_argument("--add-auxiliary", action="store_true")
    t.add_argument("--prep-phrase", action="store_true")
    t.add_argument("--no-compound-subject", action="store_true")
    t.add_argument("--no-compound-object", action="store_true")
    t.add_argument("--use-noun-chunks", action="store_true")

    for name in ("adj-noun", "subj-verb"):
        sp = sub.add_parser(name)
        common(sp)
        sp.add_argument(
            "--letter-case", default="default", choices=["default", "upper", "lower"]
        )
        sp.add_argument(
            "--no-keep",
            action="store_true",
            help="emit only the pair columns (reference keep=None variant, "
            "subj_verb_pairs.py:21-31)",
        )
    return p


def _load_input(spark, args, delimiter):
    from pyspark.sql import functions as F

    if args.input_file:
        if args.data_column is None:
            sys.exit("Invalid arguments: Must specify column name for data using --data-column")
        df = (
            spark.read.option("header", "true")
            .option("sep", delimiter)
            .csv(args.input_file)
        )
        cols = [args.data_column] + ([args.id_column] if args.id_column else [])
        df = df.select(*cols)  # column pruning, like usecols= in the reference
        if args.id_column:
            df = df.withColumnRenamed(args.id_column, "sentence_id")
        else:
            df = df.withColumn("sentence_id", F.monotonically_increasing_id())
        return df.withColumnRenamed(args.data_column, "_text")
    elif args.input is not None:
        return spark.createDataFrame([(0, args.input)], "sentence_id long, _text string")
    sys.exit("Please provide either an input string or an input file")


def _collect_filter_paths(path: str):
    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        out = []
        for dirpath, _, filenames in os.walk(path):
            out.extend(os.path.join(dirpath, fn) for fn in filenames if fn.endswith(".posrule"))
        return sorted(out)
    raise FileNotFoundError(path)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    delimiter = DELIMITERS[args.file_delimiter]

    from posextract_spark.session import build_session

    spark = build_session(app_name=f"posextract-{args.command}", master=args.master)
    df = _load_input(spark, args, delimiter)

    if args.command == "triples":
        from posextract_spark.operators.triples import extract_triples
        from posextract_spark.options import TripleExtractorOptions
        from posextract_spark.posrule import files_filter_column

        options = TripleExtractorOptions(
            compound_subject=not args.no_compound_subject,
            compound_object=not args.no_compound_object,
            combine_adj=args.post_combine_adj,
            add_auxiliary=args.add_auxiliary,
            prep_phrase=args.prep_phrase,
            lemmatize=args.lemma,
            use_noun_chunks=args.use_noun_chunks,
        )
        flt = (
            files_filter_column(_collect_filter_paths(args.input_filters))
            if args.input_filters
            else None
        )
        out = extract_triples(
            df,
            text_col="_text",
            id_cols=["sentence_id"],
            options=options,
            provider=args.parser,
            provider_kwargs={"use_noun_chunks": True} if (args.use_noun_chunks and args.parser == "spacy") else {},
            posrule_filter=flt,
        ).drop("subject_token_text", "verb_token_text", "object_token_text")
    elif args.command == "adj-noun":
        from posextract_spark.operators.pairs import extract_adj_noun_pairs

        out = extract_adj_noun_pairs(
            df, text_col="_text", id_cols=["sentence_id"],
            lemmatize=args.lemma, letter_case=args.letter_case, provider=args.parser,
            provider_kwargs={"disable_ner": True} if args.parser == "spacy" else {},
            keep=not args.no_keep,
        )
    else:
        from posextract_spark.operators.pairs import extract_subj_verb_pairs

        out = extract_subj_verb_pairs(
            df, text_col="_text", id_cols=["sentence_id"],
            lemmatize=args.lemma, letter_case=args.letter_case, provider=args.parser,
            provider_kwargs={"disable_ner": True} if args.parser == "spacy" else {},
            keep=not args.no_keep,
        )

    if args.verbose:
        # count from the cached frame the write just produced — not a second
        # full extraction job re-reading the output CSV (VERDICT r01).
        out = out.persist()
    out.write.mode("overwrite").option("header", "true").option("sep", delimiter).csv(
        args.output
    )
    if args.verbose:
        print("Number of extractions: %d" % out.count())
        out.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
