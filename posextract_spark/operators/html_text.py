"""HTML -> text extraction (byte-identical contract per url).

Re-expresses the reference's Wikipedia article extractor
(reference: eval/generate-datasets/generate_wikipedia_dataset.py:18-59)
with the stdlib html.parser (bs4 is not a dependency):

- only <p> elements inside <section> elements contribute;
- a section whose first <h2> has id in {References, See_also,
  External_links, References_2} or an id containing 'link' is dropped
  (the reference reads the *first* h2 anywhere in the section);
- per paragraph: remove '|', remove '[...]' and '(...)' spans with GREEDY
  regexes (first opener to last closer — reference quirk), collapse runs
  of spaces, drop paragraphs with fewer than 5 ' '-separated fields
  (split(' '), so empty fields count — reference quirk);
- paragraphs join with ' '; the <title> text is returned separately.

Faithfulness notes:
- the reference's asbox-body check (generate_wikipedia_dataset.py:33-34)
  compares bs4's class *list* to a string and therefore never fires; we
  reproduce that (no asbox filtering) and expose ``asbox_filter=True`` for
  the intended semantics;
- a section whose h2 lacks an id crashes the reference ('link' in None);
  we skip the id checks instead (our corpora always set ids).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

IGNORED_SECTIONS = ("References", "See_also", "External_links", "References_2")

_BRACKETS_RE = re.compile(r"\[.+\]")
_PARENS_RE = re.compile(r"\(.+\)")
_SPACES_RE = re.compile(r" +")


class _PageParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.title_parts: List[str] = []
        self.sections: List[dict] = []
        self._in_title = False
        self._section: Optional[dict] = None
        self._p: Optional[dict] = None
        self._h2_pending = False

    def handle_starttag(self, tag, attrs):
        attrs = dict(attrs)
        if tag == "title":
            self._in_title = True
        elif tag == "section":
            self._section = {"h2_id": None, "h2_seen": False, "paragraphs": []}
        elif tag == "h2" and self._section is not None:
            if not self._section["h2_seen"]:
                self._section["h2_seen"] = True
                self._section["h2_id"] = attrs.get("id")
            self._h2_pending = True
        elif tag == "p" and self._section is not None:
            self._p = {"class": attrs.get("class"), "text": []}

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        elif tag == "h2":
            self._h2_pending = False
        elif tag == "p" and self._p is not None and self._section is not None:
            self._section["paragraphs"].append(
                (self._p["class"], "".join(self._p["text"]))
            )
            self._p = None
        elif tag == "section" and self._section is not None:
            self.sections.append(self._section)
            self._section = None

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        elif self._p is not None:
            self._p["text"].append(data)


def extract_text_pure(html: str, asbox_filter: bool = False) -> Tuple[str, str]:
    """(title, full_text) — the pure function; also used by the synthetic
    pages generator to stamp the golden text column."""
    parser = _PageParser()
    parser.feed(html)

    p_list: List[str] = []
    for section in parser.sections:
        h2_id = section["h2_id"]
        if section["h2_seen"] and h2_id is not None:
            if h2_id in IGNORED_SECTIONS:
                continue
            if "link" in h2_id:
                continue
        for p_class, p_text in section["paragraphs"]:
            if asbox_filter and p_class == "asbox-body":
                continue
            p_text = p_text.replace("|", "")
            p_text = _BRACKETS_RE.sub("", p_text)
            p_text = _PARENS_RE.sub("", p_text)
            p_text = _SPACES_RE.sub(" ", p_text)
            if len(p_text.split(" ")) < 5:
                continue
            p_list.append(p_text)

    return "".join(parser.title_parts), " ".join(p_list)


def extract_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text", asbox_filter: bool = False
) -> DataFrame:
    """Arrow-batched html(BINARY) -> text(STRING). One scan-side pandas UDF;
    embarrassingly parallel, no shuffle."""

    @F.pandas_udf(StringType())
    def udf(htmls: pd.Series) -> pd.Series:
        out = []
        for h in htmls:
            if h is None:
                out.append("")
                continue
            if isinstance(h, (bytes, bytearray)):
                h = h.decode("utf-8", errors="replace")
            out.append(extract_text_pure(h, asbox_filter=asbox_filter)[1])
        return pd.Series(out)

    return df.withColumn(out_col, udf(F.col(html_col)))
