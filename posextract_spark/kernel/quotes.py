"""Quote-aware document segmentation (reference: src/posextract/util.py:187-201).

Recursively splits on double-quoted spans of >=3 whitespace-separated words.
Quirks preserved exactly:
- a prefix before the quote is only yielded when the quote starts past
  index 1 (``start > 1``) — a 1-char prefix is dropped;
- the remainder skips one character past the closing quote (``end + 1``);
- empty input yields nothing.
"""

from __future__ import annotations

import re
from typing import Iterator, List

_QUOTE_RE = re.compile(r"\"((?:\s*[^\s]+\s+){2,}(?:[^\s]+\s*))\"")


def split_quotes(document: str) -> Iterator[str]:
    if not document:
        return
    match = _QUOTE_RE.search(document)
    if not match:
        yield document
    else:
        start, end = match.span()
        if start > 1:
            yield document[:start]
        yield from split_quotes(match.group(1))
        yield from split_quotes(document[end + 1:])


def split_quotes_list(document: str) -> List[str]:
    return list(split_quotes(document))
