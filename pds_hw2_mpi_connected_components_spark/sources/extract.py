"""HTML -> (text, out-links) extraction.

The single pure-Python function :func:`extract_page` is the source of truth
(the reference repo has no extractor — its input is already an edge list,
/root/reference/src/converter/mtx_to_bin.c:176-245; here the "scan" operator
S1 of SURVEY.md §2.1 becomes link extraction from Common-Crawl-style HTML).

The distributed path (:func:`extract_links_df`, ``mapInPandas``,
Arrow-vectorized batches — no per-row Python *dispatch*; the regex work is
columnar over a pandas batch) calls the *same* pure function, which is what
makes the "byte-identical extracted text per url" invariant testable: pure
output == distributed output, byte for byte (BASELINE.json input_hint).
"""

from __future__ import annotations

import re
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

_HREF_RE = re.compile(rb"""<a\s[^>]*href\s*=\s*["']([^"'<>\s]+)["']""", re.IGNORECASE)
_SCRIPT_STYLE_RE = re.compile(
    rb"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_links(html: bytes) -> list[str]:
    """All href targets, document order, duplicates preserved (dedup is a
    relational decision made later — the reference also keeps duplicate
    entries at ingest, /root/reference/src/converter/mtx_to_bin.c: no uniq
    pass; we dedup in the edge build instead, SURVEY.md §2.3 U2)."""
    if html is None:
        return []
    return [m.decode("utf-8", "replace") for m in _HREF_RE.findall(html)]


def extract_text(html: bytes) -> str:
    """Visible text: drop script/style subtrees, strip tags, collapse
    whitespace. Pure function of the bytes — encoding normalization happens
    here and only here (utf-8 with replacement), so pandas/Arrow batching
    cannot change the output."""
    if html is None:
        return ""
    no_script = _SCRIPT_STYLE_RE.sub(b" ", html)
    no_tags = _TAG_RE.sub(b" ", no_script)
    text = no_tags.decode("utf-8", "replace")
    return _WS_RE.sub(" ", text).strip()


def extract_page(html: bytes) -> tuple[str, list[str]]:
    """(visible_text, out_links) — the per-row oracle."""
    return extract_text(html), extract_links(html)


EXTRACTED_SCHEMA = "url string, text string, links array<string>"


def _extract_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        htmls = pdf["html"]
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "text": [extract_text(h) for h in htmls],
                "links": [extract_links(h) for h in htmls],
            }
        )


def extract_links_df(pages: DataFrame) -> DataFrame:
    """pages(url, ..., html) -> (url, text, links array<string>).

    Arrow-batched ``mapInPandas``; column-pruned input (only url+html are
    read from parquet — check ReadSchema in .explain()).
    """
    return pages.select("url", "html").mapInPandas(_extract_batches, schema=EXTRACTED_SCHEMA)
