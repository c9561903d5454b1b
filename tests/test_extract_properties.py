"""Property-based extractor guarantees (hypothesis): never crashes, output
whitespace is always collapsed, links always parse, pure == distributed by
construction (same function object)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from pds_hw2_mpi_connected_components_spark.sources.extract import (
    extract_links,
    extract_page,
    extract_text,
)


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_extract_never_crashes_on_arbitrary_bytes(blob):
    text, links = extract_page(blob)
    assert isinstance(text, str)
    assert all(isinstance(u, str) for u in links)
    # collapsed whitespace invariant: no doubles, no leading/trailing
    assert "  " not in text
    assert text == text.strip()


@given(st.lists(st.from_regex(r"[a-z0-9./:%-]{1,30}", fullmatch=True), max_size=8),
       # exclude surrogates (Cs): they are unencodable in UTF-8, so the
       # html.encode below would fail before the extractor is even called
       st.text(alphabet=st.characters(blacklist_characters="<>&\"'",
                                      blacklist_categories=("Cs",)),
               max_size=100))
@settings(max_examples=100, deadline=None)
def test_links_roundtrip(hrefs, body):
    html = "<html><body>" + "".join(
        f'<a href="{h}">x</a>' for h in hrefs
    ) + f"<p>{body}</p></body></html>"
    got = extract_links(html.encode("utf-8"))
    assert got == hrefs  # document order, duplicates preserved


def test_script_style_stripped():
    html = b"<html><script>var x = 'SECRET';</script><style>.a{color:red}</style><p>ok</p></html>"
    assert extract_text(html) == "ok"
    assert "SECRET" not in extract_text(html)


def test_nested_and_malformed_tags():
    assert extract_text(b"<p>a<b>b</b>c</p>") == "a b c"
    assert extract_text(b"<p>unclosed <a href='x' >link") == "unclosed link"
    assert extract_text(None) == ""
    assert extract_links(None) == []
