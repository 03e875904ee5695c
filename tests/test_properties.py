"""Property-based robustness (hypothesis): the kernel never crashes and its
invariants hold on arbitrary byte junk and on randomly composed HTML."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from comic_text_detector_spark.functions.html import escape, tokenize, unescape
from comic_text_detector_spark.plans.extract import extract_document

FRAGMENTS = st.lists(
    st.one_of(
        st.text(max_size=40),
        st.sampled_from(
            [
                "<p>", "</p>", "<div>", "</div>", "<a href='#'>", "</a>",
                "<nav>", "</nav>", "<script>var x=1;</script>", "<!-- c -->",
                "<br/>", "<img src=x>", "<td>", "</td>", "<!doctype html>",
                "<p title='a>b'>", "<P CLASS=X>", "</SPAN>", "<", ">", "&amp;",
                "&#65;", "&bogus;", "<unclosed", "<ul><li>", "</li></ul>",
            ]
        ),
    ),
    max_size=30,
)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=512))
def test_tokenize_arbitrary_bytes_never_crashes(b):
    nodes = tokenize(b)
    prev_end = -1
    for nd in nodes:
        assert nd.text and nd.text == " ".join(nd.text.split())
        assert nd.char_end - nd.char_start == len(nd.text)
        assert nd.char_start > prev_end
        prev_end = nd.char_end


@settings(max_examples=300, deadline=None)
@given(FRAGMENTS)
def test_extract_invariants_on_random_html(frags):
    html = "".join(frags).encode("utf-8", errors="ignore")
    text, spans = extract_document(html)
    assert text == text.strip()
    # spans slice-join reconstructs the text exactly
    assert " ".join(text[s:e] for _, s, e in spans) == text
    prev = -1
    for i, (bid, s, e) in enumerate(spans):
        assert bid == i
        assert 0 <= s < e <= len(text)
        assert s > prev
        prev = e
    if not spans:
        assert text == ""


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_escape_unescape_roundtrip(t):
    assert unescape(escape(t)) == t


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(
            blacklist_characters="<>&", blacklist_categories=("Cs",)
        ),
        min_size=41,
        max_size=120,
    )
)
def test_single_paragraph_roundtrip(t):
    """Any whitespace-normalized 41+ char text survives a <p> wrap."""
    norm = " ".join(t.split())
    if len(norm) <= 40:
        return
    html = f"<html><body><p>{norm}</p></body></html>".encode()
    text, spans = extract_document(html)
    assert text == norm
    assert len(spans) == 1
