"""PDF text extraction: synthesized golden round trip (plain + Flate)."""

from __future__ import annotations

from comic_text_detector_spark.sources.pdf import (
    extract_pdf_text,
    read_pdfs,
    synthesize_simple_pdf,
)


def test_pdf_roundtrip_pure():
    lines = ["Hello PDF world", "second line with (parens) and \\backslash", "third"]
    for compress in (False, True):
        pdf = synthesize_simple_pdf(lines, compress=compress)
        assert pdf.startswith(b"%PDF-1.4")
        got = extract_pdf_text(pdf)
        assert got == " ".join(lines)


def test_pdf_garbage_is_safe():
    assert extract_pdf_text(b"not a pdf at all") == ""
    assert extract_pdf_text(b"") == ""
    # corrupt flate stream skipped, plain one still extracted
    broken = (
        b"<< /Filter /FlateDecode /Length 4 >>\nstream\nXXXX\nendstream"
        b"<< /Length 20 >>\nstream\nBT (ok text) Tj ET\nendstream"
    )
    assert extract_pdf_text(broken) == "ok text"


def test_read_pdfs_spark(spark, tmp_path):
    (tmp_path / "a.pdf").write_bytes(synthesize_simple_pdf(["doc a body text"]))
    (tmp_path / "b.pdf").write_bytes(
        synthesize_simple_pdf(["doc b body text"], compress=True)
    )
    out = {r.url.split("/")[-1]: r.text for r in read_pdfs(spark, str(tmp_path)).collect()}
    assert out == {"a.pdf": "doc a body text", "b.pdf": "doc b body text"}


def test_octal_escape_rejects_digits_8_9():
    """\\8 and \\9 are not octal (ADVICE r1): the backslash is dropped, the
    digit kept, and extraction never raises on a malformed escape."""
    from comic_text_detector_spark.sources.pdf import _unescape_pdf_string

    assert _unescape_pdf_string(rb"a\8b\9c") == b"a8b9c"
    assert _unescape_pdf_string(rb"a\101\12z") == b"aA\nz"  # real octal intact
    doc = b"<< /Length 24 >>\nstream\nBT (ok\\8fine\\9) Tj ET\nendstream"
    assert extract_pdf_text(doc) == "ok8fine9"
