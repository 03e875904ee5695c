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


def test_type0_identity_h_roundtrip():
    """Type0/Identity-H with a real ToUnicode CMap: CIDs are deliberately
    not Unicode code points, so extraction must resolve the font object
    graph and CMap (bfchar + bfrange paths both exercised)."""
    from comic_text_detector_spark.sources.pdf import synthesize_type0_pdf

    lines = ["hello cid world", "MIXED Case + punct: 42!", "zzz aaa"]
    for compress in (False, True):
        pdf = synthesize_type0_pdf(lines, compress=compress)
        assert b"/Type0" in pdf and b"/Identity-H" in pdf
        assert extract_pdf_text(pdf) == " ".join(lines)
    # the raw hex CIDs are NOT the text (decode really went through the CMap)
    assert b"hello" not in synthesize_type0_pdf(["hello"])


def test_type0_without_tounicode_extracts_nothing_fake():
    """A Type0 font with no ToUnicode map must not hallucinate text from
    raw CID bytes — unmapped 2-byte codes decode as latin garbage only in
    the no-cmap fallback, which applies to simple fonts, not here."""
    from comic_text_detector_spark.sources.pdf import synthesize_type0_pdf

    pdf = synthesize_type0_pdf(["some text"])
    broken = pdf.replace(b"/ToUnicode 7 0 R", b"/NoToUnicode 7 0 R")
    out = extract_pdf_text(broken)
    assert "some text" not in out


def test_tf_outside_bt_selects_font():
    """Tf is a text-state operator that persists across BT/ET and legally
    appears outside text blocks (PDF 32000-1 9.3.1): the CMap must still
    apply to strings shown in later blocks."""
    from comic_text_detector_spark.sources.pdf import synthesize_type0_pdf

    pdf = synthesize_type0_pdf(["cmap works"])
    moved = pdf.replace(b"BT /F1 12 Tf", b"/F1 12 Tf BT")
    assert b"/F1 12 Tf BT" in moved  # the rearrangement really happened
    assert extract_pdf_text(moved) == "cmap works"


def test_stream_bytes_containing_delimiters_do_not_truncate():
    """Compressed stream payloads can contain the literal bytes 'endobj' /
    'endstream'; the /Length-aware object scan must not truncate there.
    (Found by hypothesis: a 4-line Type0 doc whose zlib CMap output embeds
    'endobj', silently dropping the font map and leaking raw CIDs.)"""
    from comic_text_detector_spark.sources.pdf import (
        extract_pdf_text,
        synthesize_simple_pdf,
        synthesize_type0_pdf,
    )

    lines = ["2\x80\x97", "0\x98±¸උ⦫", "R/.¥ªć", "T-öûೖ࿌"]
    for compress in (False, True):
        assert extract_pdf_text(
            synthesize_type0_pdf(lines, compress=compress)
        ) == " ".join(lines)

    # plant the delimiters explicitly inside a correctly-Length'd stream
    pdf = synthesize_simple_pdf(["after the trap"], compress=False)
    trap = b"% endstream endobj junk"
    patched = pdf.replace(
        b"BT /F1 12 Tf", trap + b"\nBT /F1 12 Tf"
    )
    old_len = int(__import__("re").search(rb"/Length (\d+)", pdf).group(1))
    patched = patched.replace(
        b"/Length %d" % old_len, b"/Length %d" % (old_len + len(trap) + 1)
    )
    assert extract_pdf_text(patched) == "after the trap"


def test_dict_string_containing_stream_keyword():
    """A '(… stream\\n…)' literal inside an object DICT must not be taken
    for the stream keyword (review repro: the misparse swallowed every
    following object)."""
    from comic_text_detector_spark.sources.pdf import (
        synthesize_simple_pdf,
        synthesize_type0_pdf,
    )

    pdf = synthesize_simple_pdf(["hello world"], compress=True)
    trap = pdf.replace(
        b"<< /Type /Catalog", b"<< /Title (data stream\nrest) /Type /Catalog"
    )
    assert extract_pdf_text(trap) == "hello world"
    t0 = synthesize_type0_pdf(["cmap ok"])
    t0trap = t0.replace(b"<< /Type /Catalog", b"<< /T (x stream\ny) /Type /Catalog")
    assert extract_pdf_text(t0trap) == "cmap ok"


def test_orphan_stream_beside_intact_objects():
    """Crawl truncation can orphan a stream (header lost) while later
    objects survive; both must extract, in document order."""
    frag = (
        b"<< /Length 29 >>\nstream\nBT /F0 9 Tf (lost words) Tj ET\nendstream\n"
        b"5 0 obj << /Length 26 >>\nstream\nBT (and found) Tj ET\nendstream\nendobj"
    )
    assert extract_pdf_text(frag) == "lost words and found"
