"""Charset sniff + decode policy (functions/charset.py)."""

from comic_text_detector_spark.functions.charset import (
    decode_page_bytes,
    sniff_charset,
)


def test_bom_priority_beats_declaration():
    # a BOM wins even when a meta tag declares something else
    data = b"\xef\xbb\xbf" + b'<meta charset="windows-1252">ok'
    assert sniff_charset(data) == ("utf-8", 3)
    cs, text = decode_page_bytes(data)
    assert cs == "utf-8" and text.startswith("<meta")  # BOM stripped


def test_utf16_boms():
    for bom, name in ((b"\xff\xfe", "utf-16-le"), (b"\xfe\xff", "utf-16-be")):
        payload = "hi".encode(name)
        cs, text = decode_page_bytes(bom + payload)
        assert (cs, text) == (name, "hi")


def test_declared_aliases_and_prescan_window():
    cs, _ = decode_page_bytes(b'<meta charset="UTF8">x')
    assert cs == "utf-8"
    cs, _ = decode_page_bytes(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=ISO-8859-1">\xe9'
    )
    assert cs == "latin-1"
    # a declaration AFTER the 1024-byte prescan window is not seen
    far = b"<p>" + b"x" * 1100 + b'<meta charset="windows-1252">\x93'
    cs, _ = decode_page_bytes(far)
    assert cs == "cp1252"  # via fallback (utf-8 validation fails), not decl


def test_lying_declaration_falls_through():
    # declares utf-16-be but the payload is ODD-length ascii (29 bytes)
    # → utf-16 decode raises on the truncated code unit → validation
    # chain resolves utf-8. (An even-length ascii payload would decode
    # as utf-16 garbage "successfully" — utf-16 only fails on length or
    # surrogate errors; that imprecision is inherent to declarations.)
    cs, text = decode_page_bytes(b'<meta charset="utf-16be">abc.')
    assert len(b'<meta charset="utf-16be">abc.') % 2 == 1
    assert cs == "utf-8" and text.endswith("abc.")


def test_unknown_declaration_ignored():
    cs, _ = decode_page_bytes(b'<meta charset="klingon-8">plain')
    assert cs == "utf-8"


def test_validation_and_fallbacks():
    assert decode_page_bytes(b"just ascii") == ("utf-8", "just ascii")
    cs, text = decode_page_bytes(b"caf\xc3\xa9")  # valid utf-8
    assert (cs, text) == ("utf-8", "café")
    cs, text = decode_page_bytes(b"smart \x93q\x94")  # cp1252 quotes
    assert (cs, text) == ("cp1252", "smart “q”")
    # 0x81 is a cp1252 hole → latin-1 (never fails)
    cs, text = decode_page_bytes(b"odd \x81 byte")
    assert cs == "latin-1" and text == "odd \x81 byte"


def test_none_and_empty():
    assert decode_page_bytes(None) == ("", "")
    assert decode_page_bytes(b"") == ("utf-8", "")


def test_fix_mojibake_text_kernel():
    """Pure-kernel truth table: single repair, hole-byte curly quote,
    double-encoded fixpoint, and the two must-not-touch cases."""
    from comic_text_detector_spark.functions.charset import (
        fix_mojibake_text,
    )

    assert fix_mojibake_text("caf\u00c3\u00a9 n\u00c2\u00b05") == (
        "caf\u00e9 n\u00b05", True
    )
    # 'a\u0302\u20ac' + U+009D is a mojibake'd RIGHT double quote whose
    # middle byte is cp1252's 0x9D hole: the browser-table inverse
    # (hole bytes <-> C1 controls) must round-trip it
    assert fix_mojibake_text(
        "\u00e2\u20ac\u0153q\u00e2\u20ac\u009d"
    ) == ("\u201cq\u201d", True)
    assert fix_mojibake_text("\u00c3\u0192\u00c2\u00a9") == (
        "\u00e9", True  # double-encoded: repaired to fixpoint
    )
    assert fix_mojibake_text("plain ascii") == ("plain ascii", False)
    assert fix_mojibake_text("na\u00efve caf\u00e9") == (
        "na\u00efve caf\u00e9", False  # genuine accents: untouched
    )
    assert fix_mojibake_text("\u4e2d\u6587") == (
        "\u4e2d\u6587", False  # outside cp1252's image: not mojibake
    )
    assert fix_mojibake_text(None) == ("", False)
    assert fix_mojibake_text("") == ("", False)


def test_fix_mojibake_dataframe(spark):
    from comic_text_detector_spark.functions.charset import fix_mojibake

    df = spark.createDataFrame(
        [(1, "caf\u00c3\u00a9"), (2, "ok"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in fix_mojibake(df).collect()}
    assert rows[1].text == "caf\u00e9" and rows[1].was_mojibake
    assert rows[2].text == "ok" and not rows[2].was_mojibake
    assert rows[3].text == "" and not rows[3].was_mojibake
