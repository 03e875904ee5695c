"""HTML table extraction to relational rows (functions/tables.py)."""

from __future__ import annotations

from comic_text_detector_spark.functions.tables import extract_tables


def _rows(spark, html: bytes):
    df = spark.createDataFrame([("u", html)], "url string, html binary")
    return sorted(
        extract_tables(df).collect(),
        key=lambda r: (r.table_idx, r.row_idx),
    )


def test_extract_tables_planted(spark):
    html = (
        b"<p>pre</p>"
        b'<table class="wide"><tr><th>Name</th><th>Qty</th></tr>'
        b"<tr><td>apples</td><td><b>3</b></td></tr>"
        b"<tr><td></td><td>tom &amp; jerry</td></tr></table>"
        b"<div>between</div>"
        b"<table><tr><td> spaced\n  text </td></tr></table>"
        b"<p>post</p>"
    )
    rows = _rows(spark, html)
    assert [(r.table_idx, r.row_idx) for r in rows] == [
        (0, 0), (0, 1), (0, 2), (1, 0),
    ]
    hdr, r1, r2, t2 = rows
    assert hdr.is_header and hdr.cells == ["Name", "Qty"]
    # markup-wrapped cell is tag-stripped, not dropped
    assert not r1.is_header and r1.cells == ["apples", "3"]
    # empty <td></td> survives as '' (a real cell); entity decoded
    assert r2.cells == ["", "tom & jerry"]
    assert r2.n_cells == 2
    # whitespace collapsed + trimmed
    assert t2.cells == ["spaced text"] and not t2.is_header


def test_extract_tables_no_table_and_null(spark):
    df = spark.createDataFrame(
        [("a", b"<p>plain page</p>"), ("b", None)],
        "url string, html binary",
    )
    assert extract_tables(df).count() == 0


def test_extract_tables_attrs_and_case(spark):
    html = (
        b'<TABLE border="1"><TR><TD align="left">X</TD>'
        b"<TH>mixed</TH></TR></TABLE>"
    )
    rows = _rows(spark, html)
    assert len(rows) == 1
    # a row containing any <th> counts as header
    assert rows[0].is_header and rows[0].cells == ["X", "mixed"]


def test_extract_jsonld_planted(spark):
    """JSON-LD blocks: ordinal skips past non-LD scripts, object and
    bare-string author forms, malformed JSON keeps the row with
    valid=false and NULL fields."""
    from comic_text_detector_spark.functions.jsonld import extract_jsonld

    html1 = (
        "<script>var x=1;</script>"
        '<script type="application/ld+json">{"@type":"Article",'
        '"headline":"H1","author":{"name":"A B"},'
        '"datePublished":"2024-01-02","description":"d"}</script>'
        '<script type="application/ld+json" id="x">{"@type":"Product",'
        '"name":"P","author":"Bare"}</script>'
    )
    df = spark.createDataFrame(
        [
            ("u1", html1),
            ("u2", '<script type="application/ld+json">{oops</script>'),
            ("u3", "<p>none</p>"),
            ("u4", None),
        ],
        "url string, html string",
    )
    rows = sorted(
        extract_jsonld(df).collect(), key=lambda r: (r.url, r.block_idx)
    )
    assert [(r.url, r.block_idx) for r in rows] == [
        ("u1", 1), ("u1", 2), ("u2", 0),
    ]
    art, prod, bad = rows
    assert art.valid and art.ld_type == "Article"
    assert art.headline == "H1" and art.author_name == "A B"
    assert art.date_published == "2024-01-02" and art.name is None
    assert prod.ld_type == "Product" and prod.name == "P"
    assert prod.author_name == "Bare" and prod.headline is None
    assert not bad.valid and bad.ld_type is None


def test_extract_headings(spark):
    from comic_text_detector_spark.functions.tables import extract_headings

    html = (
        "<html><h1>Main &amp; Title</h1><p>x</p>"
        "<h2> Section <em>one</em> </h2>"
        "<h3></h3>"  # empty heading is a real element
        "<h2>Last</h2><p>tail</p></html>"
    )
    df = spark.createDataFrame(
        [("p", html), ("q", "<p>no headings</p>")], "url string, html string"
    )
    rows = sorted(extract_headings(df).collect(), key=lambda r: r.heading_idx)
    assert all(r.url == "p" for r in rows)
    assert [(r.level, r.text) for r in rows] == [
        (1, "Main & Title"),
        (2, "Section one"),
        (3, ""),
        (2, "Last"),
    ]
    assert [r.heading_idx for r in rows] == [0, 1, 2, 3]


def test_section_chunks(spark):
    from comic_text_detector_spark.functions.tables import section_chunks

    html = (
        "<html><p>intro text</p>"
        "<h1>Title &amp; One</h1><p>first body</p><div>more</div>"
        "<h2 class=x>Sub</h2>second body"
        "<h3>Broken<p>never closed</html>"
    )
    df = spark.createDataFrame([("p", html)], "url string, html string")
    rows = sorted(section_chunks(df).collect(), key=lambda r: r.section_idx)
    assert [(r.section_idx, r.level, r.heading, r.body) for r in rows] == [
        (0, None, None, "intro text"),
        (1, 1, "Title & One", "first body more"),
        (2, 2, "Sub", "second body"),
        # the h3 chunk has no close tag: dropped, never guessed
    ]
    # a page whose preamble is pure markup emits no preamble row
    df2 = spark.createDataFrame(
        [("q", "<html><h1>T</h1>b</html>")], "url string, html string"
    )
    rows2 = section_chunks(df2).collect()
    assert [(r.section_idx, r.heading) for r in rows2] == [(1, "T")]
