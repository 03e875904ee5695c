"""Markdown structure parsing (functions/markdown.py)."""

from __future__ import annotations

from comic_text_detector_spark.functions.markdown import (
    code_lang_guess,
    extract_code_fences,
    markdown_links,
    markdown_outline,
    markdown_to_text,
)

MD = (
    "# Title\n"
    "intro with [a link](https://x.example/p) and ![img](pic.png)\n"
    "```python\ndef f():\n    return 1\n```\n"
    "## Sub ##\n"
    "*emphasis* and `code span` text\n"
    "```\nplain fence # not a heading\n```\n"
    "####### not a heading\n"
    "##\n"
    "```rust\nunterminated"
)


def _df(spark, md: str = MD):
    return spark.createDataFrame([("u", md)], "url string, md string")


def test_code_fences(spark):
    rows = sorted(
        extract_code_fences(_df(spark)).collect(),
        key=lambda r: r.fence_idx,
    )
    # the unterminated trailing rust fence emits NO row
    assert [(r.fence_idx, r.lang) for r in rows] == [(0, "python"), (1, "")]
    assert rows[0].code == "def f():\n    return 1\n"
    assert rows[1].code == "plain fence # not a heading\n"


def test_fence_info_string_only(spark):
    rows = extract_code_fences(_df(spark, "a\n```python```\nb")).collect()
    assert len(rows) == 1
    assert rows[0].lang == "python" and rows[0].code == ""


def test_outline(spark):
    rows = sorted(
        markdown_outline(_df(spark)).collect(), key=lambda r: r.line_idx
    )
    # fence interior '# not a heading' and the 7-# line emit nothing;
    # bare '##' is a real empty heading; closing '##' run stripped
    assert [(r.level, r.text) for r in rows] == [
        (1, "Title"),
        (2, "Sub"),
        (2, ""),
    ]


def test_links(spark):
    rows = sorted(
        markdown_links(_df(spark)).collect(), key=lambda r: r.link_idx
    )
    assert [(r.is_image, r.text, r.href) for r in rows] == [
        (False, "a link", "https://x.example/p"),
        (True, "img", "pic.png"),
    ]


def test_to_text(spark):
    (row,) = markdown_to_text(_df(spark)).collect()
    t = row.text
    # code gone, link -> text, image -> alt, markers stripped
    assert "def f" not in t and "plain fence" not in t
    assert "a link" in t and "https://x.example" not in t
    assert "img" in t and "pic.png" not in t
    assert "emphasis and code span text" in t
    assert "*" not in t and "`" not in t
    # the 7-# line is literal text, kept INTACT (not half-stripped)
    assert "####### not a heading" in t
    assert "Title" in t and "Sub" in t


def test_lang_guess(spark):
    df = spark.createDataFrame(
        [
            ("p", "import os\ndef f(self):\n    return self.x"),
            ("j", "const x = 1;\nconsole.log(x)"),
            ("c", '#include <stdio.h>\nint main(){printf("hi");}'),
            ("s", "SELECT a FROM t WHERE b = 1"),
            ("none", "just words, nothing else"),
            # tie: one python + one js marker -> priority says python
            ("tie", "import x\nconst y = 1"),
        ],
        "id string, code string",
    )
    got = {r.id: (r.lang_guess, r.lang_hits) for r in code_lang_guess(df).collect()}
    assert got["p"] == ("python", 3)
    assert got["j"][0] == "javascript"
    assert got["c"][0] == "c"
    assert got["s"][0] == "sql"
    assert got["none"] == ("", 0)
    assert got["tie"][0] == "python"


def test_to_text_prose_trailing_hashes_survive(spark):
    md = "# H\nsee footnote #\nrated ###\n## Sub ##\n"
    (row,) = markdown_to_text(_df(spark, md)).collect()
    # heading markers and closing runs go; PROSE hashes stay
    assert "see footnote #" in row.text
    assert "rated ###" in row.text
    assert "Sub" in row.text and "Sub ##" not in row.text
