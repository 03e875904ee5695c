"""Triage helpers — human-facing, never part of a plan.

``visualize_spans`` is the text analog of the reference's
``visualize_textblocks`` debug overlay (reference utils/textblock.py:
510-523 draws block boxes + indices onto the page image): it renders each
document's text with a caret ruler under the characters covered by spans,
so a mis-grouped block is visible at a glance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def visualize_spans(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    spans_col: str = "spans",
    max_rows: int = 10,
    width: int = 100,
) -> str:
    """Render up to ``max_rows`` documents as::

        url
          |the extracted text …|
          |^^^^^^^^^ ^^^^      | 2 spans

    Driver-side by design (``limit(max_rows)`` before collect) — a debug
    printer, not an operator.
    """
    rows = df.select(url_col, text_col, spans_col).limit(max_rows).collect()
    out: list[str] = []
    for r in rows:
        text = (r[text_col] or "")[:width]
        ruler = [" "] * len(text)
        spans = r[spans_col] or []
        for s in spans:
            for i in range(max(0, s.char_start), min(len(text), s.char_end)):
                ruler[i] = "^"
        out.append(str(r[url_col]))
        out.append(f"  |{text}|")
        out.append(f"  |{''.join(ruler)}| {len(spans)} spans")
    return "\n".join(out)
