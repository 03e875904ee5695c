"""Seeded-random invariant sweeps for the round-5 session operators:
one Spark pass over hundreds of adversarial compositions per operator
(the Spark-side analogue of test_properties.py's hypothesis kernels —
column-expression operators get their randomness batched into a single
DataFrame so the sweep costs one job, not one per example)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from comic_text_detector_spark.functions.markdown import (
    extract_code_fences,
    markdown_links,
    markdown_to_text,
)
from comic_text_detector_spark.plans.eval import token_prf

_FRAGS = [
    "```", "```python\n", "\n```\n", "# h\n", "#### ", "text ", "*em* ",
    "`code` ", "[t](u) ", "![a](b) ", "[broken ", "](x) ", "\n\n", "#",
    "word ", "```rust", "\n", " ", "## close ##\n", "(paren) ", "!bang ",
]


def _random_docs(n=300, seed=5):
    rng = random.Random(seed)
    return [
        (f"d{i}", "".join(rng.choice(_FRAGS) for _ in range(rng.randint(0, 25))))
        for i in range(n)
    ]


def test_markdown_invariants_random_compositions(spark):
    rows = _random_docs()
    df = spark.createDataFrame(rows, "url string, md string")
    delims = {u: md.count("```") for u, md in rows}

    fences = extract_code_fences(df).collect()
    per_url = {}
    for r in fences:
        per_url[r.url] = per_url.get(r.url, 0) + 1
        # fence payload is verbatim: never contains the delimiter
        assert "```" not in r.code and "```" not in r.lang
        # the info-string word never contains whitespace
        assert r.lang == r.lang.strip() and " " not in r.lang
    for u, nd in delims.items():
        # closed interiors are exactly floor(n_delims / 2)
        assert per_url.get(u, 0) == nd // 2, (u, nd)

    for r in markdown_to_text(df).collect():
        t = r.text
        assert "```" not in t
        assert "*" not in t and "`" not in t
        assert t == t.strip()
        assert "  " not in t  # whitespace fully collapsed

    for r in markdown_links(df).collect():
        assert ")" not in r.href and " " not in r.href
        assert isinstance(r.is_image, bool)


def test_token_prf_bounds_random(spark):
    rng = random.Random(11)
    vocab = ["a", "b", "c", "dd", "e"]

    def txt():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))

    rows = [(f"u{i}", txt(), txt()) for i in range(300)]
    gold = spark.createDataFrame(
        [(u, g) for u, g, _ in rows], "url string, text string"
    )
    pred = spark.createDataFrame(
        [(u, p) for u, _, p in rows], "url string, text string"
    )
    for r in token_prf(gold, pred).collect():
        assert 0 <= r.p_micro <= 1_000_000
        assert 0 <= r.r_micro <= 1_000_000
        assert 0 <= r.f1_micro <= 1_000_000
        assert r.inter_n <= min(r.gold_n, r.pred_n)
        assert r.f1_micro <= max(r.p_micro, r.r_micro)
        if r.gold_n == r.pred_n == r.inter_n and r.gold_n > 0:
            assert r.p_micro == r.r_micro == r.f1_micro == 1_000_000


def test_lpa_total_assignment_random(spark):
    from comic_text_detector_spark.operators.graph import label_propagation

    rng = random.Random(23)
    edges = [
        (f"n{rng.randint(0, 40)}", f"n{rng.randint(0, 40)}")
        for _ in range(120)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    got = {r.node: r.community for r in
           label_propagation(df, n_iter=3).collect()}
    # every node labeled exactly once, labels drawn from the node set
    assert set(got) == nodes
    assert set(got.values()) <= nodes


def test_containment_bounds_random(spark):
    from comic_text_detector_spark.operators.dedup import containment_pairs

    rng = random.Random(31)
    vocab = [f"w{k}" for k in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in containment_pairs(
        df, n=3, max_df=200, min_containment_milli=1
    ).collect():
        assert r.id_a < r.id_b
        assert 1 <= r.n_shared <= min(r.n_a, r.n_b)
        assert 0 <= r.cont_a_milli <= 1000 and 0 <= r.cont_b_milli <= 1000
