"""Hard-case quality floor (§5.1 metric-based evaluation applied to the
engine): on adversarial pages the extractor need not be byte-identical, but
its character-level coverage must clear a floor measured with exact
char-interval precision/recall (the pixel-P/R analog, train_seg.py:38-55)."""

from __future__ import annotations

from comic_text_detector_spark.fixtures import gen_hard_documents
from comic_text_detector_spark.plans.extract import extract_document


def test_hard_corpus_quality_floor():
    rows = gen_hard_documents(120)
    tp = fp = fn = 0
    exact = 0
    for r in rows:
        got, _ = extract_document(r["html"])
        want = r["text"]
        if got == want:
            exact += 1
        gw = got.split()
        ww = want.split()
        # multiset word overlap as the char-coverage proxy
        from collections import Counter

        cg, cw = Counter(gw), Counter(ww)
        inter = sum((cg & cw).values())
        tp += inter
        fp += sum(cg.values()) - inter
        fn += sum(cw.values()) - inter
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    # the engine should stay sharp even off-distribution
    assert precision >= 0.95, precision
    assert recall >= 0.95, recall
    assert exact >= len(rows) * 0.8, exact


def test_kernel_throughput_floor():
    """Loose regression floor: single-core extraction of the fixture corpus
    must stay above 1500 docs/s (typical ~5-7k; catches 3x+ regressions
    without flaking on hypervisor noise)."""
    import time

    from comic_text_detector_spark.fixtures import gen_documents

    htmls = [r["html"] for r in gen_documents(150)] * 4
    for h in htmls[:50]:
        extract_document(h)
    t0 = time.process_time()
    for h in htmls:
        extract_document(h)
    rate = len(htmls) / (time.process_time() - t0)
    assert rate > 1500, rate
