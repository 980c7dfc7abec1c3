"""Naive Bayes quality classifier (operators/classify.py)."""

from __future__ import annotations

from dd_ops_ocr_spark.operators.classify import (
    _labeled_docs,
    nb_score,
    nb_train,
    q_quality_nb_score,
)


def _bits(c: int) -> int:
    return c.bit_length()


def _referee_weights(rows):
    """Pure-Python restatement of the smoothed cross-product weight."""
    from collections import Counter

    pos, neg = Counter(), Counter()
    t_pos = t_neg = 0
    for _id, text, label in rows:
        for tok in text.split():
            if label:
                pos[tok] += 1
                t_pos += 1
            else:
                neg[tok] += 1
                t_neg += 1
    out = {}
    for tok in set(pos) | set(neg):
        out[tok] = _bits((pos[tok] + 1) * t_neg) - _bits((neg[tok] + 1) * t_pos)
    return out


ROWS = [
    (1, "alpha beta gamma spamword spamword", False),
    (2, "alpha beta delta spamword", False),
    (3, "alpha beta gamma goodword", True),
    (4, "alpha delta goodword goodword", True),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, label boolean")


def test_train_matches_pure_python_referee(spark):
    got = {r["token"]: r["weight"] for r in nb_train(_df(spark, ROWS)).collect()}
    assert got == _referee_weights(ROWS)


def test_class_proportional_token_weighs_zero(spark):
    # equal total tokens per class, token split proportionally -> the
    # cross products are equal and the weight must be EXACTLY 0 (the
    # property the bits(n)-bits(T) form misses)
    rows = [
        (1, "even even filler", True),
        (2, "even even filler", False),
    ]
    got = {r["token"]: r["weight"] for r in nb_train(_df(spark, rows)).collect()}
    assert got["even"] == 0 and got["filler"] == 0


def test_score_anchors_unseen_and_empty_docs(spark):
    w = nb_train(_df(spark, ROWS))
    docs = spark.createDataFrame(
        [(10, "neverseen tokens only"), (11, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in nb_score(docs, w, prior=3).collect()}
    # unseen tokens contribute 0; empty doc still surfaces — both score
    # exactly the prior
    assert out[10]["score"] == 3 and out[11]["score"] == 3
    assert out[10]["predicted"] and out[11]["predicted"]


def test_planted_corpus_heldout_perfect(spark):
    sc = q_quality_nb_score(spark, "/root/testdata/sf0.001").collect()
    truth = {r["doc_id"]: r["doc_id"] % 3 == 0 for r in sc}
    heldout = [r for r in sc if r["doc_id"] % 5 == 4]
    assert heldout, "held-out fifth must be non-empty"
    assert all(r["predicted"] == truth[r["doc_id"]] for r in heldout)


def test_signal_tokens_dominate(spark):
    labeled = _labeled_docs(spark, "/root/testdata/sf0.001")
    w = {r["token"]: r["weight"] for r in nb_train(labeled).collect()}
    markers = ["citation", "references", "methodology", "click", "casino", "winner"]
    body = [t for t in w if t not in markers]
    assert min(abs(w[m]) for m in markers) > 4 * max(
        (abs(w[t]) for t in body), default=0
    )
