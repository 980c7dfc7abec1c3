"""Exact-substring duplicate-passage detection (operators/passages.py).

Controlled corpora with distinct vocabularies per doc, so every span
bound is predictable to the token; the sf0.01 oracle parity is covered
by test_oracle_sql.py like every other query.
"""

from __future__ import annotations

from dd_ops_ocr_spark.operators.passages import (
    dup_passage_spans,
    strip_dup_passages,
)

K = 5  # small window for hand-sized docs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(prefix, n):
    """n tokens that occur nowhere else."""
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_planted_passage_spans_exact(spark):
    shared = _uniq("dup", 9)  # 9-token passage, >= K
    rows = [
        (1, shared + " " + _uniq("a", 12)),          # at offset 0
        (2, _uniq("b", 7) + " " + shared),           # at offset 7
        (3, _uniq("c", 20)),                         # unique doc
    ]
    got = {
        (r["doc_id"], r["tok_start"], r["tok_end"])
        for r in dup_passage_spans(_docs(spark, rows), k=K).collect()
    }
    assert got == {(1, 0, 9), (2, 7, 16)}


def test_all_copies_removed_and_rejoined(spark):
    shared = _uniq("dup", 6)
    rows = [
        (1, _uniq("a", 6) + " " + shared + " " + _uniq("z", 6)),
        (2, shared + " " + _uniq("b", 8)),
    ]
    out = {
        r["doc_id"]: r
        for r in strip_dup_passages(_docs(spark, rows), k=K).collect()
    }
    # Lee-et-al semantics: BOTH copies are cut, survivors rejoin in order
    assert out[1]["text"] == _uniq("a", 6) + " " + _uniq("z", 6)
    assert out[2]["text"] == _uniq("b", 8)
    assert (out[1]["n_toks"], out[1]["n_kept"], out[1]["n_dropped"]) == (18, 12, 6)
    assert (out[2]["n_toks"], out[2]["n_kept"], out[2]["n_dropped"]) == (14, 8, 6)


def test_unique_corpus_untouched(spark):
    rows = [(i, _uniq(chr(97 + i), 10)) for i in range(4)]
    assert dup_passage_spans(_docs(spark, rows), k=K).count() == 0
    out = strip_dup_passages(_docs(spark, rows), k=K).collect()
    assert all(r["n_dropped"] == 0 for r in out)
    assert {r["text"] for r in out} == {r[1] for r in rows}


def test_short_docs_pass_through(spark):
    # both docs identical but shorter than k: no window exists, no flag
    rows = [(1, "same three words"), (2, "same three words")]
    assert dup_passage_spans(_docs(spark, rows), k=K).count() == 0
    out = strip_dup_passages(_docs(spark, rows), k=K).collect()
    assert all(r["text"] == "same three words" for r in out)


def test_within_doc_repetition_not_flagged(spark):
    # the same passage twice in ONE doc is repetition_stats territory,
    # not cross-doc dedup: countDistinct(doc_id) == 1 stays unflagged
    p = _uniq("rep", 6)
    rows = [(1, p + " " + p), (2, _uniq("x", 12))]
    assert dup_passage_spans(_docs(spark, rows), k=K).count() == 0


def test_overlapping_windows_merge_to_maximal_span(spark):
    # an 11-token shared run with k=5 flags starts 0..6 in doc 1; the
    # islands pass must merge them into ONE [0, 11) span, not seven
    shared = _uniq("dup", 11)
    rows = [(1, shared + " " + _uniq("a", 8)), (2, _uniq("b", 5) + " " + shared)]
    spans = dup_passage_spans(_docs(spark, rows), k=K).collect()
    per_doc = {r["doc_id"]: (r["tok_start"], r["tok_end"]) for r in spans}
    assert len(spans) == 2
    assert per_doc[1] == (0, 11)
    assert per_doc[2] == (5, 16)


def test_hash_modes_agree(spark):
    # xxhash64 (production, no hex strings through the shuffle) must
    # produce the identical span set as the md5 oracle-parity mode
    shared = _uniq("dup", 9)
    rows = [
        (1, shared + " " + _uniq("a", 15)),
        (2, _uniq("b", 4) + " " + shared + " " + _uniq("c", 3)),
        (3, _uniq("d", 25)),
    ]
    docs = _docs(spark, rows)
    md5 = {tuple(r) for r in dup_passage_spans(docs, k=K, hash_mode="md5").collect()}
    xxh = {tuple(r) for r in dup_passage_spans(docs, k=K, hash_mode="xxh").collect()}
    assert md5 == xxh and md5


def test_plan_has_no_cartesian_product(spark):
    rows = [(i, _uniq(chr(97 + i), 30)) for i in range(3)]
    plan = dup_passage_spans(_docs(spark, rows), k=K)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
