"""tf-idf keywords + chunked inverted index (operators/indexing.py)."""

from __future__ import annotations

from dd_ops_ocr_spark.operators.indexing import inverted_index, tfidf_topk


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_known_answer(spark):
    # 4 docs; "common" in all (idf_bits 3-3=1... bits(4)=3, bits(4)=3 -> 0),
    # "pair" in two (bits(4)-bits(2)=3-2=1), "solo" in one (3-1=2)
    rows = [
        (1, "common pair solo solo"),
        (2, "common pair"),
        (3, "common"),
        (4, "common"),
    ]
    got = {
        (r["doc_id"], r["rank"]): (r["token"], r["score"])
        for r in tfidf_topk(_df(spark, rows), k=2).collect()
    }
    # doc 1: solo tf=2 score 4; pair tf=1 score 1; common score 0
    assert got[(1, 1)] == ("solo", 4)
    assert got[(1, 2)] == ("pair", 1)
    # doc 2: pair 1; common 0
    assert got[(2, 1)] == ("pair", 1)
    assert got[(2, 2)] == ("common", 0)
    # docs 3/4 have only the zero-scoring token but still surface
    assert got[(3, 1)] == ("common", 0)
    assert got[(4, 1)] == ("common", 0)


def test_tfidf_tiebreak_alphabetical(spark):
    rows = [(1, "zeta alpha"), (2, "zeta alpha"), (3, "zeta alpha")]
    got = [
        r["token"]
        for r in tfidf_topk(_df(spark, rows), k=2)
        .filter("doc_id = 1")
        .orderBy("rank")
        .collect()
    ]
    assert got == ["alpha", "zeta"]  # equal scores -> token asc


def test_inverted_index_chunking_bounded_and_ordered(spark):
    # "hot" in 20 docs with chunk=8 -> chunks of 8/8/4; doc ranges must
    # be ascending within AND across chunks, df constant on every row
    rows = [(i, f"hot only{i}") for i in range(20)]
    out = (
        inverted_index(_df(spark, rows), chunk=8)
        .filter("token = 'hot'")
        .orderBy("chunk_id")
        .collect()
    )
    assert [r["n_chunk"] for r in out] == [8, 8, 4]
    assert all(r["df"] == 20 for r in out)
    all_postings = " ".join(r["postings"] for r in out).split()
    docs = [int(p.split(":")[0]) for p in all_postings]
    assert docs == sorted(docs) == list(range(20))
    assert all(p.endswith(":1") for p in all_postings)


def test_inverted_index_tf_and_reconstruction(spark):
    rows = [(7, "w w w x"), (9, "w x x")]
    out = {
        (r["token"], r["chunk_id"]): r
        for r in inverted_index(_df(spark, rows), chunk=8).collect()
    }
    assert out[("w", 0)]["postings"] == "7:3 9:1"
    assert out[("x", 0)]["postings"] == "7:1 9:2"
    assert out[("w", 0)]["df"] == 2 and out[("w", 0)]["n_chunk"] == 2


def test_inverted_index_single_chunk_tail(spark):
    # a token in exactly one doc: one chunk, chunk_id 0
    rows = [(1, "rare"), (2, "other")]
    out = inverted_index(_df(spark, rows), chunk=8).filter("token='rare'").collect()
    assert len(out) == 1 and out[0]["chunk_id"] == 0 and out[0]["postings"] == "1:1"


# ------------------------------------------------------------- BM25

def test_bm25_known_answer(spark):
    """Hand-computed integer BM25 on a 4-doc corpus (L=9, N=4):
    term = idf_bits * (22*L*tf*1e6) div (10*L*tf + 3*L + 9*dl*N)."""
    from dd_ops_ocr_spark.operators.indexing import bm25_topk

    docs = _df(spark, [
        (1, "a b b"), (2, "a c"), (3, "c c c"), (4, "d"),
    ])
    qs = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c")], "query_id int, token string"
    )
    got = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in bm25_topk(docs, qs).collect()
    }
    # q0: doc1 = 1*(198e6 div 225) + 2*(396e6 div 315)
    #          = 880000 + 2514284 = 3394284; doc2 = 198e6 div 189
    assert got[(0, 1)] == (1, 3394284)
    assert got[(0, 2)] == (2, 1047619)
    # q1: doc3 (tf=3) beats doc2 (tf=1) despite shorter doc2
    assert got[(1, 1)] == (3, 1466666)
    assert got[(1, 2)] == (2, 1047619)
    # docs sharing no term with a query never materialize
    assert len(got) == 4


def test_bm25_length_normalization(spark):
    """Same tf, shorter doc scores higher (the b=0.75 dl/avgdl term)."""
    from dd_ops_ocr_spark.operators.indexing import bm25_topk

    # 4 docs so idf_bits = bits(4)-bits(2) = 1 (the quantized idf is 0
    # while df > N/2 — ubiquitous terms carry no signal by design)
    docs = _df(spark, [
        (1, "x pad pad pad"), (2, "x pad"), (3, "pad"), (4, "pad"),
    ])
    qs = spark.createDataFrame([(0, "x")], "query_id int, token string")
    rows = {r.doc_id: r for r in bm25_topk(docs, qs).collect()}
    assert rows[2].score > rows[1].score
    assert rows[2].rank == 1


def test_bm25_tiebreak_and_k_cut(spark):
    """Identical docs tie on score -> doc_id ascending; k bounds rows."""
    from dd_ops_ocr_spark.operators.indexing import bm25_topk

    docs = _df(spark, [(i, "t filler") for i in range(1, 8)])
    qs = spark.createDataFrame([(0, "t")], "query_id int, token string")
    rows = bm25_topk(docs, qs, k=3).collect()
    assert [(r.rank, r.doc_id) for r in sorted(rows, key=lambda r: r.rank)] \
        == [(1, 1), (2, 2), (3, 3)]


def test_bm25_plan_no_cartesian(spark):
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.indexing import q_bm25_topk

    plan = q_bm25_topk(spark, SF_SMOKE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------- KWIC

def test_kwic_window_and_edges(spark):
    from dd_ops_ocr_spark.operators.indexing import kwic_snippets

    text = "x" * 30 + " NEEDLE " + "y" * 30
    docs = _df(spark, [(1, text), (2, "no match here")])
    qs = spark.createDataFrame([(0, "NEEDLE")], "query_id int, token string")
    rows = kwic_snippets(docs, qs, width=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.doc_id == 1 and r.pos == 32
    assert r.snippet == "xxxx NEEDLE yyyy"
    # term at the very start: window clamps at 1
    rows2 = kwic_snippets(_df(spark, [(3, "NEEDLE tail")]), qs, width=5).collect()
    assert rows2[0].pos == 1 and rows2[0].snippet == "NEEDLE tail"[:11]


def test_inverted_index_rank_carries_across_buckets(spark):
    """The two-phase posting rank (bucket-local row_number + cumulative
    base) must reproduce the global doc_id-ordered rank exactly: chunks
    that SPAN a bucket boundary are the failure mode a wrong carry-in
    would hit. 20 docs of one token with bucket_width=4 and chunk=8
    forces every chunk to span multiple buckets."""
    from dd_ops_ocr_spark.operators.indexing import inverted_index

    docs = spark.createDataFrame(
        [(i, "tok") for i in range(20)], "doc_id long, text string"
    )
    out = inverted_index(docs, chunk=8, bucket_width=4).orderBy("chunk_id")
    rows = out.collect()
    assert [r.chunk_id for r in rows] == [0, 1, 2]
    assert [r.n_chunk for r in rows] == [8, 8, 4]
    assert all(r.df == 20 for r in rows)
    # postings ascend globally across chunk boundaries
    assert rows[0].postings == " ".join(f"{i}:1" for i in range(8))
    assert rows[1].postings == " ".join(f"{i}:1" for i in range(8, 16))
    assert rows[2].postings == " ".join(f"{i}:1" for i in range(16, 20))
