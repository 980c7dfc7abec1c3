"""Python-UDTF surface (operators/udtfs.py): lateral fan-out edge
cases and TABLE-argument partition/order semantics, beyond the
oracle-checked queries."""

from __future__ import annotations

from dd_ops_ocr_spark.operators import udtfs


def _setup(spark):
    udtfs.ensure_registered(spark)


def test_lateral_edges(spark):
    _setup(spark)
    spark.createDataFrame(
        [(1, "a b"), (2, ""), (3, None), (4, "x  y")],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_edge")
    rows = spark.sql("""
        SELECT e.doc_id, t.tok_idx, t.token, t.n_chars
        FROM udtf_edge e, LATERAL token_explode(e.text) t
        ORDER BY e.doc_id, t.tok_idx
    """).collect()
    got = [(r.doc_id, r.tok_idx, r.token, r.n_chars) for r in rows]
    assert got == [
        (1, 0, "a", 1), (1, 1, "b", 1),
        (2, 0, "", 0),            # '' splits to one empty token
        # doc 3 (NULL text): lateral emits nothing, row drops
        (4, 0, "x", 1), (4, 1, "", 0), (4, 2, "y", 1),  # empties kept
    ]


def test_table_arg_orders_within_partition(spark):
    _setup(spark)
    # feed tokens deliberately scrambled: ORDER BY inside the TABLE
    # argument must restore them before eval() sees a row
    rows = [
        (7, 2, "c"), (7, 0, "a"), (7, 1, "b"),
        (8, 1, "z"), (8, 0, "y"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, tok_idx int, token string"
    ).createOrReplaceTempView("udtf_scrambled")
    got = {
        r.doc_id: (r.n_tokens, r.rebuilt)
        for r in spark.sql("""
            SELECT * FROM doc_reassemble(
              TABLE(SELECT * FROM udtf_scrambled)
              PARTITION BY doc_id ORDER BY tok_idx
            )
        """).collect()
    }
    assert got == {7: (3, "a b c"), 8: (2, "y z")}


def test_roundtrip_identity_on_adversarial_text(spark):
    _setup(spark)
    texts = ["", " ", "  ", "a", " lead", "trail ", "a  b   c", "\t x"]
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_adv")
    got = {
        r.doc_id: r.rebuilt
        for r in spark.sql("""
            SELECT * FROM doc_reassemble(
              TABLE(
                SELECT a.doc_id, t.tok_idx, t.token
                FROM udtf_adv a, LATERAL token_explode(a.text) t
              )
              PARTITION BY doc_id ORDER BY tok_idx
            )
        """).collect()
    }
    assert got == {i: t for i, t in enumerate(texts)}
