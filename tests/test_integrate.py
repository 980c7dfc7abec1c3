"""Integrated-text fold: Spark two-level A13/A14 fold over the live
pipeline output must equal the pure-Python fold over the oracle output."""

from __future__ import annotations

import duckdb

from dd_ops_ocr_spark import corpus, oracle
from dd_ops_ocr_spark.operators.integrate import integrate_python, q_integrated_text
from tests.conftest import SF_SMOKE


def test_integrated_text_matches_oracle(spark):
    got = {
        r["doc_id"]: (r["integrated_text"], r["total_characters"])
        for r in q_integrated_text(spark, SF_SMOKE).collect()
    }
    docs = duckdb.sql(
        f"select doc_id, text from read_parquet('{SF_SMOKE}/documents.parquet')"
    ).df()
    mismatches = []
    for doc_key, text in zip(docs["doc_id"], docs["text"]):
        did = corpus.doc_id_str(int(doc_key))
        spans = oracle.extract_doc(
            corpus.doc_spans(int(doc_key), text or ""), include_page=True
        )
        want = integrate_python(spans)
        if got[did][0] != want or got[did][1] != len(want):
            mismatches.append(did)
    assert not mismatches, f"{len(mismatches)} docs, e.g. {mismatches[:3]}"
    assert len(got) == len(docs)


def test_separators_are_reference_exact():
    """The inter-group separator must be the reference's effective
    \\n\\n\\n (an interleaved '\\n' element inside a '\\n'-join —
    step7/01:220-243), and intra-group \\n\\n (step6/04:272)."""
    spans = [
        {"kind": "text", "text": "a", "media_ref": None, "order": 1, "page": 0},
        {"kind": "text", "text": "b", "media_ref": None, "order": 2, "page": 0},
        {"kind": "media", "text": None, "media_ref": "m1", "order": 3, "page": 1},
    ]
    assert integrate_python(spans) == "a\n\nb\n\n\n[media:m1]"


def test_contract_schema_json_is_reference_shaped(spark):
    """Every contract_json must parse as JSON and carry the reference
    pipeline's exact shape: {success, info{title,party,start_date,
    end_date,conclusion_date}, result{articles[{article_number,title,
    content,table_number}]}, risks{contracts[{targetCompany,articleCount,
    risks[]}]}} (api/main.py:1306-1357), with risks id-ordered
    (main.py:93-146) and targetCompany = first comma-separated party
    (main.py:1210)."""
    import json

    from dd_ops_ocr_spark.operators.integrate import q_contract_schema
    from tests.conftest import SF_SMOKE

    rows = q_contract_schema(spark, SF_SMOKE).limit(50).collect()
    assert rows
    for r in rows:
        d = json.loads(r["contract_json"])
        assert d["success"] is True
        assert set(d["info"]) == {
            "title", "party", "start_date", "end_date", "conclusion_date"
        }
        arts = d["result"]["articles"]
        assert arts and all(
            set(a) == {"article_number", "title", "content", "table_number"}
            for a in arts
        )
        assert [a["article_number"] for a in arts] == [
            str(i + 1) for i in range(len(arts))
        ]
        contracts = d["risks"]["contracts"]
        assert len(contracts) == 1
        c = contracts[0]
        assert c["targetCompany"] == d["info"]["party"].split(",")[0]
        assert c["articleCount"] == len(arts)
        ids = [x["id"] for x in c["risks"]]
        assert ids == sorted(ids)


def test_engine_dual_extract_pairing_classes(spark):
    """K12 dual-engine reconciliation on planted docs exercising every
    pairing class: both engines, primary-only (media-only doc — the alt
    raw pass sees no text), alt-only (whitespace-only text — the primary
    kernel drops it), and a doc neither engine emits (empty spans)."""
    from dd_ops_ocr_spark.operators.joins import engine_dual_extract
    from dd_ops_ocr_spark.schema import SPANS_SCHEMA, STRIDE

    rows = [
        # d1: real text on two pages + a media span -> both engines
        ("d1", [("text", "hello world", None, 0),
                ("text", "second page", None, STRIDE),
                ("media", None, "m1", 5)]),
        # d2: media only -> primary integrates [media:m2], alt has no rows
        ("d2", [("media", None, "m2", 0)]),
        # d3: whitespace-only text, no media -> primary drops the doc,
        # the raw alt pass keeps it
        ("d3", [("text", "   \n  ", None, 0)]),
        # d4: empty spans -> absent from both engines entirely
        ("d4", []),
    ]
    spans = spark.createDataFrame(rows, SPANS_SCHEMA)
    got = {r["doc_id"]: r.asDict() for r in engine_dual_extract(spans).collect()}

    assert set(got) == {"d1", "d2", "d3"}
    assert got["d1"]["pairing"] == "both"
    assert got["d1"]["engine_used"] == "primary"
    assert got["d1"]["alt_pages"] == 2
    # alt transcript: "hello world\nsecond page\n   \n  "-style per doc —
    # d1 text spans only: 11 + 11 chars + 1 separator
    assert got["d1"]["alt_chars"] == 23
    assert got["d1"]["reconciled_chars"] == got["d1"]["primary_chars"]

    assert got["d2"]["pairing"] == "primary_only"
    assert got["d2"]["engine_used"] == "primary"
    assert got["d2"]["alt_chars"] is None
    assert got["d2"]["primary_chars"] == len("[media:m2]")

    assert got["d3"]["pairing"] == "alt_only"
    assert got["d3"]["engine_used"] == "alt"
    assert got["d3"]["primary_chars"] is None
    assert got["d3"]["reconciled_chars"] == got["d3"]["alt_chars"] == 6
