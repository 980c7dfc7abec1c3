"""recrawl_delta referee: status classification restated from the
planting gates in pure Python, category completeness, and the plan
shape (one hash full-outer join, no cartesian/window)."""

import hashlib

from tests.conftest import SF_SMOKE


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_recrawl_statuses_match_gates(spark):
    from dd_ops_ocr_spark.operators.recrawl import (
        _GONE_MOD,
        _NEW_MOD,
        _REV_NIB,
        q_recrawl_delta,
    )

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).select("doc_id", "text").collect()
    }
    rows = q_recrawl_delta(spark, SF_SMOKE).collect()

    # every URL appears exactly once
    assert len({r.url for r in rows}) == len(rows)

    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, []).append(r)

    want_gone = sum(1 for d in docs if d % _GONE_MOD == 0)
    want_new = sum(1 for d in docs if d % _NEW_MOD == 0)
    want_changed = sum(
        1 for d in docs
        if d % _GONE_MOD != 0
        and _md5(str(d))[_REV_NIB - 1] in "02468ace"
    )
    assert len(by_status.get("gone", [])) == want_gone
    assert len(by_status.get("new", [])) == want_new
    assert len(by_status.get("changed", [])) == want_changed
    assert len(rows) == len(docs) + want_new

    # gates genuinely split four ways at this SF
    assert set(by_status) == {"new", "changed", "unchanged", "gone"}

    # digest invariants per class
    for r in by_status.get("new", []):
        assert r.digest_old == "" and r.digest_new != ""
        assert "/n/" in r.url
    for r in by_status.get("gone", []):
        assert r.digest_new == "" and r.digest_old != ""
    for r in by_status.get("unchanged", []):
        assert r.digest_old == r.digest_new != ""
    for r in by_status.get("changed", []):
        assert "" != r.digest_old != r.digest_new != ""


def test_recrawl_plan_shape(spark):
    from dd_ops_ocr_spark.operators.recrawl import q_recrawl_delta

    plan = q_recrawl_delta(spark, SF_SMOKE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_recrawl_delta_null_digests_classify_by_presence(spark):
    """A NULL digest must not flip new/gone: presence in a snapshot is
    the join-key fact (the SQL twin tests a.url IS NULL), digests only
    decide changed/unchanged. NULL-vs-anything content comparison is
    'changed' (unknown content), never 'unchanged'."""
    from dd_ops_ocr_spark.operators.recrawl import recrawl_delta

    schema = "url string, digest string"
    a = spark.createDataFrame(
        [("u_both_null", None), ("u_gone", "d1"), ("u_null_vs_d", None)],
        schema,
    )
    b = spark.createDataFrame(
        [("u_both_null", None), ("u_new", None), ("u_null_vs_d", "d2")],
        schema,
    )
    got = {r.url: r.status for r in recrawl_delta(a, b).collect()}
    assert got == {
        "u_both_null": "changed",   # present in both, content unknown
        "u_gone": "gone",           # absent from b despite digest
        "u_new": "new",             # present in b despite NULL digest
        "u_null_vs_d": "changed",
    }
