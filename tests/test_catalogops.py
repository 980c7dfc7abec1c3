"""CDC merge (operators/catalogops.py): MERGE-INTO semantics as a
join-free union-tag-agg."""

from __future__ import annotations


# ----------------------------------------------------------- CDC merge

def test_cdc_merge_semantics(spark):
    """Highest seq wins, deletes drop keys, inserts appear, replays
    are idempotent."""
    from dd_ops_ocr_spark.operators.catalogops import cdc_merge

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "key long, val string"
    )
    changes = spark.createDataFrame(
        [
            (1, 1, "u", "a2"), (1, 2, "u", "a3"),      # latest update wins
            (2, 1, "d", None),                          # delete
            (3, 2, "d", None), (3, 1, "u", "c2"),       # delete beats older upd
            (9, 1, "u", "new"),                         # insert
        ],
        "key long, seq long, op string, val string",
    )
    got = {r.key: r.val for r in cdc_merge(base, changes).collect()}
    assert got == {1: "a3", 9: "new"}
    # idempotent replay: applying the same changelog twice is a no-op
    doubled = changes.unionByName(changes)
    got2 = {r.key: r.val for r in cdc_merge(base, doubled).collect()}
    assert got2 == got


def test_cdc_merge_plan_no_join(spark):
    """Union-tag-agg: the merge contains NO join operator at all."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.catalogops import q_cdc_merge

    plan = q_cdc_merge(spark, SF_SMOKE)._jdf.queryExecution() \
        .executedPlan().toString()
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "CartesianProduct"):
        assert op not in plan


def test_scd2_history_semantics(spark):
    """Hand-pinned change stream: runs collapse, versions chain, the
    last version per key is open (valid_to null, is_current)."""
    from dd_ops_ocr_spark.operators.catalogops import scd2_history

    changes = spark.createDataFrame(
        [
            (1, 10, "a"), (1, 11, "a"),   # duplicate run -> ONE version
            (1, 12, "b"), (1, 15, "a"),   # change, change back -> 2 more
            (2, 7, "x"),                  # single-event key
        ],
        "key long, seq long, val string",
    )
    rows = {
        (r.key, r.valid_from): (r.val, r.valid_to, r.is_current)
        for r in scd2_history(changes).collect()
    }
    assert rows == {
        (1, 10): ("a", 12, False),
        (1, 12): ("b", 15, False),
        (1, 15): ("a", None, True),
        (2, 7): ("x", None, True),
    }


def test_scd2_history_plan_single_exchange(spark):
    """Both window passes ride ONE key exchange and one sort — no join,
    no second shuffle (the filter between lag and lead preserves the
    (key, seq) distribution and order)."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.catalogops import q_scd2_history

    plan = q_scd2_history(spark, SF_SMOKE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort [") == 1
    assert "Join" not in plan
