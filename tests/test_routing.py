"""HRW shard routing (operators/routing.py): the minimal-disruption
property mod-N lacks, plus balance and determinism."""

from __future__ import annotations

from dd_ops_ocr_spark.operators.routing import shard_assign


def _keys(spark, n):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_hrw_minimal_disruption(spark):
    """Dropping the highest shard (8 -> 7) reassigns EXACTLY the rows
    that lived on it; every other row keeps its shard — the property
    mod-N cannot have (mod change moves ~7/8 of keys)."""
    d = _keys(spark, 400)
    a8 = {r.doc_id: r.shard for r in shard_assign(d, n_shards=8).collect()}
    a7 = {r.doc_id: r.shard for r in shard_assign(d, n_shards=7).collect()}
    moved = {k for k in a8 if a8[k] != a7[k]}
    assert moved == {k for k, s in a8.items() if s == 7}
    # and roughly 1/8 of keys moved
    assert 0.04 * 400 < len(moved) < 0.22 * 400


def test_hrw_balance(spark):
    from collections import Counter

    counts = Counter(
        r.shard for r in shard_assign(_keys(spark, 4000)).collect()
    )
    assert set(counts) == set(range(8))
    for c in counts.values():
        assert 350 < c < 650  # ~500 each, generous binomial bound


def test_hrw_deterministic_and_narrow(spark):
    d = _keys(spark, 50)
    a = sorted(map(tuple, shard_assign(d).collect()))
    b = sorted(map(tuple, shard_assign(d).collect()))
    assert a == b
    plan = shard_assign(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
