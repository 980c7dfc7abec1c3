"""Host-language profile (operators/textstats.py composition of
lang_id x canonical host)."""

from __future__ import annotations


def test_host_lang_profile_shares_sum_and_isolation(spark):
    """Per-host permille shares are floor-consistent (sum within
    rounding of 1000) and host counts reconcile with lang_id."""
    from collections import defaultdict

    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.textstats import (
        q_host_lang_profile,
        q_lang_id,
    )

    rows = q_host_lang_profile(spark, SF_SMOKE).collect()
    per_host = defaultdict(lambda: [0, 0])
    for r in rows:
        per_host[r.host][0] += r.n_docs
        per_host[r.host][1] += r.permille
        assert 0 < r.permille <= 1000
    n_langs = {r.host: 0 for r in rows}
    for r in rows:
        n_langs[r.host] += 1
    for host, (n, pm) in per_host.items():
        # floor rounding loses at most (k-1) permille for k lang rows
        assert 1000 - (n_langs[host] - 1) <= pm <= 1000
    total = sum(v[0] for v in per_host.values())
    assert total == q_lang_id(spark, SF_SMOKE).count()
