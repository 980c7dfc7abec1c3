"""Integer-exact PageRank: pure-Python power-iteration referee on a
hand-built graph + the planted corpus, mass/structure invariants, and
plan shape (no cartesian, per-iteration joins keyed on url)."""

from __future__ import annotations

from collections import defaultdict

from dd_ops_ocr_spark.operators.linkgraph import (
    _BASE,
    SCALE,
    edges_df,
    pagerank,
)


def _python_pagerank(edges: list, iters: int = 3) -> dict:
    """The module's integer recurrence, restated independently."""
    outdeg: dict = defaultdict(int)
    for s, _t in edges:
        outdeg[s] += 1
    nodes = {s for s, _ in edges} | {t for _, t in edges}
    pr = {u: SCALE for u in nodes}
    for _ in range(iters):
        nxt = {u: _BASE for u in nodes}
        for s, t in edges:
            nxt[t] += (pr[s] * 17) // (20 * outdeg[s])
        pr = nxt
    return pr


def test_hand_graph_matches_referee(spark):
    """Chain + hub: a->b->c, and d,e,f all -> hub. Hub must outrank
    everything; dangling c contributes nothing (no NaN, no blowup)."""
    edges = [("a", "b"), ("b", "c"), ("d", "h"), ("e", "h"), ("f", "h"),
             ("a", "h")]
    df = spark.createDataFrame(edges, "src_url string, target_url string")
    got = {r.url: r.pr for r in pagerank(df).collect()}
    want = _python_pagerank(edges)
    assert got == want
    assert got["h"] == max(got.values())
    # never-linked sources sit at the (1-d) floor after convergence of
    # their zero in-flow: BASE exactly
    assert got["d"] == got["e"] == got["f"] == _BASE


def test_corpus_matches_referee(spark):
    from tests.conftest import SF_SMOKE

    edges = [(r.src_url, r.target_url)
             for r in edges_df(spark, SF_SMOKE).collect()]
    got = {r.url: r.pr
           for r in pagerank(edges_df(spark, SF_SMOKE)).collect()}
    assert got == _python_pagerank(edges)
    # every rank is at least the teleport floor and int64-safe
    assert all(_BASE <= v < 2 ** 62 for v in got.values())
    # chrome targets (every page of a host links them) dominate:
    # the global max must be a shared host-level URL, not a /p/ page
    top = max(got, key=got.get)
    assert "/p/" not in top


def test_plan_shape(spark):
    from tests.conftest import SF_SMOKE

    plan = pagerank(edges_df(spark, SF_SMOKE))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_host_pagerank_matches_referee(spark):
    """Host-collapsed graph: self-loops dropped, nodes are hosts, and
    the same integer recurrence holds (referee on the collapsed edge
    list)."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.linkgraph import (
        host_edges_df,
        q_host_pagerank,
    )

    edges = [(r.src_url, r.target_url)
             for r in host_edges_df(spark, SF_SMOKE).collect()]
    assert edges, "host graph is empty"
    assert all(s != t for s, t in edges), "self-loop survived collapse"
    assert all(s.startswith("https://") and "/" not in s[8:]
               for s, _ in edges), "src is not a bare host"
    got = {r.url: r.pr
           for r in q_host_pagerank(spark, SF_SMOKE).collect()}
    assert got == _python_pagerank(edges)


def test_triangle_counts_known_graph(spark):
    """K4 minus one edge: two triangles sharing an edge — the shared
    edge's endpoints count 2 each, the others 1; a pendant node and a
    disconnected edge contribute nothing. Direction/duplication of the
    input pairs must not matter."""
    from dd_ops_ocr_spark.operators.linkgraph import triangle_counts

    pairs = [
        # K4 minus (c, d): triangles (a,b,c) and (a,b,d)
        ("a", "b"), ("b", "a"),      # duplicated reverse edge
        ("a", "c"), ("b", "c"),
        ("a", "d"), ("d", "b"),      # mixed direction
        ("d", "e"),                  # pendant
        ("x", "y"),                  # disconnected edge
    ]
    df = spark.createDataFrame(pairs, "src_url string, target_url string")
    got = {r.host: r.n_tri for r in triangle_counts(df).collect()}
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_triangle_orientation_handles_hub(spark):
    """A star hub (no triangles) plus one closed wedge: the hub's huge
    degree must not fabricate triangles, and the single real triangle
    through the hub is still found once."""
    from dd_ops_ocr_spark.operators.linkgraph import triangle_counts

    pairs = [("hub", f"s{i}") for i in range(50)]
    pairs += [("s0", "s1")]  # closes exactly one triangle hub-s0-s1
    df = spark.createDataFrame(pairs, "src_url string, target_url string")
    got = {r.host: r.n_tri for r in triangle_counts(df).collect()}
    assert got == {"hub": 1, "s0": 1, "s1": 1}


def test_clustering_coefficient_shapes(spark):
    """The two shapes the report separates: a hub (high degree, zero
    coefficient) vs a clique (coefficient = 1000 permille); floor
    semantics pinned on a partial wedge."""
    from dd_ops_ocr_spark.operators.linkgraph import clustering_coefficient

    pairs = [
        # triangle (clique of 3): every node coeff = 2*1/(2*1) = 1000
        ("a", "b"), ("b", "c"), ("a", "c"),
        # hub with 3 spokes, no closure: deg 3, 0 triangles -> 0
        ("hub", "p"), ("hub", "q"), ("hub", "r"),
        # node w: deg 3 (a, b, x), one triangle (w,a,b) ->
        # floor(2000*1/(3*2)) = 333
        ("w", "a"), ("w", "b"), ("w", "x"),
    ]
    df = spark.createDataFrame(pairs, "src_url string, target_url string")
    got = {r.host: (r.deg, r.n_tri, r.coeff_permille)
           for r in clustering_coefficient(df).collect()}
    assert got["hub"] == (3, 0, 0)
    assert got["w"] == (3, 1, 333)
    assert got["c"] == (2, 1, 1000)
    # a and b each gained the w triangle: deg 3 (b/a, c, w), 2 triangles
    assert got["a"] == (3, 2, 666) and got["b"] == (3, 2, 666)
    # degree-1 nodes (p, q, r, x) are excluded
    assert "p" not in got and "x" not in got


def test_host_edges_distinct_filter_commute(spark):
    """host_edges_df runs distinct BEFORE the self-loop/empty filter
    (r6: filter pushdown below the union re-inlined the URL expression
    trees per predicate reference — 4.2 KB -> 63.5 KB plan). The oracle
    states WHERE then DISTINCT; the two orders commute on sets, and
    this pins it: same multiset of rows (so distinct survived the
    reorder — no duplicate edges) as the naive oracle-order plan built
    from the SAME raw pair stream."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.linkgraph import (
        _host_pair_stream,
        host_edges_df,
    )

    got = sorted(
        (r.src_url, r.target_url)
        for r in host_edges_df(spark, SF_SMOKE).collect()
    )
    from pyspark.sql import functions as F

    naive = sorted(
        (r.src_url, r.target_url)
        for r in _host_pair_stream(spark, SF_SMOKE)
        .filter(
            (F.col("src_url") != F.col("target_url"))
            & (F.col("target_url") != "")
        )
        .distinct()
        .collect()
    )
    assert got == naive
    assert len(got) == len(set(got)), "duplicate edge survived distinct"
