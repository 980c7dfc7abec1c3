"""Link-graph PageRank — the crawl-quality signal over resolved outlinks.

``link_graph_indegree`` (htmlops) builds the raw graph; this module
computes the classic recursive quality score on it (Page et al. 1999,
the public PageRank paper): a page is important when important pages
link to it. Web-scale training pipelines use it (or a domain-level
variant) as a quality prior for sampling — the web twin of the
reference's per-document risk scoring joins
(`src/api/main.py` dimension enrich, J5), where a document's worth
comes from a graph-shaped signal rather than its own bytes.

**Integer-exact fixed-point variant** so Spark and DuckDB agree
bit-for-bit (no float summation order hazard):

* ranks are int64 fixed-point, ``SCALE = 10^12`` per unit;
* damping d = 0.85 = 17/20 stays rational: each edge contributes
  ``floor(rank_u * 17 / (20 * outdeg_u))`` — ONE floor per edge, an
  order-independent integer, summed exactly in both engines;
* ``K`` iterations of ``rank' = floor(0.15*SCALE) + sum(contribs)``
  (the un-normalized "PageRank with the 1-vector" form; dangling mass
  is dropped, the standard simplification).

The quantization error vs real-valued PageRank is < K edges' worth of
single-ULP floors — irrelevant for a quality prior, and in exchange
the driver hash-check pins all K iterations exactly.

Scale shape: per iteration ONE join (edges×ranks on src_url — both
sides hash-partitioned on the same key, so AQE reuses the exchange)
and ONE map-side-combinable sum per target. Mega-hub targets (a URL
every page links to) concentrate on the AGGREGATION side only, where
partial aggregation absorbs the skew before the shuffle; source-side
fan-out is per-edge work, never per-node. At 10^12 pages ranks are
node-sized rows (url, int64) — the output, not the corpus. int64 holds
while ``max_indegree * SCALE < 9.2e18 / 17`` (~5e5 pages linking one
URL at this SCALE); a production run at web scale drops SCALE to 10^9
(headroom ~5e8) or moves to decimal(38,0) — same plan, noted here so
the limit is explicit. K is fixed and small (3), so the loop unrolls
into one Catalyst plan; larger K would localCheckpoint per round like
``dedup_clusters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

SCALE = 10 ** 12
_DNUM, _DDEN = 17, 20           # damping 0.85 as an exact rational
_BASE = 3 * SCALE // _DDEN      # (1 - d) * SCALE, exact
K_ITERS = 3


def edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (src_url, target_url) edges of the planted corpus:
    resolved anchors with the page's canonical URL as source. Distinct
    because PageRank is defined on the graph, not the multigraph."""
    from dd_ops_ocr_spark.operators.htmlops import _resolved_targets

    return (
        _resolved_targets(spark, sf_dir, with_src=True)
        .select("src_url", "target_url")
        .distinct()
    )


def pagerank(edges: DataFrame, iters: int = K_ITERS) -> DataFrame:
    """(src_url, target_url) edges -> (url, pr) for every node (source
    or target), pr the int64 fixed-point rank after ``iters`` exact
    integer iterations."""
    # Loop invariants: every iteration re-reads edges and nodes, and
    # without persist() Spark recomputes their full lineage (here: the
    # html plant + regexp outlink extraction) once per round — measured
    # 44.8 s -> materialize-once at 1.28M docs / ~9M edges. The edge
    # list itself is ALSO persisted: outdeg, the join, and both union
    # arms of nodes otherwise each re-derive the full lineage during
    # materialization (4 corpus passes; measured 10.7 s -> 2x on the
    # host graph at sf0.01, where the lineage dominates the tiny
    # fixed point). At real scale edges land as parquet once and these
    # persists are the in-session equivalent; MEMORY_AND_DISK default
    # so a node-sized spill degrades to disk instead of OOM.
    # localCheckpoint (not persist): BOTH materializes the edge list
    # once AND truncates its logical plan. The edge builders
    # (host_edges_df's planted-URL normalize chain especially) carry
    # ~60 KB expression trees; with persist alone Catalyst re-analyzes
    # and re-optimizes that tree inside every unrolled iteration's
    # plan — measured 2+ s of pure DRIVER time per pagerank call on a
    # 1.5k-edge graph (guide 7.3 "planning time" signature: cost is
    # data-size-independent). Same lineage-cut pattern as the
    # dedup_clusters fixpoint; the fault-tolerance trade (executor
    # loss reruns the job instead of recomputing partitions) is the
    # standard one for iterative graph loops.
    edges = edges.localCheckpoint()
    outdeg = edges.groupBy("src_url").agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    ed = edges.join(outdeg, "src_url").persist()
    nodes = (
        edges.select(F.col("src_url").alias("url"))
        .union(edges.select(F.col("target_url").alias("url")))
        .distinct()
        .persist()
    )
    ranks = nodes.select("url", F.lit(SCALE).cast("long").alias("pr"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed.src_url == ranks.url)
            .select(
                F.col("target_url").alias("url"),
                F.expr(f"(pr * {_DNUM}) DIV ({_DDEN} * outdeg)")
                .alias("c"),
            )
            .groupBy("url")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "url", "left").select(
            "url",
            (F.lit(_BASE) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long").alias("pr"),
        )
    # materialize the fixed point ONCE (cutting the K-deep iteration
    # lineage, the dedup_clusters pattern), then RELEASE the loop
    # invariants: without this every pagerank() call leaks three
    # MEMORY_AND_DISK caches for the session's lifetime — a bench pass
    # re-invoking the query leaves corpus-sized blocks pinned and
    # evicting other operators' caches
    ranks = ranks.localCheckpoint()
    ed.unpersist()
    nodes.unpersist()
    return ranks


def q_link_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pagerank(edges_df(spark, sf_dir))


_HOST_RE = "^(https?://[^/]+)"


def _host_pair_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw page-level (src_host, target_host) pair stream feeding
    ``host_edges_df`` — resolved anchors PLUS the frontier's cross-doc
    nav links, collapsed to host granularity, BEFORE dedup and the
    self-loop filter (split out so tests can pin that the two
    downstream orderings state the same edge set)."""
    from dd_ops_ocr_spark.operators.htmlops import _resolved_targets
    from dd_ops_ocr_spark.operators.urlops import (
        normalize_urls,
        plant_messy_urls,
    )

    anchor = _resolved_targets(spark, sf_dir, with_src=True).select(
        F.regexp_extract("src_url", _HOST_RE, 1).alias("src_url"),
        F.regexp_extract("target_url", _HOST_RE, 1).alias("target_url"),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    src = normalize_urls(plant_messy_urls(docs)).select(
        F.regexp_extract("normalized_url", _HOST_RE, 1).alias("src_url"),
        (F.col("doc_id") + F.lit(1)).alias("doc_id"),
    )
    nav = normalize_urls(plant_messy_urls(src)).select(
        "src_url",
        F.regexp_extract("normalized_url", _HOST_RE, 1)
         .alias("target_url"),
    )
    return anchor.unionAll(nav)


def host_edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (src_host, target_host) edges — the FULL page-level pair
    stream (resolved anchors PLUS the frontier's cross-doc nav links,
    the same union ``q_frontier_new_urls`` aggregates) collapsed to host
    granularity, intra-host links dropped (at host grain they are
    self-loops, and a page's links to its own site say nothing about
    cross-site endorsement; dropping them is the standard domain-rank
    construction). On the planted corpus every chrome/content anchor is
    root-relative — all of those provably drop as self-loops — so the
    surviving graph is exactly the nav edges whose md5-derived domains
    differ. The collapse happens BEFORE the distinct, so the shuffle
    dedupes host pairs (output-sized, ~#sites², not page pairs); the
    nav side is pure doc_id column math (plant→normalize on id and
    id+1 over the SAME rows), so no join is introduced anywhere."""
    # distinct BEFORE the self-loop/empty filter (they commute on sets;
    # the oracle's WHERE-then-DISTINCT states the same edge set), with a
    # localCheckpoint between them. The order matters for a reason the
    # optimizer cannot see: PushDownPredicate substitutes the filter
    # through the union and the staged plant/normalize projections, and
    # the inlined predicate re-duplicates the whole URL expression tree
    # per reference — measured 4.2 KB -> 63.5 KB optimized plan and
    # 0.46 s -> 3.3 s on the SAME 33k-row stream (r6; the SPARK-36718
    # staging stops CollapseProject but not predicate pushdown). The
    # checkpoint materializes the DISTINCT pair stream — host-pair
    # cardinality (~#sites^2 + #sites self-loops), the output size
    # class, never corpus-sized — so the filter then runs on
    # materialized rows with no lineage to push into. It also gives
    # every consumer (pagerank, triangles, clustering) the
    # materialize-once edge list pagerank() previously rebuilt.
    pairs = _host_pair_stream(spark, sf_dir).distinct().localCheckpoint()
    return pairs.filter(
        (F.col("src_url") != F.col("target_url"))
        & (F.col("target_url") != "")
    )


def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level PageRank — the quality-prior variant web training
    pipelines actually sample by (see module docstring): the same
    integer-exact fixed point over the host-collapsed graph. Hosts are
    few (output ~ number of sites, not pages), so at 10^12 pages the
    only corpus-scale work is building the host edges; every iteration
    runs on site-cardinality rows."""
    return pagerank(host_edges_df(spark, sf_dir))


# ------------------------------------------------------------ oracle
#
# The K iterations restated as chained CTEs. src_url uses the canonical
# CLOSED FORM (htmlops._sql_canonical), so the hash additionally
# cross-checks url_normalize against its spec (the frontier-oracle
# trick). DuckDB's `//` is integer floor division like Spark's DIV
# (all operands positive here); sums of BIGINT widen to HUGEINT in
# DuckDB, hence the ::BIGINT on every rank expression.

def _sql_from_pairs(pairs_sql: str) -> str:
    """The K fixed-point iterations as chained CTEs over any
    (src_url, target_url) pair stream."""
    sql = f"""
WITH pairs AS (
{pairs_sql}
),
outdeg AS (
  SELECT src_url, count(*) AS outdeg FROM pairs GROUP BY src_url
),
nodes AS (
  SELECT src_url AS url FROM pairs
  UNION
  SELECT target_url FROM pairs
),
r0 AS (SELECT url, {SCALE}::BIGINT AS pr FROM nodes)"""
    prev = "r0"
    for k in range(1, K_ITERS + 1):
        sql += f""",
c{k} AS (
  SELECT p.target_url AS url,
    sum((r.pr * {_DNUM}) // ({_DDEN} * o.outdeg)) AS s
  FROM pairs p
  JOIN {prev} r ON p.src_url = r.url
  JOIN outdeg o ON p.src_url = o.src_url
  GROUP BY p.target_url
),
r{k} AS (
  SELECT n.url, ({_BASE} + coalesce(c.s, 0))::BIGINT AS pr
  FROM nodes n LEFT JOIN c{k} c ON n.url = c.url
)"""
        prev = f"r{k}"
    return sql + f"\nSELECT url, pr FROM {prev}"


def _sql() -> str:
    from dd_ops_ocr_spark.operators.htmlops import (
        _sql_canonical,
        _sql_target_pairs,
    )

    return _sql_from_pairs(f"""
  SELECT DISTINCT {_sql_canonical("t.doc_id")} AS src_url, t.target_url
  FROM ({_sql_target_pairs()}) t
""")


def _sql_host_pairs() -> str:
    """Host-collapsed pair stream: anchors UNION ALL nav links (the
    frontier's pair stream), host regexp'd off BOTH endpoints — src and
    the nav endpoints restated in canonical CLOSED FORM, so the hash
    cross-checks url_normalize yet again — then self-loops and
    unresolvable targets dropped around a DISTINCT (drop-then-dedup
    here, dedup-then-drop on the Spark side since r6: the two commute
    on sets, and the Spark order exists to keep the self-loop predicate
    from being pushdown-inlined into the URL expression trees). ONE
    fragment feeds host_pagerank AND host_triangles."""
    from dd_ops_ocr_spark.operators.htmlops import (
        _sql_canonical,
        _sql_target_pairs,
    )

    return f"""
  SELECT DISTINCT src_url, target_url FROM (
    SELECT
      regexp_extract({_sql_canonical("t.doc_id")}, '{_HOST_RE}', 1)
        AS src_url,
      regexp_extract(t.target_url, '{_HOST_RE}', 1) AS target_url
    FROM ({_sql_target_pairs()}) t
    UNION ALL
    SELECT
      regexp_extract({_sql_canonical("doc_id")}, '{_HOST_RE}', 1)
        AS src_url,
      regexp_extract({_sql_canonical("doc_id + 1")}, '{_HOST_RE}', 1)
        AS target_url
    FROM documents
  ) WHERE src_url <> target_url AND target_url <> ''
"""


def _sql_hosts() -> str:
    return _sql_from_pairs(_sql_host_pairs())


# ----------------------------------------------------- triangle counting
#
# The graph family's density primitive (clustering coefficient, link-
# farm detection — a spam host ring is a triangle-dense subgraph):
# per-host triangle counts. Spark uses the node-iterator++/forward
# orientation: direct each undirected edge from lower to higher
# (degree, id) rank, so every triangle {a<b<c by rank} is found exactly
# once as a->b, b->c with a->c confirmed by a semi-join — and the wedge
# join's fan-out is bounded by the max ORIENTED out-degree (~sqrt(m) on
# any graph), which is what makes the join survive a power-law degree
# distribution where a naive neighbor join explodes on the hub. The
# oracle restates triangles with plain id-ordering (u<v per edge, three
# equi-joins): the triangle SET is orientation-invariant, so the
# per-host counts hash-match even though the plans differ.


def _undirected(pairs: DataFrame) -> DataFrame:
    """Distinct undirected (u < v) edge set of a directed pair stream —
    built ONCE and shared by the triangle and coefficient consumers
    (the pair-extraction lineage upstream is corpus-scale; computing
    it twice per query would double the dedup shuffle)."""
    return pairs.select(
        F.least("src_url", "target_url").alias("u"),
        F.greatest("src_url", "target_url").alias("v"),
    ).distinct()


def _degrees(und: DataFrame) -> DataFrame:
    return (
        und.select(F.col("u").alias("host"))
        .unionAll(und.select(F.col("v").alias("host")))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("deg"))
    )


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """(host, n_tri) over a directed (src_url, target_url) pair stream:
    count of distinct undirected triangles each host participates in
    (hosts in no triangle emit no row)."""
    return _triangle_counts_over(_undirected(pairs))


def _triangle_counts_over(und: DataFrame) -> DataFrame:
    deg = _degrees(und).select(
        F.col("host").alias("n"), F.col("deg")
    )
    e = und.join(
        deg.select(F.col("n").alias("u"), F.col("deg").alias("du")), "u"
    ).join(
        deg.select(F.col("n").alias("v"), F.col("deg").alias("dv")), "v"
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    tri = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
        .join(
            oriented.select(F.col("a").alias("x"), F.col("b").alias("z")),
            ["x", "z"],
            "left_semi",
        )
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("host"))
        .groupBy("host")
        .agg(F.count("*").cast("long").alias("n_tri"))
    )


def q_host_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_counts(host_edges_df(spark, sf_dir))


def clustering_coefficient(pairs: DataFrame) -> DataFrame:
    """(host, deg, n_tri, coeff_permille): local clustering coefficient
    2*tri/(deg*(deg-1)) as integer permille (floor; both engines state
    integer division, all operands positive) for every host of degree
    >= 2 — triangle-free hosts surface with 0, which is the point of
    the report (a high-degree zero-coefficient host is the hub shape;
    a high-coefficient cluster is the link-farm shape). The undirected
    edge set is built ONCE and shared by the degree agg and the
    triangle pass (the upstream pair extraction is corpus-scale — a
    second dedup shuffle would double the real cost); the final join
    is node-cardinality-sized."""
    und = _undirected(pairs)
    deg = _degrees(und)
    tri = _triangle_counts_over(und)
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri, "host", "left")
        .select(
            "host", "deg",
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
        )
        .withColumn(
            "coeff_permille",
            F.expr("(2000 * n_tri) div (deg * (deg - 1))").cast("long"),
        )
    )


def q_host_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clustering_coefficient(host_edges_df(spark, sf_dir))


# ONE fragment states the undirected edge set, the triangle join, and
# the per-host triangle counts; both graph oracles compose it (the
# funnel-rungs sharing policy — a fix to the triangle SQL cannot
# desynchronize host_triangles from host_clustering).
_SQL_UND_TRI = """und AS (
  SELECT DISTINCT LEAST(src_url, target_url) AS u,
                  GREATEST(src_url, target_url) AS v
  FROM pairs
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  SEMI JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
ntri AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n_tri
  FROM (
    SELECT a AS host FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  )
  GROUP BY host
)"""


def _sql_triangles() -> str:
    return f"""
WITH pairs AS ({_sql_host_pairs()}),
{_SQL_UND_TRI}
SELECT host, n_tri FROM ntri
"""


def _sql_clustering() -> str:
    return f"""
WITH pairs AS ({_sql_host_pairs()}),
{_SQL_UND_TRI},
deg AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS deg
  FROM (SELECT u AS host FROM und UNION ALL SELECT v FROM und)
  GROUP BY host
)
SELECT d.host, d.deg, COALESCE(t.n_tri, 0) AS n_tri,
       CAST((2000 * COALESCE(t.n_tri, 0)) // (d.deg * (d.deg - 1))
            AS BIGINT) AS coeff_permille
FROM deg d LEFT JOIN ntri t USING (host)
WHERE d.deg >= 2
"""


SQL_LINK_GRAPH_PAGERANK = _sql()
SQL_HOST_PAGERANK = _sql_hosts()
SQL_HOST_TRIANGLES = _sql_triangles()
SQL_HOST_CLUSTERING = _sql_clustering()

QUERIES = {
    "link_graph_pagerank": q_link_graph_pagerank,
    "host_pagerank": q_host_pagerank,
    "host_triangles": q_host_triangles,
    "host_clustering": q_host_clustering,
}
ORACLE_SQL = {
    "link_graph_pagerank": SQL_LINK_GRAPH_PAGERANK,
    "host_pagerank": SQL_HOST_PAGERANK,
    "host_triangles": SQL_HOST_TRIANGLES,
    "host_clustering": SQL_HOST_CLUSTERING,
}
