"""Crawl-politeness operators — robots.txt and sitemap parsing, the two
site-level control surfaces a web-scale ingestion pipeline consults
before (robots) and while (sitemaps) fetching a host.

Reference analogue: the pre-check gate of
`src/modules/step0/01_pre_check.py` — an upstream policy decides which
inputs the pipeline may process at all; here the policy is the public
Robots Exclusion Protocol (RFC 9309) instead of filename rules.

Both operators parse REAL control-file text (planted deterministically
per host, the same closed-form md5 gating as the URL plants) and the
oracles restate the DECISION in closed form — so the DuckDB hash check
pins plant, parser, and evaluator against the spec at once, the same
triangulation `url_normalize` and the frontier use.

Scale shape (10^12 pages):

* robots: the rules table is HOST-cardinality (one row per site — tiny
  next to the corpus), so the join is a broadcast; rule evaluation is
  pure per-row array math (filter + array_max over struct ordering) —
  no corpus shuffle anywhere, the verdict rides the scan.
* sitemaps: control files arrive as ordinary crawl documents; the parse
  is a narrow per-row fan-out (aligned regexp_extract_all + posexplode,
  the html_outlinks pattern) — zero exchanges.

RFC 9309 subset implemented: single `User-agent: *` group,
`Allow`/`Disallow` path-prefix rules, longest-match-wins with Allow
winning length ties (the published Google/RFC tie rule), empty match
set = allowed, and the de-facto `Crawl-delay` extension (parsed per
host, consumed by `fetch_schedule` below). Seams (documented, not
silently wrong): %-encoded rule paths, `*`/`$` wildcards, multiple
agent groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dd_ops_ocr_spark.operators.urlops import (
    _EVEN_IN,
    _EVEN_NIBBLES,
    _HEX,
    _N_DOMAINS,
    _NIB_SQL,
)

# robots gates key on md5(host_id) nibbles 3-5 — a DIFFERENT keyspace
# (md5 of the 0..39 host id, not of doc_id), so they are independent of
# every doc-level plant by construction. Nibble 5's value sets the
# host's Crawl-delay (1..4 s).
_DIS_NIB, _ALW_NIB, _DELAY_NIB = 3, 4, 5

_RULE_RE = "(?m)^(Allow|Disallow): (\\S+)$"

_HOST_ONLY_RE = "^https?://([^/]+)"
_PATH_RE = "^https?://[^/]+(.*)$"


def _host_nib_even(md, i: int):
    return F.substring(md, i, 1).isin(_EVEN_NIBBLES)


def robots_df(spark: SparkSession) -> DataFrame:
    """(host, robots_txt, rules) for every planted host: the literal
    robots.txt text plus its parsed rule list. Every host disallows
    /admin/; md5(host_id) nibble 3 even additionally disallows /p/;
    nibble 4 even carves back Allow: /p/2 (the longest-match override).
    rules is array<struct<allow:boolean,path:string>> via two ALIGNED
    regexp_extract_all calls zipped positionally (the html_outlinks
    alignment trick)."""
    hosts = spark.range(_N_DOMAINS)
    md = F.md5(F.col("id").cast("string"))
    delay = (
        F.instr(F.lit(_HEX), F.substring(md, _DELAY_NIB, 1)) - 1
    ) % 4 + 1
    txt = F.concat(
        F.lit("User-agent: *\nDisallow: /admin/\n"),
        F.when(_host_nib_even(md, _DIS_NIB), F.lit("Disallow: /p/\n"))
         .otherwise(F.lit("")),
        F.when(_host_nib_even(md, _ALW_NIB), F.lit("Allow: /p/2\n"))
         .otherwise(F.lit("")),
        F.concat(F.lit("Crawl-delay: "), delay.cast("string"), F.lit("\n")),
    )
    parsed = hosts.select(
        F.concat(F.lit("www.d"), F.col("id").cast("string"),
                 F.lit(".com")).alias("host"),
        txt.alias("robots_txt"),
    ).withColumn(
        "rules",
        F.zip_with(
            F.regexp_extract_all("robots_txt", F.lit(_RULE_RE), 1),
            F.regexp_extract_all("robots_txt", F.lit(_RULE_RE), 2),
            lambda d, p: F.struct(
                (d == "Allow").alias("allow"), p.alias("path")
            ),
        ),
    ).withColumn(
        # de-facto Crawl-delay extension: parsed from the TEXT (not
        # re-derived from the plant), absent -> the 1 s default every
        # polite crawler assumes
        "crawl_delay",
        F.coalesce(
            F.regexp_extract(
                "robots_txt", r"(?m)^Crawl-delay: (\d+)$", 1
            ).try_cast("long"),
            F.lit(1),
        ),
    )
    return parsed


def robots_verdicts(pages: DataFrame, robots: DataFrame) -> DataFrame:
    """(doc_id, host, path) x (host, rules) -> + allowed. RFC 9309
    longest-match: among rules whose path is a prefix of the URL path,
    take max (length, allow) — struct ordering makes Allow win length
    ties; an empty match set is allowed. Broadcast the host-sized rules
    side; the verdict itself is per-row array math, no shuffle."""
    joined = pages.join(F.broadcast(robots.select("host", "rules")),
                        "host", "left")
    matched = F.filter(
        "rules", lambda r: F.col("path").startswith(r["path"])
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["path"]).alias("l"),
                r["allow"].cast("int").alias("a"),
            ),
        )
    )
    return joined.select(
        "doc_id", "host", "path",
        F.coalesce(best["a"] == 1, F.lit(True)).alias("allowed"),
    )


def _frontier_pages(spark: SparkSession, sf_dir: str):
    """The (doc_id, host, path) frontier both oracled queries evaluate:
    plant the messy URL, normalize it (cross-checks url_normalize yet
    again), split host/path. ONE definition — the module's own
    canonical_host_expr policy ("a grammar change cannot desynchronize
    them") applies to the page shape too: a projection change must hit
    robots_filter and fetch_schedule together or their shared robots
    join silently diverges."""
    from dd_ops_ocr_spark.operators.urlops import (
        normalize_urls,
        plant_messy_urls,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    return normalize_urls(plant_messy_urls(docs)).select(
        "doc_id",
        F.regexp_extract("normalized_url", _HOST_ONLY_RE, 1)
         .alias("host"),
        F.regexp_extract("normalized_url", _PATH_RE, 1).alias("path"),
    )


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document robots verdict over the canonical URLs: plant the
    messy URL, normalize it (cross-checks url_normalize yet again),
    split host/path, evaluate the host's parsed robots rules."""
    pages = _frontier_pages(spark, sf_dir)
    return robots_verdicts(pages, robots_df(spark))


def fetch_schedule(pages: DataFrame, robots: DataFrame) -> DataFrame:
    """Politeness scheduler — the step between the frontier and the
    fetcher: robots-allowed URLs only, one fetch lane per host, slot
    k on a host fires at k * crawl_delay seconds. Output
    (doc_id, host, slot, delay_sec, fetch_offset_sec); slot order is
    doc_id ascending — deterministic, so re-planning a crawl after a
    failure reproduces the same schedule (the resumability property
    the ledger gives extraction, applied to fetching).

    Scale shape: the verdict + delay lookup both ride the broadcast
    host table (host-cardinality, the bounded side); slot assignment
    is ONE host-keyed window. A mega-host (10^8+ frontier URLs) makes
    one long task: the fix is the bounded.py treatment — bucket by
    doc_id range, per-bucket row_number plus a cumulative carry-in
    base — worth building only past task-size limits, noted not
    built."""
    allowed = robots_verdicts(pages, robots).filter("allowed")
    delayed = allowed.join(
        F.broadcast(robots.select("host", "crawl_delay")), "host"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("doc_id")
    return delayed.select(
        "doc_id",
        "host",
        (F.row_number().over(w) - 1).cast("int").alias("slot"),
        F.col("crawl_delay").cast("long").alias("delay_sec"),
    ).withColumn(
        "fetch_offset_sec",
        (F.col("slot") * F.col("delay_sec")).cast("long"),
    )


def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    pages = _frontier_pages(spark, sf_dir)
    return fetch_schedule(pages, robots_df(spark))


# The oracle states the DECISION in closed form: the only rule that can
# match a planted path (/p/<id>[?ref=home]) is the gated Disallow: /p/,
# overridden by the gated Allow: /p/2 on ids whose decimal form starts
# with 2; Disallow: /admin/ provably never fires. A parser or evaluator
# bug that e.g. let /admin/ match, inverted the tie rule, or lost a rule
# line would hash-mismatch.

def _sql_robots() -> str:
    from dd_ops_ocr_spark.operators.urlops import SQL_HOST_ID

    k = SQL_HOST_ID
    hnib = lambda i: f"substring(md5({k}::VARCHAR), {i}, 1)"
    return f"""
WITH u AS (
  SELECT doc_id,
    'www.d' || {k}::VARCHAR || '.com' AS host,
    '/p/' || doc_id::VARCHAR
    || CASE WHEN substring(md5(doc_id::VARCHAR), 11, 1) IN ({_EVEN_IN})
         OR substring(md5(doc_id::VARCHAR), 12, 1) IN ({_EVEN_IN})
       THEN '?ref=home' ELSE '' END AS path,
    {hnib(_DIS_NIB)} IN ({_EVEN_IN}) AS dis_p,
    {hnib(_ALW_NIB)} IN ({_EVEN_IN}) AS alw_p2
  FROM documents
)
SELECT doc_id, host, path,
  NOT (dis_p AND path LIKE '/p/%'
       AND NOT (alw_p2 AND path LIKE '/p/2%')) AS allowed
FROM u
"""


# --------------------------------------------------------------- sitemap
#
# Per-host sitemap.xml: plant the literal XML (1 + host_id % 4 entries,
# lastmod/priority derived from host arithmetic — no md5 needed), parse
# it back with aligned extracts + posexplode. Both directions of the
# round trip are pinned by the closed-form oracle, the warc_records
# pattern.

def sitemap_df(spark: SparkSession) -> DataFrame:
    """(host, sitemap_xml) for every planted host: 1 + (host_id % 4)
    <url> entries pointing at /s/<j> section pages, lastmod a host-
    derived month, priority the textbook descending decimal."""
    hosts = spark.range(_N_DOMAINS)
    hid = F.col("id")
    entry = lambda j: F.when(
        F.lit(j) <= hid % 4 + 1,
        F.concat(
            F.lit("<url><loc>https://www.d"), hid.cast("string"),
            F.lit(f".com/s/{j}</loc>"),
            F.lit("<lastmod>2026-0"), (hid % 9 + 1).cast("string"),
            F.lit("-01</lastmod>"),
            F.lit(f"<priority>0.{10 - j}</priority></url>"),
        ),
    ).otherwise(F.lit(""))
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        *[entry(j) for j in range(1, 5)],
        F.lit("</urlset>"),
    )
    return hosts.select(
        F.concat(F.lit("www.d"), hid.cast("string"),
                 F.lit(".com")).alias("host"),
        xml.alias("sitemap_xml"),
    )


_LOC_RE = "<url><loc>([^<]*)</loc>"
_LASTMOD_RE = "<lastmod>([^<]*)</lastmod>"
_PRIO_RE = "<priority>([^<]*)</priority>"


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """(host, sitemap_xml) -> one row per <url> entry: (host, seq, loc,
    lastmod, priority). Three ALIGNED regexp_extract_all arrays (every
    entry carries all three tags, so positions line up) + ONE
    posexplode — narrow plan, zero exchanges."""
    arr = sitemaps.select(
        "host",
        F.regexp_extract_all("sitemap_xml", F.lit(_LOC_RE), 1)
         .alias("locs"),
        F.regexp_extract_all("sitemap_xml", F.lit(_LASTMOD_RE), 1)
         .alias("mods"),
        F.regexp_extract_all("sitemap_xml", F.lit(_PRIO_RE), 1)
         .alias("prios"),
    )
    ex = arr.select(
        "host", "mods", "prios",
        F.posexplode("locs").alias("pos", "loc"),
    )
    return ex.select(
        "host",
        (F.col("pos") + 1).cast("long").alias("seq"),
        "loc",
        F.element_at("mods", F.col("pos") + 1).alias("lastmod"),
        F.element_at("prios", F.col("pos") + 1).alias("priority"),
    )


def q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sf_dir unused: sitemaps are host-cardinality control files, not
    # corpus rows — kept in the (spark, sf_dir) signature the driver
    # calls with.
    return parse_sitemaps(sitemap_df(spark))


def _sql_sitemap() -> str:
    return f"""
SELECT
  'www.d' || k::VARCHAR || '.com' AS host,
  j::BIGINT AS seq,
  'https://www.d' || k::VARCHAR || '.com/s/' || j::VARCHAR AS loc,
  '2026-0' || ((k % 9) + 1)::VARCHAR || '-01' AS lastmod,
  '0.' || (10 - j)::VARCHAR AS priority
FROM generate_series(0, {_N_DOMAINS - 1}) AS t(k),
     LATERAL unnest(generate_series(1, (k % 4) + 1)) AS u(j)
"""


# ----------------------------------------------------------------- feeds
#
# Atom (RFC 4287) — the third discovery channel beside robots and
# sitemaps: feeds announce NEW content with timestamps, which drives
# recrawl scheduling (recrawl_delta consumes what this discovers).
# Same plant-parse-oracle triangulation and the same aligned-extract
# narrow plan as sitemaps; a feed is host-cardinality control text.

_FEED_TITLE_RE = "<entry><title>([^<]*)</title>"
_FEED_LINK_RE = '<link href="([^"]*)"/>'
_FEED_UPDATED_RE = "<updated>([^<]*)</updated>"


def feed_df(spark: SparkSession) -> DataFrame:
    """(host, feed_xml): an Atom feed per host with 1 + host_id%3
    entries; entry j links /posts/<j>, updated on day j of the host's
    month (same month arithmetic as the sitemap lastmod)."""
    hosts = spark.range(_N_DOMAINS)
    hid = F.col("id")
    entry = lambda j: F.when(
        F.lit(j) <= hid % 3 + 1,
        F.concat(
            F.lit(f"<entry><title>Post {j} on d"), hid.cast("string"),
            F.lit("</title>"),
            F.lit('<link href="https://www.d'), hid.cast("string"),
            F.lit(f'.com/posts/{j}"/>'),
            F.lit("<updated>2026-0"), (hid % 9 + 1).cast("string"),
            F.lit(f"-0{j}T00:00:00Z</updated></entry>"),
        ),
    ).otherwise(F.lit(""))
    xml = F.concat(
        F.lit('<?xml version="1.0"?>'
              '<feed xmlns="http://www.w3.org/2005/Atom">'),
        *[entry(j) for j in range(1, 4)],
        F.lit("</feed>"),
    )
    return hosts.select(
        F.concat(F.lit("www.d"), hid.cast("string"),
                 F.lit(".com")).alias("host"),
        xml.alias("feed_xml"),
    )


def parse_feeds(feeds: DataFrame) -> DataFrame:
    """(host, feed_xml) -> one row per <entry>: (host, seq, title,
    link, updated). Three aligned regexp_extract_all arrays + one
    posexplode — zero exchanges."""
    arr = feeds.select(
        "host",
        F.regexp_extract_all("feed_xml", F.lit(_FEED_TITLE_RE), 1)
         .alias("titles"),
        F.regexp_extract_all("feed_xml", F.lit(_FEED_LINK_RE), 1)
         .alias("links"),
        F.regexp_extract_all("feed_xml", F.lit(_FEED_UPDATED_RE), 1)
         .alias("updateds"),
    )
    ex = arr.select(
        "host", "links", "updateds",
        F.posexplode("titles").alias("pos", "title"),
    )
    return ex.select(
        "host",
        (F.col("pos") + 1).cast("long").alias("seq"),
        "title",
        F.element_at("links", F.col("pos") + 1).alias("link"),
        F.element_at("updateds", F.col("pos") + 1).alias("updated"),
    )


def q_feed_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sf_dir unused: feeds are host-cardinality control files (the
    # sitemap precedent).
    return parse_feeds(feed_df(spark))


def _sql_feed() -> str:
    return f"""
SELECT
  'www.d' || k::VARCHAR || '.com' AS host,
  j::BIGINT AS seq,
  'Post ' || j::VARCHAR || ' on d' || k::VARCHAR AS title,
  'https://www.d' || k::VARCHAR || '.com/posts/' || j::VARCHAR AS link,
  '2026-0' || ((k % 9) + 1)::VARCHAR || '-0' || j::VARCHAR
    || 'T00:00:00Z' AS updated
FROM generate_series(0, {_N_DOMAINS - 1}) AS t(k),
     LATERAL unnest(generate_series(1, (k % 3) + 1)) AS u(j)
"""


# -------------------------------------------------------------- redirects
#
# HTTP redirect-chain resolution — before URL-keyed dedup, every alias
# must collapse to its final target or the same page survives once per
# 301 hop. Planted chains: doc_id % 8 in {0,1,2} redirects to doc_id+1,
# so consecutive ids form chains of length 3/2/1 ending at the first
# id with id % 8 == 3 (or at the corpus edge — the last ids' dangling
# targets are not sources, so their chains stop early, and the oracle's
# closed form says exactly where).
#
# Scale shape: K bounded LEFT hash joins of the corpus against the
# redirect map (crawl policy caps hops — browsers ~20, pipelines ~5),
# each join keyed on the current URL so AQE reuses the partitioning;
# rows already resolved carry NULL join keys and pass through. Chains
# longer than K would switch to pointer doubling (follow the RESOLVED
# map instead of the raw map each round — log2 steps), noted here so
# the bound is explicit.

_HOP_MOD = 8
_HOP_SRC = 3          # residues 0..2 are redirect sources
K_HOPS = 3


def _canon_url(docs: DataFrame, out: str) -> DataFrame:
    """Append the canonical URL of the ``doc_id`` column as ``out``
    (plant->normalize; pure doc_id column math, no join)."""
    from dd_ops_ocr_spark.operators.urlops import (
        normalize_urls,
        plant_messy_urls,
    )

    return (
        normalize_urls(plant_messy_urls(docs))
        .drop("url", "changed")
        .withColumnRenamed("normalized_url", out)
    )


def redirect_edges_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) canonical-URL redirect pairs for the planted 301s."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    srcs = _canon_url(
        docs.filter(F.col("doc_id") % _HOP_MOD < _HOP_SRC), "src"
    )
    return _canon_url(
        srcs.select("src", (F.col("doc_id") + 1).alias("doc_id")), "dst"
    ).select("src", "dst")


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(url, final_url, n_hops) for every corpus URL after following
    at most K_HOPS redirects."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id"
    )
    edges = redirect_edges_df(spark, sf_dir)
    cur = _canon_url(docs, "url").select(
        "url",
        F.col("url").alias("final_url"),
        F.lit(0).cast("long").alias("n_hops"),
    )
    for _ in range(K_HOPS):
        cur = cur.join(
            edges, cur.final_url == edges.src, "left"
        ).select(
            "url",
            F.coalesce("dst", "final_url").alias("final_url"),
            (F.col("n_hops")
             + F.col("dst").isNotNull().cast("long")).alias("n_hops"),
        )
    return cur


def _sql_redirects() -> str:
    """Closed form: a source at residue r walks 3-r hops unless the
    corpus edge cuts the chain (sources beyond max(doc_id) don't
    exist), so n_hops = least(3 - r, max_id - doc_id + 1)."""
    from dd_ops_ocr_spark.operators.htmlops import _sql_canonical

    return f"""
WITH mx AS (SELECT max(doc_id) AS m FROM documents)
SELECT {_sql_canonical("doc_id")} AS url,
  {_sql_canonical("doc_id + h")} AS final_url,
  h::BIGINT AS n_hops
FROM (
  SELECT doc_id,
    CASE WHEN doc_id % {_HOP_MOD} < {_HOP_SRC}
      THEN least({_HOP_SRC} - doc_id % {_HOP_MOD},
                 (SELECT m FROM mx) - doc_id + 1)
      ELSE 0 END AS h
  FROM documents
)
"""


def _sql_schedule() -> str:
    """The robots decision closed form, filtered to allowed rows, plus
    the delay nibble and a per-host ROW_NUMBER — DuckDB restates the
    whole frontier->robots->schedule chain."""
    from dd_ops_ocr_spark.operators.urlops import SQL_HOST_ID

    k = SQL_HOST_ID
    hmd = f"md5({k}::VARCHAR)"
    hnib = lambda i: f"substring({hmd}, {i}, 1)"
    dval = (f"((strpos('0123456789abcdef', {hnib(_DELAY_NIB)}) - 1)"
            f" % 4 + 1)")
    return f"""
WITH u AS (
  SELECT doc_id,
    'www.d' || {k}::VARCHAR || '.com' AS host,
    '/p/' || doc_id::VARCHAR
    || CASE WHEN substring(md5(doc_id::VARCHAR), 11, 1) IN ({_EVEN_IN})
         OR substring(md5(doc_id::VARCHAR), 12, 1) IN ({_EVEN_IN})
       THEN '?ref=home' ELSE '' END AS path,
    {hnib(_DIS_NIB)} IN ({_EVEN_IN}) AS dis_p,
    {hnib(_ALW_NIB)} IN ({_EVEN_IN}) AS alw_p2,
    {dval}::BIGINT AS delay_sec
  FROM documents
),
a AS (
  SELECT doc_id, host, delay_sec
  FROM u
  WHERE NOT (dis_p AND path LIKE '/p/%'
             AND NOT (alw_p2 AND path LIKE '/p/2%'))
)
SELECT doc_id, host,
  CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) - 1
       AS INT) AS slot,
  delay_sec,
  CAST((ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) - 1)
       * delay_sec AS BIGINT) AS fetch_offset_sec
FROM a
"""


SQL_ROBOTS_FILTER = _sql_robots()
SQL_FETCH_SCHEDULE = _sql_schedule()
SQL_SITEMAP_URLS = _sql_sitemap()
SQL_REDIRECT_RESOLVE = _sql_redirects()

QUERIES = {
    "robots_filter": q_robots_filter,
    "sitemap_urls": q_sitemap_urls,
    "redirect_resolve": q_redirect_resolve,
    "fetch_schedule": q_fetch_schedule,
    "feed_entries": q_feed_entries,
}
ORACLE_SQL = {
    "robots_filter": SQL_ROBOTS_FILTER,
    "sitemap_urls": SQL_SITEMAP_URLS,
    "redirect_resolve": SQL_REDIRECT_RESOLVE,
    "fetch_schedule": SQL_FETCH_SCHEDULE,
    "feed_entries": _sql_feed(),
}
