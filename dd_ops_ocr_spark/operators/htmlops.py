"""HTML main-content extraction — boilerplate strip via DOM heuristics.

The reference pipeline's extraction stage works on PDF page text
(`src/modules/step2/06_ocr_processor.py` consumes rendered pages); a
web-scale corpus carries the same problem in HTML form: a page is
chrome (nav / sidebar / footer / script / style) wrapped around the
main content, and the training corpus wants ONLY the main content.
This module is the HTML twin of the flagship boilerplate-strip stage
(`pipeline.py` K15): same intent, DOM-block granularity.

Method — the classic text-vs-link-density block classifier
(Boilerpipe, Kohlschütter et al., WSDM 2010; jusText, Pomikálek 2011 —
public algorithms reimplemented from their papers' descriptions):

1. **Sanitize**: drop ``<head>``/``<script>``/``<style>`` elements
   wholesale (their text is metadata/code, never content).
2. **Segment**: split the page into blocks at closing tags of the
   leaf block elements (``nav aside h1 p footer``); the first opening
   block tag inside a segment names its DOM class.
3. **Score** each block with two integer features: visible text chars
   and chars contributed by anchor (``<a>``) text.
4. **Classify**: a block is boilerplate when its DOM class is chrome
   (``nav``/``aside``/``footer``) or anchor text dominates
   (``2*link_chars > text_chars`` — the jusText link-density gate with
   integer math so Spark and DuckDB agree bit-for-bit).
5. **Assemble**: surviving blocks, in document order, joined with
   "\\n\\n" — mirroring the flagship's A13 intra-doc fold.

Everything is JVM column math (regexp over Java regex / RE2 — the
subset used here is semantics-identical in both): zero Python in the
hot path, zero shuffles for the block classifier (scan → project →
posexplode → project, all narrow), one partial-agg shuffle for the
per-doc assembly.

The synthetic corpus has no HTML column, so queries PLANT one
deterministically around each document's text (nav + optional aside +
article(h1, two <p>s with an inline link) + script + footer, variants
gated on md5 nibbles of doc_id) and the oracle restates the same
construction — the hash check pins planting, sanitizing, segmentation,
scoring, classification, and assembly at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Leaf block elements that delimit segments; chrome classes among them.
# Tag names are case-insensitive in HTML ((?i) — same syntax and
# semantics in Java regex and RE2); the extracted class is lowercased
# before the chrome comparison.
_BLOCK_SPLIT_RE = "(?i)</(?:nav|aside|h1|p|footer)>"
_BLOCK_TAG_RE = "(?i)<(nav|aside|h1|p|footer)[ >]"
_CHROME = ["nav", "aside", "footer"]
# <head> is metadata (title/meta/style) — stripped wholesale, like
# script/style elements; `(?:\\s[^>]*)?` keeps <header> from matching.
_SANITIZE_RE = ("(?is)<head(?:\\s[^>]*)?>.*?</head>"
                "|(?is)<(?:script|style)[^>]*>.*?</(?:script|style)>")
# `(?:\\s[^>]*)?` bounds the tag name: <abbr>/<address>/<audio> must
# not count as anchors (same guard as the <head> pattern above).
_ANCHOR_RE = "(?is)<a(?:\\s[^>]*)?>.*?</a>"
_TAG_RE = "<[^>]*>"
_EVEN_NIBBLES = ["0", "2", "4", "6", "8", "a", "c", "e"]
# Entity decode order matters only for &amp; (last, so planted "&amp;"
# never re-decodes); ASCII replacements keep the hash locale-proof.
_ENTITIES = [("&copy;", "(c)"), ("&middot;", "-"), ("&nbsp;", " "),
             ("&lt;", "<"), ("&gt;", ">"), ("&amp;", "&")]


# ------------------------------------------------------------ plant

def plant_html(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, html): deterministic page chrome around
    the document text. Gates: md5 nibble 6 even -> an <aside> link box
    exists; the second <p> always carries one inline content link."""
    md = F.md5(F.col("doc_id").cast("string"))
    half = F.floor(F.length("text") / 2).cast("int")
    part1 = F.substring(F.col("text"), F.lit(1), half)
    part2 = F.substring(F.col("text"), half + F.lit(1), F.length("text"))
    aside = F.when(
        F.substring(md, 6, 1).isin(_EVEN_NIBBLES),
        F.lit('<aside><a href="/r/1">related one</a> '
              '<a href="/r/2">related two</a> '
              '<a href="/r/3">related three</a></aside>'),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>Doc "), F.col("doc_id").cast("string"),
        F.lit("</title><style>body{font:10px}</style></head><body>"),
        F.lit('<nav><a href="/">Home</a> <a href="/about">About</a> '
              '<a href="/tags">Tags</a></nav>'),
        aside,
        F.lit("<article><h1>Doc "), F.col("doc_id").cast("string"),
        F.lit(" title</h1><p>"), part1,
        F.lit("</p><p>"), part2,
        F.lit(' see <a href="/ref">reference docs</a> for details</p>'
              "</article>"
              "<script>var x = 1 &amp;&amp; 2;</script>"
              "<footer>&copy; 2026 corp &amp; partners &middot; "
              "contact</footer></body></html>"),
    )
    return docs.select("doc_id", html.alias("html"))


# ------------------------------------------------------------ core

def _visible(col):
    """Strip tags, decode entities, collapse whitespace."""
    out = F.regexp_replace(col, _TAG_RE, " ")
    for ent, rep in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, "\\s+", " "))


def _anchor_clean(col):
    """Anchor-text cleanup: strip nested tags, collapse whitespace,
    trim — deliberately NO entity decode (unlike _visible: anchors
    feed exact-match aggregation keys, and both engines must agree on
    the raw entity bytes). ONE definition with a SQL twin below; the
    outlink query and the link-graph pair stream both use it, so a
    future tweak cannot de-align html_outlinks from anchor_text_agg."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(col, _TAG_RE, " "), "\\s+", " "
        )
    )


def _sql_anchor_clean(expr: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace({expr}, '{_TAG_RE}', ' ', "
        "'g'), '\\s+', ' ', 'g'))"
    )


def classify_blocks(pages: DataFrame) -> DataFrame:
    """(doc_id, html) -> one row per non-empty block:
    (doc_id, block_idx, tag, block_text, text_chars, link_chars,
    is_boilerplate). Narrow plan — no exchange."""
    clean = F.regexp_replace("html", _SANITIZE_RE, " ")
    segs = pages.select(
        "doc_id",
        F.posexplode(F.split(clean, _BLOCK_SPLIT_RE)).alias("pos", "seg"),
    )
    text = _visible(F.col("seg"))
    nolink = _visible(F.regexp_replace("seg", _ANCHOR_RE, " "))
    scored = segs.select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("block_idx"),
        F.lower(F.regexp_extract("seg", _BLOCK_TAG_RE, 1)).alias("tag"),
        text.alias("block_text"),
        F.length(text).cast("long").alias("text_chars"),
        (F.length(text) - F.length(nolink)).cast("long").alias("link_chars"),
    ).where(F.col("text_chars") > 0)
    return scored.withColumn(
        "is_boilerplate",
        F.col("tag").isin(_CHROME)
        | (F.col("link_chars") * 2 > F.col("text_chars")),
    )


def main_content(pages: DataFrame) -> DataFrame:
    """(doc_id, html) -> (doc_id, main_text, n_blocks_kept,
    n_blocks_total, kept_chars): per-doc assembly of content blocks in
    document order ("\\n\\n" fold, = flagship A13). One shuffle, partial
    aggs map-side."""
    blocks = classify_blocks(pages)
    kept_txt = F.when(~F.col("is_boilerplate"), F.col("block_text"))
    return blocks.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("is_boilerplate"),
                            F.struct(
                                F.col("block_idx").alias("i"),
                                F.col("block_text").alias("t"),
                            ),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            "\n\n",
        ).alias("main_text"),
        F.count(kept_txt).cast("long").alias("n_blocks_kept"),
        F.count(F.lit(1)).cast("long").alias("n_blocks_total"),
        F.coalesce(
            F.sum(F.when(~F.col("is_boilerplate"), F.col("text_chars"))),
            F.lit(0),
        ).cast("long").alias("kept_chars"),
    )


# ------------------------------------------------------------ queries

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def q_html_block_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classify_blocks(plant_html(_docs(spark, sf_dir)))


def q_html_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    return main_content(plant_html(_docs(spark, sf_dir)))


def q_html_strip_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive whole-page strip — the baseline main_content beats; kept as
    a query so the contamination delta (nav/footer text in the output)
    is itself driver-checked."""
    pages = plant_html(_docs(spark, sf_dir))
    clean = F.regexp_replace("html", _SANITIZE_RE, " ")
    txt = _visible(clean)
    return pages.select(
        "doc_id",
        txt.alias("stripped_text"),
        F.length(txt).cast("long").alias("n_chars"),
    )


# ------------------------------------------------------------ oracles

_SQL_PLANT = f"""
SELECT doc_id,
  '<html><head><title>Doc ' || doc_id::VARCHAR
  || '</title><style>body{{font:10px}}</style></head><body>'
  || '<nav><a href="/">Home</a> <a href="/about">About</a> '
  || '<a href="/tags">Tags</a></nav>'
  || CASE WHEN substring(md5(doc_id::VARCHAR), 6, 1) IN
       ({", ".join(repr(n) for n in _EVEN_NIBBLES)})
     THEN '<aside><a href="/r/1">related one</a> '
       || '<a href="/r/2">related two</a> '
       || '<a href="/r/3">related three</a></aside>'
     ELSE '' END
  || '<article><h1>Doc ' || doc_id::VARCHAR || ' title</h1><p>'
  || substring(text, 1, CAST(floor(length(text)/2) AS INT))
  || '</p><p>'
  || substring(text, CAST(floor(length(text)/2) AS INT) + 1,
               length(text))
  || ' see <a href="/ref">reference docs</a> for details</p></article>'
  || '<script>var x = 1 &amp;&amp; 2;</script>'
  || '<footer>&copy; 2026 corp &amp; partners &middot; contact</footer>'
  || '</body></html>' AS html
FROM documents
"""


def _sql_visible(expr: str) -> str:
    chain = f"regexp_replace({expr}, '{_TAG_RE}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        chain = f"replace({chain}, '{ent}', '{rep}')"
    return f"trim(regexp_replace({chain}, '\\s+', ' ', 'g'))"


_SQL_BLOCKS = f"""
WITH pages AS ({_SQL_PLANT}),
segs AS (
  SELECT doc_id,
    unnest(generate_series(1, len(l)))::BIGINT AS block_idx,
    unnest(l) AS seg
  FROM (
    SELECT doc_id,
      string_split_regex(
        regexp_replace(html, '{_SANITIZE_RE}', ' ', 'g'),
        '{_BLOCK_SPLIT_RE}') AS l
    FROM pages)
), scored AS (
  SELECT doc_id, block_idx,
    lower(regexp_extract(seg, '{_BLOCK_TAG_RE}', 1)) AS tag,
    {_sql_visible("seg")} AS block_text,
    length({_sql_visible("seg")})::BIGINT AS text_chars,
    (length({_sql_visible("seg")})
     - length({_sql_visible(
         f"regexp_replace(seg, '{_ANCHOR_RE}', ' ', 'g')")}))::BIGINT
      AS link_chars
  FROM segs
)
SELECT doc_id, block_idx, tag, block_text, text_chars, link_chars,
  (tag IN ({", ".join(repr(c) for c in _CHROME)})
   OR link_chars * 2 > text_chars) AS is_boilerplate
FROM scored WHERE text_chars > 0
"""

SQL_HTML_BLOCK_CLASSIFY = _SQL_BLOCKS

SQL_HTML_MAIN_CONTENT = f"""
WITH blocks AS ({_SQL_BLOCKS})
SELECT doc_id,
  coalesce(string_agg(CASE WHEN NOT is_boilerplate THEN block_text END,
                      e'\\n\\n' ORDER BY block_idx), '') AS main_text,
  count(CASE WHEN NOT is_boilerplate THEN 1 END)::BIGINT
    AS n_blocks_kept,
  count(*)::BIGINT AS n_blocks_total,
  coalesce(sum(CASE WHEN NOT is_boilerplate THEN text_chars END),
           0)::BIGINT AS kept_chars
FROM blocks GROUP BY doc_id
"""

SQL_HTML_STRIP_TAGS = f"""
WITH pages AS ({_SQL_PLANT})
SELECT doc_id,
  {_sql_visible(f"regexp_replace(html, '{_SANITIZE_RE}', ' ', 'g')")}
    AS stripped_text,
  length({_sql_visible(
      f"regexp_replace(html, '{_SANITIZE_RE}', ' ', 'g')")})::BIGINT
    AS n_chars
FROM pages
"""


# ------------------------------------------------------- head metadata
#
# The complement of main_content: main_content THROWS AWAY <head>
# wholesale; a provenance-aware corpus also wants the head fields
# (title, description, canonical URL, language declaration, og: cards)
# as typed columns — dedup by canonical URL, language routing before
# the lang-id heuristic, titles for retrieval indexes. Same extraction
# posture as the reference's filename/object-name parsers (C10/C11,
# `src/api/main.py` filename plumbing): pull structured fields out of a
# string with anchored patterns, empty-string on absence.
#
# Patterns stay in the Java-regex/RE2-identical subset ((?is), lazy
# .*?, [^"]* classes); both engines return '' for a non-match.

_TITLE_RE = '(?is)<title[^>]*>(.*?)</title>'
_LANG_ATTR_RE = '(?is)<html[^>]*\\slang="([^"]*)"'
_DESC_RE = '(?is)<meta\\s+name="description"\\s+content="([^"]*)"'
_CANON_RE = '(?is)<link\\s+rel="canonical"\\s+href="([^"]*)"'
_OG_TITLE_RE = '(?is)<meta\\s+property="og:title"\\s+content="([^"]*)"'


def plant_html_meta(docs: DataFrame) -> DataFrame:
    """(doc_id, text, lang) -> (doc_id, html): a page whose <head>
    carries the metadata surface — html@lang, <title>, description
    (first 60 chars of the text, attribute-safe), canonical link, and
    (md5 nibble 7 even) an og:title card. Body kept minimal; head
    extraction must not depend on body shape."""
    md = F.md5(F.col("doc_id").cast("string"))
    did = F.col("doc_id").cast("string")
    excerpt = F.regexp_replace(
        F.substring(F.col("text"), 1, 60), "[^A-Za-z0-9 ]", ""
    )
    og = F.when(
        F.substring(md, 7, 1).isin(_EVEN_NIBBLES),
        F.concat(F.lit('<meta property="og:title" content="Doc '), did,
                 F.lit(' OG">')),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html lang="'), F.col("lang"), F.lit('"><head><title>Doc '),
        did, F.lit("</title>"),
        F.lit('<meta name="description" content="'), excerpt, F.lit('">'),
        F.lit('<link rel="canonical" href="https://corpus.example/doc/'),
        did, F.lit('">'), og,
        F.lit("</head><body><p>"), F.col("text"),
        F.lit("</p></body></html>"),
    )
    return docs.select("doc_id", html.alias("html"))


def extract_metadata(pages: DataFrame) -> DataFrame:
    """(doc_id, html) -> typed head fields. Pure regexp_extract column
    math over the raw page — narrow plan, zero exchanges; absent fields
    come back as '' (both engines agree)."""
    og = F.regexp_extract("html", _OG_TITLE_RE, 1)
    return pages.select(
        "doc_id",
        F.regexp_extract("html", _TITLE_RE, 1).alias("title"),
        F.regexp_extract("html", _LANG_ATTR_RE, 1).alias("html_lang"),
        F.regexp_extract("html", _DESC_RE, 1).alias("description"),
        F.regexp_extract("html", _CANON_RE, 1).alias("canonical_url"),
        og.alias("og_title"),
        (og != F.lit("")).alias("has_og"),
    )


def q_html_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    return extract_metadata(plant_html_meta(docs))


_SQL_PLANT_META = f"""
SELECT doc_id,
  '<html lang="' || lang || '"><head><title>Doc ' || doc_id::VARCHAR
  || '</title>'
  || '<meta name="description" content="'
  || regexp_replace(substring(text, 1, 60), '[^A-Za-z0-9 ]', '', 'g')
  || '">'
  || '<link rel="canonical" href="https://corpus.example/doc/'
  || doc_id::VARCHAR || '">'
  || CASE WHEN substring(md5(doc_id::VARCHAR), 7, 1) IN
       ({", ".join(repr(n) for n in _EVEN_NIBBLES)})
     THEN '<meta property="og:title" content="Doc ' || doc_id::VARCHAR
       || ' OG">'
     ELSE '' END
  || '</head><body><p>' || text || '</p></body></html>' AS html
FROM documents
"""

SQL_HTML_METADATA = f"""
WITH pages AS ({_SQL_PLANT_META})
SELECT doc_id,
  regexp_extract(html, '{_TITLE_RE}', 1) AS title,
  regexp_extract(html, '{_LANG_ATTR_RE}', 1) AS html_lang,
  regexp_extract(html, '{_DESC_RE}', 1) AS description,
  regexp_extract(html, '{_CANON_RE}', 1) AS canonical_url,
  regexp_extract(html, '{_OG_TITLE_RE}', 1) AS og_title,
  regexp_extract(html, '{_OG_TITLE_RE}', 1) <> '' AS has_og
FROM pages
"""


# ---------------------------------------------------------- outlinks
#
# The crawl-graph surface: every <a href> on the page as one
# (doc_id, link_idx, href, anchor_text) row — the input to link-graph
# PageRank-style quality signals and to frontier expansion in a
# web-scale pipeline. One-to-many via two ALIGNED regexp_extract_all
# calls (same pattern, groups 1 and 2 — identical match sites, so the
# arrays zip positionally) + posexplode; narrow plan, the fan-out never
# shuffles.

_LINK_RE = '(?is)<a\\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def extract_outlinks(pages: DataFrame) -> DataFrame:
    """(doc_id, html) -> one row per anchor, in page order. Anchor text
    is tag-stripped and whitespace-collapsed (entity decode is the
    main-content path's concern, not the graph's)."""
    arr = pages.select(
        "doc_id",
        F.regexp_extract_all("html", F.lit(_LINK_RE), 1).alias("hs"),
        F.regexp_extract_all("html", F.lit(_LINK_RE), 2).alias("ts"),
    )
    ex = arr.select(
        "doc_id", "ts", F.posexplode("hs").alias("pos", "href")
    )
    raw = F.element_at("ts", F.col("pos") + 1)
    txt = _anchor_clean(raw)
    return ex.select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("link_idx"),
        "href",
        txt.alias("anchor_text"),
    )


def q_html_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_outlinks(plant_html(_docs(spark, sf_dir)))


SQL_HTML_OUTLINKS = f"""
WITH pages AS ({_SQL_PLANT}),
arr AS (
  SELECT doc_id,
    regexp_extract_all(html, '{_LINK_RE}', 1) AS hs,
    regexp_extract_all(html, '{_LINK_RE}', 2) AS ts
  FROM pages
), ex AS (
  SELECT doc_id,
    unnest(generate_series(1, len(hs)))::BIGINT AS link_idx,
    unnest(hs) AS href,
    unnest(ts) AS raw_text
  FROM arr
)
SELECT doc_id, link_idx, href,
  {_sql_anchor_clean("raw_text")} AS anchor_text
FROM ex
"""


# --------------------------------------------------------- link graph
#
# Capstone composition: outlinks resolved against each page's CANONICAL
# base URL (url_normalize), aggregated to per-target in-degree — the
# raw material of link-graph quality signals (PageRank-family) and
# frontier dedup in a crawler. In production (doc_id, url, html) are
# columns of ONE row, so the base URL rides through the explode as a
# carried column — no join anywhere; the only exchange is the final
# hash-agg on target_url (map-side partials), which at 10^12 pages
# carries one row per (task, target) — the output, not the corpus.


def _resolved_targets(
    spark: SparkSession,
    sf_dir: str,
    with_src: bool = False,
    with_text: bool = False,
) -> DataFrame:
    """(doc_id, target_url) pairs: each planted page's anchors resolved
    against its canonical base URL. base_host is pure doc_id column
    math, so it rides the SAME narrow pipeline as the html plant — no
    join (measured: the doc_id join alternative shuffles full pages and
    costs ~2x at 1.28M docs). with_src=True additionally carries the
    page's own canonical URL as src_url (the link-graph edge source,
    used by linkgraph.pagerank). with_text=True carries the anchor's
    tag-stripped whitespace-collapsed text (same cleanup as
    extract_outlinks — aligned posexplode keeps href/text zipped)."""
    from dd_ops_ocr_spark.operators.urlops import (
        normalize_urls,
        plant_messy_urls,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    pages = normalize_urls(plant_messy_urls(plant_html(docs))).select(
        "doc_id", "html", F.col("normalized_url").alias("src_url"),
        F.regexp_extract("normalized_url", "^(https://[^/]+)", 1)
         .alias("base_host"),
        # RFC 3986 base directory: everything through the last '/' of
        # the path (query excluded) — what bare relative hrefs join to
        F.regexp_extract("normalized_url", "^([^?]*/)", 1)
         .alias("base_dir"),
    )
    arr_cols = [
        F.col("doc_id"), F.col("src_url"), F.col("base_host"),
        F.col("base_dir"),
        F.regexp_extract_all("html", F.lit(_LINK_RE), 1).alias("hs"),
    ]
    if with_text:
        arr_cols.append(
            F.regexp_extract_all("html", F.lit(_LINK_RE), 2).alias("ts")
        )
    arr = pages.select(*arr_cols)
    if with_text:
        ex = arr.select(
            "doc_id", "src_url", "base_host", "base_dir", "ts",
            F.posexplode("hs").alias("pos", "href"),
        )
    else:
        ex = arr.select(
            "doc_id", "src_url", "base_host", "base_dir",
            F.explode("hs").alias("href"),
        )
    target = (
        F.when(F.col("href").rlike("^https?://"), F.col("href"))
        # protocol-relative: take the base's scheme, not its host
        .when(F.col("href").startswith("//"),
              F.concat(F.regexp_extract("base_host", "^([a-z]+):", 1),
                       F.lit(":"), F.col("href")))
        .when(F.col("href").startswith("/"),
              F.concat(F.col("base_host"), F.col("href")))
        # bare relative: resolve against the page's directory
        .otherwise(F.concat(F.col("base_dir"), F.col("href")))
    )
    cols = [target.alias("target_url"), "doc_id"]
    if with_src:
        cols.append("src_url")
    if with_text:
        raw = F.element_at("ts", F.col("pos") + 1)
        cols.append(_anchor_clean(raw).alias("anchor_text"))
    return ex.select(*cols)


def _indegree(pairs: DataFrame) -> DataFrame:
    """(doc_id, target_url) pairs -> per-target (indegree, n_links).
    ONE definition shared by the link graph and the frontier so the
    priority signal can never silently diverge between them."""
    return pairs.groupBy("target_url").agg(
        F.countDistinct("doc_id").cast("long").alias("indegree"),
        F.count("*").cast("long").alias("n_links"),
    )


def q_link_graph_indegree(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _indegree(_resolved_targets(spark, sf_dir))


def _sql_target_pairs() -> str:
    """The (doc_id, target_url) pair stream as a standalone subquery —
    shared by the link-graph and frontier oracles."""
    from dd_ops_ocr_spark.operators.urlops import SQL_URL_NORMALIZE

    return f"""
  SELECT doc_id,
    CASE WHEN regexp_matches(href, '^https?://') THEN href
         WHEN href LIKE '//%' THEN
           regexp_extract(base_host, '^([a-z]+):', 1) || ':' || href
         WHEN href LIKE '/%' THEN base_host || href
         ELSE base_dir || href END AS target_url
  FROM (
    SELECT p.doc_id, b.base_host, b.base_dir,
      unnest(regexp_extract_all(p.html, '{_LINK_RE}', 1)) AS href
    FROM ({_SQL_PLANT}) p
    JOIN (
      SELECT doc_id,
        regexp_extract(normalized_url, '^(https://[^/]+)', 1)
          AS base_host,
        regexp_extract(normalized_url, '^([^?]*/)', 1) AS base_dir
      FROM ({SQL_URL_NORMALIZE})
    ) b ON p.doc_id = b.doc_id
  )
"""


def _sql_link_graph() -> str:
    return f"""
WITH tgt AS (
{_sql_target_pairs()}
)
SELECT target_url,
  count(DISTINCT doc_id)::BIGINT AS indegree,
  count(*)::BIGINT AS n_links
FROM tgt GROUP BY target_url
"""


def q_frontier_new_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier discovery: outlink targets NOT already in the
    corpus (by canonical URL) — what a crawler enqueues next, with
    in-degree kept as the crawl-priority signal.

    Each page contributes its chrome/content anchors (via
    _resolved_targets) PLUS a "next page" nav link to doc_id+1's
    canonical URL (the planted twin of real prev/next navigation) —
    so the anti-join genuinely splits: nav targets mostly EXIST in the
    corpus and drop out, chrome targets and the last doc's dangling nav
    link survive. The anti-join is deliberately UNHINTED: at real scale
    both sides are corpus-sized and AQE picks the strategy. The `have`
    side is built through plant→normalize while the oracle states the
    canonical CLOSED FORM — the match cross-checks url_normalize
    against its own spec. Reference analogue: result-dir probing
    decides what still needs processing (`src/api/main.py` skip
    logic); this is the web-corpus form of "what's new"."""
    from dd_ops_ocr_spark.operators.urlops import (
        normalize_urls,
        plant_messy_urls,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    shifted = docs.select(
        F.col("doc_id").alias("src_id"),
        (F.col("doc_id") + F.lit(1)).alias("doc_id"),
    )
    nav = normalize_urls(plant_messy_urls(shifted)).select(
        F.col("normalized_url").alias("target_url"),
        F.col("src_id").alias("doc_id"),
    )
    pairs = _resolved_targets(spark, sf_dir).unionAll(nav)
    graph = _indegree(pairs)
    have = normalize_urls(
        plant_messy_urls(docs.select("doc_id"))
    ).select(F.col("normalized_url").alias("target_url"))
    return graph.join(have, "target_url", "left_anti").select(
        "target_url", "indegree", "n_links"
    )


def _sql_canonical(idexpr: str) -> str:
    """Closed form of normalize(plant_messy_urls(id)) — what the messy
    plant MUST canonicalize to: lowercase host from md5 nibbles 1-2,
    /p/<id> path, ?ref=home iff nibble 11 or 12 is even (the plants
    whose query string carries the real param)."""
    from dd_ops_ocr_spark.operators.urlops import (
        _EVEN_NIBBLES as _EV,
        _HEX as _HX,
        _N_DOMAINS as _ND,
    )

    md = f"md5(({idexpr})::VARCHAR)"
    ev = ", ".join(repr(n) for n in _EV)
    nib = lambda i: f"(strpos('{_HX}', substring({md}, {i}, 1)) - 1)"
    return (
        f"'https://www.d' || (({nib(1)} * 16 + {nib(2)}) % {_ND})::VARCHAR"
        f" || '.com/p/' || ({idexpr})::VARCHAR"
        f" || CASE WHEN substring({md}, 11, 1) IN ({ev})"
        f"      OR substring({md}, 12, 1) IN ({ev})"
        f"    THEN '?ref=home' ELSE '' END"
    )


def _sql_frontier() -> str:
    return f"""
WITH pairs AS (
{_sql_target_pairs()}
  UNION ALL
  SELECT doc_id, {_sql_canonical("doc_id + 1")} AS target_url
  FROM documents
), graph AS (
  SELECT target_url,
    count(DISTINCT doc_id)::BIGINT AS indegree,
    count(*)::BIGINT AS n_links
  FROM pairs GROUP BY target_url
), have AS (
  SELECT {_sql_canonical("doc_id")} AS target_url FROM documents
)
SELECT g.target_url, g.indegree, g.n_links
FROM graph g ANTI JOIN have h USING (target_url)
"""


# ---------------------------------------------------- anchor signal
#
# Per-target anchor-text aggregation — how the web describes a page
# (the classic retrieval/quality signal: anchor text is an independent
# summary of the TARGET, written by the linking page's author). The
# web twin of the reference's comment aggregation A5
# (`src/api/main.py` ordered comment agg): many writers, one subject,
# deterministic ordered fold.
#
# Scale shape (10^12 pages): three hash operations, ALL keyed on
# target_url (or its (target, text) refinement), so AQE reuses the
# partitioning. The mega-hub worry — a URL every page links to, with
# millions of distinct texts — is bounded at every step: the counting
# agg is map-side-combinable partials; the (target, text) DISTINCT
# partially dedupes map-side before the wire; the per-target top-3 is
# a window over the ALREADY-distinct pairs (a spill-safe sort, never a
# held-in-memory set — deliberately NOT collect_set, whose per-group
# state is unbounded on a hub); and the final collect_list holds <= 3
# rows by construction. The stats<->top join keys on target_url, which
# both sides are already partitioned by.


def anchor_text_agg(pairs: DataFrame, k: int = 3) -> DataFrame:
    """(target_url, anchor_text) pairs -> per-target
    (n_anchors, n_texts, top_texts): anchor count, distinct-text count,
    and the lexicographic top-``k`` distinct texts joined with ' | '
    (lexicographic, not frequency, so the fold is deterministic and
    both engines agree bit-for-bit)."""
    from pyspark.sql import Window

    nz = pairs.filter(F.col("anchor_text") != "")
    stats = nz.groupBy("target_url").agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.countDistinct("anchor_text").cast("long").alias("n_texts"),
    )
    dist = nz.select("target_url", "anchor_text").distinct()
    w = Window.partitionBy("target_url").orderBy("anchor_text")
    top = (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("target_url")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("anchor_text")), " | "
            ).alias("top_texts")
        )
    )
    return stats.join(top, "target_url")


def q_anchor_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anchor_text_agg(
        _resolved_targets(spark, sf_dir, with_text=True)
        .select("target_url", "anchor_text")
    )


def _sql_target_pairs_text() -> str:
    """(doc_id, target_url, anchor_text) — _sql_target_pairs with the
    anchor text carried through DuckDB's aligned parallel unnest (both
    lists come from the same regex, so they zip positionally)."""
    from dd_ops_ocr_spark.operators.urlops import SQL_URL_NORMALIZE

    return f"""
  SELECT doc_id,
    CASE WHEN regexp_matches(href, '^https?://') THEN href
         WHEN href LIKE '//%' THEN
           regexp_extract(base_host, '^([a-z]+):', 1) || ':' || href
         WHEN href LIKE '/%' THEN base_host || href
         ELSE base_dir || href END AS target_url,
    {_sql_anchor_clean("raw_text")} AS anchor_text
  FROM (
    SELECT p.doc_id, b.base_host, b.base_dir,
      unnest(regexp_extract_all(p.html, '{_LINK_RE}', 1)) AS href,
      unnest(regexp_extract_all(p.html, '{_LINK_RE}', 2)) AS raw_text
    FROM ({_SQL_PLANT}) p
    JOIN (
      SELECT doc_id,
        regexp_extract(normalized_url, '^(https://[^/]+)', 1)
          AS base_host,
        regexp_extract(normalized_url, '^([^?]*/)', 1) AS base_dir
      FROM ({SQL_URL_NORMALIZE})
    ) b ON p.doc_id = b.doc_id
  )
"""


def _sql_anchor_text_agg() -> str:
    return f"""
WITH pairs AS (
{_sql_target_pairs_text()}
), nz AS (
  SELECT target_url, anchor_text FROM pairs WHERE anchor_text <> ''
), stats AS (
  SELECT target_url, count(*)::BIGINT AS n_anchors,
    count(DISTINCT anchor_text)::BIGINT AS n_texts
  FROM nz GROUP BY target_url
), dist AS (
  SELECT DISTINCT target_url, anchor_text FROM nz
), ranked AS (
  SELECT target_url, anchor_text,
    row_number() OVER (PARTITION BY target_url ORDER BY anchor_text)
      AS rn
  FROM dist
), top AS (
  SELECT target_url,
    string_agg(anchor_text, ' | ' ORDER BY anchor_text) AS top_texts
  FROM ranked WHERE rn <= 3 GROUP BY target_url
)
SELECT target_url, s.n_anchors, s.n_texts, t.top_texts
FROM stats s JOIN top t USING (target_url)
"""


# ------------------------------------------------------------ tables
#
# Structured-data extraction — the htmlops family read chrome, links,
# and metadata but not DATA: <table> markup is how the web serializes
# relational facts, and a training pipeline flattens them into
# (table, row, col, cell) tuples. Real nested fan-out: tables ->
# rows -> cells via three regexp_extract_all levels + posexplode,
# entirely narrow (the fan-out never shuffles). Non-greedy matching
# assumes non-nested tables — the planted corpus guarantees it;
# nested tables are a documented seam (a stack parser in mapInPandas,
# the decode_warc idiom, if a corpus needs them).

_TABLE_GATE_NIB = 7  # md5(doc_id) nibble 7 even -> doc carries a table
_TABLE_RE = "(?is)<table[^>]*>(.*?)</table>"
_TR_RE = "(?is)<tr[^>]*>(.*?)</tr>"
_CELL_RE = "(?is)<t[dh][^>]*>(.*?)</t[dh]>"


def plant_html_table(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, html): gated docs (nibble 7 even)
    carry one 2-column table — header (name, value) plus 1 + doc_id%3
    data rows of closed-form cells (k<doc_id>_<r>, (doc_id*r)%97)."""
    md = F.md5(F.col("doc_id").cast("string"))
    n_rows = (F.pmod("doc_id", F.lit(3)) + 1).cast("int")
    data_rows = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n_rows),
            lambda r: F.concat(
                F.lit("<tr><td>k"), F.col("doc_id").cast("string"),
                F.lit("_"), r.cast("string"), F.lit("</td><td>"),
                F.pmod(F.col("doc_id") * r, F.lit(97)).cast("string"),
                F.lit("</td></tr>"),
            ),
        ),
        F.lit(""),
        lambda acc, x: F.concat(acc, x),
    )
    table = F.when(
        F.substring(md, _TABLE_GATE_NIB, 1).isin(_EVEN_NIBBLES),
        F.concat(
            F.lit("<table><tr><th>name</th><th>value</th></tr>"),
            data_rows,
            F.lit("</table>"),
        ),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><p>"), F.col("text"), F.lit("</p>"),
            table, F.lit("</body></html>"),
        ).alias("html"),
    )


def extract_tables(pages: DataFrame) -> DataFrame:
    """(doc_id, html) -> one row per CELL:
    (doc_id, table_idx, row_idx, col_idx, is_header, cell).
    Indices are 0-based in document order; is_header marks <th> rows.
    Docs without tables emit nothing (posexplode drops empties)."""
    t = pages.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all("html", F.lit(_TABLE_RE), 1)
        ).alias("table_idx", "thtml"),
    )
    r = t.select(
        "doc_id", "table_idx",
        F.posexplode(
            F.regexp_extract_all("thtml", F.lit(_TR_RE), 1)
        ).alias("row_idx", "rhtml"),
    )
    c = r.select(
        "doc_id", "table_idx", "row_idx",
        F.col("rhtml").rlike("(?is)<th[\\s>]").alias("is_header"),
        F.posexplode(
            F.regexp_extract_all("rhtml", F.lit(_CELL_RE), 1)
        ).alias("col_idx", "raw_cell"),
    )
    return c.select(
        "doc_id",
        F.col("table_idx").cast("int").alias("table_idx"),
        F.col("row_idx").cast("int").alias("row_idx"),
        F.col("col_idx").cast("int").alias("col_idx"),
        "is_header",
        _visible(F.col("raw_cell")).alias("cell"),
    )


def q_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_tables(plant_html_table(_docs(spark, sf_dir)))


def _sql_tables() -> str:
    """The PLANT's closed form — pins plant AND the three-level regex
    parser at once (the warc_records pattern)."""
    ev = ", ".join(repr(n) for n in _EVEN_NIBBLES)
    return f"""
WITH src AS (
  SELECT doc_id, (doc_id % 3 + 1) AS nr FROM documents
  WHERE substring(md5(doc_id::VARCHAR), {_TABLE_GATE_NIB}, 1) IN ({ev})
),
cols AS (SELECT * FROM (VALUES (0), (1)) c(col_idx))
SELECT doc_id, CAST(0 AS INT) AS table_idx, CAST(0 AS INT) AS row_idx,
       CAST(col_idx AS INT) AS col_idx, true AS is_header,
       CASE col_idx WHEN 0 THEN 'name' ELSE 'value' END AS cell
FROM src, cols
UNION ALL
SELECT doc_id, CAST(0 AS INT), CAST(r.r AS INT),
       CAST(col_idx AS INT), false,
       CASE col_idx WHEN 0 THEN 'k' || doc_id::VARCHAR || '_' || r.r::VARCHAR
            ELSE ((doc_id * r.r) % 97)::VARCHAR END
FROM src, UNNEST(range(1, nr + 1)) AS r(r), cols
"""


# ------------------------------------------------- interleaved spans
#
# The bridge to the engine's core data model: the north rule's input
# is an Iceberg table of INTERLEAVED text + media spans per document
# (kind, text, media_ref, order) — `html_interleaved_spans` is how a
# crawled HTML page becomes that row shape, the web twin of the PDF
# page iterator (reference: step1/01_pdf_reader.py feeding step1/03's
# converter). One alternation regex captures text blocks and <img>
# tags IN DOCUMENT ORDER (a single regexp_extract_all preserves match
# order, so interleaving survives); posexplode assigns `order`; kind
# and the media_ref/text projection are per-row CASE math. Narrow
# plan — a 10^12-page corpus lands as spans without one shuffle.

_SPAN_ELEM_RE = "(?is)(<p[^>]*>.*?</p>|<img[^>]*>)"
_IMG_SRC_RE = '(?is)<img[^>]*src="([^"]*)"'


def plant_html_media(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, html): two text paragraphs with
    1 + doc_id%2 <img> tags interleaved between them — the minimal
    interleaved page whose span sequence has a closed form."""
    half = F.floor(F.length("text") / 2).cast("int")
    part1 = F.substring(F.col("text"), F.lit(1), half)
    part2 = F.substring(F.col("text"), half + F.lit(1), F.length("text"))
    imgs = F.concat_ws(
        "",
        F.transform(
            F.sequence(F.lit(0), F.pmod("doc_id", F.lit(2)).cast("int")),
            lambda k: F.concat(
                F.lit('<img src="/img/'), F.col("doc_id").cast("string"),
                F.lit("_"), k.cast("string"), F.lit('.jpg">'),
            ),
        ),
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><body><p>"), part1, F.lit("</p>"),
            imgs,
            F.lit("<p>"), part2, F.lit("</p></body></html>"),
        ).alias("html"),
    )


def html_interleaved_spans(pages: DataFrame) -> DataFrame:
    """(doc_id, html) -> (doc_id, kind, text, media_ref, order): the
    engine's span-sequence shape. Text spans carry tag-stripped,
    entity-decoded, whitespace-collapsed content with media_ref '';
    media spans carry the src with text ''. Empty text blocks are
    dropped AFTER ordering (order indices stay stable — a span's
    position is its document position, not its survivor rank)."""
    ex = pages.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all("html", F.lit(_SPAN_ELEM_RE), 1)
        ).alias("order", "elem"),
    )
    is_img = F.col("elem").rlike("(?is)^<img")
    txt = _visible(F.col("elem"))
    return ex.select(
        "doc_id",
        F.when(is_img, F.lit("media")).otherwise(F.lit("text"))
         .alias("kind"),
        F.when(is_img, F.lit("")).otherwise(txt).alias("text"),
        F.when(is_img, F.regexp_extract("elem", _IMG_SRC_RE, 1))
         .otherwise(F.lit("")).alias("media_ref"),
        F.col("order").cast("int").alias("order"),
    ).where(is_img | (F.length(txt) > 0))


def q_html_interleaved_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return html_interleaved_spans(plant_html_media(_docs(spark, sf_dir)))


def _sql_interleaved() -> str:
    """Closed form of the planted page's span sequence: text half 1 at
    order 0, 1 + doc_id%2 media refs, text half 2 last."""
    return """
WITH src AS (
  SELECT doc_id,
         substr(text, 1, CAST(floor(length(text) / 2) AS INT)) AS p1,
         substr(text, CAST(floor(length(text) / 2) AS INT) + 1) AS p2,
         (doc_id % 2 + 1) AS n_img
  FROM documents
),
spans AS (
  SELECT doc_id, 'text' AS kind,
         trim(regexp_replace(p1, '\\s+', ' ', 'g')) AS text,
         '' AS media_ref, 0 AS ord
  FROM src
  UNION ALL
  SELECT doc_id, 'media', '',
         '/img/' || doc_id::VARCHAR || '_' || k.k::VARCHAR || '.jpg',
         CAST(1 + k.k AS INT)
  FROM src, UNNEST(range(0, n_img)) AS k(k)
  UNION ALL
  SELECT doc_id, 'text',
         trim(regexp_replace(p2, '\\s+', ' ', 'g')), '',
         CAST(n_img + 1 AS INT)
  FROM src
)
SELECT doc_id, kind, text, media_ref, CAST(ord AS INT) AS "order"
FROM spans WHERE kind = 'media' OR length(text) > 0
"""


QUERIES = {
    "html_main_content": q_html_main_content,
    "html_block_classify": q_html_block_classify,
    "html_strip_tags": q_html_strip_tags,
    "html_metadata": q_html_metadata,
    "html_outlinks": q_html_outlinks,
    "link_graph_indegree": q_link_graph_indegree,
    "frontier_new_urls": q_frontier_new_urls,
    "anchor_text_agg": q_anchor_text_agg,
    "html_tables": q_html_tables,
    "html_interleaved_spans": q_html_interleaved_spans,
}
ORACLE_SQL = {
    "html_main_content": SQL_HTML_MAIN_CONTENT,
    "html_block_classify": SQL_HTML_BLOCK_CLASSIFY,
    "html_strip_tags": SQL_HTML_STRIP_TAGS,
    "html_metadata": SQL_HTML_METADATA,
    "html_outlinks": SQL_HTML_OUTLINKS,
    "link_graph_indegree": _sql_link_graph(),
    "frontier_new_urls": _sql_frontier(),
    "anchor_text_agg": _sql_anchor_text_agg(),
    "html_tables": _sql_tables(),
    "html_interleaved_spans": _sql_interleaved(),
}
