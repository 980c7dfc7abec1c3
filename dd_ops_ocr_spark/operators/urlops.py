"""URL filtering + per-domain capping — the provenance-hygiene stage of a
web-scale training pipeline (reference analogue: the filename/object-name
provenance parsing of `src/modules/step0/01_pre_check.py`, generalized to
the URL form a crawl corpus carries).

Three classic sub-steps, composed in one pass:

1. **Parse**: host / registered domain / TLD out of the URL string with
   regexes whose semantics are identical in Java regex (Spark) and RE2
   (DuckDB) — no lookaround, no backrefs.
2. **Blocklist**: drop documents whose registered domain is on an exact
   blocklist (tiny list → a broadcast-free `isin`; a big production list
   would become a broadcast anti-join, same plan shape as
   ``decontaminate``'s verify join).
3. **Per-domain cap**: keep at most ``_DOMAIN_CAP`` documents per
   registered domain, choosing the cap-smallest ``md5(doc_id)`` values
   (a deterministic, engine-independent order with no ties).

Scale shape — the cap is the interesting part. A naive
``row_number() OVER (PARTITION BY domain)`` puts every document of a
mega-domain (CommonCrawl: a single host can be 1e8 pages) in ONE task.
Instead the cap runs as salted two-phase top-k:

  stage 1: rank within (domain, salt) where salt = pmod(xxhash, 16) —
           every partition bounded at ~1/16 of the domain; keep rank<=CAP
  stage 2: exact rank over the <=16*CAP survivors per domain

Because stage 1 keeps the CAP smallest order-keys of every salt bucket,
its union provably contains the true CAP smallest per domain, so stage 2
reproduces the naive window's output exactly — the salt never leaks into
the result, and the oracle is the plain single-window SQL. Two bounded
exchanges instead of one unbounded one.

The synthetic corpus has no URL column, so the query PLANTS one
deterministically (domain/TLD/subdomain/query-string gated on md5
nibbles of doc_id) and the oracle restates the same construction — the
hash check pins planting, parsing, blocklist, and cap semantics at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_N_DOMAINS = 40
_DOMAIN_CAP = 8
_CAP_SALTS = 16
_BLOCKLIST = ["d3.com", "d17.org", "d29.com"]
_EVEN_NIBBLES = ["0", "2", "4", "6", "8", "a", "c", "e"]
_HEX = "0123456789abcdef"

_HOST_RE = "^https?://([^/]+)"
_DOMAIN_RE = "^(www\\.)?(.*)$"
_TLD_RE = "\\.([a-z]+)$"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _nib(md, i: int):
    # hex nibble -> 0..15 via strpos (identical in Spark and DuckDB;
    # Spark's conv() has no DuckDB twin and CAST('0x..') differs)
    return F.instr(F.lit(_HEX), F.substring(md, i, 1)) - F.lit(1)


def host_id_col(doc_id_col: str = "doc_id"):
    """(nib1*16 + nib2) % _N_DOMAINS over md5(doc_id) — the planted
    domain id, THE single definition (SQL twin ``SQL_HOST_ID``).
    canonical_host_expr builds the canonical host from it; recrawl's
    /n/<id> plant builds its host from it too — a plant change (nibble
    positions, _N_DOMAINS) must propagate to every host consumer at
    once or their joins silently diverge."""
    md = F.md5(F.col(doc_id_col).cast("string"))
    return F.pmod(_nib(md, 1) * 16 + _nib(md, 2), F.lit(_N_DOMAINS))


def q_url_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    md = F.md5(F.col("doc_id").cast("string"))
    nib = lambda i: _nib(md, i)

    host_id = host_id_col()
    url = F.concat(
        F.lit("https://"),
        F.when(F.substring(md, 4, 1).isin(_EVEN_NIBBLES), F.lit("www."))
         .otherwise(F.lit("")),
        F.lit("d"), host_id.cast("string"),
        F.when(F.substring(md, 3, 1).isin(_EVEN_NIBBLES), F.lit(".com"))
         .otherwise(F.lit(".org")),
        F.lit("/p/"), F.col("doc_id").cast("string"),
        F.when(F.substring(md, 5, 1).isin(_EVEN_NIBBLES),
               F.lit("?utm_source=feed")).otherwise(F.lit("")),
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", url.alias("url"), md.alias("ord")
    )
    host = F.regexp_extract("url", _HOST_RE, 1)
    parsed = d.select(
        "doc_id", "url", "ord",
        host.alias("host"),
        F.regexp_extract(host, _DOMAIN_RE, 2).alias("domain"),
    ).withColumn("tld", F.regexp_extract("domain", _TLD_RE, 1))
    kept = parsed.where(~F.col("domain").isin(_BLOCKLIST))

    salted = kept.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(_CAP_SALTS))
    )
    w1 = Window.partitionBy("domain", "salt").orderBy("ord")
    survivors = (
        salted.withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= _DOMAIN_CAP)
    )
    w2 = Window.partitionBy("domain").orderBy("ord")
    return (
        survivors.withColumn("domain_rank",
                             F.row_number().over(w2).cast("long"))
        .where(F.col("domain_rank") <= _DOMAIN_CAP)
        .select("doc_id", "url", "host", "domain", "tld", "domain_rank")
    )


_NIB_SQL = {
    i: f"(strpos('{_HEX}', substring(md5(doc_id::VARCHAR), {i}, 1)) - 1)"
    for i in (1, 2)
}
_EVEN_IN = ", ".join(repr(n) for n in _EVEN_NIBBLES)


def canonical_host_expr(doc_id_col: str = "doc_id"):
    """'www.d{(nib1*16 + nib2) % _N_DOMAINS}.com' — the canonical
    (post-normalization) host of the planted URL grammar, as pure
    doc_id column math. Single source of truth: every query that
    composes "by host" (link graph, per-host language mix, messy-URL
    plants) must build the host THROUGH this helper so a grammar
    change cannot desynchronize them."""
    host_id = host_id_col(doc_id_col)
    return F.concat(F.lit("www.d"), host_id.cast("string"), F.lit(".com"))


# DuckDB restatement of canonical_host_expr (same nibble math over the
# pre-registered tables' doc_id column).
SQL_HOST_ID = f"(({_NIB_SQL[1]} * 16 + {_NIB_SQL[2]}) % {_N_DOMAINS})"

SQL_CANONICAL_HOST = (
    f"('www.d' || (({_NIB_SQL[1]} * 16 + {_NIB_SQL[2]})"
    f" % {_N_DOMAINS})::VARCHAR || '.com')"
)

SQL_URL_DOMAIN_CAP = f"""
WITH u AS (
  SELECT doc_id,
    'https://'
    || CASE WHEN substring(md5(doc_id::VARCHAR), 4, 1) IN ({_EVEN_IN})
        THEN 'www.' ELSE '' END
    || 'd' || (({_NIB_SQL[1]} * 16 + {_NIB_SQL[2]}) % {_N_DOMAINS})::VARCHAR
    || CASE WHEN substring(md5(doc_id::VARCHAR), 3, 1) IN ({_EVEN_IN})
        THEN '.com' ELSE '.org' END
    || '/p/' || doc_id::VARCHAR
    || CASE WHEN substring(md5(doc_id::VARCHAR), 5, 1) IN ({_EVEN_IN})
        THEN '?utm_source=feed' ELSE '' END
    AS url,
    md5(doc_id::VARCHAR) AS ord
  FROM documents
), p AS (
  SELECT doc_id, url, ord,
    regexp_extract(url, '{_HOST_RE}', 1) AS host,
    regexp_extract(regexp_extract(url, '{_HOST_RE}', 1),
                   '{_DOMAIN_RE}', 2) AS domain
  FROM u
), ranked AS (
  SELECT doc_id, url, host, domain,
    regexp_extract(domain, '{_TLD_RE}', 1) AS tld,
    row_number() OVER (PARTITION BY domain ORDER BY ord)::BIGINT
      AS domain_rank
  FROM p
  WHERE domain NOT IN ({", ".join(repr(b) for b in _BLOCKLIST)})
)
SELECT doc_id, url, host, domain, tld, domain_rank
FROM ranked WHERE domain_rank <= {_DOMAIN_CAP}
"""


# ------------------------------------------------------- normalization
#
# URL canonicalization (the RFC 3986 §6 normalization subset a crawl
# pipeline applies BEFORE url-keyed dedup — two spellings of one page
# must collide): lowercase scheme+host, strip the scheme's default port
# (:80 / :443), drop the fragment, drop tracking query params
# (utm_*, fbclid, gclid) while preserving the order of the rest, and
# give an empty path its canonical '/'. Path case is PRESERVED (paths
# are case-sensitive per the RFC).
#
# Engine-parity constraint that shapes the code: Spark's
# regexp_replace uses $1 for group backrefs, DuckDB's uses \1 — so
# replacements here NEVER use backrefs; everything is regexp_extract
# (group indexing is identical) + concat.

_SCHEME_RE = "^([A-Za-z]+)://"
_HOSTPORT_RE = "^[A-Za-z]+://([^/?#]*)"
_REST_RE = "^[A-Za-z]+://[^/?#]*(.*)$"
_TRACKING_RE = "&(?:utm_[a-z]+|fbclid|gclid)=[^&]*"


def normalize_urls(d: DataFrame, url_col: str = "url") -> DataFrame:
    """Append normalized_url + changed to ``d``. Pure column math,
    zero exchanges. Non-absolute inputs (mailto:, relative paths,
    protocol-relative //host) pass through UNCHANGED with
    changed=false — canonicalization is defined only on scheme://
    URLs, and collapsing the rest to a common mangled key would merge
    distinct documents in url-keyed dedup."""
    url = F.col(url_col)
    # stage the extracted parts as real columns (same rationale and
    # SPARK-36718 guarantee as plant_messy_urls): scheme/hostport/
    # nofrag are each referenced 2-4x downstream, and inlined they
    # re-duplicate the whole upstream url tree per reference
    staged = d.select(
        "*",
        F.lower(F.regexp_extract(url, _SCHEME_RE, 1)).alias("_scheme"),
        F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1)).alias("_hostport"),
        F.regexp_replace(
            F.regexp_extract(url, _REST_RE, 1), "#.*$", ""
        ).alias("_nofrag"),
    )
    scheme = F.col("_scheme")
    hostport = F.col("_hostport")
    nofrag = F.col("_nofrag")
    host = (
        F.when(
            (scheme == "http") & hostport.endswith(":80"),
            F.regexp_extract(hostport, "^(.*):80$", 1),
        )
        .when(
            (scheme == "https") & hostport.endswith(":443"),
            F.regexp_extract(hostport, "^(.*):443$", 1),
        )
        .otherwise(hostport)
    )
    rawpath = F.regexp_extract(nofrag, "^([^?]*)", 1)
    path = F.when(rawpath == "", F.lit("/")).otherwise(rawpath)
    q = F.regexp_extract(nofrag, "\\?(.*)$", 1)
    cleaned = F.regexp_replace(
        F.regexp_replace(F.concat(F.lit("&"), q), _TRACKING_RE, ""),
        "^&", "",
    )
    norm = F.when(
        url.rlike(_SCHEME_RE),
        F.concat(
            scheme, F.lit("://"), host, path,
            F.when(cleaned != "", F.concat(F.lit("?"), cleaned))
             .otherwise(F.lit("")),
        ),
    ).otherwise(url)
    return (
        staged.withColumn("normalized_url", norm)
        .withColumn("changed", F.col("normalized_url") != url)
        .drop("_scheme", "_hostport", "_nofrag")
    )


def plant_messy_urls(docs: DataFrame) -> DataFrame:
    """(doc_id, ...) -> (doc_id, url): crawl-grade messy URLs — md5
    nibbles 8..13 gate uppercase scheme, uppercase host, an explicit
    :443, tracking-vs-real query params, and a fragment. Nibbles are
    disjoint from the domain-cap plant's (1..5), so the two messes
    compose independently."""
    # stage md5 and the lowercase host as REAL columns first: each is
    # referenced by several gates below, and as inline subtrees they
    # get re-duplicated through every downstream reference — for the
    # layered callers (link graph's plant->normalize->plant chain) the
    # logical plan grew to ~60 KB and Catalyst analysis dominated the
    # query (guide 7.3). Non-cheap multiply-referenced aliases survive
    # CollapseProject (SPARK-36718), so the tree stays factored.
    staged = docs.select(
        "*",
        F.md5(F.col("doc_id").cast("string")).alias("_md"),
        canonical_host_expr("doc_id").alias("_lh"),
    )

    def even(i: int):
        return F.substring(F.col("_md"), i, 1).isin(_EVEN_NIBBLES)

    lower_host = F.col("_lh")
    url = F.concat(
        F.when(even(8), F.lit("HTTPS://")).otherwise(F.lit("https://")),
        F.when(even(9), F.upper(lower_host)).otherwise(lower_host),
        F.when(even(10), F.lit(":443")).otherwise(F.lit("")),
        F.lit("/p/"), F.col("doc_id").cast("string"),
        F.when(even(11), F.lit("?utm_source=feed&ref=home&gclid=XYZ"))
         .when(even(12), F.lit("?ref=home")).otherwise(F.lit("")),
        F.when(even(13), F.lit("#section-2")).otherwise(F.lit("")),
    )
    # preserve input columns: callers that carry html (link graph)
    # stay join-free — the url is pure doc_id column math
    return staged.select("*", url.alias("url")).drop("_md", "_lh")


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = plant_messy_urls(_docs(spark, sf_dir).select("doc_id"))
    return normalize_urls(d).select(
        "doc_id", "url", "normalized_url", "changed"
    )


SQL_URL_NORMALIZE = f"""
WITH u AS (
  SELECT doc_id,
    CASE WHEN substring(md5(doc_id::VARCHAR), 8, 1) IN ({_EVEN_IN})
      THEN 'HTTPS://' ELSE 'https://' END
    || CASE WHEN substring(md5(doc_id::VARCHAR), 9, 1) IN ({_EVEN_IN})
      THEN upper('www.d'
        || (({_NIB_SQL[1]} * 16 + {_NIB_SQL[2]}) % {_N_DOMAINS})::VARCHAR
        || '.com')
      ELSE 'www.d'
        || (({_NIB_SQL[1]} * 16 + {_NIB_SQL[2]}) % {_N_DOMAINS})::VARCHAR
        || '.com' END
    || CASE WHEN substring(md5(doc_id::VARCHAR), 10, 1) IN ({_EVEN_IN})
      THEN ':443' ELSE '' END
    || '/p/' || doc_id::VARCHAR
    || CASE WHEN substring(md5(doc_id::VARCHAR), 11, 1) IN ({_EVEN_IN})
      THEN '?utm_source=feed&ref=home&gclid=XYZ'
      WHEN substring(md5(doc_id::VARCHAR), 12, 1) IN ({_EVEN_IN})
      THEN '?ref=home' ELSE '' END
    || CASE WHEN substring(md5(doc_id::VARCHAR), 13, 1) IN ({_EVEN_IN})
      THEN '#section-2' ELSE '' END
    AS url
  FROM documents
), parts AS (
  SELECT doc_id, url,
    lower(regexp_extract(url, '{_SCHEME_RE}', 1)) AS scheme,
    lower(regexp_extract(url, '{_HOSTPORT_RE}', 1)) AS hostport,
    regexp_replace(regexp_extract(url, '{_REST_RE}', 1),
                   '#.*$', '') AS nofrag
  FROM u
), norm AS (
  SELECT doc_id, url,
    CASE WHEN NOT regexp_matches(url, '{_SCHEME_RE}') THEN url ELSE
    scheme || '://'
    || CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
         THEN regexp_extract(hostport, '^(.*):80$', 1)
        WHEN scheme = 'https' AND hostport LIKE '%:443'
         THEN regexp_extract(hostport, '^(.*):443$', 1)
        ELSE hostport END
    || CASE WHEN regexp_extract(nofrag, '^([^?]*)', 1) = '' THEN '/'
        ELSE regexp_extract(nofrag, '^([^?]*)', 1) END
    || CASE WHEN regexp_replace(regexp_replace(
           '&' || regexp_extract(nofrag, '\\?(.*)$', 1),
           '{_TRACKING_RE}', '', 'g'), '^&', '') <> ''
        THEN '?' || regexp_replace(regexp_replace(
           '&' || regexp_extract(nofrag, '\\?(.*)$', 1),
           '{_TRACKING_RE}', '', 'g'), '^&', '')
        ELSE '' END
    END
    AS normalized_url
  FROM parts
)
SELECT doc_id, url, normalized_url,
  normalized_url <> url AS changed
FROM norm
"""


QUERIES = {
    "url_domain_cap": q_url_domain_cap,
    "url_normalize": q_url_normalize,
}
ORACLE_SQL = {
    "url_domain_cap": SQL_URL_DOMAIN_CAP,
    "url_normalize": SQL_URL_NORMALIZE,
}
