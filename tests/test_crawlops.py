"""crawlops referees: robots.txt verdicts vs an independent pure-Python
RFC 9309 longest-match evaluator, sitemap round-trip vs a re-based
parse, and the scale-critical plan shapes (robots = broadcast join,
sitemap = zero exchanges)."""

import re

from tests.conftest import SF_SMOKE


def _referee_allowed(rules, path):
    """RFC 9309: longest matching prefix wins; Allow wins length ties;
    no match = allowed. Independent of the Spark array-math order."""
    matched = [(len(p), allow) for allow, p in rules
               if path.startswith(p)]
    if not matched:
        return True
    return max(matched)[1]


def test_robots_verdicts_match_referee(spark):
    from dd_ops_ocr_spark.operators.crawlops import (
        q_robots_filter,
        robots_df,
    )

    rules_by_host = {
        r.host: [(x["allow"], x["path"]) for x in r.rules]
        for r in robots_df(spark).collect()
    }
    # every host carries the unconditional /admin/ disallow; gated rows
    # must parse in file order
    assert len(rules_by_host) == 40
    for rules in rules_by_host.values():
        assert (False, "/admin/") == rules[0]

    rows = q_robots_filter(spark, SF_SMOKE).collect()
    assert rows
    seen_blocked = seen_allowed_override = False
    for r in rows:
        want = _referee_allowed(rules_by_host[r.host], r.path)
        assert r.allowed == want, (r.host, r.path, r.allowed, want)
        if not r.allowed:
            seen_blocked = True
        if r.allowed and (False, "/p/") in rules_by_host[r.host] \
                and r.path.startswith("/p/2"):
            seen_allowed_override = True
    # the plant must exercise both interesting branches
    assert seen_blocked, "no host blocked anything"
    assert seen_allowed_override, "Allow override never fired"


def test_robots_plan_is_broadcast(spark):
    from dd_ops_ocr_spark.operators.crawlops import q_robots_filter

    plan = q_robots_filter(spark, SF_SMOKE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sitemap_round_trip(spark):
    from dd_ops_ocr_spark.operators.crawlops import (
        parse_sitemaps,
        q_sitemap_urls,
        sitemap_df,
    )

    xml_by_host = {r.host: r.sitemap_xml
                   for r in sitemap_df(spark).collect()}
    got = {}
    for r in q_sitemap_urls(spark, SF_SMOKE).collect():
        got.setdefault(r.host, []).append(
            (r.seq, r.loc, r.lastmod, r.priority)
        )
    assert set(got) == set(xml_by_host)
    ent_re = re.compile(
        r"<url><loc>([^<]*)</loc><lastmod>([^<]*)</lastmod>"
        r"<priority>([^<]*)</priority></url>"
    )
    for host, xml in xml_by_host.items():
        want = [(i + 1, loc, mod, pri)
                for i, (loc, mod, pri) in enumerate(ent_re.findall(xml))]
        assert sorted(got[host]) == want, host
        # host_id % 4 + 1 entries
        k = int(host[len("www.d"):-len(".com")])
        assert len(want) == k % 4 + 1

    # parse is exchange-free: control files fan out in place
    plan = parse_sitemaps(sitemap_df(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_redirect_resolution_matches_walk(spark):
    """Independent referee: walk the collected redirect map in Python;
    chains must terminate, residues drive hop counts, and the corpus
    edge cuts the tail chains."""
    from dd_ops_ocr_spark.operators.crawlops import (
        K_HOPS,
        q_redirect_resolve,
        redirect_edges_df,
    )

    edges = {r.src: r.dst
             for r in redirect_edges_df(spark, SF_SMOKE).collect()}
    rows = q_redirect_resolve(spark, SF_SMOKE).collect()
    assert rows
    max_hops = 0
    for r in rows:
        cur, hops = r.url, 0
        while cur in edges and hops < K_HOPS:
            cur = edges[cur]
            hops += 1
        assert (r.final_url, r.n_hops) == (cur, hops), r.url
        max_hops = max(max_hops, hops)
    assert max_hops == K_HOPS, "no full-length chain exercised"
    # resolved targets are never themselves redirect sources (chains
    # really terminate inside the hop budget on this plant)
    for r in rows:
        assert r.final_url not in edges


def test_redirect_plan_shape(spark):
    from dd_ops_ocr_spark.operators.crawlops import q_redirect_resolve

    plan = q_redirect_resolve(spark, SF_SMOKE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------------ fetch schedule

def test_crawl_delay_parsed_and_defaulted(spark):
    from pyspark.sql import functions as F

    from dd_ops_ocr_spark.operators.crawlops import robots_df

    r = robots_df(spark).select("host", "robots_txt", "crawl_delay")
    rows = r.collect()
    for row in rows:
        assert f"Crawl-delay: {row.crawl_delay}\n" in row.robots_txt
        assert 1 <= row.crawl_delay <= 4
    # absent Crawl-delay -> 1 s default
    stripped = r.withColumn(
        "robots_txt",
        F.regexp_replace("robots_txt", r"(?m)^Crawl-delay: \d+\n", ""),
    ).withColumn(
        "crawl_delay",
        F.coalesce(
            F.regexp_extract(
                "robots_txt", r"(?m)^Crawl-delay: (\d+)$", 1
            ).try_cast("long"),
            F.lit(1),
        ),
    )
    assert {x.crawl_delay for x in stripped.collect()} == {1}


def test_fetch_schedule_spacing_and_exclusion(spark):
    """Slots are 0..n-1 per host in doc_id order, offsets are
    slot*delay, and disallowed URLs never get a slot."""
    from collections import defaultdict

    from dd_ops_ocr_spark.operators.crawlops import (
        fetch_schedule,
        robots_df,
        robots_verdicts,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(60)], "doc_id long"
    )
    from dd_ops_ocr_spark.operators.crawlops import (
        _HOST_ONLY_RE,
        _PATH_RE,
    )
    from pyspark.sql import functions as F

    from dd_ops_ocr_spark.operators.urlops import (
        normalize_urls,
        plant_messy_urls,
    )

    pages = normalize_urls(plant_messy_urls(docs)).select(
        "doc_id",
        F.regexp_extract("normalized_url", _HOST_ONLY_RE, 1).alias("host"),
        F.regexp_extract("normalized_url", _PATH_RE, 1).alias("path"),
    ).cache()
    robots = robots_df(spark)
    allowed = {
        r.doc_id for r in robots_verdicts(pages, robots).collect()
        if r.allowed
    }
    sched = fetch_schedule(pages, robots).collect()
    assert {r.doc_id for r in sched} == allowed
    by_host = defaultdict(list)
    for r in sched:
        by_host[r.host].append(r)
    for host, rows in by_host.items():
        rows.sort(key=lambda r: r.slot)
        assert [r.slot for r in rows] == list(range(len(rows)))
        doc_ids = [r.doc_id for r in rows]
        assert doc_ids == sorted(doc_ids)
        for r in rows:
            assert r.fetch_offset_sec == r.slot * r.delay_sec
    pages.unpersist()


# ------------------------------------------------------------- feeds

def test_feed_roundtrip_and_alignment(spark):
    """Every entry's three fields stay positionally aligned, counts
    follow 1 + host_id%3, and the parse is exchange-free."""
    from dd_ops_ocr_spark.operators.crawlops import (
        feed_df,
        parse_feeds,
        q_feed_entries,
    )

    rows = parse_feeds(feed_df(spark)).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    for host, es in by_host.items():
        hid = int(host[5:-4])
        assert len(es) == hid % 3 + 1
        for e in es:
            assert e.title == f"Post {e.seq} on d{hid}"
            assert e.link == f"https://www.d{hid}.com/posts/{e.seq}"
            assert e.updated.startswith(f"2026-0{hid % 9 + 1}-0{e.seq}")
    plan = q_feed_entries(spark, "")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
