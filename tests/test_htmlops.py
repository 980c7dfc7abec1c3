"""HTML main-content extraction: handcrafted-page semantics + plan shape.

Complements the driver/oracle hash gate (which pins the planted-corpus
path) with pages the planting can't produce: mismatched chrome, empty
blocks, link-stuffed paragraphs, entity edge cases.
"""

from __future__ import annotations

from dd_ops_ocr_spark.operators.htmlops import (
    classify_blocks,
    main_content,
    plant_html,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


PAGE = (
    "<html><head><title>T</title><style>p{color:red}</style></head><body>"
    '<nav><a href="/">Home</a> <a href="/x">Docs</a></nav>'
    "<h1>Heading one</h1>"
    "<p>real content paragraph with enough words "
    'and one inline <a href="/ref">link</a> kept</p>'
    '<aside><a href="/1">rel a</a> <a href="/2">rel b</a></aside>'
    "<script>var hidden = 1;</script>"
    "<p>&lt;tag&gt; &amp; entity &copy; test paragraph content</p>"
    "<footer>contact &middot; legal</footer>"
    "</body></html>"
)


def test_block_classification(spark):
    out = classify_blocks(_pages(spark, [(1, PAGE)])).collect()
    by_tag = {r.tag: r for r in out}
    # chrome classes are boilerplate regardless of density
    assert by_tag["nav"].is_boilerplate
    assert by_tag["aside"].is_boilerplate
    assert by_tag["footer"].is_boilerplate
    # content blocks survive, inline link does not tip the density gate
    assert not by_tag["h1"].is_boilerplate
    ps = sorted((r for r in out if r.tag == "p"), key=lambda r: r.block_idx)
    assert [p.is_boilerplate for p in ps] == [False, False]
    # script/style text never appears in any block
    joined = " ".join(r.block_text for r in out)
    assert "hidden" not in joined and "color:red" not in joined
    # entities decoded, ASCII-safe
    assert "<tag> & entity (c) test" in ps[1].block_text
    # anchor chars counted: nav is all links
    assert by_tag["nav"].link_chars == by_tag["nav"].text_chars


def test_non_anchor_a_tags_not_counted(spark):
    # <abbr>/<address>/etc. must not be treated as anchors: a content
    # paragraph with an inline <ABBR> followed by a real link must keep
    # only the link's chars in link_chars
    html = ('<p>See the <ABBR title="x">HTML</ABBR> specification and '
            'follow the <a href="/s">link</a> for details of it</p>')
    row = classify_blocks(_pages(spark, [(9, html)])).collect()[0]
    # "link" plus the one space the whitespace collapse absorbs when the
    # anchor is removed ("the  for" -> "the for")
    assert row.link_chars == len("link") + 1
    assert not row.is_boilerplate
    assert "HTML specification" in row.block_text


def test_link_density_gate(spark):
    # a <p> that is mostly links is boilerplate even without a chrome tag
    html = ('<p><a href="/a">one link</a> <a href="/b">two link</a> '
            "tail</p><p>plain words only here</p>")
    out = {r.block_idx: r for r in
           classify_blocks(_pages(spark, [(7, html)])).collect()}
    assert out[1].is_boilerplate and out[1].tag == "p"
    assert not out[2].is_boilerplate


def test_main_content_assembly(spark):
    row = main_content(_pages(spark, [(1, PAGE)])).collect()[0]
    assert row.main_text.split("\n\n") == [
        "Heading one",
        "real content paragraph with enough words and one inline link kept",
        "<tag> & entity (c) test paragraph content",
    ]
    assert row.n_blocks_kept == 3
    assert row.n_blocks_total == 6
    assert row.kept_chars == sum(len(s) for s in row.main_text.split("\n\n"))


def test_uppercase_tags(spark):
    # HTML tag names are case-insensitive; classification must not be
    # case-sensitive (chrome detection, sanitize, and tag naming)
    html = ('<NAV><A HREF="/">x</A></NAV><P>Real content paragraph '
            "with plain words</P><FOOTER>legal</FOOTER>"
            "<SCRIPT>var S = 1;</SCRIPT>")
    out = {r.tag: r for r in
           classify_blocks(_pages(spark, [(3, html)])).collect()}
    assert set(out) == {"nav", "p", "footer"}
    assert out["nav"].is_boilerplate and out["footer"].is_boilerplate
    assert not out["p"].is_boilerplate
    assert "var S" not in " ".join(r.block_text for r in out.values())


def test_all_boilerplate_page_yields_empty(spark):
    html = '<nav><a href="/">x</a></nav><footer>y</footer>'
    row = main_content(_pages(spark, [(2, html)])).collect()[0]
    assert row.main_text == "" and row.n_blocks_kept == 0
    assert row.n_blocks_total == 2


def test_planted_page_roundtrip(spark):
    docs = spark.createDataFrame(
        [(11, "alpha beta gamma delta")], "doc_id long, text string"
    )
    row = main_content(plant_html(docs)).collect()[0]
    # h1 + both halves of the text, chrome gone, inline link text kept
    assert row.main_text == (
        "Doc 11 title\n\nalpha beta\n\n"
        "gamma delta see reference docs for details"
    )
    strip = classify_blocks(plant_html(docs)).collect()
    assert all("(c) 2026" not in r.block_text or r.is_boilerplate
               for r in strip)


def test_classify_plan_is_narrow(spark):
    df = classify_blocks(plant_html(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    ))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, f"block classifier grew a shuffle:\n{plan[:2000]}"
    assert "BatchScan" in plan or "Scan parquet" in plan


def test_main_content_single_exchange(spark):
    df = main_content(plant_html(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    ))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    n = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n == 1, (
        f"per-doc assembly should be one partial-agg shuffle, saw {n}:"
        f"\n{plan[:3000]}"
    )


def test_metadata_planted_roundtrip(spark):
    from dd_ops_ocr_spark.operators.htmlops import (
        extract_metadata,
        plant_html_meta,
    )

    docs = spark.createDataFrame(
        [(11, "alpha beta, gamma! delta", "de")],
        "doc_id long, text string, lang string",
    )
    row = extract_metadata(plant_html_meta(docs)).collect()[0]
    assert row.title == "Doc 11"
    assert row.html_lang == "de"
    # attribute-safe excerpt: punctuation stripped, words kept
    assert row.description == "alpha beta gamma delta"
    assert row.canonical_url == "https://corpus.example/doc/11"
    # md5('11') nibble 7 decides og presence; has_og must agree with it
    import hashlib

    expect_og = hashlib.md5(b"11").hexdigest()[6] in "02468ace"
    assert row.has_og == expect_og
    assert (row.og_title == "Doc 11 OG") == expect_og


def test_metadata_absent_fields_empty(spark):
    from dd_ops_ocr_spark.operators.htmlops import extract_metadata

    row = extract_metadata(
        _pages(spark, [(3, "<html><body><p>no head here</p></body></html>")])
    ).collect()[0]
    assert row.title == "" and row.html_lang == ""
    assert row.description == "" and row.canonical_url == ""
    assert row.og_title == "" and row.has_og is False


def test_metadata_plan_is_narrow(spark):
    from dd_ops_ocr_spark.operators.htmlops import (
        extract_metadata,
        plant_html_meta,
    )

    df = extract_metadata(plant_html_meta(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang")
    ))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, f"metadata extract grew a shuffle:\n{plan[:2000]}"


def test_outlinks_planted_page(spark):
    from dd_ops_ocr_spark.operators.htmlops import (
        extract_outlinks,
        plant_html,
    )

    docs = spark.createDataFrame(
        [(11, "alpha beta gamma delta")], "doc_id long, text string"
    )
    rows = extract_outlinks(plant_html(docs)).collect()
    import hashlib

    has_aside = hashlib.md5(b"11").hexdigest()[5] in "02468ace"
    hrefs = [r.href for r in rows]
    base = ["/", "/about", "/tags"]
    rel = ["/r/1", "/r/2", "/r/3"] if has_aside else []
    assert hrefs == base + rel + ["/ref"]
    assert [r.link_idx for r in rows] == list(range(1, len(hrefs) + 1))
    assert rows[0].anchor_text == "Home"
    assert rows[-1].anchor_text == "reference docs"


def test_outlinks_nested_markup_and_none(spark):
    from dd_ops_ocr_spark.operators.htmlops import extract_outlinks

    rows = extract_outlinks(_pages(spark, [
        (1, '<p><a href="/x"><b>bold</b>  link</a></p>'),
        (2, "<p>no links at all</p>"),
    ])).collect()
    assert len(rows) == 1  # linkless page fans out to zero rows
    assert rows[0].href == "/x" and rows[0].anchor_text == "bold link"


def test_outlinks_plan_is_narrow(spark):
    from dd_ops_ocr_spark.operators.htmlops import (
        extract_outlinks,
        plant_html,
    )

    df = extract_outlinks(plant_html(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    ))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, f"outlink fan-out grew a shuffle:\n{plan[:2000]}"


def test_link_graph_indegree_planted_structure(spark):
    """Every planted page links its own host's chrome targets, so each
    live domain's '/', '/about', '/tags', '/ref' get identical indegree
    (= that domain's doc count) and '/r/N' targets get the aside-gated
    subset; n_links == indegree (one link per target per page)."""
    from dd_ops_ocr_spark.operators.htmlops import q_link_graph_indegree

    rows = q_link_graph_indegree(spark, "/root/testdata/sf0.001").collect()
    assert rows, "empty link graph"
    by_host = {}
    for r in rows:
        assert r.n_links == r.indegree  # planted pages never repeat a target
        host, _, path = r.target_url.removeprefix("https://").partition("/")
        by_host.setdefault(host, {})["/" + path] = r.indegree
    for host, paths in by_host.items():
        # chrome targets exist for every doc of the host and agree
        chrome = [paths.get(p) for p in ("/", "/about", "/tags", "/ref")]
        assert all(c == chrome[0] and c for c in chrome), (host, paths)
        # aside targets, when present, agree with each other and are <= chrome
        rel = [v for p, v in paths.items() if p.startswith("/r/")]
        if rel:
            assert len(set(rel)) == 1 and rel[0] <= chrome[0], (host, paths)


def test_link_graph_plan_no_join_two_exchanges(spark):
    """base_host must ride the narrow pipeline (no join); the only
    exchanges are the countDistinct agg's partial/final pair over
    already-reduced (target, doc) pairs."""
    import re

    from dd_ops_ocr_spark.operators.htmlops import q_link_graph_indegree

    df = q_link_graph_indegree(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan, f"link graph grew a join:\n{plan[:2000]}"
    n = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n <= 2, f"expected the countDistinct exchange pair, saw {n}"


def test_frontier_splits_nav_vs_chrome(spark):
    """Nav links to existing docs must anti-join away; chrome targets
    and exactly the max doc's dangling next-link survive."""
    from dd_ops_ocr_spark.operators.htmlops import q_frontier_new_urls

    rows = q_frontier_new_urls(spark, "/root/testdata/sf0.001").collect()
    dangling = [r for r in rows if "/p/" in r.target_url]
    # corpus is doc_id 0..N-1: only doc N-1's next-link is new
    assert len(dangling) == 1 and dangling[0].indegree == 1
    assert dangling[0].target_url.split("/p/")[1].split("?")[0] == "500"
    chrome = [r for r in rows if "/p/" not in r.target_url]
    assert chrome and all(r.indegree >= 1 for r in chrome)


def test_resolved_targets_relative_and_protocol_relative(spark):
    """RFC 3986 resolution branches: absolute kept; //host takes the
    base scheme; /path takes the base host; bare names join the page's
    directory (not the host root)."""
    from pyspark.sql import functions as F

    from dd_ops_ocr_spark.operators.htmlops import _LINK_RE

    # mirror _resolved_targets' resolution over a handcrafted frame
    ex = spark.createDataFrame(
        [(1, "https://www.d3.com", "https://www.d3.com/p/", h)
         for h in ["https://ext.example/a", "//cdn.example/x",
                   "/root/y", "page2.html"]],
        "doc_id long, base_host string, base_dir string, href string",
    )
    target = (
        F.when(F.col("href").rlike("^https?://"), F.col("href"))
        .when(F.col("href").startswith("//"),
              F.concat(F.regexp_extract("base_host", "^([a-z]+):", 1),
                       F.lit(":"), F.col("href")))
        .when(F.col("href").startswith("/"),
              F.concat(F.col("base_host"), F.col("href")))
        .otherwise(F.concat(F.col("base_dir"), F.col("href")))
    )
    got = [r.t for r in ex.select(target.alias("t")).collect()]
    assert got == [
        "https://ext.example/a",
        "https://cdn.example/x",
        "https://www.d3.com/root/y",
        "https://www.d3.com/p/page2.html",
    ]


def test_anchor_text_agg_semantics(spark):
    """Dedup, lexicographic top-3 cap, empty-text drop, counts."""
    from dd_ops_ocr_spark.operators.htmlops import anchor_text_agg

    pairs = spark.createDataFrame(
        [
            # hub: 5 anchors, 4 distinct texts -> top-3 lexicographic
            ("https://t/hub", "delta"),
            ("https://t/hub", "alpha"),
            ("https://t/hub", "charlie"),
            ("https://t/hub", "bravo"),
            ("https://t/hub", "alpha"),      # duplicate text
            ("https://t/hub", ""),           # empty: dropped everywhere
            # singleton target
            ("https://t/one", "only text"),
        ],
        "target_url string, anchor_text string",
    )
    out = {r.target_url: r for r in anchor_text_agg(pairs).collect()}
    hub = out["https://t/hub"]
    assert (hub.n_anchors, hub.n_texts) == (5, 4)
    assert hub.top_texts == "alpha | bravo | charlie"  # delta capped off
    one = out["https://t/one"]
    assert (one.n_anchors, one.n_texts, one.top_texts) == (
        1, 1, "only text"
    )


def test_anchor_text_agg_plan_bounded(spark):
    """No cartesian, no collect_set (unbounded per-group state on a
    mega-hub): the top-k side must be the distinct->window->rn<=k
    shape whose collect_list holds <= k rows."""
    from dd_ops_ocr_spark.operators.htmlops import q_anchor_text_agg

    df = q_anchor_text_agg(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "collect_set" not in plan
    assert "row_number" in plan


# ------------------------------------------------------------ tables

def test_extract_tables_shapes_and_order(spark):
    from dd_ops_ocr_spark.operators.htmlops import extract_tables

    html = (
        "<html><body>"
        "<table><tr><th>A</th><th>B</th></tr>"
        "<tr><td>1</td><td>2</td></tr></table>"
        "<p>between</p>"
        "<TABLE class=x><tr><td> only &amp; cell </td></tr></TABLE>"
        "</body></html>"
    )
    pages = spark.createDataFrame([(5, html)], "doc_id long, html string")
    rows = sorted(
        extract_tables(pages).collect(),
        key=lambda r: (r.table_idx, r.row_idx, r.col_idx),
    )
    assert [(r.table_idx, r.row_idx, r.col_idx, r.is_header, r.cell)
            for r in rows] == [
        (0, 0, 0, True, "A"), (0, 0, 1, True, "B"),
        (0, 1, 0, False, "1"), (0, 1, 1, False, "2"),
        (1, 0, 0, False, "only & cell"),
    ]


def test_extract_tables_no_table_emits_nothing(spark):
    from dd_ops_ocr_spark.operators.htmlops import extract_tables

    pages = spark.createDataFrame(
        [(1, "<html><body><p>plain</p></body></html>")],
        "doc_id long, html string",
    )
    assert extract_tables(pages).count() == 0


def test_extract_tables_plan_narrow(spark):
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.htmlops import q_html_tables

    plan = q_html_tables(spark, SF_SMOKE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


# ----------------------------------------------- interleaved spans

def test_interleaved_spans_order_and_kinds(spark):
    """Text and media spans come out in DOCUMENT order with stable
    indices; empty blocks drop without renumbering survivors."""
    from dd_ops_ocr_spark.operators.htmlops import html_interleaved_spans

    html = (
        '<html><body><p>alpha bravo</p>'
        '<img src="/img/x.jpg">'
        '<p>   </p>'                      # empty text block: dropped
        '<img alt=y src="/img/y.png">'
        '<p>charlie</p></body></html>'
    )
    pages = spark.createDataFrame([(9, html)], "doc_id long, html string")
    rows = sorted(html_interleaved_spans(pages).collect(),
                  key=lambda r: r["order"])
    assert [(r.kind, r.text, r.media_ref, r["order"]) for r in rows] == [
        ("text", "alpha bravo", "", 0),
        ("media", "", "/img/x.jpg", 1),
        # order 2 was the empty block — dropped, index NOT reused
        ("media", "", "/img/y.png", 3),
        ("text", "charlie", "", 4),
    ]


def test_interleaved_spans_engine_field_shape(spark):
    """Output fields line up with the engine's flagship span columns
    (kind, text, media_ref, order) so landed pages flow straight into
    the extraction data model."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.htmlops import q_html_interleaved_spans

    df = q_html_interleaved_spans(spark, SF_SMOKE)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "kind", "text", "media_ref", "order",
    ]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
