"""Physical-plan regressions: the plans we shipped are the plans we keep.

A correctness-preserving edit that silently adds an exchange to the
flagship, drops the broadcast from the dim join, or stops pushing filters
into the scan is a scale regression — catch it here, not in round N's
bench."""

from __future__ import annotations

from dd_ops_ocr_spark import corpus, pipeline
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_plan_is_shuffle_free_and_pruned(spark):
    """Extraction over a materialized spans table (the deployment shape —
    the corpus generator's repartition is input prep, not extraction)."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        corpus.build_spans_df(spark, SF_SMOKE).limit(20).write.parquet(f"{d}/s")
        df = spark.read.parquet(f"{d}/s")
        plan = _plan(pipeline.extract(df))
        assert "Exchange" not in plan, f"flagship grew a shuffle:\n{plan[:2000]}"
        assert "ReadSchema" in plan
        # the scan must read exactly the two needed columns
        scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "doc_id" in scan_line and "spans" in scan_line


def test_dim_join_broadcasts(spark):
    from dd_ops_ocr_spark.operators.joins import q_dim_enrich_join

    plan = _plan(q_dim_enrich_join(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_salted_plan_shape(spark):
    """The salted path must stay: small branch shuffle-free + exactly ONE
    exchange (the round-robin bucket spread) on the tail branch — no
    broadcasts, no window exchanges, no driver collect stages."""
    import tempfile

    from dd_ops_ocr_spark.plans.salting import extract_salted

    with tempfile.TemporaryDirectory() as d:
        corpus.build_spans_df(spark, SF_SMOKE).limit(40).write.parquet(f"{d}/s")
        df = spark.read.parquet(f"{d}/s")
        plan = _plan(extract_salted(df))
        assert plan.count("Exchange") == 1, f"salted plan shape moved:\n{plan[:3000]}"
        assert "BroadcastExchange" not in plan


def test_dedup_embedding_has_no_cartesian(spark):
    """The registered embedding-dedup must be the LSH-routed plan: no
    CartesianProduct / all-pairs join anywhere (that shape dies at scale);
    the brute pass exists only as the pytest oracle."""
    from dd_ops_ocr_spark.operators.similarity import q_dedup_embedding_cosine

    plan = _plan(q_dedup_embedding_cosine(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_plan_has_single_scan_no_self_join(spark):
    """IVF cell assignment emits (vec_id, cell, v) from one kernel — a
    regression against re-joining the cells back onto the embeddings."""
    from dd_ops_ocr_spark.operators.similarity import q_ann_ivf_topk

    plan = _plan(q_ann_ivf_topk(spark, SF_SMOKE))
    # the embeddings parquet may be scanned for queries + candidates, but
    # no join in the plan may have vec_id as its key (the old self-join)
    for line in plan.splitlines():
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line:
            assert "vec_id" not in line, f"cells self-join is back:\n{line}"


def test_filters_push_to_scan(spark):
    from dd_ops_ocr_spark.operators.joins import q_success_filter

    plan = _plan(q_success_filter(spark, SF_SMOKE))
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "n_chars" in scan_line, "filter did not reach the scan"


def test_salted_pruned_scan_partition_filters(spark, tmp_path):
    """The size_class-landed salted path must PRUNE at the scan: both
    FileScans carry a size_class partition filter (reading 1x the corpus
    total), and neither recomputes the array_max routing expression."""
    from dd_ops_ocr_spark.plans.salting import extract_salted_pruned

    path = str(tmp_path / "sc.parquet")
    corpus.materialize_spans(spark, SF_SMOKE, path, n_partitions=4)
    plan = _plan(extract_salted_pruned(spark, path))
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    assert len(scans) == 2, plan[:1500]
    for line in scans:
        assert "PartitionFilters" in line and "size_class" in line, line
    assert "array_max" not in plan, "pruned path still computes routing"


def test_sql_path_single_exchange(spark):
    """The SQL triangulation path's whole plan is ONE hash exchange on
    doc_id (window distinct-count rewrite) — no joins, no extra shuffles."""
    import re

    from dd_ops_ocr_spark.plans.sql_extract import extract_sql

    df = corpus.build_spans_df(spark, SF_SMOKE)
    plan = _plan(extract_sql(df))
    n = len(re.findall(r"\bExchange hashpartitioning", plan))
    assert n == 1, f"sql path has {n} hash exchanges"
    assert "Join" not in plan


def test_bounded_exploded_plan_shape(spark):
    """The bounded-task path must keep its skew-immunity invariants:
    the reading-order row_number windows on (doc_id, page, side) — never
    on doc_id alone over the span stream — and no nested-loop/cartesian
    joins anywhere (the per-page stats join must stay a keyed join)."""
    from pyspark.sql import functions as F

    from dd_ops_ocr_spark.plans.bounded import extract_exploded_bounded

    flat = (
        corpus.build_spans_df(spark, SF_SMOKE).limit(20)
        .select("doc_id", F.explode("spans").alias("s"))
        .select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")
    )
    plan = _plan(extract_exploded_bounded(flat))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rank_windows = [
        l for l in plan.splitlines()
        if "Window" in l and "row_number" in l
    ]
    assert rank_windows, plan[:2000]
    for line in rank_windows:
        assert "page" in line and "side" in line, (
            f"rank window lost its page/side partitioning (doc-sized "
            f"window partitions are back):\n{line}"
        )
    # the boilerplate decision joins only hashed header/footer candidates
    assert "xxhash64" in plan


def test_pg_cache_is_session_scoped(spark):
    """_PG_CACHE must never serve a pg persisted under a stopped or
    different session (sameSemantics compares plans, not liveness), and
    clear_pg_cache() must leave nothing behind for benchmarks that time
    the cold plan."""
    from dd_ops_ocr_spark.plans import bounded

    df = spark.range(4).selectExpr("cast(id as string) as doc_id")
    builds = []

    def build():
        builds.append(1)
        return df.groupBy("doc_id").count()

    pg1 = bounded._cached_pg(df, build)
    pg2 = bounded._cached_pg(df, build)
    assert pg1 is pg2 and len(builds) == 1  # same-session plan reuse

    # an entry whose DataFrame belongs to another session object is
    # evicted, never compared — even with an identical logical plan
    class _FakeSession:
        pass

    class _FakeDF:
        sparkSession = _FakeSession()

    fake = _FakeDF()
    bounded._PG_CACHE.insert(0, (fake, fake))
    pg3 = bounded._cached_pg(df, build)
    assert pg3 is pg1  # still served from the live entry
    assert all(f is not fake for f, _ in bounded._PG_CACHE)

    bounded.clear_pg_cache()
    assert bounded._PG_CACHE == []
    bounded._cached_pg(df, build)
    assert len(builds) == 2  # cold after clear — what bench relies on
    bounded.clear_pg_cache()


def test_pipeline_ops_plan_shapes(spark):
    """The new corpus ops keep their scale shapes: packing windows are
    bucket-partitioned (never a single global window), sampling
    broadcasts only the tiny per-stratum count table, decontamination
    plans no cartesian product and stays broadcast-UNhinted."""
    from dd_ops_ocr_spark.operators.textstats import (
        q_decontaminate,
        q_sample_stratified,
        q_sequence_pack,
    )

    pack = _plan(q_sequence_pack(spark, SF_SMOKE))
    # the window must be partitioned by bucket; an empty partitionBy
    # would serialize the corpus through one partition
    win_line = next(l for l in pack.splitlines() if "Window" in l)
    assert "bucket" in win_line, win_line

    samp = _plan(q_sample_stratified(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in samp  # counts side is O(#langs)
    assert "CartesianProduct" not in samp

    dec = _plan(q_decontaminate(spark, SF_SMOKE))
    assert "CartesianProduct" not in dec
    assert "BroadcastNestedLoopJoin" not in dec

    from dd_ops_ocr_spark.operators.textstats import q_decontaminate_bloom

    blm = _plan(q_decontaminate_bloom(spark, SF_SMOKE))
    assert "CartesianProduct" not in blm
    # the bloom probe (ArrowEvalPython + Filter pythonUDF) must consume
    # the exploded gram stream DIRECTLY — no Exchange between the probe
    # and the Generate below it — so the full train shingle stream never
    # shuffles; only bloom candidates reach the verify join
    lines = blm.splitlines()
    probe = next(i for i, l in enumerate(lines) if "ArrowEvalPython" in l)
    gen = next(i for i, l in enumerate(lines)
               if i > probe and "Generate explode" in l)
    assert not any("Exchange" in l for l in lines[probe:gen]), blm[:2000]

    from dd_ops_ocr_spark.operators.textstats import q_pii_redact

    # PII redaction is pure per-row column math: zero exchanges
    pii = _plan(q_pii_redact(spark, SF_SMOKE))
    assert "Exchange" not in pii, pii[:2000]

    from dd_ops_ocr_spark.operators.urlops import q_url_domain_cap

    url = _plan(q_url_domain_cap(spark, SF_SMOKE))
    # salted two-phase cap: exactly two bounded exchanges — (domain,
    # salt) then domain-over-survivors — and the first window's
    # partition spec must carry the salt (the mega-domain bound)
    assert url.count("Exchange") == 2, url[:2000]
    assert "salt" in url, url[:2000]
    assert "CartesianProduct" not in url

    from dd_ops_ocr_spark.operators.textstats import q_topk_ngrams

    from dd_ops_ocr_spark.operators.textstats import q_lm_familiarity

    lm = _plan(q_lm_familiarity(spark, SF_SMOKE))
    # the raw trigram stream must NEVER reach an exchange: its only
    # join is a broadcast (model vocab is bounded at 28^3 by
    # construction; explode_outer makes a doc-sized backfill join
    # unnecessary) and the only two shuffles carry aggregated rows —
    # (gram, count) for the model, one row per doc for the scores
    assert lm.count("Exchange hashpartitioning") == 2, lm[:2000]
    assert lm.count("BroadcastHashJoin") == 1, lm[:2000]
    assert "SortMergeJoin" not in lm and "CartesianProduct" not in lm
    assert "partial_count" in lm  # map-side partials on both aggs

    topk = _plan(q_topk_ngrams(spark, SF_SMOKE))
    # doc-local run-length counting means ONE exchange (the per-gram
    # hash-agg with map-side partials) and a TakeOrdered top-k — a
    # count+countDistinct formulation would add a full-width
    # (gram, doc_id) exchange, the dominant cost at corpus scale
    assert topk.count("Exchange") == 1, topk[:2000]
    assert "partial_sum" in topk
    assert "TakeOrderedAndProject" in topk

    from dd_ops_ocr_spark.operators.bpe import (
        q_bpe_tokenize, word_counts,
    )

    # the learn-side corpus stage: one exchange (wordcount hash-agg
    # with map-side partials) + TakeOrdered for the top-V cap — the
    # driver receives V rows, never the word stream
    wc = _plan(word_counts(spark, SF_SMOKE))
    assert wc.count("Exchange") == 1, wc[:2000]
    assert "partial_count" in wc and "TakeOrderedAndProject" in wc

    # the scoring pass: learned merges are plan LITERALS — a pure
    # projection with zero exchanges, zero joins, zero broadcasts
    tok = _plan(q_bpe_tokenize(spark, SF_SMOKE))
    assert "Exchange" not in tok, tok[:2000]
    assert "Join" not in tok and "Broadcast" not in tok


def test_engine_dual_plan_aggregates_before_join(spark):
    """K12: both engine sides reduce to per-doc rows BEFORE the
    full-outer join — the join must consume aggregates, not spans."""
    from dd_ops_ocr_spark.operators.joins import q_engine_dual_extract

    plan = _plan(q_engine_dual_extract(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    lines = plan.splitlines()
    join_idx = [i for i, l in enumerate(lines)
                if "SortMergeJoin" in l or "ShuffledHashJoin" in l
                or "BroadcastHashJoin" in l]
    assert join_idx, plan[:2000]
    # plan strings print parents first: the join's inputs (per-doc
    # aggregates) must appear BELOW the topmost join line
    below = "\n".join(lines[join_idx[0]:])
    assert (
        below.count("SortAggregate") + below.count("HashAggregate") >= 2
    ), below[:2000]


def test_corpus_curriculum_plan_shape(spark):
    """The composed curation DAG keeps the stages' audited shapes: the
    pack window stays bucket-partitioned and no join degenerates into a
    cartesian product."""
    from dd_ops_ocr_spark.operators.textstats import q_corpus_curriculum

    plan = _plan(q_corpus_curriculum(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    win_line = next(l for l in plan.splitlines() if "Window" in l)
    assert "bucket" in win_line, win_line


def test_repetition_stats_zero_exchange(spark):
    """The within-doc repetition pass is pure doc-local array math:
    scan -> project, NO exchange of any kind. This is the whole point
    of the operator at corpus scale — it must stay free to compose in
    front of shuffle-bearing stages."""
    from dd_ops_ocr_spark.operators.textstats import q_repetition_stats

    plan = _plan(q_repetition_stats(spark, SF_SMOKE))
    assert "Exchange" not in plan, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_jaccard_join_exact_no_cartesian(spark):
    """The prefix-filtered similarity join must be equi-joins all the
    way down (prefix-token candidates + array verify) — never a
    CartesianProduct / nested-loop all-pairs shape."""
    from dd_ops_ocr_spark.operators.dedup import q_jaccard_join_exact

    plan = _plan(q_jaccard_join_exact(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_zorder_key_single_scan_broadcast_extent(spark):
    """The Morton-key query scans orders, aggregates the 1-row extent,
    and broadcasts it back — the only join must be the broadcast
    nested-loop against that single row (a trivially-correct shape at
    any scale because one side IS one row), and only one exchange
    (the extent agg) may appear."""
    from dd_ops_ocr_spark.operators.catalogops import q_zorder_key

    plan = _plan(q_zorder_key(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange") <= 2  # extent partial+final agg only


def test_dynamic_partition_pruning_on_landed_layout(spark):
    """The landing layout (hive-partitioned corpus, corpus.py
    materialize_spans) must benefit from Catalyst's DYNAMIC partition
    pruning: when the partition-key predicate arrives through a joined
    dimension rather than a literal, the fact scan still prunes —
    at 10^12 rows the difference is reading one date's partitions vs
    the whole table. Static pruning is already covered by the salted
    size_class tests; this pins the runtime (subquery-driven) variant
    so a conf or layout regression (e.g. landing unpartitioned, or
    disabling the broadcast that seeds the pruning subquery) is caught
    as a plan diff."""
    import tempfile

    from pyspark.sql import functions as F

    with tempfile.TemporaryDirectory() as d:
        spark.range(2000).select(
            F.col("id"),
            (F.col("id") % 8).alias("day"),
            (F.col("id") * 3).alias("v"),
        ).write.partitionBy("day").parquet(f"{d}/fact")
        spark.range(8).select(
            F.col("id").alias("day"),
            F.when(F.col("id") < 2, "keep").otherwise("drop").alias("tag"),
        ).write.parquet(f"{d}/dim")

        fact = spark.read.parquet(f"{d}/fact")
        dim = spark.read.parquet(f"{d}/dim").filter(F.col("tag") == "keep")
        joined = fact.join(dim, "day").groupBy("day").agg(F.sum("v").alias("s"))

        plan = _plan(joined)
        assert "dynamicpruning" in plan.lower(), (
            f"fact scan lost dynamic partition pruning:\n{plan[:2000]}"
        )
        # semantics: only the two kept days survive
        assert joined.count() == 2


def test_runtime_bloom_filter_on_shuffle_join(spark):
    """The non-partitioned sibling of dynamic partition pruning: when
    both join sides are too big to broadcast (the 10^12-row regime —
    simulated here by disabling auto-broadcast) and the application
    side's scan is large (default threshold 10 GB, reached trivially
    at deployment scale — simulated by lowering it), Catalyst must
    inject a bloom filter built from the selective dim side into the
    fact scan, turning a full-corpus shuffle into a pre-filtered one.
    Pinned so a conf regression that silently drops the filter (and
    re-shuffles the whole fact table at scale) shows up as a plan
    diff."""
    import tempfile

    from pyspark.sql import functions as F

    saved_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    saved_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        with tempfile.TemporaryDirectory() as d:
            spark.range(200_000).select(
                F.col("id"), (F.col("id") % 10_000).alias("k"),
                (F.col("id") * 2).alias("v"),
            ).write.parquet(f"{d}/fact")
            spark.range(10_000).select(
                F.col("id").alias("k"),
                F.when(F.col("id") < 50, "keep").otherwise("drop").alias("tag"),
            ).write.parquet(f"{d}/dim")

            fact = spark.read.parquet(f"{d}/fact")
            dim = spark.read.parquet(f"{d}/dim").filter(F.col("tag") == "keep")
            j = fact.join(dim, "k").groupBy("tag").agg(F.sum("v").alias("s"))

            plan = _plan(j)
            assert "bloom" in plan.lower(), (
                f"runtime bloom filter not injected:\n{plan[:2000]}"
            )
            assert j.count() == 1
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            saved_scan)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bcast)


def test_delete_mask_is_broadcast_anti_join(spark, tmp_path):
    """Merge-on-read masking must stay a broadcast anti-join on the
    tiny delete side — a sort-merge anti here would shuffle the whole
    table to honor a few-KB mask. Both mask kinds checked: positional
    (delete_where) and equality (upsert)."""
    from pyspark.sql import functions as F

    from dd_ops_ocr_spark import catalog

    d = str(tmp_path / "tbl")
    df = spark.range(2000).withColumn("grp", F.col("id") % 10)
    catalog.write_snapshot(df.repartition(4), d, operation="overwrite")
    catalog.delete_where(spark, d, "id % 97 = 0")
    catalog.upsert(
        spark, d,
        spark.createDataFrame([(5, 50)], "id long, grp long"), keys=["id"],
    )
    plan = _plan(catalog.read_table(spark, d))
    n_anti = plan.count("LeftAnti")
    assert n_anti >= 2, plan[:2000]
    assert plan.count("BroadcastHashJoin") >= n_anti - plan.count(
        "BroadcastNestedLoopJoin"
    )
    assert "SortMergeJoin" not in plan, plan[:2000]
