#!/usr/bin/env python
"""Round-6 optimization workbench (bench.py is FROZEN for measurement;
this file holds the extra instrumentation the optimization round needs).

Per-query isolation with the noop sink (guide 1.4), job labels
(guide 1.5), and .explain("formatted") capture into plans/r06/.

Usage:
    python bench_extra.py <query> [<query> ...] [--tag before|after]
    python bench_extra.py --list

Each query runs on the SAME landed sf0.1 corpus caches bench.py uses
(.bench_cache), at local[$SPARK_GRAFT_CPUS], warmup + best-of-3, and the
formatted plan is written to plans/r06/<query>_<tag>.txt.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLAN_DIR = os.path.join(REPO, "plans", "r06")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _spans(spark):
    import bench

    return spark.read.parquet(bench.ensure_spans_cache(spark))


def _flat(spark):
    import bench

    spans_path = bench.ensure_spans_cache(spark)
    return spark.read.parquet(bench.ensure_flat_cache(spark, spans_path))


# query name -> (build_df: spark -> DataFrame, consume: df -> None)
# consume defaults to a noop write of every column.
def _registry():
    from pyspark.sql import functions as F

    def q_bounded(spark):
        from dd_ops_ocr_spark.plans.bounded import (
            clear_pg_cache,
            extract_exploded_bounded,
        )

        clear_pg_cache()
        return extract_exploded_bounded(_flat(spark))

    def q_sql(spark):
        from dd_ops_ocr_spark.plans.sql_extract import extract_sql

        return extract_sql(_spans(spark))

    def q_salted(spark):
        import bench
        from dd_ops_ocr_spark.plans.salting import extract_salted_pruned

        return extract_salted_pruned(spark, bench.ensure_spans_cache(spark))

    def q_extract(spark):
        from dd_ops_ocr_spark import pipeline

        return pipeline.extract(_spans(spark))

    def q_jaccard(spark):
        from dd_ops_ocr_spark.operators.dedup import q_jaccard_join_exact

        return q_jaccard_join_exact(spark, SF_DIR)

    def q_host_pr(spark):
        from dd_ops_ocr_spark.operators.linkgraph import q_host_pagerank

        return q_host_pagerank(spark, SF_DIR)

    def q_link_pr(spark):
        from dd_ops_ocr_spark.operators.linkgraph import q_link_graph_pagerank

        return q_link_graph_pagerank(spark, SF_DIR)

    def q_minhash(spark):
        from dd_ops_ocr_spark.operators.dedup import q_minhash_signature

        return q_minhash_signature(spark, SF_DIR)

    def q_lm(spark):
        from dd_ops_ocr_spark.operators.textstats import q_lm_familiarity

        return q_lm_familiarity(spark, SF_DIR)

    def q_dup_passage(spark):
        from dd_ops_ocr_spark.operators.passages import q_dup_passage_strip

        return q_dup_passage_strip(spark, SF_DIR)

    def q_pdf(spark):
        from dd_ops_ocr_spark.operators.pdf import q_pdf_text_spans

        return q_pdf_text_spans(spark, SF_DIR)

    def q_repetition(spark):
        from dd_ops_ocr_spark.operators.textstats import q_repetition_stats

        return q_repetition_stats(spark, SF_DIR)

    def q_warc64(spark):
        from dd_ops_ocr_spark.operators import warcsource as _ws

        _ws.ensure_registered(spark)
        arch = _ws.bench_archive(spark, SF_DIR, mult=64)
        return (
            spark.read.format("ddops_warc").load(arch)
            .filter(F.col("warc_type").isin("response", "metadata"))
        )

    def q_video(spark):
        import bench
        from dd_ops_ocr_spark.operators.multimodal import media_video_frames

        p = bench._cached_media(
            os.path.join(bench.CACHE,
                         f"media_avi_{bench._sf_name()}_v{bench.MEDIA_SYNTH_V}.parquet"),
            "avi", spark)
        return media_video_frames(spark.read.parquet(p))

    def q_resize(spark):
        import bench
        from dd_ops_ocr_spark.operators.jpeg import decode_jpeg, encode_jpeg
        from dd_ops_ocr_spark.operators.multimodal import media_resize

        p = bench._cached_media(
            os.path.join(bench.CACHE,
                         f"media_jpeg_{bench._sf_name()}_v{bench.MEDIA_SYNTH_V}.parquet"),
            "jpeg", spark)

        def _enc(px):
            return encode_jpeg(px, quality=95, subsampling="4:2:0")

        return media_resize(spark.read.parquet(p), 16, 20,
                            decoder=decode_jpeg, encoder=_enc)

    def q_webp(spark):
        import bench
        from dd_ops_ocr_spark.operators.multimodal import media_metadata

        p = bench._cached_media(
            os.path.join(bench.CACHE,
                         f"media_webp_{bench._sf_name()}_v{bench.MEDIA_SYNTH_V}.parquet"),
            "webp", spark)
        return media_metadata(spark.read.parquet(p))

    def q_jpeg(spark):
        import bench
        from dd_ops_ocr_spark.operators.multimodal import media_metadata

        p = bench._cached_media(
            os.path.join(bench.CACHE,
                         f"media_jpeg_{bench._sf_name()}_v{bench.MEDIA_SYNTH_V}.parquet"),
            "jpeg", spark)
        return media_metadata(spark.read.parquet(p))

    def q_bpe_train(spark):
        from dd_ops_ocr_spark.operators.bpe import q_bpe_train

        return q_bpe_train(spark, SF_DIR)

    def q_bpe_tokenize(spark):
        from dd_ops_ocr_spark.operators.bpe import q_bpe_tokenize

        return q_bpe_tokenize(spark, SF_DIR)

    def q_audio_adpcm(spark):
        import bench
        from dd_ops_ocr_spark.operators.multimodal import (
            media_audio_codec_features,
        )

        p = bench._cached_media(
            os.path.join(bench.CACHE,
                         f"media_adpcm_{bench._sf_name()}_v{bench.MEDIA_SYNTH_V}.parquet"),
            "wav_adpcm", spark)
        return media_audio_codec_features(spark.read.parquet(p))

    return {
        "flagship_extract": q_extract,
        "flagship_extract_exploded_bounded": q_bounded,
        "flagship_extract_sql": q_sql,
        "flagship_extract_salted": q_salted,
        "jaccard_join_exact": q_jaccard,
        "host_pagerank": q_host_pr,
        "link_graph_pagerank": q_link_pr,
        "minhash_signature": q_minhash,
        "lm_familiarity": q_lm,
        "dup_passage_strip": q_dup_passage,
        "pdf_text_spans": q_pdf,
        "repetition_stats": q_repetition,
        "warc_source_scan_64x": q_warc64,
        "media_video_frames": q_video,
        "media_resize_jpeg": q_resize,
        "media_metadata_webp": q_webp,
        "media_metadata_jpeg": q_jpeg,
        "media_audio_adpcm": q_audio_adpcm,
        "bpe_train": q_bpe_train,
        "bpe_tokenize": q_bpe_tokenize,
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tag = "before"
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i: i + 2]
    # default consumption = count(), matching the frozen bench.py
    # methodology for these rows; --consume noop forces full-column
    # materialization (guide 1.4) when chasing a pruned stage.
    consume = "count"
    if "--consume" in args:
        i = args.index("--consume")
        consume = args[i + 1]
        del args[i: i + 2]
    reg = _registry()
    if "--list" in args or not args:
        print("\n".join(reg))
        return

    from dd_ops_ocr_spark.session import build_spark

    spark = build_spark(
        app="bench_extra", cores=CPUS, shuffle_partitions=max(8, CPUS),
        driver_memory="12g",
        extra={"spark.ui.showConsoleProgress": "false",
               "spark.driver.extraJavaOptions": "-Xlog:disable"},
    )
    os.makedirs(PLAN_DIR, exist_ok=True)
    results = {}
    for name in args:
        build = reg[name]
        spark.sparkContext.setJobDescription(f"{name} [{tag}]")
        df = build(spark)
        with open(os.path.join(PLAN_DIR, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        sink = _noop if consume == "noop" else (lambda d: d.count())
        sink(df)  # warm
        best = float("inf")
        for _ in range(3):
            df = build(spark)  # rebuild (clears pg cache etc.)
            t0 = time.monotonic()
            sink(df)
            best = min(best, time.monotonic() - t0)
        results[name] = round(best, 3)
        print(f"{name} [{tag}]: {best:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
    print({tag: results})
    spark.stop()


if __name__ == "__main__":
    main()
