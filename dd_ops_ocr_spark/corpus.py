"""Deterministic interleaved-spans corpus generator.

Derives the graded input table
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset:int32>>)``
from the driver-provided ``documents`` parquet (TESTDATA.md), per
FIXTURES.md §1. The generator is pure arithmetic (splitmix64 mixing — no
RNG state), so the Spark input-prep path and the pure-Python oracle see
byte-identical fixtures without any shared state or network calls.

Distribution goals (FIXTURES.md §1 table):
  * pages/doc mostly 1-5, ~1% tail docs with 100 pages  -> skew salting
  * 10-73 spans per page                                 -> band math
  * ~10% two-up pages (bimodal x, empty gutter)          -> K9 L/R split
  * repeated header/footer spans on >=80% of pages in ~1/3
    of multi-page docs                                   -> K15 strip
  * ~8% media spans with distinct media_ref              -> F6 classify
  * whitespace noise runs inside text spans              -> C14 collapse
  * occasional all-whitespace spans                      -> F11 empty drop
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from dd_ops_ocr_spark.schema import PAGE_H, PAGE_W, SPANS_SCHEMA, STRIDE, CX

_MASK = (1 << 64) - 1

# Bump when the generator's output changes for the same input — cached
# corpus materializations (fixtures.py, bench .bench_cache) key on it so
# a semantics change can never silently reuse stale parquet.
GENERATOR_VERSION = 1


def mix64(x: int) -> int:
    """splitmix64 finalizer — deterministic, stateless hash mixing."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def rng(*parts: int) -> int:
    """Combine integer parts into one 64-bit pseudo-random value."""
    h = 0
    for p in parts:
        h = mix64(h ^ (p & _MASK))
    return h


_FALLBACK_TEXT = (
    "WHEREAS the parties agree to the terms set forth herein, including "
    "Article 1 scope, Article 2 term, and Article 3 compensation."
)

_HEADER_FMT = "CONFIDENTIAL AGREEMENT {doc}"
_FOOTER_TEXT = "Standard Terms apply - dd-ops"

# Tail-doc page count (the p99 skew case, FIXTURES.md §1).
TAIL_MOD = 101
TAIL_RESIDUE = 7
TAIL_PAGES = 100


def n_pages_for(doc_key: int) -> int:
    if doc_key % TAIL_MOD == TAIL_RESIDUE:
        return TAIL_PAGES
    return 1 + rng(doc_key, 1) % 5


def doc_spans(doc_key: int, base_text: str) -> list[dict]:
    """Generate the span list for one document. Returns spans in a
    deterministically shuffled order (the pipeline's reading-order sort is
    load-bearing); offsets are unique within the doc."""
    base = base_text if base_text else _FALLBACK_TEXT
    lbase = len(base)
    pages = n_pages_for(doc_key)
    has_hf = pages >= 3 and rng(doc_key, 2) % 3 == 0
    header_text = _HEADER_FMT.format(doc=doc_key)

    spans: list[dict] = []
    for p in range(pages):
        used: set[int] = set()

        def place(y: int, x: int) -> int:
            off = p * STRIDE + y * PAGE_W + x
            while off in used:
                off += 1
            used.add(off)
            return off

        two_up = rng(doc_key, 3, p) % 10 == 3
        n_body = 10 + rng(doc_key, 4, p) % 64
        for i in range(n_body):
            u = rng(doc_key, 5, p, i)
            y = 256 + (u >> 8) % (PAGE_H - 512)
            if two_up:
                if (u >> 16) & 1:
                    x = CX + 128 + (u >> 24) % (PAGE_W - CX - 192)
                else:
                    x = 64 + (u >> 24) % (CX - 256)
            else:
                x = 64 + (u >> 24) % (PAGE_W - 128)
            off = place(y, x)
            if u % 12 == 5:
                spans.append(
                    {
                        "kind": "media",
                        "text": None,
                        "media_ref": f"img_{doc_key}_{p}_{i}",
                        "offset": off,
                    }
                )
                continue
            if u % 53 == 9:
                chunk = "   \n\n  "  # pure whitespace -> dropped by F11
            else:
                start = (u >> 32) % max(1, lbase - 48)
                ln = 6 + (u >> 40) % 40
                chunk = base[start : start + ln]
                v = u % 7
                if v == 0:
                    chunk = chunk[:2] + "\n\n\n" + chunk[2:]
                elif v == 1:
                    chunk = "  " + chunk + " \n\n"
                elif v == 2:
                    chunk = chunk + "\n\n" + chunk[:3]
            spans.append(
                {"kind": "text", "text": chunk, "media_ref": None, "offset": off}
            )
        if has_hf:
            uh = rng(doc_key, 6, p)
            if uh % 10 < 9:
                off = place(16 + uh % 80, 64 + (uh >> 16) % 1900)
                spans.append(
                    {"kind": "text", "text": header_text, "media_ref": None, "offset": off}
                )
            uf = rng(doc_key, 7, p)
            if uf % 10 < 9:
                off = place(PAGE_H - 96 + uf % 80, 64 + (uf >> 16) % 1900)
                spans.append(
                    {"kind": "text", "text": _FOOTER_TEXT, "media_ref": None, "offset": off}
                )

    shuffle_seed = rng(doc_key, 8)
    spans.sort(key=lambda s: mix64(s["offset"] ^ shuffle_seed))
    return spans


def doc_id_str(doc_key: int) -> str:
    return f"doc_{doc_key:06d}"


def spans_pandas(documents: pd.DataFrame) -> pd.DataFrame:
    """documents (doc_id:int64, text, ...) -> (doc_id:str, spans:list[dict])."""
    out_ids: list[str] = []
    out_spans: list[list[dict]] = []
    for doc_key, text in zip(documents["doc_id"], documents["text"]):
        out_ids.append(doc_id_str(int(doc_key)))
        out_spans.append(doc_spans(int(doc_key), text or ""))
    return pd.DataFrame({"doc_id": out_ids, "spans": out_spans})


REPLICA_STRIDE = 10_000_000  # doc_key offset per corpus replica


def build_spans_df(spark, sf_dir: str, replicate: int = 1):
    """Spark DataFrame of (doc_id, spans) synthesized from ``documents``.

    Generation runs distributed via mapInPandas so it parallelizes across
    executor cores; each batch is independent (generator is stateless).

    ``replicate`` > 1 scales the corpus for benchmarking: replica k uses
    doc_key + k * REPLICA_STRIDE, so replicas have distinct doc_ids AND
    distinct deterministic content (the generator mixes the key into
    every draw) — no artificial duplicate skew.
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if replicate > 1:
        reps = spark.range(replicate).select(
            (F.col("id") * REPLICA_STRIDE).alias("rep_off")
        )
        docs = docs.crossJoin(F.broadcast(reps)).select(
            (F.col("doc_id") + F.col("rep_off")).alias("doc_id"), "text"
        )
    # the documents parquet is a single small file (one scan partition, and
    # a broadcast cross-join preserves that) — spread generation over cores
    n_par = docs.sparkSession.sparkContext.defaultParallelism * 4
    docs = docs.repartition(n_par)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield spans_pandas(pdf)

    return docs.mapInPandas(gen, schema=SPANS_SCHEMA)


# keyed on (sf_dir, replicate); the session is checked by IDENTITY and
# liveness at lookup, never by id() — id(sparkContext) can be recycled
# by the allocator after a session stops, which would splice a stopped
# session's persisted plan into a live one (the _cached_pg hazard,
# plans/bounded.py:72). Dead-session entries are evicted as seen, so
# the cache also cannot grow one persisted corpus per dead session.
_spans_cache: dict[tuple[str, int], tuple[object, object]] = {}


def build_spans_df_cached(spark, sf_dir: str, replicate: int = 1):
    """Memoized + persisted variant for callers that run several queries
    over the same synthesized corpus in one session (the driver's
    correctness phase runs ~7 flagship-family queries; without this each
    action would re-run the Python generation)."""
    key = (sf_dir, replicate)
    hit = _spans_cache.get(key)
    if hit is not None:
        cached_session, df = hit
        live = False
        if cached_session is spark:
            try:
                live = not spark._jsparkSession.sparkContext().isStopped()
            except Exception:  # noqa: BLE001 — JVM-side failure = dead
                live = False
        if live:
            return df
        _spans_cache.pop(key, None)
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — its session may be stopped
            pass
    df = build_spans_df(spark, sf_dir, replicate=replicate).persist()
    _spans_cache[key] = (spark, df)
    return df


def materialize_spans(
    spark,
    sf_dir: str,
    out_path: str,
    n_partitions: int = 32,
    replicate: int = 1,
    split_pages: int | None = None,
) -> str:
    """Write the synthetic spans table to parquet once (bench input cache).

    The layout is hive-partitioned by ``size_class`` (small|big at the
    salted path's PAGES_PER_BUCKET boundary): the skew-routing scan in
    ``plans.salting.extract_salted_pruned`` then PRUNES at the file level
    instead of re-reading 100% of the corpus to find the tail docs — the
    landing-time partition column a 100 TB deployment would carry. Plain
    readers are unaffected (the extra column rides along).

    ``split_pages`` additionally bounds ROW granularity at land time
    (VERDICT r4 #7): documents spanning more than ``split_pages`` pages
    are landed as CONTINUATION rows ``(doc_id, part, spans)``, each
    holding at most ``split_pages`` consecutive pages (part = page div
    split_pages; original relative span order preserved within a part).
    With it, even a nested-row scan is task-bounded — no single input
    row can carry a 100x document — at the price that doc-global
    operators must reassemble parts (``plans.bounded`` does this with
    two-phase aggs; see ``plans.split_landed.extract_split_landed``).
    Small docs land unchanged as a single part=0 row."""
    df = build_spans_df(spark, sf_dir, replicate=replicate)
    return land_spans(
        df, out_path, n_partitions=n_partitions, split_pages=split_pages
    )


def land_spans(
    df,
    out_path: str,
    n_partitions: int = 32,
    split_pages: int | None = None,
) -> str:
    """Land any (doc_id, spans) DataFrame in the production layout:
    hive-partitioned by size_class, optionally with mega-docs split into
    bounded continuation rows (see materialize_spans docstring)."""
    from pyspark.sql import functions as F

    from dd_ops_ocr_spark.plans.salting import PAGES_PER_BUCKET
    from dd_ops_ocr_spark.schema import STRIDE

    size_class = F.when(
        F.coalesce(
            F.expr(f"array_max(spans.offset) div {STRIDE}"), F.lit(0)
        ) >= PAGES_PER_BUCKET,
        F.lit("big"),
    ).otherwise(F.lit("small"))
    df = df.withColumn("size_class", size_class)
    if split_pages is not None:
        # split big docs only: explode with the original array position,
        # bucket by page range, reassemble each part ordered by position
        # (all JVM expressions). Persist the source FIRST: the small and
        # big branches below are two consumers of the same plan, and for
        # a synthesized corpus that plan is the Python span generation —
        # without the persist each branch re-executes it over the full
        # corpus, doubling the dominant landing cost (the extra shuffle
        # was never the expensive part).
        src = df.persist()
        small = src.filter(F.col("size_class") == "small").withColumn(
            "part", F.lit(0)
        )
        big = (
            src.filter(F.col("size_class") == "big")
            .select(
                "doc_id", "size_class", F.posexplode("spans").alias("pos", "s")
            )
            .withColumn(
                # integer div, matching the codebase's exact page
                # arithmetic ('offset div STRIDE'): float true-division
                # loses exactness once offset * ulp crosses the divisor
                "part",
                F.expr(f"int(s.offset div {STRIDE * split_pages})"),
            )
            .groupBy("doc_id", "size_class", "part")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("ps")
            )
            .select(
                "doc_id",
                F.expr("transform(ps, x -> x.s)").alias("spans"),
                "size_class",
                "part",
            )
        )
        df = small.select("doc_id", "spans", "size_class", "part").unionByName(
            big
        )
        # distribute by (doc_id, part) so one mega-doc's continuation
        # rows spread across files instead of re-concentrating
        df = df.repartition(n_partitions, "doc_id", "part")
    else:
        df = df.repartition(n_partitions, "doc_id")
    (
        df.write.mode("overwrite")
        .partitionBy("size_class")
        .parquet(out_path)
    )
    if split_pages is not None:
        src.unpersist()  # the write materialized both branches
    return out_path


# (the offset -> (page, y, x) decode is `page = offset div STRIDE;
# y = rem div PAGE_W; x = rem mod PAGE_W` per schema.py — each kernel
# inlines the vectorized form over its own array layout; oracle.py:62
# states the scalar spec)
