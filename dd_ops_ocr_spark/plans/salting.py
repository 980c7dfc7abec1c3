"""Salted extraction for skewed multi-page documents (north_rule).

The unit of work is a document; cost ~ pages x spans. A p99 tail doc
(100 pages vs median 3) makes its task ~30x slower — AQE fixes shuffle
skew but not UDF-cost skew, so the salt is ours (SURVEY §4.1).

Design (hybrid, scale-first):

  * **small docs** (pages <= pages_per_bucket — the overwhelming bulk at
    any scale) take the plain nested path: ``pipeline.extract``, zero
    shuffle, whole doc inside one Arrow batch.
  * **big docs** (the rare tail) are processed in two passes:
      pass A (no shuffle, nested mapInArrow): per doc, compute the
        boilerplate drop-keys and the per-salt-bucket surviving span
        counts — tiny output, collected and broadcast.
      pass B (ONE shuffle): JVM posexplode + salt = offset div
        (STRIDE * pages_per_bucket) — pure arithmetic, no JVM regex —
        repartition by (doc_id, salt), then an Arrow kernel per
        partition: normalize (RE2), empty-drop, boilerplate drop via the
        broadcast key set, page-local two-up, reading-order local rank,
        and global order = local rank + broadcast exclusive-prefix base.
        No post-join: all cross-bucket reassembly state rides in the
        two small broadcasts.

  Task cost in pass B is bounded by pages_per_bucket pages regardless of
  doc size. The broadcasts are proportional to the number of *salted*
  docs only (the p99 tail), not the corpus — the property that keeps
  this viable at 10^12 docs.

Semantics are identical to ``pipeline.extract`` — asserted span-for-span
against the same oracle in tests/test_salted.py.

(Skew background: AQE's skew handling only rebalances shuffle blocks;
UDF-cost skew from heavy keys needs explicit salting — cf. the skewed-join
analyses in "CPU and GPU Hash Joins on Skewed Data", ICDE 2024, PAPERS.md.)
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from dd_ops_ocr_spark.schema import (
    BOILERPLATE_FRAC,
    CX,
    FOOTER_ZONE,
    GUTTER_HALF,
    HEADER_ZONE,
    MIN_PAGES_BOILERPLATE,
    OUT_SPANS_DDL,
    PAGE_H,
    PAGE_W,
    STRIDE,
    TWOUP_MIN_SIDE,
)

PAGES_PER_BUCKET = 25


def _normalize_arrow(text_arr):
    """C14 in Arrow C++ (RE2): collapse newline runs, trim whitespace."""
    import pyarrow.compute as pc

    return pc.utf8_trim_whitespace(
        pc.replace_substring_regex(text_arr, pattern="\n{2,}", replacement="\n")
    )


def _doc_stats_kernel(ppb: int):
    """Pass A kernel factory: per big doc, boilerplate drop-keys +
    per-salt surviving span counts. Emits union-style rows:
      (doc_id, salt, n,  null, null)  — surviving span count for a bucket
      (doc_id, -1,   0,  zone, text)  — a boilerplate drop-key
    ``ppb`` is baked into the closure (module globals reset on worker
    re-import, so they cannot carry per-call parameters).
    """

    def run(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        schema = pa.schema(
            [
                ("doc_id", pa.string()),
                ("salt", pa.int64()),
                ("n", pa.int64()),
                ("zone", pa.int32()),
                ("text", pa.string()),
            ]
        )
        for batch in batches:
            tbl = pa.Table.from_batches([batch]).combine_chunks()
            spans = tbl.column("spans").chunk(0)
            counts = pc.list_value_length(spans).fill_null(0).to_numpy()
            struct = pc.list_flatten(spans)
            if len(struct) == 0:
                continue
            doc_ids = tbl.column("doc_id").chunk(0).to_pylist()
            doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
            is_text = (
                pc.equal(struct.field("kind"), "text")
                .fill_null(False)
                .to_numpy(zero_copy_only=False)
                .astype(bool)
            )
            norm = _normalize_arrow(struct.field("text"))
            norm_len = pc.binary_length(norm).fill_null(0).to_numpy()
            offset = (
                struct.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
            )
            keep = (~is_text) | (norm_len > 0)

            ki = np.flatnonzero(keep)
            d = doc_idx[ki]
            off = offset[ki]
            page = off // STRIDE
            y = (off % STRIDE) // PAGE_W
            zone = np.where(
                y < HEADER_ZONE, 1, np.where(y >= PAGE_H - FOOTER_ZONE, 2, 0)
            )
            zone = np.where(is_text[ki], zone, 0)

            norm_k = pc.take(norm, pa.array(ki))

            rows_doc, rows_salt, rows_n, rows_zone, rows_text = [], [], [], [], []
            # big docs are few per batch — loop per doc, vectorize inside
            for di in np.unique(d):
                m = d == di
                pg = page[m]
                n_pages = len(np.unique(pg))
                boiler_mask = np.zeros(int(m.sum()), dtype=bool)
                keys: set[tuple[int, str]] = set()
                if n_pages >= MIN_PAGES_BOILERPLATE:
                    zn = zone[m]
                    cand = np.flatnonzero(zn > 0)
                    if len(cand):
                        texts = pc.take(
                            norm_k, pa.array(np.flatnonzero(m)[cand])
                        ).to_pylist()
                        cdf = pd.DataFrame(
                            {"zone": zn[cand], "text": texts, "page": pg[cand]}
                        )
                        zp = cdf.groupby(["zone", "text"])["page"].nunique()
                        thr = math.ceil(BOILERPLATE_FRAC * n_pages)
                        dropped = zp[zp >= thr]
                        keys = set(dropped.index)
                        if keys:
                            hit = cdf.set_index(["zone", "text"]).index.isin(
                                dropped.index
                            )
                            boiler_mask[cand] = hit
                surv_salt = (pg // ppb)[~boiler_mask]
                us, uc = np.unique(surv_salt, return_counts=True)
                for s_, c_ in zip(us, uc):
                    rows_doc.append(doc_ids[di])
                    rows_salt.append(int(s_))
                    rows_n.append(int(c_))
                    rows_zone.append(None)
                    rows_text.append(None)
                for z_, t_ in keys:
                    rows_doc.append(doc_ids[di])
                    rows_salt.append(-1)
                    rows_n.append(0)
                    rows_zone.append(int(z_))
                    rows_text.append(t_)
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": rows_doc,
                    "salt": rows_salt,
                    "n": rows_n,
                    "zone": rows_zone,
                    "text": rows_text,
                },
                schema=schema,
            )

    return run


def _salted_kernel(drop_keys_bc, base_bc, ppb: int):
    """Pass B kernel factory: extraction over flat (doc, salt)-partitioned
    spans with the doc-global state injected via broadcast."""

    def kernel(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        out_schema = pa.schema(
            [
                ("doc_id", pa.string()),
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("order", pa.int32()),
            ]
        )
        # Arrow may split one partition into several batches; (doc, salt)
        # groups must be processed whole, so concatenate the partition.
        batch_list = list(batches)
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list).combine_chunks()
        if tbl.num_rows == 0:
            return
        drop_keys = drop_keys_bc.value
        base = base_bc.value

        kind = tbl.column("kind").chunk(0)
        is_text = (
            pc.equal(kind, "text")
            .fill_null(False)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        norm = _normalize_arrow(tbl.column("text").chunk(0))
        norm_len = pc.binary_length(norm).fill_null(0).to_numpy()
        offset = (
            tbl.column("offset").chunk(0).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        keep = (~is_text) | (norm_len > 0)
        ki = np.flatnonzero(keep)
        if len(ki) == 0:
            return

        doc_arr = tbl.column("doc_id").chunk(0)
        doc_codes_da = pc.dictionary_encode(doc_arr)
        doc_code = np.asarray(
            doc_codes_da.indices.to_numpy(zero_copy_only=False), dtype=np.int64
        )
        doc_dict = doc_codes_da.dictionary.to_pylist()

        d = doc_code[ki]
        off = offset[ki]
        page = off // STRIDE
        rem = off % STRIDE
        y = rem // PAGE_W
        x = rem % PAGE_W
        is_text_k = is_text[ki]

        # boilerplate drop via broadcast keys (candidate spans only)
        zone = np.where(y < HEADER_ZONE, 1, np.where(y >= PAGE_H - FOOTER_ZONE, 2, 0))
        zone = np.where(is_text_k, zone, 0)
        boiler = np.zeros(len(ki), dtype=bool)
        cand = np.flatnonzero(zone > 0)
        if len(cand) and drop_keys:
            texts = pc.take(norm, pa.array(ki[cand])).to_pylist()
            boiler[cand] = [
                (doc_dict[d[c]], int(zone[c]), t) in drop_keys
                for c, t in zip(cand, texts)
            ]
        ki2 = np.flatnonzero(~boiler)
        gi = ki[ki2]
        d = d[ki2]
        page = page[ki2]
        y = y[ki2]
        x = x[ki2]
        is_text_k = is_text_k[ki2]

        # two-up per (doc, page) — page-local, safe across salt buckets
        PAGE_CAP = 1024
        dp = d * PAGE_CAP + page
        dp_codes, dp_inv = np.unique(dp, return_inverse=True)
        m = len(dp_codes)
        left = np.bincount(dp_inv[x < CX - GUTTER_HALF], minlength=m)
        right = np.bincount(dp_inv[x >= CX + GUTTER_HALF], minlength=m)
        gutter = np.bincount(
            dp_inv[(x >= CX - GUTTER_HALF) & (x < CX + GUTTER_HALF)], minlength=m
        )
        two_up = (gutter == 0) & (left >= TWOUP_MIN_SIDE) & (right >= TWOUP_MIN_SIDE)
        side = (two_up[dp_inv] & (x >= CX)).astype(np.int64)

        salt = page // ppb
        ds = d * 4096 + salt  # (doc, salt) composite; salt <= 409 < 4096
        if len(doc_dict) < (1 << 17):
            # single composite int64 sort key (29+10+1+12+11 = 63 bits)
            key = (((ds << 10 | page) << 1 | side) << 12 | y) << 11 | x
            srt = np.argsort(key, kind="stable")
        else:  # pragma: no cover - pathological partition width
            srt = np.lexsort((x, y, side, page, ds))
        ds_s = ds[srt]
        starts = np.ones(len(srt), dtype=bool)
        starts[1:] = ds_s[1:] != ds_s[:-1]
        group_start = np.maximum.accumulate(
            np.where(starts, np.arange(len(srt)), 0)
        )
        local = np.arange(len(srt)) - group_start + 1

        # global order = local rank + broadcast exclusive-prefix base
        d_srt = d[srt]
        salt_srt = salt[srt]
        gidx = np.flatnonzero(starts)
        glens = np.diff(np.append(gidx, len(srt)))
        gbases = np.fromiter(
            (
                base.get((doc_dict[d_srt[g]], int(salt_srt[g])), 0)
                for g in gidx
            ),
            dtype=np.int64,
            count=len(gidx),
        )
        bases = np.repeat(gbases, glens)
        order = (local + bases).astype(np.int32)

        take_idx = pa.array(gi[srt])
        out_norm = pc.take(norm, take_idx)
        out_kind = pc.take(kind, take_idx)
        out_media = pc.take(tbl.column("media_ref").chunk(0), take_idx)
        out_doc = pc.take(doc_arr, take_idx)
        text_mask = pa.array(is_text_k[srt])
        out_text = pc.if_else(text_mask, out_norm, pa.scalar(None, pa.string()))
        yield pa.RecordBatch.from_arrays(
            [out_doc, out_kind, out_text, out_media, pa.array(order)],
            schema=out_schema,
        )

    return kernel


def extract_salted(
    df: DataFrame, pages_per_bucket: int = PAGES_PER_BUCKET
) -> DataFrame:
    """Skew-proof extraction: identical output to ``pipeline.extract``."""
    from dd_ops_ocr_spark import pipeline

    spark = df.sparkSession
    ppb = pages_per_bucket

    # route by page count (JVM arithmetic over offsets — no UDF).
    # cheap pre-filter first: a doc with >= ppb pages must have >= ppb
    # spans (every page has at least one span), so the expensive
    # per-element aggregate only runs on that small superset.
    routed = df.withColumn(
        "_maxpage",
        F.when(F.size("spans") < ppb, F.lit(0).cast("bigint")).otherwise(
            F.expr(
                f"aggregate(spans, bigint(0),"
                f" (acc, s) -> greatest(acc, s.offset div {STRIDE}))"
            )
        ),
    )
    small = routed.filter(F.col("_maxpage") < ppb).drop("_maxpage")
    big = routed.filter(F.col("_maxpage") >= ppb).drop("_maxpage")

    small_out = pipeline.extract(small)

    # Pass A: doc-global stats for the tail docs (no shuffle, tiny output).
    stats_schema = "doc_id string, salt long, n long, zone int, text string"
    stats = big.mapInArrow(_doc_stats_kernel(ppb), schema=stats_schema).collect()

    drop_keys = {
        (r["doc_id"], r["zone"], r["text"]) for r in stats if r["salt"] == -1
    }
    counts: dict[tuple[str, int], int] = {
        (r["doc_id"], r["salt"]): r["n"] for r in stats if r["salt"] >= 0
    }
    base: dict[tuple[str, int], int] = {}
    acc_doc: dict[str, int] = {}
    for doc, salt in sorted(counts):
        base[(doc, salt)] = acc_doc.get(doc, 0)
        acc_doc[doc] = base[(doc, salt)] + counts[(doc, salt)]

    sc = spark.sparkContext
    drop_bc = sc.broadcast(drop_keys)
    base_bc = sc.broadcast(base)

    # Pass B: one shuffle keyed by (doc, salt); salt is pure offset math.
    flat = big.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id",
        "s.kind",
        "s.text",
        "s.media_ref",
        "s.offset",
        F.expr(f"s.offset div {STRIDE * ppb}").alias("salt"),
    )
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = flat.repartition(n_part, "doc_id", "salt").drop("salt")
    big_out = parted.mapInArrow(
        _salted_kernel(drop_bc, base_bc, ppb), schema=OUT_SPANS_DDL
    )

    return small_out.unionByName(big_out)
