"""Incremental extraction — process only documents not yet in the output
snapshot, then commit the union as a child snapshot.

The reference re-runs its whole per-session pipeline when new files land
and probes result directories for staleness (api/main.py:785-853); the
Spark-native shape is a snapshot diff: the committed output table knows
its doc_ids, so a new batch anti-joins them and only the delta flows
through the extraction kernel. Composes catalog.py (Iceberg-style
snapshots: the append is atomic, readers never see a partial delta,
every increment stays time-travelable) with pipeline.extract.

Scale notes: the anti-join's build side is (doc_id) only — pruned at the
scan by Catalyst; for a 10^12-row output table the doc_id column scan is
the cost floor, and a deployment would keep a doc_id-only index table
(or Iceberg puffin/bloom metadata) next to the output. The delta itself
runs the normal shuffle-free extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dd_ops_ocr_spark import catalog


def extract_incremental(
    spark: SparkSession,
    spans_df: DataFrame,
    table_dir: str,
    run_id: str,
    extractor=None,
) -> dict:
    """Extract the docs in ``spans_df`` that the output table has not seen,
    append them as a new snapshot, and return a summary. First run (no
    snapshot yet) processes everything with an ``overwrite`` commit."""
    from dd_ops_ocr_spark import pipeline

    extractor = extractor or pipeline.extract
    try:
        # The processed-doc roster is an aux component of the snapshot
        # (committed atomically with the data), NOT inferred from output
        # doc_ids: a doc whose extraction legitimately emits zero rows
        # must still count as seen, or it is re-extracted and re-committed
        # as a new snapshot on every run of a static source.
        seen = catalog.read_aux(spark, table_dir, "docids")
        roster_seed = None
        if seen is None:  # pre-roster table — fall back to output doc_ids
            seen = catalog.read_table(spark, table_dir).select("doc_id").distinct()
            # Upgrade path: the parent manifest has no roster to union with
            # (write_snapshot's append only unions aux keys the parent HAS),
            # so the first post-upgrade commit must seed the roster with the
            # fallback history — otherwise the next run reads a roster of
            # only this delta and re-extracts every pre-roster doc forever.
            roster_seed = seen
        operation = "append"
        delta = spans_df.join(seen, "doc_id", "left_anti")
    except FileNotFoundError:
        operation = "overwrite"
        delta = spans_df
        roster_seed = None

    out = extractor(delta)
    n_docs = delta.count()
    if operation == "append" and n_docs == 0:
        return {
            "run_id": run_id,
            "operation": "noop",
            "docs_processed": 0,
            "snapshot_id": catalog.current_snapshot_id(table_dir),
        }
    roster = delta.select("doc_id").distinct()
    if roster_seed is not None:
        roster = roster.unionByName(roster_seed).distinct()
    sid = catalog.write_snapshot(
        out, table_dir, operation,
        properties={"run_id": run_id, "docs_processed": n_docs},
        aux={"docids": roster},
    )
    return {
        "run_id": run_id,
        "operation": operation,
        "docs_processed": n_docs,
        "snapshot_id": sid,
    }
