"""Extraction over a SPLIT-LANDED corpus (corpus.materialize_spans with
``split_pages``): the landing already bounds every input row to at most
``split_pages`` pages, so no scan stage — not even the nested-row
routing pre-pass — can see a 100x-document row (VERDICT r4 #7: the last
task-skew source was storage granularity, fixable only at land time).

Routing is a metadata decision here: the ``size_class`` hive partition
separates whole small docs (part=0 rows, the overwhelming bulk) from
big-doc continuation rows. Small docs take the plain shuffle-free
nested kernel. Big docs are exploded to flat spans — cheap, their rows
are already bounded — and reassembled by ``plans.bounded``'s two-phase
aggregation plan, which resolves all doc-global state (boilerplate
keys, order bases) without ever concentrating a document into one task.

Output is span-for-span identical to ``pipeline.extract`` on the
unsplit corpus (tests/test_salted.py::test_split_landed_*).

Reference parity: the same spec as the flagship
(src/modules/step2/01_ocr_processor.py pipeline), re-planned for
bounded task granularity end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dd_ops_ocr_spark import pipeline
from dd_ops_ocr_spark.plans.bounded import extract_exploded_bounded


def extract_split_landed_branches(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """The two branch plans (small-doc kernel, big-doc bounded) before
    the union. Exposed separately because the union merges them into ONE
    Spark stage (neither branch ends at a shuffle boundary), so its task
    population is heterogeneous by construction — kernel tasks cost
    whole input partitions, bounded-plan tasks cost one shuffle
    partition. Per-stage skew measurement (tests/test_task_skew.py) is
    meaningful per branch; across branches the max/median ratio measures
    branch cost difference, not data skew."""
    df = spark.read.parquet(path)
    small = df.filter(F.col("size_class") == "small").select(
        "doc_id", "spans"
    )
    big_flat = (
        df.filter(F.col("size_class") == "big")
        .select("doc_id", F.explode("spans").alias("s"))
        .select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")
    )
    return pipeline.extract(small), extract_exploded_bounded(big_flat)


def extract_split_landed(spark: SparkSession, path: str) -> DataFrame:
    """Extract from a split-landed corpus directory. Both branches prune
    at the file level via the size_class hive partition (one corpus scan
    total, each file read once by exactly one branch)."""
    out_small, out_big = extract_split_landed_branches(spark, path)
    return out_small.unionByName(out_big)
