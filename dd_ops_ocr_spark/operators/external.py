"""Bounded-concurrency external-engine calls (SURVEY §2.9 X4).

The reference wraps its per-group OCR calls in
``asyncio.Semaphore(max_concurrent_ocr=3)`` so one process never holds
more than 3 requests against the external service
(step6/03_step6_processor.py:49,250-282). The Spark-first translation
keeps BOTH halves of that design:

  * ACROSS the cluster, concurrency is the scheduler's job — partitions
    fan out to executors (X2/X3), and total external pressure is
    bounded by ``max_inflight x running tasks``, which dynamic
    allocation / ``spark.dynamicAllocation.maxExecutors`` caps
    deliberately rather than accidentally;
  * WITHIN a task, an asyncio semaphore bounds in-flight calls exactly
    like the reference, because one Arrow batch of docs must not turn
    into one burst of hundreds of simultaneous requests.

The engine is an injected ``async`` callable (the same seam style as
the codec decoders): production plugs an HTTP/gRPC client in; the
default is a deterministic local transform so the data path is
driver-gradable (the concurrency bound itself is pytest territory —
a recording fake proves the high-water mark equals ``max_inflight``).
"""

from __future__ import annotations

from typing import Awaitable, Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F


async def default_engine(text: str) -> dict:
    """Deterministic stand-in for the external OCR/LLM call: character
    count + the 10-char head. Restatable in SQL, so the driver grades
    the full operator path end-to-end. Deliberately NO case mapping:
    Python str.upper() is full Unicode case folding while DuckDB's
    UPPER() is the simple mapping (straße -> STRASSE vs STRAẞE), so an
    upper() here would silently break the oracle on non-ASCII corpora;
    code-point slicing agrees between the engines."""
    return {"result_len": len(text), "head": text[:10]}


def run_bounded(
    texts: list[str],
    engine: Callable[[str], Awaitable[dict]],
    max_inflight: int,
) -> list[dict]:
    """One Arrow batch through the semaphore-bounded gather: never more
    than ``max_inflight`` engine calls in flight, results in input
    order. Module-level (not a task closure) so the concurrency
    contract is unit-testable without a Spark worker in between."""
    import asyncio

    async def process() -> list[dict]:
        sem = asyncio.Semaphore(max_inflight)

        async def one(t: str) -> dict:
            async with sem:
                return await engine(t)

        return await asyncio.gather(*[one(t) for t in texts])

    return asyncio.run(process())


def bounded_engine_calls(
    docs: DataFrame,
    engine: Callable[[str], Awaitable[dict]] = default_engine,
    max_inflight: int = 3,
) -> DataFrame:
    """(doc_id, text) -> engine results with at most ``max_inflight``
    calls in flight per task. Results keep input order (asyncio.gather
    preserves ordering); a failing call fails the task — retry policy
    stays with Spark task retries (X5), not hidden re-requests."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL text never reaches the engine: it would crash the
            # whole task (len(None); a real HTTP engine chokes the same
            # way) for a single bad row. The row itself still emits —
            # NULL results, matching the SQL twin's LENGTH(NULL)/
            # substring(NULL) semantics.
            texts = list(pdf["text"])
            nn = [t for t in texts if not pd.isna(t)]
            outs = iter(run_bounded(nn, engine, max_inflight))
            res_len: list = []
            heads: list = []
            for t in texts:
                if pd.isna(t):
                    res_len.append(None)
                    heads.append(None)
                else:
                    o = next(outs)
                    res_len.append(o["result_len"])
                    heads.append(o["head"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "result_len": pd.array(res_len, dtype="Int64"),
                    "head": heads,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run, schema="doc_id long, result_len long, head string"
    )


def q_bounded_engine_calls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query (X4): the bounded-concurrency call path over the
    documents table with the deterministic default engine."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bounded_engine_calls(docs)


SQL_BOUNDED_ENGINE_CALLS = """
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS result_len,
       substring(text, 1, 10) AS head
FROM documents
"""


QUERIES = {"bounded_engine_calls": q_bounded_engine_calls}
ORACLE_SQL = {"bounded_engine_calls": SQL_BOUNDED_ENGINE_CALLS}
