"""Python UDTFs: the SQL-native table-function surface.

The reference exposes its per-document fan-out only through imperative
loops (each PDF → pages → OCR groups, `src/modules/step1/
02_pdf_processor.py`, `src/api/main.py` orchestration); this engine's
kernels express the same shapes as mapInArrow/mapInPandas. This module
adds the third Spark idiom — **user-defined table functions** (Spark
4 Python UDTFs) — so the fan-out/fold pair is ALSO available to pure
SQL callers as lateral table functions:

* ``token_explode(text)`` — one→many: a lateral UDTF emitting
  ``(tok_idx, token, n_chars)`` per token. Registered Arrow-optimized
  (``useArrow=True``): argument batches cross the Python boundary
  columnar, not row-by-row pickled.
* ``doc_reassemble(TABLE(...) PARTITION BY doc_id ORDER BY tok_idx)``
  — many→one: a TABLE-argument UDTF. Spark shuffles the input on the
  PARTITION BY key, sorts each group by the ORDER BY key, feeds one
  UDTF instance per group (``eval`` per row, ``terminate`` emits the
  folded rows). This is the UDTF twin of the engine's ordered folds
  (`operators/merges.py:99`) — same exchange shape (one hash exchange
  + in-partition sort), declared in SQL instead of ``applyInPandas``.

The two queries pin a LOSSLESS round trip: splitting on a single
space and re-joining on a single space is the identity for any input
(empties preserved), so ``doc_reassemble``'s oracle is simply the
original ``documents.text`` — any drift in partitioning, ordering, or
terminate semantics breaks the hash.

Scale note: UDTF ``eval`` runs per row even Arrow-registered — fine
for SQL ergonomics and modest fan-outs, but the engine's hot paths
stay on the vectorized kernels; this surface exists so SQL callers
don't have to leave SQL, not to replace mapInArrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="tok_idx int, token string, n_chars int", useArrow=True)
class TokenExplode:
    """Lateral one→many: `text.split(' ')` with positions. Split on a
    SINGLE space (not a whitespace class) so the inverse join is exact
    — empties from runs of spaces are preserved, matching DuckDB's
    string_split semantics closed-form."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok, len(tok)


@udtf(returnType="doc_id bigint, n_tokens int, rebuilt string")
class DocReassemble:
    """TABLE-argument many→one: rows arrive per PARTITION BY group in
    ORDER BY order; terminate() emits the fold. State is one growing
    token list per group — bounded by the largest doc, the same bound
    every per-doc kernel in this engine carries."""

    def __init__(self) -> None:
        self._doc_id = None
        self._tokens: list[str] = []

    def eval(self, row):  # noqa: D102 — UDTF contract
        self._doc_id = row["doc_id"]
        self._tokens.append(row["token"])

    def terminate(self):  # noqa: D102 — UDTF contract
        if self._doc_id is not None:
            yield self._doc_id, len(self._tokens), " ".join(self._tokens)


def ensure_registered(spark: SparkSession) -> None:
    """Idempotent per-session SQL registration."""
    spark.udtf.register("token_explode", TokenExplode)
    spark.udtf.register("doc_reassemble", DocReassemble)


def q_udtf_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral UDTF fan-out over documents, straight from SQL."""
    ensure_registered(spark)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql("""
        SELECT d.doc_id, t.tok_idx, t.token, t.n_chars
        FROM udtf_docs d, LATERAL token_explode(d.text) t
    """)


def q_udtf_doc_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode then refold through the TABLE-argument UDTF: PARTITION
    BY doc_id ORDER BY tok_idx must reproduce every document's text
    byte-for-byte (split/join on ' ' is the identity)."""
    ensure_registered(spark)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql("""
        SELECT r.doc_id, r.n_tokens, r.rebuilt
        FROM doc_reassemble(
          TABLE(
            SELECT d.doc_id, t.tok_idx, t.token
            FROM udtf_docs d, LATERAL token_explode(d.text) t
          )
          PARTITION BY doc_id ORDER BY tok_idx
        ) r
    """)


SQL_TOKEN_EXPLODE = """
SELECT doc_id, (i - 1)::INTEGER AS tok_idx, token,
       length(token)::INTEGER AS n_chars
FROM (
  SELECT doc_id,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS i,
         unnest(string_split(text, ' ')) AS token
  FROM documents
)
"""

SQL_DOC_REASSEMBLE = """
SELECT doc_id,
       len(string_split(text, ' '))::INTEGER AS n_tokens,
       text AS rebuilt
FROM documents
"""

QUERIES = {
    "udtf_token_explode": q_udtf_token_explode,
    "udtf_doc_reassemble": q_udtf_doc_reassemble,
}
ORACLE_SQL = {
    "udtf_token_explode": SQL_TOKEN_EXPLODE,
    "udtf_doc_reassemble": SQL_DOC_REASSEMBLE,
}
