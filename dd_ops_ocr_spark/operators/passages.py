"""Cross-document EXACT-SUBSTRING duplicate-passage detection and removal.

The one dedup flavor the repo's family (exact md5 / MinHash-LSH / SimHash
/ embedding-cosine / line-level) did not yet cover: finding the *spans*
that are literally repeated across documents, the ExactSubstr
deduplication of Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499). Their single-node tool
builds a suffix array; the distributed equivalent used here is the
standard inverted-index formulation:

1. tokenize (whitespace), emit a k-token window key at EVERY position
   (stride 1 — stride>1 misses cross-doc alignment: a passage can start
   at any offset in each copy);
2. one hash-aggregate finds keys seen in >= 2 DISTINCT documents
   (within-doc self-repetition is deliberately out of scope — that is
   ``repetition_stats``'s Gopher-style job);
3. flagged window starts merge into maximal spans per document with a
   gaps-and-islands pass (two windows + one groupBy, all partitioned by
   doc_id);
4. the strip variant drops every covered token position and rejoins the
   survivors (Lee et al. remove ALL copies, not all-but-one; so do we).

Scale shape at 100 TB: the window stream is |tokens| rows wide but
narrow (doc_id, pos, 16-byte key) and aggregates map-side; the
duplicated-key set is a sliver of all keys, so the flagging join stays
an UNHINTED inner join for AQE to broadcast when small (same policy as
``decontaminate``/``line_dedup_global``). The islands pass shuffles once
on doc_id, bounded per doc. Keys default to md5 for engine-exact oracle
parity; production should pass ``hash_mode="xxh"`` (JVM xxhash64, no
16-byte hex strings through the shuffle) — a property test asserts both
modes produce identical spans.

Output text of the strip rejoins kept tokens with single spaces
(tokenization is whitespace-normalizing by construction); ``tok_start``
is 0-based, ``tok_end`` exclusive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dd_ops_ocr_spark.operators.classify import _tokens  # shared tokenization

K_TOKENS = 20      # window length (Lee et al. use 50 BPE tokens; the
                   # synthetic docs are ~50 words, so 20 keeps the same
                   # windows-per-doc regime at test scale)
PLANT_TOKENS = 25  # planted shared-passage length in the oracled corpus
MIN_DOCS = 2


def _window_keys(docs: DataFrame, k: int, hash_mode: str) -> DataFrame:
    """(doc_id, tok_start, key) for every k-token window, stride 1."""
    t = docs.select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    ).withColumn("n_toks", F.size("toks"))
    # Guard BEFORE sequence(): Spark's sequence(0, stop) with stop < 0
    # silently generates a DESCENDING range, not an empty one.
    w = t.filter(F.col("n_toks") >= k).select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("n_toks") - k)).alias("tok_start"),
    )
    gram = F.concat_ws(" ", F.slice("toks", F.col("tok_start") + 1, k))
    key = F.md5(gram) if hash_mode == "md5" else F.xxhash64(gram)
    return w.select("doc_id", F.col("tok_start").cast("int").alias("tok_start"),
                    key.alias("k"))


def dup_passage_spans(
    docs: DataFrame,
    k: int = K_TOKENS,
    min_docs: int = MIN_DOCS,
    hash_mode: str = "md5",
) -> DataFrame:
    """Maximal cross-document duplicated spans, one row per
    (doc_id, tok_start, tok_end) with tok_end exclusive."""
    w = _window_keys(docs, k, hash_mode)
    dup_keys = (
        w.groupBy("k")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("k")
    )
    # Unhinted: AQE broadcasts the duplicated-key sliver when it is
    # small, falls back to a shuffle join on a pathological corpus.
    flagged = w.join(dup_keys, "k").select("doc_id", "tok_start")

    per_doc = Window.partitionBy("doc_id").orderBy("tok_start")
    prev_max_end = F.max(F.col("tok_start") + k).over(
        per_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = flagged.withColumn(
        "new_island",
        (F.col("tok_start") > F.coalesce(prev_max_end, F.lit(-1))).cast("int"),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            per_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("tok_start").cast("int").alias("tok_start"),
            (F.max("tok_start") + k).cast("int").alias("tok_end"),
        )
        .select("doc_id", "tok_start", "tok_end")
    )


def strip_dup_passages(
    docs: DataFrame,
    k: int = K_TOKENS,
    min_docs: int = MIN_DOCS,
    hash_mode: str = "md5",
) -> DataFrame:
    """Remove every token covered by a cross-doc duplicated span (ALL
    copies, per Lee et al.); returns (doc_id, text, n_toks, n_kept,
    n_dropped) with survivors rejoined by single spaces in original
    order. Docs shorter than k tokens pass through untouched (modulo
    the whitespace normalization inherent in tokenize+rejoin)."""
    spans = dup_passage_spans(docs, k=k, min_docs=min_docs, hash_mode=hash_mode)
    covered = spans.select(
        "doc_id",
        F.explode(F.sequence("tok_start", F.col("tok_end") - 1)).alias("pos"),
    ).select("doc_id", F.col("pos").cast("int").alias("pos"))
    t = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    tok = t.select(
        "doc_id",
        F.size("toks").alias("n_toks"),
        F.posexplode("toks").alias("pos", "tok"),
    )
    kept = tok.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("tok")))),
                lambda s: s["tok"],
            ),
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    base = t.select("doc_id", F.size("toks").alias("n_toks"))
    out = base.join(rebuilt, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.col("n_toks").cast("int").alias("n_toks"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("int").alias("n_kept"),
        (F.col("n_toks") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("int")
        .alias("n_dropped"),
    )


# ------------------------------------------------------------- oracled corpus
# The synthetic documents are ~50 independent random words each, so
# natural 20-gram cross-doc collisions are absent; duplication is
# PLANTED deterministically: every doc with doc_id % 7 in (3, 5) gets
# the first PLANT_TOKENS tokens of its group leader (doc_id % 7 == 0)
# appended — the leader's head then occurs in >= 3 docs at different
# offsets, exercising the stride-1 alignment the operator exists for.


def _docs_with_planted_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    heads = d.filter(F.pmod("doc_id", F.lit(7)) == 0).select(
        F.col("doc_id").alias("leader_id"),
        F.concat_ws(" ", F.slice(_tokens(F.col("text")), 1, PLANT_TOKENS)).alias(
            "head"
        ),
    )
    out = (
        d.withColumn("leader_id", F.col("doc_id") - F.pmod("doc_id", F.lit(7)))
        .join(heads, "leader_id", "left")
        .withColumn(
            "text",
            F.when(
                F.pmod("doc_id", F.lit(7)).isin(3, 5) & F.col("head").isNotNull(),
                F.concat_ws(" ", "text", "head"),
            ).otherwise(F.col("text")),
        )
        .select("doc_id", "text")
    )
    return out


def q_dup_passage_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dup_passage_spans(_docs_with_planted_passages(spark, sf_dir))


def q_dup_passage_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return strip_dup_passages(_docs_with_planted_passages(spark, sf_dir))


_SQL_PLANTED = f"""
  SELECT b.doc_id,
         CASE WHEN b.doc_id % 7 IN (3, 5) AND h.head IS NOT NULL
              THEN b.text || ' ' || h.head ELSE b.text END AS text
  FROM documents b
  LEFT JOIN (
    SELECT doc_id AS leader_id,
           array_to_string(
             list_slice(
               list_filter(regexp_split_to_array(text, '[ \n\t]+'),
                           x -> x <> ''),
               1, {PLANT_TOKENS}), ' ') AS head
    FROM documents WHERE doc_id % 7 = 0
  ) h ON h.leader_id = b.doc_id - (b.doc_id % 7)
"""

_SQL_SPANS_CTES = f"""
WITH d AS ({_SQL_PLANTED}),
t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '[ \n\t]+'),
                     x -> x <> '') AS toks
  FROM d
),
w AS (
  SELECT doc_id, CAST(u.i AS INT) AS tok_start,
         md5(array_to_string(
               list_slice(toks, u.i + 1, u.i + {K_TOKENS}), ' ')) AS k
  FROM t, UNNEST(range(0, len(toks) - {K_TOKENS} + 1)) AS u(i)
),
dupk AS (
  SELECT k FROM w GROUP BY k HAVING COUNT(DISTINCT doc_id) >= {MIN_DOCS}
),
f AS (SELECT w.doc_id, w.tok_start FROM w SEMI JOIN dupk ON w.k = dupk.k),
isl AS (
  SELECT doc_id, tok_start,
         CASE WHEN tok_start > COALESCE(
                MAX(tok_start + {K_TOKENS}) OVER (
                  PARTITION BY doc_id ORDER BY tok_start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS ni
  FROM f
),
isl2 AS (
  SELECT doc_id, tok_start,
         SUM(ni) OVER (PARTITION BY doc_id ORDER BY tok_start
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM isl
),
spans AS (
  SELECT doc_id, CAST(MIN(tok_start) AS INT) AS tok_start,
         CAST(MAX(tok_start) + {K_TOKENS} AS INT) AS tok_end
  FROM isl2 GROUP BY doc_id, island
)
"""

SQL_DUP_PASSAGE_SPANS = (
    _SQL_SPANS_CTES + "SELECT doc_id, tok_start, tok_end FROM spans"
)

SQL_DUP_PASSAGE_STRIP = (
    _SQL_SPANS_CTES
    + f"""
, cov AS (
  SELECT doc_id, CAST(g.p AS INT) AS pos
  FROM spans, UNNEST(range(tok_start, tok_end)) AS g(p)
),
tok AS (
  SELECT doc_id, CAST(u.i AS INT) AS pos, toks[u.i + 1] AS tok
  FROM t, UNNEST(range(0, len(toks))) AS u(i)
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.tok
  FROM tok ANTI JOIN cov ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
),
rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.text, '') AS text,
       CAST(len(t.toks) AS INT) AS n_toks,
       CAST(COALESCE(r.n_kept, 0) AS INT) AS n_kept,
       CAST(len(t.toks) - COALESCE(r.n_kept, 0) AS INT) AS n_dropped
FROM t LEFT JOIN rebuilt r USING (doc_id)
"""
)

QUERIES = {
    "dup_passage_spans": q_dup_passage_spans,
    "dup_passage_strip": q_dup_passage_strip,
}

ORACLE_SQL = {
    "dup_passage_spans": SQL_DUP_PASSAGE_SPANS,
    "dup_passage_strip": SQL_DUP_PASSAGE_STRIP,
}
