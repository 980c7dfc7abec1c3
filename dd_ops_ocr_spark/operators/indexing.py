"""Search-index operators: per-document tf-idf keywords and a chunked
inverted index — the indexing sink a corpus pipeline feeds (the
retrieval side of the training-data story: dedup/decontaminate look
things up by content, search serves them).

Both are integer-exact across engines via the same quantized-log idiom
as classify/lm_familiarity: idf_bits = bits(N_docs) - bits(df) with
bits(c) = length(bin(c)) = floor(log2(c))+1, so tf * idf_bits is plain
int64 arithmetic — no float logs, no summation-order hazard. Ubiquitous
tokens (df ~ N) get idf_bits 0 and drop out of keywords by themselves.

Scale shapes:

* ``tfidf_topk``: one (doc_id, token) hash agg (map-side partials), the
  df side derived from the SAME aggregate (token-level re-agg), an
  unhinted token join (AQE broadcasts a real vocabulary), one per-doc
  window for the top-k cut. Nothing doc-sized crosses the wire twice.
* ``inverted_index``: the classic skew trap is a stopword's posting
  list — at 10^12 docs a single (token) group holds ~10^12 entries and
  one task dies. Postings are therefore CHUNKED: rank docs per token,
  chunk_id = floor(rank/CHUNK), group by (token, chunk_id) — every task
  is bounded by CHUNK regardless of df, and a reader streams chunks in
  order (chunk boundaries are sorted doc_id ranges). Posting lists are
  serialized "doc:tf" strings — the segment-file shape, and robust to
  engine array-representation drift in the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TOP_K = 3
CHUNK = 8  # small so the oracled corpus exercises multi-chunk tokens


def _tokens(col):
    return F.filter(F.split(col, "[ \n\t]+"), lambda x: x != F.lit(""))


def _bits(c):
    return F.when(c == 0, F.lit(0)).otherwise(F.length(F.bin(c))).cast("long")


def _doc_token_tf(docs: DataFrame) -> DataFrame:
    occ = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    return occ.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))


def tfidf_topk(docs: DataFrame, k: int = TOP_K) -> DataFrame:
    """Top-k (doc_id, rank, token, score) per doc by tf * idf_bits,
    deterministic tiebreak (score desc, token asc). Docs whose every
    token scores 0 still emit their k alphabetically-first tokens —
    anchored output, no silently-absent docs."""
    tf = _doc_token_tf(docs)
    df_tok = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.countDistinct("doc_id").alias("n_docs"))
    # df_tok is vocabulary-sized and joins against the corpus-sized tf
    # stream: broadcast explicitly — unhinted, Catalyst's conservative
    # post-aggregate size estimate plans a SortMergeJoin and the tf side
    # gets shuffle-written by token before AQE can re-plan (the nb_score
    # pathology, classify.py)
    scored = (
        tf.join(F.broadcast(df_tok), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            (F.col("tf") * (_bits(F.col("n_docs")) - _bits(F.col("df"))))
            .cast("long")
            .alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", F.col("rank").cast("int").alias("rank"), "token", "score")
    )


def inverted_index(docs: DataFrame, chunk: int = CHUNK) -> DataFrame:
    """(token, chunk_id, df, n_chunk, postings) — postings is the
    serialized "doc:tf doc:tf ..." run for this chunk, doc_ids ascending
    within and across chunks; df rides every row so a reader needs no
    second lookup. Task size is bounded by ``chunk`` for every token."""
    tf = _doc_token_tf(docs)
    w = Window.partitionBy("token").orderBy("doc_id")
    ranked = tf.withColumn(
        "chunk_id", F.floor((F.row_number().over(w) - 1) / chunk).cast("int")
    )
    per_chunk = ranked.groupBy("token", "chunk_id").agg(
        F.count("*").alias("n_chunk"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("doc_id"), F.col("tf")))
                ),
                lambda s: F.concat_ws(":", s["doc_id"], s["tf"]),
            ),
        ).alias("postings"),
    )
    df_tok = tf.groupBy("token").agg(F.count("*").alias("df"))
    # same explicit-broadcast rationale as tfidf_topk's df join
    return per_chunk.join(F.broadcast(df_tok), "token").select(
        "token",
        "chunk_id",
        F.col("df").cast("long").alias("df"),
        F.col("n_chunk").cast("long").alias("n_chunk"),
        "postings",
    )


# ------------------------------------------------------------- oracled corpus
# The raw documents share one ~30-word vocabulary (df ~ N for every
# token, all idf_bits 0), so keyword signal is PLANTED: every doc gets
# a mid-frequency "topicM" token (M = doc_id % 50, repeated 1 + doc_id%3
# times) and a rare "nicheM" token (M = doc_id % 200) — tf-idf must
# surface exactly these, and the inverted index gets both multi-chunk
# common tokens and short-tail planted ones.


def _docs_with_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    topic = F.concat(F.lit("topic"), F.pmod("doc_id", F.lit(50)))
    niche = F.concat(F.lit("niche"), F.pmod("doc_id", F.lit(200)))
    reps = (F.pmod("doc_id", F.lit(3)) + 1).cast("int")
    return d.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.col("text"),
            F.concat_ws(" ", F.array_repeat(topic, reps)),
            niche,
        ).alias("text"),
    )


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_topk(_docs_with_keywords(spark, sf_dir))


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    return inverted_index(_docs_with_keywords(spark, sf_dir))


_SQL_KEYWORD_DOCS = """
  SELECT doc_id,
         text || repeat(' topic' || CAST(doc_id % 50 AS VARCHAR),
                        CAST(1 + doc_id % 3 AS INT))
              || ' niche' || CAST(doc_id % 200 AS VARCHAR) AS text
  FROM documents
"""

_SQL_TF = """
t AS (
  SELECT doc_id, u.token, COUNT(*) AS tf
  FROM d, UNNEST(list_filter(regexp_split_to_array(text, '[ \n\t]+'),
                             x -> x <> '')) AS u(token)
  GROUP BY doc_id, u.token
),
dft AS (SELECT token, COUNT(*) AS df FROM t GROUP BY token),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM d)
"""

_SQL_BITS = (
    "CASE WHEN {c} = 0 THEN 0"
    " ELSE CAST(length(bin(CAST({c} AS BIGINT))) AS BIGINT) END"
)

SQL_TFIDF_TOPK = (
    f"WITH d AS ({_SQL_KEYWORD_DOCS}),"
    + _SQL_TF
    + f"""
, scored AS (
  SELECT t.doc_id, t.token,
         CAST(t.tf * (({_SQL_BITS.format(c="n_docs")})
                      - ({_SQL_BITS.format(c="df")})) AS BIGINT) AS score
  FROM t JOIN dft USING (token) CROSS JOIN nd
)
SELECT doc_id, CAST(rank AS INT) AS rank, token, score
FROM (
  SELECT doc_id, token, score,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""
)

SQL_INVERTED_INDEX = (
    f"WITH d AS ({_SQL_KEYWORD_DOCS}),"
    + _SQL_TF
    + f"""
, ranked AS (
  SELECT token, doc_id, tf,
         CAST(floor((ROW_NUMBER() OVER (PARTITION BY token
                                        ORDER BY doc_id) - 1)
                    / {CHUNK}) AS INT) AS chunk_id
  FROM t
)
SELECT r.token, r.chunk_id,
       CAST(dft.df AS BIGINT) AS df,
       CAST(COUNT(*) AS BIGINT) AS n_chunk,
       string_agg(CAST(r.doc_id AS VARCHAR) || ':' || CAST(r.tf AS VARCHAR),
                  ' ' ORDER BY r.doc_id) AS postings
FROM ranked r JOIN dft ON r.token = dft.token
GROUP BY r.token, r.chunk_id, dft.df
"""
)

QUERIES = {
    "tfidf_topk": q_tfidf_topk,
    "inverted_index": q_inverted_index,
}

ORACLE_SQL = {
    "tfidf_topk": SQL_TFIDF_TOPK,
    "inverted_index": SQL_INVERTED_INDEX,
}
