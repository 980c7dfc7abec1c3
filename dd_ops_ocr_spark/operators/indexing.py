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
  chunk_id = floor(rank/CHUNK), group by (token, chunk_id) — and the
  rank itself is computed WITHOUT a per-token global sort (a plain
  row_number over partitionBy(token) would funnel the whole posting
  list through one window task, re-creating the pathology one stage
  earlier). Instead, the bounded.py treatment: postings bucket by
  doc_id range, per-(token, bucket) counts (one row per bucket) fold
  into cumulative bases, and a bucket-local row_number plus the base
  is the global rank — every data-carrying task is bounded by
  BUCKET_W, and the only per-token window runs over count rows (one
  per bucket; size BUCKET_W to taste: at 10^12 postings and W=10^6
  that window sees 10^6 rows, not 10^12). Chunk boundaries remain
  sorted doc_id ranges, so a reader streams chunks in order. Posting
  lists are serialized "doc:tf" strings — the segment-file shape, and
  robust to engine array-representation drift in the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dd_ops_ocr_spark.operators.classify import _SQL_BITS, _bits, _tokens

TOP_K = 3
CHUNK = 8  # small so the oracled corpus exercises multi-chunk tokens
# posting-rank bucket width (doc_id range per bucket). Small here so the
# oracled corpus crosses bucket boundaries mid-chunk (the carry-in path);
# at 10^12 postings size it so n_postings/bucket_width fits a window task
BUCKET_W = 64


def _doc_token_tf(docs: DataFrame) -> DataFrame:
    occ = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    return occ.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))


def tfidf_topk(docs: DataFrame, k: int = TOP_K) -> DataFrame:
    """Top-k (doc_id, rank, token, score) per doc by tf * idf_bits,
    deterministic tiebreak (score desc, token asc). Docs whose every
    token scores 0 still emit their k alphabetically-first tokens (rows
    derive from the token stream, so zero SCORES never drop a doc) —
    but a doc with zero TOKENS (empty/whitespace-only text) emits
    nothing, identically in both engines; callers needing every doc_id
    anchored regardless re-join the base doc set, the nb_score pattern
    (classify.py)."""
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


def inverted_index(
    docs: DataFrame, chunk: int = CHUNK, bucket_width: int = BUCKET_W
) -> DataFrame:
    """(token, chunk_id, df, n_chunk, postings) — postings is the
    serialized "doc:tf doc:tf ..." run for this chunk, doc_ids ascending
    within and across chunks; df rides every row so a reader needs no
    second lookup.

    The per-token posting rank is two-phase so no task ever holds a hot
    token's full list (module docstring): doc_id range-buckets keep
    bucket order == doc_id order, so bucket-local rank + the cumulative
    count of earlier buckets IS the global rank — bit-identical to the
    oracle's single ROW_NUMBER, which only has to be correct, not
    bounded. Data-carrying tasks are bounded by ``bucket_width`` (per
    token); the cumulative-base window sees one COUNT row per bucket."""
    tf = _doc_token_tf(docs)
    tf_b = tf.withColumn(
        "b", F.expr(f"doc_id div {int(bucket_width)}")
    )
    counts = tf_b.groupBy("token", "b").agg(F.count("*").alias("n_b"))
    w_base = (
        Window.partitionBy("token").orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = counts.select(
        "token", "b",
        F.coalesce(F.sum("n_b").over(w_base), F.lit(0)).alias("base"),
    )
    w_local = Window.partitionBy("token", "b").orderBy("doc_id")
    ranked = (
        tf_b.join(base, ["token", "b"])
        .withColumn(
            "chunk_id",
            F.floor(
                (F.col("base") + F.row_number().over(w_local) - 1) / chunk
            ).cast("int"),
        )
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


TOP_K_Q = 5
BM25_QUANT = 1_000_000


def bm25_topk(
    docs: DataFrame, queries: DataFrame, k: int = TOP_K_Q
) -> DataFrame:
    """Ranked retrieval: top-k (query_id, rank, doc_id, score) per
    query under BM25 (k1=1.2, b=0.75), integer-exact across engines.

    The standard form per query term,

        idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)),

    is floats three ways (log idf, avgdl division, score summation
    order). All three are removed without changing the ranking
    function's shape: idf -> the family's quantized idf_bits
    (bits(N)-bits(df)); k1=6/5 and b=3/4 are rationals, and
    avgdl = L/N (L = total corpus tokens), so multiplying the term's
    numerator and denominator by 10*L clears every fraction:

        term = idf_bits * (22*L*tf*QUANT) div (10*L*tf + 3*L + 9*dl*N)

    — pure int64, and the per-doc sum of integer terms is
    order-independent, so the driver hash gate is meaningful.
    Headroom: 22*L*tf*QUANT must stay under 2^63, i.e. L*tf < ~4e11 —
    fine for any oracle-checked slice; at 10^12-token corpora drop
    QUANT (the div just loses trailing digits) or let scores go
    double, where cross-engine bit-equality is no longer the contract.

    Scale shape: one (doc_id, token) hash agg; dl and (L, N) derive
    from that SAME aggregate (no second corpus pass); the query-term
    table is request-sized -> explicit broadcast against the tf
    stream (the model-side rule, classify.py); one (query_id, doc_id)
    agg; one per-query window for the cut. Docs sharing no term with
    a query never materialize — the posting-intersection sparsity
    BM25 engines rely on."""
    tf = _doc_token_tf(docs)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_tok = tf.groupBy("token").agg(F.count("*").alias("df"))
    totals = tf.agg(
        F.sum("tf").alias("corpus_len"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    idf = F.greatest(
        _bits(F.col("n_docs")) - _bits(F.col("df")), F.lit(0)
    )
    term = (
        tf.join(F.broadcast(queries.select("query_id", "token")), "token")
        .join(F.broadcast(df_tok), "token")
        # dl is doc-count-sized (data-dependent, NOT the bounded model
        # side): unhinted — AQE broadcasts it only when it truly is
        # small; at 10^12 docs this is a correct doc_id hash join
        # between the matched-posting stream and the length table
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select(
            "query_id",
            "doc_id",
            (
                idf
                * F.expr(
                    f"(22 * corpus_len * tf * CAST({BM25_QUANT} AS BIGINT)) div "
                    "(10 * corpus_len * tf + 3 * corpus_len + 9 * dl * n_docs)"
                )
            ).cast("long").alias("term_score"),
        )
    )
    scored = term.groupBy("query_id", "doc_id").agg(
        F.sum("term_score").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            "score",
        )
    )


KWIC_WIDTH = 24


def kwic_snippets(
    docs: DataFrame, queries: DataFrame, width: int = KWIC_WIDTH
) -> DataFrame:
    """(query_id, doc_id, pos, snippet): the display half of retrieval
    — a ±width character context window around the FIRST occurrence of
    each query term in each matching doc (keyword-in-context). Char-
    level containment by design (instr), so 'topic1' also surfaces
    inside 'topic10' — stated, deterministic, and identical in both
    engines; token-exact matching is the inverted index's job, and a
    ranked pipeline composes bm25_topk -> kwic_snippets.

    Plan note: the contains-condition join is a BroadcastNestedLoopJoin
    against the REQUEST-sized query table — each corpus row evaluates
    |queries| instr calls in one scan, which is the right plan for ad-
    hoc terms; for standing term sets, generate candidates through
    `inverted_index` instead and this becomes an equi-join."""
    pos = F.instr(F.col("text"), F.col("token"))
    start = F.greatest(F.lit(1), pos - width)
    snip_len = pos - start + F.length("token") + width
    return docs.join(F.broadcast(queries), pos > 0).select(
        "query_id",
        "doc_id",
        pos.cast("long").alias("pos"),
        F.col("text").substr(start, snip_len).alias("snippet"),
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


def _bm25_queries(spark: SparkSession) -> DataFrame:
    """10 two-term retrieval requests over the planted keyword space:
    query m = (topic_m, niche_{7m mod 200}). Query 0's two term sets
    intersect (doc_id % 200 == 0 docs match both), so the per-doc SUM
    across terms is exercised, not just single-term scoring."""
    rows = [(m, f"topic{m}") for m in range(10)] + [
        (m, f"niche{(m * 7) % 200}") for m in range(10)
    ]
    return spark.createDataFrame(rows, "query_id int, token string")


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk(_docs_with_keywords(spark, sf_dir), _bm25_queries(spark))


def q_kwic_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kwic_snippets(
        _docs_with_keywords(spark, sf_dir), _bm25_queries(spark)
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

_SQL_BM25_QUERIES = """
  SELECT CAST(m AS INT) AS query_id, 'topic' || CAST(m AS VARCHAR) AS token
  FROM range(10) r(m)
  UNION ALL
  SELECT CAST(m AS INT), 'niche' || CAST((m * 7) % 200 AS VARCHAR)
  FROM range(10) r(m)
"""

SQL_BM25_TOPK = (
    f"WITH d AS ({_SQL_KEYWORD_DOCS}),"
    + _SQL_TF
    + f"""
, q AS ({_SQL_BM25_QUERIES}),
dlt AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM t GROUP BY doc_id),
tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS corpus_len,
               COUNT(DISTINCT doc_id) AS n_docs FROM t),
term AS (
  SELECT q.query_id, t.doc_id,
         CAST(GREATEST(({_SQL_BITS.format(c="n_docs")})
                       - ({_SQL_BITS.format(c="df")}), 0)
              * ((22 * corpus_len * t.tf * {BM25_QUANT})
                 // (10 * corpus_len * t.tf + 3 * corpus_len
                     + 9 * dlt.dl * n_docs)) AS BIGINT) AS term_score
  FROM t JOIN q USING (token) JOIN dft USING (token)
       JOIN dlt USING (doc_id) CROSS JOIN tot
)
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
FROM (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM (SELECT query_id, doc_id, CAST(SUM(term_score) AS BIGINT) AS score
        FROM term GROUP BY query_id, doc_id)
)
WHERE rank <= {TOP_K_Q}
"""
)

SQL_KWIC_SNIPPETS = (
    f"WITH d AS ({_SQL_KEYWORD_DOCS}), q AS ({_SQL_BM25_QUERIES})"
    + f"""
SELECT q.query_id, d.doc_id,
       CAST(strpos(d.text, q.token) AS BIGINT) AS pos,
       substring(
         d.text,
         GREATEST(1, strpos(d.text, q.token) - {KWIC_WIDTH}),
         strpos(d.text, q.token)
           - GREATEST(1, strpos(d.text, q.token) - {KWIC_WIDTH})
           + length(q.token) + {KWIC_WIDTH}
       ) AS snippet
FROM d JOIN q ON strpos(d.text, q.token) > 0
"""
)

QUERIES = {
    "tfidf_topk": q_tfidf_topk,
    "inverted_index": q_inverted_index,
    "bm25_topk": q_bm25_topk,
    "kwic_snippets": q_kwic_snippets,
}

ORACLE_SQL = {
    "tfidf_topk": SQL_TFIDF_TOPK,
    "inverted_index": SQL_INVERTED_INDEX,
    "bm25_topk": SQL_BM25_TOPK,
    "kwic_snippets": SQL_KWIC_SNIPPETS,
}
