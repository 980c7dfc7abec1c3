"""Learned document-quality classifier: multinomial Naive Bayes over
tokens, the shape of the fastText/logistic quality filters the big
training-data pipelines actually run (CCNet's LM filter, GPT-3's
WebText-vs-CommonCrawl classifier, Gopher/FineWeb quality scoring) —
TRAINED inside Spark, no external model artifact.

Why Naive Bayes: its training IS one aggregation (per-token class
counts), so the distributed shape is exactly a wordcount — map-side
partials into a single exchange — and scoring is one broadcast-eligible
join + per-doc sum. A linear/fastText model would need iterative
gradient steps (the bpe_train driver-loop shape); NB gets the same
filter quality on planted-signal corpora with a one-pass plan that
scales to 10^12 docs unchanged.

Engine-exact math, same idiom as lm_familiarity/dsir_weights: log2
class likelihoods quantized to ``length(bin(count))`` = floor(log2)+1
(0 for a zero count), so a token's weight is the INTEGER
bits(count_pos) - bits(count_neg) and a doc's score the integer sum
over its token OCCURRENCES (multinomial: multiplicity counts) plus the
integer class-prior term bits(n_pos_docs) - bits(n_neg_docs). No float
logs, no summation-order hazard, hash-identical in DuckDB.

Train/score split in the oracled queries: fit on the doc_id % 5 != 4
80% slice, score EVERY doc — the held-out fifth demonstrates
generalization, pytest asserts it classifies the plants perfectly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# planted class-signal vocabulary (appended, never replacing content):
# positives read like cited prose, negatives like chum-box spam
POS_MARKERS = "citation references methodology"
NEG_MARKERS = "click casino winner"
N_MARKER_REPEATS = 2


def _tokens(col):
    """Whitespace tokens with empties dropped — THE tokenization every
    integer-exact text family shares (indexing/sessions/passages import
    it from here; a change desynchronizes five families' oracles at
    once, which is the point: one definition, one drift surface)."""
    return F.filter(F.split(col, "[ \n\t]+"), lambda x: x != F.lit(""))


def _bits(c):
    """floor(log2(c)) + 1 for c > 0, else 0 — integer-quantized log."""
    return F.when(c == 0, F.lit(0)).otherwise(F.length(F.bin(c))).cast("long")


def nb_train(labeled: DataFrame) -> DataFrame:
    """(doc_id, text, label:boolean) -> per-token integer weights
    (token, n_pos, n_neg, weight). One hash-agg exchange; token
    occurrences count with multiplicity (multinomial NB).

    The weight is the quantized log P(token|pos)/P(token|neg) in
    Laplace-smoothed CROSS-PRODUCT form:

        bits((n_pos+1) * T_neg) - bits((n_neg+1) * T_pos)

    Two deliberate choices. (1) Products, not bit-length differences:
    bits(a)-bits(T) per class leaves a systematic ±1 on every
    ratio-balanced token (measured 0.92 held-out accuracy — fifty
    body tokens at -1 drown a ±54 marker signal), while the product
    form makes an exactly class-proportional token EXACTLY 0 and was
    measured at 1.00. (2) +1 smoothing keeps a token unseen in one
    class at a bounded ~log2(n*T/T') instead of the raw form's
    unbounded bits(n*T) - bits(0)=0 blowup. The totals ride a 1-row
    broadcast cross join, not a driver collect. int64 products hold
    to T < 3e9 tokens per class; beyond that lift the multiply to
    decimal(38,0)/HUGEINT (the sample_stratified precedent)."""
    toks = labeled.select(
        "label", F.explode(_tokens(F.col("text"))).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.col("label").cast("long")).alias("n_pos"),
        F.sum((~F.col("label")).cast("long")).alias("n_neg"),
    )
    # totals re-aggregate the VOCABULARY-SIZED counts table, not the
    # corpus-sized token stream — one token pass, not two (measured
    # 34.1 s -> 2.1 s, 16x, at 1.28M docs / 86M tokens: the independent
    # totals branch re-ran the whole explode+agg with no exchange reuse)
    totals = counts.agg(
        F.sum("n_pos").alias("t_pos"),
        F.sum("n_neg").alias("t_neg"),
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "token",
        "n_pos",
        "n_neg",
        (
            _bits((F.col("n_pos") + 1) * F.col("t_neg"))
            - _bits((F.col("n_neg") + 1) * F.col("t_pos"))
        ).alias("weight"),
    )


def nb_score(docs: DataFrame, weights: DataFrame, prior: int) -> DataFrame:
    """Score every doc: integer sum of token-occurrence weights plus the
    class-prior term. Tokens unseen in training contribute 0 (left
    join).

    The weights join is EXPLICITLY broadcast, deliberately breaking the
    repo's unhinted-join default: unhinted, Catalyst plans SortMergeJoin
    (the weights side hangs off an aggregate, so its size estimate is
    conservative) and AQE cannot help — both SMJ sides must materialize
    their shuffles before AQE re-plans, so the corpus-sized occurrence
    stream gets shuffle-WRITTEN by token either way (measured: 241 s for
    the join+agg at 5.12M docs / 345M occurrences on 8 cores; broadcast
    removes that shuffle entirely). The unhinted policy is right when
    the small side is data-dependent (decontaminate's eval set); here
    the small side is the MODEL, bounded by design — a weight table too
    big to broadcast is a different operator."""
    occ = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    scored = (
        occ.join(F.broadcast(weights.select("token", "weight")), "token", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("weight"), F.lit(0))).alias("w_sum"))
    )
    # docs whose every token is unseen (or with zero tokens) must still
    # surface — re-anchor on the input set
    base = docs.select("doc_id")
    out = base.join(scored, "doc_id", "left")
    score = F.coalesce(F.col("w_sum"), F.lit(0)) + F.lit(prior)
    return out.select(
        "doc_id",
        score.cast("long").alias("score"),
        (score > 0).alias("predicted"),
    )


# ------------------------------------------------------------- oracled corpus


def _labeled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planted-signal corpus: label = (doc_id % 3 == 0); positives get
    POS_MARKERS appended N_MARKER_REPEATS times, negatives NEG_MARKERS —
    separable by construction, so a correct NB must classify the
    held-out fifth perfectly."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    label = F.pmod("doc_id", F.lit(3)) == 0
    markers = F.when(
        label, F.lit((" " + POS_MARKERS) * N_MARKER_REPEATS)
    ).otherwise(F.lit((" " + NEG_MARKERS) * N_MARKER_REPEATS))
    return d.select(
        "doc_id", F.concat(F.col("text"), markers).alias("text"), label.alias("label")
    )


def _train_slice(labeled: DataFrame) -> DataFrame:
    return labeled.filter(F.pmod("doc_id", F.lit(5)) != 4)


def q_quality_nb_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nb_train(_train_slice(_labeled_docs(spark, sf_dir)))


def q_quality_nb_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    labeled = _labeled_docs(spark, sf_dir)
    train = _train_slice(labeled)
    # the prior is two scalar doc counts off the bounded train slice —
    # a driver-side first(), not a per-row collect
    n_pos, n_neg = train.select(
        F.sum(F.col("label").cast("long")),
        F.sum((~F.col("label")).cast("long")),
    ).first()
    prior = (n_pos.bit_length() if n_pos else 0) - (
        n_neg.bit_length() if n_neg else 0
    )
    return nb_score(labeled.select("doc_id", "text"), nb_train(train), prior)


_SQL_LABELED = f"""
  SELECT doc_id,
         text || CASE WHEN doc_id % 3 = 0
                      THEN repeat(' {POS_MARKERS}', {N_MARKER_REPEATS})
                      ELSE repeat(' {NEG_MARKERS}', {N_MARKER_REPEATS}) END
           AS text,
         doc_id % 3 = 0 AS label
  FROM documents
"""

_SQL_BITS = (
    "CASE WHEN {c} = 0 THEN 0"
    " ELSE CAST(length(bin(CAST({c} AS BIGINT))) AS BIGINT) END"
)

_SQL_WEIGHTS = f"""
t AS (
  SELECT label, u.token
  FROM d, UNNEST(list_filter(regexp_split_to_array(text, '[ \n\t]+'),
                             x -> x <> '')) AS u(token)
  WHERE doc_id % 5 <> 4
),
w AS (
  SELECT token,
         CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS n_neg
  FROM t GROUP BY token
),
tot AS (
  SELECT CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS t_pos,
         CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS t_neg
  FROM t
),
wt AS (
  SELECT token, n_pos, n_neg,
         ({_SQL_BITS.format(c="(n_pos + 1) * t_neg")})
         - ({_SQL_BITS.format(c="(n_neg + 1) * t_pos")})
           AS weight
  FROM w CROSS JOIN tot
)
"""

SQL_QUALITY_NB_TRAIN = (
    f"WITH d AS ({_SQL_LABELED}),"
    + _SQL_WEIGHTS
    + "SELECT token, n_pos, n_neg, CAST(weight AS BIGINT) AS weight FROM wt"
)

SQL_QUALITY_NB_SCORE = (
    f"WITH d AS ({_SQL_LABELED}),"
    + _SQL_WEIGHTS
    + f"""
, prior AS (
  SELECT ({_SQL_BITS.format(c="np")}) - ({_SQL_BITS.format(c="nn")}) AS p
  FROM (SELECT CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS np,
               CAST(SUM(CASE WHEN label THEN 0 ELSE 1 END) AS BIGINT) AS nn
        FROM d WHERE doc_id % 5 <> 4)
),
occ AS (
  SELECT doc_id, u.token
  FROM d, UNNEST(list_filter(regexp_split_to_array(text, '[ \n\t]+'),
                             x -> x <> '')) AS u(token)
),
s AS (
  SELECT occ.doc_id, SUM(COALESCE(wt.weight, 0)) AS w_sum
  FROM occ LEFT JOIN wt USING (token) GROUP BY occ.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.w_sum, 0) + prior.p AS BIGINT) AS score,
       COALESCE(s.w_sum, 0) + prior.p > 0 AS predicted
FROM d LEFT JOIN s USING (doc_id) CROSS JOIN prior
"""
)

QUERIES = {
    "quality_nb_train": q_quality_nb_train,
    "quality_nb_score": q_quality_nb_score,
}

ORACLE_SQL = {
    "quality_nb_train": SQL_QUALITY_NB_TRAIN,
    "quality_nb_score": SQL_QUALITY_NB_SCORE,
}
