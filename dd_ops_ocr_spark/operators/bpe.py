"""Distributed BPE vocabulary training + tokenization.

The missing half of token accounting: ``token_count`` (textstats.py)
counts under a FIXED regex tokenizer; these two queries LEARN a byte-
pair-encoding merge table from the corpus and tokenize under it — the
vocabulary-construction step every LLM training pipeline runs before
any token budget means anything.

Architecture (the MLlib shape for globally-coupled iterative state):

- ``bpe_train``: word counting is the ONLY corpus-scale stage — one
  exchange with map-side partials (classic wordcount), then the
  vocabulary is bounded to the top-V words by (count DESC, word ASC) —
  the frequency cutoff every practical BPE trainer applies. That
  bounded state (V rows, V=4096 here) is collected ONCE and the merge
  loop runs driver-local in pure Python: each BPE iteration's argmax is
  a global scalar decision over ~V·avg_len pair counts, and shipping V
  aggregated rows once beats K tiny distributed jobs whose argmax must
  round-trip through the driver anyway (same pattern as MLlib's
  treeAggregate → driver update per iteration). At 100 TB only the word
  count touches the corpus; V and K are constants.

- ``bpe_tokenize``: the learned merges are baked into the PLAN as
  literal ``replace()`` chains over comma-separated symbol strings —
  a pure per-row projection: zero joins, zero exchanges, zero
  broadcasts (plan-asserted in tests/test_plan_shape.py).

Cross-engine exactness: a word is represented as ``,s1,s2,...,sn,``
(symbols never empty, so ``,,`` never occurs and commas only ever
separate symbols). Applying merge (l, r) is the plain string
``replace(s, ',l,r,', ',lr,')`` — non-regex ``replace`` is left-to-
right non-overlapping in Spark, DuckDB and Python alike, which IS the
BPE merge-application order (a token minted at position i cannot be
re-used as the left side of a match in the same pass because the
pattern requires ``,l,`` and ``lr != l``). All outputs are integers —
counts and a ``*_x1000`` integer-division ratio — so the DuckDB oracle
(which restates the whole K-iteration loop as chained CTEs with scalar
subqueries) hash-matches bit-exactly.

Reference intent: the reference counts/normalizes extracted text per
page before LLM calls (src/modules/step2 aggregation; SURVEY §2.7
C14/C16 token accounting family); vocabulary learning generalizes that
to the training-data regime this engine targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_BPE_V = 4096  # vocabulary cap: top-V words feed the merge loop
_BPE_K = 8     # number of merges learned


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_WORDS_EXPR = "regexp_extract_all(lower(text), '[a-z]+', 0)"


def word_counts(
    spark: SparkSession, sf_dir: str, v: int | None = None
) -> DataFrame:
    """Top-V (count DESC, word ASC) word frequencies — the one
    corpus-scale stage: explode → hash-agg with partials → TakeOrdered
    (the driver holds V rows, never the word stream)."""
    v = _BPE_V if v is None else v
    return (
        _docs(spark, sf_dir)
        .select(F.explode(F.expr(_WORDS_EXPR)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(v)
    )


def learn_bpe(
    pairs: list[tuple[str, int]], k: int | None = None
) -> list[tuple[int, str, str, str, int]]:
    """Pure-Python BPE merge learning over (word, count) rows.

    Deterministic: argmax pair by (count DESC, (lhs, rhs) ASC); merge
    applied left-to-right non-overlapping. Returns up to k rows of
    (merge_rank, lhs, rhs, merged, pair_count); stops early if no
    adjacent pair remains (every word fused to one symbol)."""
    k = _BPE_K if k is None else k
    vocab: list[tuple[list[str], int]] = [(list(w), c) for w, c in pairs]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, k + 1):
        pc: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for i in range(len(syms) - 1):
                key = (syms[i], syms[i + 1])
                pc[key] = pc.get(key, 0) + cnt
        if not pc:
            break
        (lhs, rhs), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, lhs, rhs, lhs + rhs, c))
        nxt: list[tuple[list[str], int]] = []
        for syms, cnt in vocab:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == lhs
                    and syms[i + 1] == rhs
                ):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((out, cnt))
        vocab = nxt
    return merges


def _learn_from_corpus(
    spark: SparkSession, sf_dir: str, v: int | None = None,
    k: int | None = None,
) -> list[tuple[int, str, str, str, int]]:
    rows = word_counts(spark, sf_dir, v).collect()
    return learn_bpe([(r["w"], r["cnt"]) for r in rows], k)


_MERGE_SCHEMA = (
    "merge_rank INT, lhs STRING, rhs STRING, merged STRING,"
    " pair_count BIGINT"
)


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned merge table: K rows (merge_rank, lhs, rhs, merged,
    pair_count), the artifact a tokenizer-training job publishes."""
    merges = _learn_from_corpus(spark, sf_dir)
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def _word_sep(wcol):
    """',t,h,e,' comma-separated symbol string for a word column."""
    return F.concat(F.lit(","), F.regexp_replace(wcol, "(.)", "$1,"))


def _token_count_expr(wcol, merges):
    """Tokens in one word after applying the merge chain: the merges
    are LITERALS here — the whole thing is a codegen'd projection."""
    s = _word_sep(wcol)
    for _, lhs, rhs, merged, _ in merges:
        s = F.replace(
            s, F.lit(f",{lhs},{rhs},"), F.lit(f",{merged},")
        )
    n_commas = F.length(s) - F.length(F.replace(s, F.lit(","), F.lit("")))
    return (n_commas - F.lit(1)).cast("long")


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token accounting under the learned BPE vocabulary:
    n_words / n_chars / n_tokens / compression_x1000 (chars-per-token
    ×1000, integer division). The scoring pass is a zero-exchange
    projection; the learn step runs once up front (see module doc)."""
    merges = _learn_from_corpus(spark, sf_dir)
    d = _docs(spark, sf_dir).select(
        "doc_id", F.expr(_WORDS_EXPR).alias("words")
    )
    zero = F.lit(0).cast("long")
    return d.select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        F.aggregate(
            "words", zero, lambda a, w: a + F.length(w).cast("long")
        ).alias("n_chars"),
        F.aggregate(
            "words", zero, lambda a, w: a + _token_count_expr(w, merges)
        ).alias("n_tokens"),
    ).select(
        "doc_id",
        "n_words",
        "n_chars",
        "n_tokens",
        F.expr(
            "CAST(CASE WHEN n_tokens = 0 THEN 0"
            " ELSE n_chars * 1000 DIV n_tokens END AS BIGINT)"
        ).alias("compression_x1000"),
    )


# ------------------------------------------------------- DuckDB oracle
#
# The oracle restates the ENTIRE training loop as K chained CTE triples
# (p_i pair counts, m_i argmax, v_i merge applied via scalar
# subqueries); coalesce guards keep replace() total when an m_i is
# empty (',,' can never match — symbols are non-empty).

_SQL_WORDS = "regexp_extract_all(lower(text), '[a-z]+')"
_SQL_SEP = "',' || regexp_replace({w}, '(.)', '\\1,', 'g')"


def _sql_chain(v: int = _BPE_V, k: int = _BPE_K) -> str:
    parts = [
        f"""w0 AS MATERIALIZED (
  SELECT w, COUNT(*)::BIGINT AS cnt
  FROM (SELECT unnest({_SQL_WORDS}) AS w FROM documents)
  GROUP BY w ORDER BY cnt DESC, w LIMIT {v}
)""",
        f"v0 AS MATERIALIZED (SELECT {_SQL_SEP.format(w='w')} AS s, cnt FROM w0)",
    ]
    for i in range(1, k + 1):
        parts.append(f"""p{i} AS MATERIALIZED (
  SELECT sy[CAST(t.i AS INT)] AS lhs, sy[CAST(t.i AS INT) + 1] AS rhs,
         SUM(cnt)::BIGINT AS c
  FROM (SELECT list_filter(string_split(s, ','), x -> x <> '') AS sy,
               cnt FROM v{i - 1}) AS q,
       UNNEST(range(1, len(sy))) AS t(i)
  GROUP BY lhs, rhs
)""")
        parts.append(
            f"m{i} AS MATERIALIZED (SELECT {i} AS merge_rank, lhs, rhs,"
            f" lhs || rhs AS merged, c AS pair_count FROM p{i}"
            f" ORDER BY c DESC, lhs, rhs LIMIT 1)"
        )
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT replace(s,"
            f" coalesce((SELECT ',' || lhs || ',' || rhs || ','"
            f" FROM m{i}), ',,'),"
            f" coalesce((SELECT ',' || merged || ',' FROM m{i}), ','))"
            f" AS s, cnt FROM v{i - 1})"
        )
    return ",\n".join(parts)


def _sql_apply(col: str, k: int = _BPE_K) -> str:
    s = col
    for i in range(1, k + 1):
        s = (
            f"replace({s},"
            f" coalesce((SELECT ',' || lhs || ',' || rhs || ','"
            f" FROM m{i}), ',,'),"
            f" coalesce((SELECT ',' || merged || ',' FROM m{i}), ','))"
        )
    return s


SQL_BPE_TRAIN = f"""
WITH {_sql_chain()}
SELECT CAST(merge_rank AS INT) AS merge_rank, lhs, rhs, merged,
       pair_count
FROM ({" UNION ALL ".join(f"SELECT * FROM m{i}"
                          for i in range(1, _BPE_K + 1))})
ORDER BY merge_rank
"""

SQL_BPE_TOKENIZE = f"""
WITH {_sql_chain()},
dw AS MATERIALIZED (
  SELECT doc_id, {_SQL_WORDS} AS ws FROM documents
), pw AS MATERIALIZED (
  SELECT doc_id, length(t.w)::BIGINT AS wlen,
         {_sql_apply(_SQL_SEP.format(w='t.w'))} AS s
  FROM dw, UNNEST(ws) AS t(w)
), agg AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_words,
         SUM(wlen)::BIGINT AS n_chars,
         SUM(length(s) - length(replace(s, ',', '')) - 1)::BIGINT
           AS n_tokens
  FROM pw GROUP BY doc_id
)
SELECT dw.doc_id,
       COALESCE(a.n_words, 0)::BIGINT AS n_words,
       COALESCE(a.n_chars, 0)::BIGINT AS n_chars,
       COALESCE(a.n_tokens, 0)::BIGINT AS n_tokens,
       CAST(CASE WHEN COALESCE(a.n_tokens, 0) = 0 THEN 0
            ELSE (a.n_chars * 1000) // a.n_tokens END AS BIGINT)
         AS compression_x1000
FROM dw LEFT JOIN agg a USING (doc_id)
"""


QUERIES = {
    "bpe_train": q_bpe_train,
    "bpe_tokenize": q_bpe_tokenize,
}

ORACLE_SQL = {
    "bpe_train": SQL_BPE_TRAIN,
    "bpe_tokenize": SQL_BPE_TOKENIZE,
}
