"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All JVM-side expressions built from length/replace/regexp arithmetic so
the DuckDB oracle computes bit-identical values (no floating-point
summation-order hazards: every ratio is a single division of integers).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf string type hints

from pyspark.sql import DataFrame, SparkSession, functions as F

# marker -> language, probed by substring-occurrence counting.
_LANG_MARKERS = [
    ("en", " the "),
    ("de", " der "),
    ("fr", " le "),
    ("es", " el "),
    ("zh", " shi "),
]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _occ(col, marker: str):
    """#occurrences of marker: (len(s) - len(replace(s, m, ''))) / len(m)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language ID heuristic: count per-language marker
    words in ' '+lower(text)+' '; predict the first language (in fixed
    priority order en,de,fr,es,zh) achieving the max count; 'und' if all
    zero. Deterministic tie-break = priority order."""
    d = _docs(spark, sf_dir).select(
        "doc_id", "lang",
        F.concat(F.lit(" "), F.lower("text"), F.lit(" ")).alias("s"),
    )
    for code, marker in _LANG_MARKERS:
        d = d.withColumn(f"c_{code}", _occ(F.col("s"), marker))
    counts = [F.col(f"c_{code}") for code, _ in _LANG_MARKERS]
    best = F.greatest(*counts)
    pred = F.lit("und")
    for code, _ in reversed(_LANG_MARKERS):
        pred = F.when(
            (F.col(f"c_{code}") == best) & (best > 0), code
        ).otherwise(pred)
    return d.select(
        "doc_id",
        "lang",
        *[F.col(f"c_{code}") for code, _ in _LANG_MARKERS],
        pred.alias("pred_lang"),
    )


def _sql_occ(expr: str, marker: str) -> str:
    m = marker.replace("'", "''")
    return (
        f"CAST((LENGTH({expr}) - LENGTH(REPLACE({expr}, '{m}', '')))"
        f" / {len(marker)} AS BIGINT)"
    )


_sql_counts = ",\n         ".join(
    f"{_sql_occ('s', marker)} AS c_{code}" for code, marker in _LANG_MARKERS
)
_sql_best = "GREATEST(" + ", ".join(f"c_{c}" for c, _ in _LANG_MARKERS) + ")"
_sql_pred = "CASE "
for code, _ in _LANG_MARKERS:
    _sql_pred += f"WHEN c_{code} = {_sql_best} AND {_sql_best} > 0 THEN '{code}' "
_sql_pred += "ELSE 'und' END"

SQL_LANG_ID = f"""
WITH d AS (
  SELECT doc_id, lang, ' ' || LOWER(text) || ' ' AS s FROM documents
), c AS (
  SELECT doc_id, lang,
         {_sql_counts}
  FROM d
)
SELECT doc_id, lang, c_en, c_de, c_fr, c_es, c_zh,
       {_sql_pred} AS pred_lang
FROM c
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, space/punct counts, word count, mean word
    length, stopword ratio — the standard pretraining-corpus filters
    (C4/Gopher-style rules), all integer-derived so engine-portable."""
    d = _docs(spark, sf_dir).select("doc_id", F.col("text").alias("t"))
    n = F.length("t")
    spaces = n - F.length(F.replace(F.col("t"), F.lit(" "), F.lit("")))
    dots = n - F.length(F.replace(F.col("t"), F.lit("."), F.lit("")))
    commas = n - F.length(F.replace(F.col("t"), F.lit(","), F.lit("")))
    words = spaces + 1
    the_cnt = _occ(
        F.concat(F.lit(" "), F.lower("t"), F.lit(" ")), " the "
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_chars"),
        words.cast("long").alias("n_words"),
        ((dots + commas).cast("double") / n).alias("punct_ratio"),
        ((n - spaces).cast("double") / words).alias("mean_word_len"),
        (the_cnt.cast("double") / words).alias("stopword_ratio"),
        (
            (n >= 50)
            & ((dots + commas).cast("double") / n < 0.1)
            & ((n - spaces).cast("double") / words < 12.0)
        ).cast("int").alias("passes_quality"),
    )


SQL_QUALITY_SCORE = """
WITH d AS (
  SELECT doc_id, text AS t,
         LENGTH(text) AS n,
         LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS spaces,
         LENGTH(text) - LENGTH(REPLACE(text, '.', '')) AS dots,
         LENGTH(text) - LENGTH(REPLACE(text, ',', '')) AS commas,
         CAST((LENGTH(' ' || LOWER(text) || ' ')
               - LENGTH(REPLACE(' ' || LOWER(text) || ' ', ' the ', '')))
              / 5 AS BIGINT) AS the_cnt
  FROM documents
)
SELECT doc_id, n AS n_chars, spaces + 1 AS n_words,
       CAST(dots + commas AS DOUBLE) / n AS punct_ratio,
       CAST(n - spaces AS DOUBLE) / (spaces + 1) AS mean_word_len,
       CAST(the_cnt AS DOUBLE) / (spaces + 1) AS stopword_ratio,
       CAST(n >= 50
            AND CAST(dots + commas AS DOUBLE) / n < 0.1
            AND CAST(n - spaces AS DOUBLE) / (spaces + 1) < 12.0 AS INT)
         AS passes_quality
FROM d
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens and BPE-ish regex tokens
    (letter runs | digit runs | single non-alnum), per doc and total."""
    d = _docs(spark, sf_dir).filter(F.length("text") > 0)
    ws_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe_tokens = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)
        )
    )
    return d.select(
        "doc_id",
        ws_tokens.cast("long").alias("ws_tokens"),
        bpe_tokens.cast("long").alias("bpe_tokens"),
    )


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       LEN(regexp_split_to_array(TRIM(text), '\s+')) AS ws_tokens,
       LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
         AS bpe_tokens
FROM documents
WHERE LENGTH(text) > 0
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min/max md5 over 8-gram windows (winnowing
    collapsed to global extrema — a rolling-hash fingerprint that is
    stable under concatenation order). Same portable-md5 trick as MinHash."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    grams = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(1, length(text) - 7)),"
                " i -> substring(text, i, 8))"
            )
        ).alias("g"),
    )
    return grams.groupBy("doc_id").agg(
        F.min(F.md5("g")).alias("fp_min"),
        F.max(F.md5("g")).alias("fp_max"),
        F.count("*").alias("n_windows"),
    )


SQL_DOC_FINGERPRINT = """
WITH grams AS (
  SELECT doc_id, md5(substr(text, CAST(t.i AS INT), 8)) AS h
  FROM documents, UNNEST(range(1, GREATEST(1, LENGTH(text) - 7) + 1)) AS t(i)
)
SELECT doc_id, MIN(h) AS fp_min, MAX(h) AS fp_max, COUNT(*) AS n_windows
FROM grams
GROUP BY doc_id
"""


# C4-style repeated-span removal parameters: a span is a window of
# _SPAN_W consecutive words (the corpus has no sentence punctuation, so
# word windows stand in for C4's three-sentence spans); a span is "hot"
# boilerplate when it occurs in >= _SPAN_K distinct documents.
_SPAN_W = 4
_SPAN_K = 3
_EMPTY_INT_ARR = "CAST(array() AS array<int>)"


def _shingle_expr(width: int, with_start: bool = False,
                  hashed: bool = True) -> str:
    """Doc-local word-shingling as ONE higher-order-function expression
    over a pre-split ``ws`` array: explode every consecutive
    ``width``-word window — md5-hashed (join keys) or raw text
    (``hashed=False``, for human-readable counting) — plus its start
    index when ``with_start``. Shared by repeated-span removal,
    decontamination, and heavy-hitter counting so the shingle semantics
    (short-doc empty case, separator, hashing) cannot diverge."""
    gram = f"array_join(slice(ws, i + 1, {width}), ' ')"
    gh = f"md5({gram})" if hashed else gram
    body = f"struct(i AS start, {gh} AS gh)" if with_start else gh
    return (
        f"explode(transform("
        f" CASE WHEN size(ws) >= {width}"
        f"  THEN sequence(0, size(ws) - {width})"
        f"  ELSE {_EMPTY_INT_ARR} END,"
        f" i -> {body}))"
    )


def q_repeated_span_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-corpus repeated-span removal (C4-style dedup): any
    _SPAN_W-word shingle appearing in >= _SPAN_K distinct docs is
    boilerplate; every word covered by a hot shingle occurrence is
    stripped and the doc re-assembled from the surviving words.

    Scale shape: shingling is doc-local (higher-order functions over the
    split array, no word-level explode join); the ONLY big shuffle is
    the shingle-frequency hash-agg (keyed on md5 of the shingle, partial
    aggregation applies). The hot set is tiny (boilerplate is rare) and
    is broadcast back onto the shingle stream; per-doc hot starts are a
    second small agg, and the final strip is again doc-local via
    filter(ws, (w, i) -> ...) with coalesced empty starts. The
    d-to-hot_starts join is left UNHINTED on purpose: at 100 TB most
    docs can carry boilerplate, so the planner/AQE must be free to pick
    shuffle-hash over broadcast there.
    """
    d = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ", -1).alias("ws")
    )
    sh = d.select(
        "doc_id",
        F.expr(_shingle_expr(_SPAN_W, with_start=True)).alias("s"),
    ).select("doc_id", "s.start", "s.gh")
    hot = (
        sh.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= _SPAN_K)
        .select("gh")
    )
    hot_starts = (
        sh.join(F.broadcast(hot), "gh")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("start")).alias("starts"))
    )
    joined = d.join(hot_starts, "doc_id", "left").withColumn(
        "st", F.expr(f"coalesce(starts, {_EMPTY_INT_ARR})")
    )
    kept = F.expr(
        f"filter(ws, (w, i) ->"
        f" NOT exists(st, s -> i >= s AND i <= s + {_SPAN_W - 1}))"
    )
    return joined.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        F.size("st").cast("long").alias("n_hot_spans"),
        (F.size("ws") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("cleaned_text"),
    )


SQL_REPEATED_SPAN_STRIP = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh AS (
  SELECT doc_id, CAST(t.i AS INT) - 1 AS start,
         md5(array_to_string(
           ws[CAST(t.i AS INT):CAST(t.i AS INT) + {_SPAN_W - 1}], ' ')) AS gh
  FROM d, UNNEST(range(1, GREATEST(len(ws) - {_SPAN_W - 1}, 0) + 1)) AS t(i)
), hot AS (
  SELECT gh FROM sh GROUP BY gh
  HAVING COUNT(DISTINCT doc_id) >= {_SPAN_K}
), hotsh AS (
  SELECT s.doc_id, s.start FROM sh s JOIN hot USING (gh)
), cov AS (
  SELECT DISTINCT h.doc_id, h.start + CAST(o.k AS INT) AS idx
  FROM hotsh h, UNNEST(range(0, {_SPAN_W})) AS o(k)
), words AS (
  SELECT doc_id, CAST(t.i AS INT) - 1 AS idx, ws[CAST(t.i AS INT)] AS w
  FROM d, UNNEST(range(1, len(ws) + 1)) AS t(i)
), kept AS (
  SELECT w.doc_id, w.idx, w.w
  FROM words w LEFT JOIN cov c ON w.doc_id = c.doc_id AND w.idx = c.idx
  WHERE c.idx IS NULL
), agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(w, ' ' ORDER BY idx) AS cleaned_text
  FROM kept GROUP BY doc_id
), spans AS (
  SELECT doc_id, COUNT(*) AS n_hot_spans FROM hotsh GROUP BY doc_id
)
SELECT d.doc_id,
       len(d.ws) AS n_words,
       COALESCE(s.n_hot_spans, 0) AS n_hot_spans,
       len(d.ws) - COALESCE(a.n_kept, 0) AS n_removed,
       COALESCE(a.cleaned_text, '') AS cleaned_text
FROM d
LEFT JOIN agg a USING (doc_id)
LEFT JOIN spans s USING (doc_id)
"""


# --------------------------------------------- benchmark decontamination

_DECON_W = 5      # word n-gram width for eval-overlap matching
_EVAL_NIBBLE = "e"  # md5(doc_id) first nibble selecting the eval split


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    _DECON_W-word shingle with the held-out eval split (the md5-selected
    1/16 of the corpus stands in for a benchmark table). The
    train-test-overlap scrub every serious pretraining pipeline runs
    (C4/Gopher/Llama decontamination).

    Scale shape: shingling is doc-local (transform over the split
    array); the eval side collapses to DISTINCT shingle hashes. The
    eval-vs-train join is left UNHINTED: against a real benchmark table
    (tiny next to 100 TB) AQE picks a broadcast join on its own, while
    this md5-split stand-in — 1/16 of the corpus, so its shingle set
    GROWS with the input — must stay eligible for a shuffle join rather
    than being forced through an ever-growing broadcast. The remaining
    shuffle is the per-doc hit count (partial agg applies). Zero-shingle
    docs (< W words) are kept via the left join from the doc table."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.split("text", " ", -1).alias("ws"),
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
         == _EVAL_NIBBLE).alias("is_eval"),
    )
    sh = d.select(
        "doc_id",
        "is_eval",
        F.expr(_shingle_expr(_DECON_W)).alias("gh"),
    )
    eval_sh = (
        sh.filter("is_eval").select("gh").distinct()
        .withColumn("hit", F.lit(1))
    )
    train_hits = (
        sh.filter(~F.col("is_eval"))
        .join(eval_sh, "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_contaminated"),
        )
    )
    return (
        d.filter(~F.col("is_eval"))
        .select("doc_id")
        .join(train_hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long")
             .alias("n_shingles"),
            F.coalesce("n_contaminated", F.lit(0)).cast("long")
             .alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
        )
    )


SQL_DECONTAMINATE = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '{_EVAL_NIBBLE}'
           AS is_eval
  FROM documents
), sh AS (
  SELECT doc_id, is_eval,
         md5(array_to_string(
           ws[CAST(t.i AS INT):CAST(t.i AS INT) + {_DECON_W - 1}], ' ')) AS gh
  FROM d, UNNEST(range(1, GREATEST(len(ws) - {_DECON_W - 1}, 0) + 1)) AS t(i)
), ev AS (
  SELECT DISTINCT gh FROM sh WHERE is_eval
), hits AS (
  SELECT s.doc_id, COUNT(*) AS n_shingles,
         COUNT(e.gh) AS n_contaminated
  FROM sh s LEFT JOIN ev e USING (gh)
  WHERE NOT s.is_eval
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_shingles, 0) AS n_shingles,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       COALESCE(h.n_contaminated, 0) > 0 AS contaminated
FROM d LEFT JOIN hits h USING (doc_id)
WHERE NOT d.is_eval
"""


# ----------------------------------------------------- PII redaction

# Patterns restricted to syntax with IDENTICAL semantics in Java regex
# (Spark) and RE2 (DuckDB): character classes, bounded repetition, \b,
# \d (ASCII in both), no lookaround (RE2 has none), no backrefs.
# Applied in list order — earlier redactions cannot create later
# matches because every replacement token is LETTERS-ONLY: a token
# contributes none of the characters later patterns require (\d, '@',
# '+') and, being all word chars, manufactures no \b against adjacent
# digits (an angle-bracketed token like '<EMAIL>' would: its '>' turns
# 'user@bar.com123456789' into '<EMAIL>123456789' and mints an IDNUM
# match the ORIGINAL text never had, over-reporting the audit counts).
_PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ip", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{3,4}(-\d{1,4})?"),
    ("idnum", r"\b\d{9,}\b"),
]


def _pii_token(name: str) -> str:
    """Letters-only replacement token — see the invariant note above."""
    return name.upper() + "TOKEN"
_EVEN_NIBBLES = ["0", "2", "4", "6", "8", "a", "c", "e"]


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every shareable training
    corpus needs (emails, IPs, phone numbers, long account numbers →
    typed placeholder tokens), with per-category match counts for the
    compliance audit trail.

    The synthetic corpus carries no PII, so the query PLANTS it
    deterministically (md5-nibble-gated per category, value arithmetic
    from doc_id) and the oracle restates the same construction — the
    hash check then pins both the planting and the redaction semantics.
    Counts are taken stage-wise on the text each pattern actually sees,
    so sequential-application semantics are part of the contract.

    Scale shape: pure per-row column expressions (regexp_count /
    regexp_replace are JVM codegen) — zero exchanges, composes in front
    of any shuffle-bearing stage like the repetition filters."""
    d = _docs(spark, sf_dir)
    md = F.md5(F.col("doc_id").cast("string"))

    def gated(i: int, piece):
        return F.when(
            F.substring(md, i, 1).isin(_EVEN_NIBBLES), piece
        ).otherwise(F.lit(""))

    did = F.col("doc_id")
    planted = F.concat(
        F.substring("text", 1, 120),
        gated(1, F.concat(F.lit(" reach user"), did.cast("string"),
                          F.lit("@corp.example.org"))),
        gated(2, F.concat(F.lit(" from 10.0."), (did % 256).cast("string"),
                          F.lit("."), ((did * 7) % 256).cast("string"))),
        gated(3, F.concat(F.lit(" call +1-555-"),
                          F.lpad((did % 10000).cast("string"), 4, "0"))),
        gated(4, F.concat(F.lit(" acct 9"),
                          F.lpad((did % 100000000).cast("string"), 8, "0"))),
    )
    out = d.select("doc_id", planted.alias("t"))
    for name, pat in _PII_PATTERNS:
        out = out.select(
            "doc_id",
            *[c for c in out.columns if c.startswith("n_")],
            F.regexp_count("t", F.lit(pat)).cast("long").alias(f"n_{name}"),
            F.regexp_replace("t", pat, _pii_token(name)).alias("t"),
        )
    return out.select(
        "doc_id",
        *[f"n_{name}" for name, _ in _PII_PATTERNS],
        F.col("t").alias("redacted_text"),
    )


def _sql_pii_tail() -> str:
    """Stage CTEs mirroring the sequential count-then-replace."""
    prev, parts, n_cols = "p", [], []
    for j, (name, pat) in enumerate(_PII_PATTERNS):
        cur = f"s{j}"
        carried = ", ".join(n_cols + [f"len(regexp_extract_all(t, '{pat}'))"
                                      f"::BIGINT AS n_{name}"])
        parts.append(
            f"{cur} AS (SELECT doc_id, {carried},"
            f" regexp_replace(t, '{pat}', '{_pii_token(name)}', 'g') AS t"
            f" FROM {prev})"
        )
        n_cols.append(f"n_{name}")
        prev = cur
    return ", ".join(parts) + (
        f" SELECT doc_id, {', '.join(n_cols)}, t AS redacted_text FROM {prev}"
    )


SQL_PII_REDACT = f"""
WITH p AS (
  SELECT doc_id,
    substring(text, 1, 120)
    || CASE WHEN substring(md5(doc_id::VARCHAR), 1, 1)
              IN ({", ".join(repr(n) for n in _EVEN_NIBBLES)})
        THEN ' reach user' || doc_id::VARCHAR || '@corp.example.org'
        ELSE '' END
    || CASE WHEN substring(md5(doc_id::VARCHAR), 2, 1)
              IN ({", ".join(repr(n) for n in _EVEN_NIBBLES)})
        THEN ' from 10.0.' || (doc_id % 256)::VARCHAR || '.'
             || ((doc_id * 7) % 256)::VARCHAR
        ELSE '' END
    || CASE WHEN substring(md5(doc_id::VARCHAR), 3, 1)
              IN ({", ".join(repr(n) for n in _EVEN_NIBBLES)})
        THEN ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
        ELSE '' END
    || CASE WHEN substring(md5(doc_id::VARCHAR), 4, 1)
              IN ({", ".join(repr(n) for n in _EVEN_NIBBLES)})
        THEN ' acct 9' || lpad((doc_id % 100000000)::VARCHAR, 8, '0')
        ELSE '' END
    AS t
  FROM documents
), {_sql_pii_tail()}
"""


# ----------------------------------- bloom-prefiltered decontamination

_BLOOM_M = 1 << 20  # bloom bits (tests shrink this to force false positives)
_BLOOM_K = 4        # hash functions (double hashing over the md5 halves)


def _bloom_pos_expr(m: int, k: int):
    """k bloom bit positions for a shingle hash ``gh`` (md5 hex), as ONE
    JVM-side array<long> column — Kirsch-Mitzenmacher double hashing
    pos_i = (h1 + i*h2) mod m with h1/h2 drawn from the two md5 halves
    (15 hex digits each = 60 bits, safely inside a signed long; h2 is
    forced odd so the stride cycles the full table when m is a power of
    two). Staying in Column expressions keeps position derivation inside
    whole-stage codegen; only the bitmap probe itself needs Python."""
    h1 = F.pmod(F.conv(F.substring("gh", 1, 15), 16, 10).cast("long"),
                F.lit(m))
    h2 = F.pmod(F.conv(F.substring("gh", 16, 15), 16, 10).cast("long"),
                F.lit(m)).bitwiseOR(F.lit(1))
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)])


def build_bloom_bitmap(pos_df: DataFrame, m: int) -> "np.ndarray":
    """Distributed bloom-bitmap build: each partition folds its position
    arrays into a LOCAL m-bit bitmap (numpy, vectorized bitwise_or.at),
    the driver ORs the per-partition bitmaps together. The collect is
    bounded by #partitions * m/8 bytes — independent of row count — so
    a billion-gram eval set still ships only a few fixed-size bitmaps,
    unlike collecting positions (which grows with the data).
    ``pos_df`` must have a single ``pos: array<long>`` column."""
    import numpy as np
    import pandas as pd

    nbytes = m // 8

    def _bitmaps(it):
        bm = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for pdf in it:
            if not len(pdf):
                continue
            any_rows = True
            p = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in pdf["pos"]]
            )
            np.bitwise_or.at(bm, p >> 3, (1 << (p & 7)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bm": [bm.tobytes()]})

    out = np.zeros(nbytes, dtype=np.uint8)
    for row in pos_df.mapInPandas(_bitmaps, "bm binary").collect():
        out |= np.frombuffer(row.bm, dtype=np.uint8)
    return out


def _bloom_hit_udf(bm_bytes_bc):
    """pandas_udf(boolean): all k positions set in the broadcast bitmap.
    Pure vectorized numpy over the Arrow batch — the only Python in the
    bloom path."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def hit(pos: pd.Series) -> pd.Series:
        if not len(pos):
            return pd.Series(np.zeros(0, dtype=bool))
        bm = np.frombuffer(bm_bytes_bc.value, dtype=np.uint8)
        p = np.vstack([np.asarray(a, dtype=np.int64) for a in pos])
        bits = (bm[p >> 3] >> (p & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    return hit


def q_decontaminate_bloom(
    spark: SparkSession, sf_dir: str,
    m: int = _BLOOM_M, k: int = _BLOOM_K,
) -> DataFrame:
    """Decontamination with a bloom prefilter — SAME output as
    ``decontaminate`` (the oracle is shared), different 100 TB shape:
    the exact formulation shuffles the ENTIRE train-side shingle stream
    through the eval join; here that stream never reaches an exchange.

    Plan: (1) eval shingles fold into a fixed-size bloom bitmap
    (per-partition numpy bitmaps OR'd on the driver — a bounded,
    data-independent collect, same policy as the IVF training sample);
    (2) the train side probes the broadcast bitmap MAP-SIDE and only
    bloom-candidate shingles (true hits + the bounded false-positive
    trickle) enter the exact verification join, whose result is exact
    because blooms have no false negatives; (3) per-doc shingle totals
    come from doc-local length arithmetic, not from aggregating the
    exploded stream. Two jobs by construction (bitmap build, then the
    probe) — inherent to bloom builds, both bounded.

    tests/test_pipeline_ops.py forces m=256 so false positives flood the
    candidate set and asserts the output still hash-matches the exact
    path."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.split("text", " ", -1).alias("ws"),
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
         == _EVAL_NIBBLE).alias("is_eval"),
    )
    sh = d.select(
        "doc_id",
        "is_eval",
        F.expr(_shingle_expr(_DECON_W)).alias("gh"),
    )
    eval_sh = sh.filter("is_eval")
    bitmap = build_bloom_bitmap(
        eval_sh.select(_bloom_pos_expr(m, k).alias("pos")), m
    )
    bc = spark.sparkContext.broadcast(bitmap.tobytes())
    cand = (
        sh.filter(~F.col("is_eval"))
        .withColumn("pos", _bloom_pos_expr(m, k))
        .filter(_bloom_hit_udf(bc)(F.col("pos")))
        .select("doc_id", "gh")
    )
    hits = (
        cand.join(eval_sh.select("gh").distinct(), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        d.filter(~F.col("is_eval"))
        .select(
            "doc_id",
            F.greatest(F.size("ws") - F.lit(_DECON_W - 1), F.lit(0))
             .cast("long").alias("n_shingles"),
        )
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).cast("long")
             .alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ------------------------------------------------- corpus heavy hitters

_TOPK_W = 3    # n-gram width
_TOPK_K = 50   # hitters returned


def q_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide heavy hitters: the _TOPK_K most frequent _TOPK_W-word
    n-grams with occurrence and document counts — the corpus-statistics
    pass behind boilerplate discovery and contamination triage.

    Scale shape: the per-doc gram multiset is collapsed DOC-LOCALLY to
    (gram, occurrences-in-doc) runs before anything shuffles — sort the
    doc's gram array, find run starts, zip consecutive starts into run
    lengths, all as higher-order functions — so the one and only
    exchange is the per-gram hash-agg (sum of local counts + count of
    docs), with map-side partial aggregation on top. A naive
    count + countDistinct(doc_id) would plan a second, full-width
    (gram, doc_id) exchange — the dominant cost at 100 TB;
    test_plan_shape asserts the single-exchange shape. Deterministic
    total order: count desc, then the n-gram text asc as the tie-break,
    so Spark and DuckDB cut the same K rows."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ", -1).alias("ws")
    )
    # sorted grams -> run starts -> (gram, run length) structs, built as
    # chained narrow projections (Spark SQL has no LET binding; the
    # projections collapse into one whole-stage-codegen'd stage). Docs
    # shorter than the window are dropped up front so every array
    # expression below sees size(s) >= 1 (sequence(0, -1) would DESCEND
    # and index out of range, not produce an empty list).
    runs = (
        d.filter(F.expr(f"size(ws) >= {_TOPK_W}"))
        .select(
            F.expr(
                f"array_sort(transform(sequence(0, size(ws) - {_TOPK_W}),"
                f" i -> array_join(slice(ws, i + 1, {_TOPK_W}), ' ')))"
            ).alias("s")
        )
        .select(
            "s",
            F.expr(
                "concat(array(0),"
                " CASE WHEN size(s) = 1 THEN CAST(array() AS array<int>)"
                " ELSE filter(sequence(1, size(s) - 1),"
                "             i -> s[i] != s[i - 1]) END)"
            ).alias("starts"),
        )
        .select(
            F.expr(
                "explode("
                " zip_with(starts,"
                "  concat(slice(starts, 2, size(starts)), array(size(s))),"
                "  (a, b) -> struct(s[a] AS gram, b - a AS occ)))"
            ).alias("run")
        )
        .select("run.gram", "run.occ")
    )
    return (
        runs.groupBy("gram")
        .agg(
            F.sum("occ").alias("occurrences"),
            F.count("*").alias("n_docs"),
        )
        .orderBy(F.desc("occurrences"), F.asc("gram"))
        .limit(_TOPK_K)
    )


SQL_TOPK_NGRAMS = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), grams AS (
  SELECT doc_id,
         array_to_string(
           ws[CAST(t.i AS INT):CAST(t.i AS INT) + {_TOPK_W - 1}], ' ') AS gram
  FROM d, UNNEST(range(1, GREATEST(len(ws) - {_TOPK_W - 1}, 0) + 1)) AS t(i)
)
SELECT gram,
       CAST(COUNT(*) AS BIGINT) AS occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM grams
GROUP BY gram
ORDER BY occurrences DESC, gram ASC
LIMIT {_TOPK_K}
"""


# ------------------------------------------- within-doc repetition stats

# Gopher-inspired admission thresholds (Rae et al. 2021 table A1 family):
# docs above any of these are repetition-pathological (scraped menus,
# keyword stuffing, decode loops) and poison pretraining mixes.
_REP_DUP_LINE_FRAC = 0.30
_REP_DUP_LINE_CHAR_FRAC = 0.20
_REP_TOP2_CHAR_FRAC = 0.20
_REP_DUP5_CHAR_FRAC = 0.15

# The synthetic documents table has no natural within-doc repetition, so
# the query plants some IN SPARK SQL (md5-derived membership, the same
# idiom as the line-dedup boilerplate and quarantine corruption rules):
# ~1/4 of docs get two identical appended lines of a repeated word — a
# worst-case block that moves every one of the four signals at once.
_REP_TAIL_LINE = "buy now " * 7 + "buy now"  # 8x 2-word unit, one line
_REP_TAIL = "\n" + _REP_TAIL_LINE + "\n" + _REP_TAIL_LINE


def _docs_with_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    hx = F.md5(F.col("doc_id").cast("string"))
    hit = F.conv(F.substring(hx, 5, 2), 16, 10).cast("int") % 4 == 0
    return d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(hit, F.lit(_REP_TAIL)).otherwise(F.lit("")),
        ),
    )


_SQL_DOCS_WITH_REPETITION = """
  SELECT doc_id,
         text
         || (CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            5, 2)) AS INT) % 4 = 0
                  THEN {tail} ELSE '' END) AS text
  FROM documents
""".format(
    tail="chr(10) || '{l}' || chr(10) || '{l}'".format(l=_REP_TAIL_LINE)
)


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-doc repetition signals (Gopher-style): duplicate-line
    fraction, duplicate-line character fraction, characters covered by
    the single most frequent word 2-gram, and characters in duplicate
    5-gram occurrences — the complement of the CROSS-doc family
    (repeated_span_strip / line dedup). Duplicate-char fractions count
    occurrences beyond the first of each distinct item (not
    overlap-adjusted; the 5-gram ratio is clamped to 1), stated
    identically in the oracle.

    Scale shape: the entire query is doc-local higher-order-function
    math over split arrays — sort, walk-adjacent, run-length — so the
    plan has ZERO exchanges: scan -> project -> done. At 100 TB this is
    the cheapest possible filter pass, and it composes in front of any
    shuffle-bearing stage for free. Ties for the top 2-gram break by
    the LARGEST gram string under Spark's struct max, mirrored by
    ORDER BY cnt DESC, gram DESC in DuckDB (binary collation both
    sides)."""
    d = _docs_with_repetition(spark, sf_dir).select(
        "doc_id", F.col("text").alias("t"))
    # Every expensive array is bound EXACTLY ONCE via the
    # transform-over-singleton LET idiom (element_at(transform(array(E),
    # v -> body), 1)) and the final struct crosses a Generate barrier,
    # so no multi-referenced alias can be re-inlined by CollapseProject
    # into per-element lambda re-evaluation. Measured honestly (fresh
    # DataFrame per run — Spark 4 returns cached results for a repeated
    # action on the SAME DataFrame object, which poisons naive min-of-N
    # timings): ~24k docs/s on local[32] at 1.28M replicated docs,
    # dominated by interpreted HOF lambda evaluation (~1.3 ms/doc/core
    # for ~54-word docs, mostly array_sort comparators). The codegen'd
    # alternative (explode every gram -> groupBy(doc, gram), three
    # shuffles) measured equal-or-slower (13.3-19.4 s vs 11.4-12.6 s at
    # 64x), so the shuffle-free shape wins on both axes.
    #
    # sorted-adjacent walk: chars in occurrences beyond the first of
    # each distinct item == sum of length(s[i]) where s[i] == s[i-1]
    walk = (
        "CASE WHEN size({s}) < 2 THEN 0L ELSE aggregate("
        " sequence(1, size({s}) - 1), 0L,"
        " (a, j) -> a + IF({s}[j] = {s}[j - 1],"
        "                  CAST(length({s}[j]) AS LONG), 0L)) END"
    )
    sorted_grams = (
        "CASE WHEN size(ws) < {w} THEN CAST(array() AS array<string>)"
        " ELSE array_sort(transform(sequence(0, size(ws) - {w}),"
        "  i -> array_join(slice(ws, i + 1, {w}), ' '))) END"
    )
    # run-length collapse (same machinery as topk_ngrams, kept as an
    # array) -> struct(occ, gram) max = most frequent, gram-desc ties;
    # chars covered = occ * gram length
    top2_body = (
        "element_at(transform(array("
        "  CASE WHEN size(s2) = 0 THEN CAST(array() AS array<int>)"
        "       WHEN size(s2) = 1 THEN array(0)"
        "       ELSE concat(array(0), filter(sequence(1, size(s2) - 1),"
        "                                    k -> s2[k] != s2[k - 1]))"
        "  END), st -> element_at(transform(array("
        "    CASE WHEN size(st) = 0"
        "         THEN CAST(NULL AS struct<occ: int, gram: string>)"
        "         ELSE array_max(zip_with(st,"
        "                concat(slice(st, 2, size(st)), array(size(s2))),"
        "                (a, b) -> struct(b - a AS occ, s2[a] AS gram)))"
        "    END), m -> COALESCE(CAST(m.occ AS LONG)"
        "                        * CAST(length(m.gram) AS LONG), 0L)),"
        "    1)), 1)"
    )
    gram_struct = (
        "element_at(transform(array(split(t, ' ', -1)), ws -> struct("
        f" element_at(transform(array({sorted_grams.format(w=5)}),"
        f"  s5 -> {walk.format(s='s5')}), 1) AS dup5_chars,"
        f" element_at(transform(array({sorted_grams.format(w=2)}),"
        f"  s2 -> {top2_body}), 1) AS top2_chars"
        ")), 1)"
    )
    line_struct = (
        "element_at(transform("
        " array(filter(split(t, '\\n', -1), x -> trim(x) != '')),"
        " ls -> struct("
        "  size(ls) AS n_lines,"
        "  size(array_distinct(ls)) AS n_distinct_lines,"
        "  aggregate(ls, 0L, (a, x) -> a + CAST(length(x) AS LONG))"
        "    AS line_chars,"
        "  element_at(transform(array(array_sort(ls)),"
        f"   sl -> {walk.format(s='sl')}), 1) AS dup_line_chars"
        ")), 1)"
    )
    # Generate (explode of a singleton) is the projection barrier: the
    # frac columns below reference st's FIELDS as plain attributes, so
    # the struct is computed once per row no matter how many outputs
    # read it — and Generate is not an Exchange, the plan stays
    # shuffle-free (test_plan_shape asserts it).
    d = d.select(
        "doc_id",
        F.length("t").cast("long").alias("n_chars"),
        F.explode(F.array(F.expr(
            f"struct({line_struct} AS l, {gram_struct} AS g)"
        ))).alias("st"),
    ).select(
        "doc_id", "n_chars",
        F.col("st.l.n_lines").alias("n_lines"),
        F.col("st.l.n_distinct_lines").alias("n_distinct_lines"),
        F.col("st.l.line_chars").alias("line_chars"),
        F.col("st.l.dup_line_chars").alias("dup_line_chars"),
        F.col("st.g.dup5_chars").alias("dup5_chars"),
        F.col("st.g.top2_chars").alias("top2_chars"),
    )
    n_chars = F.col("n_chars")
    frac = (
        lambda num, den: F.when(den > 0, num.cast("double") / den.cast(
            "double")).otherwise(F.lit(0.0))
    )
    dup_line_frac = frac(
        F.col("n_lines") - F.col("n_distinct_lines"), F.col("n_lines"))
    dup_line_char_frac = frac(F.col("dup_line_chars"), F.col("line_chars"))
    top2_frac = frac(F.col("top2_chars"), n_chars)
    # overlapping duplicate 5-grams each count full length, so the raw
    # ratio can exceed 1 on pathological docs — clamp to keep it a
    # fraction (the 0.15 admission threshold is unaffected)
    dup5_frac = F.least(F.lit(1.0), frac(F.col("dup5_chars"), n_chars))
    return d.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
        top2_frac.alias("top_2gram_char_frac"),
        dup5_frac.alias("dup_5gram_char_frac"),
        (
            (dup_line_frac < _REP_DUP_LINE_FRAC)
            & (dup_line_char_frac < _REP_DUP_LINE_CHAR_FRAC)
            & (top2_frac < _REP_TOP2_CHAR_FRAC)
            & (dup5_frac < _REP_DUP5_CHAR_FRAC)
        ).cast("int").alias("passes_repetition"),
    )


SQL_REPETITION_STATS = f"""
WITH d AS (
  SELECT doc_id, text AS t FROM ({{docs_rep}}) AS docs_rep
), l AS (
  SELECT doc_id, u.line
  FROM d, UNNEST(list_filter(string_split(t, chr(10)),
                             x -> trim(x) <> '')) AS u(line)
), lg AS (
  SELECT doc_id, line, COUNT(*) AS cnt FROM l GROUP BY doc_id, line
), lstats AS (
  SELECT doc_id,
         SUM(cnt) AS n_lines,
         COUNT(*) AS n_distinct_lines,
         SUM(cnt * length(line)) AS line_chars,
         SUM((cnt - 1) * length(line)) AS dup_line_chars
  FROM lg GROUP BY doc_id
), w AS (
  SELECT doc_id, string_split(t, ' ') AS ws FROM d
), g5 AS (
  SELECT doc_id,
         array_to_string(ws[CAST(u.i AS INT):CAST(u.i AS INT) + 4],
                         ' ') AS gram
  FROM w, UNNEST(range(1, GREATEST(len(ws) - 4, 0) + 1)) AS u(i)
), g5stats AS (
  SELECT doc_id, SUM((cnt - 1) * length(gram)) AS dup5_chars
  FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM g5
        GROUP BY doc_id, gram)
  GROUP BY doc_id
), g2 AS (
  SELECT doc_id,
         array_to_string(ws[CAST(u.i AS INT):CAST(u.i AS INT) + 1],
                         ' ') AS gram
  FROM w, UNNEST(range(1, GREATEST(len(ws) - 1, 0) + 1)) AS u(i)
), g2top AS (
  SELECT doc_id, cnt * length(gram) AS top2_chars
  FROM (SELECT doc_id, gram, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY COUNT(*) DESC, gram DESC) AS rn
        FROM g2 GROUP BY doc_id, gram)
  WHERE rn = 1
), j AS (
  SELECT d.doc_id,
         CAST(COALESCE(ls.n_lines, 0) AS BIGINT) AS n_lines,
         COALESCE(ls.n_distinct_lines, 0) AS n_distinct_lines,
         COALESCE(ls.line_chars, 0) AS line_chars,
         COALESCE(ls.dup_line_chars, 0) AS dup_line_chars,
         COALESCE(g5stats.dup5_chars, 0) AS dup5_chars,
         COALESCE(g2top.top2_chars, 0) AS top2_chars,
         length(d.t) AS n_chars
  FROM d
  LEFT JOIN lstats ls USING (doc_id)
  LEFT JOIN g5stats USING (doc_id)
  LEFT JOIN g2top USING (doc_id)
), r AS (
  SELECT doc_id, n_lines,
         CASE WHEN n_lines > 0 THEN CAST(n_lines - n_distinct_lines AS
              DOUBLE) / CAST(n_lines AS DOUBLE) ELSE 0.0 END
           AS dup_line_frac,
         CASE WHEN line_chars > 0 THEN CAST(dup_line_chars AS DOUBLE)
              / CAST(line_chars AS DOUBLE) ELSE 0.0 END
           AS dup_line_char_frac,
         CASE WHEN n_chars > 0 THEN CAST(top2_chars AS DOUBLE)
              / CAST(n_chars AS DOUBLE) ELSE 0.0 END
           AS top_2gram_char_frac,
         CASE WHEN n_chars > 0 THEN LEAST(1.0, CAST(dup5_chars AS DOUBLE)
              / CAST(n_chars AS DOUBLE)) ELSE 0.0 END
           AS dup_5gram_char_frac
  FROM j
)
SELECT doc_id, n_lines, dup_line_frac, dup_line_char_frac,
       top_2gram_char_frac, dup_5gram_char_frac,
       CAST(dup_line_frac < {_REP_DUP_LINE_FRAC}
            AND dup_line_char_frac < {_REP_DUP_LINE_CHAR_FRAC}
            AND top_2gram_char_frac < {_REP_TOP2_CHAR_FRAC}
            AND dup_5gram_char_frac < {_REP_DUP5_CHAR_FRAC}
            AS INT) AS passes_repetition
FROM r
"""


# ------------------------------------------------ deterministic sampling

_SAMPLE_CAP = 220        # target docs kept per language stratum
_HASH_BITS = 60          # 15 md5 hex digits -> unbiased int64 key
_HASH_MOD = 1 << _HASH_BITS


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-threshold stratified sampling: downsample each
    language stratum toward _SAMPLE_CAP docs by keeping docs whose
    60-bit md5 key falls under the stratum's rate — keep iff
    key * n_stratum < CAP << 60 (exact integer compare, no floats).

    This is the scale-correct shape: the per-stratum count is one tiny
    agg broadcast back onto the corpus, and the keep decision is then a
    stateless map — no per-stratum global sort or rank, so a skewed
    stratum (English at 60% of 100 TB) costs nothing extra. Stratum
    sizes land binomially around CAP, the standard trade of
    hash-threshold samplers."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("decimal(38,0)").alias("hkey"),
    )
    counts = d.groupBy("lang").agg(F.count("*").alias("n_stratum"))
    thresh = F.lit(_SAMPLE_CAP).cast("decimal(38,0)") * F.lit(
        _HASH_MOD
    ).cast("decimal(38,0)")
    return (
        d.join(F.broadcast(counts), "lang")
        .filter(F.col("hkey") * F.col("n_stratum").cast("decimal(38,0)")
                < thresh)
        .select("doc_id", "lang")
    )


SQL_SAMPLE_STRATIFIED = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS hkey
  FROM documents
), c AS (
  SELECT lang, COUNT(*) AS n_stratum FROM d GROUP BY lang
)
SELECT d.doc_id, d.lang
FROM d JOIN c USING (lang)
WHERE CAST(d.hkey AS HUGEINT) * c.n_stratum
      < CAST({_SAMPLE_CAP} AS HUGEINT) * {_HASH_MOD}
"""


# --------------------------------------------------- sequence packing

_PACK_BUDGET = 256   # tokens per training sequence
_PACK_BUCKETS = 16   # parallel packing partitions
# seq_id = bucket << _PACK_SHIFT | local bin. 44 bits of bin space =
# 2^44 * _PACK_BUDGET ≈ 4.5e15 tokens per bucket before collision —
# three orders of magnitude above the ~1e12 tokens/bucket a 100 TB
# corpus puts through 16 buckets (a 32-bit shift would overflow there).
_PACK_SHIFT = 44


def _bucket_expr():
    """md5-nibble pack bucket. NB: conv(), not CAST('0x..') — Spark's
    string->int cast does not parse hex (DuckDB's does; the oracles use
    that spelling)."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 2, 2),
               16, 10).cast("int") % _PACK_BUCKETS
    ).alias("bucket")


def _pack(d: DataFrame) -> DataFrame:
    """Shared packing tail over (doc_id, lang?, bucket, tokens): window
    cumsum per bucket -> (seq_id, seq_offset). ONE definition consumed
    by q_sequence_pack and q_corpus_curriculum so the two queries can
    never disagree on sequence assignment."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("tokens").over(w)
    return d.select(
        *d.columns,
        (F.shiftleft(F.col("bucket").cast("long"), _PACK_SHIFT)
         + F.floor((cum - F.col("tokens")) / _PACK_BUDGET)).alias("seq_id"),
        ((cum - F.col("tokens")) % _PACK_BUDGET).alias("seq_offset"),
    )


# the same packing tail in SQL, parameterized on the source relation
# (which must provide doc_id, bucket, tokens, plus any carry columns)
_SQL_PACK_TAIL = f"""
SELECT *,
       CAST(bucket AS BIGINT) * {1 << _PACK_SHIFT}
         + CAST(FLOOR((SUM(tokens) OVER w - tokens) / {_PACK_BUDGET})
                AS BIGINT) AS seq_id,
       CAST((SUM(tokens) OVER w - tokens) % {_PACK_BUDGET} AS BIGINT)
         AS seq_offset
FROM {{src}}
WINDOW w AS (PARTITION BY bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""

def _sql_bucket(col: str = "doc_id") -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({col} AS VARCHAR)), 2, 2))"
        f" AS INT) % {_PACK_BUCKETS}"
    )


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: assign docs to fixed token-budget
    sequences by cumulative fill. Docs are first scattered into
    _PACK_BUCKETS md5 buckets and packed independently per bucket —
    packing is a running sum, and making it bucket-local keeps the
    window partition bounded (a single global pack order would serialize
    100 TB through one partition). seq_id is globally unique:
    (bucket << _PACK_SHIFT) | local bin. A doc straddling a boundary
    starts the next sequence's fill (contiguous-fill approximation, the
    standard distributed packing trade)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        _bucket_expr(),
        F.size(F.split("text", " ", -1)).cast("long").alias("tokens"),
    )
    return _pack(d)


SQL_SEQUENCE_PACK = f"""
WITH d AS (
  SELECT doc_id,
         {_sql_bucket()} AS bucket,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens
  FROM documents
)
""" + _SQL_PACK_TAIL.format(src="d")


# ----------------------------------------------- end-to-end curriculum

def q_corpus_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data curation pipeline as ONE composed DAG —
    the integration proof that the corpus operators chain: quality
    filter -> exact-dedup keep -> benchmark decontamination (eval split
    excluded, contaminated docs dropped) -> stratified downsampling ->
    sequence packing of the survivors. Output: one row per surviving
    doc with its training-sequence assignment.

    Scale shape: each stage keeps its own audited plan (see the
    individual ops); the composition joins only doc_id keep-lists —
    narrow columns, partial-agg-friendly — and the final pack window
    stays bucket-local. The oracle composes the same stages' SQL
    verbatim, so the chained semantics are hash-checked end to end."""
    quality = (
        q_quality_score(spark, sf_dir)
        .filter(F.col("passes_quality") == 1)
        .select("doc_id")
    )
    docs = _docs(spark, sf_dir)
    keepers = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    clean = (
        q_decontaminate(spark, sf_dir)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    surv = (
        q_sample_stratified(spark, sf_dir)
        .join(quality, "doc_id")
        .join(keepers, "doc_id")
        .join(clean, "doc_id")
    )
    d = docs.join(surv.select("doc_id"), "doc_id").select(
        "doc_id",
        "lang",
        _bucket_expr(),
        F.size(F.split("text", " ", -1)).cast("long").alias("tokens"),
    )
    # bucket stays in the output: it is the partition column downstream
    # sequence assembly (jobs/curate_corpus.py) writes by — emitting it
    # beats reverse-engineering it from seq_id
    return _pack(d)


SQL_CORPUS_CURRICULUM = f"""
WITH q AS (
  SELECT doc_id FROM ({{quality}}) WHERE passes_quality = 1
), k AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), dc AS (
  SELECT doc_id FROM ({{decon}}) WHERE NOT contaminated
), sm AS (
  {{sample}}
), surv AS (
  SELECT sm.doc_id, sm.lang
  FROM sm JOIN q USING (doc_id) JOIN k USING (doc_id)
          JOIN dc USING (doc_id)
), d AS (
  SELECT s.doc_id, s.lang,
         {_sql_bucket('s.doc_id')} AS bucket,
         CAST(len(string_split(doc.text, ' ')) AS BIGINT) AS tokens
  FROM surv s JOIN documents doc ON doc.doc_id = s.doc_id
)
""" + _SQL_PACK_TAIL.format(src="d")


_LM_NIBBLE = "a"  # md5(doc_id) first nibble selecting the LM reference split


def q_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality scoring: train a character
    trigram LM on a reference split (the md5-selected 1/16 of the corpus
    stands in for the Wikipedia-style reference CCNet uses), then score
    EVERY doc by its mean quantized log-frequency under that model —
    low-familiarity docs are the gibberish/boilerplate a perplexity
    filter drops.

    All-integer math so the DuckDB oracle is bit-exact (no float log /
    float-summation-order hazards): text is normalized to the bounded
    alphabet [a-z _] (everything else -> '_'), each trigram's score is
    the quantized log2 of its reference count — ``length(bin(c))`` =
    floor(log2(c)) + 1, an exact integer in both engines — and the doc
    score is the integer ratio ``sum_bits * 1000 DIV n_grams``.

    Scale shape: the model vocabulary is BOUNDED BY CONSTRUCTION at
    28^3 = 21,952 grams regardless of corpus size (unlike the
    decontaminate eval split, which grows with the input), so the
    scoring join is a legitimate always-small broadcast at 100 TB and
    is hinted as one. The gram stream itself never reaches an exchange:
    ``explode_outer`` keeps zero-gram docs alive as a NULL-gram row (a
    NULL key matches nothing in the left join, exactly like an unseen
    gram), so no doc-sized backfill join is needed and the per-doc agg
    partials the stream down to ~1 row per doc before its shuffle."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_replace(F.lower("text"), "[^a-z ]", "_").alias("norm"),
        (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
         == _LM_NIBBLE).alias("is_ref"),
    )
    g = d.select(
        "doc_id",
        "is_ref",
        F.explode_outer(
            F.expr(
                "CASE WHEN length(norm) >= 3"
                " THEN transform(sequence(1, length(norm) - 2),"
                "                i -> substring(norm, i, 3))"
                " ELSE array() END"
            )
        ).alias("gr"),
    )
    model = (
        g.filter("is_ref AND gr IS NOT NULL")
        .groupBy("gr")
        .agg(F.count("*").alias("c"))
    )
    return (
        g.join(F.broadcast(model), "gr", "left")
        .groupBy("doc_id")
        .agg(
            F.count("gr").alias("n_grams"),
            F.count("c").alias("n_seen"),
            F.coalesce(
                F.sum(F.length(F.bin("c"))).cast("long"), F.lit(0).cast("long")
            ).alias("sum_bits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_seen",
            "sum_bits",
            F.expr(
                "CAST(CASE WHEN n_grams = 0 THEN 0"
                " ELSE sum_bits * 1000 DIV n_grams END AS BIGINT)"
            ).alias("familiarity_x1000"),
            F.expr(
                "CAST(CASE WHEN n_grams = 0 THEN 0"
                " ELSE n_seen * 1000 DIV n_grams END AS BIGINT)"
            ).alias("coverage_x1000"),
        )
    )


SQL_LM_FAMILIARITY = f"""
WITH d AS (
  SELECT doc_id,
         regexp_replace(lower(text), '[^a-z ]', '_', 'g') AS norm,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '{_LM_NIBBLE}'
           AS is_ref
  FROM documents
), g AS (
  SELECT doc_id, is_ref, substring(norm, CAST(t.i AS INT), 3) AS gr
  FROM d, UNNEST(range(1, LENGTH(norm) - 1)) AS t(i)
  WHERE LENGTH(norm) >= 3
), m AS (
  SELECT gr, COUNT(*) AS c FROM g WHERE is_ref GROUP BY gr
), s AS (
  SELECT doc_id,
         COUNT(*) AS n_grams,
         COUNT(m.c) AS n_seen,
         COALESCE(SUM(LENGTH(BIN(m.c))), 0) AS sum_bits
  FROM g LEFT JOIN m USING (gr)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(s.n_seen, 0) AS BIGINT) AS n_seen,
       CAST(COALESCE(s.sum_bits, 0) AS BIGINT) AS sum_bits,
       CAST(CASE WHEN COALESCE(s.n_grams, 0) = 0 THEN 0
            ELSE (s.sum_bits * 1000) // s.n_grams END AS BIGINT)
         AS familiarity_x1000,
       CAST(CASE WHEN COALESCE(s.n_grams, 0) = 0 THEN 0
            ELSE (s.n_seen * 1000) // s.n_grams END AS BIGINT)
         AS coverage_x1000
FROM d LEFT JOIN s USING (doc_id)
"""


# ------------------------------------------- DSIR importance weighting

_DSIR_BUCKETS = 64  # hashed n-gram feature dimension (the paper uses 10k)


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    score every document by how much its hashed n-gram feature profile
    looks like a TARGET distribution versus the RAW corpus — the
    importance weight log(p_target(x)/p_raw(x)) under a bag-of-hashed-
    n-grams model. Here the target split is the English documents (the
    stand-in for the paper's Wikipedia/books target) and features are
    unigrams + bigrams hashed into _DSIR_BUCKETS buckets.

    Integer-exact cross-engine math, same trick as lm_familiarity: each
    bucket's log-probability is quantized to ``length(bin(count))`` =
    floor(log2)+1 (0 for unseen-in-target), so a doc's weight is the
    INTEGER sum of per-gram (bits_target - bits_raw) — no float logs, no
    summation-order hazard. The hash is arithmetic (length*31 + first
    code point, mod buckets), identical in both engines.

    Scale shape: the bucket distribution is BOUNDED AT 64 ROWS by
    construction regardless of corpus size, so (a) the fit pass's
    groupBy partial-aggregates the gram stream down to <=64 rows per
    task before its shuffle, and (b) the apply pass's scoring join is a
    broadcast. The gram stream itself is never shuffled at doc
    granularity: the only doc-keyed exchange carries one partially-
    aggregated row per doc. Two passes over the grams (fit, then apply)
    is the paper's own structure."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        (F.col("lang") == "en").alias("is_target"),
        F.filter(
            F.split(F.lower("text"), " ", -1), lambda w: w != ""
        ).alias("ws"),
    )
    grams = d.select(
        "doc_id",
        "is_target",
        F.explode(
            F.concat(
                F.col("ws"),
                # sequence(1, 0) is DESCENDING in Spark ([1, 0]); the
                # CASE guard keeps <2-word docs at an empty bigram list
                F.expr(
                    "CASE WHEN size(ws) >= 2"
                    " THEN transform(sequence(1, size(ws) - 1),"
                    "      i -> concat(element_at(ws, i), ' ',"
                    "                  element_at(ws, i + 1)))"
                    " ELSE array() END"
                ),
            )
        ).alias("g"),
    )
    b = (
        (F.length("g") * 31 + F.ascii(F.substring("g", 1, 1)))
        % _DSIR_BUCKETS
    ).cast("int").alias("bucket")
    gb = grams.select("doc_id", "is_target", b)
    bits = lambda c: F.when(c == 0, 0).otherwise(F.length(F.bin(c)))  # noqa: E731
    dist = gb.groupBy("bucket").agg(
        bits(F.count("*")).cast("long").alias("bits_raw"),
        bits(F.sum(F.col("is_target").cast("long"))).cast("long")
        .alias("bits_target"),
    )
    scored = (
        gb.join(F.broadcast(dist), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.col("bits_target") - F.col("bits_raw")).alias("w"),
        )
    )
    return (
        d.select("doc_id", "lang")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("w", F.lit(0)).cast("long").alias("dsir_bits"),
        )
    )


SQL_DSIR_WEIGHTS = f"""
WITH d AS (
  SELECT doc_id, lang, lang = 'en' AS is_target,
         list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
  FROM documents
), grams AS (
  SELECT doc_id, is_target, t.g
  FROM d, UNNEST(list_concat(
      ws,
      list_transform(range(1, len(ws)),
                     i -> ws[CAST(i AS INT)] || ' '
                          || ws[CAST(i AS INT) + 1]))) AS t(g)
), gb AS (
  SELECT doc_id, is_target,
         CAST((LENGTH(g) * 31 + ASCII(SUBSTRING(g, 1, 1)))
              % {_DSIR_BUCKETS} AS INT) AS bucket
  FROM grams
), dist AS (
  SELECT bucket,
         CAST(LENGTH(bin(COUNT(*))) AS BIGINT) AS bits_raw,
         CAST(CASE WHEN SUM(CASE WHEN is_target THEN 1 ELSE 0 END) = 0
              THEN 0
              ELSE LENGTH(bin(SUM(CASE WHEN is_target THEN 1 ELSE 0 END)))
              END AS BIGINT) AS bits_target
  FROM gb GROUP BY bucket
), scored AS (
  SELECT doc_id, COUNT(*) AS n_grams,
         SUM(bits_target - bits_raw) AS w
  FROM gb JOIN dist USING (bucket)
  GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(s.w, 0) AS BIGINT) AS dsir_bits
FROM d LEFT JOIN scored s USING (doc_id)
"""


# -------------------------------------- CCNet head/middle/tail buckets

def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): split each language's documents into head /
    middle / tail terciles by LM score (here the integer-exact
    lm_familiarity score; CCNet uses KenLM perplexity) — the standard
    pretraining recipe trains mostly on head+middle.

    Scale-correct cutoffs: NOT ntile() over a per-language window — that
    would sort an entire language's documents in single window
    partitions (one task per language at 100 TB). Instead the tercile
    cut VALUES come from the score histogram: groupBy(lang, score) is
    partial-agg-friendly and BOUNDED (score domain is [0, ~16000] by
    construction), the cumulative window runs over that tiny table, and
    bucketing is a map-side comparison against the broadcast per-lang
    cutoffs. Ties at a cutoff bucket by VALUE (all equal scores share a
    bucket), which keeps the split deterministic without any per-doc
    total order. This is CCNet's own structure (percentile thresholds
    computed once, then applied map-side)."""
    from pyspark.sql import Window

    fam = q_lm_familiarity(spark, sf_dir).select(
        "doc_id", "familiarity_x1000"
    )
    # NULL lang (unidentified language) must still land in a bucket:
    # a null-rejecting equi-join on lang would silently DROP those docs
    # (the cutoff row groups fine, the join-back never matches), so the
    # grouping key is coalesced to a sentinel in both engines
    d = _docs(spark, sf_dir).select(
        "doc_id", F.coalesce("lang", F.lit("__und__")).alias("lang")
    ).join(fam, "doc_id")
    dist = d.groupBy("lang", "familiarity_x1000").agg(
        F.count("*").alias("c")
    )
    wcum = (
        Window.partitionBy("lang")
        .orderBy("familiarity_x1000")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = (
        Window.partitionBy("lang")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = dist.select(
        "lang",
        "familiarity_x1000",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wtot).alias("tot"),
    )
    cuts = cum.groupBy("lang").agg(
        F.min(
            F.when(F.col("cum") * 3 >= F.col("tot"), F.col("familiarity_x1000"))
        ).alias("cut_tail"),
        F.min(
            F.when(
                F.col("cum") * 3 >= 2 * F.col("tot"), F.col("familiarity_x1000")
            )
        ).alias("cut_mid"),
    )
    return d.join(F.broadcast(cuts), "lang").select(
        "doc_id",
        "lang",
        "familiarity_x1000",
        F.when(F.col("familiarity_x1000") <= F.col("cut_tail"), "tail")
        .when(F.col("familiarity_x1000") <= F.col("cut_mid"), "middle")
        .otherwise("head")
        .alias("bucket"),
    )


def _sql_ccnet(fam_sql: str) -> str:
    return f"""
WITH fam AS (
  SELECT doc_id, familiarity_x1000 FROM ({fam_sql})
), dd AS (
  SELECT doc.doc_id, coalesce(doc.lang, '__und__') AS lang,
         f.familiarity_x1000
  FROM documents doc JOIN fam f ON f.doc_id = doc.doc_id
), dist AS (
  SELECT lang, familiarity_x1000, COUNT(*) AS c
  FROM dd GROUP BY lang, familiarity_x1000
), cum AS (
  SELECT lang, familiarity_x1000,
         SUM(c) OVER (PARTITION BY lang ORDER BY familiarity_x1000) AS cum,
         SUM(c) OVER (PARTITION BY lang) AS tot
  FROM dist
), cuts AS (
  SELECT lang,
         MIN(CASE WHEN cum * 3 >= tot THEN familiarity_x1000 END)
           AS cut_tail,
         MIN(CASE WHEN cum * 3 >= 2 * tot THEN familiarity_x1000 END)
           AS cut_mid
  FROM cum GROUP BY lang
)
SELECT dd.doc_id, dd.lang, dd.familiarity_x1000,
       CASE WHEN dd.familiarity_x1000 <= c.cut_tail THEN 'tail'
            WHEN dd.familiarity_x1000 <= c.cut_mid THEN 'middle'
            ELSE 'head' END AS bucket
FROM dd JOIN cuts c USING (lang)
"""


def q_host_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host language mix — the curation report that decides which
    sites feed which language buckets: (host, pred_lang, n_docs,
    permille). Composes lang_id with the canonical-URL host (pure
    doc_id column math, the link-graph no-join idiom); permille is
    integer (n_docs*1000 div n_host) so the share column hash-checks.
    Totals derive from the per-(host,lang) aggregate itself — no second
    corpus pass; everything after the first agg is output-sized."""
    from dd_ops_ocr_spark.operators.urlops import canonical_host_expr

    langs = q_lang_id(spark, sf_dir).select("doc_id", "pred_lang")
    per = (
        langs.withColumn("host", canonical_host_expr("doc_id"))
        .groupBy("host", "pred_lang")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    tot = per.groupBy("host").agg(F.sum("n_docs").alias("n_host"))
    return per.join(tot, "host").select(
        "host",
        "pred_lang",
        "n_docs",
        F.expr("CAST(n_docs * 1000 div n_host AS BIGINT)").alias("permille"),
    )


def _sql_host_lang() -> str:
    from dd_ops_ocr_spark.operators.urlops import SQL_CANONICAL_HOST

    return f"""
WITH d AS (
  SELECT doc_id, ' ' || LOWER(text) || ' ' AS s FROM documents
), c AS (
  SELECT doc_id,
         {_sql_counts}
  FROM d
), h AS (
  SELECT {SQL_CANONICAL_HOST} AS host,
         {_sql_pred} AS pred_lang
  FROM c
), per AS (
  SELECT host, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM h GROUP BY host, pred_lang
), tot AS (
  SELECT host, CAST(SUM(n_docs) AS BIGINT) AS n_host
  FROM per GROUP BY host
)
SELECT host, pred_lang, n_docs,
       CAST(n_docs * 1000 // n_host AS BIGINT) AS permille
FROM per JOIN tot USING (host)
"""


QUERIES = {
    "lang_id": q_lang_id,
    "host_lang_profile": q_host_lang_profile,
    "quality_score": q_quality_score,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "repeated_span_strip": q_repeated_span_strip,
    "repetition_stats": q_repetition_stats,
    "decontaminate": q_decontaminate,
    "decontaminate_bloom": q_decontaminate_bloom,
    "pii_redact": q_pii_redact,
    "sample_stratified": q_sample_stratified,
    "sequence_pack": q_sequence_pack,
    "topk_ngrams": q_topk_ngrams,
    "corpus_curriculum": q_corpus_curriculum,
    "lm_familiarity": q_lm_familiarity,
    "dsir_weights": q_dsir_weights,
    "ccnet_buckets": q_ccnet_buckets,
}

ORACLE_SQL = {
    "lang_id": SQL_LANG_ID,
    "host_lang_profile": _sql_host_lang(),
    "quality_score": SQL_QUALITY_SCORE,
    "token_count": SQL_TOKEN_COUNT,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "repeated_span_strip": SQL_REPEATED_SPAN_STRIP,
    "repetition_stats": SQL_REPETITION_STATS.format(
        docs_rep=_SQL_DOCS_WITH_REPETITION
    ),
    "decontaminate": SQL_DECONTAMINATE,
    # same semantics, different physical shape: the bloom prefilter is
    # exact end-to-end (no false negatives + exact verify join), so the
    # oracle SQL is shared verbatim
    "decontaminate_bloom": SQL_DECONTAMINATE,
    "pii_redact": SQL_PII_REDACT,
    "sample_stratified": SQL_SAMPLE_STRATIFIED,
    "sequence_pack": SQL_SEQUENCE_PACK,
    "topk_ngrams": SQL_TOPK_NGRAMS,
    "lm_familiarity": SQL_LM_FAMILIARITY,
    "corpus_curriculum": SQL_CORPUS_CURRICULUM.format(
        quality=SQL_QUALITY_SCORE,
        decon=SQL_DECONTAMINATE,
        sample=SQL_SAMPLE_STRATIFIED,
    ),
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "ccnet_buckets": _sql_ccnet(SQL_LM_FAMILIARITY),
}
