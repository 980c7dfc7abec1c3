"""Lenient type coercion — exact port of the reference's semantics
(C8, src/modules/step0/00_type_utils.py:9-85), the one module the
reference's own test suite actually exercises (test/step0_test.py:30-39):

    to_bool("true") == True     to_int("123") == 123
    to_bool("false") == False   to_int("123.45") == 123
    to_bool(1) == True          to_int(None, 999) == 999
    to_bool(0) == False         to_float("123.45") == 123.45
                                to_float(None, 999.0) == 999.0

Faithfulness note: the reference's string branch is ``if s in ("true")``
— a SUBSTRING test, not a tuple membership (``("true")`` is just the
string). So ``to_bool("r") is True`` and ``to_bool("") is True`` in the
reference. We reproduce that behavior exactly (and document it), because
the contract is matching the reference's results, not fixing them.

to_int truncates toward zero via int(float(s)) — Spark's double->long
cast does the same.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


# ONE whitespace definition, spelled identically on the Spark and DuckDB
# sides (both generated from this codepoint list, so they cannot diverge).
# This is Python str.strip()'s stripped set over the BMP characters the
# corpus can contain: ASCII whitespace, the \x1c-\x1f separators, NEL and
# NBSP, plus the Unicode space blocks. Java's (?U)\s and DuckDB's default
# TRIM each disagree with Python at the edges (e.g. \x1c-\x1f, U+00A0),
# which is why an explicit class is used instead of either builtin.
_WS_CODEPOINTS = (
    [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20, 0x85, 0xA0,
     0x1680]
    + list(range(0x2000, 0x200B)) + [0x2028, 0x2029, 0x205F, 0x3000]
)
_WS_CLASS = "[" + "".join(f"\\u{cp:04X}" for cp in _WS_CODEPOINTS) + "]"
# DuckDB TRIM charset literal: the characters themselves, SQL-quoted
WS_SQL_CHARSET = "||".join(f"chr({cp})" for cp in _WS_CODEPOINTS)


def _strip(c: Column) -> Column:
    """Python ``str.strip()`` equivalence via the explicit class above."""
    return F.regexp_replace(c, f"(^{_WS_CLASS}+)|({_WS_CLASS}+$)", "")


def coerce_bool(c: Column) -> Column:
    """Reference to_bool for a string column: s = strip+lower; True if s
    is a substring of 'true' (includes ''), False if a substring of
    'false', else False; null input -> False."""
    s = F.lower(_strip(c))
    in_true = F.instr(F.lit("true"), s) > 0
    in_false = F.instr(F.lit("false"), s) > 0
    return (
        F.when(c.isNull(), F.lit(False))
        .when(in_true, F.lit(True))
        .when(in_false, F.lit(False))
        .otherwise(F.lit(False))
    )


def coerce_int(c: Column, default: int | None = None) -> Column:
    """int(float(strip(s))) with default on null/''/unparseable."""
    s = _strip(c)
    parsed = s.try_cast("double").cast("long")
    d = F.lit(default).cast("long") if default is not None else F.lit(None).cast("long")
    return (
        F.when(c.isNull() | (s == ""), d)
        .otherwise(F.coalesce(parsed, d))
    )


def coerce_float(c: Column, default: float | None = None) -> Column:
    s = _strip(c)
    parsed = s.try_cast("double")
    d = (
        F.lit(default).cast("double")
        if default is not None
        else F.lit(None).cast("double")
    )
    return (
        F.when(c.isNull() | (s == ""), d)
        .otherwise(F.coalesce(parsed, d))
    )


_RAWS = [
    "true", "false", "TRUE ", " False", "1", "0", "123", "123.45", "-2.7",
    "", "  ", "r", "als", "xyz", None, "999",
    # non-space whitespace: Python str.strip() strips these; plain TRIM
    # would not — regression cases for the (?U)\s strip
    "true\n", "\t1", "\n\t123.5\t\n",
    # outside the ASCII-space set: NBSP, file/unit separators, ideographic
    # space — regression cases for the explicit shared whitespace class
    " true ", "\x1c123\x1f", "　1.5　",
]


def q_type_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 over a fixed raw-value table (the reference's own test cases plus
    the substring-quirk cases), coerced with the exact semantics."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(r) for r in _RAWS]),
            (F.col("doc_id") % len(_RAWS)).cast("int") + 1,
        ).alias("raw"),
    )
    return d.select(
        "doc_id",
        "raw",
        coerce_bool(F.col("raw")).alias("as_bool"),
        coerce_int(F.col("raw"), 999).alias("as_int"),
        coerce_float(F.col("raw"), 999.0).alias("as_float"),
    )


_sql_raws = ", ".join("NULL" if r is None else f"'{r}'" for r in _RAWS)

SQL_TYPE_COERCION = f"""
WITH d AS (
  SELECT doc_id,
         ([{_sql_raws}])[CAST(doc_id % {len(_RAWS)} AS INT) + 1] AS raw
  FROM documents
), s AS (
  -- TRIM charset generated from the SAME codepoint list as the Spark
  -- side's regexp class (_WS_CODEPOINTS) — one definition, two spellings
  SELECT doc_id, raw,
         LOWER(TRIM(raw, {WS_SQL_CHARSET})) AS norm,
         TRIM(raw, {WS_SQL_CHARSET}) AS t
  FROM d
)
SELECT doc_id, raw,
       CASE WHEN raw IS NULL THEN FALSE
            WHEN strpos('true', norm) > 0 THEN TRUE
            WHEN strpos('false', norm) > 0 THEN FALSE
            ELSE FALSE END AS as_bool,
       CASE WHEN raw IS NULL OR t = '' THEN 999
            -- TRUNC, not CAST: DuckDB's double->int cast rounds, but the
            -- reference's int(float(s)) truncates toward zero
            ELSE COALESCE(CAST(TRUNC(TRY_CAST(t AS DOUBLE)) AS BIGINT), 999) END
         AS as_int,
       CASE WHEN raw IS NULL OR t = '' THEN 999.0
            ELSE COALESCE(TRY_CAST(t AS DOUBLE), 999.0) END AS as_float
FROM s
"""

QUERIES = {"type_coercion": q_type_coercion}
ORACLE_SQL = {"type_coercion": SQL_TYPE_COERCION}
