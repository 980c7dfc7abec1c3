"""schema.norm_text_expr must be byte-identical to the regex pair it
replaced in the sql/bounded plans:

    regexp_replace(regexp_replace(text, "\\n{2,}", "\\n"),
                   r"(?U)(^\\s+)|(\\s+$)", "")

over adversarial inputs: every Unicode White_Space code point at every
position, newline runs at the edges and interior, empty and
whitespace-only strings, and non-ASCII payloads."""

from __future__ import annotations

from pyspark.sql import functions as F

from dd_ops_ocr_spark.schema import UNICODE_WS, norm_text_expr


def _cases() -> list[str]:
    ws = list(UNICODE_WS)
    cases = [
        "",
        "plain",
        "  lead",
        "trail  ",
        "\n\n",
        "\nx\n",
        "a\n\nb",
        "a\n\n\n\nb\n\n",
        "\n\n\na\nb\n\n\n",
        "\t  mixed　 ",
        "only interior space",
        "　　　",          # whitespace-only, exotic
        "a\nb",                        # single newline untouched
        "naïve  \n\n café",
        "\r\n\r\n",                    # CR/LF runs (collapse only hits \n\n)
        "x\r\n\r\ny",
    ]
    # every White_Space char leading, trailing, interior, and doubled
    for c in ws:
        cases += [f"{c}abc", f"abc{c}", f"a{c}b", f"{c}{c}abc{c}{c}"]
    # runs mixing \n with other whitespace at edges
    for c in " \t ":
        cases += [f"{c}\n\nabc\n\n{c}", f"\n{c}\n{c}\n"]
    return cases


def test_norm_text_expr_matches_regex_pair(spark):
    cases = _cases()
    df = spark.createDataFrame([(s,) for s in cases], "text string")
    legacy = F.regexp_replace(
        F.regexp_replace("text", "\n{2,}", "\n"), r"(?U)(^\s+)|(\s+$)", ""
    )
    out = df.select(
        "text",
        legacy.alias("want"),
        norm_text_expr("text").alias("got"),
    ).collect()
    bad = [(r.text, r.want, r.got) for r in out if r.want != r.got]
    assert not bad, bad[:5]
