"""Training-pipeline corpus operators (decontaminate / sample_stratified /
sequence_pack) against planted documents tables with known structure."""

from __future__ import annotations

import os

import pandas as pd

from dd_ops_ocr_spark.operators.textstats import (
    _PACK_BUDGET,
    _SAMPLE_CAP,
    q_decontaminate,
    q_sample_stratified,
    q_sequence_pack,
)


def _write_docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    path = str(tmp_path)
    pdf.to_parquet(os.path.join(path, "documents.parquet"))
    return path


def test_decontaminate_planted_overlap(spark, tmp_path):
    """doc_ids 3/5/34 are the md5-nibble 'e' eval split. A train doc
    repeating an eval 5-gram is contaminated at exactly the positions
    that contain it; clean and short docs are not."""
    eval_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (3, eval_text, "en"),                      # eval
        (5, "totally different benchmark words here", "en"),   # eval
        (34, "x " * 3, "en"),                      # eval, short
        # train: contains eval 5-gram "alpha beta gamma delta epsilon"
        (0, "intro alpha beta gamma delta epsilon zeta outro", "en"),
        # train: clean
        (1, "one two three four five six seven", "en"),
        # train: too short to shingle
        (2, "tiny doc", "en"),
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in q_decontaminate(spark, _write_docs(tmp_path, rows)).collect()
    }
    assert set(got) == {0, 1, 2}
    # doc 0 has 4 shingles; positions 1 and 2 reproduce eval shingles
    # ("alpha..epsilon" and "beta..zeta")
    assert got[0]["n_shingles"] == 4
    assert got[0]["n_contaminated"] == 2
    assert got[0]["contaminated"] is True
    assert got[1] == {"doc_id": 1, "n_shingles": 3, "n_contaminated": 0,
                      "contaminated": False}
    assert got[2] == {"doc_id": 2, "n_shingles": 0, "n_contaminated": 0,
                      "contaminated": False}


def test_pii_redact_vs_python_re_referee(spark, tmp_path):
    """Third-engine referee: replicate the planting + sequential
    count-then-replace with Python's re module and require equality —
    including a doc whose ORIGINAL text already carries PII (an email
    with >=9 digits inside must be consumed by the earlier EMAIL stage,
    never double-counted by IDNUM; a bare 9-digit run must become
    IDNUM)."""
    import hashlib
    import re

    from dd_ops_ocr_spark.operators.textstats import (
        _EVEN_NIBBLES, _PII_PATTERNS, _pii_token, q_pii_redact,
    )

    rows = [
        (0, "contact admin123456789@site.io or 123456789 right now", "en"),
        (1, "plain text with no sensitive content at all", "en"),
        # boundary-manufacture regression: the ORIGINAL has zero IDNUM
        # matches ('m' precedes the digits, no \b); a letters-only email
        # token must keep it that way, where '<EMAIL>'s '>' minted one
        (2, "contact user@bar.com123456789 now", "en"),
        (7, "server 172.16.254.1 answered +44-207-946-0958 twice", "en"),
    ]
    got = {r["doc_id"]: r.asDict()
           for r in q_pii_redact(spark, _write_docs(tmp_path, rows)).collect()}

    for doc_id, text, _ in rows:
        md = hashlib.md5(str(doc_id).encode()).hexdigest()
        t = text[:120]
        if md[0] in _EVEN_NIBBLES:
            t += f" reach user{doc_id}@corp.example.org"
        if md[1] in _EVEN_NIBBLES:
            t += f" from 10.0.{doc_id % 256}.{doc_id * 7 % 256}"
        if md[2] in _EVEN_NIBBLES:
            t += f" call +1-555-{doc_id % 10000:04d}"
        if md[3] in _EVEN_NIBBLES:
            t += f" acct 9{doc_id % 100000000:08d}"
        want = {"doc_id": doc_id}
        for name, pat in _PII_PATTERNS:
            want[f"n_{name}"] = len(re.findall(pat, t))
            t = re.sub(pat, _pii_token(name), t)
        want["redacted_text"] = t
        assert got[doc_id] == want, doc_id
    # the planted referee cases actually exercised what they claim
    assert got[0]["n_email"] >= 1 and got[0]["n_idnum"] >= 1
    assert got[7]["n_ip"] >= 1 and got[7]["n_phone"] >= 1
    assert "123456789" not in got[0]["redacted_text"]
    # doc 2: only the md5-planted acct counts as IDNUM — the digits the
    # email replacement strands ('EMAILTOKEN123456789') must NOT
    assert got[2]["n_idnum"] == 1
    assert "EMAILTOKEN123456789" in got[2]["redacted_text"]


def test_decontaminate_bloom_exact_under_fp_flood(spark, tmp_path):
    """The bloom prefilter must be invisible in the OUTPUT no matter how
    bad the filter is: with m=256 bits / k=2 the candidate set floods
    with false positives, and with the default sizing it barely admits
    any — both must hash-match the exact path row for row (blooms have
    no false negatives; the verify join removes every false positive)."""
    from dd_ops_ocr_spark.operators.textstats import q_decontaminate_bloom

    rows = [
        (3, "alpha beta gamma delta epsilon zeta", "en"),
        (5, "totally different benchmark words here", "en"),
        (0, "intro alpha beta gamma delta epsilon zeta outro", "en"),
        (1, "one two three four five six seven", "en"),
        (2, "tiny doc", "en"),
    ]
    src = _write_docs(tmp_path, rows)
    exact = sorted(map(tuple, q_decontaminate(spark, src).collect()))
    for m, k in [(256, 2), (1 << 20, 4)]:
        got = sorted(
            map(tuple, q_decontaminate_bloom(spark, src, m=m, k=k).collect())
        )
        assert got == exact, (m, k)


def test_bloom_bitmap_build_is_bounded(spark):
    """build_bloom_bitmap ships per-partition bitmaps, not positions:
    the bitmap is exactly m/8 bytes regardless of row count, and every
    inserted key probes positive (no false negatives by construction)."""
    import numpy as np

    from dd_ops_ocr_spark.operators.textstats import (
        _bloom_pos_expr, build_bloom_bitmap,
    )
    from pyspark.sql import functions as F

    m, k = 4096, 3
    df = (
        spark.range(500).repartition(7)
        .select(F.md5(F.col("id").cast("string")).alias("gh"))
    )
    bm = build_bloom_bitmap(df.select(_bloom_pos_expr(m, k).alias("pos")), m)
    assert bm.shape == (m // 8,)
    pos = df.select(_bloom_pos_expr(m, k).alias("pos")).collect()
    flat = np.array([p for r in pos for p in r.pos])
    assert ((bm[flat >> 3] >> (flat & 7).astype(np.uint8)) & 1).all()
    # empty input -> all-zero bitmap (and no mapInPandas rows at all)
    empty = build_bloom_bitmap(
        df.filter("gh = ''").select(_bloom_pos_expr(m, k).alias("pos")), m
    )
    assert not empty.any()


def test_sample_stratified_small_and_large_strata(spark, tmp_path):
    """Strata at/below the cap are kept whole; a stratum far above it
    downsamples to ~CAP (binomial), deterministically."""
    rows = [(i, "w", "small") for i in range(10)]
    rows += [(1000 + i, "w", "big") for i in range(2000)]
    path = _write_docs(tmp_path, rows)
    got = q_sample_stratified(spark, path).toPandas()
    small = got[got["lang"] == "small"]
    big = got[got["lang"] == "big"]
    assert len(small) == 10  # n <= CAP: hash*n < CAP<<60 always holds
    assert 140 <= len(big) <= 310, len(big)  # ~binomial(2000, 220/2000)
    again = q_sample_stratified(spark, path).toPandas()
    assert sorted(got["doc_id"]) == sorted(again["doc_id"])


def test_sequence_pack_cumulative_fill(spark, tmp_path):
    """Docs planted into one md5 bucket pack by cumulative fill: bins
    advance when the running sum crosses the budget; offsets are the
    pre-fill remainder."""
    # ids 12/19/139/144/159 all land in bucket 0; word counts chosen so
    # cumulative sums (ordered by doc_id) cross the 256 budget twice
    toks = {12: 100, 19: 100, 139: 100, 144: 30, 159: 200}
    rows = [(i, " ".join(["w"] * t), "en") for i, t in toks.items()]
    got = (
        q_sequence_pack(spark, _write_docs(tmp_path, rows))
        .orderBy("doc_id")
        .collect()
    )
    assert [r["bucket"] for r in got] == [0] * 5
    assert [r["tokens"] for r in got] == [100, 100, 100, 30, 200]
    # cums: 100,200,300,330,530 -> starts 0,100,200,300,330
    assert [r["seq_id"] for r in got] == [0, 0, 0, 1, 1]
    assert [r["seq_offset"] for r in got] == [0, 100, 200, 44, 74]
    assert all(0 <= r["seq_offset"] < _PACK_BUDGET for r in got)
    assert _SAMPLE_CAP > 0  # imported constants stay wired


def test_bounded_engine_calls_concurrency_and_order(spark, tmp_path):
    """X4: the semaphore-bounded gather never exceeds max_inflight, DOES
    reach it (calls genuinely overlap), and keeps input order; the Spark
    path produces the engine outputs end-to-end."""
    import asyncio

    from dd_ops_ocr_spark.operators.external import (
        bounded_engine_calls,
        run_bounded,
    )

    state = {"now": 0, "high": 0}

    async def recording_engine(text):
        state["now"] += 1
        state["high"] = max(state["high"], state["now"])
        await asyncio.sleep(0)  # yield so gather interleaves
        await asyncio.sleep(0)
        state["now"] -= 1
        return {"result_len": len(text), "head": text[:10]}

    texts = [f"doc number {i} body" for i in range(20)]
    outs = run_bounded(texts, recording_engine, max_inflight=3)
    assert [o["result_len"] for o in outs] == [len(t) for t in texts]
    assert state["high"] == 3, state  # bound reached, never exceeded
    assert state["now"] == 0

    # max_inflight=1 degrades to strictly sequential
    state["high"] = 0
    run_bounded(texts, recording_engine, max_inflight=1)
    assert state["high"] == 1

    # Spark path end-to-end with the default deterministic engine
    rows = [(i, f"doc number {i} body", "en") for i in range(20)]
    docs = _write_docs(tmp_path, rows)
    df = spark.read.parquet(f"{docs}/documents.parquet")
    out = {r["doc_id"]: r for r in bounded_engine_calls(df).collect()}
    assert len(out) == 20
    assert out[7]["result_len"] == len("doc number 7 body")
    assert out[7]["head"] == "doc number"


def test_topk_ngrams_deterministic_order(spark, tmp_path):
    """Heavy hitters: exact counts and the (count desc, gram asc) total
    order, including ties."""
    from dd_ops_ocr_spark.operators.textstats import q_topk_ngrams

    rows = [
        (1, "a b c a b c", "en"),     # grams: "a b c","b c a","c a b","a b c"
        (2, "a b c d", "en"),          # "a b c","b c d"
        (3, "x y", "en"),              # too short -> none
    ]
    got = q_topk_ngrams(spark, _write_docs(tmp_path, rows)).collect()
    rows_out = [(r["gram"], r["occurrences"], r["n_docs"]) for r in got]
    assert rows_out[0] == ("a b c", 3, 2)
    # the three singletons tie on count and sort lexicographically
    assert rows_out[1:] == [("b c a", 1, 1), ("b c d", 1, 1),
                            ("c a b", 1, 1)]


def test_curate_corpus_job(spark, tmp_path, capsys):
    """The spark-submit curation entry point end-to-end in-process:
    packed sequences partitioned by bucket, heavy-hitter report, JSON
    summary consistent with the written outputs."""
    import json
    import os

    from jobs.curate_corpus import main as curate

    out = str(tmp_path / "out")
    from tests.conftest import SF_SMOKE

    rc = curate(["--input", SF_SMOKE, "--output", out])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    seqs = spark.read.parquet(f"{out}/sequences")
    assert rep["docs_packed"] == seqs.count() > 0
    assert rep["sequences"] == seqs.select("seq_id").distinct().count()
    assert rep["report_rows"] == 50
    # hive partitioning by pack bucket (downstream reads one bucket/task)
    assert any(d.startswith("bucket=") for d in os.listdir(f"{out}/sequences"))
    # offsets stay inside the budget
    from dd_ops_ocr_spark.operators.textstats import _PACK_BUDGET

    assert seqs.filter(f"seq_offset >= {_PACK_BUDGET}").count() == 0


def test_bounded_engine_calls_failure_fails_task(spark, tmp_path):
    """X4 retry posture: an engine exception propagates (Spark task
    retry territory), never a silent skip."""
    import pytest

    from dd_ops_ocr_spark.operators.external import bounded_engine_calls

    async def failing_engine(text):
        raise RuntimeError("engine down")

    rows = [(1, "some text", "en")]
    df = spark.read.parquet(f"{_write_docs(tmp_path, rows)}/documents.parquet")
    with pytest.raises(Exception, match="engine down"):
        bounded_engine_calls(df, engine=failing_engine).collect()


def _rep_referee(doc_id, text):
    """Pure-Python restatement of q_repetition_stats' spec, including
    the md5 tail injection — an independent referee for the doc-local
    array math."""
    import hashlib
    from collections import Counter

    from dd_ops_ocr_spark.operators.textstats import (
        _REP_DUP5_CHAR_FRAC,
        _REP_DUP_LINE_CHAR_FRAC,
        _REP_DUP_LINE_FRAC,
        _REP_TAIL,
        _REP_TOP2_CHAR_FRAC,
    )

    hx = hashlib.md5(str(doc_id).encode()).hexdigest()
    if int(hx[4:6], 16) % 4 == 0:
        text = text + _REP_TAIL
    # strip SPACES only: Spark/DuckDB trim() removes ' ' — Python's
    # bare .strip() (all whitespace) diverges on tab/CR-only lines
    lines = [x for x in text.split("\n") if x.strip(" ") != ""]
    lc = Counter(lines)
    n_lines, n_distinct = len(lines), len(lc)
    line_chars = sum(len(x) for x in lines)
    dup_line_chars = sum((c - 1) * len(x) for x, c in lc.items())
    ws = text.split(" ")
    g5 = Counter(" ".join(ws[i:i + 5]) for i in range(len(ws) - 4))
    g2 = Counter(" ".join(ws[i:i + 2]) for i in range(len(ws) - 1))
    dup5 = sum((c - 1) * len(g) for g, c in g5.items())
    top2 = 0
    if g2:
        occ, gram = max((c, g) for g, c in g2.items())
        top2 = occ * len(gram)
    n = len(text)
    f = lambda a, b: a / b if b > 0 else 0.0  # noqa: E731
    out = {
        "n_lines": n_lines,
        "dup_line_frac": f(n_lines - n_distinct, n_lines),
        "dup_line_char_frac": f(dup_line_chars, line_chars),
        "top_2gram_char_frac": f(top2, n),
        "dup_5gram_char_frac": min(1.0, f(dup5, n)),
    }
    out["passes_repetition"] = int(
        out["dup_line_frac"] < _REP_DUP_LINE_FRAC
        and out["dup_line_char_frac"] < _REP_DUP_LINE_CHAR_FRAC
        and out["top_2gram_char_frac"] < _REP_TOP2_CHAR_FRAC
        and out["dup_5gram_char_frac"] < _REP_DUP5_CHAR_FRAC
    )
    return out


def test_repetition_stats_vs_referee(spark, tmp_path):
    from dd_ops_ocr_spark.operators.textstats import q_repetition_stats

    rows = [
        (1, "alpha beta gamma\ndelta epsilon zeta", "en"),
        (2, "same line\nsame line\nsame line\nother", "en"),     # dup lines
        (3, "spam ham " * 40 + "end", "en"),                     # dup 5-grams
        (4, "one", "en"),                                        # no grams
        (5, "a  b   c\n\n \nd e", "en"),                         # empty tokens/lines
        (6, "buy now buy now buy now buy now unique tail here", "en"),
        (7, "x y " * 3 + "\n" + "x y " * 3, "en"),
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in q_repetition_stats(spark, _write_docs(tmp_path, rows))
        .collect()
    }
    assert set(got) == {str(r[0]) for r in rows} or set(got) == {
        r[0] for r in rows}
    for doc_id, text, _lang in rows:
        want = _rep_referee(doc_id, text)
        g = got[doc_id] if doc_id in got else got[str(doc_id)]
        for k, v in want.items():
            assert g[k] == v, (doc_id, k, g[k], v)  # exact, incl doubles


def test_url_domain_cap_salt_invariant_and_python_referee(spark, tmp_path):
    """Two referees for the URL stage:

    1. Salt invariance — the salted two-phase cap must emit EXACTLY the
       naive single-window result (the salt is a partitioning detail,
       never a semantic one), checked on a corpus dense enough that
       every domain overflows the cap.
    2. Pure-Python replication of planting + parsing + blocklist + cap
       on a small slice, so the semantics don't rest on two SQL engines
       sharing a quirk."""
    import hashlib
    import re

    from pyspark.sql import Window, functions as F

    from dd_ops_ocr_spark.operators import urlops as U

    rows = [(i, f"doc body {i}", "en") for i in range(1500)]
    path = _write_docs(tmp_path, rows)
    got = sorted(tuple(r) for r in U.q_url_domain_cap(spark, path).collect())

    # referee 1: naive unsalted window over the same parsed/filtered set
    md = F.md5(F.col("doc_id").cast("string"))
    nib = lambda i: F.instr(F.lit(U._HEX), F.substring(md, i, 1)) - F.lit(1)
    host_id = (nib(1) * 16 + nib(2)) % U._N_DOMAINS
    url = F.concat(
        F.lit("https://"),
        F.when(F.substring(md, 4, 1).isin(U._EVEN_NIBBLES),
               F.lit("www.")).otherwise(F.lit("")),
        F.lit("d"), host_id.cast("string"),
        F.when(F.substring(md, 3, 1).isin(U._EVEN_NIBBLES),
               F.lit(".com")).otherwise(F.lit(".org")),
        F.lit("/p/"), F.col("doc_id").cast("string"),
        F.when(F.substring(md, 5, 1).isin(U._EVEN_NIBBLES),
               F.lit("?utm_source=feed")).otherwise(F.lit("")),
    )
    d = spark.read.parquet(f"{path}/documents.parquet").select(
        "doc_id", url.alias("url"), md.alias("ord"))
    host = F.regexp_extract("url", U._HOST_RE, 1)
    naive = (
        d.select("doc_id", "url", "ord", host.alias("host"),
                 F.regexp_extract(host, U._DOMAIN_RE, 2).alias("domain"))
        .withColumn("tld", F.regexp_extract("domain", U._TLD_RE, 1))
        .where(~F.col("domain").isin(U._BLOCKLIST))
        .withColumn("domain_rank", F.row_number().over(
            Window.partitionBy("domain").orderBy("ord")).cast("long"))
        .where(F.col("domain_rank") <= U._DOMAIN_CAP)
        .select("doc_id", "url", "host", "domain", "tld", "domain_rank")
    )
    assert got == sorted(tuple(r) for r in naive.collect())
    # every surviving domain is saturated at the cap -> stage 1 really
    # had to merge survivors from multiple salt buckets
    by_domain = {}
    for _, _, _, dom, _, rank in got:
        by_domain[dom] = max(by_domain.get(dom, 0), rank)
    assert by_domain and all(v == U._DOMAIN_CAP for v in by_domain.values())

    # referee 2: pure Python on the full corpus
    def py_expect():
        per = {}
        for doc_id, _, _ in rows:
            h = hashlib.md5(str(doc_id).encode()).hexdigest()
            hid = (U._HEX.index(h[0]) * 16 + U._HEX.index(h[1])) % U._N_DOMAINS
            u = ("https://" + ("www." if h[3] in U._EVEN_NIBBLES else "")
                 + f"d{hid}" + (".com" if h[2] in U._EVEN_NIBBLES else ".org")
                 + f"/p/{doc_id}"
                 + ("?utm_source=feed" if h[4] in U._EVEN_NIBBLES else ""))
            hst = re.search(U._HOST_RE, u).group(1)
            dom = re.search(U._DOMAIN_RE, hst).group(2)
            if dom in U._BLOCKLIST:
                continue
            per.setdefault(dom, []).append(
                (h, doc_id, u, hst, re.search(U._TLD_RE, dom).group(1)))
        out = []
        for dom, lst in per.items():
            for rank, (h, doc_id, u, hst, tld) in enumerate(
                    sorted(lst)[:U._DOMAIN_CAP], start=1):
                out.append((doc_id, u, hst, dom, tld, rank))
        return sorted(out)

    assert got == py_expect()


def test_lm_familiarity_planted_model(spark, tmp_path):
    """doc_id 4 is the md5-nibble 'a' reference split. Its trigrams
    (abc x3, bca x2, cab x2) ARE the model; quantized bits per gram =
    length(bin(count)). Seen/unseen/short/normalized docs score exactly
    as the integer arithmetic says."""
    from dd_ops_ocr_spark.operators.textstats import q_lm_familiarity

    rows = [
        (4, "abcabcabc", "en"),   # ref: model = {abc:3, bca:2, cab:2}
        (0, "abc", "en"),         # 1 gram, seen (bin(3)->2 bits)
        (1, "xyz", "en"),         # 1 gram, unseen
        (2, "AB", "en"),          # norm 'ab', too short: zero grams
        (3, "A1c", "en"),         # norm 'a_c', unseen
    ]
    got = {
        r["doc_id"]: (
            r["n_grams"], r["n_seen"], r["sum_bits"],
            r["familiarity_x1000"], r["coverage_x1000"],
        )
        for r in q_lm_familiarity(spark, _write_docs(tmp_path, rows)).collect()
    }
    assert got[4] == (7, 7, 14, 2000, 1000)
    assert got[0] == (1, 1, 2, 2000, 1000)
    assert got[1] == (1, 0, 0, 0, 0)
    assert got[2] == (0, 0, 0, 0, 0)
    assert got[3] == (1, 0, 0, 0, 0)


def test_lm_familiarity_python_referee(spark, tmp_path):
    """Independent Python trigram LM over a mixed corpus (uppercase,
    punctuation, digits, a ref doc scoring itself) reproduces every
    output column bit-exactly."""
    import hashlib
    import re as _re

    from dd_ops_ocr_spark.operators.textstats import (
        _LM_NIBBLE,
        q_lm_familiarity,
    )

    texts = [
        "The quick brown fox; jumps over 12 lazy dogs!",
        "the the the the the and and and or",
        "Zzyzx qwq xjqz vvv",
        "lorem ipsum dolor sit amet, consectetur adipiscing elit",
        "THE QUICK BROWN FOX AGAIN (upper-cased this time)",
        "a b",
    ]
    rows = [(i, texts[i % len(texts)] + f" tail {i}", "en") for i in range(40)]

    def norm(t):
        return _re.sub(r"[^a-z ]", "_", t.lower())

    def grams(t):
        n = norm(t)
        return [n[i:i + 3] for i in range(len(n) - 2)] if len(n) >= 3 else []

    model = {}
    for doc_id, text, _ in rows:
        if hashlib.md5(str(doc_id).encode()).hexdigest()[0] == _LM_NIBBLE:
            for g in grams(text):
                model[g] = model.get(g, 0) + 1
    assert model, "planted corpus must include a ref doc"

    def score(text):
        gs = grams(text)
        bits = sum(model[g].bit_length() for g in gs if g in model)
        seen = sum(1 for g in gs if g in model)
        n = len(gs)
        return (
            n, seen, bits,
            bits * 1000 // n if n else 0,
            seen * 1000 // n if n else 0,
        )

    got = {
        r["doc_id"]: (
            r["n_grams"], r["n_seen"], r["sum_bits"],
            r["familiarity_x1000"], r["coverage_x1000"],
        )
        for r in q_lm_familiarity(spark, _write_docs(tmp_path, rows)).collect()
    }
    assert got == {doc_id: score(text) for doc_id, text, _ in rows}


def test_dsir_weights_python_referee(spark, tmp_path):
    """Independent Python reimplementation of the hashed-n-gram DSIR
    weight (unigrams+bigrams, length*31+codepoint bucket, quantized-log2
    bucket bits, target = lang 'en') reproduces dsir_bits bit-exactly —
    and target-language docs score strictly higher on average than
    off-target docs (the selection signal the weight exists for)."""
    from dd_ops_ocr_spark.operators.textstats import (
        _DSIR_BUCKETS,
        q_dsir_weights,
    )

    en = ["the quick brown fox jumps", "the lazy dog sleeps the day",
          "a fox and a dog", ""]
    de = ["der schnelle braune fuchs", "der faule hund schlaeft",
          "ein fuchs und ein hund"]
    rows = [(i, t, "en") for i, t in enumerate(en)]
    rows += [(100 + i, t, "de") for i, t in enumerate(de)]

    def grams(t):
        ws = [w for w in t.lower().split(" ") if w]
        return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def bucket(g):
        return (len(g) * 31 + ord(g[0])) % _DSIR_BUCKETS

    raw, tgt = {}, {}
    for _i, t, lang in rows:
        for g in grams(t):
            b = bucket(g)
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1

    def weight(t):
        gs = grams(t)
        return (
            len(gs),
            sum(tgt.get(bucket(g), 0).bit_length()
                - raw[bucket(g)].bit_length() for g in gs),
        )

    got = {
        r["doc_id"]: (r["n_grams"], r["dsir_bits"])
        for r in q_dsir_weights(spark, _write_docs(tmp_path, rows)).collect()
    }
    assert got == {doc_id: weight(t) for doc_id, t, _ in rows}
    en_scores = [got[i][1] / max(got[i][0], 1) for i in range(3)]
    de_scores = [got[100 + i][1] / got[100 + i][0] for i in range(3)]
    assert min(en_scores) > max(de_scores), (en_scores, de_scores)


def test_ccnet_buckets_tercile_invariants(spark):
    """Value-bucketed terciles: within every language the buckets are
    score-ordered (max tail < min middle < ... wherever nonempty), the
    tail holds at least a third of the docs (the cutoff is the first
    score whose cumulative count crosses N/3), and head+middle+tail
    partition the language."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.textstats import q_ccnet_buckets

    got = q_ccnet_buckets(spark, SF_SMOKE).toPandas()
    assert set(got["bucket"]) <= {"head", "middle", "tail"}
    for lang, g in got.groupby("lang"):
        n = len(g)
        sizes = g.groupby("bucket")["doc_id"].count()
        tail = int(sizes.get("tail", 0))
        mid = int(sizes.get("middle", 0))
        assert tail + mid + int(sizes.get("head", 0)) == n
        assert tail * 3 >= n, (lang, tail, n)
        assert (tail + mid) * 3 >= 2 * n, (lang, tail, mid, n)
        by = {
            b: gg["familiarity_x1000"] for b, gg in g.groupby("bucket")
        }
        if "tail" in by and "middle" in by:
            assert by["tail"].max() < by["middle"].min()
        if "middle" in by and "head" in by:
            assert by["middle"].max() < by["head"].min()


def test_learn_bpe_known_answer_and_tiebreak():
    """Hand-computed merges on a 3-word vocab, plus the deterministic
    tie-break (equal counts -> lexicographically smallest (lhs, rhs))
    and early stop when every word fuses to one symbol."""
    from dd_ops_ocr_spark.operators.bpe import learn_bpe

    # pairs: (t,h)=7, (h,e)=10, (e,m)=2 -> merge1 (h,e); then
    # (t,he)=7 beats (he,m)=2 -> merge2 (t,he); then (the,m)=2...
    got = learn_bpe([("the", 5), ("them", 2), ("he", 3)], k=3)
    assert got == [
        (1, "h", "e", "he", 10),
        (2, "t", "he", "the", 7),
        (3, "the", "m", "them", 2),
    ]
    # tie at count 1: ('a','b') < ('c','d')
    assert learn_bpe([("ab", 1), ("cd", 1)], k=1)[0] == (
        1, "a", "b", "ab", 1)
    # early stop: 2 single-char words fuse after 2 merges, k=5 asks more
    assert len(learn_bpe([("ab", 1)], k=5)) == 1
    # overlapping pair merges left-to-right: 'aaa' -> ['aa','a']
    m = learn_bpe([("aaa", 1)], k=2)
    assert m[0] == (1, "a", "a", "aa", 2)
    assert m[1] == (2, "aa", "a", "aaa", 1)


def test_bpe_train_and_tokenize_python_referee(spark, tmp_path):
    """Third-engine referee: word counting (with the top-V cap and its
    (cnt DESC, word ASC) tie-break), merge learning, and tokenization
    replicated in pure Python must match both Spark outputs exactly —
    including a zero-word doc and uppercase/punct normalization."""
    import re
    from collections import Counter

    from dd_ops_ocr_spark.operators.bpe import (
        learn_bpe, q_bpe_tokenize, q_bpe_train,
    )

    texts = [
        "the cat sat on the mat",
        "The Theme Of Them: the theater!",
        "a b c 123 --- 456",
        "",
        "zzz zzz zzz yyy",
        "concatenation of the nation's information",
    ]
    rows = [(i, texts[i % len(texts)], "en") for i in range(24)]
    path = _write_docs(tmp_path, rows)

    words = Counter()
    for _, text, _ in rows:
        words.update(re.findall("[a-z]+", text.lower()))
    # cap to top-5 with the exact (cnt DESC, word ASC) order Spark uses
    capped = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    merges = learn_bpe(capped, k=8)

    import dd_ops_ocr_spark.operators.bpe as bpe_mod
    orig_v = bpe_mod._BPE_V
    bpe_mod._BPE_V = 5
    try:
        got_train = [tuple(r) for r in q_bpe_train(spark, path).collect()]
        got_tok = {
            r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"],
                          r["compression_x1000"])
            for r in q_bpe_tokenize(spark, path).collect()
        }
    finally:
        bpe_mod._BPE_V = orig_v
    assert got_train == merges

    def tokens(word):
        syms = list(word)
        for _, lhs, rhs, merged, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lhs \
                        and syms[i + 1] == rhs:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    for doc_id, text, _ in rows:
        ws = re.findall("[a-z]+", text.lower())
        n_words, n_chars = len(ws), sum(len(w) for w in ws)
        n_tokens = sum(tokens(w) for w in ws)
        comp = n_chars * 1000 // n_tokens if n_tokens else 0
        assert got_tok[doc_id] == (n_words, n_chars, n_tokens, comp), doc_id
    # the planted corpus exercised what it claims
    assert any(t[4] > 1 for t in merges)  # a real multi-occurrence merge
    assert got_tok[3] == (0, 0, 0, 0)     # zero-word doc survives


def test_url_normalize_handcrafted_cases(spark):
    """Known-answer canonicalization table: case, default ports,
    fragments, tracking params mixed with real ones, empty path,
    non-default port preserved, path case preserved."""
    from dd_ops_ocr_spark.operators.urlops import normalize_urls

    cases = [
        ("HTTPS://WWW.Ex.COM:443/p/1#frag", "https://www.ex.com/p/1"),
        ("http://ex.com:80", "http://ex.com/"),
        ("http://ex.com:8080/a", "http://ex.com:8080/a"),
        ("https://ex.com/a?utm_source=x&ref=home&gclid=1&b=2",
         "https://ex.com/a?ref=home&b=2"),
        ("https://ex.com/a?utm_source=x&fbclid=y", "https://ex.com/a"),
        ("https://ex.com/CaseSensitive/Path",
         "https://ex.com/CaseSensitive/Path"),
        ("https://ex.com/p/1?ref=home", "https://ex.com/p/1?ref=home"),
    ]
    d = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)],
        "doc_id long, url string",
    )
    got = {r.url: (r.normalized_url, r.changed)
           for r in normalize_urls(d).collect()}
    for raw, want in cases:
        norm, changed = got[raw]
        assert norm == want, (raw, norm, want)
        assert changed == (raw != want), raw


def test_url_normalize_collapses_planted_spellings(spark):
    """The point of normalization: messy spellings of one page collide.
    Distinct normalized URLs must be far fewer than distinct raw URLs,
    and every normalized URL is in canonical form (idempotent)."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.urlops import (
        normalize_urls,
        q_url_normalize,
    )

    df = q_url_normalize(spark, SF_SMOKE)
    # every planted mess lands in canonical form (scheme/host lowered,
    # :443 gone, fragment gone, only the real query param survives)
    bad = df.where(
        "normalized_url NOT RLIKE "
        "'^https://www\\\\.d[0-9]+\\\\.com/p/[0-9]+(\\\\?ref=home)?$'"
    ).count()
    assert bad == 0
    # the md5 gates produce both messy and already-canonical spellings
    assert df.where("changed").count() > 0
    assert df.where("NOT changed").count() > 0
    # idempotence: normalizing the normalized column is a fixpoint
    again = normalize_urls(
        df.selectExpr("doc_id", "normalized_url as url")
    )
    assert again.where("changed").count() == 0


def test_url_normalize_non_absolute_passthrough(spark):
    """Canonicalization is defined only on scheme:// URLs — everything
    else must pass through unchanged (NOT collapse to a shared mangled
    key that would merge distinct docs in url-keyed dedup)."""
    from dd_ops_ocr_spark.operators.urlops import normalize_urls

    raws = ["mailto:a@b.com", "foo/bar.html", "//cdn.example/x",
            "#frag-only", ""]
    d = spark.createDataFrame(
        list(enumerate(raws)), "doc_id long, url string"
    )
    for r in normalize_urls(d).collect():
        assert r.normalized_url == r.url, r
        assert r.changed is False, r


def test_url_normalize_grammar_product_vs_python_referee(spark):
    """Exhaustive product of the URL grammar's dimensions (scheme case x
    host case x port x path x query-with-tracking x fragment = 960
    combos) against a pure-Python referee of the same spec, plus
    idempotence over every output. One Spark job for the whole grid."""
    import itertools
    import re

    from dd_ops_ocr_spark.operators.urlops import normalize_urls

    def ref(u):
        m = re.match(r"^([A-Za-z]+)://", u)
        if not m:
            return u
        scheme = m.group(1).lower()
        hostport = re.match(r"^[A-Za-z]+://([^/?#]*)", u).group(1).lower()
        if scheme == "http" and hostport.endswith(":80"):
            host = hostport[:-3]
        elif scheme == "https" and hostport.endswith(":443"):
            host = hostport[:-4]
        else:
            host = hostport
        rest = re.match(r"^[A-Za-z]+://[^/?#]*(.*)$", u, re.S).group(1)
        nofrag = re.sub(r"#.*$", "", rest, flags=re.S)
        path = re.match(r"^([^?]*)", nofrag).group(1) or "/"
        qm = re.search(r"\?(.*)$", nofrag, re.S)
        q = qm.group(1) if qm else ""
        cleaned = re.sub(
            r"^&", "",
            re.sub(r"&(?:utm_[a-z]+|fbclid|gclid)=[^&]*", "", "&" + q),
        )
        return scheme + "://" + host + path + (
            "?" + cleaned if cleaned else "")

    urls = [
        f"{s}://{h}{port}{path}{q}{frag}"
        for s, h, port, path, q, frag in itertools.product(
            ["http", "HTTP", "https", "HTTPS"],
            ["Ex.COM", "www.ex.com"],
            ["", ":80", ":443", ":8080"],
            ["", "/a", "/A/b"],
            ["", "?utm_source=x", "?a=1&utm_x=2&b=3",
             "?utm_campaign=1&gclid=2", "?ref=h&fbclid=z&x=9"],
            ["", "#f"],
        )
    ]
    d = spark.createDataFrame(
        list(enumerate(urls)), "doc_id long, url string"
    )
    got = {r.url: r.normalized_url for r in normalize_urls(d).collect()}
    assert len(got) == len(set(urls))
    for u in urls:
        assert got[u] == ref(u), (u, got[u], ref(u))
    # idempotence over every distinct output
    outs = sorted(set(got.values()))
    d2 = spark.createDataFrame(
        list(enumerate(outs)), "doc_id long, url string"
    )
    assert normalize_urls(d2).where("changed").count() == 0


def test_url_normalize_plan_is_narrow(spark):
    from dd_ops_ocr_spark.operators.urlops import q_url_normalize

    df = q_url_normalize(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, f"url_normalize grew a shuffle:\n{plan[:2000]}"
