"""Containment dedup (operators/dedup.py containment_pairs): the
asymmetric near-dup flavor — quotes/subset docs Jaccard misses."""

from __future__ import annotations


# ----------------------------------------------------- containment

def test_containment_quote_pair_found_jaccard_blind(spark):
    """A doc fully quoted inside a larger doc: containment = 1.0 in
    the contained direction while Jaccard sits far below the 0.8
    near-dup gate — the pair ngram_jaccard structurally misses."""
    from dd_ops_ocr_spark.operators.dedup import containment_pairs

    quoted = "alpha bravo charlie delta echo foxtrot golf hotel"
    filler = " ".join(f"zz{i}qq{i}ww{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, quoted),
            (2, quoted + " " + filler),
            (3, "november oscar papa quebec romeo sierra tango"),
        ],
        "doc_id long, text string",
    )
    rows = containment_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.c_a_in_b == 1.0
    assert r.jaccard < 0.8


def test_containment_direction_reversed(spark):
    """Container with the SMALLER doc_id: the b-in-a direction fires."""
    from dd_ops_ocr_spark.operators.dedup import containment_pairs

    quoted = "alpha bravo charlie delta echo foxtrot golf hotel"
    filler = " ".join(f"zz{i}qq{i}ww{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, quoted + " " + filler), (2, quoted)],
        "doc_id long, text string",
    )
    rows = containment_pairs(docs).collect()
    assert len(rows) == 1
    assert rows[0].c_b_in_a == 1.0
    assert rows[0].c_a_in_b < 1.0


def test_containment_unrelated_docs_no_pair(spark):
    from dd_ops_ocr_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot"),
            (2, "november oscar papa quebec romeo sierra"),
        ],
        "doc_id long, text string",
    )
    assert containment_pairs(docs).count() == 0


def test_containment_blocking_skew_bound(spark):
    """A shingle shared by MORE than RARE_DF docs is excluded from
    blocking (the by-construction skew bound) — docs related ONLY
    through such a hot shingle never become candidates."""
    from dd_ops_ocr_spark.operators.dedup import RARE_DF, containment_pairs

    hot = "identical hot shingle content everywhere"
    docs = spark.createDataFrame(
        [(i, hot + f" unique tail {i} " + " ".join(
            f"u{i}x{j}" for j in range(20)))
         for i in range(RARE_DF + 3)],
        "doc_id long, text string",
    )
    # every pair shares the hot prefix's shingles, but those have
    # df = RARE_DF+3 > RARE_DF, and the tails are disjoint
    for r in containment_pairs(docs).collect():
        # any surviving pair must have qualified through ≥3 RARE
        # shared shingles, impossible here
        raise AssertionError(f"unexpected candidate pair {r}")


# ---------------------------------------------------------- fuzzy match

def test_fuzzy_substitution_anywhere_is_found(spark):
    """Pigeonhole completeness: a single substitution at ANY position
    of the 16-char key leaves prefix-6 or suffix-6 intact, so every
    typo twin is found; distance-2 pairs split across both blocks are
    the documented recall seam."""
    from dd_ops_ocr_spark.operators.dedup import fuzzy_match_names

    base = "rec-0123456789ab"
    rows = [(0, base)]
    # one twin per substitution position
    for i in range(16):
        mutated = base[:i] + ("z" if base[i] != "z" else "q") + base[i + 1:]
        rows.append((100 + i, mutated))
    recs = spark.createDataFrame(rows, "rec_id long, name string")
    pairs = {(r.rec_a, r.rec_b) for r in fuzzy_match_names(recs).collect()}
    for i in range(16):
        assert (0, 100 + i) in pairs, f"substitution at {i} missed"


def test_fuzzy_no_false_positives_and_dist_exact(spark):
    from dd_ops_ocr_spark.operators.dedup import fuzzy_match_names

    recs = spark.createDataFrame(
        [
            (1, "rec-aaaaaaaaaaaa"),
            (2, "rec-aaaaaaaaaaab"),   # dist 1 -> pair
            (3, "rec-aaaaaaaaccdd"),   # dist 4 from 1, shares prefix
            (4, "xyz-bbbbbbbbbbbb"),   # unrelated
        ],
        "rec_id long, name string",
    )
    rows = fuzzy_match_names(recs).collect()
    assert {(r.rec_a, r.rec_b, r.dist) for r in rows} == {(1, 2, 1)}


def test_fuzzy_planted_twins_all_matched(spark):
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.dedup import (
        FUZZY_OFFSET,
        q_fuzzy_match_names,
    )

    rows = q_fuzzy_match_names(spark, SF_SMOKE).collect()
    planted = {
        (r.rec_a, r.rec_b) for r in rows if r.rec_b >= FUZZY_OFFSET
    }
    import duckdb
    n_expected = duckdb.connect().execute(
        f"SELECT count(*) FROM '{SF_SMOKE}/documents.parquet' WHERE doc_id % 30 = 0"
    ).fetchone()[0]
    assert {(a, b - FUZZY_OFFSET) for a, b in planted} >= {
        (d, d) for d in range(0, 1)
    }  # sanity shape
    assert len([p for p in planted if p[1] - FUZZY_OFFSET == p[0]]) == n_expected


def test_jaccard_join_exact_equals_bruteforce(spark):
    """The exactness claim that separates this from LSH: on a corpus
    with planted near-dups, borderline pairs, and random noise, the
    prefix-filtered join must equal the O(n^2) referee EXACTLY —
    complete (no missed pair, the prefix-filtering lemma) AND precise
    (no pair below threshold)."""
    import itertools

    from dd_ops_ocr_spark.operators.dedup import (
        JACC_DEN,
        JACC_NUM,
        jaccard_join_exact,
    )

    def words(i, k):
        return [f"w{(i * 7 + j * 13) % 97}" for j in range(k)]

    docs = []
    # random-ish base docs of varied sizes
    for i in range(60):
        docs.append((i, " ".join(words(i, 8 + i % 9))))
    # near-dup twins: one extra unique token (J = n/(n+1))
    for i in range(0, 60, 10):
        docs.append((1000 + i, docs[i][1] + f" uniq{i}"))
    # borderline: exactly 4 of 5 tokens shared (J = 4/6 < 0.8, excluded)
    docs.append((2000, "a b c d e"))
    docs.append((2001, "a b c d x"))
    # exactly at threshold: 4 shared of 4+1 union=5 -> J=0.8 included
    docs.append((2002, "p q r s"))
    docs.append((2003, "p q r s t"))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.n_inter, r.n_a, r.n_b)
        for r in jaccard_join_exact(df).collect()
    }

    sets = {i: frozenset(t.split()) for i, t in docs}
    ref = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        if (JACC_DEN + JACC_NUM) * inter >= JACC_NUM * (len(sa) + len(sb)):
            ref[(a, b)] = (inter, len(sa), len(sb))
    assert got == ref
    assert (2002, 2003) in got and (2000, 2001) not in got
    assert any(b >= 1000 for _, b in got)  # planted twins found


def test_entity_resolution_transitive_and_singletons(spark):
    """A-B and B-C fuzzy matches must merge into ONE entity (min id);
    unmatched records stay singletons with entity_id = own rec_id."""
    from dd_ops_ocr_spark.operators.dedup import (
        connected_components,
        fuzzy_match_names,
    )
    from pyspark.sql import functions as F

    # chain: n1 -e-> n2 -e-> n3 (each one substitution apart), n4 alone
    rows = [
        (1, "rec-aaaaaaaaaaaa"),
        (2, "rec-aaaaaaaaaaab"),
        (3, "rec-aaaaaaaaaabb"),
        (4, "rec-zzzzzzzzzzzz"),
    ]
    recs = spark.createDataFrame(rows, "rec_id long, name string")
    pairs = fuzzy_match_names(recs).select(
        F.col("rec_a").alias("doc_a"), F.col("rec_b").alias("doc_b")
    )
    labels = {
        r.doc_id: r.lab for r in connected_components(pairs).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1}  # transitive chain, min label
    # the registered query keeps singletons: emulate its left-join tail
    ent = recs.join(
        connected_components(pairs).select(
            F.col("doc_id").alias("rec_id"), "lab"),
        "rec_id", "left",
    ).select("rec_id", F.coalesce("lab", F.col("rec_id")).alias("entity_id"))
    got = {r.rec_id: r.entity_id for r in ent.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4}
