"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (its dedup is the PubSub deliveryAttempt
guard, api/main.py:496-501); these are the standard corpus-dedup suite a
100 TB pipeline needs, built Spark-first:

  * exact dedup       — hash groupBy, one shuffle on the digest
  * MinHash signature — shingle -> per-seed min of md5(seed|shingle);
                        portable across engines because md5 hex strings
                        compare lexicographically == numerically
  * LSH banding       — band key = md5 of the band's signature; a
                        bucket-join (groupBy having count>1) yields
                        candidate pairs WITHOUT the O(n^2) cross join
  * n-gram Jaccard    — exact verify on LSH candidates only

At scale: the shingle explode is map-side only; the signature agg is one
shuffle keyed by doc; LSH buckets replace the quadratic pair join — the
same plan shape published for web-scale near-dedup (MinHashLSH).

The test corpus has no full duplicates, so dedup queries union in exact
copies (doc_id + 10_000_000) — both engines apply the identical union, so
every query is still oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

N_MINHASH = 4
# 8-char shingles: 3-grams of natural-ish text are so widely shared that
# LSH stops pruning (measured at sf0.1: 3.76M candidate pairs from 5,250
# docs with 3-grams vs 30k with 8-grams — 123x). Long shingles keep
# unrelated docs' Jaccard near zero while exact/near copies stay at ~1.
SHINGLE = 8
COPY_OFFSET = 10_000_000


def _docs_with_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents plus exact copies of every 20th doc (guaranteed dup pairs)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + COPY_OFFSET).alias("doc_id"), "text"
    )
    return d.unionByName(copies)


_SQL_DOCS_WITH_COPIES = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {COPY_OFFSET} AS doc_id, text FROM documents
  WHERE doc_id % 20 = 0
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5(text) -> keeper = min(doc_id), n_copies.
    One hash-agg shuffle keyed by digest; keeper selection is an agg,
    not a window, so no second shuffle."""
    d = _docs_with_copies(spark, sf_dir)
    return (
        d.select("doc_id", F.md5("text").alias("digest"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


SQL_DEDUP_EXACT = f"""
WITH d AS ({_SQL_DOCS_WITH_COPIES})
SELECT md5(text) AS digest, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
FROM d
GROUP BY md5(text)
HAVING COUNT(*) > 1
"""


def _shingles(d: DataFrame) -> DataFrame:
    """Explode each doc into its character SHINGLE-grams (distinct).
    Map-side only — no shuffle until the signature agg."""
    return d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(1, length(text) - {SHINGLE - 1})),"
                    f" i -> substring(text, i, {SHINGLE}))"
                )
            )
        ).alias("sh"),
    )


_SQL_SHINGLES = f"""
  SELECT DISTINCT doc_id, substr(text, CAST(t.i AS INT), {SHINGLE}) AS sh
  FROM d, UNNEST(range(1, GREATEST(1, LENGTH(text) - {SHINGLE - 1}) + 1)) AS t(i)
"""


def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature: mh_j = min over shingles of md5(j || '|' || sh).
    md5 hex is lowercase fixed-width, so string MIN == numeric MIN — the
    trick that makes the signature engine-portable."""
    d = _docs_with_copies(spark, sf_dir)
    sh = _shingles(d)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("sh")))).alias(f"mh{j}")
        for j in range(N_MINHASH)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


SQL_MINHASH_SIGNATURE = f"""
WITH d AS ({_SQL_DOCS_WITH_COPIES}),
sh AS ({_SQL_SHINGLES})
SELECT doc_id,
       {", ".join(f"MIN(md5('{j}|' || sh)) AS mh{j}" for j in range(N_MINHASH))}
FROM sh
GROUP BY doc_id
"""


def q_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding over the MinHash signature: band0 = md5(mh0|mh1),
    band1 = md5(mh2|mh3); docs sharing any band bucket are candidates.
    Self-join per bucket (buckets are tiny) replaces the O(n^2) pair join."""
    sig = q_minhash_signature(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                # F.concat, not concat_ws: concat propagates NULL like the
                # oracle's '||', so a NULL-text doc gets a NULL bucket
                # (excluded by the join) in BOTH engines.
                F.md5(F.concat(F.lit("b0|"), F.col("mh0"), F.lit("|"), F.col("mh1"))),
                F.md5(F.concat(F.lit("b1|"), F.col("mh2"), F.lit("|"), F.col("mh3"))),
            )
        ).alias("bucket"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, "bucket")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


SQL_LSH_CANDIDATE_PAIRS = f"""
WITH d AS ({_SQL_DOCS_WITH_COPIES}),
sh AS ({_SQL_SHINGLES}),
sig AS (
  SELECT doc_id,
         {", ".join(f"MIN(md5('{j}|' || sh)) AS mh{j}" for j in range(N_MINHASH))}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, md5('b0' || '|' || mh0 || '|' || mh1) AS bucket FROM sig
  UNION ALL
  SELECT doc_id, md5('b1' || '|' || mh2 || '|' || mh3) AS bucket FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b USING (bucket)
WHERE a.doc_id < b.doc_id
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard verification on the LSH candidate pairs:
    |A ∩ B| / |A ∪ B| over distinct shingles. Runs only on candidates —
    the scale-correct pattern (LSH prunes, Jaccard verifies)."""
    d = _docs_with_copies(spark, sf_dir)
    sh = _shingles(d)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pairs = q_lsh_candidate_pairs(spark, sf_dir)
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        pairs.join(a, "doc_a")
        .join(b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "raw_j",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("raw_j") >= 0.8)
        .select("doc_a", "doc_b", F.round(F.col("raw_j"), 6).alias("jaccard"))
    )
    return out


SQL_NGRAM_JACCARD = f"""
WITH d AS ({_SQL_DOCS_WITH_COPIES}),
sh AS ({_SQL_SHINGLES}),
sig AS (
  SELECT doc_id,
         {", ".join(f"MIN(md5('{j}|' || sh)) AS mh{j}" for j in range(N_MINHASH))}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, md5('b0' || '|' || mh0 || '|' || mh1) AS bucket FROM sig
  UNION ALL
  SELECT doc_id, md5('b1' || '|' || mh2 || '|' || mh3) AS bucket FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (bucket)
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter), 6)
         AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.8
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    candidate pairs (LSH -> Jaccard >= 0.8), via iterative min-label
    propagation — the keep-one-per-cluster step of corpus dedup.

    Spark side: driver-controlled loop of join + min-aggregate rounds
    until fixpoint (components here are tiny; rounds <= O(diameter)).
    Each round is one shuffle over the edge set only — the classic
    large-graph CC pattern without any graph library. DuckDB oracle:
    recursive CTE computing min reachable node id — both sides converge
    to cluster_id = min(doc_id in component)."""
    pairs = q_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b").cache()
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).toDF("src", "dst")
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lab", F.col("doc_id"))
    )
    for _ in range(16):  # diameter bound; components are near-cliques
        prop = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("lab").alias("nlab"))
        )
        new = (
            labels.join(prop, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("lab"), F.coalesce("nlab", "lab")).alias("lab"),
            )
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.lab") < F.col("o.lab"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    sizes = labels.groupBy("lab").agg(F.count("*").alias("cluster_size"))
    return (
        labels.join(sizes, "lab")
        .select("doc_id", F.col("lab").alias("cluster_id"), "cluster_size")
    )


SIMHASH_BITS = 60  # 15 hex chars of md5 -> reproducible in pure Python


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprint, entirely JVM-side:
    tokens -> 60-bit hash via conv(md5[:15], 16, 10) -> per-bit +/-1 vote
    sums -> sign bits assembled with shift/or. No Python in the plan; the
    per-bit votes are 60 agg columns (codegen'd), not a 60x explode.
    Driver-checked against SQL_SIMHASH; pytest additionally cross-checks
    a pure-Python oracle (tests/test_nonsql_ops.py)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    toks = toks.select("doc_id", h.alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sim = sim.bitwiseOR(
            F.when(F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b))
            .otherwise(F.lit(0).cast("long"))
        )
    return agg.select("doc_id", sim.alias("simhash"))


_SQL_VERIFIED_PAIRS = f"""
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.sh = sa.sh
  GROUP BY p.doc_a, p.doc_b
),
vpairs AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes za ON za.doc_id = i.doc_a
  JOIN sizes zb ON zb.doc_id = i.doc_b
  WHERE CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) >= 0.8
)"""

SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE d AS ({_SQL_DOCS_WITH_COPIES}),
sh AS ({_SQL_SHINGLES}),
sig AS (
  SELECT doc_id,
         {", ".join(f"MIN(md5('{j}|' || sh)) AS mh{j}" for j in range(N_MINHASH))}
  FROM sh GROUP BY doc_id
),
bands AS (
  SELECT doc_id, md5('b0' || '|' || mh0 || '|' || mh1) AS bucket FROM sig
  UNION ALL
  SELECT doc_id, md5('b1' || '|' || mh2 || '|' || mh3) AS bucket FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b USING (bucket)
  WHERE a.doc_id < b.doc_id
),
{_SQL_VERIFIED_PAIRS},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM vpairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM vpairs
),
reach(doc_id, lab) AS (
  SELECT DISTINCT src AS doc_id, src AS lab FROM edges
  UNION
  SELECT e.dst AS doc_id, r.lab
  FROM reach r JOIN edges e ON e.src = r.doc_id
),
comp AS (
  SELECT doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY doc_id
)
SELECT c.doc_id, c.cluster_id, s.cluster_size
FROM comp c
JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
      FROM comp GROUP BY cluster_id) s USING (cluster_id)
"""


HAM_CHUNKS = 4          # 60 bits -> 4 chunks of 15
HAM_MAX_DIST = 3        # pigeonhole: d <= 3 diffs over 4 chunks -> >= 1 equal


def _simhash_over(d: DataFrame) -> DataFrame:
    """SimHash signature for an arbitrary (doc_id, text) DataFrame —
    same 60-bit JVM-side construction as q_simhash."""
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    toks = toks.select("doc_id", h.alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sim = sim.bitwiseOR(
            F.when(F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b))
            .otherwise(F.lit(0).cast("long"))
        )
    return agg.select("doc_id", sim.alias("simhash"))


def q_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs at Hamming distance <= HAM_MAX_DIST,
    found with EXACT banding: the 60-bit signature splits into HAM_CHUNKS
    15-bit chunks, and by pigeonhole any pair within distance 3 shares at
    least one chunk — so the chunk-bucket self-join (no O(n^2) pair join)
    is complete, not probabilistic. The DuckDB oracle verifies against
    the brute all-pairs Hamming scan; both must agree exactly."""
    sig = _simhash_over(_docs_with_copies(spark, sf_dir))
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("c"),
                    F.shiftright("simhash", 15 * c).bitwiseAND(F.lit(0x7FFF))
                    .alias("val"),
                )
                for c in range(HAM_CHUNKS)
            ])
        ).alias("ch"),
    ).select("doc_id", "simhash", "ch.c", "ch.val")
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"), "c", "val"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"), "c", "val"
    )
    return (
        a.join(b, ["c", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= HAM_MAX_DIST)
        .distinct()
    )


_SQL_SIMHASH_OVER_D = f"""
  SELECT doc_id,
         CAST({" + ".join(
             f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END"
             for b in range(SIMHASH_BITS)
         )} AS BIGINT) AS simhash
  FROM (
    SELECT doc_id,
           {", ".join(
               f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
               for b in range(SIMHASH_BITS)
           )}
    FROM (
      SELECT doc_id,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
      FROM (
        SELECT doc_id,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS tok
        FROM d
      ) WHERE LENGTH(tok) > 0
    ) GROUP BY doc_id
  )
"""

# Brute all-pairs Hamming verification — the banding above must equal it
# exactly (pigeonhole completeness at distance <= 3).
SQL_SIMHASH_HAMMING_PAIRS = f"""
WITH d AS ({_SQL_DOCS_WITH_COPIES}),
sims AS ({_SQL_SIMHASH_OVER_D})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAM_MAX_DIST}
"""


# DuckDB twin of q_simhash: hex->int via '0x' cast (== Spark's conv 16->10
# on the 15-char md5 prefix), per-bit +/-1 vote sums, and the sign bits
# re-assembled as a SUM of disjoint powers of two (== the bitwise OR).
SQL_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id,
           UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS tok
    FROM documents
  ) WHERE LENGTH(tok) > 0
), h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM toks
), votes AS (
  SELECT doc_id,
         {", ".join(
             f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
             for b in range(SIMHASH_BITS)
         )}
  FROM h GROUP BY doc_id
)
SELECT doc_id,
       CAST({" + ".join(
           f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END"
           for b in range(SIMHASH_BITS)
       )} AS BIGINT) AS simhash
FROM votes
"""


QUERIES = {
    "dedup_clusters": q_dedup_clusters,
    "dedup_exact": q_dedup_exact,
    "simhash": q_simhash,
    "simhash_hamming_pairs": q_simhash_hamming_pairs,
    "minhash_signature": q_minhash_signature,
    "lsh_candidate_pairs": q_lsh_candidate_pairs,
    "ngram_jaccard": q_ngram_jaccard,
}

ORACLE_SQL = {
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "simhash": SQL_SIMHASH,
    "simhash_hamming_pairs": SQL_SIMHASH_HAMMING_PAIRS,
    "minhash_signature": SQL_MINHASH_SIGNATURE,
    "lsh_candidate_pairs": SQL_LSH_CANDIDATE_PAIRS,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
}
