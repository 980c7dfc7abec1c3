"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:

  * brute-force cosine top-k — the exactness baseline. The query set is
    small and broadcast; candidates stream map-side; only the final
    top-k window shuffles (keyed by query, k rows per query survive the
    partial window). Dot products are computed as IN-ORDER float64 folds
    (F.aggregate over zip_with), which makes them bit-identical to
    DuckDB's list_dot_product(CAST AS DOUBLE[])) — verified exact, so
    the oracle comparison needs no tolerance.

  * LSH-bucketed ANN — the scale path: random-hyperplane sign bits
    (deterministic splitmix64 planes) computed by a vectorized numpy
    matmul inside mapInPandas; candidates only within matching buckets,
    exact cosine re-rank after. No O(n^2) pair join. Covered by a pytest
    numpy oracle (hyperplane arithmetic is not SQL-expressible).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

TOP_K = 5
QUERY_MOD = 50  # queries = vec_id % 50 == 0
N_PLANES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _dot(a, b):
    """In-order float64 fold — deterministic, engine-portable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def q_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per query vector (queries broadcast)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cands = emb.select(F.col("vec_id").alias("neighbor_id"), "v")
    joined = cands.crossJoin(F.broadcast(queries)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv")))
        * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        joined.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", F.round("sim", 9).alias("sim"))
    )


SQL_ANN_BRUTE_TOPK = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % {QUERY_MOD} = 0
), sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(q.qv, e.v)
           / (SQRT(list_dot_product(q.qv, q.qv))
              * SQRT(list_dot_product(e.v, e.v))) AS sim
  FROM q, e
  WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, rank, neighbor_id, ROUND(sim, 9) AS sim
FROM ranked WHERE rank <= {TOP_K}
"""


def _planes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes via splitmix64. The first 8
    planes are shared by every consumer (same seeding formula), so the
    single-band ANN buckets and band 0 of the multi-band dedup agree."""
    from dd_ops_ocr_spark.corpus import mix64

    vals = np.array(
        [mix64(j * 100_003 + i) for j in range(n_planes) for i in range(dim)],
        dtype=np.float64,
    )
    return (vals / 2.0**64 - 0.5).reshape(n_planes, dim)


def lsh_signatures(df: DataFrame, dim: int = 64, n_bands: int = 2) -> DataFrame:
    """Banded sign-bit buckets via vectorized numpy matmul (mapInPandas):
    (vec_id, band, bucket) — each band hashes N_PLANES further planes,
    and a pair is a near-dup candidate if ANY band bucket matches
    (MinHash-LSH banding applied to hyperplane bits). This is the
    throughput variant (matmul); when bucket values must be bit-identical
    across engines use ``lsh_signatures_jvm`` (in-order folds) instead —
    numpy's pairwise summation can flip near-zero signs."""
    planes = _planes(dim, N_PLANES * n_bands)

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["v"].to_numpy())  # (n, dim) float64
            bits = (m @ planes.T) >= 0  # (n, N_PLANES * n_bands)
            shifts = np.arange(N_PLANES, dtype=np.uint32)
            out = []
            for b in range(n_bands):
                band_bits = bits[:, b * N_PLANES : (b + 1) * N_PLANES]
                bucket = (band_bits.astype(np.uint32) << shifts).sum(axis=1)
                out.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"].to_numpy(),
                            "band": np.full(len(pdf), b, dtype="int32"),
                            "bucket": bucket.astype("int32"),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return df.mapInPandas(sig, schema="vec_id long, band int, bucket int")


def _plane_dot_col(plane: np.ndarray) -> F.Column:
    """Explicit left-associated dot product v[0]*c0 + v[1]*c1 + ... —
    codegen'd (no HOF lambda), and bit-identical to an in-order float64
    fold, i.e. to DuckDB's list_dot_product. This is what makes the LSH
    bucket assignment engine-portable and the query oracle-checkable."""
    acc = F.col("v").getItem(0) * float(plane[0])
    for i in range(1, len(plane)):
        acc = acc + F.col("v").getItem(i) * float(plane[i])
    return acc


def lsh_signatures_jvm(df: DataFrame, dim: int = 64) -> DataFrame:
    """(vec_id, v) -> + sign-bit ``bucket``, entirely JVM-side: one
    explicit dot per plane, bucket = sum of (bit << j). Exact twin of the
    SQL oracle's arithmetic."""
    planes = _planes(dim)
    bucket = F.lit(0)
    for j in range(N_PLANES):
        bucket = bucket + F.when(
            _plane_dot_col(planes[j]) >= 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket.cast("int"))


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: candidates restricted to the query's sign-bucket,
    exact cosine re-rank, top-3 per query. The sign bits are computed as
    explicit in-order float64 sums (codegen, no Python), which makes them
    bit-identical to the DuckDB oracle's — so the whole query is
    hash-checked by the driver, and pytest additionally checks an
    independent pure-Python in-order reference."""
    emb = _emb(spark, sf_dir)
    embs = lsh_signatures_jvm(emb)
    queries = embs.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cands = embs.select(
        F.col("vec_id").alias("neighbor_id"), "v", F.col("bucket").alias("cbucket")
    )
    joined = cands.join(
        F.broadcast(queries),
        (F.col("cbucket") == F.col("qbucket"))
        & (F.col("neighbor_id") != F.col("query_id")),
    )
    sim = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv")))
        * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        joined.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id", F.round("sim", 9).alias("sim"))
    )


def _plane_dot_sql(plane: np.ndarray) -> str:
    """DuckDB twin of _plane_dot_col (1-based list indexing; repr floats
    round-trip to the identical binary64)."""
    return " + ".join(f"v[{i + 1}]*({float(plane[i])!r})" for i in range(len(plane)))


def _lsh_bucket_sql(dim: int = 64) -> str:
    planes = _planes(dim)
    return " + ".join(
        f"(CASE WHEN {_plane_dot_sql(planes[j])} >= 0 THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    )


SQL_ANN_LSH_TOPK = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), sig AS (
  SELECT vec_id, v, ({_lsh_bucket_sql()}) AS bucket FROM e
), q AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM sig
  WHERE vec_id % {QUERY_MOD} = 0
), sims AS (
  SELECT q.query_id, s.vec_id AS neighbor_id,
         list_dot_product(q.qv, s.v)
           / (SQRT(list_dot_product(q.qv, q.qv))
              * SQRT(list_dot_product(s.v, s.v))) AS sim
  FROM q JOIN sig s ON s.bucket = q.bucket AND s.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, rank, neighbor_id, ROUND(sim, 9) AS sim
FROM ranked WHERE rank <= 3
"""


N_CELLS = 16
KMEANS_ITERS = 5
# Probe count targets recall@3 >= 0.9 (tests/test_nonsql_ops.py asserts
# it). The synthetic embeddings are CLUSTERLESS — the worst case for a
# coarse quantizer, where recall grows ~linearly with the probed
# fraction. Measured operating curves (vs exact brute top-3):
#   clusterless, sf0.01 corpus (production constant tuned here):
#     N_PROBE  4 -> 0.60 | 6 -> 0.73 | 8 -> 0.83 | 10 -> 0.87 | 12 -> 0.97
#   planted-Gaussian clustered corpus (16 cells, seeded; the same IVF
#   math via tests/test_nonsql_ops.py::test_ivf_recall_curve_*):
#     N_PROBE  1 -> 0.99 | 2 -> 1.00
# The two curves are the tuning methodology: real corpora with cluster
# structure hit the target at N_PROBE 1-4; tune per corpus against a
# measured curve, don't copy the worst-case constant.
N_PROBE = 12


def _ivf_centroids(vecs: np.ndarray) -> np.ndarray:
    """Deterministic k-means: seeds = first N_CELLS vectors by id order,
    fixed iteration count, ties broken by lowest cell index. No RNG."""
    c = vecs[:N_CELLS].copy()
    for _ in range(KMEANS_ITERS):
        d = ((vecs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(c)):
            m = assign == j
            if m.any():
                c[j] = vecs[m].mean(axis=0)
    return c


def _seq_sq_norm(c: np.ndarray) -> float:
    """Strict left-to-right sum of squares — the ONE value both engines
    see as a literal (no cross-engine float summation to match)."""
    acc = 0.0
    for x in c:
        acc += float(x) * float(x)
    return acc


def train_ivf_centroids_local(sf_dir: str) -> np.ndarray:
    """The same bounded training the Spark query does, without Spark
    (pyarrow read of the first 512 vectors by vec_id): parquet float32 ->
    float64 widening is exact in both readers, so the centroids are
    bit-identical — this is what lets the DuckDB oracle bake the SAME
    literals."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    t = t.sort_values("vec_id").head(512)
    return _ivf_centroids(np.stack(t["embedding"].to_numpy()).astype(np.float64))


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN — the other scale path the LSH variant complements:
    a deterministic k-means coarse quantizer (trained on the driver from
    a bounded 512-row sample), with the trained centroids baked into the
    plan as LITERALS. Cell assignment and probe selection are pure
    map-side JVM expressions: score_j = ||c_j||^2 - 2*<v, c_j> (the
    ||v||^2 term is row-constant, so argmin is unchanged), with the dot
    product as an in-order float64 fold — bit-identical to DuckDB's
    list_dot_product, which is what makes this query fully
    hash-checkable against SQL_ANN_IVF (the literals, the fold order,
    and the tie-breaks all match). Search then restricts to the query's
    N_PROBE nearest cells with an exact cosine re-rank top-3 (recall@3
    vs brute asserted >= 0.6 in tests/test_nonsql_ops.py)."""
    emb = _emb(spark, sf_dir)
    # bounded training sample, deterministic order
    sample = emb.orderBy("vec_id").limit(512).collect()
    vecs = np.array([r["v"] for r in sample], dtype=np.float64)
    centroids = _ivf_centroids(vecs)

    structs = []
    for j, c in enumerate(centroids):
        cv = F.array(*[F.lit(float(x)) for x in c])
        score = F.lit(_seq_sq_norm(c)) - F.lit(2.0) * _dot(F.col("v"), cv)
        structs.append(F.struct(score.alias("s"), F.lit(j).alias("c")))
    scored = emb.select("vec_id", "v", F.array(*structs).alias("sc"))
    # argmin / top-N_PROBE via struct ordering (score, then cell) — the
    # same tie-break as the oracle's ORDER BY s, cell; both map-side.
    assigned = scored.select(
        "vec_id", "v", F.array_min("sc")["c"].alias("cell")
    )
    probes = (
        scored.filter(F.col("vec_id") % QUERY_MOD == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.slice(F.array_sort("sc"), 1, N_PROBE)).alias("p"),
        )
        .select("query_id", F.col("p.c").alias("cell"))
    )
    qv = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cand = (
        probes.join(
            assigned.select(F.col("vec_id").alias("neighbor_id"), "v", "cell"),
            "cell",
        )
        .join(F.broadcast(qv), "query_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sim = _dot(F.col("qv"), F.col("v")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv")))
        * F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        cand.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                "neighbor_id", F.round("sim", 9).alias("sim"))
    )


def ann_ivf_oracle_sql(sf_dir: str) -> str:
    """DuckDB twin of q_ann_ivf_topk: the same trained centroids as
    VALUES literals, the same score formula over list_dot_product, the
    same (score, cell) tie-breaks, probe join, and cosine re-rank."""
    cents = train_ivf_centroids_local(sf_dir)
    rows = []
    for j, c in enumerate(cents):
        lst = ", ".join(repr(float(x)) for x in c)
        rows.append(f"({j}, {repr(_seq_sq_norm(c))}, [{lst}]::DOUBLE[])")
    values = ",\n  ".join(rows)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent(cell, c2, cv) AS (VALUES {values}),
scored AS (
  SELECT e.vec_id, e.v, c.cell,
         c.c2 - 2.0 * list_dot_product(e.v, c.cv) AS s
  FROM e, cent c
),
assign AS (
  SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cell) AS rn
    FROM scored) WHERE rn = 1
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT vec_id AS query_id, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cell) AS rn
    FROM scored WHERE vec_id % {QUERY_MOD} = 0) WHERE rn <= {N_PROBE}
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % {QUERY_MOD} = 0),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a USING (cell)
  WHERE a.vec_id <> p.query_id
),
sims AS (
  SELECT c.query_id, c.neighbor_id,
         list_dot_product(q.qv, a.v)
           / (SQRT(list_dot_product(q.qv, q.qv))
              * SQRT(list_dot_product(a.v, a.v))) AS sim
  FROM cand c
  JOIN q USING (query_id)
  JOIN assign a ON a.vec_id = c.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
       ROUND(sim, 9) AS sim
FROM ranked WHERE rank <= 3
"""


def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norms and dims — sanity surface for the vector
    column, and a portable agg (in-order folds, ints, exact doubles)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    norm2 = _dot(F.col("v"), F.col("v"))
    return (
        emb.select("label", F.size("v").cast("long").alias("dim"), norm2.alias("n2"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.min("dim").alias("min_dim"),
            F.max("dim").alias("max_dim"),
            F.round(F.min("n2"), 9).alias("min_norm2"),
            F.round(F.max("n2"), 9).alias("max_norm2"),
        )
    )


SQL_EMBEDDING_STATS = """
WITH e AS (
  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), s AS (
  SELECT label, LEN(v) AS dim, list_dot_product(v, v) AS n2 FROM e
)
SELECT label, COUNT(*) AS n_vecs,
       MIN(dim) AS min_dim, MAX(dim) AS max_dim,
       ROUND(MIN(n2), 9) AS min_norm2, ROUND(MAX(n2), 9) AS max_norm2
FROM s
GROUP BY label
"""


COPY_OFF = 1_000_000


DEDUP_BANDS = 2  # 2 bands x 8 sign bits


def _dedup_candidates_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") % 10 == 0)
    copies = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + COPY_OFF).alias("vec_id"), "v"
    )
    return emb.unionByName(copies)


def _cosine_pairs(pairs: DataFrame) -> DataFrame:
    sim = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va")))
        * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    return (
        pairs.select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= 0.99)
        .select("id_a", "id_b", F.round("sim", 9).alias("sim"))
    )


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection at scale: candidates come
    from banded hyperplane-LSH buckets (DEDUP_BANDS bands x N_PLANES sign
    bits; a pair is a candidate iff some band bucket matches — the
    MinHash-LSH banding shape, no O(n^2) pair join, plan-asserted
    CartesianProduct-free in tests/test_plan_shape.py), then exact cosine
    on candidates only.

    Equality with the brute all-pairs pass (the DuckDB oracle and
    ``dedup_embedding_brute``): identical vectors collide in every band,
    and the corpus' qualifying pairs are exactly the planted copies (the
    nearest non-copy pair is at cosine 0.43, verified in
    tests/test_nonsql_ops.py) — so bucketed == brute here. Probabilistic
    recall at the 0.99 threshold for non-identical near-dups is
    1 - (1 - 0.955^8)^2 ≈ 0.90 per band pair; add bands to taste."""
    allv = _dedup_candidates_base(spark, sf_dir)
    sigs = lsh_signatures(allv, n_bands=DEDUP_BANDS)
    tagged = allv.join(sigs, "vec_id")
    a = tagged.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "band", "bucket"
    )
    b = tagged.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "band", "bucket"
    )
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "va", "id_b", "vb")
        .dropDuplicates(["id_a", "id_b"])
    )
    return _cosine_pairs(cand)


def dedup_embedding_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs exactness baseline (the pytest oracle for the bucketed
    path above). O(n^2) — never the registered scale path."""
    allv = _dedup_candidates_base(spark, sf_dir)
    a = allv.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = allv.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("id_a") < F.col("id_b"))
    return _cosine_pairs(pairs)


SQL_DEDUP_EMBEDDING_COSINE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id % 10 = 0
), allv AS (
  SELECT vec_id, v FROM e
  UNION ALL
  SELECT vec_id + {COPY_OFF} AS vec_id, v FROM e WHERE vec_id % 50 = 0
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v)
           / (SQRT(list_dot_product(a.v, a.v))
              * SQRT(list_dot_product(b.v, b.v))) AS sim
  FROM allv a, allv b
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND(sim, 9) AS sim
FROM pairs WHERE sim >= 0.99
"""


# --------------------------------------------------------------- SemDeDup

SEMDEDUP_TAU = 0.99       # within-cluster cosine above this = semantic dup
SEMDEDUP_SAMPLE = 512     # bounded driver-side k-means training sample


def train_semdedup_centroids_local(sf_dir: str) -> np.ndarray:
    """pyarrow twin of q_semdedup's bounded training sample: the SAME
    base corpus (vec_id%10 originals + vec_id%50 planted copies at
    +COPY_OFF), sorted by vec_id, first SEMDEDUP_SAMPLE rows — so the
    DuckDB oracle can bake bit-identical centroid literals (float32 ->
    float64 widening is exact in both readers)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas()
    base = t[t["vec_id"] % 10 == 0][["vec_id", "embedding"]]
    copies = base[base["vec_id"] % 50 == 0].copy()
    copies["vec_id"] = copies["vec_id"] + COPY_OFF
    allv = (
        pd.concat([base, copies]).sort_values("vec_id").head(SEMDEDUP_SAMPLE)
    )
    return _ivf_centroids(
        np.stack(allv["embedding"].to_numpy()).astype(np.float64)
    )


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = k-means cluster the embeddings, then compare pairs
    ONLY within a cluster and drop every vector that has a lower-id
    within-cluster neighbor at cosine >= SEMDEDUP_TAU. The cluster step
    is what makes semantic dedup tractable at corpus scale: the pair
    join is per-cell (the paper's O(n^2/k) bound), never corpus-wide.

    Spark shape: the deterministic k-means (same _ivf_centroids as the
    IVF index: id-ordered seeds, fixed iterations, no RNG) trains on a
    BOUNDED driver-side sample; the trained centroids enter the plan as
    LITERALS, so cell assignment is a pure map-side JVM expression (the
    IVF trick — score_j = ||c_j||^2 - 2<v,c_j>, in-order float64 fold,
    (score, cell) tie-break). One shuffle on cell for the within-cell
    self-join, then exact cosine on cell-local pairs. Exact copies are
    bit-identical vectors -> identical score arrays -> the SAME cell, so
    the planted duplicates are guaranteed to collide. At 100 TB, k
    scales with n to cap cell populations (the paper uses ~100k
    clusters); a hot cell splits by a secondary hash band exactly like
    dedup_embedding_cosine's banding.

    Keep rule: lowest vec_id in each near-dup neighborhood survives —
    deterministic, no RNG (the paper keeps a random exemplar; lowest-id
    is the reproducible equivalent).

    Reference analogue: the reference dedups delivered pages by session
    key (api/main.py:496-501); this is the corpus-scale semantic
    generalization a training-data pipeline needs."""
    allv = _dedup_candidates_base(spark, sf_dir)
    sample = allv.orderBy("vec_id").limit(SEMDEDUP_SAMPLE).collect()
    vecs = np.array([r["v"] for r in sample], dtype=np.float64)
    centroids = _ivf_centroids(vecs)

    structs = []
    for j, c in enumerate(centroids):
        cv = F.array(*[F.lit(float(x)) for x in c])
        score = F.lit(_seq_sq_norm(c)) - F.lit(2.0) * _dot(F.col("v"), cv)
        structs.append(F.struct(score.alias("s"), F.lit(j).alias("c")))
    assigned = allv.select(
        "vec_id",
        "v",
        F.array_min(F.array(*structs))["c"].cast("long").alias("cell"),
    )
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"), "cell"
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), "cell"
    )
    sim = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va")))
        * F.sqrt(_dot(F.col("vb"), F.col("vb")))
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_b") < F.col("id_a"))
        .filter(sim >= F.lit(SEMDEDUP_TAU))
        .select(F.col("id_a").alias("vec_id"))
        .distinct()
        .withColumn("dup", F.lit(1))
    )
    return (
        assigned.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.when(F.col("dup").isNull(), 1).otherwise(0)
            .cast("int").alias("is_kept"),
        )
    )


def semdedup_oracle_sql(sf_dir: str) -> str:
    """DuckDB twin of q_semdedup: the same trained centroids as VALUES
    literals, the same assignment tie-break, the same within-cell pair
    join and lowest-id keep rule."""
    cents = train_semdedup_centroids_local(sf_dir)
    rows = []
    for j, c in enumerate(cents):
        lst = ", ".join(repr(float(x)) for x in c)
        rows.append(f"({j}, {repr(_seq_sq_norm(c))}, [{lst}]::DOUBLE[])")
    values = ",\n  ".join(rows)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE vec_id % 10 = 0
), allv AS (
  SELECT vec_id, v FROM e
  UNION ALL
  SELECT vec_id + {COPY_OFF} AS vec_id, v FROM e WHERE vec_id % 50 = 0
),
cent(cell, c2, cv) AS (VALUES {values}),
scored AS (
  SELECT allv.vec_id, allv.v, c.cell,
         c.c2 - 2.0 * list_dot_product(allv.v, c.cv) AS s
  FROM allv, cent c
),
assign AS (
  SELECT vec_id, v, CAST(cell AS BIGINT) AS cell FROM (
    SELECT vec_id, v, cell,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s, cell) AS rn
    FROM scored) WHERE rn = 1
),
drops AS (
  SELECT DISTINCT a.vec_id
  FROM assign a JOIN assign b ON a.cell = b.cell AND b.vec_id < a.vec_id
  WHERE list_dot_product(a.v, b.v)
          / (SQRT(list_dot_product(a.v, a.v))
             * SQRT(list_dot_product(b.v, b.v))) >= {SEMDEDUP_TAU}
)
SELECT a.vec_id, a.cell,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS is_kept
FROM assign a LEFT JOIN drops d ON d.vec_id = a.vec_id
"""


QUERIES = {
    "ann_brute_topk": q_ann_brute_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "ann_lsh_topk": q_ann_lsh_topk,
    "embedding_stats": q_embedding_stats,
    "semdedup": q_semdedup,
}

ORACLE_SQL = {
    "ann_brute_topk": SQL_ANN_BRUTE_TOPK,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    "dedup_embedding_cosine": SQL_DEDUP_EMBEDDING_COSINE,
    "embedding_stats": SQL_EMBEDDING_STATS,
}
