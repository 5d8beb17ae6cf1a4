"""Similarity search over the ``embeddings`` table (north-star N3,
SURVEY.md §2.12).

Two paths, mirroring how a 100 TB pipeline would tier them:
- brute-force cosine top-k (exact baseline): broadcast the query vector(s),
  one scan, TakeOrderedAndProject — correct at any scale when k and the
  query set are small;
- LSH-bucketed (approximate scale path): BucketedRandomProjectionLSH
  turns all-pairs similarity into an equi-join on hash buckets.

All exact math is built-in higher-order functions over ``array<double>``
(JVM-side, codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_spark.functions.vector import cosine, cosine_explicit, to_double_array
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: the embeddings table's fixed dimension (TESTDATA.md) — used to unroll
#: pair-verify cosine into whole-stage-codegen arithmetic
_EMB_DIM = 64

#: cosine dot/norm expressed the same way in the DuckDB oracle (manual
#: double-precision formula — list_cosine_similarity may use float math).
_ORACLE_COS = """
list_sum(list_transform(list_zip({a}, {b}),
         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
/ NULLIF(
    sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
  * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 0)
"""


@query("q_cosine_topk", oracle=f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label,
       ROUND({_ORACLE_COS.format(a="e.embedding", b="q.qe")}, 4) AS cos_sim
FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id
LIMIT 10
""")
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 exact baseline: top-10 nearest neighbours of vec_id=0 by cosine.

    The single-row query vector is broadcast (no shuffle); the scan +
    per-row dot product + TakeOrderedAndProject top-k is one distributed
    pass — the shape that still works when `embeddings` is 100 TB."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("emb")
    )
    qvec = emb.filter(F.col("vec_id") == 0).select(F.col("emb").alias("q_emb"))
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("emb"), F.col("q_emb")), 4).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), "vec_id").limit(10)


#: sign-LSH banding for cosine near-dup: _NB_BANDS bands of _NB_BITS
#: coordinate-hyperplane sign bits each (dims 0.._NB_BANDS*_NB_BITS-1).
#: Candidate volume ≈ B·n²/2^r — in production r grows with log2(n) so the
#: per-bucket population (and thus per-bucket pair work) stays bounded.
_NB_BANDS = 8
_NB_BITS = 4


@query("q_embedding_neardup", oracle=f"""
WITH bands AS (
  SELECT e.vec_id, b.band_id,
         concat(
           CASE WHEN e.embedding[b.band_id*{_NB_BITS}+1] >= 0 THEN '1' ELSE '0' END,
           CASE WHEN e.embedding[b.band_id*{_NB_BITS}+2] >= 0 THEN '1' ELSE '0' END,
           CASE WHEN e.embedding[b.band_id*{_NB_BITS}+3] >= 0 THEN '1' ELSE '0' END,
           CASE WHEN e.embedding[b.band_id*{_NB_BITS}+4] >= 0 THEN '1' ELSE '0' END
         ) AS band_key
  FROM embeddings e
  CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) AS b(band_id)
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       ROUND({_ORACLE_COS.format(a="ea.embedding", b="eb.embedding")}, 4) AS cos_sim
FROM cand c
JOIN embeddings ea ON ea.vec_id = c.vec_a
JOIN embeddings eb ON eb.vec_id = c.vec_b
WHERE {_ORACLE_COS.format(a="ea.embedding", b="eb.embedding")} >= 0.4
""")
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3/N2 hybrid: embedding-cosine near-duplicate pairs (cosine ≥ 0.4)
    via sign-LSH banding — the scale-correct shape (VERDICT r1 wrong-#2
    replaced the previous all-pairs ``vec_a < vec_b`` theta join that
    planned as an O(n²) BroadcastNestedLoopJoin).

    Candidates: each vector emits ``_NB_BANDS`` (band_id, band_key) rows,
    where band_key is the sign pattern of ``_NB_BITS`` coordinate
    hyperplanes (random-hyperplane LSH with axis-aligned planes — valid
    because the corpus is near-isotropic; per-bit collision probability
    for angle θ is 1-θ/π). Same-bucket pairs come from the bucket-collect
    pair expansion (``api.bucket_pairs``) carrying ONLY ids — no
    embedding arrays move through the candidate stage (pitfall: exploded
    joins must stay slim). Verify: exact double-precision cosine,
    recomputed after re-joining payloads for the surviving candidate ids
    only.

    The banding is deterministic and replicated verbatim in the DuckDB
    oracle, so the approximate result is still exactly oracle-checkable.
    Measured at sf0.01: 48 of the 59 cos≥0.4 pairs surface with 50.6k of
    124.7k possible candidate pairs scored; recall rises toward 1 as the
    threshold approaches true near-dup territory (≥0.8) — LSH's designed
    trade-off. At 100 TB, scale bits-per-band with log2(n) to hold
    per-bucket population constant."""
    emb = load(spark, sf_dir, "embeddings")

    def band_key(b: int):
        # raw parquet float column (not the derived double array): sign
        # bits are representation-independent and the element access stays
        # a native column read — no CollapseProject recompute hazard.
        return F.concat(*[
            F.when(F.col("embedding")[b * _NB_BITS + i] >= 0, F.lit("1"))
            .otherwise(F.lit("0"))
            for i in range(_NB_BITS)
        ])

    from spark_ml_spark.api import bucket_pairs

    bands = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"), band_key(b).alias("band_key"))
            for b in range(_NB_BANDS)
        ])).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")

    # bucket-collect pair expansion (api.bucket_pairs): one group-by
    # shuffle, each unordered pair generated once (vs the band-key
    # self-join's two orientations + dedup; equal wall-clock at test SF,
    # one fewer exchange — see bucket_pairs for the hot-bucket caveat)
    # cap = 4096: at sf0.1 the hottest 4-bit band bucket holds ~300 ids;
    # 4096 is the "you forgot to scale bits-per-band with log2(n)" alarm
    cand = bucket_pairs(
        bands, ("band_id", "band_key"), max_bucket_pop=4096
    ).select(
        F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b")
    )

    # verify on the raw float arrays with an unrolled codegen cosine —
    # 2.1× faster than the HOF form over the ~806k-pair candidate set at
    # sf0.1 (functions.vector.dot_explicit), bit-identical results
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = cosine_explicit("ea", "eb", _EMB_DIM)
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .filter(cos >= 0.4)  # raw-value filter: identical doubles both engines
        .select("vec_a", "vec_b", F.round(cos, 4).alias("cos_sim"))
    )


#: IVF coarse-quantizer parameters: K cells, probe the P nearest cells.
_IVF_K = 16
_IVF_NPROBE = 4


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_cells(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment as a MAP-SIDE argmin fold over one
    broadcast row holding all centroids (sorted by cell_id; strict `<`
    keeps the lowest cell_id on distance ties — the same order as the
    oracles' row_number over (distance, cell_id)). The embedding table
    never shuffles for quantization: no cross-product window, no
    single-partition sort — adds a ``cell_id`` column to ``emb``."""
    cents_row = cent.agg(
        F.sort_array(F.collect_list(F.struct("cell_id", "ce"))).alias("cents")
    )
    best = F.aggregate(
        "cents",
        F.struct(
            F.lit(-1).cast("bigint").alias("cell_id"),
            F.lit(float("inf")).alias("dist"),
        ),
        lambda acc, c: F.when(
            _l2sq(F.col("emb"), c["ce"]) < acc["dist"],
            F.struct(
                c["cell_id"].alias("cell_id"),
                _l2sq(F.col("emb"), c["ce"]).alias("dist"),
            ),
        ).otherwise(acc),
    )
    return emb.crossJoin(F.broadcast(cents_row)).select(
        *emb.columns, best["cell_id"].alias("cell_id")
    )


@query("q_ivf_topk", oracle=f"""
WITH cent AS (
  SELECT vec_id AS cell_id, embedding AS ce FROM embeddings WHERE vec_id < {_IVF_K}
), assign AS (      -- coarse quantization: nearest centroid per vector
  SELECT vec_id, label, embedding, cell_id FROM (
    SELECT e.vec_id, e.label, e.embedding, c.cell_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(list_zip(e.embedding, c.ce),
                      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
                      c.cell_id) AS rn
    FROM embeddings e, cent c)
  WHERE rn = 1
), probed AS (      -- the query (vec_id=0) probes its {_IVF_NPROBE} nearest cells
  SELECT cell_id FROM (
    SELECT c.cell_id,
           row_number() OVER (
             ORDER BY list_sum(list_transform(list_zip(q.embedding, c.ce),
                      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
                      c.cell_id) AS rn
    FROM cent c, (SELECT embedding FROM embeddings WHERE vec_id = 0) q)
  WHERE rn <= {_IVF_NPROBE}
)
SELECT a.vec_id, a.label,
       ROUND({{cos}}, 4) AS cos_sim
FROM assign a
JOIN probed p ON a.cell_id = p.cell_id,
     (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
WHERE a.vec_id <> 0
ORDER BY cos_sim DESC, a.vec_id
LIMIT 10
""".format(cos=_ORACLE_COS.format(a="a.embedding", b="q.qe")))
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 scale path: IVF (inverted-file) approximate nearest neighbour.

    Coarse quantizer: a deterministic centroid set (the first ``_IVF_K``
    vectors — in production, seeded KMeans centroids); every vector is
    assigned to its nearest cell once (broadcast centroids, one scan, no
    shuffle of the embedding table). A query probes only its
    ``_IVF_NPROBE`` nearest cells, so search cost drops from O(N) to
    O(N * nprobe / K). Deterministic quantizer → fully oracle-checkable,
    unlike the LSH path (``q_brp_lsh_neighbors``).

    At 100 TB the assignment table is written once, partitioned BY cell_id
    (partition pruning turns a query into a read of nprobe partitions)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("emb")
    )
    cent = emb.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cell_id"), F.col("emb").alias("ce")
    )
    # map-side argmin assignment (shared helper — no window shuffle)
    assign = _assign_cells(emb, cent)

    qvec = emb.filter(F.col("vec_id") == 0).select(F.col("emb").alias("qe"))
    # probe list: the query's nprobe nearest cells — TakeOrderedAndProject
    # over K rows, not an unpartitioned window (which would log the
    # single-partition WindowExec warning this repo bans)
    probed = (
        cent.crossJoin(F.broadcast(qvec))
        .orderBy(_l2sq(F.col("qe"), F.col("ce")), "cell_id")
        .limit(_IVF_NPROBE)
        .select("cell_id")
    )

    return (
        assign.join(F.broadcast(probed), "cell_id")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("emb"), F.col("qe")), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


@query("q_cosine_topk_batch", oracle=f"""
WITH q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, e.vec_id,
         ROUND({_ORACLE_COS.format(a="e.embedding", b="q.qe")}, 4) AS cos_sim,
         row_number() OVER (
           PARTITION BY q.q_id
           ORDER BY {_ORACLE_COS.format(a="e.embedding", b="q.qe")} DESC, e.vec_id
         ) AS rn
  FROM embeddings e, q
  WHERE e.vec_id <> q.q_id
)
SELECT q_id, vec_id, cos_sim FROM scored WHERE rn <= 3
""")
def q_cosine_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 serving shape: top-k neighbours for a BATCH of query vectors in
    one pass — broadcast the query set, score corpus × queries, rank per
    query with a window. One scan of the corpus regardless of query count
    (queries are the broadcast side); the rank window shuffles only
    (q_id, vec_id, score) triples, never embeddings."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    qset = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("qe")
    )
    from pyspark.sql import Window as W

    cos = cosine(F.col("emb"), F.col("qe"))
    w = W.partitionBy("q_id").orderBy(F.col("raw_cos").desc(), "vec_id")
    return (
        emb.crossJoin(F.broadcast(qset))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", cos.alias("raw_cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "vec_id", F.round("raw_cos", 4).alias("cos_sim"))
    )


@query("q_embedding_stats", oracle="""
SELECT label,
       count(*) AS n_vecs,
       ROUND(avg(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS avg_l2_norm,
       ROUND(avg(CAST(embedding[1] AS DOUBLE)), 4) AS dim0_mean,
       ROUND(CAST(min(len(embedding)) AS DOUBLE), 1) AS min_dim,
       ROUND(CAST(max(len(embedding)) AS DOUBLE), 1) AS max_dim
FROM embeddings
GROUP BY label
""")
def q_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 support: per-label embedding profile (count, mean L2 norm,
    first-dimension mean, dimension bounds) — the sanity pass any
    embedding pipeline runs before indexing. One scan, one agg; norms via
    JVM higher-order functions."""
    from spark_ml_spark.functions.vector import l2_norm

    emb = load(spark, sf_dir, "embeddings").select(
        "label",
        to_double_array("embedding").alias("emb"),
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(l2_norm(F.col("emb"))), 4).alias("avg_l2_norm"),
        F.round(F.avg(F.element_at("emb", 1)), 4).alias("dim0_mean"),
        F.round(F.min(F.size("emb")).cast("double"), 1).alias("min_dim"),
        F.round(F.max(F.size("emb")).cast("double"), 1).alias("max_dim"),
    )


@query("q_ivf_kmeans_topk")  # rows-only: KMeans centroids are engine-specific
def q_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 production IVF: seeded-KMeans quantizer (api.ivf_train_centroids)
    + probed-cell search. Rows-only (centroids are not SQL-derivable); the
    deterministic-quantizer twin ``q_ivf_topk`` carries the oracle."""
    from spark_ml_spark.api import ivf_assign, ivf_train_centroids

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("emb")
    )
    cent = ivf_train_centroids(emb, "emb", n_cells=_IVF_K)
    assigned = ivf_assign(emb, "vec_id", "emb", cent)
    qvec = emb.filter(F.col("vec_id") == 0).select(F.col("emb").alias("qe"))
    # probe cells nearest the query. nprobe=8 (half the cells) because the
    # test corpora are small and near-isotropic — KMeans cells barely
    # separate neighbors below ~100 vectors/cell (measured recall@10:
    # 0.4 at 500 vecs/nprobe 4 vs 1.0 at 5000 vecs). In production, scale
    # n_cells with the corpus (≈ sqrt(N)) and keep nprobe/n_cells small.
    probed = (
        cent.crossJoin(F.broadcast(qvec))
        .orderBy(
            F.aggregate(
                F.zip_with("ce", "qe", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
            "cell_id",
        )
        .limit(2 * _IVF_NPROBE)
        .select("cell_id")
    )
    return (
        assigned.join(F.broadcast(probed), "cell_id")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qvec))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("emb"), F.col("qe")), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(10)
    )


@query("q_brp_lsh_neighbors")  # rows-only: LSH buckets are engine-specific
def q_brp_lsh_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3 scale path: BucketedRandomProjectionLSH approximate neighbour
    join on euclidean distance — candidate pairs come from an equi-join on
    hash buckets, never a cross join. Seeded for reproducibility."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(to_double_array("embedding")).alias("features")
    ).cache()  # self-join sides + fit share one materialization
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=1.0,
        numHashTables=4, seed=42,
    )
    model = lsh.fit(emb)
    # threshold from the corpus distance distribution: pairwise L2 has
    # 0.1%-quantile ≈ 1.12 and median ≈ 1.41, so 1.15 selects the genuinely
    # closest pairs instead of (at 5.0) 93% of the whole pair space
    return (
        model.approxSimilarityJoin(emb, emb, 1.15, distCol="l2_dist")
        .filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round("l2_dist", 4).alias("l2_dist"),
        )
    )


@query("q_semantic_dedup", oracle=f"""
WITH nc AS (
  SELECT GREATEST(16, CAST(ceil(count(*) / 64.0) AS BIGINT)) AS n_cells
  FROM embeddings
), cent AS (
  SELECT vec_id AS cell_id, embedding AS ce FROM embeddings, nc
  WHERE vec_id < n_cells
), assign AS (
  SELECT vec_id, cell_id FROM (
    SELECT e.vec_id, c.cell_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(list_zip(e.embedding, c.ce),
                      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))),
                      c.cell_id) AS rn
    FROM embeddings e, cent c)
  WHERE rn = 1
), dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assign a
  JOIN assign b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE {_ORACLE_COS.format(a="ea.embedding", b="eb.embedding")} >= 0.4
)
SELECT s.cell_id,
       count(*)                           AS n_vecs,
       CAST(sum(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                                          AS n_dropped,
       CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                          AS n_kept
FROM assign s LEFT JOIN dropped d ON s.vec_id = d.vec_id
GROUP BY s.cell_id
""")
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) dedup, SemDeDup-shaped: coarse-cluster
    the corpus with the deterministic IVF quantizer, then WITHIN each
    cell drop the higher-id member of any pair with cosine ≥ 0.4;
    report per-cell kept/dropped counts.

    This is the scale-correct decomposition of semantic dedup: the
    cluster assignment is one broadcast-centroids map pass (the
    embedding table never shuffles for quantization), pairwise
    comparison happens only INSIDE a cell, and — VERDICT r2 wrong-#3 —
    the candidate stage is IDS-ONLY: the per-cell pair expansion
    (``api.bucket_pairs``) shuffles (cell_id, vec_id) rows, never the
    64-double embedding payloads, which are re-joined only for the
    surviving candidates' cosine verify (the same discipline as
    ``q_embedding_neardup``). n_cells is no longer a literal 16: it
    scales with the corpus — ``greatest(16, ceil(n/64))`` — holding
    per-cell population (and therefore per-cell O(pop²) pair work)
    constant as the corpus grows, computed as a broadcast scalar in both
    engines (no driver-side action). Verify is the unrolled codegen
    cosine (functions.vector). Greedy keep-lowest-id is used instead of
    keep-centroid-nearest so the result is a pure function of the pair
    set (order-free, exactly reproducible by the oracle)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    # corpus-proportional cell count as a broadcast scalar (one-row agg
    # cross-joined in — the repo's standard "broadcast divisor" shape, no
    # .count() action on the driver)
    nc = emb.agg(
        F.greatest(
            F.lit(16).cast("long"),
            F.ceil(F.count(F.lit(1)) / F.lit(64.0)).cast("long"),
        ).alias("n_cells")
    )
    cent = (
        emb.crossJoin(F.broadcast(nc))
        .filter(F.col("vec_id") < F.col("n_cells"))
        .select(F.col("vec_id").alias("cell_id"), F.col("emb").alias("ce"))
    )
    # map-side argmin assignment (shared helper — no window shuffle),
    # then slimmed to (vec_id, cell_id) BEFORE persisting: the
    # assignment table that feeds the pair stage and the final agg
    # carries ids only — in production this is the "assignment table
    # written once, partitioned BY cell_id" step.
    from pyspark import StorageLevel

    assign = (
        _assign_cells(emb, cent)
        .select("vec_id", "cell_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    from spark_ml_spark.api import bucket_pairs

    # cap = 64*16: cells target ~64 members by construction (n_cells =
    # n/64); a cell 16× over target means the quantizer collapsed and
    # within-cell O(pop²) is about to bite — fail loudly, don't crawl
    cand = bucket_pairs(
        assign.select(F.col("vec_id").alias("doc_id"), "cell_id"), ("cell_id",),
        max_bucket_pop=1024,
    ).select(F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b"))
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"))
    dropped = (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .filter(cosine_explicit("ea", "eb", _EMB_DIM) >= 0.4)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(1).cast("long"))
    )
    return (
        assign.join(dropped, "vec_id", "left")
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.coalesce(F.col("is_dropped"), F.lit(0).cast("long")))
            .alias("n_dropped"),
            F.sum(
                F.when(F.col("is_dropped").isNull(), F.lit(1).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("n_kept"),
        )
    )


#: MaxSim multi-vector view: 8 sub-vectors of 8 dims over the 64-dim
#: embedding (the ColBERT late-interaction decomposition applied to the
#: fixture's single-vector column; production token-level multi-vectors
#: land in the same (id, sub, dim, coord) long layout)
_MS_SUBS = 8
_MS_SUBDIM = 8


@query("q_maxsim_topk", oracle=f"""
WITH pts AS (
  SELECT vec_id,
         dd.i // {_MS_SUBDIM}      AS sub,
         dd.i % {_MS_SUBDIM}       AS p,
         CAST(floor(CAST(embedding[dd.i + 1] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS x
  FROM embeddings CROSS JOIN (SELECT unnest(range({_MS_SUBS * _MS_SUBDIM})) AS i) dd
),
q AS (SELECT sub AS qsub, p, x AS qx FROM pts WHERE vec_id = 0),
dots AS (
  SELECT d.vec_id, d.sub, q.qsub,
         CAST(sum(d.x * q.qx) AS BIGINT) AS dot
  FROM pts d JOIN q USING (p)
  WHERE d.vec_id <> 0
  GROUP BY d.vec_id, d.sub, q.qsub
),
best AS (
  SELECT vec_id, qsub, CAST(max(dot) AS BIGINT) AS m
  FROM dots GROUP BY vec_id, qsub
),
scored AS (
  SELECT vec_id, CAST(sum(m) AS BIGINT) AS maxsim
  FROM best GROUP BY vec_id
)
SELECT vec_id, maxsim FROM scored
ORDER BY maxsim DESC, vec_id
LIMIT 10
""")
def q_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3: ColBERT-style MaxSim late-interaction retrieval (Khattab &
    Zaharia 2020) — each vector splits into 8 sub-vectors; a document's
    score against the query (vec_id=0) is Σ over query sub-vectors of
    the MAX dot product against any document sub-vector. Late
    interaction preserves fine-grained matches a single pooled dot
    product averages away; this registers the retrieval shape beside
    the pooled baselines (``q_cosine_topk``, ``q_pq_topk``).

    Engine exactness: thousandth-quantized integer coordinates, so
    every dot/max/sum is BIGINT — hash-exact.

    Scale shape: the query's 64 (sub, pos, coord) rows broadcast; the
    document stream joins on the within-sub position key (a broadcast
    hash join with a bounded 8-way fanout — one row per query sub),
    then reduces with map-side combine through two bounded hash
    aggregates (dots → per-sub max → per-doc sum) into
    TakeOrderedAndProject. No pairwise doc×doc work, no nested loop;
    at 100 TB docs this is one linear pass, and a production deployment
    puts an IVF/PQ candidate filter (the registered ``q_ivf_topk`` /
    ``q_pq_topk`` shapes) in front of the same MaxSim verify."""
    pts = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.posexplode(
                F.transform(
                    to_double_array("embedding"),
                    lambda x: F.floor(x * 1000 + F.lit(0.5)).cast("long"),
                )
            ).alias("i", "x"),
        )
        .select(
            "vec_id",
            (F.col("i") / _MS_SUBDIM).cast("long").alias("sub"),
            (F.col("i") % _MS_SUBDIM).alias("p"),
            "x",
        )
    )
    q = pts.filter(F.col("vec_id") == 0).select(
        F.col("sub").alias("qsub"), "p", F.col("x").alias("qx")
    )
    dots = (
        pts.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), "p")
        .groupBy("vec_id", "sub", "qsub")
        .agg(F.sum(F.col("x") * F.col("qx")).cast("long").alias("dot"))
    )
    best = dots.groupBy("vec_id", "qsub").agg(
        F.max("dot").cast("long").alias("m")
    )
    scored = best.groupBy("vec_id").agg(
        F.sum("m").cast("long").alias("maxsim")
    )
    return scored.orderBy(F.col("maxsim").desc(), "vec_id").limit(10)


#: random-projection target dimensionality (Johnson–Lindenstrauss)
_RP_K = 8


@query("q_random_projection", oracle=f"""
WITH rows_q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)
                                  AS BIGINT)) AS m
  FROM embeddings
),
with_norm AS (
  SELECT vec_id, m,
         list_sum(list_transform(m, x -> x * x)) AS norm2
  FROM rows_q
),
pts AS (
  SELECT vec_id, norm2, dd.i AS i, m[dd.i + 1] AS x
  FROM with_norm CROSS JOIN (SELECT unnest(range(64)) AS i) dd
),
proj AS (
  SELECT p.vec_id, p.norm2, kk.k,
         CAST(sum(p.x * (CASE WHEN substr(md5('rp:' || CAST(kk.k AS VARCHAR)
                                           || ':' || CAST(p.i AS VARCHAR)),
                                      1, 1) < '8'
                              THEN 1 ELSE -1 END)) AS BIGINT) AS w
  FROM pts p CROSS JOIN (SELECT unnest(range({_RP_K})) AS k) kk
  GROUP BY 1, 2, 3
),
ratio AS (
  SELECT vec_id,
         CAST(floor(sum(w * w) * 1000000.0 / ({_RP_K} * max(norm2)) + 0.5)
              AS BIGINT) AS ratio_ppm
  FROM proj GROUP BY vec_id
)
SELECT CAST(ratio_ppm // 100000 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM ratio GROUP BY 1 ORDER BY bucket
""")
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sanity audit: project each thousandth-
    quantized embedding onto 8 deterministic ±1 directions (sign =
    md5('rp:k:i') bit — the Achlioptas 2003 database-friendly JL
    matrix, derived not stored) and histogram the norm-preservation
    ratio ‖Pm‖²/(k·‖m‖²) in 10%-wide ppm buckets. A healthy JL sketch
    concentrates near bucket 10 (ratio ≈ 1e6); mass far from it means
    the projection (or the upstream quantization) is broken — the
    audit that runs BEFORE trusting any projected-space ANN.

    Engine exactness: signs, products, and norms are all integers; the
    single quantized ratio per vector is the only float. Scale shape:
    in-row norm, a 64-way in-row flat map, one (vector × 8)-key
    map-side-combined aggregate — the sign matrix is 512 derived
    values, never a stored table, so NOTHING broadcasts at all."""
    quant = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
    )
    rows_q = load(spark, sf_dir, "embeddings").select(
        "vec_id", quant.alias("m")
    ).select(
        "vec_id", "m",
        F.aggregate(
            F.transform("m", lambda x: x * x),
            F.lit(0).cast("long"), lambda a, x: a + x,
        ).alias("norm2"),
    )
    pts = rows_q.select(
        "vec_id", "norm2", F.posexplode("m").alias("i", "x")
    )
    ks = F.array(*[F.lit(k) for k in range(_RP_K)])
    sign = F.when(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("rp:"), F.col("k").cast("string"),
                    F.lit(":"), F.col("i").cast("string"),
                )
            ),
            1, 1,
        ) < "8",
        1,
    ).otherwise(-1)
    proj = (
        pts.select("vec_id", "norm2", "i", "x", F.explode(ks).alias("k"))
        .groupBy("vec_id", "norm2", "k")
        .agg(F.sum(F.col("x") * sign).cast("bigint").alias("w"))
    )
    ratio = proj.groupBy("vec_id").agg(
        F.floor(
            F.sum(F.col("w") * F.col("w")) * 1000000.0
            / (_RP_K * F.max("norm2"))
            + F.lit(0.5)
        ).cast("bigint").alias("ratio_ppm")
    )
    return (
        ratio.groupBy(
            F.expr("CAST(ratio_ppm DIV 100000 AS BIGINT)").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vectors"))
        .orderBy("bucket")
    )


#: MRL ablation: prefix dimensions kept, query-set size, cut depth
_MRL_DIM = 16
_MRL_Q = 8
_MRL_K = 10

#: truncated-prefix cosine for the oracle (1-based inclusive slices)
_ORACLE_COS_PREFIX = _ORACLE_COS.format(
    a=f"a.embedding[1:{_MRL_DIM}]", b=f"q.qe[1:{_MRL_DIM}]"
)


@query("q_mrl_recall", oracle=rf"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS qe FROM embeddings
  WHERE vec_id < {_MRL_Q}
),
scored AS (
  SELECT q.q_id, a.vec_id,
         {_ORACLE_COS.format(a="a.embedding", b="q.qe")} AS cos_full,
         {_ORACLE_COS_PREFIX} AS cos_trunc
  FROM embeddings a, q
  WHERE a.vec_id >= {_MRL_Q}
),
rf AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_full DESC, vec_id) AS r
  FROM scored
),
rt AS (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cos_trunc DESC, vec_id) AS r
  FROM scored
)
SELECT rf.q_id,
       CAST(count(rt.vec_id) AS BIGINT) AS n_overlap,
       CAST(floor(count(rt.vec_id) * 1000000.0 / {_MRL_K} + 0.5)
            AS BIGINT) AS recall_ppm
FROM rf LEFT JOIN rt ON rt.q_id = rf.q_id AND rt.vec_id = rf.vec_id
                    AND rt.r <= {_MRL_K}
WHERE rf.r <= {_MRL_K}
GROUP BY rf.q_id
ORDER BY rf.q_id
""")
def q_mrl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation ablation (Kusupati et al.
    2022): for each query vector, exact top-{k} by FULL {d}-dim cosine
    vs top-{k} by the first-{m}-dims prefix cosine, reporting
    overlap@{k} — the measurement that decides whether a cheap
    truncated index can serve candidate generation with full-dim
    re-ranking (the PQ/IVF cost story from the representation side).

    Scale shape: one corpus scan scores BOTH metrics per (candidate,
    query) against the broadcast query set (the q_cosine_topk_batch
    shape — queries are the broadcast side, embeddings never shuffle);
    the two rank windows partition per query over (q_id, vec_id,
    score) triples; overlap is a keyed self-join of two top-{k} sets,
    {q}·{k} rows. Prefix slicing is in-row; at 100 TB the truncated
    scan would read a {m}-dim column family instead of slicing."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("emb")
    )
    qset = emb.filter(F.col("vec_id") < _MRL_Q).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("qe")
    )
    from pyspark.sql import Window as W

    scored = (
        emb.filter(F.col("vec_id") >= _MRL_Q)
        .crossJoin(F.broadcast(qset))
        .select(
            "q_id",
            "vec_id",
            cosine(F.col("emb"), F.col("qe")).alias("cos_full"),
            cosine(
                F.slice(F.col("emb"), 1, _MRL_DIM),
                F.slice(F.col("qe"), 1, _MRL_DIM),
            ).alias("cos_trunc"),
        )
    )
    w_f = W.partitionBy("q_id").orderBy(F.col("cos_full").desc(), "vec_id")
    w_t = W.partitionBy("q_id").orderBy(F.col("cos_trunc").desc(), "vec_id")
    rf = (
        scored.withColumn("r", F.row_number().over(w_f))
        .filter(F.col("r") <= _MRL_K)
        .select("q_id", "vec_id")
    )
    rt = (
        scored.withColumn("r", F.row_number().over(w_t))
        .filter(F.col("r") <= _MRL_K)
        # rename BOTH keys: rf and rt share one lineage, and a self-join
        # on same-named columns resolves ambiguously
        .select(
            F.col("q_id").alias("t_q_id"),
            F.col("vec_id").alias("t_vec_id"),
        )
    )
    return (
        rf.join(
            rt,
            (F.col("q_id") == F.col("t_q_id"))
            & (F.col("vec_id") == F.col("t_vec_id")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.count("t_vec_id").cast("bigint").alias("n_overlap"),
            F.floor(
                F.count("t_vec_id") * F.lit(1000000.0) / F.lit(_MRL_K)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("recall_ppm"),
        )
        .orderBy("q_id")
    )


q_mrl_recall.__doc__ = q_mrl_recall.__doc__.format(
    k=_MRL_K, d=64, m=_MRL_DIM, q=_MRL_Q
)
