"""Round-4 wave-25: oracle-exact clustering — one audited Lloyd step.

``q_kmeans_step`` pins ONE full k-means iteration (init → assign →
centroid update → re-assign) in exact integer arithmetic, cross-checked
against the DuckDB oracle. It is the auditable twin of the MLlib KMeans
path (``q_ivf_kmeans_topk``, rows-only by necessity — MLlib's float
iterations aren't reproducible across engines): here every distance and
centroid coordinate is an integer, so the driver hash-compares the full
clustering state. The same audit shape validates any production
clustering job: run one quantized step beside the float pipeline and
diff assignments.

Engine exactness: embedding coordinates quantize to per-element
thousandths SHIFTED non-negative (+1000) — shifting leaves every
distance unchanged and keeps all centroid-mean divisions on
non-negative integers, where DuckDB's floor-division ``//`` and
Spark's truncating ``DIV`` agree (they diverge on negatives — the
reason for the shift). Centroid update rounds half-up via the pure
integer form ``(2·Σx + n) DIV (2·n)``.

Scale shape: the point stream is processed in LONG format (vec_id, dim,
coord) — the assign join is a broadcast HASH join on the dim key
against the K·D centroid table (512 rows; never a nested-loop), the
per-(point, centroid) distance reduces with map-side combine, and the
centroid update is one (k, dim) hash aggregate. Long format costs a
K-way fanout per point, which is the right trade at K=8; large-K
production clustering keeps vectors in-row with codegen distances
(the MLlib path above) and uses THIS op as its audit step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.functions.vector import to_double_array
from spark_ml_spark.registry import query

_K = 8
_DIMS = 64


@query("q_kmeans_step", oracle=f"""
WITH pts AS (
  SELECT vec_id, dd.i + 1 AS d,
         CAST(floor(CAST(embedding[dd.i + 1] AS DOUBLE) * 1000 + 0.5) AS BIGINT) + 1000 AS x
  FROM embeddings CROSS JOIN (SELECT unnest(range({_DIMS})) AS i) dd
),
c0 AS (SELECT vec_id AS k, d, x AS c FROM pts WHERE vec_id < {_K}),
a1 AS (
  SELECT p.vec_id, c.k,
         CAST(sum((p.x - c.c) * (p.x - c.c)) AS BIGINT) AS dist
  FROM pts p JOIN c0 c USING (d)
  GROUP BY p.vec_id, c.k
),
asg1 AS (
  SELECT vec_id, k FROM (
    SELECT vec_id, k,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
    FROM a1
  ) WHERE rn = 1
),
upd AS (
  SELECT a.k, p.d,
         CAST(sum(p.x) AS BIGINT) AS sx,
         CAST(count(*) AS BIGINT) AS cnt
  FROM asg1 a JOIN pts p USING (vec_id)
  GROUP BY a.k, p.d
),
c1 AS (
  SELECT c0.k, c0.d,
         COALESCE((2 * u.sx + u.cnt) // (2 * u.cnt), c0.c) AS c
  FROM c0 LEFT JOIN upd u ON c0.k = u.k AND c0.d = u.d
),
a2 AS (
  SELECT p.vec_id, c.k,
         CAST(sum((p.x - c.c) * (p.x - c.c)) AS BIGINT) AS dist
  FROM pts p JOIN c1 c USING (d)
  GROUP BY p.vec_id, c.k
),
asg2 AS (
  SELECT vec_id, k, dist FROM (
    SELECT vec_id, k, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
    FROM a2
  ) WHERE rn = 1
),
cksum AS (
  SELECT k, CAST(sum(d * c) AS BIGINT) AS centroid_checksum
  FROM c1 GROUP BY k
)
SELECT cksum.k,
       CAST(COALESCE(s.n_points, 0) AS BIGINT) AS n_points,
       CAST(COALESCE(s.inertia, 0) AS BIGINT)  AS inertia,
       cksum.centroid_checksum
FROM cksum LEFT JOIN (
  SELECT k, count(*) AS n_points, sum(dist) AS inertia
  FROM asg2 GROUP BY k
) s USING (k)
""")
def q_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M+: one exact Lloyd iteration over the 64-dim embeddings, K=8,
    init = vectors 0..7 — assignment (integer squared L2, ties to the
    lowest centroid id), half-up integer centroid update (empty
    clusters keep their previous centroid), re-assignment; output per
    cluster: population, integer inertia, centroid checksum. See the
    module docstring for the exactness and scale rationale."""
    pts = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.posexplode(
                F.transform(
                    to_double_array("embedding"),
                    lambda x: (F.floor(x * 1000 + F.lit(0.5)) + 1000)
                    .cast("long"),
                )
            ).alias("pos", "x"),
        )
        .select("vec_id", (F.col("pos") + 1).alias("d"), "x")
    )
    c0 = pts.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("k"), "d", F.col("x").alias("c")
    )

    def assign(cents: DataFrame) -> DataFrame:
        """argmin-centroid per point: broadcast hash join on the dim
        key, map-side-combined distance sum, min-struct tie-break."""
        return (
            pts.join(F.broadcast(cents), "d")
            .groupBy("vec_id", "k")
            .agg(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
                .cast("long").alias("dist")
            )
            .groupBy("vec_id")
            .agg(F.min(F.struct("dist", "k")).alias("m"))
            .select("vec_id", F.col("m.k").alias("k"),
                    F.col("m.dist").alias("dist"))
        )

    asg1 = assign(c0).select("vec_id", "k")
    upd = (
        asg1.join(pts, "vec_id")
        .groupBy("k", "d")
        .agg(
            F.sum("x").cast("long").alias("sx"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )
    c1 = (
        c0.withColumnRenamed("c", "c_old")
        .join(upd, ["k", "d"], "left")
        .select(
            "k", "d",
            F.coalesce(
                F.expr("(2 * sx + cnt) DIV (2 * cnt)"), F.col("c_old")
            ).alias("c"),
        )
    )
    # the update and both assigns re-derive `pts` (a full re-quantize
    # scan); persist once — at 100 TB the long-format point table is
    # written to a staging location instead, same idea
    pts.persist()
    asg2 = assign(c1)
    cksum = c1.groupBy("k").agg(
        F.sum(F.col("d") * F.col("c")).cast("long").alias("centroid_checksum")
    )
    stats = asg2.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.sum("dist").cast("long").alias("inertia"),
    )
    return cksum.join(stats, "k", "left").select(
        "k",
        F.coalesce("n_points", F.lit(0)).cast("long").alias("n_points"),
        F.coalesce("inertia", F.lit(0)).cast("long").alias("inertia"),
        "centroid_checksum",
    )


@query("q_pca_power", oracle=f"""
WITH rows_q AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)
                                  AS BIGINT)) AS m
  FROM embeddings
),
with_s AS (
  SELECT vec_id, m, list_sum(m) AS s FROM rows_q
),
pts AS (
  SELECT dd.i + 1 AS d, m[dd.i + 1] AS x, s
  FROM with_s CROSS JOIN (SELECT unnest(range({_DIMS})) AS i) dd
),
w AS (
  SELECT d, CAST(sum(x * s) AS BIGINT) AS w_d
  FROM pts GROUP BY d
),
mx AS (SELECT max(abs(w_d)) AS w_max FROM w)
SELECT CAST(d AS BIGINT) AS d, w_d,
       CAST(floor(abs(w_d) * 1000000.0 / w_max + 0.5) AS BIGINT)
         AS mag_ppm
FROM w, mx
ORDER BY d
""")
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact-integer power-iteration step toward the top principal
    direction of the embedding Gram matrix, started from the ones
    vector: w = G·1 where G = Σ mᵣmᵣᵀ over thousandth-quantized rows.
    Because (G·1)ᵢ = Σᵣ mᵣᵢ·(Σⱼ mᵣⱼ), the 64×64 matrix is NEVER
    materialized — each row contributes mᵢ·rowsum, with the rowsum
    computed IN-ROW (``aggregate`` over the array) before the explode.
    Output: per-dimension w (exact BIGINT) and magnitude relative to
    the max in ppm — the audit twin of an MLlib PCA fit, same
    quantization discipline as ``q_kmeans_step``.

    Scale shape: one corpus scan, in-row rowsum, a 64-way in-row
    flat-map, one 64-group map-side-combined aggregate; the max
    normalizer is a 1-row broadcast. Zero joins, zero floats until the
    final quantized ratio."""
    quant = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
    )
    rows_q = load(spark, sf_dir, "embeddings").select(
        quant.alias("m")
    ).select(
        "m",
        F.aggregate("m", F.lit(0).cast("long"), lambda a, x: a + x).alias("s"),
    )
    pts = rows_q.select(
        F.posexplode("m").alias("pos", "x"), "s"
    ).select((F.col("pos") + 1).alias("d"), "x", "s")
    w = pts.groupBy("d").agg(
        F.sum(F.col("x") * F.col("s")).cast("bigint").alias("w_d")
    )
    mx = w.agg(F.max(F.abs("w_d")).alias("w_max"))
    return (
        w.crossJoin(F.broadcast(mx))
        .select(
            F.col("d").cast("bigint").alias("d"),
            "w_d",
            F.floor(
                F.abs("w_d") * 1000000.0 / F.col("w_max") + F.lit(0.5)
            ).cast("bigint").alias("mag_ppm"),
        )
        .orderBy("d")
    )
