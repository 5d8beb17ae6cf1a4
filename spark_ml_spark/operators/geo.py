"""Round-4 wave-19: geospatial bucketing + grid-bounded nearest-site join.

The reference's whole ML surface is geographic — it predicts site
latitude/longitude from radio measurements (``Data_transform.py:104-117``
packs ``['latitude','longitude']`` label vectors). These operators add
the geo DATA-ENGINEERING layer such a pipeline needs upstream of the
model: deterministic spatial bucketing (z-order/geohash cell codes) and
the grid-bucketed nearest-neighbor join that attaches each observation
to its closest known site WITHOUT an all-pairs distance computation.

Fixture note: the driver tables carry no coordinate columns, so both
operators derive deterministic synthetic coordinates from md5 of the
entity key (microdegree fixed-point integers, portable bit-for-bit
across Spark and DuckDB — the repo's standard md5-determinism
discipline). In production the derived-coordinate CTE is replaced by
the real lat/lon columns; every downstream expression is unchanged.

Engine exactness: coordinates are scale-4 fixed-point integers
(microdegrees/100), cell indices and Morton codes are integer div/mod
arithmetic, distances are integer squared-Euclidean on the fixed-point
grid — zero floating point anywhere, so cross-engine hashes are exact.
Planar (equirectangular) distance is documented operator semantics: at
nearest-neighbor ranges the monotonic ordering matches haversine except
near the poles/antimeridian, and it keeps the pipeline trig-free; a
production variant swaps in haversine AFTER candidate generation, where
only O(candidates) rows pay for it.

Scale shape (the point of the wave): the kNN join is the standard
spatial grid-bin join (Sedona/PostGIS partition-join shape). Sites (the
small relation) are replicated into their 3x3 cell neighborhood — a 9x
blow-up of the SMALL side only — then equi-joined on the cell id, so
Catalyst plans a broadcast/hash join partitioned by cell; candidate
sets are bounded by cell occupancy (grid sized to site density: G ~
sqrt(n_sites / target_occupancy)), and the exact distance + argmin runs
on candidates only. No CartesianProduct, no BroadcastNestedLoopJoin; at
1000 executors the probe side partitions by cell hash like any other
equi-join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.operators.sketches import _hex_int_sql
from spark_ml_spark.registry import query

#: Morton-code grid: 8 bits per axis (256x256 cells) — the z-order depth
#: at which the encode operator emits curve positions.
_ENC_BITS = 8
#: kNN grid: 16x16 cells. Sized so fixture site density keeps 3x3
#: neighborhoods non-empty at sf0.001 while occupancy stays O(1);
#: production sizes G ~ sqrt(n_sites / target_occupancy).
_KNN_G = 16


def _coord_exprs_sql(key_expr: str, prefix: str) -> str:
    """DuckDB CTE body deriving fixed-point microdegree/100 coordinates
    from md5 of ``prefix || key`` (lat_e4 in [-900000, 900000], lon_e4
    in [-1800000, 1800000])."""
    return f"""
  SELECT {key_expr} AS k,
         ({_hex_int_sql(f"md5('{prefix}' || CAST({key_expr} AS VARCHAR))", 1, 8)})
           % 1800001 - 900000  AS lat_e4,
         ({_hex_int_sql(f"md5('{prefix}' || CAST({key_expr} AS VARCHAR))", 9, 8)})
           % 3600001 - 1800000 AS lon_e4
"""


def _with_coords(df: DataFrame, key: str, prefix: str) -> DataFrame:
    """Spark twin of :func:`_coord_exprs_sql`: conv(substr(md5)) hex
    arithmetic, bit-identical to the DuckDB strpos form."""
    h = F.md5(F.concat(F.lit(prefix), F.col(key).cast("string")))
    hi = lambda s, n: F.conv(F.substring(h, s, n), 16, 10).cast("bigint")  # noqa: E731
    return df.select(
        F.col(key).alias("k"),
        (hi(1, 8) % 1800001 - 900000).alias("lat_e4"),
        (hi(9, 8) % 3600001 - 1800000).alias("lon_e4"),
    )


def _morton_sql(cx: str, cy: str, bits: int, div: str) -> str:
    """Closed-form z-order bit interleave (x in odd bits, y in even) as
    pure div/mod arithmetic — no shift operators, so the IDENTICAL
    formula structure runs on Spark (``DIV``) and DuckDB (``//``)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({cx} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"(({cy} {div} {1 << i}) % 2) * {1 << (2 * i)}")
    return "(" + " + ".join(terms) + ")"


@query("q_geohash_encode", oracle=f"""
WITH pts AS ({_coord_exprs_sql('c_custkey', 'geoc:')} FROM customer),
cells AS (
  SELECT k, lat_e4, lon_e4,
         ((lon_e4 + 1800000) * {1 << _ENC_BITS}) // 3600001 AS cx,
         ((lat_e4 + 900000) * {1 << _ENC_BITS}) // 1800001  AS cy
  FROM pts
)
SELECT CAST(k AS BIGINT)      AS c_custkey,
       CAST(lat_e4 AS BIGINT) AS lat_e4,
       CAST(lon_e4 AS BIGINT) AS lon_e4,
       CAST(cx AS BIGINT)     AS cell_x,
       CAST(cy AS BIGINT)     AS cell_y,
       CAST({_morton_sql('cx', 'cy', _ENC_BITS, '//')} AS BIGINT) AS morton
FROM cells
""")
def q_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo: z-order (geohash-equivalent) cell encoding of every customer
    point at 8 bits/axis — the spatial bucketing key a geo pipeline
    sorts/partitions by so that spatially-near records land in the same
    parquet row groups (the geo twin of ``q_zorder_layout``; geohash
    base-32 text is this integer in a different alphabet).

    Scale shape: map-only — one narrow projection, no shuffle at all;
    the Morton code is a codegen'd integer expression. Encoding 100 TB
    of points is embarrassingly parallel and the output key feeds
    range-partitioned layout writes."""
    pts = _with_coords(load(spark, sf_dir, "customer"), "c_custkey", "geoc:")
    g = 1 << _ENC_BITS
    cells = pts.select(
        "k", "lat_e4", "lon_e4",
        F.expr(f"((lon_e4 + 1800000) * {g}) DIV 3600001").alias("cx"),
        F.expr(f"((lat_e4 + 900000) * {g}) DIV 1800001").alias("cy"),
    )
    return cells.select(
        F.col("k").cast("bigint").alias("c_custkey"),
        F.col("lat_e4").cast("bigint"),
        F.col("lon_e4").cast("bigint"),
        F.col("cx").cast("bigint").alias("cell_x"),
        F.col("cy").cast("bigint").alias("cell_y"),
        F.expr(_morton_sql("cx", "cy", _ENC_BITS, "DIV"))
        .cast("bigint").alias("morton"),
    )


@query("q_geo_knn_join", oracle=f"""
WITH cust AS ({_coord_exprs_sql('c_custkey', 'geoc:')} FROM customer),
sup AS ({_coord_exprs_sql('s_suppkey', 'geos:')} FROM supplier),
cust_c AS (
  SELECT k, lat_e4, lon_e4,
         ((lon_e4 + 1800000) * {_KNN_G}) // 3600001 AS cx,
         ((lat_e4 + 900000) * {_KNN_G}) // 1800001  AS cy
  FROM cust
),
sup9 AS (
  SELECT s.k, s.lat_e4, s.lon_e4,
         ((s.lon_e4 + 1800000) * {_KNN_G}) // 3600001 + dxs.dx AS cx,
         ((s.lat_e4 + 900000) * {_KNN_G}) // 1800001 + dys.dy  AS cy
  FROM sup s
  CROSS JOIN (VALUES (-1), (0), (1)) dxs(dx)
  CROSS JOIN (VALUES (-1), (0), (1)) dys(dy)
),
cand AS (
  SELECT c.k AS c_custkey, s.k AS nn_suppkey,
         (c.lat_e4 - s.lat_e4) * (c.lat_e4 - s.lat_e4)
         + (c.lon_e4 - s.lon_e4) * (c.lon_e4 - s.lon_e4) AS d2,
         row_number() OVER (
           PARTITION BY c.k
           ORDER BY (c.lat_e4 - s.lat_e4) * (c.lat_e4 - s.lat_e4)
                    + (c.lon_e4 - s.lon_e4) * (c.lon_e4 - s.lon_e4),
                    s.k) AS rn
  FROM cust_c c JOIN sup9 s ON c.cx = s.cx AND c.cy = s.cy
)
SELECT CAST(c_custkey AS BIGINT)  AS c_custkey,
       CAST(nn_suppkey AS BIGINT) AS nn_suppkey,
       CAST(d2 AS BIGINT)         AS d2
FROM cand WHERE rn = 1
""")
def q_geo_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo: nearest-site join — each customer point is matched to its
    closest supplier site among candidates in the 3x3 cell neighborhood
    (grid-bounded search radius: the production semantics of "nearest
    within ~2 cell widths"; points whose neighborhood holds no site are
    absent, which a wider grid pass picks up). Ties break on site key.

    Scale shape: sites (the SMALL side) replicate into their 9 neighbor
    cells and broadcast; the point side equi-joins on (cell_x, cell_y)
    — never more than O(occupancy·9) candidates per point, exact
    distance + per-point argmin on candidates only. The same plan at
    petabyte point counts hash-partitions by cell; hot cells are a
    grid-resolution knob, not a join rewrite. Deliberately NO
    cross-join fallback: an all-pairs kNN at this table shape is the
    scale-killer this operator exists to avoid."""
    cust = _with_coords(load(spark, sf_dir, "customer"), "c_custkey", "geoc:")
    sup = _with_coords(load(spark, sf_dir, "supplier"), "s_suppkey", "geos:")

    def cellify(df: DataFrame) -> DataFrame:
        return df.select(
            "k", "lat_e4", "lon_e4",
            F.expr(f"((lon_e4 + 1800000) * {_KNN_G}) DIV 3600001").alias("cx"),
            F.expr(f"((lat_e4 + 900000) * {_KNN_G}) DIV 1800001").alias("cy"),
        )

    cust_c = cellify(cust)
    offsets = F.array(F.lit(-1), F.lit(0), F.lit(1))
    sup9 = (
        cellify(sup)
        .select("k", "lat_e4", "lon_e4", "cx", "cy",
                F.explode(offsets).alias("dx"))
        .select("k", "lat_e4", "lon_e4", "cx", "cy", "dx",
                F.explode(offsets).alias("dy"))
        .select(
            "k", "lat_e4", "lon_e4",
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    cand = cust_c.join(
        F.broadcast(sup9).withColumnRenamed("k", "s_k")
        .withColumnRenamed("lat_e4", "s_lat").withColumnRenamed("lon_e4", "s_lon"),
        ["cx", "cy"],
    ).select(
        F.col("k").alias("c_custkey"),
        F.col("s_k").alias("nn_suppkey"),
        (
            (F.col("lat_e4") - F.col("s_lat")) * (F.col("lat_e4") - F.col("s_lat"))
            + (F.col("lon_e4") - F.col("s_lon")) * (F.col("lon_e4") - F.col("s_lon"))
        ).alias("d2"),
    )
    w = Window.partitionBy("c_custkey").orderBy("d2", "nn_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("c_custkey").cast("bigint"),
            F.col("nn_suppkey").cast("bigint"),
            F.col("d2").cast("bigint"),
        )
    )


#: DBSCAN parameters: eps in e4 micro-degree units, minPts EXCLUDING self
_DB_EPS = 50_000
_DB_MIN = 4


@query("q_dbscan_core", oracle=rf"""
WITH pts AS ({_coord_exprs_sql("c_custkey", "geoc:")} FROM customer),
cells AS (
  SELECT k, lat_e4, lon_e4,
         CAST((lon_e4 + 1800000) // {_DB_EPS} AS BIGINT) AS cx,
         CAST((lat_e4 + 900000) // {_DB_EPS} AS BIGINT) AS cy
  FROM pts
),
cand AS (
  SELECT a.k, CAST(count(*) AS BIGINT) AS n_nbr
  FROM cells a
  JOIN (SELECT unnest(range(-1, 2)) AS dx) xx ON TRUE
  JOIN (SELECT unnest(range(-1, 2)) AS dy) yy ON TRUE
  JOIN cells b
    ON b.cx = a.cx + xx.dx AND b.cy = a.cy + yy.dy AND b.k <> a.k
   AND (CAST(a.lat_e4 - b.lat_e4 AS BIGINT) * (a.lat_e4 - b.lat_e4)
        + CAST(a.lon_e4 - b.lon_e4 AS BIGINT) * (a.lon_e4 - b.lon_e4))
       <= CAST({_DB_EPS} AS BIGINT) * {_DB_EPS}
  GROUP BY a.k
),
counts AS (
  SELECT c.k, coalesce(n.n_nbr, 0) AS n_nbr
  FROM cells c LEFT JOIN cand n ON c.k = n.k
)
SELECT CAST(CASE WHEN n_nbr > 10 THEN 10 ELSE n_nbr END AS BIGINT)
         AS nbr_bucket,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(CASE WHEN n_nbr >= {_DB_MIN} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_core
FROM counts GROUP BY 1 ORDER BY nbr_bucket
""")
def q_dbscan_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN core-point detection over the deterministic customer
    coordinates: a point is CORE when ≥ {minPts} other points lie
    within eps (exact integer squared distance). Candidates come from
    the 3×3 neighborhood of an eps-sized grid — the same bounded-cell
    discipline as ``q_geo_knn_join``, so the pair stream is
    density-bounded, never all-pairs. Output: the neighbor-count
    histogram (capped at 10+) with per-bucket core counts — the
    density profile a full DBSCAN run would cluster from.

    Scale shape: cell derivation is map-only; the 9-way cell fan-out is
    in-row; the neighbor join shuffles on the CELL key (each cell holds
    O(density) points); everything after is a count-of-counts rollup.
    All arithmetic is exact integers."""
    pts = _with_coords(load(spark, sf_dir, "customer"), "c_custkey", "geoc:")
    cells = pts.select(
        "k", "lat_e4", "lon_e4",
        F.expr(f"CAST((lon_e4 + 1800000) DIV {_DB_EPS} AS BIGINT)")
        .alias("cx"),
        F.expr(f"CAST((lat_e4 + 900000) DIV {_DB_EPS} AS BIGINT)")
        .alias("cy"),
    )
    shifts = F.expr(
        "explode(flatten(transform(sequence(-1, 1), dx -> "
        "transform(sequence(-1, 1), dy -> struct(dx AS dx, dy AS dy)))))"
    )
    probe = cells.select(
        F.col("k").alias("ak"), F.col("lat_e4").alias("alat"),
        F.col("lon_e4").alias("alon"), "cx", "cy", shifts.alias("s")
    ).select(
        "ak", "alat", "alon",
        (F.col("cx") + F.col("s.dx")).alias("jx"),
        (F.col("cy") + F.col("s.dy")).alias("jy"),
    )
    d2 = (
        (F.col("alat") - F.col("lat_e4")).cast("bigint")
        * (F.col("alat") - F.col("lat_e4"))
        + (F.col("alon") - F.col("lon_e4")).cast("bigint")
        * (F.col("alon") - F.col("lon_e4"))
    )
    cand = (
        probe.join(
            cells,
            (F.col("jx") == F.col("cx")) & (F.col("jy") == F.col("cy"))
            & (F.col("ak") != F.col("k")),
        )
        .where(d2 <= F.lit(_DB_EPS * _DB_EPS).cast("bigint"))
        .groupBy("ak")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nbr"))
    )
    counts = cells.select("k").join(
        cand, F.col("k") == F.col("ak"), "left"
    ).select(F.coalesce("n_nbr", F.lit(0)).alias("n_nbr"))
    return (
        counts.groupBy(
            F.least(F.col("n_nbr"), F.lit(10)).cast("bigint")
            .alias("nbr_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum((F.col("n_nbr") >= _DB_MIN).cast("int"))
            .cast("bigint").alias("n_core"),
        )
        .orderBy("nbr_bucket")
    )
