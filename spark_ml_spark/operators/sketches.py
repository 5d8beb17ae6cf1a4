"""Round-3 wave-9: mergeable sketches & join pre-flight estimation.

The 100 TB cardinality/frequency questions that exact operators answer
with a full shuffle — "how many distinct entities?", "how often does
this key occur?", "how big would this join be?" — have bounded-memory
sketch answers that merge associatively across partitions. Spark ships
HLL/CMS internally, but their binary sketches are engine-private; these
operators rebuild the textbook sketches from md5-derived hashes (the
``q_simhash_portable`` / ``q_bloom_decontaminate`` portability trick) so
both engines compute the IDENTICAL sketch and even the estimation
ERRORS are oracle-checkable:

- ``q_kmv_distinct``   — KMV / bottom-k distinct-count sketch
  (Bar-Yossef et al. 2002) per event type over (user, day) entities.
- ``q_countmin_heavy`` — count-min sketch (Cormode & Muthukrishnan
  2005), d=4 × w=256 counters, probed at the exact top-20 tokens.
- ``q_join_size_estimate`` — the Σ cₐ(k)·c_b(k) join-cardinality
  pre-flight: predicts a self-join's output size and hottest key from
  per-key counts WITHOUT materializing the join.

The reference's only cardinality tool is exact ``distinct().count()``
(``Data_transform.py:128-141``); its engine-native approximate twins
are registered as ``q_approx_count_distinct`` (rows-only — HLL binary
state is not portable). This module is the oracle-checkable sketch
family built for cross-engine verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

_HEX = "0123456789abcdef"


def _hex_int_sql(col: str, start: int, n: int) -> str:
    """DuckDB SQL for the integer value of ``n`` hex chars of ``col``
    starting at 1-based ``start`` (DuckDB has no conv(); per-char strpos
    arithmetic is exact and engine-portable)."""
    terms = [
        f"(strpos('{_HEX}', substr({col}, {start + i}, 1)) - 1)"
        f" * {16 ** (n - 1 - i)}"
        for i in range(n)
    ]
    return "(" + " + ".join(terms) + ")"


# --------------------------------------------------------------------------
# KMV distinct-count sketch
# --------------------------------------------------------------------------

_KMV_K = 256
_KMV_BITS = 48  # 12 hex chars of the md5 digest
_KMV_NUM = (_KMV_K - 1) << _KMV_BITS  # (K-1) · 2^48, exact in BIGINT


def _kmv_oracle() -> str:
    hk = _hex_int_sql("hk_hex", 1, 12)
    return f"""
WITH d AS (
  SELECT DISTINCT event_type,
         substr(md5('kmv1:' || CAST(user_id AS VARCHAR) || ':'
                    || CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 12) AS h
  FROM events
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM d
),
sk AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS kmv_k, max(h) AS hk_hex
  FROM r WHERE rk <= {_KMV_K} GROUP BY event_type
),
ex AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact
  FROM d GROUP BY event_type
),
est AS (
  SELECT ex.event_type, ex.n_exact, sk.kmv_k, sk.hk_hex,
         CAST(CASE WHEN sk.kmv_k < {_KMV_K} THEN sk.kmv_k
              ELSE ({_KMV_NUM} + {hk} // 2) // {hk} END AS BIGINT)
           AS est_distinct
  FROM ex JOIN sk ON sk.event_type = ex.event_type
)
SELECT event_type, n_exact, kmv_k, hk_hex, est_distinct,
       CAST((abs(est_distinct - n_exact) * 1000000 + n_exact // 2)
            // n_exact AS BIGINT) AS err_ppm
FROM est
"""


@query("q_kmv_distinct", oracle=_kmv_oracle())
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) distinct-count sketch per event type over
    (user, day) activity entities: hash each entity to 48 bits via md5,
    keep the K=256 smallest hashes per group (relative std error
    ≈ 1/√(K−2) ≈ 6%), estimate distinct count as
    (K-1)·2⁴⁸ / h_K (Bar-Yossef et al. 2002). Groups with fewer than K
    distinct hashes are exact by construction. Emits the exact count and
    the estimation error (ppm) alongside — with md5-derived hashes both
    engines build the identical sketch, so even the ERROR is
    hash-checked by the oracle.

    Scale shape: the entity set dedups through one map-side-combined
    shuffle of (type, 12-hex-char) keys; the per-group bottom-K ranks
    through ``row_number() <= K`` which compiles to WindowGroupLimit
    (plan-asserted in tests/test_plans.py) — every map task forwards at
    most K rows per group BEFORE the exchange, which IS the sketch's
    mergeable partial state: the plan is the same "merge bottom-k
    buffers" dataflow a hand-written KMV aggregator would run, with
    sort-based rather than heap-based partials. The estimate arithmetic
    is rounded INTEGER division ((num + h_K/2) / h_K), exact in BIGINT —
    no float in any accumulator. At 100 TB: the exact branch (n_exact)
    exists for error accounting at test scale; production drops it and
    the whole query reduces to K rows per group."""
    d = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit("kmv1"),
                        F.col("user_id").cast("string"),
                        F.to_date("ts").cast("string"),
                    )
                ),
                1,
                12,
            ).alias("h"),
        )
        .distinct()
    )
    kept = (
        d.withColumn(
            "rk", F.row_number().over(W.partitionBy("event_type").orderBy("h"))
        )
        .filter(F.col("rk") <= _KMV_K)
    )
    sk = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("kmv_k"),
        F.max("h").alias("hk_hex"),
    )
    ex = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    est = (
        ex.join(sk, "event_type")
        .withColumn("hk", F.conv("hk_hex", 16, 10).cast("bigint"))
        .withColumn(
            "est_distinct",
            F.expr(
                f"CAST(CASE WHEN kmv_k < {_KMV_K} THEN kmv_k "
                f"ELSE ({_KMV_NUM} + hk DIV 2) DIV hk END AS BIGINT)"
            ),
        )
    )
    return est.select(
        "event_type",
        "n_exact",
        "kmv_k",
        "hk_hex",
        "est_distinct",
        F.expr(
            "CAST((abs(est_distinct - n_exact) * 1000000 + n_exact DIV 2)"
            " DIV n_exact AS BIGINT)"
        ).alias("err_ppm"),
    )


# --------------------------------------------------------------------------
# Count-min sketch
# --------------------------------------------------------------------------

_CM_D = 4    # hash rows (independent 8-bit hashes from one digest)
_CM_W = 256  # counters per row = exactly 2 hex chars
_CM_PROBES = 20


def _cm_oracle() -> str:
    def hex2(p: int) -> str:
        return _hex_int_sql("hh", p, 2)

    build = "\n    UNION ALL ".join(
        f"SELECT {j} AS r, {hex2(1 + 2 * j)} AS c, exact_cnt FROM cnt"
        for j in range(_CM_D)
    )
    probe = "\n    UNION ALL ".join(
        f"SELECT token, exact_cnt, {j} AS r, {hex2(1 + 2 * j)} AS c FROM probes"
        for j in range(_CM_D)
    )
    return rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
),
cnt AS (
  SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt,
         md5('cm:' || token) AS hh
  FROM toks GROUP BY token
),
cells AS (
  SELECT r, c, CAST(sum(exact_cnt) AS BIGINT) AS cell FROM (
    {build}
  ) GROUP BY r, c
),
probes AS (
  SELECT token, exact_cnt, hh FROM cnt
  ORDER BY exact_cnt DESC, token LIMIT {_CM_PROBES}
),
pc AS (
    {probe}
)
SELECT p.token, p.exact_cnt,
       CAST(min(s.cell) AS BIGINT)               AS cm_est,
       CAST(min(s.cell) - p.exact_cnt AS BIGINT) AS overcount
FROM pc p JOIN cells s ON s.r = p.r AND s.c = p.c
GROUP BY p.token, p.exact_cnt
"""


@query("q_countmin_heavy", oracle=_cm_oracle())
def q_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over the corpus
    token stream: d=4 hash rows × w=256 counters (each row's hash is 2
    hex chars of one md5 digest per distinct token), probed at the exact
    top-20 tokens. point-estimate = min over rows of the probed
    counters; ``overcount`` = est − exact is the sketch's collision
    error, ≥ 0 by construction (count-min never underestimates — pinned
    in tests) and hash-checked exactly because both engines derive the
    same cells from the same digests.

    Scale shape: token counting is the q_vocab_build single-pass
    map-side-combined aggregation; the sketch BUILD hashes the (already
    reduced) distinct-token count table — 4 cells per distinct token —
    and re-aggregates to ≤ d·w = 1024 rows, so the second shuffle
    carries a bounded-size table no matter the corpus (that bound is the
    entire point of the sketch: per-partition partial cell tables
    merge by cell-wise ADD, which Spark's partial aggregation performs
    for free). The probe side is a broadcast join of 20×4 probe cells
    against the 1024-row sketch — driver-scale arithmetic. All counters
    are BIGINT adds: order-free, engine-exact."""
    toks = load(spark, sf_dir, "documents").select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    )
    cnt = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .withColumn("hh", F.md5(F.concat(F.lit("cm:"), F.col("token"))))
    )
    cells = (
        cnt.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("r"),
                            F.conv(F.substring("hh", 1 + 2 * j, 2), 16, 10)
                            .cast("int")
                            .alias("c"),
                            F.col("exact_cnt").alias("v"),
                        )
                        for j in range(_CM_D)
                    ]
                )
            ).alias("e")
        )
        .select("e.r", "e.c", "e.v")
    )
    sketch = cells.groupBy("r", "c").agg(F.sum("v").cast("bigint").alias("cell"))
    probes = cnt.orderBy(F.col("exact_cnt").desc(), "token").limit(_CM_PROBES)
    probe_cells = probes.select(
        "token",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("r"),
                        F.conv(F.substring("hh", 1 + 2 * j, 2), 16, 10)
                        .cast("int")
                        .alias("c"),
                    )
                    for j in range(_CM_D)
                ]
            )
        ).alias("e"),
    ).select("token", "exact_cnt", "e.r", "e.c")
    return (
        probe_cells.join(F.broadcast(sketch), ["r", "c"])
        .groupBy("token", "exact_cnt")
        .agg(F.min("cell").cast("bigint").alias("cm_est"))
        .select(
            "token",
            "exact_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("exact_cnt")).cast("bigint")
            .alias("overcount"),
        )
    )


# --------------------------------------------------------------------------
# Join-cardinality pre-flight
# --------------------------------------------------------------------------


@query("q_join_size_estimate", oracle="""
WITH c AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS ck
  FROM lineitem GROUP BY l_partkey
),
prof AS (
  SELECT CAST(sum(ck) AS BIGINT)      AS n_rows,
         CAST(count(*) AS BIGINT)     AS n_keys,
         CAST(sum(ck * ck) AS BIGINT) AS join_rows,
         CAST(max(ck) AS BIGINT)      AS max_key_rows,
         CAST(max(ck * ck) AS BIGINT) AS max_key_pairs
  FROM c
)
SELECT n_rows, n_keys, join_rows, max_key_rows, max_key_pairs,
       CAST((max_key_pairs * 1000000 + join_rows // 2) // join_rows
            AS BIGINT) AS hot_key_ppm,
       CAST((join_rows + n_rows // 2) // n_rows AS BIGINT)
         AS expansion_x
FROM prof
""")
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality pre-flight: predict the output size of the
    same-partkey lineitem self-join (the TPC-H Q17 correlation shape,
    and the shape of every LSH candidate-pair stage in this repo) from
    per-key counts alone — |A ⋈ A| = Σₖ c(k)², hottest key = max c(k)²
    — WITHOUT materializing a single joined row. Emits row/key counts,
    the exact predicted join size, the hottest key's share (ppm), and
    the per-input-row expansion factor.

    This is the question a 100 TB plan review asks before EVERY
    many-to-many join ("does this explode?"), answered with one
    map-side-combined count aggregation over the join key — the same
    pre-flight discipline as ``q_skew_profile``, specialized to join
    fan-out. The count table (|distinct keys| rows) reduces to a
    single profile row via order-free BIGINT sums; the ppm/expansion
    ratios are rounded integer division — no float anywhere. The
    predicted size is EXACT (verified against the materialized join in
    tests/test_sketches.py), not an estimate: sketching is needed only
    when even the per-key count table is too hot, at which point the
    same formula runs over the count-min cells instead."""
    c = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ck"))
    )
    prof = c.agg(
        F.sum("ck").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.col("ck") * F.col("ck")).cast("bigint").alias("join_rows"),
        F.max("ck").cast("bigint").alias("max_key_rows"),
        F.max(F.col("ck") * F.col("ck")).cast("bigint").alias("max_key_pairs"),
    )
    return prof.select(
        "n_rows",
        "n_keys",
        "join_rows",
        "max_key_rows",
        "max_key_pairs",
        F.expr(
            "CAST((max_key_pairs * 1000000 + join_rows DIV 2) DIV join_rows"
            " AS BIGINT)"
        ).alias("hot_key_ppm"),
        F.expr("CAST((join_rows + n_rows DIV 2) DIV n_rows AS BIGINT)").alias(
            "expansion_x"
        ),
    )
