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


# --------------------------------------------------------------------------
# HyperLogLog (engine-portable registers)
# --------------------------------------------------------------------------

_HLL_M = 256          # registers = 2 hex chars of bucket address
_HLL_VBITS = 40       # rank bits = 10 hex chars
_HLL_ALPHA_PPM = 718273  # round(1e6 * 0.7213 / (1 + 1.079/256))
#: harmonic terms live in units of 2^-VBITS-1: register r contributes
#: 2^(VBITS+1-r); an EMPTY register (r=0) contributes 2^(VBITS+1)
_HLL_UNIT = 1 << (_HLL_VBITS + 1)
_HLL_M2U = _HLL_M * _HLL_M * _HLL_UNIT  # m^2 in harmonic units, < 2^57


def _hll_rho_sql(vh: str) -> str:
    """DuckDB/Spark-portable rank (leading-zero-run + 1) of the 40-bit
    value encoded by the 10-hex-char string ``vh`` — computed on the HEX
    STRING (zero-run length + a 4-way nibble CASE), never via float
    log2, whose half-ulp behavior at 2^k boundaries is libm-specific."""
    rem = f"length(regexp_replace({vh}, '^0*', ''))"
    first = f"substr({vh}, {10 + 1} - {rem}, 1)"
    return f"""(CASE WHEN {rem} = 0 THEN {_HLL_VBITS + 1}
      ELSE (10 - {rem}) * 4
           + (CASE WHEN {first} IN ('8','9','a','b','c','d','e','f') THEN 0
                   WHEN {first} IN ('4','5','6','7') THEN 1
                   WHEN {first} IN ('2','3') THEN 2
                   ELSE 3 END) + 1 END)"""


def _hll_oracle() -> str:
    rho = _hll_rho_sql("substr(h, 3, 10)")
    return f"""
WITH d AS (
  SELECT DISTINCT event_type,
         md5('hll1:' || CAST(user_id AS VARCHAR) || ':'
             || CAST(CAST(ts AS DATE) AS VARCHAR)) AS h
  FROM events
),
reg AS (
  SELECT event_type,
         {_hex_int_sql('h', 1, 2)} AS bucket,
         CAST(max({rho}) AS BIGINT) AS r
  FROM d GROUP BY 1, 2
),
s AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(CAST(1 AS BIGINT) << ({_HLL_VBITS + 1} - r)) AS BIGINT)
           + ({_HLL_M} - CAST(count(*) AS BIGINT)) * {_HLL_UNIT} AS harm
  FROM reg GROUP BY 1
),
ex AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact FROM d GROUP BY 1
),
raw AS (
  SELECT ex.event_type, ex.n_exact, s.n_buckets,
         {_HLL_M} - s.n_buckets AS v_empty,
         (({_HLL_M2U} + s.harm // 2) // s.harm * {_HLL_ALPHA_PPM} + 500000)
           // 1000000 AS est_raw
  FROM ex JOIN s ON s.event_type = ex.event_type
),
corr AS (
  SELECT event_type, n_exact, n_buckets, v_empty,
         CAST(CASE WHEN est_raw <= {(5 * _HLL_M) // 2} AND v_empty > 0
              THEN floor({_HLL_M} * ln({_HLL_M} * 1.0 / v_empty) + 0.5)
              ELSE est_raw END AS BIGINT) AS est_distinct
  FROM raw
)
SELECT event_type, n_exact, n_buckets, v_empty, est_distinct,
       CAST((abs(est_distinct - n_exact) * 1000000 + n_exact // 2)
            // n_exact AS BIGINT) AS err_ppm
FROM corr
"""


@query("q_hll_distinct", oracle=_hll_oracle())
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog (Flajolet et al. 2007) over the same
    (user, day) entity pool as ``q_kmv_distinct`` — the two canonical
    distinct sketches side by side, hash-checked down to their errors.
    m=256 registers addressed by 2 hex chars of md5; each register keeps
    max(leading-zero-run + 1) of the next 40 bits; the harmonic mean
    runs in EXACT integer units of 2^-41 (register r contributes
    2^(41-r), empty registers 2^41 — all BIGINT adds), the bias
    constant α₂₅₆ is a ppm literal, and the small-range regime applies
    Flajolet's linear-counting correction m·ln(m/V) (one quantized ln
    per OUTPUT row). The rank is derived from the digest's hex STRING
    (zero-run length + nibble CASE) — never float log2, whose rounding
    at 2^k boundaries is libm-specific and would break cross-engine
    hashing.

    Scale shape: registers build as a (type, bucket) MAX aggregation —
    map-side partials ARE the per-partition HLL registers and the merge
    is register-wise MAX, exactly the mergeable-sketch dataflow, with a
    hard ≤ m-row output per group no matter the corpus (vs KMV's K
    rows: HLL trades a biased-but-tighter constant-memory register file
    for KMV's unbiased order statistics). n_exact exists for error
    accounting at test scale; production drops that branch. Spark's own
    approx_count_distinct is this same sketch with engine-private
    registers (its twin ``q_approx_count_distinct`` is rows-only);
    THIS one is register-for-register reproducible in any md5-capable
    engine."""
    d = (
        load(spark, sf_dir, "events")
        .select(
            "event_type",
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit("hll1"),
                    F.col("user_id").cast("string"),
                    F.to_date("ts").cast("string"),
                )
            ).alias("h"),
        )
        .distinct()
    )
    rho = F.expr(_hll_rho_sql("substr(h, 3, 10)"))
    reg = d.groupBy(
        "event_type",
        F.conv(F.substring("h", 1, 2), 16, 10).cast("int").alias("bucket"),
    ).agg(F.max(rho).cast("bigint").alias("r"))
    s = reg.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        (
            F.sum(F.expr(f"CAST(1 AS BIGINT) << ({_HLL_VBITS + 1} - r)"))
            + (F.lit(_HLL_M) - F.count(F.lit(1))) * F.lit(_HLL_UNIT)
        ).cast("bigint").alias("harm"),
    )
    ex = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    raw = (
        ex.join(s, "event_type")
        .withColumn("v_empty", F.lit(_HLL_M) - F.col("n_buckets"))
        .withColumn(
            "est_raw",
            F.expr(
                f"(({_HLL_M2U} + harm DIV 2) DIV harm * {_HLL_ALPHA_PPM}"
                f" + 500000) DIV 1000000"
            ),
        )
    )
    corr = raw.withColumn(
        "est_distinct",
        F.expr(
            f"CAST(CASE WHEN est_raw <= {(5 * _HLL_M) // 2} AND v_empty > 0 "
            f"THEN floor({_HLL_M} * ln({_HLL_M} * 1.0 / v_empty) + 0.5) "
            f"ELSE est_raw END AS BIGINT)"
        ),
    )
    return corr.select(
        "event_type",
        "n_exact",
        "n_buckets",
        "v_empty",
        "est_distinct",
        F.expr(
            "CAST((abs(est_distinct - n_exact) * 1000000 + n_exact DIV 2)"
            " DIV n_exact AS BIGINT)"
        ).alias("err_ppm"),
    )


# --------------------------------------------------------------------------
# Mergeable histogram quantiles
# --------------------------------------------------------------------------

_QS_BINS = 64


def _qs_oracle() -> str:
    b = _QS_BINS
    return f"""
WITH stats AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(min(n_chars) AS BIGINT) AS mn,
         CAST(max(n_chars) AS BIGINT) AS mx
  FROM documents GROUP BY lang
),
binned AS (
  SELECT d.lang,
         CAST((d.n_chars - s.mn) * {b} // (s.mx - s.mn + 1) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS c
  FROM documents d JOIN stats s ON s.lang = d.lang
  GROUP BY 1, 2
),
cum AS (
  SELECT lang, bin, c,
         CAST(sum(c) OVER (PARTITION BY lang ORDER BY bin) AS BIGINT) AS cw
  FROM binned
),
ranks AS (
  SELECT lang, n, mn, mx,
         (n + 1) // 2          AS r50,
         (95 * n + 99) // 100  AS r95
  FROM stats
),
est AS (
  SELECT r.lang, r.n, r.mn, r.mx, r.r50, r.r95,
         (SELECT min(bin) FROM cum WHERE cum.lang = r.lang AND cw >= r.r50)
           AS b50,
         (SELECT min(bin) FROM cum WHERE cum.lang = r.lang AND cw >= r.r95)
           AS b95
  FROM ranks r
),
exact AS (
  SELECT o.lang,
         max(CASE WHEN o.rn = r.r50 THEN o.n_chars END) AS p50_exact,
         max(CASE WHEN o.rn = r.r95 THEN o.n_chars END) AS p95_exact
  FROM (SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY n_chars, doc_id) AS rn
        FROM documents) o
  JOIN ranks r ON r.lang = o.lang
  GROUP BY o.lang
)
SELECT e.lang, e.n, e.mn, e.mx,
       CAST(x.p50_exact AS BIGINT) AS p50_exact,
       CAST(e.mn + ((2 * e.b50 + 1) * (e.mx - e.mn + 1)) // {2 * b}
            AS BIGINT) AS p50_est,
       CAST(x.p95_exact AS BIGINT) AS p95_exact,
       CAST(e.mn + ((2 * e.b95 + 1) * (e.mx - e.mn + 1)) // {2 * b}
            AS BIGINT) AS p95_est
FROM est e JOIN exact x ON x.lang = e.lang
"""


@query("q_quantile_sketch", oracle=_qs_oracle())
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width-histogram quantiles per language: p50/p95 of
    document length estimated from a 64-bin histogram (bin-midpoint
    rule), reported beside the exact order statistics. The
    bounded-state distributed-quantile pattern behind t-digest/KLL:
    per-partition bin counts merge by ADD, so the sketch is one
    map-side-combined aggregation regardless of data size, and the
    histogram answers EVERY quantile afterwards (vs one rank per pass
    for the exact path). Bin assignment, cumulative ranks, and midpoint
    interpolation are all BIGINT arithmetic — hash-exact across
    engines; the exact branch ranks by (value, doc_id) so the order
    statistic itself is total-order deterministic.

    Scale shape: pass 1 reduces to |langs| (min, max, n) rows
    (broadcast back onto the scan); pass 2 reduces to ≤ |langs|·64 bin
    rows before the (tiny) cumulative window; estimates derive from
    bin-table lookups. The exact order-statistic branch (full per-lang
    sort) exists for error accounting at test scale — production drops
    it, keeping only the two-scan sketch. Spark's native
    approx_percentile (rows-only twin ``q_approx_percentiles``) is the
    same idea with engine-private GK summaries; this one is
    bin-for-bin reproducible anywhere."""
    b = _QS_BINS
    docs = load(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    stats = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("n_chars").cast("bigint").alias("mn"),
        F.max("n_chars").cast("bigint").alias("mx"),
    )
    binned = (
        docs.join(F.broadcast(stats), "lang")
        .select(
            "lang",
            F.expr(f"CAST((n_chars - mn) * {b} DIV (mx - mn + 1) AS BIGINT)")
            .alias("bin"),
        )
        .groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cum = binned.withColumn(
        "cw",
        F.sum("c").over(W.partitionBy("lang").orderBy("bin")).cast("bigint"),
    )
    ranks = stats.select(
        "lang",
        "n",
        "mn",
        "mx",
        F.expr("(n + 1) DIV 2").alias("r50"),
        F.expr("(95 * n + 99) DIV 100").alias("r95"),
    )
    hit = cum.join(F.broadcast(ranks), "lang")
    b50 = (
        hit.filter(F.col("cw") >= F.col("r50"))
        .groupBy("lang")
        .agg(F.min("bin").alias("b50"))
    )
    b95 = (
        hit.filter(F.col("cw") >= F.col("r95"))
        .groupBy("lang")
        .agg(F.min("bin").alias("b95"))
    )
    ranked = docs.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("lang").orderBy("n_chars", "doc_id")),
    )
    exact = (
        ranked.join(F.broadcast(ranks), "lang")
        .groupBy("lang")
        .agg(
            F.max(F.when(F.col("rn") == F.col("r50"), F.col("n_chars")))
            .cast("bigint").alias("p50_exact"),
            F.max(F.when(F.col("rn") == F.col("r95"), F.col("n_chars")))
            .cast("bigint").alias("p95_exact"),
        )
    )
    return (
        ranks.join(b50, "lang")
        .join(b95, "lang")
        .join(exact, "lang")
        .select(
            "lang",
            "n",
            "mn",
            "mx",
            "p50_exact",
            F.expr(f"CAST(mn + ((2 * b50 + 1) * (mx - mn + 1)) DIV {2 * b}"
                   f" AS BIGINT)").alias("p50_est"),
            "p95_exact",
            F.expr(f"CAST(mn + ((2 * b95 + 1) * (mx - mn + 1)) DIV {2 * b}"
                   f" AS BIGINT)").alias("p95_est"),
        )
    )


# --------------------------------------------------------------------------
# KMV sketch algebra: pairwise Jaccard from sketches
# --------------------------------------------------------------------------


def _kmv_jaccard_oracle() -> str:
    return f"""
WITH d AS (
  SELECT DISTINCT event_type,
         substr(md5('kmv1:' || CAST(user_id AS VARCHAR) || ':'
                    || CAST(CAST(ts AS DATE) AS VARCHAR)), 1, 12) AS h
  FROM events
),
kept AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
    FROM d
  ) WHERE rk <= {_KMV_K}
),
ty AS (SELECT DISTINCT event_type FROM d),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM ty a JOIN ty b ON a.event_type < b.event_type
),
u AS (
  SELECT type_a, type_b, h,
         max(ina) AS ina, max(inb) AS inb
  FROM (
    SELECT p.type_a, p.type_b, k.h, 1 AS ina, 0 AS inb
    FROM pairs p JOIN kept k ON k.event_type = p.type_a
    UNION ALL
    SELECT p.type_a, p.type_b, k.h, 0, 1
    FROM pairs p JOIN kept k ON k.event_type = p.type_b
  ) GROUP BY 1, 2, 3
),
topu AS (
  SELECT type_a, type_b, ina, inb FROM (
    SELECT type_a, type_b, ina, inb,
           row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rk
    FROM u
  ) WHERE rk <= {_KMV_K}
),
est AS (
  SELECT type_a, type_b,
         CAST(count(*) AS BIGINT) AS k_used,
         CAST(sum(ina * inb) AS BIGINT) AS n_match
  FROM topu GROUP BY 1, 2
),
ex AS (
  SELECT x.type_a, x.type_b,
         CAST((x.isz * 1000000 + x.usz // 2) // x.usz AS BIGINT)
           AS jac_exact_ppm
  FROM (
    SELECT p.type_a, p.type_b,
           (SELECT count(*) FROM d da JOIN d db
            ON da.h = db.h AND da.event_type = p.type_a
               AND db.event_type = p.type_b) AS isz,
           (SELECT count(DISTINCT h) FROM d
            WHERE event_type IN (p.type_a, p.type_b)) AS usz
    FROM pairs p
  ) x
)
SELECT e.type_a, e.type_b, e.k_used, e.n_match,
       CAST((e.n_match * 1000000 + e.k_used // 2) // e.k_used AS BIGINT)
         AS jac_est_ppm,
       ex.jac_exact_ppm,
       CAST(abs((e.n_match * 1000000 + e.k_used // 2) // e.k_used
                - ex.jac_exact_ppm) AS BIGINT) AS err_ppm
FROM est e JOIN ex ON ex.type_a = e.type_a AND ex.type_b = e.type_b
"""


@query("q_kmv_jaccard", oracle=_kmv_jaccard_oracle())
def q_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA: pairwise Jaccard between event types' (user, day)
    activity sets estimated purely from their KMV sketches — the
    bottom-k of a UNION is the bottom-k of the merged sketches (closed
    under union, the property that makes KMV an algebra, Beyer et al.
    SIGMOD 2007), and J ≈ |top-k(S_A ∪ S_B) ∩ S_A ∩ S_B| / k. The
    exact Jaccard rides along for error accounting, as everywhere in
    this family.

    Why it matters at 100 TB: pairwise similarity across N groups from
    full sets is N² data-sized joins; from sketches it is N² joins of
    K-row summaries — after the one sketch-build pass, the entire
    pairwise similarity matrix is driver-scale arithmetic. The same
    sketches answer the distinct-count question (``q_kmv_distinct``)
    — one pass, two analyses. All ranking and estimation in BIGINT;
    ppm by rounded integer division; the union's bottom-k reuses the
    WindowGroupLimit partial-top-K discipline on (pair, h) keys."""
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
        .select("event_type", "h")
    )
    # unordered type pairs expanded IN-ROW from a one-row collected type
    # list (the api.bucket_pairs combination idiom) — a ty×ty theta-join
    # would plan a BroadcastNestedLoopJoin the repo-wide hygiene test
    # rightly rejects; this derives pairs from a provably-≤1-row
    # aggregate instead
    ty_row = (
        d.select("event_type").distinct()
        .agg(F.sort_array(F.collect_list("event_type")).alias("ts"))
    )
    pairs = ty_row.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ts",
                    lambda x, i: F.transform(
                        F.slice("ts", i + 2, F.size("ts")),
                        lambda y: F.struct(
                            x.alias("type_a"), y.alias("type_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.type_a", "p.type_b")
    ka = pairs.join(
        kept.withColumnRenamed("event_type", "type_a"), "type_a"
    ).select("type_a", "type_b", "h", F.lit(1).alias("ina"), F.lit(0).alias("inb"))
    kb = pairs.join(
        kept.withColumnRenamed("event_type", "type_b"), "type_b"
    ).select("type_a", "type_b", "h", F.lit(0).alias("ina"), F.lit(1).alias("inb"))
    u = (
        ka.unionByName(kb)
        .groupBy("type_a", "type_b", "h")
        .agg(F.max("ina").alias("ina"), F.max("inb").alias("inb"))
    )
    topu = u.withColumn(
        "rk",
        F.row_number().over(W.partitionBy("type_a", "type_b").orderBy("h")),
    ).filter(F.col("rk") <= _KMV_K)
    est = topu.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.sum(F.col("ina") * F.col("inb")).cast("bigint").alias("n_match"),
    )
    # exact branch (test-scale error accounting, like n_exact elsewhere)
    da = d.withColumnRenamed("event_type", "type_a")
    db = d.withColumnRenamed("event_type", "type_b")
    inter = (
        da.join(db, ["h"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("isz"))
    )
    sizes = d.groupBy("event_type").agg(F.count(F.lit(1)).alias("sz"))
    exact = (
        inter.join(
            sizes.withColumnRenamed("event_type", "type_a")
            .withColumnRenamed("sz", "sz_a"),
            "type_a",
        )
        .join(
            sizes.withColumnRenamed("event_type", "type_b")
            .withColumnRenamed("sz", "sz_b"),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            F.expr(
                "CAST((isz * 1000000 + (sz_a + sz_b - isz) DIV 2)"
                " DIV (sz_a + sz_b - isz) AS BIGINT)"
            ).alias("jac_exact_ppm"),
        )
    )
    return (
        est.join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "k_used",
            "n_match",
            F.expr(
                "CAST((n_match * 1000000 + k_used DIV 2) DIV k_used"
                " AS BIGINT)"
            ).alias("jac_est_ppm"),
            "jac_exact_ppm",
            F.expr(
                "CAST(abs((n_match * 1000000 + k_used DIV 2) DIV k_used"
                " - jac_exact_ppm) AS BIGINT)"
            ).alias("err_ppm"),
        )
    )
