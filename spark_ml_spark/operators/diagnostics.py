"""Round-3 wave-8: engine/shuffle diagnostics.

``q_skew_profile`` — shuffle-key skew profile of the corpus token
distribution: the pre-flight answer to "is this key safe to shuffle
on?" that a 100 TB plan review asks before every groupBy/join. Reports
key cardinality, hottest-key mass, max/mean skew factor, singleton
tail, and Shannon entropy — the numbers that decide between a plain
hash shuffle, AQE skew-join, or salting (the registered
``q_salted_agg`` is the mitigation this profile triggers).

Engine exactness: everything integer (ppm ratios, micro-nat entropy).
Entropy is computed on the COUNT-OF-COUNTS table (|distinct count
values| rows — tiny even when the key table is huge): every key with
the same count contributes the same term, so quantization happens per
distinct-count row and the sum is an order-free BIGINT add (the
q_lm_score discipline).

The reference profiles columns only via describe/distinct
(``Data_transform.py:128-141``); skew diagnostics are a north-star
scale extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark import api
from spark_ml_spark.registry import query


@query("q_skew_profile", oracle=r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
),
keys AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY token
),
cof AS (
  SELECT c, CAST(count(*) AS BIGINT) AS freq FROM keys GROUP BY c
),
tot AS (
  SELECT CAST(sum(c * freq) AS BIGINT) AS total,
         CAST(sum(freq) AS BIGINT)     AS n_keys,
         CAST(max(c) AS BIGINT)        AS max_cnt
  FROM cof
)
SELECT tot.n_keys,
       tot.total                                    AS total_rows,
       tot.max_cnt,
       CAST(COALESCE((SELECT freq FROM cof WHERE c = 1), 0) AS BIGINT)
         AS singleton_keys,
       CAST(floor(tot.max_cnt * 1000000.0 * tot.n_keys / tot.total + 0.5)
            AS BIGINT)                              AS skew_ppm,
       CAST(floor(tot.max_cnt * 1000000.0 / tot.total + 0.5) AS BIGINT)
         AS top_share_ppm,
       (SELECT CAST(sum(CAST(floor(
           (cof.freq * cof.c * 1000000.0 / tot.total)
           * (-ln(cof.c * 1.0 / tot.total)) + 0.5) AS BIGINT)) AS BIGINT)
        FROM cof)                                   AS entropy_micro_nats
FROM tot
""")
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profile of the token distribution (Zipfian — the
    worst realistic shuffle key): key cardinality, total occurrences,
    hottest key's count and corpus share (ppm), max/mean skew factor
    (ppm — 1e6 = perfectly uniform), singleton-key tail, and Shannon
    entropy in integer micro-nats. skew_ppm ≫ 1e6 says a plain hash
    shuffle on this key stragglers; the mitigations are the registered
    ``q_salted_agg`` two-phase shape or AQE skew-join (on in
    session.py).

    Scale shape: one explode → map-side-combined key count (the
    q_vocab_build pass), immediately re-aggregated into the COUNT-OF-
    COUNTS table — |distinct count values| rows (≈ hundreds even for
    billion-key tables, Zipf guarantees collisions) — from which every
    statistic derives: the heavy key-sized table reduces before any
    further math, and the entropy sum quantizes per distinct-count row
    (order-free BIGINT adds). The singleton lookup and entropy are
    sub-aggregates of the same tiny table."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token")
        )
    )
    keys = toks.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cof = keys.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    tot = cof.agg(
        F.sum(F.col("c") * F.col("freq")).cast("bigint").alias("total"),
        F.sum("freq").cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_cnt"),
    )
    singles = cof.filter(F.col("c") == 1).agg(
        F.coalesce(F.sum("freq"), F.lit(0)).cast("bigint")
        .alias("singleton_keys")
    )
    entropy = (
        cof.crossJoin(F.broadcast(tot.select("total")))
        .select(
            F.floor(
                (F.col("freq") * F.col("c") * 1000000.0 / F.col("total"))
                * (-F.log(F.col("c") * F.lit(1.0) / F.col("total")))
                + F.lit(0.5)
            ).cast("bigint").alias("t")
        )
        .agg(F.sum("t").cast("bigint").alias("entropy_micro_nats"))
    )
    return (
        tot.crossJoin(F.broadcast(singles))
        .crossJoin(F.broadcast(entropy))
        .select(
            "n_keys",
            F.col("total").alias("total_rows"),
            "max_cnt",
            "singleton_keys",
            F.floor(
                F.col("max_cnt") * 1000000.0 * F.col("n_keys")
                / F.col("total") + F.lit(0.5)
            ).cast("bigint").alias("skew_ppm"),
            F.floor(
                F.col("max_cnt") * 1000000.0 / F.col("total") + F.lit(0.5)
            ).cast("bigint").alias("top_share_ppm"),
            "entropy_micro_nats",
        )
    )


# --------------------------------------------------------------------------
# Rolling anomaly detection (wave-9)
# --------------------------------------------------------------------------


@query("q_anomaly_detect", oracle="""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS day_idx,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day_idx, cnt,
         CAST(count(*) OVER tw AS BIGINT)        AS w_n,
         CAST(sum(cnt) OVER tw AS BIGINT)        AS w_sum,
         CAST(sum(cnt * cnt) OVER tw AS BIGINT)  AS w_sumsq
  FROM daily
  WINDOW tw AS (PARTITION BY event_type ORDER BY day_idx
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day_idx, cnt, w_n, w_sum, w_sumsq,
       CAST(CASE WHEN w_n * w_sumsq > w_sum * w_sum
                  AND (w_n * cnt - w_sum) * (w_n * cnt - w_sum)
                      > 4 * (w_n * w_sumsq - w_sum * w_sum)
            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM w
""")
def q_anomaly_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag on per-type daily event volumes —
    the monitoring primitive behind "did this source's traffic spike?"
    data-quality alerts. Each (type, day) count is tested against its
    trailing 7-day window's mean/std; the |z| > 2 test is evaluated as
    the cross-multiplied INTEGER inequality
    (n·c − S)² > 4·(n·Q − S²)  [S=Σcnt, Q=Σcnt² over the window]
    which is algebraically z² > 4 with zero divisions, square roots, or
    floats — every cell BIGINT, hash-exact by construction. A
    zero-variance window (n·Q = S²) can never flag, because the current
    day is inside its own trailing window.

    Scale shape: one map-side-combined (type, day) count aggregation
    collapses the raw stream to |types|·|days| rows BEFORE the window;
    the trailing frame is a RANGE frame over the integer day index
    (gap-robust: missing days widen the calendar span, not the frame
    arithmetic), partitioned by type — no global window, no second
    shuffle beyond the window's own partition-by exchange. The batch
    twin of the streaming watermark aggregations in
    streaming/stream_queries.py, and the statistical sibling of
    ``q_skew_profile`` (which profiles keys; this profiles time)."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("day_idx"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    tw = (
        Window.partitionBy("event_type")
        .orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
    )
    w = daily.select(
        "event_type",
        "day_idx",
        "cnt",
        F.count(F.lit(1)).over(tw).cast("bigint").alias("w_n"),
        F.sum("cnt").over(tw).cast("bigint").alias("w_sum"),
        F.sum(F.col("cnt") * F.col("cnt")).over(tw).cast("bigint")
        .alias("w_sumsq"),
    )
    z2 = (F.col("w_n") * F.col("cnt") - F.col("w_sum")) * (
        F.col("w_n") * F.col("cnt") - F.col("w_sum")
    )
    var_n2 = F.col("w_n") * F.col("w_sumsq") - F.col("w_sum") * F.col("w_sum")
    return w.select(
        "event_type",
        "day_idx",
        "cnt",
        "w_n",
        "w_sum",
        "w_sumsq",
        F.when((var_n2 > 0) & (z2 > 4 * var_n2), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_anomaly"),
    )


# --------------------------------------------------------------------------
# Categorical association audit — wave-15
# --------------------------------------------------------------------------


@query("q_association_audit", oracle="""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_ls
  FROM documents GROUP BY 1, 2
),
marg_l AS (SELECT lang, CAST(sum(n_ls) AS BIGINT) AS n_l FROM cells GROUP BY 1),
marg_s AS (SELECT source, CAST(sum(n_ls) AS BIGINT) AS n_s FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(n_ls) AS BIGINT) AS n,
               CAST(count(DISTINCT lang) AS BIGINT) AS r,
               CAST(count(DISTINCT source) AS BIGINT) AS c
        FROM cells),
terms AS (
  SELECT CAST(floor((ce.n_ls * 1000000.0 / tot.n)
               * ln(ce.n_ls * 1.0 * tot.n / (ml.n_l * ms.n_s)) + 0.5)
              AS BIGINT) AS mi_t,
         CAST(floor((ce.n_ls - ml.n_l * 1.0 * ms.n_s / tot.n)
                    * (ce.n_ls - ml.n_l * 1.0 * ms.n_s / tot.n)
                    / (ml.n_l * 1.0 * ms.n_s / tot.n) * 1000000.0 + 0.5)
              AS BIGINT) AS chi_t
  FROM cells ce
  JOIN marg_l ml ON ml.lang = ce.lang
  JOIN marg_s ms ON ms.source = ce.source, tot
)
SELECT tot.n, tot.r, tot.c,
       CAST(sum(mi_t) AS BIGINT)  AS mi_micro_nats,
       CAST(sum(chi_t) AS BIGINT) AS chi2_micro,
       CAST(floor(sqrt((sum(chi_t) / 1000000.0)
                       / (tot.n * (LEAST(tot.r, tot.c) - 1))) * 1000000.0
                  + 0.5) AS BIGINT) AS cramers_v_ppm
FROM terms, tot
GROUP BY tot.n, tot.r, tot.c
""")
def q_association_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical association audit between language and source:
    mutual information (micro-nats), the chi-square statistic (micro
    units), and Cramér's V — the "is this metadata column predictive
    of that one" pre-flight behind stratification, leakage checks, and
    mixture design (a near-zero V says the columns can be sampled
    independently; a high V says a domain split leaks language and
    vice versa). Complements ``q_event_pmi`` (pairwise co-occurrence)
    with the whole-table dependence measures.

    Engine exactness: both statistics accumulate in the q_skew_profile
    discipline — the corpus reduces to the r×c contingency table
    map-side, each CELL's term quantizes to an integer (one ln/division
    per cell over exact BIGINT counts), and the cell terms sum as
    order-free BIGINT adds; Cramér's V derives from the already
    quantized chi2 so both engines round the identical double. Windows:
    none. Joins: marginals broadcast onto the |cells| ≤ r·c row table
    (Spark side) — nothing data-sized moves after the first
    aggregation."""
    cells = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ls"))
    )
    marg_l = cells.groupBy("lang").agg(F.sum("n_ls").cast("bigint").alias("n_l"))
    marg_s = cells.groupBy("source").agg(
        F.sum("n_ls").cast("bigint").alias("n_s")
    )
    tot = cells.agg(
        F.sum("n_ls").cast("bigint").alias("n"),
        F.countDistinct("lang").cast("bigint").alias("r"),
        F.countDistinct("source").cast("bigint").alias("c"),
    )
    e = F.col("n_l") * F.lit(1.0) * F.col("n_s") / F.col("n")
    terms = (
        cells.join(F.broadcast(marg_l), "lang")
        .join(F.broadcast(marg_s), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "r",
            "c",
            F.floor(
                (F.col("n_ls") * 1000000.0 / F.col("n"))
                * F.log(
                    F.col("n_ls") * F.lit(1.0) * F.col("n")
                    / (F.col("n_l") * F.col("n_s"))
                )
                + F.lit(0.5)
            ).cast("bigint").alias("mi_t"),
            F.floor(
                (F.col("n_ls") - e) * (F.col("n_ls") - e) / e * 1000000.0
                + F.lit(0.5)
            ).cast("bigint").alias("chi_t"),
        )
    )
    return terms.groupBy("n", "r", "c").agg(
        F.sum("mi_t").cast("bigint").alias("mi_micro_nats"),
        F.sum("chi_t").cast("bigint").alias("chi2_micro"),
        F.floor(
            F.sqrt(
                (F.sum("chi_t") / F.lit(1000000.0))
                / (F.col("n") * (F.least(F.col("r"), F.col("c")) - 1))
            )
            * 1000000.0
            + F.lit(0.5)
        ).cast("bigint").alias("cramers_v_ppm"),
    )


# --------------------------------------------------------------------------
# Distribution drift: KS distance + PSI — wave-16
# --------------------------------------------------------------------------


@query("q_ks_drift", oracle="""
WITH lab AS (
  SELECT n_chars AS v, doc_id % 2 AS g FROM documents
),
hist AS (
  SELECT v,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM lab GROUP BY v
),
cum AS (
  SELECT v,
         CAST(sum(a) OVER (ORDER BY v) AS BIGINT) AS ca,
         CAST(sum(b) OVER (ORDER BY v) AS BIGINT) AS cb
  FROM hist
),
tot AS (
  SELECT CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
  FROM hist
),
gaps AS (
  SELECT v, abs(ca * tot.nb - cb * tot.na) AS d2, tot.na, tot.nb
  FROM cum, tot
),
best AS (
  SELECT na, nb, d2 AS max_d2,
         v AS ks_at_value,
         row_number() OVER (ORDER BY d2 DESC, v) AS rk
  FROM gaps
)
SELECT na, nb,
       CAST((max_d2 * 1000000 + (na * nb) // 2) // (na * nb) AS BIGINT)
         AS ks_ppm,
       CAST(ks_at_value AS BIGINT) AS ks_at_value
FROM best WHERE rk = 1
""")
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the length
    distributions of two corpus snapshots (even vs odd doc_ids — the
    ``q_drift_diff``/``q_snapshot_dedup`` snapshot framing):
    D = max_v |F_A(v) − F_B(v)|, evaluated ENTIRELY in integers by
    cross-multiplying the empirical CDFs (|c_A·n_B − c_B·n_A| over the
    merged value histogram, divided once at the end) — the
    distribution-drift alarm that, unlike the mean-based
    ``q_embedding_drift``, catches shape changes with equal means.
    Reports where the maximum gap sits (``ks_at_value``, ties to the
    smallest value) — the place to look when the alarm fires.

    Scale shape: the two samples reduce to ONE merged value histogram
    map-side (a and b counts in the same row — no join of two
    histograms needed); cumulative and argmax run over |distinct
    values| histogram rows (quantize continuous variables first, the
    q_auc note). No float anywhere until the final ppm division."""
    from pyspark.sql import Window as W

    lab = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("v"), (F.col("doc_id") % 2).alias("g")
    )
    hist = lab.groupBy("v").agg(
        F.sum((F.col("g") == 0).cast("bigint")).cast("bigint").alias("a"),
        F.sum((F.col("g") == 1).cast("bigint")).cast("bigint").alias("b"),
    )
    cum = hist.select(
        "v",
        # lit(0) partition key: the cumulative sum runs over the value
        # HISTOGRAM (bounded distinct grid values, not corpus rows), so
        # single-partition is the design; the key silences the WindowExec
        # warning so it stays a signal for corpus-sized windows
        F.sum("a").over(W.partitionBy(api.one_partition("v")).orderBy("v"))
        .cast("bigint").alias("ca"),
        F.sum("b").over(W.partitionBy(api.one_partition("v")).orderBy("v"))
        .cast("bigint").alias("cb"),
    )
    tot = hist.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
    )
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "na",
        "nb",
        F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
        .alias("d2"),
    )
    best = gaps.withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy(api.one_partition("v")).orderBy(F.col("d2").desc(), "v")
        ),
    ).filter(F.col("rk") == 1)
    return best.select(
        "na",
        "nb",
        F.expr(
            "CAST((d2 * 1000000 + (na * nb) DIV 2) DIV (na * nb) AS BIGINT)"
        ).alias("ks_ppm"),
        F.col("v").cast("bigint").alias("ks_at_value"),
    )


_PSI_BINS = 10


@query("q_psi_drift", oracle=f"""
WITH lab AS (
  SELECT n_chars AS v, doc_id % 2 AS g FROM documents
),
b AS (
  SELECT min(v) AS mn, max(v) AS mx FROM lab
),
binned AS (
  SELECT LEAST({_PSI_BINS - 1}, (v - b.mn) * {_PSI_BINS} // (b.mx - b.mn + 1))
           AS bin,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bc
  FROM lab, b GROUP BY 1
),
tot AS (
  SELECT CAST(sum(a) + {_PSI_BINS} AS BIGINT) AS na,
         CAST(sum(bc) + {_PSI_BINS} AS BIGINT) AS nb
  FROM binned
),
terms AS (
  SELECT bin,
         CAST(floor((((a + 1) * 1.0 / tot.na) - ((bc + 1) * 1.0 / tot.nb))
                    * ln(((a + 1) * 1.0 / tot.na)
                         / ((bc + 1) * 1.0 / tot.nb)) * 1000000.0 + 0.5)
              AS BIGINT) AS t
  FROM binned, tot
)
SELECT CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(t) AS BIGINT)   AS psi_micro,
       CAST(max(t) AS BIGINT)   AS worst_bin_micro
FROM terms
""")
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the two corpus snapshots —
    the production drift metric monitoring teams threshold at 0.1/0.25
    — over 10 equi-width length bins with Laplace (+1) smoothing so
    empty bins stay finite and INTEGER: each bin's
    (p_A − p_B)·ln(p_A/p_B) term quantizes to micro units (one
    ln per BIN over exact smoothed counts) and the total is an
    order-free BIGINT sum; every term is ≥ 0 by construction (x·ln of
    same-sign ratio), pinned in tests. The binned sibling of
    ``q_ks_drift`` (KS finds WHERE the gap is; PSI weights ALL of it,
    and its per-bin terms name the drifted regions).

    Scale shape: bounds broadcast; one map-side-combined bin count with
    both snapshots' counts in the same row; the term table is exactly
    N_BINS rows. The same plan monitors any score column at any
    cadence."""
    lab = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("v"), (F.col("doc_id") % 2).alias("g")
    )
    b = lab.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    binned = (
        lab.crossJoin(F.broadcast(b))
        .groupBy(
            F.least(
                F.lit(_PSI_BINS - 1),
                F.expr(f"(v - mn) * {_PSI_BINS} DIV (mx - mn + 1)"),
            ).alias("bin")
        )
        .agg(
            F.sum((F.col("g") == 0).cast("bigint")).cast("bigint").alias("a"),
            F.sum((F.col("g") == 1).cast("bigint")).cast("bigint").alias("bc"),
        )
    )
    tot = binned.agg(
        (F.sum("a") + _PSI_BINS).cast("bigint").alias("na"),
        (F.sum("bc") + _PSI_BINS).cast("bigint").alias("nb"),
    )
    pa = (F.col("a") + 1) * F.lit(1.0) / F.col("na")
    pb = (F.col("bc") + 1) * F.lit(1.0) / F.col("nb")
    terms = binned.crossJoin(F.broadcast(tot)).select(
        F.floor((pa - pb) * F.log(pa / pb) * 1000000.0 + F.lit(0.5))
        .cast("bigint")
        .alias("t")
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("t").cast("bigint").alias("psi_micro"),
        F.max("t").cast("bigint").alias("worst_bin_micro"),
    )


# --------------------------------------------------------------------------
# Data-quality constraint report — wave-17
# --------------------------------------------------------------------------


@query("q_dq_report", oracle="""
WITH loaded AS (
  -- simulated partial load: orders rows with orderkey % 97 = 0 missing
  SELECT * FROM orders WHERE o_orderkey % 97 <> 0
),
doubled AS (
  -- simulated double load: rows with orderkey % 101 = 0 appended twice
  SELECT o_orderkey FROM loaded
  UNION ALL
  SELECT o_orderkey FROM loaded WHERE o_orderkey % 101 = 0
),
checks AS (
  SELECT 'pk_dup_orders' AS check_name,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_bad,
         CAST(count(*) AS BIGINT) AS n_checked
  FROM doubled
  UNION ALL
  SELECT 'fk_orphan_lineitem',
         CAST(count(*) AS BIGINT), (SELECT count(*) FROM lineitem)
  FROM lineitem l
  WHERE NOT EXISTS (SELECT 1 FROM loaded o WHERE o.o_orderkey = l.l_orderkey)
  UNION ALL
  SELECT 'null_quantity',
         CAST(count(*) FILTER (l_quantity IS NULL) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'range_discount',
         CAST(count(*) FILTER (l_discount < 0 OR l_discount > 1) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'range_quantity_pos',
         CAST(count(*) FILTER (l_quantity <= 0) AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem
)
SELECT check_name, n_bad, n_checked,
       CAST((n_bad * 1000000 + n_checked // 2) // n_checked AS BIGINT)
         AS bad_ppm
FROM checks
""")
def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint report over the star schema — the
    dbt-test / Deequ-style validation pass every ingest runs before
    downstream jobs trust the data: primary-key uniqueness,
    referential integrity, null rate, and value-range checks, one row
    per check with an integer-ppm violation rate. The two ingest
    failure modes every warehouse eventually meets are SIMULATED
    deterministically so all check paths are exercised (the
    q_snapshot_dedup carving discipline): a partial load (orders with
    orderkey % 97 = 0 missing → lineitem orphans) and a double load
    (orderkey % 101 = 0 appended twice → PK duplicates); the null and
    range checks audit the real columns (and report the fixture's
    genuine cleanliness).

    Scale shape: each check is a map-side-combined aggregate — PK
    uniqueness via count−distinct (two-phase), referential integrity
    via a LEFT ANTI join on the key (never a row-by-row lookup), null
    and range checks as conditional counts fused into single scans.
    The report unions five one-row aggregates; nothing data-sized
    moves except the anti-join's key exchange. At 100 TB these checks
    append per-partition to a metrics table and alert on bad_ppm
    deltas (the q_anomaly_detect consumer)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_discount"
    )
    loaded = orders.filter(F.col("o_orderkey") % 97 != 0)
    doubled = loaded.unionAll(loaded.filter(F.col("o_orderkey") % 101 == 0))
    pk = doubled.agg(
        F.lit("pk_dup_orders").alias("check_name"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint").alias("n_bad"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
    )
    li_total = li.agg(F.count(F.lit(1)).cast("bigint").alias("li_n"))
    fk = (
        li.join(loaded, li.l_orderkey == loaded.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_bad"))
        .crossJoin(F.broadcast(li_total))
        .select(
            F.lit("fk_orphan_lineitem").alias("check_name"),
            "n_bad",
            F.col("li_n").alias("n_checked"),
        )
    )
    scans = li.agg(
        F.sum(F.col("l_quantity").isNull().cast("bigint")).alias("nullq"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
            .cast("bigint")
        ).alias("rd"),
        F.sum((F.col("l_quantity") <= 0).cast("bigint")).alias("rq"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    nullq = scans.select(
        F.lit("null_quantity").alias("check_name"),
        F.col("nullq").cast("bigint").alias("n_bad"),
        F.col("n").alias("n_checked"),
    )
    rngd = scans.select(
        F.lit("range_discount").alias("check_name"),
        F.col("rd").cast("bigint").alias("n_bad"),
        F.col("n").alias("n_checked"),
    )
    rngq = scans.select(
        F.lit("range_quantity_pos").alias("check_name"),
        F.col("rq").cast("bigint").alias("n_bad"),
        F.col("n").alias("n_checked"),
    )
    return (
        pk.unionAll(fk).unionAll(nullq).unionAll(rngd).unionAll(rngq)
        .select(
            "check_name",
            "n_bad",
            "n_checked",
            F.expr(
                "CAST((n_bad * 1000000 + n_checked DIV 2) DIV n_checked"
                " AS BIGINT)"
            ).alias("bad_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Benford first-digit audit — wave-17
# --------------------------------------------------------------------------

#: round(log10(1 + 1/d) * 1e6) for d = 1..9 — precomputed so NEITHER
#: engine evaluates a logarithm (zero cross-engine libm surface)
_BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992,
                51153, 45757)


def _benford_oracle() -> str:
    vals = ", ".join(
        f"({d}, {p})" for d, p in enumerate(_BENFORD_PPM, start=1)
    )
    return f"""
WITH digits AS (
  -- floor() explicitly: DuckDB CAST(double AS BIGINT) rounds half-even
  -- while Spark's cast truncates — floor agrees everywhere
  SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT) AS VARCHAR),
                     1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM lineitem WHERE l_extendedprice >= 1
  GROUP BY 1
),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM digits),
bf(digit, benford_ppm) AS (VALUES {vals})
SELECT d.digit, d.n_obs,
       CAST((d.n_obs * 1000000 + tot.n // 2) // tot.n AS BIGINT) AS obs_ppm,
       CAST(bf.benford_ppm AS BIGINT) AS benford_ppm,
       CAST(floor((d.n_obs - tot.n * (bf.benford_ppm / 1000000.0))
                  * (d.n_obs - tot.n * (bf.benford_ppm / 1000000.0))
                  / (tot.n * (bf.benford_ppm / 1000000.0)) * 1000000.0
                  + 0.5) AS BIGINT) AS chi2_micro
FROM digits d JOIN bf ON bf.digit = d.digit, tot
"""


@query("q_benford_audit", oracle=_benford_oracle())
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of the price column — the
    classic fabricated-data detector (Benford 1938; Nigrini's forensic
    accounting standard): natural multiplicative data puts ~30.1% of
    first digits at 1, while generated/uniform data spreads them flat.
    Per digit: observed count and ppm, the Benford expectation, and the
    chi-square contribution — the fixture's uniform synthetic prices
    FAIL the audit loudly (pinned in tests), which is precisely the
    point: this op detects synthetic/fabricated value columns in an
    ingest. The Benford probabilities are PRECOMPUTED ppm literals, so
    neither engine evaluates a logarithm — zero cross-engine libm
    surface (tighter even than the q_lm_score quantized-ln discipline).

    Scale shape: first digit extracts in-row (cast → substr — no UDF),
    one map-side-combined 9-group count, the total broadcasts back, and
    each digit's chi-square term quantizes once over exact integers.
    Works on any positive measure column unchanged."""
    digits = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_extendedprice") >= 1)
        .groupBy(
            F.substring(
                F.floor(F.col("l_extendedprice")).cast("bigint")
                .cast("string"), 1, 1
            ).cast("bigint").alias("digit")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    tot = digits.agg(F.sum("n_obs").cast("bigint").alias("n"))
    bf = F.broadcast(
        digits.sparkSession.createDataFrame(
            [(d, p) for d, p in enumerate(_BENFORD_PPM, start=1)],
            "digit bigint, benford_ppm bigint",
        )
    )
    e = F.col("n") * (F.col("benford_ppm") / F.lit(1000000.0))
    return (
        digits.join(bf, "digit")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.expr(
                "CAST((n_obs * 1000000 + n DIV 2) DIV n AS BIGINT)"
            ).alias("obs_ppm"),
            "benford_ppm",
            F.floor(
                (F.col("n_obs") - e) * (F.col("n_obs") - e) / e
                * F.lit(1000000.0)
                + F.lit(0.5)
            ).cast("bigint").alias("chi2_micro"),
        )
    )


# --------------------------------------------------------------------------
# EWMA forecast — wave-18
# --------------------------------------------------------------------------

#: round(0.3 · 0.7^k · 2^20) for k = 0..7 — fixed-point EWMA weights
#: (α = 0.3, 8-lag truncation), precomputed so neither engine
#: exponentiates; Σ = 988127 is the normalizer (truncation leaves
#: ~1.2% of the geometric mass beyond lag 7)
_EWMA_W = (314573, 220201, 154141, 107898, 75529, 52870, 37009, 25906)
_EWMA_WSUM = sum(_EWMA_W)


def _ewma_oracle() -> str:
    num = " + ".join(
        f"{w} * COALESCE(lag(cnt, {k + 1}) OVER w, 0)"
        for k, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"CASE WHEN lag(cnt, {k + 1}) OVER w IS NULL THEN 0 ELSE {w} END"
        for k, w in enumerate(_EWMA_W)
    )
    return f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS day_idx,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
f AS (
  SELECT event_type, day_idx, cnt,
         CAST({num} AS BIGINT) AS num,
         CAST({den} AS BIGINT) AS den
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx)
)
SELECT event_type, day_idx, cnt,
       CAST((num + den // 2) // den AS BIGINT) AS forecast,
       CAST(cnt - (num + den // 2) // den AS BIGINT) AS residual
FROM f WHERE den > 0
"""


@query("q_ewma_forecast", oracle=_ewma_oracle())
def q_ewma_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead EWMA forecast of daily event volume per type
    (α = 0.3, 8-lag truncated) with residuals — the exponential-
    smoothing baseline every volume-forecasting and alerting stack
    starts from (Holt 1957 lineage; the forecasting sibling of
    ``q_anomaly_detect``'s rolling z-score, which asks "is today odd?"
    where this asks "what did we expect today to be?"). Weights are
    FIXED-POINT 2⁻²⁰ integers precomputed at import (neither engine
    exponentiates), the weighted sum is pure BIGINT arithmetic, and
    warm-up edges renormalize over the PRESENT lags only (den counts
    available weights), so the first forecastable day uses one lag,
    not a zero-padded window.

    Scale shape: one map-side-combined (type, day) count collapses the
    stream; all eight lags evaluate in ONE partitioned window pass
    (same spec → one WindowExec, the q_path_topk discipline); rounded
    integer division yields the forecast. Residuals feed the
    ``q_anomaly_detect`` alert and the per-type bias check pinned in
    tests."""
    from pyspark.sql import Window as W

    daily = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
            .cast("bigint")
            .alias("day_idx"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    w = W.partitionBy("event_type").orderBy("day_idx")
    lags = [F.lag("cnt", k + 1).over(w) for k in range(len(_EWMA_W))]
    num = sum(
        (F.coalesce(lg, F.lit(0)) * F.lit(wt)
         for lg, wt in zip(lags, _EWMA_W)),
        F.lit(0),
    )
    den = sum(
        (F.when(lg.isNull(), 0).otherwise(wt)
         for lg, wt in zip(lags, _EWMA_W)),
        F.lit(0),
    )
    f = daily.select(
        "event_type",
        "day_idx",
        "cnt",
        num.cast("bigint").alias("num"),
        den.cast("bigint").alias("den"),
    ).filter(F.col("den") > 0)
    return f.select(
        "event_type",
        "day_idx",
        "cnt",
        F.expr("CAST((num + den DIV 2) DIV den AS BIGINT)").alias("forecast"),
        F.expr("CAST(cnt - (num + den DIV 2) DIV den AS BIGINT)")
        .alias("residual"),
    )


@query("q_entropy_profile", oracle="""
WITH vals AS (
  SELECT 'lang' AS col_name, lang AS v FROM documents
  UNION ALL
  SELECT 'source' AS col_name, source AS v FROM documents
),
h AS (
  SELECT col_name, v, CAST(count(*) AS BIGINT) AS c
  FROM vals GROUP BY col_name, v
),
s AS (SELECT col_name, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY col_name)
SELECT h.col_name,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(CAST(floor(c * (ln(CAST(n AS DOUBLE) / c)) / n * 1000000.0
                           + 0.5) AS BIGINT)) AS BIGINT)  AS entropy_micronat,
       CAST(floor(max(c) * 1000000.0 / max(n) + 0.5) AS BIGINT)
         AS top_share_ppm
FROM h JOIN s USING (col_name)
GROUP BY h.col_name
""")
def q_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling: per-column Shannon entropy + concentration — the
    column-level summary a profiler (Deequ/dbt docs) prints beside
    ``q_dq_report``'s constraint checks: near-zero entropy or a
    top-value share near 1e6 ppm flags a column that is effectively
    constant (dead dimension, broken extractor); entropy near
    ln(n_distinct) flags uniform/synthetic values.

    Engine exactness: the ``q_lm_score`` discipline — each value's
    ``(c/n)·ln(n/c)`` term is quantized to integer micro-nats at the
    VALUE-HISTOGRAM table (one ln per distinct value), so the per-column
    reduction is exact order-free BIGINT summation.

    Scale shape: one ``stack`` unpivot scan (column count × rows, map
    only) → per-(column, value) hash agg with map-side combine (the only
    corpus-sized exchange) → per-column rollup over histogram-sized
    data. Profiling 100 TB costs one pass regardless of how many columns
    are stacked."""
    vals = load(spark, sf_dir, "documents").selectExpr(
        "stack(2, 'lang', lang, 'source', source) AS (col_name, v)"
    )
    h = vals.groupBy("col_name", "v").agg(F.count(F.lit(1)).alias("c"))
    s = h.groupBy("col_name").agg(F.sum("c").cast("long").alias("n"))
    term = F.floor(
        F.col("c")
        * F.log(F.col("n").cast("double") / F.col("c"))
        / F.col("n")
        * 1000000.0
        + 0.5
    ).cast("long")
    return (
        h.join(F.broadcast(s), "col_name")
        .groupBy("col_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(term).cast("long").alias("entropy_micronat"),
            F.floor(F.max("c") * 1000000.0 / F.max("n") + 0.5)
            .cast("long").alias("top_share_ppm"),
        )
    )
