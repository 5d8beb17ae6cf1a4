"""Round-5 wave-63: agreement, multiple testing & ranking evaluation —
Cohen's kappa, Benjamini-Hochberg FDR control, per-group nDCG@10.

``q_cohens_kappa`` — chance-corrected agreement between the two rule
classifiers of ``q_mcnemar`` (char-count vs token-count), measured
against EACH OTHER: κ = (p_o − p_e)/(1 − p_e) from the 2×2 rater
confusion. McNemar asks "do they err differently vs truth?"; kappa asks
"do they even agree?" — the inter-annotator-quality metric every
labeling pipeline reports before trusting its labels.

``q_bh_fdr`` — Benjamini-Hochberg step-up FDR control at α=0.10 over
the per-nation family of z-tests (mean customer balance vs global):
p-values from the Abramowitz-Stegun 7.1.26 erf polynomial (public
closed form, identical Horner text on both engines), quantized to
integer micro BEFORE the step-up so every BH comparison is
integer-exact: reject ranks ≤ k* where k* = max{i : pᵢ·10·m ≤ i·10⁶}.
The multiple-testing layer the per-group test family
(``q_welch_ttest``, ``q_anova_dow``) needs before any "nation X is
significant" claim.

``q_ndcg_eval`` — nDCG@10 per nation for the ranking "sort customers
by account balance", scored against spend-quartile relevance grades
(3 = top in-nation revenue quartile): graded, position-discounted
retrieval quality — the learning-to-rank twin of the binary
``q_auc``/``q_lift_curve``.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_mcnemar``, ``q_welch_ttest``, ``q_auc``, ``q_lift_curve``,
``q_mrl_recall``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: rater thresholds — same predicates as q_mcnemar (evaldepth.py)
_KAPPA_CHARS_T = 400
_KAPPA_TOKENS_T = 60

#: BH FDR level α = 0.10 carried as the integer 1/α, so the step-up
#: comparison p ≤ i·α/m becomes the exact BIGINT test
#: p_micro · (1/α) · m ≤ i · 10⁶
_BH_INV_ALPHA = 10

#: nDCG evaluation depth
_NDCG_K = 10


@query("q_cohens_kappa", oracle=rf"""
WITH paired AS (
  SELECT CASE WHEN n_chars >= {_KAPPA_CHARS_T} THEN 1 ELSE 0 END AS pa,
         CASE WHEN length(trim(text))
                   - length(replace(trim(text), ' ', '')) + 1
                   >= {_KAPPA_TOKENS_T} THEN 1 ELSE 0 END AS pb
  FROM documents
),
cells AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN pa = 1 AND pb = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n11,
         CAST(sum(CASE WHEN pa = 1 AND pb = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n10,
         CAST(sum(CASE WHEN pa = 0 AND pb = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n01,
         CAST(sum(CASE WHEN pa = 0 AND pb = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n00
  FROM paired
)
SELECT n, CAST(n11 + n00 AS BIGINT) AS n_agree,
       round((n11 + n00) * 1.0 / n, 4) AS p_observed,
       round((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
              + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
             / (CAST(n AS DOUBLE) * n), 4) AS p_expected,
       round(((n11 + n00) * 1.0 / n
              - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                 + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                / (CAST(n AS DOUBLE) * n))
             / (1.0
                - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                   + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                  / (CAST(n AS DOUBLE) * n)), 4) AS kappa
FROM cells
""")
def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the char-count and token-count "raters" on
    the documents table: observed agreement p_o, chance agreement p_e
    from the marginals, and κ = (p_o − p_e)/(1 − p_e).

    Whitespace tokens are counted as space-count + 1 on the trimmed
    text (a split-free formulation with one cross-engine definition,
    equivalent on single-space corpora to ``split(text, '\\s+')``).

    Scale shape: one map-only predicate projection, one map-side-
    combined 5-counter aggregate — a single corpus pass to one row;
    κ is one deterministic double expression over exact BIGINTs."""
    txt = F.trim(F.col("text"))
    toks = (
        F.length(txt) - F.length(F.regexp_replace(txt, " ", "")) + F.lit(1)
    )
    paired = load(spark, sf_dir, "documents").select(
        (F.col("n_chars") >= _KAPPA_CHARS_T).cast("int").alias("pa"),
        (toks >= _KAPPA_TOKENS_T).cast("int").alias("pb"),
    )
    cells = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(((F.col("pa") == 1) & (F.col("pb") == 1)).cast("bigint"))
        .cast("bigint").alias("n11"),
        F.sum(((F.col("pa") == 1) & (F.col("pb") == 0)).cast("bigint"))
        .cast("bigint").alias("n10"),
        F.sum(((F.col("pa") == 0) & (F.col("pb") == 1)).cast("bigint"))
        .cast("bigint").alias("n01"),
        F.sum(((F.col("pa") == 0) & (F.col("pb") == 0)).cast("bigint"))
        .cast("bigint").alias("n00"),
    )
    nd = F.col("n").cast("double")
    p_o = (F.col("n11") + F.col("n00")) * F.lit(1.0) / F.col("n")
    p_e = (
        (F.col("n11") + F.col("n10")).cast("double")
        * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double")
        * (F.col("n10") + F.col("n00"))
    ) / (nd * F.col("n"))
    return cells.select(
        "n",
        (F.col("n11") + F.col("n00")).cast("bigint").alias("n_agree"),
        F.round(p_o, 4).alias("p_observed"),
        F.round(p_e, 4).alias("p_expected"),
        F.round((p_o - p_e) / (F.lit(1.0) - p_e), 4).alias("kappa"),
    )


def _erfc_two_sided_micro(z_sql: str) -> str:
    """SQL text for the two-sided normal p-value of a z statistic,
    quantized to integer micro: p = erfc(|z|/√2) with erfc from the
    Abramowitz-Stegun 7.1.26 polynomial (|error| < 1.5e-7, far inside
    the micro quantum). The SAME text runs on Spark and DuckDB so the
    double arithmetic is the identical expression tree on both."""
    x = f"(abs({z_sql}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + 0.3275911 * {x}))"
    poly = (
        f"(((((1.061405429 * {t} - 1.453152027) * {t}) + 1.421413741)"
        f" * {t} - 0.284496736) * {t} + 0.254829592) * {t}"
    )
    return (
        f"CAST(floor(({poly}) * exp(-{x} * {x}) * 1000000.0 + 0.5)"
        " AS BIGINT)"
    )


#: z statistic of a nation mean vs the global mean, from exact moments
_BH_Z_SQL = (
    "((CAST(s_bal AS DOUBLE) / n_c - CAST(g_s AS DOUBLE) / g_n)"
    " / sqrt(((CAST(g_q AS DOUBLE) - CAST(g_s AS DOUBLE) * g_s / g_n)"
    " / (g_n - 1)) / n_c))"
)


@query("q_bh_fdr", oracle=rf"""
WITH c AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal
  FROM customer
),
per AS (
  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_c,
         CAST(sum(bal) AS BIGINT) AS s_bal
  FROM c GROUP BY c_nationkey
),
gstats AS (
  SELECT CAST(count(*) AS BIGINT) AS g_n,
         CAST(sum(bal) AS BIGINT) AS g_s,
         sum(CAST(bal AS HUGEINT) * bal) AS g_q
  FROM c
),
z AS (
  SELECT c_nationkey, n_c,
         round({_BH_Z_SQL}, 4) AS z_stat,
         {_erfc_two_sided_micro(_BH_Z_SQL)} AS p_micro
  FROM per, gstats
),
ranked AS (
  SELECT *,
         CAST(row_number() OVER (ORDER BY p_micro, c_nationkey)
              AS BIGINT) AS bh_rank,
         CAST(count(*) OVER () AS BIGINT) AS m
  FROM z
),
kstar AS (
  SELECT *,
         max(CASE WHEN p_micro * {_BH_INV_ALPHA} * m <= bh_rank * 1000000
                  THEN bh_rank ELSE 0 END) OVER () AS k_star
  FROM ranked
)
SELECT c_nationkey, n_c, z_stat, p_micro, bh_rank,
       CAST(CASE WHEN bh_rank <= k_star THEN 1 ELSE 0 END AS BIGINT)
         AS rejected
FROM kstar
ORDER BY bh_rank, c_nationkey
""")
def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control (α = 0.10) over the
    per-nation z-tests of mean customer account balance vs the global
    mean: each nation's p-value comes from the A-S erfc polynomial,
    is quantized to integer micro ONCE, and the step-up comparison
    pᵢ ≤ i·α/m is evaluated as the exact integer inequality
    p_micro·10·m ≤ i·10⁶ — so rank, k*, and the reject set are
    engine-exact even though p itself is float-derived.

    Scale shape: one corpus pass to per-nation exact moments (map-side
    combined), a 1-row global broadcast, then ranking and the k* scan
    on the nation-count grain (≤ 25 rows, one_partition pin). The A-S
    polynomial is the only transcendental and runs on that tiny grain.
    """
    c = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5))
        .cast("bigint")
        .alias("bal"),
    )
    per = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c"),
        F.sum("bal").cast("bigint").alias("s_bal"),
    )
    glob = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("g_n"),
        F.sum("bal").cast("bigint").alias("g_s"),
        F.sum(F.col("bal").cast("decimal(19,0)") * F.col("bal")).alias("g_q"),
    )
    z = per.crossJoin(F.broadcast(glob)).selectExpr(
        "c_nationkey",
        "n_c",
        f"round({_BH_Z_SQL}, 4) AS z_stat",
        f"{_erfc_two_sided_micro(_BH_Z_SQL)} AS p_micro",
    )
    w_rank = Window.partitionBy(api.one_partition("c_nationkey")).orderBy(
        "p_micro", "c_nationkey"
    )
    w_all = Window.partitionBy(api.one_partition("c_nationkey"))
    ranked = z.select(
        "*",
        F.row_number().over(w_rank).cast("bigint").alias("bh_rank"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("m"),
    )
    kstar = ranked.select(
        "*",
        F.max(
            F.when(
                F.col("p_micro") * _BH_INV_ALPHA * F.col("m")
                <= F.col("bh_rank") * 1000000,
                F.col("bh_rank"),
            ).otherwise(F.lit(0))
        )
        .over(w_all)
        .alias("k_star"),
    )
    return kstar.select(
        "c_nationkey",
        "n_c",
        "z_stat",
        "p_micro",
        "bh_rank",
        (F.col("bh_rank") <= F.col("k_star")).cast("bigint").alias("rejected"),
    ).orderBy("bh_rank", "c_nationkey")


@query("q_ndcg_eval", oracle=rf"""
WITH spend AS (
  SELECT c.c_custkey, c.c_nationkey,
         CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS score,
         CAST(coalesce(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                                AS BIGINT)), 0) AS BIGINT) AS spend
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
),
graded AS (
  SELECT *,
         CAST(4 - ntile(4) OVER (PARTITION BY c_nationkey
                                 ORDER BY spend DESC, c_custkey)
              AS BIGINT) AS rel
  FROM spend
),
pos AS (
  SELECT *,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY score DESC, c_custkey) AS rnk,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY rel DESC, c_custkey) AS ideal_rnk
  FROM graded
),
dcg AS (
  SELECT c_nationkey,
         CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(CASE WHEN rnk <= {_NDCG_K}
                  THEN CAST(floor(
                    (CASE rel WHEN 0 THEN 0 WHEN 1 THEN 1
                              WHEN 2 THEN 3 ELSE 7 END)
                    * 1000000000.0 / log2(rnk + 1.0) + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS dcg_nano,
         CAST(sum(CASE WHEN ideal_rnk <= {_NDCG_K}
                  THEN CAST(floor(
                    (CASE rel WHEN 0 THEN 0 WHEN 1 THEN 1
                              WHEN 2 THEN 3 ELSE 7 END)
                    * 1000000000.0 / log2(ideal_rnk + 1.0) + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS idcg_nano
  FROM pos GROUP BY c_nationkey
)
SELECT c_nationkey, n_cust,
       CAST(floor(CAST(dcg_nano AS DOUBLE) * 1000000.0 / idcg_nano + 0.5)
            AS BIGINT) AS ndcg10_micro
FROM dcg
ORDER BY c_nationkey
""")
def q_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@{k} per nation for the ranking "customers by account
    balance", against spend-quartile relevance (rel 3 = top in-nation
    revenue quartile, gains 2^rel − 1): position-discounted graded
    retrieval quality, normalized by the ideal ordering.

    Engine exactness: every DCG term is quantized to integer nano at
    the (gain, position) pair — both engines sum the same integers in
    any order — and ntile/row_number ties are pinned by c_custkey.

    Scale shape: one orders pass to per-customer spend (map-side
    combined, shuffled once on custkey), then all three windows share
    the c_nationkey shuffle; nothing after the first aggregate touches
    more than the customer grain. At 100 TB the rnk ≤ {k} filter is
    the standard per-group top-k window shape (rank-then-filter), and
    the final table is one row per nation."""
    oc = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    spend = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "orders").select(
                F.col("o_custkey"), oc.alias("oc")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(F.coalesce(F.sum("oc"), F.lit(0)).cast("bigint").alias("spend"))
        .select(
            "c_custkey",
            "c_nationkey",
            F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5))
            .cast("bigint")
            .alias("score"),
            "spend",
        )
    )
    w_spend = Window.partitionBy("c_nationkey").orderBy(
        F.col("spend").desc(), "c_custkey"
    )
    graded = spend.select(
        "*", (F.lit(4) - F.ntile(4).over(w_spend)).cast("bigint").alias("rel")
    )
    w_score = Window.partitionBy("c_nationkey").orderBy(
        F.col("score").desc(), "c_custkey"
    )
    w_ideal = Window.partitionBy("c_nationkey").orderBy(
        F.col("rel").desc(), "c_custkey"
    )
    pos = graded.select(
        "*",
        F.row_number().over(w_score).alias("rnk"),
        F.row_number().over(w_ideal).alias("ideal_rnk"),
    )
    gain = (
        F.when(F.col("rel") == 0, 0)
        .when(F.col("rel") == 1, 1)
        .when(F.col("rel") == 2, 3)
        .otherwise(7)
    )

    def term(rank_col: str):
        return F.when(
            F.col(rank_col) <= _NDCG_K,
            F.floor(
                gain * F.lit(1000000000.0)
                / F.log2(F.col(rank_col) + F.lit(1.0))
                + F.lit(0.5)
            ).cast("bigint"),
        ).otherwise(F.lit(0))

    dcg = pos.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.sum(term("rnk")).cast("bigint").alias("dcg_nano"),
        F.sum(term("ideal_rnk")).cast("bigint").alias("idcg_nano"),
    )
    return dcg.select(
        "c_nationkey",
        "n_cust",
        F.floor(
            F.col("dcg_nano").cast("double")
            * F.lit(1000000.0)
            / F.col("idcg_nano")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("ndcg10_micro"),
    ).orderBy("c_nationkey")


q_ndcg_eval.__doc__ = q_ndcg_eval.__doc__.format(k=_NDCG_K)
