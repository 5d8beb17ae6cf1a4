"""ANN quality tests: the approximate paths must actually find the
neighbors the exact path finds (recall vs q_cosine_topk ground truth)."""

from __future__ import annotations

from spark_ml_spark.registry import collect

QUERIES, _ = collect()


def _ids(spark, name, sf_dir):
    return {r.vec_id for r in QUERIES[name](spark, sf_dir).collect()}


def test_ivf_recall_vs_exact(spark, sf_dir):
    exact = _ids(spark, "q_cosine_topk", sf_dir)
    assert len(exact) == 10
    # deterministic-quantizer IVF: probing 4/16 cells must keep most of
    # the true top-10 (measured 1.0 at both sf0.001 and sf0.01)
    assert len(exact & _ids(spark, "q_ivf_topk", sf_dir)) >= 8


def test_ivf_kmeans_recall_vs_exact(spark, sf_medium):
    # measured at sf0.01 (5000 vectors): recall 1.0; sf0.001's 500-vector
    # corpus is below IVF's useful regime (see q_ivf_kmeans_topk docstring)
    exact = _ids(spark, "q_cosine_topk", sf_medium)
    assert len(exact & _ids(spark, "q_ivf_kmeans_topk", sf_medium)) >= 8


def test_embedding_neardup_recall_vs_exact(spark, sf_dir):
    """Sign-LSH banded near-dup recall against the exact all-pairs ground
    truth (computed here with a cross join — fine at test SF, which is
    exactly why the registered query doesn't do it): the banding is
    deterministic, so recall is a fixed, measurable property — 48/59 at
    sf0.01 with 8 bands × 4 sign bits. Guard at ≥0.75 so parameter
    changes that silently gut recall fail loudly."""
    from pyspark.sql import functions as F

    from spark_ml_spark.functions.vector import cosine_explicit
    from spark_ml_spark.io.sources import load

    got = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["q_embedding_neardup"](spark, sf_dir).collect()
    }
    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    exact = {
        (r.vec_a, r.vec_b)
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(cosine_explicit("ea", "eb", 64) >= 0.4)
        .select("vec_a", "vec_b")
        .collect()
    }
    assert got <= exact           # verify stage: zero false positives
    assert len(got) / len(exact) >= 0.75
