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
