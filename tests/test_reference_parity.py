"""Golden-number parity tests (SURVEY.md §5.2): structural invariants the
reference's ``output.txt`` pins down, asserted on the synthetic RLS-like
fixture (FIXTURES.md §B)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_ml_spark.reference_parity import (
    KNOWN_FAMILIES,
    N_SURVEYS,
    UNKNOWN_FAMILIES,
    VOCAB_SIZE,
    build_site_vectors,
    fit_and_eval,
    generate_fixture,
)


@pytest.fixture(scope="module")
def pipeline(spark):
    csv_path, fam_path = generate_fixture()
    vectors, vocab = build_site_vectors(spark, csv_path, fam_path)
    vectors = vectors.cache()
    yield csv_path, vectors, vocab
    vectors.unpersist()


def test_vocabulary_drops_unknown_families(spark, pipeline):
    csv_path, vectors, vocab = pipeline
    # data has vocab+2 distinct families; vocabulary retains VOCAB_SIZE
    # (output.txt:89 — 191 in data vs 189 retained)
    raw = spark.read.option("header", True).csv(csv_path)
    n_distinct = raw.select(F.countDistinct("Family")).first()[0]
    assert n_distinct == VOCAB_SIZE + len(UNKNOWN_FAMILIES)
    assert len(vocab) == VOCAB_SIZE
    assert list(vocab) == list(KNOWN_FAMILIES)  # vector order == file order


def test_group_count_equals_distinct_surveys(spark, pipeline):
    csv_path, vectors, _ = pipeline
    # one output row per survey site (output.txt:79,86: 13,453 == 13,453)
    raw = spark.read.option("header", True).csv(csv_path)
    assert vectors.count() == N_SURVEYS
    assert vectors.count() == raw.select(F.countDistinct("SurveyID")).first()[0]


def test_l1_normalization_and_zero_guard(pipeline):
    _, vectors, vocab = pipeline
    rowsum = sum(F.col(f"`{v}`") for v in vocab)
    sums = vectors.select(
        "SurveyID", F.round(rowsum, 9).alias("s")
    ).collect()
    zero = [r for r in sums if r.s == 0.0]
    # survey S00000 is the all-zero group and must stay all-zero
    # (zero-vector guard, Data_transform.py:92-95)
    assert [r.SurveyID for r in zero] == ["S00000"]
    for r in sums:
        if r.SurveyID != "S00000":
            assert r.s == pytest.approx(1.0, abs=1e-9)


def test_schema_matches_reference_shape(pipeline):
    _, vectors, vocab = pipeline
    # [keys..., one double column per vocabulary family] — the pre-assembly
    # analytical table (output.txt:71-74 modulo VectorUDT, SURVEY §7 risk 1)
    assert vectors.columns[:3] == ["SurveyID", "SiteLat", "SiteLong"]
    assert vectors.columns[3:] == list(vocab)
    assert all(t == "double" for c, t in vectors.dtypes[1:])


def test_last_write_wins_parity(spark, pipeline):
    """§1.3.2 parity flag: ``last_write_wins=True`` must reproduce the
    reference's ``vec[pos] = total`` ASSIGNMENT semantics
    (``Data_transform.py:91``) — checked against a row-by-row Python
    emulation of the reference's dict write over the CSV in file order."""
    import csv as csvmod

    csv_path, fam_path = generate_fixture()
    lww, vocab = build_site_vectors(spark, csv_path, fam_path,
                                    last_write_wins=True)
    summed, _ = build_site_vectors(spark, csv_path, fam_path)

    # Python emulation (reference semantics): last row in file order wins
    want: dict[str, dict[str, int]] = {}
    with open(csv_path) as f:
        for row in csvmod.DictReader(f):
            if row["Family"] in vocab:
                want.setdefault(row["SurveyID"], {})[row["Family"]] = int(
                    row["Total"]
                )

    check_ids = ["S00001", "S00002", "S00050"]
    got = {r["SurveyID"]: r.asDict()
           for r in lww.filter(F.col("SurveyID").isin(check_ids)).collect()}
    for sid in check_ids:
        raw = [want[sid].get(v, 0) for v in vocab]
        tot = sum(raw)
        expect = [x / tot if tot else float(x) for x in raw]
        actual = [got[sid][v] for v in vocab]
        assert actual == pytest.approx(expect, abs=1e-12), sid

    # the flag must actually change semantics vs the summed default
    joined = lww.select("SurveyID", *[F.col(f"`{v}`").alias(f"l_{i}")
                                      for i, v in enumerate(vocab)]).join(
        summed.select("SurveyID", *[F.col(f"`{v}`").alias(f"s_{i}")
                                    for i, v in enumerate(vocab)]),
        "SurveyID",
    )
    diff = joined.filter(
        " OR ".join(f"abs(l_{i} - s_{i}) > 1e-12" for i in range(len(vocab)))
    ).count()
    assert diff > 0


def test_unseeded_split_mode(spark, pipeline):
    """§1.3.6 parity flag: ``seed=None`` reproduces the reference's
    unseeded ``randomSplit`` (``Data_transform.py:155``) — still a valid
    fit/eval, just run-dependent."""
    _, vectors, vocab = pipeline
    rmse = fit_and_eval(spark, vectors, vocab, "SiteLong", "rf", seed=None)
    assert rmse >= 0.0 and rmse == rmse  # finite, not NaN


def test_rmse_finite_and_leakage_signature(spark, pipeline):
    _, vectors, vocab = pipeline
    # with the leakage flag on, latitude is in its own feature vector →
    # RMSE(lat) must collapse vs the honest model (the reference's
    # signature: 3.30 lat vs 47.6 lon, output.txt:103,115)
    leaky = fit_and_eval(spark, vectors, vocab, "SiteLat", "rf",
                         include_label_feature=True)
    honest = fit_and_eval(spark, vectors, vocab, "SiteLat", "rf",
                          include_label_feature=False)
    assert 0.0 <= leaky < honest
    assert leaky < honest / 2  # the collapse is dramatic, not marginal
