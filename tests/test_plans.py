"""Physical-plan assertions (scale posture, SURVEY.md §4).

Correctness tests prove the small-SF answer; these prove the PLAN is the
one that survives 100 TB: filters pushed into the parquet scan, column
pruning in ReadSchema, dimension joins broadcast, no cartesian products,
and no row-at-a-time Python UDFs anywhere in the registered surface.
"""

from __future__ import annotations

import pytest

from spark_ml_spark.registry import collect

QUERIES, _ = collect()


def plan_of(spark, name, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_filter_pushdown(spark, sf_dir):
    plan = plan_of(spark, "q_filter_predicate", sf_dir)
    assert "GreaterThan(l_quantity,25.0)" in plan
    assert "EqualTo(l_returnflag,A)" in plan


def test_column_pruning(spark, sf_dir):
    plan = plan_of(spark, "q_project", sf_dir)
    # the scan must read exactly the three projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>" in plan


def test_dim_join_broadcasts(spark, sf_dir):
    plan = plan_of(spark, "q_dim_broadcast_join", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_star_join_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, "q_star_join", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_flagship_scans_are_pruned(spark, sf_dir):
    plan = plan_of(spark, "q_flagship", sf_dir)
    # lineitem scan: filter pushed, only 3 columns read
    assert "GreaterThan(l_quantity,0.0)" in plan
    assert "struct<l_orderkey:bigint,l_quantity:double,l_returnflag:string>" in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, "q_topk", sf_dir)
    # top-k must be per-partition heap + merge, never a global sort
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize(
    "name",
    [
        "q_flagship", "q_star_join", "q_groupby_agg", "q_pivot",
        "q_exact_dedup", "q_text_stats", "q_token_count", "q_lang_id",
        "q_quality_score", "q_doc_fingerprint", "q_simhash_buckets",
        "q_ngram_jaccard", "q_cosine_topk", "q_embedding_neardup",
        "q_sessionize", "q_tumbling_window", "q_window_rank",
    ],
)
def test_no_python_row_udfs(spark, sf_dir, name):
    """Policy (SURVEY §2.11): no row-at-a-time Python in the data path.
    BatchEvalPython = pickled row UDF; ArrowEvalPython is the allowed
    vectorized escape hatch (only q_media_decode uses mapInPandas)."""
    plan = plan_of(spark, name, sf_dir)
    assert "BatchEvalPython" not in plan


def test_embedding_neardup_is_banded_equi_join(spark, sf_dir):
    """VERDICT r1 wrong-#2: the near-dup pair generator must be a hash
    equi-join on (band_id, band_key) — never the O(n²) all-pairs
    BroadcastNestedLoopJoin the previous theta-join formulation planned."""
    plan = plan_of(spark, "q_embedding_neardup", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan)


def test_semantic_dedup_candidates_are_ids_only(spark, sf_dir):
    """VERDICT r2 wrong-#3: the within-cell pair stage must be the
    ids-only bucket-collect expansion (collect_list of vec ids grouped by
    cell_id) — never a cell_id self-JOIN whose exchange carries the
    64-double embedding payloads. Embeddings re-attach only for the
    surviving candidates' cosine verify (joins keyed on vec ids)."""
    plan = plan_of(spark, "q_semantic_dedup", sf_dir)
    assert "collect_list" in plan
    assert "CartesianProduct" not in plan
    # (BroadcastNestedLoopJoin appears only as the 1-row broadcast-scalar
    # crossJoins — n_cells and the centroid fold row; the repo-wide
    # hygiene test bounds BNLJ build sides across the whole surface)
    # no pair join keyed on cell_id anywhere in the plan: the candidate
    # expansion happens inside the bucket aggregate, so every remaining
    # join keys on vec ids (payload re-attach) or is the broadcast scalar
    for line in plan.splitlines():
        if any(j in line for j in
               ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")):
            assert "cell_id" not in line, line
    # the hot-bucket population guard must survive optimization
    # (assert_true lowers to a raise_error CASE branch in the plan)
    assert "raise_error" in plan


def test_ngram_jaccard_no_nested_loop(spark, sf_dir):
    """VERDICT r1 wrong-#3: candidate generation must come from an
    equi-join on high-cardinality band keys, not low-cardinality blocking
    that degenerates to all-pairs at scale."""
    plan = plan_of(spark, "q_ngram_jaccard", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ntile_no_unpartitioned_window(spark, sf_dir):
    """VERDICT r1 wrong-#4: global ntile/rank must be the two-phase plan —
    every Window node partitioned (by pid), never a single-partition
    global sort ('WindowExec: No Partition Defined')."""
    df = QUERIES["q_sql_window_ntile"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "windowspecdefinition(_pid" in line, line


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """The eval-gram side of decontamination must broadcast (benchmark
    sets are tiny vs the corpus); the corpus side must never shuffle its
    exploded grams for the probe."""
    plan = plan_of(spark, "q_decontaminate", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_segment_dedup_digest_joins(spark, sf_dir):
    """Segment-frequency boilerplate scoring: equi-joins/aggregations on
    md5 digests only — no nested loop, no Python."""
    plan = plan_of(spark, "q_segment_dedup", sf_dir)
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_partition_pruning(spark, sf_dir):
    """The year filter must become a PartitionFilter on the partitioned
    layout (directory skip), not a row-level DataFilter."""
    plan = plan_of(spark, "q_partition_pruning", sf_dir)
    assert "PartitionFilters: [isnotnull(yr" in plan and "(yr" in plan


def test_asof_join_is_window_not_nested_loop(spark, sf_dir):
    """The as-of join must be the merge/window formulation — an
    inequality join would plan BroadcastNestedLoopJoin (O(n·m))."""
    plan = plan_of(spark, "q_asof_join", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_groupby_is_partial_agg(spark, sf_dir):
    """The reference's groupByKey ships every value (OOM at scale); ours
    must be a two-phase hash aggregate."""
    plan = plan_of(spark, "q_groupby_agg", sf_dir)
    assert plan.count("HashAggregate") >= 2


def test_range_join_is_smj_not_nested_loop(spark, sf_dir):
    """The equi-key (user_id) must drive the join; the time range is a
    join-level filter. A BroadcastNestedLoopJoin here would be O(n*m)
    per user at 100 TB."""
    plan = plan_of(spark, "q_range_join", sf_dir)
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    # any equi-key join strategy is fine (AQE picks broadcast at small
    # SF, SMJ once the click side outgrows the broadcast threshold)
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_tpch_q1_pushdown_and_partial_agg(spark, sf_dir):
    plan = plan_of(spark, "q_sql_tpch_q1", sf_dir)
    # ship-date predicate reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # map-side partial aggregation before the group-key shuffle
    assert "partial_sum" in plan or "Functions: [partial_" in plan


def test_fuzzy_dedup_blocks_before_levenshtein(spark, sf_dir):
    """The blocking equi-join must be a hash/SMJ join on the block key —
    never a cartesian pair enumeration — and Levenshtein must stay a JVM
    expression (no BatchEvalPython)."""
    plan = plan_of(spark, "q_fuzzy_dedup_levenshtein", sf_dir)
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "levenshtein" in plan


def test_grouping_sets_single_expand(spark, sf_dir):
    """Three grouping granularities must cost ONE scan + one Expand, not
    three scans."""
    plan = plan_of(spark, "q_sql_grouping_sets", sf_dir)
    # formatted mode prints each node twice (tree + detail); count scan
    # Locations, which appear once per physical scan
    assert plan.count("InMemoryFileIndex") == 1
    assert "Expand" in plan


def test_unpivot_single_scan_expand(spark, sf_dir):
    """unpivot must be one scan + one Expand, not the 4-scan UNION ALL
    the oracle SQL spells out."""
    plan = plan_of(spark, "q_unpivot", sf_dir)
    assert plan.count("InMemoryFileIndex") == 1
    assert "Expand" in plan
    assert "Union" not in plan


def test_topk_per_group_window_limit(spark, sf_dir):
    """rn <= 3 must push into the window sort (WindowGroupLimit) so no
    partition ever sorts a whole group."""
    plan = plan_of(spark, "q_topk_per_group", sf_dir)
    assert "WindowGroupLimit" in plan


def test_tfidf_stays_jvm_side(spark, sf_dir):
    """explode/agg/join TF-IDF: no Python in the data path, corpus-size
    scalar joined via broadcast."""
    plan = plan_of(spark, "q_tfidf_topterms", sf_dir)
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_array_functions_no_explode(spark, sf_dir):
    """Higher-order array math must not explode the 64-wide arrays into
    rows; lambdas run inside the projection."""
    plan = plan_of(spark, "q_array_functions", sf_dir)
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan


def test_session_scale_confs(spark):
    """The scale knobs the 100 TB posture depends on must be ON in every
    session the factory builds: AQE (runtime re-planning), partition
    coalescing, skew-join splitting, Arrow for the Pandas-UDF escape
    hatch, and a pinned UTC session timezone (oracle determinism)."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_custom_udaf_is_arrow_not_pickle(spark, sf_dir):
    """§2.11: the custom aggregate must go through the Arrow grouped-agg
    path (AggregateInPandas), never row-pickling BatchEvalPython."""
    plan = plan_of(spark, "q_custom_udaf", sf_dir)
    # Spark 4.x names the Arrow grouped-agg node ArrowAggregatePython
    # (older releases: AggregateInPandas)
    assert "ArrowAggregatePython" in plan or "AggregateInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_no_unbounded_nested_loop_join_anywhere(spark, sf_dir):
    """Repo-wide plan hygiene (generalizes VERDICT r1 wrong-#2): across
    EVERY oracle-checked batch query, (a) no CartesianProduct node at
    all, (b) every BroadcastNestedLoopJoin must broadcast a
    provably-tiny side — an ungrouped aggregate (keys=[] ⇒ ≤1 row) or a
    literal LocalTableScan — i.e. the crossJoin(broadcast(corpus-total))
    idiom, never a data-sized relation, and (c) no BatchEvalPython
    (pickled row-at-a-time UDF) anywhere: the repo's only sanctioned
    Python surfaces are Arrow-vectorized (ArrowEvalPython /
    ArrowAggregatePython / mapInPandas), which plan as different nodes."""
    from spark_ml_spark.registry import collect

    queries, oracle = collect()
    offenders = []
    for name in oracle:
        if name.startswith("q_stream_"):
            continue  # streaming queries execute on construction
        plan = queries[name](spark, sf_dir)._jdf.queryExecution()\
            .executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan:
            offenders.append((name, "BatchEvalPython row UDF"))
        lines = plan.splitlines()
        # a BNLJ's build side is a BroadcastExchange with
        # IdentityBroadcastMode (hash joins use HashedRelationBroadcastMode),
        # so audit each such exchange's child subtree for a
        # <=1-row-by-construction shape: an ungrouped aggregate, a literal
        # LocalTableScan, or a point filter on a key (= <literal>)
        import re

        n_bnlj = sum("BroadcastNestedLoopJoin" in ln for ln in lines)
        n_identity = 0
        for i, line in enumerate(lines):
            if "BroadcastExchange IdentityBroadcastMode" not in line:
                continue
            n_identity += 1
            window = "\n".join(lines[i + 1:i + 4])
            tiny = (
                "Aggregate(keys=[]" in window
                # SortAggregate prints the singular "key=[]" — an
                # ungrouped min/max on a string column plans as one
                or "Aggregate(key=[]" in window
                or "LocalTableScan" in window
                # point or bounded-range filter on a key (query-vector
                # side of the top-k family: vec_id = 0 / vec_id < 5)
                or re.search(r"Filter .*[=<] \d+\)", window)
            )
            if not tiny:
                offenders.append((name, "BNLJ with non-tiny build side"))
        if n_bnlj > n_identity:
            # a BNLJ reusing another's exchange (ReusedExchange) is fine
            # only if at least one Identity exchange exists and passed
            if n_identity == 0:
                offenders.append((name, "BNLJ without identity exchange"))
    assert not offenders, offenders


def test_vocab_build_is_topk_not_full_sort(spark, sf_dir):
    """Vocabulary construction: global top-K must plan as
    TakeOrderedAndProject (bounded per-partition heaps), never a full
    Sort of the token-frequency table."""
    plan = plan_of(spark, "q_vocab_build", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_substring_dedup_joins_on_digest(spark, sf_dir):
    """Duplicated-span detection: the dup-set join key must be the md5
    digest (32-char), and the plan must stay an equi-join — no
    CartesianProduct, no row-level Python."""
    plan = plan_of(spark, "q_substring_dedup", sf_dir)
    assert "CartesianProduct" not in plan
    assert "md5" in plan
    assert "BatchEvalPython" not in plan


def test_doc_outliers_centroid_broadcasts(spark, sf_dir):
    """Prototype-distance outliers: the per-label centroid table joins
    back via BroadcastHashJoin (the embeddings scan itself must not
    shuffle for scoring — only the per-label rank exchanges)."""
    plan = plan_of(spark, "q_doc_outliers", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quantize_embeddings_is_map_only(spark, sf_dir):
    """int8 quantization must add ZERO exchanges: one scan, one
    projection, all array math inside codegen."""
    plan = plan_of(spark, "q_quantize_embeddings", sf_dir)
    assert "Exchange" not in plan
    assert "Generate" not in plan
    assert "BatchEvalPython" not in plan


def test_tokenize_ids_vocab_broadcasts(spark, sf_dir):
    """Tokenizer application: the top-K vocab (tiny by construction)
    must reach the token stream via BroadcastHashJoin — the corpus never
    shuffles for encoding."""
    plan = plan_of(spark, "q_tokenize_ids", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_chunk_documents_is_shuffle_free(spark, sf_dir):
    """Token-window chunking is the literal embarrassingly-parallel op:
    split → sequence → explode → slice → md5 must compile to scan +
    Generate + projections with ZERO exchanges, so at 100 TB it
    pipelines with the scan."""
    plan = plan_of(spark, "q_chunk_documents", sf_dir)
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode over chunk indices
    assert "BatchEvalPython" not in plan


def test_lm_score_model_broadcasts(spark, sf_dir):
    """Unigram-LM scoring: the vocabulary-sized model must reach the
    token stream via BroadcastHashJoin (the corpus never shuffles for
    scoring), and the model subtree must be persisted so the stats
    branch does not re-scan the corpus."""
    plan = plan_of(spark, "q_lm_score", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "InMemoryTableScan" in plan  # persisted model, not a re-scan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_budget_allocate_corpus_never_shuffles_rows(spark, sf_dir):
    """Largest-remainder apportionment: the corpus contributes only
    per-source partial counts (map-side combine into a hash agg); the
    totals/leftover are one-row broadcasts; the per-source table is
    persisted so its build runs once, not three times."""
    plan = plan_of(spark, "q_budget_allocate", sf_dir)
    assert "InMemoryTableScan" in plan  # persisted per-source table
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_winsorize_bounds_broadcast(spark, sf_dir):
    """Winsorize: the |langs|-row bounds table must come back to the
    corpus via BroadcastHashJoin, and the per-lang ranking is the only
    corpus-sized window."""
    plan = plan_of(spark, "q_winsorize", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bloom_probe_is_in_row(spark, sf_dir):
    """Bloom decontamination: the filter is ONE broadcast row probed
    inside a projection (md5 + element_at + bitwise AND) — the corpus
    must not join per-position; its only exchange is the per-doc
    aggregate."""
    plan = plan_of(spark, "q_bloom_decontaminate", sf_dir)
    # formatted mode splits the node name and its broadcast mode across
    # lines, so assert them separately: the one-row bloom reaches the
    # probe via an identity (non-keyed) broadcast
    assert "BroadcastExchange" in plan
    assert "IdentityBroadcastMode" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_reservoir_sample_uses_window_group_limit(spark, sf_dir):
    """Fixed-K sampling must compile to WindowGroupLimit so the partial
    top-K runs map-side before the group-key exchange."""
    plan = plan_of(spark, "q_reservoir_sample", sf_dir)
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan


def test_pq_topk_is_projection_plus_topk(spark, sf_dir):
    """PQ/ADC ANN: encode and ADC are IN-ROW expressions against the
    one-row broadcast codebook — no per-vector shuffle may exist; the
    only ordering operator is TakeOrderedAndProject, and the three scans
    (corpus / centroids / query) must push their vec_id filters into the
    parquet scan."""
    plan = plan_of(spark, "q_pq_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan
    # no hash/range exchange of the corpus: the only exchanges allowed
    # are broadcasts and the single-partition codebook collect
    import re
    bad = [
        ln for ln in plan.splitlines()
        if re.search(r"Exchange (hash|range)partitioning", ln)
    ]
    assert not bad, bad
    assert "PushedFilters" in plan
    assert "BatchEvalPython" not in plan


def test_dsir_weight_table_broadcasts(spark, sf_dir):
    """DSIR scoring: the vocab-sized weight table must BROADCAST into
    the full-corpus token join (the only big-data shuffle is the final
    per-doc group-by); no cartesian over data-sized inputs and no
    row-level Python anywhere."""
    plan = plan_of(spark, "q_dsir_select", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # selection is a bounded top-K, not a full sort of the corpus
    assert "TakeOrderedAndProject" in plan


def test_hard_negatives_query_side_broadcasts(spark, sf_dir):
    """Hard-negative mining: the probe/query side is the broadcast side
    of the scoring join (corpus scans once, never shuffles on a pair
    key); the per-query top-k runs on band survivors only."""
    plan = plan_of(spark, "q_hard_negatives", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_grouped_rank_queries_have_no_global_window(spark, sf_dir):
    """The two grouped_rank consumers (per-language percentile, per-band
    batching) must contain NO unpartitioned window — the one-reducer
    'WindowExec: No Partition Defined' shape — and no window partitioned
    ONLY by the skewed group key: every window partition key must
    include the range-partition id."""
    for name in ("q_quantile_normalize", "q_length_batching"):
        plan = plan_of(spark, name, sf_dir)
        assert "BatchEvalPython" not in plan
        # every row_number window spec must be partitioned, and its
        # partition key list must start with grouped_rank's _pid working
        # column (range-partition id) — never the bare skewed group key
        specs = [
            ln for ln in plan.splitlines()
            if "windowspecdefinition(" in ln
        ]
        assert specs, f"{name}: expected a window in the plan"
        for ln in specs:
            spec = ln.split("windowspecdefinition(", 1)[1]
            assert spec.startswith("_pid#"), (
                f"{name}: window not led by the range-partition id: {ln}"
            )


def test_drift_diff_aggregates_before_outer_join(spark, sf_dir):
    """Snapshot diff: both sides must collapse to per-key counts BEFORE
    the full-outer join (partial HashAggregate under the join), so the
    join carries distinct keys, not raw events."""
    plan = plan_of(spark, "q_drift_diff", sf_dir)
    assert "SortMergeJoin FullOuter" in plan or "FullOuter" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final on each side
    assert "BatchEvalPython" not in plan


def test_bm25_stats_broadcast_and_topk(spark, sf_dir):
    """BM25: query-term stats and avgdl are broadcasts; the ranking is a
    bounded TakeOrderedAndProject, not a global sort."""
    plan = plan_of(spark, "q_bm25_rank", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_weighted_sample_is_map_plus_topk(spark, sf_dir):
    """Efraimidis–Spirakis sampling: key assignment is map-only; the
    only data movement is the top-K gather — no shuffle exchange."""
    plan = plan_of(spark, "q_weighted_sample", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_embedding_drift_partial_aggregates_explosion(spark, sf_dir):
    """Drift monitor: the 64× posexplode must be absorbed by partial
    hash aggregation before any exchange; no window anywhere."""
    plan = plan_of(spark, "q_embedding_drift", sf_dir)
    assert "Generate" in plan  # posexplode
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "windowspecdefinition" not in plan
    assert "BatchEvalPython" not in plan


def test_budget_allocate_has_no_window(spark, sf_dir):
    """Hamilton apportionment: the remainder rank must be the
    collect-fold + posexplode (bounded by |sources|), never a global
    WindowExec — even a tiny-input unpartitioned window plans the
    single-partition shape (and the optimizer folds constant partition
    keys back out)."""
    plan = plan_of(spark, "q_budget_allocate", sf_dir)
    assert "windowspecdefinition" not in plan
    assert "sort_array" in plan and "posexplode" in plan
    assert "BatchEvalPython" not in plan


def test_pagerank_iterations_are_equi_joins(spark, sf_dir):
    """PageRank: edge extraction is a per-user window + partial agg;
    every iteration joins edges⋈ranks on the src equi-key — no
    cartesian over data-sized inputs, no Python."""
    plan = plan_of(spark, "q_pagerank", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 4
    # the per-user lead() window is partitioned (never global)
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "user_id" in line, line


def test_skew_profile_reduces_before_stats(spark, sf_dir):
    """Skew profile: all statistics must derive from the count-of-counts
    table (key-sized data reduces immediately); no window, no Python."""
    plan = plan_of(spark, "q_skew_profile", sf_dir)
    assert "windowspecdefinition" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 6  # keys, cof, tot/singles/entropy


def test_kmv_bottom_k_uses_window_group_limit(spark, sf_dir):
    """KMV sketch: the per-group bottom-K must compile to
    WindowGroupLimit (map-side partial bottom-K = the sketch's mergeable
    partial state); hashing/distinct stay JVM-side."""
    plan = plan_of(spark, "q_kmv_distinct", sf_dir)
    assert "WindowGroupLimit" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_countmin_sketch_is_bounded_and_broadcast(spark, sf_dir):
    """Count-min: the probe joins the (≤ d·w-row) sketch via broadcast
    only; the single window-free plan is scan → count-agg → cell-agg."""
    plan = plan_of(spark, "q_countmin_heavy", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "windowspecdefinition" not in plan
    assert "BatchEvalPython" not in plan


def test_join_size_estimate_never_joins(spark, sf_dir):
    """The join-size pre-flight must contain NO join operator at all —
    its whole point is predicting a join without running one."""
    plan = plan_of(spark, "q_join_size_estimate", sf_dir)
    for op in ("Join", "CartesianProduct", "BatchEvalPython"):
        assert op not in plan, op


def test_anomaly_window_is_partitioned_range_frame(spark, sf_dir):
    """Anomaly detection: the trailing frame is a RANGE frame
    partitioned by type over the pre-aggregated daily table — never a
    global window."""
    plan = plan_of(spark, "q_anomaly_detect", sf_dir)
    assert "BatchEvalPython" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "event_type" in line, line
            assert "RangeFrame" in line, line


def test_event_pmi_joins_on_basket_key(spark, sf_dir):
    """PMI: the pair stage must be an equi-join on the (user, day)
    basket key (bounded fan-out), with singles/N broadcast onto the
    pair table."""
    plan = plan_of(spark, "q_event_pmi", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_hll_is_pure_aggregation(spark, sf_dir):
    """HLL: registers build as (type, bucket) MAX aggregation — no
    window, no Python, no cartesian anywhere in the plan."""
    plan = plan_of(spark, "q_hll_distinct", sf_dir)
    assert "windowspecdefinition" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # distinct, registers, harm, exact


def test_quantile_sketch_windows_are_per_lang(spark, sf_dir):
    """Histogram quantiles: stats broadcast onto the scan; the
    cumulative and exact-rank windows are partitioned by lang."""
    plan = plan_of(spark, "q_quantile_sketch", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "lang" in line, line


def test_snapshot_dedup_exchanges_digests_only(spark, sf_dir):
    """Incremental dedup: every exchange key is the 16-byte digest —
    the text column must not appear in any shuffle output."""
    plan = plan_of(spark, "q_snapshot_dedup", sf_dir)
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "dg" in line, line
            assert "text" not in line, line


def test_attribution_window_is_per_user(spark, sf_dir):
    """Attribution: the last-touch window is partitioned by user_id
    (never global); the share divisor broadcasts."""
    plan = plan_of(spark, "q_attribution", sf_dir)
    assert "BatchEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "user_id" in line, line


def test_set_similarity_join_is_equi_join_only(spark, sf_dir):
    """Prefix filtering must plan as token equi-joins — the exact
    similarity join earns its scale claim only if no nested-loop or
    cartesian pair stage exists."""
    plan = plan_of(spark, "q_set_similarity_join", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_path_topk_single_window_pass(spark, sf_dir):
    """Both lead() columns must evaluate in ONE per-user window pass,
    and the global top-10 must be TakeOrderedAndProject."""
    plan = plan_of(spark, "q_path_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    window_nodes = [
        line for line in plan.splitlines() if line.startswith("(")
        and ") Window" in line
    ]
    assert len(window_nodes) == 1, window_nodes
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "user_id" in line, line


def test_grouped_ols_is_pure_aggregation(spark, sf_dir):
    """The grouped fit must be a two-phase hash aggregate over the five
    sufficient statistics — no window, no solver iteration, no Python."""
    plan = plan_of(spark, "q_grouped_ols", sf_dir)
    assert "windowspecdefinition" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_concurrency_windows_partitioned(spark, sf_dir):
    """Sweep-line concurrency: every window is partitioned (per-user
    sessionize, per-day sweep) — the day-split exists precisely to
    avoid a global running sum."""
    plan = plan_of(spark, "q_concurrency", sf_dir)
    assert "BatchEvalPython" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "user_id" in line or "day" in line, line


def test_skipping_report_uses_two_phase_rank(spark, sf_dir):
    """File assignment must ride api.global_rank's range-partitioned
    two-phase dataflow — no 'No Partition Defined' global window."""
    plan = plan_of(spark, "q_skipping_report", sf_dir)
    assert "BatchEvalPython" not in plan
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "_pid" in line, line


def test_k_anonymity_is_count_of_counts(spark, sf_dir):
    """k-anonymity: the QI table must reduce map-side before the
    per-language statistics — no window, no Python."""
    plan = plan_of(spark, "q_k_anonymity", sf_dir)
    assert "windowspecdefinition" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 4


def test_bpe_merge_step_explodes_vocab_not_corpus(spark, sf_dir):
    """BPE pair counting: the pair explode must run over the DISTINCT
    word table (post-aggregation), and the top-20 must be
    TakeOrderedAndProject."""
    plan = plan_of(spark, "q_bpe_merge_step", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    # exactly two explodes: tokenization over the corpus, pairs over the
    # vocab — and two two-phase aggregates (word count, pair count)
    # between them, so the pair explode reads aggregated rows
    assert plan.count(") Generate") == 2  # formatted detail-section nodes
    assert plan.count("HashAggregate") >= 4


def test_kmv_jaccard_pairwise_is_sketch_sized(spark, sf_dir):
    """Sketch algebra: the pairwise stage must run on bottom-K sketch
    rows (WindowGroupLimit twice: per-type sketch + per-pair union),
    no cartesian over data-sized inputs, no Python."""
    plan = plan_of(spark, "q_kmv_jaccard", sf_dir)
    assert plan.count("WindowGroupLimit") >= 2
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_auc_window_is_over_histogram(spark, sf_dir):
    """AUC: the only window runs over the post-aggregation score
    histogram (a HashAggregate sits below it in the plan), and no
    Python appears anywhere."""
    plan = plan_of(spark, "q_auc", sf_dir)
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2
    # the Window node's child chain must contain the histogram aggregate
    tree = plan.split("\n\n")[0]
    wpos = tree.index("Window")
    assert "HashAggregate" in tree[wpos:], tree


def test_spearman_rank_maps_broadcast(spark, sf_dir):
    """Spearman: both rank maps must broadcast onto the single corpus
    pass; windows run only over the per-variable histograms."""
    plan = plan_of(spark, "q_spearman", sf_dir)
    assert "BatchEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("HashAggregate") >= 4


def test_drift_ops_are_histogram_sized(spark, sf_dir):
    """KS/PSI: both reduce to histogram/bin tables map-side; no Python,
    no cartesian over data-sized inputs."""
    for name in ("q_ks_drift", "q_psi_drift"):
        plan = plan_of(spark, name, sf_dir)
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert plan.count("HashAggregate") >= 2, name


def test_dq_report_fk_check_is_anti_join(spark, sf_dir):
    """Referential integrity must plan as a hash anti-join on the key,
    and the null/range checks fuse into shared scans — no Python, no
    nested loop over data-sized inputs."""
    plan = plan_of(spark, "q_dq_report", sf_dir)
    assert "LeftAnti" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_benford_audit_is_nine_group_count(spark, sf_dir):
    """Benford: in-row digit extraction (no UDF), one map-side-combined
    9-group count, literal expectation table broadcast."""
    plan = plan_of(spark, "q_benford_audit", sf_dir)
    assert "BatchEvalPython" not in plan
    # the literal Benford constants (9 rows, createDataFrame plans them
    # as an ExistingRDD scan) ride a broadcast
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan
    assert plan.count("HashAggregate") >= 2


def test_ewma_all_lags_single_window(spark, sf_dir):
    """EWMA: all eight lags must evaluate in ONE partitioned window
    pass over the pre-aggregated daily table."""
    plan = plan_of(spark, "q_ewma_forecast", sf_dir)
    assert "BatchEvalPython" not in plan
    window_nodes = [
        line for line in plan.splitlines()
        if line.startswith("(") and ") Window" in line
    ]
    assert len(window_nodes) == 1, window_nodes
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "event_type" in line, line


@pytest.mark.parametrize("name", ["q_triangle_count", "q_local_clustering"])
def test_adjacency_join_not_forced_broadcast(spark, sf_dir, name):
    """VERDICT r5 wrong-#1: the corpus-derived adjacency table (neighbor
    ARRAYS up to √(2m) per row) must never carry a forced broadcast hint —
    on a graph past the broadcast budget a forced hint OOMs instead of
    degrading. With autoBroadcastJoinThreshold disabled, the adjacency
    joins must plan as shuffle joins (the node-sized scalar DEGREE table
    keeps its sanctioned hint and stays BroadcastHashJoin); a re-added
    F.broadcast(adj) would erase every SortMergeJoin from this plan."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, name, sf_dir)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
