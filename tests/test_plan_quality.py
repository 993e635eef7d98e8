"""Physical-plan quality gates: correctness tests prove WHAT is
computed; these prove HOW — pushed filters, pruned scans, broadcast
choices, top-k pushdown — the properties that decide whether a plan
survives a 100×
scale-up. Mirrors SURVEY §4's Catalyst-status table.
"""

import pytest

from amplab_hive_spark.registry import all_queries

QUERIES = all_queries()


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    df.collect()  # let AQE finalize so the executed plan is real
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: untouched wide columns must not be read
    assert "l_partkey" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_q5_star_join_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3, "region/nation/supplier must broadcast"
    assert "CartesianProduct" not in plan


def test_q3_no_cartesian_and_topk(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan, "ORDER BY+LIMIT must compile to top-k"
    assert "CartesianProduct" not in plan


def test_topk_is_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in plan
    assert "GlobalSort" not in plan and "\nSort " not in plan


def test_window_topn_group_limit_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "window_topn_per_group")
    assert "WindowGroupLimit" in plan, "rank<=k must push a per-group limit below the shuffle"


def test_scan_filter_project_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "scan_filter_project")
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    for col in ("l_returnflag", "l_partkey", "l_suppkey", "l_tax"):
        assert col not in read_schema, f"unused column {col} must be pruned from scan"


def test_semi_anti_join_operators(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "join_left_semi")
    assert "LeftAnti" in plan_of(spark, sf_dir, "join_left_anti")


def test_aqe_active(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q18_large_order_customers")
    assert "AdaptiveSparkPlan" in plan
    assert "isFinalPlan=true" in plan


def test_matchpath_single_shuffle(spark, sf_dir):
    """The pattern matcher must cost exactly one exchange (the
    partition-by shuffle) — reference PTF semantics."""
    df = QUERIES["matchpath_price_runs"].fn(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both plans
    n_exchanges = final.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"matchpath should hash-shuffle once, saw {n_exchanges}:\n{final}"


def test_q6_zero_shuffle_full_pushdown(spark, sf_dir):
    """Q6 is the canonical pushdown probe: all three predicates must
    reach the parquet scan and the plan must contain no hash
    exchange at all (single-row global agg only)."""
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange hashpartitioning" not in final
    pushed = plan.split("PushedFilters: ")[1]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} predicate must push to scan"


def test_q8_star_join_broadcasts_all_dimensions(spark, sf_dir):
    """The 8-table market-share join must broadcast every dimension
    (part/supplier/customer/nation×2/region) and shuffle at most
    lineitem⋈orders — one exchange, no cartesian."""
    plan = plan_of(spark, sf_dir, "q8_market_share")
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in final
    assert final.count("Exchange hashpartitioning") <= 1


def test_q21_single_fact_pass_no_cartesian(spark, sf_dir):
    """r14: the EXISTS/NOT EXISTS form was rewritten into per-order
    aggregation (see q21's docstring) — lineitem must be scanned
    ONCE, never broadcast as a join build side, and the two grouping
    levels (orderkey+suppkey, then orderkey) must share one hash
    partitioning (subset-key clustering ⇒ no extra exchange). The
    EXISTS semantics themselves stay pinned by the unchanged DuckDB
    oracle (tests/test_oracle_parity.py) and by join_left_semi /
    join_left_anti for the operator coverage."""
    plan = plan_of(spark, sf_dir, "q21_suppliers_kept_waiting")
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert final.count("lineitem.parquet") == 1, "lineitem scanned exactly once"
    assert final.count("Exchange hashpartitioning") <= 2, \
        "one fact shuffle (+ tiny post-agg exchanges at most)"


def test_q13_outer_join_preserved(spark, sf_dir):
    """The extra ON predicate (o_orderpriority <> '5-LOW') must stay
    in the join condition, not become a WHERE that silently turns
    the outer join inner."""
    plan = plan_of(spark, sf_dir, "q13_customer_distribution")
    assert "LeftOuter" in plan


def test_pipeline_split_single_scan_no_python(spark, sf_dir):
    """Split assignment is pure JVM expressions over one scan — no
    Python UDF in the row path, only the text column read besides
    the grouping keys."""
    plan = plan_of(spark, sf_dir, "pipeline_train_split")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # AQE prints final + initial plan; count the final section only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") <= 2, "one partial/final agg exchange + sort only"


def test_pipeline_pack_one_window_shuffle(spark, sf_dir):
    """Packing = one shuffle keyed on the window partition column;
    cumsum and binning stay inside the same exchange."""
    plan = plan_of(spark, sf_dir, "pipeline_pack_sequences")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "source" not in read_schema, "unused columns must be pruned from scan"


def test_where_false_collapses_to_empty_scan(spark, sf_dir):
    """NullScanOptimizer parity (PhysicalOptimizer.java:71, SURVEY
    §4.3): a provably-false predicate must not scan the table —
    Catalyst folds it to an empty LocalTableScan."""
    from amplab_hive_spark.catalog import tables

    tables(spark, sf_dir)
    df = spark.sql("SELECT l_orderkey FROM lineitem WHERE 1 = 0")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan and "FileScan" not in plan
    assert df.count() == 0


def test_metadata_only_partition_query(spark, sf_dir, tmp_path):
    """StatsOptimizer-adjacent (Optimizer.java:158): DISTINCT over a
    partition column on a partitioned table reads partition metadata,
    not data files (no row-group scan of payload columns)."""
    from amplab_hive_spark.catalog import tables

    t = tables(spark, sf_dir)
    path = f"{tmp_path}/part_orders"
    t.orders.withColumn("status", t.orders.o_orderstatus).write.partitionBy(
        "status"
    ).parquet(path)
    df = spark.read.parquet(path).select("status").distinct()
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "o_totalprice" not in read_schema and "o_orderdate" not in read_schema
    assert df.count() == 3


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """Decontamination must broadcast the (small) eval-set gram side
    and keep the whole pass JVM-side — the property that makes the
    check O(corpus scan), not O(corpus × eval)."""
    plan = plan_of(spark, sf_dir, "pipeline_decontaminate")
    assert "BroadcastHashJoin" in plan, "eval grams must broadcast"
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    for py_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_op not in plan, f"unexpected Python operator: {py_op}"


def test_quality_filter_no_shuffle_before_rollup(spark, sf_dir):
    """The compound quality predicate is a stateless projection; the
    only exchange allowed is the tiny per-source rollup."""
    plan = plan_of(spark, sf_dir, "pipeline_quality_filter")
    # The AQE plan string carries Final AND Initial plans — count the
    # final one only.
    final = plan.split("== Initial Plan ==")[0]
    import re
    shuffles = len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning)", final))
    assert shuffles <= 2, f"expected ≤2 exchanges (rollup + order), saw {shuffles}"
    # partial/final agg split proves map-side combine before the shuffle
    assert "partial_count" in final


def test_path_transitions_no_join_partial_agg(spark, sf_dir):
    """Transition counting is window + groupBy only: no join (a
    self-join spelling would scan the log twice) and a map-side
    partial aggregate so the matrix shuffle carries at most
    |types|^2 rows per partition."""
    plan = plan_of(spark, sf_dir, "events_path_transitions")
    final = plan.split("== Initial Plan ==")[0]
    assert "Join" not in final, "lead() spelling must not join"
    assert "EvalPython" not in final
    assert final.count("HashAggregate") >= 2, "partial+final agg required"
    assert final.count("Exchange") <= 3, "window hash + agg + output sort only"


def test_domain_quota_groupby_reuses_window_exchange(spark, sf_dir):
    """The quota rollup groups on the window's partition key, so
    Catalyst must NOT add a second hash exchange — the docstring's
    one-shuffle claim, asserted."""
    plan = plan_of(spark, sf_dir, "pipeline_domain_quota")
    final = plan.split("== Initial Plan ==")[0]
    assert "EvalPython" not in final and "Join" not in final
    assert final.count("Exchange") <= 2, "hash(source) window + output sort only"


def test_rare_token_df_join_broadcasts(spark, sf_dir):
    """The vocabulary df frame is tiny relative to the token stream;
    AQE must pick a broadcast join (a sort-merge join here would
    shuffle the whole exploded token stream a second time)."""
    plan = plan_of(spark, sf_dir, "text_rare_token_score")
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    assert "EvalPython" not in final


def test_dim_profile_single_agg_exchange(spark, sf_dir):
    """posexplode + quantize is a pure projection; the |labels| x 8
    key space collapses map-side, so the plan is scan -> partial agg
    -> one exchange -> final agg (+ output sort)."""
    plan = plan_of(spark, sf_dir, "embedding_dim_profile")
    final = plan.split("== Initial Plan ==")[0]
    assert "EvalPython" not in final and "Join" not in final
    assert final.count("HashAggregate") >= 2
    assert final.count("Exchange") <= 2


def test_interleave_prefilter_bounds_global_window(spark, sf_dir):
    """The audit's unpartitioned position window must sit above the
    rnk prefilter: only rows with rnk <= 10 reach the single-partition
    sort, keeping it bounded at any corpus size."""
    plan = plan_of(spark, sf_dir, "pipeline_interleave_sources")
    final = plan.split("== Initial Plan ==")[0]
    assert "EvalPython" not in final and "Join" not in final
    # the prefilter must survive into the physical plan
    assert "<= 10" in final, "rnk prefilter missing from executed plan"
    assert final.count("Exchange") <= 2


def test_pq_broadcasts_codebook_and_lookup(spark, sf_dir):
    """PQ's codebook and per-query ADC lookup tables are
    kilobyte-sized — every join against them must broadcast; a
    sort-merge join would shuffle the full codes table twice."""
    plan = plan_of(spark, sf_dir, "sim_ann_pq")
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert final.count("BroadcastHashJoin") >= 3, "codebook/dtable/rerank joins"
    assert "EvalPython" not in final
    assert "CartesianProduct" not in final


def test_incremental_dedup_broadcasts_corpus_hashes(spark, sf_dir):
    """The corpus fingerprint set collapses to DISTINCT hashes and
    joins the batch as a broadcast under AQE (a sort-merge join here
    would shuffle the batch a second time); no Python touches the
    row path."""
    plan = plan_of(spark, sf_dir, "dedup_incremental_exact")
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "SortMergeJoin" not in final
    assert "EvalPython" not in final


def test_ivfpq_adc_join_is_cell_scoped(spark, sf_dir):
    """The IVFPQ composition's whole point: the ADC lookup must run
    only INSIDE probed cells. In the executed plan that is a
    BroadcastHashJoin of the codes table against the probe list ON
    cid (with the vec_id != qid filter fused into the join) sitting
    BELOW the (qid, j, code) distance-table join — if the codes
    table reached the dtable join without the cid restriction, the
    compressed-domain scan would be full-corpus O(QxN), flat PQ all
    over again. All small sides (probes, dtable, codebook, query
    vectors) must broadcast; nothing may sort-merge or go cartesian
    on the data path (the BroadcastNestedLoopJoin Cross entries are
    the 8/16-row subspace/centroid fan-outs, broadcast by size)."""
    import re

    plan = plan_of(spark, sf_dir, "sim_ann_ivfpq")
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final
    assert "EvalPython" not in final
    lines = final.splitlines()
    cell_join = [
        i for i, ln in enumerate(lines)
        if re.search(r"BroadcastHashJoin \[cid#\d+\], \[cid#\d+\], Inner, BuildRight, NOT \(vec_id#\d+L = qid#\d+L\)", ln)
    ]
    assert cell_join, "cell-scoping cid join with fused vec_id!=qid missing"
    adc_join = [
        i for i, ln in enumerate(lines)
        if re.search(r"BroadcastHashJoin \[qid#\d+L, j#\d+, code#\d+\]", ln)
    ]
    assert adc_join, "(qid, j, code) ADC lookup join missing"
    # toString lists children after parents: the cid scoping must be
    # a DESCENDANT of (= appear after) the ADC lookup join.
    assert min(adc_join) < min(cell_join), "ADC lookup must consume the cell-scoped codes"


def test_matryoshka_windows_share_one_exchange(spark, sf_dir):
    """Both rankings (full-dim and prefix-dim) must ride ONE
    hash(qid) exchange — a second shuffle of the Q x N pair frame
    would double the audit's dominant cost; the query vectors are a
    broadcast, never a shuffle side."""
    plan = plan_of(spark, sf_dir, "embedding_matryoshka_audit")
    body = plan.split("== Initial Plan ==")[0]  # executed plan only
    assert body.count("Exchange hashpartitioning") == 1, (
        "the two row_number windows must share a single qid exchange"
    )
    assert body.count("Window") >= 2 and "BroadcastNestedLoopJoin" in body
    assert "SortMergeJoin" not in body


def test_epoch_mixture_broadcasts_plan_rows(spark, sf_dir):
    """The per-source plan (#sources rows) must broadcast into both
    the fractional-pass filter and the final assembly — a
    SortMergeJoin here would shuffle the full corpus scan against a
    20-row table."""
    plan = plan_of(spark, sf_dir, "pipeline_epoch_mixture")
    body = plan.split("== Initial Plan ==")[0]
    assert body.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in body


def test_shard_manifest_single_hash_exchange(spark, sf_dir):
    """Shard assignment + manifest rollup must ride ONE
    hash(media_type) exchange (the groupBy's partial aggregation
    collapses into the window's partitioning) — payload bytes never
    shuffle, and no join appears at all."""
    plan = plan_of(spark, sf_dir, "multimodal_shard_manifest")
    body = plan.split("== Initial Plan ==")[0]
    assert body.count("Exchange hashpartitioning") == 1
    assert "Join" not in body and "python" not in body.lower()


def test_exact_substring_no_python_no_text_shuffle(spark, sf_dir):
    """Window construction must be a JVM transform (zero Python
    operators) and the pair join must be a hash/broadcast join on the
    window string — never a cartesian. The `text` column must not
    appear in any Exchange (only 8-token windows move)."""
    plan = plan_of(spark, sf_dir, "dedup_exact_substring")
    body = plan.split("== Initial Plan ==")[0]
    assert "python" not in body.lower()
    assert "CartesianProduct" not in body and "NestedLoop" not in body
    for line in body.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, f"text column shuffled: {line}"


def test_bigram_lm_single_scan_training_no_python(spark, sf_dir):
    """The bigram construction must stay JVM-side (no Python eval)
    and the score joins must not degenerate to a cartesian; count
    tables carry partial_count (map-side combine) before their
    exchanges."""
    plan = plan_of(spark, sf_dir, "text_bigram_lm_score")
    body = plan.split("== Initial Plan ==")[0]
    assert "python" not in body.lower()
    assert "CartesianProduct" not in body and "NestedLoop" not in body
    assert "partial_count" in body, "count tables must combine map-side"


def test_centroid_drift_single_corpus_exchange(spark, sf_dir):
    """Only the (label, half, dim) partial-sum exchange may touch
    corpus-sized data — partial_sum must collapse map-side before it
    — and everything downstream (means join, label rollup) operates
    on label x 2 x 64-bounded frames. No Python anywhere."""
    plan = plan_of(spark, sf_dir, "embedding_centroid_drift")
    body = plan.split("== Initial Plan ==")[0]
    assert "python" not in body.lower()
    assert "partial_sum" in body, "per-partition combine must precede the exchange"
    assert "CartesianProduct" not in body and "SortMergeJoin" not in body


def test_ewah_bitmap_ops_plan(spark, sf_dir):
    """The bitmap UDAF's positions collapse map-side (partial
    collect_set before the group exchange — only distinct ints ever
    shuffle), the 5x5 pair join broadcasts (non-equi -> broadcast
    nested loop over the 5-row side, never a cartesian of anything
    corpus-sized), and the orders scan reads only the two columns
    the index needs."""
    plan = plan_of(spark, sf_dir, "ewah_bitmap_ops")
    body = plan.split("== Initial Plan ==")[0]
    assert "partial_collect_set" in body, "positions must combine map-side"
    assert "BroadcastNestedLoopJoin" in body, "pair join must broadcast"
    assert "SortMergeJoin" not in body and "CartesianProduct" not in body
    read_schema = body.split("ReadSchema: ")[1].split("\n")[0]
    assert "o_custkey" in read_schema and "o_comment" not in read_schema


def test_semantic_dedup_cell_scoped_pairs(spark, sf_dir):
    """SemDeDup's whole point: the pair search must be an equi-join
    ON cid (K independent blocks), never a corpus-level cartesian;
    the IVF assignment must be slot-cached so the three consumers
    (both pair sides + member counts) read one materialization
    instead of re-running the Lloyd chain. BroadcastNestedLoopJoin
    entries are the bounded 16-row centroid fan-outs inside the
    cached build lineage (same reading as the IVFPQ gate); join
    counts over the raw string are meaningless here because every
    InMemoryRelation reprints the cached subtree."""
    import re

    plan = plan_of(spark, sf_dir, "dedup_semantic")
    body = plan.split("== Initial Plan ==")[0]
    assert "InMemoryTableScan" in body, "assignment must be slot-cached"
    assert "CartesianProduct" not in body
    assert "EvalPython" not in body and "python" not in body.lower()
    assert re.search(r"Join \[cid#\d+\], \[cid#\d+\]", body), (
        "pair search must be an equi-join on cid")


def test_incremental_minhash_corpus_sigs_cached_no_cartesian(spark, sf_dir):
    """The corpus signature table must come from the cache slot
    (one materialization — a second Arrow signature pass over the
    corpus per consumer would defeat the persisted-signature
    pattern), the band join must be a hash equi-join on
    (band, bucket) — never cartesian — and no Exchange may carry the
    raw text column (only band keys and signatures move; text is
    re-read in place for the verification join)."""
    plan = plan_of(spark, sf_dir, "dedup_incremental_minhash")
    body = plan.split("== Initial Plan ==")[0]
    assert "InMemoryTableScan" in body, "corpus signatures must be slot-cached"
    assert "CartesianProduct" not in body
    for line in body.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, f"text column shuffled: {line}"
