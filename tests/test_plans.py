"""Physical-plan assertions — the 100 TB design contract.

Correct results are necessary but not sufficient: these tests pin the
*plan shapes* that make the engine scale — filters and column pruning
pushed into the parquet scan, small dimensions broadcast instead of
shuffled, global top-k via TakeOrderedAndProject (no full sort), and
whole-stage codegen on the hot relational path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fugue_warehouses_spark.queries import QUERIES
from fugue_warehouses_spark.sources import load_star_table


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _simple(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = load_star_table(spark, sf_dir, "lineitem")
    q = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,40" in plan.replace(" ", "")


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = load_star_table(spark, sf_dir, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    plan = _plan(q)
    # ReadSchema must include only the projected columns (lineitem has 16)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_comment" not in read and "l_extendedprice" not in read


def test_q3_broadcasts_filtered_dimension(spark, sf_dir):
    """customer (filtered, small) must broadcast into orders/lineitem —
    a shuffle join here would move the fact table at 100 TB."""
    plan = _simple(QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q3_top10_avoids_global_sort(spark, sf_dir):
    plan = _simple(QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_hot_path_stays_in_codegen(spark, sf_dir):
    """q1 (scan -> filter -> project -> hash agg) must compile into
    WholeStageCodegen spans with no Python evaluation nodes, and do
    map-side partial aggregation before the single shuffle."""
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    codegen = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )
    assert "WholeStageCodegen" in codegen
    simple = _simple(df)
    assert "BatchEvalPython" not in simple and "ArrowEvalPython" not in simple
    assert "partial_sum" in simple  # map-side combine
    assert simple.count("Exchange") == 1


def test_semi_anti_are_native_join_types(spark, sf_dir):
    plan_semi = _simple(QUERIES["semi_customers_with_orders"](spark, sf_dir))
    plan_anti = _simple(QUERIES["anti_customers_without_orders"](spark, sf_dir))
    assert "LeftSemi" in plan_semi
    assert "LeftAnti" in plan_anti


def test_aqe_enabled_in_session(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_exact_dedup_is_single_shuffle_with_group_limit(spark, sf_dir):
    """Fingerprint dedup: one shuffle on the fingerprint, and Spark's
    WindowGroupLimit applies rank<=1 partially BEFORE the exchange, so
    the shuffle moves at most one row per (partition, fingerprint) —
    the property that keeps this viable at 100 TB."""
    plan = _simple(QUERIES["doc_exact_dedup"](spark, sf_dir))
    assert plan.count("Exchange") == 1
    assert "WindowGroupLimit" in plan


def test_limit_pushdown_for_head(spark, sf_dir):
    li = load_star_table(spark, sf_dir, "lineitem")
    plan = _simple(li.select("l_orderkey").limit(5))
    assert "CollectLimit" in plan or "GlobalLimit" in plan


def test_bucketed_tables_join_without_shuffle(spark, sf_dir):
    """Two tables bucketed on the join key with equal bucket counts
    must sort-merge join with no Exchange on either side — the
    co-located join that saves the dominant shuffle at 100 TB."""
    from fugue_warehouses_spark.engine import SparkWarehouseEngine

    eng = SparkWarehouseEngine(spark)
    o = load_star_table(spark, sf_dir, "orders")
    c = load_star_table(spark, sf_dir, "customer")
    eng.save_table(o, "b_orders", bucket_by=["o_custkey"], num_buckets=8)
    eng.save_table(c, "b_customer", bucket_by=["c_custkey"], num_buckets=8)
    try:
        joined = (
            spark.table("b_orders")
            .hint("merge")  # force SMJ so broadcast doesn't mask bucketing
            .join(
                spark.table("b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
        )
        plan = _simple(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_q9_fact_table_never_pre_shuffles(spark, sf_dir):
    """5-way star join: every dimension must broadcast; the only
    exchanges allowed are the orders-side join and the final aggregate
    — lineitem must not hash-partition before its joins."""
    plan = _simple(QUERIES["q9_profit_by_nation"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_scalar_subquery_decorrelates_to_aggregate_join(spark, sf_dir):
    """Catalyst must rewrite the correlated scalar subquery into an
    aggregate + join — no per-row re-execution of the inner query."""
    plan = _simple(QUERIES["orders_scalar_subquery"](spark, sf_dir))
    assert "Join" in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_similarity_block_path_is_one_grouping_shuffle(spark, sf_dir):
    """The block all-pairs plan: one explode + one hash exchange on the
    group key feeding FlatMapGroupsInPandas — and NO broadcast of the
    corpus, no cartesian product."""
    from fugue_warehouses_spark.extensions import similarity as S

    emb = load_star_table(spark, sf_dir, "embeddings")
    plan = _plan(S.similarity_pairs(emb, threshold=0.35, method="block"))
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" not in plan
    assert plan.count("Exchange") <= 2  # group-key hash exchange (+AQE read)


def test_metadata_count_runs_no_job(spark, sf_dir):
    """Raw-scan count must not schedule any Spark job."""
    from fugue_warehouses_spark.frame import WarehouseFrame

    raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    n = WarehouseFrame(raw).count()
    after = tracker.getJobIdsForGroup(None)
    assert n > 0
    assert before == after


def test_q18_aggregates_and_prunes_before_join(spark, sf_dir):
    """Aggregate-before-join: lineitem must collapse per orderkey (with
    map-side partial_sum) and the HAVING filter must apply BEFORE the
    join — the join input is the pruned aggregate, not the fact table."""
    plan = _simple(QUERIES["q18_large_volume_orders"](spark, sf_dir))
    assert "partial_sum" in plan  # map-side combine
    join_pos = max(plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin"))
    agg_pos = plan.find("HashAggregate")
    filt_pos = plan.find("Filter (isnotnull(total_qty")
    assert 0 <= join_pos < filt_pos < agg_pos  # filter+agg are join children
    # scan reads only the two needed lineitem columns
    read = [ln for ln in plan.splitlines() if "lineitem" in ln][0]
    assert "l_orderkey" in read and "l_quantity" in read and "l_tax" not in read


def test_events_filter_pushes_through_ts_normalization(spark, sf_dir):
    """The events loader wraps the scan in a timestampadd projection;
    filters on OTHER columns must still push through it into the
    parquet scan (Catalyst pushes predicates past deterministic
    projects)."""
    ev = load_star_table(spark, sf_dir, "events")
    plan = _plan(ev.filter(F.col("event_type") == "error").select("event_id"))
    assert "PushedFilters" in plan
    assert "EqualTo(event_type,error)" in plan.replace(" ", "")


def test_partitioned_write_prunes_partitions_on_read(spark, sf_dir, tmp_path):
    """Hive-style partition layout (save_df partition_by) must turn a
    filter on the partition column into directory pruning — the scan
    lists ONLY the matching partition, it does not read-and-filter."""
    from fugue_warehouses_spark.engine import SparkWarehouseEngine

    eng = SparkWarehouseEngine(spark)
    orders = load_star_table(spark, sf_dir, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    eng.save_df(orders, path, fmt="parquet", partition_by=["status"])
    scan = eng.load_df(path).native.filter(F.col("status") == "F")
    plan = _plan(scan)
    # the partition filter appears as PartitionFilters on the scan,
    # not as a post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "status" in pf_line
    # and the pruned read returns exactly the one partition's rows
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert scan.count() == expected


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Parquet schema evolution: files written before a column was
    added merge with later files (mergeSchema), old rows null-filled."""
    from fugue_warehouses_spark.engine import SparkWarehouseEngine

    eng = SparkWarehouseEngine(spark)
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id int, name string")
    v2 = spark.createDataFrame([(2, "b", 9.5)], "id int, name string, score double")
    v1.write.mode("append").parquet(path)
    v2.write.mode("append").parquet(path)
    merged = eng.load_df(path, mergeSchema="true")
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in merged.native.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_funnel_reuses_one_user_shuffle(spark, sf_dir):
    """Three chained windows + per-user collapse must share ONE
    hash exchange on user_id; only the tiny stage histogram adds a
    second (bounded-size) exchange."""
    df = QUERIES["events_funnel_stages"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    user_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(user_id" in ln
    ]
    assert len(user_exchanges) == 1


def test_plan_report_counters(spark, sf_dir):
    """plans/report.py: the counters agree with the shapes the other
    tests pin individually — q3's star join broadcasts its dims, scans
    carry pushed filters, no nested-loop joins anywhere."""
    from fugue_warehouses_spark.plans.report import plan_report
    from fugue_warehouses_spark.queries import QUERIES

    rep = plan_report(QUERIES["q3_shipping_priority"](spark, sf_dir), run=True)
    assert rep.n_broadcast_joins >= 2
    assert rep.n_nested_loop_joins == 0
    assert rep.n_scans >= 3
    assert rep.n_scans_with_pushed_filters >= 1
    assert rep.n_codegen_spans >= 1
    assert rep.has_aqe
    d = rep.as_dict()
    assert d["n_broadcast_joins"] == rep.n_broadcast_joins


def test_plan_report_counts_shuffles(spark):
    from fugue_warehouses_spark.plans.report import plan_report
    from pyspark.sql import functions as F

    df = spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count()
    rep = plan_report(df, run=True)
    assert rep.n_exchanges >= 1  # one shuffle for the aggregate
    assert rep.n_nested_loop_joins == 0


def test_duplicate_spans_no_cartesian_dup_set_broadcast(spark, sf_dir):
    """Span dedup: the duplicated-span set joins back via broadcast
    (it's the small side); no cartesian/nested-loop anywhere."""
    plan = _plan(QUERIES["doc_duplicate_spans"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_q21_single_fact_exchange_chain(spark, sf_dir):
    """Q21: the orderkey repartition feeds BOTH the (ok, sk) groupBy
    and the ok window without re-exchanging — at most the fact
    exchange + the orders probe side + the final tiny agg."""
    plan = _simple(QUERIES["q21_waiting_suppliers"](spark, sf_dir))
    n_shuffle = plan.count("Exchange hashpartitioning")
    assert n_shuffle <= 3, plan


def test_tfidf_keywords_broadcasts_df_and_n(spark, sf_dir):
    """TF-IDF: token df table and the 1-row group count both ride
    broadcasts; the only hash shuffles are the two token aggregations
    and the per-group window."""
    plan = _plan(QUERIES["doc_tfidf_keywords"](spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_hard_negatives_no_corpus_shuffle_before_candidates(spark, sf_dir):
    """Hard-negative mining: the corpus streams straight into the
    Arrow-batch scorer — exactly one exchange (the final top-k
    window over the k*|queries| candidate set)."""
    plan = _simple(QUERIES["embedding_hard_negatives"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_no_registry_query_plans_a_cartesian_product(spark, sf_dir):
    """Global scale guard: NO query in the full facet registry may
    plan a CartesianProduct. Deliberate cross joins in the registry
    are all 1-row-or-tiny broadcast sides (scalar stats, plane
    matrices), which Spark plans as BroadcastNestedLoopJoin — a real
    CartesianProduct node means an unbounded pair blowup shipped a
    full shuffle, which no operator here should ever need. (Analysis
    only for most queries; a few build-time collects run tiny jobs.)"""
    from fugue_warehouses_spark.queries import QUERIES as ALL

    offenders = []
    for name, fn in ALL.items():
        df = fn(spark, sf_dir)
        plan = _simple(df)
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DPP: when the fact table is hive-partitioned on the join key and
    the dimension side carries a selective filter, Spark must inject a
    runtime dynamicpruning subquery into the fact scan — at 100 TB
    this is what turns 'join a year of partitions with one region'
    into reading only that region's partitions."""
    fact = (
        load_star_table(spark, sf_dir, "orders")
        .withColumn("cust_bucket", F.pmod(F.col("o_custkey"), F.lit(16)))
    )
    path = str(tmp_path / "orders_by_bucket")
    fact.write.partitionBy("cust_bucket").parquet(path)
    dim = (
        spark.range(16)
        .withColumnRenamed("id", "cust_bucket")
        .withColumn("keep", F.col("cust_bucket") < 2)
        .filter("keep")
    )
    j = spark.read.parquet(path).join(dim, "cust_bucket")
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and it computes the right answer over the pruned partitions
    expected = fact.filter(F.col("cust_bucket") < 2).count()
    assert j.count() == expected


def test_equidepth_histogram_no_partitionless_window(spark, sf_dir):
    """The exact equi-depth histogram must carry NO SinglePartition
    window (the global-ntile scale-killer): global rank comes from
    repartitionByRange + within-partition row_number + offsets, so
    every Window in the plan is partitioned and every Exchange moves
    ~1/P of the data."""
    df = QUERIES["orders_equidepth_histogram"](spark, sf_dir)
    plan = _plan(df)
    assert "SinglePartition" not in plan, plan[:2000]
    # rank comes from monotonic ids over range-sorted partitions —
    # no Window node at all, and no second (pid-hash) exchange
    assert "Window" not in plan


def test_equidepth_approx_is_scan_plus_one_shuffle(spark, sf_dir):
    """The approx variant (100 TB default) must be a parallel scan +
    a single 10-group aggregation exchange: no window, no range
    repartition, no join nodes (the 9 boundaries are literals)."""
    df = QUERIES["orders_equidepth_histogram_approx"](spark, sf_dir)
    simple = _simple(df)
    assert "Window" not in simple
    assert "Join" not in simple
    assert simple.count("Exchange") == 1


def test_rank_limit_windows_get_group_limit_pushdown(spark, sf_dir):
    """Every per-group top-k in the registry leans on Spark's
    WindowGroupLimit pushdown (partial pre-shuffle + final post-shuffle
    limits): without it, a `row_number() <= k` filter would funnel a
    whole group — e.g. the KMV 'ALL' scope, which is the ENTIRE
    distinct hash stream — through one task. Pin the pushdown so an
    optimizer-config regression fails here, not at 100 TB."""
    for name in ("orders_kmv_rollup", "doc_stratified_sample",
                 "doc_tfidf_keywords"):
        plan = _plan(QUERIES[name](spark, sf_dir))
        assert plan.count("WindowGroupLimit") >= 2, name  # partial+final


def test_bloom_dedup_history_never_shuffle_joins(spark, sf_dir):
    """The Bloom-prefiltered incremental dedup must carry NO sort-merge
    join: the bitset rides a broadcast (dense: a UDF closure; the
    verify legs: AQE/explicit broadcasts), so the history side is
    scanned, never shuffle-joined."""
    for name in (
        "doc_incremental_dedup_bloom",
        "doc_incremental_dedup_bloom_persisted",
    ):
        plan = _simple(QUERIES[name](spark, sf_dir))
        assert "SortMergeJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_bigram_lift_totals_are_broadcast_not_windowed(spark, sf_dir):
    """Corpus/vocabulary totals must ride broadcast scalar aggregates —
    a partition-less Window over the count frames would move the whole
    vocabulary through one task at scale."""
    plan = _plan(QUERIES["doc_bigram_lift"](spark, sf_dir))
    assert "Window" not in plan


def test_bigram_logprob_broadcasts_small_sides(spark, sf_dir):
    """The unigram-scale context counts and the vocab scalar must ride
    broadcasts; only the bigram count table may shuffle-join."""
    from fugue_warehouses_spark.extensions.quality import bigram_logprob

    docs = load_star_table(spark, sf_dir, "documents")
    plan = _plan(bigram_logprob(docs, "doc_id", "text"))
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_ivf_cell_pruning_pushes_to_parquet_scan(spark, tmp_path):
    """A persisted inverted-list IVF index probed with a SMALL cell
    set must push the cidx membership filter into the parquet scan
    (PushedFilters In(cidx,...)) — with the build clustering the
    index by cell, that is row-group pruning: unprobed cells are
    never read. The wide-probe path deliberately trades pushdown for
    one array-literal filter (construction cost), so only the
    <=128-cell case asserts In()."""
    import numpy as np

    from fugue_warehouses_spark.extensions.similarity import (
        _ivf_threshold_hits,
        build_ivf_hash_index,
    )

    rng = np.random.default_rng(3)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=8)]) for i in range(256)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned, cents = build_ivf_hash_index(emb, n_centroids=16)
    path = str(tmp_path / "ivf")
    assigned.write.parquet(path)
    stored = spark.read.parquet(path)
    queries = emb.filter("vec_id < 3")
    hits = _ivf_threshold_hits(
        stored, queries, 0.99, 2, cents, None,
        "embedding", "vec_id", "embedding", 6,
    )
    plan = _plan(hits)
    assert "PushedFilters" in plan
    assert "In(cidx" in plan.replace(" ", "").replace("[", "(")


def test_dsir_bigram_plan_shape_matches_unigram(spark, sf_dir):
    """The bigram feature space must not change the PLAN, only widen
    the gram stream: same exchange count and no extra generate/window
    nodes vs the unigram facet — the r10 quadratic regression lived
    entirely inside one Project, invisible to exchanges, so this
    guards the macro shape while the properties canary guards the
    per-row cost."""
    uni = _simple(QUERIES["doc_dsir_select"](spark, sf_dir))
    bi = _simple(QUERIES["doc_dsir_select_bigram"](spark, sf_dir))
    assert uni.count("Exchange") == bi.count("Exchange")
    assert "Window" not in bi
    assert bi.count("TakeOrdered") == 1


def test_curriculum_schedule_windows_are_partitioned(spark, sf_dir):
    """Both of the curriculum facet's global orders (the quality rank
    that defines buckets and the final schedule position) must run
    through add_global_cumsum's range-shuffle + pid-partitioned
    window — a partition-less `ROW_NUMBER() OVER (ORDER BY ...)`
    would pull the whole corpus through one task at 100 TB. Every
    Window node in the plan must carry a partition spec."""
    import re

    plan = _plan(QUERIES["doc_curriculum_schedule"](spark, sf_dir))
    # window spec renders as windowspecdefinition(<partition...>,
    # <order...>); a partition-less one starts directly with the sort
    # expression list and no partition columns before the first
    # ordering spec ("ASC NULLS FIRST" etc. appears as the FIRST arg)
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        first_arg = m.group(1).split(",")[0]
        assert "ASC" not in first_arg and "DESC" not in first_arg, (
            "partition-less window in curriculum plan: "
            f"windowspecdefinition({m.group(1)[:120]}...)"
        )


def test_decontaminate_spans_probe_broadcasts_no_cartesian(spark, sf_dir):
    """The decontamination probe set must reach the corpus side as a
    BROADCAST (a shuffled gram join would move the 100 TB corpus's
    exploded grams), and nothing in the plan may degenerate to a
    cartesian product. The non-broadcast shuffles are the hit-start
    groupBy and the contaminated-doc rebuild join — candidate-sized,
    never corpus-gram-sized. Round 11: fan_out_scan may add ONE more
    exchange when the corpus scan is a single split (it moves raw
    (id, text) rows once, pre-explode — still never exploded grams);
    at real scan parallelism that exchange is absent, so the cap is
    5 locally and the gram-sized-shuffle property is unchanged."""
    plan = _simple(QUERIES["doc_decontaminate_spans"](spark, sf_dir))
    assert plan.count("BroadcastExchange") >= 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("Exchange") <= 5


def test_token_balanced_shards_no_global_window_no_extra_scan(spark, sf_dir):
    """The balanced-shard plan must keep add_global_cumsum's shape —
    pid-PARTITIONED window, offsets arriving by broadcast — and the
    grand total must ride the offsets collect as a literal: no second
    scan+aggregate+crossJoin for sum(weights), no partition-less
    window."""
    import re

    df = QUERIES["doc_token_balanced_shards"](spark, sf_dir)
    plan = _plan(df)
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        first_arg = m.group(1).split(",")[0]
        assert "ASC" not in first_arg and "DESC" not in first_arg, (
            "partition-less window in balanced-shard plan"
        )
    simple = _simple(df)
    assert "CartesianProduct" not in simple and "Join Cross" not in simple
    assert simple.count("Exchange") <= 3


def test_audio_facets_payloads_never_shuffle(spark, sf_dir):
    """The audio facets chain synth -> featurize as two MapInPandas
    stages; the ONLY exchanges allowed are the 8-byte-id round-robin
    BEFORE the synth kernel and the final 9-scalar sort — an exchange
    between the two kernels would shuffle whole WAV payloads, the
    exact thing the 100 TB shape forbids."""
    for name in ("multimodal_audio_features", "multimodal_audio_segments"):
        simple = _simple(QUERIES[name](spark, sf_dir))
        assert simple.count("Exchange") <= 2, (name, simple)
        # no exchange between the two python kernels: the plan segment
        # from the first MapInPandas (bottom-up: last in text) to the
        # second must be exchange-free
        idx = [m for m in range(len(simple)) if simple.startswith("MapInPandas", m)]
        assert len(idx) == 2, (name, "expected exactly two MapInPandas")
        between = simple[idx[0]:idx[1]]
        assert "Exchange" not in between, (name, between)


def test_retrieval_eval_has_no_matched_set_ranking_window(spark, sf_dir):
    """The eval's ranking must stay two-phase bounded top-k: the only
    row_number windows allowed are over the kernel-reduced candidate
    frames (which appear AFTER a MapInPandas in the plan). A
    regression to ranking the raw matched set would show as a window
    whose input subtree has no MapInPandas, and as fewer than two
    top-k kernels."""
    simple = _simple(QUERIES["doc_retrieval_eval"](spark, sf_dir))
    assert simple.count("MapInPandas") >= 2, "bounded top-k kernels missing"
    import re

    n_windows = len(re.findall(r"\bWindow\b", simple))
    assert n_windows <= 2, (n_windows, "unexpected extra ranking windows")
