"""Physical-plan assertions: the 100 TB properties are enforced, not
aspirational.  Each test pins a plan invariant that must survive
refactors (pushdown reaching the scan, dims broadcast, partial
aggregation before the shuffle, take-ordered instead of global sort)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_3_3_6_spark.plans.queries import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_reach_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_revenue_forecast")
    assert "PushedFilters: [IsNotNull" in plan
    # shipdate range must be pushed, not post-filtered only
    assert "GreaterThanOrEqual(l_shipda" in plan  # PushedFilters list is truncated in toString
    # no shuffle at all: partial+final agg over a single scan
    assert "Exchange hashpartitioning" not in plan


def test_q6_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_revenue_forecast")
    # only the 4 needed columns may be read from a 11-column table
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert set(cols) == {"l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_local_volume")
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region at minimum
    # exactly one fact-fact shuffle join pipeline: no cartesian anywhere
    assert "CartesianProduct" not in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    # map-side combine: partial_ aggregate on the scan side of the
    # exchange (plans print top-down, so the partial comes AFTER the
    # Exchange in the string — it is the exchange's child)
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange hashpartitioning")


def test_span_fraction_guarded_no_shingle_window_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dedup_span_fraction")
    # the REGISTERED form carries the max_df hot-shingle guard: the
    # >=2-docs flag comes from a complete-mode per-shingle aggregate
    # over a repartition exchange — NO window over the shingle
    # partition may exist (a runaway boilerplate shingle would pile
    # one partition); exchange reuse (single scan at runtime) is
    # asserted in test_guarded_spans_reuse_one_exchange
    assert "Window" not in plan
    import re

    # every documents scan reads at most (doc_id, text) — never the full row
    for schema in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in schema.split(",")}
        assert cols <= {"doc_id", "text"}, cols


def test_pack_sequences_single_shuffle_per_block_window(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pipeline_pack_sequences")
    # one hash exchange into block streams + the per-block running-sum
    # window; a global (single-partition) sort would be the scale bug
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "Window" in plan


def test_pii_redact_is_shuffle_free(spark, sf_dir):
    # Pure projection over the scan — the ONLY permitted exchange is
    # spread_for_compute's conditional input rebalance (hash on
    # doc_id), which exists exactly when the file layout yields fewer
    # splits than cores and is a no-op at scale.
    plan = plan_of(spark, sf_dir, "text_pii_redact")
    assert plan.count("Exchange") <= 1
    if "Exchange" in plan:
        assert "hashpartitioning(doc_id" in plan
    assert "Window" not in plan and "Sort" not in plan.replace("SortAggregate", "")


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "topk_orders")
    assert "TakeOrderedAndProject" in plan
    # a global Sort would be the scale bug TakeOrdered avoids
    assert "Exchange rangepartitioning" not in plan


def test_sort_uses_range_partitioning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sort")
    # total-order sort = sampled range partitioning (TotalOrderPartitioner analogue)
    assert "Exchange rangepartitioning" in plan


def test_minhash_partial_mins_before_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dedup_minhash")
    assert "partial_min" in plan
    assert plan.index("partial_min") > plan.index("Exchange hashpartitioning")


def test_semi_join_stays_semi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan


def test_aqe_splits_skewed_join(spark):
    """The 100 TB hot-key story: with AQE on (session default), a
    skewed sort-merge join partition is split at runtime —
    SortMergeJoin(skew=true) in the final adaptive plan."""
    from pyspark.sql import functions as F

    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        big = spark.range(200_000).select(
            (F.when(F.col("id") % 100 < 95, 0).otherwise(F.col("id") % 1000)).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        other = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
        j = big.join(other, "k")
        assert len(j.collect()) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize(
    "name",
    [
        "q2_min_cost_supplier",
        "q11_important_stock",
        "q15_top_supplier",
        "q17_small_quantity",
        "q20_excess_share_suppliers",
        "q21_waiting_suppliers",
    ],
)
def test_decorrelated_queries_scan_fact_once(spark, sf_dir, name):
    """Spark re-executes reused DataFrame subtrees, so join-back-to-
    own-aggregate decorrelations scan the fact table per reference;
    these queries are written in single-scan window form and must stay
    that way."""
    plan = plan_of(spark, sf_dir, name)
    assert plan.count("lineitem.parquet") == 1, f"{name} re-scans lineitem"


def test_asof_join_is_linear(spark, sf_dir):
    """The as-of join must stay the union+window linear form — a range
    join + rank would materialize |events|x|orders| pairs per user
    before filtering."""
    plan = plan_of(spark, sf_dir, "asof_join_events_orders")
    for node in ["SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"]:
        assert node not in plan, f"asof join plan contains {node}"
    assert "Window" in plan


def test_asof_nearest_shares_one_shuffle(spark, sf_dir):
    """direction='nearest' runs both directional scans over the SAME
    hash(key) shuffle: exactly one exchange, two in-partition sorts,
    zero join nodes — a second exchange or a self-join would double
    the cost of the most expensive stage."""
    plan = plan_of(spark, sf_dir, "asof_join_nearest")
    assert plan.count("Exchange hashpartitioning") == 1, plan.count("Exchange hashpartitioning")
    assert plan.count("Sort [") == 2
    for node in ["SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"]:
        assert node not in plan, f"nearest asof plan contains {node}"


def test_ivf_probe_join_broadcasts(spark, sf_dir):
    """The probes-to-candidates join keys on cent_id (num_centroids
    distinct values — maximal skew for a shuffle join); the tiny probe
    side must broadcast so the corpus-sized assigned side never
    shuffles for it."""
    plan = plan_of(spark, sf_dir, "similarity_ivf_topk")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivf_pq_candidates_join_is_equi_keyed(spark, sf_dir):
    """The composed IVF-PQ's list pruning must be an EQUI join of the
    corpus code table against the broadcast probe tables on cluster_id
    — a BroadcastHashJoin keyed on cluster_id, never a nested-loop
    over all codes (which would silently degrade to pq_topk's full
    scan and erase the O(N·nprobe/K) candidate bound)."""
    plan = plan_of(spark, sf_dir, "similarity_ivf_pq_topk")
    assert "SortMergeJoin" not in plan
    bhj = [l for l in plan.splitlines() if "BroadcastHashJoin" in l and "cluster_id" in l]
    assert bhj, plan[:3000]


def test_ivf_pq_residual_candidates_equi(spark, sf_dir):
    """Residual IVF-PQ adds the per-row residualization (an equi
    broadcast join against the k-row centroid frame) but must keep the
    composed form's list pruning: candidate scan equi-keyed on
    cluster_id, never a corpus-wide nested loop."""
    plan = plan_of(spark, sf_dir, "similarity_ivf_pq_residual_topk")
    assert "SortMergeJoin" not in plan
    bhj = [l for l in plan.splitlines() if "BroadcastHashJoin" in l and "cluster_id" in l]
    assert bhj, plan[:3000]


def test_interval_join_is_equi(spark, sf_dir):
    """The bucketed interval join must compile to an equi-join on
    (key, bucket) — never a nested-loop/cartesian pair scan."""
    plan = plan_of(spark, sf_dir, "interval_join_shipments")
    for node in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan


def test_embedding_neardup_pair_join_is_equi_keyed(spark, sf_dir):
    """The near-dup pair join is blocked on the cluster assignment:
    exactly one equi-join on cluster_id (SortMergeJoin or
    ShuffledHashJoin over the assigned corpus) and the ONLY
    nested-loop node is the bounded corpus x broadcast(k-centroid,
    in-plan adaptive k = ceil(sqrt(N)))
    assignment stage — pair work is sum(|cluster|^2), never
    corpus^2."""
    plan = plan_of(spark, sf_dir, "embedding_neardup")
    assert "CartesianProduct" not in plan
    # Per assignment subtree (a/b sides): one 1-row broadcast of the
    # in-plan k = ceil(sqrt(N)) scalar into the centroid filter, plus
    # the corpus x broadcast(k centroids) scoring cross — 4 bounded
    # BNLJs total, all with a broadcast side of <= k rows.
    assert plan.count("BroadcastNestedLoopJoin") <= 4
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan and "cluster_id" in plan
    )), plan
    assert "cluster_id" in plan


def test_runtime_bloom_filter_reduces_fact_scan(spark, sf_dir):
    """Catalyst's runtime bloom-filter injection: a selective dim-side
    filter materializes a bloom filter that pre-filters the fact side
    before the join shuffle — at 100 TB this is the difference between
    shuffling the whole fact table and shuffling the ~matching rows.
    Verifies the engine's confs let might_contain appear once the join
    is too big to broadcast."""
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        from hadoop_3_3_6_spark.session import load_table

        li = load_table(spark, "lineitem", sf_dir)
        orders = load_table(spark, "orders", sf_dir).filter(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy("o_orderpriority").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_no_accidental_cartesian_or_nlj_anywhere(spark, sf_dir):
    """Corpus-wide plan audit as a regression gate: CartesianProduct
    never appears; BroadcastNestedLoopJoin only in the queries where
    the cross product IS the semantics (brute-force similarity
    baselines, IVF's bounded corpus × centroids stage, q22's and
    tf_idf's 1-row scalar-subquery crosses)."""
    allowed_nlj = {
        "similarity_topk",
        # neardup's ONLY remaining NLJ is the bounded corpus x
        # broadcast(16 centroids) assignment stage — the pair join
        # itself is equi-keyed on cluster_id (asserted in
        # test_embedding_neardup_pair_join_is_equi_keyed)
        "embedding_neardup",
        "similarity_ivf_topk",
        "similarity_ivf_trained",
        # PQ/ADC: corpus x broadcast(1-row codebook matrix) encode and
        # corpus x broadcast(bounded probe distance-tables) scoring —
        # both crosses are the semantics (no equi-key exists for a
        # 1-row matrix or an ADC table lookup)
        "similarity_pq_topk",
        # maintenance verdict row: the one-shot pq_encode side carries
        # the same 1-row codebook cross; the verdict join itself is an
        # equi FULL OUTER on vec_id
        "similarity_pq_incremental",
        # composed IVF-PQ keeps only the bounded crosses: corpus x
        # broadcast(16 centroids) coarse assignment, corpus x
        # broadcast(1-row codebook matrix) encode, probes x codebooks;
        # the candidate scan itself is an EQUI join on cluster_id
        # (plan-gated in test_ivf_pq_candidates_join_is_equi_keyed)
        "similarity_ivf_pq_topk",
        # residual variant: same bounded crosses (the residualization
        # itself is an equi broadcast join on cluster_id); candidate
        # scan equi-gated in test_ivf_pq_residual_candidates_equi
        "similarity_ivf_pq_residual_topk",
        # refined two-stage: stage 1 is the composed IVF-PQ plan
        # unchanged; the refine joins are equi broadcasts (shortlist,
        # probe vectors) — only the inherited PQ crosses remain
        "similarity_ivf_pq_refined_topk",
        # OPQ: adds the 1-row rotation-matrix broadcast cross to the
        # PQ crosses; same scalar-matrix class
        "similarity_opq_topk",
        "similarity_quantized_topk",
        "dedup_semantic",
        # same bounded corpus x broadcast(k) assignment stage as
        # dedup_semantic; stage 2 is a window, no pair join at all
        "pipeline_diversity_sample",
        "q22_global_sales_opportunity",
        "skew_profile_events",
        "histogram_order_values",
        "quantile_bins_lineitem",
        # CCNet tertile thresholds: 1-row percentile scalar cross
        # (the quantile_bins discipline)
        "pipeline_perplexity_buckets",
        "pipeline_token_budget",
        # semantic decontamination: corpus x broadcast(1-row eval
        # matrix) — the scalar-matrix cross IS the semantics (no
        # equi-key exists for a folded eval array)
        "pipeline_contamination_semantic",
        "text_tfidf_topk",
        "text_lm_score",
        "pipeline_temperature_mix",
        # 1-row corpus-totals cross feeding the smoothed log-ratio
        # table (256 rows) — same scalar-subquery shape as q22
        "pipeline_importance_resample",
        "pipeline_pretraining_e2e",
        # 1-row broadcast bloom-mask cross: the probe-side filter IS
        # the semantics (no equi-key exists for a bitmask row)
        "sketch_bloom_prefilter",
        "sketch_bloom_prefilter_fast",
        # same mask cross, plus a 1-row x 1-row scalar verdict cross
        # (exact_matches x matched_passed) — both sides are aggregates
        "sketch_bloom_prefilter_fast_verdict",
        # the recall ground truth IS similarity_topk's brute-force
        # probes x corpus NLJ (bounded: 25 probes broadcast)
        "similarity_lsh_topk_fast_verdict",
        # combine job: 1-row totals x 1-row long-word stats
        "jobcontrol_word_pipeline",
        # round-10 streaming twin: 1-row streamed-count aggregate x
        # 1-row digest-set verdict aggregate — the same scalar-combine
        # cross as jobcontrol_word_pipeline
        "pipeline_web_streaming",
        # round-12 capstone stage 1: the url_dedup accounting row is a
        # 1-row survivors aggregate x 1-row incoming-count stats
        # parquet — the jobcontrol_word_pipeline scalar-combine class
        "pipeline_pretraining_full",
    }
    # Arrow-batched Python stages are allowed only where Python IS the
    # semantics (multimodal codecs, secondary-sort carry, pandas UDAF,
    # UDTF, hadoop-streaming pipe); row-at-a-time BatchEvalPython is
    # never allowed anywhere.
    allowed_python = {
        "secondarysort",
        "udaf_weighted_price",
        "udtf_expand_orders",
        "pipe_wordcount",
        "multimodal_decode",
        "multimodal_meta",
        "multimodal_audio",
        "multimodal_video",
        "multimodal_container_meta",
        "multimodal_wav_source",  # Python DataSource scan
        "multimodal_phash_dedup",  # codec decode + dHash IS the semantics
        "multimodal_phash_incremental",  # codec decode + dHash IS the semantics
        "token_shards_roundtrip",  # binary shard IO IS the semantics
        "distch_manifest",  # executor-side stat: FS metadata IS the semantics
        "warc_source_scan",
        "avro_roundtrip",
        "seqfile_roundtrip",
        "bbp_pi_digits",  # per-digit BBP arithmetic (reference example parity)
        "similarity_lsh_topk_fast",  # numpy-matmul pandas UDF IS the fast path
        # the verdict companion runs the same pandas-UDF fast path to
        # measure its recall in-plan
        "similarity_lsh_topk_fast_verdict",
        "tokenizer_bpe_apply",  # iterative merge rewriting per word IS the semantics
        # round-9: Viterbi segmentation of DISTINCT words moved
        # executor-side (the ADVICE driver-collect fix) — one Arrow
        # stage over the distinct-word frame, never the corpus
        "tokenizer_unigram_apply",
        "text_html_extract",  # HTML parsing IS the semantics (codec tier)
        "pipeline_web_e2e",  # WARC PythonDataSource + the HTML parse stage
        # round-10: the capstone's accounting plan reads token shards
        # back (MapInPandas shard decode — binary IO IS the semantics);
        # the streaming twin's one-shot verdict side re-runs the HTML
        # parse stage (ArrowEvalPython) over the batch WARC read
        "pipeline_pretraining_full",
        "pipeline_web_streaming",
        # round-11: raw Writable wire-byte reserialization (MapInPandas
        # — the BytesWritable surfacing IS the semantics)
        "seqfile_as_binary_scan",
        # round-11: the stream-sink verdict reads its segments back
        # through the batch WARC PythonDataSource
        "warc_stream_sink_roundtrip",
        # round-12: PercentFilter's faithful reader-positional accept
        # is a PER-READER STATEFUL COUNTER across batches — no Column
        # expression can express record-ordinal state, so the
        # mapInPandas stage IS the semantics
        "seqfile_filter_percent_positional",
        # round-12: the byte-exact gensort generator — the 128-bit LCG
        # skip-ahead/step and GenSort record layout ARE the semantics
        # (python integers are the 128-bit arithmetic)
        "teragen_gensort_validate",
        # round-12: typed-bytes frame encode + raw SEQ walk + frame
        # decode — the wire format IS the semantics (codec tier), and
        # the raw reader exists precisely because the JVM CANNOT
        # deserialize TypedBytesWritable (not on the classpath)
        "typedbytes_roundtrip",
        # round-12: the binary -io typedbytes pipe — a REAL child
        # process per partition IS the operator (PipeMapRed contract)
        "pipe_typedbytes_wordcount",
    }
    python_nodes = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas", "PythonDataSource")
    offenders = {}
    for name in QUERIES:
        plan = plan_of(spark, sf_dir, name)
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in allowed_nlj:
            offenders[name] = "BroadcastNestedLoopJoin"
        if "BatchEvalPython" in plan:
            offenders[name] = "BatchEvalPython (row-at-a-time Python UDF)"
        elif name not in allowed_python and any(n in plan for n in python_nodes):
            offenders[name] = next(n for n in python_nodes if n in plan)
    assert not offenders, offenders


def test_query_construction_runs_no_jobs(spark, sf_dir):
    """Query constructors must be pure plan builders — no eager driver
    action (collect/count) hidden inside.  At scale an eager action in
    a constructor splits the plan and materializes intermediates.
    Exemptions: streaming queries execute an availableNow micro-batch
    run by contract (the returned DataFrame is the memory-sink table),
    terasort_validate and avro_roundtrip write+read their own data,
    and pipe_wordcount spawns the child-process pipe eagerly to
    surface launch errors."""
    eager_by_contract = {
        name
        for name in QUERIES
        if name.startswith("streaming_")
        or name in {"terasort_validate", "pipe_wordcount", "avro_roundtrip", "dedup_clusters",
                    "similarity_ivf_trained", "multimodal_wav_source", "pipeline_dedup_keep",
                    "warc_source_scan", "seqfile_roundtrip", "jobcontrol_word_pipeline",
                    "tokenizer_bpe_train", "tokenizer_bpe_apply",
                    "similarity_pq_topk",  # PQ training iterations (ivf_trained contract)
                    "similarity_ivf_pq_topk",  # same PQ training contract
                    "similarity_ivf_pq_residual_topk",  # same PQ training contract
                    "similarity_ivf_pq_refined_topk",  # same PQ training contract
                    "similarity_opq_topk",  # OPQ rotation + PQ training contract
                    "distch_manifest",  # renders + mutates its tree at construction
                    "token_shards_roundtrip",  # renders shard triples at construction
                    "tokenizer_unigram_apply",  # EM training + unique-word segmentation at construction
                    "nline_split_scan",  # closed-form verdict computed from actions
                    "observe_counters",  # the observed map exists only after the action
                    # round-4 rendered-artifact rows that pay a per-
                    # construction metadata job even after the render
                    # cache: SequenceFile toDF inference, and parquet
                    # footer/partition discovery on non-memoized
                    # rendered dirs (probed individually; the other
                    # round-4 rows are pure and stay under the sweep)
                    "seqfile_filter_percent", "timetravel_nation_versions",
                    "compaction_orders_scan", "zorder_orders_scan",
                    "routed_outputs_scan",
                    "pipeline_web_e2e",  # renders its WARC corpus at construction
                    # index build + availableNow maintenance stream at construction
                    "similarity_pq_incremental",
                    # round-10 eager-by-contract rows: the capstone runs
                    # its JobControl DAG at construction; the streaming
                    # twin runs its two checkpointed stream phases; the
                    # two storage verdict rows render artifacts and
                    # compute their scan/footer metrics
                    "pipeline_pretraining_full", "pipeline_web_streaming",
                    "bloommapfile_point_skip", "lazyoutput_empty_parts",
                    # classifier training loops run at construction
                    "pipeline_quality_classifier", "pipeline_classifier_eval",
                    # shares seqfile_roundtrip's rendered dir + the
                    # sequenceFile toDF inference job
                    "seqfile_as_text_scan",
                    # two checkpointed stream phases run at construction
                    "rangestream_drain",
                    # round-11 eager-by-contract rows: shares
                    # seqfile_roundtrip's rendered dir + sequenceFile
                    # toDF inference; the noop write action runs at
                    # construction
                    "seqfile_as_binary_scan", "nulloutput_noop",
                    # two capped stream-sink phases run at construction
                    "warc_stream_sink_roundtrip",
                    # round-12: renders its TypedBytesWritable
                    # SequenceFile at construction (plus binaryFile
                    # listing on the rendered dir)
                    "typedbytes_roundtrip",
                    # the AutoInputFormat sniff reads each file's
                    # 3-byte head at plan time (the reference's own
                    # per-split algorithm) and the SEQ branch pays the
                    # toDF inference job on the rendered dir
                    "auto_input_scan",
                    # the partition-file workflow IS sample-then-plan:
                    # the reference's InputSampler.writePartitionFile
                    # runs client-side before the job, so the sampler
                    # collect at construction is the contract
                    "inputsampler_totalorder"}
    }
    lazy = [n for n in QUERIES if n not in eager_by_contract]
    # Warm pass: pays the one-time parquet schema-inference jobs that
    # load_table memoizes; the measured pass below must then be pure.
    for name in lazy:
        QUERIES[name](spark, sf_dir)
    sc = spark.sparkContext
    offenders = {}
    for name in lazy:
        group = f"construct-{name}"
        sc.setJobGroup(group, "construction laziness sweep")
        try:
            QUERIES[name](spark, sf_dir)
        finally:
            sc.setJobGroup("", "")
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        if jobs:
            offenders[name] = len(jobs)
    assert not offenders, f"eager constructors: {offenders}"


def test_driver_rotation_invariants():
    """The self-healing driver ordering must (a) never drop a query,
    (b) fill the first 50 slots with exact-oracle queries that have no
    green row in any recorded CORRECTNESS_r*.json, and (c) keep the
    pinned flagship/TPC-H names in front of the budget."""
    from hadoop_3_3_6_spark.plans.queries import (
        ORACLES,
        _DRIVER_HOLDBACK,
        _DRIVER_PRIORITY,
        _driver_verified_names,
    )

    names = list(QUERIES)
    verified = _driver_verified_names()
    # held-back (newly registered) queries deliberately sit BEHIND the
    # rows-only tier; exclude them from the front-slot guarantee
    unverified_oracle = [
        n for n in names
        if n in ORACLES and n not in verified and n not in _DRIVER_HOLDBACK
    ]
    # Only the first min(50, #unverified-with-oracle) slots are guaranteed
    # to be unverified exact-oracle queries; once the backlog shrinks below
    # the driver budget, later slots legally hold verified/no-oracle names.
    top = names[: min(50, len(unverified_oracle))]
    assert all(n in ORACLES and n not in verified for n in top), [
        n for n in top if n not in ORACLES or n in verified
    ]
    for n in _DRIVER_PRIORITY:
        if n in QUERIES and n not in verified:
            assert n in top, f"priority query {n} fell out of the driver budget"


def test_oracle_coverage_is_pinned():
    """Every oracle key maps to a query, and the rows-only remainder is
    exactly the documented set — an oracle silently falling out of the
    registry would otherwise downgrade a query to the weaker rows-only
    driver check without anything failing."""
    from hadoop_3_3_6_spark.plans.queries import ORACLES

    assert set(ORACLES) <= set(QUERIES)
    rows_only = set(QUERIES) - set(ORACLES)
    # similarity_ivf_trained left this set in round 6 (per-iteration
    # decimal-grid quantization made the trained centroids engine-exact,
    # oracle re-derives them via an independent numpy replica), as did
    # tokenizer_bpe_train (its output IS the merge table the apply
    # oracle already re-derives independently — rendered as VALUES).
    # terasort_validate also left in round 6: its verdict row has a
    # closed form (20000 rows, sorted, checksum ok) — the verification
    # work stays Spark-side, the oracle pins the expected verdict.
    assert rows_only == {
        "approx_distinct_suppliers",
        "approx_quantiles_lineitem",
        "similarity_lsh_topk_fast",
        "dedup_minhash_fast",
        "sketch_bloom_prefilter_fast",
    }


def test_funnel_has_no_full_stream_window(spark, sf_dir):
    """The funnel is chained shrinking aggregates — a Window over the
    whole event stream (the naive sessionize-then-scan form) must
    never appear, and events scans prune to the 3 needed columns."""
    plan = plan_of(spark, sf_dir, "funnel_view_click_purchase")
    assert "Window" not in plan
    import re

    for schema in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in schema.split(",")}
        assert cols <= {"user_id", "ts", "event_type"}, cols


def test_merge_upsert_single_join(spark, sf_dir):
    """MERGE applies all three arms in ONE full-outer join over the
    merge key — no second join, no window, no distinct."""
    plan = plan_of(spark, sf_dir, "merge_upsert_orders")
    n_joins = plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count("ShuffledHashJoin")
    assert n_joins == 1, plan[:2000]
    assert "Window" not in plan


def test_skew_profile_single_scan(spark, sf_dir):
    """The corpus total derives from the key counts — profiling must
    scan the input once, not twice."""
    plan = plan_of(spark, sf_dir, "skew_profile_events")
    assert plan.count("Scan parquet") <= 2  # formatted output: tree + detail of ONE scan


def test_quantized_topk_integer_scoring(spark, sf_dir):
    """Quantized similarity scores with bigint folds (scales cancel);
    the embeddings scan appears for probe and corpus sides only."""
    plan = plan_of(spark, sf_dir, "similarity_quantized_topk")
    assert "bigint" in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_join_compare_spread_is_noncoalescible(spark, sf_dir):
    """Round-6 perf fix, pinned: the fuzzy compare's probe side carries
    an EXPLICIT numPartitions repartition (shuffleOrigin
    REPARTITION_BY_NUM — AQE's no-coalesce contract) keyed on the
    VALUE column, not the block key.  Without it, AQE's size-based
    coalescing folds the byte-tiny distinct-(block,value) exchange to
    ~1 partition and runs tens of millions of banded-levenshtein DP
    evaluations on one core (measured sf1: 22.3 s of a 26 s query in a
    tasks=1 stage; with the spread, 1.7 s).  Keying on the block key
    instead would collapse into the adjacent ENSURE_REQUIREMENTS
    exchange and re-expose the stage to coalescing."""
    plan = plan_of(spark, sf_dir, "fuzzy_join_titles")
    spread_lines = [
        l for l in plan.splitlines() if "REPARTITION_BY_NUM" in l
    ]
    assert any("left_title" in l for l in spread_lines), plan


def test_embedding_neardup_pair_spread_is_noncoalescible(spark, sf_dir):
    """Same pin for the near-dup pair join: BOTH sides of the
    cluster_id equi-join are spread with an explicit-numPartitions
    repartition ON cluster_id (here the spread IS the join's own
    exchange, upgraded to the non-coalescible origin), so the
    CPU-bound sequential-fold cosine compare keeps full parallelism
    regardless of how few bytes the (id, vector, cluster_id)
    assignment rows occupy."""
    plan = plan_of(spark, sf_dir, "embedding_neardup")
    cluster_spreads = [
        l
        for l in plan.splitlines()
        if "REPARTITION_BY_NUM" in l and "cluster_id" in l
    ]
    assert len(cluster_spreads) >= 2, plan


def test_fuzzy_join_compares_distinct_values(spark, sf_dir):
    """The fuzzy join's quadratic compare must run over DISTINCT
    (block, value) pairs (distinct_values default): the plan carries
    aggregate (distinct) nodes on BOTH inputs of the levenshtein join,
    and the row-level expansion joins come after.  A silent fallback to
    the row-level pairing would reintroduce quadratic growth in the
    duplication factor (the sf1-spotcheck blowup)."""
    plan = plan_of(spark, sf_dir, "fuzzy_join_titles")
    assert "levenshtein" in plan
    import re

    distincts = re.findall(r"HashAggregate\(keys=\[_blk", plan)
    assert len(distincts) >= 2, plan  # partial+final per side, >= 2 total


def test_pivot_is_two_level_aggregate_no_expand(spark, sf_dir):
    """Pivot with explicit values must compile to the two-level
    aggregate (partial-combined (priority, status) count, then
    pivotfirst assembly on priority) — never an Expand over the scan
    and never a driver-side distinct pass (constructor purity covers
    the latter).  The scan must read only the two pivot columns."""
    plan = plan_of(spark, sf_dir, "pivot_status_matrix")
    assert "pivotfirst" in plan and "Expand" not in plan
    assert plan.count("Exchange hashpartitioning") == 2
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "o_orderstatus",
        "o_orderpriority",
    }


def test_unpivot_expand_rides_above_aggregate(spark, sf_dir):
    """Unpivot (melt) is an Expand — it must multiply the 5-row
    aggregated matrix, not the scan: Expand appears exactly once and
    ABOVE the final aggregate (no exchange between them)."""
    plan = plan_of(spark, sf_dir, "unpivot_status_long")
    assert plan.count("Expand") == 1
    expand_pos = plan.index("Expand")
    first_agg_pos = plan.index("HashAggregate")
    assert first_agg_pos > expand_pos  # top-most agg is BELOW the Expand in tree print
    assert plan.count("Exchange hashpartitioning") == 2


def test_column_profile_both_tiers_have_no_expand(spark, sf_dir):
    """column_profile must never pay Catalyst's Expand (×4N row
    multiplication of the full scan): the DEFAULT tier uses HLL
    approx_count_distinct in one aggregate; the exact tier unions
    column-pruned per-column aggregates (measured 5× faster than the
    single-aggregate exact form the Expand would come from)."""
    from hadoop_3_3_6_spark.operators.counters import column_profile
    from hadoop_3_3_6_spark.plans.queries import load_table

    orders = load_table(spark, "orders", sf_dir)
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    default_plan = (
        column_profile(orders, cols)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in default_plan
    assert "approx_count_distinct" in default_plan
    exact_plan = (
        column_profile(orders, cols, exact=True)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in exact_plan
    assert "count(distinct" in exact_plan
    assert "Union" in exact_plan
    # per-column subplans must be column-pruned to their own column
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", exact_plan)
    assert schemas and all(len(s.split(",")) == 1 for s in schemas), schemas


def test_rendered_corpus_dir_is_cached_per_process():
    """The eager ingestion queries (wav/warc/avro/seqfile) must reuse
    ONE rendered temp dir per (prefix, sf_dir) — a fresh mkdtemp per
    construction (the round-2 behavior) leaked a directory every
    bench double-run and explain call."""
    from hadoop_3_3_6_spark.plans.queries import _RENDER_CACHE, _rendered_dir

    calls = []
    d1 = _rendered_dir("cache_probe_", "/fake/sfX", lambda d: calls.append(d))
    d2 = _rendered_dir("cache_probe_", "/fake/sfX", lambda d: calls.append(d))
    d3 = _rendered_dir("cache_probe_", "/fake/sfY", lambda d: calls.append(d))
    try:
        assert d1 == d2 and len(calls) == 2  # one render per distinct key
        assert d3 != d1
    finally:
        import os
        import shutil

        for key in [("cache_probe_", "/fake/sfX"), ("cache_probe_", "/fake/sfY")]:
            shutil.rmtree(_RENDER_CACHE.pop(key), ignore_errors=True)


def test_guarded_spans_reuse_one_exchange(spark, sf_dir):
    """The max_df-guarded span extraction must share ONE shuffle stage
    between the per-shingle aggregate and the probe join
    (ReusedExchange in the final adaptive plan): the corpus is
    scanned/tokenized/exploded exactly once.  The reuse pin (companion
    max(pos) aggregate + always-true filter) keeps the
    partial-distinct rewrite from mutating the aggregate side's
    exchange subtree — this test is the canary if a Spark upgrade
    changes that planning.  (dedup_span_fraction can't reuse: its
    trailing re-join with the docs table re-aliases one lineage.)"""
    df = QUERIES["dedup_spans"](spark, sf_dir)
    df.collect()  # materialize THIS plan: reuse only shows in the FINAL adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, "plan did not finalize"
    assert "ReusedExchange" in plan, "exchange not reused"


def test_table_diff_digest_has_partial_agg_and_broadcast_pruning(spark, sf_dir):
    """table_diff's scale contract: the per-bucket digests partial-
    aggregate before their shuffle (volume independent of row count),
    and the mismatched-bucket list reaches both tables as a BROADCAST
    semi join — never a shuffled one."""
    plan = plan_of(spark, sf_dir, "table_diff_orders")
    assert "partial_bit_xor" in plan, plan[:2000]
    # both tables pruned via BROADCAST semi joins on the bucket list
    # (>= 2: the optimizer may push the replica's pruning into each
    # union branch, yielding one semi join per branch — still all
    # broadcast, which is the property that matters)
    semi_joins = [l for l in plan.splitlines() if "Join" in l and "LeftSemi" in l]
    assert len(semi_joins) >= 2, semi_joins
    assert all("BroadcastHashJoin" in l for l in semi_joins), semi_joins


def test_bucketed_join_query_elides_exchange(spark, sf_dir):
    """The registered bucketed-join row must run shuffle-free UNDER
    THE JOIN: both sides' bucketing (8 buckets on the join key)
    satisfies the sort-merge join's distribution requirement, so no
    Exchange may feed it — the CompositeInputFormat contract the row
    exists to pin.  At the test sf the optimizer rightly prefers a
    broadcast join (the small side fits), which would bypass the
    property — disable auto-broadcast to force the SMJ path the
    100 TB plan takes."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(spark, sf_dir, "bucketed_join_customers")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_pos = plan.find("SortMergeJoin")
    assert join_pos != -1, plan[:2000]
    # plans print top-down: anything AFTER the join line is its input
    # subtree — no exchange may appear there
    assert "Exchange" not in plan[join_pos:], plan[join_pos : join_pos + 2000]


def test_semantic_contamination_is_linear_broadcast_scan(spark, sf_dir):
    """Semantic eval decontamination must stay a pure linear
    projection: the eval set folds to ONE broadcast row and the corpus
    computes its max cosine via a HOF — no pair shuffle, no equi join,
    no window; the only permitted exchange is spread_for_compute's
    conditional input rebalance."""
    plan = plan_of(spark, sf_dir, "pipeline_contamination_semantic")
    for node in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct", "Window"):
        assert node not in plan, node
    assert plan.count("Exchange hashpartitioning") <= 1


def test_similarity_rank_is_two_phase(spark, sf_dir):
    """VERDICT r7 'weak' fix: every similarity top-k must rank in two
    phases — stage 1 over (probe_id, _salt) so a probe's candidate set
    (the FULL corpus for the brute/quantized/ADC scans) spreads over
    num_salts tasks, stage 2 over probe_id alone ranking only the
    ≤ k·num_salts survivors.  The plan signature is one salted and one
    probe-only hash-partitioning exchange on the ranking path; a
    regression back to a single Window.partitionBy('probe_id') would
    drop the salted exchange and fail here.  (pq/ivf_trained share the
    same _rank_topk code path but pay eager training per construction,
    so the cheap representatives stand for the family.)"""
    import re

    for name in ("similarity_topk", "similarity_quantized_topk", "similarity_ivf_topk"):
        plan = plan_of(spark, sf_dir, name)
        exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        salted = [e for e in exchanges if "_salt" in e and "probe_id" in e]
        probe_only = [e for e in exchanges if "_salt" not in e and "probe_id" in e]
        assert salted, (name, exchanges)
        assert probe_only, (name, exchanges)


def test_topk_per_group_two_phase_shuffles(spark, sf_dir):
    """topk_per_group_salted must rank over (group, salt) first — a
    window partitioned by BOTH columns — then over group alone, i.e.
    exactly two hash-partitioning exchanges for the ranking path."""
    plan = plan_of(spark, sf_dir, "topk_events_per_type")
    assert plan.count("RunningWindowFunction") >= 0  # window nodes exist in some form
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    keyed = ["_salt" in e for e in exchanges]
    assert any(keyed) and not all(keyed), exchanges  # one salted, one group-only


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """The other half of the AQE insurance policy (skew split is
    pinned above): a shuffle whose 32 configured partitions carry
    trivially small data must be coalesced at runtime — at 100 TB the
    same mechanism right-sizes reducer counts per stage instead of
    inheriting one global spark.sql.shuffle.partitions."""
    df = spark.range(100_000).groupBy((F.col("id") % 7).alias("k")).count()
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "AQEShuffleRead coalesced" in plan, plan


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    """Dynamic partition pruning — the 100 TB star-join mechanism
    (prune fact partitions at RUNTIME from the broadcast dim's filter
    results, the analogue of pushing the dim filter into
    FileInputFormat.listStatus): a selectively-filtered dim joined on
    the fact's partition column must inject a dynamicpruning
    subquery into the fact scan's PartitionFilters."""
    import shutil
    import tempfile

    from hadoop_3_3_6_spark.session import load_table

    d = tempfile.mkdtemp(prefix="dpp_")
    try:
        li = load_table(spark, "lineitem", sf_dir)
        li.write.mode("overwrite").partitionBy("l_returnflag").parquet(d)
        fact = spark.read.parquet(d)
        dim = spark.createDataFrame(
            [("A", 1), ("N", 2), ("R", 3)], "flag string, tag int"
        ).filter(F.col("tag") == 1)
        j = fact.join(dim, fact.l_returnflag == dim.flag).groupBy("flag").count()
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:3000]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_driver_rotation_refresh_and_companion_pairing():
    """Round-10 rotation contract additions: (a) _DRIVER_REFRESH names
    whose standing verdict is still at/under their stale_round ride the
    mid tier (inside the ~50-slot budget), and (b) a *_fast/no-oracle
    row and its exact *_verdict twin always occupy ADJACENT slots so
    both land in the same round's CORRECTNESS file."""
    from hadoop_3_3_6_spark.plans.queries import (
        _DRIVER_REFRESH,
        _driver_verified_rounds,
    )

    names = list(QUERIES)
    pos = {n: i for i, n in enumerate(names)}
    rounds = _driver_verified_rounds()
    for n, stale in _DRIVER_REFRESH.items():
        if n in QUERIES and rounds.get(n, 0) <= stale:
            assert pos[n] < 50, f"refresh name {n} outside the driver budget"
    for n in names:
        if n.endswith("_verdict") and n[: -len("_verdict")] in pos:
            base = n[: -len("_verdict")]
            assert abs(pos[n] - pos[base]) == 1, (
                f"companion {n} not adjacent to {base}: {pos[n]} vs {pos[base]}"
            )


def test_pretraining_full_stage_conservation(spark):
    """The capstone chain's accounting invariants, independent of the
    DuckDB oracle (fast structural pin at sf0.001): monotone token
    survival through the cut stages, doc conservation where stages
    only rewrite, exact mirror-count removal at exact dedup, token
    identity between the gopher survivors and the shards read-back,
    and a zero-mismatch shard roundtrip verdict."""
    rows = {
        r["stage"]: (r["docs"], r["tokens"])
        for r in QUERIES["pipeline_pretraining_full"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    from hadoop_3_3_6_spark.session import load_table

    n_docs = load_table(spark, "documents", "/root/testdata/sf0.001").count()
    n_mirrors = (
        load_table(spark, "documents", "/root/testdata/sf0.001")
        .filter("doc_id % 50 = 0")
        .count()
    )
    n_refetches = (
        load_table(spark, "documents", "/root/testdata/sf0.001")
        .filter("doc_id % 70 = 0")
        .count()
    )
    # r12 stage 1: URL dedup sees every fetch record and drops exactly
    # the refetches (same canonical URL as an earlier-dated original,
    # CHANGED body — the pair exact dedup could never catch)
    assert rows["url_dedup"] == (
        n_docs + n_mirrors,                 # surviving fetch records
        n_docs + n_mirrors + n_refetches,   # incoming fetch records
    )
    assert rows["extract"][0] == rows["url_dedup"][0]
    assert rows["extract"][0] == n_docs + n_mirrors
    assert rows["line_dedup"][0] == rows["extract"][0]   # rewrite, not drop
    assert rows["exact_dedup"][0] == n_docs              # mirrors removed exactly
    assert rows["span_dedup"][0] == rows["exact_dedup"][0]
    assert rows["gopher"][0] <= rows["span_dedup"][0]
    # the r11 recipe-completion stages: classifier keep then
    # score-conditioned acceptance, each a pure row cut
    assert rows["classifier"][0] <= rows["gopher"][0]
    assert rows["quality_sample"][0] <= rows["classifier"][0]
    # monotone token survival through every cutting stage
    assert (
        rows["extract"][1]
        >= rows["line_dedup"][1]
        >= rows["span_dedup"][1]
        >= rows["gopher"][1]
        >= rows["classifier"][1]
        >= rows["quality_sample"][1]
    )
    # every sampled token reaches the shards (vocab covers survivors)
    assert rows["tokenize_shards"] == (
        rows["quality_sample"][0],
        rows["quality_sample"][1],
    )
    assert rows["shards_verdict"][0] == 0                # zero roundtrip mismatches
