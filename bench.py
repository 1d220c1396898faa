"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE COMPACT JSON line on
stdout — {"metric", "value", "unit", "sf", "queries": <top-10 slowest>,
"anchors", ...} — sized to survive an output-tail capture (the full
90+-query map overflowed the driver's capture in round 2 and recorded
"parsed": null).  The complete per-query map goes to stderr AND to
BENCH_full.json next to this file.

Each query is forced end-to-end with a NOOP WRITE action (every column
materialized, nothing prunable) after a shared-session warmup (JVM +
parquet footer caches), mirroring how the reference benchmarked full
jobs (MRBench latency / TeraSort throughput; BASELINE.md).

Round-5 methodology fix: the action was count() through round 4, which
UNDER-measures any query whose expensive work is prunable under
count(*) — Catalyst eliminates a global sort entirely (measured 11x on
`sort`), drops aggregate expressions keeping only the grouping (2x on
q1), and removes unique-key outer joins (4.3x on dedup_semantic, whose
whole pair-compare subtree vanished).  noop write forces the full
result.  Cross-round comparisons: r1-r4 numbers are count()-actioned —
compare per-query only where the shapes are count-stable (joins,
explodes), and use anchors.cpu_probe_sec for machine normalization;
the record carries "action": "noop_write" from r5 on.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per engine capability pillar
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_volume",
    "q6_revenue_forecast",
    "wordcount",
    "grep",
    "join_inner",
    "join_outer",
    "secondarysort",
    "window_topn_per_customer",
    "window_running_sum",
    "sessionize_events",
    "sort",
    "terasort_validate",
    "dedup_exact",
    "dedup_minhash",
    "similarity_topk",
    "text_token_counts",
    "text_fingerprint",
    "streaming_tumbling_counts",
    # full TPC-H sweep (q1/q3/q5/q6 above): per-query regression axis
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_by_status",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_part_supplier_stats",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive",
    "q20_excess_share_suppliers",
    "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    "rollup_orders",
    "text_tfidf_topk",
    "similarity_lsh_topk",
    "udaf_weighted_price",
    "asof_join_events_orders",
    "interval_join_shipments",
    "similarity_ivf_topk",
    "pipeline_hash_split",
    "pipeline_global_shuffle",
    "text_boilerplate",
    "pipeline_contamination",
    # round-2 additions
    "dedup_incremental",
    "multimodal_decode",
    "avro_roundtrip",
    "text_pii_redact",
    "text_repetition_topgram",
    "dedup_span_fraction",
    "dedup_spans",
    "multimodal_audio",
    "multimodal_video",
    "pipeline_pack_sequences",
    "text_lm_score",
    "text_normalize",
    "text_langid_multi",
    "streaming_session_dynamic",
    "asof_join_forward",
    "asof_join_nearest",
    "pivot_orders",
    "variant_events",
    "storage_file_profile",
    "pipeline_chunk_documents",
    "pipeline_temperature_mix",
    "pipeline_pretraining_e2e",
    "dedup_semantic",
    "grouping_sets_orders",
    "pivot_status_matrix",
    "unpivot_status_long",
    "percentiles_lineitem",
    "merge_upsert_orders",
    "skew_profile_events",
    "text_vocab",
    "warc_source_scan",
    "text_url_domains",
    "similarity_quantized_topk",
    "text_lm_bigram",
    "approx_topk_event_types",
    "scd2_customer_status",
    "funnel_view_click_purchase",
    "retention_cohorts",
    "audit_orders",
    "window_running_distinct",
    "histogram_order_values",
    "pipeline_token_budget",
    "quantile_bins_lineitem",
    # round-3 additions
    "similarity_lsh_topk_fast",  # scale-default LSH path (portable mode keeps the oracle)
    "dedup_clusters",
    "pipeline_dedup_keep",
    "fuzzy_join_titles",
    "multimodal_container_meta",
    "seqfile_roundtrip",
    "dedup_minhash_fast",  # scale-default MinHash path (portable mode keeps the oracle)
    "sketch_cms_custkey",
    "sketch_bloom_prefilter",
    "sketch_hll_vocab",
    "pipeline_sample_per_group",
    "topk_events_per_type",
    "table_diff_orders",
    "streaming_stream_stream_left_join",
    "sketch_bloom_prefilter_fast",  # scale-default xxhash64 path (portable keeps the oracle)
    "jobcontrol_word_pipeline",
    "profile_orders_columns",
    "timeseries_gapfill_hourly",
    "paths_user_journeys",
    "timeseries_interpolate_hourly",
    # round-5 additions
    "embedding_neardup",  # now the cluster-blocked form
    "tokenizer_bpe_apply",
    # round-6: trained IVF gained an exact oracle (quantized training);
    # benched so the distributed-training loop keeps a regression axis
    "similarity_ivf_trained",
    # round-7: the MinHash verify stage (candidates re-scored by the
    # signature Jaccard estimate) — one sig aggregate, three consumers
    "dedup_minhash_verified",
    # round-7: PQ/ADC ANN (trained codebooks + table-lookup scoring)
    # and DSIR importance resampling (hashed-ngram LM ratio top-k)
    "similarity_pq_topk",
    "pipeline_importance_resample",
    # round-7: cluster-balanced prototype pruning (linear sibling of
    # dedup_semantic — assignment + one window, no pair join)
    "pipeline_diversity_sample",
    # round-8: composed IVF-PQ (list-pruned ADC — per-probe candidates
    # O(N*nprobe/K) instead of the full-scan pq_topk's O(N)) and
    # semantic eval decontamination (linear broadcast-matrix scan)
    "similarity_ivf_pq_topk",
    "pipeline_contamination_semantic",
    # round-8: CCNet head/middle/tail perplexity partition (integer
    # micro-nat LM scores + broadcast tertile thresholds) and the OPQ
    # rotated-PQ ANN tier (cached training; rotate+encode+ADC path)
    "pipeline_perplexity_buckets",
    "similarity_opq_topk",
    # round-8 (cont.): the Gopher rule + repetition filters (per-row
    # HOF projections), residual and refined IVF-PQ (FAISS by_residual
    # and IndexRefineFlat), perceptual-hash image dedup (codec +
    # banded Hamming join), Megatron-style token-shard roundtrip
    "pipeline_gopher_rules",
    "text_repetition_gopher",
    "similarity_ivf_pq_residual_topk",
    "similarity_ivf_pq_refined_topk",
    "multimodal_phash_dedup",
    "token_shards_roundtrip",
    # round-8 (cont.): the unigram-LM tokenizer (train cached per
    # process; distributed word-count pass + broadcast-join apply)
    "tokenizer_unigram_apply",
    # round-8 (cont.): the composed quality funnel (3 filter verdicts
    # joined on doc_id + digest-window dedup) and incremental phash
    "pipeline_quality_funnel",
    "multimodal_phash_incremental",
    # round-9: HTML -> text extraction (Arrow-batched markup stripping)
    # and the WARC -> extract -> Gopher-rules Common-Crawl chain
    "text_html_extract",
    "pipeline_web_e2e",
    # round-9 (cont.): streaming PQ-index maintenance verdict, the
    # apply-the-cut span-dedup corpus rewrite, and CCNet-style
    # corpus-wide duplicated-line removal
    "similarity_pq_incremental",
    "dedup_spans_apply",
    "dedup_lines_apply",
    # round-10: the capstone pretraining chain (JobControl DAG across
    # materialized stage tables; min-of-2 times the accounting plan,
    # the render is cached per process), its streaming twin, and the
    # two storage verdict rows upgraded from test-only coverage
    "pipeline_pretraining_full",
    "pipeline_web_streaming",
    "bloommapfile_point_skip",
    "lazyoutput_empty_parts",
    # round-10: the CCNet/LLaMA-style quality classifier (training is
    # cached per process; the benched plan is the shuffle-free scoring
    # projection)
    "pipeline_quality_classifier",
    "pipeline_classifier_eval",
    "keyfield_partitioner_colocation",
    "seqfile_as_text_scan",
    "rangestream_drain",
    # round-11 newcomers: URL-level dedup (regex canonicalization +
    # one canonical-keyed exchange), the raw-Writable-bytes scan, the
    # noop-sink verdict (the scan is the cost; the write discards),
    # and the stream-sink roundtrip (both stream phases are cached per
    # process; the benched plan is the batch WARC read-back verdict)
    "pipeline_url_dedup",
    "seqfile_as_binary_scan",
    "nulloutput_noop",
    "warc_stream_sink_roundtrip",
    # round-12 newcomers: the faithful positional percent filter
    # (three single-split readers + per-reader counter), the
    # classifier reliability diagram (training cached per process; the
    # benched plan is the scoring projection + one <=10-group
    # aggregate), and the byte-exact gensort generator's verdict row
    # (distributed 128-bit LCG generation + one aggregate)
    "seqfile_filter_percent_positional",
    "pipeline_classifier_calibration",
    "teragen_gensort_validate",
    # round-12: the reference-exact partitioner family (Java hashCode
    # algebra as aggregate-HOF Column expressions — the benched plans
    # are scan-fused projections + one small census aggregate each)
    "hash_partitioner_text_assignment",
    "rehash_partitioner_spread",
    "binary_partitioner_assignment",
    "keyfield_partitioner_assignment",
    # round-12: typed-bytes wire roundtrip (frame encode -> SEQ v6 of
    # TypedBytesWritable -> raw never-deserialize read -> frame decode;
    # the codec stages are the cost and the semantics)
    "typedbytes_roundtrip",
    # round-12: the -io typedbytes binary pipe (child process per
    # partition; frame codec both directions + the reduce)
    "pipe_typedbytes_wordcount",
    # round-12: AutoInputFormat magic-byte dispatch over a mixed
    # SEQ/text/empty/short-header directory (plan-time 3-byte sniff,
    # then one bulk scan per detected format)
    "auto_input_scan",
    # round-12: InputSampler -> writePartitionFile ->
    # TotalOrderPartitioner end-to-end (global-counter interval
    # sampler, float32 boundary selection, binarySearch+1 assignment)
    "inputsampler_totalorder",
]


# Queries per SparkSession "chunk".  One 114-query session accumulates
# driver-JVM state (broadcast blocks awaiting GC-driven ContextCleaner
# sweeps, listener/AppStatusStore history, plan caches) that slowed the
# round-3 run uniformly ~1.6x vs round 2 — worst at the END of the run
# (the I/O anchors hit 5-9x).  A fresh session per chunk drops that
# state while the shared JVM keeps JIT-compiled code warm; measured to
# restore round-2-level timings on the same machine.
CHUNK = int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", "40"))


def _fresh_session(app_name: str, warm_dir: str | None = None, ui: bool = False):
    from hadoop_3_3_6_spark.session import get_spark

    if ui:
        os.environ["SPARK_GRAFT_UI"] = "true"
    try:
        spark = get_spark(app_name)
    finally:
        os.environ.pop("SPARK_GRAFT_UI", None)
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: touch every table once (footer/schema caches, JIT)
    from hadoop_3_3_6_spark.session import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, t, warm_dir or SF_DIR).count()
    return spark


def _spill_totals(spark) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over every
    completed stage of the given UI-enabled session, via the same REST
    surface the stage audit reads.  (0, 0) when the UI is off or the
    REST call fails — attempts then record spill deltas of 0 with the
    probe row still carrying disk/cpu attribution."""
    import urllib.request

    sc = spark.sparkContext
    if not sc.uiWebUrl:
        return (0, 0)
    try:
        with urllib.request.urlopen(
            f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages?status=complete",
            timeout=10,
        ) as r:
            stages = json.load(r)
        return (
            sum(s.get("memoryBytesSpilled") or 0 for s in stages),
            sum(s.get("diskBytesSpilled") or 0 for s in stages),
        )
    except Exception:
        return (0, 0)


def _cpu_probe_sec(n: int = 300_000) -> float:
    """The fixed driver-side machine-speed probe (chained sha256)."""
    import hashlib

    t0 = time.perf_counter()
    h = b""
    for i in range(n):
        h = hashlib.sha256(h + str(i).encode()).digest()
    return round(time.perf_counter() - t0, 3)


_JVM_PID: int | None = None


def _jvm_cpu_sec(spark) -> float | None:
    """Cumulative CPU seconds (utime+stime) of the Spark JVM process —
    in local[N] mode the driver JVM hosts the executors too, so deltas
    around a query bound its TOTAL compute.  Wall time that a flat CPU
    delta can't explain is WAIT (disk, page cache, hypervisor) — the
    per-query split VERDICT r11 task 1 asks for, so a degraded sweep
    session self-attributes instead of needing a narrative."""
    global _JVM_PID
    try:
        if _JVM_PID is None or not os.path.exists(f"/proc/{_JVM_PID}/stat"):
            _JVM_PID = int(
                spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid()
            )
        with open(f"/proc/{_JVM_PID}/stat") as f:
            rest = f.read().rsplit(")", 1)[1].split()
        tck = os.sysconf("SC_CLK_TCK")
        return (int(rest[11]) + int(rest[12])) / tck
    except Exception:
        return None


def _jvm_gc_stats(spark) -> tuple[float | None, float | None]:
    """(cumulative GC seconds, old-gen used GB) of the Spark JVM via
    the management MXBeans (VERDICT r11 task 5: make the 200M anchor's
    'JVM-internal state' attribution positive instead of by
    elimination).  (None, None) when the gateway or beans are
    unavailable — attempt rows then record gc/heap as null."""
    try:
        mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
        gc_ms = sum(b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans())
        # None (not 0.0) when no generational pool exists (e.g. ZGC's
        # 'ZHeap') — a fabricated 0 would read as an empty old gen
        old_used = None
        for p in mf.getMemoryPoolMXBeans():
            if "Old Gen" in p.getName() or "Tenured" in p.getName():
                old_used = p.getUsage().getUsed()
        return (
            round(gc_ms / 1000.0, 2),
            None if old_used is None else round(old_used / 2**30, 2),
        )
    except Exception:
        return None, None


def _session_health(pre: dict, post: dict, vs_prev: dict) -> dict:
    """Mechanical health verdict for the full sf0.1 sweep (VERDICT r11
    task 1 — the r11 end-of-round session posted median 1.40 with flat
    probes and every flag reverting, and the attribution lived in
    commit prose; this makes it a recorded verdict downstream vs_prev
    readings must cite).  Rule, in order:

    - ``degraded`` when a probe catches the resource in the act:
      either bracketing disk probe below the anchor floor, the
      in-session CPU probe drifting >20% pre→post, the disk probe
      falling >2x across the sweep, or (when the snapshot carries
      query_cpu_sec) wall inflating >1.25x while JVM CPU stays flat —
      the wait-dominated regime the r11 probe suite could not see.
    - ``unattributed`` when no probe moved but the cpu-normalized
      median vs the committed snapshot still exceeds 1.25 AND the
      wall-vs-cpu split can't vouch for the session: whatever degraded
      it is outside the probe suite; the sweep's absolute numbers are
      not representative and vs_prev must not be read as an engine
      regression (nor as proof there is none — the per-query flags
      and flag_recheck reverts are the evidence tier that still
      works, being median-relative).
    - ``healthy`` otherwise — including the med>1.25 case where the
      cpu median ratio TRACKS the wall ratio (>= 1.1): the session is
      fine and the slowdown is positively engine-attributed, so
      vs_prev is a like-for-like comparison showing a real delta.
    """
    reasons = []
    for tag, p in (("pre", pre), ("post", post)):
        d = p.get("disk_probe_mb_s")
        if d is not None and d < DISK_PROBE_FLOOR_MB_S:
            reasons.append(
                f"{tag}-sweep disk probe {d} MB/s < {DISK_PROBE_FLOOR_MB_S} floor"
            )
    c0, c1 = pre.get("cpu_probe_sec"), post.get("cpu_probe_sec")
    if c0 and c1 and max(c0, c1) / min(c0, c1) > 1.2:
        reasons.append(f"cpu probe drifted {c0} -> {c1} s across the sweep")
    d0, d1 = pre.get("disk_probe_mb_s"), post.get("disk_probe_mb_s")
    if d0 and d1 and d0 / max(d1, 1e-9) > 2.0:
        reasons.append(f"disk probe fell {d0} -> {d1} MB/s across the sweep")
    split = vs_prev.get("cpu_split") or {}
    if (
        split.get("wall_median_ratio")
        and split.get("cpu_median_ratio")
        and split["wall_median_ratio"] > 1.25
        and split["cpu_median_ratio"] < 1.1
    ):
        reasons.append(
            f"wait-dominated: wall median ratio {split['wall_median_ratio']} vs "
            f"JVM-cpu median ratio {split['cpu_median_ratio']} — added time is "
            "wait, not compute"
        )
    med = vs_prev.get("median_ratio")
    probe_drift_note = None
    drift_substituted = False
    if vs_prev.get("cpu_probe_drift") and split.get("wall_median_ratio"):
        # r13: when the machine-speed probe itself drifted >1.5×
        # between snapshots, the normalized median measures the probe,
        # not the engine (the r13 final sweep read 2.05 normalized vs
        # 1.07 raw after the probe halved between rounds) — judge the
        # session on the RAW wall median instead, and record the
        # substitution as an informational note (NOT a degraded
        # trigger: per-query flags are median-relative and unaffected).
        probe_drift_note = (
            f"cpu probe drifted {vs_prev.get('prev_cpu_probe_sec')} -> "
            f"{vs_prev.get('cpu_probe_sec')} s ACROSS SNAPSHOTS: "
            f"normalized median_ratio {med} is a normalization artifact; "
            f"session judged on raw wall median "
            f"{split['wall_median_ratio']} instead"
        )
        med = split["wall_median_ratio"]
        drift_substituted = True
    if reasons:
        verdict = "degraded"
    elif med is not None and med > 1.25:
        if drift_substituted:
            # r14 (ADVICE): probe drift + a raw-median regression
            # COINCIDING is ambiguous — if the machine genuinely
            # changed speed between rounds, raw wall (with cpu
            # tracking it) would mislabel an environment change as a
            # "REAL engine delta"; the normalized ratio would have
            # corrected for it but is itself untrustworthy under
            # drift.  Don't assert attribution either way: the
            # median-relative per-query flags and their fresh-session
            # rechecks are the evidence tier that still works.
            verdict = "unattributed"
            reasons.append(
                f"raw wall median {med} regressed WHILE the cpu probe "
                "drifted across snapshots: cannot separate a machine-"
                "speed change from an engine delta — corroborate via "
                "per-query flags and flag_recheck, not this median"
            )
        elif split.get("cpu_median_ratio") and split["cpu_median_ratio"] >= 1.1:
            # cpu TRACKED wall: the session is fine and the slowdown is
            # positively engine-attributed — the one med>1.25 case
            # where vs_prev IS a like-for-like comparison (round-12
            # review: the original rule labeled this 'unattributed',
            # masking exactly the regression class the split exists to
            # expose)
            verdict = "healthy"
            reasons.append(
                f"median_ratio {med} with cpu tracking wall "
                f"(cpu_median_ratio {split['cpu_median_ratio']}): session "
                "healthy — read vs_prev as a REAL engine delta"
            )
        else:
            verdict = "unattributed"
            reasons.append(
                f"median_ratio {med} with flat pre/post probes: the degraded "
                "resource is outside the probe suite; do not cite this sweep's "
                "vs_prev as an engine delta in either direction"
            )
    else:
        verdict = "healthy"
    if probe_drift_note:
        reasons.append(probe_drift_note)
    return {
        "verdict": verdict,
        "reasons": reasons,
        "probe_pre_sweep": pre,
        "probe_post_sweep": post,
    }


def _stage_audit(spark, min_stage_sec: float = 3.0, min_per_task_sec: float = 1.0) -> dict:
    """Stage-parallelism audit over everything the given UI-enabled
    session has run (the round-6 detector for the AQE-coalesce hazard
    class, SCALE.md: a CPU-bound exchange that is tiny in BYTES gets
    folded to ~1 task and serializes a 32-core stage).  Flags completed
    stages with executorRunTime > ``min_stage_sec`` spread over fewer
    than half the cores AND > ``min_per_task_sec`` per task — the
    per-task floor keeps sub-second AQE-coalesced aggregates (accepted
    residuals whose exchanges grow with corpus bytes) out of the flag
    list, exactly the round-6 triage rule.  Empty ``flagged`` = clean."""
    import urllib.request

    sc = spark.sparkContext
    base = sc.uiWebUrl
    if not base:
        return {"skipped": "ui disabled"}
    cores = sc.defaultParallelism
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{sc.applicationId}/stages?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
    except Exception as e:
        return {"skipped": f"rest unavailable: {e}"}
    flagged = []
    for s in stages:
        run_sec = (s.get("executorRunTime") or 0) / 1000.0
        tasks = s.get("numCompleteTasks") or 0
        per_task = run_sec / max(tasks, 1)
        if run_sec > min_stage_sec and tasks < cores / 2 and per_task > min_per_task_sec:
            flagged.append(
                {
                    "stage": s.get("stageId"),
                    "name": (s.get("name") or "").split("\n")[0][:100],
                    "run_sec": round(run_sec, 1),
                    "tasks": tasks,
                    "per_task_sec": round(per_task, 1),
                }
            )
    return {"n_stages": len(stages), "cores": cores, "flagged": flagged}


def _disk_probe_mb_s() -> float | None:
    """Disk-speed index: sequential write of 256 MB through the same
    real filesystem persistent-data anchors use (/tmp — deliberately
    NOT the tmpfs shuffle scratch).  The sandbox disk is
    BURST-THROTTLED (measured 399 -> 9 MB/s within one round), so
    spill/write-regime anchors swing with disk state even when the
    CPU probe is flat — r7 recorded the same 200M terasort code at
    159.6 s (healthy) and 338.7 s (probe 14.6 MB/s).  Run BEFORE the
    big anchor to gate it, and recorded in anchors for attribution."""
    import tempfile

    try:
        blk = b"\xa5" * (8 * 1024 * 1024)
        with tempfile.NamedTemporaryFile(dir="/tmp", suffix=".diskprobe") as tf:
            t0 = time.perf_counter()
            for _ in range(32):
                tf.write(blk)
            tf.flush()
            os.fsync(tf.fileno())
            wrote = time.perf_counter() - t0
        return round(256.0 / max(wrote, 1e-9), 1)
    except Exception as e:  # pragma: no cover — probe must never fail the bench
        print(f"# disk probe skipped: {e}", file=sys.stderr)
        return None


# Below this sequential-write floor the machine is in the throttled
# regime where the big anchor measures the hypervisor's IO budget, not
# the engine (VERDICT r7 "What's wrong #3"); the anchor is skipped and
# the best prior healthy session stands, with its probe, in-row.
DISK_PROBE_FLOOR_MB_S = float(os.environ.get("SPARK_GRAFT_DISK_FLOOR_MB_S", "50"))


def _terasort_200m_sessions(current_sec: float | None, current_probe: float | None) -> list[dict]:
    """Every recorded 200M-anchor measurement with its session's disk
    probe attached — committed bench_baselines snapshots plus this
    session — so the anchor row carries its own attribution evidence
    (min-of-sessions with probes, VERDICT r7 task 3)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    sessions = []
    for snap in sorted(glob.glob(os.path.join(here, "bench_baselines", "BENCH_full_r*.json"))):
        try:
            with open(snap) as f:
                a = json.load(f).get("anchors", {})
        except (OSError, ValueError):
            continue
        if a.get("terasort_200m_sec"):
            sessions.append(
                {
                    "src": os.path.basename(snap),
                    "sec": a["terasort_200m_sec"],
                    "gb_per_node_min": round(20.0 / (a["terasort_200m_sec"] / 60.0), 2),
                    "disk_probe_mb_s": a.get("disk_probe_mb_s"),
                }
            )
    if current_sec:
        sessions.append(
            {
                "src": "this_session",
                "sec": current_sec,
                "gb_per_node_min": round(20.0 / (current_sec / 60.0), 2),
                "disk_probe_mb_s": current_probe,
            }
        )
    return sessions


def _min_of(reps: int, run) -> float:
    """Best of ``reps`` timed executions of ``run()`` — damps
    scheduler/GC noise the same way for queries and anchors."""
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _sweep_stale_local_dirs(max_age_s: float = 6 * 3600) -> None:
    """Shuffle scratch lives on RAM-backed tmpfs (/dev/shm — see
    session.spark_local_dir); a KILLED run skips Spark's shutdown hook
    and can orphan a 20 GB spill tree that then eats real memory for
    the rest of the machine's life.  Sweep subtrees old enough that no
    live session can own them.

    Safety contract (round-7 ADVICE, all three items): (1) the base is
    resolved by the SAME helper get_spark uses, so the sweep can never
    target a directory Spark doesn't write to; (2) only entries that
    MATCH Spark's scratch naming (blockmgr-<uuid> / spark-<uuid>) are
    ever candidates — the base may be a shared path like /tmp (the
    no-/dev/shm fallback), where an unfiltered rmtree would take the
    warehouse and testdata caches with it (and the prefix alone is not
    enough: /tmp/spark-graft-warehouse starts with 'spark-' — the
    full-uuid match is what excludes it); (3) staleness is the MAX
    mtime over the entry's whole tree, not the top directory's — a
    directory's mtime only moves when its DIRECT children change, and
    Spark writes shuffle blocks into nested hash-bucket subdirs, so a
    legitimately live >6h session's blockmgr dir looks stale at the
    top level (deleting it mid-run = shuffle fetch failures)."""
    import re
    import shutil
    import time as _t

    from hadoop_3_3_6_spark.session import spark_local_dir

    scratch_re = re.compile(
        r"^(blockmgr|spark)-[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    )
    base = spark_local_dir()
    try:
        entries = os.listdir(base)
    except OSError:
        return  # base absent or unreadable — nothing to sweep
    now = _t.time()
    for entry in entries:
        if not scratch_re.match(entry):
            continue
        p = os.path.join(base, entry)
        try:
            newest = os.path.getmtime(p)
            live = newest > now - max_age_s
            for root, dirs, files in os.walk(p):
                if live:
                    break  # one fresh file already proves the tree live
                for n in dirs + files:
                    try:
                        newest = max(newest, os.path.getmtime(os.path.join(root, n)))
                    except OSError:
                        pass  # raced with a concurrent cleanup
                    if newest > now - max_age_s:
                        live = True
                        break
        except OSError:
            continue
        if now - newest > max_age_s:
            shutil.rmtree(p, ignore_errors=True)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hadoop_3_3_6_spark.plans.queries import QUERIES
    from hadoop_3_3_6_spark.session import load_table

    _sweep_stale_local_dirs()
    # bracketing probes: the sweep's health verdict needs the machine
    # state AT ENTRY and AT EXIT, not one probe measured after the
    # anchors (VERDICT r11 task 1)
    probe_pre_sweep = {
        "cpu_probe_sec": _cpu_probe_sec(),
        "disk_probe_mb_s": _disk_probe_mb_s(),
    }
    timings: dict[str, float] = {}
    result_rows: dict[str, int] = {}
    query_cpu_sec: dict[str, float | None] = {}
    chunks = [HEADLINE[i : i + CHUNK] for i in range(0, len(HEADLINE), CHUNK)]
    for ci, chunk in enumerate(chunks):
        spark = _fresh_session(f"bench-chunk{ci}")
        for name in chunk:
            fn = QUERIES[name]
            # min-of-2 with a JVM-CPU delta per rep: the cpu second
            # column is what separates "ran slower" (cpu up) from
            # "waited longer" (cpu flat) in the session-health verdict
            best = best_cpu = None
            for _ in range(2):
                c0 = _jvm_cpu_sec(spark)
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                c1 = _jvm_cpu_sec(spark)
                if best is None or dt < best:
                    best = dt
                    best_cpu = None if c0 is None or c1 is None else c1 - c0
            timings[name] = round(best, 3)
            query_cpu_sec[name] = round(best_cpu, 3) if best_cpu is not None else None
            result_rows[name] = fn(spark, SF_DIR).count()  # untimed, for rows map
            print(f"# {name}: {timings[name]:.3f}s ({result_rows[name]} rows)", file=sys.stderr)
        spark.stop()
    probe_post_sweep = {
        "cpu_probe_sec": _cpu_probe_sec(),
        "disk_probe_mb_s": _disk_probe_mb_s(),
    }

    # anchors in their own fresh session, min-of-N like the queries.
    # The BIG anchor runs FIRST: its disk gate must read the session's
    # ENTRY state — through round 8 it probed after dfsio + the 2M/20M
    # teragen reps had already written ~12 GB, so on burst-credit
    # sandboxes the probe measured the bench's own drain and skipped a
    # healthy machine (round-9 finding: a session that probed 570 MB/s
    # at start read 31 MB/s at the old gate position).
    # UI on: the per-attempt spill deltas of the 200M anchor read the
    # same REST stage metrics the sf1 stage audit uses
    spark = _fresh_session("bench-anchors", ui=True)

    from hadoop_3_3_6_spark.sources.terasort import terasort_gen

    terasort_200m_sec = None
    terasort_200m_shuffle_parts = None
    terasort_200m_skipped = None
    terasort_200m_throttled = None
    terasort_200m_attempts: list[dict] = []
    # probe the disk BEFORE deciding to run the big anchor: in the
    # throttled regime the measurement is the hypervisor's IO budget,
    # not the engine (VERDICT r7 "What's wrong #3").  A below-floor
    # first reading gets a bounded settle-retry (2 × 60 s): a drained
    # burst bucket refills on idle, and one extra minute is cheap next
    # to publishing no anchor at all.
    # a run with the big anchor disabled skips the probe entirely —
    # its write/read IO would be paid only to be ignored (r9 ADVICE)
    big_anchor_on = os.environ.get("SPARK_GRAFT_BIG_ANCHOR", "1") != "0"
    disk_probe_mb_s = _disk_probe_mb_s() if big_anchor_on else None
    if big_anchor_on:
        for _retry in range(2):
            if disk_probe_mb_s is not None and disk_probe_mb_s >= DISK_PROBE_FLOOR_MB_S:
                break
            print(
                f"# big-anchor gate: disk_probe {disk_probe_mb_s} MB/s below "
                f"{DISK_PROBE_FLOOR_MB_S} floor; settling 60s (retry {_retry + 1}/2)",
                file=sys.stderr,
            )
            time.sleep(60)
            disk_probe_mb_s = _disk_probe_mb_s()
    if not big_anchor_on:
        pass
    elif disk_probe_mb_s is None or disk_probe_mb_s < DISK_PROBE_FLOOR_MB_S:
        # None = the probe itself failed (disk full, permissions): the
        # disk state is UNKNOWN, and an unattributable anchor is exactly
        # what the gate exists to prevent — skip, don't run
        terasort_200m_skipped = (
            f"disk_probe {disk_probe_mb_s} MB/s "
            + ("(probe failed - disk state unknown)" if disk_probe_mb_s is None
               else f"< {DISK_PROBE_FLOOR_MB_S} floor (burst-throttled session)")
            + "; best prior healthy session stands in terasort_200m_sessions"
        )
        print(f"# terasort_200m_records SKIPPED: {terasort_200m_skipped}", file=sys.stderr)
        # Two consecutive sessions skipped on throttle left the headline
        # row aging silently (VERDICT r9 task 5): when the probe is a
        # known number (not a failed probe) the anchor now ALSO runs
        # under throttle and publishes a CLEARLY-LABELED normalized
        # estimate next to the skip record — raw GB/node/min scaled by
        # (floor / probe), a conservative basis since the floor is the
        # SLOWEST disk the healthy regime admits.  The throttled raw
        # number never enters terasort_200m_sessions (min-of-sessions
        # stays healthy-only).  The 15 MB/s lower bound keeps a
        # pathologically starved disk from stalling the whole bench.
        if disk_probe_mb_s is not None and disk_probe_mb_s >= 15.0:
            from hadoop_3_3_6_spark.session import sized_shuffle_partitions

            prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
            parts = sized_shuffle_partitions(spark, 200_000_000 * 100)
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            try:
                t0 = time.perf_counter()
                terasort_gen(spark, 200_000_000, partitions=640).write.mode(
                    "overwrite"
                ).format("noop").save()
                raw_sec = round(time.perf_counter() - t0, 1)
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
            raw_gbnm = round(20.0 / (raw_sec / 60.0), 2)
            terasort_200m_throttled = {
                "raw_sec": raw_sec,
                "raw_gb_per_node_min": raw_gbnm,
                "disk_probe_mb_s": disk_probe_mb_s,
                "estimate_gb_per_node_min": round(
                    raw_gbnm * (DISK_PROBE_FLOOR_MB_S / disk_probe_mb_s), 2
                ),
                "estimate_basis": (
                    f"ESTIMATE: raw x (floor {DISK_PROBE_FLOOR_MB_S} / probe "
                    f"{disk_probe_mb_s}); throttled session, excluded from "
                    "terasort_200m_sessions"
                ),
            }
            print(
                f"# terasort_200m_throttled: {raw_sec:.1f}s raw "
                f"({raw_gbnm} GB/node/min; estimate "
                f"{terasort_200m_throttled['estimate_gb_per_node_min']})",
                file=sys.stderr,
            )
    else:
        from hadoop_3_3_6_spark.session import sized_shuffle_partitions

        prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
        terasort_200m_shuffle_parts = sized_shuffle_partitions(spark, 200_000_000 * 100)
        spark.conf.set("spark.sql.shuffle.partitions", str(terasort_200m_shuffle_parts))
        # min-of-3 WITHIN one session, each attempt carrying its own
        # disk/cpu probes and spill deltas (VERDICT r10 task 2: three
        # healthy sessions spanned 49.5-111.4 s with the slowest on the
        # fastest disk — per-attempt attribution is the only way to
        # separate machine drift from a lucky draw).  The headline
        # contract is unchanged: terasort_200m_sec = min of attempts,
        # feeding the same min-of-sessions table; the attempts list and
        # the in-session median travel beside it as evidence.
        reps_200m = int(os.environ.get("SPARK_GRAFT_200M_REPS", "3"))
        try:
            for _att in range(max(reps_200m, 1)):
                att_disk = disk_probe_mb_s if _att == 0 else _disk_probe_mb_s()
                att_cpu = _cpu_probe_sec()
                spill0 = _spill_totals(spark)
                # positive JVM-internal attribution (VERDICT r11 task
                # 5): per-attempt GC seconds and old-gen occupancy —
                # r11 blamed the 76→102 s in-session spread on
                # "JVM-internal state" by elimination (flat probes,
                # zero spill); these fields let the ordering be checked
                # against GC directly
                gc0, old0 = _jvm_gc_stats(spark)
                t0 = time.perf_counter()
                terasort_gen(spark, 200_000_000, partitions=640).write.mode("overwrite").format("noop").save()
                sec = round(time.perf_counter() - t0, 1)
                gc1, old1 = _jvm_gc_stats(spark)
                spill1 = _spill_totals(spark)
                terasort_200m_attempts.append({
                    "sec": sec,
                    "disk_probe_mb_s": att_disk,
                    "cpu_probe_sec": att_cpu,
                    "mem_spill_gb": round((spill1[0] - spill0[0]) / 2**30, 2),
                    "disk_spill_gb": round((spill1[1] - spill0[1]) / 2**30, 2),
                    "gc_sec": (
                        round(gc1 - gc0, 2) if gc0 is not None and gc1 is not None else None
                    ),
                    "old_gen_start_gb": old0,
                    "old_gen_end_gb": old1,
                })
                print(
                    f"# terasort_200m attempt {_att + 1}/{reps_200m}: {sec:.1f}s"
                    f" (disk {att_disk} MB/s, cpu {att_cpu}s,"
                    f" spill {terasort_200m_attempts[-1]['mem_spill_gb']}/"
                    f"{terasort_200m_attempts[-1]['disk_spill_gb']} GB,"
                    f" gc {terasort_200m_attempts[-1]['gc_sec']}s,"
                    f" old-gen {old0}->{old1} GB)",
                    file=sys.stderr,
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
        terasort_200m_sec = min(a["sec"] for a in terasort_200m_attempts)
        print(
            f"# terasort_200m_records: {terasort_200m_sec:.1f}s min-of-{len(terasort_200m_attempts)}"
            f" (shuffle partitions {terasort_200m_shuffle_parts},"
            f" entry disk probe {disk_probe_mb_s} MB/s)",
            file=sys.stderr,
        )

    # MRBench analogue (BASELINE.md): avg latency of a minimal job —
    # the scheduler round-trip floor, averaged over 5 runs.
    lat0 = time.perf_counter()
    runs = 5
    for _ in range(runs):
        spark.range(1).count()
    timings["mrbench_identity_latency"] = round((time.perf_counter() - lat0) / runs, 3)

    # TestDFSIO analogue (BASELINE.md third suite): sequential write
    # then full read-back of the fact table through the storage layer
    # (snappy parquet), the reference's -write/-read variants.
    import shutil
    import tempfile

    dfsio_dir = tempfile.mkdtemp(prefix="dfsio_")
    try:
        li = load_table(spark, "lineitem", SF_DIR)
        timings["dfsio_write"] = round(_min_of(3, lambda: li.write.mode("overwrite").parquet(dfsio_dir + "/out")), 3)
        timings["dfsio_read"] = round(
            _min_of(3, lambda: spark.read.parquet(dfsio_dir + "/out").write.format("noop").mode("overwrite").save()), 3
        )
        print(f"# dfsio write/read: {timings['dfsio_write']:.3f}s / {timings['dfsio_read']:.3f}s", file=sys.stderr)
    finally:
        shutil.rmtree(dfsio_dir, ignore_errors=True)

    # TeraSort-analogue throughput: generate + total-order sort + write
    # 2M 100-byte records (~200 MB), the reference's headline benchmark
    # (BASELINE.md TeraSuite).
    # min-of-3: this is the headline baseline anchor
    timings["terasort_2m_records"] = round(
        _min_of(3, lambda: terasort_gen(spark, 2_000_000, partitions=32).write.mode("overwrite").format("noop").save()), 3
    )
    print(f"# terasort_2m_records: {timings['terasort_2m_records']:.3f}s", file=sys.stderr)

    # One 10x point (20M records, ~2 GB): sanity-checks that the
    # GB/node/min headline off the 2M sweet spot isn't a small-data
    # artifact — the rate should land within ~2x.  min-of-3 since r6:
    # the r5 record ran this min-of-1 and a single transiently-slow
    # run printed as "10x data -> 23x time"; the measured attribution
    # (SCALE.md round-6 note) shows zero spill at every shuffle-
    # partition setting in {32..256} and ~6.8 s min-of-3
    # (~18 GB/node/min — faster per-record than the overhead-dominated
    # 2M point), so the r5 reading was the sandbox, not the plan.
    timings["terasort_20m_records"] = round(
        _min_of(3, lambda: terasort_gen(spark, 20_000_000, partitions=64).write.mode("overwrite").format("noop").save()), 3
    )
    print(f"# terasort_20m_records: {timings['terasort_20m_records']:.3f}s", file=sys.stderr)

    # 200M records (~20 GB, 100x the 2M anchor): the spill-exercising
    # big run (VERDICT r5 task 8).  This is the first anchor whose
    # shuffle exceeds executor memory — the round-6 measured run
    # (SCALE.md) spilled 1.9 GB mem / 1.4 GB disk of a 20.4 GB shuffle
    # and still held 12.4 GB/node/min, so spill is exercised, not
    # pathological.  min-of-1 by design (a ~100 s run; the 20M
    # min-of-3 anchor is the stable-rate axis), kept OUT of the
    # headline `timings` total so cross-round headline comparisons
    # stay meaningful; recorded under anchors instead.
    # r7: the anchor sizes its OWN shuffle partitions with the engine's
    # sized_shuffle_partitions helper instead of inheriting the
    # session's 32 — at 32, each of the sort's range partitions
    # carries ~640 MB against ~155 MB of per-task execution memory and
    # the whole 20 GB churns through the spill path (measured matrix,
    # same idle machine, tmpfs spill: 32 parts ≈ 296 s, 150 ≈ 238 s,
    # 256 ≈ 189 s, 416 ≈ 88 s).  The helper's memory-aware target
    # (min(128 MB, exec-mem-per-task / 3) ≈ 52 MB at 8g/32 slots)
    # lands ~390 partitions — the fast regime — so the anchor
    # demonstrates the knob rather than measuring the un-tuned regime.
    # (The 200M run itself happens FIRST in this session — see the gate
    # above the small anchors — so its probe reads the entry state.)

    spark.stop()

    # sf1 spot-check: the 100-TB question in miniature — do the most
    # expensive plans scale LINEARLY from sf0.1 to sf1 (10x rows), or
    # is something super-linear hiding below the sf0.1 horizon?  The
    # sf1 tables are synthesized once per machine (10 key-offset copies
    # of the sf0.1 facts; dims unchanged — join selectivity preserved)
    # and the slowest queries re-run in a fresh session.  Ratios near
    # 10x (plus fixed overhead) = linear; >> 10x = investigate.
    sf1_spotcheck: dict[str, dict] = {}
    stage_audit: dict = {}
    if os.environ.get("SPARK_GRAFT_SF1_SPOTCHECK", "1") != "0" and SF_DIR.rstrip("/").endswith("sf0.1"):
        try:
            sf1_spotcheck, stage_audit = _sf1_spotcheck(timings, result_rows)
        except Exception as e:  # never fail the bench on the stretch tier
            print(f"# sf1 spotcheck skipped: {e}", file=sys.stderr)

    # sf3 second scale point for the heaviest families (exponent check)
    sf3_spotcheck: dict[str, dict] = {}
    if sf1_spotcheck and os.environ.get("SPARK_GRAFT_SF3_SPOTCHECK", "1") != "0":
        try:
            sf3_spotcheck = _sf3_spotcheck(sf1_spotcheck)
        except Exception as e:  # never fail the bench on the stretch tier
            print(f"# sf3 spotcheck skipped: {e}", file=sys.stderr)

    # Machine-speed index: a fixed driver-side CPU probe (300k chained
    # sha256) so cross-round comparisons can separate engine changes
    # from sandbox speed — the round-3 "uniform 1.66x regression" was
    # the machine (bisected in round 4: round-2 CODE re-run on the
    # round-4 machine was SLOWER than round-4 code on the same machine).
    cpu_probe = _cpu_probe_sec()

    # disk_probe_mb_s was measured just before the big anchor (gating
    # it); reused here for the record and the vs_prev annotation.
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    record_sf = float(sf) if sf.replace(".", "").isdigit() else sf
    total = round(sum(timings.values()), 3)
    # BASELINE.md anchor: Yahoo 2009 TeraSort per-node rates (~6.0
    # GB/node/min at 500 GB; ~0.97 at 100 TB).  2M × 100 B = 0.2 GB on
    # this single node -> GB/node/min computed directly for the judge.
    terasort_gb_per_node_min = round(0.2 / (timings["terasort_2m_records"] / 60.0), 2)
    record = {
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "action": "noop_write",  # r5+: full materialization; r1-r4 used count()
        "queries": timings,
        "sf": record_sf,
        "n_queries": len(timings),
        "anchors": {
            # headline normalized by the CPU probe: cross-round deltas
            # in this ratio are engine changes, not sandbox speed
            "headline_per_cpu_probe": round(total / max(cpu_probe, 1e-9), 1),
            "terasort_gb_per_node_min": terasort_gb_per_node_min,
            "terasort_20m_gb_per_node_min": round(
                2.0 / (timings["terasort_20m_records"] / 60.0), 2
            ),
            "terasort_200m_sec": terasort_200m_sec,
            "terasort_200m_shuffle_partitions": terasort_200m_shuffle_parts,
            "terasort_200m_gb_per_node_min": (
                round(20.0 / (terasort_200m_sec / 60.0), 2) if terasort_200m_sec else None
            ),
            # min-of-sessions with each session's disk probe attached:
            # the anchor's attribution evidence travels IN-ROW instead
            # of in SCALE.md prose (VERDICT r7 task 3).  "skipped" set
            # means THIS session was throttled below the floor and ran
            # no 200M measurement.
            "terasort_200m_skipped": terasort_200m_skipped,
            "terasort_200m_throttled": terasort_200m_throttled,
            # r11: the in-session min-of-3 evidence — per-attempt
            # disk/cpu probes + spill deltas, and the session median
            # as the variance-honest companion to best-of-sessions
            "terasort_200m_attempts": terasort_200m_attempts,
            "terasort_200m_median_sec": (
                round(statistics.median(a["sec"] for a in terasort_200m_attempts), 3)
                if terasort_200m_attempts
                else None
            ),
            "terasort_200m_sessions": (ts200_sessions := _terasort_200m_sessions(
                terasort_200m_sec, disk_probe_mb_s
            )),
            "terasort_200m_best": (
                min(ts200_sessions, key=lambda s: s["sec"]) if ts200_sessions else None
            ),
            "baseline_terasort_gb_per_node_min_500gb": 6.0,
            "baseline_terasort_gb_per_node_min_100tb": 0.97,
            "cpu_probe_sec": cpu_probe,
            "disk_probe_mb_s": disk_probe_mb_s,
        },
        "sf1_spotcheck": sf1_spotcheck,
        "sf3_spotcheck": sf3_spotcheck,
        # Stage-parallelism audit over the sf1 sweep (empty flagged =
        # clean); the mechanical regression gate for the AQE-coalesce
        # serialized-CPU-stage hazard class (VERDICT r6 task 6).
        "stage_audit": stage_audit,
        # Mechanical cross-round comparison (VERDICT r5 task 5): each
        # query's time is normalized by the machine-speed probe on BOTH
        # sides, so a ratio > 1 is an engine delta, not sandbox speed.
        # The baseline is the newest committed bench_baselines/
        # BENCH_full_r{NN}.json (same noop_write action required);
        # queries >1.3x normalized are flagged for the judge, then
        # automatically RE-MEASURED min-of-3 in a fresh session
        # (flag_recheck) so transient-noise flags self-attribute
        # (VERDICT r6 task 3).
        "vs_prev_normalized": _vs_prev_normalized(
            timings, cpu_probe, disk_probe_mb_s, record_sf, query_cpu_sec
        ),
        # per-query JVM-CPU seconds for the winning rep (None where
        # /proc was unreadable) — next round's snapshot side of the
        # cpu_split comparison
        "query_cpu_sec": query_cpu_sec,
    }
    # the sweep's health verdict: downstream vs_prev readings must cite
    # it (VERDICT r11 task 1; attribution rule documented in SCALE.md)
    record["session_health"] = _session_health(
        probe_pre_sweep, probe_post_sweep, record["vs_prev_normalized"]
    )
    print(
        f"# session_health: {record['session_health']['verdict']} "
        f"{record['session_health']['reasons']}",
        file=sys.stderr,
    )
    if record["session_health"]["verdict"] != "healthy":
        # a degraded/unattributed sweep's record points at the newest
        # committed HEALTHY snapshot so downstream comparisons have a
        # representative per-query map (VERDICT r12 task 5)
        record["representative_snapshot"] = _newest_healthy_snapshot()
    flagged = record["vs_prev_normalized"].get("flagged_over_1.3_of_median") or {}
    if flagged:
        try:
            record["vs_prev_normalized"]["flag_recheck"] = _flag_recheck(
                list(flagged), cpu_probe, record["vs_prev_normalized"]
            )
        except Exception as e:  # never fail the bench on the recheck tier
            print(f"# flag recheck skipped: {e}", file=sys.stderr)
        # first-class adjudicated map (r14): every flagged query's
        # fresh-session min-of-3 recheck, published beside (never
        # inside) the in-sweep `queries` map — next-round comparisons
        # substitute these for the in-sweep spikes via
        # _adjudicated_prev_queries, so a transient in-sweep number
        # can no longer become a stale baseline (the r13 snapshot's
        # 6.38 s multimodal_video fork-storm spike).
        record["queries_adjudicated"] = {
            n: r["recheck_sec"]
            for n, r in (record["vs_prev_normalized"].get("flag_recheck") or {}).items()
        }
    # full per-query map: stderr + a file next to this script (the
    # round-2 driver could only capture a bounded stdout tail, so the
    # 91-query one-liner came back "parsed": null)
    print(json.dumps(record), file=sys.stderr)
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json")
    try:
        with open(full_path, "w") as f:
            json.dump(record, f, indent=1)
            f.write("\n")
    except OSError as e:  # read-only checkout: stderr copy still stands
        print(f"# BENCH_full.json not written: {e}", file=sys.stderr)
    # FINAL stdout line: compact — top-10 slowest queries only
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                **record,
                "queries": slowest,
                "queries_truncated_to": 10,
                # full per-query cpu map rides in BENCH_full.json only
                "query_cpu_sec": {n: query_cpu_sec.get(n) for n in slowest},
                "full_map": "BENCH_full.json",
            }
        )
    )


def _load_prev_snapshot() -> tuple[str | None, dict | None]:
    """Newest committed bench_baselines/BENCH_full_r{NN}.json."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    snaps = sorted(glob.glob(os.path.join(here, "bench_baselines", "BENCH_full_r*.json")))
    if not snaps:
        return None, None
    try:
        with open(snaps[-1]) as f:
            return os.path.basename(snaps[-1]), json.load(f)
    except (OSError, ValueError):
        return os.path.basename(snaps[-1]), None


def _vs_prev_normalized(
    timings: dict[str, float],
    cpu_probe: float,
    disk_probe: float | None = None,
    sf=None,
    query_cpu_sec: dict | None = None,
) -> dict:
    """Per-query cpu-normalized ratios vs the newest committed
    bench_baselines/BENCH_full_r{NN}.json snapshot (same-action only).
    ratio = (t_now / probe_now) / (t_prev / probe_prev); >1.3 flagged.
    Anchors with their own scale changes (terasort_20m went min-of-1
    -> min-of-3 in r6) compare like any query — the min can only drop.

    The CPU probe cannot see DISK state, and the sandbox disk is
    burst-throttled — r7's median drifted to 1.21 purely because
    scan-bound queries ran on a 14.6 MB/s session vs the baseline's
    healthy one (VERDICT r7 task 3).  The median therefore ships WITH
    both sessions' disk probes and an explicit ``disk_drift`` marker
    (>3x probe gap in either direction): when the marker is set, a
    uniform median shift is the machine, not the code — read the
    per-query flags (which are median-relative and thus immune to the
    uniform term) and the flag_recheck reverts instead."""
    base_name, prev = _load_prev_snapshot()
    if base_name is None:
        return {"baseline": None}
    if prev is None:
        return {"baseline": base_name, "error": "unreadable snapshot"}
    if prev.get("action") != "noop_write":
        return {"baseline": base_name, "skipped": "action mismatch"}
    if sf is not None and prev.get("sf") is not None and prev.get("sf") != sf:
        # a sf0.01 smoke run against a sf0.1 snapshot would "compare"
        # every query across data scales and flag garbage
        return {"baseline": base_name, "skipped": f"sf mismatch ({prev.get('sf')} vs {sf})"}
    # r14 (ADVICE): keep the RAW probe (None when the snapshot lacks it)
    # for the drift check — the 1.0 placeholder is a normalization
    # fallback only; comparing a real ~0.16 s probe against a fabricated
    # 1.0 would spuriously flag drift and silently switch the health
    # verdict onto the raw wall median.
    prev_probe_raw = prev.get("anchors", {}).get("cpu_probe_sec")
    prev_probe = prev_probe_raw or 1.0
    prev_disk = prev.get("anchors", {}).get("disk_probe_mb_s")
    disk_drift = bool(
        prev_disk and disk_probe and not (1 / 3 <= disk_probe / prev_disk <= 3)
    )
    prev_queries, prev_adjudicated = _adjudicated_prev_queries(prev)
    ratios = {}
    for name, t_prev in prev_queries.items():
        if name in timings and t_prev > 0:
            ratios[name] = round((timings[name] / max(cpu_probe, 1e-9)) / (t_prev / prev_probe), 2)
    med = sorted(ratios.values())[len(ratios) // 2] if ratios else None
    # Flag RELATIVE TO THE MEDIAN ratio, not 1.3 absolute: the CPU
    # probe corrects raw compute speed but not JVM/scheduler overhead
    # shifts, which move every query's ratio together (first trial run:
    # median 1.12 flagged 22 queries, all sub-second overhead noise).
    # The median is the residual machine term; a query 1.3x above IT is
    # an engine delta.  Queries under 0.3s on EITHER side are
    # scheduler-floor noise and never flagged (2-decimal snapshot
    # rounding also makes tiny baselines produce garbage ratios), and
    # `med > 0` is guarded explicitly — a zero-rounded median must not
    # silently disable all flagging (round-6 ADVICE items).
    flagged = {
        n: r
        for n, r in sorted(ratios.items(), key=lambda kv: -kv[1])
        if med is not None
        and med > 0
        and r / med > 1.3
        and timings.get(n, 0) >= 0.3
        and prev_queries.get(n, 0) >= 0.3
    }
    # wall-vs-cpu split (r12): when BOTH sides carry per-query JVM-CPU
    # seconds, the median wall ratio and median cpu ratio separate
    # "the engine computed more" from "the session waited more" —
    # the r11 1.40-median mystery class becomes mechanically
    # attributable.  Raw (un-normalized) ratios on both axes: the
    # point is their DISAGREEMENT, and normalizing wall by the cpu
    # probe while cpu seconds can't be normalized the same way would
    # manufacture one.
    cpu_split: dict = {}
    prev_cpu_map = prev.get("query_cpu_sec") or {}
    if query_cpu_sec and prev_cpu_map:
        wall_r, cpu_r = [], []
        for name, c_prev in prev_cpu_map.items():
            c_now = query_cpu_sec.get(name)
            t_prev, t_now = prev_queries.get(name), timings.get(name)
            if c_prev and c_now and t_prev and t_now and t_prev >= 0.3 and t_now >= 0.3:
                wall_r.append(t_now / t_prev)
                cpu_r.append(c_now / c_prev)
        if wall_r:
            cpu_split = {
                "n_compared": len(wall_r),
                "wall_median_ratio": round(statistics.median(wall_r), 2),
                "cpu_median_ratio": round(statistics.median(cpu_r), 2),
            }
    # r13: the normalization DENOMINATOR can itself drift — the sandbox's
    # single-core sha256 probe halved between r12 and r13 (0.31 → 0.163 s)
    # while Spark throughput was flat (raw wall median 1.07), which
    # inflated every normalized ratio ~1.9× and made the health rule
    # read a normalization artifact as a "real engine delta".  When the
    # probes differ >1.5× in either direction, mark it: readers (and
    # the health verdict below) must use the RAW cpu_split medians, not
    # median_ratio.  Per-query FLAGS stay valid either way — they are
    # median-relative, so a uniform probe term cancels out.
    cpu_probe_drift = bool(
        prev_probe_raw
        and cpu_probe
        and not (1 / 1.5 <= cpu_probe / prev_probe_raw <= 1.5)
    )
    return {
        "baseline": base_name,
        "prev_cpu_probe_sec": prev_probe,
        "cpu_probe_sec": cpu_probe,
        "prev_disk_probe_mb_s": prev_disk,
        "disk_probe_mb_s": disk_probe,
        "disk_drift": disk_drift,
        "cpu_probe_drift": cpu_probe_drift,
        "n_compared": len(ratios),
        "median_ratio": med,
        "cpu_split": cpu_split,
        "flagged_over_1.3_of_median": flagged,
        # which prev-side values were replaced by the snapshot's own
        # fresh-session rechecks (adjudication substitution, r14)
        "prev_adjudicated_applied": prev_adjudicated,
    }


def _adjudicated_prev_queries(prev: dict) -> tuple[dict[str, float], dict[str, float]]:
    """The prev snapshot's per-query map with ADJUDICATED values
    substituted (r14, VERDICT r13 task 1).  A committed sweep's
    in-sweep spike that its own min-of-3 fresh-session recheck
    contradicted is NOT the representative number — r13's snapshot
    carried multimodal_video at 6.38 s (a fork-storm spike whose
    recheck read 0.46 s and whose cause was reverted post-snapshot),
    so the next round's comparison would report a phantom 9x
    "improvement".  Preference order per query: the snapshot's
    first-class ``queries_adjudicated`` map (written by this harness
    from r14 on), else its ``vs_prev_normalized.flag_recheck``
    recheck_sec (the same fresh-session re-measure, pre-r14 layout).
    Returns (substituted map, {name: substituted value} for the
    record)."""
    prev_queries = dict(prev.get("queries", {}))
    substituted: dict[str, float] = {}
    recheck = (prev.get("vs_prev_normalized") or {}).get("flag_recheck") or {}
    for name, r in recheck.items():
        sec = r.get("recheck_sec")
        if sec and name in prev_queries:
            prev_queries[name] = sec
            substituted[name] = sec
    for name, sec in (prev.get("queries_adjudicated") or {}).items():
        if sec and name in prev_queries:
            prev_queries[name] = sec
            substituted[name] = sec
    return prev_queries, substituted


def _newest_healthy_snapshot() -> str | None:
    """Newest committed bench_baselines snapshot whose own
    session_health verdict is healthy (or that predates the verdict
    field) — the ``representative_snapshot`` pointer a degraded
    session's record must carry (VERDICT r12 task 5 / r13 task 8) so
    downstream readers compare against representative numbers instead
    of the degraded sweep."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    for snap in sorted(
        glob.glob(os.path.join(here, "bench_baselines", "BENCH_full_r*.json")),
        reverse=True,
    ):
        try:
            with open(snap) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        verdict = (rec.get("session_health") or {}).get("verdict")
        if verdict in (None, "healthy"):
            return os.path.basename(snap)
    return None


def _flag_recheck(names: list[str], cpu_probe: float, vs_prev: dict) -> dict:
    """Re-measure flagged queries min-of-3 in ONE fresh session and
    re-derive their normalized ratios — transient noise (chunk
    composition, GC pressure from a neighboring query's broadcasts)
    reverts on re-measure; a real plan regression survives it.  The
    round-6 verdict carried 6 unattributed flags precisely because this
    step was manual; now every flag ships with its own re-measurement
    (``reverts`` = recheck ratio back under the 1.3x-of-median bar)."""
    from hadoop_3_3_6_spark.plans.queries import QUERIES

    _, prev = _load_prev_snapshot()
    prev_probe = (prev or {}).get("anchors", {}).get("cpu_probe_sec") or 1.0
    prev_queries, _ = _adjudicated_prev_queries(prev or {})
    med = vs_prev.get("median_ratio") or 1.0
    spark = _fresh_session("bench-flag-recheck")
    out: dict[str, dict] = {}
    for name in names:
        if name not in QUERIES or not prev_queries.get(name):
            continue
        fn = QUERIES[name]
        best = _min_of(3, lambda: fn(spark, SF_DIR).write.mode("overwrite").format("noop").save())
        ratio = round((best / max(cpu_probe, 1e-9)) / (prev_queries[name] / prev_probe), 2)
        out[name] = {
            "recheck_sec": round(best, 3),
            "recheck_ratio": ratio,
            "reverts": bool(med > 0 and ratio / med <= 1.3),
        }
        print(
            f"# flag recheck {name}: {best:.3f}s ratio {ratio} "
            f"({'reverts' if out[name]['reverts'] else 'PERSISTS'})",
            file=sys.stderr,
        )
    spark.stop()
    return out


SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
# slowest non-streaming sf0.1 queries, one per expensive plan family —
# static so the spot-checked set is stable across rounds.  (Streaming
# queries are dominated by fixed micro-batch overhead at these scales;
# their state-size scaling is watermark-bounded by construction.)
SF1_QUERIES = [
    "dedup_spans",
    "dedup_clusters",
    "pipeline_dedup_keep",
    "pipeline_pretraining_e2e",
    "similarity_lsh_topk",
    "fuzzy_join_titles",
    "profile_orders_columns",
    "dedup_minhash",
    "q18_large_orders",
    "sort",
    # one per remaining expensive-plan family: range join, window
    # sessionization, inverted-index text scoring, full-outer merge,
    # semi-join decontamination
    "interval_join_shipments",
    "sessionize_events",
    "text_tfidf_topk",
    "merge_upsert_orders",
    "pipeline_contamination",
    # round-5 additions — the 5 heaviest families not yet spotchecked:
    # applyInPandas grouped sort, micro-batch streaming agg, file-layout
    # profiling, bucket-digest table diff, in-plan bloom build+probe
    "secondarysort",
    "streaming_tumbling_counts",
    "storage_file_profile",
    "table_diff_orders",
    "sketch_bloom_prefilter",
    # round-5: the re-registered cluster-blocked pair join must show
    # bounded growth at 10x corpus (cells grow linearly, nprobe fixed)
    "embedding_neardup",
    # round-5 (noop-action reveal): the heaviest per-row text HOF
    # families, honest-measured for the first time — all linear by
    # construction, spotchecked to pin it
    "text_repetition_topgram",
    "text_boilerplate",
    "text_lm_bigram",
    "dedup_span_fraction",
    # round-6: the adaptive-k cluster-then-compare family needs BOTH
    # scale points (sf1 here feeds the sf3 exponent check)
    "dedup_semantic",
    # round-7: PQ training+encode+ADC (linear by construction — the
    # per-iteration shuffle is corpus-size independent) and the DSIR
    # token-explode/bucket-LM/top-k chain (linear + 256-row bounded)
    "similarity_pq_topk",
    "pipeline_importance_resample",
    # round-7: cluster-balanced prototype pruning — shares semdedup's
    # assignment stage but replaces the pair join with one cluster_id
    # window; sf3 exponent check pins the no-pair-join claim
    "pipeline_diversity_sample",
    # round-8: the 13-signal Gopher repetition suite — the heaviest
    # per-row HOF family yet (O(G log G) + O(G·n) per doc); linear by
    # construction, sf3 exponent check pins it
    "text_repetition_gopher",
    # round-9: the composed IVF-PQ serving tier — per-probe candidates
    # O(N·nprobe/K); with K and nprobe FIXED at the registered
    # hyperparameters the serving cost is linear in N (designed exp
    # ~1.0), which the sf3 point pins.  K(N) policy at real scale:
    # K ∝ sqrt(N) (the FAISS guideline — per-list size sqrt(N)) keeps
    # per-probe candidates at sqrt(N)·nprobe; the fixed-K measurement
    # here upper-bounds that.  Candidate-count ≪ N·P is separately
    # pinned by tests/test_tools.py::
    # test_ivf_pq_candidate_count_is_list_pruned (measured 0.246 of
    # full-scan at nprobe/K = 0.25).
    "similarity_ivf_pq_topk",
    # round-10 (VERDICT r9 task 6): scale rows for the r9 newcomers —
    # the WARC -> extract -> rules chain (record streaming + one Arrow
    # stage, linear in corpus bytes; the rendered corpus is cached per
    # (process, sf_dir) and min-of-2 excludes the render), the span
    # apply-the-cut (inverted index + id-sized join-back; the vowel
    # permutation keeps duplicated shingles within-copy so work is
    # linear in copies), and the line dedup whose ONE line-keyed
    # exchange is the deliberately-hot-key stage to watch under skew
    # (the per-source NAV headers get 10x hotter at sf1 by design —
    # exactly the boilerplate concentration a real crawl shows).
    "pipeline_web_e2e",
    "dedup_spans_apply",
    "dedup_lines_apply",
    # round-10: classifier scoring is per-row HOF (linear); training
    # is cached per (process, sf_dir) so min-of-2 times the scorer
    "pipeline_quality_classifier",
]
_SF1_SCALED = {"orders", "lineitem", "events", "documents", "embeddings", "part"}
# Each scaled table's columns map to the OFFSET-SOURCE table whose key
# range defines the shift: a table's own key uses its own range; a
# foreign key into another scaled table uses THAT table's range, so
# copy c's lineitems reference copy c's orders and copy c's parts —
# FK integrity holds inside the synthesized tier and fact-fact joins
# (orders-lineitem, part-lineitem) keep their real fan-out.  FKs into
# the unscaled dims (customer, supplier) stay unchanged by design:
# each dim row gains 10x fan-in, the expected shape of a 10x corpus
# over a fixed dimension universe.
_SF1_KEYS = {
    "orders": {"o_orderkey": "orders"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part"},
    "events": {"event_id": "events"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
    "part": {"p_partkey": "part"},
}
# Key column whose max defines each offset-source table's range.
_SF1_RANGE_KEY = {
    "orders": "o_orderkey",
    "part": "p_partkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _vowel_perms(ncopies: int) -> list[str]:
    """``ncopies`` DISTINCT permutations of 'aeiou' (identity first —
    itertools emits sorted order, so copy 0 is untouched).  120
    available; enough for any copy count this harness uses."""
    import itertools

    perms = ["".join(p) for p in itertools.permutations("aeiou")]
    if ncopies > len(perms):
        raise ValueError(f"at most {len(perms)} distinct copies supported")
    return perms[:ncopies]


def _ensure_scaled(spark, out_dir: str, ncopies: int, marker_name: str, perms: list[str]) -> None:
    """Synthesize an N-copy scale tier from sf0.1 once per machine:
    fact tables are ``ncopies`` key-offset copies (ids stay unique;
    FKs into other scaled tables shifted by the REFERENCED table's
    range so copy-c facts join copy-c parents; FKs into the unscaled
    dims unchanged, so dim fan-in scales Nx as a real Nx corpus
    would); dims copy as-is.

    v2: l_partkey/l_orderkey shift by the referenced table's offset.
    v3: scaled tables repartition(32) before write — the
    crossJoin(broadcast(range(N))) otherwise collapses to ~1 partition
    and writes ONE Nx-sized file, making every scaled scan single-task
    (the r5 spotcheck measured storage_file_profile at 27x purely from
    lost scan parallelism).  A real Nx table has ~Nx the files, not Nx
    the file size.  v4: documents vowel-permute per copy (within-copy
    near-dup structure preserved exactly — the same substitution hits
    both members of a pair — while cross-copy shingle overlap
    collapses; verbatim copies would otherwise grow dedup cliques and
    pair work QUADRATICALLY, a synthesis artifact) and embeddings
    rotate components per copy (norms and within-copy geometry exact;
    cross-copy cosines at random-overlap level — a dim-0 nudge left
    them ~1.0 and near-dup output exploded x1283).  Copies >= dim flip
    the sign on top of the rotation, extending distinctness to 2*dim
    copies (enforced below; copies < dim are bit-identical to the
    pre-sign form, so existing tier markers stay valid)."""
    from pyspark.sql import functions as F

    from hadoop_3_3_6_spark.session import TABLE_NAMES, load_table

    marker = os.path.join(out_dir, marker_name)
    if os.path.exists(marker):
        return
    os.makedirs(out_dir, exist_ok=True)
    # The per-copy embedding transform (rotation x sign) is only
    # distinct while 2*dim covers the copy count — enforce it up front
    # (mirroring _vowel_perms' explicit ValueError) instead of silently
    # writing byte-identical cross-copy embeddings that would inflate
    # near-dup pair work quadratically (round-6 ADVICE item).
    dim = load_table(spark, "embeddings", SF_DIR).select(F.size("embedding")).first()[0]
    if 2 * dim < ncopies:
        raise ValueError(
            f"embedding dim {dim} supports at most {2 * dim} distinct copies "
            f"(rotation x sign); got ncopies={ncopies}"
        )
    offsets = {
        t: load_table(spark, t, SF_DIR).agg(F.max(k)).collect()[0][0] + 1
        for t, k in _SF1_RANGE_KEY.items()
    }
    for t in TABLE_NAMES:
        df = load_table(spark, t, SF_DIR)
        out = os.path.join(out_dir, f"{t}.parquet")
        if t in _SF1_SCALED:
            copies = df.crossJoin(spark.range(ncopies).select(F.col("id").alias("_copy")))
            scaled = copies.withColumns(
                {k: F.col(k) + F.col("_copy") * offsets[src] for k, src in _SF1_KEYS[t].items()}
            )
            if t == "documents":
                arr = ",".join(f"'{r}'" for r in perms)
                scaled = scaled.withColumn(
                    "text",
                    F.expr(
                        f"translate(text, 'aeiou', element_at(array({arr}), cast(_copy % {len(perms)} as int) + 1))"
                    ),
                )
            if t == "embeddings":
                # rotate components by copy % dim; copies >= dim flip
                # the sign (cosine -1 vs the same rotation — exact,
                # norm-preserving, and far from the near-dup band), so
                # distinct copies stay distinct up to 2*dim
                scaled = scaled.withColumn(
                    "embedding",
                    F.expr(
                        "transform(sequence(0, size(embedding) - 1), i -> "
                        "(CASE WHEN _copy >= size(embedding) THEN cast(-1.0 as float) "
                        " ELSE cast(1.0 as float) END) * "
                        "element_at(embedding, "
                        "cast((i + _copy % size(embedding)) % size(embedding) as int) + 1))"
                    ),
                )
            scaled.drop("_copy").repartition(32).write.mode("overwrite").parquet(out)
        else:
            df.write.mode("overwrite").parquet(out)
    with open(marker, "w") as f:
        f.write("ok\n")


def _ensure_sf1(spark) -> None:
    # sf1 keeps its original hand-picked 10-permutation list (5
    # rotations + 5 reversed) so cross-round sf1 numbers stay
    # comparable; the marker version is unchanged for the same reason.
    rots = [
        "aeiou", "eioua", "iouae", "ouaei", "uaeio",
        "uoiea", "oieau", "ieauo", "eauoi", "auoie",
    ]
    _ensure_scaled(spark, SF1_DIR, 10, "_SUCCESS_ALL_v4", rots)


_SF01_DOC_OFFSET: list[int] = []


def _fuzzy_join_titles_clean(spark, sf_dir: str):
    """Duplication-free fuzzy-join variant for the scale tiers (VERDICT
    r6 task 4).  The standard tier's vowel permutation leaves two
    permuted variants of the same short title within edit distance 5,
    so cross-copy title CLIQUES grow with the copy count and the
    measured exponent conflates output growth with engine work (sf3
    r6: 1.67 vs designed 1.0, attributed to rows x28.9).  This variant
    prefixes every title — and therefore its blocking key (the first
    token) — with the synthesis copy index (doc_id div the sf0.1 key
    range, the same offset _ensure_scaled shifted by), so cross-copy
    blocks can never collide, while within-copy pairs keep their exact
    sf0.1 distances (the prefix is identical on both sides; the vowel
    permutation is a character bijection, which preserves edit
    distance).  Output rows and pair work are thus EXACTLY linear in
    the copy count: the measured exponent isolates compare+shuffle
    scaling."""
    from pyspark.sql import functions as F

    from hadoop_3_3_6_spark.operators.joins import fuzzy_join
    from hadoop_3_3_6_spark.session import load_table

    if not _SF01_DOC_OFFSET:
        _SF01_DOC_OFFSET.append(
            load_table(spark, "documents", SF_DIR).agg(F.max("doc_id")).collect()[0][0] + 1
        )
    offset = _SF01_DOC_OFFSET[0]
    docs = load_table(spark, "documents", sf_dir)
    words = "filter(split(text, ' '), w -> w <> '')"
    title = F.expr(
        f"concat(cast(doc_id div {offset} as string), '_', array_join(slice({words}, 1, 4), ' '))"
    )
    left = docs.select(F.col("doc_id").alias("left_id"), title.alias("left_title"))
    right = docs.select(F.col("doc_id").alias("right_id"), title.alias("right_title"))
    return fuzzy_join(
        left,
        right,
        "left_title",
        "right_title",
        F.split_part(F.col("left_title"), F.lit(" "), F.lit(1)),
        F.split_part(F.col("right_title"), F.lit(" "), F.lit(1)),
        max_distance=5,
        pair_filter=F.col("left_id") < F.col("right_id"),
    ).select("left_id", "left_title", "right_id", "right_title", "edit_distance")


# Scale-tier-only queries (not in the driver registry): measured at
# sf0.1 inside the spotcheck session so ratios stay self-consistent.
def _pretraining_chain(spark, sf_dir: str):
    """The capstone pretraining DAG timed END-TO-END for the scale
    tiers (VERDICT r10 task 7): the per-(process, sf_dir) chain cache
    is cleared before every call, so each measured run re-executes all
    8 materializing stages (extract → line dedup → exact dedup → span
    cut → Gopher → classifier apply → sampling → tokenize/shards).
    Two fixtures stay cached by design: the rendered WARC corpus
    (fixture prep, not chain work) and the classifier training weights
    (training is pipeline_quality_classifier's own scale row; the
    chain's classifier stage is the APPLY projection)."""
    from hadoop_3_3_6_spark.functions.text import train_quality_classifier
    from hadoop_3_3_6_spark.plans import queries as Q

    wkey = ("qc_weights", sf_dir)
    if wkey not in Q._RENDER_CACHE:
        Q._RENDER_CACHE[wkey] = train_quality_classifier(
            Q._qc_labeled(spark, sf_dir),
            buckets=Q._QC_BUCKETS,
            iters=Q._QC_ITERS,
            lr=Q._QC_LR,
        )
    Q._RENDER_CACHE.pop(("pretrain_full", sf_dir), None)
    return Q.QUERIES["pipeline_pretraining_full"](spark, sf_dir)


EXTRA_SCALE_QUERIES = {
    "fuzzy_join_titles_clean": _fuzzy_join_titles_clean,
    "pipeline_pretraining_chain": _pretraining_chain,
}


SF3_DIR = os.environ.get("SPARK_GRAFT_SF3_DIR", "/tmp/spark_graft_sf3")
# Second scale point (VERDICT r5 task 3): the heaviest sf1 families get
# an sf3 (= 3x sf1 = 30x sf0.1) measurement so the sf0.1->sf1 step
# isn't the only exponent estimate — a single 10x step can hide N^1.5
# terms.  Designed exponents: ~1.0 for the linear per-row/inverted-
# index families, 1.5 for the adaptive-k cluster-then-compare pair
# joins (pair work ~N^1.5 by design with k = ceil(sqrt(N))).  The
# measured exponent is ln(t_sf3/t_sf1)/ln(3) — fixed overhead biases
# it DOWN at these sizes, so a measured value at-or-under design plus
# a rows_ratio near the output's own growth is a pass.
SF3_QUERIES = {
    "fuzzy_join_titles": 1.0,
    # the duplication-free variant: exponent isolates engine work
    "fuzzy_join_titles_clean": 1.0,
    "embedding_neardup": 1.5,
    "dedup_semantic": 1.5,
    # assignment-only sibling of dedup_semantic: the N*sqrt(N) cosine
    # fold dominates in-plan k sizing, so design is 1.5 WITHOUT the
    # pair join's output growth; measured should land well under
    "pipeline_diversity_sample": 1.5,
    "text_lm_bigram": 1.0,
    "dedup_span_fraction": 1.0,
    "text_repetition_topgram": 1.0,
    # per-row HOF suite: cost scales with document length, not corpus
    "text_repetition_gopher": 1.0,
    # composed IVF-PQ: fixed K/nprobe/probe-count -> candidates, encode
    # and training all linear in N (see the _SF1 list note for the
    # K ∝ sqrt(N) policy this fixed-K run upper-bounds)
    "similarity_ivf_pq_topk": 1.0,
    # round-10: the r9 newcomers, all designed-linear — WARC record
    # streaming + per-row Arrow extraction; span cut's inverted index
    # (within-copy duplicates only under the vowel permutation) with
    # id-sized join-back; line dedup's single line-keyed exchange
    # (hot boilerplate keys grow in COUNT-PER-KEY, not key work)
    "pipeline_web_e2e": 1.0,
    "dedup_spans_apply": 1.0,
    "dedup_lines_apply": 1.0,
    # per-row HOF scorer over a pruned scan — the gopher-rules family
    "pipeline_quality_classifier": 1.0,
    # round-11 (VERDICT r10 task 7): the capstone chain end-to-end —
    # every stage is individually linear (see the query docstring) and
    # the chain is their sequential composition, so designed ~1.0;
    # stage materialization writes grow linearly with the corpus
    "pipeline_pretraining_chain": 1.0,
}


def _sf3_spotcheck(sf1_results: dict[str, dict]) -> dict[str, dict]:
    import math

    from hadoop_3_3_6_spark.plans.queries import QUERIES

    spark = _fresh_session("bench-sf3gen")
    _ensure_scaled(spark, SF3_DIR, 30, "_SUCCESS_ALL_v1", _vowel_perms(30))
    spark.stop()

    spark = _fresh_session("bench-sf3", warm_dir=SF3_DIR)
    out: dict[str, dict] = {}
    for name, designed in SF3_QUERIES.items():
        fn = QUERIES.get(name) or EXTRA_SCALE_QUERIES.get(name)
        if fn is None or name not in sf1_results:
            continue
        best = _min_of(
            2, lambda: fn(spark, SF3_DIR).write.mode("overwrite").format("noop").save()
        )
        t1 = sf1_results[name]["sf1_sec"]
        ratio = best / max(t1, 1e-9)
        rec = {
            "sf3_sec": round(best, 3),
            "ratio_vs_sf1": round(ratio, 2),
            "exponent_vs_sf1": round(math.log(max(ratio, 1e-9)) / math.log(3.0), 2),
            "designed_exponent": designed,
        }
        n1 = sf1_results[name].get("sf1_rows")
        if n1:
            n3 = fn(spark, SF3_DIR).count()  # untimed
            rec["sf3_rows"] = n3
            rec["rows_ratio_vs_sf1"] = round(n3 / max(n1, 1), 2)
        out[name] = rec
        print(
            f"# sf3 {name}: {best:.3f}s ({ratio:.1f}x of sf1, exp "
            f"{rec['exponent_vs_sf1']} vs designed {designed}, rows "
            f"x{rec.get('rows_ratio_vs_sf1', '?')})",
            file=sys.stderr,
        )
    spark.stop()
    return out


def _sf1_spotcheck(
    sf01_timings: dict[str, float], sf01_rows: dict[str, int]
) -> tuple[dict[str, dict], dict]:
    from hadoop_3_3_6_spark.plans.queries import QUERIES

    spark = _fresh_session("bench-sf1gen")
    _ensure_sf1(spark)
    spark.stop()

    # UI enabled: the session doubles as the stage-parallelism audit
    # surface — every sf1 family's stages are inspected via the REST
    # metrics API after the sweep (the AQE-coalesce hazard detector,
    # VERDICT r6 task 6), at zero extra query cost.
    spark = _fresh_session("bench-sf1", warm_dir=SF1_DIR, ui=True)
    out: dict[str, dict] = {}
    for name in SF1_QUERIES + list(EXTRA_SCALE_QUERIES):
        fn = QUERIES.get(name) or EXTRA_SCALE_QUERIES.get(name)
        if fn is None:
            continue
        t01, n01 = sf01_timings.get(name), sf01_rows.get(name)
        if t01 is None:
            if name not in EXTRA_SCALE_QUERIES:
                continue
            # scale-tier-only query: take its sf0.1 baseline here, in
            # the same session, so the ratio is self-consistent
            t01 = _min_of(
                2, lambda: fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            )
            n01 = fn(spark, SF_DIR).count()
        best = _min_of(
            2, lambda: fn(spark, SF1_DIR).write.mode("overwrite").format("noop").save()
        )
        ratio = best / max(t01, 1e-9)
        rec = {"sf1_sec": round(best, 3), "ratio_vs_sf0.1": round(ratio, 2)}
        # Output-row growth separates "the answer got bigger" from
        # "the compare work got super-linear" when a time ratio lands
        # above ~12x (e.g. fuzzy_join's duplicate-pair growth).
        if n01 is not None:
            n = fn(spark, SF1_DIR).count()  # untimed
            rec["sf1_rows"] = n
            rec["rows_ratio"] = round(n / max(n01, 1), 2)
        out[name] = rec
        print(
            f"# sf1 {name}: {best:.3f}s ({ratio:.1f}x of sf0.1, "
            f"rows x{rec.get('rows_ratio', '?')})",
            file=sys.stderr,
        )
    audit = _stage_audit(spark)
    print(f"# stage_audit: {json.dumps(audit)}", file=sys.stderr)
    spark.stop()
    return out, audit


if __name__ == "__main__":
    main()
