"""JDBC (Derby) end-to-end, skew helpers, foreachBatch sink,
compression codec coverage."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hadoop_3_3_6_spark.operators.skew import salted_aggregate, salted_join
from hadoop_3_3_6_spark.sources.db import jdbc_read, jdbc_read_partitioned, jdbc_write


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


def test_dbcount_pageview_roundtrip(spark, sf_dir, derby_url):
    """DBCountPageView (MRX/DBCountPageView.java:78) full JDBC flow:
    aggregate the access log, write counts to the DB (DBOutputFormat),
    read them back (DBInputFormat), verify against the direct result —
    the example's own embedded-SQL verify() pattern (:255-258)."""
    from hadoop_3_3_6_spark.session import load_table

    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("pageviews"))
    jdbc_write(counts, derby_url, "pageview_counts")
    back = jdbc_read(spark, derby_url, "pageview_counts")
    assert {(r["event_type"], r["pageviews"]) for r in back.collect()} == {
        (r["event_type"], r["pageviews"]) for r in counts.collect()
    }


def test_jdbc_partitioned_read(spark, derby_url):
    """DataDrivenDBInputFormat: value-range split scan."""
    src = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    jdbc_write(src, derby_url, "ranged")
    back = jdbc_read_partitioned(spark, derby_url, "ranged", "k", 0, 1000, 4)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.agg(F.sum("k")).collect()[0][0] == 499500


def test_salted_aggregate_matches_plain(spark, sf_dir):
    from hadoop_3_3_6_spark.session import load_table

    li = load_table(spark, "lineitem", sf_dir)
    plain = {
        (r["l_returnflag"],): (r["s"], r["c"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("s"), F.count(F.lit(1)).alias("c"), F.max("l_partkey").alias("mx"))
        .collect()
    }
    li2 = li.withColumn("lq", F.col("l_quantity").cast("long"))
    salted = {
        (r["l_returnflag"],): (r["s"], r["c"], r["mx"])
        for r in salted_aggregate(
            li2, ["l_returnflag"], {"s": ("sum", "lq"), "c": ("count", "lq"), "mx": ("max", "l_partkey")}
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    big = spark.range(10000).select((F.col("id") % 5).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(5)], "k long, name string")
    plain = big.join(small, "k").agg(F.count(F.lit(1)), F.sum("v")).collect()[0]
    salted = salted_join(big, small, "k").agg(F.count(F.lit(1)), F.sum("v")).collect()[0]
    assert tuple(plain) == tuple(salted)


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    """Streaming foreachBatch sink (SURVEY.md §2.9): per-microbatch
    custom writes — here appending parquet partitions."""
    from hadoop_3_3_6_spark.streaming.windows import _event_stream

    out = str(tmp_path / "fb_out")

    def write_batch(batch_df, batch_id):
        batch_df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).write.mode("append").parquet(out)

    stream = _event_stream(spark, sf_dir)
    q = stream.writeStream.foreachBatch(write_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    back = spark.read.parquet(out)
    total = back.agg(F.sum("n")).collect()[0][0]
    assert total == 10000  # all events accounted for across microbatches


def test_streaming_checkpoint_resume_exactly_once(spark, tmp_path):
    """Checkpointed restart processes ONLY data that arrived after the
    first run — the exactly-once recovery contract a production stream
    relies on (offsets live in the checkpoint, the sink is idempotent
    per batch)."""
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema("id long").parquet(str(src) + "/*")

        def write_batch(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            stream.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    spark.range(0, 100).write.parquet(str(src / "a"))
    run_once()
    assert spark.read.parquet(out).count() == 100

    # second run with NO new data: nothing reprocessed
    run_once()
    assert spark.read.parquet(out).count() == 100

    # append an increment: only the delta flows
    spark.range(100, 130).write.parquet(str(src / "b"))
    run_once()
    back = spark.read.parquet(out)
    assert back.count() == 130
    assert back.agg(F.countDistinct("id")).collect()[0][0] == 130


@pytest.mark.parametrize("codec", ["gzip", "bzip2", "lz4", "snappy"])
def test_text_compression_roundtrip(spark, tmp_path, codec):
    """Codec surface (HC/io/compress/: Gzip/BZip2/Lz4/Snappy/Zstd):
    transparent (de)compression on text sinks/scans."""
    df = spark.range(100).select(F.concat(F.lit("line"), F.col("id")).alias("value"))
    path = str(tmp_path / f"txt_{codec}")
    df.write.option("compression", codec).text(path)
    assert spark.read.text(path).count() == 100


@pytest.mark.parametrize("codec", ["snappy", "gzip", "zstd"])
def test_parquet_compression_roundtrip(spark, tmp_path, codec):
    df = spark.range(100).select("id", (F.col("id") * 2).alias("v"))
    path = str(tmp_path / f"pq_{codec}")
    df.write.option("compression", codec).parquet(path)
    assert spark.read.parquet(path).agg(F.sum("v")).collect()[0][0] == 9900


def test_foreach_batch_merge_maintains_materialized_view(spark, sf_dir, tmp_path):
    """Incremental materialized-view maintenance: foreachBatch applies
    each micro-batch's partial counts into a persisted aggregate table
    with merge_upsert (read-merge-rewrite per batch — the
    copy-on-write MERGE pattern).  After draining the stream the MV
    must equal the batch aggregate, regardless of how the micro-batch
    boundaries fell."""
    from hadoop_3_3_6_spark.operators.joins import merge_upsert
    from hadoop_3_3_6_spark.session import load_table
    from hadoop_3_3_6_spark.streaming.windows import _event_stream

    mv = str(tmp_path / "mv")

    def apply_batch(batch_df, batch_id):
        delta = batch_df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        import os

        if os.path.isdir(mv) and spark.read.parquet(mv).count() >= 0:
            cur = spark.read.parquet(mv)
            # source = delta keys only, with their new running totals;
            # MV keys untouched by this batch flow through the keep arm
            src = (
                delta.alias("d")
                .join(cur.alias("c"), "event_type", "left")
                .select(
                    "event_type",
                    (F.col("d.n") + F.coalesce(F.col("c.n"), F.lit(0))).alias("n"),
                )
            )
            merged = merge_upsert(cur, src, on="event_type")
            merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(mv)
        else:
            delta.write.mode("overwrite").parquet(mv)

    stream = _event_stream(spark, sf_dir)
    q = stream.writeStream.foreachBatch(apply_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    got = {r["event_type"]: r["n"] for r in spark.read.parquet(mv).collect()}
    want = {
        r["event_type"]: r["n"]
        for r in load_table(spark, "events", sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_streaming_continuous_dedup_against_growing_index(spark, sf_dir, tmp_path):
    """Continuous-crawl dedup: each micro-batch of documents dedups
    against the persisted minhash band index at BATCH cost, then
    appends its own novel docs' bands to the index — the 100 TB
    ingestion loop (dedup a crawl increment against history without
    re-hashing the corpus).  Batches that re-deliver earlier docs are
    fully flagged as duplicates; the kept set stays exactly the
    distinct corpus."""
    import os

    from hadoop_3_3_6_spark.functions.dedup import dedup_against_index, minhash_bands
    from hadoop_3_3_6_spark.session import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text").limit(60).cache()
    idx = str(tmp_path / "band_index")
    kept_ids: set[int] = set()

    # three increments: fresh docs, overlapping redelivery, pure replay
    batches = [
        docs.filter(F.col("doc_id") < 20),
        docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 40)),
        docs.filter(F.col("doc_id") < 40),
    ]
    for batch in batches:
        if os.path.isdir(idx):
            corpus_bands = spark.read.parquet(idx)
            dup_pairs = dedup_against_index(batch, corpus_bands, "text", "doc_id")
            dup_ids = {r.new_id for r in dup_pairs.select("new_id").distinct().collect()}
        else:
            dup_ids = set()
        novel = batch.filter(~F.col("doc_id").isin(list(dup_ids) or [-1]))
        minhash_bands(novel, "text", "doc_id").write.mode("append").parquet(idx)
        kept_ids |= {r.doc_id for r in novel.select("doc_id").collect()}

    # exactly-once keep decision: every doc <40 kept exactly once
    # (identical re-deliveries always collide with their own index rows)
    assert kept_ids == set(range(40)) & {r.doc_id for r in docs.collect()}
    # and the index holds bands for exactly the kept docs
    assert {r.doc_id for r in spark.read.parquet(idx).select("doc_id").distinct().collect()} == kept_ids


def test_streaming_pq_index_maintenance(spark, sf_dir, tmp_path):
    """Streaming similarity-index maintenance (VERDICT r7 task 6 —
    the similarity-tier mirror of the minhash incremental story): a
    foreachBatch job PQ-encodes each arriving embedding micro-batch
    with the FROZEN trained codebooks and appends the codes to the
    persisted index (similarity.append_pq_index).  After draining, the
    maintained index must equal the batch-built encode row-for-row —
    encoding is per-row and the books are frozen, so the result is
    independent of how the micro-batch boundaries fell — and an ADC
    probe against the maintained table (adc_topk) must answer exactly
    what the one-shot pq_topk answers over the same corpus."""
    from hadoop_3_3_6_spark.functions.similarity import (
        adc_topk,
        append_pq_index,
        build_pq_index,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )
    from hadoop_3_3_6_spark.session import load_table

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    books = train_pq_codebooks(
        emb, "vec_id", "embedding", m=16, codes=16, iters=2, quantize_decimals=3
    )
    # seed the index with the first half, stream the second half in
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    arriving = emb.filter(F.col("vec_id") % 2 == 1)
    src = str(tmp_path / "arriving")
    # several files -> several micro-batches under maxFilesPerTrigger
    arriving.repartition(4).write.parquet(src)
    idx = str(tmp_path / "pq_index")
    build_pq_index(seed, books, idx)

    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*.parquet")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, batch_id: append_pq_index(batch_df, books, idx)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    maintained = spark.read.parquet(idx)
    batch_built = pq_encode(emb, books, "vec_id", "embedding")
    got = {(r.vec_id, tuple(r.codes)) for r in maintained.collect()}
    want = {(r.vec_id, tuple(r.codes)) for r in batch_built.collect()}
    assert got == want  # batch-boundary independence, row-for-row

    probes = emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding")
    via_index = adc_topk(maintained, probes, books, k=5).collect()
    one_shot = pq_topk(emb, books, "vec_id", "embedding", k=5, probes=probes.select("vec_id")).collect()
    assert sorted(map(tuple, via_index)) == sorted(map(tuple, one_shot))
