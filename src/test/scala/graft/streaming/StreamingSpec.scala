package graft.streaming

import graft.SparkTester
import graft.queries.Tables.t
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming path: file source → watermark → event-time windows → memory
  * sink, and batch/stream parity for the tumbling aggregate. */
class StreamingSpec extends AnyFunSuite with SparkTester {

  /** Streaming file source requires a directory; stage the single parquet
    * file into one. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfTiny/events.parquet"),
      dir.resolve("events.parquet")
    )
    dir.toString
  }

  /** Watermark cutoff: append mode only finalizes windows whose END is <=
    * the final watermark (max event time - watermark delay). */
  private lazy val cutoffS: Long = {
    val maxNs = t(spark, sfTiny, "events").agg(max("ts")).collect().head.getLong(0)
    maxNs / 1000000000L - 3600L
  }

  test("eventsSchema on an empty or absent directory falls back to the static schema") {
    // streams are often started before the writer's first batch lands
    val empty = java.nio.file.Files.createTempDirectory("events_none")
    assert(EventStreams.eventsSchema(spark, empty.toString) == EventStreams.EventsSchema)
    assert(
      EventStreams.eventsSchema(spark, empty.resolve("never_created").toString) ==
        EventStreams.EventsSchema
    )
    // with files present, inference still wins (vintage-accurate ts type)
    assert(
      EventStreams.eventsSchema(spark, s"$sfTiny/events.parquet").fieldNames.contains("ts")
    )
    // a CORRUPT file is not "no files yet": the error must propagate, not
    // silently substitute the static schema (which would resurface later
    // as a mid-stream type mismatch far from the root cause)
    val bad = java.nio.file.Files.createTempDirectory("events_bad")
    java.nio.file.Files.write(bad.resolve("x.parquet"), "not a parquet file".getBytes("UTF-8"))
    intercept[Exception](EventStreams.eventsSchema(spark, bad.toString))
  }

  test("streaming dedup within watermark drops in-window duplicates, keeps batch parity") {
    // stage a directory where every event arrives TWICE (two files)
    val dir = java.nio.file.Files.createTempDirectory("events_dup")
    Seq("a", "b").foreach { n =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfTiny/events.parquet"),
        dir.resolve(s"$n.parquet")
      )
    }
    val src = spark.readStream
      .schema(EventStreams.eventsSchema(spark, dir.toString))
      .parquet(dir.toString)
    val q = EventStreams
      .dedupWithinWatermark(src, Seq("event_id"), "2 hours")
      .select("event_id")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_stream")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("select event_id from dedup_stream")
    val nEvents = t(spark, sfTiny, "events").count()
    assert(streamed.count() == nEvents, "each duplicated event must survive exactly once")
    // batch path degenerates to plain dropDuplicates
    val batchDedup = EventStreams.dedupWithinWatermark(
      t(spark, sfTiny, "events").unionAll(t(spark, sfTiny, "events")),
      Seq("event_id"),
      "2 hours"
    )
    assert(batchDedup.count() == nEvents)
  }

  test("tumbling 5m streaming agg equals batch computation (finalized windows)") {
    val q = EventStreams.runBounded(
      spark,
      eventsDir,
      EventStreams.tumbling5m,
      "t5m"
    )
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("select * from t5m")
    val batch = EventStreams.tumbling5m(t(spark, sfTiny, "events"))
      .filter(col("bucket_s") + 300 <= cutoffS)
    val key = Seq(col("bucket_s"), col("event_type"))
    val a = streamed.filter(col("bucket_s") + 300 <= cutoffS).orderBy(key: _*).collect()
    val b = batch.orderBy(key: _*).collect()
    assert(b.length > 100)
    assert(a.toSeq == b.toSeq)
  }

  test("session windows: streamed finalized sessions equal batch session_window") {
    val q = EventStreams.runBounded(
      spark,
      eventsDir,
      EventStreams.sessions30m,
      "sess30"
    )
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("select * from sess30")
      .filter(col("session_end_us") / 1000000L <= cutoffS)
    // batch session_window equivalent, restricted to finalized sessions
    val batch = EventStreams.sessions30m(t(spark, sfTiny, "events"))
      .filter(col("session_end_us") / 1000000L <= cutoffS)
    val key = Seq(col("user_id"), col("session_start_us"))
    assert(batch.count() > 100)
    assert(streamed.orderBy(key: _*).collect().toSeq == batch.orderBy(key: _*).collect().toSeq)
  }

  test("flatMapGroupsWithState anomaly flags match batch expanding-mean computation") {
    import spark.implicits._
    val src = graft.queries.Tables
      .normalizeTs(
        spark.readStream
          .schema(EventStreams.eventsSchema(spark, eventsDir))
          .parquet(eventsDir)
      )
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.EventRow]
    val q = EventStreams
      .flagAnomalies(src, factor = 2.0, minN = 5)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("anom")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("select * from anom")

    // batch equivalent: expanding mean over PRIOR events per user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy("ts", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val batch = t(spark, sfTiny, "events")
      .withColumn("prior_mean", avg("value").over(w))
      .withColumn("prior_n", count(lit(1)).over(w))
      .filter(col("prior_n") >= 5 && col("value") > lit(2.0) * col("prior_mean"))
      .select("event_id", "user_id", "value", "prior_mean")
    assert(batch.count() > 10)
    val key = Seq(col("event_id"))
    val a = streamed.orderBy(key: _*).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val b = batch.orderBy(key: _*).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("streaming curation (quality gate + split assignment) equals the batch operators") {
    import graft.operators.{Scale, TextAnalysis}
    // the stateless curation stages are pure per-row expressions, so they
    // must run UNCHANGED under Structured Streaming in append mode with no
    // state store — the incremental-ingest shape of a corpus pipeline.
    // 3 part files + maxFilesPerTrigger=1 forces 3 micro-batches.
    val docs = t(spark, sfTiny, "documents")
    val dir = java.nio.file.Files.createTempDirectory("docs_stream").toString
    docs.repartition(3).write.mode("overwrite").parquet(dir)
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def curate(df: org.apache.spark.sql.DataFrame) =
      Scale.hashSplit(
        df.filter(TextAnalysis.qualityExpr(col("text")) >= 0.6),
        Seq("doc_id"),
        splits
      ).select("doc_id", "lang", "split")
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val q = curate(stream)
      .writeStream
      .format("memory")
      .queryName("curation_stream")
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("curation_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = curate(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("scoreLinear and bpeCount run unchanged under streaming (stateless parity)") {
    import graft.operators.TextAnalysis
    val docs = t(spark, sfTiny, "documents")
    val dir = java.nio.file.Files.createTempDirectory("docs_score_stream").toString
    docs.repartition(3).write.mode("overwrite").parquet(dir)
    val wts = Array.tabulate(16)(b => ((b * 37) % 101 - 50) / 256.0)
    val merges = Seq(("t", "a"), ("ta", "b"))
    def score(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.scoreLinear(df.select(col("doc_id"), col("text")), "text", wts, 0.25)
        .withColumn("n_bpe", TextAnalysis.bpeCount(col("text"), merges))
        .withColumn(
          "n_kw",
          size(graft.functions.KeywordFunctions.keywordMatches(col("text"), Seq("a", "data", "scan")))
        )
        .select("doc_id", "logit", "keep", "n_bpe", "n_kw")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = score(stream).writeStream
      .format("memory").queryName("score_stream").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("score_stream").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2), r.getInt(3), r.getInt(4))).toSet
    val want = score(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2), r.getInt(3), r.getInt(4))).toSet
    assert(got == want && got.nonEmpty) // exact: 1/256-grid weights, integer counts
  }

  test("perplexityScore under foreachBatch: streamed batches against the static LM == batch scoring") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.DataFrame
    // The deployment shape the train/score split exists for: the bigram LM
    // is a persisted batch artifact (trained once on the reference corpus);
    // every ingest micro-batch scores against it as a plain batch frame.
    // The per-doc NLL aggregation makes this a foreachBatch consumer (the
    // incremental-dedup convention), not a stateless row map.
    val docs = t(spark, sfTiny, "documents")
    val model = TextAnalysis
      .trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
      .localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("ppl_stream").toString
    docs.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = stream.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        got ++= TextAnalysis
          .perplexityScore(df, model, "doc_id", "text")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val want = TextAnalysis
      .perplexityScore(docs, model, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // per-doc scores depend only on the doc and the STATIC model, so the
    // micro-batched union is exactly the batch result — integer Q20 grid,
    // no float wobble to hide behind
    assert(got.toSet == want && got.size == want.size && got.nonEmpty)
  }

  test("scoreKneserNey under foreachBatch: streamed batches against the static LM == batch scoring") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.DataFrame
    // same artifact-scorer contract as the add-one test above: the KN
    // statistics (discount included) are functions of the STATIC model
    // alone, so micro-batched scoring must equal the batch run exactly
    val docs = t(spark, sfTiny, "documents")
    val model = TextAnalysis
      .trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
      .localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("kn_stream").toString
    docs.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = stream.writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        got ++= TextAnalysis
          .scoreKneserNey(df, model, "doc_id", "text")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        ()
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val want = TextAnalysis
      .scoreKneserNey(docs, model, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got.toSet == want && got.size == want.size && got.nonEmpty)
  }

  test("domain filter and bucket tagging run unchanged under streaming (stream-static parity)") {
    import graft.operators.TextAnalysis
    // The production split this pins: domain stats + quantile boundaries
    // come from a nightly BATCH snapshot; the live ingest stream is
    // enforced against them (stream-static anti-join + per-row tagging).
    val docs = t(spark, sfTiny, "documents")
      .withColumn(
        "url",
        concat(
          lit("https://"), col("source"), lit("-"), (col("doc_id") % 13).cast("string"),
          lit(".Example.com/"), col("lang"), lit("/"), col("doc_id").cast("string")
        )
      )
    val wts = Array.tabulate(16)(b => ((b * 37) % 101 - 50) / 256.0)
    val scored = TextAnalysis.scoreLinear(docs, "text", wts, 0.25)
    // batch snapshot: bad domains + tercile boundaries; blocklist an
    // existing domain so the filter provably drops rows at this tiny SF
    val dom0 = scored
      .select(TextAnalysis.urlDomain(col("url")).as("d")).orderBy("d").first().getString(0)
    val bad = TextAnalysis
      .badDomains(scored, "url", "logit", 0.2, blocked = Seq(dom0))
      .localCheckpoint()
    val Array(blo, bhi) = graft.operators.Quantiles
      .quantiles(scored, Nil, "logit", Seq(1.0 / 3, 2.0 / 3), exact = true)
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    def enforce(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis
        .tagBuckets(TextAnalysis.domainFilterAgainst(df, "url", bad), "logit", blo, bhi)
        .select("doc_id", "logit", "bucket")
    val dir = java.nio.file.Files.createTempDirectory("domain_stream").toString
    scored.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(scored.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = enforce(stream).writeStream
      .format("memory").queryName("domain_stream").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("domain_stream").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val want = enforce(scored).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got == want && got.nonEmpty)
    // the filter genuinely dropped something (bad domains exist at this cut)
    assert(got.size < scored.count())
  }

  test("pqEncode and dsirScore run unchanged under streaming (stateless parity)") {
    import graft.operators.{Scale, Similarity}
    // PQ side: encode a streamed embeddings table with a batch-fitted model
    val emb = spark.read.parquet(s"$sfTiny/embeddings.parquet")
    val model = Similarity.pqFit(emb, "vec_id", "embedding", dim = 64, m = 8, nCen = 16, iters = 0)
    val edir = java.nio.file.Files.createTempDirectory("emb_stream").toString
    emb.repartition(3).write.mode("overwrite").parquet(edir)
    val estream = spark.readStream
      .schema(emb.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(edir)
    val eq = Similarity
      .pqEncode(estream, "vec_id", "embedding", model)
      .writeStream
      .format("memory")
      .queryName("pq_stream")
      .outputMode("append")
      .start()
    try eq.processAllAvailable()
    finally eq.stop()
    val gotPq = spark
      .table("pq_stream")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList, r.getDouble(2)))
      .toSet
    val wantPq = Similarity
      .pqEncode(emb, "vec_id", "embedding", model)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList, r.getDouble(2)))
      .toSet
    assert(gotPq == wantPq && gotPq.nonEmpty) // codes are ints, norms one fold — exact

    // DSIR side: score a streamed corpus with a batch-fitted λ
    val docs = t(spark, sfTiny, "documents")
    val lam = Scale.dsirFit(docs, docs.filter(col("doc_id") % 7 === 0), "text", buckets = 256)
    val ddir = java.nio.file.Files.createTempDirectory("docs_dsir_stream").toString
    docs.repartition(3).write.mode("overwrite").parquet(ddir)
    val dstream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ddir)
    val dq = dstream
      .select(col("doc_id"), Scale.dsirScore(col("text"), lam).as("w"))
      .writeStream
      .format("memory")
      .queryName("dsir_stream")
      .outputMode("append")
      .start()
    try dq.processAllAvailable()
    finally dq.stop()
    val gotW = spark.table("dsir_stream").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val wantW = docs
      .select(col("doc_id"), Scale.dsirScore(col("text"), lam).as("w"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .toSet
    assert(gotW == wantW && gotW.nonEmpty) // grid λ → exact fold at any batching
  }

  test("curateStream: quality + watermark-bounded exact dedup + split — batch parity") {
    import graft.operators.{Pipeline, TextAnalysis}
    // every doc arrives TWICE across 2 files; 1-file triggers force the
    // duplicate into a LATER micro-batch, so the dedup must be the keyed
    // state store, not within-batch dropDuplicates
    val base = t(spark, sfTiny, "documents")
      .withColumn("ingest_ts", expr("timestamp_seconds(1700000000 + doc_id % 60)"))
    val stage = java.nio.file.Files.createTempDirectory("docs_dupstage")
    base.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = java.nio.file.Files.list(stage)
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    val dir = java.nio.file.Files.createTempDirectory("docs_dupstream")
    java.nio.file.Files.copy(part, dir.resolve("a.parquet"))
    java.nio.file.Files.copy(part, dir.resolve("b.parquet"))
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val gate = TextAnalysis.qualityExpr(col("text")) >= 0.6
    val stream = spark.readStream
      .schema(base.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    val q = Pipeline
      .curateStream(stream, "doc_id", "text", "ingest_ts", "2 hours", gate, splits)
      .select("doc_id", "lang", "split")
      .writeStream
      .format("memory")
      .queryName("curate_stream")
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("curate_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // batch path: same call on the doubled frame degenerates to
    // dropDuplicates — identical duplicate rows make the survivor identical
    val want = Pipeline
      .curateStream(base.unionAll(base), "doc_id", "text", "ingest_ts", "2 hours", gate, splits)
      .select("doc_id", "lang", "split")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == want && got.nonEmpty)
    // every quality survivor appears exactly once despite arriving twice
    val nGot = spark.table("curate_stream").count()
    assert(nGot == got.size.toLong, s"streamed output has duplicates: $nGot rows, ${got.size} distinct")
  }

  test("sliding-window explode runs unchanged under streaming; windowed agg parity") {
    import graft.operators.TimeOps
    // slide is a pure per-row generate (no state), so it must run under
    // Structured Streaming as-is; the grouped hopping aggregate over it
    // finalizes with a watermark like any event-time window.
    val ev = t(spark, sfTiny, "events").select(col("event_id"), col("ts"), col("value"))
    val dir = java.nio.file.Files.createTempDirectory("slide_stream").toString
    ev.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    // stateless parity: exploded (event_id, window_start) row set identical
    val q = TimeOps.slide(stream, "ts", 300_000_000_000L, 100_000_000_000L)
      .select("event_id", "window_start")
      .writeStream.format("memory").queryName("slide_stream").outputMode("append").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("slide_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = TimeOps.slide(ev, "ts", 300_000_000_000L, 100_000_000_000L)
      .select("event_id", "window_start").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("incrementalNearDup under foreachBatch: growing index across micro-batches == sequential replay") {
    import graft.operators.Dedup
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    // The operator's real deployment shape: each micro-batch dies against
    // the index of everything accepted SO FAR, survivors' signatures are
    // appended (in production a Delta/parquet MERGE; here a driver var +
    // localCheckpoint to truncate lineage), and acceptance decisions made
    // in batch n are visible to batch n+1. foreachBatch is the documented
    // home for exactly this read-modify-write-a-table pattern.
    val a = (1 to 30).map(i => s"a$i").mkString(" ")
    val b = (100 to 129).map(i => s"b$i").mkString(" ")
    val c = (200 to 229).map(i => s"c$i").mkString(" ")
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq((0L, a), (1L, a)), // 1 is an exact within-batch dup of 0
      Seq((10L, a + " zz1 zz2"), (11L, b), (12L, b)), // 10 near-dups the INDEXED 0
      Seq((20L, b), (21L, c)) // 20 exact-copies survivor 11 from the PRIOR batch
    )
    val emptyIndex = Dedup
      .minhashSignatures(Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", 8)
    def step(index: DataFrame, batch: DataFrame): (DataFrame, Seq[Long]) = {
      val surv = Dedup.incrementalNearDup(batch, index, "doc_id", "text")
      val nextIndex = index.union(Dedup.minhashSignatures(surv, "doc_id", "text", 8)).localCheckpoint()
      (nextIndex, surv.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted)
    }
    // sequential ground truth over the static frames
    val expected = batches
      .scanLeft((emptyIndex, Seq.empty[Long])) { case ((idx, _), rows) =>
        step(idx, rows.toDF("doc_id", "text"))
      }
      .drop(1)
      .flatMap(_._2)
    assert(expected == Seq(0L, 11L, 21L), s"planted truth drifted: $expected")
    // streamed: one MemoryStream batch at a time through foreachBatch
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    var index = emptyIndex
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = mem
      .toDF()
      .toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val (next, ids) = step(index, df)
        index = next
        accepted ++= ids
        ()
      }
      .start()
    try batches.foreach { rows => mem.addData(rows); q.processAllAvailable() }
    finally q.stop()
    assert(accepted.toSeq == expected, s"streamed $accepted != sequential $expected")
  }

  test("incrementalSemDedup under foreachBatch: growing cell index across micro-batches == sequential replay") {
    import graft.operators.Similarity
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    // frozen centroid frame — the semIndex contract across all batches
    val cen = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("id", "v")
    val va = Seq(1f, 0.02f); val vb = Seq(0.02f, 1f); val vc = Seq(1f, 1f)
    val batches: Seq[Seq[(Long, Seq[Float])]] = Seq(
      Seq((0L, va), (1L, va.map(_ * 2f))), // 1 is a scaled dup of 0 within the batch
      Seq((10L, va.map(_ * 4f)), (11L, vb)), // 10 near-dups the INDEXED 0
      Seq((20L, vb.map(_ * 2f)), (21L, vc)) // 20 copies survivor 11 from the PRIOR batch; 21 novel
    )
    val emptyIndex =
      Similarity.semIndex(Seq.empty[(Long, Seq[Float])].toDF("id", "v"), "id", "v", cen)
    def step(index: DataFrame, batch: DataFrame): (DataFrame, Seq[Long]) = {
      val surv = Similarity.incrementalSemDedup(batch, index, cen, "id", "v", 0.95)
      val next = index.unionByName(Similarity.semIndex(surv, "id", "v", cen)).localCheckpoint()
      (next, surv.select("id").collect().map(_.getLong(0)).toSeq.sorted)
    }
    // sequential ground truth over the static frames
    val expected = batches
      .scanLeft((emptyIndex, Seq.empty[Long])) { case ((idx, _), rows) =>
        step(idx, rows.toDF("id", "v"))
      }
      .drop(1)
      .flatMap(_._2)
    assert(expected == Seq(0L, 11L, 21L), s"planted truth drifted: $expected")
    // streamed: one MemoryStream batch at a time through foreachBatch
    val mem =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])](spark)
    var index = emptyIndex
    val accepted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = mem
      .toDF()
      .toDF("id", "v")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val (next, ids) = step(index, df)
        index = next
        accepted ++= ids
        ()
      }
      .start()
    try batches.foreach { rows => mem.addData(rows); q.processAllAvailable() }
    finally q.stop()
    assert(accepted.toSeq == expected, s"streamed $accepted != sequential $expected")
    // a long-running stream must not accumulate cached partitions: the
    // per-call assigned-batch cache is unpersisted inside the operator
    // (CacheManager-pinned persists are never GC-collected — the round-14
    // leak), and the checkpointed evidence/index RDDs are ContextCleaner-
    // collected once unreferenced. Only the final index checkpoint (still
    // referenced by `index`) may remain above the pre-stream baseline.
    index = null
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val deadline = System.currentTimeMillis() + 30000
    var now = persisted
    while (now > persistedBefore && System.currentTimeMillis() < deadline) {
      System.gc(); Thread.sleep(200); now = persisted
    }
    assert(
      now <= persistedBefore,
      s"persisted RDDs leaked across micro-batches: before=$persistedBefore after=$now"
    )
  }

  test("nearDupStream: streamed LSH near-dup removal, planted dups straddling micro-batches") {
    import graft.streaming.DedupStreams
    // transformWithState prerequisite
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    try {
      import spark.implicits._
      // corpus: 40 patterns x 4 copies; copy c of pattern g is doc 100*c+g,
      // arrives in micro-batch c (4 files), ts base+c seconds — EVERY
      // duplicate pair straddles micro-batches. Copies 0/1 are exact text;
      // copy 2 appends one word (near-dup, not exact); copy 3 prepends one
      // (ditto). Plus 5 docs with unique vocab (must all survive) and 3
      // docs under 3 words (no shingles — bypass survivors).
      def text(g: Int, c: Int): String = {
        val base = (0 until 12).map(j => s"g${g}w$j")
        (c match {
          case 2 => base :+ s"g${g}tail"
          case 3 => s"g${g}head" +: base
          case _ => base
        }).mkString(" ")
      }
      val rows =
        (for (c <- 0 until 4; g <- 0 until 40)
          yield (100L * c + g, c, text(g, c))) ++
          (0 until 5).map(i => (500L + i, i % 4, (0 until 12).map(j => s"u${i}w$j").mkString(" "))) ++
          (0 until 3).map(i => (600L + i, i % 4, s"tiny$i doc"))
      val base = 1700000000L
      val df = rows
        .toDF("doc_id", "batch", "text")
        .withColumn("ts", expr(s"timestamp_seconds($base + batch)"))
      val dir = java.nio.file.Files.createTempDirectory("neardup_stream")
      def stage(frame: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
        val s = java.nio.file.Files.createTempDirectory(s"nd_stage_$name")
        frame.coalesce(1).write.mode("overwrite").parquet(s.toString)
        val part = java.nio.file.Files
          .list(s)
          .filter(_.toString.endsWith(".parquet"))
          .findFirst()
          .get()
        val dst = dir.resolve(s"$name.parquet")
        java.nio.file.Files.copy(part, dst)
        // FileStreamSource orders by mtime — pin it so micro-batch order
        // is the arrival order the replay assumes
        java.nio.file.Files.setLastModifiedTime(
          dst,
          java.nio.file.attribute.FileTime.fromMillis(mtime)
        )
      }
      (0 until 4).foreach { c =>
        stage(
          df.filter(col("batch") === c).select("doc_id", "ts", "text"),
          s"b$c",
          1000000000000L + c * 60000L
        )
      }
      // TWO sentinel batches far in the future: with chained stateful
      // operators the downstream aggregate EVICTS with the previous
      // batch's watermark (one trigger behind), so finalizing the real
      // windows takes one batch to advance the watermark and one more to
      // apply it
      // sentinels need shingles: the watermark node sits on the stateful
      // branch, so only docs that reach it advance the watermark
      Seq(9, 10).foreach { s =>
        stage(
          Seq((9990L + s, (0 until 12).map(j => s"sent${s}w$j").mkString(" ")))
            .toDF("doc_id", "text")
            .withColumn("ts", expr(s"timestamp_seconds($base + ${s * 86400})"))
            .select("doc_id", "ts", "text"),
          s"b$s",
          1000000000000L + s * 60000L
        )
      }
      val schema = df.select("doc_id", "ts", "text").schema
      val stream = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
      val q = DedupStreams
        .nearDupStream(stream, "doc_id", "text", "ts", "30 seconds", threshold = 0.75)
        .writeStream
        .format("memory")
        .queryName("neardup_stream")
        .outputMode("append")
        .start()
      try q.processAllAvailable()
      finally q.stop()
      // sentinels are shingle-less (stateless bypass) — drop them before
      // comparing; the replay covers only the real corpus
      val got = spark
        .table("neardup_stream")
        .select("doc_id")
        .collect()
        .map(_.getLong(0))
        .toSet
        .filter(_ < 1000L)

      // LOCAL sequential replay of the operator's contract — same hash
      // family, banding, estimator, first-arrival-wins — as the oracle
      def tokenHash60(s: String): Long = {
        val hex = java.security.MessageDigest
          .getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
          .map("%02x".format(_))
          .mkString
        java.lang.Long.parseLong(hex.substring(17, 32), 16)
      }
      def sig(t: String): Option[Seq[Long]] = {
        val w = t.split(" ")
        if (w.length < 3) None
        else {
          val hs = (0 to w.length - 3)
            .map(i =>
              tokenHash60(s"${w(i)} ${w(i + 1)} ${w(i + 2)}") % graft.operators.Dedup.MinhashHashMod + 1
            )
          Some((0 until 8).map { i =>
            hs.map(h =>
              (graft.operators.Dedup.minhashA(i) * h + graft.operators.Dedup.minhashB(i)) %
                graft.operators.Dedup.MinhashP2
            ).min
          })
        }
      }
      val anchors = scala.collection.mutable.Map.empty[(Int, Long, Long), List[Seq[Long]]]
      val expected = rows
        .sortBy(r => (r._2, r._1)) // (ts, docId) order — ts == batch second
        .flatMap { case (id, _, t) =>
          sig(t) match {
            case None => Some(id) // shingle-less bypass
            case Some(sg) =>
              val buckets = (0 until 4).map(b => (b, sg(2 * b), sg(2 * b + 1)))
              val matched = buckets.exists(bk =>
                anchors.getOrElse(bk, Nil).exists(a => a.zip(sg).count { case (x, y) => x == y } >= 6)
              )
              if (!matched) buckets.foreach(bk => anchors(bk) = sg :: anchors.getOrElse(bk, Nil))
              if (matched) None else Some(id)
          }
        }
        .toSet
      assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
      // the planted structure actually exercised what it claims:
      // pattern copies died, uniques and tiny docs survived
      assert((0 until 40).forall(g => got.contains(g.toLong) && !got.contains(100L + g)))
      assert((0 until 5).forall(i => got.contains(500L + i)) && (0 until 3).forall(i => got.contains(600L + i)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("curateIncremental under foreachBatch: full composed pipeline == sequential replay, both indexes grow") {
    import graft.operators.{Dedup, Pipeline, Similarity}
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    // planted corpus: text dups and vector dups straddle batch boundaries;
    // quality and domain junk salted in
    val ta = (1 to 30).map(i => s"a$i").mkString(" ")
    val tb = (100 to 129).map(i => s"b$i").mkString(" ")
    val tc = (200 to 229).map(i => s"c$i").mkString(" ")
    val td = (300 to 329).map(i => s"d$i").mkString(" ")
    val va = Seq(1f, 0.02f); val vb = Seq(0.02f, 1f); val vc = Seq(1f, 1f)
    val good = "https://good.example.com/x"
    val bad = "https://spam.example.com/x"
    val batches: Seq[Seq[(Long, String, String, Seq[Float])]] = Seq(
      Seq(
        (0L, ta, good, va),
        (1L, ta, good, vb), // exact text dup of 0 within the batch -> drops
        (2L, "short", good, va), // quality gate (under 3 tokens)
        (3L, tb, bad, vb) // bad domain -> drops before any dedup
      ),
      Seq(
        (10L, ta, good, vc), // text dup of INDEXED 0 -> drops
        (11L, tb, good, vb), // novel text (3 died at the gate), novel vec
        (12L, tc, good, vb.map(_ * 2f)) // novel text, but vec copies 11 IN-BATCH -> drops
      ),
      Seq(
        // tc is NOVEL to the text index (12 dropped before indexing), but
        // the vec copies INDEXED 0 -> semantic index kill
        (20L, tc, good, va.map(_ * 3f)),
        // novel text; vc assigns to cell 0 (tie -> lowest centroid) with
        // cosine ~0.72 vs indexed va — below threshold, survives
        (21L, (400 to 429).map(i => s"e$i").mkString(" "), good, vc.map(_ * 2f)),
        (22L, td, good, Seq(0f, 0f)) // zero-norm vec: passes semantic stage
      )
    )
    val quality = size(split(col("text"), " ")) >= 3
    val splits = Seq(("train", 0.8), ("val", 0.2))
    val badDomains = Seq("spam.example.com").toDF("domain")
    val cen = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("id", "v")
      .toDF("doc_id", "vec")
    val emptyMinhash = Dedup
      .minhashSignatures(Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", 8)
    val emptySem = Similarity.semIndex(
      Seq.empty[(Long, Seq[Float])].toDF("doc_id", "vec"), "doc_id", "vec", cen)
    def step(mh: DataFrame, sem: DataFrame, batch: DataFrame)
        : (DataFrame, DataFrame, Seq[(Long, String)]) = {
      val r = Pipeline.curateIncremental(
        batch, mh, sem, cen, badDomains,
        "doc_id", "text", "url", "vec", quality, splits)
      val ids = r.survivors.select("doc_id", "split").collect()
        .map(x => (x.getLong(0), x.getString(1))).sortBy(_._1).toSeq
      (
        mh.union(r.minhashDelta).localCheckpoint(),
        sem.unionByName(r.semDelta).localCheckpoint(),
        ids
      )
    }
    // sequential ground truth (a fold, not scanLeft: retaining every
    // intermediate index frame would pin its checkpoint blocks and void
    // the leak assertion below)
    var seqMh = emptyMinhash
    var seqSem = emptySem
    val expected = batches.flatMap { rows =>
      val (m2, s2, ids) = step(seqMh, seqSem, rows.toDF("doc_id", "text", "url", "vec"))
      seqMh = m2; seqSem = s2; ids
    }
    val expectedIds = expected.map(_._1)
    // planted truth: 0 survives b1; 11 survives b2 (10 text-dups indexed 0,
    // 12 vec-copies 11 in-batch); in b3, 20's vec copies INDEXED 0 -> drops,
    // 21's text is novel and vec copies nothing indexed (vc never entered
    // the index: 12 dropped), 22 is zero-norm -> both survive
    assert(expectedIds == Seq(0L, 11L, 21L, 22L), s"planted truth drifted: $expected")
    // split tags are the deterministic hashSplit assignment — nonempty check
    assert(expected.forall(p => p._2 == "train" || p._2 == "val"))
    // streamed: one MemoryStream batch at a time through foreachBatch
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String, Seq[Float])](spark)
    var mh = emptyMinhash
    var sem = emptySem
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = mem
      .toDF()
      .toDF("doc_id", "text", "url", "vec")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val (m2, s2, ids) = step(mh, sem, df)
        mh = m2; sem = s2; accepted ++= ids
        ()
      }
      .start()
    try batches.foreach { rows => mem.addData(rows); q.processAllAvailable() }
    finally q.stop()
    assert(accepted.toSeq == expected, s"streamed $accepted != sequential $expected")
    // no cached-partition accumulation across micro-batches (both
    // incremental stages release their per-batch caches; checkpointed
    // index/evidence RDDs are ContextCleaner-collected once unreferenced)
    mh = null; sem = null; seqMh = null; seqSem = null
    def persisted = spark.sparkContext.getPersistentRDDs.size
    val deadline = System.currentTimeMillis() + 30000
    var now = persisted
    while (now > persistedBefore && System.currentTimeMillis() < deadline) {
      System.gc(); Thread.sleep(200); now = persisted
    }
    assert(
      now <= persistedBefore,
      s"persisted RDDs leaked across micro-batches: before=$persistedBefore after=$now"
    )
  }

  test("lmGate → curateIncremental: streamed LM-gated curation == sequential, straddling batches") {
    import graft.operators.{Dedup, Pipeline, Similarity, TextAnalysis}
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    // persisted reference LM: four sentences sharing NO word 3-gram (so
    // distinct texts can never LSH-collide), each seen 10x
    val s1 = "the cat sat on the mat"
    val s2 = "a dog ran in a park"
    val s3 = "birds fly over tall green trees"
    val s4 = "fish swim under cold dark water"
    val g1 = "mat the on sat cat the" // reversal: unseen transitions
    val g2 = "park a in ran dog a"
    val ref = Seq(s1, s2, s3, s4).zipWithIndex
      .flatMap { case (s, i) => (0 until 10).map(k => (i * 100L + k, s)) }
      .toDF("doc_id", "text")
    val lm = TextAnalysis.trainBigramLm(ref, "doc_id", "text").localCheckpoint()
    // offline threshold calibration, the CCNet deployment shape: natural
    // text must separate from garble under the persisted model, and the
    // gate constant is the midpoint
    val probe = Seq((0L, s1), (1L, s2), (2L, s3), (3L, s4), (4L, "the cat"),
      (10L, g1), (11L, g2)).toDF("doc_id", "text")
    val ce = TextAnalysis.scoreKneserNey(probe, lm, "doc_id", "text")
      .select("doc_id", "ce_bits").as[(Long, Double)].collect().toMap
    val maxNat = (0L to 4L).map(ce).max
    val minGar = Seq(10L, 11L).map(ce).min
    assert(maxNat < minGar, s"LM does not separate: natural <= $maxNat, garble >= $minGar")
    val thr = (maxNat + minGar) / 2
    // planted batches: tail-perplexity docs AND text/vec dups straddle the
    // micro-batch boundaries
    val good = "https://good.example.com/x"
    val bad = "https://spam.example.com/x"
    val va = Seq(1f, 0.02f); val vb = Seq(0.02f, 1f); val vc = Seq(1f, 1f)
    val batches: Seq[Seq[(Long, String, String, Seq[Float])]] = Seq(
      Seq(
        (0L, s1, good, va), // survives
        (1L, g1, good, vb), // LM gate (tail perplexity) -> never indexed
        (2L, "the cat", good, vb), // natural-scoring but < 3 tokens -> quality gate
        (3L, s2, bad, vb) // passes LM, bad domain -> never indexed
      ),
      Seq(
        (10L, s1, good, vc), // text dup of INDEXED 0 -> minhash kill
        (11L, s2, good, vb), // novel (3 died at the domain gate) -> survives
        (12L, g2, good, vb) // LM gate, straddled garble
      ),
      Seq(
        (20L, s4, good, va.map(_ * 3f)), // novel text, vec copies INDEXED 0 -> sem kill
        (21L, s3, good, vc), // cell 0 (tie -> lowest id), cos vs va ~0.72 -> survives
        (22L, g1, good, Seq(0f, 0f)) // g1 was never indexed; the gate kills it AGAIN
      )
    )
    val quality = size(split(col("text"), " ")) >= 3
    val splits = Seq(("train", 0.8), ("val", 0.2))
    val badDomains = Seq("spam.example.com").toDF("domain")
    val cen = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("doc_id", "vec")
    val emptyMinhash = Dedup
      .minhashSignatures(Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", 8)
    val emptySem = Similarity.semIndex(
      Seq.empty[(Long, Seq[Float])].toDF("doc_id", "vec"), "doc_id", "vec", cen)
    def step(mh: DataFrame, sem: DataFrame, batch: DataFrame)
        : (DataFrame, DataFrame, Seq[(Long, String)]) = {
      val gated = Pipeline.lmGate(batch, lm, "doc_id", "text", thr)
      val r = Pipeline.curateIncremental(
        gated, mh, sem, cen, badDomains,
        "doc_id", "text", "url", "vec", quality, splits)
      val ids = r.survivors.select("doc_id", "split").collect()
        .map(x => (x.getLong(0), x.getString(1))).sortBy(_._1).toSeq
      (
        mh.union(r.minhashDelta).localCheckpoint(),
        sem.unionByName(r.semDelta).localCheckpoint(),
        ids
      )
    }
    var seqMh = emptyMinhash
    var seqSem = emptySem
    val expected = batches.flatMap { rows =>
      val (m2, s2_, ids) = step(seqMh, seqSem, rows.toDF("doc_id", "text", "url", "vec"))
      seqMh = m2; seqSem = s2_; ids
    }
    assert(expected.map(_._1) == Seq(0L, 11L, 21L), s"planted truth drifted: $expected")
    // streamed: one MemoryStream batch at a time through foreachBatch
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String, Seq[Float])](spark)
    var mh = emptyMinhash
    var sem = emptySem
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = mem
      .toDF()
      .toDF("doc_id", "text", "url", "vec")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val (m2, s2_, ids) = step(mh, sem, df)
        mh = m2; sem = s2_; accepted ++= ids
        ()
      }
      .start()
    try batches.foreach { rows => mem.addData(rows); q.processAllAvailable() }
    finally q.stop()
    assert(accepted.toSeq == expected, s"streamed $accepted != sequential $expected")
  }

  test("contaminationReport under foreachBatch: streamed attribution rows == batch, straddling batches") {
    import graft.operators.Dedup
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    // x157's report is STATELESS per batch given the broadcast reference
    // (per-doc distinct grams never cross docs), so continuous ingestion
    // attribution is the same operator under foreachBatch; this pins the
    // parity with contaminated docs STRADDLING micro-batches — the
    // completing face of the decontamination family (VERDICT r17 Next #8)
    val sa = (1 to 14).map(i => s"qa$i").mkString(" ") // 14 tokens -> two 13-grams
    val sb = (1 to 13).map(i => s"qb$i").mkString(" ") // one 13-gram
    val suites = Seq(("suiteA", sa), ("suiteB", sb)).toDF("suite", "text")
    def filler(d: Int) = (1 to 15).map(i => s"f${d}w$i").mkString(" ")
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq((1L, s"${filler(1)} $sa"), (2L, filler(2))), //        1: both A-grams
      Seq((3L, s"$sb ${filler(3)}"), (4L, s"$sa $sb")), //       3: B; 4: A(2) + B(1)
      Seq((5L, (1 to 13).map(i => s"qa$i").mkString(" ")), //    5: A's first gram only
        (6L, filler(6)))
    )
    val all = batches.flatten.toDF("doc_id", "text")
    val expected = Dedup
      .contaminationReport(all, suites, "doc_id", "text", "suite")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq
    // planted truth, hand-counted
    assert(expected == Seq(
      (1L, "suiteA", 2L), (3L, "suiteB", 1L),
      (4L, "suiteA", 2L), (4L, "suiteB", 1L), (5L, "suiteA", 1L)
    ), s"planted truth drifted: $expected")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
    val q = mem
      .toDF().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        got ++= Dedup
          .contaminationReport(df, suites, "doc_id", "text", "suite")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        ()
      }
      .start()
    try batches.foreach { rows => mem.addData(rows); q.processAllAvailable() }
    finally q.stop()
    assert(got.sortBy(x => (x._1, x._2)).toSeq == expected,
      s"streamed $got != batch $expected")
  }

  test("incrementalSourceOverlap under foreachBatch: summed deltas == one-shot matrix, pairs straddling batches") {
    import graft.operators.Dedup
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    // every near-dup pair is either within one batch (self evidence) or
    // across batches (index evidence when the LATER doc arrives) — the
    // decomposition is exact, so summing per-batch deltas must equal the
    // one-shot sourceOverlap matrix. Planted: an exact pair WITHIN batch 0
    // (cc internal), a cross-source pair straddling batches 0->1
    // (cc -> c4), a cross-source pair straddling 0->2 (cc -> wiki), and a
    // within-batch-2 cross-source pair (c4, wiki); uniques salt every batch.
    def t12(p: String) = (1 to 12).map(i => s"$p$i").mkString(" ")
    val batches: Seq[Seq[(Long, String, String)]] = Seq(
      Seq((1L, "cc", t12("a")), (2L, "cc", t12("a")), (3L, "cc", t12("b")),
        (4L, "wiki", t12("u"))),
      Seq((10L, "c4", t12("a")), (11L, "c4", t12("v"))),
      Seq((20L, "wiki", t12("b")), (21L, "c4", t12("w")), (22L, "wiki", t12("w")))
    )
    val all = batches.flatten.toDF("doc_id", "source", "text")
    val expected = Dedup
      .sourceOverlap(all, "doc_id", "text", "source", minEstJaccard = 1.0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    // planted truth: (1,2) cc-cc; (1,10)+(2,10) cc-c4; (3,20) cc-wiki;
    // (21,22) c4-wiki
    assert(expected == Seq(
      ("c4", "cc", 2L), ("c4", "wiki", 1L), ("cc", "cc", 1L), ("cc", "wiki", 1L)
    ), s"planted truth drifted: $expected")
    val emptyIdx = Dedup
      .minhashSignatures(Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text", 8)
      .withColumn("source", lit(""))
    var idx: DataFrame = emptyIdx
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String)](spark)
    val q = mem
      .toDF().toDF("doc_id", "source", "text")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val delta = Dedup.incrementalSourceOverlap(
          df, idx, "doc_id", "text", "source", minEstJaccard = 1.0)
        acc ++= delta.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        idx = idx.unionByName(
          Dedup.minhashSignatures(df, "doc_id", "text", 8)
            .join(df.select("doc_id", "source"), Seq("doc_id"))
        ).localCheckpoint()
        ()
      }
      .start()
    try batches.foreach { rows => mem.addData(rows); q.processAllAvailable() }
    finally q.stop()
    val summed = acc.groupBy(x => (x._1, x._2)).map { case ((a, b), xs) =>
      (a, b, xs.map(_._3).sum)
    }.toSeq.sortBy(x => (x._1, x._2))
    assert(summed == expected, s"streamed deltas $summed != one-shot $expected")
  }

  test("corpusDatasheetIncremental under foreachBatch: every prefix card == one-shot card, novelty flips retroactively") {
    import graft.operators.Pipeline
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    val sa = (1 to 13).map(i => s"qa$i").mkString(" ")
    val suites = Seq(("sA", sa)).toDF("suite", "text")
    // doc 4 (batch 2) reuses doc 1's (batch 0) shingle "x y z" — the df
    // index must RETROACTIVELY strip that shingle's novelty from src1's
    // card; doc 5 embeds the suite gram (contamination); langs mix for
    // the top-lang column
    val batches: Seq[Seq[(Long, String, String, String)]] = Seq(
      Seq((1L, "src1", "en", "x y z a b"), (2L, "src2", "en", "p q r")),
      Seq((3L, "src1", "de", "m n o"), (5L, "src2", "de", s"w1 w2 $sa")),
      Seq((4L, "src2", "en", "x y z c d"))
    )
    def cardOf(rows: Seq[(Long, String, String, String)]): Seq[String] =
      Pipeline
        .corpusDatasheet(
          rows.toDF("doc_id", "source", "lang", "text"), suites,
          "doc_id", "text", "source", "lang", "suite")
        .orderBy("source").collect().map(_.toString).toSeq
    var dfIdx: DataFrame = Seq.empty[(String, Long, String)].toDF("s", "df", "owner")
    var stats: DataFrame = Seq.empty[(String, String, Long, Long, Long, Long, Long)]
      .toDF("source", "lang", "docs", "toks", "nq", "nc", "nsh")
    val cards = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, String, String)](spark)
    val q = mem
      .toDF().toDF("doc_id", "source", "lang", "text")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val r = Pipeline.corpusDatasheetIncremental(
          df, dfIdx, stats, suites, "doc_id", "text", "source", "lang", "suite")
        cards += r.card.orderBy("source").collect().map(_.toString).toSeq
        dfIdx = r.dfIndex.localCheckpoint()
        stats = r.statsIndex.localCheckpoint()
        ()
      }
      .start()
    try batches.foreach { rows => mem.addData(rows); q.processAllAvailable() }
    finally q.stop()
    // EVERY prefix card equals the one-shot batch datasheet over that prefix
    batches.indices.foreach { k =>
      val want = cardOf(batches.take(k + 1).flatten)
      assert(cards(k) == want, s"prefix $k: streamed ${cards(k)} != batch $want")
    }
    // and the flip is real: src1's novelty DROPS when batch 2 lands (doc 4
    // reuses "x y z"), with no src1 doc in that batch
    def novelty(card: Seq[String], src: String): String =
      card.find(_.startsWith(s"[$src")).get.split(",").last
    assert(novelty(cards(1), "src1") != novelty(cards(2), "src1"),
      s"novelty did not flip retroactively: ${cards(1)} vs ${cards(2)}")
  }

  test("unimaxMixIncremental under foreachBatch: every prefix allocation == one-shot, regimes flip") {
    import graft.operators.Scale
    import org.apache.spark.sql.DataFrame
    import spark.implicits._
    // prefix 1: a=10/b=10 — both capped (budget past all caps, m == s);
    // prefix 2: b grows, c arrives — only a stays capped; prefix 3: c
    // dominates — a UN-caps (allocations are snapshots, not monotone).
    // Null source and non-positive tokens salt the batches (excluded).
    val batches: Seq[Seq[(Long, String, Long)]] = Seq(
      Seq((1L, "a", 10L), (2L, "b", 10L)),
      Seq((3L, "b", 40L), (4L, "c", 25L), (90L, null, 9L)),
      Seq((5L, "c", 125L), (6L, "a", 5L), (91L, "b", -2L))
    )
    val B = 60L
    def oneShot(rows: Seq[(Long, String, Long)]): Seq[String] =
      Scale
        .unimaxMix(rows.toDF("doc_id", "source", "n_tokens"), "source", "n_tokens", B, 2)
        .orderBy("source").collect().map(_.toString).toSeq
    var idx: DataFrame = Seq.empty[(String, Long, Long)].toDF("source", "n", "t")
    val snaps = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val cappedBy = scala.collection.mutable.ArrayBuffer.empty[Map[String, Boolean]]
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)](spark)
    val q = mem
      .toDF().toDF("doc_id", "source", "n_tokens")
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val r = Scale.unimaxMixIncremental(df, idx, "source", "n_tokens", B, 2)
        val rows = r.allocation.orderBy("source").collect()
        snaps += rows.map(_.toString).toSeq
        cappedBy += rows.map(x => x.getString(0) -> x.getBoolean(4)).toMap
        idx = r.statsIndex.localCheckpoint()
        ()
      }
      .start()
    try batches.foreach { rows => mem.addData(rows); q.processAllAvailable() }
    finally q.stop()
    batches.indices.foreach { i =>
      val want = oneShot(batches.take(i + 1).flatten)
      assert(snaps(i) == want, s"prefix ${i + 1}: streamed ${snaps(i)} != one-shot $want")
    }
    // the planted regime flips really happened
    assert(cappedBy(0) == Map("a" -> true, "b" -> true), s"prefix 1: ${cappedBy(0)}")
    assert(cappedBy(1)("a") && !cappedBy(1)("b") && !cappedBy(1)("c"), s"prefix 2: ${cappedBy(1)}")
    assert(!cappedBy(2)("a"), s"prefix 3 must un-cap a: ${cappedBy(2)}")
  }

  test("tumbling agg matches the x12 declared query buckets") {
    val viaWindow = EventStreams.tumbling5m(t(spark, sfTiny, "events"))
      .select("bucket_s", "event_type", "n")
    val viaArithmetic = t(spark, sfTiny, "events")
      .groupBy(expr("(ts div 300000000000) * 300").as("bucket_s"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(
      viaWindow.orderBy("bucket_s", "event_type").collect().toSeq ==
        viaArithmetic.orderBy("bucket_s", "event_type").collect().toSeq
    )
  }
}
