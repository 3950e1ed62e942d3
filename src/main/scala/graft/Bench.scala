package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Benchmark entrypoint: one JSON line with per-query wall time.
  *
  * Noise robustness: each query runs `SPARK_GRAFT_BENCH_RUNS` times
  * (default 2) and the reported number is the per-query MIN — a single
  * contended-machine run otherwise dominates the artifact (round-2's bench
  * showed phantom 4-27x regressions that evaporated under low load). The
  * JSON line also records the 1-minute system load average at start and end
  * so a contaminated run is detectable from the artifact itself.
  *
  * Timeout-proofing (round-16 lesson: the driver's only perf record was
  * LOST to a host-load rc=124 because per-query timings were written only
  * at the end): BENCH_LAST.json is atomically rewritten after EVERY query
  * completes, carrying `"partial": true` until the final write — a killed
  * run always leaves a parsable artifact holding every per-query number
  * measured so far. The clean-run final record keeps the same keys as
  * before (plus the canary/partial fields), and the compact stdout summary
  * stays the process's last line.
  *
  * Noise calibration: a fixed-work CANARY (constant synthetic input, no
  * parquet — range → hash keys → one shuffle → aggregate) runs at every
  * pass boundary. Its wall time moves with host contention but never with
  * repo code, so cross-round query ratios can be read normalized by the
  * canary ratio instead of adjudicated by cross-file load archaeology.
  *
  * Inline-retrain budget: queries in `SPARK_GRAFT_BENCH_HEAVY` (default:
  * the four whole-chain training replays — they retrain per run BY DESIGN;
  * deployment reads persisted artifacts) run in the LAST pass only. That
  * is the "train once per bench process" cost bound: the repeated passes
  * pay for every ordinary query's min-of-runs noise floor without
  * re-paying the training chains, and the artifact lists them under
  * `"single_pass"` so the asymmetry is visible (their one sample is
  * adjudicated against the per-pass canary instead of a second sample).
  * Last, not first: pass 1 pays JVM/codegen warmup (its canary reads ~3x
  * the quiet floor), so a single sample taken there is systematically the
  * worst one.
  */
object Bench {
  private def loadAvg(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  /** Atomic replace: a reader (or a kill) never observes a torn file. */
  private def atomicWrite(path: String, content: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, content)
    java.nio.file.Files.move(
      tmp,
      p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING
    )
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    // load gate: timings from a contended machine are the noisiest artifact
    // of the round — wait (bounded) for the 1-minute load to settle below
    // the threshold before starting; if it never does, proceed but stamp
    // the artifact with "load_warning" so the number is never mistaken for
    // a quiet-box measurement
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_LOAD", "1.5").toDouble
    val loadWaitS = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_WAIT", "180").toInt
    // require SUSTAINED quiet (3 consecutive below-threshold samples, 15 s)
    // before starting, and keep spending the wait budget if load re-spikes —
    // a single dip at the check is exactly how round-9's contaminated run
    // slipped through the gate (load 1.52→2.13 during the run)
    val quietNeeded = 3
    var quiet = if (loadAvg() <= maxLoad) 1 else 0
    var waited = 0
    while (quiet < quietNeeded && waited < loadWaitS) {
      if (waited == 0 && quiet == 0)
        System.err.println(f"[bench] load ${loadAvg()}%.2f > $maxLoad%.1f — waiting up to ${loadWaitS}s for sustained quiet")
      Thread.sleep(5000); waited += 5
      quiet = if (loadAvg() <= maxLoad) quiet + 1 else 0
    }
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val load0 = loadAvg()
    val loadWarning = load0 > maxLoad
    // warm up JIT/codegen/parquet-footer caches so the first measured query
    // doesn't absorb session fixed costs
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count())
    } catch { case _: Throwable => () }
    // noop sink: runs the full physical plan (count() would let Catalyst
    // prune projections and skip the real work).
    // Some((secs)) on success, None on failure — a failed run must never
    // win the min (a fast crash would otherwise report a phantom speedup)
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: $e"); None
      }
    }
    // fixed-work canary: 16M synthetic rows, one hash-keyed shuffle, one
    // aggregate — no parquet, no repo operator, constant by construction.
    // Runs at every pass boundary; its ratio across rounds measures the
    // HOST, so a query ratio divided by the canary ratio reads as code.
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark
        .range(0L, 16000000L, 1L, 32)
        .selectExpr("id % 9973 AS k", "(id * 2654435761) % 1000003 AS v")
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v").as("s"),
          org.apache.spark.sql.functions.count("*").as("c"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // SPARK_GRAFT_BENCH_ONLY=x101_decon_fuzzy,q01_... runs a targeted
    // subset (adjudicating one query's cross-round swing without paying the
    // full suite); the canary still runs at every pass boundary so the
    // subset artifact is load-normalizable like the full one
    val only = sys.env
      .get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq
      .sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // whole-chain training replays retrain inline BY DESIGN (deployment
    // reads persisted artifacts); run them once per process, not per pass
    val heavy = sys.env
      .getOrElse(
        "SPARK_GRAFT_BENCH_HEAVY",
        "x133_train_mix,x144_lm_distill,x146_distill_audit,x147_lm_curate")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    val singlePass = ordered.map(_._1).filter(heavy.contains)
    // run the full suite `runs` times (round-robin, not back-to-back per
    // query) so a transient load spike can't poison both samples of the
    // same query; min-of-runs then discards whichever pass was contended.
    // The load average is sampled at each pass boundary so the artifact
    // itself shows WHICH pass was contended.
    val loadSamples = mutable.ArrayBuffer[Double]()
    val canarySecs = mutable.ArrayBuffer[Double]()
    val samples = mutable.ArrayBuffer[mutable.LinkedHashMap[String, Option[Double]]]()
    // a targeted-subset run writes to /tmp by default so it never clobbers
    // the committed full-suite BENCH_LAST record; likewise a non-default
    // core-count run (the driver's scaling pass) goes to BENCH_LAST_c<N>
    // so it never overwrites the default-cores record (r18 lesson: the
    // 8-core scaling run clobbered the 32-core per-query map and the
    // round's perf comparison went blind)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val lastPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_OUT",
      if (only.nonEmpty) "/tmp/BENCH_SUBSET.json"
      else if (cpus != "32") s"/root/repo/BENCH_LAST_c$cpus.json"
      else "/root/repo/BENCH_LAST.json")

    def fmtD(v: Double): String = f"$v%.6f"
    // the full record from whatever has been measured so far; identical
    // shape for the partial flushes and the final write
    def record(partial: Boolean): String = {
      val done = ordered.map(_._1).filter(n => samples.exists(_.contains(n)))
      val results: Map[String, Double] = done.flatMap { n =>
        val ok = samples.flatMap(_.get(n).flatten)
        if (ok.nonEmpty) Some(n -> ok.min) else None
      }.toMap
      val failed = done.filter(n => samples.flatMap(_.get(n).flatten).isEmpty)
      val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
      val total = if (results.nonEmpty) results.values.sum else 0.0
      // per-query times from EVERY pass (null = that pass failed or was
      // skipped as single_pass), so a single-query swing between rounds is
      // adjudicable from ONE artifact: both passes high = real; one pass
      // high with a high load sample at that pass boundary = load
      val samplesJson = done.map { n =>
        val arr = samples
          .map(_.get(n).flatten.map(fmtD).getOrElse("null"))
          .mkString("[", ",", "]")
        s"\"$n\":$arr"
      }.mkString("{", ",", "}")
      val loadSamplesJson = loadSamples.map(v => f"$v%.2f").mkString("[", ",", "]")
      val canaryJson = canarySecs.map(fmtD).mkString("[", ",", "]")
      val canaryMin = if (canarySecs.nonEmpty) fmtD(canarySecs.min) else "null"
      val singlePassJson = singlePass.map("\"" + _ + "\"").mkString("[", ",", "]")
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"samples":$samplesJson,"load_samples":$loadSamplesJson,"canary_secs":$canaryJson,"canary_sec":$canaryMin,"single_pass":$singlePassJson,"failed":$failedJson,"sf":"$sfDir","runs":$runs,"load_start":$load0,"load_end":${loadAvg()},"load_gate_waited":$waited,"load_warning":$loadWarning,"partial":$partial}"""
    }
    def flushPartial(): Unit =
      try atomicWrite(lastPath, record(partial = true) + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] partial flush failed: $e") }

    (1 to runs).foreach { pass =>
      loadSamples += loadAvg()
      canarySecs += canaryOnce()
      flushPartial()
      val m = mutable.LinkedHashMap[String, Option[Double]]()
      samples += m
      // heavies run in the LAST pass, not the first: pass 1 pays JIT/
      // codegen warmup (its canary reads ~3x the quiet floor), and a
      // single-sample query pinned there would record the systematically
      // WORST sample (r17: x133 17.8s cold vs 4.3s warmed). Within the
      // last pass the heavies go FIRST (ADVICE r17): an interrupt mid-pass
      // then loses only RE-samples of min-of-n queries (which keep their
      // pass-1 numbers) instead of a heavy's ONLY sample.
      val passOrder =
        if (pass == runs) {
          val (h, rest) = ordered.partition { case (n, _) => heavy.contains(n) }
          h ++ rest
        } else ordered.filterNot { case (n, _) => heavy.contains(n) }
      passOrder.foreach { case (n, f) =>
        m(n) = timeOnce(n, f)
        flushPartial()
      }
    }
    loadSamples += loadAvg()
    canarySecs += canaryOnce()
    val json = record(partial = false)
    val results: Map[String, Double] = ordered.map(_._1).flatMap { n =>
      val ok = samples.flatMap(_.get(n).flatten)
      if (ok.nonEmpty) Some(n -> ok.min) else None
    }.toMap
    val failed = ordered.map(_._1).filter(n => samples.flatMap(_.get(n).flatten).isEmpty)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // the round artifact captures a bounded stdout TAIL: stop Spark FIRST so
    // no shutdown log lines follow the JSON, write the full record to a file
    // (r6/r7 artifacts lost 4-5 per-query times off the front of the
    // capture), then emit the JSON as the process's final stdout line
    spark.stop()
    // record which files THIS run actually wrote (env-resolved paths): on a
    // contended or partially-failed run the quiet file is NOT rewritten, so
    // the final summary must point at the file holding this run's record,
    // not a stale quiet reference
    val written = mutable.ArrayBuffer[String]()
    try {
      atomicWrite(lastPath, json + "\n")
      written += lastPath
      // keep the most recent CLEAN run alongside BENCH_LAST so a contaminated
      // latest run never erases the quiet-box reference point — and never
      // let a targeted-subset run (SPARK_GRAFT_BENCH_ONLY) replace the
      // full-suite reference; non-default-core runs keep their own quiet
      // reference file for the same clobbering reason as BENCH_LAST
      if (!loadWarning && failed.isEmpty && only.isEmpty) {
        val quietPath =
          sys.env.getOrElse(
            "SPARK_GRAFT_BENCH_QUIET_OUT",
            if (cpus != "32") s"/root/repo/BENCH_QUIET_c$cpus.json"
            else "/root/repo/BENCH_QUIET.json")
        atomicWrite(quietPath, json + "\n")
        written += quietPath
      }
    } catch { case e: Throwable => System.err.println(s"[bench] result-file write failed: $e") }
    // Print the full record first (human scrollback; includes the per-pass
    // samples), then the FINAL line: the driver-contract JSON with the
    // per-query {name: sec} map INLINE. r17/r18 printed a compact final
    // line without "queries" and the driver's parse came back null two
    // rounds running (PERF per_query: {}) — the per-query map itself is
    // only ~7 KB at 229 queries, so it ships in the final line; the bulky
    // per-pass samples stay in the committed BENCH_LAST/BENCH_QUIET file.
    println(json)
    val loadSamplesJson = loadSamples.map(v => f"$v%.2f").mkString("[", ",", "]")
    val canaryJson = canarySecs.map(fmtD).mkString("[", ",", "]")
    val queriesJson = ordered.map(_._1).flatMap(n => results.get(n).map(v => "\"" + n + "\":" + fmtD(v))).mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$queriesJson,""" +
        s""""n_queries":${results.size},""" +
        s""""failed":$failedJson,"sf":"$sfDir","runs":$runs,""" +
        s""""load_samples":$loadSamplesJson,"canary_secs":$canaryJson,""" +
        s""""load_gate_waited":$waited,""" +
        s""""load_warning":$loadWarning,"queries_files":${written.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    )
  }
}
