package graft.tools

import graft.Sessions

/** Scratch main for ad-hoc driving (see .claude/skills/verify/SKILL.md).
  * Default: the driver's smoke — run SparkEntry.entry. With args: micro-
  * bench the named queries at sf0.1 (3 runs each; min is the number to
  * trust — full-bench totals carry ±20% machine noise). */
object Spike {
  /** `runMain graft.tools.Spike zarr-scale` — write a ~100 MB blosc-lz4
    * Zarr store, then measure full-scan + aggregate throughput through the
    * DSv2 source (ordinal-range partitions + executor blosc decode). */
  private def zarrScale(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("zarrscale").toString
    val dir = graft.sources.zarr.ZarrStoreWriter.writeGroup(root)
    // 400 x 250 x 250 = 25M f4 cells (~100 MB raw), 8 x 50 x 50 chunks -> 1250 chunks
    val t0 = System.nanoTime()
    graft.sources.zarr.ZarrStoreWriter.writeArray(
      dir, "v", Vector(400, 250, 250), Vector(8, 50, 50), "<f4",
      flat => (flat % 9973) * 0.5,
      dims = Some(Vector("t", "y", "x")),
      compressor = Some("blosc:lz4")
    )
    val tw = (System.nanoTime() - t0) / 1e9
    val df = new graft.api.ZarrDataReader(spark, root).readArray("v")
    println("[spike] plan: " + df.queryExecution.executedPlan.toString.linesIterator.take(6).mkString(" | "))
    // raw decode throughput: all chunks, single thread, no Spark
    val store = new graft.sources.zarr.ZarrStore(root)
    val m = store.arrayMeta("v")
    val tr = System.nanoTime()
    var cellsRaw = 0L
    for (c0 <- 0 until 50; c1 <- 0 until 5; c2 <- 0 until 5) {
      val b = graft.sources.zarr.ZarrChunkIO.readChunk(store.arrayDir("v"), m, Seq(c0, c1, c2))
      if (b.isDefined) cellsRaw += 20000L
    }
    println(f"[spike] raw 1-thread decode of 1250 chunks: ${(System.nanoTime() - tr) / 1e9}%.2fs")
    def time(label: String)(f: => Unit): Unit = {
      val t = System.nanoTime(); f
      println(f"[spike] $label: ${(System.nanoTime() - t) / 1e9}%.2fs")
    }
    time("value-only sum (coords pruned, cold)")(df.select("value").agg(sum(col("value").cast("double"))).collect())
    time("value-only sum (warm)")(df.select("value").agg(sum(col("value").cast("double"))).collect())
    time("count only (value pruned)")(df.agg(count(lit(1))).collect())
    val t1 = System.nanoTime()
    val agg = df.agg(count(lit(1)), sum(col("value").cast("double"))).collect().head
    val ts = (System.nanoTime() - t1) / 1e9
    val cells = agg.getLong(0)
    println(f"[spike] zarr-scale write=$tw%.1fs scan+agg=$ts%.2fs cells=$cells (${cells / ts / 1e6}%.1f Mcells/s)")
    // selective read: one t-slice -> source must prune to 1/400 of cells
    val t2 = System.nanoTime()
    val sel = new graft.api.ZarrDataReader(spark, root)
      .readArray("v", Map("t" -> graft.model.DimSel.Point(17)))
      .agg(count(lit(1))).collect().head.getLong(0)
    val tsel = (System.nanoTime() - t2) / 1e9
    println(f"[spike] zarr-scale slice scan=$tsel%.2fs cells=$sel")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    if (args.sameElements(Array("zarr-scale"))) { zarrScale(spark); spark.stop(); return }
    if (args.isEmpty) {
      val df = graft.SparkEntry.entry(spark)
      df.show(10, truncate = false)
      println("entry rows=" + df.count())
    } else {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      args.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[spike] $n%-24s min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
