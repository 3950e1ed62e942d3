package graft.sources.zarr

import graft.SparkTester
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Chunk-statistics zone maps: the sink records per-chunk [min, max] in the
  * array attrs; the scan prunes chunks whose stats cannot satisfy a value
  * predicate. Planner and readers must make the SAME skip decision, results
  * must equal the unpruned answer, and partition counts must show the
  * pruning actually happened. */
class ZarrChunkStatsSpec extends AnyFunSuite with SparkTester {

  private def tmp(): String = Files.createTempDirectory("zarrstats").toString

  /** Each chunk its own partition, so pruning is visible in getNumPartitions. */
  private def read(root: String, extra: Map[String, String] = Map.empty): DataFrame = {
    var r = spark.read
      .format("zarr")
      .option("path", root)
      .option("array", "v")
      .option("partition.target.cells", "1")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("sink writes per-chunk bounds into array attrs (int domain)") {
    val root = tmp()
    spark.range(0, 100)
      .select(col("id").cast("int").as("i"), (col("id") * 10).as("value"))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "10")
      .mode("append").save()
    val store = new ZarrStore(root, Map.empty, None, None)
    val attr = store.arrayMeta("v").attrs(ZarrChunkStats.AttrKey)
    val doc = ZarrChunkStats.parse(attr).get
    assert(doc.domain == "int" && doc.nChunks == 10)
    assert(doc.boundsI(0L).contains((0L, 90L)))
    assert(doc.boundsI(9L).contains((900L, 990L)))
  }

  test("value predicates prune chunks: fewer partitions, identical results") {
    val root = tmp()
    spark.range(0, 100)
      .select(col("id").cast("int").as("i"), (col("id") * 10).as("value"))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "10")
      .mode("append").save()
    val full = read(root)
    assert(full.rdd.getNumPartitions == 10)
    val q = read(root).filter(col("value") > 850L)
    assert(q.rdd.getNumPartitions == 2) // chunks 8 and 9 survive
    assert(q.orderBy("i").collect().map(_.getLong(1)).toSeq == (86 until 100).map(_ * 10L))
    // conjunction with a dim predicate composes (dim pushdown + zone map)
    val q2 = read(root).filter(col("value") >= 500L && col("i") < 70)
    assert(q2.collect().map(_.getLong(1)).sorted.toSeq == (50 until 70).map(_ * 10L))
    // equality and IN
    assert(read(root).filter(col("value") === 440L).count() == 1)
    assert(read(root).filter(col("value").isin(10L, 530L, 555L)).count() == 2)
  }

  test("unwritten chunks prune via the fill value") {
    val root = tmp()
    // full 10x10 axes, but no input rows in the (i>=5, j<5) rectangle —
    // chunk (1,0) is never written and its cells read as fill 0
    spark.range(0, 100)
      .select(
        (col("id") / 10).cast("int").as("i"),
        (col("id") % 10).cast("int").as("j"),
        (col("id") * 7 + 1).as("value")
      )
      .filter(!(col("i") >= 5 && col("j") < 5))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5,5")
      .mode("append").save()
    val full = read(root)
    assert(full.count() == 100 && full.rdd.getNumPartitions == 4)
    val pos = read(root).filter(col("value") >= 1L)
    assert(pos.rdd.getNumPartitions == 3) // the three written chunks
    assert(pos.count() == 75)
    val zero = read(root).filter(col("value") <= 0L)
    assert(zero.rdd.getNumPartitions == 1) // only the fill chunk
    assert(zero.count() == 25)
  }

  test("float domain: NaN orders greatest, exact parity with post-filtering") {
    val root = tmp()
    spark.range(0, 20)
      .select(
        col("id").cast("int").as("i"),
        when(col("id") >= 15, lit(Double.NaN)).otherwise(col("id").cast("double")).as("value")
      )
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5")
      .mode("append").save()
    val gt = read(root).filter(col("value") > 16.0)
    // chunks 0-2 (max 14) prune; the NaN chunk must survive (NaN > 16 in Spark)
    assert(gt.rdd.getNumPartitions == 1)
    assert(gt.count() == 5 && gt.collect().forall(_.getDouble(1).isNaN))
    val lt = read(root).filter(col("value") < 5.0)
    assert(lt.rdd.getNumPartitions == 1) // only chunk 0; NaN chunk prunes
    assert(lt.orderBy("i").collect().map(_.getDouble(1)).toSeq == (0 until 5).map(_.toDouble))
  }

  test("timestamp values: stats in micros, timestamp literals prune") {
    val root = tmp()
    spark.range(0, 40)
      .select(
        col("id").cast("int").as("i"),
        (col("id") * 3600).cast("timestamp").as("value")
      )
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "10")
      .mode("append").save()
    val cut = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(30L * 3600))
    val q = read(root).filter(col("value") > cut)
    assert(q.rdd.getNumPartitions == 1) // only the last chunk
    assert(q.count() == 9)
  }

  test("chunk_stats=false writes no stats attr; scans still work") {
    val root = tmp()
    spark.range(0, 30)
      .select(col("id").cast("int").as("i"), col("id").as("value"))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "10")
      .option("chunk_stats", "false")
      .mode("append").save()
    val store = new ZarrStore(root, Map.empty, None, None)
    assert(!store.arrayMeta("v").attrs.contains(ZarrChunkStats.AttrKey))
    val q = read(root).filter(col("value") > 25L)
    assert(q.rdd.getNumPartitions == 3) // no stats, no pruning
    assert(q.count() == 4)
  }

  test("sharded v3 stores record per-INNER-chunk bounds and prune inner reads") {
    val root = tmp()
    spark.range(0, 100)
      .select(col("id").cast("int").as("i"), (col("id") * 10).as("value"))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "10")
      .option("zarr_format", "3").option("shards", "20")
      .mode("append").save()
    val store = new ZarrStore(root, Map.empty, None, None)
    val doc = ZarrChunkStats.parse(store.arrayMeta("v").attrs(ZarrChunkStats.AttrKey)).get
    assert(doc.nChunks == 10 && doc.boundsI(3L).contains((300L, 390L)))
    val q = read(root).filter(col("value") > 850L)
    assert(q.rdd.getNumPartitions == 2) // inner chunks 8, 9 (across shards)
    assert(q.orderBy("i").collect().map(_.getLong(1)).toSeq == (86 until 100).map(_ * 10L))
  }

  test("v3 stores carry stats in zarr.json attributes and prune identically") {
    val root = tmp()
    spark.range(0, 100)
      .select(col("id").cast("int").as("i"), (col("id") * 10).as("value"))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "10")
      .option("zarr_format", "3")
      .mode("append").save()
    val q = read(root).filter(col("value") > 850L)
    assert(q.rdd.getNumPartitions == 2)
    assert(q.count() == 14)
  }

  test("min/max/count(value) over a full selection answer from stats: zero tasks") {
    val root = tmp()
    // i-rectangle (i>=5, j<5) never written -> fill 0 cells; global answers
    // must still be exact
    spark.range(0, 100)
      .select(
        (col("id") / 10).cast("int").as("i"),
        (col("id") % 10).cast("int").as("j"),
        (col("id") * 7 + 1).as("value")
      )
      .filter(!(col("i") >= 5 && col("j") < 5))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5,5")
      .mode("append").save()
    val q = read(root).agg(min("value"), max("value"), count("value"), count("*"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"), plan)
    val r = q.collect().head
    assert(r.getLong(0) == 0L) // the fill cells
    assert(r.getLong(1) == 99L * 7 + 1)
    assert(r.getLong(2) == 100L && r.getLong(3) == 100L)
    // a dim predicate makes the selection partial: value aggs fall back to
    // the chunk scan and stay correct
    val partial = read(root).filter(col("i") < 3).agg(min("value"), max("value"))
    assert(partial.queryExecution.executedPlan.toString.contains("BatchScan"))
    val p = partial.collect().head
    assert(p.getLong(0) == 1L && p.getLong(1) == 29L * 7 + 1)
    // float domain with NaN: max is NaN (Spark NaN-greatest), min real
    val rootF = tmp()
    spark.range(0, 20)
      .select(
        col("id").cast("int").as("i"),
        when(col("id") === 7, lit(Double.NaN)).otherwise(col("id").cast("double")).as("value")
      )
      .write.format("zarr")
      .option("path", rootF).option("array", "v").option("chunks", "5")
      .mode("append").save()
    val qf = read(rootF).agg(min("value"), max("value"))
    assert(qf.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val rf = qf.collect().head
    assert(rf.getDouble(0) == 0.0 && rf.getDouble(1).isNaN)
  }

  test("aligned multi-array scans prune via per-column stats (conjunction)") {
    val root = tmp()
    // two sink-written arrays on one 100-cell grid, chunks 10: a = i*10,
    // b = 990 - i*10 (opposite bands, both with stats)
    spark.range(0, 100)
      .select(col("id").cast("int").as("i"), (col("id") * 10).as("value"))
      .write.format("zarr").option("path", root).option("array", "a")
      .option("chunks", "10").mode("append").save()
    spark.range(0, 100)
      .select(col("id").cast("int").as("i"), (lit(990) - col("id") * 10).as("value"))
      .write.format("zarr").option("path", root).option("array", "b")
      .option("chunks", "10").mode("append").save()
    def aligned = spark.read.format("zarr")
      .option("path", root).option("arrays", "a,b")
      .option("partition.target.cells", "1")
      .load()
    assert(aligned.rdd.getNumPartitions == 10)
    // a > 850 -> chunks 8,9; b > 850 -> chunks 0,1; conjunction -> empty
    val qa = aligned.filter(col("a") > 850L)
    assert(qa.rdd.getNumPartitions == 2)
    assert(qa.orderBy("i").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq ==
      (86 until 100).map(i => (i, i * 10L, 990L - i * 10)))
    val qboth = aligned.filter(col("a") > 850L && col("b") > 850L)
    assert(qboth.rdd.getNumPartitions == 0 && qboth.count() == 0)
    val qmid = aligned.filter(col("a") >= 400L && col("b") >= 400L)
    assert(qmid.rdd.getNumPartitions == 2) // chunks 4 and 5 survive both
    assert(qmid.count() == (40 to 59).count(i => i * 10 >= 400 && 990 - i * 10 >= 400))
  }

  test("stale stats are ignored when the grid no longer matches") {
    val doc = ZarrChunkStats.Doc("int", nChunks = 99, boundsI = Map(0L -> Some((0L, 1L))))
    val json = ZarrChunkStats.toJson(doc)
    val parsed = ZarrChunkStats.parse(json).get
    assert(parsed == doc)
    // round-trip of float specials (compare via json: NaN != NaN under ==)
    val f = ZarrChunkStats.Doc(
      "float", nChunks = 2,
      boundsF = Map(0L -> Some((Double.NegativeInfinity, Double.NaN)), 1L -> None)
    )
    val json2 = ZarrChunkStats.toJson(f)
    assert(ZarrChunkStats.toJson(ZarrChunkStats.parse(json2).get) == json2)
    // string bounds round-trip with escapes
    val s = ZarrChunkStats.Doc(
      "string", nChunks = 2,
      boundsS = Map(0L -> Some(("a\"b", "z\\9")), 1L -> None)
    )
    assert(ZarrChunkStats.parse(ZarrChunkStats.toJson(s)).get == s)
  }

  test("string values: byte-lex bounds prune equality, ranges and prefixes") {
    val root = tmp()
    // doc0000..doc0099 over i, chunks 10 -> per-chunk prefixes doc000x..
    spark.range(0, 100)
      .select(
        col("id").cast("int").as("i"),
        concat(lit("doc"), lpad(col("id").cast("string"), 4, "0")).as("value")
      )
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "10")
      .mode("append").save()
    val store = new ZarrStore(root, Map.empty, None, None)
    val doc = ZarrChunkStats.parse(store.arrayMeta("v").attrs(ZarrChunkStats.AttrKey)).get
    assert(doc.domain == "string" && doc.boundsS(3L).contains(("doc0030", "doc0039")))
    // equality: one chunk
    val qe = read(root).filter(col("value") === "doc0057")
    assert(qe.rdd.getNumPartitions == 1 && qe.count() == 1)
    // range: chunks 8, 9
    val qr = read(root).filter(col("value") >= "doc0085")
    assert(qr.rdd.getNumPartitions == 2)
    assert(qr.orderBy("i").collect().map(_.getString(1)).toSeq ==
      (85 until 100).map(i => f"doc$i%04d"))
    // prefix: doc004x lives in chunk 4 only
    val qp = read(root).filter(col("value").startsWith("doc004"))
    assert(qp.rdd.getNumPartitions == 1 && qp.count() == 10)
    // metadata-only min/max over the full selection
    val qm = read(root).agg(min("value"), max("value"))
    assert(qm.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val rm = qm.collect().head
    assert(rm.getString(0) == "doc0000" && rm.getString(1) == "doc0099")
  }

  test("ragged-edge chunks: bounds exclude padding, stats-only min/max exact") {
    // shape 10, chunks 8, fill 0, values 100..109 — the edge chunk's
    // padding cells hold the fill but are UNREADABLE, so neither its
    // bounds nor the metadata-only aggregate may answer 0
    val root = tmp()
    spark.range(0, 10)
      .select(col("id").cast("int").as("i"), (col("id") + 100).as("value"))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "8")
      .mode("append").save()
    val store = new ZarrStore(root, Map.empty, None, None)
    val doc = ZarrChunkStats.parse(store.arrayMeta("v").attrs(ZarrChunkStats.AttrKey)).get
    assert(doc.boundsI(0L).contains((100L, 107L)))
    assert(doc.boundsI(1L).contains((108L, 109L))) // NOT (0, 109)
    val q = read(root).agg(min("value"), max("value"))
    assert(q.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val r = q.collect().head
    assert(r.getLong(0) == 100L && r.getLong(1) == 109L)
    // string domain: the "" fill would byte-lex-sort below every real value
    val rootS = tmp()
    spark.range(0, 10)
      .select(col("id").cast("int").as("i"),
        concat(lit("x"), (col("id") + 100).cast("string")).as("value"))
      .write.format("zarr")
      .option("path", rootS).option("array", "v").option("chunks", "8")
      .mode("append").save()
    val docS = ZarrChunkStats.parse(
      new ZarrStore(rootS, Map.empty, None, None).arrayMeta("v").attrs(ZarrChunkStats.AttrKey)).get
    assert(docS.boundsS(1L).contains(("x108", "x109")))
    val qs = read(rootS).agg(min("value"), max("value"))
    assert(qs.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val rs = qs.collect().head
    assert(rs.getString(0) == "x100" && rs.getString(1) == "x109")
    // 2-D, ragged on BOTH dims (shape 3x10, chunks 2x8): the corner chunk
    // is padded on two axes at once
    val root2 = tmp()
    spark.range(0, 30)
      .select((col("id") / 10).cast("int").as("i"), (col("id") % 10).cast("int").as("j"),
        (col("id") + 1000).as("value"))
      .write.format("zarr")
      .option("path", root2).option("array", "v").option("chunks", "2,8")
      .mode("append").save()
    val q2 = read(root2).agg(min("value"), max("value"))
    assert(q2.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val r2 = q2.collect().head
    assert(r2.getLong(0) == 1000L && r2.getLong(1) == 1029L)
    // sharded v3: per-inner-chunk bounds on a ragged tail shard
    val rootSh = tmp()
    spark.range(0, 10)
      .select(col("id").cast("int").as("i"), (col("id") + 100).as("value"))
      .write.format("zarr")
      .option("path", rootSh).option("array", "v")
      .option("zarr_format", "3").option("chunks", "4").option("shards", "8")
      .mode("append").save()
    val docSh = ZarrChunkStats.parse(
      new ZarrStore(rootSh, Map.empty, None, None).arrayMeta("v").attrs(ZarrChunkStats.AttrKey)).get
    assert(docSh.boundsI(2L).contains((108L, 109L)))
    val qsh = spark.read.format("zarr").option("path", rootSh).option("array", "v").load()
      .agg(min("value"), max("value"))
    assert(qsh.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val rsh = qsh.collect().head
    assert(rsh.getLong(0) == 100L && rsh.getLong(1) == 109L)
  }
}
