package graft.sources.zarr

import graft.SparkTester
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Hierarchical zone maps: grids past the flat cap keep per-BLOCK rollups
  * in the attrs and per-chunk bounds in executor-written side docs under
  * `<array>/_graft_stats/`. The spec forces the two-level layout at tiny
  * scale via `stats.flat_cap` / `stats.block_len` and pins: layout shape,
  * pruning parity with the flat answer, fill semantics for unwritten
  * blocks, metadata-only aggregates off rollups, and the sound fallback
  * when a side doc is missing. */
class ZarrHierStatsSpec extends AnyFunSuite with SparkTester {

  private def tmp(): String = Files.createTempDirectory("zarrhier").toString

  /** 100 cells / chunks of 5 -> 20 chunks; flat_cap 5 forces hierarchical
    * (20 > 5, and 20 <= 5*4 keeps stats on), block_len 4 -> 5 blocks of 4
    * chunks (ordinals [0,3], [4,7], ...). */
  private def writeHier(root: String, extra: Map[String, String] = Map.empty): Unit = {
    var w = spark.range(0, 100)
      .select(col("id").cast("int").as("i"), (col("id") * 10).as("value"))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5")
      .option("stats.flat_cap", "5").option("stats.block_len", "4")
    extra.foreach { case (k, v) => w = w.option(k, v) }
    w.mode("append").save()
  }

  private def read(root: String, extra: Map[String, String] = Map.empty): DataFrame = {
    var r = spark.read
      .format("zarr")
      .option("path", root)
      .option("array", "v")
      .option("partition.target.cells", "1")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("sink CREATE past the ceiling records the drop marker instead of silent no-stats") {
    // 20 chunks > flat_cap 2 x block_len 4 = 8 -> stats skipped at create
    val root = tmp()
    writeHier(root, Map("stats.flat_cap" -> "2", "stats.block_len" -> "4"))
    val attrs = new ZarrStore(root, Map.empty, None, None).arrayMeta("v").attrs
    assert(!attrs.contains(ZarrChunkStats.AttrKey))
    assert(attrs(ZarrChunkStats.DroppedAttrKey).contains("ceiling"))
    assert(read(root).filter(col("value") >= 900L).count() == 10) // still exact
  }

  test("past the flat cap the sink writes rollup attrs + per-block side docs") {
    val root = tmp()
    writeHier(root)
    val store = new ZarrStore(root, Map.empty, None, None)
    val raw = store.arrayMeta("v").attrs(ZarrChunkStats.AttrKey)
    assert(ZarrChunkStats.parse(raw).isEmpty) // not a flat doc
    val h = ZarrChunkStats.parseHier(raw).get
    assert(h.domain == "int" && h.nChunks == 20 && h.blockLen == 4 && h.nBlocks == 5)
    assert((0L until 5L).forall(b => h.written(b) == 4L))
    // rollup bounds = extrema over the block's chunks: block 0 covers
    // cells 0..19 (values 0..190), block 4 covers cells 80..99
    assert(h.rollup.boundsI(0L).contains((0L, 190L)))
    assert(h.rollup.boundsI(4L).contains((800L, 990L)))
    // per-block side docs are flat-format per-chunk docs
    (0 until 5).foreach { b =>
      val side = ZarrFileIO
        .readStringIfExists(
          new org.apache.hadoop.fs.Path(store.arrayDir("v"), s"${ZarrChunkStats.SideDir}/$b"),
          Map.empty
        )
      assert(side.isDefined, s"missing side doc for block $b")
      val doc = ZarrChunkStats.parse(side.get).get
      assert(doc.nChunks == 20)
    }
    val side0 = ZarrChunkStats.parse(
      ZarrFileIO.readStringIfExists(
        new org.apache.hadoop.fs.Path(store.arrayDir("v"), s"${ZarrChunkStats.SideDir}/0"),
        Map.empty).get).get
    assert(side0.boundsI(0L).contains((0L, 40L)))
    assert(side0.boundsI(3L).contains((150L, 190L)))
    assert(!side0.boundsI.contains(4L)) // block 0 holds ordinals 0..3 only
  }

  test("two-level pruning: block rollups coarse-skip, side docs refine; results exact") {
    val root = tmp()
    writeHier(root)
    // value > 870 -> cells 88..99 -> chunks 17,18,19 (block 4 only). The
    // planner must land on exactly those 3 partitions, through both levels.
    val q = read(root).filter(col("value") > 870L)
    assert(q.rdd.getNumPartitions == 3, s"got ${q.rdd.getNumPartitions}")
    assert(q.orderBy("i").collect().map(_.getLong(1)).toSeq == (88 until 100).map(_ * 10L))
    // equality: one chunk, middle block
    val qe = read(root).filter(col("value") === 440L)
    assert(qe.rdd.getNumPartitions == 1 && qe.count() == 1)
    // parity with the safety valve on a band crossing a block boundary
    val band = col("value") >= 380L && col("value") <= 420L
    val pruned = read(root).filter(band).orderBy("i").collect().toSeq
    val unpruned = read(root, Map("stats.pruning" -> "false")).filter(band).orderBy("i").collect().toSeq
    assert(pruned == unpruned && pruned.size == 5)
  }

  test("entirely-unwritten blocks follow fill semantics at level 1") {
    val root = tmp()
    // 20x15 grid, chunks (5,5) -> 4x3 = 12 chunk ordinals in C-order
    // (ord = ic*3 + jc); block_len 4 -> 3 blocks. Block 1 = ordinals 4..7
    // = chunks (1,1),(1,2),(2,0),(2,1): dropping the cells
    // (i in 5..9, j >= 5) and (i in 10..14, j < 10) leaves every axis
    // value present (so the dense 20x15 shape still derives) while block 1
    // is ENTIRELY unwritten — its chunks read as fill 0.
    spark.range(0, 300)
      .select(
        (col("id") / 15).cast("int").as("i"),
        (col("id") % 15).cast("int").as("j"),
        (col("id") + 1).as("value")
      )
      .filter(!(
        (col("i") >= 5 && col("i") < 10 && col("j") >= 5) ||
        (col("i") >= 10 && col("i") < 15 && col("j") < 10)
      ))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5,5")
      .option("stats.flat_cap", "4").option("stats.block_len", "4")
      .mode("append").save()
    val store = new ZarrStore(root, Map.empty, None, None)
    val h = ZarrChunkStats.parseHier(store.arrayMeta("v").attrs(ZarrChunkStats.AttrKey)).get
    assert(h.nChunks == 12 && h.nBlocks == 3)
    assert(!h.written.contains(1L), s"block 1 should be absent: ${h.written}")
    assert(h.written(0L) == 4L && h.written(2L) == 4L && h.writtenTotal == 8L)
    // no side doc is written for an absent block; level 1 answers alone
    assert(
      ZarrFileIO.readStringIfExists(
        new org.apache.hadoop.fs.Path(store.arrayDir("v"), s"${ZarrChunkStats.SideDir}/1"),
        Map.empty
      ).isEmpty
    )
    // fill 0 matches <= 0 only: exactly the 4 unwritten chunks survive
    val zero = read(root).filter(col("value") <= 0L)
    assert(zero.rdd.getNumPartitions == 4, s"got ${zero.rdd.getNumPartitions}")
    assert(zero.count() == 100)
    // a band only unwritten cells would have matched: nothing survives
    // (written bounds: ord 3 max 140, ord 8 min 161; fill 0 outside band)
    val gone = read(root).filter(col("value") >= 141L && col("value") <= 150L)
    assert(gone.rdd.getNumPartitions == 0 && gone.count() == 0)
    // count(value) stays metadata-exact: the int fill is non-null, so
    // unwritten cells still count
    val qc = read(root).agg(count("value"), count("*"))
    assert(qc.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val rc = qc.collect().head
    assert(rc.getLong(0) == 300L && rc.getLong(1) == 300L)
  }

  test("metadata-only min/max off rollups; count falls back when blocks are partial") {
    val root = tmp()
    writeHier(root)
    val q = read(root).agg(min("value"), max("value"), count("value"), count("*"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("BatchScan"), plan)
    val r = q.collect().head
    assert(r.getLong(0) == 0L && r.getLong(1) == 990L)
    assert(r.getLong(2) == 100L && r.getLong(3) == 100L)
    // a dim predicate makes the selection partial: value aggs fall back
    // to the chunk scan and stay correct through the two-level pruner path
    val partial = read(root).filter(col("i") < 30).agg(min("value"), max("value"))
    assert(partial.queryExecution.executedPlan.toString.contains("BatchScan"))
    val p = partial.collect().head
    assert(p.getLong(0) == 0L && p.getLong(1) == 290L)
  }

  test("a missing side doc degrades to the coarse block answer, never wrong") {
    val root = tmp()
    writeHier(root)
    val store = new ZarrStore(root, Map.empty, None, None)
    // delete block 4's side doc; level-2 refinement for that block is gone
    val side = Paths.get(store.arrayDir("v").stripPrefix("file:"), ZarrChunkStats.SideDir, "4")
    assert(Files.deleteIfExists(side), s"expected to delete $side")
    val q = read(root).filter(col("value") > 870L)
    // blocks 0-3 still rollup-prune; block 4 keeps ALL 4 of its chunks
    assert(q.rdd.getNumPartitions == 4, s"got ${q.rdd.getNumPartitions}")
    assert(q.orderBy("i").collect().map(_.getLong(1)).toSeq == (88 until 100).map(_ * 10L))
  }

  test("string domain: byte-lex rollups prune ranges and prefixes") {
    val root = tmp()
    spark.range(0, 100)
      .select(
        col("id").cast("int").as("i"),
        concat(lit("doc"), lpad(col("id").cast("string"), 4, "0")).as("value")
      )
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5")
      .option("stats.flat_cap", "5").option("stats.block_len", "4")
      .mode("append").save()
    val store = new ZarrStore(root, Map.empty, None, None)
    val h = ZarrChunkStats.parseHier(store.arrayMeta("v").attrs(ZarrChunkStats.AttrKey)).get
    assert(h.domain == "string")
    assert(h.rollup.boundsS(0L).contains(("doc0000", "doc0019")))
    val qe = read(root).filter(col("value") === "doc0057")
    assert(qe.rdd.getNumPartitions == 1 && qe.count() == 1)
    // prefix doc004x covers cells 40..49 = chunks 8 and 9 (block 2)
    val qp = read(root).filter(col("value").startsWith("doc004"))
    assert(qp.rdd.getNumPartitions == 2 && qp.count() == 10)
    val qm = read(root).agg(min("value"), max("value"))
    assert(qm.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val rm = qm.collect().head
    assert(rm.getString(0) == "doc0000" && rm.getString(1) == "doc0099")
  }

  test("float domain with NaN chunks: rollup keeps NaN-greatest semantics") {
    val root = tmp()
    spark.range(0, 100)
      .select(
        col("id").cast("int").as("i"),
        when(col("id") >= 95, lit(Double.NaN)).otherwise(col("id").cast("double")).as("value")
      )
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5")
      .option("stats.flat_cap", "5").option("stats.block_len", "4")
      .mode("append").save()
    val gt = read(root).filter(col("value") > 96.0)
    // only the NaN chunk (19) survives: NaN > 96 in Spark ordering
    assert(gt.rdd.getNumPartitions == 1)
    assert(gt.count() == 5 && gt.collect().forall(_.getDouble(1).isNaN))
    val agg = read(root).agg(min("value"), max("value"))
    assert(agg.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val r = agg.collect().head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1).isNaN)
  }

  test("ragged edge + hierarchical: padding stays out of rollups, aggs exact") {
    val root = tmp()
    // shape 98, chunks 5 -> 20 chunks, last chunk 3 cells; hier layout
    spark.range(0, 98)
      .select(col("id").cast("int").as("i"), (col("id") + 100).as("value"))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5")
      .option("stats.flat_cap", "5").option("stats.block_len", "4")
      .mode("append").save()
    val store = new ZarrStore(root, Map.empty, None, None)
    val h = ZarrChunkStats.parseHier(store.arrayMeta("v").attrs(ZarrChunkStats.AttrKey)).get
    assert(h.rollup.boundsI(4L).contains((180L, 197L))) // fill 0 NOT included
    val q = read(root).agg(min("value"), max("value"), count("*"))
    assert(q.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    val r = q.collect().head
    assert(r.getLong(0) == 100L && r.getLong(1) == 197L && r.getLong(2) == 98L)
  }

  test("sharded v3 stores roll up per-inner-chunk bounds hierarchically") {
    val root = tmp()
    spark.range(0, 100)
      .select(col("id").cast("int").as("i"), (col("id") * 10).as("value"))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5")
      .option("zarr_format", "3").option("shards", "20")
      .option("stats.flat_cap", "5").option("stats.block_len", "4")
      .mode("append").save()
    val store = new ZarrStore(root, Map.empty, None, None)
    val h = ZarrChunkStats.parseHier(store.arrayMeta("v").attrs(ZarrChunkStats.AttrKey)).get
    assert(h.nChunks == 20 && h.nBlocks == 5)
    val q = read(root).filter(col("value") > 870L)
    assert(q.rdd.getNumPartitions == 3)
    assert(q.orderBy("i").collect().map(_.getLong(1)).toSeq == (88 until 100).map(_ * 10L))
  }

  test("hier doc JSON round-trips, including float specials and escapes") {
    val h = ZarrChunkStats.Hier(
      "float", nChunks = 10, blockLen = 4,
      written = Map(0L -> 4L, 2L -> 1L),
      rollup = ZarrChunkStats.Doc(
        "float", nChunks = 3,
        boundsF = Map(0L -> Some((Double.NegativeInfinity, Double.NaN)), 2L -> None)
      )
    )
    val json = ZarrChunkStats.toJsonHier(h)
    val back = ZarrChunkStats.parseHier(json).get
    assert(ZarrChunkStats.toJsonHier(back) == json)
    assert(back.written == h.written && back.nBlocks == 3)
    val hs = ZarrChunkStats.Hier(
      "string", nChunks = 8, blockLen = 8,
      written = Map(0L -> 8L),
      rollup = ZarrChunkStats.Doc("string", 1, boundsS = Map(0L -> Some(("a\"b", "z\\9"))))
    )
    assert(ZarrChunkStats.parseHier(ZarrChunkStats.toJsonHier(hs)).get == hs)
    // flat parser refuses hier docs and vice versa
    assert(ZarrChunkStats.parse(json).isEmpty)
    assert(ZarrChunkStats.parseHier(
      ZarrChunkStats.toJson(ZarrChunkStats.Doc("int", 2, boundsI = Map(0L -> Some((1L, 2L)))))
    ).isEmpty)
  }

  // ---- append maintenance -------------------------------------------------

  /** Appends [lo, hi) x10 values along i. `flatCap` must outgrow the
    * fixture's write-time cap of 5: the hier ceiling is flat_cap x the
    * EXISTING doc's block_len (4). */
  private def appendBatch(root: String, lo: Int, hi: Int, flatCap: Int = 8): Unit =
    spark.range(lo, hi)
      .select(col("id").cast("int").as("i"), (col("id") * 10).as("value"))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5")
      .option("append.dim", "i")
      .option("stats.flat_cap", flatCap.toString).option("stats.block_len", "4")
      .mode("append").save()

  private def hierDoc(root: String): ZarrChunkStats.Hier =
    ZarrChunkStats.parseHier(
      new ZarrStore(root, Map.empty, None, Some(false)).arrayMeta("v").attrs(ZarrChunkStats.AttrKey)
    ).get

  private def sideDoc(root: String, b: Long): Option[ZarrChunkStats.Doc] = {
    val store = new ZarrStore(root, Map.empty, None, None)
    ZarrFileIO
      .readStringIfExists(
        new org.apache.hadoop.fs.Path(store.arrayDir("v"), s"${ZarrChunkStats.SideDir}/$b"),
        Map.empty
      )
      .flatMap(ZarrChunkStats.parse)
  }

  test("append maintains hier stats: new blocks, boundary read-modify-write, old docs kept") {
    val root = tmp()
    writeHier(root) // 100 cells, 20 chunks, 5 full blocks
    appendBatch(root, 100, 110) // +2 chunks; 20 % 4 == 0 -> block 5 is purely new
    val h1 = hierDoc(root)
    assert(h1.nChunks == 22 && h1.blockLen == 4 && h1.written(5L) == 2L)
    assert(h1.rollup.boundsI(5L).contains((1000L, 1090L)))
    assert(sideDoc(root, 5L).exists(d => d.nChunks == 22 && d.boundsI(21L).contains((1050L, 1090L))))
    appendBatch(root, 110, 120) // +2 chunks; 22 % 4 == 2 -> block 5 straddles: read-modify-write
    val h2 = hierDoc(root)
    assert(h2.nChunks == 24 && h2.written(5L) == 4L && h2.writtenTotal == 24L)
    assert(h2.rollup.boundsI(5L).contains((1000L, 1190L)))
    assert(h2.rollup.boundsI(0L).contains((0L, 190L))) // untouched rollups intact
    val side5 = sideDoc(root, 5L).get
    assert(side5.nChunks == 24 && (20L to 23L).forall(side5.boundsI.contains))
    // fully-old blocks keep their ORIGINAL side docs (stale nChunks == 20)...
    assert((0L to 4L).forall(b => sideDoc(root, b).exists(_.nChunks == 20)))
    // ...and the pruner still accepts them for FINE pruning: a band inside
    // old block 1 lands on exactly its 2 chunks
    val qOld = read(root).filter(col("value") >= 380L && col("value") <= 420L)
    assert(qOld.rdd.getNumPartitions == 2, s"got ${qOld.rdd.getNumPartitions}")
    assert(qOld.count() == 5)
    // appended band: one chunk, through the rewritten boundary doc
    val qNew = read(root).filter(col("value") > 1140L)
    assert(qNew.rdd.getNumPartitions == 1 && qNew.count() == 5)
    // parity with the safety valve across the old/new seam
    val band = col("value") >= 950L && col("value") <= 1060L
    val pruned = read(root).filter(band).orderBy("i").collect().toSeq
    val unpruned = read(root, Map("stats.pruning" -> "false")).filter(band).orderBy("i").collect().toSeq
    assert(pruned == unpruned && pruned.size == 12)
    // stats-backed aggregates stay exact over the grown grid
    val agg = read(root).agg(min("value"), max("value"), count("value")).collect()(0)
    assert(agg.getLong(0) == 0L && agg.getLong(1) == 1190L && agg.getLong(2) == 120L)
  }

  test("append across the flat cap upgrades flat stats to hierarchical") {
    val root = tmp()
    // 25 cells -> 5 chunks <= flat_cap 5 -> FLAT layout at write time
    spark.range(0, 25)
      .select(col("id").cast("int").as("i"), (col("id") * 10).as("value"))
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5")
      .option("stats.flat_cap", "5").option("stats.block_len", "4")
      .mode("append").save()
    val store0 = new ZarrStore(root, Map.empty, None, None)
    assert(ZarrChunkStats.parse(store0.arrayMeta("v").attrs(ZarrChunkStats.AttrKey)).isDefined)
    // +75 cells -> 20 chunks > cap 15 (batch's 15 new chunks still fit the
    // driver-collection bound): the append upgrades the layout
    appendBatch(root, 25, 100, flatCap = 15)
    val h = hierDoc(root)
    assert(h.nChunks == 20 && h.blockLen == 4 && h.nBlocks == 5)
    assert((0L until 5L).forall(b => h.written(b) == 4L))
    assert(h.rollup.boundsI(0L).contains((0L, 190L)) && h.rollup.boundsI(4L).contains((800L, 990L)))
    // block 1 mixes flat-era ordinal 4 with appended ordinals 5..7
    val side1 = sideDoc(root, 1L).get
    assert(side1.nChunks == 20 && side1.boundsI(4L).contains((200L, 240L)) &&
      side1.boundsI(7L).contains((350L, 390L)))
    // two-level pruning works through the upgraded layout, exactly
    val qe = read(root).filter(col("value") === 440L)
    assert(qe.rdd.getNumPartitions == 1 && qe.count() == 1)
    val band = col("value") >= 380L && col("value") <= 420L
    val pruned = read(root).filter(band).orderBy("i").collect().toSeq
    val unpruned = read(root, Map("stats.pruning" -> "false")).filter(band).orderBy("i").collect().toSeq
    assert(pruned == unpruned && pruned.size == 5)
  }

  test("SHARDED v3 append across the flat cap upgrades to hierarchical (layout-blind stats)") {
    val root = tmp()
    // 40 cells, inner chunks 5, shards 20 -> 8 inner ordinals, flat at cap
    // 12 (the batch's 12 new chunks must also fit the driver-collection
    // bound, grown - old <= cap)
    def batch(lo: Int, hi: Int): Unit =
      spark.range(lo, hi)
        .select(col("id").cast("int").as("i"), (col("id") * 10).as("value"))
        .write.format("zarr")
        .option("path", root).option("array", "v")
        .option("chunks", "5").option("shards", "20").option("zarr_format", "3")
        .option("stats.flat_cap", "12").option("stats.block_len", "4")
        .option("append.dim", "i")
        .mode("append").save()
    batch(0, 40)
    val store0 = new ZarrStore(root, Map.empty, None, None)
    assert(ZarrChunkStats.parse(store0.arrayMeta("v").attrs(ZarrChunkStats.AttrKey)).isDefined)
    // +60 cells -> 20 inner chunks > cap 12: the sharded append upgrades
    batch(40, 100)
    val h = hierDoc(root)
    assert(h.nChunks == 20 && h.blockLen == 4 && h.nBlocks == 5)
    assert((0L until 5L).forall(b => h.written(b) == 4L))
    // pruning parity through shard objects + upgraded two-level stats
    val band = col("value") >= 380L && col("value") <= 420L
    val pruned = read(root).filter(band).orderBy("i").collect().toSeq
    val unpruned = read(root, Map("stats.pruning" -> "false")).filter(band).orderBy("i").collect().toSeq
    assert(pruned == unpruned && pruned.size == 5)
    val qe = read(root).filter(col("value") === 440L)
    assert(qe.rdd.getNumPartitions == 1 && qe.count() == 1)
  }

  test("append past the hier ceiling drops stats; missing boundary side doc degrades coarsely") {
    // ceiling: flat_cap 5 x block_len 4 = 20 chunks; growing to 22 drops stats
    val root = tmp()
    writeHier(root)
    appendBatch(root, 100, 110, flatCap = 5)
    val attrs = new ZarrStore(root, Map.empty, None, Some(false)).arrayMeta("v").attrs
    assert(!attrs.contains(ZarrChunkStats.AttrKey))
    // the drop is recorded for the scan to warn on (never silent-to-queries)
    assert(attrs(ZarrChunkStats.DroppedAttrKey).contains("ceiling"))
    assert(read(root).count() == 110) // scan correct without stats
    assert(read(root).filter(col("value") >= 1000L).count() == 10) // predicates still exact
    // a FURTHER append (no stats left) must not erase the marker
    appendBatch(root, 110, 120, flatCap = 5)
    val attrs2 = new ZarrStore(root, Map.empty, None, Some(false)).arrayMeta("v").attrs
    assert(attrs2(ZarrChunkStats.DroppedAttrKey).contains("ceiling"))
    // missing boundary side doc: coarse level stays sound and exact
    val root2 = tmp()
    writeHier(root2)
    appendBatch(root2, 100, 110) // block 5 <- ords 20, 21
    val store2 = new ZarrStore(root2, Map.empty, None, None)
    Files.delete(Paths.get(store2.arrayDir("v").stripPrefix("file:"), ZarrChunkStats.SideDir, "5"))
    appendBatch(root2, 110, 120) // boundary block 5's doc is gone: rollup-only merge
    val h = hierDoc(root2)
    assert(h.written(5L) == 4L && h.rollup.boundsI(5L).contains((1000L, 1190L)))
    assert(sideDoc(root2, 5L).isEmpty) // no doc claiming completeness was written
    // block 5 survives only coarsely -> all 4 of its chunks kept; exact rows
    val q = read(root2).filter(col("value") >= 1150L)
    assert(q.rdd.getNumPartitions == 4, s"got ${q.rdd.getNumPartitions}")
    assert(q.orderBy("i").collect().map(_.getLong(1)).toSeq == (115 until 120).map(_ * 10L))
  }
}
