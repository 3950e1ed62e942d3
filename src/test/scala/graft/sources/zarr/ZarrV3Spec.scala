package graft.sources.zarr

import graft.SparkTester
import graft.api.{ZarrDataReader, ZarrScan}
import graft.model.DimSel
import graft.sources.Coord
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Zarr v3 read support (zarr-specs v3): single `zarr.json` metadata
  * documents, `c/`-prefixed chunk keys, codecs pipeline, consolidated
  * metadata embedded in the root document. Everything below the metadata
  * parse is version-agnostic — planning, pushdown, coordinate extraction
  * and both readers are the v2 code paths. */
class ZarrV3Spec extends AnyFunSuite with SparkTester {

  private def mkStore(codecs: Seq[String], consolidate: Boolean = true): String = {
    val root = Files.createTempDirectory("zarrv3").toString
    val dir = ZarrStoreWriterV3.writeGroup(root)
    ZarrStoreWriterV3.writeArray(
      dir, "temperature", Vector(12, 10, 15), Vector(6, 5, 8), "float32",
      flat => 280.0f + (flat % 997) * 0.25f,
      dims = Some(Vector("time", "lat", "lon")),
      codecs = codecs,
      attrs = Map("units" -> "\"K\"")
    )
    ZarrStoreWriterV3.writeCoord(dir, "time", Coord.Ints(Array.tabulate(12)(identity)))
    ZarrStoreWriterV3.writeCoord(dir, "lat", Coord.Floats(Array.tabulate(10)(i => 30f + i)), codecs = Seq("zstd"))
    // no lon coordinate on purpose: positional fallback
    if (consolidate) ZarrStoreWriterV3.consolidate(dir)
    root
  }

  test("v3 roundtrip: schema, count, values, chunk keys c/i/j/k (consolidated)") {
    val root = mkStore(Seq("gzip"))
    assert(Files.exists(java.nio.file.Paths.get(root, "temperature", "c", "0", "0", "0")))
    val df = new ZarrDataReader(spark, root).readArray("temperature")
    assert(df.schema("value").dataType == FloatType)
    assert(df.schema("time").dataType == IntegerType)
    assert(df.schema("lon").dataType == LongType) // positional fallback
    assert(df.count() == 1800)
    val flat = 7 * 150 + 3 * 15 + 11
    val v = df.filter(col("time") === 7 && col("lat") === 33f && col("lon") === 11L)
      .select("value").collect().head.getFloat(0)
    assert(v == 280.0f + (flat % 997) * 0.25f)
  }

  test("v3 non-consolidated listing and read match consolidated") {
    val rootC = mkStore(Seq("zstd"))
    val rootN = mkStore(Seq("zstd"), consolidate = false)
    val c = new ZarrDataReader(spark, rootC)
    val n = new ZarrDataReader(spark, rootN)
    assert(c.listArrays() == Seq("lat", "temperature", "time"))
    assert(n.listArrays() == Seq("lat", "temperature", "time"))
    val key = Seq("time", "lat", "lon").map(col)
    assert(
      c.readArray("temperature").orderBy(key: _*).collect().toSeq ==
        n.readArray("temperature").orderBy(key: _*).collect().toSeq
    )
    // store info surfaces v3 metadata through the same aggregate
    val info = ZarrScan.getZarrDataInfo(rootC)
    assert(info("temperature").chunks == Vector(6, 5, 8))
    assert(info("temperature").attrs("units") == "\"K\"")
    assert(info("temperature").v3)
  }

  test("v3 codec chains round-trip identically (gzip, zstd, blosc variants, crc32c)") {
    val base = new ZarrDataReader(spark, mkStore(Nil)).readArray("temperature")
    val key = Seq("time", "lat", "lon").map(col)
    val expect = base.orderBy(key: _*).collect().toSeq
    for (
      chain <- Seq(
        Seq("gzip"), Seq("zstd"), Seq("blosc:lz4"), Seq("blosc:zstd:bitshuffle"),
        Seq("blosc:blosclz:noshuffle"), Seq("crc32c"), Seq("gzip", "crc32c"), Seq("zstd", "crc32c")
      )
    ) {
      val df = new ZarrDataReader(spark, mkStore(chain)).readArray("temperature")
      assert(df.orderBy(key: _*).collect().toSeq == expect, s"chain=$chain")
    }
  }

  test("v3 dtype matrix incl. big-endian via the bytes codec endian field") {
    val root = Files.createTempDirectory("zarrv3dt").toString
    val dir = ZarrStoreWriterV3.writeGroup(root)
    def w(name: String, dt: String, be: Boolean, f: Long => Double): Unit =
      ZarrStoreWriterV3.writeArray(dir, name, Vector(20), Vector(7), dt, f,
        dims = Some(Vector("i")), codecs = Seq("gzip"), bigEndian = be)
    w("b", "bool", be = false, i => if (i % 3 == 0) 1.0 else 0.0)
    w("u1", "uint8", be = false, i => ((i * 13) % 256).toDouble)
    w("i2", "int16", be = false, i => (i * 1000 - 9000).toDouble)
    w("u4", "uint32", be = false, i => (4000000000L + i).toDouble)
    w("i8be", "int64", be = true, i => (i * 123456789L).toDouble)
    w("f8be", "float64", be = true, i => i * 0.25 - 2.0)
    ZarrStoreWriterV3.writeCoord(dir, "i", Coord.Ints(Array.tabulate(20)(identity)))
    ZarrStoreWriterV3.consolidate(dir)
    val rd = new ZarrDataReader(spark, root)
    def vals(n: String): Seq[Any] =
      rd.readArray(n).orderBy("i").select("value").collect().map(_.get(0)).toSeq
    assert(rd.readArray("b").schema("value").dataType == BooleanType)
    assert(vals("b") == (0 until 20).map(_ % 3 == 0))
    assert(vals("u1") == (0 until 20).map(i => ((i * 13) % 256).toShort))
    assert(vals("i2") == (0 until 20).map(i => (i * 1000 - 9000).toShort))
    assert(vals("u4") == (0 until 20).map(i => 4000000000L + i))
    assert(vals("i8be") == (0 until 20).map(i => i * 123456789L))
    assert(vals("f8be") == (0 until 20).map(i => i * 0.25 - 2.0))
  }

  test("v3 scans push selection and coordinate filters like v2 (version-agnostic planning)") {
    val root = mkStore(Seq("zstd"))
    val rd = new ZarrDataReader(spark, root)
    val sel = rd.readArray(
      "temperature",
      Map("time" -> DimSel.Range(2, 5), "lat" -> DimSel.Indices(Vector(0, 9)), "lon" -> DimSel.Point(3))
    )
    assert(sel.columns.toSeq == Seq("time", "lat", "value"))
    val rows = sel.orderBy("time", "lat").collect()
    assert(rows.length == 6)
    val expect = for (t <- 2 until 5; la <- Seq(0, 9)) yield {
      val flat = t * 150 + la * 15 + 3
      (t, 30f + la, 280.0f + (flat % 997) * 0.25f)
    }
    assert(rows.map(r => (r.getInt(0), r.getFloat(1), r.getFloat(2))).toSeq == expect)
    // pushed coordinate filter leaves no residual Filter
    val pushed = rd.readArray("temperature").filter(col("time") >= 6 && col("lat") === 33f)
    assert(!pushed.queryExecution.optimizedPlan.toString().contains("Filter"))
    assert(pushed.count() == 90) // times 6..11 x 1 lat x 15 lons
  }

  test("v3 missing chunk reads as fill_value; corrupt crc32c fails loud") {
    val root = mkStore(Seq("gzip"))
    Files.delete(java.nio.file.Paths.get(root, "temperature", "c", "0", "0", "0"))
    val df = new ZarrDataReader(spark, root).readArray("temperature")
    assert(df.count() == 1800)
    assert(df.filter(col("value") === 0.0f).count() == 6L * 5 * 8)

    val root2 = mkStore(Seq("crc32c"))
    val chunk = java.nio.file.Paths.get(root2, "temperature", "c", "0", "0", "0")
    val bytes = Files.readAllBytes(chunk)
    bytes(3) = (bytes(3) ^ 0x40).toByte // flip a payload bit; checksum must catch it
    Files.write(chunk, bytes)
    val e = intercept[Exception] {
      new ZarrDataReader(spark, root2).readArray("temperature").agg(sum("value")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("crc32c mismatch")), messages(e).mkString(" | "))
  }

  test("v3 MISPLACED sharding (bytes->bytes position) rejected loudly, never misread") {
    // supported sharding is the SOLE codec (ZarrShardSpec); a sharding codec
    // after `bytes` is malformed metadata and must fail, not misread
    val root = Files.createTempDirectory("zarrv3bad").toString
    val dir = ZarrStoreWriterV3.writeGroup(root)
    val ad = dir.resolve("sharded")
    Files.createDirectories(ad)
    Files.writeString(
      ad.resolve("zarr.json"),
      """{"zarr_format": 3, "node_type": "array", "shape": [4], "data_type": "float64",
        |"chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4]}},
        |"chunk_key_encoding": {"name": "default"}, "fill_value": 0,
        |"codecs": [{"name": "bytes", "configuration": {"endian": "little"}},
        |{"name": "sharding_indexed", "configuration": {}}]}""".stripMargin
    )
    val e = intercept[Exception](new ZarrStore(root).arrayMeta("sharded"))
    assert(e.getMessage.contains("sharding"), e.getMessage)
  }
}
