package graft.sources.zarr

import java.nio.file.Files

import graft.SparkTester
import graft.api.ZarrDataReader
import graft.sources.Coord

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Complex dtypes (`<c8`/`<c16`, v3 complex64/complex128) → struct<re, im>:
  * the last numpy dtype family the scan lacked. Spark has no complex
  * primitive, so both components surface exactly as struct fields queries
  * project and compute on like any columns. */
class ZarrComplexSpec extends AnyFunSuite with SparkTester {

  private def re(i: Long): Double = ((i * 13) % 97) * 0.5
  private def im(i: Long): Double = ((i * 7) % 89) * 0.25 - 11.0

  test("c8 and c16 round-trip through the scan; NaN/Inf components preserved") {
    val root = Files.createTempDirectory("zarrcplx").toString
    val dir = ZarrStoreWriter.writeGroup(root)
    def gen(i: Long): (Double, Double) =
      if (i == 5) (Double.NaN, Double.PositiveInfinity) else (re(i), im(i))
    ZarrStoreWriter.writeComplexArray(
      dir, "c8", Vector(12), Vector(5), "<c8", gen, dims = Some(Vector("i")), compressor = Some("zlib")
    )
    ZarrStoreWriter.writeComplexArray(
      dir, "c16", Vector(12), Vector(5), "<c16", gen, dims = Some(Vector("i"))
    )
    ZarrStoreWriter.writeCoord(dir, "i", Coord.Ints(Array.tabulate(12)(identity)))
    ZarrStoreWriter.consolidate(dir)
    val rd = new ZarrDataReader(spark, root)
    val d8 = rd.readArray("c8")
    assert(d8.schema("value").dataType == ZDtype.complexType(FloatType))
    val got8 = d8.orderBy("i").select(col("value.re"), col("value.im")).collect()
    (0 until 12).foreach { i =>
      val (r, m) = gen(i.toLong)
      val gr = got8(i).getFloat(0); val gm = got8(i).getFloat(1)
      if (r.isNaN) assert(gr.isNaN) else assert(gr == r.toFloat, s"i=$i")
      assert(gm == m.toFloat || (m.isInfinite && gm.isInfinite), s"i=$i")
    }
    val d16 = rd.readArray("c16")
    assert(d16.schema("value").dataType == ZDtype.complexType(DoubleType))
    val got16 = d16.orderBy("i").select(col("value.re"), col("value.im")).collect()
    (0 until 12).foreach { i =>
      val (r, m) = gen(i.toLong)
      if (r.isNaN) assert(got16(i).getDouble(0).isNaN) else assert(got16(i).getDouble(0) == r)
      assert(got16(i).getDouble(1) == m || m.isInfinite)
    }
    // computed columns over components work like any struct projection
    val mag2 = d16
      .filter(col("i") =!= 5)
      .agg(sum(col("value.re") * col("value.re") + col("value.im") * col("value.im")))
      .head().getDouble(0)
    val expect = (0 until 12).filter(_ != 5).map(i => re(i) * re(i) + im(i) * im(i)).sum
    assert(math.abs(mag2 - expect) < 1e-9)
  }

  test("complex fill_value [re, im] honored for absent chunks; null fill -> null struct") {
    val root = Files.createTempDirectory("zarrcplxfill").toString
    val dir = ZarrStoreWriter.writeGroup(root)
    ZarrStoreWriter.writeComplexArray(
      dir, "c", Vector(8), Vector(4), "<c8", i => (re(i), im(i)), dims = Some(Vector("i"))
    )
    ZarrStoreWriter.writeCoord(dir, "i", Coord.Ints(Array.tabulate(8)(identity)))
    // rewrite .zarray with a declared complex fill [2.5, -1.5]
    val za = dir.resolve("c").resolve(".zarray")
    Files.writeString(za, Files.readString(za).replace("\"fill_value\": null", "\"fill_value\": [2.5, -1.5]"))
    ZarrStoreWriter.consolidate(dir)
    Files.delete(dir.resolve("c").resolve("1"))
    val back = new ZarrDataReader(spark, root).readArray("c")
    val filled = back.filter(col("i") >= 4).select(col("value.re"), col("value.im")).collect()
    assert(filled.length == 4)
    filled.foreach(r => assert(r.getFloat(0) == 2.5f && r.getFloat(1) == -1.5f))
    // and with NO declared fill the absent chunk reads as null struct
    val root2 = Files.createTempDirectory("zarrcplxnull").toString
    val dir2 = ZarrStoreWriter.writeGroup(root2)
    ZarrStoreWriter.writeComplexArray(
      dir2, "c", Vector(8), Vector(4), "<c8", i => (re(i), im(i)), dims = Some(Vector("i"))
    )
    ZarrStoreWriter.writeCoord(dir2, "i", Coord.Ints(Array.tabulate(8)(identity)))
    ZarrStoreWriter.consolidate(dir2)
    Files.delete(dir2.resolve("c").resolve("1"))
    assert(
      new ZarrDataReader(spark, root2).readArray("c").filter(col("value").isNull).count() == 4
    )
  }

  test("v3 complex64 (handwritten zarr.json + raw chunk) decodes identically") {
    val root = Files.createTempDirectory("zarrcplxv3").toString
    val dir = ZarrStoreWriterV3.writeGroup(root)
    val ad = dir.resolve("c")
    Files.createDirectories(ad)
    Files.writeString(
      ad.resolve("zarr.json"),
      """{"zarr_format": 3, "node_type": "array", "shape": [4], "data_type": "complex64",
        |"chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [4]}},
        |"chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
        |"fill_value": [0.0, 0.0],
        |"codecs": [{"name": "bytes", "configuration": {"endian": "little"}}],
        |"dimension_names": ["i"], "attributes": {}}""".stripMargin
    )
    val bb = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 4).foreach { i => bb.putFloat(i * 8, i * 1.5f); bb.putFloat(i * 8 + 4, -i * 0.5f) }
    Files.createDirectories(ad.resolve("c"))
    Files.write(ad.resolve("c").resolve("0"), bb.array())
    ZarrStoreWriterV3.writeCoord(dir, "i", Coord.Ints(Array.tabulate(4)(identity)))
    ZarrStoreWriterV3.consolidate(dir)
    val got = new ZarrDataReader(spark, root).readArray("c")
      .orderBy("i").select(col("value.re"), col("value.im")).collect()
    (0 until 4).foreach { i =>
      assert(got(i).getFloat(0) == i * 1.5f && got(i).getFloat(1) == -i * 0.5f)
    }
  }
}
