package graft.sources.zarr

import graft.SparkTester
import graft.api.ZarrDataReader
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conformance sweep against fixtures written by an INDEPENDENT
  * implementation of the Zarr wire format: `scripts/
  * gen_conformance_fixtures.py` builds v2 + v3 stores from the format
  * specs with Python's stdlib only (json/zlib/gzip/struct — no
  * zarr-python, no numcodecs, none of this repo's code). A byte-layout
  * assumption shared by ZarrStoreWriter and the reader (endianness, chunk
  * overhang, vlen framing, half floats, subarray packing, CRC-32C
  * placement) is exactly what engine-written fixtures can never catch and
  * this sweep does. Fixtures are committed under test resources;
  * re-generate with the script when the matrix grows. */
class ZarrConformanceSpec extends AnyFunSuite with SparkTester {

  // source tree, NOT the test classpath: sbt's resource copier drops
  // dotfiles, and .zarray/.zgroup/.zattrs ARE dotfiles
  private val root: String = {
    val f = new java.io.File(sys.props("user.dir"), "src/test/resources/zarr_conformance")
    assert(f.isDirectory, s"conformance fixtures missing at $f — run scripts/gen_conformance_fixtures.py")
    f.getAbsolutePath
  }

  private case class Entry(store: String, array: String, kind: String, values: List[Any])

  private val entries: Seq[Entry] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val formats: Formats = DefaultFormats
    JsonMethods
      .parse(new java.io.File(s"$root/manifest.json"))
      .extract[List[Map[String, Any]]]
      .map { m =>
        Entry(
          m("store").toString,
          m("array").toString,
          m("kind").toString,
          m("values").asInstanceOf[List[Any]]
        )
      }
  }

  private def num(x: Any): Double = x match {
    case n: java.math.BigDecimal => n.doubleValue()
    case b: BigInt => b.toDouble
    case b: BigDecimal => b.toDouble
    case n: Number => n.doubleValue()
    case other => fail(s"non-numeric manifest value $other")
  }

  test("independently-written v2/v3 stores decode cell-exact (14-entry matrix)") {
    assert(entries.size == 14, s"manifest has ${entries.size} entries")
    entries.foreach { e =>
      val df = new ZarrDataReader(spark, s"$root/${e.store}").readArray(e.array)
      val dims = df.columns.filter(_ != "value").sorted
      val ordered = df.orderBy(dims.map(col): _*)
      val got: Seq[Any] = e.kind match {
        case "long" => ordered.select(col("value").cast("long")).collect().map(_.getLong(0)).toSeq
        case "double" => ordered.select(col("value").cast("double")).collect().map(_.getDouble(0)).toSeq
        case "bool" => ordered.select(col("value")).collect().map(_.getBoolean(0)).toSeq
        case "string" => ordered.select(col("value")).collect().map(_.getString(0)).toSeq
        case "ts_us" =>
          ordered
            .select(unix_micros(col("value")))
            .collect()
            .map(r => if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
            .toSeq
        case "struct_shaped" =>
          ordered
            .select(col("value.pos"), col("value.s"))
            .collect()
            .map(r => (r.getSeq[Float](0).toList, r.getInt(1)))
            .toSeq
        case other => fail(s"unknown manifest kind $other")
      }
      val want: Seq[Any] = e.kind match {
        case "long" => e.values.map(v => num(v).toLong)
        case "double" => e.values.map(num)
        case "bool" => e.values.map(_.asInstanceOf[Boolean])
        case "string" => e.values.map(_.asInstanceOf[String])
        case "ts_us" => e.values.map(v => if (v == null) null else java.lang.Long.valueOf(num(v).toLong))
        case "struct_shaped" =>
          e.values.map { v =>
            val l = v.asInstanceOf[List[Any]]
            (l.head.asInstanceOf[List[Any]].map(x => num(x).toFloat), num(l(1)).toInt)
          }
        case other => fail(s"unknown manifest kind $other")
      }
      assert(got == want, s"${e.store}/${e.array} (${e.kind})")
    }
  }
}
