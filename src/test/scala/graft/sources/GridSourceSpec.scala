package graft.sources

import graft.SparkTester
import graft.model.DimSel
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** GridSource parity with the reference's conversion semantics
  * (reference: tests/test_polars_converter.py + FIXTURES.md §1). */
class GridSourceSpec extends AnyFunSuite with SparkTester {

  /** The climate-cube fixture (reference: tests/conftest.py:17-49). */
  private def cube(valueF: Long => Double = _.toDouble) = GridSpec(
    dims = Vector("time", "lat", "lon"),
    shape = Vector(12, 10, 15),
    coords = Vector(
      Coord.Ints(Array.tabulate(12)(identity)),
      Coord.Floats(Array.tabulate(10)(i => 30f + i * (20f / 9f))),
      Coord.Floats(Array.tabulate(15)(j => -120f + j * (20f / 14f)))
    ),
    value = valueF
  )

  test("full expansion: 1800 rows, C-order coordinate structure, dtypes") {
    val df = GridSource.toDF(spark, cube())
    assert(df.count() == 1800)
    val sch = df.schema
    assert(sch("time").dataType == IntegerType)
    assert(sch("lat").dataType == FloatType)
    assert(sch("lon").dataType == FloatType)
    assert(sch("value").dataType == DoubleType)
    // C-order: value == flat index; time = flat / 150 (repeat/tile semantics,
    // reference test_coordinate_processor.py:199-204)
    val rows = df.collect()
    rows.foreach { r =>
      val flat = r.getDouble(3).toLong
      assert(r.getInt(0) == (flat / 150).toInt)
      val expLat = 30f + ((flat / 15) % 10) * (20f / 9f)
      assert(r.getFloat(1) == expLat)
    }
  }

  test("selection fixtures from the reference conftest (slices/points/mixed)") {
    // slices {time: 0:3, lat: 2:5, lon: 5:10} -> shape (3,3,5)
    val s1 = GridSource.toDF(
      spark,
      cube(),
      Map("time" -> DimSel.Range(0, 3), "lat" -> DimSel.Range(2, 5), "lon" -> DimSel.Range(5, 10))
    )
    assert(s1.count() == 45)
    assert(s1.columns.toSeq == Seq("time", "lat", "lon", "value"))
    // points {time:0, lat:3, lon:7} -> scalar frame [value]
    val s2 = GridSource.toDF(
      spark,
      cube(),
      Map("time" -> DimSel.Point(0), "lat" -> DimSel.Point(3), "lon" -> DimSel.Point(7))
    )
    assert(s2.columns.toSeq == Seq("value"))
    assert(s2.collect().map(_.getDouble(0)).toSeq == Seq((3 * 15 + 7).toDouble))
    // mixed {time: [0,2,4,6], lat: [1,3,5], lon: all} -> (4,3,15)
    val s3 = GridSource.toDF(
      spark,
      cube(),
      Map("time" -> DimSel.Indices(Vector(0, 2, 4, 6)), "lat" -> DimSel.Indices(Vector(1, 3, 5)))
    )
    assert(s3.count() == 4 * 3 * 15)
    assert(s3.select("time").distinct().collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 2, 4, 6))
  }

  test("NaN and infinities preserved distinct from null (reference :153-168)") {
    val spec = GridSpec(
      Vector("i"),
      Vector(4),
      Vector(Coord.Ints(Array(0, 1, 2, 3))),
      flat => flat match {
        case 0 => Double.NaN
        case 1 => Double.PositiveInfinity
        case 2 => Double.NegativeInfinity
        case _ => 1.5
      }
    )
    val df = GridSource.toDF(spark, spec)
    assert(df.filter(isnan(col("value"))).count() == 1)
    assert(df.filter(col("value") === Double.PositiveInfinity).count() == 1)
    assert(df.filter(col("value").isNull).count() == 0)
  }

  test("missing coordinate falls back to positional index (reference :84-102)") {
    val spec = GridSpec(Vector("i"), Vector(3), Vector(Coord.Index(3)), _.toDouble * 2)
    val df = GridSource.toDF(spark, spec)
    assert(df.schema("i").dataType == LongType)
    assert(df.orderBy("i").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((0L, 0.0), (1L, 2.0), (2L, 4.0)))
  }

  test("partition-count invariance: identical sorted rows at any parallelism") {
    val full = GridSource.toDF(spark, cube(), numPartitions = Some(1))
      .orderBy("time", "lat", "lon").collect().toSeq
    Seq(3, 8, 32).foreach { p =>
      val got = GridSource.toDF(spark, cube(), numPartitions = Some(p))
        .orderBy("time", "lat", "lon").collect().toSeq
      assert(got == full, s"partitions=$p")
    }
  }

  test("empty selection yields empty frame with schema (reference :231-242)") {
    val df = GridSource.toDF(spark, cube(), Map("time" -> DimSel.Range(5, 5)))
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("time", "lat", "lon", "value"))
  }
}
