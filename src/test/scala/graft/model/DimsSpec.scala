package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the M0 kernel (exhaustive sweeps over small
  * shapes): index math must agree with brute-force meshgrid expansion
  * (the reference pins this with hand-computed repeat/tile cases,
  * reference: tests/test_coordinate_processor.py:181-235). */
class DimsSpec extends AnyFunSuite {

  private val shapes: Seq[Vector[Int]] =
    for (a <- 1 to 5; b <- 1 to 5; c <- 1 to 5) yield Vector(a, b, c)

  test("flatten/unflatten roundtrip over all small 3-D shapes") {
    shapes.foreach { shape =>
      val total = shape.map(_.toLong).product
      val strides = IndexMath.strides(shape)
      val out = new Array[Int](shape.length)
      (0L until total).foreach { flat =>
        IndexMath.unflatten(flat, shape, out)
        assert(IndexMath.flatten(out, strides) == flat)
        out.indices.foreach(d => assert(out(d) >= 0 && out(d) < shape(d)))
      }
    }
  }

  test("C-order: last dim fastest (repeat/tile semantics of the reference)") {
    // reference test_coordinate_processor.py:199-204: for shape (12,10,15),
    // the time column is repeat(time, 10*15) — i.e. flat index / 150.
    val shape = Vector(12, 10, 15)
    val out = new Array[Int](3)
    IndexMath.unflatten(151, shape, out)
    assert(out.toSeq == Seq(1, 0, 1))
    IndexMath.unflatten(149, shape, out)
    assert(out.toSeq == Seq(0, 9, 14))
  }

  test("selection semantics: range clamps, point drops, indices gather") {
    val rs = Selection.resolve(
      Seq(12, 10, 15),
      Seq("time", "lat", "lon"),
      Map(
        "time" -> DimSel.Range(0, 3),
        "lat" -> DimSel.Indices(Vector(1, 3, 5)),
        "lon" -> DimSel.Point(7)
      )
    )
    assert(rs.selShape == Vector(3, 3, 1))
    assert(rs.dropped == Vector(false, false, true))
    assert(rs.outDims == Vector(0, 1))
    assert(rs.totalCells == 9)
    val c = Selection.resolve(Seq(5), Seq("x"), Map("x" -> DimSel.Range(3, 99)))
    assert(c.keep.head.toVector == Vector(3, 4))
    val n = Selection.resolve(Seq(5), Seq("x"), Map("x" -> DimSel.Range(4, 2)))
    assert(n.keep.head.isEmpty)
  }

  test("unknown dims ignored; out-of-range point throws") {
    val rs = Selection.resolve(Seq(4), Seq("x"), Map("y" -> DimSel.Point(0)))
    assert(rs.keep.head.toVector == Vector(0, 1, 2, 3))
    assertThrows[IllegalArgumentException] {
      Selection.resolve(Seq(4), Seq("x"), Map("x" -> DimSel.Point(4)))
    }
  }

  test("selection expansion equals brute-force meshgrid over range+point sweeps") {
    for {
      shape <- Seq(Vector(3, 4, 5), Vector(1, 1, 1), Vector(5, 2, 3))
      a <- 0 to 3; b <- a to 5
      p <- 0 until shape(2)
    } {
      val rs = Selection.resolve(
        shape,
        Seq("d0", "d1", "d2"),
        Map("d0" -> DimSel.Range(a, b), "d2" -> DimSel.Point(p))
      )
      val expected = for {
        i <- math.min(a, shape(0)) until math.min(b, shape(0))
        j <- 0 until shape(1)
      } yield (i, j, p)
      val out = new Array[Int](3)
      val got = (0L until rs.totalCells).map { f =>
        IndexMath.unflatten(f, rs.selShape, out)
        (rs.keep(0)(out(0)), rs.keep(1)(out(1)), rs.keep(2)(out(2)))
      }
      assert(got == expected, s"shape=$shape a=$a b=$b p=$p")
    }
  }
}
