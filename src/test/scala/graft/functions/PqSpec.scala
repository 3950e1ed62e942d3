package graft.functions

import graft.SparkTester
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite with SparkTester {

  // m=2 subspaces of 2 dims, 2 centroids each — every distance is
  // hand-checkable
  private val book: Seq[Seq[Seq[Float]]] = Seq(
    Seq(Seq(0f, 0f), Seq(10f, 10f)), // subspace 0
    Seq(Seq(0f, 10f), Seq(10f, 0f)) // subspace 1
  )

  test("assign: nearest L2 centroid per subspace; ties go to the smallest code") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 1f, 1f, 9f)), // sub0 -> c0 (d 2 vs 162), sub1 -> c0 (2 vs 162)
      (2L, Array(9f, 9f, 9f, 1f)), // sub0 -> c1, sub1 -> c1
      (3L, Array(5f, 5f, 5f, 5f)) // equidistant in BOTH subspaces -> c0, c0
    ).toDF("id", "v")
    val got = df
      .select(col("id"), PqFunctions.pqAssign(col("v"), book).as("c"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1).toList))
      .toList
    assert(got == List((1L, List(0, 0)), (2L, List(1, 1)), (3L, List(0, 0))))
    // interpreted eval path agrees with the codegen result
    val e = PqAssign(org.apache.spark.sql.GraftBridge.expression(col("v")), book)
    val viaEval = e
      .nullSafeEval(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(1f, 1f, 1f, 9f)))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(viaEval.toIntArray().toList == List(0, 0))
  }

  test("decode reconstructs centroid concatenation; adcDot == vecDot(q, decode)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 4
    val vecs = (0 until 50).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 4f)))
    val df = vecs.toDF("id", "v")
    val withCodes = df.select(col("id"), col("v"), PqFunctions.pqAssign(col("v"), book).as("c"))
    val rows = withCodes
      .select(
        col("id"),
        PqFunctions.pqAdcDot(col("v"), col("c"), book).as("adc"),
        graft.operators.Similarity
          .dotD(col("v"), PqFunctions.pqDecode(col("c"), book))
          .as("viaDecode")
      )
      .collect()
    rows.foreach { r =>
      // bit-identical, not approximately equal: same flat left-to-right fold
      assert(
        java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"row ${r.getLong(0)}"
      )
    }
    // decode of known codes
    val dec = spark
      .sql("SELECT array(1, 0) AS c")
      .select(PqFunctions.pqDecode(col("c"), book).as("d"))
      .collect()
      .head
      .getSeq[Float](0)
    assert(dec == Seq(10f, 10f, 0f, 10f))
  }

  test("guards: ragged codebook, dim mismatch, out-of-range code — all loud") {
    intercept[IllegalArgumentException] {
      new Pq.Book(Seq(Seq(Seq(1f, 2f)), Seq(Seq(1f))))
    }
    intercept[IllegalArgumentException] {
      new Pq.Book(Seq.empty)
    }
    import spark.implicits._
    val bad = Seq((1L, Array(1f, 2f, 3f))).toDF("id", "v") // 3 dims vs book's 4
    val ex = intercept[Exception] {
      bad.select(PqFunctions.pqAssign(col("v"), book)).collect()
    }
    assert(ex.getMessage.contains("dims") || ex.getCause.getMessage.contains("dims"))
    val badCode = Seq((1L, Array(0, 5))).toDF("id", "c")
    val ex2 = intercept[Exception] {
      badCode.select(PqFunctions.pqDecode(col("c"), book)).collect()
    }
    assert(ex2.getMessage.contains("out of") || ex2.getCause.getMessage.contains("out of"))
    // null rows stay null (nullIntolerant)
    val n = spark
      .sql("SELECT CAST(NULL AS ARRAY<FLOAT>) AS v")
      .select(PqFunctions.pqAssign(col("v"), book).as("c"))
      .collect()
    assert(n.head.isNullAt(0))
  }
}
