package graft.operators

import graft.SparkTester
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PcaSpec extends AnyFunSuite with SparkTester {

  test("covarianceMatrix matches hand-computed cells and means") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(3.0f, 5.0f)),
      (3L, Array(2.0f, 8.0f))
    ).toDF("vec_id", "embedding")
    val rows = Similarity
      .covarianceMatrix(df, "embedding", 2)
      .orderBy("i", "j")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // cov([1,3,2]) = 1, cov([2,5,8]) = 9, cross = 1.5; means 2 and 5
    assert(rows.length == 3)
    val Seq(r00, r01, r11) = rows.toSeq
    assert(r00 == ((0, 0, 3L, 1.0, 2.0, 2.0)))
    assert(r01 == ((0, 1, 3L, 1.5, 2.0, 5.0)))
    assert(r11 == ((1, 1, 3L, 9.0, 5.0, 5.0)))
    // wrong-length vectors are excluded, not mis-multiplied
    val mixed = df.union(Seq((4L, Array(9.0f))).toDF("vec_id", "embedding"))
    assert(Similarity.covarianceMatrix(mixed, "embedding", 2).count() == 3)
  }

  // deterministic rank-2 data: x = s*u + 0.1*t*w + offset, u ⟂ w unit vectors
  private val dim = 8
  private val uRaw = Array(1.0, 2, 3, 4, 5, 6, 7, 8)
  private val wRaw = Array(8.0, -7, 6, -5, 4, -3, 2, -1) // uRaw · wRaw = 0
  private def unit(a: Array[Double]) = { val n = math.sqrt(a.map(x => x * x).sum); a.map(_ / n) }
  private val u = unit(uRaw)
  private val w = unit(wRaw)
  private val n = 600
  private def sOf(r: Int) = ((r * 7919) % 101 - 50) / 10.0
  private def tOf(r: Int) = ((r * 104729) % 97 - 48) / 10.0
  private def vec(r: Int): Array[Float] =
    Array.tabulate(dim)(i => (sOf(r) * u(i) + 0.1 * tOf(r) * w(i) + 3.0).toFloat)

  test("pcaFit recovers planted directions; basis orthonormal; eigen residuals small") {
    import spark.implicits._
    val df = (0 until n).map(r => (r.toLong, vec(r))).toDF("vec_id", "embedding")
    val model = Similarity.pcaFit(df, "embedding", dim, k = dim)
    // eigenvalues descending; rank-2 data -> the rest are ~0 (float input noise)
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(model.eigenvalues.drop(2).forall(ev => math.abs(ev) < 1e-9))
    // planted directions recovered (sign-canonical, so compare |cos|)
    def cos(a: Array[Double], b: Array[Double]) =
      math.abs(a.zip(b).map { case (x, y) => x * y }.sum) /
        math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    assert(cos(model.components(0), u) > 0.9999)
    assert(cos(model.components(1), w) > 0.9999)
    // orthonormal basis
    for (a <- 0 until dim; b <- a until dim) {
      val dot = model.components(a).zip(model.components(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"V$a · V$b = $dot")
    }
    // eigenpair residual against the operator's own covariance: |Cov v - λ v| small
    val cov = Array.ofDim[Double](dim, dim)
    Similarity.covarianceMatrix(df, "embedding", dim).collect().foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(3))
      cov(i)(j) = c; cov(j)(i) = c
    }
    for (c <- 0 until 2) {
      val v = model.components(c)
      val av = Array.tabulate(dim)(i => (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      val res = math.sqrt(av.zip(v).map { case (x, y) => val d = x - model.eigenvalues(c) * y; d * d }.sum)
      assert(res < 1e-8, s"eigenpair $c residual $res")
    }
    // mean recovered exactly: mean_i = s̄·u_i + 0.1·t̄·w_i + 3 (float-rounded input)
    val sBar = (0 until n).map(sOf).sum / n
    val tBar = (0 until n).map(tOf).sum / n
    for (i <- 0 until dim)
      assert(math.abs(model.mean(i) - (sBar * u(i) + 0.1 * tBar * w(i) + 3.0)) < 1e-5)
    intercept[IllegalArgumentException] { Similarity.pcaFit(df, "embedding", dim, k = 0) }
  }

  test("pcaProject: per-component variance equals eigenvalues; components uncorrelated; centered") {
    import spark.implicits._
    val df = (0 until n).map(r => (r.toLong, vec(r))).toDF("vec_id", "embedding")
    val model = Similarity.pcaFit(df, "embedding", dim, k = 3)
    val proj = Similarity.pcaProject(df, "embedding", model)
      .select("y0", "y1", "y2")
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def meanOf(xs: Seq[Double]) = xs.sum / xs.length
    def varS(xs: Seq[Double]) = { val m = meanOf(xs); xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1) }
    val (y0, y1, y2) = (proj.map(_._1).toSeq, proj.map(_._2).toSeq, proj.map(_._3).toSeq)
    assert(math.abs(varS(y0) / model.eigenvalues(0) - 1) < 1e-6)
    assert(math.abs(varS(y1) / model.eigenvalues(1) - 1) < 1e-6)
    // centered: projections average to ~0
    assert(math.abs(meanOf(y0)) < 1e-9 && math.abs(meanOf(y1)) < 1e-9)
    // uncorrelated components
    val m0 = meanOf(y0); val m1 = meanOf(y1)
    val covar = y0.zip(y1).map { case (a, b) => (a - m0) * (b - m1) }.sum / (n - 1)
    assert(math.abs(covar) < 1e-8)
    // y2 carries only float-rounding noise on rank-2 data
    assert(varS(y2) < 1e-9)
  }

  test("pcaVerifyRows: all invariants hold; n/trace match brute force; wrong-length excluded") {
    import spark.implicits._
    val base = (0 until n).map(r => (r.toLong, vec(r)))
    val df = base.toDF("vec_id", "embedding")
      .union(Seq((9999L, Array(1.0f))).toDF("vec_id", "embedding")) // excluded, not mis-fitted
    val rows = Similarity.pcaVerifyRows(df, "embedding", dim, k = 3)
      .orderBy("c").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    rows.foreach { r =>
      assert(r.getLong(1) == n.toLong)
      (3 to 7).foreach(i => assert(r.getBoolean(i), s"c=${r.getLong(0)} col $i"))
    }
    // trace == brute-force sum of per-coordinate sample variances
    val cols = (0 until dim).map(i => base.map(_._2(i).toDouble))
    def varS(xs: Seq[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val brute = cols.map(varS).sum
    assert(math.abs(rows.head.getDouble(2) - brute) < 1e-9 * math.max(1.0, brute))
  }

  test("covarianceMatrix/pcaFit refuse dims beyond the documented ceiling, loudly") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val bad = Similarity.MaxCovDim + 1
    val e1 = intercept[IllegalArgumentException] {
      Similarity.covarianceMatrix(df, "embedding", bad)
    }
    assert(e1.getMessage.contains("ceiling") && e1.getMessage.contains(bad.toString))
    // pcaFit routes through the same guard BEFORE any job runs
    val e2 = intercept[IllegalArgumentException] {
      Similarity.pcaFit(df, "embedding", bad, k = 2)
    }
    assert(e2.getMessage.contains("ceiling"))
    // the ceiling itself stays on the accepted side of the require
    assert(Similarity.MaxCovDim == 4096)
  }
}
