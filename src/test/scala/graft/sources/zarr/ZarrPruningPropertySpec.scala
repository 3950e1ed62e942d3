package graft.sources.zarr

import graft.SparkTester
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.util.Random

/** Property-style soundness harness for the zone-map pruning stack: random
  * stores (shapes, chunk grids, dtypes, NaN cells, unwritten rectangles,
  * fills) x random predicate conjunctions — the PRUNED scan must return
  * exactly the rows of the same scan with `stats.pruning=false`. A seed is
  * printed on failure so any counterexample replays deterministically. */
class ZarrPruningPropertySpec extends AnyFunSuite with SparkTester {

  private def randomCase(rnd: Random, caseId: Int): Unit = {
    val root = Files.createTempDirectory(s"zarrprop$caseId").toString
    val n1 = 6 + rnd.nextInt(30)
    val n2 = 2 + rnd.nextInt(6)
    val c1 = 1 + rnd.nextInt(7)
    val c2 = 1 + rnd.nextInt(3)
    val floatDomain = rnd.nextBoolean()
    val fill = rnd.nextInt(3) match {
      case 0 => None
      case 1 => Some("0")
      case _ => Some("7")
    }
    // value: pseudo-random but deterministic in (i, j); floats sometimes NaN
    val seed = rnd.nextInt(1000)
    val valueExpr: Column = {
      val base = (col("i") * 31 + col("j") * 17 + lit(seed)) % 97 - 48
      if (floatDomain)
        when((col("i") * 7 + col("j") + lit(seed)) % 13 === 0, lit(Double.NaN))
          .otherwise(base.cast("double") * 0.5)
      else base.cast("long")
    }
    // unwritten rectangle: a chunk-aligned i-band with no input rows
    val holeLo = rnd.nextInt(n1)
    val holeHi = math.min(n1, holeLo + rnd.nextInt(8))
    var df = spark.range(0, n1.toLong * n2)
      .select((col("id") / n2).cast("int").as("i"), (col("id") % n2).cast("int").as("j"))
      .withColumn("value", valueExpr)
      .filter(!(col("i") >= holeLo && col("i") < holeHi && col("j") >= 0))
    // the i axis must keep all values or the grid shrinks: re-add one row
    // per i with j = 0 when the hole would erase an i value entirely
    if (holeHi > holeLo)
      df = df.union(
        spark.range(holeLo, holeHi)
          .select(col("id").cast("int").as("i"), lit(0).cast("int").as("j"))
          .withColumn("value", valueExpr)
      )
    var w = df.write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", s"$c1,$c2")
    fill.foreach(f => w = w.option("fill_value", f))
    w.mode("append").save()

    def read(stats: Boolean): DataFrame = spark.read.format("zarr")
      .option("path", root).option("array", "v")
      .option("stats.pruning", stats.toString)
      .load()

    // random predicate conjunction over value (and sometimes a dim)
    def lit1(): Any = if (floatDomain) (rnd.nextInt(97) - 48) * 0.5 else (rnd.nextInt(97) - 48).toLong
    def valuePred(): Column = rnd.nextInt(6) match {
      case 0 => col("value") > lit1()
      case 1 => col("value") >= lit1()
      case 2 => col("value") < lit1()
      case 3 => col("value") <= lit1()
      case 4 => col("value") === lit1()
      case _ => col("value").isin(lit1(), lit1(), lit1())
    }
    var pred = valuePred()
    if (rnd.nextBoolean()) pred = pred && valuePred()
    if (rnd.nextBoolean()) pred = pred && col("i") >= rnd.nextInt(n1)

    // compare canonical strings: NaN != NaN under ==, but the NaN rows must
    // still match positionally
    val pruned = read(stats = true).filter(pred).collect().map(_.toSeq.toString).sorted
    val full = read(stats = false).filter(pred).collect().map(_.toSeq.toString).sorted
    assert(
      pruned.toSeq == full.toSeq,
      s"case $caseId diverged (seed-local state printed above): " +
        s"n=($n1,$n2) chunks=($c1,$c2) float=$floatDomain fill=$fill hole=[$holeLo,$holeHi) pred=$pred"
    )
  }

  test("pruned scans equal unpruned scans over random stores and predicates") {
    val seed = System.nanoTime()
    info(s"master seed: $seed")
    val rnd = new Random(seed)
    (0 until 25).foreach(i => randomCase(rnd, i))
  }
}
