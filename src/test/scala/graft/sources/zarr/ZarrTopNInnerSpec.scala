package graft.sources.zarr

import graft.SparkTester
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** TopN pushdown is kept-set-symmetric: `ORDER BY <inner dim> LIMIT k`
  * narrows that dim's kept set exactly like the leading dim's — the cell
  * geometry is a cross product, so the winners occupy a hyper-slab along
  * ANY sorted dim. Scan cell counts are the observable. */
class ZarrTopNInnerSpec extends AnyFunSuite with SparkTester {

  private def scanCells(d: DataFrame): String = {
    val p = d.queryExecution.executedPlan.toString
    "cells=(\\d+)".r.findFirstMatchIn(p).map(_.group(1)).getOrElse("?")
  }

  test("ORDER BY inner dim LIMIT k narrows the inner kept set (cells pinned)") {
    val root = Files.createTempDirectory("topninner").toString
    // 20 x 20 grid, chunks (5,5): values are the flat cell index
    spark.range(0, 400).selectExpr(
      "cast(id div 20 as int) as t", "cast(id % 20 as int) as s", "id as value")
      .write.format("zarr")
      .option("path", root).option("array", "v").option("chunks", "5,5")
      .mode("append").save()
    def rd = spark.read.format("zarr").option("path", root).option("array", "v").load()
    // leading dim: 3 winners need ceil(3/20)=1 t value -> 20 cells
    val lead = rd.orderBy(desc("t")).limit(3)
    assert(scanCells(lead) == "20", lead.queryExecution.executedPlan.toString)
    assert(lead.collect().map(_.getInt(0)).forall(_ == 19))
    // INNER dim: the same narrowing applies to s -> 20 cells (t full, 1 s)
    val inner = rd.orderBy(desc("s")).limit(3)
    assert(scanCells(inner) == "20", inner.queryExecution.executedPlan.toString)
    val innerRows = inner.collect()
    assert(innerRows.map(_.getInt(1)).forall(_ == 19))
    assert(innerRows.length == 3)
    // ascending inner with a deeper tie-break column stays exact
    val top = rd.orderBy(col("s"), desc("t")).limit(2)
    assert(scanCells(top) == "20")
    assert(top.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((19, 0, 380L), (18, 0, 360L)))
    // both dims filtered + inner TopN compose: kept sets intersect
    val both = rd.filter(col("t") < 10).orderBy(desc("s")).limit(4)
    assert(scanCells(both) == "10")
    assert(both.collect().map(r => (r.getInt(0), r.getInt(1))).toSet.subsetOf(
      (0 until 10).map(t => (t, 19)).toSet))
    // inner-dim TopN larger than one value's row count: 25 winners need
    // ceil(25/20)=2 s values -> 40 cells
    val wide = rd.orderBy(desc("s")).limit(25)
    assert(scanCells(wide) == "40")
    assert(wide.collect().map(_.getInt(1)).forall(v => v == 19 || v == 18))
  }
}
