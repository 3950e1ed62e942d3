package graft.operators

import graft.SparkTester
import graft.queries.Tables.t
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The durability knob (guide §5): `spark.graft.checkpoint.mode=reliable`
  * must route every operator materialization through a storage-backed
  * `checkpoint` (fault-tolerant on a cluster) with results identical to the
  * default executor-local path. */
class MaterializeSpec extends AnyFunSuite with SparkTester {

  test("reliable mode: identical results, checkpoint files actually written") {
    val docs = t(spark, sfTiny, "documents")
    def survivors() = Pipeline
      .cleanCorpus(docs, "doc_id", "text", 0.6, 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def knCe() = {
      val model = TextAnalysis.trainBigramLm(docs.filter(col("lang") === "en"), "doc_id", "text")
      TextAnalysis
        .scoreKneserNey(docs, model, "doc_id", "text")
        .select("doc_id", "ce_bits").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toMap
    }
    val localSurvivors = survivors()
    val localCe = knCe()
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt").toString
    val priorDir = spark.sparkContext.getCheckpointDir
    spark.conf.set("spark.graft.checkpoint.mode", "reliable")
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    spark.sparkContext.setCheckpointDir(dir)
    try {
      assert(survivors() == localSurvivors && localSurvivors.nonEmpty)
      assert(knCe() == localCe && localCe.nonEmpty)
      // the reliable path must have REALLY written checkpoint files
      val written = java.nio.file.Files
        .walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_))
        .count()
      assert(written > 0, s"reliable mode wrote no checkpoint files under $dir")
    } finally {
      spark.conf.unset("spark.graft.checkpoint.mode")
      spark.conf.unset("spark.graft.checkpoint.dir")
      priorDir.foreach(spark.sparkContext.setCheckpointDir)
    }
  }

  test("unknown mode refuses loudly") {
    import spark.implicits._
    spark.conf.set("spark.graft.checkpoint.mode", "replicated")
    try {
      val e = intercept[IllegalArgumentException] {
        Materialize.stage(Seq(1, 2).toDF("x"))
      }
      assert(e.getMessage.contains("spark.graft.checkpoint.mode"))
    } finally spark.conf.unset("spark.graft.checkpoint.mode")
  }
}
