package graft.tools

import graft.Sessions

/** Throwaway: plan inspection for scale-critical queries. */
object Spike {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val d = "/root/testdata/sf0.1"
    Seq("q07_join3", "q09_tpch1", "q02_filter", "x06_embed_nn", "x03_minhash_lsh").foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
