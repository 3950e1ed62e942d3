package graft.tools

import graft.Sessions

/** Scratch: x06 plan + timing breakdown. */
object Spike {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val d = "/root/testdata/sf0.1"
    val df = graft.SparkEntry.queries("x06_embed_nn")(spark, d)
    println(df.queryExecution.executedPlan.toString().linesIterator.filter(l =>
      l.contains("Aggregate") || l.contains("Join") || l.contains("Exchange") || l.contains("Codegen")
    ).mkString("\n"))
    val e = spark.read.parquet(s"$d/embeddings.parquet").cache(); e.count()
    def time(n: String)(f: => Any): Unit = {
      val t = System.nanoTime(); f
      println(f"$n: ${(System.nanoTime() - t) / 1e9}%.2f s")
    }
    import org.apache.spark.sql.functions._
    import graft.functions.VecFunctions.vecDot
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    time("pairs+dot only")(
      broadcast(q).join(c, col("qid") =!= col("cid"))
        .select(vecDot(col("qv"), col("cv")).as("s")).agg(sum("s")).collect()
    )
    time("full x06")(df.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
