package graft.tools

import graft.Sessions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Throwaway probe: approxTopK knobs at sf0.1. */
object Spike {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("16")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    println("corpus=" + e.count())
    def run(nBits: Int, probe: Int): Unit = {
      val t0 = System.nanoTime()
      val n = Similarity.approxTopK(e, "vec_id", "embedding", 10, 64, nBits, probe).count()
      println(f"nBits=$nBits probe=$probe -> $n rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    run(6, 0); run(6, 1); run(8, 2)
    // probe: k larger than any candidate set — returns what exists, no error
    val big = Similarity.approxTopK(e.limit(50), "vec_id", "embedding", 1000, 64, 2, 0).count()
    println("k>corpus rows=" + big)
    spark.stop()
  }
}
