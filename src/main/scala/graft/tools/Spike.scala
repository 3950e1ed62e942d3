package graft.tools

import graft.Sessions
import graft.operators.Pipeline
import org.apache.spark.sql.functions._

/** Throwaway probe: cleanCorpus edge thresholds. */
object Spike {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // impossible quality bar -> empty, no error
    println("empty=" + Pipeline.cleanCorpus(docs, "doc_id", "text", 1.1, 0.8).count())
    // zero bar + high dup threshold -> everything unique text survives
    println("all=" + Pipeline.cleanCorpus(docs, "doc_id", "text", 0.0, 1.01).count() +
      " of " + docs.count())
    spark.stop()
  }
}
