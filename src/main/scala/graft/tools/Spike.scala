package graft.tools

import graft.Sessions
import graft.operators._

/** Scratch main for ad-hoc driving (see .claude/skills/verify/SKILL.md). */
object Spike {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[spike] $label%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm everything once
    time("warm cand")(Dedup.minhashCandidates(docs, "doc_id", "text").count())
    time("warm sets")(Dedup.shingleHashSets(docs, "doc_id", "text").count())
    time("warm nearDup")(Dedup.nearDuplicates(docs, "doc_id", "text", 0.8).count())
    // warm measurements
    time("cand count")(Dedup.minhashCandidates(docs, "doc_id", "text").count())
    time("sets count")(Dedup.shingleHashSets(docs, "doc_id", "text").count())
    time("nearDup count")(Dedup.nearDuplicates(docs, "doc_id", "text", 0.8).count())
    spark.stop()
  }
}
