package graft.tools

import graft.Sessions

/** Scratch main for ad-hoc driving (see .claude/skills/verify/SKILL.md). */
object Spike {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    val names = if (args.nonEmpty) args.toSeq else Seq("x22_clean_corpus")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[spike] $n%-24s runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
