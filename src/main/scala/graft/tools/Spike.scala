package graft.tools

import graft.Sessions

/** Scratch main for ad-hoc driving (see .claude/skills/verify/SKILL.md).
  * Default: the driver's smoke — run SparkEntry.entry. With args: micro-
  * bench the named queries at sf0.1 (3 runs each; min is the number to
  * trust — full-bench totals carry ±20% machine noise). */
object Spike {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    if (args.isEmpty) {
      val df = graft.SparkEntry.entry(spark)
      df.show(10, truncate = false)
      println("entry rows=" + df.count())
    } else {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
      args.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[spike] $n%-24s min=${times.min}%.2f runs=${times.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
