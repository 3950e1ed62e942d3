package graft.tools

import graft.Sessions

/** Scratch main for ad-hoc driving (see .claude/skills/verify/SKILL.md).
  * Default behavior: the driver's t1 smoke — run SparkEntry.entry. */
object Spike {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    val df = graft.SparkEntry.entry(spark)
    df.show(10, false)
    println("entry rows=" + df.count())
    spark.stop()
  }
}
