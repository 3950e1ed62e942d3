package graft.tools

import graft.Sessions
import org.apache.spark.scheduler._

/** Scratch main for ad-hoc driving (see .claude/skills/verify/SKILL.md). */
object Spike {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32")
    @volatile var stages = List.empty[(Int, Long, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages = (si.stageId, ms, si.numTasks, si.name.takeWhile(_ != '\n').take(60)) :: stages
      }
    })
    val fn = graft.SparkEntry.queries("x03_minhash_lsh")
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"[spike] x03 first run ${(System.nanoTime() - t0) / 1e9}%.2f s; stages:")
    Thread.sleep(500)
    stages.reverse.foreach { case (id, ms, nt, nm) =>
      println(f"[spike]   stage $id%3d ${ms / 1000.0}%6.2f s tasks=$nt%3d $nm")
    }
    spark.stop()
  }
}
