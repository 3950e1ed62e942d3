package graft.tools

import graft.Sessions

/** Throwaway probe: vec_dot misuse at the SQL surface. */
object Spike {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    try spark.sql("select vec_dot(1, 2)").show()
    catch { case e: Exception => println("typecheck error => " + e.getMessage.linesIterator.next()) }
    try spark.sql("select vec_dot(array(1.0F), 'x')").show()
    catch { case e: Exception => println("typecheck error => " + e.getMessage.linesIterator.next()) }
    spark.sql("select vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) as d").show()
    spark.stop()
  }
}
