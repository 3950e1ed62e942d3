package graft.tools

import graft.Sessions
import graft.operators.Scale
import org.apache.spark.sql.functions._

/** Throwaway: drive the Scale toolkit at sf0.1. */
object Spike {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("16")
    val d = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$d/lineitem.parquet")
    val o = spark.read.parquet(s"$d/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val t0 = System.nanoTime()
    val plain = li.join(o, Seq("l_orderkey")).count()
    val t1 = System.nanoTime()
    val salted = Scale.saltedJoin(li, o, Seq("l_orderkey"), 16).count()
    val t2 = System.nanoTime()
    println(f"plain join: $plain rows ${(t1 - t0) / 1e9}%.2f s; salted: $salted rows ${(t2 - t1) / 1e9}%.2f s")
    require(plain == salted, "row count mismatch")
    Scale.writeBucketed(li.select("l_orderkey", "l_quantity"), "spike_li_b", Seq("l_orderkey"), 16)
    println("bucketed table written: " + spark.table("spike_li_b").count() + " rows")
    spark.sql("DROP TABLE spike_li_b")
    spark.stop()
  }
}
