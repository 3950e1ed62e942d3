package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension installing graft's native functions — the deploy-time
  * registration path: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes `vec_dot` / `sorted_intersect_count` available in every session of
  * a cluster (including pure-SQL users via Thrift/Connect) without any
  * driver-side `register` call. `Sessions.local` still registers the same
  * functions imperatively for embedded use; both routes resolve to the same
  * codegen'd expressions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[functions.FloatVecDot].getName, "vec_dot"),
        (children: Seq[Expression]) => functions.FloatVecDot(children(0), children(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("sorted_intersect_count"),
        new ExpressionInfo(classOf[functions.SortedIntersectCount].getName, "sorted_intersect_count"),
        (children: Seq[Expression]) => functions.SortedIntersectCount(children(0), children(1))
      )
    )
  }
}
