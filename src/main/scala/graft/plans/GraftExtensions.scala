package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library entry point for `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Registers the engine's native Catalyst expressions as SQL functions so
  * the SQL-string path (§2.D8 parity) reaches them too — a user can write
  * `SELECT vec_dot(a, b)` and get the codegen'd primitive loop, not an
  * interpreted HOF. This is the standard packaging for a Spark-native
  * extension library: nothing here changes planning for the DataFrame path,
  * which constructs the expression directly (Vec.dotF).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot(a, b) takes exactly two arguments")
        FloatVecDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_sq_dist"),
      new ExpressionInfo(classOf[VecSqDist].getName, "vec_sq_dist"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_sq_dist(a, b) takes exactly two arguments")
        VecSqDist(children.head, children(1))
      }))
  }
}
