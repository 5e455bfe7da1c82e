package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{PolyHash, SortedIntersectCount, VecDot}

/** SparkSessionExtensions entry point: build-time injection of the
  * engine's native expressions for sessions created with
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * — the static-config alternative to the runtime registration in
  * [[graft.functions.GraftFunctions.register]] (both are kept: the
  * driver contract hands us pre-built sessions, which only the runtime
  * path can serve; operator deployments on a shared cluster prefer the
  * extensions config so every session starts with the functions bound).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential double dot product"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count", "|A ∩ B| of sorted bigint arrays"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", "poly_hash(s) - polynomial string hash mod 1e9+7"),
      (exprs: Seq[Expression]) => PolyHash(exprs(0))))
  }
}
