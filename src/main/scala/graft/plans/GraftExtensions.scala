package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.VectorExpressions.{FloatVectorDot, FloatVectorNorm}

/** SQL registration of the engine's custom Catalyst expressions, both as a
  * `SparkSessionExtensions` class (for cluster deployment via
  * `spark.sql.extensions=graft.plans.GraftExtensions`) and as a direct
  * session-level registrar (for local/test sessions created before the conf
  * is set). After registration, `spark.sql("SELECT fvec_dot(a, b) …")`
  * plans the codegen'd expressions like any built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(dotDescriptor)
    ext.injectFunction(normDescriptor)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VectorExpressions.type].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  val dotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("fvec_dot"),
      info("fvec_dot", "fvec_dot(a, b) - dot product of two float/double vectors as double"),
      (exprs: Seq[Expression]) => FloatVectorDot(exprs(0), exprs(1)))

  val normDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("fvec_norm"),
      info("fvec_norm", "fvec_norm(a) - L2 norm of a float/double vector as double"),
      (exprs: Seq[Expression]) => FloatVectorNorm(exprs(0)))

  /** Register on an already-built session (temp-function registry +
    * experimental strategies). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fvec_dot", exprs => FloatVectorDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fvec_norm", exprs => FloatVectorNorm(exprs.head), "built-in")
    org.apache.spark.sql.graft.bridge.addStrategy(spark, AsOfJoinStrategy)
  }
}
