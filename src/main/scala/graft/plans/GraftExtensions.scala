package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` at session build time; for an
  * already-running session use
  * [[org.apache.spark.sql.graftbridge.ColumnBridge.registerFunction]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.turbinePower)
  }
}

object GraftExtensions {
  val turbinePower: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("turbine_power_kw"),
    new ExpressionInfo(classOf[TurbinePowerKw].getName, "turbine_power_kw"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "turbine_power_kw(density, v_hub)")
      TurbinePowerKw(children.head, children(1))
    })
}
