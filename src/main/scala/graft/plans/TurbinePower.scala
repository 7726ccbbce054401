package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

import graft.physics.Power

/** D11 as a native Catalyst expression with whole-stage codegen — the
  * piecewise turbine power curve (ref `Wind_Genration.py:114-131`),
  * numerically identical to [[graft.physics.Power.turbinePowerKw]]'s
  * built-in composition (same association order, same constants).
  *
  * Exists as the §2.8 "custom Expression with doGenCode" tier: one branchy
  * Java expression instead of the nested `CaseWhen`/`Least` tree, usable
  * from SQL once registered (see [[GraftExtensions]]).
  */
case class TurbinePowerKw(left: Expression, right: Expression)
  extends BinaryExpression {

  // AbstractDataType (and with it ExpectsInputTypes' signature) is
  // private[sql] in Spark 4, so validate input types directly
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"turbine_power_kw requires (double, double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "turbine_power_kw"

  override protected def nullSafeEval(d: Any, v: Any): Any = {
    val density = d.asInstanceOf[Double]
    val vh = v.asInstanceOf[Double]
    if (vh < Power.CutInMps || vh > Power.CutOutMps) 0.0
    else if (vh > Power.RatedAboveMps) Power.RatedKw
    else {
      val cubic = 0.5 * density * Power.RotorSweptAreaM2 * (vh * vh * vh) *
        Power.PowerCoefficient / 1000.0
      math.min(cubic, Power.RatedKw)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, v) => {
      val cubic = ctx.freshName("cubic")
      s"""
         |if ($v < ${Power.CutInMps} || $v > ${Power.CutOutMps}) {
         |  ${ev.value} = 0.0;
         |} else if ($v > ${Power.RatedAboveMps}) {
         |  ${ev.value} = ${Power.RatedKw};
         |} else {
         |  double $cubic = ((((0.5 * $d) * ${Power.RotorSweptAreaM2}) *
         |    (($v * $v) * $v)) * ${Power.PowerCoefficient}) / 1000.0;
         |  ${ev.value} = java.lang.Math.min($cubic, ${Power.RatedKw});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TurbinePowerKw =
    copy(left = newLeft, right = newRight)
}
