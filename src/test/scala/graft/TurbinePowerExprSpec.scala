package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.physics.Power
import graft.plans.{GraftExtensions, TurbinePowerKw}

/** The custom codegen Expression must be bit-identical to the built-in
  * `when`/`least` composition it replaces, from both the Column and the
  * registered-SQL-function surfaces.
  */
class TurbinePowerExprSpec extends SparkSpec {
  import spark.implicits._

  test("native expression == built-in composition across the whole curve") {
    val sweep = Seq.tabulate(600)(i => i * 0.05).toDF("v") // 0..30 m/s
    val native = ColumnBridge.column(TurbinePowerKw(
      ColumnBridge.expression(lit(1.3)), ColumnBridge.expression(col("v"))))
    val diff = sweep.select(
        native.as("n"), Power.turbinePowerKw(lit(1.3), col("v")).as("b"))
      .filter(col("n") =!= col("b")).count()
    assert(diff === 0)
  }

  test("registered SQL function evaluates through the SQL surface") {
    ColumnBridge.registerFunction(spark, GraftExtensions.turbinePower)
    val out = spark.sql(
      "SELECT turbine_power_kw(1.225D, 13.0D) AS rated, " +
        "turbine_power_kw(1.225D, 2.0D) AS below_cutin").head()
    assert(out.getDouble(0) === 2500.0)
    assert(out.getDouble(1) === 0.0)
  }

  test("registerAll exposes the column-composition operators to SQL") {
    GraftExtensions.registerAll(spark)
    val out = spark.sql(
      """SELECT token_count('hello brave new world') AS tc,
        | wind_class(5.0D) AS wc,
        | doc_fingerprint(' A  b ') = doc_fingerprint('a b') AS norm_eq,
        | jaccard(array('a b','b c'), array('a b','b c')) AS j,
        | hamming_distance(simhash16('x y z'), simhash16('x y z')) AS ham
        |""".stripMargin).head()
    assert(out.getInt(0) === 4)
    assert(out.getString(1) === "Light")
    assert(out.getBoolean(2))
    assert(out.getDouble(3) === 1.0)
    assert(out.getInt(4) === 0)
  }

  test("null inputs yield null (BinaryExpression null-safety)") {
    val out = Seq((Some(1.2), None: Option[Double]), (None, Some(5.0)))
      .toDF("d", "v")
      .select(ColumnBridge.column(TurbinePowerKw(
        ColumnBridge.expression(col("d")), ColumnBridge.expression(col("v")))))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
