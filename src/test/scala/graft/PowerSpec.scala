package graft

import org.apache.spark.sql.functions._
import graft.physics.Power

/** D9-D18 physics columns against hand-computed values
  * (ref `Wind_Genration.py:106-136`, `Solar_Generation.py:91-142`).
  */
class PowerSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head().getDouble(0)

  test("D9 hub wind speed: v * (100/10)^0.14") {
    assert(math.abs(one(Power.hubWindSpeed(lit(5.0))) -
      5.0 * math.pow(10.0, 0.14)) < 1e-12)
  }

  test("D10 air density: 1014 hPa at 23.92 C ~ 1.189 (matches logged value)") {
    val rho = one(Power.airDensity(lit(1014.0), lit(23.92)))
    assert(math.abs(rho - 1014.0 * 100 / (287.05 * (23.92 + 273.15))) < 1e-12)
    assert(math.abs(rho - 1.189) < 1e-3) // wind_farm_data_log.csv row 1
  }

  test("D11 power curve: zero below cut-in and above cut-out") {
    assert(one(Power.turbinePowerKw(lit(1.2), lit(2.9))) === 0.0)
    assert(one(Power.turbinePowerKw(lit(1.2), lit(25.1))) === 0.0)
  }

  test("D11 power curve: rated 2500 kW above 12 m/s, cubic-clamped below") {
    assert(one(Power.turbinePowerKw(lit(1.2), lit(13.0))) === 2500.0)
    val v = 6.0
    val cubic = 0.5 * 1.2 * Power.RotorSweptAreaM2 * v * v * v * 0.4 / 1000.0
    assert(math.abs(one(Power.turbinePowerKw(lit(1.2), lit(v))) - cubic) < 1e-9)
    // near the top of the cubic region the min() clamp engages
    // (0.5*1.5*area*11.9^3*0.4/1000 ~ 2670 kW > rated)
    assert(one(Power.turbinePowerKw(lit(1.5), lit(11.9))) === 2500.0)
  }

  test("D13 efficiency derates with temperature, floors at 0.05") {
    assert(math.abs(one(Power.effectiveEfficiency(lit(25.0))) - 0.18) < 1e-12)
    assert(one(Power.effectiveEfficiency(lit(500.0))) === 0.05)
  }

  test("D15 irradiance from clouds floors at 50") {
    assert(one(Power.irradianceFromClouds(lit(0.0))) === 1000.0)
    assert(one(Power.irradianceFromClouds(lit(100.0))) === 50.0)
  }

  test("D14 solar power: 1000 W/m2, eff 0.18, 1e6 panels -> 259.59 MW scale") {
    val p = one(Power.solarPowerKw(lit(1000.0), lit(0.18), lit(1000000.0)))
    assert(math.abs(p - 1000.0 * 1.7 * 0.18 * 0.85 * 1000000.0 / 1000.0) < 1e-6)
  }

  test("D16 daytime gate zeroes outside [6,18)") {
    assert(one(Power.gateDaytime(lit(7.5), lit(5))) === 0.0)
    assert(one(Power.gateDaytime(lit(7.5), lit(6))) === 7.5)
    assert(one(Power.gateDaytime(lit(7.5), lit(17))) === 7.5)
    assert(one(Power.gateDaytime(lit(7.5), lit(18))) === 0.0)
  }

  test("D17/D18: V*I power and power coefficient") {
    assert(one(Power.powerFromVI(lit(400.0), lit(5.0))) === 2.0)
    assert(math.abs(one(Power.powerCoefficient(lit(100.0), lit(5.0))) -
      100.0 / (125.0 + 0.001)) < 1e-12)
  }
}
