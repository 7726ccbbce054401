package graft.physics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physics-derived power columns (SURVEY.md §2.3, D9-D18).
  *
  * These are the reference's core domain computations, re-expressed as pure
  * Catalyst column expressions: constants fold, the piecewise power curve
  * compiles to branch-free codegen, and nothing here adds a shuffle.
  */
object Power {

  // Wind constants (ref Wind_Genration.py:18-20, 109-131)
  val HubHeightM = 100.0
  val RefHeightM = 10.0
  val ShearAlpha = 0.14
  val GasConstant = 287.05
  val RotorRadiusM = 41.0
  val PowerCoefficient = 0.4
  val CutInMps = 3.0
  val CutOutMps = 25.0
  val RatedKw = 2500.0
  val RatedAboveMps = 12.0
  /** π·r² — swept rotor area, folded once. */
  val RotorSweptAreaM2: Double = math.Pi * RotorRadiusM * RotorRadiusM
  /** (H/H_ref)^α shear factor, folded once. */
  val ShearFactor: Double = math.pow(HubHeightM / RefHeightM, ShearAlpha)

  /** D9: hub-height wind speed, power-law shear profile
    * v·(H/H_ref)^α (ref `Wind_Genration.py:106`).
    */
  def hubWindSpeed(v: Column): Column = v * ShearFactor

  /** D10: air density from ideal gas law P·100/(R·(T+273.15))
    * (ref `Wind_Genration.py:108-112`).
    */
  def airDensity(pressureHpa: Column, tempC: Column): Column =
    pressureHpa * 100.0 / (lit(GasConstant) * (tempC + 273.15))

  /** D11: piecewise turbine power curve (ref `Wind_Genration.py:114-131`).
    * Cubic power 0.5·ρ·π·r²·v³·Cp/1000 kW, zero outside [cut-in, cut-out],
    * capped at rated power above rated speed, `least` clamp in between.
    */
  def turbinePowerKw(density: Column, vHub: Column): Column = {
    // v³ as an explicit multiply chain (not pow): bit-identical across
    // engines, and cheaper in codegen than a libm pow call
    val cubic = lit(0.5) * density * RotorSweptAreaM2 * (vHub * vHub * vHub) *
      PowerCoefficient / 1000.0
    when(vHub < CutInMps || vHub > CutOutMps, 0.0)
      .when(vHub > RatedAboveMps, RatedKw)
      .otherwise(least(cubic, lit(RatedKw)))
  }

  /** D12: farm power and 10-minute energy scalings
    * (ref `Wind_Genration.py:133-136`).
    */
  def farmPowerKw(turbinePower: Column, numTurbines: Column): Column =
    turbinePower * numTurbines
  def energyKwh10min(powerKw: Column): Column = powerKw * (10.0 / 60.0)

  // Solar constants (ref Solar_Generation.py:129-142)
  val PanelAreaM2 = 1.7
  val BaseEfficiency = 0.18
  val TempDeratePerC = 0.0045
  val MinEfficiency = 0.05
  val SystemLoss = 0.85
  val StcTempC = 25.0

  /** D13: effective panel efficiency with temperature derating
    * max(0.18·(1−0.0045·(T−25)), 0.05) (ref `Solar_Generation.py:129-134`).
    */
  def effectiveEfficiency(panelTempC: Column): Column =
    greatest(
      lit(BaseEfficiency) * (lit(1.0) - lit(TempDeratePerC) * (panelTempC - StcTempC)),
      lit(MinEfficiency))

  /** D14: solar farm power irr·area·eff·loss·panels/1000 kW
    * (ref `Solar_Generation.py:139-141`).
    */
  def solarPowerKw(irradiance: Column, efficiency: Column, numPanels: Column): Column =
    irradiance * PanelAreaM2 * efficiency * SystemLoss * numPanels / 1000.0

  /** D15: irradiance from cloud cover max(1000·(1−clouds/100), 50)
    * (ref `Solar_Generation.py:91-92`).
    */
  def irradianceFromClouds(cloudsPct: Column): Column =
    greatest(lit(1000.0) * (lit(1.0) - cloudsPct / 100.0), lit(50.0))

  /** D16: daytime gating — the reference's own Spark port reduces astral
    * sunrise/sunset to an hour window (databricks.docx:82); outputs zeroed
    * at night (ref `Solar_Generation.py:110-125`).
    */
  def gateDaytime(value: Column, hourCol: Column): Column =
    when(hourCol >= 6 && hourCol < 18, value).otherwise(0.0)

  /** D16 with a fidelity switch: `astral = false` (default) keeps the
    * hour-window simplification above — the behavior every existing oracle
    * pins; `astral = true` swaps in the NOAA per-lat/lon sunrise/sunset
    * closed form ([[SunTimes.gate]]), reproducing the reference's
    * `is_daytime` (`Solar_Generation.py:110-125`) bit-for-bit in intent:
    * real sun times instead of a fixed 06–18 window. Both faces are pure
    * column arithmetic — same scan, same codegen, no shuffle.
    */
  def gateDaytimeMode(value: Column, ts: Column, lat: Column, lon: Column,
      astral: Boolean = false): Column =
    if (astral) SunTimes.gate(value, ts, lat, lon)
    else gateDaytime(value, hour(ts))

  /** D17: electrical power from V·I (ref `Solar_Dashboard.py:117-121`). */
  def powerFromVI(voltage: Column, current: Column): Column =
    voltage * current / 1000.0

  /** D18: empirical power coefficient p/(v³+ε)
    * (ref `Wind_Dashboard.py:125-126`).
    */
  def powerCoefficient(power: Column, speed: Column): Column =
    power / (pow(speed, 3) + 0.001)
}
