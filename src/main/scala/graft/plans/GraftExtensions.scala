package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.dedup.Dedup
import graft.features.Features
import graft.physics.Power
import graft.text.TextAnalysis

/** SparkSessionExtensions entry point: exposes the engine's operators on
  * the SQL surface. `turbine_power_kw` is a native codegen Expression; the
  * rest are Column compositions wrapped into expression builders, so
  * `spark.sql("SELECT quality_score(text) …")` works the same as the
  * DataFrame API.
  *
  * Activate with `.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build, or
  * [[GraftExtensions.registerAll]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def fromColumns(name: String, arity: Int, f: Seq[Column] => Column):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft", name),
    (children: Seq[Expression]) => {
      if (children.size != arity)
        ColumnBridge.wrongNumArgs(name, arity, children.size)
      // eager conversion: the lazy wrapper is Unevaluable inside a
      // FunctionRegistry builder (no Dataset-API unwrap pass runs)
      ColumnBridge.eagerExpression(f(children.map(ColumnBridge.column)))
    })

  val turbinePower: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("turbine_power_kw"),
    new ExpressionInfo(classOf[TurbinePowerKw].getName, "turbine_power_kw"),
    (children: Seq[Expression]) => {
      if (children.size != 2)
        ColumnBridge.wrongNumArgs("turbine_power_kw", 2, children.size)
      TurbinePowerKw(children.head, children(1))
    })

  /** `shingle_set(text, n)` — n must be an integer literal: shingle width
    * is a codegen-time constant of the kernel, never data-dependent.
    */
  val shingleSet: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_set"),
    new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
    (children: Seq[Expression]) => {
      if (children.size != 2)
        ColumnBridge.wrongNumArgs("shingle_set", 2, children.size)
      children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) =>
          ShingleSet(children.head, v)
        case other => throw new IllegalArgumentException(
          s"shingle_set width must be an integer literal, got $other")
      }
    })

  /** `winnow(text, k, w)` — k-gram width and window size are codegen-time
    * constants of the kernel, so both must be integer literals.
    */
  val winnow: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow"),
    new ExpressionInfo(classOf[Winnow].getName, "winnow"),
    (children: Seq[Expression]) => {
      if (children.size != 3)
        ColumnBridge.wrongNumArgs("winnow", 3, children.size)
      (children(1), children(2)) match {
        case (org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _),
              org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _)) =>
          Winnow(children.head, k, w)
        case other => throw new IllegalArgumentException(
          s"winnow k and w must be integer literals, got $other")
      }
    })

  /** `cdc_chunks(text, window, maskBits)` — content-defined chunk
    * fingerprints as packed `(len·2³¹ + hash)` longs; both dials are
    * codegen-time constants of the kernel, so integer literals only.
    */
  val cdcChunks: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cdc_chunks"),
    new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
    (children: Seq[Expression]) => {
      if (children.size != 3)
        ColumnBridge.wrongNumArgs("cdc_chunks", 3, children.size)
      (children(1), children(2)) match {
        case (org.apache.spark.sql.catalyst.expressions.Literal(w: Int, _),
              org.apache.spark.sql.catalyst.expressions.Literal(m: Int, _)) =>
          CdcChunks(children.head, w, m)
        case other => throw new IllegalArgumentException(
          s"cdc_chunks window and maskBits must be integer literals, got $other")
      }
    })

  /** `misra_gries(item, k)` — the mergeable heavy-hitter summary as a SQL
    * aggregate; capacity must be an integer literal (it sizes the
    * aggregation buffer, never data-dependent). The analyzer wraps the
    * returned AggregateFunction in an AggregateExpression on resolution.
    */
  val misraGries: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("misra_gries"),
    new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
    (children: Seq[Expression]) => {
      if (children.size != 2)
        ColumnBridge.wrongNumArgs("misra_gries", 2, children.size)
      children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
          // cast the item so any atomic type works on the SQL surface;
          // the aggregate itself type-checks for a string child
          MisraGries(org.apache.spark.sql.catalyst.expressions.Cast(
            children.head, org.apache.spark.sql.types.StringType), k)
        case other => throw new IllegalArgumentException(
          s"misra_gries capacity must be an integer literal, got $other")
      }
    })

  /** `top_k_by_score(score, id, k)` — the bounded-heap top-k aggregate on
    * the SQL surface; k must be an integer literal.
    */
  val topKByScore: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("top_k_by_score"),
    new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
    (children: Seq[Expression]) => {
      if (children.size != 3)
        ColumnBridge.wrongNumArgs("top_k_by_score", 3, children.size)
      children(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(k: Int, _) =>
          // cast score/id so integer columns work on the SQL surface; the
          // aggregate itself type-checks for (double, bigint) children
          TopKByScore(
            org.apache.spark.sql.catalyst.expressions.Cast(
              children.head, org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.catalyst.expressions.Cast(
              children(1), org.apache.spark.sql.types.LongType), k)
        case other => throw new IllegalArgumentException(
          s"top_k_by_score k must be an integer literal, got $other")
      }
    })

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    turbinePower,
    shingleSet,
    winnow,
    cdcChunks,
    misraGries,
    topKByScore,
    fromColumns("subword_count", 1, cs => TextAnalysis.subwordCount(cs.head)),
    fromColumns("punct_ratio", 1, cs => TextAnalysis.punctRatio(cs.head)),
    fromColumns("stopword_ratio", 1, cs => TextAnalysis.stopwordRatio(cs.head)),
    fromColumns("avg_token_len", 1, cs => TextAnalysis.avgTokenLen(cs.head)),
    fromColumns("normalize_text", 1, cs => TextAnalysis.normalized(cs.head)),
    fromColumns("quality_score", 1, cs => TextAnalysis.qualityScore(cs.head)),
    fromColumns("token_count", 1, cs => TextAnalysis.tokenCount(cs.head)),
    fromColumns("doc_fingerprint", 1, cs => TextAnalysis.fingerprint(cs.head)),
    fromColumns("mojibake_hits", 1, cs => TextAnalysis.mojibakeHits(cs.head)),
    fromColumns("simhash16", 1, cs => Dedup.simhash16(cs.head)),
    fromColumns("hamming_distance", 2, cs => Dedup.hammingDistance(cs.head, cs(1))),
    fromColumns("jaccard", 2, cs => Dedup.jaccard(cs.head, cs(1))),
    fromColumns("wind_class", 1, cs => Features.windClass(cs.head)),
    fromColumns("air_density", 2, cs => Power.airDensity(cs.head, cs(1))),
    fromColumns("hub_wind_speed", 1, cs => Power.hubWindSpeed(cs.head)),
    fromColumns("wind_power_density", 2,
      cs => Features.windPowerDensity(cs.head, cs(1))),
    fromColumns("effective_efficiency", 1,
      cs => Power.effectiveEfficiency(cs.head)),
    fromColumns("solar_power_kw", 3,
      cs => Power.solarPowerKw(cs.head, cs(1), cs(2))),
    fromColumns("irradiance_from_clouds", 1,
      cs => Power.irradianceFromClouds(cs.head)),
    fromColumns("repetition_score", 1,
      cs => TextAnalysis.repetitionScore(cs.head)),
    fromColumns("hash_bucket", 2,
      cs => graft.sampling.Sampling.hashBucket(cs.head, cs(1))),
    // SUM(manifest_hash32(id, payload)) GROUP BY shard *is* the x173
    // manifest checksum on the SQL surface — order/partition-invariant
    fromColumns("manifest_hash32", 2,
      cs => graft.sampling.Sharding.rowHash32(cs.head, cs(1))),
    // SUM(bootstrap_weight(id, b) * x) GROUP BY b *is* the x183 Poisson
    // bootstrap in pure SQL — replicate as a column, no RNG state
    fromColumns("bootstrap_weight", 2,
      cs => graft.analytics.Evaluation.poissonWeight(cs.head, cs(1))),
    // SUM(varint_size(gap)) *is* the x193 index-size estimate in pure
    // SQL — shared byte-cost builder, no float log at a power of two
    fromColumns("varint_size", 1,
      cs => graft.text.Postings.varintSize(cs.head)),
    // count + laplace_noise(key, eps) *is* the x192 DP release in pure
    // SQL — hash-seeded inverse CDF, reproducible and engine-portable
    fromColumns("laplace_noise", 2,
      cs => graft.clean.Validation.laplaceNoise(cs.head, cs(1))),
    // wilson_lo(k, n, z) *is* the x202 gating statistic in pure SQL —
    // same center−half arithmetic as wilsonGate, unrounded
    fromColumns("wilson_lo", 3,
      cs => graft.analytics.Evaluation.wilsonLower(cs.head, cs(1), cs(2))),
    // SUM(freshness_weight(age,hl))² / SUM(w·w) *is* the x203 Kish ESS
    // in pure SQL — shared decay builder, null on hl <= 0
    fromColumns("freshness_weight", 2,
      cs => graft.sampling.Importance.freshnessWeight(cs.head, cs(1))),
    nativeBinary("cosine_sim", CosineSim(_, _)),
    nativeBinary("dot_product", DotProduct(_, _)))

  private def nativeBinary(name: String, f: (Expression, Expression) => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft", name),
    (children: Seq[Expression]) => {
      if (children.size != 2)
        ColumnBridge.wrongNumArgs(name, 2, children.size)
      f(children.head, children(1))
    })

  /** Register everything on an already-running session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach(ColumnBridge.registerFunction(spark, _))
}
