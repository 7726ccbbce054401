package graft

/** Smoke-runs every `SparkEntry.queries` entry against the REAL driver
  * testdata at sf0.001 and asserts the plan analyzes.
  *
  * Why this exists: unit specs build their own fixtures (with
  * `TimestampType` columns), so r7 shipped four queries that failed at
  * analysis time on the actual parquet — `events.ts` is
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ, and
  * `unix_micros` rejects NTZ — while 296 fixture-based tests stayed green.
  * Resolving `queryExecution.analyzed` against the real files catches every
  * schema-contract break (missing column, NTZ/nanos drift, type mismatch)
  * in milliseconds per query, with no action run.
  *
  * For the events-backed families (p/d/a/j/o — the time-arithmetic surface
  * where the r7 break lived) we additionally execute `limit(1)` so
  * runtime-only failures (codegen, cast overflow) surface too. The x-family
  * skips the execution step: several entries eagerly build models
  * (IVF centroids, BPE merges) at DataFrame-construction time, so analysis
  * alone already exercises their driver-side machinery, and their own
  * oracle-checked specs cover execution.
  */
class HarnessSmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private val haveData = new java.io.File(sfDir).isDirectory
  private val executeFamilies = Set('p', 'd', 'a', 'j', 'o', 's')

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"analyzes on real testdata: $name") {
      assume(haveData, s"$sfDir not present")
      val df = fn(spark, sfDir)
      // resolution happens here; throws on any schema-contract break
      assert(df.queryExecution.analyzed != null)
      if (executeFamilies.contains(name.head)) {
        df.limit(1).collect()
      }
    }
  }
}
