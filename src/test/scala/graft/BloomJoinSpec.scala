package graft

import org.apache.spark.sql.functions._

import graft.plans.BloomJoin

/** Bloom pre-filtered semi-join: correctness vs the plain semi-join and
  * plan placement of the probe.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val big = spark.range(0, 5000)
    .select(col("id").as("k"), (col("id") % 97).as("payload")).repartition(6)
  private val keys = spark.range(0, 5000).filter(col("id") % 13 === 0)
    .select(col("id").as("fk")).repartition(3)

  test("bloomSemiJoin equals the plain left-semi join exactly") {
    val viaBloom = BloomJoin.bloomSemiJoin(big, col("k"), keys, col("fk"),
      expectedItems = 1000)
      .collect().map(_.getLong(0)).sorted
    val plain = big.join(keys, col("k") === col("fk"), "left_semi")
      .collect().map(_.getLong(0)).sorted
    assert(viaBloom.length === 385) // ceil(5000/13)
    assert(viaBloom.toSeq === plain.toSeq)
  }

  test("might_contain probe sits below the big side's exchange") {
    val out = BloomJoin.bloomSemiJoin(big, col("k"), keys, col("fk"),
      expectedItems = 1000)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    // the probe must be a Filter on the scan side, i.e. appear BELOW
    // (after, in top-down print order) any exchange-free path: assert the
    // filter is not applied post-join by checking it sits under a
    // WholeStageCodegen that also contains the range/scan of `big`
    val probeIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      s"probe should be below the join in the printed plan:\n$plan")
  }

  test("keyBloom has no false negatives; fpp stays near spec") {
    val bloom = BloomJoin.keyBloom(keys, col("fk"), expectedItems = 1000,
      fpp = 0.01)
    val marked = big.withColumn("hit", BloomJoin.mightContain(bloom, col("k")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    // every true member hits
    assert((0L until 5000L by 13L).forall(marked(_)))
    // false-positive rate over the ~4615 non-members stays well under 5x fpp
    val fps = marked.count { case (k, hit) => hit && k % 13 != 0 }
    assert(fps < 0.05 * 4615, s"false positives: $fps")
  }
}
