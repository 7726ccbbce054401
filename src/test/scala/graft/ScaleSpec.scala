package graft

import org.apache.spark.sql.functions._
import graft.analytics.Aggregates
import graft.warehouse.Bucketing

/** Scale-technique operators: salted aggregation (skew) and bucketed
  * co-located joins (shuffle elimination). Correctness is equivalence with
  * the naive form; the scale property is asserted on the physical plan.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted sum equals plain sum (including a heavy-hitter key)") {
    val skewed = ((1 to 5000).map(i => ("hot", i.toLong, i * 0.01)) ++
      (1 to 50).map(i => ("cold", i.toLong, i * 1.0)))
      .toDF("k", "row_id", "v")
    val salted = Aggregates.saltedSum(skewed, col("k"), col("row_id"), col("v"),
        saltBuckets = 16, outName = "total")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = skewed.groupBy("k").agg(round(sum("v"), 2).as("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted === plain)
  }

  test("salted join equals the plain join, including a heavy-hitter key") {
    import graft.analytics.Joins
    // key 7 dominates: 5000 of 5600 probe rows
    val probe = spark.range(0, 5600).select(
      when(col("id") < 5000, 7L).otherwise(col("id") % 50).as("k"),
      col("id").as("rid")).repartition(6)
    val build = spark.range(0, 50)
      .select(col("id").as("k"), concat(lit("v"), col("id")).as("payload"))
    val salted = Joins.saltedJoin(probe, build, "k", col("rid"), saltBuckets = 8)
      .collect().map(r => (r.getAs[Long]("rid"), r.getAs[String]("payload")))
      .sorted.toSeq
    val plain = probe.join(build, "k")
      .collect().map(r => (r.getAs[Long]("rid"), r.getAs[String]("payload")))
      .sorted.toSeq
    assert(salted === plain)
    assert(salted.size === 5600)
  }

  test("fuzzy join equals the naive cross-join rule at distance 1") {
    import graft.analytics.Joins
    val left = (0L until 120L).map(i => (i, s"item_$i")).toDF("id", "k")
    // right: exact copies, substitutions, deletions, insertions, far-off
    val right = Seq(
      (900L, "item_7"),   // exact
      (901L, "itemX7"),   // substitution of '_'
      (902L, "item7"),    // deletion
      (903L, "item_107x"),// insertion at the end
      (904L, "totally_different")).toDF("rid", "rk")
    val got = Joins.fuzzyJoin(left, col("id"), col("k"),
        right, col("rid"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSet
    val naive = left.crossJoin(right)
      .withColumn("d", levenshtein(col("k"), col("rk")))
      .filter(col("d") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4))).toSet
    assert(got === naive, "deletion-neighborhood blocking must lose no pair")
    assert(got.contains((7L, 900L, 0)) && got.contains((7L, 901L, 1)) &&
      got.contains((7L, 902L, 1)) && got.contains((107L, 903L, 1)))
    assert(!got.exists(_._2 == 904L))
  }

  test("fuzzy join caps degenerate blocking buckets") {
    import graft.analytics.Joins
    // 50 identical left keys flood every neighborhood bucket past the cap;
    // the distinct pair (both sides unique) still matches
    val left = ((0L until 50L).map(i => (i, "aaaa")) :+ (99L, "unique_key"))
      .toDF("id", "k")
    val right = Seq((1000L, "unique_kex"), (1001L, "aaaa")).toDF("rid", "rk")
    val got = Joins.fuzzyJoin(left, col("id"), col("k"),
        right, col("rid"), col("rk"), maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((99L, 1000L)),
      "flooded 'aaaa' blocks must be dropped by the cap, the clean pair kept")
  }

  test("bucketed join on the bucket key runs without a shuffle exchange") {
    // warehouse dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped below
    val left = (1L to 1000L).map(i => (i, i * 2.0)).toDF("id", "a")
    val right = (1L to 1000L).map(i => (i, s"n$i")).toDF("id", "b")
    Bucketing.writeBucketed(left, "graft_bucketed_left", "id", 8)
    Bucketing.writeBucketed(right, "graft_bucketed_right", "id", 8)
    // disable broadcast so the join would otherwise be a shuffled SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.read(spark, "graft_bucketed_left")
        .join(Bucketing.read(spark, "graft_bucketed_right"), "id")
      assert(joined.count() === 1000)
      assert(!Bucketing.hasShuffleExchange(joined),
        "bucketed equi-join must not shuffle")
      // contrast: the same join over unbucketed frames DOES shuffle
      assert(Bucketing.hasShuffleExchange(left.join(right, "id")))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_left")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_right")
    }
  }
}
